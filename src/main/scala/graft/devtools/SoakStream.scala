package graft.devtools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.sources.Tables
import graft.streaming.EventStreams

/** Soak prober for the streaming family's STATE-STORE axis (round-7
  * VERDICT stretch task): stages events chronologically, replays the
  * session-window query one file per trigger, and prints one JSON line
  * per micro-batch with the state-operator metrics
  * (`recentProgress.stateOperators`) — rows kept / updated / evicted
  * and state memory — so state scaling at sf≥1 is measured, not
  * asserted. Results land in SOAK.md.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 runMain graft.devtools.SoakStream
  *   <sfDir> [nFiles]`
  */
object SoakStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.graftSession(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-soakstream")
      .config("spark.sql.shuffle.partitions", "8") // state partitions
      .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = System.nanoTime()
    val staging = EventStreams.stageChronologicalEvents(spark, sfDir, nFiles)
    val tStage = (System.nanoTime() - t0) / 1e9

    val q = EventStreams.sessionWindows(
        EventStreams.readEventStream(spark, staging,
          maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("soak_sessions")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val tAll = (System.nanoTime() - t0) / 1e9

    q.recentProgress.foreach { p =>
      val so = p.stateOperators.headOption
      def l(f: org.apache.spark.sql.streaming.StateOperatorProgress => Long)
          : Long = so.map(f).getOrElse(-1L)
      println(s"""{"batchId":${p.batchId},"inputRows":${p.numInputRows},""" +
        s""""stateRowsTotal":${l(_.numRowsTotal)},""" +
        s""""stateRowsUpdated":${l(_.numRowsUpdated)},""" +
        s""""stateRowsRemoved":${l(_.numRowsRemoved)},""" +
        s""""stateMemBytes":${l(_.memoryUsedBytes)},""" +
        s""""durationMs":${p.durationMs.getOrDefault("triggerExecution", -1L)}}""")
    }
    val emitted = spark.table("soak_sessions").count()
    println(s"""{"sfDir":"$sfDir","nFiles":$nFiles,"emitted":$emitted,""" +
      s""""stageSec":${math.rint(tStage * 100) / 100},""" +
      s""""totalSec":${math.rint(tAll * 100) / 100}}""")
    spark.stop()
  }
}
