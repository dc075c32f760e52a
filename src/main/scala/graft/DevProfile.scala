package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Dev-loop profiler: runs one registered query and prints per-stage
  * wall/CPU times so plan tuning targets the actual bottleneck
  * instead of a guess. Not part of the driver contract.
  *
  * Usage: runMain graft.DevProfile <queryName> [sfDir]
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.sources.Tables.graftSession(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("WARN")
    val stages = ArrayBuffer[(Int, String, Long, Long, Long, Int)]()
    val stageSite = scala.collection.concurrent.TrieMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        js.stageIds.foreach(id => stageSite.putIfAbsent(id, site))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L)
          - si.submissionTime.getOrElse(0L))
        stages += ((si.stageId,
          stageSite.getOrElse(si.stageId, si.name.takeWhile(_ != '\n')).take(60),
          wall, si.taskMetrics.executorRunTime,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten, si.numTasks))
      }
    })
    // warmup with the flagship entry
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    stages.clear()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"[devprofile] $name total ${total}%.2f s")
    stages.sortBy(_._1).foreach { case (id, nm, wall, cpu, shw, nt) =>
      println(f"[devprofile] stage $id%3d wall ${wall / 1000.0}%6.2f s " +
        f"cpuSum ${cpu / 1000.0}%7.2f s shufW ${shw / 1e6}%8.2f MB " +
        f"tasks $nt%3d  $nm")
    }
    spark.stop()
  }
}
