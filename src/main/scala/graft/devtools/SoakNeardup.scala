package graft.devtools

import org.apache.spark.sql.SparkSession

import graft.sources.Tables
import graft.streaming.EventStreams

/** Soak prober for the q205 near-dup band-index COMPACTION axis
  * (round-13 verdict ask #1's "done" clause): replays the streaming
  * admission over many staged batches and reports per-batch wall
  * times, so the claim "compaction keeps per-batch cost flat where
  * the segment union grows O(batches)" is measured, not asserted.
  * The per-batch times come from the query's own
  * `neardup-batch-ms:` stderr line (recentProgress durations);
  * this main adds the ledger fold and the total. Results land in
  * SOAK.md.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 runMain graft.devtools.SoakNeardup
  *   <sfDir> [nFiles] [maxLiveSegments]`
  * — run once with maxLiveSegments=4 (compacting) and once with a
  * huge value (never compacts) to see the union-growth curve.
  */
object SoakNeardup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val maxLive = args.drop(2).headOption.map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.graftSession(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-soakneardup")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val led = EventStreams.streamingNeardupAdmission(spark, sfDir,
      nFiles = nFiles, maxLiveSegments = maxLive).collect()
    val tAll = (System.nanoTime() - t0) / 1e9
    led.foreach(r => println(
      s"""{"batch":${r.getLong(0)},"docs":${r.getLong(1)},""" +
        s""""gate":${r.getLong(2)},"dups":${r.getLong(3)},""" +
        s""""byHist":${r.getLong(4)},"admitted":${r.getLong(5)}}"""))
    println(s"""{"sfDir":"$sfDir","nFiles":$nFiles,""" +
      s""""maxLiveSegments":$maxLive,""" +
      s""""totalSec":${math.rint(tAll * 100) / 100}}""")
    spark.stop()
  }
}
