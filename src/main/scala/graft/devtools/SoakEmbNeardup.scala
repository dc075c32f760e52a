package graft.devtools

import org.apache.spark.sql.SparkSession
import graft.sources.Tables
import graft.streaming.EventStreams

/** Scale prober for q210 (streaming embedding near-dup admission):
  * replays the embeddings table as `nFiles` chronological batches with
  * compaction at `maxLive`, printing the per-batch ledger, the guard's
  * stderr diagnostics (emb-probe-pair-volume), and per-batch wall
  * times. Args: sfDir [nFiles] [maxLive] [maxProbePairs].
  *
  *   dev/spark_java.sh -Xmx32g graft.devtools.SoakEmbNeardup /tmp/sf10 12 4
  */
object SoakEmbNeardup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val maxLive = args.drop(2).headOption.map(_.toInt).getOrElse(4)
    val cap = args.drop(3).headOption.map(_.toLong).getOrElse(64L << 20)
    val nb = args.drop(4).headOption.map(_.toInt).getOrElse(2)
    val bits = args.drop(5).headOption.map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.graftSession(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-soakembneardup")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val led = EventStreams.streamingEmbeddingNeardup(spark, sfDir,
      nFiles = nFiles, maxLiveSegments = maxLive,
      maxProbePairs = cap, nBandsDial = nb, bitsPerBand = bits)
      .collect()
    val tAll = (System.nanoTime() - t0) / 1e9
    led.foreach(r => println(
      s"""{"batch":${r.getLong(0)},"vecs":${r.getLong(1)},""" +
        s""""cands":${r.getLong(2)},"dups":${r.getLong(3)},""" +
        s""""byHist":${r.getLong(4)},"admitted":${r.getLong(5)}}"""))
    println(s"""{"sfDir":"$sfDir","nFiles":$nFiles,""" +
      s""""maxLiveSegments":$maxLive,"maxProbePairs":$cap,""" +
      s""""dial":"${nb}x$bits",""" +
      s""""totalSec":${math.rint(tAll * 100) / 100}}""")
    spark.stop()
  }
}
