package graft.devtools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup
import graft.sources.Tables

/** q33 escape-hatch prober (round-14 sf10 probe): the pair-volume
  * guard refuses replication-densified synthetic corpora once the
  * block partition would score more than `maxScoredPairs` candidate
  * pairs (the unguarded sf10 run filled 78 GB of sort spill). This
  * main runs the SAME query with a deliberately raised ceiling — the
  * action the guard's message prescribes — and reports rows + wall
  * time, so SOAK.md can state that the refusal is a dial, not a wall.
  *
  * Usage: `runMain graft.devtools.SoakJaccard <sfDir> [maxScoredPairs]`
  */
object SoakJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val cap = args.drop(1).headOption.map(_.toLong)
      .getOrElse(1024L * 1000 * 1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.graftSession(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-soakjaccard")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = Dedup.ngramJaccardPairs(spark, sfDir,
      maxScoredPairs = cap).count()
    val tAll = (System.nanoTime() - t0) / 1e9
    println(s"""{"sfDir":"$sfDir","maxScoredPairs":$cap,"pairs":$n,""" +
      s""""totalSec":${math.rint(tAll * 100) / 100}}""")
    spark.stop()
  }
}
