package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Graph, RetailBi}
import graft.sources.Tables

/** Dev-loop scratch: times incremental pieces of the current hot query
  * (round 6: the q94/q129 basket-pair pipeline) to locate per-row cost.
  * Not driver contract.
  */
object DevShape {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Tables.graftSession(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => DataFrame): Unit = {
      // warm twice, report best of 3
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[devshape] $name%-28s best ${ts.min}%6.2f s  runs ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    val li = Tables.lineitem(spark, sfDir)
    def bk = RetailBi.baskets(li)
    def pairs = RetailBi.basketPairCounts(bk, minPairs = 2, maxItems = 64)
    def edges = pairs
      .select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionByName(
        pairs.select(col("part_b").as("src"), col("part_a").as("dst")))

    time("baskets")(bk)
    time("pairs")(pairs)
    time("edges_mirror")(edges)
    time("edges_checkpointed") {
      val e = edges.localCheckpoint(true)
      e.unpersist(true)
      e
    }
    time("pagerank_novalidate")(Graph.pagerank(edges, validate = false))
    time("pagerank_validate")(Graph.pagerank(edges, validate = true))
    time("full_q129")(Graph.copurchaseRank(spark, sfDir))
    spark.stop()
  }
}
