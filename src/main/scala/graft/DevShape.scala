package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev-loop scratch: times incremental pieces of the percentile/median
  * window-chain shape to locate the per-row cost. Not driver contract.
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
    def grain = li
      .groupBy(col("l_returnflag"), col("l_extendedprice").as("price"))
      .agg(count(lit(1)).as("w"))
    val ord = Window.partitionBy("l_returnflag").orderBy("price")
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.partitionBy("l_returnflag").orderBy("price")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    time("scan_only")(li.select("l_returnflag", "l_extendedprice"))
    time("grain")(grain)
    time("grain_sortWithin")(grain.repartition(col("l_returnflag"))
      .sortWithinPartitions("price"))
    time("grain_cumw")(grain.withColumn("cumw", sum("w").over(ord)))
    time("grain_cumw_n")(grain.withColumn("cumw", sum("w").over(ord))
      .withColumn("n", sum("w").over(all)))
    time("plus_pick_windows") {
      val c = grain.withColumn("cumw", sum("w").over(ord))
        .withColumn("n", sum("w").over(all))
        .withColumn("k", floor((col("n") - 1).cast("double") * lit(0.5)))
      c.withColumn("lo",
          min(when(col("cumw") > col("k"), col("price"))).over(all))
        .withColumn("hi",
          min(when(col("cumw") > col("k") + 1, col("price"))).over(all))
    }
    time("full_q116")(Features2.weightedMedianRef(spark, sfDir))
    spark.stop()
  }
}

/** Indirection so DevShape can call the real operator without import
  * cycles; remove with DevShape when the tuning pass lands.
  */
object Features2 {
  def weightedMedianRef(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Features.weightedMedian(spark, sfDir)
}
