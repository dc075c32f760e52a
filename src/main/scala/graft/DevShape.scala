package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Joins, ScalableKeys, Star}
import graft.sources.Tables

/** Dev-loop scratch: times incremental pieces of the current hot query
  * (round 6: the q09 fact_sales regression) to locate per-row cost.
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
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))

    time("dim_customer")(Star.dimCustomer(spark, sfDir))
    time("dim_product")(Star.dimProduct(spark, sfDir))
    time("dim_store")(Star.dimStore(spark, sfDir))
    time("li_join_ord")(
      li.join(ord, col("l_orderkey") === col("o_orderkey"), "left"))
    time("li_join_ord_broadcast")(
      li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"), "left"))
    val cust = Star.dimCustomer(spark, sfDir)
      .select("customer_id", "customer_key")
    time("li_ord_cust")(
      li.join(ord, col("l_orderkey") === col("o_orderkey"), "left")
        .join(Joins.broadcastIfSmall(cust, Tables.customer(spark, sfDir)),
          col("o_custkey") === col("customer_id"), "left"))
    time("full_q09")(Star.factSales(spark, sfDir))
    println("===== q09 plan =====")
    Star.factSales(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
