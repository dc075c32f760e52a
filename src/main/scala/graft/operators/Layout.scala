package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-layout operators: multidimensional clustering keys for write-time
  * file organization. Sorting (or range-partitioning) a 100 TB table by a
  * Z-value over its two hottest filter columns gives parquet min/max
  * file skipping on BOTH dimensions at once — the lakehouse OPTIMIZE
  * ZORDER idea, reduced to a pure column expression any writer can use
  * with `repartitionByRange(zCol).sortWithinPartitions(zCol)`.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative ints into a
    * Z-value (Morton code): bit i of x lands at position 2i, bit i of y
    * at 2i+1. Built from shift/and/multiply-by-power-of-two only, so it
    * is integer-exact, codegen'd, and expressible identically in any
    * ANSI engine (the [[zValueSql]] twin).
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)}" +
        s" + (($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Registered query: the Z-key an order-layout job would sort by —
    * customer key × order date interleaved — for the first 100 orders
    * in Z order (deterministic total order via the orderkey tiebreak).
    * In a real write path the SELECT becomes
    * `orders.repartitionByRange(col("z")).sortWithinPartitions("z")`
    * feeding the parquet sink; the query checks the key math.
    */
  def ordersZOrder(spark: SparkSession, sfDir: String, topK: Int = 100): DataFrame = {
    val dateKey = date_format(col("o_orderdate"), "yyyyMMdd").cast("long")
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        dateKey.as("date_key"),
        zValue(pmod(col("o_custkey"), lit(65536L)),
          pmod(dateKey, lit(65536L))).as("z"))
      .orderBy(col("z"), col("o_orderkey"))
      .limit(topK)
  }

  def ordersZOrderSql(topK: Int = 100): String = {
    val dk = "CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT)"
    s"""SELECT o_orderkey, o_custkey, $dk AS date_key,
       |  ${zValueSql("(o_custkey % 65536)", s"($dk % 65536)")} AS z
       |FROM orders
       |ORDER BY z, o_orderkey
       |LIMIT $topK""".stripMargin
  }
}
