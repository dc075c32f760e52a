package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skyline (Pareto-frontier) operator: the maximal points under
  * coordinate-wise dominance — here specialized to the classic 2-D
  * "cheapest for its size" query: a part is on the frontier iff no other
  * part is both no-more-expensive and no-smaller (with at least one
  * strict). The reference has no skyline query; this is a north-star
  * analytics extension (the BI "efficient frontier" view of the product
  * catalog).
  *
  * Scale shape (the reason this is NOT the textbook O(n²) NOT-EXISTS
  * self-join): dominance survivors of ANY disjoint bucketing of the
  * input are a superset of the global skyline, so the plan is
  *   1. collapse to distinct (price, size) points (one partial agg —
  *      survivors are decided at point grain),
  *   2. per-bucket local skyline via a running-max window inside each
  *      hash bucket (parallel, no cross-bucket traffic),
  *   3. global pass over the surviving candidates only.
  * In 2-D, a point ordered by (price ASC, size DESC) survives iff its
  * size strictly exceeds the running max over all preceding points —
  * O(n log n) total, never materializing a pair. The final window is
  * unpartitioned but only sees local survivors (expected O(log n) per
  * bucket for non-degenerate data; worst case — all points already on
  * the frontier — the output itself is that large, so no algorithm does
  * better). The DuckDB oracle IS the textbook NOT EXISTS form, so the
  * optimized plan is checked against the definitional one.
  */
object Skyline {

  /** Frontier of `df` minimizing `priceCol`, maximizing `sizeCol`.
    * Returns the distinct surviving (price, size) points; semi-join the
    * source against it to recover full rows.
    */
  def skyline2d(df: DataFrame, priceCol: String, sizeCol: String,
      buckets: Int = 32): DataFrame = {
    val pts = df.groupBy(priceCol, sizeCol).agg(count(lit(1)).as("n"))
      .withColumn("b",
        pmod(TextAnalysis.md5Hash60(concat(lit("sky:"),
          col(priceCol).cast("string"), lit(":"),
          col(sizeCol).cast("string"))), lit(buckets)))
    val runMax = (w: org.apache.spark.sql.expressions.WindowSpec) =>
      max(col(sizeCol)).over(
        w.orderBy(col(priceCol).asc, col(sizeCol).desc)
          .rowsBetween(Window.unboundedPreceding, -1))
    val local = pts
      .withColumn("pm", runMax(Window.partitionBy("b")))
      .filter(col("pm").isNull || col("pm") < col(sizeCol))
    // bounded: only local survivors reach the unpartitioned pass
    local
      .withColumn("pm", runMax(Window.partitionBy()))
      .filter(col("pm").isNull || col("pm") < col(sizeCol))
      .select(priceCol, sizeCol)
  }

  /** Registered query: Pareto frontier of part on (p_retailprice min,
    * p_size max), all member parts listed.
    */
  def skylineParts(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir).select(col("p_partkey"),
      col("p_retailprice").as("price"), col("p_size").cast("long").as("psize"))
    p.join(skyline2d(p, "price", "psize"), Seq("price", "psize"), "left_semi")
      .select("p_partkey", "price", "psize")
      .orderBy("price", "psize", "p_partkey")
  }

  /** Definitional oracle: textbook NOT-EXISTS dominance self-join. */
  val skylinePartsSql: String =
    """SELECT p_partkey, p_retailprice AS price,
      |  CAST(p_size AS BIGINT) AS psize
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      |ORDER BY price, psize, p_partkey""".stripMargin
}
