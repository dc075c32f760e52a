package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Range (interval-containment) join — points matched to intervals with
  * no equi-key. Spark plans a raw `p.t >= i.s && p.t < i.e` join as
  * BroadcastNestedLoopJoin (an m×n scan): correct at test scale, dead at
  * 100 TB. The chunked form recovers an equi-join: time is cut into
  * fixed chunks, each interval is exploded to the chunks it overlaps,
  * each point maps to exactly ONE chunk, and the join runs on the chunk
  * id with an exact containment filter behind it. A point's chunk holds
  * at most one copy of each interval, so no pair dedup is needed.
  *
  * Pick `chunkUs` ≈ the maximum interval length: each interval then
  * explodes to at most 2 chunks (the replication factor), and a chunk's
  * population bounds the worst per-reducer fan-in. All chunk math is
  * integer (`div` on epoch micros) — no double rounding at boundaries.
  */
object RangeJoin {

  def chunkedRangeJoin(points: DataFrame, intervals: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      chunkUs: Long): DataFrame = {
    val collide = intervals.columns.intersect(points.columns)
    require(collide.isEmpty,
      s"point/interval columns must not collide: ${collide.mkString(",")}")
    val p = points.withColumn("__chunk", expr(s"$ptCol div ${chunkUs}"))
    val i = intervals.withColumn("__chunk",
      explode(expr(s"sequence($startCol div $chunkUs, ($endCol - 1) div $chunkUs)")))
    i.join(p, Seq("__chunk"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__chunk")
  }

  /** q50 — blast-radius count: for every error event, how many clicks
    * (any user) landed in the 5 minutes starting at the error. Zero-hit
    * errors are kept via the left join back to the interval table.
    */
  def clicksNearErrors(spark: SparkSession, sfDir: String): DataFrame = {
    val fiveMinUs = 5L * 60 * 1000000
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(unix_micros(col("ts")).as("click_us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), unix_micros(col("ts")).as("err_us"))
      .withColumn("err_end_us", col("err_us") + fiveMinUs)
    val hits = chunkedRangeJoin(clicks, errors, "click_us", "err_us",
        "err_end_us", fiveMinUs)
      .groupBy("event_id").agg(count(lit(1)).as("hits"))
    errors.join(hits, Seq("event_id"), "left")
      .select(col("event_id"), coalesce(col("hits"), lit(0L)).as("n_clicks"))
      .orderBy("event_id")
  }

  val clicksNearErrorsSql: String =
    """SELECT e.event_id,
      |  CAST((SELECT COUNT(*) FROM events c
      |        WHERE c.event_type = 'click'
      |          AND CAST(c.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP)
      |          AND CAST(c.ts AS TIMESTAMP) <
      |              CAST(e.ts AS TIMESTAMP) + INTERVAL 5 MINUTE) AS BIGINT)
      |    AS n_clicks
      |FROM events e WHERE e.event_type = 'error'
      |ORDER BY e.event_id""".stripMargin
}
