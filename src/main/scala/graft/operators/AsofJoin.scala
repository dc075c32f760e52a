package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of (temporal nearest-prior) join — an operator Spark has no
  * built-in for. For each left row, attach the right row with the same
  * key and the greatest right time <= the left row's time.
  *
  * Implementation follows the compose-first guideline: tag both sides,
  * union, and run `last(_, ignoreNulls)` over a window partitioned by
  * the key and ordered by (time, side, content-hash tiebreak) — right
  * rows sort before left rows at equal times, so a right row
  * timestamped exactly at the left time matches (the ASOF `>=`
  * convention). The right payload travels as ONE struct, so a NULL in
  * one payload column can never be backfilled from an older right row
  * (the matched row is carried atomically), and the hash tiebreak makes
  * the pick among exact-time ties deterministic under any partitioning
  * (engines are free to pick either tied row; ours always picks the
  * same one). No join is ever planned:
  * the whole operator is ONE hash exchange on the key plus a
  * sort-within-partition, which is also its 100 TB shape — state per
  * key is a sort run, there is no candidate blowup, and skew is bounded
  * by the hottest single key. Contrast a naive
  * `left.join(right, key && lt <= rt).groupBy(max)` — an m×n expansion
  * per key that the window form never materializes.
  *
  * The right frame's non-key columns (including its time column, which
  * surfaces as the matched as-of time) must not collide with left
  * column names — rename before calling.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String): DataFrame = {
    val payload = right.columns.filterNot(_ == key)
    require(payload.intersect(left.columns).isEmpty,
      s"right columns ${payload.mkString(",")} must not collide with left")
    val l = left.withColumn("__asof_t", col(leftTime))
      .withColumn("__asof_side", lit(1))
      .withColumn("__asof_tb", lit(0L))
    val r = right
      .withColumn("__asof_t", col(rightTime))
      .withColumn("__asof_side", lit(0))
      // one struct per right row: filled atomically (null fields stay
      // null), never column-by-column across different right rows
      .withColumn("__asof_payload", struct(payload.map(col).toSeq: _*))
      .withColumn("__asof_tb",
        xxhash64(col(key), col("__asof_t"), col("__asof_payload")))
      .select(col(key), col("__asof_t"), col("__asof_side"),
        col("__asof_tb"), col("__asof_payload"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__asof_t"), col("__asof_side"), col("__asof_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof_payload",
        last(col("__asof_payload"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
      .select(left.columns.map(col).toSeq ++
        payload.map(c => col(s"__asof_payload.$c").as(c)): _*)
  }

  /** q46 — for every click, the same user's most recent purchase at or
    * before the click (inner as-of: clicks with no prior purchase drop
    * out, which also keeps the oracle null-free). The DuckDB oracle
    * states the same query with its native ASOF JOIN.
    */
  def purchaseBeforeClick(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    asofJoin(clicks, purchases, "user_id", "ts", "purchase_ts")
      .filter(col("purchase_ts").isNotNull)
      .orderBy("event_id")
  }

  /** The ASOF comparison runs on micros-truncated timestamps (matching
    * the Spark side, which reads the nanos column as micros): the CAST
    * happens inside the subqueries, before the join.
    */
  val purchaseBeforeClickSql: String =
    """SELECT c.event_id, c.user_id, c.ts, c.value,
      |       p.purchase_ts, p.purchase_value
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      |      FROM events WHERE event_type = 'click') c
      |ASOF JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS purchase_ts,
      |             value AS purchase_value
      |           FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND c.ts >= p.purchase_ts
      |ORDER BY c.event_id""".stripMargin
}
