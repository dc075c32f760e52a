package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Slowly-changing-dimension maintenance (Type 2): apply a staged
  * snapshot to a history-keeping dim, closing out changed rows and
  * appending new versions. The warehouse-side companion to
  * [[Star.upsertByKey]] (Type 1 overwrite) — the reference's star loader
  * (`etl/etl.py:213-262`) rebuilds dims each run; Type 2 is what that
  * loader needs the day history starts mattering.
  *
  * Scale shape: everything is key-equi-joins (semi/anti/inner) on the
  * business key — sort-merge with co-partitioned exchanges at 100 TB, no
  * broadcast hints (AQE may still choose broadcast when a side fits).
  * Change detection is a null-safe column compare, no row hashing
  * shuffle. Output is a UNION of narrow projections over the two inputs
  * — each input is scanned once.
  */
object Scd {

  val OpenEnd = "9999-12-31" // sentinel, not NULL: keeps BETWEEN point-in-
                             // time lookups sargable and the output hashable

  /** Apply `staged` (key + tracked attrs, one row per key) to `current`
    * (key + tracked attrs + valid_from/valid_to/is_current) as of
    * `batchDate`. Emits the full new dim state:
    *   - history rows (is_current=0) unchanged;
    *   - open rows whose tracked attrs differ in `staged`: closed with
    *     valid_to=batchDate, plus a fresh open row from `staged`;
    *   - open rows absent from `staged` or identical: unchanged;
    *   - keys new in `staged`: inserted open as of batchDate.
    */
  def applyType2(current: DataFrame, staged: DataFrame, key: String,
      tracked: Seq[String], batchDate: String): DataFrame = {
    val open = current.filter(col("is_current") === 1)
    val history = current.filter(col("is_current") =!= 1)
    // explicit aliases: current/staged often share lineage (snapshots of
    // the same table), so bare df(col) references would be ambiguous
    val differs: Column = tracked
      .map(c => !(col(s"o.$c") <=> col(s"s.$c")))
      .reduce(_ || _)
    val changedKeys = open.alias("o")
      .join(staged.alias("s"), col(s"o.$key") === col(s"s.$key"))
      .filter(differs)
      .select(col(s"o.$key").as(key))

    val outCols = (key +: tracked) ++ Seq("valid_from", "valid_to", "is_current")
    def proj(df: DataFrame): DataFrame = df.select(outCols.map(col): _*)

    val closed = proj(open.join(changedKeys, Seq(key), "left_semi")
      .withColumn("valid_to", to_date(lit(batchDate)))
      .withColumn("is_current", lit(0)))
    val unchanged = proj(open.join(changedKeys, Seq(key), "left_anti"))
    val fresh = staged.join(changedKeys, Seq(key), "left_semi")
    val inserts = staged.join(open.select(col(key)), Seq(key), "left_anti")
    val opened = proj(fresh.unionByName(inserts)
      .withColumn("valid_from", to_date(lit(batchDate)))
      .withColumn("valid_to", to_date(lit(OpenEnd)))
      .withColumn("is_current", lit(1)))

    history.select(outCols.map(col): _*)
      .unionByName(closed).unionByName(unchanged).unionByName(opened)
  }

  /** Registered query: seed a customer dim from the customer table,
    * stage a deterministic mutation (every 7th key: acctbal+100, every
    * 11th: segment → MOVED), and apply Type 2. Both engines derive the
    * mutation from the same parquet, so the oracle is exact.
    */
  def customerScd2(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val cur = cust.select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal").cast("double").as("acctbal"))
      .withColumn("valid_from", to_date(lit("2024-01-01")))
      .withColumn("valid_to", to_date(lit(OpenEnd)))
      .withColumn("is_current", lit(1))
    val stg = cust.select(col("c_custkey"),
      when(pmod(col("c_custkey"), lit(11)) === 0, lit("MOVED"))
        .otherwise(col("c_mktsegment")).as("c_mktsegment"),
      (col("c_acctbal").cast("double") +
        when(pmod(col("c_custkey"), lit(7)) === 0, lit(100.0))
          .otherwise(lit(0.0))).as("acctbal"))
    applyType2(cur, stg, "c_custkey", Seq("c_mktsegment", "acctbal"),
        "2024-06-01")
      .orderBy("c_custkey", "valid_from")
  }

  /** CDC changeset extract — the inverse of [[applyType2]]: given two
    * snapshots of the same keyed table, emit one row per changed key
    * classified `I`/`U`/`D` (insert / update / delete), carrying the
    * new values for I/U and the old values for D. Unchanged keys are
    * dropped.
    *
    * Scale shape: ONE full-outer sort-merge join on the business key
    * (both sides shuffle once, co-partitioned), a null-safe column
    * compare for change detection (no row-hash shuffle), and a narrow
    * projection — the standard way to derive a change feed when the
    * source can't emit one (the reference's loader re-extracts full
    * snapshots each run; this turns those into an incremental feed).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      tracked: Seq[String]): DataFrame = {
    val o = oldSnap.alias("o")
    val n = newSnap.alias("n")
    val differs: Column = tracked
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduce(_ || _)
    val op = when(col(s"o.$key").isNull, lit("I"))
      .when(col(s"n.$key").isNull, lit("D"))
      .when(differs, lit("U"))
    val payload = tracked.map(c =>
      when(col(s"n.$key").isNull, col(s"o.$c")).otherwise(col(s"n.$c")).as(c))
    o.join(n, col(s"o.$key") === col(s"n.$key"), "full_outer")
      .withColumn("op", op)
      .filter(col("op").isNotNull)
      .select(Seq(col("op"),
        coalesce(col(s"o.$key"), col(s"n.$key")).as(key)) ++ payload: _*)
  }

  /** Registered query: diff two deterministic customer snapshots —
    * old = keys not divisible by 13, new = keys not divisible by 17
    * with the q59 mutations (%7: acctbal+100, %11: segment MOVED) —
    * so inserts, updates, and deletes all occur, derived identically
    * in both engines.
    */
  def customerSnapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val oldSnap = cust.filter(pmod(col("c_custkey"), lit(13)) =!= 0)
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal").cast("double").as("acctbal"))
    val newSnap = cust.filter(pmod(col("c_custkey"), lit(17)) =!= 0)
      .select(col("c_custkey"),
        when(pmod(col("c_custkey"), lit(11)) === 0, lit("MOVED"))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"),
        (col("c_acctbal").cast("double") +
          when(pmod(col("c_custkey"), lit(7)) === 0, lit(100.0))
            .otherwise(lit(0.0))).as("acctbal"))
    snapshotDiff(oldSnap, newSnap, "c_custkey",
        Seq("c_mktsegment", "acctbal"))
      .orderBy("c_custkey")
  }

  val customerSnapshotDiffSql: String =
    """WITH old AS (
      |  SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS acctbal
      |  FROM customer WHERE c_custkey % 13 <> 0),
      |new AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 11 = 0 THEN 'MOVED' ELSE c_mktsegment END
      |      AS c_mktsegment,
      |    CAST(c_acctbal AS DOUBLE)
      |      + CASE WHEN c_custkey % 7 = 0 THEN 100.0 ELSE 0.0 END AS acctbal
      |  FROM customer WHERE c_custkey % 17 <> 0)
      |SELECT
      |  CASE WHEN o.c_custkey IS NULL THEN 'I'
      |       WHEN n.c_custkey IS NULL THEN 'D'
      |       ELSE 'U' END AS op,
      |  COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
      |  CASE WHEN n.c_custkey IS NULL THEN o.c_mktsegment
      |       ELSE n.c_mktsegment END AS c_mktsegment,
      |  CASE WHEN n.c_custkey IS NULL THEN o.acctbal
      |       ELSE n.acctbal END AS acctbal
      |FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
      |WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
      |   OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
      |   OR o.acctbal IS DISTINCT FROM n.acctbal
      |ORDER BY c_custkey""".stripMargin

  /** Point-in-time (AS-OF-date) join against a Type-2 dim (q130): each
    * order resolves the customer segment that was valid ON ITS ORDER
    * DATE — equi-join on the business key plus the
    * `valid_from <= date < valid_to` band, the canonical SCD2 lookup.
    * The dim: segments seeded 1995-01-01, every 11th key re-segmented
    * MOVED in a 1998-01-01 batch — so the same customer's orders split
    * across segments at the batch boundary, which is exactly the
    * behavior a Type-1 (overwrite) dim gets wrong.
    *
    * Scale shape: the planner extracts the equi-key (sort-merge or
    * AQE-broadcast on c_custkey) and applies the date band as a join
    * residual; each key carries ≤ version-count dim rows, so the match
    * is 1:≤2 here and 1:few in general — no range-join explosion.
    * Revenue aggregates in DECIMAL(18,2), presented as DOUBLE.
    */
  def pitSales(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val cur = cust.select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("valid_from", to_date(lit("1995-01-01")))
      .withColumn("valid_to", to_date(lit(OpenEnd)))
      .withColumn("is_current", lit(1))
    val stg = cust.select(col("c_custkey"),
      when(pmod(col("c_custkey"), lit(11)) === 0, lit("MOVED"))
        .otherwise(col("c_mktsegment")).as("c_mktsegment"))
    val dim = applyType2(cur, stg, "c_custkey", Seq("c_mktsegment"),
      "1998-01-01")
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("o_date"),
        col("o_totalprice"))
    orders.join(dim,
        orders("o_custkey") === dim("c_custkey") &&
          orders("o_date") >= dim("valid_from") &&
          orders("o_date") < dim("valid_to"))
      .groupBy(year(col("o_date")).as("order_year"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy("order_year", "c_mktsegment")
  }

  val pitSalesSql: String =
    s"""WITH cur AS (
       |  SELECT c_custkey, c_mktsegment, DATE '1995-01-01' AS valid_from,
       |         DATE '$OpenEnd' AS valid_to
       |  FROM customer),
       |stg AS (
       |  SELECT c_custkey,
       |    CASE WHEN c_custkey % 11 = 0 THEN 'MOVED' ELSE c_mktsegment END
       |      AS c_mktsegment
       |  FROM customer),
       |chg AS (
       |  SELECT cur.c_custkey
       |  FROM cur JOIN stg USING (c_custkey)
       |  WHERE cur.c_mktsegment IS DISTINCT FROM stg.c_mktsegment),
       |dim AS (
       |  SELECT c_custkey, c_mktsegment, valid_from,
       |    DATE '1998-01-01' AS valid_to
       |  FROM cur WHERE c_custkey IN (SELECT c_custkey FROM chg)
       |  UNION ALL
       |  SELECT c_custkey, c_mktsegment, valid_from, valid_to
       |  FROM cur WHERE c_custkey NOT IN (SELECT c_custkey FROM chg)
       |  UNION ALL
       |  SELECT s.c_custkey, s.c_mktsegment, DATE '1998-01-01', DATE '$OpenEnd'
       |  FROM stg s WHERE s.c_custkey IN (SELECT c_custkey FROM chg))
       |SELECT year(CAST(o_orderdate AS DATE)) AS order_year, c_mktsegment,
       |       COUNT(*) AS n_orders,
       |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       |         AS revenue
       |FROM orders o JOIN dim d
       |  ON o.o_custkey = d.c_custkey
       | AND CAST(o.o_orderdate AS DATE) >= d.valid_from
       | AND CAST(o.o_orderdate AS DATE) < d.valid_to
       |GROUP BY 1, 2
       |ORDER BY order_year, c_mktsegment""".stripMargin

  val customerScd2Sql: String =
    s"""WITH cur AS (
       |  SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS acctbal,
       |    DATE '2024-01-01' AS valid_from, DATE '$OpenEnd' AS valid_to,
       |    1 AS is_current
       |  FROM customer),
       |stg AS (
       |  SELECT c_custkey,
       |    CASE WHEN c_custkey % 11 = 0 THEN 'MOVED' ELSE c_mktsegment END
       |      AS c_mktsegment,
       |    CAST(c_acctbal AS DOUBLE)
       |      + CASE WHEN c_custkey % 7 = 0 THEN 100.0 ELSE 0.0 END AS acctbal
       |  FROM customer),
       |chg AS (
       |  SELECT cur.c_custkey
       |  FROM cur JOIN stg USING (c_custkey)
       |  WHERE cur.c_mktsegment IS DISTINCT FROM stg.c_mktsegment
       |     OR cur.acctbal IS DISTINCT FROM stg.acctbal)
       |SELECT * FROM (
       |  SELECT c_custkey, c_mktsegment, acctbal, valid_from,
       |    DATE '2024-06-01' AS valid_to, 0 AS is_current
       |  FROM cur WHERE c_custkey IN (SELECT c_custkey FROM chg)
       |  UNION ALL
       |  SELECT c_custkey, c_mktsegment, acctbal, valid_from, valid_to,
       |    is_current
       |  FROM cur WHERE c_custkey NOT IN (SELECT c_custkey FROM chg)
       |  UNION ALL
       |  SELECT s.c_custkey, s.c_mktsegment, s.acctbal,
       |    DATE '2024-06-01' AS valid_from, DATE '$OpenEnd' AS valid_to,
       |    1 AS is_current
       |  FROM stg s WHERE s.c_custkey IN (SELECT c_custkey FROM chg))
       |ORDER BY c_custkey, valid_from""".stripMargin
}
