package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Feature-engineering / statistics operators: quantile binning, exact
  * distributed moments (correlation/regression), fixed-width histograms,
  * and trailing-window smoothing. The common thread is cross-engine
  * determinism at scale: every aggregate here is either integer-exact,
  * decimal-exact, or a window with a total order — no floating partial
  * sums whose value depends on partitioning.
  */
object Features {

  /** Equi-depth (decile) binning of event values per type — the
    * rank-based feature transform. ntile over a per-type window with a
    * total order (value, event_id tiebreak), rolled up to bin
    * boundaries. The exchange is on event_type only; each type's sort
    * stays inside its partition.
    */
  def valueDeciles(spark: SparkSession, sfDir: String, n: Int = 10): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("value"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("decile", ntile(n).over(w))
      .groupBy("event_type", "decile")
      .agg(count(lit(1)).as("n_events"),
        min("value").as("min_value"), max("value").as("max_value"))
      .orderBy("event_type", "decile")
  }

  def valueDecilesSql(n: Int = 10): String =
    s"""SELECT event_type, decile, COUNT(*) AS n_events,
       |  MIN(value) AS min_value, MAX(value) AS max_value
       |FROM (
       |  SELECT event_type, event_id, value,
       |    NTILE($n) OVER (PARTITION BY event_type
       |      ORDER BY value, event_id) AS decile
       |  FROM events)
       |GROUP BY event_type, decile
       |ORDER BY event_type, decile""".stripMargin

  /** Exact distributed correlation + regression slope of
    * (l_quantity, l_extendedprice) per return flag, from DECIMAL moment
    * sums — not `corr()`, whose double partial sums are
    * partitioning-dependent. The five moments are exact decimals (one
    * map-side partial-agg pass), converted to double ONCE each, then
    * combined with scalar IEEE arithmetic — bit-identical on any
    * cluster size and in any engine. This is how you get reproducible
    * statistics at 100 TB.
    */
  def exactCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(18,2)")
    val y = col("l_extendedprice").cast("decimal(18,2)")
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        ((col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (sqrt(col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
            sqrt(col("n").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))))
          .as("corr_qty_price"),
        ((col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")))
          .as("beta_price_per_qty"))
      .orderBy("l_returnflag")
  }

  val exactCorrSql: String = {
    val m = """SELECT l_returnflag, COUNT(*) AS n,
              |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
              |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
              |    SUM(CAST(l_quantity AS DECIMAL(18,2))
              |      * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
              |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
              |    SUM(CAST(l_quantity AS DECIMAL(18,2))
              |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
              |  FROM lineitem GROUP BY l_returnflag""".stripMargin
    s"""SELECT l_returnflag, n,
       |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       |    AS corr_qty_price,
       |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |    AS beta_price_per_qty
       |FROM (
       |  $m)
       |ORDER BY l_returnflag""".stripMargin
  }

  /** Fixed-width histogram of order totals in integer cents — bin
    * arithmetic entirely in BIGINT (cents div binWidthCents), so bin
    * edges are exact: no double rounding at the boundaries, identical
    * bins in every engine. One partial-agg pass; presentation converts
    * cents to dollars at the end.
    */
  def priceHistogram(spark: SparkSession, sfDir: String,
      binDollars: Long = 50000L): DataFrame = {
    val binCents = binDollars * 100
    // o_totalprice is a DOUBLE in the testdata: *100 can land at
    // x.9999…, so round() before the integer cast (Spark casts by
    // truncation, DuckDB by rounding — round() makes both exact)
    Tables.orders(spark, sfDir)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .withColumn("bin", expr(s"cents div $binCents"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("sum_cents"))
      .select((col("bin") * binDollars).cast("long").as("bin_low"),
        col("n_orders"),
        (col("sum_cents").cast("double") / 100.0).as("sum_price"))
      .orderBy("bin_low")
  }

  def priceHistogramSql(binDollars: Long = 50000L): String = {
    val binCents = binDollars * 100
    s"""SELECT CAST((CAST(round(o_totalprice * 100) AS BIGINT) // $binCents)
       |    * $binDollars AS BIGINT) AS bin_low,
       |  COUNT(*) AS n_orders,
       |  CAST(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
       |    / 100.0 AS DOUBLE) AS sum_price
       |FROM orders
       |GROUP BY bin_low
       |ORDER BY bin_low""".stripMargin
  }

  /** 7-day trailing revenue smoothing: daily grain first (decimal-exact
    * sums), then a RANGE window keyed on integer day number. The global
    * window is over DAILY grain — bounded by the calendar (a few
    * thousand rows regardless of fact size), the documented exception
    * to the no-global-window rule (same class as q06's grand total).
    * The decimal window sum stays exact; the single decimal→double
    * conversion happens in the final projection.
    */
  def movingRevenue(spark: SparkSession, sfDir: String, days: Int = 7): DataFrame = {
    val daily = Tables.lineitem(spark, sfDir)
      .groupBy(to_date(col("l_shipdate")).as("ship_date"))
      .agg(sum(Insights.revenueDec).as("rev"),
        count(lit(1)).as("n_items"))
      .withColumn("day_n", datediff(col("ship_date"),
        lit("1970-01-01").cast("date")))
    val w = Window.orderBy("day_n").rangeBetween(-(days - 1), 0)
    daily
      .withColumn("mov_rev", sum("rev").over(w))
      .withColumn("mov_n", sum("n_items").over(w))
      .select(col("ship_date"),
        col("rev").cast("double").as("revenue"),
        col("mov_rev").cast("double").as(s"revenue_${days}d"),
        (col("mov_rev").cast("double") / col("mov_n"))
          .as(s"avg_item_revenue_${days}d"))
      .orderBy("ship_date")
  }

  def movingRevenueSql(days: Int = 7): String =
    s"""WITH daily AS (
       |  SELECT CAST(l_shipdate AS DATE) AS ship_date,
       |    SUM(${Insights.revenueSql}) AS rev,
       |    COUNT(*) AS n_items,
       |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
       |      AS day_n
       |  FROM lineitem
       |  GROUP BY CAST(l_shipdate AS DATE))
       |SELECT ship_date,
       |  CAST(rev AS DOUBLE) AS revenue,
       |  CAST(SUM(rev) OVER w AS DOUBLE) AS revenue_${days}d,
       |  CAST(SUM(rev) OVER w AS DOUBLE)
       |    / CAST(SUM(n_items) OVER w AS DOUBLE) AS avg_item_revenue_${days}d
       |FROM daily
       |WINDOW w AS (ORDER BY day_n
       |  RANGE BETWEEN ${days - 1} PRECEDING AND CURRENT ROW)
       |ORDER BY ship_date""".stripMargin

  /** Robust outlier detection via Median Absolute Deviation per return
    * flag: med = median(price), mad = median(|price − med|), outlier ⇔
    * |price − med| > k·mad. The robust alternative to the IQR audit
    * (q52) — MAD has a 50% breakdown point, so a heavy-tailed price
    * column can't drag the fence the way it drags stddev.
    *
    * Determinism: medians are R-7 interpolated over identical inputs
    * (q49 contract); |x − med| and k·mad are IEEE double ops on
    * bit-identical operands; the fence compare is strict.
    *
    * Scale shape: two percentile aggs at group grain plus two
    * broadcast joins of the per-group medians (the per-group frames are
    * bounded by group cardinality — they do NOT scale with the fact, so
    * the unconditional broadcast is safe here, unlike a dim table).
    */
  def madOutliers(spark: SparkSession, sfDir: String,
      k: Double = 3.0): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice").as("price"))
    val med = li.groupBy("l_returnflag")
      .agg(expr("percentile(price, 0.5)").as("med"))
    val dev = li.join(broadcast(med), Seq("l_returnflag"))
      .withColumn("adev", abs(col("price") - col("med")))
    val mad = dev.groupBy("l_returnflag")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        first(col("med")).as("median_price"),
        first(col("mad")).as("mad"),
        sum((col("adev") > lit(k) * col("mad")).cast("long"))
          .as("n_outliers"))
      .orderBy("l_returnflag")
  }

  def madOutliersSql(k: Double = 3.0): String =
    s"""WITH li AS (
       |  SELECT l_returnflag, l_extendedprice AS price FROM lineitem),
       |med AS (
       |  SELECT l_returnflag, quantile_cont(price, 0.5) AS med
       |  FROM li GROUP BY l_returnflag),
       |dev AS (
       |  SELECT li.l_returnflag, price, med, abs(price - med) AS adev
       |  FROM li JOIN med ON li.l_returnflag = med.l_returnflag),
       |mad AS (
       |  SELECT l_returnflag, quantile_cont(adev, 0.5) AS mad
       |  FROM dev GROUP BY l_returnflag)
       |SELECT dev.l_returnflag, COUNT(*) AS n_rows,
       |  MIN(med) AS median_price, MIN(mad) AS mad,
       |  CAST(SUM(CASE WHEN adev > $k * mad THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_outliers
       |FROM dev JOIN mad ON dev.l_returnflag = mad.l_returnflag
       |GROUP BY dev.l_returnflag
       |ORDER BY dev.l_returnflag""".stripMargin
}
