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

  /** Engine-portable exact-decimal → double conversion for values whose
    * SCALED integer exceeds 2^53. Above that line the two engines stop
    * agreeing on a plain cast: Spark rounds the decimal to double once
    * (correctly — BigDecimal.doubleValue), while DuckDB converts the
    * int128 payload and divides by 10^scale — two roundings, which for
    * ~1 in 2000 values lands 1 ulp away (observed: q69's second moments
    * at sf0.001). The fix decomposes the scaled integer at a 1e9
    * boundary:
    *
    *   sc = c * 10^scale          (exact integer, both engines)
    *   hi = sc div 1e9, lo = sc mod 1e9   (exact integer arithmetic)
    *   d  = (double(hi) * 1e9 + double(lo)) / 10^scale
    *
    * lo < 1e9 converts exactly; every remaining step is a single
    * correctly-rounded IEEE op on identical operands in both engines,
    * so the result is bit-identical by construction (it may differ from
    * the ideal single rounding in the last ulp — irrelevant, both
    * engines agree). `scale` must be ≥ the value's fractional digits
    * (so sc is integral) and the value nonnegative with sc < ~1.8e28
    * (hi must fit an exact uint64 conversion); decimal moments are far
    * inside both bounds.
    */
  def decToDouble(c: org.apache.spark.sql.Column,
      scale: Int): org.apache.spark.sql.Column = {
    val pow = BigInt(10).pow(scale).toLong
    // decimal(29,0): big enough for any moment here, small enough that
    // the /1e9 quotient keeps ≥9 fractional digits after Spark's
    // precision-cap scale adjustment — i.e. floor() sees the exact value
    val sc = (c * lit(pow)).cast("decimal(29,0)")
    val hi = floor(sc / lit(1000000000L)).cast("decimal(29,0)")
    val lo = (sc - hi * lit(1000000000L)).cast("decimal(29,0)")
    (hi.cast("double") * lit(1.0e9) + lo.cast("double")) /
      lit(pow.toDouble)
  }

  /** DuckDB twin of [[decToDouble]] — same decomposition on HUGEINT. */
  def decToDoubleSql(e: String, scale: Int): String = {
    val pow = BigInt(10).pow(scale)
    s"""((CAST(CAST(($e) * $pow AS HUGEINT) // 1000000000 AS DOUBLE)
       |  * 1000000000.0
       |  + CAST(CAST(($e) * $pow AS HUGEINT) % 1000000000 AS DOUBLE))
       |  / $pow.0)""".stripMargin
  }

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
      // second moments overflow the 2^53 exact-cast range — convert via
      // the [[decToDouble]] decomposition (plain casts diverge 1 ulp
      // between engines; observed on syy at sf0.001)
      .select(col("l_returnflag"), col("n"),
        col("n").cast("double").as("nd"),
        decToDouble(col("sx"), 2).as("sxd"),
        decToDouble(col("sy"), 2).as("syd"),
        decToDouble(col("sxx"), 4).as("sxxd"),
        decToDouble(col("syy"), 4).as("syyd"),
        decToDouble(col("sxy"), 4).as("sxyd"))
      .select(col("l_returnflag"), col("n"),
        ((col("nd") * col("sxyd") - col("sxd") * col("syd")) /
          (sqrt(col("nd") * col("sxxd") - col("sxd") * col("sxd")) *
            sqrt(col("nd") * col("syyd") - col("syd") * col("syd"))))
          .as("corr_qty_price"),
        ((col("nd") * col("sxyd") - col("sxd") * col("syd")) /
          (col("nd") * col("sxxd") - col("sxd") * col("sxd")))
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
    val d = s"""SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
               |    ${decToDoubleSql("sx", 2)} AS sxd,
               |    ${decToDoubleSql("sy", 2)} AS syd,
               |    ${decToDoubleSql("sxx", 4)} AS sxxd,
               |    ${decToDoubleSql("syy", 4)} AS syyd,
               |    ${decToDoubleSql("sxy", 4)} AS sxyd
               |  FROM ($m)""".stripMargin
    s"""SELECT l_returnflag, n,
       |  (nd * sxyd - sxd * syd)
       |  / (sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd))
       |    AS corr_qty_price,
       |  (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
       |    AS beta_price_per_qty
       |FROM (
       |  $d)
       |ORDER BY l_returnflag""".stripMargin
  }

  /** Analytic rank functions: percent_rank and cume_dist of part price
    * within its type — the [0,1]-normalized rank features a model
    * pipeline feeds instead of raw prices. Both engines define
    * percent_rank = (rank-1)/(n-1) and cume_dist = rank_rows/n; with
    * the unique (price, partkey) order the ranks are tie-free, so the
    * doubles are single identical IEEE divisions. Types with one part
    * are excluded (percent_rank's 0/0 is engine-defined there).
    * The window partitions by p_type — bounded by the type domain.
    */
  def priceRanks(spark: SparkSession, sfDir: String): DataFrame = {
    val byType = Window.partitionBy("p_type")
    val ord = Window.partitionBy("p_type")
      .orderBy(col("price"), col("p_partkey"))
    Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_type"),
        col("p_retailprice").as("price"))
      .withColumn("n_in_type", count(lit(1)).over(byType))
      .filter(col("n_in_type") >= 2)
      .withColumn("pr", percent_rank().over(ord))
      .withColumn("cd", cume_dist().over(ord))
      .orderBy("p_type", "price", "p_partkey")
  }

  val priceRanksSql: String =
    """WITH c AS (
      |  SELECT p_partkey, p_type, p_retailprice AS price,
      |    COUNT(*) OVER (PARTITION BY p_type) AS n_in_type
      |  FROM part),
      |f AS (SELECT * FROM c WHERE n_in_type >= 2)
      |SELECT p_partkey, p_type, price, CAST(n_in_type AS BIGINT)
      |    AS n_in_type,
      |  PERCENT_RANK() OVER (PARTITION BY p_type
      |    ORDER BY price, p_partkey) AS pr,
      |  CUME_DIST() OVER (PARTITION BY p_type
      |    ORDER BY price, p_partkey) AS cd
      |FROM f
      |ORDER BY p_type, price, p_partkey""".stripMargin

  /** Exact weighted median (lower median) of line price weighted by
    * quantity, per return flag: the smallest price whose cumulative
    * weight reaches half the total. Entirely integer arithmetic on the
    * weights (quantity is integral), so the breakpoint is
    * engine-exact — no percentile interpolation. Collapses to
    * (flag, price) grain first (partial agg), then one per-flag
    * prefix-sum window; for a corpus where one flag's distinct-price
    * set outgrows a partition, the scale path is the
    * [[ScalableKeys.withPrefixSum]] range-partition + offsets form.
    */
  def weightedMedian(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Window.partitionBy("l_returnflag").orderBy("price")
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.partitionBy("l_returnflag")
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice").as("price"),
        round(col("l_quantity")).cast("long").as("w"))
      .groupBy("l_returnflag", "price").agg(sum("w").as("w"))
      .withColumn("cumw", sum("w").over(ord))
      .withColumn("total", sum("w").over(all))
      .filter(col("cumw") * 2 >= col("total"))
      .groupBy("l_returnflag")
      .agg(min("price").as("weighted_median"),
        max("total").as("total_weight"))
      .orderBy("l_returnflag")
  }

  val weightedMedianSql: String =
    """WITH g AS (
      |  SELECT l_returnflag, l_extendedprice AS price,
      |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT l_returnflag, price, w,
      |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
      |    SUM(w) OVER (PARTITION BY l_returnflag) AS total
      |  FROM g)
      |SELECT l_returnflag, MIN(price) AS weighted_median,
      |  CAST(MAX(total) AS BIGINT) AS total_weight
      |FROM c WHERE cumw * 2 >= total
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

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
