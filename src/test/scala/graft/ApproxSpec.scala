package graft

import org.apache.spark.sql.functions._

import graft.operators.{Insights, StatQa}
import graft.sources.Tables

/** Approximate-twin contracts (q119/q120): the rows-only registered
  * sketch queries must track their exact counterparts within the
  * documented tolerance — asserted here because the driver oracle
  * can't hash implementation-defined sketch output.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("q119 approx percentiles within 5% of the exact q49 values") {
    val exact = Insights.percentileSummary(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val approx = Insights.approxPercentileSummary(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(approx.keySet === exact.keySet)
    def close(a: Double, e: Double): Boolean =
      math.abs(a - e) <= 0.05 * math.max(math.abs(e), 1.0)
    exact.foreach { case (flag, (mq, pq, mp)) =>
      val (amq, apq, amp) = approx(flag)
      assert(close(amq, mq), s"median_qty $flag: $amq vs $mq")
      assert(close(apq, pq), s"p90_qty $flag: $apq vs $pq")
      assert(close(amp, mp), s"median_price $flag: $amp vs $mp")
    }
  }

  test("q120 approx heavy hitters == exact q110, certificate attested") {
    // capacity (1024) far exceeds the user domain at sf0.001, so no
    // partition ever decrements (Σd_p = 0) and the certificate must
    // hold: the candidate path is PROVEN equal to the exact query
    val exact = StatQa.heavyHitters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (df, certified) = StatQa.approxHeavyHittersCertified(
      Tables.events(spark, sf0001), "user_id", topN = 20, capacity = 1024)
    assert(certified, "Σ-decrement certificate must hold at sf0.001")
    val approx = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(approx.toSeq === exact.toSeq)
  }

  test("q120 fallback regime: near-uniform data fails the certificate, output still exact") {
    // 100 keys x5 each with capacity 4: every partition decrements
    // constantly, Σd_p >> 5 = the top count — no heavy hitter is
    // certifiable and the operator must take the exact-groupBy
    // fallback, whose output is the true top-N regardless
    val df = (1L to 100L).flatMap(k => Seq.fill(5)(k))
      .toDF("user_id").repartition(8)
    val (got, certified) = StatQa.approxHeavyHittersCertified(
      df, "user_id", topN = 3, capacity = 4)
    assert(!certified, "near-uniform fixture must fail the certificate")
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 5L), (2L, 5L), (3L, 5L)))
  }

  test("q120 under-filled candidate set must NOT certify (round-14)") {
    // The exact ADVICE counterexample: capacity 2 over a×10,b×10,c in
    // ONE partition -> candidates {a,b}, Σd_p = 1. The old certificate
    // (min reported count 10 > 1) would pass while omitting c, which
    // the exact top-3 includes. With the length==topN guard the
    // certificate fails and the exact fallback returns all 3 rows.
    val rows = Seq.fill(10)(1L) ++ Seq.fill(10)(2L) ++ Seq(3L)
    val df = rows.toDF("user_id").coalesce(1)
    val (got, certified) = StatQa.approxHeavyHittersCertified(
      df, "user_id", topN = 3, capacity = 2)
    assert(!certified,
      "under-filled candidate set with Σd_p ≥ 1 must not certify")
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 10L), (2L, 10L), (3L, 1L)))
  }

  test("q136 sketch sweep: shipped defaults sit on the knee of the curve") {
    // measured at sf0.001 AND sf0.01 when this was written: hll err
    // ~{rsd .05: 6.4%, .02: 0.4%, .01: 0.5-0.7%}, t-digest err
    // ~{acc 100: 1.7-3.8%, 1000: 0.14-0.27%, 10000: 0.02-0.08%} — each
    // bound below carries ≥4x margin over the observed values
    val full = Insights.sketchAccuracySweep(spark, sf0001).collect()
    // round-13: every dial row carries its documented ceiling in-row
    // (bound_ppm) and the computed within_bound bit — assert ALL dials
    // clear their bounds, not just the shipped defaults
    full.foreach { r =>
      assert(r.getAs[Long]("within_bound") == 1L,
        s"${r.getString(0)} dial ${r.getLong(1)}: err " +
          s"${r.getAs[Long]("max_err_ppm")} ppm exceeds its in-row " +
          s"bound ${r.getAs[Long]("bound_ppm")} ppm")
    }
    val rows = full
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(rows.keySet === Set(
      ("hll_count_distinct", 50000L), ("hll_count_distinct", 20000L),
      ("hll_count_distinct", 10000L), ("tdigest_percentile", 100L),
      ("tdigest_percentile", 1000L), ("tdigest_percentile", 10000L)))
    // q45's default (rsd = 0.01): well inside dashboard tolerance
    assert(rows(("hll_count_distinct", 10000L)) <= 30000L,
      s"hll default err ${rows(("hll_count_distinct", 10000L))} ppm")
    // q119's default (accuracy = 10000): sub-0.5% error, and the
    // t-digest curve is monotone — paying less accuracy costs error
    val td = Seq(100L, 1000L, 10000L).map(d => rows(("tdigest_percentile", d)))
    assert(td(2) <= 5000L, s"t-digest default err ${td(2)} ppm")
    assert(td(2) <= td(1) && td(1) <= td(0),
      s"t-digest error not monotone in accuracy: $td")
  }

  test("q139 sampled KPI: HT interval covers the exact total") {
    // the sample is hash-deterministic, so this is a fixed (not flaky)
    // check; the exact totals come from the full-scan q05 machinery.
    // 10% here (n ≈ 600): the fixture is only 6000 rows and a 1%
    // sample (n ≈ 60) of a right-skewed revenue column undercovers —
    // the normal approximation needs a few hundred draws; the
    // registered query's 1% at sf0.01+ was checked to cover.
    val p = 10
    val row = Insights.sampledKpi(spark, sf0001, pctSample = p).collect()(0)
    val (n, est, estLines, ci) = (row.getLong(0), row.getDouble(1),
      row.getLong(2), row.getDouble(3))
    val exact = Insights.kpiSummary(spark, sf0001)
      .select("total_revenue", "n_lines").collect()(0)
    val (trueRev, trueLines) = (exact.getDouble(0), exact.getLong(1))
    assert(n > 100, s"sample too small: $n")
    assert(ci > 0.0)
    assert(math.abs(est - trueRev) <= ci,
      s"est $est misses true $trueRev by more than ci $ci")
    // count estimator: binomial 95% band around the true line count
    val pr = p / 100.0
    val se = math.sqrt(trueLines * pr * (1 - pr)) / pr
    assert(math.abs(estLines.toDouble - trueLines) <= 2.5 * se,
      s"est_lines $estLines vs true $trueLines (se $se)")
  }

  test("q145 per-group HT intervals cover the exact per-brand revenue") {
    // hash-deterministic sample, so fixed not flaky; the exact totals
    // are the full-scan rev_e4 sums per brand. Gates measured at
    // sf0.001/sf0.01: every group within 1x..1.3x its CI (worst 0.87 /
    // 1.30) — assert ALL within 2x (cushion for testdata regens; a
    // per-group miss probability ~1e-4 under the CLT) and the nominal
    // 95% behavior on the panel (>= 80% of groups within 1x).
    val est = Insights.sampledGroupKpi(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg((sum(expr(
        """CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
          |(100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT))
          |AS DECIMAL(38,0))""".stripMargin)).cast("double") / lit(1e4))
        .as("rev"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est.keySet === exact.keySet, "brand coverage differs")
    val ratios = exact.map { case (b, t) =>
      val (n, e, ci) = est(b)
      assert(n > 0, s"$b: empty sample group")
      assert(ci > 0.0, s"$b: degenerate interval")
      math.abs(e - t) / ci
    }
    ratios.foreach(r => assert(r <= 2.0,
      s"a group's estimate misses its exact total by ${r}x the CI"))
    val within1 = ratios.count(_ <= 1.0)
    assert(within1 >= (ratios.size * 0.8).toInt,
      s"only $within1/${ratios.size} groups inside the nominal 95% CI")
  }

  test("q150 histogram-cell percentiles within one bucket width of exact") {
    val nb = 4096
    val got = Insights.histogramPercentileCells(spark, sf0001, nb)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet === Set(50L, 90L, 99L))
    // exact percentiles under the same rank rule (ceil(N*p/100), value
    // at that rank) over the same cents domain
    val cents = Tables.lineitem(spark, sf0001)
      .select(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("c"))
      .collect().map(_.getLong(0)).sorted
    val width = (cents.last - cents.head + 1).toDouble / nb / 100.0
    Seq(50L, 90L, 99L).foreach { p =>
      val exact = cents(((cents.length * p + 99) / 100 - 1).toInt) / 100.0
      assert(math.abs(got(p) - exact) <= width,
        s"p$p: est ${got(p)} vs exact $exact (bucket width $width)")
    }
  }

  test("q120 capacity bound still recalls a planted heavy key") {
    // adversarial fixture: 5000 distinct singleton keys + one key with
    // 500 occurrences, summarized with capacity 16 << 5001 distinct.
    // MG guarantee: 500 > n/capacity = 5500/16 = 344 -> must survive,
    // and its verified count is exact.
    val rows = (1L to 5000L) ++ Seq.fill(500)(777777L)
    val df = rows.toDF("user_id").repartition(8)
    // Σd_p ≤ n/(capacity+1) = 5500/17 ≈ 323 < 500, so the certificate
    // must also hold: the planted key is PROVABLY the exact top-1
    val (res, certified) = StatQa.approxHeavyHittersCertified(
      df, "user_id", topN = 1, capacity = 16)
    assert(certified, "planted heavy key must clear the Σd_p bound")
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((777777L, 500L)))
  }
}
