package graft

import graft.operators.StatQa

/** Semantic invariants for the statistical-QA wave (q101–q104). */
class StatQaSpec extends SparkSpec {

  test("q101 Benford: expected ppm shares are the log10 ladder and sum to ~1e6") {
    val rows = StatQa.benfordAudit(spark, sf0001).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    val exp = rows.map(_.getAs[Long]("expected_ppm"))
    assert(exp.head == 301029L && exp.last == 45757L) // floor(log10(2)e6), floor(log10(10/9)e6)
    assert(exp.sorted.reverse.toSeq == exp.toSeq, "expected ppm must decrease in d")
    val sumObs = rows.map(_.getAs[Long]("observed_ppm")).sum
    assert(sumObs <= 1000000L && sumObs > 1000000L - 9)
  }

  test("q102 independence: marginals close and contributions non-negative") {
    val rows = StatQa.segmentRegionIndependence(spark, sf0001).collect()
    val grand = rows.map(_.getAs[Long]("n")).sum
    rows.foreach { r =>
      assert(r.getAs[Double]("chi2_contrib") >= 0.0)
      assert(r.getAs[Double]("expected") > 0.0)
    }
    // row marginals equal the sum of each segment's cells, and the
    // distinct row marginals add back to the grand total
    val segs = rows.groupBy(_.getAs[String]("c_mktsegment"))
    segs.foreach { case (_, rs) =>
      assert(rs.head.getAs[Long]("row_total") == rs.map(_.getAs[Long]("n")).sum)
    }
    assert(segs.values.map(_.head.getAs[Long]("row_total")).sum == grand)
  }

  test("q103 anomalies: z-scores standardize (mean~0) and flags match the cut") {
    val rows = StatQa.dailyAnomalies(spark, sf0001).collect()
    assert(rows.length > 100)
    val zs = rows.map(_.getAs[Double]("z"))
    assert(math.abs(zs.sum / zs.length) < 1e-9, "z mean should be ~0")
    rows.foreach { r =>
      assert((r.getAs[Int]("is_anomaly") == 1) ==
        (math.abs(r.getAs[Double]("z")) > 3.0))
    }
  }

  test("q104 Gini: coefficients in [0,1) and a uniform distribution scores ~0") {
    val rows = StatQa.revenueGini(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= -1e-9 && g < 1.0, s"gini out of range: $r")
    }
  }

  test("q152 drift: metric inequalities hold and the split partitions the stream") {
    val rows = StatQa.valueDrift(spark, sf0001).collect()
    assert(rows.nonEmpty)
    var nTotal = 0L
    rows.foreach { r =>
      val tvd = r.getAs[Long]("tvd_ppm"); val linf = r.getAs[Long]("linf_ppm")
      assert(tvd >= 0L && tvd <= 1000000L, s"tvd out of range: $r")
      assert(linf <= 1000000L)
      // TVD = Σ|d| div 2 over ≤20 bins: max|d| ≤ Σ|d| gives
      // linf ≤ 2·tvd+1 (floor slack), Σ|d| ≤ 20·max|d| gives tvd ≤ 10·linf
      assert(linf <= 2 * tvd + 1, s"linf exceeds 2*tvd+1: $r")
      assert(tvd <= 10 * linf, s"tvd exceeds nBins/2 * linf: $r")
      nTotal += r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur")
    }
    // the midpoint split PARTITIONS the stream: no row lost or doubled
    assert(nTotal ===
      graft.sources.Tables.events(spark, sf0001).count())
  }

  test("q161 CMS: never undercounts; collision-free width gives exact counts") {
    import org.apache.spark.sql.functions._
    // the one-sided guarantee: min over depth counters >= true count
    val rows = StatQa.cmsShardCells(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"CMS undercounted: $r")
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"))
    }
    // width >> key cardinality: every bucket collision-free w.h.p. is
    // not certain, but the MIN over 4 independent rows is exact unless
    // a key collides in ALL rows (~(n/width)^depth ≈ 1e-10 here) — so
    // a huge width must reproduce the exact counts
    val wide = StatQa.cmsShardCells(spark, sf0001, width = 1 << 20)
      .collect()
    wide.foreach { r =>
      assert(r.getAs[Long]("overcount") === 0L,
        s"collision-free CMS not exact: $r")
    }
  }

  test("q178 KMV: merge is exact; the estimate lands within 3 sigma") {
    val r = StatQa.kmvShardCells(spark, sf0001).collect().head
    // the merge property: bottom-K of the per-shard bottom-Ks IS the
    // global bottom-K — exact equality, not a tolerance
    assert(r.getAs[Long]("merged_kth") === r.getAs[Long]("direct_kth"))
    val kUsed = r.getAs[Long]("k_used")
    val est = r.getAs[Double]("distinct_est")
    val exact = r.getAs[Long]("exact_distinct").toDouble
    assert(kUsed > 0 && est > 0)
    // KMV rsd ~ 1/sqrt(k-2); with k_used == n (sketch holds every
    // hash) the estimate is still within the same band
    val tol = 3.0 / math.sqrt(math.max(kUsed - 2, 1).toDouble)
    assert(math.abs(est / exact - 1.0) < tol,
      s"KMV estimate $est vs exact $exact outside 3-sigma ($tol)")
    // a smaller k must enter the true sketch regime (k_used == k < n)
    val small = StatQa.kmvShardCells(spark, sf0001, k = 8)
      .collect().head
    assert(small.getAs[Long]("k_used") === 8L)
    assert(small.getAs[Long]("merged_kth") === small.getAs[Long]("direct_kth"))
  }
}
