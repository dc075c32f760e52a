package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Events, Features, Insights, Validation}

/** Semantic invariants and plan-shape gates for the corpus-curation,
  * CUBE/spine, sweep-line, and cascade-audit wave (q82–q92).
  */
class CorpusSpec extends SparkSpec {

  test("shingle expr: short docs yield empty arrays, not descending ranges") {
    import spark.implicits._
    val df = Seq("one two three", "one", "").toDF("text")
      .withColumn("tks", expr(
        "filter(split(lower(trim(text)), '\\\\s+'), w -> w <> '')"))
      .select(Corpus.shinglesExpr("tks", 2).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) === Seq("one two", "two three"))
    assert(rows(1) === Seq.empty)
    assert(rows(2) === Seq.empty)
  }

  test("q82 shingle dedup: fractions bounded, short docs report zero") {
    val out = Corpus.shingleDedup(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_shingles")
      val d = r.getAs[Long]("n_dup_shingles")
      val f = r.getAs[Double]("dup_frac")
      assert(d <= n, s"dup count exceeds total in $r")
      assert(f >= 0.0 && f <= 1.0, s"dup_frac out of range in $r")
      if (n == 0L) assert(d == 0L && f == 0.0)
    }
  }

  test("q84 decontamination: flag consistent, eval slice excluded") {
    val out = Corpus.decontamination(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 5 != 0, s"eval doc leaked: $r")
      val hit = r.getAs[Long]("n_contaminated")
      assert(hit <= r.getAs[Long]("n_distinct_shingles"))
      assert((r.getAs[Int]("is_contaminated") == 1) == (hit > 0), s"$r")
    }
  }

  test("q87 sweep line matches a single-partition window cross-check") {
    // the scalable prefix sum must agree with Spark's own window
    // running-sum on the identical delta stream (small-sf only — the
    // cross-check funnels through one partition by construction)
    val viaPrefix = Events.concurrentSessions(spark, sf0001).collect()
    val sess = Events.sessionize(spark, sf0001)
      .select(col("session_start"), col("session_end"))
    val deltas = sess
      .select(col("session_start").as("ts"), lit(1).as("delta"))
      .unionAll(sess.select(col("session_end").as("ts"), lit(-1).as("delta")))
      .withColumn("k", unix_micros(col("ts")) * 2 +
        when(col("delta") === 1, lit(0)).otherwise(lit(1)))
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    val viaWindow = deltas
      .withColumn("conc", sum("delta").over(w))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(max("conc").as("max_concurrent"),
        count(lit(1)).as("n_boundaries"))
      .orderBy("day").collect()
    assert(viaPrefix.map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .toSeq === viaWindow.map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2))).toSeq)
  }

  test("q87 plan: the running sum never funnels through one partition") {
    val p = Events.concurrentSessions(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      s"sweep-line concurrency funneled through one partition:\n$p")
  }

  test("q85 cube plans one Expand; lattice covers all four grouping levels") {
    val df = Insights.revenueCube(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(p).length == 1,
      s"CUBE should plan exactly one Expand:\n$p")
    val rows = df.collect()
    val levels = rows.map(_.getAs[Int]("grouping_level")).toSet
    assert(levels === Set(0, 1, 2, 3))
    // grand total equals the sum of the finest cells (exact doubles: both
    // are the same decimal sum cast once)
    val grand = rows.filter(_.getAs[Int]("grouping_level") == 3)
    assert(grand.length == 1)
    val finest = rows.filter(_.getAs[Int]("grouping_level") == 0)
      .map(r => BigDecimal(r.getAs[Double]("revenue"))).sum
    assert((BigDecimal(grand.head.getAs[Double]("revenue")) - finest).abs
      < BigDecimal(1e-6) * finest.abs)
  }

  test("q86 month spine: contiguous months per region, zero-filled gaps") {
    val rows = Insights.monthSpineRevenue(spark, sf0001).collect()
    val byRegion = rows.groupBy(_.getAs[String]("region"))
    assert(byRegion.size == 5)
    val monthsPerRegion = byRegion.values.map(_.length).toSet
    assert(monthsPerRegion.size == 1, "regions disagree on spine length")
    byRegion.values.foreach { rs =>
      val ms = rs.map(r => r.getAs[Int]("sales_year") * 12 +
        r.getAs[Int]("sales_month") - 1).sorted
      assert(ms.zip(ms.tail).forall { case (a, b) => b == a + 1 },
        s"gap in month spine: ${ms.mkString(",")}")
    }
    assert(rows.exists(r => r.getAs[Double]("revenue") == 0.0 &&
      r.getAs[Long]("n_orders") == 0L), "expected at least one filled gap")
  }

  test("q88 transitions: ppm shares sum to at most one million per source type") {
    val rows = Events.transitionMatrix(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (ft, rs) =>
      val ppm = rs.map(_.getAs[Long]("p_ppm")).sum
      // floor division loses at most (n_groups - 1) ppm in total
      assert(ppm <= 1000000L && ppm > 1000000L - rs.length,
        s"from_type=$ft ppm sum $ppm")
    }
  }

  test("q90 interarrival: gaps non-negative and percentiles ordered") {
    val rows = Events.interarrival(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mn = r.getAs[Long]("min_gap_us")
      val mx = r.getAs[Long]("max_gap_us")
      val med = r.getAs[Double]("median_gap_us")
      val p90 = r.getAs[Double]("p90_gap_us")
      assert(mn >= 0L && mn <= mx)
      assert(med >= mn.toDouble && med <= p90 && p90 <= mx.toDouble, s"$r")
    }
  }

  test("q91 MAD outliers: fences are robust statistics over each flag") {
    val rows = Features.madOutliers(spark, sf0001).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Double]("mad") >= 0.0)
      assert(r.getAs[Long]("n_outliers") < r.getAs[Long]("n_rows"),
        "a MAD fence can never mark a majority as outliers")
    }
  }

  test("q92 GDPR cascade: arithmetic closes and lineitem matches a plain semi join") {
    val rows = Validation.gdprErasure(spark, sf0001).collect()
      .map(r => r.getAs[String]("table_name") -> r).toMap
    assert(rows.keySet === Set("customer", "orders", "lineitem"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("rows_after") ===
        r.getAs[Long]("rows_before") - r.getAs[Long]("rows_deleted"))
    }
    // the bloom-pruned cascade must delete exactly what an exact
    // (bloom-free) cascade deletes
    import graft.sources.Tables
    val tomb = Tables.customer(spark, sf0001)
      .filter(pmod(col("c_custkey"), lit(97)) === 0).select("c_custkey")
    val deadOrders = Tables.orders(spark, sf0001)
      .join(tomb.withColumnRenamed("c_custkey", "o_custkey"),
        Seq("o_custkey"), "left_semi")
    val deadLi = Tables.lineitem(spark, sf0001)
      .join(deadOrders.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_semi")
    assert(rows("orders").getAs[Long]("rows_deleted") === deadOrders.count())
    assert(rows("lineitem").getAs[Long]("rows_deleted") === deadLi.count())
  }

  test("q92 plan: the orders→lineitem cascade is bloom-pruned map-side") {
    val p = Validation.gdprErasure(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"expected a might_contain pre-filter on the lineitem scan:\n$p")
  }

  test("q196 pipeline: ledger telescopes, histogram reconciles, stages bite at sf0.01") {
    // sf0.01: large enough that every curation stage discriminates
    // (sf0.001's handful of gate admits has no near-dups to drop)
    val rows = Corpus.corpusPipeline(spark, "/root/testdata/sf0.01")
      .collect()
    val stages = rows.filter(_.getLong(0) <= 5L).sortBy(_.getLong(0))
    assert(stages.length === 5)
    // n_admitted = n_in - n_discarded on every stage row
    stages.foreach { r =>
      assert(r.getLong(3) === r.getLong(2) - r.getLong(4),
        s"stage ${r.getString(1)} does not balance: $r")
    }
    // the chain telescopes: n_in(k) = n_admitted(k-1)
    stages.sliding(2).foreach { case Array(prev, next) =>
      assert(next.getLong(2) === prev.getLong(3),
        s"handoff ${prev.getString(1)} -> ${next.getString(1)} leaks docs")
    }
    // every curation stage discriminates (admits AND discards)
    stages.take(4).foreach { r =>
      assert(r.getLong(3) > 0 && r.getLong(4) > 0,
        s"stage ${r.getString(1)} is vacuous at sf0.01: $r")
    }
    // the histogram reconciles with the packing stage: pack counts sum
    // to the stage-5 detail, and docs-per-pack times packs sums to the
    // sampled doc count
    val hist = rows.filter(_.getLong(0) >= 100L)
    assert(hist.map(_.getLong(3)).sum === stages(4).getLong(5),
      "histogram pack count != packs built")
    assert(hist.map(r => r.getLong(2) * r.getLong(3)).sum ===
      stages(4).getLong(3), "histogram docs != packed docs")
  }
}
