package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._

/** Round-4 wave 2: skyline, weighted/stratified sampling, heavy
  * hitters, FULL OUTER reconcile, BPE merges, TopK aggregator, weekday
  * seasonality, and the portable decimal→double conversion.
  */
class Wave4Spec extends SparkSpec {
  import spark.implicits._

  test("skyline2d matches the definitional NOT-EXISTS dominance filter") {
    val pts = Seq((10.0, 5L), (10.0, 5L), (9.0, 5L), (10.0, 7L),
      (11.0, 9L), (11.0, 2L), (9.0, 4L), (12.0, 9L))
      .toDF("price", "psize")
    val got = Skyline.skyline2d(pts, "price", "psize")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    // brute force: p survives iff no q dominates it
    val rows = pts.collect().map(r => (r.getDouble(0), r.getLong(1)))
    val want = rows.filter { case (pp, ps) =>
      !rows.exists { case (qp, qs) =>
        qp <= pp && qs >= ps && (qp < pp || qs > ps) }
    }.toSet
    assert(got === want)
    assert(got === Set((9.0, 5L), (10.0, 7L), (11.0, 9L)))
  }

  test("skyline2d is independent of the bucket count") {
    val pts = Seq.tabulate(200) { i =>
      (((i * 37) % 97).toDouble, ((i * 53) % 89).toLong)
    }.toDF("price", "psize")
    def run(b: Int) = Skyline.skyline2d(pts, "price", "psize", buckets = b)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    assert(run(1) === run(8))
    assert(run(8) === run(32))
  }

  test("weightedSample: deterministic, k rows, priorities ascending") {
    val a = Sampling.weightedSample(spark, sf0001, k = 20).collect()
    val b = Sampling.weightedSample(spark, sf0001, k = 20).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 20)
    val pr = a.map(_.getAs[Double]("priority"))
    assert(pr.sliding(2).forall { case Array(x, y) => x <= y })
  }

  test("stratifiedSample: exactly ceil(n/denom) rows per language") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val expected = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> ((r.getLong(1) + 4) / 5)).toMap
    val got = Sampling.stratifiedSample(spark, sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("heavyHitters: ordered by count desc, shares bounded by 1e6 ppm") {
    val hh = StatQa.heavyHitters(spark, sf0001).collect()
    assert(hh.nonEmpty && hh.length <= 20)
    val cnts = hh.map(_.getAs[Long]("cnt"))
    assert(cnts.sliding(2).forall { case Array(x, y) => x >= y })
    assert(hh.map(_.getAs[Long]("share_ppm")).sum <= 1000000L)
  }

  test("dailyReconcile: presence flag consistent with coalesced metrics") {
    val r = Validation.dailyReconcile(spark, sf0001).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (no, ne, p) = (row.getAs[Long]("n_orders"),
        row.getAs[Long]("n_events"), row.getAs[String]("presence"))
      p match {
        case "both"        => assert(no > 0 && ne > 0)
        case "orders_only" => assert(no > 0 && ne == 0)
        case "events_only" => assert(no == 0 && ne > 0)
      }
    }
    // both sources exist in the testdata, so both one-sided kinds occur
    assert(r.map(_.getAs[String]("presence")).toSet.contains("orders_only"))
  }

  test("bpeMerges: 2-char pairs, desc counts, bounded by total pair mass") {
    val m = Corpus.bpeMerges(spark, sf0001).collect()
    assert(m.length === 20)
    assert(m.forall(_.getAs[String]("pair").length === 2))
    val cs = m.map(_.getAs[Long]("merge_count"))
    assert(cs.sliding(2).forall { case Array(x, y) => x >= y })
    // total pair mass = sum over word instances of (len-1)
    val totalPairs = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .agg(sum(length(col("w")) - 1)).as[Long].first()
    assert(cs.sum <= totalPairs)
  }

  test("TopKByValue aggregator == ROW_NUMBER window, incl. merge path") {
    val df = Seq(
      ("A", 5.0, 1L, "a1"), ("A", 7.0, 2L, "a2"), ("A", 7.0, 3L, "a3"),
      ("A", 1.0, 4L, "a4"), ("B", 2.0, 5L, "b1"), ("B", 3.0, 6L, "b2"),
      ("C", 9.0, 7L, "c1"))
      .toDF("g", "v", "k", "t").repartition(7)
    val tk = udaf(graft.functions.TopKByValue(2))
    val got = df.groupBy("g").agg(tk(col("v"), col("k"), col("t")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        col("col.key"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("k"))
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 2)
      .select("g", "rank", "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    // tie at v=7.0 in group A breaks toward the lower key
    assert(got.contains(("A", 1L, 2L)) && got.contains(("A", 2L, 3L)))
  }

  test("weekdaySeasonality: 7 weekdays, ppm shares sum to ~1e6") {
    val r = RetailBi.weekdaySeasonality(spark, sf0001).collect()
    assert(r.map(_.getAs[Int]("weekday")).toSeq === (1 to 7))
    val shares = r.map(_.getAs[Long]("share_ppm"))
    assert(shares.sum <= 1000000L && shares.sum > 1000000L - 7)
    r.foreach { row =>
      val (s, i) = (row.getAs[Long]("share_ppm"), row.getAs[Long]("index_ppm"))
      // index is the 7x-scaled share, up to floor effects
      assert(math.abs(i - 7 * s) <= 7)
    }
  }

  test("priceRanks: pr and cd span (0..1] per type, tie-free order") {
    val r = Features.priceRanks(spark, sf0001).collect()
    assert(r.nonEmpty)
    val byType = r.groupBy(_.getAs[String]("p_type"))
    byType.foreach { case (_, rows) =>
      val prs = rows.map(_.getAs[Double]("pr"))
      val cds = rows.map(_.getAs[Double]("cd"))
      assert(prs.min === 0.0 && prs.max === 1.0)
      assert(cds.max === 1.0 && cds.forall(c => c > 0.0 && c <= 1.0))
    }
  }

  test("weightedMedian matches the brute-force prefix-sum breakpoint") {
    val got = Features.weightedMedian(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_extendedprice"),
        round(col("l_quantity")).cast("long").as("w")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    li.groupBy(_._1).foreach { case (flag, rows) =>
      val sorted = rows.sortBy(_._2)
      val total = rows.map(_._3).sum
      var cum = 0L
      val median = sorted.find { case (_, _, w) =>
        cum += w; cum * 2 >= total }.get._2
      assert(got(flag) === ((median, total)), s"flag $flag")
    }
  }

  test("qualifiedOrders: every order has a qualifying line, none disqualifying") {
    val orders = Insights.qualifiedOrders(spark, sf0001).collect()
      .map(_.getAs[Long]("o_orderkey")).toSet
    assert(orders.nonEmpty)
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity", "l_discount").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    orders.foreach { ok =>
      val lines = li.filter(_._1 == ok)
      assert(lines.exists(_._2 >= 45.0), s"order $ok lacks a big line")
      assert(!lines.exists(_._3 > 0.08), s"order $ok has a discounted line")
    }
  }

  test("TopKByValue O(k) buffer == ROW_NUMBER window on a random stream") {
    // larger deterministic pseudo-random input exercises the sorted
    // insert (head/middle/tail/skip) and linear-merge paths
    val df = Seq.tabulate(500) { i =>
      (s"g${i % 3}", ((i * 7919) % 101).toDouble, i.toLong, s"t$i")
    }.toDF("g", "v", "k", "t").repartition(13)
    val tk = udaf(graft.functions.TopKByValue(7))
    val got = df.groupBy("g").agg(tk(col("v"), col("k"), col("t")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        col("col.key"), col("col.tag"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("k"))
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 7)
      .select("g", "rank", "k", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(got === want)
  }

  test("basketPairs mega-basket cap bounds the pair fan-out") {
    // one degenerate 60-item basket + two normal 2-item baskets
    val rows = (1 to 60).map(i => (1L, i.toLong)) ++
      Seq((2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L))
    val li = rows.toDF("l_orderkey", "l_partkey")
    val proxy = (1 to 60).map(_.toLong).toDF("p_partkey")
    def run(cap: Int) =
      RetailBi.basketPairsFrom(li, proxy, minPairs = 1, maxItems = cap)
    // uncapped: the mega basket contributes C(60,2) pairs
    assert(run(64).count() === 60L * 59 / 2)
    // capped at 8: only the first 8 sorted items pair up -> C(8,2),
    // and the small baskets' pair (1,2) keeps its FULL uncapped counts
    val capped = run(8)
    assert(capped.count() === 8L * 7 / 2)
    val p12 = capped.filter(col("part_a") === 1 && col("part_b") === 2)
      .select("n_pair", "n_a", "n_b").collect().head
    assert(p12.getLong(0) === 3L) // orders 1, 2, 3 all pair (1,2)
    assert(p12.getLong(1) === 3L && p12.getLong(2) === 3L) // counts uncapped
  }

  test("item_pairs matches the HOF pair enumeration on real baskets") {
    val bk = RetailBi.baskets(
      graft.sources.Tables.lineitem(spark, sf0001))
    def countsOf(pairs: org.apache.spark.sql.DataFrame) = pairs
      .groupBy("part_a", "part_b").count()
      .orderBy("part_a", "part_b").collect().toSeq
    val native = countsOf(bk
      .select(explode(graft.functions.item_pairs(col("items"), 8)).as("pr"))
      .select(col("pr.part_a"), col("pr.part_b")))
    val hof = countsOf(bk
      .withColumn("citems", expr("slice(items, 1, 8)"))
      .select(explode(expr(
        """flatten(transform(citems,
          |  (x, i) -> transform(slice(citems, i + 2, size(citems)),
          |    y -> struct(x AS part_a, y AS part_b))))""".stripMargin))
        .as("pr"))
      .select(col("pr.part_a"), col("pr.part_b")))
    assert(native === hof)
    assert(native.nonEmpty)
  }

  test("decToDouble: exact below 2^53, replay-identical above it") {
    val df = Seq("123.45", "7096786968835.8685")
      .toDF("s").select(col("s").cast("decimal(38,4)").as("x"))
      .select(Features.decToDouble(col("x"), 4).as("d"))
    val Array(small, big) = df.collect().map(_.getDouble(0))
    assert(small === 123.45)
    // hi/lo decomposition replay (what DuckDB computes too); note this
    // deliberately differs from the single-rounded 7096786968835.868
    val want = (70967869.0 * 1e9 + 688358685.0) / 10000.0
    assert(big === want)
  }
}
