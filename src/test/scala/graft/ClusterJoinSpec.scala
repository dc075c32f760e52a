package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Insights, Joins}
import graft.sources.Tables

/** Invariants for the round-3 graph/join additions beyond the oracle
  * hash check.
  */
class ClusterJoinSpec extends SparkSpec {

  test("dedupClusters: both endpoints of every near-dup pair share a cluster; canonical is the min") {
    val pairs = Dedup.neardupPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.dedupClusters(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid canonical is not min id")
    }
  }

  test("bloomSemiJoin equals the plain semi join and plans a map-side might_contain") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
    val hv = Tables.orders(spark, sf0001)
      .filter(col("o_totalprice").cast("double") > 400000.0)
      .select("o_orderkey")
    val bloomed = Joins.bloomSemiJoin(li, "l_orderkey", hv, "o_orderkey",
      expectedItems = 10000L)
    val plain = li.join(hv.select(col("o_orderkey").as("l_orderkey")).distinct(),
      Seq("l_orderkey"), "left_semi")
    assert(bloomed.count() == plain.count())
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a might_contain pre-filter in:\n$plan")
  }

  test("bloomSemiJoin with an empty build side returns no rows") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    val none = Tables.orders(spark, sf0001)
      .filter(col("o_totalprice").cast("double") > 1e18)
      .select("o_orderkey")
    assert(Joins.bloomSemiJoin(li, "l_orderkey", none, "o_orderkey").count() == 0)
  }

  test("incremental rollup merge equals the single-pass rollup") {
    val full = graft.operators.Events.dailyTypeRollup(spark, sf0001)
    val inc = graft.operators.Events.incrementalDailyRollup(spark, sf0001)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
  }

  test("asofBackward: inclusive boundary, same-ts determinism, no-match nulls, one WindowExec") {
    import spark.implicits._
    import graft.operators.Joins
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // exact-ts right row -> inclusive
      (1L, 11L, ts("2024-01-01 11:00:00")),  // picks latest prior
      (2L, 20L, ts("2024-01-01 09:00:00")),  // right rows only AFTER -> null
      (3L, 30L, ts("2024-01-01 12:00:00")))  // two right rows same ts
      .toDF("k", "lid", "lts")
    val right = Seq(
      (1L, 100L, ts("2024-01-01 09:30:00")),
      (1L, 101L, ts("2024-01-01 10:00:00")),  // == left 10's ts
      (1L, 102L, ts("2024-01-01 10:30:00")),
      (2L, 200L, ts("2024-01-01 09:30:00")),  // after left 20
      (3L, 300L, ts("2024-01-01 11:00:00")),  // same ts as 301
      (3L, 301L, ts("2024-01-01 11:00:00")))
      .toDF("k", "rid", "rts")
    val out = Joins.asofBackward(left, right, "k",
      leftTs = "lts", rightTs = "rts", rightOrd = "rid")
    val byLid = out.collect().map(r =>
      r.getLong(1) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(byLid(10L) == 101L, "equal-ts right row must match (inclusive)")
    assert(byLid(11L) == 102L, "latest prior right row wins")
    assert(byLid(20L) == -1L, "no prior right row -> null payload")
    assert(byLid(30L) == 301L, "same-ts right rows: largest rightOrd wins")
    // AQE prints Final + Initial plans; count in the final section only
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Window ".r.findAllIn(plan).length == 1,
      s"both picks should share one WindowExec in:\n$plan")
  }

  test("q61 query plan keeps the bloom filter below the semi join") {
    val plan = Insights.highValueItems(spark, sf0001)
      .queryExecution.executedPlan.toString
    val filterPos = plan.indexOf("might_contain")
    val joinPos = plan.indexOf("LeftSemi")
    assert(filterPos >= 0 && joinPos >= 0 && filterPos > joinPos,
      "bloom pre-filter should appear beneath (after, in tree print) the semi join")
  }

  test("allPairsJaccard prefix filter is EXACT: equals the unpruned all-pairs join") {
    // The prefix-filtering lemma (q185): indexing only each doc's
    // |x| - ceil(tau*|x|) + 1 rarest shingles must lose NO qualifying
    // pair. Brute-force twin: candidates = pairs sharing ANY shingle
    // (complete by definition - a pair sharing none has J = 0 < tau),
    // then the identical verification. Affordable only at sf0.001,
    // which is exactly why the lemma is proven here and not in the
    // oracle (which restates the pruned plan).
    val (tauNum, tauDen) = (3, 5)
    val tk = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        explode(array_distinct(expr(Dedup.shinglesExprSpark))).as("t"))
      .localCheckpoint(true)
    val sizes = tk.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val candAll = tk.select(col("doc_id").as("doc_a"), col("t"))
      .join(tk.select(col("doc_id").as("doc_b"), col("t")), Seq("t"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val brute = candAll
      .join(tk.select(col("doc_id").as("doc_a"), col("t")), Seq("doc_a"))
      .join(tk.select(col("doc_id").as("doc_b"), col("t")), Seq("doc_b", "t"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("o"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")),
        Seq("doc_b"))
      .filter(col("o") * (tauNum + tauDen) >=
        lit(tauNum) * (col("sz_a") + col("sz_b")))
      .select("doc_a", "doc_b", "o")
    val pruned = Dedup.allPairsJaccard(spark, sf0001, tauNum, tauDen)
      .select("doc_a", "doc_b", "o")
    assert(pruned.count() > 0, "no qualifying pairs - vacuous")
    assert(pruned.exceptAll(brute).isEmpty && brute.exceptAll(pruned).isEmpty,
      "prefix-filtered result differs from the unpruned all-pairs join")
    // and the pruning is real: far fewer candidates than any-shared-shingle
    val nAll = candAll.count()
    assert(nAll > pruned.count() * 10,
      s"brute candidate space ($nAll) should dwarf the qualifying set " +
        s"(${pruned.count()}) or the fixture is degenerate")
  }

  test("sorted_intersect_count == size(array_intersect) on real shingle kernels") {
    // the round-15 merge-walk kernel's contract (sorted distinct long
    // arrays, the ShingleHashesExpr output): value-identical to the
    // built-in on every cross pair of the real corpus' shingle arrays
    val hs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.shingle_hashes(col("text")).as("hs"))
      .localCheckpoint(true)
    val pairs = hs.select(col("doc_id").as("a"), col("hs").as("ha"))
      .join(hs.select(col("doc_id").as("b"), col("hs").as("hb")),
        col("a") < col("b"))
    val diff = pairs.filter(
      graft.functions.sorted_intersect_count(col("ha"), col("hb")) =!=
        size(array_intersect(col("ha"), col("hb"))).cast("long"))
      .count()
    assert(diff === 0L,
      "merge-walk intersect count diverged from array_intersect")
    // non-vacuous: some pair must actually intersect
    val some = pairs.filter(
      graft.functions.sorted_intersect_count(col("ha"), col("hb")) > 0)
      .count()
    assert(some > 0L, "no intersecting pairs - vacuous fixture")
  }

  test("q197 deletion-neighborhood blocking is COMPLETE for distance <= 1") {
    // The FastSS lemma the operator rests on: strings at edit distance
    // <= 1 always share a key in K(s) = {s} ∪ D(s). Brute-force twin:
    // dictionary × dirty cross join with levenshtein <= 1 (64 distinct
    // names × 200 dirty rows at sf0.001 — affordable here, never in
    // the operator). The blocked join must find the IDENTICAL best
    // match per dirty row.
    import org.apache.spark.sql.functions._
    val part = Tables.part(spark, sf0001)
      .select(col("p_partkey"), col("p_name"))
    val dict = part.groupBy("p_name").agg(min("p_partkey").as("name_id"))
    val hashPos = "(pmod(CAST(conv(substring(md5(CAST(concat('fz:', " +
      "CAST(p_partkey AS STRING)) AS BINARY)), 1, 15), 16, 10) AS BIGINT)," +
      " length(p_name)) + 1)"
    val dirty = part.select(col("p_partkey").as("dirty_key"),
      expr(s"""concat(substring(p_name, 1, $hashPos - 1),
        substring(p_name, $hashPos + 1)) AS dirty_name"""))
    val brute = dirty.crossJoin(
        dict.select(col("name_id"), col("p_name").as("clean")))
      .withColumn("distance",
        levenshtein(col("dirty_name"), col("clean")).cast("long"))
      .filter(col("distance") <= 1)
      .groupBy("dirty_key")
      .agg(min(struct(col("distance"), col("name_id"))).as("best"),
        count(lit(1)).as("n_matches"))
      .select(col("dirty_key"),
        col("best").getField("name_id").as("matched_key"),
        col("best").getField("distance").as("distance"),
        col("n_matches"))
    val blocked = graft.operators.Joins.fuzzyNameJoin(spark, sf0001)
    assert(blocked.exceptAll(brute).count() === 0 &&
      brute.exceptAll(blocked).count() === 0,
      "deletion-blocked fuzzy join differs from the brute-force " +
        "distance<=1 join - the blocking lost a candidate")
  }

  test("q204 semantic endgame: components match driver union-find on q203 edges; survivor is the gate-score argmax") {
    // independent re-derivation: collect the (bounded, sf0.001) mutual-
    // kNN edge list, run a plain union-find driver-side, and check the
    // registered query's cluster count, size multiset, and keep-best
    // choice against it — NOT via propagateMinLabels, so a labeling bug
    // can't self-confirm
    val edges = graft.operators.Similarity.mutualKnnGraph(spark, sf0001)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = parent.keys.toSeq.groupBy(find)
    val scores = graft.operators.Corpus.docGateScores(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = members.map { case (_, ms) =>
      val cid = ms.min
      val keep = ms.minBy(m => (-scores(m), m))
      (cid, keep, scores(keep), ms.size.toLong, ms.size.toLong - 1)
    }.toSet
    val got = graft.operators.Similarity.semanticDedupEndgame(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === want)
  }

  test("q206 triplets: positive is the argmin-rank mutual partner, negative is non-mutual, cosines are exact") {
    // the mutual side is fully checkable from q203's own output (edge
    // rows carry both directions' ranks), so the positive pick can't
    // self-confirm; cosine values are re-derived from raw embeddings
    val edges = graft.operators.Similarity.mutualKnnGraph(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(edges.nonEmpty)
    // per anchor: every mutual partner with the anchor-side rank
    val partners = (edges.map { case (a, b, rab, _) => a -> (rab, b) } ++
      edges.map { case (a, b, _, rba) => b -> (rba, a) })
      .groupBy(_._1).map { case (anchor, xs) => anchor -> xs.map(_._2) }
    val mutualSet = partners.toSeq.flatMap { case (a, xs) =>
      xs.map(x => (a, x._2))
    }.toSet
    val triplets = graft.operators.Similarity.tripletMining(spark, sf0001)
      .collect()
    assert(triplets.nonEmpty)
    val emb = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (emb(a), emb(b))
      // the engine's fold: dot/norm products accumulated left-to-right
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) {
        dot += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    triplets.foreach { r =>
      val (a, pos, posRank) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (neg, negRank) = (r.getLong(4), r.getLong(5))
      val best = partners(a).minBy(_._1)
      assert((best._1.toLong, best._2) === ((posRank, pos)),
        s"anchor $a: positive is not the argmin-rank mutual partner")
      assert(!mutualSet.contains((a, neg)),
        s"anchor $a: negative $neg is a mutual partner")
      assert(posRank >= 1 && negRank >= 1 && posRank != negRank,
        s"anchor $a: ranks out of contract")
      assert(r.getDouble(3) === cos(a, pos), s"anchor $a pos cosine")
      assert(r.getDouble(6) === cos(a, neg), s"anchor $a neg cosine")
    }
  }

  test("q185 guard: a near-dup-dense corpus fails loudly, not quadratically") {
    // The prefix filter's candidate volume is data-dependent; a corpus
    // of identical documents makes EVERY pair a candidate. The guard
    // must turn that silent quadratic degradation into a loud failure
    // carrying the measured per-doc rate (round-10 verdict ask).
    import spark.implicits._
    val dense = (0L until 200L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.allPairsJaccardOn(dense, 3, 5, maxCandPerDoc = 4)
    }
    assert(e.getMessage.contains("candidate blowup"), e.getMessage)
    // and a sane corpus passes under the same ceiling
    assert(Dedup.allPairsJaccardOn(
      Tables.documents(spark, sf0001), 3, 5, maxCandPerDoc = 64)
      .count() > 0)
  }
}
