package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, ScalableKeys}

/** Invariants of the corpus-sampling operators beyond the oracle hash
  * check: split stability under growth, cap enforcement, and the
  * packing overflow bound.
  */
class SamplingSpec extends SparkSpec {

  test("trainSplit: assignment is a pure function of doc_id (stable under subsetting)") {
    val full = Sampling.trainSplit(spark, sf0001)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // Re-deriving the split over a filtered corpus must not reassign
    // any surviving doc — the property random() splits lack.
    val half = Sampling.trainSplit(spark, sf0001)
      .filter(col("doc_id") % 2 === 0)
      .select("doc_id", "split").collect()
    half.foreach(r => assert(full(r.getLong(0)) == r.getString(1)))
    // All three splits are populated at 500 docs.
    assert(full.values.toSet == Set("train", "val", "test"))
  }

  test("domainCaps: never more than cap docs per source, ranks dense from 1") {
    val cap = 7
    val rows = Sampling.domainCaps(spark, sf0001, cap = cap)
      .groupBy("source").agg(count(lit(1)).as("n"), max("rk").as("maxrk"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= cap)
      assert(r.getInt(2) <= cap)
    }
  }

  test("seqPacking: packs are contiguous, budget overflow bounded by one doc") {
    val budget = 512
    val packs = Sampling.seqPacking(spark, sf0001, budget = budget)
      .orderBy("pack_id").collect()
    val maxDocToks = graft.sources.Tables.documents(spark, sf0001)
      .select(max(size(split(trim(col("text")), "\\s+")))).head().getInt(0)
    // pack_ids dense 0..n-1; doc ranges contiguous and non-overlapping
    packs.zipWithIndex.foreach { case (p, i) => assert(p.getLong(0) == i) }
    packs.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) < b.getLong(3)) // last_doc < next first_doc
      case _           =>
    }
    // every pack but the last reaches the budget; none exceeds it by
    // more than the largest single doc (the streaming-packing bound)
    packs.dropRight(1).foreach { p =>
      val toks = p.getLong(2)
      assert(toks >= budget - maxDocToks && toks < budget + maxDocToks,
        s"pack ${p.getLong(0)} has $toks tokens")
    }
  }

  test("q207 schedule: quota-respecting greedy selection, dense positions, mixed prefixes") {
    val sched = graft.operators.Sampling
      .interleavedSchedule(spark, sf0001).collect()
    assert(sched.nonEmpty)
    // positions dense 1..N and unique (a gap means the tie-break is
    // not total; a dup means two rows share a schedule slot)
    val pos = sched.map(_.getLong(0)).sorted
    assert(pos.toSeq == (1L to sched.length).toSeq)
    // per-source token sums respect the q201 quotas, and the selection
    // is greedy-MAXIMAL: a source stops short of its quota only when
    // it selected EVERY admitted doc it has
    val quotas = graft.operators.Sampling.tokenApportionment(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val admittedPerSrc = graft.operators.Corpus.withGateScore(
        graft.sources.Tables.documents(spark, sf0001))
      .filter(org.apache.spark.sql.functions.col("score") === 4)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySrc = sched.groupBy(_.getString(1))
    // iterate over the QUOTA keys, not the sources present in the
    // schedule: a source whose selection is wrongly empty must still
    // fail the greedy-maximal check (round-12 ADVICE vacuity fix)
    quotas.keys.foreach { src =>
      val rows = bySrc.getOrElse(src, Array.empty[org.apache.spark.sql.Row])
      val toks = rows.map(_.getLong(3)).sum
      assert(toks <= quotas(src), s"$src overflows its quota")
      // gate-admitted docs are 20-60 tokens: if admitted docs remain
      // unselected, the headroom must be smaller than the largest doc
      assert(rows.length == admittedPerSrc.getOrElse(src, 0L) ||
        toks > quotas(src) - 60, s"$src under-fills its quota")
    }
    // mixture: the first half of the schedule touches most sources
    // that appear at all (the ideal-position property)
    val half = sched.sortBy(_.getLong(0)).take(sched.length / 2)
    assert(half.map(_.getString(1)).distinct.length * 10 >=
      bySrc.size * 8, "first half of the schedule is not mixed")
  }

  test("withPrefixSum matches the single-partition window on a small frame") {
    import spark.implicits._
    val df = Seq((3L, 10L), (1L, 5L), (2L, 7L), (5L, 1L), (4L, 2L))
      .toDF("k", "v")
    val got = ScalableKeys.withPrefixSum(df, "k", "v", "cum")
      .orderBy("k").select("k", "cum").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 0L), (2L, 5L), (3L, 12L), (4L, 22L), (5L, 24L)))
  }
}
