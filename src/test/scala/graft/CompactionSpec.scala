package graft

import graft.operators.Dedup
import graft.sources.Tables

/** Small-files compaction: fewer files, identical rows, original
  * directory survives (swap is write-temp -> delete -> rename).
  * Plus the q208 band-index segment compaction contracts (round 13).
  */
class CompactionSpec extends SparkSpec {

  test("compactParquet shrinks a many-file directory without losing rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val path = s"$dir/li"
    val src = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    src.repartition(64).write.parquet(path)
    def dataFiles = new java.io.File(path).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val before = dataFiles
    assert(before >= 32, s"fixture should start fragmented, had $before files")
    val expected = src.count()
    Tables.compactParquet(spark, path)
    assert(dataFiles < before, s"expected fewer files than $before")
    assert(spark.read.parquet(path).count() === expected)
    // idempotent: compacting a compacted dir is a no-op-sized rewrite
    Tables.compactParquet(spark, path)
    assert(spark.read.parquet(path).count() === expected)
  }

  test("q208: probe over the compacted band index equals the segment-union probe") {
    val got = Dedup.bandIndexCompact(spark, sf0001).collect()
    assert(got.nonEmpty, "round-2 probe found no admissions at sf0.001")
    // the equality bit is EXECUTED inside the query (both probes run,
    // exceptAll both ways) — a 0 here means compaction changed an
    // admission decision
    assert(got.forall(_.getAs[Long]("probes_equal") == 1L))
    // and the admissions are exactly q159's round-2 decisions (same
    // batch, same index content, one fold in between)
    val r2 = Dedup.incrementalDedupLoop(spark, sf0001).collect()
      .filter(_.getAs[Long]("batch_round") == 2L)
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"),
        r.getAs[Double]("jaccard"))).toSeq
    val probed = got.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("dup_of"), r.getAs[Double]("jaccard"))).toSeq
    assert(probed === r2)
  }

  test("q208 compaction is a pure row copy: generation row count = Σ segment rows") {
    Dedup.bandIndexCompact(spark, sf0001).collect()
    val root = new java.io.File("/tmp/graft_index",
      "compact_" + Tables.pathKey(sf0001))
    val corpus = new java.io.File(new java.io.File("/tmp/graft_index",
      "bands_" + Tables.pathKey(sf0001)), "bands")
    val nSeg0 = spark.read.parquet(corpus.getPath).count()
    val nSeg1 = spark.read
      .parquet(new java.io.File(root, "seg1").getPath).count()
    val nGen = spark.read
      .parquet(new java.io.File(root, "gen1").getPath).count()
    assert(nGen === nSeg0 + nSeg1,
      s"generation has $nGen rows, segments carry ${nSeg0 + nSeg1}")
    assert(nSeg1 > 0, "round-1 admitted nothing - the fold is vacuous")
  }
}
