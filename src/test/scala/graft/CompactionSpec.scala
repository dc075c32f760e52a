package graft

import graft.sources.Tables

/** Small-files compaction: fewer files, identical rows, original
  * directory survives (swap is write-temp -> delete -> rename).
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
}
