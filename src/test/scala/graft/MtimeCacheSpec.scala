package graft

import java.io.File
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Pins the round-7 mtime-keyed memo contract: both JVM-lifetime caches
  * that sniff on-disk state (the IVF quantizer fit and the events ts
  * encoding) must refresh when the file at the same path is rewritten —
  * the driver regenerates /root/testdata in place between (and once,
  * during) rounds, and a stale entry silently serves wrong centroids /
  * the wrong timestamp branch (CLAUDE.md round-6 notes; ADVICE r6).
  */
class MtimeCacheSpec extends SparkSpec {

  private def tmpDir(tag: String): File = {
    val d = File.createTempFile(s"graft-$tag", "")
    d.delete(); d.mkdirs(); d
  }

  /** Overwrite a single-file parquet "table" at `dir/name.parquet` and
    * force a strictly newer mtime (fs timestamps can be coarse).
    */
  private def writeTable(dir: File, name: String,
      df: org.apache.spark.sql.DataFrame, prevMtime: Long): File = {
    val staging = new File(dir, s"_stage_$name")
    df.coalesce(1).write.mode("overwrite").parquet(staging.getPath)
    val part = staging.listFiles.filter(_.getName.endsWith(".parquet")).head
    val dest = new File(dir, s"$name.parquet")
    if (dest.exists) dest.delete()
    java.nio.file.Files.move(part.toPath, dest.toPath)
    staging.listFiles.foreach(_.delete()); staging.delete()
    dest.setLastModified(math.max(System.currentTimeMillis, prevMtime + 1001))
    dest
  }

  test("ivfQuantizer refreshes when embeddings.parquet is rewritten in place") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("ivf")
    def corpus(shift: Float) = (0 until 32).map(i =>
      (i.toLong, Array.tabulate(8)(j => shift + i * 0.1f + j), i % 3))
      .toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"),
        $"label".cast("int").as("label"))

    val f1 = writeTable(dir, "embeddings", corpus(0.0f), 0L)
    val seeds1 = Similarity.ivfQuantizer(spark, dir.getPath, 4)
    // same mtime -> memo hit (identity: the exact same array object)
    assert(Similarity.ivfQuantizer(spark, dir.getPath, 4) eq seeds1,
      "same path+mtime must be a cache hit")

    writeTable(dir, "embeddings", corpus(100.0f), f1.lastModified)
    val seeds2 = Similarity.ivfQuantizer(spark, dir.getPath, 4)
    assert(!(seeds2 eq seeds1), "rewrite must be a cache miss")
    assert(seeds2.head._2.head >= 100.0f,
      s"fresh centroids must come from the rewritten corpus, got ${seeds2.head._2.head}")
  }

  test("q134 staging reuses the split until events.parquet is rewritten") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("stage")
    def events(base: Long) = (0 until 20).map(i =>
        (base + i, java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T00:00:00Z")
            .plusSeconds(i * 3600L)),
          i.toLong % 5, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val f1 = writeTable(dir, "events", events(0L), 0L)

    val staging = new File(graft.streaming.EventStreams
      .stageChronologicalEvents(spark, dir.getPath, 2))
    val staged = staging.listFiles.filter(_.getName.endsWith(".parquet"))
    assert(staged.length === 2)

    // cache hit: same source + same split must NOT rebuild (the staged
    // files keep their pinned ~1970 mtimes across the second call)
    val pinnedMtimes = staged.map(f => f.getName -> f.lastModified).toMap
    graft.streaming.EventStreams.stageChronologicalEvents(spark, dir.getPath, 2)
    staging.listFiles.filter(_.getName.endsWith(".parquet")).foreach(f =>
      assert(f.lastModified === pinnedMtimes(f.getName),
        "same source mtime must reuse the staging, not rewrite it"))

    // a staged data file lost under a still-fresh marker (an age-based
    // /tmp cleaner removes ~1970-mtime files but keeps the fresher
    // marker) must be a cache MISS: the marker alone is not proof
    staged.head.delete()
    graft.streaming.EventStreams.stageChronologicalEvents(spark, dir.getPath, 2)
    assert(new File(staging, staged.head.getName).exists,
      "missing staged file must trigger a rebuild")

    // different nFiles -> miss; rewrite source -> miss (fresh split)
    writeTable(dir, "events", events(100L), f1.lastModified)
    graft.streaming.EventStreams.stageChronologicalEvents(spark, dir.getPath, 2)
    val rebuilt = staging.listFiles.filter(_.getName.endsWith(".parquet"))
    assert(rebuilt.length === 2, "rewritten source must rebuild the staging")
    val ids = spark.read.parquet(staging.getPath + "/b0000.parquet")
      .select("event_id").collect().map(_.getLong(0))
    assert(ids.forall(_ >= 100L), "rebuilt staging must hold the new rows")
  }

  test("eventsTsIsNanos refreshes when events.parquet is rewritten in place") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("events-enc")
    // micros encoding: a real TimestampType column
    val micros = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val f1 = writeTable(dir, "events", micros, 0L)
    assert(!Tables.eventsTsIsNanos(spark, f1.getPath),
      "TimestampType column must sniff as micros")

    // "nanos" encoding: under nanosAsLong a NANOS column surfaces as
    // LongType; a raw INT64 column is indistinguishable at the sniff
    // layer, which is exactly what the detector keys on
    val nanos = Seq((1L, 1700000000000000000L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val f2 = writeTable(dir, "events", nanos, f1.lastModified)
    assert(Tables.eventsTsIsNanos(spark, f2.getPath),
      "rewritten LongType ts must be re-sniffed as nanos (mtime cache miss)")
  }
}
