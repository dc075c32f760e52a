package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (builder prompt §multimodal): media as
  * opaque `binary` columns with typed metadata, processed partition-wise.
  *
  * The decode step is a clearly-marked STUB (this container has no
  * image/audio codecs): [[fakeDecode]] derives deterministic
  * pseudo-features from an md5 of the payload. Everything AROUND the
  * stub is real and tested — the schema contract, the binary column
  * handling, the partition-wise batched execution shape (mapPartitions
  * over an iterator == one "batch" per partition, the same contract a
  * Pandas-UDF `mapInPandas` has in PySpark), and the downstream
  * aggregation plumbing.
  *
  * Scale notes: decode is the textbook case for partition-wise
  * processing — per-element codec setup amortizes across the partition
  * iterator; binary payloads never pass through a shuffle (features are
  * extracted map-side, payload column dropped immediately after);
  * `spark.sql.files.maxPartitionBytes` bounds decoder memory.
  */
object Multimodal {

  /** Typed record for a media blob + metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
    source: String)

  /** Extracted features (what a real image/audio decoder would emit:
    * dimensions / duration / channel stats — here md5-derived fakes).
    */
  case class MediaFeatures(media_id: Long, kind: String, byte_len: Int,
    width: Int, height: Int, f0: Double, f1: Double, f2: Double, f3: Double)

  /** Fabricate a media table from `documents` (text bytes stand in for
    * image/audio payloads — deterministic, schema-correct).
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"),
        col("source"))
      .as[MediaRecord]
  }

  /** STUB decoder ??? — stands in for e.g. javax.imageio / ffmpeg.
    * Deterministic: features are bytes of md5(payload), so the DuckDB
    * oracle can reproduce them from SQL md5. A real deployment swaps
    * ONLY this function; the partition-wise plumbing stays.
    */
  private def fakeDecode(md: java.security.MessageDigest,
      payload: Array[Byte]): (Int, Int, Double, Double, Double, Double) = {
    val d = md.digest(payload).map(_ & 0xff) // digest() resets the instance
    // fake "dimensions" and channel statistics from digest bytes
    (64 + d(0) * 4, 64 + d(1) * 4,
      d(2) / 255.0, d(3) / 255.0, d(4) / 255.0, d(5) / 255.0)
  }

  /** Partition-wise feature extraction: one decoder instance per
    * partition, iterator-in/iterator-out (the JVM analog of
    * `mapInPandas` batch processing).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup (codec init, model load, ...) — the digest
      // stands in for the decoder and is allocated once per partition
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val (w, h, f0, f1, f2, f3) = fakeDecode(md, m.payload)
        MediaFeatures(m.media_id, m.kind, m.payload.length, w, h, f0, f1, f2, f3)
      }
    }
  }

  /** Resized media (STUB resize ???): a real implementation would decode,
    * scale to (targetW, targetH), re-encode. The stub derives the output
    * payload deterministically (truncate/cycle bytes to a size
    * proportional to the target area) so the batch plumbing — binary in,
    * binary out, metadata updated, partition-wise — is fully exercised.
    */
  case class ResizedMedia(media_id: Long, kind: String, width: Int,
    height: Int, payload: Array[Byte])

  def resizeStub(media: Dataset[MediaRecord], targetW: Int,
      targetH: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec/scaler init would go here
      it.map { m =>
        val outLen = math.max(1, (targetW.toLong * targetH / 64).toInt)
        val out = Array.tabulate[Byte](outLen)(i =>
          m.payload(i % math.max(m.payload.length, 1)))
        ResizedMedia(m.media_id, m.kind, targetW, targetH, out)
      }
    }
  }

  /** Frame sampling (STUB frame decode ???): a real implementation pulls
    * every k-th frame from a video payload. The stub slices the payload
    * into `frameSize`-byte pseudo-frames and emits every `step`-th one —
    * a one-to-many partition-wise expansion (the flatMap shape real
    * frame extraction has), with frame index + offset metadata.
    */
  case class MediaFrame(media_id: Long, frame_idx: Int, byte_offset: Int,
    frame_bytes: Array[Byte])

  def sampleFramesStub(media: Dataset[MediaRecord], frameSize: Int = 64,
      step: Int = 4): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = math.max(m.payload.length / frameSize, 1)
      (0 until n by step).map { f =>
        val off = f * frameSize
        val end = math.min(off + frameSize, m.payload.length)
        MediaFrame(m.media_id, f, off,
          m.payload.slice(off, math.max(end, off + 1)))
      }
    }
  }

  /** Registered query: build media -> extract features -> drop payload.
    * Emitted sorted by media_id; the DuckDB oracle recomputes the same
    * md5-derived features in SQL.
    */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaFromDocuments(spark, sfDir))
      .toDF()
      .orderBy("media_id")

  val mediaFeaturesSql: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS kind,
      |  CAST(strlen(text) AS INT) AS byte_len,
      |  CAST(64 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT) * 4 AS INT) AS width,
      |  CAST(64 + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) * 4 AS INT) AS height,
      |  CAST(('0x' || substr(md5(text), 5, 2)) AS INT) / 255.0 AS f0,
      |  CAST(('0x' || substr(md5(text), 7, 2)) AS INT) / 255.0 AS f1,
      |  CAST(('0x' || substr(md5(text), 9, 2)) AS INT) / 255.0 AS f2,
      |  CAST(('0x' || substr(md5(text), 11, 2)) AS INT) / 255.0 AS f3
      |FROM documents
      |ORDER BY media_id""".stripMargin

  /** Registered query over the frame sampler: per-frame metadata +
    * content hash.
    *
    * ORACLE CONTRACT — ASCII only: the sampler slices the payload by
    * BYTES (correct for real binary media), while the DuckDB oracle's
    * `substr` slices the source text by CHARACTERS. The two agree iff
    * the stand-in text payload is single-byte (the driver testdata is
    * ASCII). Multibyte payloads would diverge — by design the byte
    * semantics is the one a real decoder keeps; only the SQL oracle is
    * limited.
    */
  def mediaFrames(spark: SparkSession, sfDir: String): DataFrame =
    // hash/length via builtin codegen'd expressions on the binary column
    // (a Dataset.map allocating a MessageDigest per row computed the
    // identical md5 ~the hard way)
    sampleFramesStub(mediaFromDocuments(spark, sfDir))
      .toDF()
      .select(col("media_id"), col("frame_idx"), col("byte_offset"),
        length(col("frame_bytes")).as("frame_len"),
        md5(col("frame_bytes")).as("frame_hash"))
      .orderBy("media_id", "frame_idx")

  val mediaFramesSql: String =
    """WITH videos AS (
      |  SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 2),
      |frames AS (
      |  SELECT media_id,
      |         CAST(f AS INT) AS frame_idx,
      |         CAST(f * 64 AS INT) AS byte_offset,
      |         substr(text, CAST(f * 64 + 1 AS INT), 64) AS frame
      |  FROM videos,
      |       LATERAL UNNEST(range(0, greatest(strlen(text) // 64, 1), 4)) t(f))
      |SELECT media_id, frame_idx, byte_offset,
      |       CAST(strlen(frame) AS INT) AS frame_len,
      |       md5(frame) AS frame_hash
      |FROM frames
      |ORDER BY media_id, frame_idx""".stripMargin

  /** Downstream rollup over extracted features (proves features flow
    * into ordinary relational ops after the stub boundary).
    */
  def mediaKindRollup(spark: SparkSession, sfDir: String): DataFrame =
    mediaFeatures(spark, sfDir)
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
        sum(col("byte_len")).as("total_bytes"),
        // widths are small ints: a BIGINT sum is exact and renders
        // identically in both engines (decimal output types don't)
        sum(col("width").cast("long")).as("sum_width"))
      .orderBy("kind")

  val mediaKindRollupSql: String =
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |            WHEN doc_id % 3 = 1 THEN 'audio'
      |            ELSE 'video' END AS kind,
      |       COUNT(*) AS n_media,
      |       CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
      |       CAST(SUM(64 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT) * 4)
      |         AS BIGINT) AS sum_width
      |FROM documents
      |GROUP BY 1
      |ORDER BY kind""".stripMargin
}
