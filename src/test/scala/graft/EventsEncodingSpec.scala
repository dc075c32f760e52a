package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The events table's `ts` parquet encoding varies by generator:
  * INT64 TIMESTAMP(NANOS) (readable only as a raw long under
  * nanosAsLong, needing an exact div-1000 conversion) vs plain
  * TIMESTAMP(MICROS). `Tables.eventsTsIsNanos` sniffs the footer and
  * both the batch loader and the streaming file source branch on it —
  * these tests pin the dispatch for both encodings.
  */
class EventsEncodingSpec extends SparkSpec {

  test("micros-encoded events load as-is (no div-1000 double conversion)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evmicros")
    // write a micros-encoded events table the way any Spark job would
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789")
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      org.apache.spark.sql.Row(1L, ts, 7L, "click", 1.5, "{}")).asJava
    spark.createDataFrame(rows, Tables.eventsMicrosSchema)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    assert(!Tables.eventsTsIsNanos(spark, s"$dir/events.parquet"))
    val got = Tables.events(spark, dir.toString).select("ts").head.getTimestamp(0)
    assert(got === ts, s"micros ts must round-trip unchanged, got $got")
  }

  test("long-encoded (nanos-shaped) events get the exact div-1000 conversion") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evnanos")
    // a raw-INT64 ts column is what the nanos footer reads as under
    // nanosAsLong; writing LongType reproduces that inferred shape
    val nanos = 1709296496789123456L
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      org.apache.spark.sql.Row(1L, nanos, 7L, "click", 1.5, "{}")).asJava
    spark.createDataFrame(rows, Tables.eventsSchema)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    assert(Tables.eventsTsIsNanos(spark, s"$dir/events.parquet"))
    val got = Tables.events(spark, dir.toString)
      .select(unix_micros(col("ts"))).head.getLong(0)
    assert(got === nanos / 1000L,
      s"nanos must convert by exact integer div 1000, got $got")
  }

  test("driver testdata loads with sane event timestamps either way") {
    val ok = Tables.events(spark, sf0001)
      .filter(col("ts") >= lit("2020-01-01") && col("ts") < lit("2030-01-01"))
      .count()
    val all = Tables.events(spark, sf0001).count()
    assert(all > 0 && ok === all,
      "every event ts must land in the plausible decade — a wrong " +
        "encoding branch shows up as 1970 (double-divide) or year-56k " +
        "(missed divide) timestamps")
  }
}
