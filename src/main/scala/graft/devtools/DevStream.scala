package graft.devtools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.EventStreams

/** Scratch probe for append-mode watermark emission semantics: diffs
  * the drained streaming session set against batch session_window
  * candidates at different watermark cutoffs.
  *
  * Usage: `runMain graft.devtools.DevStream <sfDir>`
  */
object DevStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Tables.graftSession(SparkSession.builder()
      .master("local[8]")
      .appName("graft-devstream")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("ERROR")

    val streamed = EventStreams.sessionWindowsAvailableNow(spark, sfDir)
    val sCount = streamed.count()
    println(s"[devstream] streamed sessions: $sCount")
    streamed.orderBy(desc("session_end")).show(3, false)

    // batch equivalent via the deterministic gap rule (lag + cumsum):
    // session_window merges when the next event is strictly within the
    // gap of the previous (diff < gap); end = last event + gap
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = 30L * 60 * 1000000
    val batch = Tables.events(spark, sfDir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") >= gapUs).cast("int"))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"),
        timestamp_micros(max(unix_micros(col("ts"))) + gapUs).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,10)")).cast("double").as("sum_value"))
      .select("session_start", "session_end", "user_id", "n_events", "sum_value")
    val total = batch.count()
    val maxTs = Tables.events(spark, sfDir).agg(max(col("ts"))).head.getTimestamp(0)
    println(s"[devstream] batch sessions total: $total  maxTs: $maxTs")
    // cutoffs: us-exact vs ms-truncated, < vs <=
    val maxUs = maxTs.getTime / 1000 * 1000000L + maxTs.getNanos / 1000L
    val wmUsExact = maxUs - 600L * 1000000L
    val wmUsMs = (maxUs / 1000L) * 1000L - 600L * 1000000L
    for ((label, wm) <- Seq(("us-exact", wmUsExact), ("ms-trunc", wmUsMs));
         (op, f) <- Seq(("lt", (c: org.apache.spark.sql.Column) => unix_micros(c) < wm),
                        ("le", (c: org.apache.spark.sql.Column) => unix_micros(c) <= wm))) {
      val n = batch.filter(f(col("session_end"))).count()
      println(s"[devstream] cutoff $label $op: $n")
    }
    // expected = gap sessions the final watermark passed; full-row diff
    val keys = Seq("user_id", "session_start", "session_end", "n_events", "sum_value")
    val expected = batch.filter(unix_micros(col("session_end")) < wmUsExact)
    val missing = expected.join(streamed, keys, "left_anti").count()
    val extra = streamed.join(expected, keys, "left_anti").count()
    println(s"[devstream] expected ${expected.count()}  missing: $missing  extra: $extra")
    val expectedMs = batch.filter(unix_micros(col("session_end")) < wmUsMs)
    println(s"[devstream] ms-trunc: expected ${expectedMs.count()} " +
      s"missing ${expectedMs.join(streamed, keys, "left_anti").count()} " +
      s"extra ${streamed.join(expectedMs, keys, "left_anti").count()}")

    // --- stateful sessionizer probe (q131): emitted = in-batch closed
    // (not the user's last session) UNION last-session-timed-out
    val st2 = EventStreams.sessionizeStatefulAvailableNow(spark, sfDir)
    println(s"[devstream] stateful emitted: ${st2.count()}")
    val gapped = Tables.events(spark, sfDir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs).cast("int"))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
    val wSeq = Window.partitionBy("user_id")
    val flagged2 = gapped
      .withColumn("is_last", col("session_seq") === max(col("session_seq")).over(wSeq))
    val wmMs = maxUs / 1000L - 600000L
    for (op <- Seq("lt", "le")) {
      val toPred = (unix_micros(col("session_end")) + gapUs) / 1000L
      val fired = if (op == "lt") toPred < wmMs else toPred <= wmMs
      val exp2 = flagged2.filter(!col("is_last") || fired)
      val m = exp2.join(st2, Seq("user_id", "session_start"), "left_anti").count()
      val x = st2.join(exp2, Seq("user_id", "session_start"), "left_anti").count()
      println(s"[devstream] stateful $op: expected ${exp2.count()} missing $m extra $x")
    }
    spark.stop()
  }
}
