package graft.devtools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Insights, Joins}
import graft.sources.Tables

/** Dev-only scratch profiler (not part of the library surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.graftSession(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("WARN")

    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val si = sc.stageInfo
          val ms = (for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s).getOrElse(-1L)
          val tm = si.taskMetrics
          stages.add((si.stageId, si.numTasks, ms,
            tm.executorRunTime, tm.executorDeserializeTime,
            tm.jvmGCTime))
        }
      })

    def time(name: String)(df: => DataFrame): Unit = {
      stages.clear()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(_._1).foreach {
        case (id, n, ms, run, deser, gc) =>
          println(s"PROF   stage $id: $n tasks, wall $ms ms, " +
            s"taskRunSum $run ms, deserSum $deser ms, gcSum $gc ms")
      }
      Tables.freeTransientBlocks(spark)
    }

    val li = Tables.lineitem(spark, sfDir)
    time("warmup")(li.select(count(lit(1)).as("c")))
    import graft.operators.Insights.revenueDec
    val oj = Tables.withMinParallelism(
        li.select("l_orderkey", "l_extendedprice", "l_discount"), 32)
      .join(Joins.broadcastIfSmall(
          Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
    for (pass <- 1 to 3)
      time(s"a_join_sum_only pass$pass")(oj.agg(
        sum(revenueDec).cast("double").as("s"), count(lit(1)).as("n")))
    for (pass <- 1 to 3)
      time(s"b_join_sum_1hll pass$pass")(oj.agg(
        sum(revenueDec).cast("double").as("s"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("a"),
        count(lit(1)).as("n")))
    for (pass <- 1 to 3)
      time(s"c_full_q45 pass$pass")(oj.agg(
        sum(revenueDec).cast("double").as("s"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("a"),
        approx_count_distinct(col("o_custkey"), 0.01).as("b"),
        count(lit(1)).as("n")))
    // cents-BIGINT revenue instead of Decimal objects in the
    // interpreted stage
    val cents = expr(
      "CAST(CAST(l_extendedprice * 100 AS BIGINT) * (100 - CAST(l_discount * 100 AS BIGINT)) AS BIGINT)")
    for (pass <- 1 to 3)
      time(s"d_q45_centslong pass$pass")(oj.agg(
        sum(cents).as("s"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("a"),
        approx_count_distinct(col("o_custkey"), 0.01).as("b"),
        count(lit(1)).as("n")))
    // hypothesis: mixed declarative+imperative buffer is the poison.
    for (pass <- 1 to 3)
      time(s"e_hll_only_2 pass$pass")(oj.agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("a"),
        approx_count_distinct(col("o_custkey"), 0.01).as("b")))
    for (pass <- 1 to 3)
      time(s"f_split_crossjoin pass$pass")(
        oj.agg(sum(revenueDec).cast("double").as("s"),
            count(lit(1)).as("n"))
          .crossJoin(oj.agg(
            approx_count_distinct(col("l_orderkey"), 0.01).as("a"),
            approx_count_distinct(col("o_custkey"), 0.01).as("b"))))
    spark.stop()
  }
}
