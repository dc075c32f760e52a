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
    import graft.functions.HllAgg
    val hllDials = Seq(0.05, 0.02, 0.01)
    time("ord_distinct_only")(li.select("l_orderkey").distinct
      .agg(count(lit(1)).as("x")))
    time("ord_agg")(li.select("l_orderkey").distinct.agg(
      count(lit(1)).as("xo"),
      hllDials.map(r => HllAgg.countDistinct(col("l_orderkey"), r).as("o"+r)): _*))
    val custKeys = li.select("l_orderkey")
      .join(Joins.broadcastIfSmall(
          Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
    time("cust_agg")(custKeys.select("o_custkey").distinct.agg(
      count(lit(1)).as("xc"),
      hllDials.map(r => HllAgg.countDistinct(col("o_custkey"), r).as("c"+r)): _*))
    val tdCols = Seq(100, 1000, 10000).flatMap { a =>
      Seq(
        expr(s"approx_percentile(l_quantity, 0.5, $a)").as(s"mq_$a"),
        expr(s"approx_percentile(l_quantity, 0.9, $a)").as(s"pq_$a"),
        expr(s"approx_percentile(l_extendedprice, 0.5, $a)").as(s"mp_$a"))
    }
    time("td_9")(li.select("l_returnflag","l_quantity","l_extendedprice")
      .groupBy(col("l_returnflag")).agg(tdCols.head, tdCols.tail: _*))
    time("exact_q49")(Insights.percentileSummary(spark, sfDir))
    time("q136_full")(Insights.sketchAccuracySweep(spark, sfDir))
    spark.stop()
  }
}
