package graft.dev

import org.apache.spark.sql.SparkSession

import graft.sources.{Bucketing, Tables}

/** Usage sample + runtime demo for bucketed co-located joins: writes
  * lineitem/orders bucketed by orderkey, joins them, prints the plan
  * (expect: no Exchange) and the joined count.
  */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Tables.graftSession(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_buckets").toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("WARN")

    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir).withColumnRenamed("l_orderkey", "k"),
      "demo_lineitem", "k", 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir).withColumnRenamed("o_orderkey", "k"),
      "demo_orders", "k", 8)
    val joined = Bucketing.coLocatedJoin(spark, "demo_lineitem",
      "demo_orders", "k")
    val plan = joined.queryExecution.sparkPlan.toString
    println(s"[bucket-demo] plan contains Exchange: ${plan.contains("Exchange")}")
    println(s"[bucket-demo] joined rows: ${joined.count()}")
    println(plan.linesIterator.take(8).mkString("\n"))

    // partitioned-write pruning demo (the other half of J4)
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_partdemo").toString
    Tables.writePartitioned(
      Tables.lineitem(spark, sfDir)
        .withColumn("ship_year", year(col("l_shipdate"))),
      s"$dir/li", "ship_year")
    val q = spark.read.parquet(s"$dir/li")
      .filter(col("ship_year") === 1995).select("l_orderkey")
    val scan = q.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    println(s"[part-demo] rows for 1995: ${q.count()}")
    println(s"[part-demo] PartitionFilters: ${scan.metadata("PartitionFilters")}")
    println(s"[part-demo] partition dirs read: " +
      scan.relation.location.listFiles(scan.partitionFilters, Nil).length)

    // SQL-registered native functions (graft.functions.GraftExtensions)
    graft.functions.GraftExtensions.registerAll(spark)
    spark.read.parquet(s"$sfDir/documents.parquet")
      .createOrReplaceTempView("docs")
    spark.sql(
      """SELECT graft_simhash60(text) AS sh, graft_mingram_fp(text) AS fp,
        |       size(graft_minhash(text, 16)) AS k
        |FROM docs LIMIT 3""".stripMargin)
      .collect().foreach(r => println(s"[sql-fn-demo] $r"))
    spark.stop()
  }
}
