package graft.etl

import org.apache.spark.sql.SparkSession

/** CLI entry point for the full retail ETL (the `python etl/etl.py`
  * equivalent): generate-or-read raw CSVs, run the pipeline, write the
  * validation report, print a load summary.
  *
  * Usage: runMain graft.etl.RunPipeline <baseDir> [baseRows]
  *   baseDir/raw        input CSVs (generated if absent, seed 42)
  *   baseDir/staging    staged cleaned CSVs
  *   baseDir/warehouse  parquet star schema
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_retail")
    val baseRows = args.lift(1).map(_.toLong).getOrElse(1000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-retail-etl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!Catalog.pathExists(spark, s"$base/raw/customers")) {
      println(s"[etl] generating seeded raw CSVs under $base/raw")
      RetailDataGen.writeAll(spark, s"$base/raw", baseRows)
    }
    val wh = Pipeline.run(spark, s"$base/raw", s"$base/staging",
      s"$base/warehouse")

    val (c, p, s, sl) = Pipeline.extractAndClean(spark, s"$base/raw")
    val report = ValidationReport.validate(c, p, s, sl)
    ValidationReport.writeReport(report, s"$base/validation_report.txt")
    println(report.render)

    Seq("dim_customer", "dim_product", "dim_store", "dim_date", "fact_sales")
      .foreach { t =>
        val n = spark.read.parquet(s"$base/warehouse/$t").count()
        println(s"[etl] loaded $t: $n rows")
      }
    spark.stop()
  }
}
