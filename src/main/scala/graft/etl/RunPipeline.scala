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
    // layered config (L): CLI arg beats env (GRAFT_*) beats defaults
    val conf = GraftConfig.load()
    val (rawDir, stagingDir, warehouseDir, reportPath) = args.headOption match {
      case Some(base) => (s"$base/raw", s"$base/staging", s"$base/warehouse",
        s"$base/validation_report.txt")
      case None => (conf.inputDir, conf.stagingDir, conf.warehouseDir,
        s"${conf.warehouseDir}/validation_report.txt")
    }
    val baseRows = args.lift(1).map(_.toLong).getOrElse(1000L)
    val spark = graft.sources.Tables.graftSession(SparkSession.builder()
      .master(s"local[${conf.shufflePartitions}]")
      .appName("graft-retail-etl")
      .config("spark.sql.shuffle.partitions", conf.shufflePartitions)
      .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("WARN")

    if (!Catalog.pathExists(spark, s"$rawDir/customers")) {
      println(s"[etl] generating seeded raw CSVs under $rawDir")
      RetailDataGen.writeAll(spark, rawDir, baseRows)
    }
    Pipeline.run(spark, rawDir, stagingDir, warehouseDir)

    val (c, p, s, sl) = Pipeline.extractAndClean(spark, rawDir)
    val report = ValidationReport.validate(c, p, s, sl)
    ValidationReport.writeReport(report, reportPath)
    println(report.render)

    Seq("dim_customer", "dim_product", "dim_store", "dim_date", "fact_sales")
      .foreach { t =>
        val n = spark.read.parquet(s"$warehouseDir/$t").count()
        println(s"[etl] loaded $t: $n rows")
      }
    spark.stop()
  }
}
