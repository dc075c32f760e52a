package graft.devtools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.sources.Tables

/** Plan-inspection utility: prints the formatted physical plan and a
  * scan/exchange summary for the named registered queries.
  *
  * Usage: `runMain graft.devtools.ExplainQuery <sfDir> <query...>`
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Tables.graftSession(SparkSession.builder()
      .master("local[8]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect() // run THIS plan so AQE finalizes it (exchange reuse etc.)
      val plan = df.queryExecution.executedPlan.toString
      val scans = "FileScan".r.findAllIn(plan).length
      val exchanges = "Exchange".r.findAllIn(plan).length
      val reused = "ReusedExchange".r.findAllIn(plan).length
      val single = "SinglePartition".r.findAllIn(plan).length
      println(s"=== $n: scans=$scans exchanges=$exchanges " +
        s"reused=$reused singlePartition=$single")
      if (args.length > 1) println(plan)
    }
    spark.stop()
  }
}
