package graft

import org.apache.spark.sql.SparkSession

import graft.sources.Tables

/** Dev-loop scratch: prints the optimized-plan shape of the query
  * currently under the microscope (round 6: is q18's hamming filter
  * pushed below its pair distinct?). Not driver contract.
  */
object DevShape {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = Tables.graftSession(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("ERROR")
    val p = graft.operators.Dedup.simhashNeardup(spark, sfDir)
      .queryExecution.optimizedPlan
    println("===== q18 optimized plan =====")
    println(p.toString)
    spark.stop()
  }
}
