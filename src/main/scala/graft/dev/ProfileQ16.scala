package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness for the neardup pipeline stages. */
object ProfileQ16 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.sources.Tables.graftSession(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sigs = graft.operators.Dedup.minhashSignatures(spark, sfDir)
    time("signatures only")(sigs.write.format("noop").mode("overwrite").save())

    val sh = graft.sources.Tables.documents(spark, sfDir).select(
      col("doc_id"),
      array_distinct(graft.functions.word_shingles(col("text"))).as("sh"))
    time("shingle sets only")(sh.write.format("noop").mode("overwrite").save())

    val full = graft.operators.Dedup.neardupPairs(spark, sfDir)
    time("full neardup")(full.write.format("noop").mode("overwrite").save())
    full.explain("formatted")
    spark.stop()
  }
}
