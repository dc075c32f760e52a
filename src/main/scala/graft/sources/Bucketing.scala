package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY.md §2 J4's index
  * substitute; the builder prompt's "bucketing for co-located joins").
  *
  * Writing both sides of a recurring big-big join bucketed (and
  * sort-ordered) by the join key pre-materializes the shuffle ONCE at
  * write time: every subsequent join on that key plans as a
  * zero-Exchange sort-merge join over matching buckets. At 100 TB this
  * converts the nightly fact⋈orders shuffle (the one unavoidable
  * shuffle in the star build) into a free local join — the parquet-world
  * equivalent of the reference's fact-FK indexes
  * (`sql/ddl_oracle.sql:88-91`).
  *
  * Verified in PlanSpec: the bucketed join's physical plan contains no
  * ShuffleExchange.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two tables bucketed on `key`: plans shuffle-free when both
    * sides share the bucket count and key.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
