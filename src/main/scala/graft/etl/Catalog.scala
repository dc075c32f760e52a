package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog/DDL surface (SURVEY.md §2 I2, J1, J5, J6): existence guards,
  * table creation, drop, and the reference's split-on-';' SQL script
  * runner (`etl/etl.py:236-246`).
  */
object Catalog {

  /** Idempotent-DDL guard (I2; `etl/etl.py:229-234`) for catalog tables. */
  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** Path-based existence guard for the parquet-directory warehouse. */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def deletePath(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
  }

  /** CREATE TABLE ... USING parquet if absent (J1 + I2). */
  def createTableIfAbsent(spark: SparkSession, name: String,
      df: DataFrame): Unit =
    if (!tableExists(spark, name))
      df.write.format("parquet").saveAsTable(name)

  /** DROP TABLE (J5; `sql/ddl_oracle.sql:103-110`). */
  def dropTable(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")

  /** Execute a multi-statement SQL script, splitting on ';' and
    * skipping blanks/comments (J6; `etl/etl.py:236-246`).
    */
  def runScript(spark: SparkSession, script: String): Seq[DataFrame] =
    script.split(";")
      .map(_.linesIterator.filterNot(_.trim.startsWith("--"))
        .mkString("\n").trim)
      .filter(_.nonEmpty)
      .map(spark.sql)
      .toSeq
}
