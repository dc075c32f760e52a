package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed surrogate-key assignment for tables too large for a
  * global row_number() sort (SURVEY.md §2 D3 at 100 TB).
  *
  * `row_number() OVER (ORDER BY ...)` funnels every row through one
  * partition — fine for dims, fatal for facts. This is the classic
  * two-pass alternative: (1) count rows per partition (tiny job),
  * (2) per-partition sequential ids + broadcast cumulative offsets.
  * No shuffle of the data itself; ids are dense 0..n-1.
  *
  * Determinism caveat (documented in SURVEY.md §4): ids follow the
  * current partitioning/order of `df` — stable for a deterministic
  * lineage (e.g. a sorted parquet read), assignment-order-stable
  * otherwise, exactly like the reference's Oracle sequences
  * (`sql/ddl_oracle.sql:18-22`).
  */
object ScalableKeys {

  /** Append a dense 0-based `idCol` (optionally offset by `startAt`,
    * the `maxExistingKey + 1` pattern for incremental loads).
    */
  def withSequentialIds(df: DataFrame, idCol: String,
      startAt: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.rdd // one deliberate RDD hop: zipWithIndex is exactly
                     // the per-partition imperative op RDDs are for
    val indexed = rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + startAt))
    }
    val schema = StructType(df.schema.fields :+
      StructField(idCol, LongType, nullable = false))
    spark.createDataFrame(indexed, schema)
  }

  /** Dense 1-based rank by a unique key — value-identical to
    * `row_number() OVER (ORDER BY keyCol)` but WITHOUT the
    * single-partition window funnel: range-repartition on the key
    * (partition i's keys all sort before partition i+1's), sort within
    * each partition, then per-partition sequential ids + broadcast
    * offsets via [[withSequentialIds]]. Each partition sorts
    * independently; nothing serializes through one task, so the same
    * code holds at 100× dim cardinality. Requires `keyCol` unique and
    * non-null (dim natural keys are both).
    */
  def withRankByKey(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    withSequentialIds(
      df.repartitionByRange(col(keyCol)).sortWithinPartitions(col(keyCol)),
      idCol, startAt = 1L)
}
