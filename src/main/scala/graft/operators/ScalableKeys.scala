package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

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
    // One deliberate RDD hop: zipWithIndex is exactly the per-partition
    // imperative op RDDs are for. zipWithIndex runs an EAGER job to
    // count rows per partition, and every downstream consumer (e.g. a
    // broadcast build) recomputes the lineage from scratch — so persist
    // the hop: the count job materializes it once and the consumer
    // reads the cache. Unpersist is left to the ContextCleaner (the
    // RDD is unreachable once the returned frame is); at cluster scale
    // MEMORY_AND_DISK degrades to disk instead of evicting mid-job.
    val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val indexed = rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + startAt))
    }
    val schema = StructType(df.schema.fields :+
      StructField(idCol, LongType, nullable = false))
    spark.createDataFrame(indexed, schema)
  }

  /** Distributed EXCLUSIVE prefix sum of `valueCol` in `orderCol` order —
    * value-identical to `SUM(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
    * PRECEDING AND 1 PRECEDING)` but without the single-partition window
    * funnel. Same two-pass shape as [[withSequentialIds]]: range-partition
    * on the key so partition i's keys all sort before partition i+1's,
    * sort within partitions, then (1) a tiny job summing `valueCol` per
    * partition and (2) a map-only pass threading the broadcast cumulative
    * offsets. Requires `orderCol` unique + non-null and `valueCol` a
    * non-null integral; at 100 TB the only cross-worker traffic is the
    * range exchange plus one long per partition.
    */
  def withPrefixSum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val valIdx = sorted.schema.fieldIndex(valueCol)
    def valueOf(r: Row): Long = r.get(valIdx) match {
      case l: Long => l
      case i: Int  => i.toLong
      case other   => throw new IllegalArgumentException(
        s"$valueCol must be integral, got $other")
    }
    // Persist the hop: pass 1 (per-partition sums) materializes it,
    // pass 2 (offset threading) reads the cache instead of re-running
    // the whole upstream pipeline a second time.
    val rdd = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val partSums = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L; it.foreach(r => s += valueOf(r)); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // offsets(i) = sum before partition i
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val row = Row.fromSeq(r.toSeq :+ acc)
        acc += valueOf(r)
        row
      }
    }
    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    spark.createDataFrame(out, schema)
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
    withRankByKeys(df, Seq(keyCol), idCol)

  /** [[withRankByKey]] over a multi-column total order — value-identical
    * to `row_number() OVER (ORDER BY k1, k2, ...)` with the same
    * two-pass shape. Requires the column TUPLE unique and non-null
    * (tie-broken orders are exactly that).
    */
  def withRankByKeys(df: DataFrame, keyCols: Seq[String],
      idCol: String): DataFrame = {
    val ks = keyCols.map(col)
    withSequentialIds(
      df.repartitionByRange(ks: _*).sortWithinPartitions(ks: _*),
      idCol, startAt = 1L)
  }
}
