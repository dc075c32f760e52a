package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-side sizing helpers.
  *
  * A hard `broadcast()` hint on a dimension that scales with the dataset
  * is a driver OOM waiting for the 100× load: the hint overrides
  * Catalyst's size check, so a multi-GB dim gets collected to the driver
  * instead of degrading to a shuffle join. [[broadcastIfSmall]] keeps the
  * broadcast *outcome* where it is safe (the optimizer's own size
  * estimate is under `spark.sql.autoBroadcastJoinThreshold`) and
  * otherwise returns the frame unhinted, leaving the strategy choice to
  * Catalyst + AQE (which re-checks with runtime statistics).
  */
object Joins {

  /** Hint `df` for broadcast only when its estimated plan size is under
    * the session's autoBroadcastJoinThreshold. Estimation uses the
    * optimized logical plan's statistics (file sizes for scans,
    * propagated through projections/filters) — no job is run.
    */
  def broadcastIfSmall(df: DataFrame): DataFrame =
    if (fitsBroadcast(df)) broadcast(df) else df

  /** Same gate, but sized by `sizeProxy` instead of `df` itself — for
    * frames whose lineage passes through an RDD hop (e.g. the
    * zipWithIndex in [[ScalableKeys]]), where the logical plan is an
    * ExistingRDD with unknown (infinite) statistics. The proxy should be
    * an upper bound that scales with `df` (canonically: the source table
    * scan the dim was derived from) — so the hint still disappears when
    * the dim genuinely outgrows the threshold.
    */
  def broadcastIfSmall(df: DataFrame, sizeProxy: DataFrame): DataFrame =
    if (fitsBroadcast(sizeProxy)) broadcast(df) else df

  private def fitsBroadcast(df: DataFrame): Boolean = {
    val threshold = parseBytes(
      df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold",
        "10485760"))
    threshold >= 0 &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(threshold)
  }

  /** The conf value is either a plain byte count or a size string
    * ("10MB"); JavaUtils is the parser Spark itself uses for the latter.
    */
  private def parseBytes(s: String): Long =
    try s.trim.toLong
    catch {
      case _: NumberFormatException =>
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s.trim)
    }
}
