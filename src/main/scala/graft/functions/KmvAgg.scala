package graft.functions

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{coalesce, lit, udaf}

/** K-MINIMUM-VALUES distinct sketch as a typed Aggregator — the
  * ENGINE-PORTABLE member of the sketch family (q178's idiom as a
  * reusable aggregate): the state is the K smallest distinct 60-bit
  * md5 hashes of the keys seen, so any engine with md5 reproduces the
  * cells bit-for-bit and a DuckDB oracle can restate the whole
  * computation exactly — unlike HLL ([[HllAgg]]), whose xxhash64
  * registers are Spark-specific and force rows-only verification.
  * That is exactly what round 12 uses it for: the streaming distinct
  * queries (q141/q157) move from the no-oracle whitelist to
  * hash-green by swapping their HLL state for KMV cells.
  *
  * Cost story vs HLL: ~8x more state bytes at equal error
  * (k longs vs 2^p registers; rsd ~ 1/sqrt(k-1)), same constant-
  * per-group bound, associative/commutative/idempotent merge
  * (bottom-k of unions of bottom-ks IS the global bottom-k — the
  * exact merge property q178 proves oracle-side).
  *
  * Buffer layout (mutated in place, ObjectHashAggregate state):
  * slot 0 = n (hashes kept), slots 1..n = the sorted distinct hashes,
  * fixed capacity k+1. Reduce is a binary search + bounded memmove;
  * hashing stays in the codegen'd projection BELOW the aggregate
  * (callers pass the md5-60 BIGINT column), the [[HllAgg]] lesson.
  */
case class KmvBottomK(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2 && k <= 65536, s"KMV k out of range: $k")
  override def zero: Array[Long] = new Array[Long](k + 1)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    if (h == KmvAgg.NullSentinel) return buf
    val n = buf(0).toInt
    val idx = java.util.Arrays.binarySearch(buf, 1, n + 1, h)
    if (idx >= 0) return buf // already kept
    val ins = -idx - 1
    if (n < k) {
      System.arraycopy(buf, ins, buf, ins + 1, n + 1 - ins)
      buf(ins) = h
      buf(0) = n + 1
    } else if (ins <= k) { // h below the current k-th: displace it
      System.arraycopy(buf, ins, buf, ins + 1, k - ins)
      buf(ins) = h
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val nb = b(0).toInt
    var i = 1
    while (i <= nb) { reduce(a, b(i)); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] =
    java.util.Arrays.copyOfRange(buf, 1, buf(0).toInt + 1)

  override def bufferEncoder: ExpressionEncoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: ExpressionEncoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object KmvAgg {
  /** Hash inputs are md5-60 values in [0, 2^60); -1 marks NULL keys and
    * the reduce skips it (COUNT DISTINCT ignores nulls).
    */
  val NullSentinel: Long = -1L

  /** 2^60 as the exactly-representable double both engines multiply
    * with in the (k-1)·2^60/h_k estimator.
    */
  val TwoPow60: Double = 1152921504606846976.0

  /** Bottom-k aggregate over a pre-hashed md5-60 BIGINT column; returns
    * the sorted hash array (derive k_used/kth/estimate with size /
    * element_at — and DROP the array before any driver-facing output).
    */
  def bottomK(hashCol: Column, k: Int): Column =
    udaf(KmvBottomK(k), Encoders.scalaLong)
      .apply(coalesce(hashCol, lit(NullSentinel)))
}
