package graft.functions

import java.lang.{Long => JLong}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, xxhash64}

/** HyperLogLog register state over a pre-hashed 64-bit key (F7's
  * approximate-count-distinct path, the 100 TB read-side twin of the
  * exact KPI).
  *
  * Why not the built-in `approx_count_distinct`: Spark's HLL++ flattens
  * its register file into `m/6 + 1` separate LongType buffer columns of
  * the aggregation row, and the non-codegen HashAggregate path that
  * ImperativeAggregate forces then pays per-row work that SCALES WITH
  * THE REGISTER COUNT — profiled at ~25 us/row at rsd=0.01 (m=16384,
  * 2731 buffer columns), turning a 600 k-row aggregate into 60 s of
  * task CPU. This aggregator keeps the registers as ONE opaque
  * `Array[Byte]` object (typed-Aggregator state, ObjectHashAggregate):
  * the per-row reduce is two array ops, the hash runs in the codegen'd
  * projection BELOW the aggregate (`xxhash64`), and serialization
  * happens only at partial-aggregate boundaries (one m-byte BINARY cell
  * per partition per group). Same state size, same merge shape
  * (elementwise max, associative and partitioning-independent), ~100x
  * less CPU.
  *
  * Estimator: classic 64-bit HLL (Flajolet et al.) with the standard
  * small-range linear-counting branch. No large-range correction is
  * needed with 64-bit hashes, and no HLL++ empirical bias tables: the
  * bias region (n between ~2.5m and ~5m) stays within the same
  * 1.04/sqrt(m) error budget the rsd dial promises, which is what the
  * rows-only tolerance contract (q45/q136, ApproxSpec) asserts.
  *
  * Reference behavior: KPI dashboard distinct counts,
  * Retail-Sales-Analysis-Etl-BI-Project `sql/kpi_queries.sql` (exact
  * COUNT(DISTINCT ...) — this is the sketched twin for scans where the
  * exact distinct shuffle is the bottleneck).
  */
private[functions] object HllCore {
  def update(p: Int, regs: Array[Byte], hash: Long): Array[Byte] = {
    // top p bits pick the register, leading zeros of the rest rank it;
    // the (1L << (p-1)) pad bounds the rank when the low bits are 0
    val idx = (hash >>> (64 - p)).toInt
    val rank = (JLong.numberOfLeadingZeros((hash << p) | (1L << (p - 1)))
      + 1).toByte
    if (rank > regs(idx)) regs(idx) = rank
    regs
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    val alpha =
      if (m == 16) 0.673
      else if (m == 32) 0.697
      else if (m == 64) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.scalb(1.0, -regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m.toDouble * m.toDouble / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.rint(est).toLong
  }
}

case class HllSketch(p: Int)
    extends Aggregator[Long, Array[Byte], Long] {
  require(p >= 4 && p <= 18, s"HLL precision out of range: $p")
  override def zero: Array[Byte] = new Array[Byte](1 << p)
  override def reduce(regs: Array[Byte], hash: Long): Array[Byte] =
    if (hash == HllAgg.NullSentinel) regs
    else HllCore.update(p, regs, hash)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllCore.merge(a, b)
  override def finish(regs: Array[Byte]): Long = HllCore.estimate(regs)
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** [[HllSketch]] that FINISHES to the raw register bytes instead of an
  * estimate — the persistable, re-aggregatable form. Pre-aggregate a
  * 100 TB fact once into per-shard sketch cells (a month, a tenant, a
  * file); any later rollup merges the cells with [[HllMergeEstimate]]
  * and never rescans the fact. Merge is elementwise max — associative,
  * commutative, idempotent — so merged-of-shards is BIT-IDENTICAL to
  * the single-pass sketch over the union (pinned in HllSpec and by
  * q137's self-oracle columns).
  */
case class HllSketchBytes(p: Int)
    extends Aggregator[Long, Array[Byte], Array[Byte]] {
  require(p >= 4 && p <= 18, s"HLL precision out of range: $p")
  override def zero: Array[Byte] = new Array[Byte](1 << p)
  override def reduce(regs: Array[Byte], hash: Long): Array[Byte] =
    if (hash == HllAgg.NullSentinel) regs
    else HllCore.update(p, regs, hash)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllCore.merge(a, b)
  override def finish(regs: Array[Byte]): Array[Byte] = regs
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Merges a column of [[HllSketchBytes]] cells into one estimate (the
  * read side of the pre-aggregated pattern). All inputs must share one
  * precision; a width mismatch is a corrupt-input error, not a silent
  * wrong answer.
  */
case class HllMergeEstimate(p: Int)
    extends Aggregator[Array[Byte], Array[Byte], Long] {
  require(p >= 4 && p <= 18, s"HLL precision out of range: $p")
  override def zero: Array[Byte] = new Array[Byte](1 << p)
  override def reduce(regs: Array[Byte], cell: Array[Byte]): Array[Byte] = {
    require(cell.length == regs.length,
      s"sketch width ${cell.length} != ${regs.length} (precision mismatch)")
    HllCore.merge(regs, cell)
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllCore.merge(a, b)
  override def finish(regs: Array[Byte]): Long = HllCore.estimate(regs)
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object HllAgg {
  /** Register-count precision for a target relative standard deviation,
    * the same dial semantics as the built-in: error ~ 1.04/sqrt(2^p).
    */
  def pForRsd(rsd: Double): Int = {
    require(rsd > 0.0 && rsd < 1.0, s"rsd out of range: $rsd")
    val p = math.ceil(
      math.log(math.pow(1.04 / rsd, 2)) / math.log(2.0)).toInt
    math.min(18, math.max(4, p))
  }

  /** Nominal register count (= state bytes) the rsd dial buys. */
  def registersForRsd(rsd: Double): Long = 1L << pForRsd(rsd)

  /** NULL rows map to this hash value in the codegen'd projection and
    * the reduce SKIPS it — matching COUNT(DISTINCT) and the built-in
    * `approx_count_distinct`, which both ignore nulls (xxhash64(null)
    * alone would return the seed constant and count null as one
    * value). A genuine key colliding with the sentinel is ignored too:
    * probability 2^-64 per distinct key, orders of magnitude below the
    * estimator's own 1.04/sqrt(m) error.
    */
  val NullSentinel: Long = 0x6e756c6c5f686c6cL // "null_hll"

  /** Approximate COUNT(DISTINCT expr): hashing stays in the codegen'd
    * projection below the aggregate; only the 2-array-op reduce runs
    * object-side. Null inputs are skipped ([[NullSentinel]]), the
    * COUNT(DISTINCT) / approx_count_distinct semantics.
    */
  def countDistinct(c: Column, rsd: Double): Column =
    udaf(HllSketch(pForRsd(rsd)), Encoders.scalaLong)
      .apply(hashOrSentinel(c))

  /** Aggregate to the raw sketch BYTES (re-aggregatable; pair with
    * [[mergeEstimate]]). One m-byte BINARY cell per group. Nulls are
    * skipped ([[NullSentinel]]).
    */
  def sketch(c: Column, rsd: Double): Column =
    udaf(HllSketchBytes(pForRsd(rsd)), Encoders.scalaLong)
      .apply(hashOrSentinel(c))

  private def hashOrSentinel(c: Column): Column =
    org.apache.spark.sql.functions.when(c.isNotNull, xxhash64(c))
      .otherwise(org.apache.spark.sql.functions.lit(NullSentinel))

  /** Merge a column of [[sketch]] cells (same rsd) into one estimate. */
  def mergeEstimate(sketches: Column, rsd: Double): Column =
    udaf(HllMergeEstimate(pForRsd(rsd)), Encoders.BINARY)
      .apply(sketches)
}
