package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Input/state row for [[TopKByValue]]: a sort value, a unique
  * tiebreak key, and a carried string payload.
  */
case class RankedRow(sortVal: Double, key: Long, tag: String)

/** Exact per-group top-k as a typed [[Aggregator]] (Spark's UDAF
  * machinery — compiles to a Catalyst aggregate with partial/final
  * merge): the state is a bounded k-element list ordered by
  * (sortVal DESC, key ASC), so map-side partial aggregation keeps at
  * most k rows per group per partition. At 100 TB this is the shape
  * that beats the ROW_NUMBER-window form: the exchange carries k rows
  * per (group, partition) instead of every row, and no per-group sort
  * materializes. The total order (unique `key` tiebreak) makes reduce/
  * merge associative and the result partitioning-independent — which is
  * what lets the DuckDB window oracle match exactly.
  */
case class TopKByValue(k: Int)
    extends Aggregator[RankedRow, Seq[RankedRow], Seq[RankedRow]] {

  private def before(a: RankedRow, b: RankedRow): Boolean =
    a.sortVal > b.sortVal || (a.sortVal == b.sortVal && a.key < b.key)

  // The buffer INVARIANT is "sorted by (sortVal DESC, key ASC), size
  // <= k" — maintained by every operation below, so the hot reduce path
  // is O(k) (early-exit O(1) for the common below-threshold row), not a
  // per-row O(k log k) re-sort.
  override def zero: Seq[RankedRow] = Seq.empty

  override def reduce(b: Seq[RankedRow], a: RankedRow): Seq[RankedRow] = {
    if (b.size >= k && !before(a, b.last)) b // below the current k-th: skip
    else {
      val (hd, tl) = b.span(before(_, a)) // insertion point, one linear pass
      ((hd :+ a) ++ tl).take(k)
    }
  }

  // one linear merge pass over two sorted buffers (classic merge step);
  // indexed access because the encoder may hand back array-backed Seqs
  // whose tail is a copy
  override def merge(b1: Seq[RankedRow], b2: Seq[RankedRow]): Seq[RankedRow] = {
    val (x, y) = (b1.toIndexedSeq, b2.toIndexedSeq)
    val out = Seq.newBuilder[RankedRow]
    var i = 0; var j = 0
    while (i + j < k && (i < x.size || j < y.size)) {
      if (j >= y.size || (i < x.size && before(x(i), y(j)))) {
        out += x(i); i += 1
      } else { out += y(j); j += 1 }
    }
    out.result()
  }
  override def finish(r: Seq[RankedRow]): Seq[RankedRow] = r
  override def bufferEncoder: Encoder[Seq[RankedRow]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[RankedRow]] = ExpressionEncoder()
}
