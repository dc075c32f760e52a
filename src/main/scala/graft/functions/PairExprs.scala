package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Unordered-pair enumeration over a sorted item array — the map-side
  * kernel of the co-purchase pipeline (q94 lift, q129 PageRank edges).
  *
  * Semantically identical to the nested higher-order-function form
  *   flatten(transform(items, (x,i) ->
  *     transform(slice(items, i+2, size(items)), y -> struct(x, y))))
  * over `slice(items, 1, maxItems)`, but a single tight loop per row
  * instead of an interpreted lambda tree with one GenericArrayData
  * allocation per element (measured ~3x on the sf0.1 basket scan).
  * Pair order (lexicographic by position) is irrelevant downstream —
  * both consumers aggregate on (part_a, part_b).
  *
  * The input cap (`maxItems`, the mega-basket guard) bounds output at
  * maxItems*(maxItems-1)/2 structs per row, so executor memory per
  * basket is O(maxItems^2) regardless of data skew — the guard that
  * makes the explode safe at 100 TB.
  */
case class ItemPairsExpr(child: Expression, maxItems: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("part_a", LongType, nullable = false),
      StructField("part_b", LongType, nullable = false))),
    containsNull = false)
  override protected def withNewChildInternal(c: Expression): ItemPairsExpr =
    copy(child = c)
  override def prettyName: String = "graft_item_pairs"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), maxItems)
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, arr.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
