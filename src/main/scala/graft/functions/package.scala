package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

/** Column-API surface for graft's native Catalyst expressions
  * (TextHashExprs.scala). Each function produces values identical to a
  * pure-SQL composition (and therefore to the DuckDB oracles) — see the
  * expression scaladocs.
  */
package object functions {

  /** MinHash signature (array<long>, k hashes) of a text column. */
  def minhash_sig(c: Column, numHashes: Int): Column =
    toColumn(MinHashSigExpr(toExpression(c), numHashes))

  /** Word 3-shingles (array<string>) of a text column. */
  def word_shingles(c: Column): Column =
    toColumn(WordShinglesExpr(toExpression(c)))

  /** 60-bit SimHash of a text column. */
  def simhash60(c: Column): Column =
    toColumn(SimHash60Expr(toExpression(c)))

  /** Distinct md5-60 hashes of the word 3-shingles (array<long>, asc). */
  def shingle_hashes(c: Column): Column =
    toColumn(ShingleHashesExpr(toExpression(c)))

  /** Min-8-gram rolling fingerprint of a text column. */
  def mingram_fp(c: Column): Column =
    toColumn(MinGramFpExpr(toExpression(c)))

  /** |A ∩ B| (long) of two sorted distinct array<long> columns —
    * value-identical to `size(array_intersect(a, b))` under the
    * [[ShingleHashesExpr]] sorted+distinct output contract.
    */
  def sorted_intersect_count(a: Column, b: Column): Column =
    toColumn(SortedIntersectCountExpr(toExpression(a), toExpression(b)))

  /** Cosine similarity (double) of two array<float> columns. */
  def cosine_sim(a: Column, b: Column): Column =
    toColumn(CosineSimExpr(toExpression(a), toExpression(b)))

  /** 16-bit sign-hyperplane LSH signature of an array<float> column. */
  def lsh_sig(c: Column, planes: Array[Array[Int]]): Column =
    toColumn(LshSigExpr(toExpression(c), planes))

  /** All unordered pairs (array<struct<part_a,part_b>>) of a sorted
    * bigint item array, capped at `maxItems` elements.
    */
  def item_pairs(c: Column, maxItems: Int): Column =
    toColumn(ItemPairsExpr(toExpression(c), maxItems))

  /** Index of the nearest centroid by cosine (IVF coarse assignment). */
  def argmax_cosine(c: Column, centroids: Array[Array[Float]]): Column =
    toColumn(ArgMaxCosineExpr(toExpression(c), centroids))

  /** Per-subspace nearest sub-centroid codes (product quantization;
    * codebooks in doubles, built from normalized seeds).
    */
  def pq_encode(c: Column, codebooks: Array[Array[Array[Double]]]): Column =
    toColumn(PqEncodeExpr(toExpression(c), codebooks))
}
