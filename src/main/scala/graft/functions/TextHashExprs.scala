package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash-heavy training-data operators.
  *
  * The SQL-composable forms (nested `transform`/`aggregate` higher-order
  * functions in operators.Dedup / Similarity) are semantically exact but
  * interpreted — per-shingle md5 calls walk an expression tree. These
  * expressions compute THE SAME VALUES (md5-derived, DuckDB-oracle-
  * portable) in tight JVM loops: one virtual call per row instead of per
  * shingle×hash. 10-40x faster on the minhash/simhash paths, which at
  * 100 TB are the dominant map-side cost of dedup.
  *
  * The md5-based expressions stay on CodegenFallback (their cost is the
  * MessageDigest calls, which codegen cannot improve); the pure-
  * arithmetic ANN expressions ([[CosineSimExpr]], [[LshSigExpr]])
  * implement real doGenCode — their loops emit into the stage, avoiding
  * the fallback's per-row row materialization and result boxing, with
  * generated FP order identical to interpreted eval. Null semantics
  * follow UnaryExpression.nullSafeEval.
  */
object HashUtil {
  /** 60-bit portable hash: first 15 hex nibbles of md5 (== Spark SQL
    * `conv(substr(md5(x),1,15),16,10)` and DuckDB
    * `('0x'||substr(md5(x),1,15))::BIGINT`).
    */
  def md5Hash60(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    // first 8 bytes big-endian == 16 nibbles; drop the lowest nibble
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Whitespace tokens of lower(trim(text)) — exactly Spark SQL
    * `split(lower(trim(text)), '\\s+')`. Locale.ROOT: Spark's lower()
    * is locale-independent; default-locale toLowerCase would diverge
    * under e.g. tr_TR ('I' -> dotless i).
    */
  def tokens(text: String): Array[String] =
    text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)

  /** Word 3-shingles, mirroring the SQL fragment in Dedup: shingle i
    * (0-based, count = max(n-2, 1)) joins tokens i, i+1, i+2, skipping
    * out-of-range (concat_ws null-skip semantics).
    */
  def shingles3(toks: Array[String]): Array[String] = {
    val n = math.max(toks.length - 2, 1)
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder()
      var j = i
      var first = true
      while (j <= i + 2) {
        if (j < toks.length) {
          if (!first) sb.append(' ')
          sb.append(toks(j))
          first = false
        }
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }
}

/** MinHash signature: sig[j] = min over word-3-shingles s of
  * md5Hash60(j + "|" + s). Values identical to the HOF form in
  * Dedup.minhashSignatures / its DuckDB oracle.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val md = MessageDigest.getInstance("MD5")
    val sh = HashUtil.shingles3(
      HashUtil.tokens(input.asInstanceOf[UTF8String].toString))
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      var j = 0
      while (j < numHashes) {
        val h = HashUtil.md5Hash60(md, j.toString + "|" + sh(i))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Word 3-shingles of normalized text (array<string>), identical to the
  * SQL fragment Dedup.shinglesExprSpark / its DuckDB twin.
  */
case class WordShinglesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): WordShinglesExpr =
    copy(child = c)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val sh = HashUtil.shingles3(
      HashUtil.tokens(input.asInstanceOf[UTF8String].toString))
    new GenericArrayData(sh.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }
}

/** DISTINCT 60-bit md5 hashes of the word 3-shingles (array<long>,
  * ascending): the fused tokens→shingles→hash→dedup kernel for
  * set-similarity operators (q185). One expression evaluation replaces
  * a shingle-array explode, a per-shingle md5 Column tree, and a
  * (doc, hash)-grain distinct exchange — the per-doc dedup happens in a
  * HashSet inside the loop, so the scan emits already-unique hashes.
  * Values identical to hashing [[WordShinglesExpr]]'s elements with
  * TextAnalysis.md5Hash60 (and therefore to the DuckDB oracle's
  * `('0x'||substr(md5(s),1,15))::BIGINT`).
  */
case class ShingleHashesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr =
    copy(child = c)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val md = MessageDigest.getInstance("MD5")
    val sh = HashUtil.shingles3(
      HashUtil.tokens(input.asInstanceOf[UTF8String].toString))
    val seen = new java.util.HashSet[Long](sh.length * 2)
    val out = new Array[Long](sh.length)
    var n = 0
    var i = 0
    while (i < sh.length) {
      val h = HashUtil.md5Hash60(md, sh(i))
      if (seen.add(h)) { out(n) = h; n += 1 }
      i += 1
    }
    val trimmed = java.util.Arrays.copyOf(out, n)
    java.util.Arrays.sort(trimmed)
    new GenericArrayData(trimmed)
  }
}

/** 60-bit SimHash over whitespace tokens; values identical to
  * Dedup.simhash / its DuckDB oracle (per-bit +-1 voting on each
  * token-hash, bit set iff vote > 0).
  */
case class SimHash60Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def withNewChildInternal(c: Expression): SimHash60Expr =
    copy(child = c)
  override def prettyName: String = "graft_simhash60"

  override protected def nullSafeEval(input: Any): Any = {
    val md = MessageDigest.getInstance("MD5")
    val toks = HashUtil.tokens(input.asInstanceOf[UTF8String].toString)
    val votes = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val h = HashUtil.md5Hash60(md, toks(i))
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }
}

/** Min-gram fingerprint: min over all 8-char grams g of lower(trim(text))
  * of md5Hash60(g) — identical to TextAnalysis.fingerprints' min_gram_fp.
  *
  * ORACLE CONTRACT — gram boundaries count UTF-16 code units here vs
  * Unicode code points in DuckDB's substr: identical for BMP text
  * without surrogate pairs (driver testdata is ASCII); astral-plane
  * characters would shift gram windows between the two engines.
  */
case class MinGramFpExpr(child: Expression, gram: Int = 8)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def withNewChildInternal(c: Expression): MinGramFpExpr =
    copy(child = c)
  override def prettyName: String = "graft_mingram_fp"

  override protected def nullSafeEval(input: Any): Any = {
    val md = MessageDigest.getInstance("MD5")
    val t = input.asInstanceOf[UTF8String].toString.trim
      .toLowerCase(java.util.Locale.ROOT)
    val n = math.max(t.length - (gram - 1), 1)
    var best = Long.MaxValue
    var i = 0
    while (i < n) {
      val g = t.substring(i, math.min(i + gram, t.length))
      val h = HashUtil.md5Hash60(md, g)
      if (h < best) best = h
      i += 1
    }
    java.lang.Long.valueOf(best)
  }
}

/** Cosine similarity of two float-array columns, computed as the same
  * left fold in double as the HOF form in Similarity (bit-identical
  * results, DuckDB-oracle-portable).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CosineSimExpr = copy(left = l, right = r)
  override def prettyName: String = "graft_cosine"

  // each side may be array<float> (stored embeddings) or array<double>
  // (computed centroids); widening float -> double first preserves the
  // same values the SQL fold's CAST(x AS DOUBLE) produces
  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(FloatType, _) => false
    case t => throw new IllegalArgumentException(
      s"graft_cosine: expected array<float|double>, got $t")
  }
  private def getter(arr: String, isDouble: Boolean, i: String): String =
    if (isDouble) s"$arr.getDouble($i)" else s"((double) $arr.getFloat($i))"

  // real codegen (not CodegenFallback): the loop body is emitted into
  // the stage, so per-row cost avoids the fallback's row materialization
  // and Double boxing. The generated arithmetic replays nullSafeEval's
  // exact FP order (three separate left folds) — bit-identical results.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ld, rd) = (elemIsDouble(left), elemIsDouble(right))
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "graft_cosine: dimension mismatch (" + $n + " vs " +
         |      $b.numElements() + ")");
         |}
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${getter(a, ld, i)} * ${getter(b, rd, i)};
         |}
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = ${getter(a, ld, i)}; $nx += $v * $v;
         |}
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = ${getter(b, rd, i)}; $ny += $v * $v;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) *
         |  java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (ld, rd) = (elemIsDouble(left), elemIsDouble(right))
    @inline def at(arr: ArrayData, isDouble: Boolean, i: Int): Double =
      if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
    val n = x.numElements()
    // fail loudly on dimension mismatch — a silent min-length dot product
    // would return a plausible-but-wrong cosine
    require(y.numElements() == n,
      s"graft_cosine: dimension mismatch ($n vs ${y.numElements()})")
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      dot += at(x, ld, i) * at(y, rd, i)
      i += 1
    }
    i = 0
    while (i < n) { val v = at(x, ld, i); nx += v * v; i += 1 }
    i = 0
    while (i < n) { val v = at(y, rd, i); ny += v * v; i += 1 }
    java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }
}

/** |A ∩ B| of two SORTED, DISTINCT long arrays (the
  * [[ShingleHashesExpr]] output contract), counted by a single merge
  * walk — no hash set, no intersection array, no per-element boxing.
  * Value-identical to `size(array_intersect(a, b))` whenever both
  * inputs are sorted ascending with unique elements (array_intersect
  * preserves a's elements deduped; with distinct inputs its size IS the
  * set-intersection cardinality). The built-in allocates an OpenHashSet
  * plus a result array per evaluation and was the per-pair cost center
  * of the verify stages (q33/q185) — the merge walk is allocation-free
  * and ~an order of magnitude cheaper on the measured shingle-array
  * lengths, which also shrinks the cost of Catalyst pushing a verify
  * threshold into a join condition (the intersect then runs twice per
  * pair: condition + projection).
  *
  * CONTRACT: callers must only pass arrays that are sorted+distinct by
  * construction; nothing is re-checked here (a check would re-walk the
  * arrays and erase the win). DedupSpec pins equality against
  * array_intersect on the real corpus kernels.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SortedIntersectCountExpr = copy(left = l, right = r)
  override def prettyName: String = "graft_sorted_intersect_count"

  // real codegen like CosineSimExpr: the merge loop emits into the
  // stage, so a pair verify pays array accessor calls only
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $na && $j < $nb) {
         |  final long $va = $a.getLong($i);
         |  final long $vb = $b.getLong($j);
         |  if ($va < $vb) { $i++; }
         |  else if ($va > $vb) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val va = x.getLong(i)
      val vb = y.getLong(j)
      if (va < vb) i += 1
      else if (va > vb) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    java.lang.Long.valueOf(c)
  }
}

/** Nearest-centroid assignment: index (0-based) of the centroid with the
  * highest cosine similarity to the input vector, ties broken toward the
  * lowest index — exactly `row_number() OVER (ORDER BY cosine DESC,
  * cluster ASC) = 1` over a centroid cross join, which is what the DuckDB
  * oracle states. Per-centroid cosine uses the same left-fold-in-double
  * as [[CosineSimExpr]], so assignments are engine-identical.
  *
  * Scale shape: the centroid table is a literal (k rows, collected once
  * at plan build — the IVF coarse-quantizer analog of broadcasting a
  * fitted model); assignment is one narrow map-side pass, no shuffle.
  */
case class ArgMaxCosineExpr(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override protected def withNewChildInternal(c: Expression): ArgMaxCosineExpr =
    copy(child = c)
  override def prettyName: String = "graft_argmax_cosine"

  // the centroid norms are constants of the centroid table — computing
  // them per input row would waste O(k·d) each; the per-centroid sum
  // order is unchanged, so the cosines (and the oracle match) are
  // bit-identical
  @transient private lazy val centroidNorms: Array[Double] =
    centroids.map { cent =>
      var ny = 0.0
      var i = 0
      while (i < cent.length) { val y = cent(i).toDouble; ny += y * y; i += 1 }
      math.sqrt(ny)
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    // the query-vector norm is constant across centroids and cancels in
    // the argmax ONLY with exact math; cosines must be computed the full
    // way so float rounding matches the oracle's per-pair cosine
    var nx = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; nx += x * x; i += 1 }
    val xNorm = math.sqrt(nx)
    var best = -1
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      require(cent.length == n,
        s"graft_argmax_cosine: dimension mismatch ($n vs ${cent.length})")
      var dot = 0.0
      i = 0
      while (i < n) { dot += v.getFloat(i).toDouble * cent(i).toDouble; i += 1 }
      val cos = dot / (xNorm * centroidNorms(c))
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    java.lang.Integer.valueOf(best)
  }
}

/** Product-quantization encoder over the L2-NORMALIZED input: the
  * vector is first scaled to unit norm (double left-fold norm in
  * dimension order — on unit vectors squared L2 is 2−2·cosine, so PQ's
  * ADC ranking is metric-compatible with the cosine the rest of the ANN
  * family uses); then for each of the M subspaces the 0-based index of
  * the sub-codebook entry with the smallest squared L2 distance to the
  * normalized subvector (ties toward the lowest index — exactly
  * `row_number() OVER (ORDER BY d2 ASC, j ASC) = 1` per
  * (vector, subspace), which is what the DuckDB oracle states).
  * Output: array<int> of M codes.
  *
  * `codebooks(s)(j)` is sub-centroid j of subspace s (already built
  * from normalized seeds, in doubles); all subspaces share one width.
  * The codebook rides along as a literal — the broadcast-the-model
  * pattern at expression grain; the scan this feeds emits M small ints
  * per vector, which is the entire point of PQ: downstream ANN reads M
  * bytes per vector, not d floats.
  */
case class PqEncodeExpr(child: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  private val m = codebooks.length
  private val subDim = codebooks(0)(0).length
  require(codebooks.forall(_.forall(_.length == subDim)),
    "graft_pq_encode: ragged codebook")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    require(n == m * subDim,
      s"graft_pq_encode: dim $n != ${m * subDim}")
    // full-vector norm, double fold in dimension order (zero-norm
    // vectors pass through unscaled — the embedQuantize convention)
    var nx = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; nx += x * x; i += 1 }
    val norm = if (nx == 0.0) 1.0 else math.sqrt(nx)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val base = s * subDim
      var best = -1
      var bestD2 = Double.PositiveInfinity
      var j = 0
      while (j < cb.length) {
        val cent = cb(j)
        var d2 = 0.0
        i = 0
        while (i < subDim) {
          val d = v.getFloat(base + i).toDouble / norm - cent(i)
          d2 += d * d
          i += 1
        }
        if (d2 < bestD2) { bestD2 = d2; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }
}

/** 16-bit sign-hyperplane LSH signature under Similarity.planeSigns —
  * identical values to the HOF form (same left-fold dot order).
  */
case class LshSigExpr(child: Expression, planes: Array[Array[Int]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def withNewChildInternal(c: Expression): LshSigExpr =
    copy(child = c)
  override def prettyName: String = "graft_lsh_sig"

  // real codegen: the plane matrix rides along as a referenced object
  // (the broadcast-the-model pattern at expression grain); the emitted
  // loops replay nullSafeEval's fold order exactly
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("planes", planes, "int[][]")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val coefs = ctx.freshName("coefs")
      s"""
         |final int $n = $v.numElements();
         |long $sig = 0L;
         |for (int $p = 0; $p < $planesRef.length; $p++) {
         |  final int[] $coefs = $planesRef[$p];
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $v.getFloat($i)) * ((double) $coefs[$i]);
         |  }
         |  if ($dot > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val coefs = planes(p)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += v.getFloat(i).toDouble * coefs(i).toDouble
        i += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(sig)
  }
}
