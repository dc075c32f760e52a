package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.HashUtil

/** Property tests (SURVEY.md §5): arithmetic invariants of the derived
  * money columns, idempotence, and native-expression/SQL hash agreement.
  * Uses raw ScalaCheck generators sampled under fixed seeds (the
  * scalatest-scalacheck bridge artifact is not in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("cosine/lsh codegen path is bit-identical to interpreted eval") {
    import org.apache.spark.sql.functions.col
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-5.0f, 5.0f))
    val rows = samples(Gen.zip(vecGen, vecGen), 60)
      .map { case (a, b) => (a.toArray, b.toArray) }
    val df = rows.toDF("a", "b")
    val planes = graft.operators.Similarity.planeSigns.map(_.take(16))
    def run(codegen: String): Seq[(Double, Long)] = {
      val prev = spark.conf.get("spark.sql.codegen.factoryMode")
      try {
        spark.conf.set("spark.sql.codegen.factoryMode", codegen)
        df.select(
            graft.functions.cosine_sim(col("a"), col("b")).as("c"),
            graft.functions.lsh_sig(col("a"), planes).as("s"))
          .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
      } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
    }
    val gen = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    assert(gen == interp,
      "generated arithmetic must replay the interpreted fold order exactly")
  }

  test("derived amounts: 0 <= unit_price <= price, total >= 0, for qty>0 and disc in [0,100]") {
    val cases = samples(for {
      price <- Gen.choose(0.01, 100000.0)
      disc <- Gen.choose(0.0, 100.0)
      qty <- Gen.choose(1, 5)
    } yield (price, disc, qty), 25)
    val df = cases.toDF("price", "discount_pct", "quantity")
    val rows = graft.operators.Cleaning.withDerivedAmounts(df)
      .select("price", "unit_price", "total_amount", "quantity").collect()
    rows.foreach { r =>
      val (price, unit, total, qty) =
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getInt(3))
      assert(unit >= 0.0 && unit <= price + 0.005)
      assert(total >= 0.0)
      assert(math.abs(total - BigDecimal(unit * qty)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"total $total != round(unit*qty) for $r")
    }
  }

  test("native md5Hash60 == Spark SQL conv(substr(md5(..),1,15),16,10) for arbitrary strings") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val strs = samples(Gen.asciiPrintableStr, 30).filter(_.nonEmpty)
    val sql = strs.toDF("t")
      .selectExpr("t",
        "CAST(conv(substr(md5(CAST(t AS BINARY)), 1, 15), 16, 10) AS BIGINT) AS h")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strs.foreach { s =>
      assert(HashUtil.md5Hash60(md, s) === sql(s), s"hash mismatch for '$s'")
    }
  }

  test("native tokens/shingles == Spark SQL split semantics") {
    val gen = Gen.nonEmptyListOf(
      Gen.oneOf("the", "fast", "key", "a", "Zx", "9q")).map(_.mkString(" "))
    samples(gen, 20).foreach { s =>
      val nativeToks = HashUtil.tokens(s).toSeq
      val sqlToks = Seq(s).toDF("t")
        .selectExpr("split(lower(trim(t)), '\\\\s+')")
        .head().getSeq[String](0)
      assert(nativeToks === sqlToks, s"token mismatch for '$s'")
      val nShingles = HashUtil.shingles3(HashUtil.tokens(s)).length
      assert(nShingles === math.max(nativeToks.length - 2, 1))
    }
  }

  test("upsertByKey is idempotent and keyed-distinct for arbitrary key sets") {
    val cases = samples(for {
      existing <- Gen.listOf(Gen.choose(1, 50))
      staged <- Gen.listOf(Gen.choose(1, 50))
    } yield (existing.distinct, staged.distinct), 8)
    cases.foreach { case (existing, staged) =>
      val e = existing.toDF("k")
      val s = staged.toDF("k")
      val once = graft.operators.Star.upsertByKey(e, s, "k")
      val twice = graft.operators.Star.upsertByKey(once, s, "k")
      val got = once.select("k").as[Int].collect().sorted.toSeq
      val want = (existing ++ staged.diff(existing)).sorted
      assert(got === want)
      assert(twice.count() === once.count())
    }
  }

  test("kmeans: partitions all vectors, and a second Lloyd iteration never hurts the objective") {
    import graft.operators.Similarity
    val total = graft.sources.Tables.embeddings(spark, sf0001).count()
    def objective(iters: Int): (Long, Double) = {
      val rows = Similarity.kmeans(spark, sf0001, k = 8, iters = iters).collect()
      assert(rows.length <= 8)
      rows.foreach { r =>
        assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000,
          s"purity_ppm out of range: $r")
      }
      (rows.map(_.getLong(1)).sum,
        rows.map(r => r.getDouble(2) * r.getLong(1)).sum)
    }
    val (n1, obj1) = objective(1)
    val (n2, obj2) = objective(2)
    assert(n1 == total && n2 == total, "every vector must land in a cluster")
    // Lloyd monotonicity on the summed cosine objective (1e-6 slack for
    // the floor-at-1e9 quantization in avg_cos)
    assert(obj2 >= obj1 - 1e-6, s"objective regressed: $obj1 -> $obj2")
  }
}
