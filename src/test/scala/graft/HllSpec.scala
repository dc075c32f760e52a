package graft

import org.apache.spark.sql.functions._

import graft.functions.HllAgg

/** Contracts for the native HLL aggregator (graft.functions.HllAgg),
  * the sketch behind q45/q136: rsd dial semantics, accuracy across
  * cardinality regimes (linear counting vs raw HLL), duplicate
  * insensitivity, and partitioning invariance of the merge.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  test("pForRsd matches the 1.04/sqrt(m) dial semantics") {
    assert(HllAgg.pForRsd(0.05) === 9)   // (1.04/.05)^2 = 433 -> 512
    assert(HllAgg.pForRsd(0.02) === 12)  // 2704 -> 4096
    assert(HllAgg.pForRsd(0.01) === 14)  // 10816 -> 16384
    assert(HllAgg.registersForRsd(0.01) === 16384L)
    // clamps
    assert(HllAgg.pForRsd(0.9) === 4)
    assert(HllAgg.pForRsd(0.001) === 18)
  }

  test("estimates track exact within ~3x rsd in both regimes") {
    // linear-counting regime (n << m) and raw-HLL regime (n >> m)
    for ((n, rsd) <- Seq((2000, 0.01), (200000, 0.02), (50000, 0.05))) {
      val df = spark.range(n.toLong).toDF("k").repartition(8)
      val est = df.agg(HllAgg.countDistinct(col("k"), rsd).as("e"))
        .collect()(0).getLong(0)
      val err = math.abs(est - n.toDouble) / n
      assert(err <= 3 * rsd, s"n=$n rsd=$rsd est=$est err=$err")
    }
  }

  test("duplicate-insensitive and partitioning-invariant") {
    val base = spark.range(10000L).toDF("k")
    val dup = base.union(base).union(base)
    def est(df: org.apache.spark.sql.DataFrame, parts: Int): Long =
      df.repartition(parts)
        .agg(HllAgg.countDistinct(col("k"), 0.02).as("e"))
        .collect()(0).getLong(0)
    val e1 = est(base, 1)
    assert(est(dup, 7) === e1, "duplicates changed the estimate")
    assert(est(base, 32) === e1, "partitioning changed the estimate")
  }

  test("q137: merged shard sketches equal the single-pass sketch exactly") {
    val row = graft.operators.Insights.sketchShardRollup(spark, sf0001)
      .collect()(0)
    assert(row.getLong(0) >= 2, "fixture must span >=2 shards")
    assert(row.getLong(1) === row.getLong(2),
      s"merge lost information: merged=${row.getLong(1)} direct=${row.getLong(2)}")
    assert(row.getBoolean(3) === true)
    // per-shard estimates OVERSHOOT under naive addition (orders span
    // shard boundaries); equality would mean the shards never overlap,
    // which the multi-year lineitem fixture rules out
    assert(row.getLong(4) > row.getLong(2),
      s"sum of shard ests ${row.getLong(4)} should exceed ${row.getLong(2)}")
  }

  test("sketch bytes round-trip through a parquet sink and still merge") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hll-cells").toFile
    val df = spark.range(20000L)
      .select((col("id") % 4).as("shard"), col("id").as("k"))
    df.groupBy("shard").agg(HllAgg.sketch(col("k"), 0.02).as("sk"))
      .write.mode("overwrite").parquet(dir.getPath)
    val merged = spark.read.parquet(dir.getPath)
      .agg(HllAgg.mergeEstimate(col("sk"), 0.02).as("e"))
      .collect()(0).getLong(0)
    val direct = df.agg(HllAgg.countDistinct(col("k"), 0.02).as("e"))
      .collect()(0).getLong(0)
    assert(merged === direct,
      s"persisted cells merged to $merged, direct sketch $direct")
  }

  test("groups aggregate independently (per-group registers)") {
    val df = spark.range(30000L)
      .select((col("id") % 3).as("g"), col("id").as("k"))
    val got = df.groupBy("g")
      .agg(HllAgg.countDistinct(col("k"), 0.02).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(0L, 1L, 2L))
    got.values.foreach { e =>
      assert(math.abs(e - 10000.0) / 10000.0 <= 0.06, s"group est $e")
    }
  }

  test("nulls are skipped, matching COUNT(DISTINCT) semantics") {
    // 1000 distinct keys + 500 null rows: the estimate must track 1000
    // (not 1001) and equal the estimate over the null-free frame
    // bit-for-bit — nulls leave the registers untouched
    val withNulls = spark.range(1500L)
      .select(when(col("id") < 1000, col("id")).as("k"))
    val noNulls = spark.range(1000L).select(col("id").as("k"))
    val a = withNulls.agg(HllAgg.countDistinct(col("k"), 0.02))
      .collect()(0).getLong(0)
    val b = noNulls.agg(HllAgg.countDistinct(col("k"), 0.02))
      .collect()(0).getLong(0)
    assert(a === b, s"null rows changed the sketch: $a vs $b")
    val cellA = withNulls.agg(HllAgg.sketch(col("k"), 0.02))
      .collect()(0).getAs[Array[Byte]](0)
    val cellB = noNulls.agg(HllAgg.sketch(col("k"), 0.02))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(cellA, cellB),
      "null rows changed the persisted registers")
  }
}
