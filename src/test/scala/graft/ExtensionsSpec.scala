package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Semantics checks for the training-data extension operators:
  * dedup, similarity search, text analysis, multimodal plumbing.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("LSH mega-bucket cap bounds the pair blowup on a boilerplate corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    val text = "the same boilerplate legal footer text repeated on every page"
    (0 until 40).map(i => (i.toLong, text, "en", "fixture", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // identical docs -> one mega-bucket per band -> quadratic pairs
    assert(Dedup.neardupPairs(spark, dir).count() === 40L * 39 / 2)
    // capped: buckets above the cap are skipped before the self-join
    assert(Dedup.neardupPairs(spark, dir, maxBucketSize = Some(10))
      .count() === 0L)
  }

  test("minhash LSH finds the planted near-duplicates (jaccard >= 0.9 pairs)") {
    val pairs = Dedup.neardupPairs(spark, sf0001)
      .filter($"jaccard" >= 0.9).count()
    assert(pairs >= 20, s"expected the planted ~28 near-dup pairs, got $pairs")
  }

  test("minhash signature approximates jaccard: sig agreement high for near-dups") {
    val sigs = Dedup.minhashSignaturesRaw(spark, sf0001)
    val near = Dedup.neardupPairs(spark, sf0001).filter($"jaccard" >= 0.9)
      .select("doc_a", "doc_b")
    val agreement = near
      .join(sigs.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("minhash", "mh_a"), "doc_a")
      .join(sigs.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("minhash", "mh_b"), "doc_b")
      .select((expr(
        "size(filter(zip_with(mh_a, mh_b, (x, y) -> x = y), b -> b))")
        .cast("double") / 16.0).as("agree"))
      .agg(avg("agree")).as[Double].head()
    assert(agreement > 0.8, s"minhash agreement $agreement too low for 0.9+ jaccard")
  }

  test("simhash hamming distance small for near-dups, large for random pairs") {
    val sh = Dedup.simhash(spark, sf0001)
    val near = Dedup.neardupPairs(spark, sf0001).filter($"jaccard" >= 0.9)
    val withSh = near
      .join(sh.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("simhash", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("simhash", "sh_b"), "doc_b")
      .select(expr("bit_count(sh_a ^ sh_b)").cast("double").as("h"))
      .agg(avg("h")).as[Double].head()
    assert(withSh < 8.0, s"near-dup avg hamming $withSh should be small")
    // random pairs: clearly separated from near-dups (the synthetic docs
    // share a small vocabulary, so expect ~18 of 60 bits, not ~30)
    val randomPairs = sh.as("a").crossJoin(sh.as("b"))
      .filter($"a.doc_id" + 137 === $"b.doc_id")
      .select(expr("bit_count(a.simhash ^ b.simhash)").cast("double").as("h"))
      .agg(avg("h")).as[Double].head()
    assert(randomPairs > 10.0, s"random-pair avg hamming $randomPairs suspiciously low")
  }

  test("q147 incremental dedup == batch pairs restricted to cross-parity best matches; index reused") {
    val got = Dedup.incrementalDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // reference: the batch pair-finder's cross-parity pairs, reduced to
    // the best corpus match per incoming (odd) doc
    val want = Dedup.neardupPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a % 2) != (b % 2) }
      .map { case (a, b, j) =>
        if (a % 2 == 1) (a, b, j) else (b, a, j) }
      .groupBy(_._1).map { case (_, ms) =>
        ms.minBy { case (_, c, j) => (-j, c) } }
      .toSeq.sortBy(_._1)
    assert(got === want)
    assert(got.nonEmpty, "fixture has no cross-parity near-dups")
    // the persisted index must be REUSED on a second call (same
    // documents mtime): the parquet _SUCCESS file is not rewritten
    val success = new java.io.File("/tmp/graft_index",
      "bands_" + graft.sources.Tables.pathKey(sf0001) + "/bands/_SUCCESS")
    assert(success.exists)
    val stamp = success.lastModified
    Dedup.incrementalDedup(spark, sf0001).collect()
    assert(success.lastModified === stamp,
      "second ingest rebuilt the corpus index instead of probing it")
  }

  test("q159 dedup loop: a round-2 doc dedups against a round-1 ADMIT") {
    import spark.implicits._
    // controlled corpus: doc_id % 2 == 0 -> corpus; % 4 == 1 -> round 1;
    // % 4 == 3 -> round 2. doc 3 copies doc 1 (a round-1 admit) and
    // matches nothing in the corpus — it can only dedup if round 1's
    // admits were appended to the index (the loop under test).
    val corpusA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpusB = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val novel = "quick brown foxes jump over many lazy sleeping river dogs"
    val other = "totally unrelated words about quantum chromodynamics here now"
    val docs = Seq(
      (0L, corpusA), (2L, corpusB),          // corpus (even)
      (1L, novel),                           // round 1: no match -> ADMIT
      (5L, corpusA),                         // round 1: dup of corpus 0
      (3L, novel),                           // round 2: dup of ADMIT 1
      (7L, other))                           // round 2: no match
      .map { case (id, t) => (id, t, "en", "fixture", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = new java.io.File("/tmp/graft_fixture",
      "dedup_loop_" + System.nanoTime())
    docs.coalesce(1).write.parquet(
      new java.io.File(dir, "documents.parquet").getPath)
    try {
      val got = Dedup.incrementalDedupLoop(spark, dir.getPath).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got === Set(
        (1L, 5L, 0L, 1.0),   // round 1: 5 dups against corpus doc 0
        (2L, 3L, 1L, 1.0)),  // round 2: 3 dups against round-1 ADMIT 1
        s"loop decisions wrong: $got")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("q144 IVF×PQ recall on a CLUSTERED corpus: >=0.7 at scanned fraction <=0.25") {
    // The driver's isotropic vectors are the info-theoretic worst case
    // for coarse pruning (q144 scaladoc); this fixture is the claimed
    // deployment case — a seeded mixture of Gaussians, where cell
    // routing concentrates true neighbors and IVFADC approaches
    // flat-PQ recall at nprobe << nClusters. Gate prescribed by the
    // round-8 verdict: recall@5 >= 0.7 while scanning <= 25% of cells.
    import spark.implicits._
    val dim = operators.Similarity.Dim
    val rnd = new scala.util.Random(42)
    def unit(): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(16)(unit())
    val sigma = 0.15 // intra-cluster cosine ~0.9, inter ~iid-random
    val vecs = (0 until 2000).map { i =>
      val c = centers(i % 16) // queries (vec_id<10) spread over clusters
      val v = c.map(x => (x + sigma * rnd.nextGaussian()).toFloat)
      (i.toLong, v.toSeq, i % 16)
    }.toDF("vec_id", "embedding", "label")
    val dir = new java.io.File("/tmp/graft_fixture",
      "clustered_emb_" + System.nanoTime())
    vecs.coalesce(1).write.parquet(
      new java.io.File(dir, "embeddings.parquet").getPath)
    try {
      def topSets(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val exact = topSets(
        operators.Similarity.knnBruteForce(spark, dir.getPath))
      def recallAt(nprobe: Int): Double = {
        val approx = topSets(operators.Similarity.annIvfPq(
          spark, dir.getPath, nprobe = nprobe))
        val hits = exact.toSeq.map { case (q, want) =>
          approx.getOrElse(q, Set.empty).intersect(want).size.toDouble /
            want.size
        }
        hits.sum / hits.size
      }
      val r2 = recallAt(2)
      val r4 = recallAt(4)
      val r8 = recallAt(8)
      info(f"clustered recall@5: nprobe2=$r2%.2f nprobe4=$r4%.2f nprobe8=$r8%.2f")
      assert(r4 >= 0.7,
        f"clustered-corpus recall $r4%.2f at nprobe=4 (25%% of cells) " +
          "below the 0.7 gate - the IVFADC deployment claim fails")
      assert(r8 >= r4 - 0.05 && r4 >= r2 - 0.05,
        s"recall not ~monotone in nprobe: $r2 / $r4 / $r8")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("q162 filtered ANN: every neighbor matches the query's label, ranks valid") {
    val rows = operators.Similarity.annIvfFiltered(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (q, lbl, n) = (r.getLong(0), r.getInt(1), r.getLong(2))
      assert(emb(q) === lbl, s"query $q label mismatch")
      assert(emb(n) === lbl, s"neighbor $n fails the label predicate of $q")
      assert(q !== n)
    }
    // per query: <= k rows, cosine non-increasing in rank
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.length <= 5, s"query $q returned ${rs.length} > k rows")
      val byRank = rs.sortBy(_.getInt(3)).map(_.getDouble(4))
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      }, s"query $q cosine not ranked desc")
    }
  }

  test("exact dedup: distinct texts at sf0.001 -> every group has 1 copy") {
    val d = Dedup.exactDedup(spark, sf0001)
    assert(d.count() === 500)
    assert(d.filter($"n_copies" > 1).count() === 0)
  }

  test("cosine_sim on a double-array side matches the SQL fold bit-exactly") {
    // kmeans scores float embeddings against double centroids; the
    // native codegen loop must replay the SQL left-fold FP order
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").limit(50)
    val withCent = emb.crossJoin(
      emb.select($"embedding".cast("array<double>").as("centroid")).limit(3))
    val got = withCent.select(
        graft.functions.cosine_sim($"embedding", $"centroid").as("c"),
        expr("""(aggregate(zip_with(embedding, centroid,
          |   (x, y) -> CAST(x AS DOUBLE) * y),
          |   CAST(0 AS DOUBLE), (acc, v) -> acc + v))
          | / (sqrt(aggregate(transform(embedding,
          |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
          |   CAST(0 AS DOUBLE), (acc, v) -> acc + v))
          |  * sqrt(aggregate(transform(centroid, y -> y * y),
          |   CAST(0 AS DOUBLE), (acc, v) -> acc + v)))""".stripMargin)
          .as("sql"))
      .collect()
    assert(got.length === 150)
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("ANN-LSH recall vs brute force at k=5 is usable (> 0.4 on random data)") {
    val bf = Similarity.knnBruteForce(spark, sf0001)
      .select("query_id", "neighbor_id")
    val ann = Similarity.annLsh(spark, sf0001)
      .select("query_id", "neighbor_id")
    val hits = bf.intersect(ann).count()
    val recall = hits.toDouble / bf.count()
    assert(recall > 0.4, s"ANN recall $recall too low")
  }

  test("IVF ANN: recall vs brute force beats plain LSH expectations (> 0.5)") {
    val bf = Similarity.knnBruteForce(spark, sf0001)
      .select("query_id", "neighbor_id")
    val ivf = Similarity.annIvf(spark, sf0001)
      .select("query_id", "neighbor_id")
    val recall = bf.intersect(ivf).count().toDouble / bf.count()
    assert(recall > 0.5, s"IVF recall $recall too low")
  }

  test("PQ ANN: ADC shortlist + exact re-rank recalls most of true top-5") {
    val bf = Similarity.knnBruteForce(spark, sf0001)
      .select("query_id", "neighbor_id")
    val pq = Similarity.annPq(spark, sf0001)
      .select("query_id", "neighbor_id")
    val recall = bf.intersect(pq).count().toDouble / bf.count()
    // isotropic synthetic vectors are quantization's worst case; the
    // 100-candidate shortlist carries recall (measured 0.76-0.9 at
    // sf0.01/sf0.001), the raw ADC rank alone would sit near 0.08
    assert(recall > 0.5, s"PQ recall $recall too low")
  }

  test("PQ ANN re-rank cosines equal the brute-force cosines bit-exact") {
    // on shared (query, neighbor) rows the re-rank stage must produce
    // the IDENTICAL double (same cosine_sim fold) as brute force
    val bf = Similarity.knnBruteForce(spark, sf0001)
      .select("query_id", "neighbor_id", "cosine")
    val pq = Similarity.annPq(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("query_id"),
        org.apache.spark.sql.functions.col("neighbor_id"),
        org.apache.spark.sql.functions.col("cosine").as("pq_cosine"))
    val joined = bf.join(pq, Seq("query_id", "neighbor_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("trained PQ codebooks move off the sample seeds and keep recall") {
    val bf = Similarity.knnBruteForce(spark, sf0001)
      .select("query_id", "neighbor_id")
    val pq = Similarity.annPqTrained(spark, sf0001)
      .select("query_id", "neighbor_id")
    val recall = bf.intersect(pq).count().toDouble / bf.count()
    // measured 0.82 (trained) vs 0.76 (sample) at sf0.01; same floor
    // as the sample variant — the point pinned here is the FIT runs
    // and the searcher still recalls, not a strict ordering (one Lloyd
    // step on isotropic data can tie)
    assert(recall > 0.5, s"trained PQ recall $recall too low")
    // the fit actually moved the codebook (a mean of >1 members is
    // almost surely not a corpus point)
    val sample = Similarity.annPq(spark, sf0001)
      .select("query_id", "neighbor_id", "rank").collect().toSeq
    val trained = Similarity.annPqTrained(spark, sf0001)
      .select("query_id", "neighbor_id", "rank").collect().toSeq
    assert(sample != trained,
      "trained and sample PQ returned identical rankings — fit is a no-op?")
  }

  test("second Lloyd round: distortion keeps falling, recall stays at the knee") {
    // mean quantization distortion (min squared L2 to the nearest
    // sub-centroid, over all normalized subvectors) must fall
    // monotonically sample -> iter1 -> iter2: each refit is a genuine
    // Lloyd descent step. Recall@5 does NOT improve past iter 1 on the
    // isotropic corpus (measured 0.82 iter1 vs 0.78 iter2 at sf0.01) —
    // the measured justification for registering q142 at iters = 1.
    val m = 8
    val subDim = Similarity.Dim / m
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
      .select("embedding").collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
      .map { f =>
        var nx = 0.0
        f.foreach(x => nx += x.toDouble * x.toDouble)
        val nrm = if (nx == 0.0) 1.0 else math.sqrt(nx)
        f.map(_.toDouble / nrm)
      }
    def distortion(cb: Array[Array[Array[Double]]]): Double = {
      var total = 0.0
      var n = 0L
      vecs.foreach { v =>
        for (s <- 0 until m) {
          var best = Double.MaxValue
          cb(s).foreach { c =>
            var d2 = 0.0
            var i = 0
            while (i < subDim) {
              val d = v(s * subDim + i) - c(i); d2 += d * d; i += 1
            }
            if (d2 < best) best = d2
          }
          total += best; n += 1
        }
      }
      total / n
    }
    val d0 = distortion(Similarity.sampleCodebooks(spark, sf0001, 16, m))
    val d1 = distortion(Similarity.trainedCodebooks(spark, sf0001, 16, m))
    val d2 = distortion(
      Similarity.trainedCodebooks(spark, sf0001, 16, m, iters = 2))
    assert(d1 < d0, s"iter1 distortion $d1 !< sample $d0")
    assert(d2 < d1, s"iter2 distortion $d2 !< iter1 $d1")
    val bf = Similarity.knnBruteForce(spark, sf0001)
      .select("query_id", "neighbor_id")
    val pq2 = Similarity.annPqTrained(spark, sf0001, iters = 2)
      .select("query_id", "neighbor_id")
    val recall2 = bf.intersect(pq2).count().toDouble / bf.count()
    assert(recall2 > 0.5, s"iters=2 recall $recall2 too low")
  }

  test("IVF×PQ prunes the candidate scan; recall tracks the nprobe dial") {
    val bf = Similarity.knnBruteForce(spark, sf0001)
      .select("query_id", "neighbor_id")
    def recall(nprobe: Int): Double = {
      val got = Similarity.annIvfPq(spark, sf0001, nprobe = nprobe)
        .select("query_id", "neighbor_id")
      bf.intersect(got).count().toDouble / bf.count()
    }
    // isotropic corpus: recall ~ probed-cell coverage (measured 0.54 /
    // 0.68 at nprobe 4 / 8, sf0.01); the dial must be usable and
    // widening the probe list must not lose pairs
    val r4 = recall(4)
    val r16 = recall(16)
    assert(r4 > 0.4, s"IVF×PQ recall@nprobe=4 $r4 too low")
    assert(r16 >= r4, s"full-probe recall $r16 < pruned $r4")
    // nprobe = nClusters disables pruning: must equal flat trained PQ
    // (same codebooks, same shortlist) exactly
    val flat = Similarity.annPqTrained(spark, sf0001)
      .collect().toSeq
    val full = Similarity.annIvfPq(spark, sf0001, nprobe = 16)
      .collect().toSeq
    assert(full === flat,
      "nprobe=nClusters IVF×PQ must equal flat trained PQ")
    // the pruning is real: candidate volume at nprobe=4 is ~1/4 of
    // flat (measured via the coarse assignment itself)
    val centroids = Similarity.ivfQuantizer(spark, sf0001, 16).map(_._2)
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val assigned = emb.select(org.apache.spark.sql.functions.col("vec_id"),
      graft.functions.argmax_cosine(
        org.apache.spark.sql.functions.col("embedding"), centroids)
        .as("cluster"))
    val counts = assigned.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    // mean cell occupancy: 4 probed cells cover ~4/16 of the corpus
    // (exact share varies with cell balance; assert it's a genuine cut)
    val worstFourCells = counts.values.toSeq.sorted.takeRight(4).sum
    assert(worstFourCells < n * 0.8,
      s"4 largest cells hold $worstFourCells of $n rows - no pruning")
  }

  test("semantic dedup finds within-cluster pairs; cap bounds the work") {
    val full = Similarity.semanticDedup(spark, sf0001).collect()
    assert(full.nonEmpty, "no within-cluster pairs at the demo threshold")
    full.foreach(r => assert(r.getDouble(3) >= 0.35))
    // candidate budget: capPerCluster=2 admits at most 1 pair/cluster
    val capped = Similarity.semanticDedup(spark, sf0001,
        capPerCluster = 2, threshold = -1.0)
      .groupBy("cluster").count().collect()
    assert(capped.forall(_.getLong(1) <= 1),
      "cap=2 must bound each cluster to a single candidate pair")
  }

  test("diversity sample: quotas honored per cluster, floor keeps the tail") {
    val sample = Similarity.diversitySample(spark, sf0001,
      totalQuota = 64, minQuota = 4).collect()
    assert(sample.nonEmpty)
    // per-cluster pick count == min(quota, n_c); ranks are 1..count
    sample.groupBy(_.getAs[Int]("cluster")).foreach { case (_, rows) =>
      val quota = rows.head.getAs[Long]("quota")
      val nC = rows.head.getAs[Long]("n_c")
      assert(rows.length.toLong === math.min(quota, nC))
      assert(rows.map(_.getAs[Long]("pick_rank")).sorted.toSeq ===
        (1L to rows.length.toLong))
      assert(quota >= 4L, "floor violated")
    }
    // determinism: a second run picks the identical set
    val again = Similarity.diversitySample(spark, sf0001,
      totalQuota = 64, minQuota = 4).collect()
    assert(sample.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("ngram jaccard blocking finds high-sim pairs with exact scores") {
    val pairs = Dedup.ngramJaccardPairs(spark, sf0001)
    assert(pairs.count() > 0)
    assert(pairs.filter($"jaccard" < 0.8 || $"jaccard" > 1.0).count() === 0)
  }

  test("q33 adaptive plan flip: block-local and doc-grain scoring identical (round-14)") {
    // ceiling 0 forces the doc-grain plan (every block 'too big');
    // the default ceiling takes the block-local plan at sf0.001 —
    // both must produce identical (doc_a, doc_b, jaccard) rows
    val local = Dedup.ngramJaccardPairs(spark, sf0001).collect()
    val docGrain = Dedup.ngramJaccardPairs(spark, sf0001,
      blockLocalCeiling = 0L).collect()
    assert(local.map(_.toSeq).toSeq === docGrain.map(_.toSeq).toSeq)
    assert(local.nonEmpty)
  }

  test("q33 pair-volume guard refuses a dense corpus; the dial is the escape (round-14)") {
    // ceiling 0 must refuse ANY corpus with at least one 2-doc block
    // (the sf0.001 corpus has duplicate pairs, so pair volume > 0)...
    val e = intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(spark, sf0001, maxScoredPairs = 0L).collect()
    }
    assert(e.getMessage.contains("maxScoredPairs"),
      s"guard message must prescribe the dial, got: ${e.getMessage}")
    // ...and raising the dial (the message's prescription) must yield
    // exactly the default run's rows — a dial, not a different query
    val dialed = Dedup.ngramJaccardPairs(spark, sf0001,
      maxScoredPairs = Long.MaxValue).collect()
    val default = Dedup.ngramJaccardPairs(spark, sf0001).collect()
    assert(dialed.map(_.toSeq).toSeq === default.map(_.toSeq).toSeq)
  }

  test("knn ranks are 1..k per query with non-increasing cosine") {
    val r = Similarity.knnBruteForce(spark, sf0001, nQueries = 3, k = 4)
      .select("query_id", "rank", "cosine")
      .as[(Long, Int, Double)].collect().groupBy(_._1)
    r.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to 4))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      })
    }
  }

  test("language id: predicted matches argmax of stopword hits; en docs dominated by en hits") {
    val lid = TextAnalysis.languageId(spark, sf0001)
    val bad = lid.filter(
      $"predicted_lang" === "en" && $"hits_en" < greatest($"hits_de",
        $"hits_es", $"hits_fr")).count()
    assert(bad === 0)
  }

  test("text stats: ratios bounded, token counts positive") {
    val stats = TextAnalysis.textStats(spark, sf0001)
    assert(stats.filter($"punct_ratio" < 0 || $"punct_ratio" > 1).count() === 0)
    assert(stats.filter($"stopword_ratio" < 0 || $"stopword_ratio" > 1).count() === 0)
    assert(stats.filter($"n_tokens" <= 0).count() === 0)
    assert(stats.filter($"quality_score" < 0 || $"quality_score" > 1).count() === 0)
  }

  test("BPE-ish pre-tokenizer: known strings split as GPT-2-style pre-tokens") {
    import spark.implicits._
    val df = Seq(
      ("d1", "Hello, world! It's 42 degrees."),
      ("d2", "  spaced   out  "),
      ("d3", "no-punct words here")).toDF("doc_id", "text")
    val toks = df.select($"doc_id",
      regexp_extract_all(lower($"text"), lit(TextAnalysis.bpePattern), lit(0))
        .as("t")).as[(String, Seq[String])].collect().toMap
    // "hello" "," " world" "!" " it" "'s" " 42" " degrees" "."
    assert(toks("d1") === Seq("hello", ",", " world", "!", " it", "'s",
      " 42", " degrees", "."))
    assert(toks("d2") === Seq(" spaced", " out"))
    assert(toks("d3") === Seq("no", "-", "punct", " words", " here"))
    val counts = TextAnalysis.tokenCounts(spark, sf0001)
    assert(counts.filter($"n_bpe_tokens" < $"n_ws_tokens").count() === 0)
    assert(counts.filter($"n_distinct_bpe" > $"n_bpe_tokens").count() === 0)
    assert(counts.filter($"type_token_ratio" < 0 || $"type_token_ratio" > 1)
      .count() === 0)
  }

  test("asof join: nearest-prior semantics, inclusive at equal time, per-key isolation") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"),
      (3L, 5L, "d")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 1.0), (1L, 18L, 2.0), (2L, 99L, 9.0))
      .toDF("k", "rt", "rv")
    val got = graft.operators.AsofJoin.asofJoin(left, right, "k", "t", "rt")
      .orderBy("tag").collect()
      .map(r => (r.getAs[String]("tag"), Option(r.getAs[Any]("rv"))))
    assert(got.toSeq === Seq(
      ("a", Some(1.0)), // equal time matches (>= convention)
      ("b", Some(2.0)), // latest prior wins, not first
      ("c", None),      // right row is in the future -> no match
      ("d", None)))     // key 3 has no right rows at all
  }

  test("asof join carries the matched row atomically: a NULL payload field is NOT backfilled from an older row") {
    import spark.implicits._
    val left = Seq((1L, 12L)).toDF("k", "t")
    // matched row (rt=10) has rva=NULL; the older row (rt=5) has rva=1.
    // A per-column ignoreNulls fill would emit (1, "y") — a right-row
    // combination that never existed.
    val right = Seq((1L, 5L, Some(1), "x"), (1L, 10L, None, "y"))
      .toDF("k", "rt", "rva", "rvb")
    val row = graft.operators.AsofJoin.asofJoin(left, right, "k", "t", "rt")
      .collect().head
    assert(row.getAs[String]("rvb") === "y")
    assert(row.isNullAt(row.fieldIndex("rva")),
      "NULL in the matched row must survive, not be backfilled")
  }

  test("range join: half-open bounds, chunk-spanning intervals, no duplicate pairs") {
    import spark.implicits._
    val points = Seq(5L, 10L, 19L, 20L, 25L).toDF("pt")
    // interval [8, 21) spans chunks 0,1,2 at chunk=10; [30,31) matches nothing
    val intervals = Seq((1L, 8L, 21L), (2L, 30L, 31L)).toDF("iid", "s", "e")
    val pairs = graft.operators.RangeJoin
      .chunkedRangeJoin(points, intervals, "pt", "s", "e", 10L)
      .select("iid", "pt").as[(Long, Long)].collect().sorted
    // 8<=10,19,20<21 match; 5 and 25 are outside; end bound 21 excludes nothing here
    assert(pairs.toSeq === Seq((1L, 10L), (1L, 19L), (1L, 20L)))
  }

  test("fingerprints: equal for identical text, min-gram stable") {
    val fp = TextAnalysis.fingerprints(spark, sf0001)
    assert(fp.count() === 500)
    assert(fp.select("doc_fp").distinct().count() === 500) // all texts distinct
  }

  test("multimodal: per-kind REAL decode features, one row per media, deterministic") {
    val feats = operators.Multimodal.mediaFeatures(spark, sf0001)
    assert(feats.count() === 500)
    // one row per media, kind derived from the id
    assert(feats.filter(($"media_id" % 3 === 0 && $"kind" =!= "image") ||
      ($"media_id" % 3 === 1 && $"kind" =!= "audio") ||
      ($"media_id" % 3 === 2 && $"kind" =!= "video")).count() === 0)
    // decoded invariants: image units are whole 96-byte strides; audio
    // units equal the raw sample count (= text length); fingerprints
    // are md5 hex
    assert(feats.filter($"kind" === "image" && $"n_units" % 96 =!= 0)
      .count() === 0)
    assert(feats.filter($"n_units" < 0 || $"val_sum" < 0).count() === 0)
    assert(feats.filter(length($"content_md5") =!= 32).count() === 0)
    // image + audio fingerprints recover the source text's md5 exactly
    // (the codec round-trip proof, per media)
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select($"doc_id".as("media_id"), md5($"text").as("want"))
    val bad = feats.filter($"kind" =!= "video")
      .join(docs, Seq("media_id"))
      .filter($"content_md5" =!= $"want").count()
    assert(bad === 0, "a BMP/audio round-trip corrupted content")
    // determinism: running twice gives identical rows
    val again = operators.Multimodal.mediaFeatures(spark, sf0001)
    assert(feats.exceptAll(again).count() === 0)
  }

  test("SQL function registration: graft_* callable from spark.sql") {
    graft.functions.GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_simhash60('the fast key') AS sh,
        |       graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |       size(graft_minhash('a b c d e', 4)) AS mk,
        |       graft_mingram_fp('abcdefghij') AS fp
        |""".stripMargin).head()
    assert(r.getDouble(1) === 1.0)
    assert(r.getInt(2) === 4)
    // same values as the Column-API forms
    import graft.functions._
    val viaApi = spark.range(1).select(
      simhash60(lit("the fast key")).as("sh"),
      mingram_fp(lit("abcdefghij")).as("fp")).head()
    assert(r.getLong(0) === viaApi.getLong(0))
    assert(r.getLong(3) === viaApi.getLong(1))
  }

  test("GraftExtensions (spark.sql.extensions mode) injects without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext) // must not throw
  }


  test("bmp codec: real round-trip — header fields, pixel stats, content inverse") {
    import spark.implicits._
    val texts = Seq(
      1L -> "hello world",                   // sub-row content
      2L -> ("x" * 96),                      // exactly one full row
      3L -> ("abcdefgh" * 40),               // multi-row with padding (320 B)
      4L -> "")                              // empty payload edge
    val media = texts.toDF("media_id", "text")
      .selectExpr("media_id", "'image' AS kind",
        "CAST(text AS BINARY) AS payload", "'fixture' AS source")
      .as[operators.Multimodal.MediaRecord]
    val decoded = operators.Multimodal.bmpDecode(
        operators.Multimodal.bmpEncode(media))
      .collect().map(d => d.media_id -> d).toMap
    texts.foreach { case (id, t) =>
      val d = decoded(id)
      val h = math.max(1, (t.length + 95) / 96)
      assert(d.width === 32 && d.height === h, s"doc $id dims")
      assert(d.file_size === 54L + 96L * h, s"doc $id size")
      assert(d.px_sum === t.map(_.toLong).sum, s"doc $id px_sum")
      assert(d.px_nonzero === t.length.toLong, s"doc $id nonzero")
      val md = java.security.MessageDigest.getInstance("MD5")
      val expect = md.digest(t.getBytes("UTF-8"))
        .map(x => f"${x & 0xff}%02x").mkString
      assert(d.content_md5 === expect, s"doc $id content inverse")
    }
    // a corrupted payload must fail loudly, never yield silent garbage
    val bad = media.filter(_.media_id == 3L).map { m =>
      val p = m.payload.clone(); // not remotely a BMP
      operators.Multimodal.BmpMedia(m.media_id, p)
    }
    intercept[org.apache.spark.SparkException] {
      operators.Multimodal.bmpDecode(bad).collect()
    }
  }

  test("audio codec: deflate round-trip — header, CRC, amplitude stats, content") {
    import spark.implicits._
    val texts = Seq(
      1L -> "hello world",            // ordinary short content
      2L -> ("ab" * 4000),            // highly compressible (8 kB)
      3L -> (1 to 500).map(i =>       // incompressible-ish ASCII (LCG bits)
        (((i * 1103515245 + 12345) >>> 16) % 94 + 33).toChar).mkString,
      4L -> "",                       // empty payload edge
      5L -> "x")                      // single sample
    val media = texts.toDF("media_id", "text")
      .selectExpr("media_id", "'audio' AS kind",
        "CAST(text AS BINARY) AS payload", "'fixture' AS source")
      .as[operators.Multimodal.MediaRecord]
    val encoded = operators.Multimodal.audioEncode(media)
    val decoded = operators.Multimodal.audioDecode(encoded)
      .collect().map(d => d.media_id -> d).toMap
    texts.foreach { case (id, t) =>
      val d = decoded(id)
      val codes = t.map(_.toInt)
      assert(d.n_samples === t.length.toLong, s"doc $id n_samples")
      assert(d.amp_sum === codes.map(_.toLong).sum, s"doc $id amp_sum")
      assert(d.amp_sqsum === codes.map(c => c.toLong * c).sum, s"doc $id sqsum")
      assert(d.amp_max === (if (codes.isEmpty) 0 else codes.max), s"doc $id max")
      val md = java.security.MessageDigest.getInstance("MD5")
      val expect = md.digest(t.getBytes("UTF-8"))
        .map(x => f"${x & 0xff}%02x").mkString
      assert(d.content_md5 === expect, s"doc $id content round-trip")
    }
    // the compressible payload must actually compress on the wire
    val encLens = encoded.collect().map(e => e.media_id -> e.payload.length).toMap
    assert(encLens(2L) < 8000 / 4, "deflate did no work on 'ab'*4000")
    // a flipped body byte must fail the CRC/inflate, never yield garbage
    val bad = encoded.filter(_.media_id == 2L).map { a =>
      val p = a.payload.clone(); p(p.length - 3) = (p(p.length - 3) ^ 0x55).toByte
      operators.Multimodal.AudioMedia(a.media_id, p)
    }
    intercept[org.apache.spark.SparkException] {
      operators.Multimodal.audioDecode(bad).collect()
    }
    // a truncated body must fail loudly (stall guard), not spin or pass
    val short = encoded.filter(_.media_id == 3L).map { a =>
      operators.Multimodal.AudioMedia(a.media_id,
        a.payload.take(a.payload.length - 20))
    }
    intercept[org.apache.spark.SparkException] {
      operators.Multimodal.audioDecode(short).collect()
    }
  }

  test("phrase search: positional adjacency equals a sliding-window brute force") {
    val phrase = Seq("hash", "join")
    val got = operators.TextAnalysis.phraseSearch(spark, sf0001, phrase, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute force: slide over the empty-filtered lowercase tokens
    val expected = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .flatMap { r =>
        val toks = r.getString(1).trim.toLowerCase.split("\\s+")
          .filter(_.nonEmpty)
        val hits = toks.sliding(phrase.length).zipWithIndex
          .collect { case (w, i) if w.sameElements(phrase) => i }.toSeq
        if (hits.isEmpty) None
        else Some((r.getLong(0), hits.size.toLong, hits.min.toLong))
      }
      .sortBy { case (id, n, _) => (-n, id) }.take(20)
    assert(got.toSeq === expected.toSeq)
  }

  test("sorted export: files are physically key-ordered and bucket-disjoint") {
    val dir = operators.Layout.writeSortedExport(spark, sf0001)
    val subdirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(subdirs.nonEmpty, "no bucket directories written")
    // within-file physical order: each bucket's parquet rows come back
    // in ascending key order (parquet preserves row order)
    val ranges = subdirs.map { sd =>
      val bucket = sd.getName.stripPrefix("bucket=").toInt
      val keys = spark.read.parquet(sd.toString)
        .select("l_partkey").collect().map(_.getLong(0))
      assert(keys.nonEmpty, s"bucket $bucket is empty on disk")
      keys.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0) <= w(1),
          s"bucket $bucket not sorted: ${w(0)} then ${w(1)}")
      }
      bucket -> (keys.head, keys.last)
    }.sortBy(_._1)
    // bucket key ranges must be DISJOINT and ascending (the property
    // that makes a key predicate prune whole directories)
    ranges.sliding(2).foreach {
      case Array((b1, (_, max1)), (b2, (min2, _))) =>
        assert(max1 < min2,
          s"bucket $b1 max $max1 overlaps bucket $b2 min $min2")
      case _ =>
    }
  }

  test("bm25: tf saturation and length normalization behave as BM25 must") {
    import spark.implicits._
    // write a tiny corpus to parquet so bm25Search's Tables path reads it
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_").toString
    val filler = "filler words pad the document out "
    Seq(
      // same single 'scan' in a SHORT vs a LONG doc: short must outrank
      (1L, "scan " + filler, "fixture"),
      (2L, "scan " + filler * 20, "fixture"),
      // tf 1 vs 2 vs 10 at equal length: gains must SHRINK per added tf
      (3L, ("scan " * 1) + (filler * 4), "fixture"),
      (4L, ("scan " * 2) + (filler * 4).split(' ').drop(1).mkString(" ") + " ", "fixture"),
      (5L, ("scan " * 10) + (filler * 3).split(' ').take(15).mkString(" "), "fixture"),
      (6L, filler * 3, "fixture"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.TextAnalysis.bm25Search(spark, dir,
        terms = Seq("scan"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // unmatched doc never scores
    assert(!got.contains(6L), "doc with no query term must not appear")
    // length normalization: identical tf, shorter doc scores higher
    assert(got(1L) > got(2L), s"short doc must outrank long: $got")
    // tf saturation: marginal gain of tf 2->10 per occurrence is far
    // below the 1->2 gain (docs 3/4/5 are built ~equal-length)
    val g12 = got(4L) - got(3L)
    val g2_10 = (got(5L) - got(4L)) / 8.0
    assert(g12 > 0 && g2_10 < g12,
      s"tf gain must saturate: 1->2 gain $g12, per-step 2->10 gain $g2_10")
    // saturation bound: score(tf=10) < (k1+1)=2.25x score(tf=1) shape —
    // with equal dl the factor tf*2.25/(tf+k1*norm) is capped at 2.25
    assert(got(5L).toDouble / got(3L) < 2.25 * 1.1,
      s"tf=10 vs tf=1 ratio must stay under the k1+1 asymptote: $got")
  }

  test("video container: seek-table sampling inflates ONLY sampled frames") {
    import spark.implicits._
    val texts = Seq(
      1L -> ("the quick brown fox " * 40),  // 800 chars = 13 frames
      2L -> ("z" * 64),                     // exactly one frame
      3L -> ("y" * 65),                     // short last frame (idx 1 unsampled)
      4L -> "",                             // zero frames
      5L -> (1 to 300).map(i =>             // incompressible-ish ASCII
        (((i * 48271) >>> 12) % 94 + 33).toChar).mkString)
    val media = texts.toDF("media_id", "text")
      .selectExpr("media_id", "'video' AS kind",
        "CAST(text AS BINARY) AS payload", "'fixture' AS source")
      .as[operators.Multimodal.MediaRecord]
    val encoded = operators.Multimodal.videoEncode(media)
    val got = operators.Multimodal.videoSampleFrames(encoded)
      .collect().map(f => (f.media_id, f.frame_idx) -> f).toMap
    // brute force: every 4th 64-char slice of the raw text
    texts.foreach { case (id, t) =>
      val n = (t.length + 63) / 64
      val idxs = 0 until n by 4
      assert(got.keys.count(_._1 == id) === idxs.size, s"doc $id frame count")
      idxs.foreach { f =>
        val slice = t.substring(f * 64, math.min(f * 64 + 64, t.length))
        val fr = got((id, f))
        assert(fr.byte_offset === f.toLong * 64)
        assert(fr.frame_len === slice.length.toLong, s"doc $id frame $f len")
        assert(fr.amp_sum === slice.map(_.toLong).sum, s"doc $id frame $f sum")
        val md = java.security.MessageDigest.getInstance("MD5")
        val expect = md.digest(slice.getBytes("UTF-8"))
          .map(x => f"${x & 0xff}%02x").mkString
        assert(fr.frame_md5 === expect, s"doc $id frame $f content")
      }
    }
    // THE SKIP PROOF: corrupting a frame the sampler never visits must
    // not fail (its bytes are never inflated); corrupting a sampled
    // frame must fail loudly. Frame 1 of doc 1 is unsampled (step 4);
    // frame 0 is sampled. Locate both via the directory.
    def corrupt(frameIdx: Int)
        : org.apache.spark.sql.Dataset[operators.Multimodal.VideoMedia] =
      encoded.filter(_.media_id == 1L).map { v =>
        val p = v.payload.clone()
        val buf = java.nio.ByteBuffer.wrap(p)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = buf.getInt(8)
        val bodyStart = 16 + n * 12
        val e = 16 + frameIdx * 12
        val off = buf.getInt(e); val clen = buf.getInt(e + 4)
        val mid = bodyStart + off + clen / 2
        p(mid) = (p(mid) ^ 0x55).toByte
        operators.Multimodal.VideoMedia(v.media_id, p)
      }
    val afterSkip = operators.Multimodal.videoSampleFrames(corrupt(1))
      .collect() // must NOT throw: frame 1's bytes are never read
    assert(afterSkip.map(_.frame_idx).sorted === Array(0, 4, 8, 12))
    intercept[org.apache.spark.SparkException] {
      operators.Multimodal.videoSampleFrames(corrupt(0)).collect()
    }
  }

  test("bmp resize: nearest-neighbor gather round-trips through the real codec") {
    import spark.implicits._
    val texts = Seq(
      1L -> ("pixel content for a tall image " * 20), // 620 chars = 7 rows
      2L -> "short",                                  // 1 padded row
      3L -> "",                                       // all-padding image
      4L -> ("r" * 96 * 16))                          // exactly 16 full rows
    val media = texts.toDF("media_id", "text")
      .selectExpr("media_id", "'image' AS kind",
        "CAST(text AS BINARY) AS payload", "'fixture' AS source")
      .as[operators.Multimodal.MediaRecord]
    val thumbs = operators.Multimodal.bmpDecode(
        operators.Multimodal.bmpResize(
          operators.Multimodal.bmpEncode(media)))
      .collect().map(d => d.media_id -> d).toMap
    texts.foreach { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val sh = math.max(1, (bytes.length + 95) / 96)
      // brute-force gather in image coordinates (padding reads 0)
      val content = (0 until 16).flatMap { y =>
        val sy = y * sh / 16
        (0 until 16).flatMap { x =>
          val base = sy * 96 + (x * 2) * 3
          (0 until 3).map(b =>
            if (base + b < bytes.length) bytes(base + b) else 0: Byte)
        }
      }.toArray
      val d = thumbs(id)
      assert(d.width === 16 && d.height === 16, s"doc $id dims")
      assert(d.file_size === 54L + 48 * 16, s"doc $id file size")
      assert(d.px_sum === content.map(v => (v & 0xff).toLong).sum,
        s"doc $id px_sum")
      assert(d.px_nonzero === content.count(_ != 0).toLong, s"doc $id nz")
      val md = java.security.MessageDigest.getInstance("MD5")
      val expect = md.digest(content).map(x => f"${x & 0xff}%02x").mkString
      assert(d.content_md5 === expect, s"doc $id thumbnail content")
    }
  }

  test("multimodal frame sampling (q35): every 3rd container frame, 48-byte geometry") {
    val frames = operators.Multimodal.mediaFrames(spark, sf0001)
    val media = operators.Multimodal.mediaFromDocuments(spark, sf0001)
    val nonEmptyVideos = media.filter(m => m.kind == "video" &&
      m.payload.nonEmpty).count()
    // frame 0 exists for every non-empty video (step sampling anchors
    // at the first frame)
    assert(frames.filter($"frame_idx" === 0).count() === nonEmptyVideos)
    assert(frames.filter($"frame_idx" % 3 =!= 0 ||
      $"byte_offset" =!= $"frame_idx" * 48).count() === 0)
    // sampled frames are real inflated bytes: lengths in (0, 48]
    assert(frames.filter($"frame_len" <= 0 || $"frame_len" > 48)
      .count() === 0)
  }

  test("events sessionize: session bounds ordered, gaps respected") {
    val s = Events.sessionize(spark, sf0001)
    assert(s.filter($"session_end" < $"session_start").count() === 0)
    // consecutive sessions of the same user must be separated by > 30 min
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("session_seq")
    val viol = s.withColumn("prev_end", lag($"session_end", 1).over(w))
      .filter($"prev_end".isNotNull &&
        $"session_start".cast("double") - $"prev_end".cast("double") <= 1800.0)
      .count()
    assert(viol === 0)
  }
}
