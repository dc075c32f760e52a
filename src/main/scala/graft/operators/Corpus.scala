package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-curation operators for LLM training-data pipelines over
  * `documents` (SURVEY.md §7.5 extensions): word-shingle exact-substring
  * deduplication, rule-based quality gates, and eval-set
  * decontamination. These are the standard curation passes published
  * for large pretraining corpora (exact-substring dedup, Gopher-style
  * quality rules, n-gram test-set decontamination), re-expressed as
  * declarative Spark plans.
  *
  * Cross-engine determinism follows the TextAnalysis conventions:
  * whitespace tokenization identical in Spark `split` and DuckDB
  * `string_split_regex`; shingle identity via [[TextAnalysis.md5Hash60]]
  * (md5-derived 60-bit keys, bit-identical in both engines); ratios are
  * IEEE double ops on identical integer inputs.
  */
object Corpus {

  /** Word n-gram shingles of `tks` (an array<string> column), joined
    * with single spaces. Guarded so short docs yield an empty array —
    * Spark's `sequence(1, 0)` would otherwise produce a DESCENDING
    * range, not an empty one.
    */
  def shinglesExpr(tksCol: String, n: Int): Column = expr(
    s"""CASE WHEN size($tksCol) >= $n
       |  THEN transform(sequence(1, size($tksCol) - ${n - 1}),
       |         i -> array_join(slice($tksCol, i, $n), ' '))
       |  ELSE array() END""".stripMargin)

  /** DuckDB twin of [[shinglesExpr]]: `range(1, k+1)` is end-exclusive,
    * so short docs yield the empty list without a CASE guard; list
    * slices are 1-based inclusive like Spark's `slice`.
    */
  def shinglesSql(tks: String, n: Int): String =
    s"""list_transform(range(1, greatest(len($tks) - ${n - 1}, 0) + 1),
       |  i -> array_to_string($tks[i:i+${n - 1}], ' '))""".stripMargin

  private val tokensSparkSql =
    "filter(split(lower(trim(text)), '\\\\s+'), w -> w <> '')"
  private val tokensDuckSql =
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), w -> w <> '')"

  /** (doc_id, shingle-hash) instances for every word `n`-gram in the
    * corpus — the shared scan for [[shingleDedup]] and
    * [[decontamination]]. The 60-bit hash keeps every downstream
    * exchange at ~16 bytes/row no matter how long the shingle text is.
    */
  private def shingleHashes(spark: SparkSession, sfDir: String,
      n: Int): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("tks", expr(tokensSparkSql))
      .select(col("doc_id"), explode(shinglesExpr("tks", n)).as("sh"))
      .select(col("doc_id"), TextAnalysis.md5Hash60(col("sh")).as("h"))

  private def shingleHashesSql(n: Int): String =
    s"""tk AS (SELECT doc_id, $tokensDuckSql AS tks FROM documents),
       |sh AS (SELECT doc_id, unnest(${shinglesSql("tks", n)}) AS s
       |       FROM tk),
       |hs AS (SELECT doc_id, ${TextAnalysis.md5Hash60Sql("s")} AS h
       |       FROM sh)""".stripMargin

  /** Exact-substring deduplication at word-shingle grain (the n-gram
    * approximation of suffix-array exact-substring dedup from the
    * "Deduplicating Training Data" line of work): for every doc, the
    * fraction of its `n`-gram instances that occur ≥2 times anywhere in
    * the corpus (any doc, counting multiplicity).
    *
    * Scale shape: explode → partial-agg at (doc, hash) grain (map-side
    * combine collapses within-doc repeats before the exchange) →
    * hash-grain corpus counts → a co-partitioned join back (both sides
    * already hash-partitioned on `h`, no extra exchange) → final
    * doc-grain agg. Every exchange carries (int64 doc, int64 hash,
    * count) — never shingle text. No all-pairs structure anywhere; at
    * 100 TB this is three linear shuffles of ~24-byte rows.
    */
  def shingleDedup(spark: SparkSession, sfDir: String,
      n: Int = 8): DataFrame = {
    val perDoc = shingleHashes(spark, sfDir, n)
      .groupBy("doc_id", "h").agg(count(lit(1)).as("c_doc"))
    val corpus = perDoc.groupBy("h").agg(sum("c_doc").as("c_all"))
    val agg = perDoc.join(corpus, Seq("h"))
      .groupBy("doc_id")
      .agg(sum("c_doc").as("n_shingles"),
        sum(when(col("c_all") >= 2, col("c_doc")).otherwise(lit(0L)))
          .as("n_dup_shingles"))
    // docs shorter than n tokens have no shingles but must still report
    Tables.documents(spark, sfDir).select("doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_dup_shingles"), lit(0L)).as("n_dup_shingles"),
        (coalesce(col("n_dup_shingles"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_shingles"), lit(0L)), lit(1L)))
          .as("dup_frac"))
      .orderBy("doc_id")
  }

  def shingleDedupSql(n: Int = 8): String =
    s"""WITH ${shingleHashesSql(n)},
       |pd AS (SELECT doc_id, h, COUNT(*) AS c_doc FROM hs
       |       GROUP BY doc_id, h),
       |cc AS (SELECT h, SUM(c_doc) AS c_all FROM pd GROUP BY h),
       |agg AS (
       |  SELECT pd.doc_id,
       |    CAST(SUM(c_doc) AS BIGINT) AS n_shingles,
       |    CAST(SUM(CASE WHEN c_all >= 2 THEN c_doc ELSE 0 END) AS BIGINT)
       |      AS n_dup_shingles
       |  FROM pd JOIN cc ON pd.h = cc.h
       |  GROUP BY pd.doc_id)
       |SELECT d.doc_id,
       |  COALESCE(agg.n_shingles, 0) AS n_shingles,
       |  COALESCE(agg.n_dup_shingles, 0) AS n_dup_shingles,
       |  CAST(COALESCE(agg.n_dup_shingles, 0) AS DOUBLE)
       |    / greatest(COALESCE(agg.n_shingles, 0), 1) AS dup_frac
       |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Gopher-style rule-based quality gates, reported as per-source pass
    * rates (the corpus-curation dashboard view: which crawl sources
    * survive filtering). Gates, per doc:
    *   - g_len:     20 ≤ token count ≤ 60
    *   - g_wordlen: 3.8 ≤ mean word length ≤ 4.6
    *   - g_stop:    ≥2 distinct common-English stopwords present
    *   - g_alpha:   ≥80% of tokens purely alphabetic
    *
    * Scale shape: one narrow codegen'd pass over the scan (token array
    * built once per row, all four gates computed from it), then a
    * single low-cardinality agg on `source` — the only exchange carries
    * one row of partial counters per (partition, source).
    */
  def qualityGates(spark: SparkSession, sfDir: String): DataFrame = {
    val gated = Tables.documents(spark, sfDir)
      .withColumn("tks", expr(tokensSparkSql))
      .withColumn("n_tokens", size(col("tks")))
      .withColumn("sum_len",
        expr("aggregate(tks, 0L, (a, w) -> a + length(w))"))
      .withColumn("mean_wl",
        col("sum_len").cast("double") / greatest(col("n_tokens"), lit(1)))
      .withColumn("n_stop", size(expr(
        "filter(array_distinct(tks), w -> w IN ('the','a','of','and','in'))")))
      .withColumn("alpha_frac",
        size(expr("filter(tks, w -> w rlike '^[a-z]+$')")).cast("double") /
          greatest(col("n_tokens"), lit(1)))
      .select(col("source"),
        (col("n_tokens") >= 20 && col("n_tokens") <= 60).cast("int").as("g_len"),
        (col("mean_wl") >= 3.8 && col("mean_wl") <= 4.6).cast("int").as("g_wordlen"),
        (col("n_stop") >= 2).cast("int").as("g_stop"),
        (col("alpha_frac") >= 0.8).cast("int").as("g_alpha"))
    gated
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("g_len").as("n_pass_len"),
        sum("g_wordlen").as("n_pass_wordlen"),
        sum("g_stop").as("n_pass_stop"),
        sum("g_alpha").as("n_pass_alpha"),
        sum(col("g_len") * col("g_wordlen") * col("g_stop") * col("g_alpha"))
          .as("n_pass_all"))
      .withColumn("pass_rate",
        col("n_pass_all").cast("double") / greatest(col("n_docs"), lit(1L)))
      .orderBy("source")
  }

  val qualityGatesSql: String =
    s"""WITH g AS (
       |  SELECT source, tks,
       |    len(tks) AS n_tokens,
       |    CAST(list_sum(list_transform(tks, w -> length(w))) AS DOUBLE)
       |      / greatest(len(tks), 1) AS mean_wl,
       |    len(list_filter(list_distinct(tks),
       |      w -> w IN ('the','a','of','and','in'))) AS n_stop,
       |    CAST(len(list_filter(tks,
       |      w -> regexp_matches(w, '^[a-z]+$$'))) AS DOUBLE)
       |      / greatest(len(tks), 1) AS alpha_frac
       |  FROM (SELECT source, $tokensDuckSql AS tks FROM documents)),
       |f AS (
       |  SELECT source,
       |    CAST(n_tokens BETWEEN 20 AND 60 AS INT) AS g_len,
       |    CAST(mean_wl BETWEEN 3.8 AND 4.6 AS INT) AS g_wordlen,
       |    CAST(n_stop >= 2 AS INT) AS g_stop,
       |    CAST(alpha_frac >= 0.8 AS INT) AS g_alpha
       |  FROM g)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(g_len) AS BIGINT) AS n_pass_len,
       |  CAST(SUM(g_wordlen) AS BIGINT) AS n_pass_wordlen,
       |  CAST(SUM(g_stop) AS BIGINT) AS n_pass_stop,
       |  CAST(SUM(g_alpha) AS BIGINT) AS n_pass_alpha,
       |  CAST(SUM(g_len * g_wordlen * g_stop * g_alpha) AS BIGINT)
       |    AS n_pass_all,
       |  CAST(SUM(g_len * g_wordlen * g_stop * g_alpha) AS DOUBLE)
       |    / greatest(COUNT(*), 1) AS pass_rate
       |FROM f
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** Eval-set decontamination (the GPT-3/PaLM-style n-gram overlap
    * check): a deterministic held-out slice (doc_id ≡ 0 mod `evalMod`)
    * plays the benchmark set; every training doc reports how many of
    * its distinct `n`-gram shingles collide with the eval set's
    * shingle inventory. Docs with any collision are what a real
    * pipeline would drop or flag before training.
    *
    * Scale shape: the eval inventory is DISTINCT hashes of a small
    * held-out set — broadcast when it fits (size-gated via the
    * documents-scan proxy, since the aggregate's own stats are
    * unknown post-explode), so the train side never shuffles; the
    * doc-grain agg is the only exchange and carries 16-byte rows.
    */
  def decontamination(spark: SparkSession, sfDir: String, n: Int = 5,
      evalMod: Int = 5): DataFrame = {
    val hs = shingleHashes(spark, sfDir, n)
    val evalSet = hs.filter(pmod(col("doc_id"), lit(evalMod)) === 0)
      .select("h").distinct().withColumn("hit", lit(1))
    val train = hs.filter(pmod(col("doc_id"), lit(evalMod)) =!= 0)
      .select("doc_id", "h").distinct()
    val agg = train
      .join(Joins.broadcastIfSmall(evalSet,
        Tables.documents(spark, sfDir)), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_distinct_shingles"),
        sum(coalesce(col("hit"), lit(0))).as("n_contaminated"))
    Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(evalMod)) =!= 0).select("doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_distinct_shingles"), lit(0L))
          .as("n_distinct_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)) > 0).cast("int")
          .as("is_contaminated"))
      .orderBy("doc_id")
  }

  def decontaminationSql(n: Int = 5, evalMod: Int = 5): String =
    s"""WITH ${shingleHashesSql(n)},
       |ev AS (SELECT DISTINCT h FROM hs WHERE doc_id % $evalMod = 0),
       |tr AS (SELECT DISTINCT doc_id, h FROM hs
       |       WHERE doc_id % $evalMod <> 0),
       |agg AS (
       |  SELECT tr.doc_id,
       |    COUNT(*) AS n_distinct_shingles,
       |    CAST(SUM(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_contaminated
       |  FROM tr LEFT JOIN ev ON tr.h = ev.h
       |  GROUP BY tr.doc_id)
       |SELECT d.doc_id,
       |  COALESCE(agg.n_distinct_shingles, 0) AS n_distinct_shingles,
       |  COALESCE(agg.n_contaminated, 0) AS n_contaminated,
       |  CAST(COALESCE(agg.n_contaminated, 0) > 0 AS INT)
       |    AS is_contaminated
       |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
       |WHERE d.doc_id % $evalMod <> 0
       |ORDER BY d.doc_id""".stripMargin
}
