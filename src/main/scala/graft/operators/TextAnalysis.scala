package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators for training-data pipelines over `documents`
  * (SURVEY.md §7.5): token counting, quality scoring, n-gram language ID,
  * document fingerprinting.
  *
  * Everything here is a narrow per-row transform built from codegen'd
  * built-ins (split / regexp / higher-order array functions) — no UDFs, no
  * shuffles; at 100 TB these fuse into the scan stage and cost one pass.
  *
  * Cross-engine determinism: hashes are derived from md5 (identical in
  * Spark and DuckDB); ratios are IEEE double ops on identical inputs.
  */
object TextAnalysis {

  /** 60-bit hash from md5 hex (first 15 nibbles), usable as a portable,
    * seedable hash in both engines: Spark `conv(substr(md5(x),1,15),16,10)`,
    * DuckDB `('0x'||substr(md5(x),1,15))::BIGINT`.
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  def md5Hash60Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  /** Whitespace tokens (lowercased). */
  def tokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  val tokensSql = "string_split_regex(lower(trim(text)), '\\s+')"

  /** Per-language stopword lists for the n-gram-heuristic language ID.
    * Public common-word lists; the testdata docs are synthetic
    * English-ish word soup, so this measures operator behavior, not
    * real-world accuracy.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "les", "des", "et", "une", "est", "dans", "pour", "qui", "sur"))

  /** Token/char/punctuation statistics + a composite quality score
    * (length, punctuation and stopword ratios — the classic cheap
    * pretraining-corpus quality gates).
    */
  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val en = stopwords("en").map(w => s"'$w'").mkString(", ")
    docs.select(
        col("doc_id"), col("lang"),
        length(col("text")).as("n_chars_actual"),
        col("n_chars"),
        expr("size(split(lower(trim(text)), '\\\\s+'))").as("n_tokens"),
        expr("size(regexp_extract_all(text, '[A-Za-z]+', 0))").as("n_words"),
        expr("size(regexp_extract_all(text, '[.,;:!?]', 0))").as("n_punct"),
        expr(s"size(filter(split(lower(trim(text)), '\\\\s+'), w -> w IN ($en)))")
          .as("n_stopwords"))
      .withColumn("punct_ratio",
        col("n_punct").cast("double") / greatest(col("n_chars_actual"), lit(1)))
      .withColumn("stopword_ratio",
        col("n_stopwords").cast("double") / greatest(col("n_tokens"), lit(1)))
      .withColumn("quality_score",
        col("stopword_ratio") * 0.4 +
          (lit(1.0) - col("punct_ratio")) * 0.3 +
          least(lit(1.0), col("n_tokens").cast("double") / 100.0) * 0.3)
      .orderBy("doc_id")
  }

  val textStatsSql: String = {
    val en = stopwords("en").map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id, lang,
       |  CAST(length(text) AS INT) AS n_chars_actual,
       |  n_chars,
       |  CAST(len($tokensSql) AS INT) AS n_tokens,
       |  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS INT) AS n_words,
       |  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS INT) AS n_punct,
       |  CAST(len(list_filter($tokensSql, w -> w IN ($en))) AS INT) AS n_stopwords,
       |  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
       |    / greatest(length(text), 1) AS punct_ratio,
       |  CAST(len(list_filter($tokensSql, w -> w IN ($en))) AS DOUBLE)
       |    / greatest(len($tokensSql), 1) AS stopword_ratio,
       |  (CAST(len(list_filter($tokensSql, w -> w IN ($en))) AS DOUBLE)
       |    / greatest(len($tokensSql), 1)) * 0.4
       |  + (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
       |    / greatest(length(text), 1)) * 0.3
       |  + least(1.0, CAST(len($tokensSql) AS DOUBLE) / 100.0) * 0.3
       |    AS quality_score
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  /** GPT-2-style pre-tokenizer pattern (BPE-ish): contraction suffixes,
    * then space-prefixed letter runs / digit runs / symbol runs. Every
    * match is one pre-token; whitespace between tokens is skipped (the
    * leading ` ?` folds one space into the following token, as BPE
    * vocabularies do). ASCII classes only, so Java regex (Spark codegen)
    * and RE2 (DuckDB) produce identical token streams — both engines use
    * leftmost-first alternation, and no lookaround is needed.
    */
  val bpePattern = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\\sa-z0-9]+"

  /** Token counting two ways (SURVEY §7.5): cheap whitespace split and the
    * BPE-ish regex pre-tokenizer, plus distinct-token and chars-per-token
    * ratios (the "is this compressible text or junk" gates a pretraining
    * pipeline applies before paying for real BPE). Narrow one-pass
    * projection; fuses into the scan at 100 TB.
    */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // Column API (not expr-SQL) so the pattern's ' needs no escaping
    def bpeToks = regexp_extract_all(lower(col("text")), lit(bpePattern), lit(0))
    docs.select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"),
        size(bpeToks).as("n_bpe_tokens"),
        size(array_distinct(bpeToks)).as("n_distinct_bpe"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / greatest(col("n_bpe_tokens"), lit(1)))
      .withColumn("type_token_ratio",
        col("n_distinct_bpe").cast("double") /
          greatest(col("n_bpe_tokens"), lit(1)))
      .orderBy("doc_id")
  }

  val tokenCountsSql: String = {
    // DuckDB single-quoted literals keep backslashes as-is; only ' doubles
    val p = bpePattern.replace("'", "''")
    s"""SELECT doc_id,
       |  CAST(length(text) AS INT) AS n_chars,
       |  CAST(len(string_split_regex(trim(text), '\\s+')) AS INT)
       |    AS n_ws_tokens,
       |  CAST(len(regexp_extract_all(lower(text), '$p')) AS INT)
       |    AS n_bpe_tokens,
       |  CAST(len(list_distinct(regexp_extract_all(lower(text), '$p'))) AS INT)
       |    AS n_distinct_bpe,
       |  CAST(length(text) AS DOUBLE)
       |    / greatest(len(regexp_extract_all(lower(text), '$p')), 1)
       |    AS chars_per_token,
       |  CAST(len(list_distinct(regexp_extract_all(lower(text), '$p'))) AS DOUBLE)
       |    / greatest(len(regexp_extract_all(lower(text), '$p')), 1)
       |    AS type_token_ratio
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  /** Corpus vocabulary — the word-count shape every training pipeline
    * runs to build token statistics: explode to token grain, aggregate
    * term frequency and document frequency, keep the top of the
    * distribution. Scale shape: the explode is map-side (no
    * materialized token table); partial aggregation collapses each
    * partition to its distinct terms before the term-hash shuffle, so
    * the exchange carries vocabulary-sized data, not corpus-sized; the
    * top-k is TakeOrderedAndProject. Ordering (tf desc, term asc) is
    * total, so the cutoff is deterministic.
    */
  def vocabulary(spark: SparkSession, sfDir: String, topK: Int = 100): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(desc("tf"), asc("term"))
      .limit(topK)

  def vocabularySql(topK: Int = 100): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($tokensSql) AS term FROM documents)
       |SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
       |FROM toks WHERE term <> ''
       |GROUP BY term
       |ORDER BY tf DESC, term ASC
       |LIMIT $topK""".stripMargin

  /** Language ID by stopword-hit voting: per language, count tokens in
    * that language's stopword list; predict the argmax (ties broken by
    * language code order). One pass, no shuffle.
    */
  def languageId(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val hitCols = stopwords.toSeq.sortBy(_._1).map { case (langCode, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      expr(s"size(filter(split(lower(trim(text)), '\\\\s+'), w -> w IN ($list)))")
        .as(s"hits_$langCode")
    }
    val scored = docs.select(col("doc_id") +: col("lang").as("labeled_lang") +:
      hitCols: _*)
    // argmax via greatest + case chain (deterministic tiebreak: code order)
    val langs = stopwords.keys.toSeq.sorted
    val maxHits = greatest(langs.map(l => col(s"hits_$l")): _*)
    val predicted = langs.foldRight(lit("unknown"): Column) { (lc, elze) =>
      when(col(s"hits_$lc") === maxHits && maxHits > 0, lit(lc)).otherwise(elze)
    }
    scored
      .withColumn("predicted_lang", predicted)
      .orderBy("doc_id")
  }

  val languageIdSql: String = {
    val langs = stopwords.keys.toSeq.sorted
    val hitExprs = langs.map { lc =>
      val list = stopwords(lc).map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter($tokensSql, w -> w IN ($list))) AS INT) AS hits_$lc"
    }
    val maxExpr = "greatest(" + langs.map(l => s"hits_$l").mkString(", ") + ")"
    val caseExpr = langs.foldRight("'unknown'") { (lc, elze) =>
      s"CASE WHEN hits_$lc = $maxExpr AND $maxExpr > 0 THEN '$lc' ELSE $elze END"
    }
    s"""WITH scored AS (
       |  SELECT doc_id, lang AS labeled_lang, ${hitExprs.mkString(",\n    ")}
       |  FROM documents)
       |SELECT doc_id, labeled_lang, ${langs.map(l => s"hits_$l").mkString(", ")},
       |       $caseExpr AS predicted_lang
       |FROM scored
       |ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprints (rolling-hash style): a whole-document content
    * hash on normalized text, plus a min-gram fingerprint — the minimum
    * hash over all 8-char character grams (the winnowing/MinHash-of-
    * k-grams idea collapsed to one value). Near-identical docs get equal
    * min_gram_fp with high probability; the whole-doc fp only matches
    * exact duplicates.
    */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame =
    Tables.withMinParallelism(Tables.documents(spark, sfDir),
        spark.sparkContext.defaultParallelism).select(
        col("doc_id"),
        md5Hash60(lower(trim(col("text")))).as("doc_fp"),
        graft.functions.mingram_fp(col("text")).as("min_gram_fp"))
      .orderBy("doc_id")

  val fingerprintsSql: String =
    s"""SELECT doc_id,
       |  ${md5Hash60Sql("lower(trim(text))")} AS doc_fp,
       |  list_min(list_transform(
       |    range(1, greatest(length(lower(trim(text))) - 7, 1) + 1),
       |    i -> ${md5Hash60Sql("substr(lower(trim(text)), CAST(i AS INT), 8)")}))
       |    AS min_gram_fp
       |FROM documents
       |ORDER BY doc_id""".stripMargin
}
