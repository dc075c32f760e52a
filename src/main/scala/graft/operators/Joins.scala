package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-side sizing helpers.
  *
  * A hard `broadcast()` hint on a dimension that scales with the dataset
  * is a driver OOM waiting for the 100× load: the hint overrides
  * Catalyst's size check, so a multi-GB dim gets collected to the driver
  * instead of degrading to a shuffle join. [[broadcastIfSmall]] keeps the
  * broadcast *outcome* where it is safe (the optimizer's own size
  * estimate is under `spark.sql.autoBroadcastJoinThreshold`) and
  * otherwise returns the frame unhinted, leaving the strategy choice to
  * Catalyst + AQE (which re-checks with runtime statistics).
  */
object Joins {

  /** Hint `df` for broadcast only when its estimated plan size is under
    * the session's autoBroadcastJoinThreshold. Estimation uses the
    * optimized logical plan's statistics (file sizes for scans,
    * propagated through projections/filters) — no job is run.
    */
  def broadcastIfSmall(df: DataFrame): DataFrame =
    if (fitsBroadcast(df)) broadcast(df) else df

  /** Same gate, but sized by `sizeProxy` instead of `df` itself — for
    * frames whose lineage passes through an RDD hop (e.g. the
    * zipWithIndex in [[ScalableKeys]]), where the logical plan is an
    * ExistingRDD with unknown (infinite) statistics. The proxy should be
    * an upper bound that scales with `df` (canonically: the source table
    * scan the dim was derived from) — so the hint still disappears when
    * the dim genuinely outgrows the threshold.
    */
  def broadcastIfSmall(df: DataFrame, sizeProxy: DataFrame): DataFrame =
    if (fitsBroadcast(sizeProxy)) broadcast(df) else df

  /** Whether `df`'s estimated size fits under the session broadcast
    * threshold — public so operators can pick whole STRATEGIES (not
    * just join sides) by the same gate, e.g. embeddingNeardup's
    * score-then-dedup vs dedup-then-score candidate pipelines.
    */
  def fitsBroadcast(df: DataFrame): Boolean = {
    val threshold = parseBytes(
      df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold",
        "10485760"))
    threshold >= 0 &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(threshold)
  }

  /** The conf value is either a plain byte count or a size string
    * ("10MB"); JavaUtils is the parser Spark itself uses for the latter.
    */
  private def parseBytes(s: String): Long =
    try s.trim.toLong
    catch {
      case _: NumberFormatException =>
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s.trim)
    }

  /** Backward (inclusive) as-of join: for every left row, attach the
    * single right row with the greatest `rightTs <= leftTs` for the
    * same `key` — the time-series point-in-time lookup Spark has no
    * built-in operator for.
    *
    * Implementation is ONE shuffle with no pair fan-out: union the
    * tagged sides (right-only columns null on left rows and vice
    * versa via unionByName), then a per-key window ordered by
    * (ts, tag, rightOrd) takes `last(_, ignoreNulls)` of each right
    * column over the unbounded-preceding frame, and left rows are
    * filtered back out. Right rows sort before left rows at an equal
    * timestamp (tag 0 < 1), making the match inclusive; `rightOrd`
    * (a unique right column) makes the pick deterministic if a key
    * ever carries two right rows on the same microsecond — the
    * LARGEST `rightOrd` wins.
    *
    * At 100 TB this is the right shape: a single hash exchange of
    * left+right on `key` (exactly what a sort-merge join would move),
    * the sort is per-partition, and per-row state in the window is
    * one value per right column — no range-join explosion, no
    * per-key driver loop. Skewed keys shard like any window (salting
    * applies if one key dominates).
    *
    * Contract: `left` and `right` share ONLY `key` (rename payload
    * columns first); both timestamp columns stay in the output.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightOrd: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, last, lit}
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared == Set(key),
      s"left/right may share only the key '$key', found: $shared")
    val tagged = left.withColumn("__tag", lit(1))
      .unionByName(right.withColumn("__tag", lit(0)),
        allowMissingColumns = true)
    // order: event time (left rows carry leftTs, right rows rightTs),
    // then tag (right first on ties), then the right-side unique ord
    val ord = org.apache.spark.sql.functions.coalesce(col(leftTs), col(rightTs))
    val w2 = Window.partitionBy(key).orderBy(ord, col("__tag"), col(rightOrd))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE select so every pick reads the original columns (sequential
    // withColumn would re-order later picks by an already-replaced
    // rightOrd) — and the shared (partition, order) spec keeps all
    // picks in a single WindowExec
    val rightOnly = right.columns.filterNot(_ == key)
    val picks = rightOnly.map(c =>
      last(col(c), ignoreNulls = true).over(w2).as(c))
    tagged.select(col(key) +: left.columns.filterNot(_ == key).map(col) ++:
        (col("__tag") +: picks.toSeq): _*)
      .filter(col("__tag") === 1).drop("__tag")
  }

  /** Bloom-filter pre-filtered semi join: `big ⋉ small` on an equi-key,
    * with a bloom built over the small side's keys applied map-side to
    * `big` BEFORE the shuffle — the exchange then carries only probable
    * matches instead of the whole fact table. This uses the SAME native
    * expressions AQE's row-level runtime filtering injects
    * (`BloomFilterAggregate` / `BloomFilterMightContain`, codegen'd, fed
    * `xxhash64` on both sides), exposed as an explicit operator for
    * joins the optimizer can't infer (e.g. the small side is the output
    * of an opaque stage). Bloom has no false negatives, so the exact
    * semi join after the pre-filter returns exactly `big ⋉ small`;
    * false positives only cost shuffle bytes.
    *
    * The sketch itself is one driver-side row (`~1.2 MB` at the default
    * sizing) — the same bounded collect a broadcast join does, and the
    * reason Spark's own InjectRuntimeFilter caps the build side
    * (`spark.sql.optimizer.runtime.bloomFilter.*` mirrors these knobs).
    */
  def bloomSemiJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.graftbridge._
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.functions.{col, xxhash64}
    val agg = new BloomFilterAggregate(
      toExpression(xxhash64(col(smallKey))), expectedItems)
      .toAggregateExpression()
    val bloomBytes = small.select(toColumn(agg)).head().getAs[Array[Byte]](0)
    val exact = small.select(col(smallKey).as(bigKey)).distinct()
    if (bloomBytes == null) big.limit(0) // empty build side: ⋉ ∅ = ∅
    else big
      .filter(toColumn(BloomFilterMightContain(
        Literal.create(bloomBytes,
          org.apache.spark.sql.types.BinaryType),
        toExpression(xxhash64(col(bigKey))))))
      .join(exact, Seq(bigKey), "left_semi")
  }

  /** q197 — FUZZY STRING JOIN via pure-string blocking (q72 blocks on
    * ATTRIBUTES (brand, size) before its levenshtein — complete only
    * when dirty data keeps its attributes; this is the complementary
    * operator for when the string IS the only key): match "dirty"
    * strings to a clean reference at edit distance ≤ 1 WITHOUT the n²
    * cross join, via 1-DELETION-NEIGHBORHOOD BLOCKING (FastSS): each
    * string s emits
    * the key set K(s) = {s} ∪ {s with one character deleted}, and two
    * strings at distance ≤ 1 PROVABLY share a key (equal → s itself;
    * deletion → the shorter string; substitution at i → both sides'
    * del_i), so the equi-join on keys is a complete candidate generator
    * and a levenshtein verify ≤ 1 removes the false candidates
    * (distance-2 pairs sharing a deletion). Per string that is
    * len(s)+1 short keys — the blocking turns an O(n²) similarity join
    * into one key-partitioned exchange, the same economics as q15's
    * MinHash bands for Jaccard.
    *
    * Fixture: the clean side is the DISTINCT name dictionary (canonical
    * id = min partkey per name — p_name is heavily duplicated, ~64
    * distinct names at every scale, and matching against the raw table
    * would grow the verify join quadratically in the duplication
    * factor; resolving against the deduplicated reference is both the
    * realistic shape and the scalable one). The dirty side is built
    * deterministically from every part's name by deleting one
    * md5-picked character, so each dirty row has its source name at
    * distance 1. Output per dirty row: the best verified dictionary
    * match (min distance, tie → min canonical id) and the verified
    * dictionary-entry count.
    *
    * Scale shape: both explodes are map-side; the exchange carries
    * (short-string key, id) rows; the argmin is one struct-min agg at
    * dirty-key grain — no window over the corpus, no cross join.
    */
  def fuzzyNameJoin(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val part = graft.sources.Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_name"))
    val dict = part.groupBy("p_name")
      .agg(min(col("p_partkey")).as("name_id"))
    val deletions =
      """transform(sequence(1, length(p_name)),
        |  i -> concat(substring(p_name, 1, i - 1),
        |              substring(p_name, i + 1)))""".stripMargin
    val dirty = part.select(col("p_partkey").as("dirty_key"),
        expr("""concat(
          |  substring(p_name, 1, pos - 1),
          |  substring(p_name, pos + 1)) AS dirty_name""".stripMargin
          .replace("pos",
            s"(pmod(${md5PosExpr("p_partkey")}, length(p_name)) + 1)")))
    val dirtyKeys = dirty.select(col("dirty_key"), col("dirty_name"),
      explode(expr(
        """concat(array(dirty_name),
          |  transform(sequence(1, length(dirty_name)),
          |    i -> concat(substring(dirty_name, 1, i - 1),
          |                substring(dirty_name, i + 1))))""".stripMargin))
        .as("k"))
    val cleanKeys = dict.select(col("name_id"), col("p_name"),
      explode(expr(s"concat(array(p_name), $deletions)")).as("k"))
    dirtyKeys.join(cleanKeys, Seq("k"))
      .select("dirty_key", "dirty_name", "name_id", "p_name").distinct()
      .withColumn("distance",
        levenshtein(col("dirty_name"), col("p_name")).cast("long"))
      .filter(col("distance") <= 1)
      .groupBy("dirty_key")
      .agg(min(struct(col("distance"), col("name_id"))).as("best"),
        count(lit(1)).as("n_matches"))
      .select(col("dirty_key"),
        col("best").getField("name_id").as("matched_key"),
        col("best").getField("distance").as("distance"),
        col("n_matches"))
      .orderBy("dirty_key")
  }

  /** The md5-derived deletion position (engine-portable: 60-bit md5 of
    * a tagged key string, exactly [[TextAnalysis.md5Hash60]]).
    */
  private def md5PosExpr(keyCol: String): String =
    s"CAST(conv(substring(md5(CAST(concat('fz:', CAST($keyCol AS STRING))" +
      s" AS BINARY)), 1, 15), 16, 10) AS BIGINT)"

  /** Oracle for [[fuzzyNameJoin]]: the same deletion-neighborhood keys,
    * candidate join, levenshtein verify, and struct-argmin restated in
    * DuckDB (levenshtein is built in).
    */
  def fuzzyNameJoinSql: String = {
    val pos = "(CAST(('0x' || substr(md5('fz:' || CAST(p_partkey AS " +
      "VARCHAR)), 1, 15)) AS BIGINT) % length(p_name)) + 1"
    s"""WITH dirty AS (
       |  SELECT p_partkey AS dirty_key,
       |    substr(p_name, 1, CAST($pos - 1 AS INT))
       |      || substr(p_name, CAST($pos + 1 AS INT)) AS dirty_name
       |  FROM part),
       |dk AS (
       |  SELECT dirty_key, dirty_name, k FROM dirty,
       |    LATERAL UNNEST(list_prepend(dirty_name,
       |      list_transform(range(1, length(dirty_name) + 1),
       |        i -> substr(dirty_name, 1, CAST(i - 1 AS INT))
       |          || substr(dirty_name, CAST(i + 1 AS INT))))) t(k)),
       |dict AS (
       |  SELECT p_name, MIN(p_partkey) AS name_id FROM part GROUP BY 1),
       |ck AS (
       |  SELECT name_id, p_name, k FROM dict,
       |    LATERAL UNNEST(list_prepend(p_name,
       |      list_transform(range(1, length(p_name) + 1),
       |        i -> substr(p_name, 1, CAST(i - 1 AS INT))
       |          || substr(p_name, CAST(i + 1 AS INT))))) t(k)),
       |cands AS (
       |  SELECT DISTINCT d.dirty_key, d.dirty_name, c.name_id, c.p_name
       |  FROM dk d JOIN ck c ON c.k = d.k),
       |scored AS (
       |  SELECT dirty_key, name_id,
       |    CAST(levenshtein(dirty_name, p_name) AS BIGINT) AS distance
       |  FROM cands),
       |ok AS (SELECT * FROM scored WHERE distance <= 1),
       |best AS (
       |  SELECT dirty_key, name_id AS matched_key, distance,
       |    row_number() OVER (PARTITION BY dirty_key
       |      ORDER BY distance, name_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY dirty_key) AS n_matches
       |  FROM ok)
       |SELECT dirty_key, matched_key, distance,
       |  CAST(n_matches AS BIGINT) AS n_matches
       |FROM best WHERE rn = 1
       |ORDER BY dirty_key""".stripMargin
  }
}
