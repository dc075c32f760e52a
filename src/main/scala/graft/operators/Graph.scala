package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Graph analytics beyond [[Dedup]]'s connected components: damped
  * PageRank with a FIXED iteration count and exact scaled-integer
  * arithmetic, so the fit is oracle-checkable cell-exact (floating
  * point PageRank sums in arbitrary order and could never hash-match
  * a second engine).
  *
  * Rank is carried in 1e-12 units (BIGINT). Per iteration:
  *   r'(v) = (base * (1e6 - dampPpm) + dampPpm * Σ_{u→v} r(u) div deg(u))
  *           div 1e6
  * where base = 1e12 div N. Every operation is BIGINT add / floor-div
  * — deterministic and identical in Spark and DuckDB. Headroom: total
  * rank ≤ 1e12, so the damped term tops out near 8.5e17 < 2^63.
  *
  * Scale shape: `deg` is one count aggregation; each iteration is one
  * (join on src) + one (groupBy dst) shuffle over the EDGE list only —
  * ranks and degrees are node-grain (≪ edges). N rides along as a
  * broadcast 1-row frame; nothing collects to the driver. The lazy
  * plan grows linearly with `iters` (fixed, small) — the same chained
  * shape as [[Similarity.kmeans]].
  */
object Graph {

  val Scale = 1000000000000L // rank unit: 1e-12

  /** `edges`: two columns (src, dst), already in BOTH directions for an
    * undirected graph. Every node must have ≥1 out-edge (true by
    * construction for symmetrized edge lists); dangling-node mass
    * redistribution is not modeled, so the contract is ENFORCED
    * (`validate = true` by default): a dst that never appears as src
    * fails the run loudly instead of silently leaking rank mass. The
    * check is one node-grain anti-join over the already-checkpointed
    * edge list — negligible next to the edge-grain iterations.
    */
  def pagerank(edges: DataFrame, iters: Int = 3,
      dampPpm: Long = 850000L, validate: Boolean = true): DataFrame = {
    // truncate the iterative lineage at the EDGE LIST (the
    // Dedup.dedupClusters idiom) — one checkpoint, materialized once,
    // so the (possibly expensive) edge construction never re-runs:
    // every downstream frame (degrees, nodes, N, per-iteration joins)
    // derives from the checkpointed list. Checkpointing the derived
    // frames separately instead would materialize the construction
    // once PER checkpoint (observed in DevProfile as a doubled
    // pair-generation stage).
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    if (validate) {
      val dangling = e.select(col("dst")).distinct()
        .join(e.select(col("src")).distinct(), col("dst") === col("src"),
          "left_anti")
      require(dangling.isEmpty,
        "pagerank: edge list has dangling nodes (a dst with no " +
          "out-edges) - the recurrence does not redistribute their " +
          "mass; symmetrize the edges or drop the sinks first")
    }
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node")).distinct()
    val n1 = broadcast(nodes.agg(count(lit(1)).as("n")))
    val ed = e.join(deg, Seq("src")).localCheckpoint(true)
    var ranks = nodes.crossJoin(n1)
      .select(col("node"), expr(s"${Scale}L div n").as("r"))
    for (_ <- 1 to iters) {
      val contribs = ed
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("r div deg")).as("c"))
      ranks = contribs.crossJoin(n1)
        .select(col("node"), expr(
          s"((${Scale}L div n) * ${1000000L - dampPpm} + c * $dampPpm)" +
            " div 1000000").as("r"))
    }
    ranks
  }

  /** q129 — product importance by PageRank over the co-purchase graph:
    * symmetrized q94 basket pairs (support ≥ `minPairs`) as edges,
    * `iters` damped rounds, ranked output. The rank column stays in
    * exact 1e-12 BIGINT units.
    */
  def copurchaseRank(spark: SparkSession, sfDir: String,
      minPairs: Int = 2, iters: Int = 3): DataFrame = {
    val pairs = RetailBi.basketPairCounts(
      RetailBi.baskets(Tables.lineitem(spark, sfDir)),
      minPairs = minPairs, maxItems = 64)
    val edges = pairs.select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionByName(
        pairs.select(col("part_b").as("src"), col("part_a").as("dst")))
    // the mirror union makes every dst also a src BY CONSTRUCTION, so
    // the dangling-node contract holds without paying the node-grain
    // anti-join scan (two extra passes over the edge list, ~20% of the
    // query at sf0.1)
    pagerank(edges, iters, validate = false)
      .select(col("node").as("part"), col("r").as("rank_e12"))
      .orderBy(desc("rank_e12"), asc("part"))
  }

  /** DuckDB oracle for [[copurchaseRank]]: the identical integer
    * recurrence unrolled as one CTE per iteration.
    */
  def copurchaseRankSql(minPairs: Int = 2, iters: Int = 3,
      dampPpm: Long = 850000L): String = {
    val keep = 1000000L - dampPpm
    val its = (1 to iters).map { i =>
      val prev = if (i == 1) "r0" else s"it${i - 1}"
      s"""it$i AS (
         |  SELECT e.dst AS node,
         |    ((${Scale} // nn.n) * $keep
         |      + SUM($prev.r // d.deg) * $dampPpm) // 1000000 AS r
         |  FROM edges e
         |  JOIN deg d ON e.src = d.src
         |  JOIN $prev ON $prev.node = e.src
         |  CROSS JOIN nn
         |  GROUP BY e.dst, nn.n)""".stripMargin
    }.mkString(",\n")
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |pairs AS (
       |  SELECT a.p AS pa, b.p AS pb
       |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
       |  GROUP BY a.p, b.p
       |  HAVING COUNT(*) >= $minPairs),
       |edges AS (
       |  SELECT pa AS src, pb AS dst FROM pairs
       |  UNION ALL
       |  SELECT pb AS src, pa AS dst FROM pairs),
       |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |r0 AS (SELECT node, ${Scale} // n AS r FROM nodes CROSS JOIN nn),
       |$its
       |SELECT node AS part, CAST(r AS BIGINT) AS rank_e12 FROM it$iters
       |ORDER BY rank_e12 DESC, part""".stripMargin
  }
}
