package graft

import graft.operators.Graph

/** PageRank contract tests: the general path redistributes dangling
  * mass (round 7 — the former `require` wall is now a branch), the
  * integer recurrence conserves total mass up to the documented floor
  * losses on both paths, and on a dangling-free graph the symmetrized
  * fast path and the general path compute IDENTICAL ranks.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank redistributes dangling-node mass (directed chain)") {
    // 1 -> 2 -> 3: node 3 has no out-edge; its mass must come back as
    // the uniform dangling term, not vanish from the recurrence
    val directed = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val ranks = Graph.pagerank(directed, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(ranks.keySet === Set(1L, 2L, 3L))
    // mass conservation: every div floors, so total can only leak DOWN,
    // and by < 1 unit per floor site per iteration
    val total = ranks.values.sum
    assert(total <= Graph.Scale)
    assert(total > Graph.Scale - 100L)
    // node 1 has no in-edges: base + dangling share only — strictly the
    // smallest; node 3 receives a full chain of contributions
    assert(ranks(1L) < ranks(2L) && ranks(2L) < ranks(3L))
  }

  test("pagerank on a symmetrized list conserves rank mass (floor-bounded)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
    val edges = pairs.toDF("src", "dst")
      .unionByName(pairs.map(_.swap).toDF("src", "dst"))
    val ranks = Graph.pagerank(edges, iters = 3, assumeNoDangling = true)
      .as[(Long, Long)].collect()
    assert(ranks.length === 4)
    val total = ranks.map(_._2).sum
    // every div floors, so mass can only leak DOWN, and by < 1 unit
    // per node per floor site (3 sites x 3 iterations x 4 nodes)
    assert(total <= Graph.Scale)
    assert(total > Graph.Scale - 100L)
  }

  test("fast path == general path on a dangling-free graph") {
    // with no dangling nodes, D = 0 and every node has in-edges, so the
    // two branches must agree CELL-EXACTLY (same integer recurrence)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
    val edges = pairs.toDF("src", "dst")
      .unionByName(pairs.map(_.swap).toDF("src", "dst"))
    val fast = Graph.pagerank(edges, iters = 3, assumeNoDangling = true)
      .as[(Long, Long)].collect().toMap
    val general = Graph.pagerank(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(fast === general)
  }

  test("triangle counts: known topology, each corner credited once") {
    // K4 on {1,2,3,4} (4 triangles, each node in exactly 3) plus a
    // dangling pendant edge 4-5 (no triangle) — the pendant perturbs
    // degrees, so the orientation tiebreak is exercised too
    val pairs = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))).toDF("a", "b")
    val got = Graph.triangleCountsFromPairs(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle counts: triangle total is invariant to edge input order") {
    // same graph with pair rows shuffled/renumbered: orientation is a
    // function of (deg, id) only, so the result cannot depend on input
    // row order
    val pairs = Seq((2L, 3L), (4L, 5L), (1L, 4L), (3L, 4L), (1L, 2L),
      (2L, 4L), (1L, 3L)).toDF("a", "b")
    val got = Graph.triangleCountsFromPairs(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle hub skew: star wedges stay O(n) under degree orientation") {
    // K_{1,n}: hub 0 joined to n leaves. Unoriented wedge enumeration
    // pays C(n,2) pairs at the hub (the quadratic hub blowup); the
    // (deg, id) orientation points every edge leaf→hub, so out-degree
    // is 1 everywhere and the wedge join produces ZERO rows — the √m
    // bound claim from the q151 scaladoc, pinned as a property.
    val n = 40
    val star = (1 to n).map(i => (0L, i.toLong)).toDF("a", "b")
    val orientedStar = Graph.orientPairs(star)
    assert(orientedStar.filter($"dst" =!= 0L).count() === 0,
      "star edges must orient leaf→hub (hub has the max degree)")
    assert(Graph.wedgesOf(orientedStar).count() === 0,
      s"star produced wedges - unoriented enumeration would pay C($n,2)")
    assert(Graph.triangleCountsFromPairs(star).count() === 0)
    // close one leaf pair: exactly one triangle, found via the single
    // wedge at the closing leaf (out-degree 2), never via the hub
    val starPlus = star.unionByName(Seq((1L, 2L)).toDF("a", "b"))
    val wedges = Graph.wedgesOf(Graph.orientPairs(starPlus))
    assert(wedges.count() === 1,
      "one closing edge must add exactly one ordered wedge")
    val tri = Graph.triangleCountsFromPairs(starPlus)
      .as[(Long, Long)].collect().toMap
    assert(tri === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("q198 hierarchy rollup: subtree sums telescope down the 4-ary tree") {
    // A node's subtree revenue must equal its own direct revenue plus
    // its four children's subtrees — the recursion invariant, checked
    // on every internal node whose children are inside the reported
    // id range (children of n are 4n+1..4n+4 < 341 ⟺ n < 85).
    import org.apache.spark.sql.functions._
    val rows = Graph.hierarchyRollup(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val own = graft.sources.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_partkey").as("node"))
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long"))
        .cast("long").as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var checked = 0
    (0L until 85L).foreach { n =>
      if (rows.contains(n)) {
        val kids = (1L to 4L).map(i => rows.get(4 * n + i))
        val kidCents = kids.flatten.map(_._2).sum
        val kidParts = kids.flatten.map(_._1).sum
        val ownCents = own.getOrElse(n, 0L)
        val ownPart = if (own.contains(n)) 1L else 0L
        assert(rows(n)._2 === ownCents + kidCents,
          s"node $n subtree cents do not telescope")
        assert(rows(n)._1 === ownPart + kidParts,
          s"node $n subtree part count does not telescope")
        checked += 1
      }
    }
    assert(checked > 50, s"only $checked internal nodes checked - fixture degenerate")
  }
}
