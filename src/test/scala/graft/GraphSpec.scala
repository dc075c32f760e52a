package graft

import graft.operators.Graph

/** PageRank contract tests: the ≥1-out-edge precondition is enforced
  * (a directed list with a dangling sink must fail loudly, not leak
  * rank mass silently), and on a valid symmetrized list the integer
  * recurrence conserves total mass up to the documented floor losses.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank rejects a directed edge list with a dangling node") {
    // 1 -> 2 -> 3, node 3 has no out-edge: its received mass would
    // vanish from the recurrence
    val directed = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Graph.pagerank(directed)
    }
    assert(ex.getMessage.contains("dangling"))
  }

  test("pagerank on a symmetrized list conserves rank mass (floor-bounded)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
    val edges = pairs.toDF("src", "dst")
      .unionByName(pairs.map(_.swap).toDF("src", "dst"))
    val ranks = Graph.pagerank(edges, iters = 3)
      .as[(Long, Long)].collect()
    assert(ranks.length === 4)
    val total = ranks.map(_._2).sum
    // every div floors, so mass can only leak DOWN, and by < 1 unit
    // per node per floor site (3 sites x 3 iterations x 4 nodes)
    assert(total <= Graph.Scale)
    assert(total > Graph.Scale - 100L)
  }

  test("pagerank skips validation when told to (documented escape hatch)") {
    val directed = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    // node 3 dangles; validate=false runs anyway (caller owns semantics)
    val out = Graph.pagerank(directed, iters = 1, validate = false)
    assert(out.count() > 0)
  }
}
