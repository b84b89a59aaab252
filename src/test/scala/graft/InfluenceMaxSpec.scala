package graft

import graft.operators.Graph

/** Greedy influence maximization over deterministic live-edge samples. */
class InfluenceMaxSpec extends SparkTestBase {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toSeq.toDF("src", "dst")

  test("p≈1: live graph = full graph, greedy picks component by size") {
    val e = edges((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L))
    val out = Graph.influenceMaximization(e, k = 2, p = 0.999, samples = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every edge clears the 0.999 threshold in every sample: comps are
    // {1,2,3} (size 3) and {10,11} (size 2) in both samples
    assert(out.toSeq == Seq((1, 1L, 6L, 6L), (2, 10L, 4L, 10L)))
  }

  test("p tiny: all singletons; ranks fill by node id; exhaustion stops early") {
    val e = edges((1L, 2L), (3L, 4L), (4L, 5L))
    val out = Graph.influenceMaximization(e, k = 7, p = 1e-9, samples = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // 5 nodes, all isolated in every sample: each seed gains 2 (1×2
    // samples); ties break to the smallest unchosen id; the 6th round
    // finds nothing uncovered+unchosen and stops
    assert(out.toSeq == Seq((1, 1L, 2L), (2, 2L, 2L), (3, 3L, 2L),
      (4, 4L, 2L), (5, 5L, 2L)))
  }

  test("marginal gain: second seed never re-counts covered components") {
    val e = edges((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L))
    val out = Graph.influenceMaximization(e, k = 2, p = 0.999, samples = 1)
      .orderBy("rank").collect()
    // seed 2's gain is ONLY the untouched {10,11} component
    assert(out(1).getLong(2) == 2L)
    assert(out(1).getLong(3) == 5L) // 3 + 2
  }
}
