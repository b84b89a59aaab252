package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** operators.Graph: degrees / PageRank / triangles / common neighbors on
  * hand graphs with known answers, plus invariants on the co-purchase
  * fixture graph. */
class GraphAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  // a house graph: square 1-2-3-4 plus roof edge set {1-2 diagonal}:
  //   edges: 1-2, 2-3, 3-4, 4-1, 1-3  → two triangles (1,2,3), (1,3,4)
  private lazy val house = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)
  ).toDF("src", "dst")

  test("canonicalEdges: dedups reversed duplicates and drops self-loops") {
    val raw = Seq((2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L)).toDF("src", "dst")
    val e = Graph.canonicalEdges(raw).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e == Set((1L, 2L), (2L, 3L)))
  }

  test("degrees and histogram on the house graph") {
    val d = Graph.degrees(house).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 3L, 2L -> 2L, 3L -> 3L, 4L -> 2L))
    val h = Graph.degreeHistogram(house).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == Map(3L -> 2L, 2L -> 2L))
  }

  test("triangleCount: house graph has exactly 2; K4 has 4") {
    assert(Graph.triangleCount(house).head().getLong(0) == 2L)
    val k4 = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)).toDF("src", "dst")
    assert(Graph.triangleCount(k4).head().getLong(0) == 4L)
    // orientation-independence: shuffled/reversed input counts the same
    val reversed = house.select(col("dst").as("src"), col("src").as("dst"))
    assert(Graph.triangleCount(reversed).head().getLong(0) == 2L)
  }

  test("pageRank: ranks sum to ~1 and favor the high-degree nodes") {
    val pr = Graph.pageRank(house, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    // nodes 1 and 3 (degree 3) outrank nodes 2 and 4 (degree 2)
    assert(pr(1L) > pr(2L) && pr(3L) > pr(4L))
    // symmetry: 1 and 3 are automorphic, as are 2 and 4
    assert(math.abs(pr(1L) - pr(3L)) < 1e-12)
    assert(math.abs(pr(2L) - pr(4L)) < 1e-12)
  }

  test("commonNeighborsTopK: predicts the missing diagonal") {
    // in the house graph the only non-adjacent pair is (2,4), sharing
    // neighbors 1 and 3
    val top = Graph.commonNeighborsTopK(house, k = 5).collect()
    assert(top.length == 1)
    assert((top(0).getLong(0), top(0).getLong(1), top(0).getLong(2)) == (2L, 4L, 2L))
  }

  test("coOccurrenceEdges: groups of 1 emit nothing; pairs are canonical") {
    val df = Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 7L)).toDF("g", "item")
    val e = Graph.coOccurrenceEdges(df, "g", "item").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("empty input: all operators return empty, not crash") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.degrees(empty).count() == 0)
    assert(Graph.degreeHistogram(empty).count() == 0)
    assert(Graph.triangleCount(empty).head().getLong(0) == 0L)
    assert(Graph.commonNeighborsTopK(empty).count() == 0)
    assert(Graph.pageRank(empty, iters = 2).count() == 0)
  }

  test("pageRank conserves mass on the fixture co-purchase graph") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .filter(col("l_partkey") % 4 === 0)
    val edges = Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    val pr = Graph.pageRank(edges, iters = 2)
    val total = pr.agg(sum(col("rank"))).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6)
  }
}
