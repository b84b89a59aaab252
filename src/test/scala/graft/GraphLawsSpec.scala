package graft

import graft.operators.Graph
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based laws of the iterative graph operators, each checked
  * against an in-memory brute-force reference on small random graphs.
  * Every operator under test is deterministic, so passes are stable;
  * each property runs real Spark jobs, so iteration counts stay small
  * (the SamplerLawsSpec discipline). */
class GraphLawsSpec extends SparkTestBase {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), p)
    assert(r.passed, r.status.toString)
  }

  /** Random simple undirected graph on <= n nodes as canonical pairs. */
  private val graphGen: Gen[Set[(Long, Long)]] = for {
    n <- Gen.choose(4, 10)
    density <- Gen.choose(0.2, 0.7)
    all = (1L to n).flatMap(a => (a + 1 to n).map(b => (a, b)))
    picks <- Gen.listOfN(all.size, Gen.choose(0.0, 1.0))
  } yield all.zip(picks).filter(_._2 < density).map(_._1).toSet

  private def adjacency(es: Set[(Long, Long)]): Map[Long, Set[Long]] = {
    val sym = es.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
  }

  test("property: kCore matches brute-force peeling and all core degrees >= k") {
    check(Prop.forAll(graphGen, Gen.choose(2, 4)) { (es, k) =>
      es.isEmpty || {
        // reference: peel in-memory until fixpoint
        var adj = adjacency(es)
        var changed = true
        while (changed) {
          val bad = adj.collect { case (v, ns) if ns.size < k => v }.toSet
          changed = bad.nonEmpty
          adj = (adj -- bad).map { case (v, ns) => v -> (ns -- bad) }
            .filter(_._2.nonEmpty)
        }
        val expected = adj.map { case (v, ns) => v -> ns.size.toLong }
        val got = Graph.kCore(es.toSeq.toDF("src", "dst"), k).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == expected && got.values.forall(_ >= k)
      }
    })
  }

  test("property: shortestPaths with enough hops matches Dijkstra; monotone in maxHops") {
    check(Prop.forAll(graphGen) { es =>
      es.isEmpty || {
        val adj = adjacency(es)
        val src = es.flatMap(e => Seq(e._1, e._2)).min
        // reference: unit-weight Dijkstra (= BFS) from src
        val dist = scala.collection.mutable.Map(src -> 0.0)
        var frontier = Set(src)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj.getOrElse(_, Set.empty))
            .filter(v => !dist.contains(v))
          val d = dist.values.max + 1.0
          frontier.foreach(v => dist(v) = d)
        }
        val edgesDf = es.toSeq.toDF("src", "dst")
        val srcDf = Seq(Tuple1(src)).toDF("node")
        def run(h: Int) = Graph.shortestPaths(edgesDf, srcDf, maxHops = h)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val full = run(12) // diameter of a 10-node graph is < 12
        // enough hops: exact distances; fewer hops: superset-safe
        // (every reported distance is >= the true one, reached set grows)
        val h1 = run(1)
        full == dist.toMap &&
          h1.forall { case (v, d) => d >= dist(v) } &&
          h1.keySet.subsetOf(full.keySet)
      }
    })
  }

  test("property: labelPropagation labels come from the node's own component") {
    check(Prop.forAll(graphGen, Gen.choose(1, 3)) { (es, rounds) =>
      es.isEmpty || {
        val edgesDf = es.toSeq.toDF("src", "dst")
        val comp = Graph.connectedComponents(edgesDf).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val lpa = Graph.labelPropagation(edgesDf, rounds).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        // every node is labeled, and with a label from ITS component —
        // propagation can never cross a component boundary
        lpa.keySet == comp.keySet &&
          lpa.forall { case (v, l) => comp(l) == comp(v) }
      }
    })
  }
}
