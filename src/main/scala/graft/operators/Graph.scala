package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Graph analytics over an edge table — the natural downstream of the
 * reference's whole purpose: the pipeline it mirrors exists to load node
 * and edge frames INTO a graph engine (reference `pipeline.py` projects
 * node/edge streams for Neo4j GDS). These operators run the first-line
 * graph measures (degrees, PageRank, triangles, link prediction)
 * directly on the Spark side, so a corpus/graph user never leaves the
 * warehouse for them.
 *
 * All operators take an arbitrary (src, dst) edge frame. Edges are
 * canonicalized internally (undirected: least/greatest + distinct), so
 * callers can hand raw pair output (e.g. co-occurrence joins, dup-pair
 * lists) without pre-cleaning.
 *
 * Scale notes:
 *  - every operator is join/agg-shaped — one keyed shuffle per step, no
 *    driver-side row iteration, nothing broadcast that is O(graph);
 *  - PageRank iterates over SCRATCH TABLES (constant-size plans, one job
 *    per round — the same loop discipline as Corpus.connectedComponents);
 *  - triangle counting orients edges by (degree, id) before the wedge
 *    join, the standard bound that keeps per-node wedge fanout
 *    O(sqrt(m)) on skewed degree distributions instead of O(max degree).
 */
object Graph {

  /** Canonical undirected edge set: (src < dst), distinct, self-loops
    * dropped. One shuffle (the distinct). */
  def canonicalEdges(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val s = col(srcCol); val d = col(dstCol)
    edges
      .filter(s =!= d)
      .select(least(s, d).as("src"), greatest(s, d).as("dst"))
      .distinct()
  }

  /** Co-occurrence edge derivation: items sharing a group become an
    * edge. `(group, item)` self-join co-partitioned on the group key —
    * one shuffle; per-group fanout is quadratic in GROUP size (bounded
    * by the data model: order line counts, basket sizes), not corpus
    * size. Callers with unbounded group sizes should cap them upstream
    * (Blocks.guardBlockSize is the enforcement tool). */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val a = df.select(col(groupCol).as("g"), col(itemCol).as("src"))
    val b = df.select(col(groupCol).as("g"), col(itemCol).as("dst"))
    a.join(b, a("g") === b("g") && col("src") < col("dst"))
      .select(col("src"), col("dst"))
      .distinct()
  }

  /** Per-node degree over the canonical undirected edge set. */
  def degrees(edges: DataFrame): DataFrame = {
    val e = canonicalEdges(edges)
    e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("degree"))
  }

  /** Degree histogram: how many nodes have each degree. The O(1)-output
    * summary a 100 TB graph can always afford. */
  def degreeHistogram(edges: DataFrame): DataFrame =
    degrees(edges).groupBy("degree").agg(count(lit(1)).as("n_nodes"))

  /**
   * PageRank on the undirected (symmetrized) graph, fixed `iters` power
   * iterations:
   *
   *   r_0(v)    = 1/N
   *   r_t+1(v)  = (1-d)/N + d * sum over neighbors u of r_t(u)/deg(u)
   *
   * Symmetrized edges mean every node has out-degree >= 1, so there is
   * no dangling-mass term. Each iteration materializes its (node, rank)
   * frame as a scratch table and computes from the previous TABLE — the
   * plan is constant-size in `iters` (the connectedComponents loop
   * discipline), superseded tables retired eagerly. The adjacency +
   * out-degree table is written once and re-read every round.
   */
  def pageRank(edges: DataFrame, iters: Int = 3, damping: Double = 0.85): DataFrame = {
    import graft.ops.Scratch
    require(iters >= 1, "iters must be >= 1")
    val spark = edges.sparkSession
    val e0 = canonicalEdges(edges)
    val sym = e0.select(col("src"), col("dst"))
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
    // adjacency enriched with the source's out-degree: each round's join
    // then needs only ONE probe table (adj) against the rank table.
    val degW = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    val (adj, adjPath) = Scratch.materializeAt(
      sym.withColumn("outdeg", count(lit(1)).over(degW)), "pr_adj")
    // node table doubles as the r_0 frame; its write job carries the
    // exact N (observe forbids distinct aggregates, so N rides the
    // already-distinct nodes write, not the adjacency write).
    val (nodes, nm, nodesPath) = Scratch.materializeObservedAt(
      adj.select(col("src").as("node")).distinct(),
      "pr_ranks", count(lit(1)).as("n_nodes"))
    val n = nm("n_nodes").asInstanceOf[Long].toDouble
    if (n == 0d) {
      Scratch.drop(spark, adjPath)
      Scratch.drop(spark, nodesPath)
      return e0.select(col("src").as("node"), lit(0.0d).as("rank")).limit(0)
    }
    var ranks = nodes.withColumn("rank", lit(1.0d / n))
    var ranksPath = nodesPath
    for (_ <- 1 to iters) {
      val (next, nextPath) = Scratch.materializeAt(
        adj.join(ranks, adj("src") === ranks("node"))
          .groupBy(adj("dst").as("node"))
          .agg((lit((1.0d - damping) / n)
            + lit(damping) * sum(col("rank") / col("outdeg"))).as("rank"),
          ),
        "pr_ranks")
      Scratch.drop(spark, ranksPath)
      ranks = next
      ranksPath = nextPath
    }
    Scratch.drop(spark, adjPath)
    // the final ranks table stays on disk for the caller's consumption;
    // session shutdown (or the configured scratchDir owner) reclaims it.
    ranks
  }

  /**
   * Exact global triangle count. Edges are oriented from the
   * (degree, id)-smaller endpoint to the larger one — a total order, so
   * every triangle has exactly one wedge whose two out-edges close, and
   * per-node out-degree is O(sqrt(m)) even on power-law graphs (the
   * classic compact-forward / Schank-Wagner bound). The wedge join and
   * the closing join are both equi-joins on node keys — keyed shuffles,
   * no cross products.
   */
  def triangleCount(edges: DataFrame): DataFrame = {
    import graft.ops.Scratch
    val e = canonicalEdges(edges)
    val deg = degrees(e)
    // orientation key: (degree, id) as a comparable struct
    def ord(degC: Column, idC: Column): Column = struct(degC, idC)
    val withDeg = e
      .join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "sdeg"), Seq("src"))
      .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "ddeg"), Seq("dst"))
    // backs the returned lazy plan (read three times by it); session
    // shutdown reclaims it.
    val o = Scratch.materialize(
      withDeg.select(
        when(ord(col("sdeg"), col("src")) < ord(col("ddeg"), col("dst")), col("src")).otherwise(col("dst")).as("u"),
        when(ord(col("sdeg"), col("src")) < ord(col("ddeg"), col("dst")), col("dst")).otherwise(col("src")).as("v"),
        when(ord(col("sdeg"), col("src")) < ord(col("ddeg"), col("dst")), col("sdeg")).otherwise(col("ddeg")).as("udeg"),
        when(ord(col("sdeg"), col("src")) < ord(col("ddeg"), col("dst")), col("ddeg")).otherwise(col("sdeg")).as("vdeg")),
      "tri_oriented")
    // wedge (u; v1, v2) with v1 < v2 in orientation order; closes iff
    // oriented edge (v1, v2) exists — orientation is total, so the
    // closing edge can only be stored as (v1, v2).
    val w1 = o.select(col("u"), col("v").as("v1"), col("vdeg").as("v1deg"))
    val w2 = o.select(col("u"), col("v").as("v2"), col("vdeg").as("v2deg"))
    val wedges = w1.join(w2, Seq("u"))
      .filter(ord(col("v1deg"), col("v1")) < ord(col("v2deg"), col("v2")))
    val closed = wedges.join(
      o.select(col("u").as("v1"), col("v").as("v2")), Seq("v1", "v2"))
    closed.agg(count(lit(1)).as("n_triangles"))
  }

  /**
   * Common-neighbors link prediction: for node pairs NOT already joined
   * by an edge, count shared neighbors; emit the top `k` candidate pairs
   * (cnt desc, then pair id — deterministic). The wedge join is the same
   * shape as triangleCount's; the anti-join removes existing edges.
   */
  def commonNeighborsTopK(edges: DataFrame, k: Int = 10): DataFrame = {
    import graft.ops.Scratch
    // the scratch edge table backs the returned lazy plan (read three
    // times by it); session shutdown reclaims it.
    val e = Scratch.materialize(canonicalEdges(edges), "cn_edges")
    val adj = e.select(col("src").as("n"), col("dst").as("x"))
      .union(e.select(col("dst").as("n"), col("src").as("x")))
    val a1 = adj.select(col("n"), col("x").as("a"))
    val a2 = adj.select(col("n"), col("x").as("b"))
    a1.join(a2, Seq("n")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"))
      .join(e, col("a") === e("src") && col("b") === e("dst"), "left_anti")
      .orderBy(col("common").desc, col("a"), col("b"))
      .limit(k)
  }
}
