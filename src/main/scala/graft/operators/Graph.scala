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
    * one shuffle; per-group fanout is quadratic in GROUP size, not
    * corpus size. That contract is ENFORCED, not assumed: a group past
    * `maxGroupRows` fails the query fast with the group value and the
    * escape routes (pre-cap items per group / sample the group /
    * raise the bound deliberately). Basket-shaped data (order line
    * counts) never trips the default; a user handing (domain, doc) or
    * (user, item) co-occurrence with one 10M-member group would
    * otherwise silently mint ~10¹⁴ pairs. Guarded on ONE side only —
    * the join key is the group, so each group's size is checked
    * exactly once (the [[Dedup.ngramJaccard]] pattern). */
  def coOccurrenceEdges(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      maxGroupRows: Long = 100000L): DataFrame = {
    val a = Blocks.guardBlockSize(
      df.select(col(groupCol).as("g"), col(itemCol).as("src")),
      "g", maxGroupRows, "coOccurrenceEdges", hint = CoOccurHint,
      boundName = "maxGroupRows")
    val b = df.select(col(groupCol).as("g"), col(itemCol).as("dst"))
    a.join(b, a("g") === b("g") && col("src") < col("dst"))
      .select(col("src"), col("dst"))
      .distinct()
  }

  /** [[coOccurrenceEdges]] that keeps the co-occurrence COUNT as an edge
    * weight (how many groups the pair shares) — the natural input to
    * weighted [[pageRankDirected]]. Same join shape and the same
    * ENFORCED `maxGroupRows` contract; the distinct becomes a count
    * aggregate over the same key. */
  def coOccurrenceWeightedEdges(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      maxGroupRows: Long = 100000L): DataFrame = {
    val a = Blocks.guardBlockSize(
      df.select(col(groupCol).as("g"), col(itemCol).as("src")),
      "g", maxGroupRows, "coOccurrenceWeightedEdges", hint = CoOccurHint,
      boundName = "maxGroupRows")
    val b = df.select(col(groupCol).as("g"), col(itemCol).as("dst"))
    a.join(b, a("g") === b("g") && col("src") < col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight"))
  }

  private val CoOccurHint =
    "the per-group pair fanout is quadratic in group size - pre-cap " +
      "items per group (sampleFixedPerGroup) or raise maxGroupRows deliberately"

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
    // then needs only ONE probe table (adj) against the rank table. The
    // out-degree is a groupBy + equi-join, NOT a `partition by src`
    // window: a window forces ALL edges of a node into one task, which a
    // mega-hub turns into a straggler, while a shuffle join is
    // AQE-skew-splittable (and the agg gets map-side partials).
    val outdeg = sym.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val (adj, adjPath) = Scratch.materializeAt(
      sym.join(outdeg, Seq("src")), "pr_adj")
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
    // per-round rank state is one fixed-width row per node — driver-
    // pinned under the Pin row/byte gate (one collect instead of a
    // scratch write+read per round); past the gate the round falls back
    // to the scratch table, retired eagerly as before
    for (_ <- 1 to iters) {
      val (next, nextPath) = graft.ops.Pin.stateAt(
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
    // a final scratch-fallback ranks table stays on disk for the
    // caller's consumption; session shutdown reclaims it.
    ranks
  }

  /**
   * PERSONALIZED PageRank (the GDS `sourceNodes` dial — random-walk-
   * with-restart relevance to a seed set, the standard recommendation /
   * local-relevance scorer): teleport mass goes ONLY to the seeds,
   *
   *   r_0(v)   = 1/|S| if v ∈ S else 0
   *   r_t+1(v) = [v ∈ S]·(1-d)/|S| + d · Σ over neighbors u of r_t(u)/deg(u)
   *
   * over the symmetrized graph (every node has out-degree >= 1, so no
   * dangling term — mass is conserved exactly as in [[pageRank]]).
   * Nodes the walk cannot reach from the seeds keep rank 0, which is
   * the semantic: personalized rank IS relevance-to-the-seeds.
   *
   * Seeds that are not graph nodes are ignored (no edges → the walk
   * never leaves them); |S| counts the seeds actually present, observed
   * on the seed-table write. Loop discipline matches [[pageRank]]: each
   * round is one adjacency×ranks equi-join + keyed aggregate
   * materialized as a scratch table — constant-size plans in `iters`,
   * superseded tables retired eagerly. The seed flag rides the rank
   * table so the per-round teleport needs no extra join.
   */
  def pageRankPersonalized(
      edges: DataFrame,
      sources: DataFrame,
      iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    import graft.ops.Scratch
    require(iters >= 1, "iters must be >= 1")
    val spark = edges.sparkSession
    val e0 = canonicalEdges(edges)
    val sym = e0.select(col("src"), col("dst"))
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
    // groupBy + equi-join out-degree (AQE-skew-splittable; see pageRank)
    val outdeg = sym.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val (adj, adjPath) = Scratch.materializeAt(
      sym.join(outdeg, Seq("src")), "ppr_adj")
    val nodeIds = adj.select(col("src").as("node")).distinct()
    val seedIds = sources
      .select(col(sources.columns.head).as("node")).distinct()
      .join(nodeIds, Seq("node"), "left_semi")
    // |S| rides the seed-table write (same observe discipline as pageRank's N)
    val (seeds, sm, seedsPath) = Scratch.materializeObservedAt(
      seedIds, "ppr_seeds", count(lit(1)).as("n_seeds"))
    val ns = sm("n_seeds").asInstanceOf[Long].toDouble
    if (ns == 0d) {
      Scratch.drop(spark, adjPath)
      Scratch.drop(spark, seedsPath)
      return e0.select(col("src").as("node"), lit(0.0d).as("rank")).limit(0)
    }
    // pinned ONCE (node universe × seed flag is per-round-invariant):
    // left lazy, every round's update job re-derived the distinct node
    // universe from the adjacency and re-joined the seed table — two
    // wasted subtrees per round (§1.2)
    val (seeded, seededPath) = graft.ops.Pin.stateAt(
      nodeIds
        .join(seeds.withColumn("is_seed", lit(true)), Seq("node"), "left")
        .select(col("node"), coalesce(col("is_seed"), lit(false)).as("is_seed")),
      "ppr_seeded")
    var ranks = seeded.withColumn("rank",
      when(col("is_seed"), lit(1.0d / ns)).otherwise(lit(0.0d)))
    var ranksPath: String = null // r_0 is a projection of in-flight frames
    // driver-pinned per-round state under the Pin gate (see pageRank)
    for (_ <- 1 to iters) {
      val contrib = adj.join(ranks, adj("src") === ranks("node"))
        .groupBy(adj("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("contrib"))
      val (next, nextPath) = graft.ops.Pin.stateAt(
        seeded.join(contrib, Seq("node"), "left")
          .select(col("node"), col("is_seed"),
            (when(col("is_seed"), lit((1.0d - damping) / ns))
              .otherwise(lit(0.0d))
              + lit(damping) * coalesce(col("contrib"), lit(0.0d))).as("rank")),
        "ppr_ranks")
      if (ranksPath != null) Scratch.drop(spark, ranksPath)
      ranks = next
      ranksPath = nextPath
    }
    Scratch.drop(spark, adjPath)
    Scratch.drop(spark, seedsPath)
    Scratch.drop(spark, seededPath)
    ranks.select(col("node"), col("rank"))
  }

  /**
   * PageRank on the DIRECTED graph — the form a citation / link / follow
   * graph user actually asks for (the reference's data model is directed
   * edges: `README.md:171-175` source_field → target_field). Unlike the
   * symmetrized variant, directed graphs have DANGLING nodes (no
   * out-edges) whose rank mass would otherwise leak out of the system;
   * the standard fix redistributes it uniformly each round:
   *
   *   r_0(v)   = 1/N
   *   dm_t     = sum of r_t(u) over dangling u
   *   r_t+1(v) = (1-d)/N + d * (sum over in-neighbors u of r_t(u)/outdeg(u)
   *                             + dm_t/N)
   *
   * With `weightCol` set, edges carry weights and the random surfer
   * follows them proportionally: contributions become
   * r_t(u)·w(u,v)/strength(u), strength = Σ out-weights (the weighted
   * out-degree); parallel edges sum their weights, non-positive net
   * weights are dropped. The unweighted path is the weightCol=None
   * special case with w≡1.0 — bit-identical to dividing by the integer
   * out-degree, because r·1.0 = r and integer-valued double sums are
   * exact.
   *
   * Loop discipline matches [[pageRank]]: each round materializes its
   * (node, strength, rank) frame as a scratch table, so the plan stays
   * constant-size in `iters`. Carrying `strength` on the rank table
   * makes the dangling mass a pure filter+sum over the PREVIOUS round's
   * scratch table — no extra join — and the 1-row dm frame enters the
   * rank update via a cross join Spark broadcasts. Self-loops are
   * dropped and duplicate edges collapsed, matching the undirected
   * canonicalization contract.
   */
  def pageRankDirected(
      edges: DataFrame,
      iters: Int = 3,
      damping: Double = 0.85,
      weightCol: Option[String] = None): DataFrame = {
    import graft.ops.Scratch
    require(iters >= 1, "iters must be >= 1")
    val spark = edges.sparkSession
    val e0 = weightCol match {
      case None =>
        edges.filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst")).distinct()
          .withColumn("w", lit(1.0d))
      case Some(wc) =>
        edges.filter(col("src") =!= col("dst"))
          .groupBy(col("src"), col("dst"))
          .agg(sum(col(wc).cast("double")).as("w"))
          .filter(col("w") > 0.0d)
    }
    // groupBy + equi-join out-strength (AQE-skew-splittable; see pageRank)
    val outdeg = e0.groupBy(col("src")).agg(sum(col("w")).as("strength"))
    val (adj, adjPath) = Scratch.materializeAt(
      e0.join(outdeg, Seq("src")), "prd_adj")
    // node universe = src ∪ dst, each with its out-strength (0 = dangling)
    val nodeIds = adj.select(col("src").as("node"))
      .union(adj.select(col("dst").as("node")))
      .distinct()
    val (nodes, nm, nodesPath) = Scratch.materializeObservedAt(
      nodeIds.join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left")
        .select(col("node"), coalesce(col("strength"), lit(0.0d)).as("strength")),
      "prd_nodes", count(lit(1)).as("n_nodes"))
    val n = nm("n_nodes").asInstanceOf[Long].toDouble
    if (n == 0d) {
      Scratch.drop(spark, adjPath)
      Scratch.drop(spark, nodesPath)
      return e0.select(col("src").as("node"), lit(0.0d).as("rank")).limit(0)
    }
    var ranks = nodes.withColumn("rank", lit(1.0d / n))
    var ranksPath: String = null // r_0 is a projection of the nodes table
    // driver-pinned per-round state under the Pin gate (see pageRank)
    for (_ <- 1 to iters) {
      val contrib = adj.join(ranks, adj("src") === ranks("node"))
        .groupBy(adj("dst").as("node"))
        .agg(sum(ranks("rank") * adj("w") / adj("strength")).as("contrib"))
      val dangling = ranks.filter(col("strength") === 0.0d)
        .agg(coalesce(sum(col("rank")), lit(0.0d)).as("dm"))
      val (next, nextPath) = graft.ops.Pin.stateAt(
        nodes.join(contrib, Seq("node"), "left")
          .crossJoin(dangling)
          .select(col("node"), col("strength"),
            (lit((1.0d - damping) / n)
              + lit(damping) * (coalesce(col("contrib"), lit(0.0d))
                + col("dm") / lit(n))).as("rank")),
        "prd_ranks")
      if (ranksPath != null) Scratch.drop(spark, ranksPath)
      ranks = next
      ranksPath = nextPath
    }
    Scratch.drop(spark, adjPath)
    Scratch.drop(spark, nodesPath)
    ranks.select(col("node"), col("rank"))
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
    // fanOutByKey(u): the quadratic wedge expansion must not run at
    // the byte-small post-shuffle parallelism AQE would coalesce it to
    // (see Par.fanOutByKey — measured 1–2-task wedge stages); the
    // explicit hash exchange IS the wedge join's exchange, pinned
    val oK = graft.ops.Par.fanOutByKey(o, col("u"))
    val w1 = oK.select(col("u"), col("v").as("v1"), col("vdeg").as("v1deg"))
    val w2 = oK.select(col("u"), col("v").as("v2"), col("vdeg").as("v2deg"))
    val wedges = w1.join(w2, Seq("u"))
      .filter(ord(col("v1deg"), col("v1")) < ord(col("v2deg"), col("v2")))
    val closed = wedges.join(
      o.select(col("u").as("v1"), col("v").as("v2")), Seq("v1", "v2"))
    closed.agg(count(lit(1)).as("n_triangles"))
  }

  /**
   * Local clustering coefficient (the GDS LocalClusteringCoefficient
   * surface): per node v, lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) where
   * T(v) is the number of triangles through v — how close v's
   * neighborhood is to a clique. Nodes of degree < 2 score 0 (no
   * possible wedge). Returns (node, degree, triangles, lcc).
   *
   * T(v) comes from the node-anchored wedge count: neighbors x1 < x2 of
   * v whose canonical edge (x1, x2) exists. Unlike [[triangleCount]]'s
   * oriented enumeration (each triangle once), the per-NODE count needs
   * each triangle credited to all three corners, so the wedge join runs
   * on the full adjacency — quadratic in degree, hence the same
   * ENFORCED `maxDegree` contract as [[commonNeighborsTopK]]. Both
   * joins are keyed shuffles; the only division happens once per node
   * at output, 6-dp-rounded — integer counts make everything before it
   * bit-exact cross-engine.
   */
  def localClusteringCoefficient(
      edges: DataFrame,
      maxDegree: Long = 100000): DataFrame = {
    import graft.ops.Scratch
    // backs the returned lazy plan (adjacency twice + closing join)
    val e = Scratch.materialize(canonicalEdges(edges), "lcc_edges")
    // fanOutByKey(n) — see Par.fanOutByKey: the wedge expansion below
    // must not run at the 1–2-task parallelism AQE's byte-based
    // coalescing gives a byte-small adjacency (no-op on well-split
    // inputs); the keyed aggregates on n reuse the pinned exchange
    val adj0 = graft.ops.Par.fanOutByKey(
      e.select(col("src").as("n"), col("dst").as("x"))
        .union(e.select(col("dst").as("n"), col("src").as("x"))), col("n"))
    val adj = Blocks.guardBlockSize(adj0, "n", maxDegree,
      "localClusteringCoefficient",
      hint = "the wedge fanout is quadratic in node degree - truncate "
        + "per-node adjacency upstream or raise maxDegree deliberately",
      boundName = "maxDegree")
    val deg = adj.groupBy(col("n")).agg(count(lit(1)).as("degree"))
    val w1 = adj.select(col("n"), col("x").as("x1"))
    val w2 = adj.select(col("n"), col("x").as("x2"))
    val tri = w1.join(w2, Seq("n")).filter(col("x1") < col("x2"))
      .join(e.select(col("src").as("x1"), col("dst").as("x2")), Seq("x1", "x2"))
      .groupBy(col("n")).agg(count(lit(1)).as("triangles"))
    deg.join(tri, Seq("n"), "left")
      .select(col("n").as("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        round(
          when(col("degree") >= 2,
            lit(2.0d) * coalesce(col("triangles"), lit(0L)).cast("double") /
              (col("degree") * (col("degree") - 1)).cast("double"))
            .otherwise(lit(0.0d)), 6).as("lcc"))
  }

  /** Weakly connected components over the undirected edge set: every
    * node that appears in an edge, labeled with its component's minimum
    * node id. Delegates to the corpus CC engine
    * ([[Corpus.connectedComponents]]): observed-count-gated driver
    * union-find for small pair lists, pointer-jumping min-label
    * propagation over scratch tables (O(log diameter) rounds,
    * constant-size plans) beyond the threshold — the same loop
    * discipline PageRank uses. */
  def connectedComponents(edges: DataFrame): DataFrame =
    Corpus.connectedComponents(canonicalEdges(edges), aCol = "src", bCol = "dst")
      .select(col("id").as("node"), col("label").as("component"))

  /**
   * Strongly connected components of a DIRECTED edge frame (GDS SCC);
   * component id = the minimum member id, so output is canonical and
   * engine-reproducible. Min-label forward-backward peeling — the
   * label-propagation rendition of FW-BW (Fleischer/Hendrickson/Pinar
   * 2000): per outer round, propagate the minimum reaching id FORWARD
   * to fixpoint (f(v) = min id with a path TO v) and BACKWARD to
   * fixpoint (b(v) = min id v has a path to); a node with f(v) == b(v)
   * is MUTUALLY reachable with that minimum, so its SCC id is exactly
   * f(v) — and that minimum is the smallest member of the SCC (any
   * smaller member would have propagated first). Assigned nodes peel
   * out, edges restrict to the remainder, repeat: every remaining
   * basin-minimum's SCC resolves each round, so the outer count is
   * bounded by the peeling depth (2-3 on real graphs), enforced by
   * `maxOuterRounds` with a fail-fast naming the escape.
   *
   * Scale shape: the [[kCore]]/[[connectedComponents]] scratch-loop
   * discipline throughout — each inner round is one equi-join + min
   * groupBy plus a pointer-jump composition (labels are node ids whose
   * reachability composes, so label² is a valid O(log diameter)
   * accelerator), with an EXACT no-change witness (labels only
   * decrease; an unchanged DECIMAL(38,0) label sum proves fixpoint).
   * Nothing driver-side beyond the observed-count loop gates; nothing
   * broadcast that is O(graph). Self-loops drop (v is trivially in its
   * own SCC); every node appears exactly once in the output. */
  def stronglyConnectedComponents(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxOuterRounds: Int = 20,
      maxInnerRounds: Int = 40,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    import graft.ops.Scratch
    val spark = edges.sparkSession
    var (e, me, ePath) = Scratch.materializeObservedAt(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .filter(col("src") =!= col("dst")).distinct(),
      "scc_edges", count(lit(1)).as("n"))
    // observed-gated local fast path (the louvain/union-find
    // switchover): SCC output is CANONICAL (min member id), so a
    // driver Tarjan reproduces the FW-BW result exactly — and at
    // bench scale the FW-BW loop's ~40 write jobs are pure stage
    // scheduling. Long ids only; maxLocalEdges=0 forces distributed.
    val sccCap = localEdgeCap(spark, maxLocalEdges)
    if (sccCap > 0 &&
        me("n").asInstanceOf[Long] <= sccCap &&
        e.schema("src").dataType == org.apache.spark.sql.types.LongType) {
      val result = sccLocal(collectEdgePairs(e))
      Scratch.drop(spark, ePath)
      return longPairFrame(spark, result, "node", "scc_id")
    }
    var (nodes, mn, nodesPath) = Scratch.materializeObservedAt(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct(),
      "scc_nodes", count(lit(1)).as("n"))
    var nNodes = mn("n").asInstanceOf[Long]
    val assigned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var outer = 0
    while (nNodes > 0 && outer < maxOuterRounds) {
      val (f, fPath) = minLabelFixpoint(nodes, e, forward = true, maxInnerRounds)
      val (b, bPath) = minLabelFixpoint(nodes, e, forward = false, maxInnerRounds)
      // the (f, b) class table drives the whole round: f == b names the
      // resolved SCCs (v is mutually reachable with that minimum), and
      // UNRESOLVED nodes' SCCs live entirely inside their (f, b) class
      // (mutual reachability forces equal f and equal b) — so the round
      // peels the resolved nodes AND cuts every cross-class edge,
      // splitting the remainder into independent subproblems that each
      // resolve their own minimum next round (the partition-refinement
      // FW-BW: rounds are ~log of the condensation depth, where peeling
      // resolved nodes alone walks singleton-SCC chains one min-basin
      // at a time — measured 20+ rounds on the parity fixture).
      // Materialized: the result union, the node peel, and the edge
      // restrict must not re-run both fixpoints; the table outlives the
      // call (the returned union reads it).
      val (nc, ma, _) = Scratch.materializeObservedAt(
        f.select(col("node"), col("label").as("f"))
          .join(b.select(col("node"), col("label").as("b")), Seq("node")),
        "scc_classes",
        coalesce(sum(when(col("f") === col("b"), 1L).otherwise(0L)), lit(0L))
          .as("n_resolved"))
      Scratch.drop(spark, fPath)
      Scratch.drop(spark, bPath)
      assigned += nc.filter(col("f") === col("b"))
        .select(col("node"), col("f").as("scc_id"))
      val nResolved = ma("n_resolved").asInstanceOf[Long]
      val open = nc.filter(col("f") =!= col("b"))
      val (nodes2, mn2, nodesPath2) = Scratch.materializeObservedAt(
        open.select(col("node")), "scc_nodes", count(lit(1)).as("n"))
      val (e2, me2, ePath2) = Scratch.materializeObservedAt(
        e.join(open.select(col("node").as("src"), col("f").as("fs"), col("b").as("bs")),
            Seq("src"))
          .join(open.select(col("node").as("dst"), col("f").as("fd"), col("b").as("bd")),
            Seq("dst"))
          .filter(col("fs") === col("fd") && col("bs") === col("bd"))
          .select(col("src"), col("dst")),
        "scc_edges", count(lit(1)).as("n"))
      Scratch.drop(spark, nodesPath)
      Scratch.drop(spark, ePath)
      nodes = nodes2; nodesPath = nodesPath2
      e = e2; ePath = ePath2
      nNodes = mn2("n").asInstanceOf[Long]
      require(nResolved > 0 || nNodes == 0,
        "stronglyConnectedComponents made no progress - impossible for " +
          "a fixpointed (f, b) class table; check the edge derivation")
      val _unused = me2 // edge count observed for free; the loop keys on nodes
      outer += 1
    }
    require(nNodes == 0,
      s"stronglyConnectedComponents did not settle in $maxOuterRounds peel rounds " +
        s"($nNodes nodes left) - raise maxOuterRounds, or check for an " +
        "adversarial chain of nested basins")
    if (assigned.isEmpty) {
      // empty graph: the (empty) node scratch stays alive as the result
      Scratch.drop(spark, ePath)
      nodes.select(col("node"), col("node").as("scc_id"))
    } else {
      Scratch.drop(spark, nodesPath)
      Scratch.drop(spark, ePath)
      assigned.reduce(_.unionByName(_))
    }
  }

  /** Min-label propagation to FIXPOINT over a directed scratch edge
    * table: label(v) = min id with a path to v (forward) or reachable
    * from v (backward). One neighbor join + one pointer-jump composition
    * + one min groupBy per round; fixpoint proven by an unchanged label
    * sum (labels only decrease — DECIMAL(38,0) keeps the sum
    * overflow-exact; non-numeric orderable ids sum xxhash64 instead,
    * the [[Corpus.connectedComponents]] witness). Returns the label
    * frame and its scratch path (caller retires it). */
  private def minLabelFixpoint(
      nodes: DataFrame,
      e: DataFrame,
      forward: Boolean,
      maxRounds: Int): (DataFrame, String) = {
    import graft.ops.Scratch
    val spark = nodes.sparkSession
    val edges =
      if (forward) e.select(col("src").as("s"), col("dst").as("d"))
      else e.select(col("dst").as("s"), col("src").as("d"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val labelStat = nodes.schema.fields(0).dataType match {
      case _: org.apache.spark.sql.types.NumericType => col("label")
      case _ => xxhash64(col("label"))
    }
    val witness =
      coalesce(sum(labelStat.cast(dec)), lit(0L).cast(dec)).as("label_sum")
    val tag = if (forward) "scc_f" else "scc_b"
    var (labels, m0, path) = Scratch.materializeObservedAt(
      nodes.select(col("node"), col("node").as("label")), tag, witness)
    var prevSum: Any = m0("label_sum")
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val nbr = labels.join(edges, col("node") === col("s"))
        .select(col("d").as("node"), col("label"))
      val jump = labels.select(col("node"), col("label").as("l0"))
        .join(labels.select(col("node").as("l0"), col("label")), Seq("l0"))
        .select(col("node"), col("label"))
      val (next, m, nextPath) = Scratch.materializeObservedAt(
        nbr.union(labels).union(jump)
          .groupBy(col("node")).agg(min(col("label")).as("label")),
        tag, witness)
      Scratch.drop(spark, path)
      labels = next; path = nextPath
      val s2 = m("label_sum")
      converged = s2 == prevSum
      prevSum = s2
      round += 1
    }
    require(converged,
      s"min-label propagation did not converge in $maxRounds rounds - " +
        "raise maxInnerRounds (diameter-bound) for this graph")
    (labels, path)
  }

  /**
   * Label propagation community detection (LPA — Raghavan/Albert/Kumara
   * 2007), the remaining GDS-flagship community algorithm the
   * reference's destination system runs on loaded graphs. SYNCHRONOUS
   * and fully deterministic: every round, each node adopts the most
   * frequent label among its NEIGHBORS' previous-round labels, ties
   * broken by the smallest label (classic async LPA visits nodes in
   * random order — unreproducible and un-oracle-able; the synchronous
   * min-tie-break form is engine-reproducible at the cost of possible
   * oscillation on bipartite structures, which a fixed round count
   * bounds). Initial label = node id; `rounds` fixed iterations.
   *
   * With `weightCol` set, votes are WEIGHTED (the GDS LPA
   * relationship-weight semantic): a label's vote is the sum of the
   * incident edge weights carrying it, parallel edges summed at
   * canonicalization, non-positive net weights dropped. Integer-valued
   * weights keep the vote sums bit-exact cross-engine (doubles below
   * 2^53); the unweighted path is the w≡1.0 special case.
   *
   * Scale shape: the per-round argmax is "max vote, then min label" as
   * TWO keyed aggregates plus an equi-join — NOT a `partition by node`
   * window, whose per-node candidate rows are bounded only by degree
   * and would put a mega-hub's candidates in one task. Each round's
   * (node, label) frame and its neighbor-label histogram are scratch
   * tables (constant-size plans, the [[pageRank]] loop discipline),
   * superseded tables retired eagerly.
   */
  def labelPropagation(
      edges: DataFrame,
      rounds: Int = 3,
      weightCol: Option[String] = None,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    import graft.ops.Scratch
    require(rounds >= 1, "rounds must be >= 1")
    val spark = edges.sparkSession
    val e0 = weightCol match {
      case None => canonicalEdges(edges).withColumn("w", lit(1.0d))
      case Some(wc) =>
        edges.filter(col("src") =!= col("dst"))
          .groupBy(least(col("src"), col("dst")).as("src"),
            greatest(col("src"), col("dst")).as("dst"))
          .agg(sum(col(wc).cast("double")).as("w"))
          .filter(col("w") > 0.0d)
    }
    val (adj, am, adjPath) = Scratch.materializeObservedAt(
      e0.select(col("src").as("n"), col("dst").as("x"), col("w"))
        .union(e0.select(col("dst").as("n"), col("src").as("x"), col("w"))),
      "lpa_adj", count(lit(1)).as("n_rows"), sum(col("w")).as("wsum"))
    // driver-local replay gate (the power-family switchover): vote
    // tallies are DOUBLE sums, which are only order-free when every
    // weight is integer-valued and the total stays under 2^52 — then
    // the double sum equals the exact Long sum regardless of shuffle
    // order, and a Long-tally replay is bit-identical (unweighted w≡1
    // always qualifies; co-occurrence counts qualify; fractional
    // weights keep the distributed loop).
    locally {
      val cap = localEdgeCap(spark, maxLocalEdges)
      val nRows = am("n_rows").asInstanceOf[Long]
      val wsumOk = am("wsum") match {
        case null => true
        case d: java.lang.Double =>
          d.doubleValue <= 4503599627370496.0d // 2^52
        case _ => false
      }
      if (cap > 0 && nRows <= cap && wsumOk &&
          adj.schema("n").dataType == org.apache.spark.sql.types.LongType) {
        val triples = adj.select(col("n"), col("x"), col("w")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        if (triples.forall(t => t._3 == math.floor(t._3) &&
            math.abs(t._3) < 4503599627370496.0d)) {
          Scratch.drop(spark, adjPath)
          return lpaLocal(spark, triples, rounds)
        }
      }
    }
    var labels = adj.select(col("n").as("node")).distinct()
      .withColumn("label", col("node"))
    var labelsPath: String = null // round 0 is a projection of adj
    for (_ <- 1 to rounds) {
      // neighbor-label vote histogram, materialized once per round:
      // both the max-vote side and the min-label side read the same
      // table instead of re-running the adjacency join twice
      val (cand, candPath) = Scratch.materializeAt(
        adj.join(labels, adj("x") === labels("node"))
          .select(adj("n").as("node"), col("label"), adj("w"))
          .groupBy(col("node"), col("label"))
          .agg(sum(col("w")).as("c")),
        "lpa_cand")
      val best = cand.groupBy(col("node")).agg(max(col("c")).as("mc"))
      val (next, nextPath) = Scratch.materializeAt(
        cand.join(best, Seq("node"))
          .filter(col("c") === col("mc"))
          .groupBy(col("node")).agg(min(col("label")).as("label")),
        "lpa_labels")
      Scratch.drop(spark, candPath)
      if (labelsPath != null) Scratch.drop(spark, labelsPath)
      labels = next
      labelsPath = nextPath
    }
    Scratch.drop(spark, adjPath)
    labels
  }

  /**
   * k-core subgraph (GDS "k-core decomposition" for a fixed k): peel
   * nodes of degree < k, recompute degrees, repeat until fixpoint —
   * the standard cohesive-subgraph filter (Seidman 1983). Returns the
   * surviving nodes with their within-core degree (all >= k).
   *
   * Loop discipline: each peel round materializes the surviving edge
   * set as a scratch table whose write job carries the OBSERVED edge
   * count; the loop stops when the count stops shrinking (peeling is
   * monotone — a round that removes no node removes no edge), bounded
   * by `maxRounds` as the runaway backstop. Plans stay constant-size
   * in the round count ([[pageRank]] discipline); superseded tables
   * retire eagerly. Each round is two keyed aggs + two anti-joins —
   * no windows, no driver-side row iteration. Peeling is idempotent
   * past the fixpoint, which is what makes the unrolled-round oracle
   * exact regardless of when each side stops.
   */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 30,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    import graft.ops.Scratch
    require(k >= 1, "k must be >= 1")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges.sparkSession
    var (e, nE, ePath) = Scratch.materializeObservedAt(
      canonicalEdges(edges), "kcore_edges", count(lit(1)).as("n"))
    var n = nE("n").asInstanceOf[Long]
    // observed-gated driver-local peel (the topoLocal switchover): the
    // peel is all-integer — degrees, the <k cut, the same round cap —
    // so the local replay is value-exact, and each distributed round's
    // TWO jobs (degree+anti-join write) collapse to array passes
    val kcoreCap = localEdgeCap(spark, maxLocalEdges)
    if (kcoreCap > 0 && n <= kcoreCap &&
        e.schema("src").dataType == org.apache.spark.sql.types.LongType) {
      val result = kCoreLocal(collectEdgePairs(e), k, maxRounds)
      Scratch.drop(spark, ePath)
      return longPairFrame(spark, result, "node", "degree")
    }
    var rounds = 0
    var converged = n == 0L
    while (!converged && rounds < maxRounds) {
      val deg = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      val bad = deg.filter(col("degree") < k).select(col("node"))
      val (e2, m2, p2) = Scratch.materializeObservedAt(
        e.join(bad.select(col("node").as("src")), Seq("src"), "left_anti")
          .join(bad.select(col("node").as("dst")), Seq("dst"), "left_anti")
          .select(col("src"), col("dst")),
        "kcore_edges", count(lit(1)).as("n"))
      val n2 = m2("n").asInstanceOf[Long]
      Scratch.drop(spark, ePath)
      e = e2; ePath = p2
      converged = n2 == n || n2 == 0L
      n = n2
      rounds += 1
    }
    e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
  }

  /** Hop-bounded topological layering of a DIRECTED edge frame (Kahn's
    * algorithm as synchronous peel rounds — the scheduling / dependency-
    * resolution surface: layer L = every node whose prerequisites all
    * sit in layers < L, so "layer" is exactly the earliest parallel
    * wave a task can run in). Round i assigns layer i to the current
    * zero-in-degree nodes, removes their outgoing edges, repeats.
    * Nodes still unresolved after `maxRounds` rounds — deeper than the
    * bound, or on/behind a CYCLE (a cycle never yields a source; this
    * is also the cycle detector: null-layer nodes with a non-deep graph
    * ⇒ cyclic dependencies) — surface with a null layer instead of
    * looping forever, the same hop-bound contract as [[shortestPaths]].
    *
    * Scale shape = the [[kCore]] peel discipline: per round, one
    * distinct-dst anti-join finds sources (never a global sort or a
    * driver-side Kahn queue) and one src anti-join shrinks the edge
    * table; each round's survivors and assignments are scratch tables
    * with the assignment count OBSERVED on the write, so convergence
    * (no new sources) stops the loop without a second scan. Rounds cost
    * O(remaining edges) each; total work is O(maxRounds · |E|) worst
    * case, O(|E| · avg-depth) typically. */
  def topoLayers(edges: DataFrame, maxRounds: Int = 8,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    import graft.ops.Scratch
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges.sparkSession
    var (e, em, ePath) = Scratch.materializeObservedAt(
      edges.select(col("src"), col("dst")).distinct(), "topo_edges",
      count(lit(1)).as("n"))
    // observed-gated local Kahn replay (the louvain switchover): layer
    // = earliest wave is canonical up to the cap, and the peel loop's
    // per-wave write jobs are pure stage scheduling at bench scale
    val topoCap = localEdgeCap(spark, maxLocalEdges)
    if (topoCap > 0 &&
        em("n").asInstanceOf[Long] <= topoCap &&
        e.schema("src").dataType == org.apache.spark.sql.types.LongType) {
      val result = topoLocal(collectEdgePairs(e), maxRounds)
      Scratch.drop(spark, ePath)
      return longNullableFrame(spark, result, "node", "layer")
    }
    val (nodes, nodesPath) = Scratch.materializeAt(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct(), "topo_nodes")
    var remaining = nodes
    var remainingPath = nodesPath
    val layers = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    var done = false
    // zero-in-degree among the remaining graph: no surviving edge
    // points AT the node (distinct dst anti-join — no degree count
    // needed, presence is enough; the anti join needs no distinct
    // right side — one shuffle saved)
    def wave(rem: DataFrame, edg: DataFrame, r: Int): DataFrame =
      rem.join(edg.select(col("dst").as("node")), Seq("node"), "left_anti")
        .select(col("node"), lit(r.toLong).as("layer"))
    while (!done && round < maxRounds) {
      // TWO peel waves composed lazily per materialization set: wave 2
      // runs on wave 1's lazy residue, so each loop iteration costs 3
      // write jobs for 2 rounds instead of 6 (the stage-scheduling
      // constant is what dominates these node-sized frames; identical
      // layer assignment — batching is physical only). The convergence
      // witness observes BOTH waves' counts on the one layer write.
      val batched = round + 1 < maxRounds
      if (batched) {
        val src1 = wave(remaining, e, round)
        val e1 = e.join(src1.select(col("node").as("src")),
          Seq("src"), "left_anti")
        val r1 = remaining.join(src1.select(col("node")),
          Seq("node"), "left_anti")
        val src2 = wave(r1, e1, round + 1)
        val (src, sm, srcPath) = Scratch.materializeObservedAt(
          src1.unionByName(src2), "topo_layer",
          count(when(col("layer") === round.toLong, 1)).as("n1"),
          count(when(col("layer") === (round + 1).toLong, 1)).as("n2"))
        val n1 = sm("n1").asInstanceOf[Long]
        val n2 = sm("n2").asInstanceOf[Long]
        if (n1 == 0L) {
          Scratch.drop(spark, srcPath)
          done = true // only cycles (or nothing) left
        } else {
          layers += src
          val (e2, e2Path) = Scratch.materializeAt(
            e.join(src.select(col("node").as("src")), Seq("src"), "left_anti"),
            "topo_edges")
          Scratch.drop(spark, ePath)
          e = e2; ePath = e2Path
          val (r2, r2Path) = Scratch.materializeAt(
            remaining.join(src.select(col("node")), Seq("node"), "left_anti"),
            "topo_nodes")
          if (remainingPath != nodesPath) Scratch.drop(spark, remainingPath)
          remaining = r2; remainingPath = r2Path
          done = n2 == 0L // wave 2 empty ⇒ fixpoint (cycles only left)
          round += 2
        }
      } else {
        val (src, sm, srcPath) = Scratch.materializeObservedAt(
          wave(remaining, e, round), "topo_layer", count(lit(1)).as("n"))
        val nNew = sm("n").asInstanceOf[Long]
        if (nNew == 0L) {
          Scratch.drop(spark, srcPath)
          done = true
        } else {
          layers += src
          val (e2, e2Path) = Scratch.materializeAt(
            e.join(src.select(col("node").as("src")), Seq("src"), "left_anti"),
            "topo_edges")
          Scratch.drop(spark, ePath)
          e = e2; ePath = e2Path
          val (r2, r2Path) = Scratch.materializeAt(
            remaining.join(src.select(col("node")), Seq("node"), "left_anti"),
            "topo_nodes")
          if (remainingPath != nodesPath) Scratch.drop(spark, remainingPath)
          remaining = r2; remainingPath = r2Path
          round += 1
        }
      }
    }
    val unresolved = remaining.select(col("node"),
      lit(null).cast("long").as("layer"))
    (layers.toSeq :+ unresolved).reduce(_.unionByName(_))
  }

  /** Hop-bounded greedy graph coloring (the GDS K1-Coloring surface,
    * rendered deterministic): synchronous Jones–Plassmann rounds with
    * node id as the priority — round i colors every remaining node
    * that is a LOCAL MINIMUM among its uncolored neighbors (an
    * independent set by construction, so "color = round" is always a
    * proper coloring), removes it, repeats. Id priority instead of the
    * usual random priority keeps the result reproducible across runs,
    * partitionings and engines — the same determinism trade
    * [[labelPropagation]] makes. Nodes still uncolored after
    * `maxRounds` (long id-decreasing chains — the pathological case
    * for id priority) surface with a null color, the [[topoLayers]]
    * hop-bound contract.
    *
    * Scale shape = the [[kCore]] peel discipline: per round one
    * symmetric-adjacency semi-join finds nodes with a smaller-id
    * uncolored neighbor (everyone else colors), one anti-join each
    * shrinks the edge and node tables; all scratch-backed, the colored
    * count OBSERVED on each round's write. */
  def greedyColoring(edges: DataFrame, maxRounds: Int = 8,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    import graft.ops.Scratch
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges.sparkSession
    var (e, em, ePath) = Scratch.materializeObservedAt(
      canonicalEdges(edges), "color_edges", count(lit(1)).as("n"))
    // observed-gated local Jones-Plassmann replay (the louvain
    // switchover): identical waves, identical mex fold, and the
    // differential spec + sf0.01 oracle pin the equality
    val colorCap = localEdgeCap(spark, maxLocalEdges)
    if (colorCap > 0 &&
        em("n").asInstanceOf[Long] <= colorCap &&
        e.schema("src").dataType == org.apache.spark.sql.types.LongType) {
      val result = coloringLocal(collectEdgePairs(e), maxRounds)
      Scratch.drop(spark, ePath)
      return longNullableFrame(spark, result, "node", "color")
    }
    // full symmetric adjacency — the COLOR lookup runs against all
    // edges, not just the shrinking remainder
    val (adj, adjPath) = Scratch.materializeAt(
      e.select(col("src").as("node"), col("dst").as("nbr"))
        .union(e.select(col("dst").as("node"), col("src").as("nbr"))),
      "color_adj")
    val (nodes, nodesPath) = Scratch.materializeAt(
      adj.select(col("node")).distinct(), "color_nodes")
    var remaining = nodes
    var remainingPath = nodesPath
    // accumulated (node, color); starts empty with the right shape
    var colored = nodes.filter(lit(false))
      .select(col("node"), lit(0L).as("color"))
    var coloredPath: String = null
    // mex over the SORTED distinct neighbor colors: fold acc+1 on every
    // exact hit — the minimum excluded non-negative integer
    def mex(colors: Column): Column =
      aggregate(array_sort(colors), lit(0L),
        (acc, x) => when(x === acc, acc + 1L).otherwise(acc))
    var round = 0
    var done = false
    // one coloring wave: local minima of the remaining graph take the
    // mex of their already-colored neighborhoods. Canonical src<dst
    // orientation means the smaller endpoint is always src, so exactly
    // the dst side must wait; the anti join needs no distinct on its
    // right side — skipping it saves a shuffle per wave.
    def waveC(rem: DataFrame, edg: DataFrame, cold: DataFrame): DataFrame = {
      val win = rem.join(
        edg.select(col("dst").as("node")), Seq("node"), "left_anti")
      win.join(
        adj.join(win, Seq("node"), "left_semi")
          .join(cold.withColumnRenamed("node", "nbr"), Seq("nbr"))
          .groupBy(col("node"))
          .agg(mex(collect_set(col("color"))).as("c")),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("c"), lit(0L)).as("color"))
    }
    while (!done && round < maxRounds) {
      // TWO waves composed lazily per materialization set (the
      // topoLayers batching: wave 2 colors against wave 1's lazy
      // residue and assignments — identical colors, half the write
      // jobs; wave 1's subplan re-evaluates inside wave 2, the
      // documented compute-for-scheduling trade). A `wv` marker column
      // carries the per-wave convergence counts through the one write.
      val batched = round + 1 < maxRounds
      val (winC, n1, n2, winPath) = if (batched) {
        val w1 = waveC(remaining, e, colored)
        val e1 = e
          .join(w1.select(col("node").as("src")), Seq("src"), "left_anti")
          .join(w1.select(col("node").as("dst")), Seq("dst"), "left_anti")
          .select(col("src"), col("dst"))
        val r1 = remaining.join(w1.select(col("node")), Seq("node"), "left_anti")
        val w2 = waveC(r1, e1, colored.unionByName(w1))
        val (both, wm, p) = Scratch.materializeObservedAt(
          w1.withColumn("wv", lit(0)).unionByName(w2.withColumn("wv", lit(1))),
          "color_round",
          count(when(col("wv") === 0, 1)).as("n1"),
          count(when(col("wv") === 1, 1)).as("n2"))
        (both.select(col("node"), col("color")),
          wm("n1").asInstanceOf[Long], wm("n2").asInstanceOf[Long], p)
      } else {
        val (w, wm, p) = Scratch.materializeObservedAt(
          waveC(remaining, e, colored), "color_round",
          count(lit(1)).as("n"))
        (w, wm("n").asInstanceOf[Long], -1L, p)
      }
      if (n1 == 0L) {
        Scratch.drop(spark, winPath)
        done = true
      } else {
        val (c2, c2Path) = Scratch.materializeAt(
          colored.unionByName(winC), "color_assigned")
        if (coloredPath != null) Scratch.drop(spark, coloredPath)
        colored = c2; coloredPath = c2Path
        val (e2, e2Path) = Scratch.materializeAt(
          e.join(winC.select(col("node").as("src")), Seq("src"), "left_anti")
            .join(winC.select(col("node").as("dst")), Seq("dst"), "left_anti")
            .select(col("src"), col("dst")),
          "color_edges")
        Scratch.drop(spark, ePath)
        e = e2; ePath = e2Path
        val (r2, r2Path) = Scratch.materializeAt(
          remaining.join(winC.select(col("node")), Seq("node"), "left_anti"),
          "color_nodes")
        if (remainingPath != nodesPath) Scratch.drop(spark, remainingPath)
        remaining = r2; remainingPath = r2Path
        // winC fully consumed by the three writes above — retire now
        Scratch.drop(spark, winPath)
        if (batched) {
          done = n2 == 0L // wave 2 idle ⇒ fixpoint
          round += 2
        } else round += 1
      }
    }
    // adjacency and the residual edge table fed their last round's
    // writes; only the colored + remaining tables outlive the call
    Scratch.drop(spark, adjPath)
    Scratch.drop(spark, ePath)
    val unresolved = remaining.select(col("node"),
      lit(null).cast("long").as("color"))
    colored.unionByName(unresolved)
  }

  /** Deterministic greedy MAXIMAL matching (the distributed rendition
    * of sequential greedy matching — Luby-style local minima with the
    * canonical (src, dst) pair order as the priority, so the result is
    * reproducible across runs, partitionings and engines): round i
    * matches every remaining edge that is the MINIMUM incident edge of
    * BOTH its endpoints, removes the matched endpoints, repeats. The
    * output is a matching (no two edges share a node) and maximal (no
    * remaining edge could be added) once the loop converges; rounds are
    * O(log n) expected on the random-priority analysis and the hop
    * bound caps the adversarial case. The warehouse uses: one-to-one
    * record linkage (each left row consumes at most one right row),
    * resource pairing, dedup keep-pair selection.
    *
    * Per round: one keyed min-struct aggregate over edge endpoints
    * (never a per-node window) + two semi-joins to test "minimum at
    * both ends" + two anti-joins to peel matched nodes — all scratch-
    * backed with the matched count OBSERVED on the write, the
    * [[kCore]] loop discipline.
    *
    * CONTRACT on the round bound: maximality is only guaranteed when
    * the loop CONVERGES (no edges remain). An adversarial id ordering
    * (e.g. a path numbered so each round peels one edge) needs O(n)
    * rounds, so exiting via `maxRounds` with edges remaining would
    * silently look maximal — instead the residual edge count is
    * OBSERVED on each round's peel write and the still-pairable
    * residual edges are RETURNED with `round = NULL` (the
    * [[topoLayers]]/[[greedyColoring]] unresolved-surface discipline:
    * non-maximality is visible in-band, matched rows filter
    * `round IS NOT NULL`). Escape route: raise `maxRounds` (rounds
    * are O(log n) expected on non-adversarial orderings). */
  def maximalMatching(edges: DataFrame, maxRounds: Int = 8,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    import graft.ops.Scratch
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges.sparkSession
    var (e, em0, ePath) = Scratch.materializeObservedAt(
      canonicalEdges(edges), "match_edges", count(lit(1)).as("n"))
    // observed-gated local replay of the synchronous rounds (the
    // louvain switchover): same both-ends-minimal waves under the
    // canonical order, same null-round residual contract
    val matchCap = localEdgeCap(spark, maxLocalEdges)
    if (matchCap > 0 &&
        em0("n").asInstanceOf[Long] <= matchCap &&
        e.schema("src").dataType == org.apache.spark.sql.types.LongType) {
      val result = matchingLocal(collectEdgePairs(e), maxRounds)
      Scratch.drop(spark, ePath)
      val jrows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(result.map(r =>
          org.apache.spark.sql.Row(r._1, r._2,
            r._3.map(Long.box).orNull)): _*)
      return spark.createDataFrame(jrows,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("src",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("dst",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("round",
            org.apache.spark.sql.types.LongType, nullable = true))))
    }
    val matched = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    var done = false
    var residual = -1L // unknown until the first peel write observes it
    // one matching wave over an edge set: every edge that is the
    // minimum incident edge of BOTH its endpoints matches
    def waveM(edg: DataFrame, r: Int): DataFrame = {
      val inc = edg.select(col("src").as("node"), col("src"), col("dst"))
        .union(edg.select(col("dst").as("node"), col("src"), col("dst")))
      val minE = inc.groupBy(col("node"))
        .agg(min(struct(col("src"), col("dst"))).as("me"))
      val byS = minE.select(col("node").as("src"), col("me").as("mes"))
      val byD = minE.select(col("node").as("dst"), col("me").as("med"))
      edg.join(byS, Seq("src")).join(byD, Seq("dst"))
        .filter(col("mes") === struct(col("src"), col("dst")) &&
          col("med") === struct(col("src"), col("dst")))
        .select(col("src"), col("dst"), lit(r.toLong).as("round"))
    }
    def peel(edg: DataFrame, w: DataFrame): DataFrame = {
      val mnodes = w.select(col("src").as("node"))
        .union(w.select(col("dst").as("node")))
      edg.join(mnodes.select(col("node").as("src")), Seq("src"), "left_anti")
        .join(mnodes.select(col("node").as("dst")), Seq("dst"), "left_anti")
        .select(col("src"), col("dst"))
    }
    while (!done && round < maxRounds) {
      // TWO waves per materialization set (the topoLayers batching:
      // wave 2 matches wave 1's lazy residue — identical matching,
      // half the write jobs; the round column carries both waves'
      // convergence counts through the one write)
      val batched = round + 1 < maxRounds
      val (win, n1, n2, winPath) = if (batched) {
        val w1 = waveM(e, round)
        val w2 = waveM(peel(e, w1), round + 1)
        val (both, wm, p) = Scratch.materializeObservedAt(
          w1.unionByName(w2), "match_round",
          count(when(col("round") === round.toLong, 1)).as("n1"),
          count(when(col("round") === (round + 1).toLong, 1)).as("n2"))
        (both, wm("n1").asInstanceOf[Long], wm("n2").asInstanceOf[Long], p)
      } else {
        val (w, wm, p) = Scratch.materializeObservedAt(
          waveM(e, round), "match_round", count(lit(1)).as("n"))
        (w, wm("n").asInstanceOf[Long], -1L, p)
      }
      if (n1 == 0L) {
        Scratch.drop(spark, winPath)
        // a nonempty edge set always has a both-ends-minimal edge, so
        // an idle wave 1 means no edges remained
        residual = 0L
        done = true
      } else {
        matched += win
        val (e2, em, e2Path) = Scratch.materializeObservedAt(
          peel(e, win), "match_edges", count(lit(1)).as("n"))
        Scratch.drop(spark, ePath)
        e = e2; ePath = e2Path
        residual = em("n").asInstanceOf[Long]
        if (residual == 0L || (batched && n2 == 0L)) done = true
        round += (if (batched) 2 else 1)
      }
    }
    val matchedAll = matched.reduceOption(_.unionByName(_)).getOrElse(
      e.select(col("src"), col("dst"), lit(0L).as("round")).filter(lit(false)))
    if (!done && residual > 0L)
      // bound exhausted with edges remaining: the residual rides along
      // with a null round so non-maximality is never silent
      matchedAll.unionByName(
        e.select(col("src"), col("dst"), lit(null).cast("long").as("round")))
    else matchedAll
  }

  /** Per-edge triangle support over a scratch-backed canonical edge
    * table: for each edge (a, b), how many triangles contain it
    * (= |N(a)∩N(b)|). The [[triangleCount]] degree-oriented wedge
    * enumeration — each triangle found exactly once, per-node wedge
    * fanout O(√m) on power-law graphs — then each triangle credits its
    * THREE canonical edges via one explode + keyed count. Returns the
    * support frame and the oriented scratch table's path (the frame's
    * plan reads it; the caller retires it after consuming). */
  private def edgeSupport(e: DataFrame): (DataFrame, String) = {
    import graft.ops.Scratch
    val deg = degrees(e)
    def ord(degC: Column, idC: Column): Column = struct(degC, idC)
    val withDeg = e
      .join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "sdeg"), Seq("src"))
      .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "ddeg"), Seq("dst"))
    val flip = ord(col("sdeg"), col("src")) < ord(col("ddeg"), col("dst"))
    val (o, oPath) = Scratch.materializeAt(
      withDeg.select(
        when(flip, col("src")).otherwise(col("dst")).as("u"),
        when(flip, col("dst")).otherwise(col("src")).as("v"),
        when(flip, col("ddeg")).otherwise(col("sdeg")).as("vdeg")),
      "truss_oriented")
    val w1 = o.select(col("u"), col("v").as("v1"), col("vdeg").as("v1deg"))
    val w2 = o.select(col("u"), col("v").as("v2"), col("vdeg").as("v2deg"))
    val tri = w1.join(w2, Seq("u"))
      .filter(ord(col("v1deg"), col("v1")) < ord(col("v2deg"), col("v2")))
      .join(o.select(col("u").as("v1"), col("v").as("v2")), Seq("v1", "v2"))
    val support = tri.select(explode(array(
        struct(least(col("u"), col("v1")).as("src"),
          greatest(col("u"), col("v1")).as("dst")),
        struct(least(col("u"), col("v2")).as("src"),
          greatest(col("u"), col("v2")).as("dst")),
        struct(least(col("v1"), col("v2")).as("src"),
          greatest(col("v1"), col("v2")).as("dst")))).as("edge"))
      .select(col("edge.src").as("src"), col("edge.dst").as("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("support"))
    (support, oPath)
  }

  /**
   * k-truss subgraph (Cohen 2008; the GDS k-truss decomposition for a
   * fixed k): peel edges supported by fewer than k−2 triangles,
   * recompute, repeat until fixpoint — the edge-level strengthening of
   * [[kCore]] (every k-truss edge sits in a (k−1)-core, but trussness
   * demands the triangles actually close). Returns the surviving edges
   * with their within-truss support (all ≥ k−2).
   *
   * Loop discipline matches [[kCore]]: each round materializes the
   * surviving edge set with the OBSERVED edge count riding the write;
   * stops when the count stops shrinking (peeling is monotone),
   * `maxRounds` as the runaway backstop. Per round: the degree-oriented
   * triangle enumeration (each triangle once, wedge fanout O(√m) per
   * node), one explode (3 rows per triangle), two keyed aggregates —
   * no windows, no driver iteration, constant-size plans. Peeling is
   * idempotent past the fixpoint (the unrolled-round oracle contract).
   */
  def kTruss(edges: DataFrame, k: Int, maxRounds: Int = 30,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    import graft.ops.Scratch
    require(k >= 3, "k must be >= 3")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges.sparkSession
    val minSup = (k - 2).toLong
    var (e, em, ePath) = Scratch.materializeObservedAt(
      canonicalEdges(edges), "truss_edges", count(lit(1)).as("n"))
    var n = em("n").asInstanceOf[Long]
    // observed-gated driver-local peel (the kCoreLocal switchover):
    // per-edge support is the all-integer triangle count |N(u)∩N(v)|,
    // the peel and round cap replicate exactly, so the local replay is
    // value-exact; each distributed round's wedge-join + two observed
    // writes collapse to in-memory set intersections. Round 13 measured
    // the per-round fanOutByKey variant a net LOSS here (shrinking peel
    // rounds); the local replay removes the rounds altogether.
    val trussCap = localEdgeCap(spark, maxLocalEdges)
    if (trussCap > 0 && n <= trussCap &&
        e.schema("src").dataType == org.apache.spark.sql.types.LongType) {
      val result = kTrussLocal(collectEdgePairs(e), minSup, maxRounds)
      Scratch.drop(spark, ePath)
      val rows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(result.map { case (s, d, sup) =>
          org.apache.spark.sql.Row(s, d, sup)
        }: _*)
      return spark.createDataFrame(rows,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("src",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("dst",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("support",
            org.apache.spark.sql.types.LongType, nullable = false))))
    }
    var rounds = 0
    var converged = n == 0L
    while (!converged && rounds < maxRounds) {
      val (sup, oPath) = edgeSupport(e)
      val (e2, m2, p2) = Scratch.materializeObservedAt(
        e.join(sup, Seq("src", "dst"), "left")
          .filter(coalesce(col("support"), lit(0L)) >= minSup)
          .select(col("src"), col("dst")),
        "truss_edges", count(lit(1)).as("n"))
      val n2 = m2("n").asInstanceOf[Long]
      Scratch.drop(spark, ePath)
      Scratch.drop(spark, oPath)
      e = e2; ePath = p2
      converged = n2 == n || n2 == 0L
      n = n2
      rounds += 1
    }
    // final support over the fixpoint subgraph; its oriented table (and
    // the final edge table) back the returned plan — session shutdown
    // reclaims them
    val (sup, _) = edgeSupport(e)
    e.join(sup, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"),
        coalesce(col("support"), lit(0L)).as("support"))
  }

  /**
   * Hop-bounded weighted single-source shortest paths (the GDS
   * Dijkstra/δ-stepping surface, in the deterministic bounded-relaxation
   * form a synchronous engine oracle-checks): `maxHops` Bellman-Ford
   * rounds over the symmetrized weighted graph from `sourceExpr`'s
   * nodes, i.e. the exact shortest distance among paths of <= maxHops
   * edges. With maxHops >= the graph's (weighted-path) hop diameter
   * this IS the shortest-path distance; the hop bound is the documented
   * semantic, not an approximation knob — the same fixed-iteration
   * contract as [[pageRank]]'s `iters`.
   *
   * Each relaxation round is one equi-join (adjacency x current
   * distances) plus a min aggregate, materialized as a scratch table —
   * constant-size plans, superseded tables retired eagerly. Weights
   * default to 1.0 (hop counting); integer-valued weights keep the
   * distance sums bit-exact cross-engine (doubles below 2^53).
   * Unreached nodes are absent from the output.
   *
   * `directed = true` relaxes along edge direction only (parallel
   * edges still sum their weights, matching the undirected
   * canonicalization) — the one-way road network / DAG cost form of
   * the same min-plus rounds.
   */
  def shortestPaths(
      edges: DataFrame,
      sources: DataFrame,
      maxHops: Int = 4,
      weightCol: Option[String] = None,
      directed: Boolean = false): DataFrame = {
    import graft.ops.Scratch
    require(maxHops >= 1, "maxHops must be >= 1")
    val spark = edges.sparkSession
    val e0 = (weightCol, directed) match {
      case (None, false) =>
        canonicalEdges(edges).withColumn("w", lit(1.0d))
      case (None, true) =>
        edges.filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst")).distinct()
          .withColumn("w", lit(1.0d))
      case (Some(wc), false) =>
        edges.filter(col("src") =!= col("dst"))
          .groupBy(least(col("src"), col("dst")).as("src"),
            greatest(col("src"), col("dst")).as("dst"))
          .agg(sum(col(wc).cast("double")).as("w"))
          .filter(col("w") > 0.0d)
      case (Some(wc), true) =>
        edges.filter(col("src") =!= col("dst"))
          .groupBy(col("src"), col("dst"))
          .agg(sum(col(wc).cast("double")).as("w"))
          .filter(col("w") > 0.0d)
    }
    val adjBase = e0.select(col("src"), col("dst"), col("w"))
    val (adj, adjPath) = Scratch.materializeAt(
      if (directed) adjBase
      else adjBase.union(
        e0.select(col("dst").as("src"), col("src").as("dst"), col("w"))),
      "sssp_adj")
    var dist = sources.select(col(sources.columns.head).as("node"))
      .distinct().withColumn("dist", lit(0.0d))
    var distPath: String = null
    for (_ <- 1 to maxHops) {
      val relaxed = adj.join(dist, adj("src") === dist("node"))
        .select(adj("dst").as("node"), (dist("dist") + adj("w")).as("d"))
      val (next, nextPath) = Scratch.materializeAt(
        dist.select(col("node"), col("dist").as("d"))
          .union(relaxed)
          .groupBy(col("node")).agg(min(col("d")).as("dist")),
        "sssp_dist")
      if (distPath != null) Scratch.drop(spark, distPath)
      dist = next
      distPath = nextPath
    }
    Scratch.drop(spark, adjPath)
    dist
  }

  /**
   * Node similarity (the GDS-flagship link-analysis measure the
   * reference's destination system runs on loaded graphs): neighbor-set
   * similarity for every pair sharing at least one neighbor, top `k` by
   * (similarity desc, pair id). `metric` picks the GDS similarity
   * function — "jaccard" (common/union), "overlap" (common/min degree),
   * or "cosine" (common/√(deg·deg) — sqrt is IEEE-correctly-rounded, so
   * even this stays bit-reproducible cross-engine). All three compute
   * entirely from the wedge counts: |N(a)∩N(b)| is the common-neighbor
   * count and |N(a)∪N(b)| = deg(a)+deg(b)−common, so the plan is the
   * guarded wedge join plus two degree equi-joins — no set arrays ever
   * ship. Same enforced `maxDegree` contract as [[commonNeighborsTopK]].
   */
  def nodeSimilarityTopK(
      edges: DataFrame,
      k: Int = 10,
      maxDegree: Long = 100000,
      metric: String = "jaccard"): DataFrame = {
    import graft.ops.Scratch
    val e = Scratch.materialize(canonicalEdges(edges), "ns_edges")
    // fanOutByKey(n) — see Par.fanOutByKey: the wedge expansion must
    // not run at the 1–2-task parallelism AQE's byte-based coalescing
    // gives a byte-small adjacency; keyed aggregates on n reuse it
    val adj0 = graft.ops.Par.fanOutByKey(
      e.select(col("src").as("n"), col("dst").as("x"))
        .union(e.select(col("dst").as("n"), col("src").as("x"))), col("n"))
    val deg = adj0.groupBy(col("n")).agg(count(lit(1)).as("d"))
    val adj = Blocks.guardBlockSize(adj0, "n", maxDegree,
      "nodeSimilarityTopK",
      hint = "the wedge fanout is quadratic in node degree - truncate "
        + "per-node adjacency upstream or raise maxDegree deliberately",
      boundName = "maxDegree")
    val a1 = adj.select(col("n"), col("x").as("a"))
    val a2 = adj.select(col("n"), col("x").as("b"))
    val denom: Column = metric match {
      case "jaccard" => (col("da") + col("db") - col("common")).cast("double")
      case "overlap" => least(col("da"), col("db")).cast("double")
      case "cosine" => sqrt((col("da") * col("db")).cast("double"))
      case other => throw new IllegalArgumentException(
        s"unknown metric '$other' (jaccard | overlap | cosine)")
    }
    a1.join(a2, Seq("n")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"))
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(col("a"), col("b"),
        round(col("common").cast("double") / denom, 6).as("similarity"))
      .orderBy(col("similarity").desc, col("a"), col("b"))
      .limit(k)
  }

  /**
   * Common-neighbors link prediction: for node pairs NOT already joined
   * by an edge, count shared neighbors; emit the top `k` candidate pairs
   * (cnt desc, then pair id — deterministic). The wedge join is the same
   * shape as triangleCount's; the anti-join removes existing edges.
   *
   * The wedge self-join fans out deg(n)² pairs per node — exact common
   * neighbors inherently enumerates wedges, so the scale contract is
   * ENFORCED, not assumed: any node whose degree exceeds `maxDegree`
   * fails the query fast with the node, its degree, and the escape
   * routes (truncate the adjacency upstream, or raise the bound
   * knowingly). On a power-law graph at 100×, one 10M-degree hub would
   * otherwise mint ~10¹⁴ wedge rows; with the guard the job dies in the
   * first shuffle instead of running for days. The guard is the
   * `Blocks.guardBlockSize` pattern over the wedge key itself: one
   * cheap keyed count re-joined on the key the self-join shuffles by
   * anyway.
   */
  def commonNeighborsTopK(
      edges: DataFrame,
      k: Int = 10,
      maxDegree: Long = 100000): DataFrame = {
    import graft.ops.Scratch
    // the scratch edge table backs the returned lazy plan (read three
    // times by it); session shutdown reclaims it.
    val e = Scratch.materialize(canonicalEdges(edges), "cn_edges")
    // fanOutByKey(n) — see Par.fanOutByKey: the wedge expansion must
    // not run at the 1–2-task parallelism AQE's byte-based coalescing
    // gives a byte-small adjacency; keyed aggregates on n reuse it
    val adj0 = graft.ops.Par.fanOutByKey(
      e.select(col("src").as("n"), col("dst").as("x"))
        .union(e.select(col("dst").as("n"), col("src").as("x"))), col("n"))
    val adj = Blocks.guardBlockSize(adj0, "n", maxDegree,
      "commonNeighborsTopK",
      hint = "the wedge fanout is quadratic in node degree - truncate "
        + "per-node adjacency upstream or raise maxDegree deliberately",
      boundName = "maxDegree")
    val a1 = adj.select(col("n"), col("x").as("a"))
    val a2 = adj.select(col("n"), col("x").as("b"))
    a1.join(a2, Seq("n")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"))
      .join(e, col("a") === e("src") && col("b") === e("dst"), "left_anti")
      .orderBy(col("common").desc, col("a"), col("b"))
      .limit(k)
  }

  /**
   * Adamic-Adar link prediction (the GDS link-prediction scorer next to
   * common neighbors): for node pairs NOT already joined by an edge,
   * score = Σ over shared neighbors n of 1/ln(deg(n)) — rare shared
   * neighbors count more than hubs. Top `k` by (score desc, pair id).
   *
   * Determinism contract: each per-neighbor term is rounded to 9 dp and
   * summed as DECIMAL(18,9) — summation-order-exact, so the score is
   * bit-identical regardless of shuffle order; the final cast to double
   * is a deterministic conversion of that exact decimal. Wedge centers
   * need deg >= 2 (a single-neighbor node forms no wedge), so ln is
   * always positive.
   *
   * Scale shape: identical to [[commonNeighborsTopK]] — the wedge
   * self-join with the ENFORCED `maxDegree` contract, one extra degree
   * equi-join to weight the wedge center, anti-join to drop existing
   * edges. No set arrays ship; nothing is broadcast but the guard
   * counts.
   */
  def adamicAdarTopK(
      edges: DataFrame,
      k: Int = 10,
      maxDegree: Long = 100000): DataFrame = {
    import graft.ops.Scratch
    // backs the returned lazy plan (read three times); session
    // shutdown reclaims it.
    val e = Scratch.materialize(canonicalEdges(edges), "aa_edges")
    // fanOutByKey(n) — see Par.fanOutByKey: the wedge expansion below
    // must not run at the 1–2-task parallelism AQE's byte-based
    // coalescing gives a byte-small adjacency (no-op on well-split
    // inputs); the keyed aggregates on n reuse the pinned exchange
    val adj0 = graft.ops.Par.fanOutByKey(
      e.select(col("src").as("n"), col("dst").as("x"))
        .union(e.select(col("dst").as("n"), col("src").as("x"))), col("n"))
    val deg = adj0.groupBy(col("n")).agg(count(lit(1)).as("d"))
    val adj = Blocks.guardBlockSize(adj0, "n", maxDegree,
      "adamicAdarTopK",
      hint = "the wedge fanout is quadratic in node degree - truncate "
        + "per-node adjacency upstream or raise maxDegree deliberately",
      boundName = "maxDegree")
    val wadj = adj.join(deg, Seq("n")).filter(col("d") >= 2)
      .select(col("n"), col("x"),
        round(lit(1.0d) / log(col("d").cast("double")), 9)
          .cast("decimal(18,9)").as("aa"))
    val a1 = wadj.select(col("n"), col("x").as("a"), col("aa"))
    val a2 = wadj.select(col("n"), col("x").as("b"))
    a1.join(a2, Seq("n")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("aa")).as("s"))
      .join(e, col("a") === e("src") && col("b") === e("dst"), "left_anti")
      .select(col("a"), col("b"), col("s").cast("double").as("score"))
      .orderBy(col("score").desc, col("a"), col("b"))
      .limit(k)
  }

  /**
   * Hop-bounded harmonic centrality (the GDS closeness/harmonic
   * centrality surface, in its deterministic oracle-able form): for
   * every scored node s, Σ over nodes t reachable within `maxHops` of
   * 1/dist(s,t). Harmonic (not classic closeness) because it is
   * well-defined on disconnected graphs — unreachable pairs contribute
   * 0 rather than poisoning the mean. With maxHops >= the graph's hop
   * diameter this IS exact harmonic centrality; the hop bound is the
   * documented semantic (the [[shortestPaths]] contract).
   *
   * `sources` picks WHICH nodes get scored (None = all). Scores are
   * EXACT per scored node either way — the dial trades coverage, not
   * correctness. This is the primary scale lever: the frontier table
   * holds one row per (source, reached-node) pair, i.e.
   * Σ_s |maxHops-hop ball of s| rows, and on a dense graph the 3-hop
   * ball is the whole component — all-sources exact harmonic is
   * inherently Θ(V·V) there (measured: 5k-node avg-degree-100
   * co-purchase graph → ~25M frontier rows and a billions-row hop-3
   * expansion). Scoring a deterministic landmark sample (the published
   * practice for centrality at scale — pivot/landmark estimation) keeps
   * the frontier at |S|·|ball| flat scratch-table rows across the
   * cluster, never per-task state.
   *
   * Each round is one equi-join (adjacency × frontier, keyed shuffle)
   * plus a (source, node) min-aggregate, materialized as a scratch
   * table — constant-size plans, superseded tables retired eagerly.
   * Determinism: per-pair terms 1/d for integer d are exact IEEE
   * divisions, rounded to 9 dp and summed as DECIMAL(18,9) —
   * summation-order-exact — then cast to double.
   */
  def harmonicCentrality(
      edges: DataFrame,
      maxHops: Int = 3,
      sources: Option[DataFrame] = None,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val spark = edges.sparkSession
    val (adj, nAdj, adjPath) = symAdjacency(edges, "harm")
    tryLocalBalls(adj, nAdj, sources, maxLocalEdges) match {
      case Some(g) =>
        // driver-local replay: Σ over reached t of the SAME 9-dp term
        // under an exact decimal sum, one accumulator per source —
        // never a ball table (see tryLocalBalls)
        graft.ops.Scratch.drop(spark, adjPath)
        val dist = Array.fill(g.ids.length)(-1)
        val rows: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList(g.seeds.map { s =>
            val order = localBfs(g, s, maxHops, dist)
            var acc = java.math.BigDecimal.ZERO
            order.foreach { v =>
              if (dist(v) > 0)
                acc = acc.add(decTerm(roundD(1.0d / dist(v), 9), 9))
            }
            order.foreach(dist(_) = -1)
            org.apache.spark.sql.Row(g.ids(s), acc.doubleValue)
          }: _*)
        spark.createDataFrame(rows,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("centrality",
              org.apache.spark.sql.types.DoubleType, nullable = true))))
      case None =>
        val dist = bfsDistances(adj, maxHops, sources, "harm")
        graft.ops.Scratch.drop(spark, adjPath)
        dist.filter(col("dist") > 0)
          .groupBy(col("s").as("node"))
          .agg(sum(round(lit(1.0d) / col("dist"), 9).cast("decimal(18,9)"))
            .cast("double").as("centrality"))
    }
  }

  /**
   * Hop-bounded CLOSENESS centrality (the other GDS closeness surface
   * next to [[harmonicCentrality]]): for each scored node s,
   * (reached−1) / Σ dist(s, t) over the nodes t reached within
   * `maxHops` — the classic inverse-farness form, computed over the
   * reachable ball so disconnected graphs stay well-defined (the same
   * convention GDS itself applies). Integer count and distance sums are
   * bit-exact cross-engine; the one division is 6-dp-rounded. Same BFS
   * engine, `sources` landmark dial, and scratch-table round discipline
   * as [[harmonicCentrality]].
   */
  def closenessCentrality(
      edges: DataFrame,
      maxHops: Int = 3,
      sources: Option[DataFrame] = None,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val spark = edges.sparkSession
    val (adj, nAdj, adjPath) = symAdjacency(edges, "close")
    tryLocalBalls(adj, nAdj, sources, maxLocalEdges) match {
      case Some(g) =>
        // driver-local replay: integer reached/dist sums + the same
        // one 6-dp division — bit-exact by construction
        graft.ops.Scratch.drop(spark, adjPath)
        val dist = Array.fill(g.ids.length)(-1)
        val rows: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList(g.seeds.map { s =>
            val order = localBfs(g, s, maxHops, dist)
            var reached = 0L
            var sumDist = 0L
            order.foreach { v =>
              if (dist(v) > 0) { reached += 1L; sumDist += dist(v) }
            }
            order.foreach(dist(_) = -1)
            org.apache.spark.sql.Row(g.ids(s), reached,
              roundD(reached.toDouble / sumDist.toDouble, 6))
          }: _*)
        spark.createDataFrame(rows,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("reached",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("closeness",
              org.apache.spark.sql.types.DoubleType, nullable = true))))
      case None =>
        val dist = bfsDistances(adj, maxHops, sources, "close")
        graft.ops.Scratch.drop(spark, adjPath)
        dist.filter(col("dist") > 0)
          .groupBy(col("s").as("node"))
          .agg(count(lit(1)).as("reached"),
            sum(col("dist")).cast("long").as("sum_dist"))
          .select(col("node"), col("reached"),
            round(col("reached").cast("double") / col("sum_dist").cast("double"), 6)
              .as("closeness"))
    }
  }

  /**
   * Hop-bounded BETWEENNESS centrality via Brandes dependency
   * accumulation (Brandes 2001) from a sampled source set — the GDS
   * betweenness surface in its deterministic, oracle-able form. For
   * each source s, the forward pass computes shortest-path distances
   * (the shared BFS) and path counts σ(s,v) level by level; the
   * backward pass accumulates dependencies
   *
   *   δ(s,v) = Σ over successors w of (σ(s,v)/σ(s,w)) · (1 + δ(s,w))
   *
   * from the deepest level down, and the score of v is Σ_s δ(s,v) —
   * how much of the sampled shortest-path traffic flows THROUGH v.
   * Source sampling (the Brandes–Pich pivot estimator) is the published
   * scale practice: exact per sampled source, coverage-for-cost —
   * all-sources exact betweenness is inherently Θ(V·E). The hop bound
   * is the [[shortestPaths]] contract (k-bounded betweenness); with
   * maxHops ≥ the diameter and all sources it IS exact Brandes (up to
   * the undirected double count — each unordered pair contributes from
   * both endpoints when both are sampled, the standard raw form).
   *
   * Determinism: σ is an integer count (exact in doubles far below
   * 2^53); each δ term is 9-dp-rounded and summed as DECIMAL(28,12)
   * (summation-order-exact), as is the final per-node sum, 6-dp output.
   *
   * Scale shape: maxHops frontier-incremental forward rounds (σ rides
   * the BFS — distances and path counts in one loop, each (s, node)
   * pair expanded exactly once) plus maxHops backward δ rounds, each
   * one adjacency×level equi-join and a (s, node) keyed aggregate —
   * flat rows across the cluster, no per-task state, no windows;
   * per-level δ tables back the plan and are reclaimed at session
   * shutdown.
   */
  def betweennessCentrality(
      edges: DataFrame,
      maxHops: Int = 3,
      sources: Option[DataFrame] = None,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    import graft.ops.Scratch
    require(maxHops >= 1, "maxHops must be >= 1")
    val spark = edges.sparkSession
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val (adj, nAdj, adjPath) = symAdjacency(edges, "btw")
    tryLocalBalls(adj, nAdj, sources, maxLocalEdges) match {
      case Some(g) =>
        // driver-local Brandes replay: per source, forward BFS with
        // integer σ then backward δ levels using the SAME IEEE term
        // (1/σw)·(1+δw), the same 9-dp round, and the same order-exact
        // decimal sums as the distributed plan — state is O(V + E) per
        // source, never a ball table
        Scratch.drop(spark, adjPath)
        return betweennessLocal(spark, g, maxHops)
      case None => ()
    }
    // forward pass: distances AND path counts in ONE frontier-
    // incremental loop (σ rides the BFS — every shortest path to a
    // first-discovered node enters through the previous level); each
    // per-level σ table below is a filtered scan of the one result,
    // not a separate materialization
    val tbl = bfsSigma(adj, maxHops, sources, "btw")
    def sigma(h: Int): DataFrame =
      tbl.filter(col("dist") === h).select(col("s"), col("node"), col("sigma"))
    // backward: δ at the deepest level is 0; each level pulls from the
    // one below through the same adjacency (the level keys make the
    // join predecessor-only). A node with no successors keeps δ = 0 —
    // the LEFT join — because it still forwards the bare σ-ratio term
    // to ITS predecessors on the next round. Terms 9-dp-rounded under
    // a DECIMAL sum — summation-order-exact.
    val deltas = new scala.collection.mutable.ArrayBuffer[DataFrame]
    var below = sigma(maxHops).withColumn("delta", lit(0.0d))
    for (h <- maxHops - 1 to 0 by -1) {
      val fromBelow = adj.join(below, adj("dst") === below("node"))
        .select(col("s"), adj("src").as("node"),
          col("sigma").as("sig_w"), col("delta").as("del_w"))
        .groupBy(col("s"), col("node"))
        .agg(sum(round(lit(1.0d) / col("sig_w").cast("double")
          * (lit(1.0d) + col("del_w")), 9).cast(dec)).as("dep"))
      val cur = Scratch.materialize(
        sigma(h).join(fromBelow, Seq("s", "node"), "left")
          .select(col("s"), col("node"), col("sigma"),
            round(col("sigma").cast("double")
              * coalesce(col("dep").cast("double"), lit(0.0d)), 9).as("delta")),
        s"btw_del$h")
      deltas += cur
      below = cur
    }
    // score(v) = Σ_s δ(s, v), source endpoints excluded (δ at the
    // source is accumulated but a node is not "between" for itself)
    Scratch.drop(spark, adjPath) // δ/σ scratch backs the plan; adj done
    deltas.map(_.filter(col("node") =!= col("s"))
      .select(col("node"), col("delta")))
      .reduce(_ union _)
      .groupBy(col("node"))
      .agg(round(sum(col("delta").cast(dec)).cast("double"), 6).as("betweenness"))
  }

  /** Driver-local Brandes for [[betweennessCentrality]]'s gated fast
    * path: replays the distributed plan's arithmetic term for term —
    * integer σ summed along the BFS levels, backward dependency
    * dep(v) = Σ_{w ∈ N(v), dist(w)=h+1} round9((1/σw)·(1+δw)) under an
    * exact DECIMAL(·,12) sum, δ(v) = round9(σv · dep), per-node scores
    * as order-exact decimal sums of the 9-dp δ terms, 6-dp output. A
    * node appears in the output iff it sits in some source's ball at a
    * level BELOW maxHops (deepest-level nodes carry δ = 0 and emit no
    * row), exactly like the distributed per-level delta union. */
  private def betweennessLocal(
      spark: org.apache.spark.sql.SparkSession,
      g: LocalBalls,
      maxHops: Int): DataFrame = {
    val n = g.ids.length
    val dist = Array.fill(n)(-1)
    val sigma = new Array[Long](n)
    val delta = new Array[Double](n)
    val score = new java.util.HashMap[Int, java.math.BigDecimal]()
    g.seeds.foreach { s =>
      // forward: level-synchronous BFS; σw sums every level-(h-1)
      // predecessor's σ (first discovery seeds it, re-discovery at the
      // same level adds — the distributed keyed sum)
      sigma(s) = 1L
      val order = scala.collection.mutable.ArrayBuffer[Int](s)
      dist(s) = 0
      var lo = 0
      while (lo < order.length) {
        val v = order(lo); lo += 1
        if (dist(v) < maxHops) {
          val ns = g.adj(v)
          var i = 0
          while (i < ns.length) {
            val w = ns(i)
            if (dist(w) < 0) {
              dist(w) = dist(v) + 1; sigma(w) = sigma(v); order += w
            } else if (dist(w) == dist(v) + 1) {
              sigma(w) += sigma(v)
            }
            i += 1
          }
        }
      }
      // backward: δ levels from maxHops-1 down; δ at maxHops stays 0
      val byLevel = order.groupBy(dist(_))
      for (h <- maxHops - 1 to 0 by -1) {
        byLevel.getOrElse(h, Nil).foreach { v =>
          var dep = java.math.BigDecimal.ZERO
          val ns = g.adj(v)
          var i = 0
          while (i < ns.length) {
            val w = ns(i)
            if (dist(w) == h + 1)
              dep = dep.add(decTerm(
                roundD(1.0d / sigma(w).toDouble * (1.0d + delta(w)), 9), 12))
            i += 1
          }
          delta(v) = roundD(sigma(v).toDouble * dep.doubleValue, 9)
          if (v != s) {
            val prev = score.getOrDefault(v, java.math.BigDecimal.ZERO)
            score.put(v, prev.add(decTerm(delta(v), 12)))
          }
        }
      }
      order.foreach { v => dist(v) = -1; sigma(v) = 0L; delta(v) = 0.0d }
    }
    val keys = score.keySet().toArray(Array.empty[Integer]).map(_.intValue).sorted
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(keys.map { v =>
        org.apache.spark.sql.Row(g.ids(v),
          roundD(score.get(v).doubleValue, 6))
      }: _*)
    spark.createDataFrame(rows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("betweenness",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
  }

  /** Materialize the symmetrized adjacency of the landmark-BFS family
    * with its row count OBSERVED on the write — the count gates the
    * driver-local ball engine ([[tryLocalBalls]]); the caller retires
    * the path. */
  private def symAdjacency(
      edges: DataFrame, prefix: String): (DataFrame, Long, String) = {
    import graft.ops.Scratch
    val e0 = canonicalEdges(edges)
    val (adj, am, path) = Scratch.materializeObservedAt(
      e0.select(col("src"), col("dst"))
        .union(e0.select(col("dst").as("src"), col("src").as("dst"))),
      s"${prefix}_adj", count(lit(1)).as("n"))
    (adj, am("n").asInstanceOf[Long], path)
  }

  /** Driver-local rendition of the landmark-ball family's graph:
    * int-indexed adjacency (both directions present, mirroring the
    * symmetrized scratch table row for row) + the seed indexes. */
  private final case class LocalBalls(
      ids: Array[Long], adj: Array[Array[Int]], seeds: Array[Int])

  /** Observed-gated driver-local switchover for the landmark-ball
    * family (harmonic / closeness / distance-distribution /
    * betweenness) — the peel/louvain fast-path discipline applied to
    * the shared BFS engine, with the round-10 negative result designed
    * OUT: that attempt materialized the |S|·|ball| (s, node, dist)
    * table as a driver LocalRelation (millions of rows at sf0.1 —
    * measured REGRESSION, reverted, STATUS.md). Here NO ball ever
    * materializes: each source's BFS accumulates straight into
    * node-sized sums, so driver state stays O(V + E) — exactly the
    * peel paths' footprint — and the collect is bounded by the
    * OBSERVED adjacency row count, never by hope.
    *
    * Gate: adjacency rows ≤ the [[localEdgeCap]] (conf-overridable,
    * 0 disables), Long ids, an EXPLICIT landmark frame (`sources` =
    * None keeps the distributed loop — all-sources on a dense graph is
    * the documented Θ(V·V) ball regime either way), ≤ 100k seeds, and
    * a |S|·|adj| work budget so a large landmark set on a near-cap
    * graph cannot pin the driver for minutes single-threaded. */
  private def tryLocalBalls(
      adjDf: DataFrame,
      nAdj: Long,
      sources: Option[DataFrame],
      maxLocalEdges: Long): Option[LocalBalls] = {
    val spark = adjDf.sparkSession
    val cap = localEdgeCap(spark, maxLocalEdges)
    if (cap <= 0 || nAdj > cap || sources.isEmpty ||
        adjDf.schema("src").dataType != org.apache.spark.sql.types.LongType)
      return None
    val src = sources.get
    val seeds0 = src.select(col(src.columns.head).as("s")).distinct()
    if (seeds0.schema("s").dataType != org.apache.spark.sql.types.LongType)
      return None
    val seedCap = 100000
    val seedArr = seeds0.limit(seedCap + 1).collect().map(_.getLong(0))
    if (seedArr.length > seedCap) return None
    if (seedArr.length.toLong * nAdj > 512000000L) return None
    val (ids, adj, idx) = indexPairs(collectEdgePairs(adjDf))
    // landmark ids absent from the graph drop (no edges → no ball),
    // matching the distributed seed semi-join; sorted for reproducible
    // processing order (the sums are order-exact regardless)
    val seeds = seedArr.filter(idx.containsKey(_)).sorted.map(idx.get(_))
    Some(LocalBalls(ids, adj, seeds))
  }

  /** Int-index a collected (src, dst) pair table: (sorted node ids,
    * out-adjacency arrays mirroring the pairs row for row, id→index). */
  private def indexPairs(pairs: Array[(Long, Long)])
      : (Array[Long], Array[Array[Int]], java.util.HashMap[Long, Int]) = {
    val ids = pairs.flatMap(p => Array(p._1, p._2)).distinct.sorted
    val idx = new java.util.HashMap[Long, Int](ids.length * 2)
    ids.zipWithIndex.foreach { case (id, i) => idx.put(id, i) }
    val deg = new Array[Int](ids.length)
    pairs.foreach { case (a, _) => deg(idx.get(a)) += 1 }
    val adj = Array.tabulate(ids.length)(i => new Array[Int](deg(i)))
    val fill = new Array[Int](ids.length)
    pairs.foreach { case (a, b) =>
      val i = idx.get(a); adj(i)(fill(i)) = idx.get(b); fill(i) += 1
    }
    (ids, adj, idx)
  }

  /** Observed-gated driver-local collect of a (src, dst) pair scratch
    * for the power-iteration replays (eigenvector / HITS / Katz): the
    * [[tryLocalBalls]] gate minus the landmark dial — the iteration
    * count bounds the work, so only the pair count and Long ids gate.
    * State is O(V + E); nothing O(iterations·E) ever materializes. */
  private def tryLocalPairs(
      adjDf: DataFrame,
      nPairs: Long,
      maxLocalEdges: Long): Option[(Array[Long], Array[Array[Int]])] = {
    val cap = localEdgeCap(adjDf.sparkSession, maxLocalEdges)
    if (cap <= 0 || nPairs > cap ||
        adjDf.schema("src").dataType != org.apache.spark.sql.types.LongType)
      return None
    val (ids, adj, _) = indexPairs(collectEdgePairs(adjDf))
    Some((ids, adj))
  }

  /** Driver-local synchronous LPA replay for [[labelPropagation]]'s
    * gated fast path: Long vote tallies (exactly the distributed
    * double sums — the gate proved every weight integer-valued and the
    * total under 2^52), max-vote then min-label tie-break per round,
    * every adjacency node relabeled each round (sym adjacency ⇒ every
    * node receives votes). */
  private def lpaLocal(
      spark: org.apache.spark.sql.SparkSession,
      triples: Array[(Long, Long, Double)],
      rounds: Int): DataFrame = {
    val (ids, _, idx) = indexPairs(triples.map(t => (t._1, t._2)))
    val n = ids.length
    val srcI = new Array[Int](triples.length)
    val dstI = new Array[Int](triples.length)
    val wL = new Array[Long](triples.length)
    var i = 0
    while (i < triples.length) {
      srcI(i) = idx.get(triples(i)._1)
      dstI(i) = idx.get(triples(i)._2)
      wL(i) = triples(i)._3.toLong
      i += 1
    }
    var label = Array.tabulate(n)(v => ids(v))
    for (_ <- 1 to rounds) {
      // per-node vote histogram: label -> summed weight
      val votes = Array.fill(n)(
        new java.util.HashMap[java.lang.Long, java.lang.Long]())
      var e = 0
      while (e < triples.length) {
        val node = srcI(e)
        val l = java.lang.Long.valueOf(label(dstI(e)))
        val m = votes(node)
        val prev = m.get(l)
        m.put(l, if (prev == null) wL(e) else prev + wL(e))
        e += 1
      }
      val next = new Array[Long](n)
      var v = 0
      while (v < n) {
        val m = votes(v)
        if (m.isEmpty) next(v) = label(v) // unreachable under sym adj
        else {
          var mc = Long.MinValue
          var ml = Long.MaxValue
          val it = m.entrySet().iterator()
          while (it.hasNext) {
            val en = it.next()
            val c = en.getValue.longValue
            val l = en.getKey.longValue
            if (c > mc || (c == mc && l < ml)) {
              if (c > mc) { mc = c; ml = l }
              else if (l < ml) ml = l
            }
          }
          next(v) = ml
        }
        v += 1
      }
      label = next
    }
    longPairFrame(spark, ids.indices.map(v => (ids(v), label(v))),
      "node", "label")
  }

  /** Driver-local FastRP replay for [[fastRP]]'s gated fast path:
    * identical md5-coin Achlioptas init, neighbor averages as exact
    * decimal sums divided by the integer degree, L2 normalization via
    * 12-dp squared terms + one IEEE sqrt, and the 9-dp weighted
    * cross-iteration sum — every constant and rounding matches the
    * distributed plan expression for expression. */
  private def fastRpLocal(
      spark: org.apache.spark.sql.SparkSession,
      pairs: Array[(Long, Long)],
      dims: Int,
      iterations: Int,
      iterationWeights: Seq[Double],
      salt: String): DataFrame = {
    val (ids, ladj, _) = indexPairs(pairs)
    val n = ids.length
    def coin(node: Long, dim: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"$salt:$node:$dim"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    }
    var h = Array.tabulate(n, dims) { (v, d) =>
      val c = coin(ids(v), d)
      if (c < 1073741824L) 1.0d else if (c < 2147483648L) -1.0d else 0.0d
    }
    val acc = Array.fill(n, dims)(java.math.BigDecimal.ZERO)
    for (k <- 1 to iterations) {
      val avg = Array.ofDim[Double](n, dims)
      var v = 0
      while (v < n) {
        val ns = ladj(v)
        var d = 0
        while (d < dims) {
          var s = java.math.BigDecimal.ZERO
          var i = 0
          while (i < ns.length) { s = s.add(decTerm(h(ns(i))(d), 12)); i += 1 }
          avg(v)(d) = roundD(s.doubleValue / ns.length.toDouble, 9)
          d += 1
        }
        v += 1
      }
      val hk = Array.ofDim[Double](n, dims)
      v = 0
      while (v < n) {
        var s = java.math.BigDecimal.ZERO
        var d = 0
        while (d < dims) {
          s = s.add(decTerm(roundD(avg(v)(d) * avg(v)(d), 12), 12)); d += 1
        }
        val nrm = math.sqrt(s.doubleValue)
        d = 0
        while (d < dims) {
          hk(v)(d) = if (nrm > 0.0d) roundD(avg(v)(d) / nrm, 9) else 0.0d
          acc(v)(d) = acc(v)(d).add(
            decTerm(roundD(iterationWeights(k - 1) * hk(v)(d), 9), 12))
          d += 1
        }
        v += 1
      }
      h = hk
    }
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList((for (v <- 0 until n; d <- 0 until dims)
        yield org.apache.spark.sql.Row(ids(v), d,
          roundD(acc(v)(d).doubleValue, 6))): _*)
    spark.createDataFrame(rows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("dim",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
  }

  /** Reversed adjacency (v → u for every u → v) over int indexes. */
  private def reverse(adj: Array[Array[Int]], n: Int): Array[Array[Int]] = {
    val deg = new Array[Int](n)
    adj.foreach(_.foreach(deg(_) += 1))
    val rev = Array.tabulate(n)(i => new Array[Int](deg(i)))
    val fill = new Array[Int](n)
    var u = 0
    while (u < adj.length) {
      val ns = adj(u)
      var i = 0
      while (i < ns.length) {
        val v = ns(i); rev(v)(fill(v)) = u; fill(v) += 1; i += 1
      }
      u += 1
    }
    rev
  }

  /** One decimal-exact contribution round of a power iteration:
    * contrib(v) = Σ over edges (u → v) of the 9-dp-rounded score of u
    * as an exact DECIMAL(·,12) image — the replay of
    * `sum(round(score, 9).cast(dec))` grouped by destination. Returns
    * (per-node contribution or null when v received none — the
    * left-join distinction, and the exact L1 total). Only nodes
    * PRESENT in the score table contribute (the join semantics). */
  private def localContribRound(
      adj: Array[Array[Int]],
      score: Array[Double],
      present: Array[Boolean]): (Array[java.math.BigDecimal], java.math.BigDecimal) = {
    val contrib = new Array[java.math.BigDecimal](score.length)
    var u = 0
    while (u < score.length) {
      if (present(u)) {
        val term = decTerm(roundD(score(u), 9), 12)
        val ns = adj(u)
        var i = 0
        while (i < ns.length) {
          val v = ns(i)
          contrib(v) = if (contrib(v) == null) term else contrib(v).add(term)
          i += 1
        }
      }
      u += 1
    }
    var l1 = java.math.BigDecimal.ZERO
    var v = 0
    while (v < contrib.length) {
      if (contrib(v) != null) l1 = l1.add(contrib(v))
      v += 1
    }
    (contrib, l1)
  }

  /** Spark's `round(x, scale)` on a double, bit-for-bit
    * (BigDecimal.valueOf → HALF_UP → doubleValue — the codegen'd
    * expression); the local ball replays use it so every term matches
    * the distributed plan's exactly. */
  private def roundD(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue

  /** Exact decimal image of a ≤`scale`-dp double term — the replay of
    * `cast(round(...) as decimal(p, scale))` feeding an order-exact
    * DECIMAL sum. */
  private def decTerm(x: Double, scale: Int): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(scale)

  /** One BFS from `s` over the local adjacency: fills `dist` (-1 =
    * unreached) up to `maxHops` and returns the visited indexes in
    * discovery order (s first). Caller resets `dist` at the visited
    * indexes afterwards — O(ball), not O(V), per source. */
  private def localBfs(
      g: LocalBalls, s: Int, maxHops: Int, dist: Array[Int]): Array[Int] = {
    val order = scala.collection.mutable.ArrayBuffer[Int](s)
    dist(s) = 0
    var lo = 0
    while (lo < order.length) {
      val v = order(lo); lo += 1
      if (dist(v) < maxHops) {
        val ns = g.adj(v)
        var i = 0
        while (i < ns.length) {
          val w = ns(i)
          if (dist(w) < 0) { dist(w) = dist(v) + 1; order += w }
          i += 1
        }
      }
    }
    order.toArray
  }

  /** Shared multi-source BFS: (s, node, dist) for every node within
    * `maxHops` of each source (dist 0 = the source itself), over the
    * pre-materialized symmetrized adjacency ([[symAdjacency]]).
    * `sources` = None scores every node; a frame restricts to the
    * sampled landmark set (ids absent from the graph are dropped — no
    * edges means no ball). Each round is one adjacency×frontier
    * equi-join plus a (s, node) min-aggregate materialized as a
    * scratch table ([[pageRank]] loop discipline); the final table
    * backs the caller's plan. */
  private def bfsDistances(
      adj: DataFrame,
      maxHops: Int,
      sources: Option[DataFrame],
      prefix: String): DataFrame = {
    import graft.ops.Scratch
    require(maxHops >= 1, "maxHops must be >= 1")
    val spark = adj.sparkSession
    val seed = sources match {
      case None => adj.select(col("src").as("s")).distinct()
      case Some(df) =>
        // score only nodes that exist in the graph: a source id with no
        // edges has no ball and would emit nothing anyway
        df.select(col(df.columns.head).as("s")).distinct()
          .join(adj.select(col("src").as("s")).distinct(), Seq("s"), "left_semi")
    }
    var dist = seed.select(col("s"), col("s").as("node"), lit(0).as("dist"))
    var distPath: String = null
    for (h <- 1 to maxHops) {
      // frontier-restricted round: only the pairs discovered LAST round
      // expand — a BFS frontier can't shorten a settled distance, so
      // re-joining the whole ball against the adjacency every round
      // (Σ-over-ball·deg fanout) would be pure waste; the union + min
      // keeps the round at ONE keyed shuffle
      val frontier = dist.filter(col("dist") === h - 1)
      val expanded = adj.join(frontier, adj("src") === frontier("node"))
        .select(frontier("s"), adj("dst").as("node"), lit(h).as("d"))
      val (next, nextPath) = Scratch.materializeAt(
        dist.select(col("s"), col("node"), col("dist").as("d"))
          .union(expanded)
          .groupBy(col("s"), col("node")).agg(min(col("d")).as("dist")),
        s"${prefix}_dist")
      if (distPath != null) Scratch.drop(spark, distPath)
      dist = next
      distPath = nextPath
    }
    dist
  }

  /** [[bfsDistances]] fused with the Brandes forward pass: each round
    * also carries σ(s, node) — the shortest-path count, summed from the
    * frontier predecessors' σ along the expanding edges (every shortest
    * path to a first-discovered node enters through the previous
    * level). Same frontier-incremental shape: one adjacency×frontier
    * equi-join, one anti-join, one keyed integer sum per round. */
  private def bfsSigma(
      adj: DataFrame,
      maxHops: Int,
      sources: Option[DataFrame],
      prefix: String): DataFrame = {
    import graft.ops.Scratch
    require(maxHops >= 1, "maxHops must be >= 1")
    val spark = adj.sparkSession
    val seed = sources match {
      case None => adj.select(col("src").as("s")).distinct()
      case Some(df) =>
        df.select(col(df.columns.head).as("s")).distinct()
          .join(adj.select(col("src").as("s")).distinct(), Seq("s"), "left_semi")
    }
    var tbl = seed.select(col("s"), col("s").as("node"),
      lit(0).as("dist"), lit(1L).as("sigma"))
    var tblPath: String = null
    for (h <- 1 to maxHops) {
      val frontier = tbl.filter(col("dist") === h - 1)
      val cand = adj.join(frontier, adj("src") === frontier("node"))
        .select(frontier("s"), adj("dst").as("node"), col("sigma"))
        .join(tbl.select(col("s"), col("node")), Seq("s", "node"), "left_anti")
        .groupBy(col("s"), col("node"))
        .agg(sum(col("sigma")).as("sigma"))
        .select(col("s"), col("node"), lit(h).as("dist"), col("sigma"))
      val (next, nextPath) = Scratch.materializeAt(
        tbl.union(cand), s"${prefix}_tbl")
      if (tblPath != null) Scratch.drop(spark, tblPath)
      tbl = next
      tblPath = nextPath
    }
    tbl
  }

  /**
   * ArticleRank (the GDS PageRank variant; Li et al. 2009): identical
   * power iteration to [[pageRank]] except each neighbor's contribution
   * is damped by the GLOBAL average degree —
   *
   *   r_t+1(v) = (1-d)/N + d · Σ over neighbors u of r_t(u)/(deg(u) + avgDeg)
   *
   * — so low-degree neighbors confer less rank than under PageRank
   * (citations from short reference lists count less, the original
   * bibliometric motivation). avgDeg = 2|E|/N over the symmetrized
   * graph, computed from the SAME observed counts the loop already
   * rides (no extra scan). Loop discipline, determinism posture, and
   * the final 6-dp output round all match [[pageRank]].
   */
  def articleRank(
      edges: DataFrame,
      iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    import graft.ops.Scratch
    require(iters >= 1, "iters must be >= 1")
    val spark = edges.sparkSession
    val e0 = canonicalEdges(edges)
    val sym = e0.select(col("src"), col("dst"))
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val outdeg = sym.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val (adj, am, adjPath) = Scratch.materializeObservedAt(
      sym.join(outdeg, Seq("src")), "ar_adj", count(lit(1)).as("n_ends"))
    val (nodes, nm, nodesPath) = Scratch.materializeObservedAt(
      adj.select(col("src").as("node")).distinct(),
      "ar_ranks", count(lit(1)).as("n_nodes"))
    val n = nm("n_nodes").asInstanceOf[Long].toDouble
    if (n == 0d) {
      Scratch.drop(spark, adjPath)
      Scratch.drop(spark, nodesPath)
      return e0.select(col("src").as("node"), lit(0.0d).as("rank")).limit(0)
    }
    // 2|E|/N from the adjacency write's observed end count — the exact
    // integer ratio both engines compute identically in doubles
    val avgDeg = am("n_ends").asInstanceOf[Long].toDouble / n
    var ranks = nodes.withColumn("rank", lit(1.0d / n))
    var ranksPath = nodesPath
    // driver-pinned per-round state under the Pin gate (see pageRank)
    for (_ <- 1 to iters) {
      val (next, nextPath) = graft.ops.Pin.stateAt(
        adj.join(ranks, adj("src") === ranks("node"))
          .groupBy(adj("dst").as("node"))
          .agg((lit((1.0d - damping) / n) + lit(damping)
            * sum(col("rank") / (col("outdeg") + lit(avgDeg)))).as("rank")),
        "ar_ranks")
      Scratch.drop(spark, ranksPath)
      ranks = next
      ranksPath = nextPath
    }
    Scratch.drop(spark, adjPath)
    ranks
  }

  /**
   * Distance distribution over the landmark sample (the
   * effective-diameter / hop-plot surface; Palmer et al. 2002 ANF):
   * how many (source, node) pairs sit at each hop distance within
   * `maxHops`, from the same multi-source BFS that backs
   * [[harmonicCentrality]]. The classic small-world audit — the hop
   * histogram is O(maxHops) rows no matter the graph, and the p90 of
   * it is the standard "effective diameter" estimate. All-integer
   * output — bit-exact everywhere.
   */
  def distanceDistribution(
      edges: DataFrame,
      maxHops: Int = 3,
      sources: Option[DataFrame] = None,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val spark = edges.sparkSession
    val (adj, nAdj, adjPath) = symAdjacency(edges, "dd")
    tryLocalBalls(adj, nAdj, sources, maxLocalEdges) match {
      case Some(g) =>
        // driver-local replay: an all-integer hop histogram — only
        // hop values that actually occur emit rows, like the groupBy
        graft.ops.Scratch.drop(spark, adjPath)
        val dist = Array.fill(g.ids.length)(-1)
        val hist = new Array[Long](maxHops + 1)
        g.seeds.foreach { s =>
          val order = localBfs(g, s, maxHops, dist)
          order.foreach { v => if (dist(v) > 0) hist(dist(v)) += 1L }
          order.foreach(dist(_) = -1)
        }
        val rows: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList((1 to maxHops).filter(hist(_) > 0L)
            .map(h => org.apache.spark.sql.Row(h, hist(h))): _*)
        spark.createDataFrame(rows,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("dist",
              org.apache.spark.sql.types.IntegerType, nullable = false),
            org.apache.spark.sql.types.StructField("n_pairs",
              org.apache.spark.sql.types.LongType, nullable = false))))
      case None =>
        val dist = bfsDistances(adj, maxHops, sources, "dd")
        graft.ops.Scratch.drop(spark, adjPath)
        dist.filter(col("dist") > 0)
          .groupBy(col("dist")).agg(count(lit(1)).as("n_pairs"))
    }
  }

  /**
   * Eigenvector centrality by the power method (the GDS eigenvector
   * surface; Bonacich 1972): fixed `iters` rounds of
   *
   *   c_t+1(v) = Σ over neighbors u of c_t(u),  then L1-normalize
   *
   * over the symmetrized graph, c_0 = 1. The fixed round count is the
   * documented semantic (the [[pageRank]] `iters` contract); round 1
   * reproduces degree centrality and further rounds converge toward the
   * principal eigenvector.
   *
   * Determinism: each neighbor-sum takes 9-dp-rounded terms under a
   * DECIMAL(28,12) sum (summation-order-exact — the
   * [[harmonicCentrality]] discipline), the L1 normalizer is the exact
   * DECIMAL sum of those sums, and the normalizing division is one
   * IEEE double op on bit-identical operands — reproducible across
   * runs, partitionings, and engines.
   *
   * Scale shape: one adjacency×scores equi-join + keyed aggregate per
   * round, materialized as a scratch table whose write job carries the
   * L1 normalizer via `observe` (no second scan); constant-size plans,
   * superseded tables retired eagerly, nothing broadcast that is
   * O(graph).
   */
  def eigenvectorCentrality(edges: DataFrame, iters: Int = 3,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    import graft.ops.Scratch
    require(iters >= 1, "iters must be >= 1")
    val spark = edges.sparkSession
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val e0 = canonicalEdges(edges)
    val (adj, nAdj, adjPath) = symAdjacency(edges, "eig")
    tryLocalPairs(adj, nAdj, maxLocalEdges).foreach { case (ids, ladj) =>
      // driver-local replay of the L1-normalized rounds: same 9-dp
      // terms under exact decimal sums, same normalizer, same one
      // IEEE division + 9-dp round per node per round
      Scratch.drop(spark, adjPath)
      val score = Array.fill(ids.length)(1.0d)
      val present = Array.fill(ids.length)(true)
      for (_ <- 1 to iters) {
        val (contrib, l1b) = localContribRound(ladj, score, present)
        val l1 = l1b.doubleValue
        if (l1 == 0.0d)
          return e0.select(col("src").as("node"),
            lit(0.0d).as("eigenvector")).limit(0)
        var v = 0
        while (v < ids.length) {
          present(v) = contrib(v) != null
          if (present(v)) score(v) = roundD(contrib(v).doubleValue / l1, 9)
          v += 1
        }
      }
      val rows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(ids.indices.filter(present(_)).map { v =>
          org.apache.spark.sql.Row(ids(v), score(v))
        }: _*)
      return spark.createDataFrame(rows,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("eigenvector",
            org.apache.spark.sql.types.DoubleType, nullable = true))))
    }
    var scores = adj.select(col("src").as("node")).distinct()
      .withColumn("score", lit(1.0d))
    var scoresPath: String = null // round 0 is a projection of adj
    for (_ <- 1 to iters) {
      val (contrib, cm, contribPath) = Scratch.materializeObservedAt(
        adj.join(scores, adj("src") === scores("node"))
          .groupBy(adj("dst").as("node"))
          .agg(sum(round(col("score"), 9).cast(dec)).as("c")),
        "eig_scores", sum(col("c")).as("l1"))
      val l1 = cm("l1") match {
        case null => 0.0d
        case bd: java.math.BigDecimal => bd.doubleValue
        case d: java.lang.Number => d.doubleValue
      }
      if (scoresPath != null) Scratch.drop(spark, scoresPath)
      if (l1 == 0.0d) {
        Scratch.drop(spark, adjPath)
        Scratch.drop(spark, contribPath)
        return e0.select(col("src").as("node"),
          lit(0.0d).as("eigenvector")).limit(0)
      }
      scores = contrib.select(col("node"),
        round(col("c").cast("double") / lit(l1), 9).as("score"))
      scoresPath = contribPath
    }
    Scratch.drop(spark, adjPath)
    scores.select(col("node"), col("score").as("eigenvector"))
  }

  /**
   * HITS hubs and authorities (Kleinberg 1999; the GDS HITS surface)
   * on the DIRECTED edge set: fixed `iters` rounds of the standard
   * mutual recursion — authority from the CURRENT hubs, then hub from
   * the NEW authorities,
   *
   *   a_t+1(v) = Σ over in-edges (u,v) of h_t(u),    L1-normalized
   *   h_t+1(u) = Σ over out-edges (u,v) of a_t+1(v), L1-normalized
   *
   * — so hubs are nodes pointing AT what everyone points at, and
   * authorities are what the good hubs point at. Self-loops dropped,
   * duplicate edges collapsed; nodes with no in-edges carry authority
   * 0 (and symmetrically for hubs) — they stay in the output via the
   * final node-universe join.
   *
   * Determinism and loop shape are the [[eigenvectorCentrality]]
   * discipline doubled: per half-round, one adjacency×scores equi-join
   * + keyed aggregate of 9-dp-rounded terms under a DECIMAL(28,12)
   * sum, materialized with the L1 normalizer riding the write.
   */
  def hits(edges: DataFrame, iters: Int = 3,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    import graft.ops.Scratch
    require(iters >= 1, "iters must be >= 1")
    val spark = edges.sparkSession
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val (adj, am, adjPath) = Scratch.materializeObservedAt(
      edges.filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct(),
      "hits_adj", count(lit(1)).as("n"))
    tryLocalPairs(adj, am("n").asInstanceOf[Long], maxLocalEdges)
      .foreach { case (ids, fwd) =>
        // driver-local replay of the mutual half-rounds: auth pulls
        // through forward edges from hub, hub pulls through REVERSED
        // edges from auth — same decimal terms, normalizers, rounds.
        // Presence tracks the half-round output tables (a node absent
        // from auth/hub contributes nothing next half and reads 0.0
        // in the final coalesce).
        Scratch.drop(spark, adjPath)
        val rev = reverse(fwd, ids.length)
        var authS = Array.fill(ids.length)(1.0d)
        var authP = Array.fill(ids.length)(true)
        var hubS = Array.fill(ids.length)(1.0d)
        var hubP = Array.fill(ids.length)(true)
        def half(adjDir: Array[Array[Int]], from: Array[Double],
            fromP: Array[Boolean]): Option[(Array[Double], Array[Boolean])] = {
          val (contrib, l1b) = localContribRound(adjDir, from, fromP)
          val l1 = l1b.doubleValue
          if (l1 == 0.0d) None
          else {
            val s = new Array[Double](ids.length)
            val p = new Array[Boolean](ids.length)
            var v = 0
            while (v < ids.length) {
              p(v) = contrib(v) != null
              if (p(v)) s(v) = roundD(contrib(v).doubleValue / l1, 9)
              v += 1
            }
            Some((s, p))
          }
        }
        for (_ <- 1 to iters) {
          half(fwd, hubS, hubP) match {
            case None =>
              return edges.select(col("src").as("node"),
                lit(0.0d).as("hub"), lit(0.0d).as("authority")).limit(0)
            case Some((s, p)) => authS = s; authP = p
          }
          half(rev, authS, authP).foreach { case (s, p) =>
            hubS = s; hubP = p
          }
        }
        val rows: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList(ids.indices.map { v =>
            org.apache.spark.sql.Row(ids(v),
              if (hubP(v)) hubS(v) else 0.0d,
              if (authP(v)) authS(v) else 0.0d)
          }: _*)
        return spark.createDataFrame(rows,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("hub",
              org.apache.spark.sql.types.DoubleType, nullable = true),
            org.apache.spark.sql.types.StructField("authority",
              org.apache.spark.sql.types.DoubleType, nullable = true))))
      }
    val nodes = adj.select(col("src").as("node"))
      .union(adj.select(col("dst").as("node"))).distinct()
    // one L1-normalized half-round: scores(over) joined through adj
    // from `from` to `to`, normalizer observed on the write
    def halfRound(scores: DataFrame, from: String, to: String,
        prefix: String): Option[(DataFrame, String)] = {
      val (raw, m, path) = Scratch.materializeObservedAt(
        adj.join(scores, adj(from) === scores("node"))
          .groupBy(adj(to).as("node"))
          .agg(sum(round(col("s"), 9).cast(dec)).as("c")),
        prefix, sum(col("c")).as("l1"))
      val l1 = m("l1") match {
        case null => 0.0d
        case bd: java.math.BigDecimal => bd.doubleValue
        case d: java.lang.Number => d.doubleValue
      }
      if (l1 == 0.0d) { Scratch.drop(spark, path); None }
      else Some((raw.select(col("node"),
        round(col("c").cast("double") / lit(l1), 9).as("s")), path))
    }
    var auth = nodes.withColumn("s", lit(1.0d))
    var hub = nodes.withColumn("s", lit(1.0d))
    var authPath: String = null
    var hubPath: String = null
    for (_ <- 1 to iters) {
      halfRound(hub, "src", "dst", "hits_auth") match {
        case None =>
          Scratch.drop(spark, adjPath)
          if (authPath != null) Scratch.drop(spark, authPath)
          if (hubPath != null) Scratch.drop(spark, hubPath)
          return edges.select(col("src").as("node"), lit(0.0d).as("hub"),
            lit(0.0d).as("authority")).limit(0)
        case Some((a, p)) =>
          if (authPath != null) Scratch.drop(spark, authPath)
          auth = a; authPath = p
      }
      // an empty hub half-round is impossible once auth succeeded (the
      // same non-empty edge set feeds it), but keep the symmetric guard
      halfRound(auth, "dst", "src", "hits_hub").foreach { case (h, p) =>
        if (hubPath != null) Scratch.drop(spark, hubPath)
        hub = h; hubPath = p
      }
    }
    // adj is NOT dropped: the node-universe side of the final join
    // scans it; session shutdown reclaims it
    nodes
      .join(hub.select(col("node"), col("s").as("hub")), Seq("node"), "left")
      .join(auth.select(col("node"), col("s").as("authority")), Seq("node"), "left")
      .select(col("node"), coalesce(col("hub"), lit(0.0d)).as("hub"),
        coalesce(col("authority"), lit(0.0d)).as("authority"))
  }

  /**
   * Modularity of a community assignment (Newman–Girvan 2004) — the
   * quality score GDS reports for its community algorithms, and the
   * natural audit of [[labelPropagation]] output:
   *
   *   Q = Σ over communities c of [ L_c/m − (d_c / 2m)² ]
   *
   * where L_c = intra-community edge count, d_c = total degree of c's
   * nodes, m = total (canonical undirected) edge count. Returns one row
   * per community — (label, n_nodes, intra_edges, degree_sum,
   * q_contrib) — so the caller sees WHICH communities carry the
   * structure; `q_contrib` sums to Q.
   *
   * Every input to the arithmetic is an exact integer (counts and
   * degree sums), so the per-community expression is a handful of IEEE
   * double ops on bit-identical operands — deterministic cross-engine
   * with no rounding discipline needed (9-dp-rounded anyway as a
   * belt). Nodes absent from `communities` are ignored; communities
   * with no intra edges report 0.
   *
   * Scale shape: the edge table materializes once (its write carries m
   * via `observe`); intra counts and degree sums are each one keyed
   * equi-join + aggregate — no windows, no driver-side iteration, and
   * the only broadcast is Spark's own choice on the label join.
   */
  def modularity(
      edges: DataFrame,
      communities: DataFrame,
      nodeCol: String = "node",
      labelCol: String = "label"): DataFrame = {
    import graft.ops.Scratch
    val spark = edges.sparkSession
    val lbl = communities.select(col(nodeCol).as("node"),
      col(labelCol).as("label"))
    val (e, em, ePath) = Scratch.materializeObservedAt(
      canonicalEdges(edges), "mod_edges", count(lit(1)).as("m"))
    val m = em("m").asInstanceOf[Long]
    if (m == 0L) {
      Scratch.drop(spark, ePath)
      return lbl.groupBy(col("label"))
        .agg(count(lit(1)).as("n_nodes"), lit(0L).as("intra_edges"),
          lit(0L).as("degree_sum"), lit(0.0d).as("q_contrib"))
        .limit(0)
    }
    // intra-community edges: both endpoints labeled AND equal
    val intra = e
      .join(lbl.select(col("node").as("src"), col("label").as("ls")), Seq("src"))
      .join(lbl.select(col("node").as("dst"), col("label").as("ld")), Seq("dst"))
      .filter(col("ls") === col("ld"))
      .groupBy(col("ls").as("label"))
      .agg(count(lit(1)).as("intra_edges"))
    // per-community size + degree mass
    val deg = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val commStats = lbl.join(deg, Seq("node"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"),
        coalesce(sum(col("degree")), lit(0L)).as("degree_sum"))
    val md = lit(m.toDouble)
    commStats.join(intra, Seq("label"), "left")
      .select(col("label"), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("degree_sum"),
        round(coalesce(col("intra_edges"), lit(0L)).cast("double") / md
          - (col("degree_sum").cast("double") / (lit(2.0d) * md))
            * (col("degree_sum").cast("double") / (lit(2.0d) * md)),
          9).as("q_contrib"))
  }

  /**
   * Conductance of a community assignment (the GDS conductance metric;
   * Kannan–Vempala–Vetta 2004): per community c,
   *
   *   φ(c) = cut(c) / min(vol(c), 2m − vol(c))
   *
   * where cut(c) = edges with exactly one endpoint in c, vol(c) = the
   * total degree of c's nodes — how leaky the community boundary is
   * (0 = island, →1 = no internal cohesion). The companion audit to
   * [[modularity]]: modularity rewards density vs the random graph,
   * conductance measures the boundary directly. Returns one row per
   * community — (label, n_nodes, cut_edges, volume, conductance);
   * NULL conductance for a zero-volume community (all-isolated nodes).
   * Unlabeled endpoints count as "outside", so a partial labeling is
   * audited against the rest of the graph.
   *
   * All-integer inputs (counts, degree sums) — one IEEE division at
   * the end, 9-dp-rounded. One scratch materialization of the edge
   * table (its write carries m), two label equi-joins, two keyed
   * aggregates — no windows, no driver iteration.
   */
  def conductance(
      edges: DataFrame,
      communities: DataFrame,
      nodeCol: String = "node",
      labelCol: String = "label"): DataFrame = {
    import graft.ops.Scratch
    val spark = edges.sparkSession
    val lbl = communities.select(col(nodeCol).as("node"),
      col(labelCol).as("label"))
    val (e, em, ePath) = Scratch.materializeObservedAt(
      canonicalEdges(edges), "cond_edges", count(lit(1)).as("m"))
    val m = em("m").asInstanceOf[Long]
    if (m == 0L) {
      Scratch.drop(spark, ePath)
      return lbl.groupBy(col("label"))
        .agg(count(lit(1)).as("n_nodes"), lit(0L).as("cut_edges"),
          lit(0L).as("volume"), lit(null).cast("double").as("conductance"))
        .limit(0)
    }
    // each edge end carries its own label and the OTHER end's label;
    // a boundary edge contributes one cut to each labeled side
    val sides = e
      .join(lbl.select(col("node").as("src"), col("label").as("ls")),
        Seq("src"), "left")
      .join(lbl.select(col("node").as("dst"), col("label").as("ld")),
        Seq("dst"), "left")
    val cuts = sides.select(col("ls").as("label"), col("ld").as("other"))
      .union(sides.select(col("ld").as("label"), col("ls").as("other")))
      .filter(col("label").isNotNull)
      .groupBy(col("label"))
      .agg(sum(when(col("other").isNull || col("other") =!= col("label"), 1L)
        .otherwise(0L)).as("cut_edges"))
    val deg = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val commStats = lbl.join(deg, Seq("node"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"),
        coalesce(sum(col("degree")), lit(0L)).as("volume"))
    val denom = least(col("volume"), lit(2L * m) - col("volume"))
    commStats.join(cuts, Seq("label"), "left")
      .select(col("label"), col("n_nodes"),
        coalesce(col("cut_edges"), lit(0L)).as("cut_edges"),
        col("volume"),
        when(denom > 0L,
          round(coalesce(col("cut_edges"), lit(0L)).cast("double")
            / denom.cast("double"), 9)).as("conductance"))
  }

  /**
   * Degree assortativity coefficient (Newman 2002): the Pearson
   * correlation of endpoint degrees over the symmetrized edge ends —
   * positive when hubs attach to hubs (social nets), negative when hubs
   * attach to leaves (technological nets). The one-number mixing
   * summary a 100 TB graph can always afford: two keyed aggregates and
   * a single-row reduction.
   *
   * Computed in the covariance form r = cov(x,y) / (σx·σy) with each
   * Σx, Σxy, Σx² an exact BIGINT (degree products stay far below 2^63;
   * the moment SUMS, not per-row products, are the only values that
   * grow with the graph) — the divisions and sqrt are then IEEE ops on
   * bit-identical operands, deterministic cross-engine ([[sqrt]] is
   * correctly rounded; no libm `pow`). Returns one row
   * (n_ends, assortativity); NULL assortativity for degree-regular
   * graphs (zero variance) and empty inputs.
   */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    import graft.ops.Scratch
    // the edge scratch table backs the returned plan (degree sums + end
    // join all scan it); session shutdown reclaims it
    val e = Scratch.materialize(canonicalEdges(edges), "assort_edges")
    val deg = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val sym = e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
    val ends = sym
      .join(deg.select(col("node").as("src"), col("degree").as("x")), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("degree").as("y")), Seq("dst"))
    val agg = ends.agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("x")), lit(0L)).as("sx"),
      coalesce(sum(col("y")), lit(0L)).as("sy"),
      coalesce(sum(col("x") * col("y")), lit(0L)).as("sxy"),
      coalesce(sum(col("x") * col("x")), lit(0L)).as("sxx"),
      coalesce(sum(col("y") * col("y")), lit(0L)).as("syy"))
    // null divisor for the empty frame: the means (and so the guard
    // conditions and coefficient) all null-propagate instead of
    // tripping ANSI divide-by-zero on the n=0 row
    val n = when(col("n") > 0L, col("n").cast("double"))
    def mean(c: Column) = c.cast("double") / n
    val cov = mean(col("sxy")) - mean(col("sx")) * mean(col("sy"))
    val vx = mean(col("sxx")) - mean(col("sx")) * mean(col("sx"))
    val vy = mean(col("syy")) - mean(col("sy")) * mean(col("sy"))
    val out = agg.select(col("n").as("n_ends"),
      when(col("n") > 0L && vx > 0.0d && vy > 0.0d,
        round(cov / sqrt(vx * vy), 6)).as("assortativity"))
    // single-row reduction — materialization would be pure overhead;
    // the edge scratch table backs both degree joins above
    out
  }

  /**
   * Deterministic uniform random walks (the GDS RandomWalk /
   * node2vec-sampling surface): one walk per node, `steps` hops; at
   * each step the walker moves to the neighbor with the minimum
   * md5(salt : walk : step : neighbor) coin — a uniform choice among
   * neighbors that is reproducible across runs, partitionings, and
   * engines (the library-wide integer-coin discipline; per-purpose
   * `salt`). Returns (walk, step, node) rows, steps+1 per walk —
   * feed to skip-gram embedding training or use as graph samples.
   *
   * Scale shape: each step is one keyed equi-join (frontier ×
   * adjacency, shuffled on the current node) whose fanout is exactly
   * deg(current) per walk — Σ ≤ 2|E| rows per step — followed by a
   * per-walk min-struct AGGREGATE (map-side combinable), never a
   * per-walk window. Each step's frontier is a scratch table
   * (constant-size plans); the returned union reads the per-step
   * tables, reclaimed at session shutdown.
   */
  def randomWalks(
      edges: DataFrame,
      steps: Int = 3,
      salt: String = "walk"): DataFrame = {
    import graft.ops.Scratch
    require(steps >= 1, "steps must be >= 1")
    val e0 = canonicalEdges(edges)
    val adj = Scratch.materialize(
      e0.select(col("src").as("n"), col("dst").as("x"))
        .union(e0.select(col("dst").as("n"), col("src").as("x"))),
      "rw_adj")
    // per-step frontier state is ONE row per walk (fixed-width longs) —
    // driver-pinned with the enforced row/byte gate (Pin.state) instead
    // of a scratch write+read per step; past the bound each step falls
    // back to the scratch table, the distributed shape
    val tables = new scala.collection.mutable.ArrayBuffer[DataFrame]
    var cur = graft.ops.Pin.state(
      adj.select(col("n").as("walk")).distinct()
        .select(col("walk"), lit(0).as("step"), col("walk").as("node")),
      "rw_step0")
    tables += cur
    for (i <- 1 to steps) {
      val coin = md5(concat_ws(":", lit(salt), col("walk").cast("string"),
        lit(i).cast("string"), col("x").cast("string")))
      cur = graft.ops.Pin.state(
        adj.join(cur, adj("n") === cur("node"))
          .select(cur("walk"), adj("x"), coin.as("h"))
          .groupBy(col("walk"))
          .agg(min(struct(col("h"), col("x"))).as("m"))
          .select(col("walk"), lit(i).as("step"), col("m.x").as("node")),
        s"rw_step$i")
      tables += cur
    }
    tables.reduce(_ union _)
  }

  /**
   * FastRP node embeddings (Chen et al. 2019, "Fast and Accurate Network
   * Embeddings via Very Sparse Random Projection" — the GDS default
   * embedding algorithm): start each node at a very sparse random
   * projection row, repeatedly average neighbors (one step of A·R per
   * iteration, so iteration k encodes the k-hop structure), L2-normalize
   * each round, and output the weighted sum of the per-iteration
   * embeddings as (node, dim, value) rows.
   *
   * Deterministic, oracle-able rendition: the projection entry for
   * (node, dim) comes from an md5 coin (+1 / −1 each with probability
   * 1/4, 0 with probability 1/2 — the Achlioptas s=2 sparse projection;
   * the ±√s scale factor is a constant the per-round normalization
   * absorbs), so the "random" matrix is a pure function of (salt, node,
   * dim) — reproducible across runs, partitionings and engines.
   * Determinism discipline: neighbor sums of 9-dp-rounded values as
   * DECIMAL(28,12) (summation-order-exact), one IEEE division by the
   * integer degree, 9-dp round; the norm is a DECIMAL sum of 12-dp
   * squared terms under an IEEE-correctly-rounded sqrt; the final
   * weighted sum is again 9-dp terms under a DECIMAL sum, 6-dp output.
   *
   * Scale shape: the embedding is (node, dim, value) ROWS, so one
   * iteration is one adjacency×embedding equi-join (keyed shuffle,
   * fanout 2|E|·dims) plus two keyed aggregates — no vectors ship as
   * arrays, no per-node window, and the per-round state is a scratch
   * table ([[pageRank]] loop discipline, constant-size plans). Degree
   * rides the adjacency table; per-iteration tables h_1..h_K stay on
   * disk because the returned weighted-sum plan reads them.
   */
  def fastRP(
      edges: DataFrame,
      dims: Int = 8,
      iterations: Int = 2,
      iterationWeights: Seq[Double] = Seq(1.0, 1.0),
      salt: String = "frp",
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    import graft.ops.Scratch
    require(dims >= 1, "dims must be >= 1")
    require(iterations >= 1, "iterations must be >= 1")
    require(iterationWeights.length == iterations,
      "iterationWeights must have one weight per iteration")
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val spark = edges.sparkSession
    val e0 = canonicalEdges(edges)
    val sym = e0.select(col("src").as("n"), col("dst").as("x"))
      .union(e0.select(col("dst").as("n"), col("src").as("x")))
    // degree of the AVERAGING node rides the adjacency rows (groupBy +
    // equi-join, AQE-skew-splittable — see pageRank)
    val deg = sym.groupBy(col("n")).agg(count(lit(1)).as("degree"))
    val (adj, am, adjPath) = Scratch.materializeObservedAt(
      sym.join(deg, Seq("n")), "frp_adj", count(lit(1)).as("n_rows"))
    // driver-local replay gate (the power-family switchover): every
    // stage is 9/12-dp terms under order-exact DECIMAL sums plus fixed
    // IEEE ops (one division by the integer degree, one sqrt, the
    // md5-coin init) — all bit-replayable; budget counts edge·dim work
    locally {
      val cap = localEdgeCap(spark, maxLocalEdges)
      val nRows = am("n_rows").asInstanceOf[Long]
      if (cap > 0 && nRows <= cap &&
          nRows * dims * iterations <= 512000000L &&
          adj.schema("n").dataType == org.apache.spark.sql.types.LongType) {
        val pairs = adj.select(col("n"), col("x")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        Scratch.drop(spark, adjPath)
        return fastRpLocal(spark, pairs, dims, iterations,
          iterationWeights, salt)
      }
    }
    val coin = conv(substring(md5(concat_ws(":", lit(salt),
      col("node").cast("string"), col("dim").cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val init = adj.select(col("n").as("node")).distinct()
      .select(col("node"),
        explode(sequence(lit(0), lit(dims - 1))).as("dim"))
      .select(col("node"), col("dim"),
        when(coin < 1073741824L, lit(1.0d))
          .when(coin < 2147483648L, lit(-1.0d))
          .otherwise(lit(0.0d)).as("v"))
    var (h, hPath) = Scratch.materializeAt(init, "frp_h0")
    var prevPath = hPath
    val rounds = new scala.collection.mutable.ArrayBuffer[DataFrame]
    for (k <- 1 to iterations) {
      // neighbor average: DECIMAL-exact sum of the stored 9-dp values,
      // one division by the integer degree; materialized because BOTH
      // the norm probe and the normalize projection read it
      val (avg, avgPath) = Scratch.materializeAt(
        adj.join(h, adj("x") === h("node"))
          .groupBy(adj("n").as("node"), col("dim"), adj("degree"))
          .agg(round(sum(col("v").cast(dec)).cast("double") / col("degree"), 9)
            .as("v"))
          .select(col("node"), col("dim"), col("v")),
        s"frp_avg$k")
      val norms = avg.groupBy(col("node"))
        .agg(sqrt(sum(round(col("v") * col("v"), 12).cast(dec)).cast("double"))
          .as("nrm"))
      val (hk, hkPath) = Scratch.materializeAt(
        avg.join(norms, Seq("node"))
          .select(col("node"), col("dim"),
            when(col("nrm") > 0.0d, round(col("v") / col("nrm"), 9))
              .otherwise(lit(0.0d)).as("v")),
        s"frp_h$k")
      Scratch.drop(spark, avgPath)
      if (prevPath != null) Scratch.drop(spark, prevPath) // h0 only
      h = hk
      prevPath = null // h_1..h_K back the returned plan — never dropped
      rounds += hk
    }
    Scratch.drop(spark, adjPath)
    // weighted sum across iterations: 9-dp terms, DECIMAL-exact sum
    val weighted = rounds.zip(iterationWeights).map { case (hk, w) =>
      hk.select(col("node"), col("dim"),
        round(lit(w) * col("v"), 9).cast(dec).as("t"))
    }
    weighted.reduce(_ union _)
      .groupBy(col("node"), col("dim"))
      .agg(round(sum(col("t")).cast("double"), 6).as("value"))
  }

  /**
   * Louvain community detection, phase-1 local-move rendition (Blondel
   * et al. 2008 — the flagship GDS modularity-optimizing community
   * algorithm): every node repeatedly moves to the neighboring
   * community with the best modularity gain until a full sweep stops
   * improving modularity, or the round bound hits.
   *
   * Deterministic, oracle-able rendition of the inherently sequential
   * classic: each ROUND is two Gauss-Seidel HALF-SWEEPS — odd-id nodes
   * move against the current assignment, then even-id nodes against
   * the half-updated one (the [[hits]] half-round discipline). The
   * sequential halves remove the two-node swap oscillation synchronous
   * parallel Louvain is known for (two adjacent singletons trading
   * communities forever): within a half-sweep no two movers can be
   * adjacent movers of each other's target in the swap pattern, and
   * the second half always sees the first half's moves.
   *
   * Gain arithmetic is EXACT. With integer edge weights the classic
   * gain of moving node i into community C (i removed from its own
   * community first) is k_{i,C} − k_i·Σtot(C)/2m; scaled by 2m it is
   * the integer  2m·k_{i,C} − k_i·(Σtot(C) − [C=C₀]·k_i), carried as
   * DECIMAL(38,0) so a 100 TB graph cannot overflow the product. Ties
   * break to the smallest community id (the [[labelPropagation]]
   * determinism trade).
   *
   * Acceptance: after each round the 4m²-scaled INTEGER modularity
   * score S = Σ_C (4m·L_C − d_C²) (exact-rational Newman Q: Q = S/4m²)
   * is computed; a round that does not STRICTLY increase S is rejected
   * and the loop stops. Accepted assignments are therefore monotone in
   * modularity BY CONSTRUCTION (spec-assertable), and a fixed-round
   * oracle can re-derive the stop point from the same integer scores.
   *
   * Scale shape: per half-sweep — one keyed Σtot aggregate, one
   * adjacency×labels equi-join + keyed k_{i,C} aggregate, one per-node
   * argmax aggregate (never a corpus-wide window); per round — one
   * within-community edge sum + one degree-mass aggregate for S. Round
   * state is a scratch table ([[pageRank]] loop discipline, constant
   * plans), superseded tables retire eagerly.
   *
   * Reference context: the destination system ships Louvain as its
   * flagship community algorithm (GDS 2.1 family, reference README);
   * this is the warehouse-side equivalent over any edge frame.
   *
   * `levels > 1` runs the full MULTI-LEVEL Louvain: after a phase
   * converges, communities contract into super-nodes (cross edges
   * summed, intra-community mass carried as SELF-LOOP weight — it
   * enters k_i and L_C but never a move decision, since a self-loop
   * travels with its node), the phase reruns on the contracted graph,
   * and the hierarchy maps back to original nodes. 2m is invariant
   * across contractions, so scores at every level remain the SAME
   * original-graph modularity scale — acceptance stays monotone
   * end-to-end.
   */
  def louvain(
      edges: DataFrame,
      maxRounds: Int = 4,
      weightCol: Option[String] = None,
      levels: Int = 1,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    import graft.ops.Scratch
    require(maxRounds >= 1, "maxRounds must be >= 1")
    require(levels >= 1, "levels must be >= 1")
    val spark = edges.sparkSession
    val e0raw = weightCol match {
      case None => canonicalEdges(edges).withColumn("w", lit(1L))
      case Some(wc) =>
        edges.filter(col("src") =!= col("dst"))
          .groupBy(least(col("src"), col("dst")).as("src"),
            greatest(col("src"), col("dst")).as("dst"))
          .agg(sum(col(wc).cast("long")).as("w"))
          .filter(col("w") > 0L)
    }
    val dec = "decimal(38,0)"
    // 2m and the edge count ride the edge-table write as Observations
    // (no separate driver aggregate): m2 is invariant across
    // contractions; the count gates the local phase fast path below
    var (e, eMeta, ePath) = Scratch.materializeObservedAt(
      e0raw.select(col("src"), col("dst"), col("w")), "louvain_edges",
      (sum(col("w")) * 2L).as("m2"), count(lit(1)).as("n_edges"))
    // self-loop mass per node: zero at level 1, the contracted
    // intra-community weight at deeper levels. A self-loop never
    // changes a MOVE decision (it travels with its node) but it does
    // enter the node's degree mass k_i and the community's L_C.
    var sw = e.select(col("src").as("node"), lit(0L).as("selfw"))
      .filter(lit(false))
    var swPath: String = null
    if (eMeta("m2") == null) // empty graph; its (empty) scratch backs the plan
      return e.select(col("src").as("node"), col("src").as("community"))
    val m2 = eMeta("m2").asInstanceOf[Long] // 2m
    // one phase of half-sweep local moves over (cross-edges e, self
    // mass sw); returns the phase's label table (node → community).
    // `nEdges`/`nSelf` are the OBSERVED row counts of the two inputs
    // (riding their write jobs): under `maxLocalEdges` the phase runs
    // as a driver-local sweep loop — the [[Corpus.connectedComponents]]
    // union-find switchover, and exactly what production Louvain does
    // once contraction shrinks the graph (level 2+ graphs are
    // |communities|-sized; burning 6+ distributed jobs of pure stage
    // scheduling on a 10k-node graph is the measured sf0.1 cost). The
    // local sweep replays the SAME integer arithmetic (BigInt ⊇
    // DECIMAL(38,0)), same snapshot semantics, same (gain, -c)
    // tie-break — value-identical by construction, differential-spec
    // enforced, and the collect is bounded by the observed counts,
    // never by hope. Long-typed node ids only; anything else (or
    // maxLocalEdges = 0, the spec's override) takes the distributed
    // scratch-table loop.
    def phase(e: DataFrame, sw: DataFrame,
        nEdges: Long, nSelf: Long): (DataFrame, String) = {
      val phaseCap = localEdgeCap(spark, maxLocalEdges)
      if (phaseCap > 0 && nEdges <= phaseCap &&
          nSelf <= phaseCap &&
          e.schema("src").dataType ==
            org.apache.spark.sql.types.LongType)
        return (louvainLocalPhase(e, sw, m2, maxRounds), null)
      val (adj, adjPath) = Scratch.materializeAt(
        e.select(col("src").as("n"), col("dst").as("x"), col("w"))
          .union(e.select(col("dst").as("n"), col("src").as("x"), col("w"))),
        "louvain_adj")
      // node universe = edge endpoints ∪ self-mass nodes: a community
      // whose merge swallowed its whole component has ONLY a self-loop
      // at the next level and must not vanish from the hierarchy
      val kiBase = adj.groupBy(col("n").as("node")).agg(sum(col("w")).as("kw"))
      // the identity-assignment score rides the ki WRITE as an
      // Observation: under identity labels no two nodes share a
      // community, so L_C = 0 and s₀ = Σᵢ[2·m2·selfwᵢ − kᵢ²] — a flat
      // sum over the written rows, no separate driver job
      val (ki, kiMeta, kiPath) = Scratch.materializeObservedAt(
        kiBase.select(col("node"))
          .unionByName(sw.select(col("node"))).distinct()
          .join(kiBase, Seq("node"), "left")
          .join(sw, Seq("node"), "left")
          .select(col("node"),
            (coalesce(col("kw"), lit(0L)) +
              lit(2L) * coalesce(col("selfw"), lit(0L))).as("ki"),
            coalesce(col("selfw"), lit(0L)).as("selfw")),
        "louvain_ki",
        sum(lit(2L * m2).cast(dec) * col("selfw") -
          col("ki").cast(dec) * col("ki").cast(dec)).as("s0"))
      // labels tables CARRY (ki, selfw) alongside (node, label): the
      // node-mass columns are functionally dependent on the node, so
      // riding them on every labels scratch write lets each half-sweep
      // take Σtot straight off the labels table and the move decision
      // read ki/selfw from the c0 join it does anyway — three per-sweep
      // re-joins against the ki table gone (the round-9 verdict trim)
      def halfSweep(labels: DataFrame, par: Int): DataFrame = {
        val sumtot = labels
          .groupBy(col("label").as("c")).agg(sum(col("ki")).as("tot"))
        val kic = adj
          .join(labels.select(col("node").as("x"), col("label")), Seq("x"))
          .select(col("n").as("node"), col("label").as("c"), col("w"))
        // the stay candidate rides as a zero-weight row: a node with no
        // neighbor in its own community still evaluates staying (gain 0
        // after self-removal)
        val cand = kic
          .unionByName(labels.select(col("node"), col("label").as("c"),
            lit(0L).as("w")))
          .groupBy(col("node"), col("c")).agg(sum(col("w")).as("kic"))
        val gain = lit(m2).cast(dec) * col("kic") -
          col("ki").cast(dec) *
            (col("tot") - when(col("c") === col("c0"), col("ki"))
              .otherwise(lit(0L)))
        val moved = cand
          .join(labels.select(col("node"), col("label").as("c0"),
            col("ki"), col("selfw")), Seq("node"))
          .join(sumtot, Seq("c"))
          .filter(pmod(col("node"), lit(2L)) === par)
          .groupBy(col("node"), col("ki"), col("selfw"))
          .agg(max_by(col("c"),
            struct(gain.as("g"), (-col("c")).as("nc"))).as("label"))
          .select(col("node"), col("label"), col("ki"), col("selfw"))
        labels.filter(pmod(col("node"), lit(2L)) =!= par)
          .select(col("node"), col("label"), col("ki"), col("selfw"))
          .unionByName(moved)
      }
      // 4m²-scaled integer modularity of the sweep result rides ITS OWN
      // write job as an Observation (the ParquetWireSink stats pattern),
      // replacing the old per-round score action: the community-grouped
      // Σ_C[2·m2·(L_C + self_C) − d_C²] restates as the FLAT per-node
      // sum Σᵢ[m2·w_intra(i) + 2·m2·selfwᵢ − kᵢ·d_{C(i)}] (adjacency
      // counts each intra edge twice; Σ_{i∈C} kᵢ·d_C = d_C²), with d_C
      // a per-community window and neighbor labels one adjacency join —
      // the sweep subtree is referenced twice in the plan but its
      // shuffle is deduped by ReuseExchange, so each accepted round
      // costs exactly two write jobs (h1, scored h2) and zero heads.
      def scoredSweep(labels: DataFrame, par: Int)
          : (DataFrame, String, java.math.BigDecimal) = {
        import org.apache.spark.sql.expressions.Window
        val core = halfSweep(labels, par)
        val nbrW = adj
          .join(core.select(col("node").as("x"), col("label").as("lx")),
            Seq("x"))
          .groupBy(col("n").as("node"), col("lx").as("label"))
          .agg(sum(col("w")).as("w_intra"))
        val enriched = core
          .join(nbrW, Seq("node", "label"), "left")
          .select(col("node"), col("label"), col("ki"), col("selfw"),
            (lit(m2).cast(dec) * coalesce(col("w_intra"), lit(0L)) +
              lit(2L * m2).cast(dec) * col("selfw") -
              col("ki").cast(dec) *
                sum(col("ki")).over(Window.partitionBy(col("label")))
                  .cast(dec)).as("s_i"))
        val (scan, met, path) = Scratch.materializeObservedAt(
          enriched, "louvain_labels", sum(col("s_i")).as("s"))
        (scan.select(col("node"), col("label"), col("ki"), col("selfw")),
          path, met("s").asInstanceOf[java.math.BigDecimal])
      }
      var labels = ki.select(col("node"), col("node").as("label"),
        col("ki"), col("selfw"))
      var labelsPath: String = kiPath // identity labels read the ki table
      var s = kiMeta("s0").asInstanceOf[java.math.BigDecimal]
      var round = 1
      var improving = true
      while (improving && round <= maxRounds) {
        // the odd half-sweep IS materialized: inlining it into the
        // scored even-sweep plan was measured SLOWER (10.7 s vs 10.0 s
        // at sf0.1) — the inner sweep subtree appears 4× in the fused
        // plan and exchange reuse does not collapse all copies
        val (h1, h1Path) = Scratch.materializeAt(halfSweep(labels, 1),
          "louvain_h1")
        val (h2, h2Path, s2) = scoredSweep(h1, 0)
        Scratch.drop(spark, h1Path)
        if (s2.compareTo(s) > 0) {
          if (labelsPath != kiPath) Scratch.drop(spark, labelsPath)
          labels = h2; labelsPath = h2Path; s = s2; round += 1
        } else {
          Scratch.drop(spark, h2Path)
          improving = false
        }
      }
      Scratch.drop(spark, adjPath)
      if (labelsPath != kiPath) Scratch.drop(spark, kiPath)
      (labels, labelsPath)
    }
    // level 1
    var (labels, labelsPath) = phase(e, sw,
      eMeta("n_edges").asInstanceOf[Long], 0L)
    var (map, mapPath) = Scratch.materializeAt(
      labels.select(col("node"), col("label").as("community")), "louvain_map")
    Scratch.drop(spark, labelsPath)
    // deeper levels: contract communities into super-nodes (cross
    // edges summed between communities, intra mass into self-loops —
    // the standard Louvain aggregation phase) and move again
    for (_ <- 2 to levels) {
      val ls = map.select(col("node").as("src"), col("community").as("ls"))
      val ld = map.select(col("node").as("dst"), col("community").as("ld"))
      val tagged = e.join(ls, Seq("src")).join(ld, Seq("dst"))
      val (e2, e2Meta, e2Path) = Scratch.materializeObservedAt(
        tagged.filter(col("ls") =!= col("ld"))
          .groupBy(least(col("ls"), col("ld")).as("src"),
            greatest(col("ls"), col("ld")).as("dst"))
          .agg(sum(col("w")).as("w")),
        "louvain_edges", count(lit(1)).as("n_edges"))
      val (sw2, sw2Meta, sw2Path) = Scratch.materializeObservedAt(
        map.select(col("community").as("node")).distinct()
          .join(tagged.filter(col("ls") === col("ld"))
              .groupBy(col("ls").as("node")).agg(sum(col("w")).as("intra"))
              .unionByName(map.join(sw, Seq("node"))
                .groupBy(col("community").as("node"))
                .agg(sum(col("selfw")).as("intra")))
              .groupBy(col("node")).agg(sum(col("intra")).as("selfw")),
            Seq("node"), "left")
          .select(col("node"), coalesce(col("selfw"), lit(0L)).as("selfw")),
        "louvain_selfw", count(lit(1)).as("n_selfw"))
      Scratch.drop(spark, ePath)
      if (swPath != null) Scratch.drop(spark, swPath)
      e = e2; ePath = e2Path
      sw = sw2; swPath = sw2Path
      val (l2, l2Path) = phase(e, sw,
        e2Meta("n_edges").asInstanceOf[Long],
        sw2Meta("n_selfw").asInstanceOf[Long])
      val (map2, map2Path) = Scratch.materializeAt(
        map.join(
          l2.select(col("node").as("community_prev"),
            col("label").as("community2")),
          map("community") === col("community_prev"))
          .select(map("node"), col("community2").as("community")),
        "louvain_map")
      Scratch.drop(spark, l2Path)
      Scratch.drop(spark, mapPath)
      map = map2; mapPath = map2Path
    }
    Scratch.drop(spark, ePath)
    if (swPath != null) Scratch.drop(spark, swPath)
    map
  }

  /** Driver-local rendition of one [[louvain]] phase — reachable ONLY
    * under the observed `maxLocalEdges` gate. Replays the distributed
    * phase exactly: identity start, rounds of two snapshot half-sweeps
    * (odd ids then even ids, moves computed against the half-sweep's
    * INPUT labels), gain = m2·k_{i,C} − k_i·(Σtot(C) − [C=C₀]·k_i) as
    * exact BigInt (⊇ the distributed DECIMAL(38,0)), ties to the
    * smallest community id, rounds accepted only while the 4m²-scaled
    * integer modularity strictly increases. All fold orders are
    * commutative integer sums, so map iteration order cannot leak into
    * the result — value-identical to the scratch-table loop by
    * construction (LouvainLocalSpec runs both paths differentially). */
  private def louvainLocalPhase(
      e: DataFrame, sw: DataFrame, m2: Long, maxRounds: Int): DataFrame = {
    import scala.collection.mutable
    val spark = e.sparkSession
    val edgeRows = e.select(col("src"), col("dst"), col("w")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val selfw = mutable.LongMap.empty[Long]
    sw.select(col("node"), col("selfw")).collect()
      .foreach(r => selfw(r.getLong(0)) = r.getLong(1))
    val adj = mutable.LongMap.empty[mutable.ArrayBuffer[(Long, Long)]]
    val kw = mutable.LongMap.empty[Long]
    for ((s, d, w) <- edgeRows) {
      adj.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += ((d, w))
      adj.getOrElseUpdate(d, mutable.ArrayBuffer.empty) += ((s, w))
      kw(s) = kw.getOrElse(s, 0L) + w
      kw(d) = kw.getOrElse(d, 0L) + w
    }
    val nodes = (adj.keysIterator ++ selfw.keysIterator).toArray.distinct
    val ki = mutable.LongMap.empty[Long]
    nodes.foreach(n =>
      ki(n) = kw.getOrElse(n, 0L) + 2L * selfw.getOrElse(n, 0L))
    val m2b = BigInt(m2)
    def halfSweep(labels: mutable.LongMap[Long], par: Long)
        : mutable.LongMap[Long] = {
      val tot = mutable.LongMap.empty[BigInt]
      nodes.foreach { n =>
        val c = labels(n); tot(c) = tot.getOrElse(c, BigInt(0)) + ki(n) }
      val out = labels.clone()
      nodes.foreach { n =>
        if (java.lang.Math.floorMod(n, 2L) == par) {
          val c0 = labels(n)
          val cand = mutable.LongMap.empty[Long]
          cand(c0) = 0L // the stay candidate (gain 0 after self-removal)
          adj.get(n).foreach(_.foreach { case (x, w) =>
            val cx = labels(x); cand(cx) = cand.getOrElse(cx, 0L) + w })
          var bestC = c0
          var bestG: BigInt = null
          cand.foreach { case (c, kic) =>
            val g = m2b * kic - BigInt(ki(n)) *
              (tot.getOrElse(c, BigInt(0)) -
                (if (c == c0) BigInt(ki(n)) else BigInt(0)))
            if (bestG == null || g > bestG || (g == bestG && c < bestC)) {
              bestG = g; bestC = c
            }
          }
          out(n) = bestC
        }
      }
      out
    }
    def score(labels: mutable.LongMap[Long]): BigInt = {
      val dC = mutable.LongMap.empty[BigInt]
      nodes.foreach { n =>
        val c = labels(n); dC(c) = dC.getOrElse(c, BigInt(0)) + ki(n) }
      var s = BigInt(0)
      nodes.foreach { n =>
        var wIntra = 0L
        adj.get(n).foreach(_.foreach { case (x, w) =>
          if (labels(x) == labels(n)) wIntra += w })
        s += m2b * wIntra + 2 * m2b * BigInt(selfw.getOrElse(n, 0L)) -
          BigInt(ki(n)) * dC(labels(n))
      }
      s
    }
    var labels = {
      val m = mutable.LongMap.empty[Long]; nodes.foreach(n => m(n) = n); m }
    var s = score(labels)
    var round = 1
    var improving = true
    while (improving && round <= maxRounds) {
      val h2 = halfSweep(halfSweep(labels, 1L), 0L)
      val s2 = score(h2)
      if (s2 > s) { labels = h2; s = s2; round += 1 }
      else improving = false
    }
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(nodes.sorted.map(n =>
        org.apache.spark.sql.Row(n, labels(n))): _*)
    spark.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Default edge bound for the driver-local graph fast paths (SCC /
    * toposort / coloring / matching / Louvain phases): a graph whose
    * OBSERVED edge count fits the bound is collected and solved on the
    * driver (~16 bytes/edge → ≈16 MB of driver heap at the default),
    * which at bench scale replaces dozens of pure-stage-scheduling
    * write jobs. DRIVER-MEMORY IMPLICATION: callers with small driver
    * heaps — or deployments that never want driver-local execution —
    * tune it globally via the session conf `spark.graft.maxLocalEdges`
    * (`0` disables every fast path); an explicit per-call
    * `maxLocalEdges` argument that differs from this default always
    * wins over the conf. The distributed loops remain the semantics of
    * record either way (differential specs pin local ≡ distributed). */
  val DefaultMaxLocalEdges: Long = 1000000L

  /** Resolve a call's effective driver-local edge cap: the explicit
    * argument if the caller changed it, else the session conf
    * `spark.graft.maxLocalEdges`, else [[DefaultMaxLocalEdges]]. */
  private def localEdgeCap(
      spark: org.apache.spark.sql.SparkSession, requested: Long): Long =
    if (requested != DefaultMaxLocalEdges) requested
    else spark.conf.getOption("spark.graft.maxLocalEdges")
      .map(_.toLong).getOrElse(DefaultMaxLocalEdges)

  /** Collect a (src, dst) scratch edge table for a driver-local graph
    * fast path — callers gate on the OBSERVED edge count first. */
  private def collectEdgePairs(e: DataFrame): Array[(Long, Long)] =
    e.select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  private def longPairFrame(
      spark: org.apache.spark.sql.SparkSession,
      rows: Seq[(Long, Long)],
      c1: String, c2: String): DataFrame = {
    val jrows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2)): _*)
    spark.createDataFrame(jrows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(c1,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(c2,
        org.apache.spark.sql.types.LongType, nullable = false))))
  }

  private def longNullableFrame(
      spark: org.apache.spark.sql.SparkSession,
      rows: Seq[(Long, Option[Long])],
      c1: String, c2: String): DataFrame = {
    val jrows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2.map(Long.box).orNull)): _*)
    spark.createDataFrame(jrows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(c1,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(c2,
        org.apache.spark.sql.types.LongType, nullable = true))))
  }

  /** Driver-local SCC (iterative Tarjan) — reachable only under the
    * observed edge gate. The OUTPUT is canonical (every node labeled
    * with its strongly connected component's minimum member id), so any
    * correct SCC algorithm reproduces the distributed FW-BW result
    * exactly; the sf0.01 oracle gate and the differential spec both
    * enforce it. */
  private def sccLocal(edgeRows: Array[(Long, Long)]): Seq[(Long, Long)] = {
    import scala.collection.mutable
    val adj = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    val nodesSet = mutable.LongMap.empty[Unit]
    for ((s, d) <- edgeRows) {
      adj.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += d
      nodesSet(s) = (); nodesSet(d) = ()
    }
    val nodes = nodesSet.keys.toArray
    val indexOf = mutable.LongMap.empty[Int]
    val lowOf = mutable.LongMap.empty[Int]
    val onStk = mutable.HashSet.empty[Long]
    val stk = mutable.ArrayBuffer.empty[Long]
    var counter = 0
    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    val empty = mutable.ArrayBuffer.empty[Long]
    for (root <- nodes if !indexOf.contains(root)) {
      val dfs = mutable.ArrayBuffer.empty[Array[Long]] // [node, childIdx]
      def push(v: Long): Unit = {
        indexOf(v) = counter; lowOf(v) = counter; counter += 1
        stk += v; onStk += v; dfs += Array(v, 0L)
      }
      push(root)
      while (dfs.nonEmpty) {
        val fr = dfs.last
        val v = fr(0)
        val nbrs = adj.getOrElse(v, empty)
        if (fr(1) < nbrs.length) {
          val w = nbrs(fr(1).toInt)
          fr(1) += 1
          if (!indexOf.contains(w)) push(w)
          else if (onStk(w)) lowOf(v) = math.min(lowOf(v), indexOf(w))
        } else {
          dfs.remove(dfs.length - 1)
          if (dfs.nonEmpty) {
            val p = dfs.last(0)
            lowOf(p) = math.min(lowOf(p), lowOf(v))
          }
          if (lowOf(v) == indexOf(v)) {
            val members = mutable.ArrayBuffer.empty[Long]
            var w = 0L
            do {
              w = stk.remove(stk.length - 1); onStk -= w; members += w
            } while (w != v)
            val m = members.min
            members.foreach(x => out += ((x, m)))
          }
        }
      }
    }
    out.toSeq
  }

  /** Driver-local Kahn-wave replay of [[topoLayers]] — identical
    * semantics: wave r assigns layer r to the zero-in-degree remainder,
    * capped at maxRounds; unresolved (deeper or cyclic) stay null. */
  private def topoLocal(
      edgeRows: Array[(Long, Long)], maxRounds: Int)
      : Seq[(Long, Option[Long])] = {
    import scala.collection.mutable
    val outAdj = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    val indeg = mutable.LongMap.empty[Long]
    val nodesSet = mutable.LongMap.empty[Unit]
    for ((s, d) <- edgeRows.distinct) {
      outAdj.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += d
      indeg(d) = indeg.getOrElse(d, 0L) + 1L
      nodesSet(s) = (); nodesSet(d) = ()
    }
    val layer = mutable.LongMap.empty[Long]
    var remaining = nodesSet.keys.toSet
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val srcs = remaining.filter(n => indeg.getOrElse(n, 0L) == 0L)
      if (srcs.isEmpty) done = true
      else {
        srcs.foreach { n => layer(n) = round.toLong }
        remaining --= srcs
        for (s <- srcs; d <- outAdj.getOrElse(s, mutable.ArrayBuffer.empty))
          indeg(d) = indeg(d) - 1L
        round += 1
      }
    }
    nodesSet.keys.toSeq.map(n => n -> layer.get(n))
  }

  /** Driver-local replay of the [[kTruss]] peel — identical rounds:
    * per-edge support = the triangle count |N(u)∩N(v)| over the
    * surviving canonical edges, edges under `minSup` peel, same
    * maxRounds/convergence contract, final (src, dst, support) readout
    * (support 0 for triangle-less survivors — the left-join coalesce).
    * All-integer, value-exact against the distributed loop. */
  private def kTrussLocal(
      canonical: Array[(Long, Long)], minSup: Long, maxRounds: Int)
      : Seq[(Long, Long, Long)] = {
    import scala.collection.mutable
    def supportOf(es: Array[(Long, Long)]): mutable.Map[(Long, Long), Long] = {
      val adj = mutable.LongMap.empty[mutable.Set[Long]]
      es.foreach { case (s, d) =>
        adj.getOrElseUpdate(s, mutable.Set.empty) += d
        adj.getOrElseUpdate(d, mutable.Set.empty) += s
      }
      val sup = mutable.Map.empty[(Long, Long), Long]
      es.foreach { case (s, d) =>
        val (a, b) =
          if (adj(s).size <= adj(d).size) (adj(s), adj(d)) else (adj(d), adj(s))
        var c = 0L
        a.foreach(w => if (b.contains(w)) c += 1L)
        sup((s, d)) = c
      }
      sup
    }
    var edges = canonical
    var n = edges.length.toLong
    var rounds = 0
    var converged = n == 0L
    while (!converged && rounds < maxRounds) {
      val sup = supportOf(edges)
      val e2 = edges.filter(e => sup(e) >= minSup)
      val n2 = e2.length.toLong
      edges = e2
      converged = n2 == n || n2 == 0L
      n = n2
      rounds += 1
    }
    val sup = supportOf(edges)
    edges.toSeq.map { case (s, d) => (s, d, sup((s, d))) }
  }

  /** Driver-local replay of the [[kCore]] peel — identical rounds:
    * degrees over the surviving canonical edges, the <k node cut, the
    * same maxRounds/convergence contract (n unchanged or zero), and
    * the final (node, degree) readout over what survives. All-integer,
    * so value-exact against the distributed loop. */
  private def kCoreLocal(
      canonical: Array[(Long, Long)], k: Int, maxRounds: Int)
      : Seq[(Long, Long)] = {
    import scala.collection.mutable
    var edges = canonical
    var n = edges.length.toLong
    var rounds = 0
    var converged = n == 0L
    while (!converged && rounds < maxRounds) {
      val deg = mutable.LongMap.empty[Long]
      edges.foreach { case (s, d) =>
        deg(s) = deg.getOrElse(s, 0L) + 1L
        deg(d) = deg.getOrElse(d, 0L) + 1L
      }
      val e2 = edges.filter { case (s, d) => deg(s) >= k && deg(d) >= k }
      val n2 = e2.length.toLong
      edges = e2
      converged = n2 == n || n2 == 0L
      n = n2
      rounds += 1
    }
    val deg = mutable.LongMap.empty[Long]
    edges.foreach { case (s, d) =>
      deg(s) = deg.getOrElse(s, 0L) + 1L
      deg(d) = deg.getOrElse(d, 0L) + 1L
    }
    deg.toSeq
  }

  /** Driver-local Jones–Plassmann replay of [[greedyColoring]] —
    * identical waves: round r colors every remaining node with no
    * remaining smaller-id neighbor, color = the same sorted-distinct
    * mex fold over the PRE-WAVE colored full neighborhood. */
  private def coloringLocal(
      canonical: Array[(Long, Long)], maxRounds: Int)
      : Seq[(Long, Option[Long])] = {
    import scala.collection.mutable
    val adj = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    // remaining smaller-neighbor count per node (canonical src < dst:
    // exactly the dst side waits)
    val waitCnt = mutable.LongMap.empty[Long]
    val smallerOf = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    val nodesSet = mutable.LongMap.empty[Unit]
    for ((s, d) <- canonical) {
      adj.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += d
      adj.getOrElseUpdate(d, mutable.ArrayBuffer.empty) += s
      waitCnt(d) = waitCnt.getOrElse(d, 0L) + 1L
      smallerOf.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += d
      nodesSet(s) = (); nodesSet(d) = ()
    }
    def mexOf(cs: Seq[Long]): Long = {
      var acc = 0L
      cs.distinct.sorted.foreach(x => if (x == acc) acc += 1)
      acc
    }
    val color = mutable.LongMap.empty[Long]
    var remaining = nodesSet.keys.toSet
    var round = 0
    var done = false
    val empty = mutable.ArrayBuffer.empty[Long]
    while (!done && round < maxRounds) {
      val winners = remaining.filter(n => waitCnt.getOrElse(n, 0L) == 0L)
      if (winners.isEmpty) done = true
      else {
        // colors from BEFORE this wave only (the waveC snapshot)
        val newColors = winners.toSeq.map { n =>
          n -> mexOf(adj.getOrElse(n, empty).toSeq
            .filter(color.contains).map(color(_)))
        }
        newColors.foreach { case (n, c) => color(n) = c }
        remaining --= winners
        for (w <- winners; d <- smallerOf.getOrElse(w, empty)
             if remaining(d)) waitCnt(d) = waitCnt(d) - 1L
        round += 1
      }
    }
    nodesSet.keys.toSeq.map(n => n -> color.get(n))
  }

  /** Driver-local replay of [[maximalMatching]]'s synchronous rounds:
    * round r matches every edge that is the minimum incident edge of
    * BOTH endpoints under the canonical (src, dst) order, peels the
    * endpoints, repeats; a bound-exhausted residual surfaces with null
    * round exactly like the distributed loop. */
  private def matchingLocal(
      canonical: Array[(Long, Long)], maxRounds: Int)
      : Seq[(Long, Long, Option[Long])] = {
    import scala.collection.mutable
    var edges = canonical.toVector
    val out = mutable.ArrayBuffer.empty[(Long, Long, Option[Long])]
    var round = 0
    var done = false
    val ord = Ordering.Tuple2[Long, Long]
    while (!done && round < maxRounds && edges.nonEmpty) {
      val minOf = mutable.LongMap.empty[(Long, Long)]
      for (e <- edges; n <- Seq(e._1, e._2)) {
        val cur = minOf.get(n)
        if (cur.isEmpty || ord.lt(e, cur.get)) minOf(n) = e
      }
      val wave = edges.filter(e => minOf(e._1) == e && minOf(e._2) == e)
      if (wave.isEmpty) done = true
      else {
        wave.foreach { case (s, d) => out += ((s, d, Some(round.toLong))) }
        val matchedNodes = wave.flatMap(e => Seq(e._1, e._2)).toSet
        edges = edges.filterNot(e =>
          matchedNodes(e._1) || matchedNodes(e._2))
        round += 1
      }
    }
    if (round == maxRounds && edges.nonEmpty)
      edges.foreach { case (s, d) => out += ((s, d, None)) }
    out.toSeq
  }

  /**
   * Node2vec-biased random walks (Grover & Leskovec 2016 — the GDS
   * Node2Vec sampling layer): second-order walks where the next hop x
   * from node v (arrived from prev) is drawn ∝ α(prev, x): α = 1/p to
   * return (x = prev), 1 for a triangle-closing x also adjacent to
   * prev (BFS-ish), 1/q for a two-hops-out x (DFS-ish). The bias is
   * carried as INTEGER weights — `returnWeight : commonWeight :
   * farWeight` encodes p = commonWeight/returnWeight and
   * q = commonWeight/farWeight — so selection is exact integer
   * arithmetic end-to-end, reproducible across runs, partitionings
   * and engines (the [[randomWalks]] md5-coin discipline extended
   * from uniform argmin to weighted inverse-CDF choice).
   *
   * Selection: ONE md5 coin c ∈ [0, 2³²) per (walk, step); candidates
   * ordered by ascending neighbor id carry cumulative integer weights;
   * chosen = first candidate with cum > (c·W) >> 32, W = total weight.
   * The shift keeps the product exact in long arithmetic (W is degree
   * × max-weight — far under 2³¹ for any sane hub; Spark 4's ANSI
   * mode fails loudly on overflow rather than wrapping). The first
   * step has no prev: uniform (all weights 1).
   *
   * Scale shape per step: one adjacency×walk equi-join for the
   * neighbor fanout (≤ 2|E| rows), one (prev, x) adjacency membership
   * LEFT join for the dist-1 class, and one per-walk window whose
   * partitions are single neighborhoods (degree-bounded, never
   * corpus-wide); step state is a scratch table ([[pageRank]] loop
   * discipline). The second-order "memory" is just the walk table's
   * prev column — no per-task state, no arrays.
   */
  def node2vecWalks(
      edges: DataFrame,
      steps: Int = 3,
      returnWeight: Long = 1L,
      commonWeight: Long = 4L,
      farWeight: Long = 16L,
      salt: String = "n2v"): DataFrame = {
    import graft.ops.Scratch
    import org.apache.spark.sql.expressions.Window
    require(steps >= 1, "steps must be >= 1")
    require(returnWeight >= 1L && commonWeight >= 1L && farWeight >= 1L,
      "bias weights must be positive integers")
    val spark = edges.sparkSession
    val e0 = canonicalEdges(edges)
    val (adj, adjPath) = Scratch.materializeAt(
      e0.select(col("src").as("n"), col("dst").as("x"))
        .union(e0.select(col("dst").as("n"), col("src").as("x"))),
      "n2v_adj")
    // per-step state is ONE fixed-width row per walk — driver-pinned
    // (Pin.state, enforced row/byte gate) instead of a per-step scratch
    // write+read; the over-bound fallback is the scratch table
    val tables = new scala.collection.mutable.ArrayBuffer[DataFrame]
    var cur = graft.ops.Pin.state(
      adj.select(col("n").as("walk")).distinct()
        .select(col("walk"), lit(0).as("step"), col("walk").as("node"),
          lit(null).cast("long").as("prev")),
      "n2v_step0")
    tables += cur
    for (i <- 1 to steps) {
      val cand = adj.join(cur, adj("n") === cur("node"))
        .select(cur("walk"), cur("node").as("at"), cur("prev"),
          adj("x").as("cx"))
      // dist-1 membership probe: candidate also adjacent to prev?
      val probe = adj.select(col("n").as("prev"), col("x").as("cx"),
        lit(1).as("isadj"))
      val weighted = cand.join(probe, Seq("prev", "cx"), "left")
        .withColumn("wt",
          when(col("prev").isNull, lit(1L))
            .when(col("cx") === col("prev"), lit(returnWeight))
            .when(col("isadj").isNotNull, lit(commonWeight))
            .otherwise(lit(farWeight)))
      val wAll = Window.partitionBy(col("walk"))
      val wCum = wAll.orderBy(col("cx").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val coin = conv(substring(md5(concat_ws(":", lit(salt),
        col("walk").cast("string"), lit(i).cast("string"))), 1, 8), 16, 10)
        .cast("long")
      cur = graft.ops.Pin.state(
        weighted
          .withColumn("cum", sum(col("wt")).over(wCum))
          .withColumn("tw", sum(col("wt")).over(wAll))
          .withColumn("target", shiftright(coin * col("tw"), 32))
          .filter(col("cum") > col("target"))
          .groupBy(col("walk"))
          .agg(min(struct(col("cx"), col("at"))).as("m"))
          .select(col("walk"), lit(i).as("step"), col("m.cx").as("node"),
            col("m.at").as("prev")),
        s"n2v_step$i")
      tables += cur
    }
    Scratch.drop(spark, adjPath)
    tables.map(_.select(col("walk"), col("step"), col("node")))
      .reduce(_ union _)
  }

  /**
   * WEIGHTED deterministic random walks (the GDS RandomWalk
   * relationship-weight semantic): the next hop is drawn ∝ the edge's
   * integer weight — heavier ties are proportionally likelier — via
   * the same exact inverse-CDF machinery as [[node2vecWalks]] (one
   * md5 coin per (walk, step), cumulative integer weights in
   * ascending neighbor-id order, target (coin·W) >> 32). Parallel
   * edges sum their weights at canonicalization. [[randomWalks]] is
   * the uniform special case (different selection mechanics, same
   * reproducibility guarantee).
   */
  def weightedRandomWalks(
      edges: DataFrame,
      steps: Int = 3,
      weightCol: String = "weight",
      salt: String = "wwalk"): DataFrame = {
    import graft.ops.Scratch
    import org.apache.spark.sql.expressions.Window
    require(steps >= 1, "steps must be >= 1")
    val spark = edges.sparkSession
    val e0 = edges.filter(col("src") =!= col("dst"))
      .groupBy(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .agg(sum(col(weightCol).cast("long")).as("w"))
      .filter(col("w") > 0L)
    val (adj, adjPath) = Scratch.materializeAt(
      e0.select(col("src").as("n"), col("dst").as("x"), col("w"))
        .union(e0.select(col("dst").as("n"), col("src").as("x"), col("w"))),
      "wwalk_adj")
    // same driver-pinned per-step state as randomWalks/node2vecWalks
    val tables = new scala.collection.mutable.ArrayBuffer[DataFrame]
    var cur = graft.ops.Pin.state(
      adj.select(col("n").as("walk")).distinct()
        .select(col("walk"), lit(0).as("step"), col("walk").as("node")),
      "wwalk_step0")
    tables += cur
    for (i <- 1 to steps) {
      val wAll = Window.partitionBy(col("walk"))
      val wCum = wAll.orderBy(col("cx").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val coin = conv(substring(md5(concat_ws(":", lit(salt),
        col("walk").cast("string"), lit(i).cast("string"))), 1, 8), 16, 10)
        .cast("long")
      cur = graft.ops.Pin.state(
        adj.join(cur, adj("n") === cur("node"))
          .select(cur("walk"), adj("x").as("cx"), adj("w").as("wt"))
          .withColumn("cum", sum(col("wt")).over(wCum))
          .withColumn("tw", sum(col("wt")).over(wAll))
          .withColumn("target", shiftright(coin * col("tw"), 32))
          .filter(col("cum") > col("target"))
          .groupBy(col("walk"))
          .agg(min(col("cx")).as("node"))
          .select(col("walk"), lit(i).as("step"), col("node")),
        s"wwalk_step$i")
      tables += cur
    }
    Scratch.drop(spark, adjPath)
    tables.reduce(_ union _)
  }

  /**
   * Shortest-path TREE: the [[shortestPaths]] hop-bounded weighted
   * SSSP that also RECONSTRUCTS the winning path (the GDS Dijkstra
   * source-target surface returns node-id sequences, not just costs).
   * The path rides the relaxation as an id array inside the min
   * struct: comparison is (distance, then LEXICOGRAPHICALLY smallest
   * node sequence) — a total order, so among equal-cost routes the
   * winner is deterministic across runs, partitionings and engines.
   * With multiple seeds the winning origin is `path[0]`.
   *
   * Scale note: rows carry O(maxHops) id arrays — the per-row state
   * is bounded by the hop bound, never by graph size; the loop is the
   * same one-join-one-aggregate round as [[shortestPaths]].
   */
  def shortestPathTree(
      edges: DataFrame,
      sources: DataFrame,
      maxHops: Int = 4,
      weightCol: Option[String] = None,
      directed: Boolean = false): DataFrame = {
    import graft.ops.Scratch
    require(maxHops >= 1, "maxHops must be >= 1")
    val spark = edges.sparkSession
    val e0 = (weightCol, directed) match {
      case (None, false) =>
        canonicalEdges(edges).withColumn("w", lit(1.0d))
      case (None, true) =>
        edges.filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst")).distinct()
          .withColumn("w", lit(1.0d))
      case (Some(wc), false) =>
        edges.filter(col("src") =!= col("dst"))
          .groupBy(least(col("src"), col("dst")).as("src"),
            greatest(col("src"), col("dst")).as("dst"))
          .agg(sum(col(wc).cast("double")).as("w"))
          .filter(col("w") > 0.0d)
      case (Some(wc), true) =>
        edges.filter(col("src") =!= col("dst"))
          .groupBy(col("src"), col("dst"))
          .agg(sum(col(wc).cast("double")).as("w"))
          .filter(col("w") > 0.0d)
    }
    val adjBase = e0.select(col("src"), col("dst"), col("w"))
    val (adj, adjPath) = Scratch.materializeAt(
      if (directed) adjBase
      else adjBase.union(
        e0.select(col("dst").as("src"), col("src").as("dst"), col("w"))),
      "spt_adj")
    var dist = sources.select(col(sources.columns.head).as("node")).distinct()
      .select(col("node"), lit(0.0d).as("dist"),
        array(col("node")).as("path"))
    var distPath: String = null
    for (_ <- 1 to maxHops) {
      val relaxed = adj.join(dist, adj("src") === dist("node"))
        .select(adj("dst").as("node"), (dist("dist") + adj("w")).as("d"),
          concat(dist("path"), array(adj("dst"))).as("p"))
      val (next, nextPath) = Scratch.materializeAt(
        dist.select(col("node"), col("dist").as("d"), col("path").as("p"))
          .union(relaxed)
          .groupBy(col("node"))
          .agg(min(struct(col("d"), col("p"))).as("m"))
          .select(col("node"), col("m.d").as("dist"), col("m.p").as("path")),
        "spt_dist")
      if (distPath != null) Scratch.drop(spark, distPath)
      dist = next
      distPath = nextPath
    }
    Scratch.drop(spark, adjPath)
    dist.select(col("node"), col("dist"),
      array_join(transform(col("path"), x => x.cast("string")), "->")
        .as("path"))
  }

  /**
   * Minimum spanning forest by Borůvka rounds (Borůvka 1926; the GDS
   * spanning-tree surface — GDS 2.1 ships Prim, whose sequential
   * frontier is the one shape a shuffle engine cannot run; Borůvka is
   * the standard distributed rendition and computes the SAME forest
   * under distinct edge weights). Per round, every component selects
   * its minimum-weight outgoing edge under the TOTAL order
   * (w, src, dst) — the id tie-break makes the forest unique and
   * engine-reproducible even with duplicate weights — selected edges
   * join the forest, and touching components merge. Component count at
   * least halves per round, so `maxRounds` = ⌈log₂ V⌉ completes; an
   * early exit fires the first round the OBSERVED cross-edge count
   * hits zero (forest complete).
   *
   * Scale shape per round: two label equi-joins to tag edge endpoints,
   * one keyed min-struct aggregate for the per-component pick (never a
   * corpus-wide window), and a component-graph merge over ≤ #components
   * selected pairs delegated to [[Corpus.connectedComponents]] (its
   * observed-count-gated union-find / pointer-jumping switch). Labels
   * live in scratch tables ([[pageRank]] loop discipline) — the plan
   * stays constant-size in rounds; per-round selections are
   * materialized once and the returned frame unions those scans.
   *
   * Returns (src, dst, w, round): the forest edges with the round that
   * selected each. sum(w) is the forest weight; counting rows against
   * `V - #components` certifies completeness.
   */
  def boruvkaMst(
      edges: DataFrame,
      maxRounds: Int = 8,
      weightCol: Option[String] = None): DataFrame = {
    import graft.ops.Scratch
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges.sparkSession
    val e0 = weightCol match {
      case None => canonicalEdges(edges).withColumn("w", lit(1L))
      case Some(wc) =>
        // canonical undirected pair; parallel edges keep the cheapest
        edges.filter(col("src") =!= col("dst"))
          .groupBy(least(col("src"), col("dst")).as("src"),
            greatest(col("src"), col("dst")).as("dst"))
          .agg(min(col(wc)).as("w"))
    }
    val (e, ePath) = Scratch.materializeAt(
      e0.select(col("src"), col("dst"), col("w")), "mst_edges")
    // empty seed built from the PRE-materialization plan (folds to an
    // empty LocalRelation), not the scratch scan — the returned union
    // must stay readable after the edge table is retired below
    val empty = e0.select(col("src"), col("dst"), col("w"),
      lit(1).as("round")).filter(lit(false))
    // per-round state (node→component labels, selected edges) is one
    // fixed-width row per node / per component — driver-pinned under
    // the Pin gate with the convergence count taken from the collected
    // length; the observed scratch write is the unchanged fallback
    var (comp, compPath) = graft.ops.Pin.stateAt(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
        .distinct().select(col("node"), col("node").as("comp")),
      "mst_comp")
    var out: DataFrame = empty
    var done = false
    for (r <- 1 to maxRounds if !done) {
      val cs = comp.select(col("node").as("src"), col("comp").as("cs"))
      val cd = comp.select(col("node").as("dst"), col("comp").as("cd"))
      val cross = e.join(cs, Seq("src")).join(cd, Seq("dst"))
        .filter(col("cs") =!= col("cd"))
      // both endpoints' components compete for the edge; the min struct
      // is totally ordered by (w, src, dst) so the pick is unique
      val sides = cross.select(col("cs").as("c"), col("w"), col("src"),
          col("dst"), col("cd"))
        .unionByName(cross.select(col("cd").as("c"), col("w"), col("src"),
          col("dst"), col("cs").as("cd")))
      val selPlan = sides.groupBy(col("c"))
        .agg(min(struct(col("w"), col("src"), col("dst"), col("c").as("ca"),
          col("cd").as("cb"))).as("m"))
        .select(col("m.w").as("w"), col("m.src").as("src"),
          col("m.dst").as("dst"), col("m.ca").as("ca"), col("m.cb").as("cb"))
        .groupBy(col("src"), col("dst"), col("w"))
        .agg(min(col("ca")).as("ca"), max(col("cb")).as("cb"))
      val (sel, nSel) = graft.ops.Pin.collectBounded(selPlan) match {
        case Some(rows) =>
          import scala.jdk.CollectionConverters._
          (spark.createDataFrame(rows.toSeq.asJava, selPlan.schema),
            rows.length.toLong)
        case None =>
          val (s2, m, _) = Scratch.materializeObservedAt(
            selPlan, s"mst_sel_$r", count(lit(1)).as("n"))
          (s2, m("n").asInstanceOf[Long])
      }
      if (nSel == 0L) done = true
      else {
        out = out.unionByName(
          sel.select(col("src"), col("dst"), col("w"), lit(r).as("round")))
        // merge the touching components: min label over the selected
        // component pairs, applied back onto every node's label
        val merged = Corpus.connectedComponents(
          sel.select(col("ca"), col("cb")), aCol = "ca", bCol = "cb")
          .select(col("id").as("comp"), col("label"))
        val (nextComp, nextPath) = graft.ops.Pin.stateAt(
          comp.join(merged, Seq("comp"), "left")
            .select(col("node"), coalesce(col("label"), col("comp")).as("comp")),
          s"mst_comp_$r")
        // the new label table supersedes the old one the moment it is
        // written — retire it eagerly (kShortestDistances discipline)
        // instead of accumulating O(rounds) dead parquet dirs
        Scratch.drop(spark, compPath)
        comp = nextComp
        compPath = nextPath
      }
    }
    // only the mst_sel_* scans the returned frame reads must survive:
    // the edge table and the final label table back no output scan
    Scratch.drop(spark, ePath)
    Scratch.drop(spark, compPath)
    out
  }

  /**
   * K-shortest path costs (the GDS Yen's-surface analogue for COSTS):
   * for every reachable node, the `k` smallest DISTINCT path costs from
   * the source set within `maxHops` edges, ranked ascending. Bounded
   * Bellman-Ford relaxation carrying a k-cost frontier instead of one
   * minimum — correct by optimal substructure: the j-th smallest
   * distinct cost at v via edge (u,v) extends one of the k smallest
   * distinct costs at u (any cost outside u's top-k has k smaller
   * distinct extensions, all ≤ it), so per-round top-k pruning loses
   * nothing the final top-k needs, hop bound included.
   *
   * State is FLAT (node, cost) rows, ≤ k per node — never an
   * unbounded array; the per-round candidate volume at a node is
   * k·(in-degree+1), so in-degree is an enforced contract
   * ([[Blocks.guardBlockSize]]) exactly like the wedge-join family:
   * a 10M-in-degree hub at 100× would otherwise mint a 10M·k
   * aggregation buffer on one key. Each round is one adjacency
   * equi-join + one keyed sorted-set aggregate over a scratch table
   * ([[shortestPaths]] loop discipline).
   *
   * Returns (node, k_idx, dist): rank 1..k by ascending cost.
   */
  def kShortestDistances(
      edges: DataFrame,
      sources: DataFrame,
      k: Int = 3,
      maxHops: Int = 4,
      weightCol: Option[String] = None,
      directed: Boolean = true,
      maxInDegree: Long = 100000L): DataFrame = {
    import graft.ops.Scratch
    require(k >= 1, "k must be >= 1")
    require(maxHops >= 1, "maxHops must be >= 1")
    val spark = edges.sparkSession
    val e0 = (weightCol, directed) match {
      case (None, false) =>
        canonicalEdges(edges).withColumn("w", lit(1.0d))
      case (None, true) =>
        edges.filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst")).distinct()
          .withColumn("w", lit(1.0d))
      case (Some(wc), false) =>
        edges.filter(col("src") =!= col("dst"))
          .groupBy(least(col("src"), col("dst")).as("src"),
            greatest(col("src"), col("dst")).as("dst"))
          .agg(sum(col(wc).cast("double")).as("w"))
          .filter(col("w") > 0.0d)
      case (Some(wc), true) =>
        edges.filter(col("src") =!= col("dst"))
          .groupBy(col("src"), col("dst"))
          .agg(sum(col(wc).cast("double")).as("w"))
          .filter(col("w") > 0.0d)
    }
    val adjBase = e0.select(col("src"), col("dst"), col("w"))
    val adjAll =
      if (directed) adjBase
      else adjBase.union(
        e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val (adj, adjPath) = Scratch.materializeAt(
      Blocks.guardBlockSize(adjAll, "dst", maxInDegree, "kShortestDistances",
        hint = "the per-round candidate volume at a node is k x in-degree "
          + "- truncate the adjacency upstream or raise maxInDegree "
          + "deliberately",
        boundName = "maxInDegree"),
      "ksp_adj")
    var st = sources.select(col(sources.columns.head).as("node"))
      .distinct().withColumn("d", lit(0.0d))
    var stPath: String = null
    // per-hop state is ≤ k fixed-width rows per reached node —
    // driver-pinned under the Pin gate (see pageRank), scratch past it
    for (_ <- 1 to maxHops) {
      val relaxed = adj.join(st, adj("src") === st("node"))
        .select(adj("dst").as("node"), (st("d") + adj("w")).as("d"))
      val (next, nextPath) = graft.ops.Pin.stateAt(
        st.select(col("node"), col("d"))
          .union(relaxed)
          .groupBy(col("node"))
          .agg(slice(array_sort(collect_set(col("d"))), 1, k).as("ds"))
          .select(col("node"), explode(col("ds")).as("d")),
        "ksp_state")
      if (stPath != null) Scratch.drop(spark, stPath)
      st = next
      stPath = nextPath
    }
    Scratch.drop(spark, adjPath)
    st.groupBy(col("node"))
      .agg(array_sort(collect_set(col("d"))).as("ds"))
      .select(col("node"), posexplode(col("ds")))
      .select(col("node"), (col("pos") + 1L).cast("long").as("k_idx"),
        col("col").as("dist"))
  }

  /**
   * Influence maximization (the GDS alpha "Influence Maximization
   * (CELF)" surface, Kempe/Kleinberg/Tardos 2003 greedy): pick `k`
   * seed nodes maximizing expected spread under the independent-cascade
   * model, spread estimated over `samples` deterministic LIVE-EDGE
   * graphs — each undirected edge is live in sample r iff its
   * md5("icm:r:src:dst") coin clears the p·2³² integer threshold (the
   * [[Corpus.coin]] discipline: reproducible, oracle-re-derivable). In
   * an undirected live-edge graph a seed's reach IS its connected
   * component, so spread = Σ over samples of the distinct component
   * sizes the seed set touches — greedy marginal gain is one keyed
   * aggregate per round over the precomputed (sample, node, component,
   * size) table.
   *
   * Scale shape: the per-sample live graphs reuse
   * [[connectedComponents]] (the observed-count-gated CC loop) —
   * `samples` bounded runs at build time; the assignment table
   * materializes ONCE and every greedy round is one anti-filter +
   * keyed sum + a 1-row argmax head (the documented bounded-collect
   * discipline: k·(samples+1) driver rows total). The covered set
   * rides into each round as ≤ k·samples literals, never a join
   * against driver state.
   *
   * Returns (rank, node, gain, cum_spread): gain = the seed's marginal
   * summed component sizes across samples (exact integers; divide by
   * `samples` for the expected-spread estimate), cum_spread the running
   * total. Fewer than `k` rows when every component is covered first.
   */
  def influenceMaximization(
      edges: DataFrame,
      k: Int = 3,
      p: Double = 0.15,
      samples: Int = 3,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    import graft.ops.Scratch
    require(k >= 1, "k must be >= 1")
    require(p > 0.0 && p < 1.0, "p must be in (0,1)")
    require(samples >= 1, "samples must be >= 1")
    val spark = edges.sparkSession
    val threshold = (p * 4294967296.0).toLong // exact shared literal
    val e = canonicalEdges(edges.select(col(srcCol).as("src"),
      col(dstCol).as("dst")))
    val (eMat, ePath) = Scratch.materializeAt(e, "icm_edges")
    val nodes = eMat.select(col("src").as("node"))
      .union(eMat.select(col("dst").as("node"))).distinct()
    val perSample = (0 until samples).map { r =>
      val coin = conv(substring(md5(concat_ws(":",
        lit("icm"), lit(r), col("src"), col("dst"))), 1, 8), 16, 10)
        .cast("long")
      val live = eMat.filter(coin < threshold)
      val cc = Corpus.connectedComponents(live, aCol = "src", bCol = "dst")
      nodes.join(cc.select(col("id").as("node"), col("label")),
          Seq("node"), "left")
        .select(lit(r).as("sample"), col("node"),
          coalesce(col("label"), col("node")).as("comp"))
    }
    // the assignment table is samples × |nodes| fixed-width rows —
    // driver-pinned under the Pin gate (every greedy round scans it),
    // scratch past it
    val assignAll = perSample.reduce(_ unionByName _)
    val (asgn0, aPath) = graft.ops.Pin.stateAt(assignAll, "icm_assign")
    val sizes = asgn0.groupBy(col("sample"), col("comp"))
      .agg(count(lit(1)).as("csize"))
    val (asgn, a2Path) = graft.ops.Pin.stateAt(
      asgn0.join(sizes, Seq("sample", "comp")), "icm_scored")
    Scratch.drop(spark, aPath)
    var covered = Seq.empty[(Int, Long)] // (sample, comp) pairs, <= k*samples
    var chosen = Seq.empty[Long]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    var cum = 0L
    var exhausted = false
    for (rank <- 1 to k if !exhausted) {
      val uncovered =
        if (covered.isEmpty) asgn
        else asgn.filter(!covered.map { case (s, c) =>
          col("sample") === s && col("comp") === c }.reduce(_ || _))
      val gains = (if (chosen.isEmpty) uncovered
        else uncovered.filter(!col("node").isin(chosen: _*)))
        .groupBy(col("node")).agg(sum(col("csize")).as("gain"))
        .orderBy(col("gain").desc, col("node").asc)
        .limit(1).collect()
      if (gains.isEmpty) exhausted = true
      else {
        val node = gains.head.getLong(0)
        val gain = gains.head.getLong(1)
        cum += gain
        out += ((rank, node, gain, cum))
        chosen :+= node
        covered ++= asgn.filter(col("node") === node)
          .select(col("sample"), col("comp")).collect()
          .map(x => (x.getInt(0), x.getLong(1)))
      }
    }
    Scratch.drop(spark, ePath)
    Scratch.drop(spark, a2Path)
    import spark.implicits._
    out.toSeq.toDF("rank", "node", "gain", "cum_spread")
      .select(col("rank").cast("int").as("rank"), col("node"),
        col("gain"), col("cum_spread"))
  }

  /**
   * Katz centrality (the GDS/graph-theory attenuated-path score; Katz
   * 1953): fixed `iters` rounds of x ← 1 + α·A·x over the SYMMETRIZED
   * canonical edge set, x₀ = 1 — counts walks of every length into a
   * node, each damped by α per hop, so it reads like "PageRank without
   * the out-degree division": a hub's influence is NOT split among its
   * neighbors. No normalization (β = 1 supplies the scale), so leaves
   * keep score 1 and the readout is in absolute walk units.
   *
   * Determinism is the [[eigenvectorCentrality]] discipline: each
   * neighbor-sum takes 9-dp-rounded scores under a DECIMAL(28,12) sum
   * (summation-order-exact), the α multiply and +1 are single IEEE
   * double ops on bit-identical operands, and each round's score is
   * 9-dp-rounded back. Scale shape: one adjacency×scores equi-join +
   * keyed aggregate per round against scratch tables (constant-size
   * plans), the node-universe left join keeps zero-in-degree nodes at
   * the β floor; nothing driver-side, nothing broadcast that is
   * O(graph).
   */
  def katzCentrality(
      edges: DataFrame, alpha: Double = 0.05, iters: Int = 3,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    import graft.ops.Scratch
    require(iters >= 1, "iters must be >= 1")
    require(alpha > 0.0d && alpha < 1.0d, "alpha must be in (0, 1)")
    val spark = edges.sparkSession
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val e0 = canonicalEdges(edges)
    val (adj, nAdj, adjPath) = symAdjacency(edges, "katz")
    tryLocalPairs(adj, nAdj, maxLocalEdges).foreach { case (ids, ladj) =>
      // driver-local replay: same decimal contribution rounds; every
      // node keeps a score each round (the left-join semantics —
      // no-contribution nodes take coalesce(·, 0.0))
      Scratch.drop(spark, adjPath)
      val score = Array.fill(ids.length)(1.0d)
      val all = Array.fill(ids.length)(true)
      for (_ <- 1 to iters) {
        val (contrib, _) = localContribRound(ladj, score, all)
        var v = 0
        while (v < ids.length) {
          val c = if (contrib(v) == null) 0.0d else contrib(v).doubleValue
          score(v) = roundD(1.0d + alpha * c, 9)
          v += 1
        }
      }
      val rows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(ids.indices.map { v =>
          org.apache.spark.sql.Row(ids(v), roundD(score(v), 6))
        }: _*)
      return spark.createDataFrame(rows,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("katz",
            org.apache.spark.sql.types.DoubleType, nullable = true))))
    }
    val nodes = adj.select(col("src").as("node")).distinct()
    var scores = nodes.withColumn("score", lit(1.0d))
    var scoresPath: String = null // round 0 is a projection of adj
    for (_ <- 1 to iters) {
      val contrib = adj.join(scores, adj("src") === scores("node"))
        .groupBy(adj("dst").as("node"))
        .agg(sum(round(col("score"), 9).cast(dec)).as("c"))
      val (next, nextPath) = Scratch.materializeAt(
        nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            round(lit(1.0d) + lit(alpha) *
              coalesce(col("c").cast("double"), lit(0.0d)), 9).as("score")),
        "katz_scores")
      if (scoresPath != null) Scratch.drop(spark, scoresPath)
      scores = next
      scoresPath = nextPath
    }
    Scratch.drop(spark, adjPath)
    scores.select(col("node"), round(col("score"), 6).as("katz"))
  }

  /**
   * Global 4-cycle (rectangle) count — the bipartite-ish cousin of the
   * triangle count: C4s are the smallest cycles a bipartite graph CAN
   * have, so rectangle density is the clustering signal where triangles
   * are structurally impossible (user×item, doc×term graphs). Counts
   * via diagonal pairs: for each node pair (a, b) with c common
   * neighbors, C(c,2) cycles cross that diagonal, and every 4-cycle has
   * exactly 2 diagonals — #C4 = Σ c(c−1) / 4. Emits one row:
   * co-neighbor pair count, pairs with ≥2 shared neighbors (the
   * closable diagonals), and the rectangle count.
   *
   * Exact INTEGER arithmetic end-to-end (DECIMAL(38,0) for the Σc(c−1)
   * accumulator; the /4 is exact by the 2-diagonals identity). Scale
   * shape: the [[commonNeighborsTopK]] wedge self-join with the same
   * ENFORCED `maxDegree` contract (per-node wedge fanout is quadratic
   * in degree — the guard fails fast with the offending count), one
   * keyed count, one global aggregate.
   */
  def rectangleCount(
      edges: DataFrame, maxDegree: Long = 100000): DataFrame = {
    import graft.ops.Scratch
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val e = Scratch.materialize(canonicalEdges(edges), "c4_edges")
    // fanOutByKey(n) — see Par.fanOutByKey: the wedge expansion must
    // not run at the 1–2-task parallelism AQE's byte-based coalescing
    // gives a byte-small adjacency; keyed aggregates on n reuse it
    val adj0 = graft.ops.Par.fanOutByKey(
      e.select(col("src").as("n"), col("dst").as("x"))
        .union(e.select(col("dst").as("n"), col("src").as("x"))), col("n"))
    val adj = Blocks.guardBlockSize(adj0, "n", maxDegree,
      "rectangleCount",
      hint = "the wedge fanout is quadratic in node degree - truncate "
        + "per-node adjacency upstream or raise maxDegree deliberately",
      boundName = "maxDegree")
    val a1 = adj.select(col("n"), col("x").as("a"))
    val a2 = adj.select(col("n"), col("x").as("b"))
    a1.join(a2, Seq("n")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_diagonal_pairs"),
        coalesce(sum(col("c").cast(dec) * (col("c") - 1L)),
          lit(0L).cast(dec)).as("s"))
      .select(col("n_pairs"),
        coalesce(col("n_diagonal_pairs"), lit(0L)).as("n_diagonal_pairs"),
        (col("s") / lit(4)).cast("long").as("rectangles"))
  }
}
