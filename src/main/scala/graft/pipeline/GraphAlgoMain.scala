package graft.pipeline

import graft.operators.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * CLI entry point for warehouse-side graph analytics — the third job
 * surface next to [[Main]] (graph projection) and [[CurateMain]]
 * (corpus curation). The reference's whole pipeline exists to load
 * graphs INTO a graph engine and run algorithms there (reference
 * `README.md:287-289`: GDS on the loaded projection); this CLI runs the
 * same first-line algorithms directly over the warehouse edge table, so
 * a user can answer degree/rank/community/path questions without a
 * round-trip through an external engine.
 *
 *   --input <edges.parquet>      edge frame (parquet dir/file)
 *   --algo <name>                degrees | degree_histogram | pagerank |
 *                                pagerank_directed | pagerank_personalized |
 *                                triangles | clustering_coeff |
 *                                components | label_propagation | kcore |
 *                                ktruss |
 *                                shortest_paths | common_neighbors |
 *                                node_similarity | adamic_adar |
 *                                harmonic | closeness | betweenness |
 *                                eigenvector | articlerank | hits |
 *                                modularity | conductance | assortativity |
 *                                distance_distribution |
 *                                random_walks | fastrp
 *   --output <dir>               result parquet
 *   --src src --dst dst          edge endpoint columns (default src/dst)
 *   --weight <col>               optional weight column (pagerank_directed,
 *                                shortest_paths)
 *   --iters 3 --damping 0.85     power-iteration dials
 *   --rounds 3                   label_propagation rounds
 *   --steps 3                    random_walks hops
 *   --dims 8                     fastrp embedding dimensions
 *   --k 10                       top-k (common_neighbors, node_similarity)
 *   --kcore_k 3                  k-core threshold
 *   --max_hops 4                 shortest-paths hop bound
 *   --source <id>                shortest-paths source node (default:
 *                                minimum src id; matched as string)
 *   --seed <id> | --seed_mod N   pagerank_personalized seed set (one node,
 *                                or every Nth node id)
 *   --landmark_mod N             harmonic landmark sample (every Nth node
 *                                id; default scores all nodes)
 *   --master <spark master>      default local[*]
 *
 * Example:
 *   runMain graft.pipeline.GraphAlgoMain --input /data/edges.parquet \
 *     --algo pagerank --iters 5 --output /data/ranks
 */
object GraphAlgoMain {
  def main(args: Array[String]): Unit = {
    val opts = Cli.parseArgs(args)
    val spark = SparkSession.builder()
      .master(opts.getOrElse("master", "local[*]"))
      .appName("graft-graph")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      if (opts.get("debug").exists(Cli.strtobool)) "INFO" else "WARN")
    try run(spark, opts) finally spark.stop()
  }

  /** The job body, session-agnostic (tests drive it on the shared
    * session; `main` owns session lifecycle). */
  private[graft] def run(spark: SparkSession, opts: Map[String, String]): Unit = {
    def req(k: String): String = opts.getOrElse(k,
      sys.error(s"missing required flag --$k"))
    val srcCol = opts.getOrElse("src", "src")
    val dstCol = opts.getOrElse("dst", "dst")
    val raw = spark.read.parquet(req("input"))
    val edges = raw.select(
      Seq(col(srcCol).as("src"), col(dstCol).as("dst")) ++
        opts.get("weight").map(w => col(w).as("w")): _*)
    val iters = opts.get("iters").map(_.toInt).getOrElse(3)
    val damping = opts.get("damping").map(_.toDouble).getOrElse(0.85)
    val k = opts.get("k").map(_.toInt).getOrElse(10)
    val weight = opts.get("weight").map(_ => "w")

    val result: DataFrame = req("algo") match {
      case "degrees" => Graph.degrees(edges)
      case "degree_histogram" => Graph.degreeHistogram(edges)
      case "pagerank" => Graph.pageRank(edges, iters, damping)
      case "pagerank_directed" =>
        Graph.pageRankDirected(edges, iters, damping, weightCol = weight)
      case "pagerank_personalized" =>
        // --seed_mod N seeds every Nth node id; --seed ID seeds one node
        val seeds = (opts.get("seed"), opts.get("seed_mod")) match {
          case (Some(id), _) => edges.select(col("src").as("node"))
            .union(edges.select(col("dst").as("node")))
            .filter(col("node").cast("string") === id).distinct()
          case (None, Some(m)) => edges.select(col("src").as("node"))
            .union(edges.select(col("dst").as("node")))
            .filter(pmod(col("node"), lit(m.toInt)) === 0).distinct()
          case (None, None) =>
            sys.error("pagerank_personalized needs --seed ID or --seed_mod N")
        }
        Graph.pageRankPersonalized(edges, seeds, iters, damping)
      case "triangles" => Graph.triangleCount(edges)
      case "clustering_coeff" => Graph.localClusteringCoefficient(edges)
      case "components" => Graph.connectedComponents(edges)
      case "label_propagation" =>
        Graph.labelPropagation(edges, opts.get("rounds").map(_.toInt).getOrElse(3))
      case "kcore" =>
        Graph.kCore(edges, opts.get("kcore_k").map(_.toInt).getOrElse(3))
      case "ktruss" =>
        Graph.kTruss(edges, opts.get("truss_k").map(_.toInt).getOrElse(4))
      case "shortest_paths" =>
        val sources = opts.get("source") match {
          case Some(id) => edges.select(col("src").as("node"))
            .union(edges.select(col("dst").as("node")))
            .filter(col("node").cast("string") === id).distinct()
          case None => edges.agg(min(col("src")).as("node"))
        }
        Graph.shortestPaths(edges, sources,
          maxHops = opts.get("max_hops").map(_.toInt).getOrElse(4),
          weightCol = weight)
      case "common_neighbors" => Graph.commonNeighborsTopK(edges, k)
      case "node_similarity" => Graph.nodeSimilarityTopK(edges, k)
      case "adamic_adar" => Graph.adamicAdarTopK(edges, k)
      case "harmonic" =>
        // --landmark_mod N scores every Nth node id (exact per scored
        // node); default scores all — Θ(V·V) frontier on dense graphs
        val landmarks = opts.get("landmark_mod").map { m =>
          edges.select(col("src").as("node"))
            .union(edges.select(col("dst").as("node")))
            .filter(pmod(col("node"), lit(m.toInt)) === 0).distinct()
        }
        Graph.harmonicCentrality(edges,
          maxHops = opts.get("max_hops").map(_.toInt).getOrElse(3),
          sources = landmarks)
      case "closeness" | "betweenness" =>
        val landmarks = opts.get("landmark_mod").map { m =>
          edges.select(col("src").as("node"))
            .union(edges.select(col("dst").as("node")))
            .filter(pmod(col("node"), lit(m.toInt)) === 0).distinct()
        }
        val hops = opts.get("max_hops").map(_.toInt).getOrElse(3)
        if (req("algo") == "closeness")
          Graph.closenessCentrality(edges, hops, landmarks)
        else Graph.betweennessCentrality(edges, hops, landmarks)
      case "eigenvector" => Graph.eigenvectorCentrality(edges, iters)
      case "articlerank" => Graph.articleRank(edges, iters, damping)
      case "hits" => Graph.hits(edges, iters)
      case "distance_distribution" =>
        val landmarks = opts.get("landmark_mod").map { m =>
          edges.select(col("src").as("node"))
            .union(edges.select(col("dst").as("node")))
            .filter(pmod(col("node"), lit(m.toInt)) === 0).distinct()
        }
        Graph.distanceDistribution(edges,
          maxHops = opts.get("max_hops").map(_.toInt).getOrElse(3),
          sources = landmarks)
      case "modularity" | "conductance" =>
        // communities from --labels <parquet (node,label)>, or derived
        // in-job by LPA when the flag is absent
        val communities = opts.get("labels") match {
          case Some(p) => spark.read.parquet(p)
          case None => Graph.labelPropagation(edges,
            opts.get("rounds").map(_.toInt).getOrElse(3))
        }
        if (req("algo") == "modularity") Graph.modularity(edges, communities)
        else Graph.conductance(edges, communities)
      case "assortativity" => Graph.degreeAssortativity(edges)
      case "random_walks" =>
        Graph.randomWalks(edges, opts.get("steps").map(_.toInt).getOrElse(3))
      case "fastrp" =>
        val it = opts.get("iters").map(_.toInt).getOrElse(2)
        Graph.fastRP(edges,
          dims = opts.get("dims").map(_.toInt).getOrElse(8),
          iterations = it,
          iterationWeights = Seq.fill(it)(1.0))
      case other => sys.error(
        s"unknown --algo '$other' (see GraphAlgoMain scaladoc for the list)")
    }
    val out = req("output")
    result.write.mode("overwrite").parquet(out)
    val n = spark.read.parquet(out).count()
    println(s"[graft-graph] ${req("algo")} -> $out: $n rows")
  }
}
