package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× scale-probe fixture for the dedup spine (see Bench): replicates a
  * base `documents` table `factor`× with a controlled duplicate
  * structure, so the banded/blocked dedup operators can be timed at two
  * scales and their observed scaling compared against the sub-quadratic
  * design claims. Deterministic end to end (md5 coins, no RNG), written
  * once and reused across bench runs. */
object ScaleProbe {

  /** The queries whose 100×-safety claims the probe measures. The graph
    * spine (pagerank / triangles / common-neighbors) rides a 10×
    * lineitem replica whose id offsets keep the copies DISJOINT
    * subgraphs — 10× nodes and edges at the same degree distribution,
    * so wedge-join and power-iteration work should grow ~linearly. */
  val spineQueries: Seq[String] =
    Seq("dedup_lsh_jaccard", "dedup_clusters", "dedup_simhash_pairs", "decontaminate",
      "graph_pagerank", "graph_triangles", "graph_common_neighbors",
      // all-sources BFS (frontier rows) and per-step walk joins — the
      // round-7 iterative additions with the largest intermediate state
      "graph_harmonic", "graph_random_walks",
      // round-9 families: the multi-distinct audit Expand, the
      // history-anti-join incremental dedup, and the token-explode +
      // TakeOrdered vocabulary coverage — all expected ~linear
      "dq_audit", "dedup_incremental", "vocab_oov",
      // round-10: the fixed-round peel loops (per-round work is
      // O(remaining edges), rounds constant — expected ~linear; the
      // disjoint-subgraph replica keeps per-round winner fractions)
      "graph_matching", "graph_toposort")

  /** Generate `outDir/documents.parquet` = base replicated `factor`×
    * (skipped when already present). Each copy k rewrites the text with a
    * k-rotated lowercase alphabet (`translate`): length, token shape and
    * shingle counts are preserved, but every shingle/minhash/simhash
    * value changes, so copy strata are mutually DISSIMILAR — the probe
    * corpus is `factor` independent corpora with exactly the base
    * duplicate rate. That is the honest scaling experiment: work should
    * grow ~linearly in rows. (A fixture whose copies stay near-dups of
    * their originals instead multiplies the duplicate DENSITY, and the
    * dedup spine's cost is lower-bounded by its output pair count —
    * measured 40× at 10× on such a fixture, telling you about the
    * corpus, not the operators.) Ids are offset per copy. */
  def ensureFixture(spark: SparkSession, sfDir: String, outDir: String, factor: Int): Unit = {
    val marker = new java.io.File(s"$outDir/_PROBE_READY")
    if (marker.exists()) return
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val nBase = base.count()
    val copies = spark.range(factor.toLong).select(col("id").as("copy"))
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val rotated = (1 until factor).foldLeft(col("text")) { (acc, k) =>
      when(col("copy") === k,
        translate(col("text"), alpha, alpha.drop(k % 26) + alpha.take(k % 26)))
        .otherwise(acc)
    }
    base.crossJoin(copies)
      .select(
        (col("doc_id") + col("copy") * lit(nBase)).as("doc_id"),
        rotated.as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    // graph spine fixture: the two lineitem columns the co-purchase
    // derivation reads, replicated with per-copy id offsets. The partkey
    // offset is a multiple of 4 so the fixture's `partkey % 4` thinning
    // selects the same stratum in every copy; the order offset keeps
    // baskets disjoint. Result: `factor` isomorphic disconnected
    // subgraphs — same degrees, factor× the nodes/edges/triangles.
    if (new java.io.File(s"$sfDir/lineitem.parquet").exists()) {
      // carry the audit columns verbatim (per-copy distributions
      // identical to base) so the dq_audit spine query runs against the
      // same replica; keys still offset per copy as before
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_returnflag"), col("l_shipdate"))
      val mx = li.agg(max(col("l_orderkey")), max(col("l_partkey"))).head()
      // an EMPTY lineitem file max()-aggregates to nulls — skip the
      // graph-spine replica rather than NPE before the marker is written
      if (!mx.isNullAt(0) && !mx.isNullAt(1)) {
        val oOff = mx.getLong(0) + 1L
        val pOff = (mx.getLong(1) / 4L + 1L) * 4L
        li.crossJoin(copies)
          .select(
            (col("l_orderkey") + col("copy") * lit(oOff)).as("l_orderkey"),
            (col("l_partkey") + col("copy") * lit(pOff)).as("l_partkey"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_returnflag"), col("l_shipdate"))
          .repartition(8)
          .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
      }
    }
    marker.getParentFile.mkdirs()
    marker.createNewFile()
    ()
  }
}
