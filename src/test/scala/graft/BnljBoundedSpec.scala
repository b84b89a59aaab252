package graft

import org.apache.spark.sql.catalyst.optimizer.BuildLeft
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/**
 * Plan-hygiene invariant: a BroadcastNestedLoopJoin is only acceptable
 * when its BUILD side provably traces to a bounded frame — a literal
 * LocalTableScan, a limit, a grouping-free (1-row) aggregate, or a
 * scratch table that was materialized under an OBSERVED row-count gate
 * (the decontaminate / quantileNormalize pattern). Every gated query's
 * physical plan is walked; a future operator that broadcast-nested-loops
 * a data-sized relation fails THIS spec instead of shipping a 100 TB
 * cross-product.
 */
class BnljBoundedSpec extends SparkTestBase {

  /** A scan of a scratch table whose observed row count was ENFORCED
    * under a bound — recognized by the
    * [[graft.ops.Scratch.boundedMarker]] file that only
    * `Scratch.markBounded` drops, and markBounded performs the
    * `require(observed <= bound)` itself, so the marker cannot appear
    * without the check. The weaker `_GRAFT_OBSERVED` marker is
    * deliberately NOT accepted here: iterative loops observe
    * corpus-scale tables (louvain_edges, scc_edges, topo_edges, ...)
    * for convergence witnesses with no size enforcement, and a future
    * plan broadcasting one of those must fail this spec, not pass it
    * because its row count happened to be measured. */
  private def isGatedScratchScan(p: SparkPlan): Boolean = p match {
    case f: FileSourceScanLike =>
      f.relation.location.rootPaths.exists { rp =>
        val marker = new org.apache.hadoop.fs.Path(
          rp, graft.ops.Scratch.boundedMarker)
        try marker.getFileSystem(spark.sessionState.newHadoopConf())
          .exists(marker)
        catch { case scala.util.control.NonFatal(_) => false }
      }
    case _ => false
  }

  private def bounded(p: SparkPlan): Boolean = p match {
    case _: LocalTableScanExec => true
    case _: EmptyRelationExec => true
    case _: GlobalLimitExec | _: CollectLimitExec |
        _: TakeOrderedAndProjectExec => true
    case a: BaseAggregateExec =>
      a.groupingExpressions.isEmpty || bounded(a.child)
    case r: RangeExec => r.range.numElements <= BigInt(100000)
    case r: ReusedExchangeExec => bounded(r.child)
    case s if isGatedScratchScan(s) => true
    case other =>
      other.children.nonEmpty && other.children.forall(bounded)
  }

  /** Queries whose BNLJ build side is bounded by DATA SEMANTICS rather
    * than plan shape — each entry is a reviewed exception with the
    * reason. A new query that broadcast-nested-loops anything else
    * fails this spec until it is either restructured or argued onto
    * this list. */
  private val allowedByDataSemantics: Map[String, String] = Map(
    "emb_nearest_centroid" ->
      "build = per-LABEL centroid aggregate; labels are a class enum (k rows)",
    "emb_confusion" ->
      "same per-label centroid frame as emb_nearest_centroid",
    "retrieval_rrf" ->
      "build = single query vector (vec_id = 0 key filter)",
    "sim_cosine_topk" ->
      "build = 8 query vectors (vec_id < 8 key filter)",
    "sim_hamming_topk" ->
      "build = 8 query vectors + their sign words (vec_id < 8 key filter)",
    "retrieval_ndcg" ->
      "build = 8 query vectors + labels (vec_id < 8 key filter)",
    "sim_recall_at_k" ->
      "build = 8 query vectors, both rankings (vec_id < 8 key filter)",
    "sim_matryoshka_recall" ->
      "build = 8 query vectors, full + sliced (vec_id < 8 key filter)",
    "sim_ivfpq_recall" ->
      ("build = 8 query vectors (vec_id < 8 key filter) in the exact " +
        "bruteForceTopK side of the recall compare"),
    "sim_nsw_recall" ->
      ("build = 8 query vectors (vec_id < 8 key filter) in the exact " +
        "bruteForceTopK side of the NSW recall compare"),
    "sim_int8_topk" ->
      "build = 8 quantized query vectors (vec_id < 8 key filter)",
    "emb_hard_negatives" ->
      "build = 8 anchor vectors (vec_id < 8 key filter, bruteForceTopK shape)",
    "sim_pq_topk" ->
      "build = 1% query-vector sample (pmod(vec_id,100) = 0), ADC tables",
    "stats_chi2" ->
      "build = contingency-table marginals, grouped by a categorical enum",
    "stats_cramers_v" ->
      "build = same categorical contingency marginals")

  test("every gated query's BNLJ build side traces to a bounded frame") {
    val dir = sf() // sf0.001 — plan shapes, tiny data
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val sawAllowed = scala.collection.mutable.Set.empty[String]
    walked.foreach { case (name, plan) =>
      plan.foreach {
        case b: BroadcastNestedLoopJoinExec =>
          val build = if (b.buildSide == BuildLeft) b.left else b.right
          if (!bounded(build)) {
            if (allowedByDataSemantics.contains(name)) sawAllowed += name
            else offenders +=
              s"$name: BNLJ build side is unbounded:\n${build.treeString}"
          }
        case _ => ()
      }
    }
    assert(offenders.isEmpty,
      s"\n${offenders.size} unbounded BNLJ build side(s):\n" +
        offenders.mkString("\n---\n"))
    // staleness check: an exception that no longer has an unbounded
    // BNLJ should be deleted, not accumulate
    val stale = allowedByDataSemantics.keySet -- sawAllowed
    assert(stale.isEmpty,
      s"stale allowedByDataSemantics entries (no unbounded BNLJ found): $stale")
  }

  /** Every gated query's physical plan, built ONCE and shared by the
    * BNLJ and global-Window walks (building all queries materializes
    * their scratch tables — the expensive part of this suite). */
  private lazy val walked: Seq[(String, SparkPlan)] = {
    val dir = sf()
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val df =
        try fn(spark, dir)
        catch {
          case e: Throwable =>
            fail(s"query $name failed to BUILD at $dir: ${e.getMessage}")
        }
      name -> df.queryExecution.sparkPlan
    }
  }

  /** Queries whose UN-PARTITIONED Window (all rows into one task) runs
    * over a frame bounded by DATA SEMANTICS rather than plan shape —
    * each entry is a reviewed exception naming the bound. The
    * discipline this mechanizes: a global Window is fine over a
    * histogram / hypothesis / k-row frame (bhFdr's per-group
    * hypothesis table, ranked-stats' distinct-value histograms) and a
    * 100 TB scale-killer over corpus rows; a future operator shipping
    * a corpus-scale global sort now fails THIS spec instead of
    * shipping. */
  private val windowAllowedByDataSemantics: Map[String, String] = Map(
    "stats_fdr" ->
      ("bhFdr: step-up ordering over the HYPOTHESIS table — one row " +
        "per tested group, bounded by the grouping's construction"),
    "stats_ks_test" ->
      ("ksTest: CDF walk over the DISTINCT 6-dp-value histogram " +
        "(<= 1e6 values per unit range by the rounding discipline)"),
    "stats_mannwhitney" ->
      "mannWhitneyU: mid-ranks on the 6-dp score histogram (ksTest trade)",
    "stats_auc" ->
      "aucRoc: rank-sum identity over the same 6-dp score histogram",
    "stats_pr_curve" ->
      "prCurve: threshold walk over the DISTINCT-score histogram",
    "stats_gains" ->
      "gainsTable: decile walk over the DISTINCT-score histogram",
    "stats_spearman" ->
      ("spearmanCorr: doubled mid-ranks over each column's " +
        "distinct-value histogram, never the joint rows"),
    "stats_wasserstein" ->
      "wasserstein1: CDF-difference walk over the pooled value histogram",
    "stats_kaplan_meier" ->
      ("kaplanMeier: survival product over the DISTINCT event-time " +
        "table (risk sets per distinct time, not per subject)"),
    "dq_skew_report" ->
      ("keySkewReport: Gini from the count-of-counts histogram — the " +
        "window orders distinct COUNT values, never keys"),
    "vocab_zipf" ->
      ("zipfFit: min-rank cumulative over the count-VALUE histogram " +
        "(distinct frequency values, not the vocabulary)"))

  test("every gated query's un-partitioned Window runs over a bounded frame") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val sawAllowed = scala.collection.mutable.Set.empty[String]
    walked.foreach { case (name, plan) =>
      plan.foreach {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty =>
          if (!bounded(w.child)) {
            if (windowAllowedByDataSemantics.contains(name)) sawAllowed += name
            else offenders +=
              s"$name: un-partitioned Window over an unbounded frame:\n" +
                w.child.treeString
          }
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty =>
          if (!bounded(w.child)) {
            if (windowAllowedByDataSemantics.contains(name)) sawAllowed += name
            else offenders +=
              s"$name: un-partitioned WindowGroupLimit over an unbounded frame:\n" +
                w.child.treeString
          }
        case _ => ()
      }
    }
    assert(offenders.isEmpty,
      s"\n${offenders.size} unbounded global Window(s):\n" +
        offenders.mkString("\n---\n"))
    val stale = windowAllowedByDataSemantics.keySet -- sawAllowed
    assert(stale.isEmpty,
      s"stale windowAllowedByDataSemantics entries (no unbounded global " +
        s"Window found): $stale")
  }
}
