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

  /** A scan of a scratch table written via
    * `Scratch.materializeObservedAt` — recognized by the
    * [[graft.ops.Scratch.observedMarker]] file the writer drops into
    * the directory. Its row count was MEASURED during the write (the
    * decontaminate / quantileNormalize gate discipline), so a broadcast
    * of it is bounded by observation, not hope; every future
    * `materializeObserved` site is covered with no whitelist edit. A
    * scratch table written WITHOUT observation never has the marker. */
  private def isGatedScratchScan(p: SparkPlan): Boolean = p match {
    case f: FileSourceScanLike =>
      f.relation.location.rootPaths.exists { rp =>
        val marker = new org.apache.hadoop.fs.Path(
          rp, graft.ops.Scratch.observedMarker)
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
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df =
        try fn(spark, dir)
        catch {
          case e: Throwable =>
            fail(s"query $name failed to BUILD at $dir: ${e.getMessage}")
        }
      df.queryExecution.sparkPlan.foreach {
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
}
