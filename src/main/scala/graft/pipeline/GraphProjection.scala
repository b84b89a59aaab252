package graft.pipeline

import graft.model.GraphModel
import graft.ops.{GraphOps, LoadResult, Stats}
import graft.sink.GdsSink
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * End-to-end graph projection — the Spark rendering of the reference's
 * pipeline lifecycle (pipeline.py:57-95 GCS mode; SURVEY.md §3):
 *
 *   job 1: scan node sources → route by regex → canonical node projection
 *          → sink.writeNodes (per spec) → stats
 *   barrier: sink.nodesDone()        (reference Signal DoFn, _dofn.py:50-77)
 *   job 2: same for edges → sink.writeEdges → stats
 *   sink.edgesDone(); fold stats → final LoadResult
 *
 * The reference's data-driven barrier (edge pattern emitted as data after
 * the node combine) becomes sequential driver code: Spark actions are
 * synchronous, so "all nodes before any edges" is just program order.
 *
 * Scale notes: each spec's scan/filter/projection is one declarative plan —
 * provenance routing compiles to a parquet `FileScan` + filter on
 * `input_file_name()` and model-driven pruning reaches the reader
 * (ReadSchema), so a 100 TB source only reads the spec's columns. No
 * driver-side data movement; stats come back via observed metrics.
 */
object GraphProjection {

  final case class Result(
      nodeStats: Seq[LoadResult],
      edgeStats: Seq[LoadResult],
      finalStats: LoadResult)

  /** Run a full projection of parquet sources through a model into a sink.
    * `nodePattern` / `edgePattern` are parquet path globs (the reference's
    * `--gcs_node_pattern` / `--gcs_edge_pattern`, pipeline.py:60,74). */
  def run(
      spark: SparkSession,
      model: GraphModel,
      nodePattern: Seq[String],
      edgePattern: Seq[String],
      sink: GdsSink): Result = {

    sink.start()

    val nodeStats = nodePattern.flatMap { pattern =>
      val tagged = GraphOps.scanParquet(spark, pattern)
      model.nodes.flatMap { spec =>
        val routed = GraphOps.routeTo(tagged, spec.source)
        val pruned = GraphOps.pruneFor(routed, spec.neededColumns)
        if (isEmptyFast(pruned)) None
        else Some(sink.writeNodes(GraphOps.projectNode(pruned, spec)))
      }
    }
    sink.nodesDone() // barrier: all nodes are loaded before any edge ships

    val edgeStats = edgePattern.flatMap { pattern =>
      val tagged = GraphOps.scanParquet(spark, pattern)
      model.edges.flatMap { spec =>
        val routed = GraphOps.routeTo(tagged, spec.source)
        val pruned = GraphOps.pruneFor(routed, spec.neededColumns)
        if (isEmptyFast(pruned)) None
        else Some(sink.writeEdges(GraphOps.projectEdge(pruned, spec)))
      }
    }
    sink.edgesDone()

    val folded = Stats.fold(nodeStats, "node") |+| Stats.fold(edgeStats, "edge")
    Result(nodeStats, edgeStats, folded.copy(kind = "final"))
  }

  /** Cheap emptiness probe: `isEmpty` on a filtered scan stops at the first
    * row (LIMIT 1 pushed into the scan) — no full pass. */
  private def isEmptyFast(df: DataFrame): Boolean = df.isEmpty
}
