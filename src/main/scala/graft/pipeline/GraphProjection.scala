package graft.pipeline

import graft.model.GraphModel
import graft.ops.{GraphOps, LoadResult, Stats}
import graft.sink.GdsSink
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * End-to-end graph projection — the Spark rendering of the reference's
 * pipeline lifecycle (pipeline.py:57-95 GCS mode; SURVEY.md §3):
 *
 *   job 1: route node-source FILES to specs → scan per spec → canonical
 *          node projection → sink.writeNodes → stats
 *   barrier: sink.nodesDone()        (reference Signal DoFn, _dofn.py:50-77)
 *   job 2: same for edges → sink.writeEdges → stats
 *   sink.edgesDone(); fold stats → final LoadResult
 *
 * Routing happens at FILE granularity in the driver — exactly the
 * reference's semantics (provenance is the file path; every row of a file
 * shares it, pipeline.py:108,118) and the scale-correct plan: each spec's
 * scan touches ONLY its matching files (no full-corpus scan per spec, no
 * per-row regex filter), and model-driven column pruning reaches the
 * reader. Unmatched files are skipped, like batches with no matching
 * spec in the reference.
 *
 * The reference's data-driven barrier (edge pattern emitted as data after
 * the node combine) becomes sequential driver code: Spark actions are
 * synchronous, so "all nodes before any edges" is just program order.
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

    val nodeStats = routedReads(spark, nodePattern, model.nodes.map(_.source)).flatMap {
      case (specIdx, df) =>
        val spec = model.nodes(specIdx)
        val pruned = GraphOps.pruneFor(df, spec.neededColumns)
        Some(sink.writeNodes(GraphOps.projectNode(pruned, spec)))
    }
    sink.nodesDone() // barrier: all nodes are loaded before any edge ships

    val edgeStats = routedReads(spark, edgePattern, model.edges.map(_.source)).flatMap {
      case (specIdx, df) =>
        val spec = model.edges(specIdx)
        val pruned = GraphOps.pruneFor(df, spec.neededColumns)
        Some(sink.writeEdges(GraphOps.projectEdge(pruned, spec)))
    }
    sink.edgesDone()

    val folded = Stats.fold(nodeStats, "node") |+| Stats.fold(edgeStats, "edge")
    Result(nodeStats, edgeStats, folded.copy(kind = "final"))
  }

  /** Table mode — the Spark rendering of the reference's BigQuery
    * pipeline (run_bigquery_pipeline + get_streams, pipeline.py:100-178):
    * provenance is the TABLE NAME, routed through the model's spec
    * regexes; each matched table reads through the catalog with
    * model-driven column pruning (≙ ReadSession `selected_fields`,
    * _client.py:55-56), and scan parallelism is capped at `maxStreams`
    * (≙ `bq_max_stream_count` / the ReadSession 1000-stream cap,
    * pipeline.py:264-269, _client.py:30,46-54). Unmatched tables are
    * skipped like unmatched batches in the reference. */
  def runTables(
      spark: SparkSession,
      model: GraphModel,
      catalog: graft.sources.TableCatalog,
      nodeTables: Seq[String],
      edgeTables: Seq[String],
      sink: GdsSink,
      maxStreams: Int = 16384): Result = {
    sink.start()
    val nodeStats = nodeTables.flatMap { tbl =>
      model.nodeForSrc(tbl).map { spec =>
        val df = capStreams(catalog.readForNode(tbl, spec), maxStreams)
        sink.writeNodes(GraphOps.projectNode(df, spec))
      }
    }
    sink.nodesDone()
    val edgeStats = edgeTables.flatMap { tbl =>
      model.edgeForSrc(tbl).map { spec =>
        val df = capStreams(catalog.readForEdge(tbl, spec), maxStreams)
        sink.writeEdges(GraphOps.projectEdge(df, spec))
      }
    }
    sink.edgesDone()
    val folded = Stats.fold(nodeStats, "node") |+| Stats.fold(edgeStats, "edge")
    Result(nodeStats, edgeStats, folded.copy(kind = "final"))
  }

  /** Cap scan parallelism without a shuffle (coalesce merges splits).
    * Applied unconditionally: `coalesce(n)` never INCREASES partition
    * count, so when the scan is already under the cap it is a runtime
    * no-op — which retires the `df.rdd.getNumPartitions` probe this
    * method used to run (an RDD probe physical-plans the whole frame on
    * the driver per table read; the same cost `Par.fanOut` eliminated
    * with its file-index estimate, and here no estimate is needed). */
  private def capStreams(df: DataFrame, maxStreams: Int): DataFrame =
    df.coalesce(maxStreams)

  /** Expand the globs, route each file to its FIRST matching spec regex
    * (anchored, re.match semantics — same as GraphModel routing), and
    * build one tagged DataFrame per spec over only that spec's files. */
  private def routedReads(
      spark: SparkSession,
      patterns: Seq[String],
      specSources: Seq[String]): Seq[(Int, DataFrame)] = {
    val compiled = specSources.map(s => java.util.regex.Pattern.compile(s))
    val files = patterns.flatMap(expandGlob(spark, _))
    val bySpec = files
      .flatMap { f =>
        compiled.indexWhere(_.matcher(f).lookingAt()) match {
          case -1 => None // no matching spec: skipped, like the reference
          case i  => Some(i -> f)
        }
      }
      .groupBy(_._1)
    bySpec.toSeq.sortBy(_._1).map { case (specIdx, fs) =>
      // mergeSchema: the reference tolerates per-file dynamic schemas under
      // one spec (SURVEY §1.3); the merged footer read is driver-side only
      specIdx -> GraphOps.tagProvenance(
        spark.read.option("mergeSchema", "true").parquet(fs.map(_._2): _*))
    }
  }

  private def expandGlob(spark: SparkSession, pattern: String): Seq[String] = {
    val path = new Path(pattern)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(path)) match {
      case Some(statuses) if statuses.nonEmpty =>
        statuses.toSeq.flatMap { st =>
          if (st.isDirectory)
            fs.listStatus(st.getPath).toSeq.filter(_.isFile).map(_.getPath.toString)
          else Seq(st.getPath.toString)
        }
      case _ => Seq.empty
    }
  }
}
