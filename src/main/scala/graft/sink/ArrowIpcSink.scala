package graft.sink

import graft.ops.LoadResult
import org.apache.spark.sql.DataFrame

/**
 * Canonical-wire-schema sink emitting real Arrow IPC stream files — byte-
 * identical payloads to what the reference's `Neo4jArrowClient` ships
 * over Flight `do_put` (_dofn.py:96-141); `nbytes` is the EXACT IPC
 * stream size (SURVEY §7.4: "nbytes as the Arrow IPC size observed in
 * the sink"). Lifecycle and barrier identical to ParquetWireSink.
 */
final class ArrowIpcSink(outDir: String, batchSize: Int = 4096) extends GdsSink {
  private var started = false
  private var nodesFinished = false

  override def start(): Unit = { started = true }

  override def writeNodes(nodes: DataFrame): LoadResult = {
    require(started, "sink not started")
    val (rows, bytes) =
      org.apache.spark.sql.GraftArrow.writeIpcStream(nodes, s"$outDir/nodes", batchSize)
    LoadResult(rows, bytes, "node")
  }

  override def nodesDone(): Unit = { nodesFinished = true }

  override def writeEdges(edges: DataFrame): LoadResult = {
    require(nodesFinished, "edges before nodesDone() — barrier violated")
    val (rows, bytes) =
      org.apache.spark.sql.GraftArrow.writeIpcStream(edges, s"$outDir/edges", batchSize)
    LoadResult(rows, bytes, "edge")
  }

  override def edgesDone(): Unit = ()
}
