package graft

import graft.model.{EdgeSpec, GraphModel, NodeSpec}
import graft.pipeline.GraphProjection
import graft.sink.ArrowIpcSink
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowStreamReader

class ArrowIpcSinkSpec extends SparkTestBase {

  test("pipeline through the Arrow IPC sink: readable streams, exact stats") {
    val out = java.nio.file.Files.createTempDirectory("graft_ipc").toString
    val model = GraphModel(name = "ipc",
      nodes = Seq(NodeSpec(".*customer.*parquet", keyField = Some("c_custkey"),
        properties = Map("c_acctbal" -> "acctbal", "c_mktsegment" -> "segment"))),
      edges = Seq(EdgeSpec(".*orders.*parquet", sourceField = Some("o_custkey"),
        targetField = Some("o_orderkey"))))
    val res = GraphProjection.run(spark, model,
      Seq(s"${sf()}/customer.parquet"), Seq(s"${sf()}/orders.parquet"),
      new ArrowIpcSink(out, batchSize = 64))

    assert(res.nodeStats.map(_.count).sum == 150)
    assert(res.edgeStats.map(_.count).sum == 1500)
    assert(res.nodeStats.map(_.nbytes).sum > 0)

    // read the IPC streams back with stock Arrow and re-count rows
    def readRows(dir: String): (Long, Seq[String]) = {
      val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrow"))
      assert(files.nonEmpty)
      val alloc = new RootAllocator(Long.MaxValue)
      var rows = 0L
      var fields: Seq[String] = Nil
      files.foreach { f =>
        val in = new java.io.FileInputStream(f)
        val reader = new ArrowStreamReader(in, alloc)
        val root = reader.getVectorSchemaRoot
        fields = root.getSchema.getFields.toArray.toSeq.map(_.toString)
        while (reader.loadNextBatch()) rows += root.getRowCount
        reader.close(); in.close()
      }
      alloc.close()
      (rows, fields)
    }
    val (nodeRows, nodeFields) = readRows(s"$out/nodes")
    assert(nodeRows == 150)
    assert(nodeFields.exists(_.contains("nodeId")))
    val (edgeRows, edgeFields) = readRows(s"$out/edges")
    assert(edgeRows == 1500)
    assert(edgeFields.exists(_.contains("sourceNodeId")))

    // exact-bytes invariant: stream files on disk sum to the reported nbytes
    def diskBytes(dir: String): Long =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrow"))
        .map(_.length()).sum
    assert(diskBytes(s"$out/nodes") == res.nodeStats.map(_.nbytes).sum)
    assert(diskBytes(s"$out/edges") == res.edgeStats.map(_.nbytes).sum)
  }
}
