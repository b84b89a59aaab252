package graft

import graft.model.{EdgeSpec, GraphModel, NodeSpec}
import graft.ops.{GraphOps, LoadResult, Stats}
import graft.pipeline.GraphProjection
import graft.sink.ParquetWireSink
import org.apache.spark.sql.functions._

class GraphPipelineSpec extends SparkTestBase {

  test("stats monoid: fold sums counts and bytes") {
    val rs = Seq(LoadResult(1, 10, "node"), LoadResult(2, 20, "node"), LoadResult(3, 30, "node"))
    assert(Stats.fold(rs, "node") == LoadResult(6, 60, "node"))
    assert(Stats.fold(Nil, "edge") == LoadResult(0, 0, "edge")) // identity
  }

  test("projectNode: canonical wire schema with renamed properties") {
    val df = spark.read.parquet(s"${sf()}/customer.parquet")
    val spec = NodeSpec(".*", keyField = Some("c_custkey"),
      properties = Map("c_acctbal" -> "acctbal"))
    val out = GraphOps.projectNode(df, spec)
    assert(out.columns.toSeq == Seq("nodeId", "acctbal"))
    assert(out.schema("nodeId").dataType.typeName == "long")
    assert(out.count() == df.count())
  }

  test("projectNode without properties carries all non-consumed columns") {
    val df = spark.read.parquet(s"${sf()}/customer.parquet")
    val out = GraphOps.projectNode(df, NodeSpec(".*", keyField = Some("c_custkey")))
    assert(out.columns.contains("nodeId") && !out.columns.contains("c_custkey"))
    assert(out.columns.toSet.size == df.columns.length) // all others carried
  }

  test("projectEdge: endpoints cast to long, optional type omitted") {
    val df = spark.read.parquet(s"${sf()}/orders.parquet")
    val spec = EdgeSpec(".*", sourceField = Some("o_custkey"),
      targetField = Some("o_orderkey"), properties = Map("o_totalprice" -> "price"))
    val out = GraphOps.projectEdge(df, spec)
    assert(out.columns.toSeq == Seq("sourceNodeId", "targetNodeId", "price"))
  }

  test("end-to-end projection with barrier + stats (§7.3 slice)") {
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val model = GraphModel(name = "t",
      nodes = Seq(NodeSpec(".*customer.*", keyField = Some("c_custkey"),
        properties = Map("c_acctbal" -> "acctbal"))),
      edges = Seq(EdgeSpec(".*orders.*", sourceField = Some("o_custkey"),
        targetField = Some("o_orderkey"))))
    val res = GraphProjection.run(spark, model,
      Seq(s"${sf()}/customer.parquet"), Seq(s"${sf()}/orders.parquet"),
      new ParquetWireSink(out))
    assert(res.nodeStats.map(_.count).sum == 150)
    assert(res.edgeStats.map(_.count).sum == 1500)
    assert(res.finalStats.kind == "final" && res.finalStats.count == 1650)
    // wire-schema output is readable and canonical
    val nodes = spark.read.parquet(s"$out/nodes")
    assert(nodes.columns.toSeq == Seq("nodeId", "acctbal"))
    val edges = spark.read.parquet(s"$out/edges")
    assert(edges.columns.contains("sourceNodeId"))
  }

  test("driver-side file routing: glob fans out to specs, unmatched files skipped") {
    val out = java.nio.file.Files.createTempDirectory("graft_route").toString
    val model = GraphModel(name = "multi",
      nodes = Seq(
        NodeSpec(".*customer.*parquet", keyField = Some("c_custkey"),
          properties = Map("c_acctbal" -> "acctbal")),
        NodeSpec(".*supplier.*parquet", keyField = Some("s_suppkey"),
          properties = Map("s_acctbal" -> "acctbal"))),
      edges = Seq(EdgeSpec(".*orders.*parquet", sourceField = Some("o_custkey"),
        targetField = Some("o_orderkey"))))
    // glob over the WHOLE directory: region/nation/part/... match no spec
    val res = GraphProjection.run(spark, model,
      Seq(s"${sf()}/*.parquet"), Seq(s"${sf()}/orders.parquet"),
      new ParquetWireSink(out))
    assert(res.nodeStats.map(_.count).sorted == Seq(10L, 150L)) // supplier + customer
    assert(res.edgeStats.map(_.count).sum == 1500)
  }

  test("sink enforces nodes-before-edges barrier") {
    val out = java.nio.file.Files.createTempDirectory("graft_barrier").toString
    val sink = new ParquetWireSink(out)
    sink.start()
    val edges = spark.range(3).select(col("id").as("sourceNodeId"), col("id").as("targetNodeId"))
    intercept[IllegalArgumentException] { sink.writeEdges(edges) }
  }

  test("routing filter keeps only matching provenance") {
    val tagged = GraphOps.scanParquet(spark, s"${sf()}/customer.parquet")
    assert(GraphOps.routeTo(tagged, ".*customer.*").count() == 150)
    assert(GraphOps.routeTo(tagged, ".*nomatch.*").count() == 0)
  }
}
