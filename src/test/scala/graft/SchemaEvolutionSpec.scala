package graft

import graft.model.{GraphModel, NodeSpec}
import graft.pipeline.GraphProjection
import graft.sink.ParquetWireSink
import org.apache.spark.sql.functions._

/** The reference tolerates per-file dynamic schemas under one spec
  * (SURVEY §1.3 / §7.4 risk item) — two parquet files with different
  * column sets routed to the same node spec must merge. */
class SchemaEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  test("heterogeneous files under one spec merge schemas") {
    val dir = java.nio.file.Files.createTempDirectory("graft_schema").toString
    Seq((1L, "a")).toDF("id", "p1").write.parquet(s"$dir/part_one.parquet")
    Seq((2L, "b", 9.5)).toDF("id", "p2", "p3").write.parquet(s"$dir/part_two.parquet")

    val out = java.nio.file.Files.createTempDirectory("graft_schema_out").toString
    val model = GraphModel(name = "evo",
      nodes = Seq(NodeSpec(".*part_.*", keyField = Some("id"))))
    val res = GraphProjection.run(spark, model,
      Seq(s"$dir/part_*.parquet"), Seq.empty, new ParquetWireSink(out))
    assert(res.nodeStats.map(_.count).sum == 2)

    val nodes = spark.read.parquet(s"$out/nodes")
    // all columns from both files survive; absent values are null
    assert(nodes.columns.toSet == Set("nodeId", "p1", "p2", "p3"))
    assert(nodes.filter(col("nodeId") === 1L).head.getAs[String]("p1") == "a")
    assert(nodes.filter(col("nodeId") === 2L).head.isNullAt(
      nodes.columns.indexOf("p1")))
  }
}
