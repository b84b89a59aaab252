package graft

import graft.model.{EdgeSpec, GraphModel, NodeSpec}
import graft.ops.{GraphOps, Stats}
import graft.pipeline.GraphProjection
import graft.sink.ParquetWireSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator from SURVEY.md §2 (or an
  * extension operator); `oracleSql` holds the DuckDB-equivalent SQL over the
  * same parquet tables. Column names are aliased identically on both sides —
  * the driver sorts columns by name before hashing.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The §7.3 minimum end-to-end slice: customer as node source, orders as
    * edge source, regex-routed, canonically projected, written through the
    * wire-schema sink with the nodes-before-edges barrier; returns the
    * 3-row stats frame (node, edge, final). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val model = GraphModel(
      name = "flagship",
      nodes = Seq(NodeSpec(
        source = ".*customer.*parquet",
        keyField = Some("c_custkey"),
        properties = Map("c_acctbal" -> "acctbal", "c_mktsegment" -> "segment"))),
      edges = Seq(EdgeSpec(
        source = ".*orders.*parquet",
        sourceField = Some("o_custkey"),
        targetField = Some("o_orderkey"),
        properties = Map("o_totalprice" -> "totalprice"))))
    val out = java.nio.file.Files.createTempDirectory("graft_entry").toString
    val res = GraphProjection.run(
      spark, model,
      nodePattern = Seq(s"$dir/customer.parquet"),
      edgePattern = Seq(s"$dir/orders.parquet"),
      sink = new ParquetWireSink(out))
    Stats.toDataset(spark, res.nodeStats ++ res.edgeStats :+ res.finalStats).toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.2 P1: provenance tagging via input_file_name ----
    "p1_provenance" -> ((s, dir) => {
      val c = GraphOps.tagProvenance(t(s, dir, "customer"))
      val o = GraphOps.tagProvenance(t(s, dir, "orders"))
      c.unionByName(o, allowMissingColumns = true)
        .select(regexp_extract(col(GraphOps.SrcCol), "([^/]+)\\.parquet", 1).as("file"))
        .groupBy("file").agg(count(lit(1)).as("n"))
    }),
    // ---- §2.2 P3: regex routing (anchored first-match, over provenance) ----
    "p3_route_regex" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.withColumn("spec",
          when(GraphOps.matchesSource(col("source"), "src1"), "one")
            .when(GraphOps.matchesSource(col("source"), "src[02]"), "evenish")
            .otherwise("other"))
        .groupBy("spec").agg(count(lit(1)).as("n"))
    }),
    // ---- §2.2 P4: canonical node projection (rename-to-wire-schema) ----
    "p4_node_project" -> ((s, dir) => {
      val spec = NodeSpec(".*customer.*", keyField = Some("c_custkey"),
        properties = Map("c_acctbal" -> "acctbal", "c_mktsegment" -> "segment"))
      GraphOps.projectNode(t(s, dir, "customer"), spec)
    }),
    // ---- §2.2 P5: canonical edge projection ----
    "p5_edge_project" -> ((s, dir) => {
      val spec = EdgeSpec(".*orders.*", sourceField = Some("o_custkey"),
        targetField = Some("o_orderkey"),
        properties = Map("o_totalprice" -> "totalprice"))
      GraphOps.projectEdge(t(s, dir, "orders"), spec)
    }),
    // ---- §2.4 A1: monoid stats combine (count + nbytes) ----
    "a1_sum_results" -> ((s, dir) =>
      Stats.sumResults(t(s, dir, "documents"), "n_chars", "node")),
    // ---- §2.4 A2 + §2.5 U1: union of phase stats → final combine ----
    "u1_union_stats" -> ((s, dir) => {
      val n = Stats.sumResults(t(s, dir, "customer")
        .withColumn("b", lit(8L)), "b", "node")
      val e = Stats.sumResults(t(s, dir, "orders")
        .withColumn("b", lit(16L)), "b", "edge")
      Stats.combineFinal(Seq(n, e))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "p1_provenance" ->
      """SELECT 'customer' AS file, count(*) AS n FROM customer
         UNION ALL SELECT 'orders' AS file, count(*) AS n FROM orders""",
    "p3_route_regex" ->
      """SELECT CASE WHEN regexp_matches(source, '^(?:src1)') THEN 'one'
                     WHEN regexp_matches(source, '^(?:src[02])') THEN 'evenish'
                     ELSE 'other' END AS spec, count(*) AS n
         FROM documents GROUP BY 1""",
    "p4_node_project" ->
      """SELECT c_custkey AS "nodeId", c_acctbal AS acctbal,
                c_mktsegment AS segment FROM customer""",
    "p5_edge_project" ->
      """SELECT o_custkey AS "sourceNodeId", o_orderkey AS "targetNodeId",
                o_totalprice AS totalprice FROM orders""",
    "a1_sum_results" ->
      """SELECT count(*) AS "count", CAST(sum(n_chars) AS BIGINT) AS nbytes,
                'node' AS kind FROM documents""",
    "u1_union_stats" ->
      """SELECT (SELECT count(*) FROM customer) + (SELECT count(*) FROM orders) AS "count",
                (SELECT count(*)*8 FROM customer) + (SELECT count(*)*16 FROM orders) AS nbytes,
                'final' AS kind""",
  )
}
