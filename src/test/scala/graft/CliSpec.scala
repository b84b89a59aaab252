package graft

import graft.model.{EdgeSpec, GraphModel, NodeSpec}
import graft.pipeline.{Cli, GraphProjection}
import graft.sink.ParquetWireSink
import graft.sources.TableCatalog

class CliSpec extends SparkTestBase {

  test("strtobool matches the reference truth table (test_util.py:1-14)") {
    val cases = Seq( // the reference's table, extended with the full sets
      "yes" -> true, "Yes" -> true, "Y" -> true, "T" -> true,
      "OFF" -> false, "0" -> false,
      "y" -> true, "t" -> true, "true" -> true, "on" -> true, "1" -> true,
      "n" -> false, "no" -> false, "f" -> false, "false" -> false, "N" -> false)
    cases.foreach { case (in, want) => assert(Cli.strtobool(in) == want, in) }
    intercept[IllegalArgumentException](Cli.strtobool("maybe"))
    intercept[IllegalArgumentException](Cli.strtobool(""))
  }

  test("parseArgs: --k v pairs, bare boolean flags, list splitting") {
    val opts = Cli.parseArgs(Array(
      "--graph_json", "m.json", "--debug", "--neo4j_use_tls", "false",
      "--node_tables", "users, posts"))
    assert(opts("graph_json") == "m.json")
    assert(opts("debug") == "true") // store_true flag
    assert(Cli.strtobool(opts("neo4j_use_tls")) == false)
    assert(Cli.splitList(opts("node_tables")) == Seq("users", "posts"))
    assert(!opts.contains("missing"))
  }

  test("table mode: route table names, prune, cap streams, keep barrier") {
    // stage a tiny named-table catalog dir
    val dir = java.nio.file.Files.createTempDirectory("graft_tbl").toString
    spark.read.parquet(s"${sf()}/customer.parquet").write
      .mode("overwrite").parquet(s"$dir/users.parquet")
    spark.read.parquet(s"${sf()}/orders.parquet").write
      .mode("overwrite").parquet(s"$dir/orders.parquet")

    val model = GraphModel(name = "bq",
      nodes = Seq(NodeSpec("users", keyField = Some("c_custkey"),
        properties = Map("c_acctbal" -> "acctbal"))),
      edges = Seq(EdgeSpec("orders", sourceField = Some("o_custkey"),
        targetField = Some("o_orderkey"))))
    val out = java.nio.file.Files.createTempDirectory("graft_tbl_out").toString
    val res = GraphProjection.runTables(spark, model,
      new TableCatalog(spark, dir),
      nodeTables = Seq("users", "unmatched_table"), // unmatched → skipped
      edgeTables = Seq("orders"),
      sink = new ParquetWireSink(out),
      maxStreams = 1) // cap ≙ bq_max_stream_count
    val nodes = spark.read.parquet(s"$out/nodes")
    assert(nodes.columns.toSeq == Seq("nodeId", "acctbal"))
    assert(nodes.count() == spark.read.parquet(s"${sf()}/customer.parquet").count())
    assert(res.nodeStats.size == 1 && res.edgeStats.size == 1)
    assert(res.finalStats.kind == "final")
  }

  test("CurateMain.parseSplits: name=weight list, errors on malformed") {
    assert(graft.pipeline.CurateMain.parseSplits("train=0.9, valid=0.05,test=0.05")
      == Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
    intercept[RuntimeException](graft.pipeline.CurateMain.parseSplits("train:0.9"))
    intercept[IllegalArgumentException](graft.pipeline.CurateMain.parseSplits(""))
  }

  test("CurateMain: end-to-end curation job writes split shards") {
    import org.apache.spark.sql.functions.col
    // a 3-doc benchmark: those documents (if they survive dedup) must be
    // decontaminated away; everything else flows through
    val benchDir = java.nio.file.Files.createTempDirectory("graft_bench").toString
    spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(col("doc_id") < 3).select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(s"$benchDir/bench.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft_curate").toString + "/shards"
    graft.pipeline.CurateMain.run(spark, Map(
      "input" -> s"${sf()}/documents.parquet",
      "benchmark" -> s"$benchDir/bench.parquet",
      "output" -> out,
      "quality_keep" -> "0.9",
      "splits" -> "train=0.9,valid=0.1",
      "shards" -> "4"))
    val shards = spark.read.parquet(out)
    assert(shards.count() > 0)
    // benchmark docs never reach the shards
    assert(shards.filter(col("doc_id") < 3).count() == 0)
    // split leaves exist with the configured names only
    val splits = shards.select("split").distinct()
      .collect().map(_.get(0).toString).toSet
    assert(splits.subsetOf(Set("train", "valid")) && splits.contains("train"))
    // the written shards read back through the CATALOG as a partitioned
    // directory table, and a split filter prunes to its directories —
    // the curation write side and the catalog read side compose
    val cat = new TableCatalog(spark, new java.io.File(out).getParent)
    assert(cat.resolvedFormat("shards") == "dir")
    val train = cat.read("shards").filter(col("split") === "train")
    val scan = train.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "split")))
    assert(train.count() == shards.filter(col("split") === "train").count())
  }

  test("GraphAlgoMain: runs algorithms over an edge parquet, errors on unknown algo") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_galgo").toString
    // a K4 plus a pendant, with custom column names and a weight
    Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (1L, 4L, 1.0), (2L, 3L, 1.0),
      (2L, 4L, 1.0), (3L, 4L, 1.0), (4L, 5L, 2.0))
      .toDF("from_id", "to_id", "cost")
      .write.mode("overwrite").parquet(s"$dir/edges")
    def run(algo: String, extra: Map[String, String] = Map.empty): org.apache.spark.sql.DataFrame = {
      val out = s"$dir/out_$algo"
      graft.pipeline.GraphAlgoMain.run(spark, Map(
        "input" -> s"$dir/edges", "output" -> out, "algo" -> algo,
        "src" -> "from_id", "dst" -> "to_id") ++ extra)
      spark.read.parquet(out)
    }
    assert(run("degrees").count() == 5)
    assert(run("triangles").head().getLong(0) == 4L)
    assert(run("components").select("component").distinct().count() == 1)
    val core = run("kcore", Map("kcore_k" -> "3"))
    assert(core.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    assert(run("ktruss", Map("truss_k" -> "4")).count() == 6)
    val d = run("shortest_paths", Map("source" -> "5", "weight" -> "cost"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d(5L) == 0.0 && d(4L) == 2.0 && d(1L) == 3.0)
    val pr = run("pagerank", Map("iters" -> "2"))
    assert(math.abs(pr.agg(org.apache.spark.sql.functions.sum(col("rank")))
      .head().getDouble(0) - 1.0) < 1e-9)
    assert(run("harmonic").count() == 5)
    // K4 diagonals are edges; only the pendant pairs are predictable
    assert(run("adamic_adar").count() == 3)
    assert(run("random_walks", Map("steps" -> "2")).count() == 15)
    assert(run("closeness").count() == 5)
    // pendant path 5-4-...: node 4 carries all of 5's traffic
    assert(run("betweenness").filter(col("node") === 4L).count() == 1)
    assert(run("eigenvector").count() == 5)
    // in-job LPA labels; contributions exist for every community
    assert(run("modularity").count() >= 1)
    assert(run("conductance").count() >= 1)
    assert(run("assortativity").head().getLong(0) == 14L)
    assert(run("articlerank").count() == 5)
    assert(run("hits").count() == 5)
    assert(run("distance_distribution").count() >= 1)
    intercept[RuntimeException](run("nope"))
  }

  test("CurateMain: --temperature adds the mixture stage; exclusive with --mixture") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("graft_curate_mix").toString + "/shards"
    graft.pipeline.CurateMain.run(spark, Map(
      "input" -> s"${sf()}/documents.parquet",
      "output" -> out,
      "temperature" -> "2.0",
      "splits" -> "train=1.0",
      "shards" -> "2"))
    val mixed = spark.read.parquet(out)
    assert(mixed.count() > 0)
    // T=2 flattening: the smallest surviving source keeps everything,
    // so source-share ratios shrink toward 1 vs the unmixed run
    val outBase = java.nio.file.Files.createTempDirectory("graft_curate_base").toString + "/shards"
    graft.pipeline.CurateMain.run(spark, Map(
      "input" -> s"${sf()}/documents.parquet",
      "output" -> outBase, "splits" -> "train=1.0", "shards" -> "2"))
    val base = spark.read.parquet(outBase)
    def spread(df: org.apache.spark.sql.DataFrame): Double = {
      val ns = df.groupBy("source").count().collect().map(_.getLong(1).toDouble)
      ns.max / ns.min
    }
    assert(spread(mixed) <= spread(base) + 1e-9)
    intercept[IllegalArgumentException] {
      graft.pipeline.CurateMain.run(spark, Map(
        "input" -> s"${sf()}/documents.parquet", "output" -> out,
        "temperature" -> "2.0", "mixture" -> "web=0.5"))
    }
  }

  test("CurateMain: --span_frac adds the span-level boilerplate cut") {
    val outS = java.nio.file.Files.createTempDirectory("graft_curate_span").toString + "/shards"
    graft.pipeline.CurateMain.run(spark, Map(
      "input" -> s"${sf()}/documents.parquet",
      "output" -> outS,
      "span_frac" -> "0.95",
      "splits" -> "train=1.0",
      "shards" -> "2"))
    val spanned = spark.read.parquet(outS)
    assert(spanned.count() > 0)
    val outBase = java.nio.file.Files.createTempDirectory("graft_curate_nospan").toString + "/shards"
    graft.pipeline.CurateMain.run(spark, Map(
      "input" -> s"${sf()}/documents.parquet",
      "output" -> outBase, "splits" -> "train=1.0", "shards" -> "2"))
    // the span cut can only REMOVE documents vs the plain chain
    assert(spanned.count() <= spark.read.parquet(outBase).count())
  }

  test("CurateMain: --semantic_threshold adds the SemDeDup stage") {
    val outSem = java.nio.file.Files.createTempDirectory("graft_curate_sem").toString + "/shards"
    graft.pipeline.CurateMain.run(spark, Map(
      "input" -> s"${sf()}/documents.parquet",
      "embeddings" -> s"${sf()}/embeddings.parquet",
      "semantic_threshold" -> "0.40",
      "output" -> outSem,
      "splits" -> "train=1.0",
      "shards" -> "2"))
    val sem = spark.read.parquet(outSem)
    assert(sem.count() > 0)
    val outBase = java.nio.file.Files.createTempDirectory("graft_curate_nosem").toString + "/shards"
    graft.pipeline.CurateMain.run(spark, Map(
      "input" -> s"${sf()}/documents.parquet",
      "output" -> outBase, "splits" -> "train=1.0", "shards" -> "2"))
    // the semantic cut can only REMOVE documents vs the plain chain
    assert(sem.count() <= spark.read.parquet(outBase).count())
    // threshold without embeddings is a configuration error
    intercept[RuntimeException] {
      graft.pipeline.CurateMain.run(spark, Map(
        "input" -> s"${sf()}/documents.parquet", "output" -> outSem,
        "semantic_threshold" -> "0.40"))
    }
  }
}
