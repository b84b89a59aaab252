package graft

import graft.model.NodeSpec
import graft.operators.Dedup
import graft.ops.{LoadResult, SkewAgg, Stats}
import graft.sources.TableCatalog
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("salted agg equals plain groupBy agg") {
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 3.0, 3L), ("a", 4.5, 4L))
      .toDF("k", "v", "id")
    val salted = SkewAgg.saltedCountSum(df, "k", "v", col("id"), saltBuckets = 4)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted("a") == ((3L, 7.5)) && salted("b") == ((1L, 3.0)))
  }

  test("lshJaccard: exact duplicates found with jaccard 1.0") {
    val d = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "totally different words here zzz")).toDF("doc_id", "text")
    val out = Dedup.lshJaccard(d, minJaccard = 0.9).collect()
    assert(out.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getAs[Double]("jaccard") == 1.0))
  }

  test("lshJaccard: a mass-duplicate band bucket triggers the bucket guard") {
    val dup = (1L to 300L)
      .map(i => (i, "the same boilerplate text repeated everywhere zzz"))
      .toDF("doc_id", "text")
    val err = intercept[Exception] {
      Dedup.lshJaccard(dup, minJaccard = 0.9, maxBucketRows = 100).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(m =>
      m.contains("lshJaccard") && m.contains("maxBucketRows")))
    // a bound that admits the bucket lets the (deliberately) quadratic
    // output through: all 300·299/2 identical pairs at jaccard 1.0
    assert(Dedup.lshJaccard(dup, minJaccard = 0.9, maxBucketRows = 2000)
      .count() == 300L * 299L / 2L)
  }

  test("ppjoinJaccard: equals the Spark-side brute force (prefix filter loses no pair)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val t = 0.5
    val pp = Dedup.ppjoinJaccard(docs, minJaccard = t).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute force: all id pairs, exact distinct-token jaccard
    import graft.functions.TextFunctions.tokens
    val sets = docs.select(col("doc_id"), array_distinct(tokens(col("text"))).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val brute = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      c = (sa & sb).size
      j = c.toDouble / (sa.size + sb.size - c)
      if c * 1000000L >= math.round(t * 1e6) * (sa.size + sb.size - c)
    } yield (a, b) -> j).toMap
    assert(pp.keySet == brute.keySet)
    // pp is rounded half-up to 6 dp; compare against unrounded brute
    assert(pp.forall { case (k, v) => math.abs(v - brute(k)) < 1e-6 })
    assert(pp.nonEmpty)
  }

  test("ppjoinJaccard: a mass-duplicate corpus trips the prefix-bucket guard") {
    val dup = (1L to 300L)
      .map(i => (i, "the same boilerplate text repeated everywhere zzz"))
      .toDF("doc_id", "text")
    val err = intercept[Exception] {
      Dedup.ppjoinJaccard(dup, minJaccard = 0.9, maxBucketRows = 100).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(m =>
      m.contains("ppjoinJaccard") && m.contains("maxBucketRows")))
    // under a bound that admits the bucket: all identical pairs at 1.0
    assert(Dedup.ppjoinJaccard(dup, minJaccard = 0.9, maxBucketRows = 2000)
      .count() == 300L * 299L / 2L)
    // the TOTAL-candidate-volume contract trips independently of the
    // per-bucket bound (buckets fine, aggregate fanout not)
    val volErr = intercept[Exception] {
      Dedup.ppjoinJaccard(dup, minJaccard = 0.9, maxBucketRows = 2000,
        maxCandidateVolume = 1000L).collect()
    }
    assert(messages(volErr).exists(_.contains("maxCandidateVolume")))
  }

  test("spanDuplicates: shared window flags both docs, short docs use the truncated gram") {
    // docs 1 and 2 share the exact 4-token span "alpha beta gamma delta"
    // inside otherwise-different text; doc 3 shares nothing; doc 4 is a
    // 2-token doc (one truncated window, unique)
    val d = Seq(
      (1L, "one two alpha beta gamma delta three four"),
      (2L, "five six alpha beta gamma delta seven eight nine"),
      (3L, "totally unrelated words in this document body here"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val r = Dedup.spanDuplicates(d, spanTokens = 4).collect()
      .map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2), x.getBoolean(3)))).toMap
    assert(r(1L)._3 && r(2L)._3, "sharing docs flagged")
    assert(r(1L)._2 == 1 && r(2L)._2 == 1, "exactly the one shared window")
    assert(!r(3L)._3 && r(3L)._2 == 0)
    assert(r(4L) == ((1, 0, false)), "short doc: one truncated unique window")
    // identical docs: every window duplicated
    val twin = Seq((1L, "a b c d e f"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val t = Dedup.spanDuplicates(twin, spanTokens = 4).collect()
      .map(x => x.getLong(0) -> x.getInt(2)).toMap
    assert(t(1L) == 3 && t(2L) == 3)
  }

  test("crossLshJaccard: bipartite matches, no within-side pairs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "totally different words here zzz qqq vvv")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "totally different words here zzz qqq vvv")).toDF("bench_id", "text")
    val out = Dedup.crossLshJaccard(corpus, bench, minJaccard = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // each corpus doc hits its verbatim benchmark twin at jaccard 1.0
    assert(out((1L, 100L)) == 1.0 && out((2L, 101L)) == 1.0)
    // the dissimilar cross pairs are absent; ids come from both spaces
    assert(!out.contains((1L, 101L)) && !out.contains((2L, 100L)))
    // self-contained corpora: an empty benchmark yields no pairs
    assert(Dedup.crossLshJaccard(corpus, bench.limit(0), minJaccard = 0.0).count() == 0)
  }

  test("lshJaccard is a subset of blocked exact jaccard scores") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val lsh = Dedup.lshJaccard(docs, minJaccard = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every LSH-verified pair has the same jaccard the exact op computes
    val exact = Dedup.ngramJaccard(docs, blockCols = Seq("lang", "source"), minJaccard = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    lsh.foreach { case (pair, j) =>
      exact.get(pair).foreach(je => assert(je == j, s"pair $pair: lsh=$j exact=$je"))
    }
  }

  test("table catalog: lists tables, prunes columns, tags provenance") {
    val cat = new TableCatalog(spark, sf())
    assert(cat.tables.contains("customer") && cat.tables.contains("lineitem"))
    val spec = NodeSpec("customer", keyField = Some("c_custkey"),
      properties = Map("c_acctbal" -> "acctbal"))
    val df = cat.readForNode("customer", spec)
    assert(df.columns.toSet == Set("c_custkey", "c_acctbal", "src"))
    assert(df.select("src").distinct().collect().map(_.getString(0)).toSeq == Seq("customer"))
    assert(cat.planScan("customer") >= 1)
  }

  test("table catalog reads orc, json and csv tables, value-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cat_fmt").toString
    val base = spark.read.parquet(s"${sf()}/nation.parquet")
    base.write.orc(s"$dir/n_orc.orc")
    base.write.json(s"$dir/n_json.json")
    base.write.option("header", "true").csv(s"$dir/n_csv.csv")
    base.write.parquet(s"$dir/n_parq.parquet")
    val cat = new TableCatalog(spark, dir)
    assert(cat.tables.toSet == Set("n_orc", "n_json", "n_csv", "n_parq"))
    for (t <- cat.tables) {
      // column order and dtypes vary by format (json sorts, csv infers);
      // compare the VALUES on the shared columns
      val got = cat.read(t).select("n_nationkey", "n_name", "n_regionkey")
        .collect().map(r => (r.get(0).toString, r.getString(1), r.get(2).toString)).toSet
      val want = base.select("n_nationkey", "n_name", "n_regionkey")
        .collect().map(r => (r.get(0).toString, r.getString(1), r.get(2).toString)).toSet
      assert(got == want, s"table $t")
    }
    // schema-explicit read plans without the inference pass and keeps types
    val explicit = cat.readWithSchema("n_csv", base.schema)
    assert(explicit.schema == base.schema)
    assert(explicit.count() == base.count())
    // unknown tables fail with the catalog's message, not a reader error
    val e = intercept[IllegalArgumentException](cat.read("absent"))
    assert(e.getMessage.contains("no table 'absent'"))
  }

  test("table catalog: directory tables with hive-partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dirtbl").toString
    // a partitioned directory table — the layout writeShards produces
    spark.read.parquet(s"${sf()}/orders.parquet")
      .withColumn("bucket", pmod(col("o_orderkey"), lit(3L)).cast("int"))
      .write.partitionBy("bucket").parquet(s"$dir/orders_part")
    val cat = new TableCatalog(spark, dir)
    assert(cat.tables == Seq("orders_part"))
    assert(cat.resolvedFormat("orders_part") == "dir")
    val t = cat.read("orders_part")
    assert(t.count() == spark.read.parquet(s"${sf()}/orders.parquet").count())
    // a filter on the partition column prunes to matching directories
    // BEFORE any IO: it lands in PartitionFilters, not a post-scan Filter
    val pruned = t.filter(col("bucket") === 1)
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "bucket")))
    assert(pruned.count() ==
      spark.read.parquet(s"${sf()}/orders.parquet")
        .filter(pmod(col("o_orderkey"), lit(3L)) === 1).count())
  }

  test("table catalog lists through the Hadoop FS API (file: URI scheme)") {
    // non-local-scheme path: the java.io.File listing of round 2 returned
    // empty here; FileSystem.listStatus resolves the scheme
    val cat = new TableCatalog(spark, s"file://${sf()}")
    assert(cat.tables.contains("customer") && cat.tables.contains("orders"))
    assert(new TableCatalog(spark, s"file://${sf()}/absent_subdir").tables.isEmpty)
  }

  test("dedup and IVF queries pin nothing in executor storage after running") {
    // round-2 leak regression guard: the dedup ops use scratch tables
    // (not persist) and ivfIndex unpersists its build-time cache
    val before = spark.sparkContext.getPersistentRDDs.keySet // other suites may cache
    val dir = sf()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    Dedup.minhashLshCandidates(docs).write.format("noop").mode("overwrite").save()
    Dedup.lshJaccard(docs, minJaccard = 0.2).write.format("noop").mode("overwrite").save()
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    graft.operators.Similarity.ivfTopK(embs, embs.filter(col("vec_id") < 4))
      .write.format("noop").mode("overwrite").save()
    val leaked = spark.sparkContext.getPersistentRDDs.filterNot(kv => before(kv._1))
    assert(leaked.isEmpty, s"leaked caches: ${leaked.values.map(_.name)}")
  }

  test("typed stats Aggregator matches the driver-side fold") {
    val rs = Seq(LoadResult(1, 10, "node"), LoadResult(2, 20, "node"), LoadResult(4, 40, "node"))
    val ds = spark.createDataset(rs)
    val agg = ds.select(Stats.statsAggregator("node").toColumn).head()
    assert(agg == Stats.fold(rs, "node"))
  }

  // ---- quadratic-block guards: the small-blocks contract of the
  // blocked-exact operators is enforced at runtime, not hoped for

  test("ngramJaccard fails fast when one block exceeds maxBlockRows") {
    val docs = (1 to 40).map(i => (i.toLong, "en", "srcA", s"document text $i"))
      .toDF("doc_id", "lang", "source", "text")
    val e = intercept[Exception](
      Dedup.ngramJaccard(docs, Seq("lang", "source"), maxBlockRows = 10)
        .write.mode("overwrite").format("noop").save())
    val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.toString
    assert(msg.contains("quadratic") && msg.contains("ngramJaccard"))
  }

  test("cosinePairs fails fast on an oversized block, passes under the bound") {
    val vecs = (1 to 30).map(i =>
      (i.toLong, "big", Array.tabulate(4)(d => (i + d).toFloat)))
      .toDF("vec_id", "label", "embedding")
    val e = intercept[Exception](
      graft.operators.Similarity.cosinePairs(vecs, "label", maxBlockRows = 5)
        .write.mode("overwrite").format("noop").save())
    val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.toString
    assert(msg.contains("quadratic") && msg.contains("cosinePairs") && msg.contains("big"))
    // same data under the bound: runs, and blocked pairing still works
    val ok = graft.operators.Similarity.cosinePairs(
      vecs, "label", threshold = -1.0, maxBlockRows = 30)
    assert(ok.count() == 30L * 29 / 2) // all within-block pairs scored
  }

  test("ngramJaccard results are unchanged by the guard (small blocks)") {
    val docs = Seq(
      (1L, "en", "s", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "s", "the quick brown fox jumps over the lazy cat"),
      (3L, "fr", "s", "le renard brun rapide saute par dessus le chien")
    ).toDF("doc_id", "lang", "source", "text")
    val rows = Dedup.ngramJaccard(docs, Seq("lang", "source"), minJaccard = 0.3)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }
}
