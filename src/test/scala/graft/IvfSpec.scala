package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class IvfSpec extends SparkTestBase {

  private lazy val embs = spark.read.parquet(s"${sf()}/embeddings.parquet")

  test("ivf index: every vector assigned to exactly one of k cells") {
    val (assigned, centroids) = Similarity.ivfIndex(embs, k = 8, iters = 2)
    assert(centroids.count() == 8)
    assert(assigned.count() == embs.count())
    assert(assigned.select("cell").distinct().count() <= 8)
    // deterministic across runs
    val a1 = assigned.select("vid", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = Similarity.ivfIndex(embs, k = 8, iters = 2)._1
      .select("vid", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a2)
  }

  test("sparse / non-zero-based ids still seed k centroids and probe correctly") {
    import spark.implicits._
    // ids {7, 1000, 1001, ...}: an id-VALUE init (vid < k) would seed ONE
    // centroid here; the id-RANK init must seed all k
    val ids = 7L +: (1000L until 1019L)
    val vecs = ids.zipWithIndex.map { case (id, i) =>
      (id, Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val (assigned, centroids) = Similarity.ivfIndex(vecs, k = 4, iters = 2)
    assert(centroids.count() == 4)
    assert(centroids.select("cell").as[Int].collect().sorted.toSeq == Seq(0, 1, 2, 3))
    assert(assigned.count() == vecs.count())
    val probed = Similarity.ivfProbe(assigned, centroids,
      vecs.filter(col("vec_id") === 7L), k = 3, nProbe = 4)
    assert(probed.count() == 3)
    // exhaustive probe (nProbe = all cells) reproduces brute-force sims
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 7L), k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    probed.collect().foreach(r => assert(brute(r.getLong(1)) == r.getDouble(2)))
  }

  test("written index round-trips: loaded probe equals in-session probe") {
    val (assigned, centroids) = Similarity.ivfIndex(embs, k = 8, iters = 2)
    val queries = embs.filter(col("vec_id") < 8)
    val direct = Similarity.ivfProbe(assigned, centroids, queries, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_").toString
    try {
      Similarity.writeIvfIndex(assigned, centroids, dir)
      // cell-partitioned layout on disk
      val cellDirs = new java.io.File(s"$dir/assignments").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      assert(cellDirs.length == 8)
      val (la, lc) = Similarity.loadIvfIndex(spark, dir)
      val loaded = Similarity.ivfProbe(la, lc, queries, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(loaded == direct && direct.nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("written IVF-PQ index round-trips: loaded probe equals in-session, " +
      "probes prune to probed cell= dirs") {
    val idx = Similarity.buildIvfPq(embs, cells = 8, dims = 64, m = 4,
      ksub = 4, iters = 2)
    val queries = embs.filter(col("vec_id") < 8)
    val raw = idx.assigned.select(col("vid"), col("v"))
    def collectSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val direct = collectSet(Similarity.ivfPqProbe(idx.encoded, idx.centroids,
      idx.books, raw, queries, nProbe = 3, shortlist = 20))
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_").toString
    try {
      Similarity.writeIvfPqIndex(idx, dir)
      // cell-partitioned code layout on disk; codebooks = m×ksub rows
      val cellDirs = new java.io.File(s"$dir/codes").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      assert(cellDirs.length == 8)
      val (codes, cents, books) = Similarity.loadIvfPqIndex(spark, dir)
      assert(books == idx.books, "codebooks must round-trip bit-exactly")
      val loadedProbe = Similarity.ivfPqProbe(codes, cents, books, raw,
        queries, nProbe = 3, shortlist = 20)
      assert(collectSet(loadedProbe) == direct && direct.nonEmpty)
      // the probe's code scan is pruned to the probed cell= dirs: the
      // broadcast probe side drives dynamic partition pruning on the
      // partition column (a serving pass never reads unprobed cells).
      // Dig through the AQE wrapper/stages to reach the actual scan.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = (p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case f: FileSourceScanExec => Seq(f)
        case _ => Seq.empty
      }) ++ p.children.flatMap(scans)
      val scan = scans(loadedProbe.queryExecution.executedPlan)
        .find(_.relation.location.rootPaths.exists(_.toString.contains("codes")))
        .getOrElse(fail("no FileSourceScan of the codes table in the plan"))
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
        s"codes scan carries no cell partition filter:\n${scan.treeString}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("ivf topk: k rows per query, sims match brute-force values, decent recall") {
    val queries = embs.filter(col("vec_id") < 8)
    val ivf = Similarity.ivfTopK(embs, queries, k = 5, cells = 8, nProbe = 4)
    val counts = ivf.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 5))
    val brute = Similarity.bruteForceTopK(embs, queries, k = embs.count().toInt)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.collect().foreach { r =>
      assert(brute((r.getLong(0), r.getLong(1))) == r.getDouble(2)) // exact sims
    }
    // near vectors concentrate in the query's own cell, so recall is high
    // even probing half the cells. NOTE keys.toSeq before map: mapping a
    // Set of per-query recalls would dedupe equal values before summing.
    val bruteTop = Similarity.bruteForceTopK(embs, queries, k = 5)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivfTop = ivf.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recall = bruteTop.keys.toSeq
      .map(q => (ivfTop(q) & bruteTop(q)).size.toDouble / 5).sum / bruteTop.size
    assert(recall > 0.8, s"recall@5 = $recall")
  }
}
