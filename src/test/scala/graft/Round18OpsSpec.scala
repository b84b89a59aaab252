package graft

import graft.operators.{Corpus, Similarity}
import org.apache.spark.sql.functions._

/** Round-18 operator batch: the end-to-end shard plan, semantic
  * benchmark decontamination, and the two-phase anneal plan. */
class Round18OpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")
  private lazy val embs = spark.read.parquet(s"${sf()}/embeddings.parquet")

  // ---- shardPlan ----

  test("shardPlan: every doc exactly once, doc_seq contiguous per chunk, " +
      "chunk totals consistent, shard in range") {
    val plan = Corpus.shardPlan(docs, targetTokens = 256, nShards = 8)
    val rows = plan.collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet.size == rows.length)
    assert(rows.length == docs.count())
    assert(rows.forall { r =>
      val s = r.getAs[Int]("shard"); s >= 0 && s < 8 })
    // doc_seq is 1..n_docs within each chunk, ordered by doc_id
    rows.groupBy(r => (r.getAs[String]("part"), r.getAs[Long]("chunk_id")))
      .foreach { case ((_, _), rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
        assert(sorted.map(_.getAs[Int]("doc_seq")).toSeq ==
          (1 to rs.length).toSeq)
        assert(rs.map(_.getAs[Long]("n_docs")).toSet == Set(rs.length.toLong))
        assert(rs.map(_.getAs[Long]("chunk_tokens")).toSet ==
          Set(rs.map(_.getAs[Long]("n_tokens")).sum))
      }
    // chunk placement/order are chunk-level facts: constant within a chunk
    rows.groupBy(r => (r.getAs[String]("part"), r.getAs[Long]("chunk_id")))
      .foreach { case (_, rs) =>
        assert(rs.map(_.getAs[Int]("shard")).toSet.size == 1)
        assert(rs.map(_.getAs[Long]("order_key")).toSet.size == 1)
      }
  }

  test("shardPlan epochs: same placement, different training order") {
    val e1 = Corpus.shardPlan(docs, targetTokens = 256, nShards = 8, epoch = 1)
      .select("part", "chunk_id", "shard", "order_key").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getInt(2), r.getLong(3))).toMap
    val e2 = Corpus.shardPlan(docs, targetTokens = 256, nShards = 8, epoch = 2)
      .select("part", "chunk_id", "shard", "order_key").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getInt(2), r.getLong(3))).toMap
    assert(e1.keySet == e2.keySet)
    // HRW placement is epoch-independent; the order key is epoch-salted
    assert(e1.forall { case (k, (s, _)) => e2(k)._1 == s })
    assert(e1.exists { case (k, (_, o)) => e2(k)._2 != o })
  }

  // ---- semanticDecontaminate ----

  test("semanticDecontaminate at nProbe = cells equals the exact " +
      "bipartite brute force") {
    val corpus = embs.filter(pmod(col("vec_id"), lit(20)) =!= 0)
    val bench = embs.filter(pmod(col("vec_id"), lit(20)) === 0)
    val thr = 0.40
    val got = Similarity.semanticDecontaminate(corpus, bench,
        threshold = thr, cells = 4, nProbe = 4, iters = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), r.getLong(3)))).toMap
    // brute force: all corpus × bench cosines at the same 6-dp rounding
    val bv = bench.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val cv = corpus.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = cv.map { case (id, v) =>
      id -> bv.count { case (_, b) => cos(v, b) >= thr }.toLong }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (flag, n)) =>
      assert(n == want(id), s"doc $id: got $n hits, want ${want(id)}")
      assert(flag == (want(id) > 0))
    }
    assert(want.values.exists(_ > 0), "fixture must produce contamination")
    assert(want.values.exists(_ == 0), "fixture must keep clean docs")
  }

  test("semanticDecontaminate: empty bench flags nothing") {
    val corpus = embs.limit(50)
    val out = Similarity.semanticDecontaminate(corpus,
      embs.filter(lit(false)), threshold = 0.1, cells = 4, nProbe = 2,
      iters = 1)
    assert(out.filter(col("contaminated")).count() == 0)
    assert(out.count() == 50)
  }

  // ---- standardize / randomProjection ----

  test("standardize: z-scores have ~zero mean and ~unit variance per " +
      "dimension; a constant dimension maps to all zeros") {
    val base = (1L to 40L).map { i =>
      (i, Array(i.toFloat, 7.5f, (i % 5).toFloat)) // dim 1 is constant
    }.toDF("vec_id", "embedding")
    val z = Similarity.standardize(base).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(z.length == 40 && z.forall(_._2.length == 3))
    for (d <- Seq(0, 2)) {
      val vs = z.map(_._2(d))
      assert(math.abs(vs.sum / vs.length) < 1e-4, s"dim $d mean")
      val m = vs.sum / vs.length
      val v = vs.map(x => (x - m) * (x - m)).sum / vs.length
      assert(math.abs(v - 1.0) < 1e-3, s"dim $d variance $v")
    }
    assert(z.forall(_._2(1) == 0.0), "constant dimension must z-score to 0")
  }

  test("randomProjection: linear (proj(a)+proj(b) ~ proj(a+b)), " +
      "deterministic, and shaped (outDims per vector)") {
    val a = Array(1.0f, 2.0f, 3.0f, 4.0f)
    val b = Array(0.5f, -1.0f, 2.5f, 0.0f)
    val ab = a.zip(b).map { case (x, y) => x + y }
    val df = Seq((1L, a), (2L, b), (3L, ab)).toDF("vec_id", "embedding")
    val p = Similarity.randomProjection(df, outDims = 6).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p.values.forall(_.length == 6))
    for (j <- 0 until 6)
      assert(math.abs(p(1L)(j) + p(2L)(j) - p(3L)(j)) < 1e-5,
        s"component $j not linear")
    val p2 = Similarity.randomProjection(df, outDims = 6).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p == p2)
  }

  test("randomProjection matches an independent driver-side matrix " +
      "multiply on fixture vectors (indexing/ordering differential)") {
    val corpus = embs.limit(5)
    val got = Similarity.randomProjection(corpus, outDims = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val planes = Similarity.planeMatrix(16, 64)
    corpus.select(col("vec_id"), col("embedding")).collect().foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      planes.zipWithIndex.foreach { case (p, j) =>
        // the operator folds left-to-right; replicate exactly, then
        // compare the 6-dp value
        var acc = 0.0
        for (d <- v.indices) acc += v(d) * p(d)
        val want = BigDecimal(acc)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got(id)(j) == want, s"vec $id component $j")
      }
    }
  }

  // ---- annealPlan ----

  test("annealPlan: shares sum to ~1 per phase, boost = share ratio, " +
      "budgets split by permille, oversampled flag honest") {
    val withQ = docs.withColumn("quality",
      graft.functions.TextFunctions.qualityScore(col("text"), col("n_chars")))
    val plan = Corpus.annealPlan(withQ, budgetTokens = 100000L,
      phase2Permille = 250).collect()
    assert(plan.nonEmpty)
    def near(x: Double, y: Double, eps: Double) = math.abs(x - y) <= eps
    val s1 = plan.map(_.getAs[Double]("share_phase1")).sum
    val s2 = plan.map(_.getAs[Double]("share_phase2")).sum
    assert(near(s1, 1.0, 1e-4) && near(s2, 1.0, 1e-4), s"shares $s1 / $s2")
    plan.foreach { r =>
      assert(near(r.getAs[Double]("anneal_boost"),
        r.getAs[Double]("share_phase2") / r.getAs[Double]("share_phase1"),
        1e-5))
      assert(r.getAs[Boolean]("oversampled") ==
        (r.getAs[Long]("tokens_phase2") > r.getAs[Long]("n_tokens")))
    }
    // integer per-phase budgets: 75k/25k at permille 250
    val t1 = plan.map(_.getAs[Long]("tokens_phase1")).sum
    val t2 = plan.map(_.getAs[Long]("tokens_phase2")).sum
    assert(math.abs(t1 - 75000L) <= plan.length,
      s"phase-1 allocations $t1 stray from 75000 beyond per-source rounding")
    assert(math.abs(t2 - 25000L) <= plan.length,
      s"phase-2 allocations $t2 stray from 25000 beyond per-source rounding")
  }

  test("annealPlan boosts the high-quality source: a source with higher " +
      "mean quality gets anneal_boost above a lower-quality one") {
    val withQ = docs.withColumn("quality",
      graft.functions.TextFunctions.qualityScore(col("text"), col("n_chars")))
    val plan = Corpus.annealPlan(withQ, budgetTokens = 100000L)
      .collect().sortBy(_.getAs[Double]("q_mean"))
    val lo = plan.head
    val hi = plan.last
    assert(hi.getAs[Double]("q_mean") > lo.getAs[Double]("q_mean"))
    assert(hi.getAs[Double]("anneal_boost") > lo.getAs[Double]("anneal_boost"))
  }
}
