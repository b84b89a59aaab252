package graft

import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class ExtensionOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")
  private lazy val embs = spark.read.parquet(s"${sf()}/embeddings.parquet")

  test("text stats: ratios bounded, token counts positive") {
    val st = TextAnalysis.textStats(docs).cache()
    assert(st.count() == docs.count())
    assert(st.filter(col("punct_ratio") < 0 || col("punct_ratio") > 1).count() == 0)
    assert(st.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
    assert(st.filter(col("n_tokens_ws") <= 0).count() == 0)
  }

  test("repetitionRatio: repeated windows score high, unique prose scores 0") {
    val d = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "each word here appears exactly once in this document")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionRatio(d, n = 3).collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(2L) == 0.0)          // all 3-token windows distinct
    assert(r(1L) > 0.7)           // one distinct window out of 6
    // bounded in [0, 1) and total >= distinct always
    val full = TextAnalysis.repetitionRatio(docs).collect()
    assert(full.forall(x => x.getDouble(3) >= 0.0 && x.getDouble(3) < 1.0))
    assert(full.forall(x => x.getInt(1) >= x.getInt(2)))
  }

  test("repetitionProfile: chant maxes the top-gram rule, unique prose zeroes dups") {
    val d = Seq(
      (1L, "buy now buy now buy now buy now buy now buy now"),
      (2L, "every single word in this quiet document appears exactly once only"),
      (3L, "alpha beta gamma delta epsilon alpha beta gamma delta epsilon zeta")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionProfile(d).collect()
      .map(x => x.getLong(0) -> x).toMap
    // doc 1 is one repeated bigram: of the 11 2-token windows, "buy now"
    // covers 6 — 42 of the 77 window chars
    assert(r(1L).getDouble(1) == 0.545455)
    // doc 2: no window of any n repeats
    (1 to 5).foreach(i => assert(r(2L).getDouble(i) <= 0.2))
    assert(r(2L).getDouble(4) == 0.0 && r(2L).getDouble(5) == 0.0)
    // doc 3 repeats a 5-token block: dup5 strictly positive, dup10 zero
    assert(r(3L).getDouble(4) > 0.0 && r(3L).getDouble(5) == 0.0)
    // fractions bounded on the real corpus
    val full = TextAnalysis.repetitionProfile(docs).collect()
    (1 to 5).foreach { i =>
      assert(full.forall(x => x.getDouble(i) >= 0.0 && x.getDouble(i) <= 1.0))
    }
  }

  test("hashedLinearScores: zero-shuffle plan, exact threshold, malformed model fails fast") {
    val w = TextAnalysis.syntheticHashedWeights(spark, dims = 512)
    val scored = TextAnalysis.hashedLinearScores(docs, w, dims = 512)
    // the model rides a broadcast — no shuffle Exchange anywhere
    val physical = scored.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange hashpartitioning"),
      s"classifier scoring must not shuffle:\n$physical")
    val rows = scored.collect()
    assert(rows.length == docs.count())
    // keep ⇔ score >= 0 (θ = 0): the integer compare and the rounded
    // double agree away from the boundary
    assert(rows.forall { r =>
      val (s, keep) = (r.getDouble(2), r.getBoolean(3))
      if (s > 1e-6) keep else if (s < -1e-6) !keep else true
    })
    // a weights table with a missing bucket fails fast, not null-silently
    val err = intercept[Exception] {
      TextAnalysis.hashedLinearScores(docs, w.filter(col("bucket") =!= 7), dims = 512)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("hashedLinearScores")))
  }

  test("zipfFit: one diagnostic row, negative slope, degenerate vocab -> null") {
    val fit = TextAnalysis.zipfFit(docs).collect()
    assert(fit.length == 1)
    val r = fit.head
    assert(r.getLong(0) > 10)
    // frequency falls as rank rises on any natural-ish corpus
    assert(!r.isNullAt(1) && r.getDouble(1) < 0.0)
    // every type occurs exactly once -> one count value -> no slope
    val uniform = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val u = TextAnalysis.zipfFit(uniform).head()
    assert(u.isNullAt(1))
  }

  test("mixturePlan: allocations never exceed the budget or availability") {
    val budget = 50000L
    val plan = graft.operators.Corpus.mixturePlan(docs, budget).collect()
    assert(plan.nonEmpty)
    assert(plan.map(_.getLong(4)).sum <= budget)
    plan.foreach { r =>
      assert(r.getLong(4) <= r.getLong(2))                 // <= available
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0) // keep_rate
    }
    // the scarcest source is never down-weighted (rate exactly 1)
    val minSrc = plan.minBy(_.getLong(2))
    assert(minSrc.getDouble(3) == 1.0)
  }

  test("corpusReport: totals add up across groups") {
    val rep = TextAnalysis.corpusReport(docs).collect()
    assert(rep.map(_.getLong(2)).sum == docs.count())       // n_docs partitions the corpus
    assert(rep.forall(_.getLong(3) > 0))                    // token totals positive
    assert(rep.forall(r => r.getInt(5) <= r.getInt(6)))     // min_chars <= max_chars
  }

  test("langid: picks a language or und, deterministic") {
    val l1 = TextAnalysis.languageId(docs).collect().toSeq.sortBy(_.getLong(0))
    val l2 = TextAnalysis.languageId(docs).collect().toSeq.sortBy(_.getLong(0))
    assert(l1 == l2)
    val langs = l1.map(_.getAs[String]("lang_pred")).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr", "zh", "und")))
  }

  test("exact dedup: identical normalized text collapses") {
    val d = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exact(d).collect()
    assert(out.length == 2)
    val dup = out.find(_.getAs[Long]("n_dups") == 2).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH: exact duplicates are always candidates") {
    val d = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content with no overlap at all zzz qqq")).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshCandidates(d).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("simhash: identical docs share fingerprint; fingerprint is stable") {
    val d = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "xx yy zz")).toDF("doc_id", "text")
    val out = Dedup.simhashBuckets(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L)) // extremely unlikely to collide
  }

  test("simhashPairs: equals brute-force Hamming pairs (pigeonhole is exact)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(200)
    val pairs = graft.operators.Dedup.simhashPairs(docs, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the same fingerprints
    val fps = docs.select($"doc_id",
        graft.operators.Dedup.simhash($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 4
    } yield (a, b, h)).toSet
    assert(pairs == brute)
    // sanity: identical docs pair at distance 0
    val twin = Seq((1L, "same words here"), (2L, "same words here")).toDF("doc_id", "text")
    val tp = graft.operators.Dedup.simhashPairs(twin, maxHamming = 0).collect()
    assert(tp.length == 1 && tp.head.getInt(2) == 0)
  }

  test("ngram jaccard: identical docs in same block score 1.0") {
    val d = Seq((1L, "aaaa bbbb cccc dddd", "en", "s1"),
      (2L, "aaaa bbbb cccc dddd", "en", "s1"),
      (3L, "zzzz yyyy xxxx wwww", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    val out = Dedup.ngramJaccard(d, Seq("lang", "source"), minJaccard = 0.9).collect()
    assert(out.length == 1 && out.head.getAs[Double]("jaccard") == 1.0)
  }

  test("cosine: self-similarity is 1, orthogonal is 0") {
    val d = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)), (3L, Array(2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val sims = d.as("a").crossJoin(d.as("b"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(sims((1L, 3L)) - 1.0) < 1e-12)
    assert(math.abs(sims((1L, 2L))) < 1e-12)
  }

  test("brute-force topk: k rows per query, ranked desc") {
    val out = Similarity.bruteForceTopK(embs, embs.filter(col("vec_id") < 3), k = 4).cache()
    assert(out.groupBy("query_id").count().filter(col("count") =!= 4).count() == 0)
    val r1 = out.filter(col("query_id") === 0).orderBy(col("rank")).collect()
    assert(r1.map(_.getAs[Double]("sim")).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("lsh topk: neighbors come only from the query's bucket, sims match brute force values") {
    val out = Similarity.lshTopK(embs, embs.filter(col("vec_id") < 8), k = 5)
    val brute = Similarity.bruteForceTopK(embs, embs.filter(col("vec_id") < 8), k = embs.count().toInt)
    val bruteMap = brute.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(bruteMap(key) == r.getDouble(2)) // same cosine values
    }
  }

  test("knnGraph: every node ranked within its bucket; agrees with lshTopK; guard trips") {
    val knn = Similarity.knnGraph(embs, k = 3)
    // same bucket structure as lshTopK with the corpus as the query set:
    // for the first 8 ids the two must agree row for row (k=3 prefix)
    val viaQueries = Similarity.lshTopK(embs, embs.filter(col("vec_id") < 8), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3))).toMap
    knn.filter(col("src") < 8).collect().foreach { r =>
      assert(viaQueries((r.getLong(0), r.getLong(1))) == ((r.getDouble(2), r.getInt(3))))
    }
    // at most k neighbors per node, ranks contiguous from 1
    assert(knn.groupBy("src").count().filter(col("count") > 3).count() == 0)
    // the bucket-size contract is enforced
    val err = intercept[Exception] {
      Similarity.knnGraph(embs, k = 3, maxBucketRows = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("knnGraph")))
  }

  test("ivfCosinePairs: cells=1 equals exhaustive pairs; cells>1 is a subset") {
    val vecs = embs.limit(200)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // one cell = one block = every pair scored: must match the
    // label-free exhaustive form exactly
    val exhaustive = pairSet(Similarity.cosinePairs(
      vecs.withColumn("one", lit(1)), blockCol = "one", threshold = 0.40))
    val oneCell = pairSet(Similarity.ivfCosinePairs(vecs, threshold = 0.40, cells = 1))
    assert(oneCell == exhaustive && exhaustive.nonEmpty)
    // more cells: approximate at the boundary — always a subset, and
    // within-cell scoring is exact (same sims as the exhaustive pass)
    val blocked = pairSet(Similarity.ivfCosinePairs(vecs, threshold = 0.40, cells = 4))
    assert(blocked.subsetOf(exhaustive))
  }

  test("fingerprints: rolling fingerprint survives local edits, md5 does not") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val edited = base + " extra"
    val d = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(d, shingleK = 8).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(fp(1L)._1 != fp(2L)._1) // exact fingerprint differs
    assert(fp(1L)._2 == fp(2L)._2) // min-shingle fingerprint robust to suffix edit
  }

  test("l2Normalize: unit norm out, zero vector untouched") {
    val df = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = df.select($"vec_id",
        graft.operators.Similarity.l2Normalize($"embedding").as("nv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1L) == Seq(0.6, 0.8))
    assert(out(2L) == Seq(0.0, 0.0))
  }

  test("quantizeInt8: codes reconstruct within one scale step; extremes hit ±127") {
    val df = Seq((1L, Array(0.5f, -1.0f, 0.25f, 1.0f))).toDF("vec_id", "embedding")
    val r = df.select(graft.operators.Similarity.quantizeInt8($"embedding").as("qz"))
      .select($"qz.scale", $"qz.q").head()
    val scale = r.getDouble(0)
    val q = r.getSeq[Int](1)
    assert(q == Seq(64, -127, 32, 127)) // round(0.5*127), -127, round(.25*127)=31.75->32
    val recon = q.map(_ * scale)
    Seq(0.5, -1.0, 0.25, 1.0).zip(recon).foreach { case (orig, rec) =>
      assert(math.abs(orig - rec) <= scale / 2 + 1e-9)
    }
  }

  test("shingles produce k-length grams; short text yields one gram") {
    val d = Seq(("abcdef"), ("ab")).toDF("text")
      .select(TextFunctions.shingles(col("text"), 3).as("g"))
    val rows = d.collect().map(_.getSeq[String](0))
    assert(rows(0).forall(_.length == 3) && rows(0).length == 4)
    assert(rows(1) == Seq("ab"))
  }
}
