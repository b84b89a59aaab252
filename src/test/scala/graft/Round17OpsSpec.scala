package graft

import graft.operators.{Quality, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-17 operators: graph-descent ANN (NSW greedy), one-way ANOVA,
  * winnowing fingerprints, k-anonymity audit, permutation test. */
class Round17OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def embFixture = {
    // deterministic 4-d vectors: four tight clusters around the axes
    // so the knn graph is meaningful and the greedy walk has signal
    def v(cl: Int, j: Int): Array[Float] = {
      val base = Array.fill(4)(0.05f * (j + 1))
      base(cl) = 1.0f
      base
    }
    (0 until 12).map(i => (i.toLong, v(i % 4, i / 4))).toDF("vec_id", "embedding")
  }

  test("graphGreedyTopK: trajectory laws (monotone, fixed point, edges real)") {
    val e = embFixture
    val q = e.filter(col("vec_id") < 2)
    val traj = Similarity.graphGreedyTopK(e, q, numPlanes = 2, degree = 2,
      maxHops = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byQ = traj.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L))
    for ((qid, steps) <- byQ) {
      val s = steps.sortBy(_._2)
      assert(s.map(_._2).toSeq == Seq(0, 1, 2, 3), "one row per hop")
      // greedy with self-candidate never worsens
      assert(s.sliding(2).forall { case Array(a, b) => b._4 >= a._4 })
      // the query node itself is never a candidate
      assert(s.forall(_._3 != qid))
      // once a fixed point repeats, it stays
      val nodes = s.map(_._3).toSeq
      nodes.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
        if (a == b) assert(nodes.drop(i + 1).forall(_ == b), "fixed point stays")
      }
    }
    // entry rule: lowest corpus id, second-lowest for that node's query
    assert(byQ(1L).minBy(_._2)._3 == 0L)
    assert(byQ(0L).minBy(_._2)._3 == 1L)
    // every move follows a real knn edge
    val edges = Similarity.knnGraph(e, numPlanes = 2, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((_, steps) <- byQ) {
      steps.sortBy(_._2).map(_._3).toSeq.sliding(2).foreach {
        case Seq(a, b) if a != b => assert(edges.contains((a, b)))
        case _ =>
      }
    }
  }

  test("oneWayAnova: textbook F, degenerate inputs null") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 4.0), ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val r = Quality.oneWayAnova(df, "g", "v").collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 9)
    // means 2,3,5; grand 10/3; SSB = 3*((2-10/3)^2+(3-10/3)^2+(5-10/3)^2)
    //   = 3*(16/9+1/9+25/9) = 14; SSW = 3 groups * 2 each = 6
    assert(math.abs(r.getDouble(2) - 14.0) < 1e-9, s"ssb=${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 6.0) < 1e-9)
    assert(r.getLong(4) == 2 && r.getLong(5) == 6)
    // F = (14/2)/(6/6) = 7
    assert(math.abs(r.getDouble(6) - 7.0) < 1e-9)
    // one group -> null F; zero within-variance -> null F
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    assert(Quality.oneWayAnova(one, "g", "v").collect().head.isNullAt(6))
    val zv = Seq(("a", 1.0), ("a", 1.0), ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val rz = Quality.oneWayAnova(zv, "g", "v").collect().head
    assert(rz.isNullAt(6) && rz.getDouble(2) > 0)
  }

  test("winnowing: shared-run guarantee, w=1 keeps all, rightmost tie") {
    val k = 3; val w = 2
    val shared = "alpha beta gamma delta epsilon zeta" // w+k-1=4 token runs
    val docs = Seq(
      (1L, s"one two $shared"),
      (2L, s"$shared nine ten")).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowing(docs, k = k, w = w).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val d1 = fp.filter(_._1 == 1L).map(_._2).toSet
    val d2 = fp.filter(_._1 == 2L).map(_._2).toSet
    assert((d1 & d2).nonEmpty, "shared w+k-1 run must share a fingerprint")
    // w=1: every gram position selected
    val all = TextAnalysis.winnowing(docs.filter(col("doc_id") === 1L),
      k = k, w = 1).collect()
    assert(all.length == 8 - k + 1) // "one two alpha..zeta" = 8 tokens
    // identical tokens -> identical hashes -> rightmost of each window
    val rep = Seq((9L, "x x x x x x")).toDF("doc_id", "text")
    val sel = TextAnalysis.winnowing(rep, k = 2, w = 3).collect()
      .map(_.getInt(1)).sorted.toSeq
    // 5 grams, complete windows start at 0..2, rightmost min = 2,3,4
    assert(sel == Seq(2, 3, 4))
  }

  test("kAnonymity: class accounting exact") {
    val df = Seq(
      ("en", "web"), ("en", "web"), ("en", "web"),
      ("fr", "web"), ("fr", "web"),
      ("de", "book")).toDF("lang", "source")
    val out = Quality.kAnonymity(df, Seq("lang", "source"), Seq(2, 3))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // classes: en/web=3, fr/web=2, de/book=1
    assert(out(2) == (3L, 6L, 1L, 1L, 1L)) // only the size-1 class < 2
    assert(out(3) == (3L, 6L, 1L, 2L, 3L)) // size-1 and size-2 < 3
  }

  test("leveneTest: zero within-group spread of |dev| -> null F; unequal spread -> F>0") {
    // two groups with IDENTICAL |x-mean| spread in each group:
    // a = (1,3) -> devs (1,1); b = (10,12) -> devs (1,1): z has zero
    // within variance AND zero between -> ssb=0, ssw=0 -> null F
    val eq = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 12.0))
      .toDF("g", "v")
    val r0 = Quality.leveneTest(eq, "g", "v").collect().head
    assert(r0.getDouble(2) == 0.0 && r0.getDouble(3) == 0.0 && r0.isNullAt(6))
    // clearly different spreads -> positive F
    val df = Seq(("a", 1.0), ("a", 1.1), ("a", 0.9),
      ("b", 0.0), ("b", 10.0), ("b", -10.0)).toDF("g", "v")
    val r = Quality.leveneTest(df, "g", "v").collect().head
    assert(r.getLong(0) == 2 && !r.isNullAt(6) && r.getDouble(6) > 0)
  }

  test("lDiversity: diversity accounting exact") {
    val df = Seq(
      // class (web): langs en,en,fr -> diversity 2, size 3
      ("web", "en"), ("web", "en"), ("web", "fr"),
      // class (book): lang de only -> diversity 1, size 2
      ("book", "de"), ("book", "de")).toDF("source", "lang")
    val out = Quality.lDiversity(df, Seq("source"), "lang", Seq(2, 3))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out(2) == (2L, 5L, 1L, 1L, 2L)) // book (div 1) at risk under l=2
    assert(out(3) == (2L, 5L, 1L, 2L, 5L)) // both classes under l=3
  }

  test("audioEnergy: integer frame accounting exact") {
    import graft.operators.Multimodal
    // 'A' = 65 -> s^2 = 4225 >= 3600 (loud); ' ' = 32 -> 1024 < 3600
    val docs = Seq(
      (1L, "A" * 130),  // 3 frames: 64, 64, 2 bytes - all loud
      (2L, " " * 64)    // 1 frame, silent
    ).toDF("doc_id", "text")
    val out = Multimodal.audioEnergy(spark, Multimodal.synthesizeMedia(docs))
      .collect().map(a => a.doc_id -> a).toMap
    assert(out(1L).n_frames == 3 && out(1L).silent_frames == 0)
    assert(out(1L).energy_sq == 130L * 65 * 65)
    assert(out(2L).n_frames == 1 && out(2L).silent_frames == 1)
    assert(out(2L).silence_ratio == 1.0)
    assert(out(2L).energy_sq == 64L * 32 * 32)
  }

  test("spanCorruptionPlan: spans inside their block, never overlapping") {
    import graft.operators.Corpus
    val docs = (1L to 30L).map(i => (i, ("tok " * (5 + i.toInt)).trim))
      .toDF("doc_id", "text")
    val spans = Corpus.spanCorruptionPlan(docs, blockTokens = 8,
      maxSpan = 3, maskPermille = 500).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(spans.nonEmpty)
    for ((_, b, st, ln) <- spans) {
      assert(ln >= 1 && ln <= 3)
      assert(st >= b * 8 && st + ln <= b * 8 + 8, s"span [$st,$st+$ln) in block $b")
    }
    // at most one span per (doc, block) -> no overlaps by construction
    assert(spans.map(s => (s._1, s._2)).distinct.length == spans.length)
    // maskPermille = 0 -> empty plan
    assert(Corpus.spanCorruptionPlan(docs, maskPermille = 0).count() == 0)
  }

  test("cdcChunks: chunks partition the tokens; duplicate docs fully duplicated") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "completely different words here nothing shared at all end")
    ).toDF("doc_id", "text")
    val out = Dedup.cdcChunks(docs, divisor = 4).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // chunk token counts must partition each doc's 10 tokens
    assert(out(1L)._3 == 10 && out(2L)._3 == 10 && out(3L)._3 == 9)
    // identical docs: every chunk repeats -> dup fraction 1.0
    assert(out(1L)._5 == 1.0 && out(2L)._5 == 1.0)
    assert(out(1L)._1 == out(2L)._1 && out(1L)._2 == out(1L)._1)
    // the distinct doc shares nothing
    assert(out(3L)._2 == 0 && out(3L)._5 == 0.0)
  }

  test("knBigramLm: continuation smoothing demotes single-context bigrams") {
    import graft.operators.TextAnalysis
    // "san francisco" x4: frequent but francisco only follows san;
    // "the cat", "the dog", "a cat", "a dog": cat/dog have 2 contexts
    val docs = Seq(
      (1L, "san francisco san francisco san francisco san francisco"),
      (2L, "the cat the dog a cat a dog")).toDF("doc_id", "text")
    val out = TextAnalysis.knBigramLm(docs, topN = 20).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (cBig, cW1, pSf) = out(("san", "francisco"))
    assert(cBig == 4 && cW1 == 4)
    // P_kn(francisco|san) = (4-.75)/4 + .75*1/4 * P_cont(francisco)
    // bigram types: (san,francisco),(francisco,san),(the,cat),(the,dog),
    //   (cat,the),(a,cat),(a,dog),(cat,a),(dog,a) = 9; francisco has 1
    //   distinct left context -> P_cont = 1/9
    assert(math.abs(pSf - ((4 - 0.75) / 4 + 0.75 / 4 * (1.0 / 9))) < 1e-6)
    // p in (0, 1] everywhere
    assert(out.values.forall { case (_, _, p) => p > 0 && p <= 1.0 })
  }

  test("hnswTopK: two-layer trajectory laws (upper nodes in upper set, monotone)") {
    import graft.operators.Similarity
    // enough vectors that the md5-mod-4 upper layer is non-empty
    def v(cl: Int, j: Int): Array[Float] = {
      val base = Array.fill(4)(0.05f * (j + 1)); base(cl) = 1.0f; base
    }
    val e = (0 until 40).map(i => (i.toLong, v(i % 4, i / 4)))
      .toDF("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 2)
    val out = Similarity.hnswTopK(e, q, numPlanes = 2, degree = 2,
      maxHops1 = 2, maxHops0 = 2, layerMod = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    val upper = (0 until 40).filter { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"hnsw:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 4 == 0
    }.map(_.toLong).toSet
    assert(upper.nonEmpty)
    for (qid <- Seq(0L, 1L)) {
      val t = out.filter(_._1 == qid).sortBy(s => (-s._2, s._3))
      // rows: layer1 hops 0..2 then layer0 hops 1..2
      assert(t.map(s => (s._2, s._3)).toSeq ==
        Seq((1, 0), (1, 1), (1, 2), (0, 1), (0, 2)))
      // every layer-1 node is an upper-layer node
      assert(t.filter(_._2 == 1).forall(s => upper.contains(s._4)))
      // greedy-with-self never worsens, across the layer switch too
      assert(t.map(_._5).toSeq.sliding(2).forall { case Seq(a, b) => b >= a })
      assert(t.forall(_._4 != qid))
    }
  }

  test("rendezvousShards: removing the last shard remaps only its docs") {
    import graft.operators.Corpus
    val docs = (1L to 200L).map(i => Tuple1(i)).toDF("doc_id")
    val at8 = Corpus.rendezvousShards(docs, nShards = 8).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val at7 = Corpus.rendezvousShards(docs, nShards = 7).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(at8.values.toSet.subsetOf((0 until 8).toSet))
    for ((d, s8) <- at8 if s8 < 7) assert(at7(d) == s8,
      s"doc $d moved from $s8 to ${at7(d)} when shard 7 was removed")
    // docs on shard 7 land somewhere in 0..6
    for ((d, s8) <- at8 if s8 == 7) assert(at7(d) < 7)
  }

  test("fimPlan: cuts bounded 0 <= a <= b <= n; permille 0 empty") {
    import graft.operators.Corpus
    val docs = (1L to 50L).map(i => (i, ("w " * (3 + i.toInt % 9)).trim))
      .toDF("doc_id", "text")
    val out = Corpus.fimPlan(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.nonEmpty)
    val lens = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1).split(" ").length).toMap
    for ((d, p, m, s) <- out) {
      assert(p >= 0 && m >= 0 && s >= 0)
      assert(p + m + s == lens(d))
    }
    assert(Corpus.fimPlan(docs, fimPermille = 0).count() == 0)
  }

  test("dpCounts: exact count released alongside, noise bounded by the CDF tail") {
    val df = Seq.tabulate(100)(i => (s"g${i % 3}", i)).toDF("g", "x")
    val out = Quality.dpCounts(df, Seq("g"), epsCenti = 100).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("g0")._1 == 34 && out("g1")._1 == 33 && out("g2")._1 == 33)
    // |noise| <= ln(2e12) ~ 28.4 at eps=1 (quantized-uniform tail)
    for ((_, (n, ndp)) <- out) assert(math.abs(ndp - n) <= 29.0)
    // deterministic release
    val again = Quality.dpCounts(df, Seq("g"), epsCenti = 100).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.forall { case (g, (_, ndp)) => again(g) == ndp })
  }

  test("permutationTest: observed stat exact, p-value add-one form") {
    val df = (1 to 40).map(i =>
      (i.toLong, i % 2, if (i % 2 == 1) 10.0 + i else 1.0 + i))
      .toDF("event_id", "variant", "value")
    val r = Quality.permutationTest(df, "event_id", "variant", "value",
      nPerms = 16).collect().head
    val obs = {
      val a = (1 to 40).filter(_ % 2 == 1).map(i => 10.0 + i)
      val b = (1 to 40).filter(_ % 2 == 0).map(i => 1.0 + i)
      a.sum / a.size - b.sum / b.size
    }
    assert(math.abs(r.getDouble(0) - obs) < 1e-6)
    assert(r.getLong(1) == 16)
    val nGe = r.getLong(2)
    assert(math.abs(r.getDouble(3) - (nGe + 1.0) / 17.0) < 1e-6) // 6-dp round
    assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1)
    // deterministic: same inputs, same record
    val r2 = Quality.permutationTest(df, "event_id", "variant", "value",
      nPerms = 16).collect().head
    assert(r.toSeq == r2.toSeq)
  }
}
