package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

/** Round-14 stats operators: Spearman rank correlation, 1-D
  * Wasserstein distance, Jensen-Shannon divergence, Kaplan-Meier
  * log-survival. */
class Round14OpsSpec extends SparkTestBase {
  import spark.implicits._

  // Spark round() semantics: HALF_UP via BigDecimal
  private def r(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("spearmanCorr: monotone with ties is 1, hand case is -0.5") {
    val mono = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0))
      .toDF("x", "y")
    val out1 = Quality.spearmanCorr(mono, "x", "y").collect().head
    assert(out1.getLong(0) == 4L && out1.getDouble(1) == 1.0)
    // ranks x=[1,2,3], y=[3,1,2] -> Pearson over ranks = -0.5
    val hand = Seq((1.0, 30.0), (2.0, 10.0), (3.0, 20.0)).toDF("x", "y")
    val out2 = Quality.spearmanCorr(hand, "x", "y").collect().head
    assert(out2.getLong(0) == 3L && out2.getDouble(1) == -0.5)
    // anti-monotone -> -1; nulls on either side are dropped
    val anti = Seq((Some(1.0), Some(9.0)), (Some(2.0), Some(5.0)),
      (Some(3.0), Some(1.0)), (None, Some(7.0)), (Some(4.0), None))
      .toDF("x", "y")
    val out3 = Quality.spearmanCorr(anti, "x", "y").collect().head
    assert(out3.getLong(0) == 3L && out3.getDouble(1) == -1.0)
    // constant column -> zero rank variance -> NULL, not engine NaN
    val const = Seq((1.0, 5.0), (2.0, 5.0)).toDF("x", "y")
    assert(Quality.spearmanCorr(const, "x", "y").collect().head.isNullAt(1))
  }

  test("wasserstein1/jensenShannon: empty side degenerates to NULL/0") {
    val a = Seq(0.0, 1.0).toDF("v")
    val none = a.filter(col("v") < -1)
    val w = Quality.wasserstein1(a, none, "v").collect().head
    assert(w.getLong(1) == 0L && w.isNullAt(2))
    val ka = Seq("x", "y").toDF("k")
    val j = Quality.jensenShannon(ka, ka.filter(col("k") === "zz"), "k")
      .collect().head
    assert(j.getLong(1) == 0L && j.getDouble(3) == 0.0) // no ln(0) path
  }

  test("wasserstein1/jensenShannon: degenerate inputs still emit ONE row") {
    // constant value column: every lead(vu) is null so the trapezoid
    // frame is EMPTY — W1 is mathematically 0 there and the oracle's
    // scalar-subquery SELECT always emits a row, so we must too
    val ca = Seq(5.0, 5.0, 5.0).toDF("v")
    val cb = Seq(5.0, 5.0).toDF("v")
    val w = Quality.wasserstein1(ca, cb, "v").collect()
    assert(w.length == 1)
    assert(w.head.getLong(0) == 3L && w.head.getLong(1) == 2L)
    assert(w.head.getDouble(2) == 0.0)
    // both inputs empty: one row, NULL na/nb/jsd, n_keys 0
    val ka = Seq("x").toDF("k").filter(col("k") === "zz")
    val j = Quality.jensenShannon(ka, ka, "k").collect()
    assert(j.length == 1)
    assert(j.head.isNullAt(0) && j.head.isNullAt(1))
    assert(j.head.getLong(2) == 0L && j.head.isNullAt(3))
    // both wasserstein inputs empty: one row, NULL everywhere
    val we = Quality.wasserstein1(ka.withColumn("v", lit(1.0)),
      ka.withColumn("v", lit(1.0)), "v").collect()
    assert(we.length == 1 && we.head.isNullAt(2))
  }

  test("wasserstein1: unit shift of a two-point distribution costs 1") {
    val a = Seq(0.0, 1.0).toDF("v")
    val b = Seq(1.0, 2.0).toDF("v")
    val out = Quality.wasserstein1(a, b, "v").collect().head
    assert(out.getLong(0) == 2L && out.getLong(1) == 2L)
    assert(out.getDouble(2) == 1.0)
    // identical samples -> 0
    val z = Quality.wasserstein1(a, a, "v").collect().head
    assert(z.getDouble(2) == 0.0)
    // asymmetric masses: a={0}, b={0,3}: |F_a-F_b| = 0.5 on [0,3) -> 1.5
    val a2 = Seq(0.0).toDF("v")
    val b2 = Seq(0.0, 3.0).toDF("v")
    assert(Quality.wasserstein1(a2, b2, "v").collect().head.getDouble(2)
      == 1.5)
  }

  test("jensenShannon: identical mix is 0, disjoint mix is ln 2") {
    val a = Seq("x", "x", "y").toDF("k")
    val same = Quality.jensenShannon(a, a, "k").collect().head
    assert(same.getLong(0) == 3L && same.getLong(1) == 3L)
    assert(same.getLong(2) == 2L && same.getDouble(3) == 0.0)
    val b = Seq("z").toDF("k")
    val dis = Quality.jensenShannon(a, b, "k").collect().head
    // every category one-sided: each term is ln 2, JSD = ln 2
    assert(dis.getLong(2) == 3L)
    assert(dis.getDouble(3) == r(r(math.log(2.0), 9), 6))
  }

  test("kaplanMeier: product-limit steps, censoring, terminal S=0") {
    val df = Seq((1.0, true), (2.0, false), (3.0, true), (3.0, true),
      (4.0, false)).toDF("dur", "ev")
    val out = Quality.kaplanMeier(df, "dur", "ev").collect()
      .map(x => x.getDouble(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    // t=1: n=5 d=1 c=0; t=3: n=3 d=2 c=0 (t=2 censor consumed one)
    val l1 = r(math.log(4.0 / 5.0), 9)
    val l3 = r(math.log(1.0 / 3.0), 9)
    assert(out(1.0) == ((5L, 1L, 0L, r(l1, 6))))
    assert(out(3.0) == ((3L, 2L, 0L, r(l1 + l3, 6))))
    assert(!out.contains(2.0) && !out.contains(4.0)) // censor-only times
    // all remaining fail at the last time -> NULL log_s, no ln(0)
    val term = Seq((1.0, true), (2.0, true)).toDF("dur", "ev")
    val rows = Quality.kaplanMeier(term, "dur", "ev").collect()
      .sortBy(_.getDouble(0))
    assert(rows(0).getDouble(4) == r(r(math.log(0.5), 9), 6))
    assert(rows(1).isNullAt(4))
  }

  test("vocabCoverage: count-of-counts estimators on a hand corpus") {
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val out = operators.TextAnalysis.vocabCoverage(docs).collect().head
    // tokens a,a,b,c: N=4 D=3 n1=2 n2=1
    assert(out.getLong(0) == 4L && out.getLong(1) == 3L)
    assert(out.getLong(2) == 2L && out.getLong(3) == 1L)
    assert(out.getDouble(4) == 0.5 && out.getDouble(5) == 0.5)
    assert(out.getDouble(6) == 3.5) // 3 + 2*1/(2*2)
  }

  test("katzCentrality: star graph, three attenuated rounds") {
    val e = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val out = operators.Graph.katzCentrality(e, alpha = 0.05, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // center: 1+.05*2 -> 1.1; 1+.05*2.1 -> 1.105; 1+.05*2.11 -> 1.1055
    // leaf:   1.05; 1+.05*1.1 -> 1.055; 1+.05*1.105 -> 1.05525
    assert(out(1L) == 1.1055)
    assert(out(2L) == 1.05525 && out(3L) == 1.05525)
  }

  test("rectangleCount: one square is one rectangle, triangles are zero") {
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val out = operators.Graph.rectangleCount(sq).collect().head
    assert(out.getLong(0) == 2L) // diagonals (1,3) and (2,4)
    assert(out.getLong(1) == 2L && out.getLong(2) == 1L)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val t0 = operators.Graph.rectangleCount(tri).collect().head
    assert(t0.getLong(0) == 3L && t0.getLong(1) == 0L && t0.getLong(2) == 0L)
  }

  test("theilsU: determination is directional") {
    // y determines x (each y value maps to one x), but not vice versa
    val df = Seq(("a", "p"), ("a", "q"), ("b", "r"), ("b", "r"))
      .toDF("x", "y")
    val out = Quality.theilsU(df, "x", "y").collect().head
    assert(out.getLong(0) == 4L)
    assert(out.getDouble(4) == 1.0) // U(X|Y): knowing y removes all of H(X)
    assert(out.getDouble(5) < 1.0) // U(Y|X) strictly less
    assert(out.getDouble(1) == out.getDouble(2)) // MI == H(X) here
    // independent columns -> U 0 both ways
    val ind = Seq(("a", "p"), ("a", "q"), ("b", "p"), ("b", "q"))
      .toDF("x", "y")
    val o2 = Quality.theilsU(ind, "x", "y").collect().head
    assert(o2.getDouble(4) == 0.0 && o2.getDouble(5) == 0.0)
    // constant x -> H(X)=0 -> U(X|Y) null
    val const = Seq(("a", "p"), ("a", "q")).toDF("x", "y")
    assert(Quality.theilsU(const, "x", "y").collect().head.isNullAt(4))
  }

  test("acfByType: alternating hourly series has acf(1) = -0.75") {
    import java.sql.Timestamp
    // counts per hour h0..h3 = [2,1,2,1]: mean 1.5, den = 1,
    // num1 = -0.75, num2 = 0.5, num3 = -0.25
    def ts(h: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:10:00")
    val rows = Seq(ts(0), ts(0), ts(1), ts(2), ts(2), ts(3))
      .map(t => (1L, t, "view")).toDF("event_id", "ts", "event_type")
    val out = operators.Events.acfByType(rows, maxLag = 3)
      .collect().map(x => x.getInt(1) -> (x.getLong(2), x.getDouble(3)))
      .toMap
    assert(out(1) == ((4L, -0.75)) && out(2) == ((4L, 0.5))
      && out(3) == ((4L, -0.25)))
    // constant series -> zero denominator -> NULL acf
    val const = Seq(ts(0), ts(1)).map(t => (1L, t, "x"))
      .toDF("event_id", "ts", "event_type")
    assert(operators.Events.acfByType(const, maxLag = 1)
      .collect().forall(_.isNullAt(3)))
  }

  test("calibrationReport: decile bins, clamped top, exact rates") {
    val df = Seq((0.05, false), (0.15, false), (0.95, true), (1.0, true))
      .toDF("score", "label")
    val out = operators.TextAnalysis.calibrationReport(df, "score", "label")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(out(0L) == ((1L, 0L, 0.05, 0.0)))
    assert(out(1L) == ((1L, 0L, 0.15, 0.0)))
    assert(out(9L) == ((2L, 2L, 0.975, 1.0))) // 1.0 clamps into bin 9
    assert(out.size == 3)
  }

  test("ndcgAtK: shared-constant discounts, same-label relevance") {
    import operators.Similarity
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f), 1),
      (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val q = Seq((0L, Array(1.0f, 0.0f), 1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.ndcgAtK(corpus, q, k = 10).collect().head
    val d = Similarity.discounts(10)
    assert(out.getLong(1) == 2L) // relevant at ranks 1 and 3
    assert(out.getDouble(2) == r((d(0) + d(2)).toDouble, 6))
    assert(out.getDouble(3) ==
      r((d(0) + d(2)).toDouble / (d(0) + d(1)).toDouble, 6))
  }

  test("woeIv: over-indexed bucket positive, one-sided bucket NULL") {
    // bucket 1: 3 pos / 1 neg (over-indexed); bucket 2: 1 pos / 3 neg;
    // bucket 3: 2 pos / 0 neg (one-sided -> NULL)
    val df = (Seq.fill(3)((1L, true)) ++ Seq((1L, false)) ++
      Seq((2L, true)) ++ Seq.fill(3)((2L, false)) ++
      Seq.fill(2)((3L, true))).toDF("b", "y")
    val out = Quality.woeIv(df, "b", "y").collect()
      .map(x => x.getLong(0) -> x).toMap
    // totals: pos 6, neg 4; woe(1) = ln((3*4)/(1*6)) = ln 2,
    // woe(2) = ln((1*4)/(3*6)) = ln(2/9)
    assert(out(1L).getDouble(4) == r(r(math.log(2.0), 9), 6))
    assert(out(2L).getDouble(4) == r(r(math.log(2.0 / 9.0), 9), 6))
    assert(out(3L).isNullAt(4) && out(3L).isNullAt(5))
    // iv terms: (3/6 - 1/4) * ln2 and (1/6 - 3/4) * (-ln2), both > 0
    assert(out(1L).getDouble(5) > 0 && out(2L).getDouble(5) > 0)
  }

  test("targetEncoding: small category shrinks to the prior") {
    // prior = 5/10; big category (8 rows, all pos) stays near 1,
    // tiny category (2 rows, no pos) pulls strongly toward 0.5
    val df = (Seq.fill(8)(("big", true)) ++ Seq.fill(2)(("tiny", false)))
      .toDF("c", "y")
    val out = Quality.targetEncoding(df, "c", "y", m = 10.0)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(out("big").getDouble(3) == 1.0) // raw rate
    assert(out("big").getDouble(4) == r((8.0 + 10.0 * 0.8) / 18.0, 6))
    assert(out("tiny").getDouble(4) == r((0.0 + 10.0 * 0.8) / 12.0, 6))
    assert(out("tiny").getDouble(4) > out("tiny").getDouble(3))
  }

  test("aucRoc: perfect, random, and tied separations") {
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("s", "y")
    val p = Quality.aucRoc(perfect, "s", "y").collect().head
    assert(p.getLong(0) == 2L && p.getLong(1) == 2L)
    assert(p.getDouble(2) == 1.0 && p.getDouble(3) == 1.0)
    // all scores tied -> mid-ranks give AUC exactly 0.5
    val tied = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
      .toDF("s", "y")
    assert(Quality.aucRoc(tied, "s", "y").collect().head.getDouble(2) == 0.5)
    // one-class input -> NULL
    val one = Seq((0.9, true), (0.1, true)).toDF("s", "y")
    assert(Quality.aucRoc(one, "s", "y").collect().head.isNullAt(2))
  }

  test("prCurve: suffix-sum operating points on the decile spine") {
    // scores .95(+), .55(+), .35(-), .15(-): at t=0.4 -> tp=2 fp=0;
    // at t=0.0 -> tp=2 fp=2
    val df = Seq((0.95, true), (0.55, true), (0.35, false), (0.15, false))
      .toDF("s", "y")
    val out = Quality.prCurve(df, "s", "y").collect()
      .map(x => x.getInt(0) -> x).toMap
    assert(out.size == 10) // spine is dense even with empty buckets
    assert(out(4).getLong(1) == 2L && out(4).getLong(2) == 0L)
    assert(out(4).getDouble(4) == 1.0 && out(4).getDouble(5) == 1.0
      && out(4).getDouble(6) == 1.0)
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 2L)
    assert(out(0).getDouble(4) == 0.5 && out(0).getDouble(5) == 1.0)
    assert(out(6).getLong(1) == 1L) // only 0.95 at t=0.6
    assert(out(9).getLong(1) == 1L && out(9).getDouble(4) == 1.0)
  }

  test("ngramContainment: subset doc scores 1.0 where jaccard is low") {
    import operators.Dedup
    // char-5 shingles: B's {abcde,bcdef} sit inside A's 4-shingle set
    val docs = Seq(
      (1L, "abcdefgh", "en"), (2L, "abcdef", "en"),
      (3L, "zzzzzzzz", "en")).toDF("doc_id", "text", "lang")
    val out = Dedup.ngramContainment(docs, blockCols = Seq("lang"),
      minContainment = 0.5).collect()
    assert(out.length == 1)
    val r0 = out.head
    assert(r0.getLong(0) == 1L && r0.getLong(1) == 2L)
    assert(r0.getInt(2) == 4 && r0.getInt(3) == 2)
    assert(r0.getDouble(4) == 1.0)
    // the same pair under symmetric jaccard reads only 0.5
    val j = Dedup.ngramJaccard(docs, blockCols = Seq("lang"),
      minJaccard = 0.0).collect().filter(r => r.getLong(1) == 2L)
    assert(j.head.getDouble(2) == 0.5)
  }

  test("conformalThreshold: order statistic, small groups NULL") {
    // g1: values 1..10, n=10, k = ceil(11*0.9) = 10 -> qhat = 10.0
    // g2: 3 values, k = ceil(4*0.9) = 4 > n -> NULL
    val df = ((1 to 10).map(i => ("g1", i.toDouble)) ++
      Seq(("g2", 1.0), ("g2", 2.0), ("g2", 3.0))).toDF("g", "v")
    val out = Quality.conformalThreshold(df, "v", "g")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(out("g1").getLong(1) == 10L && out("g1").getLong(2) == 10L)
    assert(out("g1").getDouble(3) == 10.0)
    assert(out("g2").getLong(2) == 4L && out("g2").isNullAt(3))
    // 50% coverage on g1: k = ceil(11/2) = 6 -> 6th smallest
    val half = Quality.conformalThreshold(df.filter(col("g") === "g1"),
      "v", "g", coverNum = 1L, coverDen = 2L).collect().head
    assert(half.getLong(2) == 6L && half.getDouble(3) == 6.0)
  }

  test("twoProportionZ: pooled-null z, degenerate arms NULL") {
    // arm0: 2/4 convert; arm1: 3/4 -> p=5/8, z = (0.75-0.5)/se
    val df = Seq((false, true), (false, true), (false, false),
      (false, false), (true, true), (true, true), (true, true),
      (true, false)).toDF("arm", "conv")
    val out = Quality.twoProportionZ(df, "arm", "conv").collect().head
    assert(out.getLong(0) == 4L && out.getLong(1) == 2L)
    assert(out.getLong(2) == 4L && out.getLong(3) == 3L)
    assert(out.getDouble(4) == 0.5 && out.getDouble(5) == 0.75)
    val p = 5.0 / 8.0
    val se = math.sqrt(p * (1.0 - p) * (1.0 / 4 + 1.0 / 4))
    assert(out.getDouble(6) == r((0.75 - 0.5) / se, 6))
    // all conversions -> zero pooled variance -> NULL z
    val alln = Seq((false, true), (true, true)).toDF("arm", "conv")
    assert(Quality.twoProportionZ(alln, "arm", "conv")
      .collect().head.isNullAt(6))
  }

  test("anomaliesMad: robust flags, MAD-degenerate types emit nothing") {
    // type a: values 10x ~1.0 plus one 100.0 -> med 1, MAD small but
    // positive (residual spread), outlier flagged
    val a = (1 to 10).map(i => (i.toLong, "a", 1.0 + i * 0.01)) :+
      (99L, "a", 100.0)
    // type b: all values identical -> MAD 0 -> no flags
    val b = (1 to 5).map(i => (100L + i, "b", 7.0))
    val df = (a ++ b).toDF("event_id", "event_type", "value")
    val out = graft.operators.Events
      .anomaliesMad(df, threshold = 3.5).collect()
    assert(out.length == 1 && out.head.getLong(0) == 99L)
    assert(out.head.getDouble(4) > 3.5)
  }

  test("recallAtK: missed queries anchor at zero") {
    import operators.Similarity
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 99L)).toDF("query_id", "neighbor_id")
    val out = Similarity.recallAtK(exact, approx, k = 2)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2)))
      .toMap
    assert(out(1L) == ((1L, 0.5)))
    assert(out(2L) == ((0L, 0.0))) // approx returned nothing for q2
  }

  test("cmsHeavyHitters: exact anchors, sketch contracts hold") {
    val df = (Seq.fill(50)(7L) ++ Seq.fill(30)(3L) ++ (100L until 120L))
      .toDF("k")
    val out = Quality.cmsHeavyHitters(df, "k", k = 2).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2),
        x.getBoolean(3))).toMap
    assert(out.keySet == Set(7L, 3L))
    assert(out(7L)._1 == 50L && out(3L)._1 == 30L)
    assert(out.values.forall(v => v._2 && v._3))
  }

  test("layout mortonKey: interleaved ranges are tight on both columns") {
    import graft.ops.Layout
    // 2-bit toy: points on a 4x4 grid; bucket by zkey >> 2 quarters
    val df = (for { a <- 0 to 3; b <- 0 to 3 } yield (a, b)).toDF("a", "b")
    val z = Layout.mortonKey(Seq(col("a").cast("long"),
      col("b").cast("long")), 2)
    val out = df.select(col("a"), col("b"), z.as("zkey"))
      .withColumn("bucket", shiftrightunsigned(col("zkey"), 2))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("a").as("mina"), max("a").as("maxa"),
        min("b").as("minb"), max("b").as("maxb"))
      .collect()
    assert(out.length == 4 && out.forall(_.getLong(1) == 4L))
    // every quarter is a 2x2 square: both column ranges span exactly 1
    assert(out.forall(r => r.getInt(3) - r.getInt(2) == 1
      && r.getInt(5) - r.getInt(4) == 1))
  }

  test("hammingTopK: sign codes shortlist by Hamming, cosine reranks") {
    import operators.Similarity
    // 64-dim vectors: query all-positive; n1 flips 1 sign, n2 flips 4,
    // n3 flips 40 (far) — shortlist of 2 keeps n1/n2, rerank by cosine
    def vec(flips: Set[Int]): Array[Float] =
      (0 until 64).map(i => if (flips(i)) -1.0f else 1.0f).toArray
    val corpus = Seq(
      (1L, vec(Set(3))),
      (2L, vec(Set(1, 7, 33, 60))),
      (3L, vec((0 until 40).toSet))).toDF("vec_id", "embedding")
    val q = Seq((0L, vec(Set.empty[Int]))).toDF("vec_id", "embedding")
    val out = Similarity.hammingTopK(corpus, q, dim = 64, m = 2, k = 2)
      .collect().map(x =>
        (x.getLong(1), x.getInt(2), x.getDouble(3), x.getInt(4)))
    assert(out.length == 2)
    assert(out.map(_._1).toSet == Set(1L, 2L)) // far vector pruned
    val byRank = out.sortBy(_._4)
    assert(byRank(0)._1 == 1L && byRank(0)._2 == 1) // hamming 1
    assert(byRank(1)._1 == 2L && byRank(1)._2 == 4) // hamming 4
    assert(byRank(0)._3 > byRank(1)._3) // cosine order matches
  }

  test("kCenterCoreset: farthest-point traversal on a line") {
    import operators.Similarity
    // points at x=0,1,9,10 (dim-2 padded): seed=min id (x=0), then
    // farthest x=10, then x=9 vs x=1 -> min-dists 1 vs 1 -> tie to id 2
    val pts = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(9.0f, 0.0f)), (4L, Array(10.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kCenterCoreset(pts, k = 3)
      .collect().sortBy(_.getInt(0))
    assert(out(0).getLong(1) == 1L && out(0).isNullAt(2))
    assert(out(1).getLong(1) == 4L && out(1).getDouble(2) == 100.0)
    assert(out(2).getLong(1) == 2L && out(2).getDouble(2) == 1.0)
  }

  test("mmrDiversify: redundancy penalty demotes the near-duplicate") {
    import operators.Similarity
    // c1 ~ query, c2 = c1 near-clone (redundant), c3 lower-rel but far
    // from c1: after picking c1, MMR prefers c3 over the clone
    val corpus = Seq(
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.9f, 0.11f, 0.0f)),
      (3L, Array(0.6f, -0.6f, 0.0f))).toDF("vec_id", "embedding")
    val q = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.mmrDiversify(corpus, q, lambda = 0.5, m = 3, k = 2)
      .collect().sortBy(_.getInt(0))
    assert(out(0).getLong(1) == 1L)
    assert(out(1).getLong(1) == 3L) // clone (id 2) demoted
  }
}
