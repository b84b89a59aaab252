package graft

import graft.operators.{Quality, Similarity}
import org.apache.spark.sql.functions._

/** Data-quality / warehouse operators (Quality.scala) + the embedding
  * dimension profile. Laws, not golden values — the value-level gate is
  * the DuckDB oracle (dq_audit / cdc_scd2 / stats_outliers /
  * fuzzy_join_edit / embed_dim_stats). */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("dqAudit: null/distinct/min/max/sum per column, one row each") {
    val df = Seq(
      (Some(1.0d), Some("a")),
      (Some(3.0d), None),
      (None, Some("a"))).toDF("x", "s")
    val m = Quality.dqAudit(df, numericCols = Seq("x"), otherCols = Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m.keySet == Set("x", "s"))
    val x = m("x")
    assert(x.getLong(1) == 3L && x.getLong(2) == 1L && x.getLong(3) == 2L)
    assert(x.getDouble(4) == 1.0d && x.getDouble(5) == 3.0d && x.getDouble(6) == 4.0d)
    val s = m("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 1L && s.isNullAt(4))
  }

  test("scd2: consecutive same-state runs collapse; intervals chain; last is open") {
    val ev = Seq(
      (1L, "a", 10L, 100L), (1L, "a", 20L, 101L), (1L, "b", 30L, 102L),
      (1L, "a", 40L, 103L),
      (2L, "z", 5L, 104L))
      .toDF("user_id", "event_type", "ms", "event_id")
      .withColumn("ts", timestamp_millis(col("ms")))
    val out = Quality.scd2(ev)
      .select(col("user_id"), col("state"), col("version"),
        unix_millis(col("valid_from")).as("from_ms"),
        unix_millis(col("valid_to")).as("to_ms"), col("is_current"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
      .sortBy(r => (r._1, r._3))
    assert(out.toSeq == Seq(
      (1L, "a", 1L, 10L, 30L, false),
      (1L, "b", 2L, 30L, 40L, false),
      (1L, "a", 3L, 40L, -1L, true),
      (2L, "z", 1L, 5L, -1L, true)))
  }

  private lazy val eventsDf = graft.operators.Events.normalizeEventTs(
    spark.read.parquet(s"${sf()}/events.parquet"))

  test("scd2: intervals tile each entity's timeline (valid_to = next valid_from)") {
    val iv = Quality.scd2(eventsDf).cache()
    try {
      // every non-current interval's valid_to equals the next version's valid_from
      val broken = iv.alias("a").join(iv.alias("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.version") + 1 === col("b.version"))
        .filter(col("a.valid_to") =!= col("b.valid_from"))
      assert(broken.count() == 0)
      assert(iv.filter(col("is_current")).groupBy("user_id").count()
        .filter(col("count") =!= 1).count() == 0)
    } finally iv.unpersist()
  }

  test("iqrOutliers: a planted far point is counted, bulk is not") {
    val vals = (1 to 100).map(i => ("g", i.toDouble)) :+ (("g", 1e6))
    val df = vals.toDF("grp", "v")
    val r = Quality.iqrOutliers(df, "grp", "v").collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 101L && r.head.getLong(2) == 1L)
  }

  test("editLinkage: pairs are canonical, within maxDist, block-bounded") {
    val df = Seq(
      (1L, "red gear", "k1"), (2L, "ted gear", "k1"), (3L, "blue gear", "k1"),
      (4L, "red gear", "k2")).toDF("id", "name", "blk")
    val out = Quality.editLinkage(df, "id", "name", Seq(col("blk")), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    // only (1,2) at distance 1 inside k1; 4 is blocked away from 1
    assert(out.toSeq == Seq((1L, 2L, 1L)))
  }

  test("editLinkage: oversized block trips the runtime guard") {
    val df = (1L to 50L).map(i => (i, s"name$i", "same")).toDF("id", "name", "blk")
    val ex = intercept[Exception] {
      Quality.editLinkage(df, "id", "name", Seq(col("blk")),
        maxDist = 1, maxBlockRows = 10).count()
    }
    assert(ex.getMessage.contains("editLinkage") ||
      Option(ex.getCause).exists(_.getMessage.contains("editLinkage")))
  }

  test("slidingCounts: every event lands in exactly size/slide windows") {
    val n = eventsDf.count()
    val windowed = graft.operators.Events.slidingCounts(eventsDf)
    val total = windowed.agg(sum("n")).collect().head.getLong(0)
    assert(total == 2 * n) // 10-minute windows sliding by 5
    // each window's span is the size and start is slide-aligned
    assert(windowed.filter(
      col("window_end_ms") - col("window_start_ms") =!= 600000L ||
        pmod(col("window_start_ms"), lit(300000L)) =!= 0L).count() == 0)
  }

  test("neymanSample: clamps to full take on a zero-variance-elsewhere budget split") {
    val docs = ((1 to 100).map(i => (i.toLong, "varied", i.toDouble % 10)) ++
      (101 to 200).map(i => (i.toLong, "flat", 5.0)))
      .toDF("doc_id", "source", "quality")
    val out = graft.operators.Corpus.neymanSample(docs, budget = 50L,
      valueCol = "quality")
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the flat stratum has sigma=0 -> weight 0 -> rate 0 -> nothing sampled
    assert(!bySrc.contains("flat"))
    // the varied stratum gets the whole budget at rate 0.5 (+/- coin noise)
    assert(bySrc("varied") > 25L && bySrc("varied") < 75L)
    // determinism + nesting: same call returns the same membership
    val again = graft.operators.Corpus.neymanSample(docs, budget = 50L,
      valueCol = "quality").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("checkConstraints: verdicts count violations per declarative check") {
    val df = Seq(
      (Some(1L), 5.0, "A"), (Some(1L), 60.0, "X"), (None, 5.0, "A"))
      .toDF("k", "v", "flag")
    val dim = Seq(1L).toDF("dk")
    val out = Quality.checkConstraints(df, Seq(
      Quality.NotNull("k"),
      Quality.InRange("v", 0.0, 50.0),
      Quality.AcceptedValues("flag", Seq("A", "B")),
      Quality.UniqueKey(Seq("k")),
      Quality.RefIntegrity("k", dim, "dk")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out("not_null(k)") == ((1L, false)))
    assert(out("in_range(v,0.0,50.0)") == ((1L, false)))
    assert(out("accepted_values(flag)") == ((1L, false)))
    // three rows, two distinct keys (1, null) -> one extra row
    assert(out("unique(k)") == ((1L, false)))
    assert(out("ref_integrity(k)") == ((0L, true)))
  }

  test("incrementalExact: history suppresses known docs; batch collapses per fp") {
    val hist = Seq(1L).toDF("x")
      .select(graft.functions.TextFunctions.md5Fingerprint(lit("known text")).as("fp"))
    val batch = Seq(
      (10L, "known text"), // suppressed by history
      (11L, "fresh text"), (12L, "fresh text"), // collapse to keep_id 11
      (13L, "other text")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.incrementalExact(batch, hist)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((11L, 2L), (13L, 1L)))
  }

  test("dupRateReport: fraction is 1 - unique/docs per source") {
    val docs = Seq(
      (1L, "a", "s1"), (2L, "a", "s1"), (3L, "b", "s1"),
      (4L, "c", "s2")).toDF("doc_id", "text", "source")
    val m = graft.operators.Dedup.dupRateReport(docs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m("s1") == ((3L, 2L, 0.333333)))
    assert(m("s2") == ((1L, 1L, 0.0)))
  }

  test("trendingTypes: at most n per window, rank follows count then name") {
    val out = graft.operators.Events.trendingTypes(eventsDf, n = 2)
    val byWin = out.collect().groupBy(_.getLong(0))
    assert(byWin.nonEmpty && byWin.values.forall(_.length <= 2))
    byWin.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(4))
      assert(sorted.map(_.getInt(4)).toSeq == (1 to sorted.length))
      // counts non-increasing with rank
      val ns = sorted.map(_.getLong(3)).toSeq
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    }
  }

  test("winsorize: clipped mean sits between fences; clip counts match tails") {
    val df = ((1 to 98).map(i => ("g", i.toDouble)) ++
      Seq(("g", -1000.0), ("g", 1000.0))).toDF("grp", "v")
    val r = graft.operators.Quality.winsorize(df, "grp", "v").collect().head
    assert(r.getLong(1) == 100L)
    assert(r.getLong(2) >= 1L && r.getLong(3) >= 1L) // planted tails clipped
    val (mean, lo, hi) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(mean >= lo && mean <= hi)
  }

  test("oovRate: full-size vocab gives zero OOV; tiny vocab gives positive OOV") {
    val docs = Seq(
      (1L, "alpha beta gamma", "s1"),
      (2L, "alpha alpha delta", "s2")).toDF("doc_id", "text", "source")
    val zero = graft.operators.TextAnalysis.oovRate(docs, vocabSize = 100)
    assert(zero.filter(col("n_oov") =!= 0L).count() == 0)
    val tiny = graft.operators.TextAnalysis.oovRate(docs, vocabSize = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // vocab = {alpha} (count 3): s1 has 2 OOV of 3, s2 has 1 OOV of 3
    assert(tiny == Map("s1" -> 2L, "s2" -> 1L))
  }

  test("phashPairs: identical payloads pair at hamming 0; pairs canonical") {
    val media = Seq(
      (1L, "same payload body"), (2L, "same payload body"),
      (3L, "completely different words entirely"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
    val out = graft.operators.Multimodal.phashPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
    assert(out.forall { case (a, b, _) => a < b })
  }

  test("pointInTimeJoin: facts pick the covering version; earlier facts get null") {
    val ch = Seq((1L, "bronze", 100L, 1L), (1L, "gold", 300L, 2L))
      .toDF("user_id", "event_type", "ms", "event_id")
      .withColumn("ts", timestamp_millis(col("ms")))
    val hist = Quality.scd2(ch)
    val facts = Seq((1L, 10L, 50L), (1L, 11L, 150L), (1L, 12L, 300L), (2L, 13L, 400L))
      .toDF("user_id", "fact_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
      .select("user_id", "fact_id", "ts")
    val out = Quality.pointInTimeJoin(facts, hist)
      .select(col("fact_id"), col("state"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) "none" else r.getString(1))).toMap
    assert(out == Map(10L -> "none", 11L -> "bronze", 12L -> "gold", 13L -> "none"))
    // at most one version per fact
    assert(Quality.pointInTimeJoin(facts, hist).count() == facts.count())
  }

  test("welchTTest: planted lift detected; symmetric arms give ~zero t") {
    val df = ((1 to 200).map(i => ("m", i % 2, if (i % 2 == 1) 10.0 + (i % 5) else 5.0 + (i % 5))) ++
      (1 to 100).map(i => ("z", i % 2, (i % 7).toDouble)))
      .toDF("grp", "variant", "v")
    val m = Quality.welchTTest(df, "grp", "variant", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("m").getDouble(3) == 5.0) // lift exactly +5
    assert(m("m").getDouble(4) > 10.0) // strongly significant
    assert(math.abs(m("z").getDouble(4)) < 2.0)
  }

  test("bpeMerges: learns the hand-computed merge sequence with tie-breaks") {
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.bpeMerges(docs, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1)
    // words: low x2, lower x1. round 1: (l,o)=3 ties (o,w)=3 -> 'l'<'o'.
    // round 2: (lo,w)=3. round 3: (low,e)=1 ties (e,r)=1 -> 'e'<'low'.
    assert(out.toSeq == Seq(
      (1, "l", "o", "lo", 3L),
      (2, "lo", "w", "low", 3L),
      (3, "e", "r", "er", 1L)))
  }

  test("bpeEncodeCounts: symbol counts follow the learned merges") {
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.bpeEncodeCounts(docs, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // merges lo, low, er: low -> [low] (1 sym), lower -> [low, er] (2)
    assert(out.toSeq == Seq((1L, 3L, 1L + 1L + 2L)))
  }

  test("dimStats: exact moments of a two-vector corpus") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(3.0f, 6.0f))).toDF("vec_id", "embedding")
    val m = Similarity.dimStats(df).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(m(0).getLong(1) == 2L)
    assert(m(0).getDouble(2) == 2.0d) // mean of 1,3
    assert(m(0).getDouble(3) == 1.0d) // var_pop of 1,3
    assert(m(1).getDouble(2) == 4.0d && m(1).getDouble(3) == 4.0d)
    assert(m(1).getDouble(4) == 2.0d && m(1).getDouble(5) == 6.0d)
  }
}
