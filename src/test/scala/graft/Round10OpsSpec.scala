package graft

import graft.operators.{Events, Graph, Quality, Similarity}
import org.apache.spark.sql.functions._

/** Round-10 operators: MERGE snapshot maintenance, entropy / mutual-
  * information profiling, change-point detection, topological layering,
  * blocked DBSCAN. Laws and semantics, not golden values — the
  * value-level gate is the DuckDB oracle (cdc_merge / dq_entropy /
  * dq_mutual_info / ev_changepoint / graph_toposort / emb_dbscan). */
class Round10OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("mergeSnapshot: upsert wins by order, delete removes, untouched kept") {
    val target = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "state", "v")
    val changes = Seq(
      // key 1: two upserts — the later (ts=6) must win
      (1L, "U", "a2", 11L, 5L, 100L), (1L, "U", "a3", 12L, 6L, 101L),
      // key 2: delete wins over an earlier upsert
      (2L, "U", "b2", 21L, 5L, 102L), (2L, "D", "b2", 21L, 6L, 103L),
      // key 4: upsert to an absent key inserts
      (4L, "U", "d", 40L, 5L, 104L),
      // key 5: delete of an absent key is a no-op (no row out)
      (5L, "D", "e", 50L, 5L, 105L))
      .toDF("k", "op", "state", "v", "ts", "tie")
    val out = Quality.mergeSnapshot(target, changes, "k", "op",
      orderCols = Seq("ts", "tie"), payloadCols = Seq("state", "v"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out == Map(
      1L -> (("a3", 12L, "updated")),
      3L -> (("c", 30L, "kept")),
      4L -> (("d", 40L, "inserted"))))
  }

  test("categoricalEntropy: uniform column maxes entropy_norm, constant is 0") {
    val df = Seq(("a", "x"), ("b", "x"), ("c", "x"), ("d", "x"))
      .toDF("uniform", "constant")
    val m = Quality.categoricalEntropy(df, Seq("uniform", "constant"))
      .collect().map(r => r.getString(0) -> r).toMap
    val u = m("uniform")
    assert(u.getLong(2) == 4L) // n_distinct
    assert(math.abs(u.getDouble(3) - math.log(4.0)) < 1e-6)
    assert(math.abs(u.getDouble(4) - 1.0) < 1e-6) // normalized = 1
    val c = m("constant")
    assert(c.getLong(2) == 1L && c.getDouble(3) == 0.0 && c.isNullAt(4))
  }

  test("categoricalEntropy counts null as a category") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("x")
    val r = Quality.categoricalEntropy(df, Seq("x")).collect().head
    assert(r.getLong(2) == 2L) // {a, null}
    assert(math.abs(r.getDouble(3) - math.log(2.0)) < 1e-6)
  }

  test("mutualInformation: independent columns 0, determined column = H") {
    // x uniform over {a,b}; y == x (fully dependent); z constant-paired
    // (independent of x: every (x,z) cell has equal mass)
    val df = Seq(("a", "a", "p"), ("a", "a", "q"), ("b", "b", "p"), ("b", "b", "q"))
      .toDF("x", "y", "z")
    val dep = Quality.mutualInformation(df, "x", "y").collect().head
    assert(math.abs(dep.getDouble(1) - math.log(2.0)) < 1e-6) // MI = H(X)
    val ind = Quality.mutualInformation(df, "x", "z").collect().head
    assert(math.abs(ind.getDouble(1)) < 1e-9)
  }

  test("changePoint finds an exact level shift and zero-fills gaps") {
    // hourly series [4, 4, 4, 1, 0, 1]: level shift after hour 2
    // (split_k = 3), hour 4 is a GAP that must densify to zero
    val rows = Seq(0 -> 4, 1 -> 4, 2 -> 4, 3 -> 1, 5 -> 1).flatMap {
      case (h, n) => (0 until n).map(i => ("A", 3600000000L * h + i * 1000L))
    }
    val ev = rows.toDF("event_type", "us")
      .select(col("event_type"), timestamp_micros(col("us")).as("ts"))
    val out = Events.changePoint(ev, "hour").collect()
    assert(out.length == 1)
    val r = out.head
    // series = [4,4,4,1,0,1]: best split must separate the high level
    assert(r.getLong(2) == 3L) // split_k
    assert(math.abs(r.getDouble(5) - 4.0) < 1e-6) // mean_before
    assert(math.abs(r.getDouble(6) - (2.0 / 3.0)) < 1e-6) // mean_after
  }

  test("topoLayers: layers = earliest wave; cycle nodes surface null") {
    // DAG part: 1->2->3, 1->3; cycle part: 10->11, 11->10, 11->12
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 10L), (11L, 12L))
      .toDF("src", "dst")
    val out = Graph.topoLayers(e, maxRounds = 5).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L,
      10L -> -1L, 11L -> -1L, 12L -> -1L))
  }

  test("topoLayers hop bound: deep chain past maxRounds yields nulls") {
    val chain = (0L until 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = Graph.topoLayers(chain, maxRounds = 3).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(0L) == 0L && out(1L) == 1L && out(2L) == 2L)
    assert(Seq(3L, 4L, 5L, 6L).forall(out(_) == -1L))
  }

  test("dbscan: dense block cores cluster, bridge is border, outlier is noise") {
    // one block; vecs 1-4 mutually similar (all pairs ≥ 0.9 cosine →
    // core at minPts=4 incl self), vec 5 reaches only vecs 3 and 4
    // (2 + self = 3 < 4 → border), vec 6 orthogonal (noise)
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat, 0f)
    val df = Seq(
      (1L, v(1, 0.00)), (2L, v(1, 0.01)), (3L, v(1, 0.02)), (4L, v(1, 0.03)),
      (5L, v(1, 0.5)), (6L, v(0, 1)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
    val out = Similarity.dbscan(df, simThreshold = 0.9, minPts = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(i => out(i) == (("core", 1L))))
    assert(out(5L)._1 == "border" && out(5L)._2 == 1L)
    assert(out(6L) == (("noise", -1L)))
  }

  test("benfordAudit: digit spine complete, zero digits in chi, exact fracs") {
    // values 10..19 (digit 1) ×9 plus one 25 (digit 2); 0.4 excluded
    val df = ((10 to 18).map(_.toDouble) :+ 25.0 :+ 0.4).toDF("x")
    val rows = Quality.benfordAudit(df, Seq("x")).collect()
    assert(rows.length == 9) // all 9 digits present even when unseen
    val byDigit = rows.map(r => r.getInt(1) -> r).toMap
    assert(byDigit(1).getLong(2) == 9L && byDigit(2).getLong(2) == 1L)
    assert(byDigit(3).getLong(2) == 0L && byDigit(3).getDouble(3) == 0.0)
    assert(math.abs(byDigit(1).getDouble(3) - 0.9) < 1e-9)
    assert(math.abs(byDigit(1).getDouble(4) - math.log10(2.0)) < 1e-6)
    // one chi_sq repeated on every digit row
    assert(rows.map(_.getDouble(5)).distinct.length == 1)
  }

  test("mergeIntervals: overlap and touch merge, gaps split, engulf holds") {
    val iv = Seq(
      // key 1: [0,10] ∪ [5,20] ∪ [20,30] one island (touch merges);
      // [40,50] a second island
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 20L, 30L), (1L, 40L, 50L),
      // key 2: [0,100] engulfs [10,20] and [30,40] — one island of 3
      (2L, 0L, 100L), (2L, 10L, 20L), (2L, 30L, 40L))
      .toDF("k", "s", "e")
    val out = Events.mergeIntervals(iv, "k", "s", "e").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 0L, 30L, 3L), (1L, 40L, 50L, 1L),
      (2L, 0L, 100L, 3L)))
  }

  test("greedyColoring: proper coloring with min-free colors, not peel rounds") {
    // path 1-2-3-4 plus chord 1-3: winners r0 = {1}, color 0; r1 = {2, 3}?
    // no — 3 waits on 2? edges canonical: (1,2),(2,3),(3,4),(1,3):
    // r0 winner {1}: color 0. r1: remaining edges (2,3),(3,4): winner {2}
    // color mex{c(1)}=mex{0}=1. r2: winner {3}: nbrs colored {1:0, 2:1}
    // → mex = 2. r3: winner {4}: nbr {3:2} → mex = 0.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("src", "dst")
    val out = Graph.greedyColoring(e, maxRounds = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 0L))
    // proper-coloring law: no edge joins two same-colored nodes
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).foreach { case (a, b) =>
      assert(out(a) != out(b))
    }
  }

  test("greedyColoring hop bound: chain past maxRounds yields nulls") {
    val chain = (0L until 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = Graph.greedyColoring(chain, maxRounds = 2).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // r0 winner {0} color 0; r1 winner {1} mex{0}=1; rest unresolved
    assert(out(0L) == 0L && out(1L) == 1L)
    assert((2L to 6L).forall(out(_) == -1L))
  }

  test("readability: simple prose scores higher than dense polysyllables") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran. It was fun."),
      (2L, "Incomprehensibility characterizes interdisciplinary epistemological paradigmatic reconceptualization methodologies."))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.readability(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(2) == 3) // three sentences
    assert(out(1L).getDouble(4) > out(2L).getDouble(4))
    assert(out(2L).getInt(3) >= 2 * out(2L).getInt(1)) // polysyllabic
  }

  test("textRank: the hub word connecting both clusters ranks first") {
    // "data" co-occurs with every other content word; stopwords and
    // short tokens never become nodes
    val docs = Seq(
      (1L, "data pipeline quality and data pipeline scale"),
      (2L, "data quality rules the data quality gate"),
      (3L, "xy is of a to")) // all short/stopword — contributes nothing
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.textRankKeywords(
      docs, window = 2, minTokenLen = 3, iters = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.head._1 == "data")
    assert(out.map(_._1).toSet.intersect(Set("and", "the", "xy", "is")).isEmpty)
    // ranks are a probability-ish mass: all positive
    assert(out.forall(_._2 > 0d))
  }

  test("auditDrift: detects the injected null/mean shift, flat otherwise") {
    val before = Seq((1.0, "a"), (2.0, "b"), (3.0, "a")).toDF("x", "s")
    val after = Seq((Some(10.0), "a"), (None, "b"), (Some(11.0), "c"))
      .toDF("x", "s")
    val m = Quality.auditDrift(before, after, Seq("x"), Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = m("x")
    assert(math.abs(x.getAs[Double]("null_frac_delta") - 1.0 / 3.0) < 1e-6)
    assert(math.abs(x.getAs[Double]("mean_delta") - (10.5 - 2.0)) < 1e-6)
    val s = m("s")
    assert(s.getAs[Long]("distinct_delta") == 1L)
    assert(s.isNullAt(s.fieldIndex("mean_delta")))
  }

  test("tokenBudgetTrim: best scores first, boundary value shares a fate") {
    // source s: scores 0.9 (10 tok), 0.8 (two docs x 10 tok), 0.5 (10)
    // budget 15: keep 0.9 (cum_before 0) and BOTH 0.8 docs (cum_before
    // 10 < 15 — ties share a fate, overshoot allowed); 0.5 cut (30 >= 15)
    val docs = Seq(
      (1L, "s", 0.9, "a b c d e f g h i j"),
      (2L, "s", 0.8, "a b c d e f g h i j"),
      (3L, "s", 0.8, "a b c d e f g h i j"),
      (4L, "s", 0.5, "a b c d e f g h i j"))
      .toDF("doc_id", "source", "quality", "text")
    val kept = graft.operators.Corpus.tokenBudgetTrim(docs, budgetTokens = 15L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("timeWeightedAvg: durations weight values; last reading carries none") {
    // key 1: v=10 for 100ms, v=20 for 300ms, final v=99 (no successor)
    val ev = Seq(
      (1L, 0L, 10.0, 1L), (1L, 100L, 20.0, 2L), (1L, 400L, 99.0, 3L))
      .toDF("user_id", "ms", "value", "event_id")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"),
        col("value"), col("event_id"))
    val r = Events.timeWeightedAvg(ev).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 400L)
    assert(math.abs(r.getDouble(3) - (10.0 * 100 + 20.0 * 300) / 400.0) < 1e-9)
  }

  test("maximalMatching: a matching (disjoint), maximal on the path") {
    // path 1-2-3-4-5: greedy by pair order matches (1,2) then (3,4);
    // 5 stays single — maximal, and no node repeats
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val m = Graph.maximalMatching(e, maxRounds = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m == Set((1L, 2L), (3L, 4L)))
    val nodes = m.toSeq.flatMap(p => Seq(p._1, p._2))
    assert(nodes.distinct.length == nodes.length) // a matching
  }

  test("maximalMatching: triangle matches exactly one edge") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val m = Graph.maximalMatching(e, maxRounds = 5).collect()
    assert(m.length == 1 && m.head.getLong(0) == 1L && m.head.getLong(1) == 2L)
  }

  test("chiSquareIndependence: zero for independence, n(k-1) for identity") {
    val df = Seq(("a", "a", "p"), ("a", "a", "q"), ("b", "b", "p"), ("b", "b", "q"))
      .toDF("x", "y", "z")
    // y == x: 2x2 table with diagonal mass → chi2 = n, dof = 1
    val dep = Quality.chiSquareIndependence(df, "x", "y").collect().head
    assert(math.abs(dep.getDouble(1) - 4.0) < 1e-6 && dep.getLong(2) == 1L)
    // z independent of x: every cell at its expected count → chi2 = 0
    val ind = Quality.chiSquareIndependence(df, "x", "z").collect().head
    assert(math.abs(ind.getDouble(1)) < 1e-9)
  }

  test("labelCentroids: exact means and variances per (label, dim)") {
    val df = Seq(
      (0, Array(1.0f, 4.0f)), (0, Array(3.0f, 4.0f)), (1, Array(10.0f, 0.0f)))
      .toDF("label", "embedding")
    val out = Similarity.labelCentroids(df).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out((0, 0)) == ((2L, 2.0, 1.0))) // mean (1+3)/2, var_pop 1
    assert(out((0, 1)) == ((2L, 4.0, 0.0)))
    assert(out((1, 0)) == ((1L, 10.0, 0.0)))
  }

  test("dbscan minPts=1: every vector cores, isolated ones as singletons") {
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val df = Seq((1L, v(1, 0)), (2L, v(1, 0.01)), (3L, v(0, 1)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
    val out = Similarity.dbscan(df, simThreshold = 0.9, minPts = 1)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("core", 1L)) && out(2L) == (("core", 1L)))
    assert(out(3L) == (("core", 3L))) // isolated singleton core
  }
}
