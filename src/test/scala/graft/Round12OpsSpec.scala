package graft

import graft.operators.{Corpus, Graph}
import org.apache.spark.sql.functions._

/** Round-12 operators: Borůvka spanning forest, k-shortest path costs,
  * URL canonicalization dedup. */
class Round12OpsSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic pseudo-random multigraph: ~150 candidate edges over 40
  // nodes, weights made unique by the (w, src, dst) tie-break anyway
  private def randomGraph(): Seq[(Long, Long, Long)] =
    (0 until 150).flatMap { i =>
      val a = (i * 7919L) % 40L
      val b = (i * 104729L + 3L) % 40L
      if (a == b) None else Some((math.min(a, b), math.max(a, b), (i * 31L) % 17L + 1L))
    }

  /** Kruskal under the same (w, src, dst) total order — with a total
    * order the forest is unique, so Borůvka must reproduce it exactly. */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val dedup = edges.groupBy(e => (e._1, e._2))
      .map { case ((s, d), es) => (s, d, es.map(_._3).min) }.toSeq
    val picked = scala.collection.mutable.Set[(Long, Long, Long)]()
    for ((s, d, w) <- dedup.sortBy(e => (e._3, e._1, e._2))) {
      val (rs, rd) = (find(s), find(d))
      if (rs != rd) { parent(rs) = rd; picked += ((s, d, w)) }
    }
    picked.toSet
  }

  test("boruvkaMst equals Kruskal under the shared total order; forest is complete") {
    val es = randomGraph()
    val df = es.toDF("src", "dst", "wt")
    val got = Graph.boruvkaMst(df, maxRounds = 8, weightCol = Some("wt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = kruskal(es)
    assert(got == want)
    // completeness: |forest| = V - C on this connected-or-not graph
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    val comps = Graph.connectedComponents(df)
      .select("component").distinct().count()
    assert(got.size.toLong == nodes.size - comps)
  }

  test("boruvkaMst: empty input and single-component early exit") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "wt")
    assert(Graph.boruvkaMst(empty, weightCol = Some("wt")).count() == 0L)
    // a triangle resolves in one round and exits early (no round-2 rows)
    val tri = Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 3L)).toDF("src", "dst", "wt")
    val rows = Graph.boruvkaMst(tri, maxRounds = 8, weightCol = Some("wt")).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L), (2L, 3L)))
    assert(rows.forall(_.getInt(3) == 1))
  }

  test("kShortestDistances: matches brute-force walk enumeration on a DAG") {
    val es = Seq((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 1L), (3L, 4L, 1L),
      (2L, 4L, 5L)).toDF("src", "dst", "wt")
    val src = Seq(Tuple1(1L)).toDF("node")
    val got = Graph.kShortestDistances(es, src, k = 3, maxHops = 4,
      weightCol = Some("wt"), directed = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute-force: all hop<=4 walk costs, k smallest distinct per node
    val adj = Seq((1L, 2L, 1.0), (1L, 3L, 2.0), (2L, 3L, 1.0), (3L, 4L, 1.0),
      (2L, 4L, 5.0))
    var frontier = Seq((1L, 0.0))
    var all = frontier
    for (_ <- 1 to 4) {
      frontier = frontier.flatMap { case (n, c) =>
        adj.collect { case (s, d, w) if s == n => (d, c + w) } }
      all ++= frontier
    }
    val want = all.distinct.groupBy(_._1).flatMap { case (n, cs) =>
      cs.map(_._2).distinct.sorted.take(3).zipWithIndex
        .map { case (c, i) => (n, (i + 1).toLong, c) }
    }.toSet
    assert(got == want)
    // rank-1 costs are exactly the single-source shortest distances
    val sp = Graph.shortestPaths(es, src, maxHops = 4,
      weightCol = Some("wt"), directed = true)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    got.filter(_._2 == 1L).foreach { case (n, _, c) => assert(sp(n) == c) }
  }

  test("kShortestDistances: in-degree guard trips on a hub") {
    val hub = (1L to 30L).map(i => (i, 99L, 1L)).toDF("src", "dst", "wt")
    val src = Seq(Tuple1(1L)).toDF("node")
    val err = intercept[Exception] {
      Graph.kShortestDistances(hub, src, k = 2, maxHops = 2,
        weightCol = Some("wt"), directed = true, maxInDegree = 10L).collect()
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("kShortestDistances") && msgs.contains("maxInDegree"))
  }

  test("canonicalizeUrl: each rule, one at a time") {
    val cases = Seq(
      ("https://A.Example.COM/Path#frag", "https://a.example.com/Path"),
      ("HTTPS://host.com:443/x", "https://host.com/x"),
      ("http://host.com:80/x", "http://host.com/x"),
      ("http://host.com:8080/x", "http://host.com:8080/x"),
      ("https://h.com/docs/", "https://h.com/docs"),
      ("https://h.com/", "https://h.com"),
      ("https://h.com/p?b=2&utm_source=x&a=1", "https://h.com/p?a=1&b=2"),
      ("https://h.com/p?UTM_Campaign=x&fbclid=1&gclid=2&ref=3", "https://h.com/p"),
      ("/relative/path/?utm_source=x", "/relative/path"),
      ("https://h.com/Case/Kept?Q=UpPeR", "https://h.com/Case/Kept?Q=UpPeR"))
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), Corpus.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"for $in") }
  }

  test("ewma: closed form equals the driver-side recursion") {
    val ts = (i: Long) => new java.sql.Timestamp(i * 60000L)
    val rows = Seq(
      (1L, ts(1), 10.0, 101L), (1L, ts(2), 20.0, 102L), (1L, ts(3), 30.0, 103L),
      (2L, ts(5), 7.0, 104L))
      .toDF("user_id", "ts", "value", "event_id")
    val got = graft.operators.Events.ewma(rows, alpha = 0.25, lastN = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // s = 0.25*30 + 0.25*0.75*20 + 0.75^2*10 (oldest carries the tail)
    def rec(vs: Seq[Double]) = vs.tail.foldLeft(vs.head)((s, x) => 0.25 * x + 0.75 * s)
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - rec(Seq(10.0, 20.0, 30.0))) < 1e-9)
    assert(got(2L) == (1L, 7.0))
  }

  test("ewma: lastN truncation uses only the newest N values") {
    val ts = (i: Long) => new java.sql.Timestamp(i * 1000L)
    val rows = (1L to 10L).map(i => (1L, ts(i), i.toDouble, 100L + i))
      .toDF("user_id", "ts", "value", "event_id")
    val got = graft.operators.Events.ewma(rows, alpha = 0.5, lastN = 4)
      .collect().head
    // newest 4 values are 7,8,9,10 → s over (7,8,9,10)
    def rec(vs: Seq[Double]) = vs.tail.foldLeft(vs.head)((s, x) => 0.5 * x + 0.5 * s)
    assert(got.getLong(1) == 4L)
    assert(math.abs(got.getDouble(2) - rec(Seq(7.0, 8.0, 9.0, 10.0))) < 1e-9)
  }

  test("epochShuffle: deterministic, epoch-dependent, shard = key mod n") {
    val docs = (0L until 200L).map(Tuple1(_)).toDF("doc_id")
    val e1 = Corpus.epochShuffle(docs, epoch = 1, nShards = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val e1b = Corpus.epochShuffle(docs, epoch = 1, nShards = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val e2 = Corpus.epochShuffle(docs, epoch = 2, nShards = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(e1 == e1b) // reproducible
    assert(e1 != e2)  // epochs permute differently
    assert(e1.values.forall { case (s, k) => s == (k % 8 + 8) % 8 && s >= 0 })
    // order keys are (essentially) collision-free 32-bit draws here
    assert(e1.values.map(_._2).toSet.size == 200)
  }

  test("approxDistinctAudit: exact anchor matches and the bound holds") {
    val df = (0L until 3000L).map(i => (s"g${i % 3}", i % 500))
      .toDF("grp", "v")
    val r = graft.operators.Quality.approxDistinctAudit(df, "v", "grp")
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    assert(r.keySet == Set("g0", "g1", "g2"))
    assert(r.values.forall { case (n, ok) => n == 500L && ok })
  }

  test("boilerplateStrip drops ALL copies of a high-df line; lineDedup keeps the first") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "cookie banner\nunique one"),
      (2L, "cookie banner\nunique two"),
      (3L, "Cookie Banner\nunique three"), // normalization: case-folded hash
      (4L, "rare line\nunique four"),
      (5L, "rare line\nunique five")) // df=2 < minDf=3 → kept everywhere
      .toDF("doc_id", "text")
    val stripped = TextAnalysis.boilerplateStrip(docs, minDf = 3L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(stripped(1L) == (1L, "unique one"))
    assert(stripped(2L) == (1L, "unique two"))
    assert(stripped(3L) == (1L, "unique three"))
    assert(stripped(4L) == (2L, "rare line\nunique four"))
    assert(stripped(5L) == (2L, "rare line\nunique five"))
    // the sibling policy: lineDedup keeps doc 1's banner copy
    val deduped = TextAnalysis.lineDedup(docs)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(deduped(1L) == "cookie banner\nunique one")
    assert(deduped(2L) == "unique two")
  }

  test("ohlcBars: open/close pick by (ts, tie); high/low by value") {
    val ts = (m: Long) => new java.sql.Timestamp(3600000L + m * 60000L)
    val rows = Seq(
      (1L, ts(0), 5.0, 101L), (1L, ts(0), 4.0, 100L), // tie: event 100 opens
      (1L, ts(10), 9.0, 102L), (1L, ts(20), 2.0, 103L),
      (1L, ts(59), 6.0, 104L),
      (1L, ts(60), 7.0, 105L)) // next hour bar
      .toDF("user_id", "ts", "value", "event_id")
    val bars = graft.operators.Events.ohlcBars(rows).collect()
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))).toMap
    assert(bars(3600000L) == (4.0, 9.0, 2.0, 6.0, 5L))
    assert(bars(7200000L) == (7.0, 7.0, 7.0, 7.0, 1L))
  }

  test("kmeans: two tight blobs separate perfectly and inertia shrinks with rounds") {
    import graft.operators.Similarity
    // blob A near (0,0), blob B near (10,10); ids interleaved so the
    // k-smallest-id init starts with one seed in each blob
    val vecs = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Seq(base + (i % 5) * 0.1f, base - (i % 3) * 0.1f))
    }.toDF("vec_id", "embedding")
    val r = Similarity.kmeans(vecs, k = 2, iters = 2).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getDouble(2)))
    val byCluster = r.groupBy(_._2).view.mapValues(_.map(_._1 % 2).toSet).toMap
    assert(byCluster.size == 2)
    assert(byCluster.values.toSet == Set(Set(0L), Set(1L))) // pure blobs
    val inertia2 = r.map(_._3).sum
    val inertia0 = Similarity.kmeans(vecs, k = 2, iters = 0).collect()
      .map(_.getDouble(2)).sum
    assert(inertia2 <= inertia0 + 1e-6) // Lloyd never worsens it
  }

  test("mannWhitneyU: hand-computed U and tie-corrected z on a tiny fixture") {
    val a = Seq(1.0, 2.0, 3.0).map(Tuple1(_)).toDF("v")
    val b = Seq(2.0, 3.0, 4.0).map(Tuple1(_)).toDF("v")
    val r = graft.operators.Quality.mannWhitneyU(a, b, "v").collect().head
    // ranks: 1→1, 2→{2,3}→2.5, 3→{4,5}→4.5, 4→6; R_A = 8, U_A = 2
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0)
    // sigma^2 = (9/12)·(7 − 12/30) = 4.95; z = (2 − 4.5)/sqrt(4.95)
    assert(math.abs(r.getDouble(3) - (-2.5 / math.sqrt(4.95))) < 1e-6)
  }

  test("cusum: run deviations on a hand-built rate series") {
    val h = (i: Long) => new java.sql.Timestamp(i * 3600000L)
    // hourly counts [1, 0, 9]: D_k = 3c_k − 10k = (−7, −17, 0)
    val rows = (Seq((1L, h(0))) ++ (1L to 9L).map(i => (100L + i, h(2))))
      .map { case (id, ts) => (id, ts, 7L, "t", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.operators.Events.cusum(rows).collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 10L) // m, total
    assert(math.abs(r.getDouble(3) - 17.0 / 3) < 1e-6) // cusum_up
    assert(r.getLong(4) == h(2).getTime)               // up peak
    assert(math.abs(r.getDouble(5) - 10.0 / 3) < 1e-6) // cusum_down
    assert(r.getLong(6) == h(1).getTime)               // down peak
  }

  test("bootstrapMeanCI: deterministic, interval brackets the point mean") {
    import graft.operators.Quality
    val df = (1L to 500L).map(i => (i, (i % 100).toDouble)).toDF("id", "v")
    val r1 = Quality.bootstrapMeanCI(df, "id", "v", b = 32).collect().head
    val r2 = Quality.bootstrapMeanCI(df, "id", "v", b = 32).collect().head
    assert(r1 == r2) // md5 coins: bit-reproducible
    val (n, mean, lo, hi) =
      (r1.getLong(0), r1.getDouble(1), r1.getDouble(2), r1.getDouble(3))
    assert(n == 500L)
    assert(lo < hi && lo <= mean && mean <= hi)
    // a different salt draws a different resample
    val r3 = Quality.bootstrapMeanCI(df, "id", "v", b = 32, salt = "boot2")
      .collect().head
    assert(r3.getDouble(2) != lo || r3.getDouble(3) != hi)
    // thresholds are a valid increasing CDF image
    val t = Quality.PoissonThresholds
    assert(t == t.sorted && t.distinct.size == t.size)
    assert(t.last > (0.999d * 4294967296.0d).toLong)
  }

  test("rrfFuse: appearing in both lists beats either single rank-1") {
    import graft.operators.TextAnalysis
    val la = Seq((10L, 1), (20L, 2)).toDF("id", "rank")
    val lb = Seq((20L, 1), (30L, 2)).toDF("id", "rank")
    val r = TextAnalysis.rrfFuse(Seq(la, lb), kRrf = 60, topK = 10).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r.map(_._1).toSeq == Seq(20L, 10L, 30L)) // 1/61+1/62 > 1/61 > 1/62
    assert(r.head._2 == 2L)
    assert(math.abs(r.head._3 - (1.0 / 61 + 1.0 / 62)) < 1e-9)
  }

  test("snapshotDiff: every status bucket classified, null-safe compares") {
    import graft.operators.Quality
    val old = Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"),
      (4L, Double.NaN, "D")).toDF("k", "p", "s")
      .withColumn("p", when(col("k") === 4L, lit(null)).otherwise(col("p")))
    val neu = Seq((1L, 10.0, "A"), (2L, 21.0, "B"), (5L, 50.0, "E"),
      (4L, 40.0, "D")).toDF("k", "p", "s")
    val r = Quality.snapshotDiff(old, neu, Seq("k"), Seq("p", "s"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("unchanged") == 1L) // key 1
    assert(r("changed") == 2L)   // key 2 (price), key 4 (null -> 40)
    assert(r("removed") == 1L)   // key 3
    assert(r("added") == 1L)     // key 5
    assert(r("changed:p") == 2L && r("changed:s") == 0L)
  }

  test("keySkewReport: uniform keys gini 0, one hub drives it up") {
    import graft.operators.Quality
    val uniform = (1L to 100L).map(i => (i % 10, i)).toDF("k", "x")
    val u = Quality.keySkewReport(uniform, Seq("k")).collect().head
    assert(u.getLong(1) == 100L && u.getLong(2) == 10L) // n_rows, n_keys
    assert(u.getDouble(4) == 0.1 && u.getDouble(5) == 0.0) // share, gini
    // 9 keys with 1 row + one hub with 91: sorted x = (1..1, 91)
    val hub = ((1L to 9L).map(i => (i, i)) ++ (1L to 91L).map(i => (99L, i)))
      .toDF("k", "x")
    val h = Quality.keySkewReport(hub, Seq("k")).collect().head
    // G = (2*(1*1+..+9*1 + 10*91) - 11*100) / (10*100) = (2*955-1100)/1000
    assert(h.getDouble(5) == 0.81)
    assert(h.getDouble(4) == 0.91)
  }

  test("cohensKappa: hand-computed 2x2 agreement") {
    import graft.operators.Quality
    val a = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("doc_id", "pass")
    val b = Seq((1L, true), (2L, false), (3L, false), (4L, false))
      .toDF("doc_id", "pass")
    val r = Quality.cohensKappa(a, b).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.75 && r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == 0.5)
    // identical raters with both classes present: kappa = 1
    val same = Quality.cohensKappa(a, a).collect().head
    assert(same.getDouble(4) == 1.0)
  }

  test("psi: identical samples score 0, a shifted sample scores high") {
    import graft.operators.Quality
    val base = (1L to 1000L).map(i => Tuple1((i % 100).toDouble)).toDF("v")
    val same = Quality.psi(base, base, "v").collect().head
    assert(same.getDouble(2) == 0.0)
    val shifted = (1L to 1000L).map(i => Tuple1((i % 100).toDouble + 50.0)).toDF("v")
    val drift = Quality.psi(base, shifted, "v").collect().head
    assert(drift.getDouble(2) > 0.25) // "investigate" territory
    assert(drift.getLong(0) == 1000L && drift.getLong(1) == 1000L)
  }

  test("empty-input hygiene: new operators return empty or degenerate frames, no throw") {
    import graft.operators.{Events, Quality, TextAnalysis}
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Events.ewma(noEvents).count() == 0L)
    assert(Events.cusum(noEvents).count() == 0L)
    assert(Events.ohlcBars(noEvents).count() == 0L)
    assert(Events.latencyBands(noEvents).count() == 0L)
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.boilerplateStrip(noDocs).count() == 0L)
    val noUrls = Seq.empty[(Long, String)].toDF("doc_id", "url")
    assert(graft.operators.Corpus.urlDedup(noUrls).count() == 0L)
    val noKeyed = Seq.empty[(Long, Double)].toDF("k", "v")
    assert(Quality.keySkewReport(noKeyed, Seq("k")).collect().head.getLong(2) == 0L)
    val ks = Graph.kShortestDistances(
      Seq.empty[(Long, Long, Long)].toDF("src", "dst", "wt"),
      Seq(Tuple1(1L)).toDF("node"), k = 2, maxHops = 2, weightCol = Some("wt"))
    assert(ks.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      Seq((1L, 0.0))) // the source itself at cost 0
  }

  test("quantileNormalize: shifted groups land on identical pooled quantiles") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 11.0), ("b", 12.0), ("b", 13.0)).toDF("g", "v")
    val r = Corpus.quantileNormalize(df, "g", "v").collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getDouble(3)))
    val byG = r.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // both groups: ranks 1/3, 2/3, 3/3 → pooled values 2, 11, 13
    assert(byG("a") == Seq(2.0, 11.0, 13.0))
    assert(byG("b") == Seq(2.0, 11.0, 13.0))
  }

  test("quantileNormalize: histogram fanout past the bounds fails fast") {
    // 40 distinct 6-dp-surviving values per group, 2 groups → pooled
    // histogram 80 rows, group histogram 80 rows, fanout 6400
    val df = (1 to 40).flatMap(i =>
      Seq(("a", i + 0.000001 * i), ("b", i + 100 + 0.000001 * i)))
      .toDF("g", "v")
    val e1 = intercept[IllegalArgumentException] {
      Corpus.quantileNormalize(df, "g", "v", maxPooledRows = 10)
    }
    assert(e1.getMessage.contains("maxPooledRows") &&
      e1.getMessage.contains("80"))
    val e2 = intercept[IllegalArgumentException] {
      Corpus.quantileNormalize(df, "g", "v", maxJoinFanout = 1000)
    }
    assert(e2.getMessage.contains("maxJoinFanout") &&
      e2.getMessage.contains("80 x 80"))
    // bounds that admit the histograms let the mapping through intact
    assert(Corpus.quantileNormalize(df, "g", "v").count() == 80L)
  }

  test("urlDedup: canonical variants collapse to one keeper") {
    val docs = Seq(
      (1L, "https://a.com/x?utm_source=f"),
      (2L, "HTTPS://A.com/x/"),
      (3L, "https://a.com:443/x#top"),
      (4L, "https://a.com/y"),
      (5L, "https://b.com/x")).toDF("doc_id", "url")
    val r = Corpus.urlDedup(docs).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r == Map(
      "https://a.com/x" -> (1L, 3L),
      "https://a.com/y" -> (4L, 1L),
      "https://b.com/x" -> (5L, 1L)))
  }
}
