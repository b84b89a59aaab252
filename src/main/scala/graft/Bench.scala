package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Each query is forced through the `noop` sink: full computation of
  * every output row/column, no result materialization on the driver and
  * no metadata-only count() shortcuts.
  *
  * Each query runs SPARK_GRAFT_REPS times (default 3); the per-query
  * map reports the MEDIAN, and the totals carry BOTH the median total
  * and the MIN total — min is the standard contention-resistant
  * statistic (the fastest rep had the least ambient interference), and
  * `worst_query` is selected by per-query MIN so a single load spike on
  * the shared recording box cannot fabricate a phantom regression
  * (rounds 4–6 each recorded one). Full per-rep spread goes to stderr
  * and `bench_detail.json`; the totals object additionally lands in
  * `bench_total.json` so the record no longer depends on stdout tail
  * parsing. The stdout lines stay compact: the harness that records
  * them keeps only a bounded tail, and rounds 1–4 proved that a line
  * carrying the spread map (~4.5 KB) gets front-truncated into
  * unparseability. Single-shot timings on a shared box swing up to ~3×
  * with ambient load (round-2 recorded 93s for a query that reruns at
  * 5.5s), so single-rep numbers are never reported.
  *
  * A query whose reps ALL fail reports `null` (never a fast-fail elapsed
  * time — a correctness regression must not read as a performance win)
  * and its name lands in "errors"; partial failures keep the median of
  * the successful reps and still flag the name. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_CONF="k=v;k=v" lets a local A/B run overlay session
    // confs (e.g. AQE coalescing policy) without editing the bench;
    // the driver never sets it
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => builder.config(k.trim, v.trim)
        case _ =>
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JIT + codegen + parquet footer caches, not measured.
    // Tolerant of partial fixture dirs (e.g. a documents-only probe dir
    // passed via SPARK_GRAFT_SF_DIR for local iteration).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // NonFatal only: an OOM/LinkageError in warmup means every
    // measurement after it would run in a corrupted JVM — propagate.
    try SparkEntry.queries.get("q1_agg").foreach(f => run(f(spark, sfDir)))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] warmup skipped: ${e.getMessage}") }

    // SPARK_GRAFT_ONLY=a,b,c limits the run to named queries (iterating
    // on one operator locally); the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)

    // ---- 10× scale probe: empirical scaling evidence for the dedup
    // spine over a density-neutral 10× corpus (ScaleProbe). Runs FIRST,
    // on a cold quiet JVM: in round 9 the probe ran at the tail of the
    // 38-minute bench and BOTH x10 reps landed on the contended end —
    // every probe base read 2-3× its quiet value and one ratio recorded
    // 29.2 where quiet controls measure 2.8-3.3. Probe-first plus the
    // paired-ratio statistic below makes the record contention-proof.
    //
    // Each spine query runs at BASE then at 10× back to back, so both
    // timings of a pair see the same JVM/GC/machine state. The (base,
    // x10) pair repeats SPARK_GRAFT_PROBE_REPS times (default 3) and the
    // recorded ratio is the MIN over the NON-FIRST reps of the PER-PAIR
    // ratio x10_i/base_i — pairing cancels ambient load that hits both
    // measurements of a rep, which min(x10)/min(base) does not when the
    // load lands asymmetrically (exactly the r9 failure), and the first
    // pair is DISCARDED from the ratio because probe-first-on-a-cold-JVM
    // means rep 1's base pays the query's whole-pipeline JIT while its
    // x10 runs warm — a measured 1.1 for a true ~2.8 (the opposite-sign
    // artifact of the one this ordering fixed). base/x10 are still
    // reported as per-scale mins over all reps for absolute-time reads
    // (min naturally discards the JIT-inflated first base).
    val probe = scala.collection.mutable.LinkedHashMap.empty[String, String]
    if (sys.env.getOrElse("SPARK_GRAFT_SCALE_PROBE", "1") != "0"
        && new java.io.File(s"$sfDir/documents.parquet").exists()
        && only.isEmpty) {
      // v4: the lineitem replica gained the dq_audit columns — the
      // version bump invalidates v3 marker dirs that lack them
      val probeDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
        s"tmp/scale_probe_v4_${new java.io.File(sfDir).getName}")
      val probeReps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt.max(1)
      val t0 = System.nanoTime()
      ScaleProbe.ensureFixture(spark, sfDir, probeDir, factor = 10)
      probe += "gen" -> f"${(System.nanoTime() - t0) / 1e9}%.3f"
      for (name <- ScaleProbe.spineQueries) SparkEntry.queries.get(name).foreach { fn =>
        try {
          val pairs = (1 to probeReps).map { _ =>
            val t1 = System.nanoTime()
            run(fn(spark, sfDir))
            val base = (System.nanoTime() - t1) / 1e9
            val t2 = System.nanoTime()
            run(fn(spark, probeDir))
            val x10 = (System.nanoTime() - t2) / 1e9
            (base, x10)
          }
          val base = pairs.map(_._1).min
          val x10 = pairs.map(_._2).min
          val measured = if (pairs.size > 1) pairs.tail else pairs
          val ratio = measured.map { case (b, x) => x / b }.min
          probe += name -> f"""{"base":$base%.3f,"x10":$x10%.3f,"ratio":$ratio%.1f}"""
        } catch { case e: Throwable => System.err.println(s"[bench] scale10 $name: $e") }
      }
    }

    // ---- skew probe: SkewAgg.saltedJoin vs the plain shuffle join on
    // a HOT-KEY fixture (90% of the fact rows carry ONE join key —
    // lineitem replicated 16×, partkeys collapsed onto a hub). This is
    // the scenario the salted path exists for: the dim side too big or
    // too mid-plan to broadcast and AQE's skew split unavailable —
    // both pinned off for BOTH paths, so the comparison isolates the
    // salt. Paired reps (plain, salted) back to back like the scale
    // probe; reported speedup = MIN over non-first pairs of
    // plain_i/salted_i (the conservative paired statistic). The salted
    // path is the one tfidfTopTerms(dfSaltBuckets>0) routes its
    // stopword-skewed tf ⨝ df join through (gate: tfidf_terms_salted).
    var skewJson = ""
    if (sys.env.getOrElse("SPARK_GRAFT_SKEW_PROBE", "1") != "0"
        && new java.io.File(s"$sfDir/lineitem.parquet").exists()
        && only.isEmpty) {
      import org.apache.spark.sql.functions._
      try {
        val repN = 16
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(org.apache.spark.sql.functions.col("l_orderkey"),
            col("l_partkey"), col("l_quantity").cast("double").as("v"))
        val fact0 = li.crossJoin(spark.range(repN).select(col("id").as("r")))
          .select((col("l_orderkey") * repN + col("r")).as("fact_id"),
            when(pmod(col("l_partkey"), lit(10L)) < 9L, lit(-1L))
              .otherwise(col("l_partkey")).as("k"),
            col("v"))
        val fact = graft.ops.Scratch.materialize(fact0, "skew_fact")
        val dim = graft.ops.Scratch.materialize(
          fact.groupBy(col("k")).agg(round(avg(col("v")), 4).as("dim_v")),
          "skew_dim")
        def work(j: org.apache.spark.sql.DataFrame) =
          j.agg(round(sum(col("v") * col("dim_v")), 2).as("s"))
        val prevBroad = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        val prevSkew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        try {
          val pairs = (1 to 3).map { _ =>
            val t1 = System.nanoTime()
            run(work(fact.join(dim, Seq("k"))))
            val p = (System.nanoTime() - t1) / 1e9
            val t2 = System.nanoTime()
            run(work(graft.ops.SkewAgg.saltedJoin(
              fact, dim, "k", col("fact_id"), saltBuckets = 16)))
            val s = (System.nanoTime() - t2) / 1e9
            (p, s)
          }
          val measured = if (pairs.size > 1) pairs.tail else pairs
          val speedup = measured.map { case (p, s) => p / s }.min
          skewJson = f""","skew":{"plain":${pairs.map(_._1).min}%.3f,""" +
            f""""salted":${pairs.map(_._2).min}%.3f,""" +
            f""""speedup":$speedup%.2f}"""
        } finally {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroad)
          spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prevSkew)
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] skew probe: $e") }
    }

    // Reps are INTERLEAVED across the query list: pass 1 runs every
    // query once, then pass 2, then pass 3 — not reps-back-to-back per
    // query. The round-10 driver record inflated 7 queries 1.8-2.8×
    // (flat in the quiet record at identical code) because one ambient
    // contention window on the shared box covered ALL back-to-back reps
    // of a query, which the per-query min cannot cancel. Interleaving
    // spreads a query's reps ~minutes apart, so a contention window now
    // costs each query at most ONE rep and min-of-reps recovers the
    // quiet value.
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val timed = scala.collection.mutable.LinkedHashMap(
      named.map { case (n, _) =>
        n -> scala.collection.mutable.ArrayBuffer.empty[(Double, Boolean)]
      }: _*)
    for (_ <- 1 to reps; (name, fn) <- named) {
      val t0 = System.nanoTime()
      val ok =
        try { run(fn(spark, sfDir)); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
      timed(name) += (((System.nanoTime() - t0) / 1e9, ok))
    }
    val results = named.map { case (name, _) =>
      val reps0 = timed(name).toSeq
      (name, reps0.filter(_._2).map(_._1).sorted, reps0.count(!_._2))
    }
    def median(ts: Seq[Double]): Double = ts(ts.size / 2)
    val qs = results.map { case (k, ts, _) =>
      val v = if (ts.isEmpty) "null" else f"${median(ts)}%.3f"
      "\"" + k + "\":" + v
    }.mkString("{", ",", "}")
    val errored = results.collect { case (k, _, nFail) if nFail > 0 => k }
    val errs =
      if (errored.isEmpty) ""
      else errored.map("\"" + _ + "\"").mkString(""","errors":[""", ",", "]")
    val spread = results.map { case (k, ts, _) =>
      val v = if (ts.isEmpty) "[]" else f"[${ts.head}%.3f,${ts.last}%.3f]"
      "\"" + k + "\":" + v
    }.mkString("{", ",", "}")
    val total = results.flatMap { case (_, ts, _) => if (ts.isEmpty) None else Some(median(ts)) }.sum
    val probeJson =
      if (probe.isEmpty) ""
      else probe.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString(""","scale10":{""", ",", "}")

    // spread + per-query medians + machine detail go to stderr and a
    // side file; stdout carries the per-query line FIRST and the compact
    // totals line LAST. The harness that records stdout keeps only a
    // bounded TAIL: round-5's single line (87 queries + scale probe)
    // outgrew it and was front-truncated into unparseability, losing the
    // total. With the totals line last and < 1 KB, truncation can only
    // ever eat the (redundant) per-query line.
    val mins = results.map { case (k, ts, _) =>
      val v = if (ts.isEmpty) "null" else f"${ts.head}%.3f"
      "\"" + k + "\":" + v
    }.mkString("{", ",", "}")
    val totalMin = results.flatMap { case (_, ts, _) => ts.headOption }.sum
    val detail = f"""{"spread":$spread,"queries":$qs,"queries_min":$mins,"reps":$reps,"cpus":"$cpus","sf":"$sfDir"}"""
    System.err.println(s"[bench-detail] $detail")
    try {
      val w = new java.io.PrintWriter("bench_detail.json")
      try w.println(detail) finally w.close()
    } catch { case scala.util.control.NonFatal(_) => () }
    println(s"""{"metric":"queries","queries":$qs$errs$probeJson$skewJson}""")
    // worst query by per-query MIN: the contention-resistant statistic
    // (a load spike on one rep cannot nominate a phantom worst query)
    val worst = results.collect { case (k, ts, _) if ts.nonEmpty => (k, ts.head) }
      .sortBy(-_._2).headOption
    val worstJson = worst.map { case (k, v) =>
      f""","worst_query":"$k","worst_sec":$v%.3f""" }.getOrElse("")
    val totals = f"""{"metric":"total","value":$total%.3f,"unit":"sec","total_min":$totalMin%.3f,"n_queries":${results.size},"n_errors":${errored.size}$worstJson,"reps":$reps,"sf":"$sfDir"}"""
    // the totals object also lands in a side file so the per-round
    // record survives stdout tail truncation entirely
    try {
      val w = new java.io.PrintWriter("bench_total.json")
      try w.println(s"""{"totals":$totals,"queries":$qs,"queries_min":$mins$errs$probeJson$skewJson}""") finally w.close()
    } catch { case scala.util.control.NonFatal(_) => () }
    println(totals)
    spark.stop()
  }

  private def run(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()
}
