package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Each query is forced through the `noop` sink: full computation of
  * every output row/column, no result materialization on the driver and
  * no metadata-only count() shortcuts.
  *
  * TIMEOUT-PROOF BY CONSTRUCTION (round 11 lesson: the driver's bench
  * run was killed 46 min in while still inside a pre-main probe, and
  * because everything wrote at the very end the round recorded NOTHING):
  *
  *  - The MAIN interleaved query loop runs FIRST; the scale and skew
  *    probes run LAST. A kill at any point after the first measured
  *    query still leaves a record.
  *  - `bench_total.json` / `bench_detail.json` are flushed after EVERY
  *    measured query (atomic tmp+rename, ~30 KB — microseconds next to
  *    any query), so pass-1 data survives a kill at any later point.
  *  - SPARK_GRAFT_TIME_BUDGET_S degrades instead of dying: when
  *    elapsed time approaches the budget the remaining passes stop
  *    (whatever reps completed stand), and the probes are skipped
  *    unless enough headroom remains. The record carries `budget_hit`
  *    / `probes_skipped` flags so a degraded record is never mistaken
  *    for a complete one. The budget is ON BY DEFAULT (1350 s) — the
  *    round-12 lesson: every protection that is opt-in via an env var
  *    the driver never sets protects nothing, and the driver's
  *    un-parameterized run ran to its external `timeout` and recorded
  *    rc 124 / null. `0` stays as the explicit unbounded override for
  *    quiet builder records.
  *  - The totals JSON line is RE-EMITTED to stdout (with a
  *    `"partial":true` marker) after every completed pass and every
  *    25 measured queries, and the run log level is ERROR: the
  *    round-12 driver tail was 100% benign WindowExec WARN spam and
  *    the single end-of-run totals line never reached the bounded
  *    stdout tail the driver parses. The last line of ANY prefix of
  *    this program's stdout (past the first 25 queries) is now a
  *    parseable totals record; the final line is the complete one.
  *
  * Reps are TIERED to bound quiet wall-time as the surface grows
  * (325+ queries × 3 reps + probes outgrew the driver's window):
  * a query whose fastest successful rep so far is under
  * SPARK_GRAFT_LIGHT_S seconds (default 1.0 — the ~260-query
  * sub-second tier, whose min is stable across rounds) stops after
  * SPARK_GRAFT_REPS_LIGHT passes (default 2); heavier queries get the
  * full SPARK_GRAFT_REPS (default 3). Classification uses min-so-far,
  * so ambient contention can only promote a query INTO the full-reps
  * tier, never starve a genuinely heavy one.
  *
  * Reps are INTERLEAVED across the query list: pass 1 runs every
  * query once, then pass 2, then pass 3 — not reps-back-to-back per
  * query. The round-10 driver record inflated 7 queries 1.8-2.8×
  * (flat in the quiet record at identical code) because one ambient
  * contention window on the shared box covered ALL back-to-back reps
  * of a query, which the per-query min cannot cancel. Interleaving
  * spreads a query's reps ~minutes apart, so a contention window costs
  * each query at most ONE rep and min-of-reps recovers the quiet value.
  *
  * The per-query map reports the MEDIAN (lower-middle on even rep
  * counts — the conservative pick when the tiered default is 2 reps)
  * and the totals carry BOTH the median total and the MIN total — min
  * is the standard contention-resistant statistic, and `worst_query`
  * is selected by per-query MIN so a single load spike cannot
  * fabricate a phantom regression (rounds 4–6 each recorded one).
  * Single-shot timings on a shared box swing up to ~3× with ambient
  * load (round-2 recorded 93s for a query that reruns at 5.5s), so
  * single-rep numbers are never the statistic of record.
  *
  * A query whose reps ALL fail reports `null` (never a fast-fail
  * elapsed time — a correctness regression must not read as a
  * performance win) and its name lands in "errors"; partial failures
  * keep the median of the successful reps and still flag the name.
  *
  * stdout stays compact: the per-query line first, the < 1 KB totals
  * line LAST (the harness records a bounded stdout TAIL; round-5's
  * single fat line was front-truncated into unparseability). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val lightReps = sys.env.getOrElse("SPARK_GRAFT_REPS_LIGHT", "2")
      .toInt.max(1).min(reps)
    val lightThrS = sys.env.getOrElse("SPARK_GRAFT_LIGHT_S", "1.0").toDouble
    // default ON (see scaladoc); "0" is the explicit unbounded override
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_TIME_BUDGET_S", "1350").toDouble
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
    // ERROR, not WARN: the walker-reviewed un-partitioned histogram
    // windows each log a benign WindowExec WARN, and ~300 of those
    // drowned the round-12 driver's bounded stdout tail
    spark.sparkContext.setLogLevel("ERROR")

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

    val t00 = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - t00) / 1e9

    // ---- MAIN interleaved loop (FIRST — see scaladoc) ----
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val timed = scala.collection.mutable.LinkedHashMap(
      named.map { case (n, _) =>
        n -> scala.collection.mutable.ArrayBuffer.empty[(Double, Boolean)]
      }: _*)
    // the registered count lets the kill-resilience smoke
    // (tools/bench_smoke.sh) assert "pass 1 covered every query"
    // without duplicating the registry size in a script
    System.err.println(s"[bench] ${named.size} queries registered, " +
      s"reps=$reps (light tier: $lightReps reps under $lightThrS s), " +
      s"budget=${if (budgetS > 0) f"$budgetS%.0f s" else "none"}")

    // lower-middle median: conservative on the 2-rep light tier
    def median(ts: Seq[Double]): Double = ts((ts.size - 1) / 2)
    // (name, successful-rep seconds sorted asc, #failed reps) for every
    // query ATTEMPTED so far — partial flushes must not report
    // not-yet-run queries as errors/nulls
    def results: Seq[(String, Seq[Double], Int)] = named.flatMap {
      case (name, _) =>
        val reps0 = timed(name).toSeq
        if (reps0.isEmpty) None
        else Some((name, reps0.filter(_._2).map(_._1).sorted, reps0.count(!_._2)))
    }

    val probe = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var skewJson = ""
    var budgetHit = false
    var probesSkipped = false

    def jsonParts: (String, String, String, String, String) = {
      val rs = results
      val qs = rs.map { case (k, ts, _) =>
        val v = if (ts.isEmpty) "null" else f"${median(ts)}%.3f"
        "\"" + k + "\":" + v
      }.mkString("{", ",", "}")
      val mins = rs.map { case (k, ts, _) =>
        val v = if (ts.isEmpty) "null" else f"${ts.head}%.3f"
        "\"" + k + "\":" + v
      }.mkString("{", ",", "}")
      val errored = rs.collect { case (k, _, nFail) if nFail > 0 => k }
      val errs =
        if (errored.isEmpty) ""
        else errored.map("\"" + _ + "\"").mkString(""","errors":[""", ",", "]")
      val probeJson =
        if (probe.isEmpty) ""
        else probe.map { case (k, v) => "\"" + k + "\":" + v }
          .mkString(""","scale10":{""", ",", "}")
      val flags = (if (budgetHit) ""","budget_hit":true""" else "") +
        (if (probesSkipped) ""","probes_skipped":true""" else "")
      (qs, mins, errs, probeJson, flags)
    }

    def totalsLine(partial: Boolean = false): String = {
      val rs = results
      val (_, _, _, _, flags) = jsonParts
      val total = rs.flatMap { case (_, ts, _) =>
        if (ts.isEmpty) None else Some(median(ts)) }.sum
      val totalMin = rs.flatMap { case (_, ts, _) => ts.headOption }.sum
      val nErr = rs.count(_._3 > 0)
      // tier split in the record: the light tier's 2-rep "median" is
      // the per-query MIN, so round-over-round comparisons must use
      // total_min (stable semantics) — n_light makes the rep regime
      // visible instead of reading as a phantom speedup
      val nLight = rs.count { case (_, ts, _) =>
        ts.nonEmpty && ts.head < lightThrS }
      val worst = rs.collect { case (k, ts, _) if ts.nonEmpty => (k, ts.head) }
        .sortBy(-_._2).headOption
      val worstJson = worst.map { case (k, v) =>
        f""","worst_query":"$k","worst_sec":$v%.3f""" }.getOrElse("")
      val partialJson = if (partial) ""","partial":true""" else ""
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","total_min":$totalMin%.3f,"n_queries":${rs.size},"n_errors":$nErr$worstJson,"reps":$reps,"reps_light":$lightReps,"n_light":$nLight$flags$partialJson,"sf":"$sfDir"}"""
    }

    // atomic side-file flush: tmp + rename, so a kill mid-write can
    // never leave a torn half-record (the whole point of flushing)
    def writeAtomic(path: String, content: String): Unit =
      try {
        val tmp = java.nio.file.Paths.get(path + ".tmp")
        java.nio.file.Files.write(tmp,
          (content + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch { case scala.util.control.NonFatal(_) => () }

    def flush(): Unit = {
      val (qs, mins, errs, probeJson, _) = jsonParts
      writeAtomic("bench_detail.json", {
        val spread = results.map { case (k, ts, _) =>
          val v = if (ts.isEmpty) "[]" else f"[${ts.head}%.3f,${ts.last}%.3f]"
          "\"" + k + "\":" + v
        }.mkString("{", ",", "}")
        f"""{"spread":$spread,"queries":$qs,"queries_min":$mins,"reps":$reps,"cpus":"$cpus","sf":"$sfDir"}"""
      })
      writeAtomic("bench_total.json",
        s"""{"totals":${totalsLine()},"queries":$qs,"queries_min":$mins$errs$probeJson$skewJson}""")
    }

    // reserve a shutdown margin: stop measuring 30 s before the budget
    // so the final flush and spark.stop() happen INSIDE it
    def overBudget(marginS: Double = 30.0): Boolean =
      budgetS > 0 && elapsedS > budgetS - marginS

    var pass = 1
    var nMeasured = 0
    while (pass <= reps && !budgetHit) {
      for ((name, fn) <- named if !budgetHit) {
        val soFar = timed(name)
        val minOk = {
          val ok = soFar.filter(_._2).map(_._1)
          if (ok.isEmpty) Double.MaxValue else ok.min
        }
        val isLight = pass > lightReps && minOk < lightThrS
        if (overBudget()) {
          budgetHit = true
          System.err.println(f"[bench] time budget $budgetS%.0f s hit at " +
            f"$elapsedS%.0f s in pass $pass — stopping with recorded reps")
        } else if (!isLight) {
          val t0 = System.nanoTime()
          val ok =
            try { run(fn(spark, sfDir)); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name: $e"); false }
          soFar += (((System.nanoTime() - t0) / 1e9, ok))
          flush()
          nMeasured += 1
          // stdout-tail insurance: a partial-marked totals line every
          // 25 measured queries keeps the driver's bounded tail
          // parseable even if the run is killed mid-pass-1
          if (nMeasured % 25 == 0) println(totalsLine(partial = true))
        }
      }
      // a completed pass re-emits the current totals (see scaladoc)
      println(totalsLine(partial = pass < reps))
      pass += 1
    }

    // ---- 10× scale probe (AFTER the main loop — a killed run must
    // keep its per-query data; the probes are the expendable tail).
    // Empirical scaling evidence for the dedup/graph spine over a
    // density-neutral 10× corpus (ScaleProbe). Contention-proofing
    // lives in the STATISTIC, not the position: each spine query runs
    // at BASE then at 10× back to back, so both timings of a pair see
    // the same JVM/GC/machine state; the pair repeats
    // SPARK_GRAFT_PROBE_REPS times (default 3) and the recorded ratio
    // is the MIN over the NON-FIRST reps of the PER-PAIR ratio
    // x10_i/base_i — pairing cancels ambient load that hits both
    // measurements of a rep, which min(x10)/min(base) does not when
    // the load lands asymmetrically (the r9 failure). The first pair
    // stays discarded from the ratio out of caution (post-main-loop
    // everything is warm, but a probe-only invocation via
    // SPARK_GRAFT_ONLY semantics would not be).
    val wantScale = sys.env.getOrElse("SPARK_GRAFT_SCALE_PROBE", "1") != "0" &&
      new java.io.File(s"$sfDir/documents.parquet").exists() && only.isEmpty
    // probes are skipped when the remaining headroom cannot fit them
    // (scale ≈ fixture gen + 2·reps·spine, skew ≈ fixture + 6 joins —
    // ~300 s and ~120 s at sf0.1 on this box, doubled for safety)
    val scaleHeadroomS = 600.0
    val skewHeadroomS = 240.0
    if (wantScale && !(budgetS > 0 && budgetS - elapsedS < scaleHeadroomS)) {
      // v4: the lineitem replica gained the dq_audit columns — the
      // version bump invalidates v3 marker dirs that lack them
      val probeDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
        s"tmp/scale_probe_v4_${new java.io.File(sfDir).getName}")
      val probeReps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt.max(1)
      val t0 = System.nanoTime()
      ScaleProbe.ensureFixture(spark, sfDir, probeDir, factor = 10)
      probe += "gen" -> f"${(System.nanoTime() - t0) / 1e9}%.3f"
      for (name <- ScaleProbe.spineQueries
           if !overBudget(60.0)) SparkEntry.queries.get(name).foreach { fn =>
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
          flush()
        } catch { case e: Throwable => System.err.println(s"[bench] scale10 $name: $e") }
      }
    } else if (wantScale) {
      probesSkipped = true
      System.err.println(f"[bench] scale probe skipped: " +
        f"${budgetS - elapsedS}%.0f s headroom < $scaleHeadroomS%.0f s")
    }

    // ---- skew probe (LAST): SkewAgg.saltedJoin vs the plain shuffle
    // join on a HOT-KEY fixture (90% of the fact rows carry ONE join
    // key — lineitem replicated 16×, partkeys collapsed onto a hub).
    // This is the scenario the salted path exists for: the dim side
    // too big or too mid-plan to broadcast and AQE's skew split
    // unavailable — both pinned off for BOTH paths, so the comparison
    // isolates the salt. Paired reps (plain, salted) back to back like
    // the scale probe; reported speedup = MIN over non-first pairs of
    // plain_i/salted_i (the conservative paired statistic). The salted
    // path is the one tfidfTopTerms(dfSaltBuckets>0) routes its
    // stopword-skewed tf ⨝ df join through (gate: tfidf_terms_salted).
    val wantSkew = sys.env.getOrElse("SPARK_GRAFT_SKEW_PROBE", "1") != "0" &&
      new java.io.File(s"$sfDir/lineitem.parquet").exists() && only.isEmpty
    if (wantSkew && !(budgetS > 0 && budgetS - elapsedS < skewHeadroomS)) {
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
          flush()
        } finally {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroad)
          spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prevSkew)
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] skew probe: $e") }
    } else if (wantSkew) {
      probesSkipped = true
      System.err.println(f"[bench] skew probe skipped: " +
        f"${budgetS - elapsedS}%.0f s headroom < $skewHeadroomS%.0f s")
    }

    // final flush picks up the probes_skipped/budget_hit flags
    flush()
    val (qs, _, errs, probeJson, _) = jsonParts
    // The fat per-query line is printed BEFORE the compact totals line,
    // and the old ~15 KB "[bench-detail]" stderr emission is GONE (its
    // content is already flushed to bench_detail.json after every
    // query): the driver records a bounded TAIL of MERGED stdout+stderr,
    // and for 13 straight rounds a fat line emitted after — or, being
    // stderr, interleaved past — the compact totals line pushed the only
    // parseable record out of that window. The LAST bytes this program
    // writes to either stream must be the ~400 B totals line.
    println(s"""{"metric":"queries","queries":$qs$errs$probeJson$skewJson}""")
    System.out.flush()
    // stop() BEFORE the totals line: any synchronous shutdown logging it
    // produces must not land after the record the driver parses
    spark.stop()
    System.err.flush()
    println(totalsLine())
    System.out.flush()
  }

  private def run(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()
}
