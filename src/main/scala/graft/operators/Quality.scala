package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Data-quality and curation-adjacent warehouse operators: the audit /
 * history / outlier / linkage surface a 100 TB ingest pipeline runs
 * around the core curation chain. (The reference pipeline itself has no
 * value-level predicates — `/root/reference/pipeline.py:57-95` routes
 * and projects only — so this whole family is extension surface, in the
 * spirit of Deequ-style data validation and classic warehouse CDC.)
 *
 * Scale notes are per-operator; the common theme is ONE pass / ONE
 * keyed shuffle each, with every per-group expansion either bounded by
 * construction (audit: one row per column) or guarded at runtime
 * (linkage blocks via [[Blocks.guardBlockSize]]).
 */
object Quality {

  /** Column-profile audit (the Deequ/"analyzer" shape): for each listed
    * column — null count, exact distinct count, and for numeric columns
    * min / max / a DECIMAL-exact sum — emitted as one LONG-format row
    * per column: `(column, n_rows, n_null, n_distinct, min_d, max_d,
    * sum_d)`.
    *
    * One pass over the table: a single global aggregate computes every
    * metric (Spark plans the multi-column distinct via one Expand — the
    * row multiplier is the column count, a constant — with map-side
    * partial aggregation), and the long format is a driver-free explode
    * of the single result row. Sums ride decimal(28,6) so the audit is
    * bit-stable under any partitioning (no fp reduction-order noise);
    * min/max/counts are exact by nature.
    *
    * At 100 TB: this is the shape you want — no per-column jobs, no
    * driver loop; one shuffle of partial aggregates. For columns where
    * exact distinct is too hot, `approx_count_distinct` is the drop-in
    * (error-contract pattern as in `sketch_merge`); exact is kept here
    * because the audit IS the oracle gate.
    */
  def dqAudit(
      df: DataFrame,
      numericCols: Seq[String],
      otherCols: Seq[String] = Nil): DataFrame = {
    require(numericCols.nonEmpty || otherCols.nonEmpty, "no columns to audit")
    val cols = numericCols ++ otherCols
    // a column listed twice (or in both lists) would mint duplicate
    // __nn/__nd aliases and surface as an ambiguous-column
    // AnalysisException at run time - fail fast with the names instead
    require(cols.distinct.size == cols.size,
      s"columns listed twice: ${cols.diff(cols.distinct).distinct.mkString(", ")}")
    val aggs: Seq[Column] =
      count(lit(1)).as("n_rows") +: cols.flatMap { c =>
        val base = Seq(
          count(col(c)).as(s"${c}__nn"),
          count_distinct(col(c)).as(s"${c}__nd"))
        val numeric =
          if (numericCols.contains(c))
            Seq(
              min(col(c)).cast("double").as(s"${c}__min"),
              max(col(c)).cast("double").as(s"${c}__max"),
              sum(col(c).cast("decimal(28,6)")).cast("double").as(s"${c}__sum"))
          else
            Seq(
              lit(null).cast("double").as(s"${c}__min"),
              lit(null).cast("double").as(s"${c}__max"),
              lit(null).cast("double").as(s"${c}__sum"))
        base ++ numeric
      }
    // fanOut the audited-column projection: the multi-distinct Expand
    // multiplies every row by the distinct-agg count, and a byte-small
    // (single-digit-split) scan runs that whole pipeline on 1-3 tasks
    // (no-op on well-split inputs — the Par.fanOut contract)
    val one = graft.ops.Par.fanOut(df.select(cols.map(col): _*))
      .agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("n_rows"),
        (col("n_rows") - col(s"${c}__nn")).as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_d"),
        col(s"${c}__max").as("max_d"),
        col(s"${c}__sum").as("sum_d"))
    }
    one.select(explode(array(rows: _*)).as("m")).select("m.*")
  }

  /** Slowly-changing-dimension (type 2) history build from a change
    * stream: collapse each entity's consecutive runs of the same state
    * into `[valid_from, valid_to)` versions, latest version open
    * (`valid_to` null, `is_current` true).
    *
    * The classic CDC → dimension-history materialization. ONE shuffle:
    * both windows (run detection ordered by `(ts, tie)`, interval close
    * ordered by version) partition by the entity key, so Catalyst plans
    * a single Exchange with two sorts over it. Run detection is
    * lag-compare + running sum — no self-join, no per-entity collect.
    * Per-entity state is bounded by that entity's change count.
    *
    * `tieCol` makes ordering total when timestamps collide (the
    * deterministic-output requirement); pass the event id.
    */
  def scd2(
      changes: DataFrame,
      entityCol: String = "user_id",
      stateCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(stateCol), 1).over(w)
    val starts = changes
      .select(col(entityCol), col(stateCol), col(tsCol), col(tieCol))
      .withColumn("chg",
        when(prev.isNull || prev =!= col(stateCol), 1L).otherwise(0L))
      .withColumn("version", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("chg") === 1L)
      .select(col(entityCol), col(stateCol).as("state"),
        col(tsCol).as("valid_from"), col("version"))
    val wv = Window.partitionBy(col(entityCol)).orderBy(col("version"))
    starts
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Tukey-fence (IQR) outlier audit per group: exact q1/q3 of
    * `valueCol`, fences at `q1 - k*iqr` / `q3 + k*iqr`, and the row /
    * outlier counts inside each group.
    *
    * Two aggregates over one scan lineage: the 1-row-per-group fence
    * table (exact `percentile` — fine for low-cardinality audit groups;
    * at high group cardinality or 100 TB swap `percentile_approx`, the
    * error-contract pattern) broadcast back onto the table for a single
    * counting pass. Fence arithmetic is plain IEEE doubles evaluated in
    * the same expression order on both engines, so the counts are
    * deterministic; fences are rounded for display only.
    */
  def iqrOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Double = 1.5): DataFrame = {
    val fences = df.groupBy(col(groupCol)).agg(
      percentile(col(valueCol), lit(0.25)).as("q1"),
      percentile(col(valueCol), lit(0.75)).as("q3"))
      .withColumn("lo", col("q1") - lit(k) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(k) * (col("q3") - col("q1")))
    df.join(broadcast(fences), groupCol)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(valueCol) < col("lo") || col(valueCol) > col("hi"), 1L)
          .otherwise(0L)).as("n_outliers"),
        round(first(col("lo")), 4).as("lo"),
        round(first(col("hi")), 4).as("hi"))
  }

  /** A declarative data-quality constraint (the Deequ `Check` shape):
    * each evaluates to one verdict row `(constraint, n_violations, ok)`.
    * Row-local constraints (notNull / inRange / acceptedValues) all fold
    * into ONE aggregate pass together with uniqueness (count vs distinct
    * count over the key); referential integrity is the only one needing
    * a second input — a left-anti join against the dimension's key
    * (bucket both sides by the key at 100 TB and it co-locates). */
  sealed trait Check { def name: String }
  final case class NotNull(column: String) extends Check {
    val name = s"not_null($column)"
  }
  final case class InRange(column: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range($column,$lo,$hi)"
  }
  final case class AcceptedValues(column: String, values: Seq[String]) extends Check {
    val name = s"accepted_values($column)"
  }
  final case class UniqueKey(columns: Seq[String]) extends Check {
    val name = s"unique(${columns.mkString(",")})"
  }
  final case class RefIntegrity(column: String, dim: DataFrame, dimKey: String)
      extends Check {
    val name = s"ref_integrity($column)"
  }

  /** Evaluate a constraint suite: one long-format verdict row per
    * check. All row-local checks and every uniqueness check share a
    * single aggregate over one scan (map-side partial sums /
    * two-phase distinct); each referential check adds one anti-join
    * count. The verdict frame is a driver-free explode of the
    * single aggregate row, unioned with the (tiny) per-reference
    * counts. */
  def checkConstraints(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no constraints to check")
    val local = checks.filter(!_.isInstanceOf[RefIntegrity])
    val refs = checks.collect { case r: RefIntegrity => r }

    val localOut: Option[DataFrame] =
      if (local.isEmpty) None
      else {
        val aggs: Seq[Column] = count(lit(1)).as("n_rows") +:
          local.zipWithIndex.flatMap {
            case (NotNull(c), i) =>
              Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"v$i"))
            case (InRange(c, lo, hi), i) =>
              Seq(sum(when(col(c).isNull || col(c) < lo || col(c) > hi, 1L)
                .otherwise(0L)).as(s"v$i"))
            case (AcceptedValues(c, vs), i) =>
              Seq(sum(when(col(c).isNull ||
                !col(c).isin(vs.map(v => v: Any): _*), 1L)
                .otherwise(0L)).as(s"v$i"))
            case (UniqueKey(cols), i) =>
              // extra rows beyond one per key = count - distinct keys
              Seq(count_distinct(struct(cols.map(col): _*)).as(s"d$i"))
            case (r: RefIntegrity, _) =>
              throw new IllegalStateException(s"unexpected ${r.name}")
          }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val rows = local.zipWithIndex.map {
          case (u: UniqueKey, i) =>
            struct(lit(u.name).as("constraint"),
              (col("n_rows") - col(s"d$i")).as("n_violations"))
          case (c, i) =>
            struct(lit(c.name).as("constraint"), col(s"v$i").as("n_violations"))
        }
        Some(one.select(explode(array(rows: _*)).as("m")).select("m.*"))
      }

    val refOuts: Seq[DataFrame] = refs.map { r =>
      df.select(col(r.column))
        .filter(col(r.column).isNotNull)
        .join(r.dim.select(col(r.dimKey).as(r.column)), Seq(r.column), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(r.name).as("constraint"), col("n_violations"))
    }

    (localOut.toSeq ++ refOuts)
      .reduce(_.unionByName(_))
      .withColumn("ok", col("n_violations") === 0L)
  }

  /** Point-in-time (temporal) join: each fact row joins the dimension
    * VERSION that was current at its timestamp — the lookup every
    * warehouse runs against [[scd2]] history (`fact.ts ∈
    * [valid_from, valid_to)`, open current interval matches everything
    * from its start). An equi-join on the entity key carries the
    * containment as a residual predicate: per-entity version lists are
    * small (bounded by that entity's change count) and versions never
    * overlap, so each fact matches at most one version — one keyed
    * shuffle, no range-join blowup. Facts with no covering version
    * (before the entity's first change, or unknown entity) are kept
    * with a null version — the audit-friendly left join. */
  def pointInTimeJoin(
      facts: DataFrame,
      history: DataFrame,
      entityCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    // facts and history often share lineage (history built from the
    // same event table) — rename the history key instead of relying on
    // dataframe-tagged column resolution, which a self-join defeats
    val h = history.select(
      col(entityCol).as("__pit_key"), col("state"), col("version"),
      col("valid_from"), col("valid_to"))
    facts.join(h,
      col(entityCol) === col("__pit_key") &&
        col(tsCol) >= col("valid_from") &&
        (col("valid_to").isNull || col(tsCol) < col("valid_to")),
      "left")
      .drop("__pit_key")
  }

  /** Welch's unequal-variance t-test per group between two variants —
    * the A/B experiment readout (metric lift + its t statistic +
    * Welch–Satterthwaite degrees of freedom) computed from ONE
    * aggregate pass: per-arm counts and decimal-exact moment sums of
    * the 6-dp-rounded metric (conditional aggregation — no pivot, no
    * second scan), then fixed-order double arithmetic on the exact
    * sums, so the statistics are reproducible across engines and
    * partitionings. Groups with an empty or constant arm yield null
    * t (0/0 guards), never a crash. */
  def welchTTest(
      df: DataFrame,
      groupCol: String,
      variantCol: String,
      valueCol: String): DataFrame = {
    val vr = round(col(valueCol).cast("double"), 6)
    val isB = col(variantCol) === 1
    def armSum(cond: Column, e: Column, dt: String) =
      sum(when(cond, e).cast(dt)).cast("double")
    val agg = df
      .select(col(groupCol), isB.as("b"), vr.as("vr"))
      .groupBy(col(groupCol))
      .agg(
        sum(when(col("b"), 0L).otherwise(1L)).as("n0"),
        sum(when(col("b"), 1L).otherwise(0L)).as("n1"),
        armSum(!col("b"), col("vr"), "decimal(28,6)").as("s0"),
        armSum(!col("b"), col("vr") * col("vr"), "decimal(38,12)").as("q0"),
        armSum(col("b"), col("vr"), "decimal(28,6)").as("s1"),
        armSum(col("b"), col("vr") * col("vr"), "decimal(38,12)").as("q1"))
    val m0 = col("s0") / col("n0")
    val m1 = col("s1") / col("n1")
    val v0 = (col("q0") - col("s0") * col("s0") / col("n0")) / (col("n0") - 1)
    val v1 = (col("q1") - col("s1") * col("s1") / col("n1")) / (col("n1") - 1)
    val se2 = v0 / col("n0") + v1 / col("n1")
    val t = (m1 - m0) / sqrt(se2)
    val dfw = (se2 * se2) /
      ((v0 / col("n0")) * (v0 / col("n0")) / (col("n0") - 1) +
        (v1 / col("n1")) * (v1 / col("n1")) / (col("n1") - 1))
    agg.select(
      col(groupCol), col("n0"), col("n1"),
      round(m1 - m0, 6).as("lift"),
      when(col("n0") > 1 && col("n1") > 1 && se2 > 0, round(t, 4))
        .as("t_stat"),
      when(col("n0") > 1 && col("n1") > 1 && se2 > 0, round(dfw, 2))
        .as("df_welch"))
  }

  /** k-ANONYMITY audit over quasi-identifier columns — the privacy
    * governance readout a corpus runs before shipping: every row's
    * equivalence class is the set of rows sharing its QI tuple, and
    * classes smaller than k are re-identification risks (Sweeney
    * 2002). One groupBy pass to class sizes, then a HISTOGRAM of
    * class sizes (rows = distinct sizes — tiny by construction), which
    * each threshold reads with all-long arithmetic: the corpus is
    * scanned once no matter how many thresholds are audited. */
  def kAnonymity(
      df: DataFrame,
      qiCols: Seq[String],
      thresholds: Seq[Int] = Seq(2, 5, 10)): DataFrame = {
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
    val hist = classes.groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"))
    hist.select(explode(array(thresholds.map(lit(_)): _*)).as("k"),
        col("class_size"), col("n_classes"))
      .groupBy(col("k"))
      .agg(
        sum(col("n_classes")).as("n_classes"),
        sum(col("class_size") * col("n_classes")).as("n_rows"),
        min(col("class_size")).as("min_class_size"),
        sum(when(col("class_size") < col("k"), col("n_classes"))
          .otherwise(0L)).as("at_risk_classes"),
        sum(when(col("class_size") < col("k"),
          col("class_size") * col("n_classes"))
          .otherwise(0L)).as("at_risk_rows"))
  }

  /** Deterministic RANDOMIZATION TEST (Bernoulli random relabeling)
    * for a difference in group means — the nonparametric significance
    * readout when [[welchTTest]]'s normality assumption is suspect.
    * Each of the `nPerms` draws relabels every row with an independent
    * Bernoulli(½) md5 coin, so group SIZES are not preserved across
    * draws — this is the random-relabeling variant of the permutation
    * test (asymptotically equivalent; an exact size-preserving
    * permutation would need a distributed sort per draw). A degenerate
    * draw that lands every row in one arm has no defined statistic and
    * is EXCLUDED from both `n_perms` and `n_ge` (it is not evidence in
    * either direction; at corpus row counts such a draw has
    * probability 2^−rows and never occurs). p-value is add-one
    * Monte-Carlo (1 + #{|T_p| ≥ |T_obs|}) / (n_perms + 1)
    * (Phipson & Smyth 2010 — never exactly zero, as a sampled p must
    * not be). The coin is a per-(draw, row-key) md5 bit: retry-safe,
    * partition-independent, replayable in SQL. Statistics are mean
    * differences of 6-dp-rounded values off exact decimal sums,
    * rounded to 6 dp BEFORE the ≥ compare, so the verdict is
    * cross-engine exact. Scale shape: ONE md5 per row (its 60 bits
    * supply every permutation's coin — bit p is permutation p's
    * assignment, so the hash never rides the explode), then the
    * rows × nPerms explode is map-side bit-tests with partial
    * aggregation onto 2·nPerms keys — no corpus-scale shuffle, and
    * the observed pass is one aggregate. */
  def permutationTest(
      df: DataFrame,
      keyCol: String,
      variantCol: String,
      valueCol: String,
      nPerms: Int = 32): DataFrame = {
    require(nPerms >= 1 && nPerms <= 60,
      "nPerms must be in [1, 60]: one 60-bit md5 supplies all coins")
    val vr = round(col(valueCol).cast("double"), 6)
    // fanOut: the nPerms-way explode + per-row md5 below is the hot
    // map stage and must not run at a 1-split scan's parallelism
    val base = graft.ops.Par.fanOut(
      df.select(col(keyCol).cast("string").as("rk"),
        (col(variantCol) === 1).as("b0"), vr.as("vr")))
    def armAgg(b: Column) = Seq(
      sum(when(!b, 1L).otherwise(0L)).as("n0"),
      sum(when(b, 1L).otherwise(0L)).as("n1"),
      sum(when(!b, col("vr")).cast("decimal(28,6)")).cast("double").as("s0"),
      sum(when(b, col("vr")).cast("decimal(28,6)")).cast("double").as("s1"))
    val diff = round(col("s1") / col("n1") - col("s0") / col("n0"), 6)
    val obs = base.agg(armAgg(col("b0")).head, armAgg(col("b0")).tail: _*)
      .select(diff.as("t_obs"))
    val perms = base
      .withColumn("h", conv(substring(md5(
        concat(lit("perm:"), col("rk"))), 1, 15), 16, 10).cast("long"))
      .select(col("vr"), col("h"),
        explode(sequence(lit(0), lit(nPerms - 1))).as("p"))
      .withColumn("b", expr("(shiftright(h, p) & 1) = 1"))
      .groupBy(col("p"))
      .agg(armAgg(col("b")).head, armAgg(col("b")).tail: _*)
      .select(col("p"), diff.as("t_p"))
      // an all-one-arm draw yields a null statistic: excluded from the
      // denominator too, or it would silently deflate the p-value
      .filter(col("t_p").isNotNull)
    perms.crossJoin(broadcast(obs))
      .groupBy(col("t_obs"))
      .agg(
        count(lit(1)).cast("long").as("n_perms"),
        sum(when(abs(col("t_p")) >= abs(col("t_obs")), 1L).otherwise(0L))
          .as("n_ge"))
      .select(col("t_obs"), col("n_perms"), col("n_ge"),
        round((col("n_ge") + 1).cast("double") / (col("n_perms") + 1), 6)
          .as("p_value"))
  }

  /** One-way ANOVA F — the k-group generalization of [[welchTTest]]
    * (equal-variance form): the between/within sum-of-squares
    * decomposition from ONE aggregate pass over the corpus. Per-group
    * exact decimal moment sums of the 6-dp-rounded metric; every
    * cross-group reduction (Σ sg²/ng, the grand sums) is a DECIMAL sum
    * of 6-dp-ROUNDED per-group terms, so no double sum is ever
    * order-dependent — the [[welchTTest]] discipline extended to the
    * k-ary reduce. The final F is fixed-order double arithmetic on the
    * exact aggregates of a ONE-ROW frame. Degenerate inputs (k < 2,
    * N ≤ k, or zero within-variance) yield null F, never a crash. */
  def oneWayAnova(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val vr = round(col(valueCol).cast("double"), 6)
    val per = df
      .select(col(groupCol).as("g"), vr.as("vr"))
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("ng"),
        sum(col("vr").cast("decimal(28,6)")).as("sg"),
        sum((col("vr") * col("vr")).cast("decimal(38,12)")).as("qg"))
    // per-group term rounded THEN decimal-summed: order-free across
    // groups (the frame is |groups| rows — tiny by construction)
    val terms = per.select(
      col("ng"), col("qg"), col("sg"),
      round(col("sg").cast("double") * col("sg").cast("double") /
        col("ng"), 6).cast("decimal(28,6)").as("tg"))
    val agg = terms.agg(
      count(lit(1)).as("k"),
      sum(col("ng")).as("n"),
      sum(col("sg")).cast("double").as("s"),
      sum(col("qg")).cast("double").as("q"),
      sum(col("tg")).cast("double").as("t"))
    val ssb = col("t") - col("s") * col("s") / col("n")
    val ssw = col("q") - col("t")
    val f = (ssb / (col("k") - 1)) / (ssw / (col("n") - col("k")))
    agg.select(
      col("k").cast("long").as("n_groups"),
      col("n").cast("long").as("n"),
      round(ssb, 4).as("ss_between"),
      round(ssw, 4).as("ss_within"),
      (col("k") - 1).cast("long").as("df1"),
      (col("n") - col("k")).cast("long").as("df2"),
      when(col("k") > 1 && col("n") > col("k") && ssw > 0, round(f, 4))
        .as("f_stat"))
  }

  /** Differentially-private group-count release (the ε-DP Laplace
    * mechanism, Dwork et al. 2006): exact per-group counts plus
    * Laplace(Δ/ε) noise with sensitivity Δ = 1, drawn DETERMINISTICALLY
    * from a per-group md5 uniform through the inverse CDF
    * noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|). The uniform is quantized
    * to a 10⁻¹² grid ((h mod 10¹²)+½)/10¹², so both engines evaluate
    * ln on the identical argument; the NOISE is then quantized to a
    * 3-dp grid BEFORE the 4-dp release round — a 3-dp addend makes the
    * 4-dp round an exact identity, so the release has exactly ONE
    * rounding whose boundary a cross-engine ln disagreement could
    * straddle (neither JVM Math.log nor DuckDB ln is guaranteed
    * correctly rounded; a 1-ulp flip now has to land within ~1e-12 of
    * a 5·10⁻⁴ half-grid point — residual flip risk ~4e-9 per group,
    * accepted and documented rather than pretending it is zero).
    * The deterministic draw is what makes the release reproducible and
    * oracle-gateable; a production deployment swaps in a real RNG and
    * the plan shape — one keyed aggregate, map-side noise on the tiny
    * group frame — stays exactly as tested. Completes the privacy
    * family: [[kAnonymity]] / [[lDiversity]] audit, this releases. */
  def dpCounts(
      df: DataFrame,
      groupCols: Seq[String],
      epsCenti: Int = 100): DataFrame = {
    require(epsCenti >= 1, "epsCenti must be >= 1 (epsilon = epsCenti/100)")
    val b = 100.0 / epsCenti
    val g = df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("n"))
    val key = concat(lit("dp:") +:
      groupCols.flatMap(c => Seq(col(c).cast("string"), lit("|"))): _*)
    val h = conv(substring(md5(key), 1, 15), 16, 10).cast("long")
    val u = (pmod(h, lit(1000000000000L)).cast("double") + lit(0.5d)) /
      lit(1.0e12d)
    val v = u - lit(0.5d)
    val noise = round(-lit(b) * signum(v) *
      log(lit(1.0d) - lit(2.0d) * abs(v)), 3)
    g.select(groupCols.map(col) :+ col("n") :+
      round(col("n") + noise, 4).as("n_dp"): _*)
  }

  /** Levene's test (mean-centered form) for equality of group
    * variances — the homoscedasticity check one runs BEFORE trusting
    * [[oneWayAnova]]'s pooled-variance F: per-group 6-dp-rounded means
    * off exact decimal sums (one tiny aggregate, broadcast back), then
    * the one-way ANOVA F over the absolute deviations z = |x − mean_g|.
    * Everything downstream IS [[oneWayAnova]] — same decimal
    * disciplines, same degenerate-input nulls. */
  def leveneTest(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val vr = round(col(valueCol).cast("double"), 6)
    val base = df.select(col(groupCol).as("g"), vr.as("v0"))
    val means = base.groupBy(col("g"))
      .agg(round(sum(col("v0").cast("decimal(28,6)")).cast("double") /
        count(lit(1)), 6).as("gmean"))
    val z = base.join(broadcast(means), "g")
      .select(col("g"), round(abs(col("v0") - col("gmean")), 6).as("z"))
    oneWayAnova(z, "g", "z")
  }

  /** l-DIVERSITY audit — [[kAnonymity]]'s companion (Machanavajjhala
    * et al. 2007): a class can be k-anonymous yet expose everyone in
    * it if the SENSITIVE attribute is constant within the class. Per
    * QI class, the number of distinct sensitive values (the two-level
    * aggregate form, so no count-distinct Expand ever rides the
    * corpus); then the same histogram treatment as [[kAnonymity]] —
    * per l threshold, the classes and rows whose diversity is below
    * it, all-long arithmetic off one corpus pass. */
  def lDiversity(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      thresholds: Seq[Int] = Seq(2, 3)): DataFrame = {
    val lvl1 = df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("nrows"))
    val classes = lvl1.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("diversity"), sum(col("nrows")).as("class_size"))
    val hist = classes.groupBy(col("diversity"))
      .agg(count(lit(1)).as("n_classes"), sum(col("class_size")).as("n_rows"))
    hist.select(explode(array(thresholds.map(lit(_)): _*)).as("l"),
        col("diversity"), col("n_classes"), col("n_rows"))
      .groupBy(col("l"))
      .agg(
        sum(col("n_classes")).as("n_classes"),
        sum(col("n_rows")).as("n_rows"),
        min(col("diversity")).as("min_diversity"),
        sum(when(col("diversity") < col("l"), col("n_classes"))
          .otherwise(0L)).as("at_risk_classes"),
        sum(when(col("diversity") < col("l"), col("n_rows"))
          .otherwise(0L)).as("at_risk_rows"))
  }

  /** Winsorized (clipped) robust statistics per group: exact
    * pLo/pHi fences, values clipped into `[lo, hi]`, clip counts and
    * the decimal-exact clipped sum — the robust-mean treatment for
    * heavy-tailed metrics where dropping outliers ([[iqrOutliers]])
    * loses mass. Same two-aggregate shape: the 1-row-per-group fence
    * table broadcast back onto the table for one clipping pass; clipped
    * values are rounded to 6 dp before the decimal sum so the result is
    * bit-stable under any partitioning and engine. */
  def winsorize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pLo: Double = 0.05,
      pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val fences = df.groupBy(col(groupCol)).agg(
      percentile(col(valueCol), lit(pLo)).as("lo"),
      percentile(col(valueCol), lit(pHi)).as("hi"))
    val v = col(valueCol)
    val clipped = round(least(greatest(v, col("lo")), col("hi")), 6)
    df.join(broadcast(fences), groupCol)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(when(v < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(v > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
        round(sum(clipped.cast("decimal(28,6)")).cast("double")
          / count(lit(1)), 6).as("winsorized_mean"),
        round(first(col("lo")), 4).as("lo"),
        round(first(col("hi")), 4).as("hi"))
  }

  /** MERGE / upsert snapshot maintenance (the warehouse `MERGE INTO`
    * shape over immutable parquet): apply a change batch (upserts +
    * deletes) to a keyed target snapshot and emit the NEW snapshot.
    * Latest change per key wins — "latest" under the total order
    * `orderCols` (pass the event timestamp plus a unique tiebreaker so
    * the winner is deterministic); a winning delete removes the key,
    * a winning upsert replaces (or inserts) the payload, untouched
    * target rows pass through. Each output row carries an `action`
    * audit column: `kept` / `updated` / `inserted` (deletes produce no
    * row — they are visible as keys missing vs the old snapshot).
    *
    * Two keyed shuffles, both on `keyCol`: the per-key change collapse
    * (a `max_by` aggregate — map-side partials, no window over the
    * batch) and the full-outer join against the target. At 100 TB
    * bucket BOTH the snapshot and the arriving batch by the key and
    * the join co-locates (the [[ops.Bucketing]] pattern) — snapshot
    * maintenance then costs one scan of each side per batch, which is
    * exactly the incremental-ingest bound. */
  def mergeSnapshot(
      target: DataFrame,
      changes: DataFrame,
      keyCol: String,
      opCol: String,
      orderCols: Seq[String],
      payloadCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "mergeSnapshot needs a change order")
    require(payloadCols.nonEmpty, "mergeSnapshot needs payload columns")
    val winner = changes
      .groupBy(col(keyCol))
      .agg(max_by(
        struct((opCol +: payloadCols).map(col): _*),
        struct(orderCols.map(col): _*)).as("__c"))
      .select(col(keyCol).as("__k") +: col(s"__c.$opCol").as("__op") +:
        payloadCols.map(c => col(s"__c.$c").as(s"__c_$c")): _*)
    val t = target.select(
      col(keyCol) +: lit(true).as("__in_target") +: payloadCols.map(col): _*)
    t.join(winner, col(keyCol) === col("__k"), "full_outer")
      // a winning delete drops the key (whether or not it existed)
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(
        coalesce(col(keyCol), col("__k")).as(keyCol) +:
          payloadCols.map(c =>
            when(col("__op") === "U", col(s"__c_$c"))
              .otherwise(col(c)).as(c)) :+
          when(col("__op").isNull, "kept")
            .when(col("__in_target").isNull, "inserted")
            .otherwise("updated").as("action"): _*)
  }

  /** Shannon entropy profile of categorical columns (the
    * distribution-drift companion to [[dqAudit]]'s count metrics): for
    * each listed column — distinct-value count and the entropy of its
    * value distribution in nats, plus the `[0,1]`-normalized form
    * `H / ln(n_distinct)` (null for constant columns). Nulls count as a
    * category (an all-null column scores H = 0, which is the honest
    * audit reading).
    *
    * One melt (`explode` of (column, value) structs — constant fanout =
    * the column count) feeding ONE (column, value)-keyed count, then a
    * column-keyed entropy fold over the per-value counts. Per-value
    * terms `p·ln p` are rounded to 9 dp and summed as DECIMAL(28,12),
    * so the entropy is bit-stable under any partitioning and engine —
    * the same determinism discipline as the unigram-LM scorer. At
    * 100 TB the intermediate is one row per (column, distinct value):
    * audit columns are low-cardinality by definition; for id-like
    * columns use [[dqAudit]]'s distinct count instead. */
  def categoricalEntropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val melted = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column"), col(c).cast("string").as("value"))): _*))
      .as("m")).select("m.*")
    val counts = melted.groupBy(col("column"), col("value"))
      .agg(count(lit(1)).as("cnt"))
    // n is identical for every column (one row each per source row)
    val n = counts.groupBy(col("column")).agg(sum(col("cnt")).as("n"))
    val p = col("cnt").cast("double") / col("n").cast("double")
    counts.join(broadcast(n), "column")
      .select(col("column"), col("n"),
        round(p * log(p), 9).cast("decimal(28,12)").as("term"))
      .groupBy(col("column"))
      .agg(first(col("n")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        (-sum(col("term"))).cast("double").as("h"))
      .select(col("column"), col("n_rows"), col("n_distinct"),
        round(col("h"), 6).as("entropy"),
        when(col("n_distinct") > 1,
          round(col("h") / log(col("n_distinct").cast("double")), 6))
          .as("entropy_norm"))
  }

  /** Mutual information between two categorical columns (the
    * dependence audit: near-zero MI ⇒ independent fields, MI ≈ min(H)
    * ⇒ one determines the other — the Deequ/profiling
    * `MutualInformation` analyzer). One row out: joint-distribution MI
    * in nats plus each marginal's entropy, all from ONE joint-count
    * aggregate — the marginals fold from the joint table (|X|·|Y| rows,
    * tiny for audit columns) rather than re-scanning the corpus, and
    * ride back onto it as broadcast maps. Per-cell terms
    * `p(x,y)·ln(n·c(x,y)/(c(x)·c(y)))` round to 9 dp under
    * DECIMAL(28,12) sums — bit-stable, like [[categoricalEntropy]]. */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df.select(
      col(xCol).cast("string").as("x"), col(yCol).cast("string").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
    val mx = joint.groupBy(col("x")).agg(sum(col("cxy")).as("cx"))
    val my = joint.groupBy(col("y")).agg(sum(col("cxy")).as("cy"))
    val tot = joint.agg(sum(col("cxy")).as("n"))
    val pxy = col("cxy").cast("double") / col("n").cast("double")
    val ratio = col("n").cast("double") * col("cxy").cast("double") /
      (col("cx").cast("double") * col("cy").cast("double"))
    def hOf(cnt: Column) = {
      val pp = cnt.cast("double") / col("n").cast("double")
      (-sum(round(pp * log(pp), 9).cast("decimal(28,12)"))).cast("double")
    }
    joint
      .join(broadcast(mx), "x").join(broadcast(my), "y")
      .crossJoin(broadcast(tot))
      .agg(
        first(col("n")).as("n"),
        sum(round(pxy * log(ratio), 9).cast("decimal(28,12)"))
          .cast("double").as("mi_raw"),
        hOf(col("cxy")).as("h_xy"))
      .select(col("n"),
        round(col("mi_raw"), 6).as("mi"),
        round(col("h_xy"), 6).as("h_joint"))
  }

  /** Chi-square test of independence between two categorical columns —
    * the significance companion to [[mutualInformation]] (MI says how
    * MUCH the fields co-vary; the chi-square statistic against its
    * degrees of freedom says whether the observed table could be
    * independence noise). One row out: n, the statistic over all
    * |X|·|Y| cells (expected count E = cx·cy/n; absent combinations
    * count as zero observations, exactly like the Benford spine), and
    * dof = (|X|−1)(|Y|−1).
    *
    * Same shape as [[mutualInformation]]: ONE joint-count aggregate,
    * marginals folded from the joint table, the full cell spine from a
    * marginal cross join (|X|·|Y| rows — audit-column sized), 9-dp
    * terms under DECIMAL sums. */
  def chiSquareIndependence(
      df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df.select(
      col(xCol).cast("string").as("x"), col(yCol).cast("string").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
    val mx = joint.groupBy(col("x")).agg(sum(col("cxy")).as("cx"))
    val my = joint.groupBy(col("y")).agg(sum(col("cxy")).as("cy"))
    val tot = joint.agg(sum(col("cxy")).as("n"),
      count_distinct(col("x")).as("nx"), count_distinct(col("y")).as("ny"))
    val spine = mx.crossJoin(my)
      .join(joint, Seq("x", "y"), "left")
      .withColumn("o", coalesce(col("cxy"), lit(0L)))
      .crossJoin(broadcast(tot))
    val e = col("cx").cast("double") * col("cy").cast("double") /
      col("n").cast("double")
    spine.agg(
      first(col("n")).as("n"),
      sum(round((col("o").cast("double") - e) * (col("o").cast("double") - e)
        / e, 9).cast("decimal(28,12)")).cast("double").as("chi_raw"),
      first((col("nx") - 1) * (col("ny") - 1)).as("dof"))
      .select(col("n"), round(col("chi_raw"), 6).as("chi_sq"), col("dof"))
  }

  /** Schema/statistics drift report between two snapshots of the same
    * table (yesterday's partition vs today's, or source A vs source B):
    * per column — row counts, null fractions, distinct counts and the
    * mean (sum/rows) on each side, plus their 6-dp deltas. The
    * monitoring companion to [[dqAudit]]: run it between every ingest
    * batch and the previous one and alert on the deltas.
    *
    * Pure composition — one [[dqAudit]] pass per side (each a single
    * global aggregate) joined on the column name: 2 scans total,
    * O(|cols|) result rows, nothing else moves. */
  def auditDrift(
      before: DataFrame,
      after: DataFrame,
      numericCols: Seq[String],
      otherCols: Seq[String] = Nil): DataFrame = {
    def side(df: DataFrame, tag: String) =
      dqAudit(df, numericCols, otherCols).select(
        col("column"),
        col("n_rows").as(s"n_$tag"),
        round(col("n_null").cast("double") / col("n_rows").cast("double"), 6)
          .as(s"null_frac_$tag"),
        col("n_distinct").as(s"distinct_$tag"),
        // mean over the NON-NULL values (the standard column mean);
        // an all-null column keeps a null mean via the 0/0 guard
        when(col("n_rows") > col("n_null"),
          round(col("sum_d") /
            (col("n_rows") - col("n_null")).cast("double"), 6))
          .as(s"mean_$tag"))
    side(before, "before").join(side(after, "after"), "column")
      .withColumn("null_frac_delta",
        round(col("null_frac_after") - col("null_frac_before"), 6))
      .withColumn("distinct_delta",
        col("distinct_after") - col("distinct_before"))
      .withColumn("mean_delta",
        round(col("mean_after") - col("mean_before"), 6))
  }

  /** Benford's-law first-digit audit (the classic fabricated-data /
    * corrupted-feed screen: naturally-grown magnitudes follow
    * P(d) = log10(1 + 1/d); manufactured or truncated ones don't): for
    * each listed numeric column and each leading digit 1–9 — the count,
    * observed fraction, Benford-expected fraction, and the column's
    * chi-square distance repeated on its digit rows. Values with
    * |x| < 1 or null are excluded (no leading digit).
    *
    * The leading digit comes from the DECIMAL STRING rendition of
    * `floor(abs(x))` — pure integer formatting, no log10 boundary
    * hazards at exact powers of ten. One melt + one (column, digit)
    * count (≤ 9 rows per column), chi-square folded from those rows
    * with 9-dp terms under decimal sums — the [[categoricalEntropy]]
    * determinism discipline. Map-side everything; the shuffle carries
    * 9·|cols| partial rows. */
  def benfordAudit(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to audit")
    val melted = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column"),
        substring(floor(abs(col(c).cast("double"))).cast("long").cast("string"),
          1, 1).cast("int").as("digit"),
        abs(col(c).cast("double")).as("absv"))): _*)).as("m"))
      .select("m.*")
      .filter(col("absv") >= 1.0d && col("digit").between(1, 9))
    val counts = melted.groupBy(col("column"), col("digit"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("column")).agg(sum(col("n")).as("tot"))
    // expected digit probabilities: the same IEEE log10 doubles on both
    // engines (interpolated as literals into the oracle, so no drift)
    val expFrac = (1 to 9).foldLeft(lit(null).cast("double")) { (acc, d) =>
      when(col("digit") === d, lit(BenfordP(d - 1))).otherwise(acc)
    }
    // densify to all 9 digits: an absent digit is a ZERO observation —
    // it still contributes (0 − E_d)²/E_d to the chi-square and an
    // explicit 0-count audit row
    val digitSpine = totals.select(col("column"), col("tot"),
      explode(sequence(lit(1), lit(9))).as("digit"))
    val scored = digitSpine
      .join(counts, Seq("column", "digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("obs_frac",
        round(col("n").cast("double") / col("tot").cast("double"), 6))
      .withColumn("exp_frac", round(expFrac, 6))
    val chi = scored.select(col("column"),
      round(
        (col("n").cast("double") / col("tot").cast("double") - expFrac)
          * (col("n").cast("double") / col("tot").cast("double") - expFrac)
          / expFrac * col("tot").cast("double"), 9)
        .cast("decimal(28,12)").as("term"))
      .groupBy(col("column"))
      .agg(round(sum(col("term")).cast("double"), 6).as("chi_sq"))
    scored.join(broadcast(chi), "column")
      .select(col("column"), col("digit"), col("n"),
        col("obs_frac"), col("exp_frac"), col("chi_sq"))
  }

  /** Benford digit probabilities log10(1 + 1/d), d = 1..9, as the exact
    * IEEE doubles both the plan and the oracle literal-interpolate. */
  val BenfordP: IndexedSeq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Blocked edit-distance record linkage (fuzzy join): canonical pairs
    * `(a_id < b_id)` within a blocking key whose names are within
    * `maxDist` Levenshtein edits.
    *
    * The classic entity-resolution shape: a cheap structural blocking
    * key (pass several columns; they concatenate) bounds the candidate
    * space, [[Blocks.guardBlockSize]] ENFORCES the bound at runtime
    * (within-block pairing is quadratic — the same contract discipline
    * as `ngramJaccard`/`cosinePairs`), a length-difference prefilter
    * (|len(a)-len(b)| ≤ d is a Levenshtein lower bound) drops pairs
    * before the edit-distance evaluation, and the self-join carries a
    * `shuffle_hash` hint so a not-small corpus is never broadcast.
    * One keyed shuffle on the block key.
    */
  def editLinkage(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockExprs: Seq[Column],
      maxDist: Int = 3,
      maxBlockRows: Long = 10000): DataFrame = {
    require(blockExprs.nonEmpty, "editLinkage needs a blocking key")
    val keyed = df.select(
      concat_ws("|", blockExprs: _*).as("blk"),
      col(idCol).cast("long").as("a_id"),
      col(nameCol).as("a_name"))
    val guarded = Blocks.guardBlockSize(keyed, "blk", maxBlockRows,
      "editLinkage", "refine the blocking key (add a column) or pre-cluster with LSH")
    val right = guarded.select(col("blk"), col("a_id").as("b_id"),
      col("a_name").as("b_name"))
    guarded.hint("shuffle_hash").join(right, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .filter(abs(length(col("a_name")) - length(col("b_name"))) <= maxDist)
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("a_name"), col("b_name"), col("dist"))
  }

  /**
   * Cramér's V effect size for two categorical columns:
   * V = √(χ² / (n · min(|X|−1, |Y|−1))) — the NORMALIZED companion to
   * [[chiSquareIndependence]] (χ² grows with n, so it says whether an
   * association exists; V ∈ [0,1] says how strong it is, comparable
   * across tables and sample sizes). One extra tiny distinct-count
   * aggregate beside the χ² plan; a single-level column (min dim 0)
   * yields a null V rather than a division blow-up.
   */
  def cramersV(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val chi = chiSquareIndependence(df, xCol, yCol)
    val dims = df
      .select(col(xCol).cast("string").as("x"), col(yCol).cast("string").as("y"))
      .agg(count_distinct(col("x")).as("nx"), count_distinct(col("y")).as("ny"))
    chi.crossJoin(broadcast(dims))
      .select(col("n"), col("chi_sq"), col("dof"),
        when(least(col("nx") - 1, col("ny") - 1) > 0,
          round(sqrt(col("chi_sq") /
            (col("n") * least(col("nx") - 1, col("ny") - 1)).cast("double")),
            6))
          .as("cramers_v"))
  }

  /**
   * Two-sample Kolmogorov–Smirnov test: D = max |F_a(x) − F_b(x)| over
   * the empirical CDFs — the NONPARAMETRIC drift detector next to
   * [[auditDrift]]'s moment deltas (a distribution can keep its mean
   * and variance while its shape drifts; KS catches that). Emits one
   * row: sample sizes, the exact D statistic over 6-dp-rounded values,
   * and the scaled statistic √(n_a·n_b/(n_a+n_b))·D (compare against
   * the usual 1.358 ⇒ α=0.05 critical value; the asymptotic p-value
   * needs exp(), which libms round differently — left to the caller).
   *
   * Determinism: values 6-dp-rounded up front (the score-histogram
   * discipline — the CDF walk runs over DISTINCT rounded values, a
   * bounded histogram, not per-row), cumulative counts are exact
   * integers, and each CDF difference is one double subtraction of
   * exact ratios — bit-identical cross-engine. Scale shape: one
   * two-phase keyed count per distinct value, one ordered cumulative
   * pass over the value histogram (the [[TextAnalysis.zipfFit]]
   * unpartitioned-window-over-histogram trade, documented there), one
   * max aggregate.
   */
  def ksTest(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def side(df: DataFrame, sa: Int, sb: Int): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .select(round(col(valueCol).cast("double"), 6).as("v"),
          lit(sa.toLong).as("ia"), lit(sb.toLong).as("ib"))
    val counts = side(a, 1, 0).unionByName(side(b, 0, 1))
      .groupBy(col("v"))
      .agg(sum(col("ia")).as("ca"), sum(col("ib")).as("cb"))
    val w = Window.orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
    val totals = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cum.crossJoin(broadcast(totals))
      .select(col("na"), col("nb"),
        abs(col("cuma").cast("double") / col("na").cast("double") -
          col("cumb").cast("double") / col("nb").cast("double")).as("diff"))
      .groupBy(col("na"), col("nb"))
      .agg(max(col("diff")).as("d"))
      .select(col("na"), col("nb"),
        round(col("d"), 6).as("d_stat"),
        round(sqrt(col("na").cast("double") * col("nb").cast("double") /
          (col("na") + col("nb")).cast("double")) * col("d"), 6)
          .as("ks_scaled"))
  }

  /**
   * Two-sample Mann–Whitney U test (Wilcoxon rank-sum): the
   * nonparametric location-shift companion to [[ksTest]]'s shape test
   * and [[welchTTest]]'s parametric read — rank-based, so one fat tail
   * can't swamp the verdict the way it inflates a t statistic. Emits
   * one row: sample sizes, U for sample a, and the tie-corrected
   * normal approximation z.
   *
   * Determinism end-to-end INTEGER: ranks live on the DISTINCT
   * 6-dp-rounded value histogram ([[ksTest]]'s documented
   * window-over-histogram trade), doubled mid-rank 2r(v) =
   * 2·cum_before + n_v + 1 keeps tie midpoints exact, R and the tie
   * term Σ(t³−t) accumulate under DECIMAL(38,0), and the only doubles
   * are the final fixed-order z arithmetic (each op one IEEE
   * instruction, mirrored verbatim in the oracle).
   */
  def mannWhitneyU(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def side(df: DataFrame, sa: Int, sb: Int): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .select(round(col(valueCol).cast("double"), 6).as("v"),
          lit(sa.toLong).as("ia"), lit(sb.toLong).as("ib"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val counts = side(a, 1, 0).unionByName(side(b, 0, 1))
      .groupBy(col("v"))
      .agg(sum(col("ia")).as("ca"), sum(col("ib")).as("cb"))
      .withColumn("t", col("ca") + col("cb"))
    val w = Window.orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = counts
      .withColumn("r2",
        lit(2L) * coalesce(sum(col("t")).over(w), lit(0L)) + col("t") + 1L)
    val aggd = ranked.agg(
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      sum(col("ca").cast(dec) * col("r2").cast(dec)).as("r2a"),
      sum((col("t").cast(dec) * col("t") * col("t") - col("t")))
        .as("ties"))
    val n = col("na") + col("nb")
    val u2 = (col("r2a") - col("na").cast(dec) * (col("na") + 1L)).cast("double")
    val sigma2 = col("na").cast("double") * col("nb").cast("double") *
      ((n + 1L).cast("double") -
        col("ties").cast("double") /
          (n.cast("double") * (n - 1L).cast("double"))) / lit(12.0d)
    aggd.select(col("na"), col("nb"),
      (u2 / 2.0d).as("u_a"),
      round((u2 / 2.0d - col("na").cast("double") * col("nb").cast("double")
        / 2.0d) / sqrt(sigma2), 6).as("z"))
  }

  /**
   * Snapshot diff — the table-to-table reconciliation every warehouse
   * migration/backfill runs: full outer join of two snapshots on the
   * key, each key classified added / removed / changed / unchanged
   * (change = any compare column differs under NULL-SAFE equality), and
   * one summary row per status plus one `changed:<col>` row per compare
   * column. ONE keyed shuffle (the outer join) + one tiny aggregate;
   * at 100 TB bucket both snapshots by the key and the join co-locates.
   */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "snapshotDiff needs key and compare columns")
    val o = oldDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("_in_old", lit(1))
    val n = newDf.select(
      keyCols.map(col) ++ compareCols.map(c => col(c).as(s"${c}__new")): _*)
      .withColumn("_in_new", lit(1))
    val j = o.join(n, keyCols, "full_outer")
    val changedCol = compareCols.map(c =>
      !(col(c) <=> col(s"${c}__new"))).reduce(_ || _)
    val status = when(col("_in_old").isNull, lit("added"))
      .when(col("_in_new").isNull, lit("removed"))
      .when(changedCol, lit("changed"))
      .otherwise(lit("unchanged"))
    val tagged = j.withColumn("_status", status)
    val summary = tagged.groupBy(col("_status").as("metric"))
      .agg(count(lit(1)).as("n"))
    val perCol = compareCols.map { c =>
      tagged.filter(col("_in_old").isNotNull && col("_in_new").isNotNull)
        .agg(sum(when(!(col(c) <=> col(s"${c}__new")), 1L).otherwise(0L))
          .as("n"))
        .select(lit(s"changed:$c").as("metric"), col("n"))
    }
    perCol.foldLeft(summary)(_ unionByName _)
  }

  /**
   * Key-skew report — the audit you run BEFORE picking join/aggregate
   * strategies at 100 TB: for each candidate key column, the row and
   * key counts, the heaviest key's share, and the Gini coefficient of
   * the per-key row distribution (0 = uniform, →1 = one hub holds
   * everything; a high-Gini key wants salting or a skew-join hint).
   *
   * Gini computes EXACTLY from the count-of-counts histogram: keys
   * sorted by their row count c ascending occupy position runs, the
   * run of the m_c keys with count c after k0 smaller keys contributes
   * c·(m·k0 + m(m+1)/2) to Σ i·x_(i), and
   * G = (2Σ − (n+1)·T)/(n·T) needs just one double division at the
   * end. The ordering window runs over the DISTINCT-count histogram
   * (the [[ksTest]] bounded-histogram trade), never over keys.
   */
  def keySkewReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keySkewReport needs at least one key column")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    keyCols.map { kc =>
      val counts = df.groupBy(col(kc).as("key")).agg(count(lit(1)).as("c"))
      val hist = counts.groupBy(col("c")).agg(count(lit(1)).as("m"))
      val w = Window.orderBy(col("c").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val aggd = hist
        .withColumn("k0", coalesce(sum(col("m")).over(w), lit(0L)))
        // DECIMAL(38,0) BEFORE the multiply: with ~3e9+ keys sharing a
        // count, m*k0 / m*(m+1) would silently wrap in BIGINT (Spark is
        // non-ANSI) — mirror of the oracle's HUGEINT arithmetic. The
        // triangular term halves the EVEN factor in BIGINT first (m or
        // m+1 — one always is) so the decimal math is pure integer
        // multiply/add, no decimal division (whose Spark result scale
        // would cost integer digits at the top of DECIMAL(38,0)).
        .withColumn("runsum",
          col("m").cast(dec) * col("k0").cast(dec) +
            when(col("m") % 2 === 0,
              expr("m div 2").cast(dec) *
                (col("m").cast(dec) + lit(1L).cast(dec)))
              .otherwise(col("m").cast(dec) *
                expr("(m + 1) div 2").cast(dec)))
        .agg(
          sum(col("c").cast(dec) * col("m")).as("t"),
          sum(col("m")).as("nk"),
          max(col("c")).as("maxc"),
          sum(col("c").cast(dec) * col("runsum")).as("s"))
      // an empty table audits as zero keys (null aggregates -> 0 counts,
      // null ratios), not as a null row
      aggd.select(
        lit(kc).as("column"),
        coalesce(col("t").cast("long"), lit(0L)).as("n_rows"),
        coalesce(col("nk"), lit(0L)).as("n_keys"),
        coalesce(col("maxc"), lit(0L)).as("max_count"),
        round(col("maxc").cast("double") / col("t").cast("double"), 6)
          .as("top_share"),
        round((lit(2L).cast(dec) * col("s") -
          (col("nk") + 1L).cast(dec) * col("t")).cast("double") /
          (col("nk").cast("double") * col("t").cast("double")), 6)
          .as("gini"))
    }.reduce(_ unionByName _)
  }

  /**
   * Population stability index (PSI) — the scorecard-monitoring drift
   * metric next to [[ksTest]]: bin the CURRENT sample against the
   * BASELINE's decile fences and sum (p−q)·ln(p/q) over bins
   * (rule-of-thumb: <0.1 stable, >0.25 investigate). Fences are the
   * baseline's exact percentiles (broadcast, one tiny row); binning is
   * a map-side fold over the fence array; shares clamp at 1e-6 so an
   * emptied bin contributes a finite penalty instead of ±∞. Terms
   * round to 9 dp and sum under DECIMAL(28,12) — order-exact; the
   * fence doubles and every per-term op mirror verbatim in the oracle.
   */
  def psi(
      base: DataFrame,
      cur: DataFrame,
      valueCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "nBins must be >= 2")
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val pcts = (1 until nBins).map(_.toDouble / nBins)
    val fences = base.filter(col(valueCol).isNotNull)
      .agg(percentile(col(valueCol),
        typedLit(pcts)).as("f"))
    def binned(df: DataFrame, side: Int): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .crossJoin(broadcast(fences))
        .select(aggregate(col("f"), lit(0),
          (acc, fv) => acc + when(col(valueCol) > fv, 1).otherwise(0))
          .as("bin"),
          lit(side).as("side"))
    val counts = binned(base, 0).unionByName(binned(cur, 1))
      .groupBy(col("bin"))
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("cb"))
    val totals = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    // explicit n>0 guard: a degenerate empty sample divides by zero,
    // where Spark's non-ANSI double divide is null but an IEEE engine's
    // is inf/NaN — null the share on BOTH engines (oracle mirrors with
    // nullif) so the 1e-6 clamp is the single cross-engine floor
    def share(c: Column, n: Column): Column =
      greatest(coalesce(
        when(n > 0L, c.cast("double") / n.cast("double")), lit(1e-6d)),
        lit(1e-6d))
    val p = share(col("ca"), col("na"))
    val q = share(col("cb"), col("nb"))
    counts.crossJoin(broadcast(totals))
      .select(col("na"), col("nb"),
        round((p - q) * log(p / q), 9).cast(dec).as("term"))
      .groupBy(col("na"), col("nb"))
      .agg(round(sum(col("term")).cast("double"), 6).as("psi"))
  }

  /**
   * Cohen's kappa agreement between two boolean verdict frames — the
   * filter-redundancy audit: two quality filters that agree at
   * chance-corrected κ ≈ 1 are measuring the same thing (drop one);
   * κ ≈ 0 means orthogonal signals worth composing. One equi-join +
   * one 2×2 confusion aggregate; po/pe divide exact integer counts, so
   * the statistic is engine-reproducible with the final rounding.
   */
  def cohensKappa(
      a: DataFrame,
      b: DataFrame,
      idCol: String = "doc_id",
      passCol: String = "pass"): DataFrame = {
    val j = a.select(col(idCol), col(passCol).as("pa"))
      .join(b.select(col(idCol), col(passCol).as("pb")), Seq(idCol))
    val m = j.agg(
      count(lit(1)).as("n"),
      sum(when(col("pa") && col("pb"), 1L).otherwise(0L)).as("n11"),
      sum(when(!col("pa") && !col("pb"), 1L).otherwise(0L)).as("n00"),
      sum(when(col("pa") && !col("pb"), 1L).otherwise(0L)).as("n10"),
      sum(when(!col("pa") && col("pb"), 1L).otherwise(0L)).as("n01"))
    val nD = col("n").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / nD
    val pe = ((col("n11") + col("n10")) * (col("n11") + col("n01")) +
      (col("n00") + col("n01")) * (col("n00") + col("n10"))).cast("double") /
      (nD * nD)
    m.select(col("n"), (col("n11") + col("n00")).as("n_agree"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      when(lit(1.0d) - pe =!= 0.0d,
        round((po - pe) / (lit(1.0d) - pe), 6)).as("kappa"))
  }

  /** Cumulative Poisson(1) thresholds ⌊F(k)·2^32⌋ for k = 0..6 (mass
    * past 7 is ~1e-5 and truncates to weight 7) — computed once here
    * and interpolated into BOTH engines (the EWMA constant-sharing
    * discipline). */
  private[graft] val PoissonThresholds: Seq[Long] = {
    val pmf = (0 to 6).map { k =>
      math.exp(-1.0) / (1 to k).foldLeft(1.0)((a, i) => a * i)
    }
    pmf.scanLeft(0.0)(_ + _).tail.map(c => (c * 4294967296.0).toLong)
  }

  /**
   * Bootstrap confidence interval for a mean — the DETERMINISTIC
   * distributed rendition of the classic resample: each of `b`
   * replicas draws every row a Poisson(1) number of times (the
   * Poisson bootstrap, Chamandy et al. 2012 — the form that needs no
   * global n and runs as a pure map-side weight), with the draw an
   * md5-coin inverse-CDF lookup against driver-computed integer
   * thresholds — reproducible across runs, partitionings and engines,
   * like every sampler in [[Corpus]]. Emits one row: n, the point
   * mean, and the percentile-bootstrap interval (2nd and (b−1)-th of
   * the b sorted replica means ≈ 5%/95% at b = 32).
   *
   * Scale shape: one b-way explode (b·n rows — b is a constant ≤ 64),
   * one b-group aggregate with decimal-exact Σwx, one b-element array
   * sort. No per-row state, no windows, nothing driver-side but the
   * threshold constants.
   */
  def bootstrapMeanCI(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      b: Int = 32,
      salt: String = "boot"): DataFrame = {
    require(b >= 4, "b must be >= 4 (percentile indices degenerate)")
    val coin = conv(substring(md5(concat_ws(":", lit(salt),
      col("r").cast("string"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val weight = PoissonThresholds.zipWithIndex.reverse
      .foldLeft(lit(7L)) { case (acc, (t, k)) =>
        when(col("c") < t, lit(k.toLong)).otherwise(acc)
      }
    val v = round(col(valueCol).cast("double"), 6).cast("decimal(28,6)")
    // fanOut: the b-way explode + per-(row, replica) md5 coin is the
    // hot map stage (measured: ONE 4.5 s task on a 1-split scan)
    val reps = graft.ops.Par.fanOut(
      df.filter(col(valueCol).isNotNull).select(col(idCol), v.as("v")))
      .select(col(idCol), col("v"),
        explode(sequence(lit(0), lit(b - 1))).as("r"))
      .withColumn("c", coin)
      .withColumn("w", weight)
    val means = reps.groupBy(col("r"))
      .agg((sum(col("w").cast("decimal(28,6)") * col("v")).cast("double") /
        sum(col("w")).cast("double")).as("m"))
      .agg(array_sort(collect_list(col("m"))).as("ms"))
    val overall = df.filter(col(valueCol).isNotNull)
      .agg(count(lit(1)).as("n_rows"),
        (sum(v).cast("double") / count(lit(1)).cast("double")).as("mean"))
    overall.crossJoin(broadcast(means))
      .select(col("n_rows"), round(col("mean"), 6).as("mean"),
        round(element_at(col("ms"), 2), 6).as("boot_lo"),
        round(element_at(col("ms"), b - 1), 6).as("boot_hi"))
  }

  /**
   * Approximate-distinct audit (the HLL++ sketch surface): per group,
   * `approx_count_distinct` (relative standard deviation `rsd`) checked
   * against the exact distinct count, emitting whether the estimate
   * landed within `maxRelError`. The sketch is THE cardinality path at
   * 100 TB — O(1) mergeable state per group, pure map-side partials, no
   * value shuffle — while the exact count here is the GATE anchor only
   * (the error-contract-boolean pattern of `corpusReport`'s percentile
   * sketch: the oracle can't reproduce HLL internals, but it can
   * falsify the published error bound). `maxRelError` defaults to 4
   * standard deviations of the configured rsd — a bound the estimator
   * misses with probability ~6e-5 per group, so a red gate means a
   * broken sketch, not bad luck.
   */
  def approxDistinctAudit(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      rsd: Double = 0.01,
      maxRelError: Double = 0.04): DataFrame =
    // NO fanOut here (measured 3.5× regression): the multi-distinct
    // rewrite evaluates the HLL partial per EXPANDED key, so widening
    // the partial-agg stage multiplies ~22 KB HLL buffers across every
    // task's (group, value) keys — 256 MB spill PER TASK at 32-way
    df.groupBy(col(groupCol))
      .agg(count_distinct(col(valueCol)).as("n_exact"),
        approx_count_distinct(col(valueCol), rsd).as("_n_approx"))
      .select(col(groupCol), col("n_exact"),
        (abs(col("_n_approx") - col("n_exact")).cast("double") <=
          lit(maxRelError) * col("n_exact").cast("double"))
          .as("within_bound"))

  /**
   * Two-proportion z-test — the conversion-rate companion to
   * [[welchTTest]]'s mean test: for two variants with x successes of n
   * trials each, z = (p̂₁ − p̂₂) / √(p̂(1−p̂)(1/n₁ + 1/n₂)) under the
   * pooled null proportion p̂ — the A/B readout when the metric is a
   * rate (CTR, keep-rate, pass-rate), where a t-test on 0/1 values
   * wastes the known variance structure.
   *
   * Determinism: all counts exact integers; p̂₁, p̂₂, p̂ are one
   * division each, the z chain a fixed sequence of IEEE ops on
   * bit-identical operands, 6-dp-rounded. Degenerate inputs (either
   * arm empty, or a pooled rate of exactly 0 or 1 — zero variance)
   * emit NULL. ONE aggregate pass over the two-arm frame.
   */
  def twoProportionZ(
      df: DataFrame, armCol: String, successCol: String): DataFrame = {
    val g = df
      .filter(col(armCol).isNotNull && col(successCol).isNotNull)
      .select(when(col(armCol).cast("boolean"), 1L).otherwise(0L).as("b"),
        when(col(successCol).cast("boolean"), 1L).otherwise(0L).as("y"))
      .agg(
        sum(when(col("b") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("b") === 0, col("y")).otherwise(0L)).as("x0"),
        sum(when(col("b") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("b") === 1, col("y")).otherwise(0L)).as("x1"))
    val p0 = col("x0").cast("double") / col("n0").cast("double")
    val p1 = col("x1").cast("double") / col("n1").cast("double")
    val pp = (col("x0") + col("x1")).cast("double") /
      (col("n0") + col("n1")).cast("double")
    val se = sqrt(pp * (lit(1.0d) - pp) *
      (lit(1.0d) / col("n0").cast("double") +
        lit(1.0d) / col("n1").cast("double")))
    g.select(col("n0"), col("x0"), col("n1"), col("x1"),
      when(col("n0") > 0, round(p0, 6))
        .otherwise(lit(null).cast("double")).as("rate0"),
      when(col("n1") > 0, round(p1, 6))
        .otherwise(lit(null).cast("double")).as("rate1"),
      when(col("n0") > 0 && col("n1") > 0 &&
        col("x0") + col("x1") > 0 &&
        col("x0") + col("x1") < col("n0") + col("n1"),
        round((p1 - p0) / se, 6))
        .otherwise(lit(null).cast("double")).as("z"))
  }

  /**
   * Split-conformal prediction threshold per group (Vovk; the
   * distribution-free calibration step behind "flag anything scoring
   * above q̂ and you'll be wrong at most α of the time"): q̂ is the
   * ⌈(n+1)·(1−α)⌉-th smallest calibration value — a pure order
   * statistic, no distributional assumption. Groups whose calibration
   * set is too small for the coverage level (k > n) emit NULL — the
   * standard "collect more calibration data" signal, not a made-up
   * threshold.
   *
   * Coverage is a RATIONAL `coverNum/coverDen` (default 9/10 ⇒ α=0.1)
   * so the rank k = ⌈(n+1)·cover⌉ is exact integer arithmetic. The
   * order statistic reads off the per-group 6-dp value histogram's
   * cumulative counts (the [[ksTest]] window-over-histogram trade,
   * partitioned by group) — never a per-row sort.
   */
  def conformalThreshold(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      coverNum: Long = 9L,
      coverDen: Long = 10L): DataFrame = {
    require(coverDen > 0 && coverNum > 0 && coverNum <= coverDen,
      "coverage must be a rational in (0, 1]")
    val h = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        round(col(valueCol).cast("double"), 6).as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val ns = h.groupBy(col("g")).agg(sum(col("c")).as("n"))
      // ceil((n+1)*num/den) in exact integers; the double divide is
      // exact below 2^53 and mirrored verbatim in the oracle
      .withColumn("k",
        floor(((col("n") + 1L) * lit(coverNum) + lit(coverDen - 1L))
          .cast("double") / lit(coverDen.toDouble)).cast("long"))
    val w = Window.partitionBy(col("g")).orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.withColumn("cum", sum(col("c")).over(w))
    val qhat = cum.join(ns.select(col("g"), col("k")), Seq("g"))
      .filter(col("cum") >= col("k"))
      .groupBy(col("g")).agg(min(col("v")).as("qhat"))
    ns.join(qhat, Seq("g"), "left")
      .select(col("g").as(groupCol), col("n"), col("k"),
        when(col("k") <= col("n"), col("qhat"))
          .otherwise(lit(null).cast("double")).as("qhat"))
  }

  /**
   * Exact ROC-AUC of a score against a binary label via the rank-sum
   * identity AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) — the threshold-free
   * discrimination readout every quality-filter model gets judged by
   * (AUC 0.5 = coin flip, 1 = perfect separation), sidestepping any
   * curve integration. Ties get mid-ranks, the standard correction.
   *
   * Determinism is [[mannWhitneyU]] verbatim: doubled mid-ranks on the
   * 6-dp score histogram, R⁺ under DECIMAL(38,0), AUC as ONE double
   * division of exact integers — bit-identical cross-engine. Gini
   * (= 2·AUC − 1) rides along. Degenerate one-class inputs emit NULL.
   */
  def aucRoc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val counts = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(round(col(scoreCol).cast("double"), 6).as("v"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("ia"))
      .groupBy(col("v"))
      .agg(sum(col("ia")).as("ca"),
        (count(lit(1)) - sum(col("ia"))).as("cb"))
      .withColumn("t", col("ca") + col("cb"))
    val w = Window.orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = counts.withColumn("r2",
      lit(2L) * coalesce(sum(col("t")).over(w), lit(0L)) + col("t") + 1L)
    val aggd = ranked.agg(
      sum(col("ca")).as("n_pos"), sum(col("cb")).as("n_neg"),
      sum(col("ca").cast(dec) * col("r2")).as("r2a"))
    // 2R+ = r2a, so AUC = (r2a - 2*np(np+1)/2) / (2*np*nn)
    val num = (col("r2a") - col("n_pos").cast(dec) * (col("n_pos") + 1L))
      .cast("double")
    val den = (lit(2L).cast(dec) * col("n_pos") * col("n_neg")).cast("double")
    aggd.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0, round(num / den, 6))
        .otherwise(lit(null).cast("double")).as("auc"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round(lit(2.0d) * (num / den) - 1.0d, 6))
        .otherwise(lit(null).cast("double")).as("gini"))
  }

  /**
   * Precision/recall/F1 sweep over the ten fixed decile thresholds of a
   * [0,1] score — the operating-point table a filter threshold is
   * picked from (the curve companion to [[aucRoc]]'s single number and
   * [[TextAnalysis.calibrationReport]]'s reliability read). Threshold
   * t = i/10 predicts positive where score ≥ t (bucket ≥ i after the
   * decile floor), so tp/fp are suffix sums over the 10-bucket
   * histogram — exact integers; the spine is a literal range, so every
   * threshold row exists even when buckets are empty.
   *
   * Determinism: counts exact; precision/recall one division each; F1
   * = 2pr/(p+r) from those doubles — identical IEEE op chains, 6-dp
   * rounds; empty-prediction / one-class cells emit NULL.
   */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    val counts = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(greatest(least(floor(col(scoreCol).cast("double") * 10.0d),
        lit(9.0d)), lit(0.0d)).cast("long").as("bucket"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
      .groupBy(col("bucket"))
      .agg(sum(col("y")).as("pos"), (count(lit(1)) - sum(col("y"))).as("neg"))
    val spine = spark.range(0, 10).select(col("id").as("i"))
    val dense = spine.join(counts, spine("i") === counts("bucket"), "left")
      .select(col("i"),
        coalesce(col("pos"), lit(0L)).as("pos"),
        coalesce(col("neg"), lit(0L)).as("neg"))
    val wTop = Window.orderBy(col("i").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = dense.agg(sum(col("pos")).as("tot_pos"))
    val p = col("tp").cast("double") / (col("tp") + col("fp")).cast("double")
    val r = col("tp").cast("double") / col("tot_pos").cast("double")
    dense
      .withColumn("tp", sum(col("pos")).over(wTop))
      .withColumn("fp", sum(col("neg")).over(wTop))
      .crossJoin(broadcast(totals))
      .select(col("i").cast("int").as("threshold_decile"),
        col("tp"), col("fp"), (col("tot_pos") - col("tp")).as("fn"),
        when(col("tp") + col("fp") > 0, round(p, 6))
          .otherwise(lit(null).cast("double")).as("precision"),
        when(col("tot_pos") > 0, round(r, 6))
          .otherwise(lit(null).cast("double")).as("recall"),
        when(col("tp") + col("fp") > 0 && col("tot_pos") > 0 &&
          col("tp") > 0,
          round(lit(2.0d) * p * r / (p + r), 6))
          .otherwise(lit(null).cast("double")).as("f1"))
  }

  /**
   * Cumulative gains / lift table by score decile — the "how much of
   * the signal do the top-k% scored rows capture" readout a quality-
   * filter budget decision reads (keep the top 30% by score → what
   * fraction of the good documents survive): rows bucket to score
   * deciles, deciles rank best-first, and each row reports the
   * cumulative population share, cumulative positive share (gain), and
   * lift = gain/share. The [[prCurve]] decile-spine discipline: a
   * literal 10-row spine keeps every operating point present, suffix
   * sums run over the 10-row frame, shares are single divisions of
   * exact longs. Lift of an empty prefix is NULL.
   */
  def gainsTable(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    val counts = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(greatest(least(floor(col(scoreCol).cast("double") * 10.0d),
        lit(9.0d)), lit(0.0d)).cast("long").as("bucket"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
      .groupBy(col("bucket"))
      .agg(sum(col("y")).as("pos"), count(lit(1)).as("n"))
    val spine = spark.range(0, 10).select(col("id").as("i"))
    val dense = spine.join(counts, spine("i") === counts("bucket"), "left")
      .select(col("i"),
        coalesce(col("pos"), lit(0L)).as("pos"),
        coalesce(col("n"), lit(0L)).as("n"))
    val wTop = Window.orderBy(col("i").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = dense.agg(sum(col("pos")).as("tot_pos"),
      sum(col("n")).as("tot_n"))
    dense
      .withColumn("cum_pos", sum(col("pos")).over(wTop))
      .withColumn("cum_n", sum(col("n")).over(wTop))
      .crossJoin(broadcast(totals))
      .select(col("i").cast("int").as("score_decile"),
        col("cum_n"), col("cum_pos"),
        when(col("tot_n") > 0,
          round(col("cum_n").cast("double")
            / col("tot_n").cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("pop_share"),
        when(col("tot_pos") > 0,
          round(col("cum_pos").cast("double")
            / col("tot_pos").cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("gain"),
        when(col("cum_n") > 0 && col("tot_pos") > 0 && col("tot_n") > 0,
          round((col("cum_pos").cast("double")
              * col("tot_n").cast("double"))
            / (col("cum_n").cast("double")
              * col("tot_pos").cast("double")), 6))
          .otherwise(lit(null).cast("double")).as("lift"))
  }

  /**
   * Weight-of-Evidence / Information-Value feature audit — the credit-
   * scoring-lineage readout for "how separable is this binary label by
   * this bucketed feature": per bucket, WOE = ln((pos_b/POS)/(neg_b/NEG))
   * (positive where the bucket over-indexes on positives), and the IV
   * term (pos_b/POS − neg_b/NEG)·WOE, whose sum is the feature's IV
   * (<0.02 useless, >0.3 strong, by the usual rule of thumb).
   *
   * Determinism: the WOE ln argument is ONE division of exact integer
   * products pos_b·NEG / neg_b·POS, 9-dp-rounded; the IV term
   * multiplies two single-division shares' difference by that rounded
   * WOE — every op an IEEE instruction on bit-identical operands. A
   * one-sided bucket (no positives or no negatives) emits NULL woe/iv
   * (its raw WOE is ±∞; cap-or-drop is a modeling choice left to the
   * caller). ONE keyed aggregate + a broadcast 1-row totals frame.
   */
  def woeIv(df: DataFrame, bucketCol: String, labelCol: String): DataFrame = {
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val counts = df
      .filter(col(bucketCol).isNotNull && col(labelCol).isNotNull)
      .select(col(bucketCol).as("bucket"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .withColumn("n_neg", col("n") - col("n_pos"))
    val totals = counts.agg(sum(col("n_pos")).as("tot_pos"),
      sum(col("n_neg")).as("tot_neg"))
    val woe9 = round(log(
      (col("n_pos").cast(big) * col("tot_neg")).cast("double") /
        (col("n_neg").cast(big) * col("tot_pos")).cast("double")), 9)
    val share = col("n_pos").cast("double") / col("tot_pos").cast("double") -
      col("n_neg").cast("double") / col("tot_neg").cast("double")
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0 &&
          col("tot_pos") > 0 && col("tot_neg") > 0,
          round(woe9, 6)).otherwise(lit(null).cast("double")).as("woe"),
        when(col("n_pos") > 0 && col("n_neg") > 0 &&
          col("tot_pos") > 0 && col("tot_neg") > 0,
          round(share * woe9, 6)).otherwise(lit(null).cast("double"))
          .as("iv_term"))
  }

  /**
   * Smoothed target encoding (the "mean target per category" feature
   * with an m-estimate Bayesian shrink toward the global prior —
   * Micci-Barreca 2001): enc_c = (pos_c + m·prior) / (n_c + m), so a
   * 3-row category reads mostly as the prior while a 30k-row category
   * reads as its own rate — the leakage-aware alternative to raw
   * per-category means for high-cardinality features.
   *
   * Determinism: prior = POS/N is one division of exact integers;
   * m·prior one multiply; the encode one add + one divide — all IEEE
   * ops on bit-identical operands, 6-dp-rounded. ONE keyed count plus
   * the broadcast 1-row totals frame; the category cardinality is the
   * output size (never joined back to rows here — do that downstream
   * with a broadcast of this frame when small, a keyed join when not).
   */
  def targetEncoding(
      df: DataFrame,
      catCol: String,
      labelCol: String,
      m: Double = 10.0d): DataFrame = {
    require(m >= 0.0d, "smoothing m must be non-negative")
    val counts = df
      .filter(col(catCol).isNotNull && col(labelCol).isNotNull)
      .select(col(catCol).cast("string").as("category"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
    val totals = counts.agg(sum(col("n")).as("tot_n"),
      sum(col("n_pos")).as("tot_pos"))
    val prior = col("tot_pos").cast("double") / col("tot_n").cast("double")
    counts.crossJoin(broadcast(totals))
      .select(col("category"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("raw_rate"),
        round((col("n_pos").cast("double") + lit(m) * prior) /
          (col("n").cast("double") + lit(m)), 6).as("encoded"))
  }

  /**
   * Count-min-sketch heavy-hitter audit — the streaming-ingest
   * frequency sketch next to [[approxDistinctAudit]]'s HLL: the exact
   * top-`k` keys (the gate anchor) probed against a CMS built with
   * `(eps, confidence, seed)`, emitting the sketch's two contracts as
   * booleans — a CMS NEVER under-counts (est ≥ exact, a hard
   * guarantee), and over-counts by more than 3·eps·N only with
   * probability ≤ (1/6)^depth per key (Markov on each of the depth
   * independent rows, then the min) — ~1e-5 at the default confidence,
   * and the sketch is seed-deterministic besides. The oracle can't
   * reproduce CMS internals; it CAN falsify these bounds (the
   * error-contract-boolean pattern).
   *
   * Scale shape: the sketch is ONE mergeable aggregate (map-side
   * partials, O(1/eps·log(1/δ)) state — the point at 100 TB where an
   * exact groupBy of a hot column is a full shuffle); the exact top-k
   * is TakeOrdered; the k driver-side probes are bounded by k.
   */
  def cmsHeavyHitters(
      df: DataFrame,
      keyCol: String,
      eps: Double = 0.005,
      confidence: Double = 0.99,
      seed: Int = 42,
      k: Int = 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("long").as("key"))
    val top = keyed.groupBy(col("key")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("key").asc).limit(k)
      .collect()
    val sketch = keyed.stat.countMinSketch("key", eps, confidence, seed)
    val slack = math.ceil(3.0d * eps * sketch.totalCount()).toLong
    top.toSeq.map { r =>
      val key = r.getLong(0)
      val exact = r.getLong(1)
      val est = sketch.estimateCount(key)
      (key, exact, est >= exact, est <= exact + slack)
    }.toDF("key", "n_exact", "est_ge_exact", "within_bound")
  }

  /**
   * Theil's uncertainty coefficient U — the NORMALIZED, asymmetric
   * companion to [[mutualInformation]] and [[cramersV]]:
   * U(X|Y) = MI / H(X) reads "what fraction of X's entropy does knowing
   * Y remove" (0 = independent, 1 = Y determines X), and the asymmetry
   * is the point — a many-to-one mapping scores 1 in one direction and
   * less in the other, which symmetric Cramér's V hides. One row: n,
   * MI, both marginal entropies, both conditional directions.
   *
   * Same determinism shape as [[mutualInformation]]: every entropy /
   * MI term is 9-dp-rounded and summed under DECIMAL(28,12); the U
   * divisions are single IEEE ops on those exact decimals' doubles,
   * nulled when the denominator entropy is 0 (a constant column). One
   * joint-count shuffle; marginals fold FROM the joint table.
   */
  def theilsU(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val joint = df.select(
      col(xCol).cast("string").as("x"), col(yCol).cast("string").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
    val mx = joint.groupBy(col("x")).agg(sum(col("cxy")).as("cx"))
    val my = joint.groupBy(col("y")).agg(sum(col("cxy")).as("cy"))
    val tot = joint.agg(sum(col("cxy")).as("n"))
    def marginalEntropy(m: DataFrame, cnt: String, out: String): DataFrame =
      m.crossJoin(broadcast(tot))
        .agg((-sum(round((col(cnt).cast("double") / col("n").cast("double"))
          * log(col(cnt).cast("double") / col("n").cast("double")), 9)
          .cast(dec))).cast("double").as(out))
    val hx = marginalEntropy(mx, "cx", "hx")
    val hy = marginalEntropy(my, "cy", "hy")
    val pxy = col("cxy").cast("double") / col("n").cast("double")
    val ratio = col("n").cast("double") * col("cxy").cast("double") /
      (col("cx").cast("double") * col("cy").cast("double"))
    joint
      .join(broadcast(mx), "x").join(broadcast(my), "y")
      .crossJoin(broadcast(tot))
      .agg(first(col("n")).as("n"),
        sum(round(pxy * log(ratio), 9).cast(dec)).cast("double").as("mi_raw"))
      .crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .select(col("n"),
        round(col("mi_raw"), 6).as("mi"),
        round(col("hx"), 6).as("h_x"),
        round(col("hy"), 6).as("h_y"),
        when(col("hx") > 0, round(col("mi_raw") / col("hx"), 6))
          .otherwise(lit(null).cast("double")).as("u_x_given_y"),
        when(col("hy") > 0, round(col("mi_raw") / col("hy"), 6))
          .otherwise(lit(null).cast("double")).as("u_y_given_x"))
  }

  /**
   * Spearman rank correlation — the monotone-association companion to
   * the Pearson family in `stats_corr`: rank both columns (mid-ranks
   * for ties), then Pearson over the ranks. Robust to the heavy tails
   * that swamp raw-moment correlation, which is why feature-audit
   * pipelines run it next to Pearson before trusting either.
   *
   * Determinism end-to-end INTEGER until the final division (the
   * [[mannWhitneyU]] discipline): values 6-dp-rounded, ranks are the
   * DOUBLED mid-ranks 2r(v) = 2·cum_before + n_v + 1 computed on each
   * column's DISTINCT-value histogram (the doubled form keeps tie
   * midpoints in exact integers), and every moment sum
   * (Σc·2rx, Σc·2rx², Σc·2rx·2ry, …) accumulates under DECIMAL(38,0)
   * over the JOINT (vx, vy) histogram. The ρ numerator and the two
   * variance legs are exact integers; the only doubles are the final
   * two int→double conversions, one multiply, one sqrt, one divide —
   * bit-identical cross-engine. (The doubled ranks scale both the
   * numerator and each variance leg by 4, so ρ is unchanged.)
   *
   * Scale shape: ONE keyed shuffle builds the joint histogram; the two
   * per-column rank histograms re-aggregate FROM it (never a second
   * scan of the input) and join back broadcast; ranks use the
   * [[ksTest]]/[[TextAnalysis.zipfFit]] window-over-histogram trade —
   * the unpartitioned window orders the bounded distinct-value
   * histogram, not the rows.
   */
  def spearmanCorr(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val joint = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(round(col(xCol).cast("double"), 6).as("vx"),
        round(col(yCol).cast("double"), 6).as("vy"))
      .groupBy(col("vx"), col("vy"))
      .agg(count(lit(1)).as("c"))
    def ranks(vc: String, out: String): DataFrame = {
      val w = Window.orderBy(col("v").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      joint.groupBy(col(vc).as("v")).agg(sum(col("c")).as("t"))
        .withColumn(out,
          lit(2L) * coalesce(sum(col("t")).over(w), lit(0L)) + col("t") + 1L)
        .select(col("v"), col(out))
    }
    // NOT broadcast-hinted: the rank histograms are O(distinct values)
    // — usually tiny, but a wide-range double column keeps them
    // corpus-sized, so the join strategy is left to AQE (which
    // broadcasts exactly when the runtime size is small).
    val rx = ranks("vx", "r2x")
    val ry = ranks("vy", "r2y")
    val j = joint
      .join(rx, joint("vx") === rx("v")).drop("v")
      .join(ry, joint("vy") === ry("v")).drop("v")
    val g = j.agg(
      sum(col("c")).as("n"),
      sum(col("c").cast(dec) * col("r2x")).as("sx"),
      sum(col("c").cast(dec) * col("r2y")).as("sy"),
      sum(col("c").cast(dec) * col("r2x") * col("r2x")).as("sxx"),
      sum(col("c").cast(dec) * col("r2y") * col("r2y")).as("syy"),
      sum(col("c").cast(dec) * col("r2x") * col("r2y")).as("sxy"))
    // a constant column has zero rank variance: rho is undefined (the
    // 0/0 would be engine-dependent NaN), so emit NULL — the psi /
    // theilsU degenerate-input discipline
    val vx = col("n").cast(dec) * col("sxx") - col("sx") * col("sx")
    val vy = col("n").cast(dec) * col("syy") - col("sy") * col("sy")
    g.select(col("n"),
      when(vx > 0 && vy > 0,
        round((col("n").cast(dec) * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          sqrt(vx.cast("double") * vy.cast("double")), 6))
        .otherwise(lit(null).cast("double")).as("rho"))
  }

  /**
   * 1-D Wasserstein-1 (earth mover's) distance between two samples —
   * the magnitude-aware drift metric the KS/PSI family lacks: KS caps
   * at 1 no matter HOW far the mass moved, W₁ = ∫|F_a − F_b| dx reads
   * in the value's own units (so "prices drifted by ~$40 of transport
   * per unit mass" is a direct readout).
   *
   * Determinism: values land on the 6-dp micro-unit integer grid
   * (`round(v·1e6) :: long` — the histogram discipline with the grid
   * made explicit), CDF steps are exact integer counts, and each
   * trapezoid term |cumA·nb − cumB·na|·Δvµ is an exact DECIMAL(38,0)
   * product summed exactly; the result is ONE double division of
   * bit-identical integers at the end. Scale shape: one keyed count
   * per distinct value + one ordered cumulative/lead pass over the
   * bounded value histogram (the [[ksTest]] trade) + one aggregate.
   */
  def wasserstein1(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def side(df: DataFrame, sa: Long, sb: Long): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .select(round(col(valueCol).cast("double") * lit(1e6), 0)
          .cast("long").as("vu"),
          lit(sa).as("ia"), lit(sb).as("ib"))
    val counts = side(a, 1L, 0L).unionByName(side(b, 0L, 1L))
      .groupBy(col("vu"))
      .agg(sum(col("ia")).as("ca"), sum(col("ib")).as("cb"))
    val wCum = Window.orderBy(col("vu").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.orderBy(col("vu").asc)
    val cum = counts
      .withColumn("cuma", sum(col("ca")).over(wCum))
      .withColumn("cumb", sum(col("cb")).over(wCum))
      .withColumn("nextv", lead(col("vu"), 1).over(wLead))
      .filter(col("nextv").isNotNull)
    val totals = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    // one row ALWAYS survives: the trapezoid sum is aggregated on its
    // own (a grand aggregate emits exactly one row even over the empty
    // frame) and attached to the totals row, instead of grouping the
    // trapezoid rows by (na, nb) — a single-distinct-value input (where
    // every lead(vu) is null and `cum` is empty) previously emitted
    // ZERO rows while the oracle's scalar-subquery SELECT emits one.
    // W1 of a point mass vs a point mass at the same value is
    // mathematically 0, so tsum coalesces to 0; an empty SIDE still
    // makes W1 undefined (na·nb = 0; the division would be
    // engine-dependent inf/NaN) — NULL, the psi discipline.
    val trap = cum
      .crossJoin(broadcast(totals.select(col("na").as("na2"), col("nb").as("nb2"))))
      .agg(sum(
        abs(col("cuma").cast(dec) * col("nb2") -
          col("cumb").cast(dec) * col("na2")) *
          (col("nextv") - col("vu")).cast(dec)).as("tsum"))
    totals.crossJoin(broadcast(trap))
      .select(col("na"), col("nb"),
        when(col("na") > 0 && col("nb") > 0,
          round(coalesce(col("tsum"), lit(0L).cast(dec)).cast("double") /
            (col("na").cast(dec) * col("nb")).cast("double") / lit(1e6), 6))
          .otherwise(lit(null).cast("double")).as("w1"))
  }

  /**
   * Jensen–Shannon divergence between two CATEGORICAL distributions
   * (base e): JSD = ½·KL(P‖M) + ½·KL(Q‖M), M = (P+Q)/2 — the
   * symmetric, always-finite cousin of KL that corpus-mixture audits
   * use to compare source/label composition between two snapshots
   * (zero-count categories contribute 0 on their own side instead of
   * blowing up the way raw KL does).
   *
   * Determinism: each category's log argument is ONE division of
   * exact integers — p/m = 2·ca·nb / (ca·nb + cb·na), all DECIMAL(38,0)
   * products — so the double entering `ln` is bit-identical
   * cross-engine; each term p·ln(p/m) is 9-dp-rounded and summed under
   * DECIMAL(28,12) (the [[ksTest]]-family absorb-the-ulp discipline,
   * same as `text_perplexity`'s ln handling). One keyed count + one
   * tiny aggregate; the totals ride a broadcast 1-row frame.
   */
  def jensenShannon(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    def side(df: DataFrame, sa: Long, sb: Long): DataFrame =
      df.filter(col(keyCol).isNotNull)
        .select(col(keyCol).cast("string").as("k"),
          lit(sa).as("ia"), lit(sb).as("ib"))
    val counts = side(a, 1L, 0L).unionByName(side(b, 0L, 1L))
      .groupBy(col("k"))
      .agg(sum(col("ia")).as("ca"), sum(col("ib")).as("cb"))
    val totals = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val caNb = col("ca").cast(big) * col("nb")
    val cbNa = col("cb").cast(big) * col("na")
    // the nb > 0 / na > 0 legs keep the ln argument strictly positive
    // when one SIDE is empty (a degenerate input where JSD is
    // undefined; DuckDB's ln(0) hard-errors where Spark's returns
    // null) — the psi divide-by-zero discipline
    val termP = when(col("ca") > 0 && col("nb") > 0,
      round((col("ca").cast("double") / col("na").cast("double")) *
        log((lit(2L).cast(big) * caNb).cast("double") /
          (caNb + cbNa).cast("double")), 9).cast(dec))
      .otherwise(lit(0L).cast(dec))
    val termQ = when(col("cb") > 0 && col("na") > 0,
      round((col("cb").cast("double") / col("nb").cast("double")) *
        log((lit(2L).cast(big) * cbNa).cast("double") /
          (caNb + cbNa).cast("double")), 9).cast(dec))
      .otherwise(lit(0L).cast(dec))
    // one row ALWAYS survives (the wasserstein1 shape): the per-key
    // terms are grand-aggregated on their own and attached to the
    // totals row — grouping the joined rows by (na, nb) emitted ZERO
    // rows when both inputs are empty, while the oracle's
    // scalar-subquery SELECT emits one (na/nb/jsd all NULL, n_keys 0).
    val terms = counts.crossJoin(broadcast(totals))
      .agg(count(lit(1)).as("n_keys"),
        sum(termP).as("sp"), sum(termQ).as("sq"))
    totals.crossJoin(broadcast(terms))
      .select(col("na"), col("nb"), col("n_keys"),
        round((col("sp") + col("sq")).cast("double") / 2.0d, 6)
          .as("jsd_nats"))
  }

  /**
   * Kaplan–Meier survival estimate over (duration, event) pairs — the
   * right-censoring-aware retention/lifetime curve (user churn, job
   * lifetimes, time-to-first-click): at each distinct event time t,
   * n_risk subjects remain, d_events fail, c_censored leave without
   * failing, and the product-limit estimate multiplies the survival
   * by (n−d)/n.
   *
   * The emitted curve is LOG-survival (natural log), not S(t): the
   * cumulative product is computed as a cumulative sum of
   * 9-dp-rounded ln((n−d)/n) terms under DECIMAL(28,12) — summation-
   * order-exact — and exp() is deliberately NOT applied, the same
   * libm-divergence reason [[ksTest]] leaves the asymptotic p-value
   * to the caller. Each ln argument is one division of exact integer
   * counts, bit-identical cross-engine.
   *
   * Scale shape: one keyed count per distinct 6-dp duration + two
   * ordered passes over the bounded duration histogram (the
   * [[ksTest]] window-over-histogram trade) — never a per-row window.
   */
  def kaplanMeier(
      df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val h = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .select(round(col(durationCol).cast("double"), 6).as("t"),
        when(col(eventCol).cast("boolean"), 1L).otherwise(0L).as("e"))
      .groupBy(col("t"))
      .agg(sum(col("e")).as("d_events"),
        sum(lit(1L) - col("e")).as("c_censored"))
    val wBefore = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = h.agg(
      sum(col("d_events") + col("c_censored")).as("n_total"))
    val risk = h.crossJoin(broadcast(totals))
      .withColumn("n_risk",
        col("n_total") -
          coalesce(sum(col("d_events") + col("c_censored")).over(wBefore),
            lit(0L)))
    val wCum = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // A final event time can consume every remaining subject (S(t)=0,
    // log-survival -inf): that row — necessarily the last, no subjects
    // survive past it — emits NULL log_s; its ln is never evaluated.
    risk
      .withColumn("lterm",
        when(col("d_events") > 0 && col("n_risk") > col("d_events"),
          round(log((col("n_risk") - col("d_events")).cast("double") /
            col("n_risk").cast("double")), 9).cast(dec))
          .otherwise(lit(0L).cast(dec)))
      .withColumn("log_s", sum(col("lterm")).over(wCum))
      .filter(col("d_events") > 0)
      .select(col("t"), col("n_risk"), col("d_events"), col("c_censored"),
        when(col("n_risk") === col("d_events"),
          lit(null).cast("double"))
          .otherwise(round(col("log_s").cast("double"), 6)).as("log_s"))
  }

  /**
   * Data-freshness / staleness audit per partition key — the ingest
   * SLO readout a warehouse pipeline pages on: per key, the newest and
   * oldest event time, the lag behind the table-wide watermark (the
   * global max — a source whose feed died shows a growing lag), row
   * count, and the count inside the trailing `windowHours` of the
   * watermark (a zero with a big total = the feed stopped). One keyed
   * aggregate + a broadcast 1-row watermark frame; lag arithmetic on
   * exact epoch millis.
   */
  def freshnessReport(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      windowHours: Int = 24): DataFrame = {
    require(windowHours >= 1, "windowHours must be >= 1")
    val rows = df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), unix_millis(col(tsCol)).as("ms"))
    val wm = rows.agg(max(col("ms")).as("wm_ms"))
    val winMs = windowHours * 3600000L
    rows.crossJoin(broadcast(wm))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("ms")).as("oldest_ms"),
        max(col("ms")).as("newest_ms"),
        max(col("wm_ms")).as("wm_ms"),
        sum(when(col("ms") > col("wm_ms") - lit(winMs), 1L).otherwise(0L))
          .as("n_recent"))
      .select(col("k").as(keyCol), col("n_rows"), col("oldest_ms"),
        col("newest_ms"),
        (col("wm_ms") - col("newest_ms")).as("lag_ms"),
        col("n_recent"),
        (col("n_recent") === 0L).as("stale"))
  }

  /**
   * Benjamini–Hochberg FDR control over a table of per-hypothesis
   * p-values (Benjamini & Hochberg 1995) — the multiple-testing
   * correction a metric-sweep A/B readout needs: testing 200 segments
   * at α=0.05 "discovers" ~10 false positives; BH caps the EXPECTED
   * false-discovery fraction at `qPermille`/1000 instead. Rejects
   * hypotheses ranked 1..k*, k* = max{i : p_(i) ≤ i·q/m}.
   *
   * Determinism: p-values land on the 6-dp micro-unit grid, ranks
   * break ties by key, and the step-up condition is the all-integer
   * cross-multiplication `pu·m·1000 ≤ i·qPermille·10⁶` — no float
   * boundary can flip a rejection between engines. The ordering window
   * runs over the HYPOTHESIS table — one row per tested group, bounded
   * by construction (the Welch/chi²-family output shape), never corpus
   * rows; m and k* ride 1-row broadcast frames.
   */
  def bhFdr(
      hypotheses: DataFrame,
      keyCol: String = "key",
      pCol: String = "p_value",
      qPermille: Int = 50): DataFrame = {
    require(qPermille > 0 && qPermille < 1000,
      "qPermille must be in (0, 1000)")
    val h = hypotheses
      .filter(col(pCol).isNotNull)
      .select(col(keyCol).as("key"),
        round(col(pCol).cast("double"), 6).as("p"),
        (round(col(pCol).cast("double") * 1e6, 0)).cast("long").as("pu"))
    val m = h.agg(count(lit(1)).as("m"))
    val ranked = h.crossJoin(broadcast(m))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pu").asc, col("key").asc)))
      .withColumn("elig",
        col("pu") * col("m") * lit(1000L) <=
          col("rank") * lit(qPermille.toLong) * lit(1000000L))
    val kStar = ranked.filter(col("elig"))
      .agg(coalesce(max(col("rank")), lit(0L)).as("k_star"))
    ranked.crossJoin(broadcast(kStar))
      .select(col("key").as(keyCol), col("p").as("p_value"),
        col("rank").cast("int").as("rank"), col("m"),
        (col("rank") <= col("k_star")).as("reject"))
  }
}
