package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics over the `events` table (batch side; the
 * streaming renditions live in graft.streaming.EventStreams).
 *
 * Scale notes: sessionization is one shuffle (partitionBy user) and runs
 * as a single window stage; tumbling aggregation is a plain partial+final
 * hash aggregate. Timestamps surface as epoch millis so results are
 * timezone-representation-proof across engines.
 */
object Events {

  /** events.parquet has shipped with different timestamp flavors across
    * driver versions: TIMESTAMP(NANOS) (read as long nanos under
    * `nanosAsLong`), TIMESTAMP_NTZ micros, and plain TIMESTAMP.
    * Normalize all three to a session-UTC TIMESTAMP at microsecond
    * precision so every consumer — and the DuckDB oracle, which
    * truncates ns→µs — sees identical micros. The NTZ→LTZ cast is an
    * identity on the stored micros because every entry point pins
    * `spark.sql.session.timeZone=UTC`. */
  def normalizeEventTs(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        events.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        events.withColumn(tsCol,
          col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
      case _ => events
    }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. Output is one
    * row per session with bounds and counts. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val withGap = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMinutes * 60000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withGap
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_millis(min(col("ts"))).as("session_start_ms"),
        unix_millis(max(col("ts"))).as("session_end_ms"),
        round(sum(col("value")), 4).as("total_value"))
  }

  /** Regular-grid resampling with last-value carry-forward (gap fill):
    * per user, a `stepSeconds` grid spanning [min, max] event time, each
    * grid point carrying the value of the latest event at or before it —
    * the irregular-events → regular-series step feature pipelines run
    * before windowed modeling.
    *
    * Determinism: sub-second/intra-second collisions are collapsed FIRST
    * (per (user, second) the max value wins — documented), so the
    * carried value never depends on row order; grid generation and the
    * carry-forward are integer-second arithmetic. Shape: one pre-agg
    * shuffle + one keyed window over the union of events and grid points
    * — the as-of-join-by-union trick, no range join. The per-user grid
    * size is guarded: a key whose span exceeds `maxPointsPerKey` grid
    * points fails fast (raise the step or split the key range) instead
    * of exploding an unbounded sequence. */
  def resampleLastValue(
      events: DataFrame,
      stepSeconds: Long = 3600L,
      maxPointsPerKey: Long = 100000L): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    val sec = unix_timestamp(col("ts"))
    val ev = events
      .groupBy(col("user_id"), sec.as("sec"))
      .agg(max(col("value").cast("double")).as("v"))
    val bounds = ev.groupBy(col("user_id")).agg(
      (floor(min(col("sec")) / stepSeconds) * stepSeconds).cast("long").as("t0"),
      (floor(max(col("sec")) / stepSeconds) * stepSeconds).cast("long").as("t1"))
    val nPoints = (col("t1") - col("t0")) / lit(stepSeconds) + lit(1L)
    val grid = bounds
      .withColumn("grid_sec", explode(
        when(nPoints <= maxPointsPerKey,
          sequence(col("t0"), col("t1"), lit(stepSeconds)))
          .otherwise(raise_error(concat(
            lit("resampleLastValue: key "), col("user_id").cast("string"),
            lit(" spans "), nPoints.cast("long").cast("string"),
            lit(s" grid points > maxPointsPerKey=$maxPointsPerKey - raise"
              + " stepSeconds or split the key range"))))))
      .select(col("user_id"), col("grid_sec"))
    val unioned = ev
      .select(col("user_id"), col("sec"), col("v"), lit(0).as("is_grid"))
      .unionByName(grid.select(col("user_id"), col("grid_sec").as("sec"),
        lit(null).cast("double").as("v"), lit(1).as("is_grid")))
    // events sort before grid points at the same second, so a grid point
    // sees an event landing exactly on it
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec").asc, col("is_grid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("is_grid") === 1)
      .select(col("user_id"), col("sec").as("grid_sec"), col("filled"))
  }

  /** Ordered-funnel analysis: how many users reach each step of
    * `steps`, where step i counts only users whose earliest step-i event
    * happens STRICTLY AFTER their step-(i−1) time (the classic
    * conversion funnel — view → click → purchase). Deterministic: each
    * stage is the per-user MIN event time, so no row-order dependence.
    *
    * Shape: the steps chain as k−1 equi-joins keyed on the user (each
    * stage's frame is one groupBy-min, ≤1 row per user), and the scan is
    * pruned to the funnel's event types. Per-user join fanout is the
    * user's event count of one type — data-model bounded, never a cross
    * product. Output: (step_idx, step, n_users), one row per step. */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      windowSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowSeconds.forall(_ > 0L), "windowSeconds must be positive")
    val ev = events.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol), col(typeCol), col(tsCol))
    var cur = ev.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    def stepCount(idx: Int, name: String, frame: DataFrame): DataFrame =
      frame.agg(count(lit(1)).as("n_users"))
        .select(lit(idx).as("step_idx"), lit(name).as("step"), col("n_users"))
    var out = Vector(stepCount(1, steps.head, cur))
    for ((st, i) <- steps.zipWithIndex.drop(1)) {
      val prev = cur.select(col(userCol).as("_u"), col("t").as("_pt"))
      // with a conversion window, step i must land within `windowSeconds`
      // of the user's step-(i−1) time — the product-analytics "converted
      // within a day" read; the chained per-step min keeps determinism
      val within = windowSeconds.map(ws =>
        col(tsCol) <= col("_pt") + expr(s"INTERVAL $ws seconds"))
        .getOrElse(lit(true))
      cur = ev.filter(col(typeCol) === st)
        .join(prev,
          col(userCol) === col("_u") && col(tsCol) > col("_pt") && within)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
      out :+= stepCount(i + 1, st, cur)
    }
    out.reduce(_ unionByName _)
  }

  /** Tumbling-window aggregation: events per (hour, event_type). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(
        unix_millis(date_trunc("hour", col("ts"))).as("window_start_ms"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))

  /** Sliding-window aggregation: the built-in `window(size, slide)`
    * (epoch-aligned `[start, end)` windows — the streaming-compatible
    * form: the same expression runs under `readStream` + watermark).
    * Each event expands to the constant size/slide overlapping windows
    * map-side (Spark's Expand), then ONE keyed aggregate with map-side
    * partials — the shuffle carries windows × types rows per task, not
    * events. Sums ride decimal(18,2) so the totals are order-exact. */
  def slidingCounts(
      events: DataFrame,
      sizeMinutes: Int = 10,
      slideMinutes: Int = 5): DataFrame =
    events
      .groupBy(
        window(col("ts"), s"$sizeMinutes minutes", s"$slideMinutes minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        unix_millis(col("window.end")).as("window_end_ms"),
        col("event_type"), col("n"), col("total_value"))

  /** Trending event types: top-n types per sliding window by count —
    * [[slidingCounts]] + a per-window rank. Catalyst plans the
    * rank-filter as WindowGroupLimit (partial top-n per partition
    * before the shuffle), and the ranked frame is already one row per
    * (window, type) — tiny regardless of event volume. */
  def trendingTypes(
      events: DataFrame,
      sizeMinutes: Int = 10,
      slideMinutes: Int = 5,
      n: Int = 2): DataFrame = {
    val counts = slidingCounts(events, sizeMinutes, slideMinutes)
    val w = Window.partitionBy("window_start_ms")
      .orderBy(col("n").desc, col("event_type").asc)
    counts.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
      .select(col("window_start_ms"), col("window_end_ms"),
        col("event_type"), col("n"), col("rank"))
  }

  /** Per-user running aggregates (event index + cumulative value). */
  def runningTotals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events.select(
      col("event_id"), col("user_id"),
      row_number().over(w).as("event_idx"),
      round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 4)
        .as("running_value"))
  }

  /** Sessionization via the built-in `session_window` (gap-merged
    * windows) — the declarative alternative to the lag/cumsum form that
    * also runs under Structured Streaming with a watermark. */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        col("n_events"), col("total_value"))

  /** Cohort retention matrix: users are cohorted by the period of
    * their FIRST event; each cell (cohort_period, period_offset)
    * counts the cohort's users active offset periods later — the
    * standard product-analytics retention triangle, at warehouse
    * scale. Three keyed shuffles, all on user/period keys: first-seen
    * (groupBy min), distinct per-user activity periods, and the final
    * cell count (map-side-combinable `count` — per-user activity is
    * already distinct, so no count-distinct Expand reaches the big
    * side). Periods are epoch-millis integer-divided by the period
    * length: pure integer arithmetic, engine-exact. */
  def cohortRetention(
      events: DataFrame,
      periodSeconds: Long = 7L * 86400L,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(periodSeconds > 0, "periodSeconds must be positive")
    val periodMs = periodSeconds * 1000L
    val act = events
      .select(col(userCol).as("user"), unix_millis(col(tsCol)).as("ts_ms"))
      // `div`, not `/`: Spark's `/` is always DOUBLE — integer division
      // keeps the period id exact (and identical to DuckDB's `//`)
      .select(col("user"), expr(s"ts_ms div $periodMs").as("period"))
      .distinct()
    val cohort = act.groupBy(col("user")).agg(min(col("period")).as("cohort_period"))
    act.join(cohort, Seq("user"))
      .groupBy(col("cohort_period"),
        (col("period") - col("cohort_period")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Top-N event types per user by count (rank + filter — the classic
    * grouped top-k that stays one shuffle). */
  /** Per-type z-score anomaly detection: events whose `value` sits more
    * than `zThreshold` population standard deviations from their
    * event-type mean. The per-type stats frame is |event types| rows —
    * broadcast — so the whole operator is one partial+final aggregate
    * plus a map-side join: no window, no per-key sort, scan-speed at
    * 100 TB. Types with zero variance (or a single event) can't score
    * and are skipped. Rounding: mean/stddev differ between engines only
    * in final ulps (parallel vs sequential summation), so the z-score is
    * rounded to 4 dp — far above the ~1e-12 summation noise, far below
    * any behavioral difference. */
  /** `reference`: optional frame the per-type stats come from instead of
    * `events` itself — the trained-reference-window form, and the shape
    * that makes this operator run UNCHANGED under Structured Streaming
    * (scored stream + static reference = a stateless stream-static
    * broadcast join; self-derived stats would need two passes over the
    * stream). */
  def anomalies(
      events: DataFrame,
      zThreshold: Double = 2.5,
      valueCol: String = "value",
      typeCol: String = "event_type",
      reference: Option[DataFrame] = None): DataFrame = {
    val stats = reference.getOrElse(events).groupBy(col(typeCol))
      .agg(avg(col(valueCol)).as("_mean"), stddev_pop(col(valueCol)).as("_sd"))
      .filter(col("_sd") > 0d)
    events
      .join(broadcast(stats), Seq(typeCol))
      .withColumn("z", round((col(valueCol) - col("_mean")) / col("_sd"), 4))
      .filter(abs(col("z")) > zThreshold)
      .select(col("event_id"), col(typeCol), round(col(valueCol), 4).as("value"),
        col("z"))
  }

  def topEventTypes(events: DataFrame, n: Int = 2): DataFrame = {
    val counts = events.groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("user_id").orderBy(col("cnt").desc, col("event_type").asc)
    counts.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= n)
  }

  /** First-order Markov transition matrix over per-user event streams:
    * for every observed (event_type → next event_type) step, its count
    * and the conditional probability P(next | current) — the "what do
    * users do after X" table behind path analysis, next-action
    * prediction baselines and anomaly-path audits.
    *
    * Determinism: within-user order is (ts, event_id) — the library's
    * canonical total order for event streams, so replays and
    * repartitionings yield the same successor for tied timestamps. A
    * user's LAST event has no successor and contributes no step. Shape:
    * one per-user keyed window (bounded by per-user activity) + one
    * pair-keyed aggregate; the per-type totals come from a second tiny
    * aggregate joined back (type-pair cardinality is |types|², never
    * corpus-scale), not a window. Probabilities round one double
    * division to 6 dp; counts stay integer-exact. */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val steps = events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = steps.groupBy(col("event_type")).agg(sum(col("n")).as("tot"))
    steps.join(totals, Seq("event_type"))
      .select(col("event_type"), col("next_type"), col("n"),
        round(col("n").cast("double") / col("tot").cast("double"), 6).as("p"))
  }

  /** Top-k user JOURNEY paths (funnel discovery): the most common
    * length-`n` consecutive event-type sequences across all users,
    * from each user's (ts, event_id)-ordered stream — the exploratory
    * mining step BEFORE [[funnel]] measures a chosen sequence.
    * Consecutive means adjacent in the user's stream (no gap
    * tolerance; sessionize first to bound journeys). One user-keyed
    * window (bounded partitions — a user's own events), one keyed
    * count, top-k by (count desc, path asc) — deterministic. */
  def topPaths(events: DataFrame, n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 2 && n <= 8, "path length must be in [2, 8]")
    require(k >= 1, "k must be >= 1")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val steps = (1 until n).map(i =>
      lead(col("event_type"), i).over(w).as(s"t$i"))
    val withNext = events.select(
      (col("event_type").as("t0") +: steps): _*)
      .filter((1 until n).map(i => col(s"t$i").isNotNull).reduce(_ && _))
    withNext
      .groupBy(concat_ws("->",
        (0 until n).map(i => col(s"t$i")): _*).as("path"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("path").asc)
      .limit(k)
  }

  /** Time-weighted average (TWAP) per key over an irregularly-sampled
    * value stream: each observation holds until the next one, so its
    * weight is that interval's duration — the honest mean for metrics
    * sampled on change (prices, gauge readings, queue depths), where
    * the arithmetic mean over-weights bursty periods. The last
    * observation per key has no successor and contributes no mass
    * (standard left-closed convention).
    *
    * ONE keyed shuffle: the successor lookup is a lead() under the
    * (ts, tie) total order. Determinism: values round to 6 dp and ride
    * DECIMAL, durations are exact millis, each product is decimal-exact
    * — the sum is order-free; only the final mean divides as a double.
    */
  def timeWeightedAvg(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    events
      .withColumn("_next_ms",
        unix_millis(lead(col(tsCol), 1).over(w)))
      .filter(col("_next_ms").isNotNull)
      .withColumn("_dur", col("_next_ms") - unix_millis(col(tsCol)))
      .withColumn("_wv",
        round(col(valueCol).cast("double"), 6).cast("decimal(18,6)")
          * col("_dur"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("_dur")).as("span_ms"),
        round((sum(col("_wv")).cast("double")
          / sum(col("_dur")).cast("double")), 6).as("twap"))
  }

  /**
   * OHLC bars — the resample step time-series and market-data pipelines
   * run before modeling: per (key, hour bucket), the opening value
   * (earliest event, `tieCol`-broken), high, low, closing value
   * (latest event) and the event count. Open/close ride struct
   * min/max aggregates ordered by (epoch-millis, tie, value) — pure
   * two-phase hash aggregation with map-side partials, no windows, one
   * keyed shuffle; the struct total order makes the bar deterministic
   * under any row order or partitioning.
   */
  def ohlcBars(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      tieCol: String = "event_id"): DataFrame = {
    val tagged = struct(unix_millis(col(tsCol)).as("t"),
      col(tieCol).as("e"), col(valueCol).cast("double").as("v"))
    events
      .groupBy(col(keyCol),
        unix_millis(date_trunc("hour", col(tsCol))).as("bar_start_ms"))
      .agg(
        min(tagged).getField("v").as("open"),
        max(col(valueCol).cast("double")).as("high"),
        min(col(valueCol).cast("double")).as("low"),
        max(tagged).getField("v").as("close"),
        count(lit(1)).as("n_events"))
  }

  /**
   * Exponentially-weighted moving average of each key's latest `lastN`
   * values — the smoothed per-entity level monitoring dashboards track.
   * The recursion s_t = α·x_t + (1−α)·s_{t−1} with s_1 = x_oldest
   * unrolls to the closed form
   *
   *   s = Σ_{i=1..m−1} α·(1−α)^{i−1}·x_i  +  (1−α)^{m−1}·x_m
   *
   * (x_1 newest, m = values used ≤ lastN), so the whole thing is one
   * keyed window pass + one aggregate — no recursion, no state. The
   * weight table is computed ONCE on the driver by repeated IEEE
   * multiplication and embedded as literals, so every engine running
   * the mirrored plan sees bit-identical constants ([[changePoint]]'s
   * cross-engine determinism discipline); per-term products round to
   * 9 dp and sum under DECIMAL(28,12) — order-independent, exact.
   *
   * Bounding to `lastN` is the scale contract: per-key state is O(N)
   * rows through one partition-pruned window, never a full history
   * scan per key. Keys order their events (ts, tie) descending; ties
   * break on `tieCol` so the window is total.
   */
  def ewma(
      events: DataFrame,
      alpha: Double = 0.25,
      lastN: Int = 16,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      tieCol: String = "event_id"): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, "alpha must be in (0,1)")
    require(lastN >= 1, "lastN must be >= 1")
    val pows = ewmaPows(alpha, lastN) // pows(i) = (1-alpha)^i
    def caseOn(c: Column, v: Int => Double): Column =
      (1 to lastN).foldLeft(lit(null).cast("double")) { (acc, i) =>
        when(c === i, lit(v(i))).otherwise(acc)
      }
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    events
      // null values carry no signal: without this filter a null inside
      // the last-N window consumes a rank slot and counts in n_used
      // while its term silently drops from the sum (the isNotNull
      // hygiene of mannWhitneyU/psi/bootstrapMeanCI)
      .filter(col(valueCol).isNotNull)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= lastN)
      .withColumn("_m", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .withColumn("_wt",
        when(col("_rn") === col("_m"), caseOn(col("_m"), i => pows(i - 1)))
          .otherwise(caseOn(col("_rn"), i => alpha * pows(i - 1))))
      .withColumn("_term",
        round(col(valueCol).cast("double") * col("_wt"), 9)
          .cast("decimal(28,12)"))
      .groupBy(col(keyCol))
      .agg(max(col("_m")).cast("long").as("n_used"),
        round(sum(col("_term")).cast("double"), 6).as("ewma"))
  }

  /** (1−α)^0 .. (1−α)^(n−1) by repeated multiplication — the shared
    * constant table [[ewma]] and its oracle both interpolate. */
  def ewmaPows(alpha: Double, n: Int): Array[Double] =
    Array.iterate(1.0, n)(_ * (1.0 - alpha))

  /**
   * Holt linear-trend smoothing + h-step forecast of each key's latest
   * `lastN` values — the trend companion to [[ewma]] (level-only
   * smoothing flags a drift late; Holt's trend term projects it). The
   * recursion (y_1 oldest … y_m newest, m ≤ lastN)
   *
   *   l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
   *   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1},   l_1 = y_1, b_1 = y_2−y_1
   *
   * is LINEAR in the y's, so l_m and b_m unroll to fixed coefficient
   * vectors per m — computed ONCE on the driver ([[holtCoeffs]]) and
   * embedded as literals keyed by (m, rank), exactly the [[ewma]]
   * weight-table discipline: per-term products round to 9 dp, sum under
   * DECIMAL(28,12), and the mirrored oracle interpolates the SAME
   * literals — no engine re-runs the recursion. A single-value key has
   * level = y, trend = 0. Forecast = level + `horizon`·trend over the
   * 6-dp-rounded sums (both engines compose the same rounded inputs).
   *
   * Scale contract = [[ewma]]'s: one partition-pruned per-key window
   * bounded at `lastN` rows, one aggregate; the coefficient table is
   * O(lastN²) literals in the plan, not data.
   */
  def holtForecast(
      events: DataFrame,
      alpha: Double = 0.5,
      beta: Double = 0.3,
      lastN: Int = 8,
      horizon: Int = 3,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      tieCol: String = "event_id"): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, "alpha must be in (0,1)")
    require(beta > 0.0 && beta < 1.0, "beta must be in (0,1)")
    require(lastN >= 1, "lastN must be >= 1")
    require(horizon >= 1, "horizon must be >= 1")
    val coeffs = (1 to lastN).map(m => m -> holtCoeffs(alpha, beta, m)).toMap
    // weight for (values-used m, recency rank rn): oldest-index m - rn
    def caseOn(pick: (Int, Int) => Double): Column =
      (for { m <- 1 to lastN; rn <- 1 to m } yield (m, rn))
        .foldLeft(lit(null).cast("double")) { case (acc, (m, rn)) =>
          when(col("_m") === m && col("_rn") === rn, lit(pick(m, rn)))
            .otherwise(acc)
        }
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    events
      .filter(col(valueCol).isNotNull)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= lastN)
      .withColumn("_m", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .withColumn("_tl",
        round(col(valueCol).cast("double") *
          caseOn((m, rn) => coeffs(m)._1(m - rn)), 9).cast("decimal(28,12)"))
      .withColumn("_tb",
        round(col(valueCol).cast("double") *
          caseOn((m, rn) => coeffs(m)._2(m - rn)), 9).cast("decimal(28,12)"))
      .groupBy(col(keyCol))
      .agg(max(col("_m")).cast("long").as("n_used"),
        round(sum(col("_tl")).cast("double"), 6).as("level"),
        round(sum(col("_tb")).cast("double"), 6).as("trend"))
      .withColumn("forecast",
        round(col("level") + lit(horizon.toDouble) * col("trend"), 6))
  }

  /** Coefficient vectors (c_level, c_trend) of Holt's recursion over m
    * values (index 0 = oldest): the recursion run on COEFFICIENT
    * vectors instead of values — the shared constant table
    * [[holtForecast]] and its oracle both interpolate. m = 1 degrades
    * to (level = y, trend = 0). */
  def holtCoeffs(
      alpha: Double, beta: Double, m: Int): (Array[Double], Array[Double]) = {
    if (m == 1) return (Array(1.0), Array(0.0))
    var l = Array.tabulate(m)(i => if (i == 0) 1.0 else 0.0)
    var b = Array.tabulate(m)(i =>
      if (i == 0) -1.0 else if (i == 1) 1.0 else 0.0)
    for (t <- 1 until m) {
      val lNew = Array.tabulate(m)(i =>
        (1 - alpha) * (l(i) + b(i)) + (if (i == t) alpha else 0.0))
      val bNew = Array.tabulate(m)(i =>
        beta * (lNew(i) - l(i)) + (1 - beta) * b(i))
      l = lNew; b = bNew
    }
    (l, b)
  }

  /** Seasonal-baseline rate anomalies — hourly buckets whose event
    * count clears `ratioNum/ratioDen` times their type's SAME-CLOCK-HOUR
    * baseline ([[seasonalProfile]]'s slot mean): "is this burst just
    * the daily peak" answered against the right reference (a plain
    * mean/σ monitor pages on every lunchtime spike). The flag compares
    * exact integers — cnt·n_buckets·ratioDen ≥ ratioNum·events — so no
    * float boundary flips it; the reported ratio is one 6-dp division
    * for the human read. The bucket's own count is part of its slot
    * baseline (standard for profile audits; at ~30 days of buckets one
    * slot contributes ~1/30 of its own mean). Shape: the profile
    * rollup + one (type, hod) equi-join of bucket counts against the
    * tiny slot table — broadcast, no windows. */
  def seasonalAnomalies(
      events: DataFrame,
      ratioNum: Long = 2L,
      ratioDen: Long = 1L,
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(ratioNum > 0 && ratioDen > 0, "ratio must be positive")
    val buckets = events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(typeCol), date_trunc("hour", col(tsCol)).as("b"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("hod", hour(col("b")).cast("int"))
    val slots = seasonalProfile(events, typeCol, tsCol)
      .select(col(typeCol), col("hod"), col("n_buckets"), col("events"),
        col("mean_per_bucket"))
    buckets.join(broadcast(slots), Seq(typeCol, "hod"))
      .filter(col("cnt") * col("n_buckets") * lit(ratioDen) >=
        lit(ratioNum) * col("events"))
      .select(col(typeCol), unix_millis(col("b")).as("bucket_ms"),
        col("hod"), col("cnt"), col("mean_per_bucket"),
        round(col("cnt").cast("double") / col("mean_per_bucket"), 6)
          .as("ratio"))
  }

  /**
   * Holt–Winters ADDITIVE seasonal smoothing + h-step forecast of each
   * event type's zero-densified hourly rate series — the seasonal rung
   * above [[holtForecast]]: a diurnal traffic pattern reads as trend
   * churn to plain Holt, while the seasonal term absorbs it and the
   * forecast projects level + trend + the matching clock-phase
   * seasonal. Recursion over the last `window` buckets (y_1 oldest …
   * y_m newest, m = window, s = `season`):
   *
   *   l_s = mean(y_1..y_s),  b_s = Σᵢ(y_{s+i} − y_i)/s²,
   *   sea_t = y_t − l_s (t ≤ s), then for t = s+1..m
   *   l_t = α(y_t − sea_{t−s}) + (1−α)(l_{t−1} + b_{t−1})
   *   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
   *   sea_t = γ(y_t − l_t) + (1−γ)·sea_{t−s}
   *
   * Everything is LINEAR in the y's, so level, trend and the
   * forecast-phase seasonal unroll to fixed coefficient vectors
   * ([[holtWintersCoeffs]]) — the [[holtForecast]] constant-table
   * discipline: driver-computed literals shared verbatim with the
   * oracle, 9-dp terms under DECIMAL(28,12), forecast composed from
   * the 6-dp-rounded sums. Types with fewer than `window` buckets in
   * their span emit NO row (seasonal estimation needs the full window
   * — and a single fixed m keeps the interpolated CASE table at
   * 3·window literals instead of 3·window²). Forecast = level +
   * h·trend + sea at phase m − s + ((h−1) mod s) + 1.
   *
   * Scale shape: one (type, bucket) count, the bounded per-type grid
   * densification ([[changePoint]]'s spine), one window pass bounded
   * at `window` rows per type, one aggregate.
   */
  def holtWintersForecast(
      events: DataFrame,
      alpha: Double = 0.3,
      beta: Double = 0.1,
      gamma: Double = 0.2,
      season: Int = 24,
      window: Int = 48,
      horizon: Int = 3,
      bucket: String = "hour",
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, "alpha must be in (0,1)")
    require(beta > 0.0 && beta < 1.0, "beta must be in (0,1)")
    require(gamma > 0.0 && gamma < 1.0, "gamma must be in (0,1)")
    require(season >= 2, "season must be >= 2")
    require(window >= 2 * season,
      "window must cover two seasons (level/trend/seasonal init)")
    require(horizon >= 1, "horizon must be >= 1")
    val (cl, cb, cs) =
      holtWintersCoeffs(alpha, beta, gamma, season, window, horizon)
    val bcol = date_trunc(bucket, col(tsCol))
    val counts = events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(typeCol), bcol.as("b"))
      .agg(count(lit(1)).as("cnt"))
    val grid = counts.groupBy(col(typeCol))
      .agg(min(col("b")).as("b0"), max(col("b")).as("b1"))
      .select(col(typeCol),
        explode(sequence(col("b0"), col("b1"),
          expr(s"interval 1 $bucket"))).as("b"))
    val series = grid.join(counts, Seq(typeCol, "b"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("b").desc)
    def caseOn(arr: Array[Double]): Column =
      (1 to window).foldLeft(lit(null).cast("double")) { (acc, rn) =>
        when(col("_rn") === rn, lit(arr(window - rn))).otherwise(acc)
      }
    series
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= window)
      .withColumn("_m",
        count(lit(1)).over(Window.partitionBy(col(typeCol))))
      .filter(col("_m") === window)
      .withColumn("_tl", round(col("cnt").cast("double") * caseOn(cl), 9)
        .cast("decimal(28,12)"))
      .withColumn("_tb", round(col("cnt").cast("double") * caseOn(cb), 9)
        .cast("decimal(28,12)"))
      .withColumn("_ts", round(col("cnt").cast("double") * caseOn(cs), 9)
        .cast("decimal(28,12)"))
      .groupBy(col(typeCol))
      .agg(round(sum(col("_tl")).cast("double"), 6).as("level"),
        round(sum(col("_tb")).cast("double"), 6).as("trend"),
        round(sum(col("_ts")).cast("double"), 6).as("seasonal"))
      .select(col(typeCol), lit(window.toLong).as("n_used"),
        col("level"), col("trend"), col("seasonal"),
        round(col("level") + lit(horizon.toDouble) * col("trend")
          + col("seasonal"), 6).as("forecast"))
  }

  /** Coefficient vectors (c_level, c_trend, c_seasonal-at-forecast-
    * phase) of the additive Holt–Winters recursion over m values
    * (index 0 = oldest) — the recursion run on coefficient vectors
    * instead of values; [[holtWintersForecast]] and its oracle
    * interpolate the SAME literals. */
  def holtWintersCoeffs(
      alpha: Double, beta: Double, gamma: Double,
      season: Int, m: Int, horizon: Int)
      : (Array[Double], Array[Double], Array[Double]) = {
    require(m >= 2 * season, "m must cover two seasons")
    val s = season
    var l = Array.tabulate(m)(j => if (j < s) 1.0 / s else 0.0)
    var b = Array.tabulate(m)(j =>
      if (j < s) -1.0 / (s.toDouble * s)
      else if (j < 2 * s) 1.0 / (s.toDouble * s)
      else 0.0)
    val sea = scala.collection.mutable.Map[Int, Array[Double]]()
    for (t <- 1 to s)
      sea(t) = Array.tabulate(m)(j => (if (j == t - 1) 1.0 else 0.0) - l(j))
    for (t <- s + 1 to m) {
      val lPrev = l
      val bPrev = b
      val sPrev = sea(t - s)
      val lNew = Array.tabulate(m)(j =>
        alpha * ((if (j == t - 1) 1.0 else 0.0) - sPrev(j)) +
          (1 - alpha) * (lPrev(j) + bPrev(j)))
      val bNew = Array.tabulate(m)(j =>
        beta * (lNew(j) - lPrev(j)) + (1 - beta) * bPrev(j))
      sea(t) = Array.tabulate(m)(j =>
        gamma * ((if (j == t - 1) 1.0 else 0.0) - lNew(j)) +
          (1 - gamma) * sPrev(j))
      l = lNew
      b = bNew
    }
    val tF = m - s + ((horizon - 1) % s) + 1
    (l, b, sea(tF))
  }

  /** Union of overlapping (or touching) intervals per key — the
    * gaps-and-islands coalesce: each key's `[start, end)` intervals
    * merge into maximal disjoint islands `(key, island_start,
    * island_end, n_merged)`. The canonical warehouse uses: busy
    * periods from per-event activity windows, outage windows from
    * alert intervals, coverage spans from validity ranges.
    *
    * ONE keyed shuffle: both window passes (the running max-end that
    * detects island breaks, and the island-id running sum) partition by
    * the key and order by (start, end) — Catalyst plans one Exchange
    * with a single sort. A new island starts where `start` exceeds the
    * max end seen over all PRECEDING intervals (not just the previous
    * one — an engulfing interval must not split its successors).
    * Per-key state is bounded by that key's interval count. */
  def mergeIntervals(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol).asc, col(endCol).asc)
    val prevMaxEnd = max(col(endCol)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    df.select(col(keyCol), col(startCol), col(endCol))
      .withColumn("_new",
        when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("_island", sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("_island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_merged"))
      .drop("_island")
  }

  /** Autocorrelation of the per-type bucketed event-rate series at lags
    * 1..`maxLag` — the seasonality/burstiness readout run before
    * choosing a forecast window ([[holtForecast]]) or an anomaly
    * baseline ([[anomalies]]): acf(k) = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)².
    *
    * Series densified over the type's own span exactly like
    * [[changePoint]] (gaps are zero counts, not missing rows).
    * Determinism: deviations are doubles from exact-integer operands
    * (one division each), every product 9-dp-rounded and summed under
    * DECIMAL(38,12) — summation-order-exact; the acf division is one
    * IEEE op; constant series (zero denominator) emit NULL. Shape: one
    * keyed count, one bounded per-type window for the lags, one keyed
    * aggregate, posexplode of the maxLag-wide row into (lag, acf) rows. */
  def acfByType(
      events: DataFrame,
      maxLag: Int = 3,
      bucket: String = "hour",
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(maxLag >= 1 && maxLag <= 24, "maxLag must be in [1, 24]")
    val dec = org.apache.spark.sql.types.DecimalType(38, 12)
    val b = date_trunc(bucket, col(tsCol))
    val counts = events
      .groupBy(col(typeCol), b.as("b"))
      .agg(count(lit(1)).as("cnt"))
    val span = counts.groupBy(col(typeCol))
      .agg(min(col("b")).as("b0"), max(col("b")).as("b1"))
    val grid = span.select(col(typeCol),
      explode(sequence(col("b0"), col("b1"),
        expr(s"interval 1 $bucket"))).as("b"))
    val series = grid.join(counts, Seq(typeCol, "b"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val stats = series.groupBy(col(typeCol))
      .agg(count(lit(1)).as("m"), sum(col("cnt")).as("s"))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("b").asc)
    val lagged = series.select(
      col(typeCol) +: col("cnt") +:
        (1 to maxLag).map(k =>
          lead(col("cnt"), k).over(w).as(s"lead$k")): _*)
    val mean = col("s").cast("double") / col("m").cast("double")
    val dev = col("cnt").cast("double") - mean
    val aggd = lagged.join(stats, Seq(typeCol))
      .groupBy(col(typeCol), col("m"))
      .agg(sum(round(dev * dev, 9).cast(dec)).as("den"),
        (1 to maxLag).map(k =>
          sum(when(col(s"lead$k").isNotNull,
            round(dev * (col(s"lead$k").cast("double") - mean), 9)
              .cast(dec)).otherwise(lit(0L).cast(dec))).as(s"num$k")): _*)
    aggd
      .select(col(typeCol), col("m"), col("den"),
        posexplode(array((1 to maxLag).map(k => col(s"num$k")): _*))
          .as(Seq("pos", "num")))
      .select(col(typeCol), (col("pos") + 1).cast("int").as("lag"), col("m"),
        when(col("den") > 0,
          round(col("num").cast("double") / col("den").cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("acf"))
  }

  /** Median-absolute-deviation anomaly flags (the Iglewicz–Hoaglin
    * modified z-score 0.6745·|x − med| / MAD > threshold) — the ROBUST
    * sibling of [[anomalies]]'s mean/σ z-score: one fat-tailed burst
    * inflates σ and masks itself, while the median/MAD baseline barely
    * moves. Emits the flagged events with their modified z.
    *
    * Both medians are LOWER-median order statistics (k = ⌈n/2⌉) read
    * off 6-dp value histograms' cumulative counts — the
    * [[Quality.conformalThreshold]] shape, partitioned by type; never a
    * per-row sort. Every residual is one subtraction of 6-dp doubles
    * re-rounded to 6 dp, the z chain single IEEE ops with the 0.6745
    * consistency constant mirrored verbatim in the oracle. A type whose
    * MAD is 0 (over half its values identical) emits no flags — the
    * standard MAD degeneracy, left to the caller's fallback. Shape: two
    * keyed histogram passes + two histogram joins + one per-row filter. */
  def anomaliesMad(
      events: DataFrame,
      typeCol: String = "event_type",
      valueCol: String = "value",
      idCol: String = "event_id",
      threshold: Double = 3.5): DataFrame = {
    def medianOf(df: DataFrame, out: String): DataFrame = {
      val h = df.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
      val ks = h.groupBy(col("g")).agg(sum(col("c")).as("n"))
        .withColumn("k",
          floor((col("n") + 1L).cast("double") / 2.0d).cast("long"))
      val w = Window.partitionBy(col("g")).orderBy(col("v").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      h.withColumn("cum", sum(col("c")).over(w))
        .join(ks.select(col("g"), col("k")), Seq("g"))
        .filter(col("cum") >= col("k"))
        .groupBy(col("g")).agg(min(col("v")).as(out))
    }
    val ev = events
      .filter(col(typeCol).isNotNull && col(valueCol).isNotNull)
      .select(col(typeCol).as("g"), col(idCol).as("id"),
        round(col(valueCol).cast("double"), 6).as("v"))
    val med = medianOf(ev.select(col("g"), col("v")), "med")
    val resid = ev.join(med, Seq("g"))
      .withColumn("r", round(abs(col("v") - col("med")), 6))
    val mad = medianOf(resid.select(col("g"), col("r").as("v")), "mad")
    resid.join(mad, Seq("g"))
      .filter(col("mad") > 0)
      .withColumn("mod_z",
        round(lit(0.6745d) * col("r") / col("mad"), 6))
      .filter(col("mod_z") > threshold)
      .select(col("id").as(idCol), col("g").as(typeCol), col("v"),
        col("med"), col("mod_z"))
  }

  /** Single change-point detection per event type over its bucketed
    * rate series (binary segmentation, one split — the level-shift
    * audit behind "did traffic for X step up/down, and when"): bucket
    * the stream into fixed windows, then pick the split k maximizing
    * the between-segment sum of squares of the count series. For a
    * series of m buckets with total T and prefix sum C_k, that
    * objective reduces to the INTEGER rational
    * `G(k) = (C_k·m − k·T)² / (k·(m−k)·m)` — numerator and denominator
    * are exact BIGINTs, so the only floating-point op is one IEEE
    * division, bit-identical cross-engine (the priority-sampling
    * precedent). Ties break toward the earliest split.
    *
    * EMPTY buckets inside a type's span count as zero: the series is
    * densified against the type's own [first, last] bucket range via a
    * per-type sequence (range/bucket is bounded — the resample-grid
    * contract), so a gap reads as a rate drop, not as a missing row.
    * Shape: one (type, bucket)-keyed count, one bounded per-type
    * window pass for prefix sums, one `max_by` argmax aggregate —
    * never a corpus-scale window. Output per type: the best split's
    * bucket start, its G statistic, and the 6-dp mean rates on each
    * side. Types with m < 2 buckets yield no row. */
  def changePoint(
      events: DataFrame,
      bucket: String = "hour",
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val b = date_trunc(bucket, col(tsCol))
    val counts = events
      .groupBy(col(typeCol), b.as("b"))
      .agg(count(lit(1)).as("cnt"))
    // densify: every bucket in the type's own span, zeros filled in
    val span = counts.groupBy(col(typeCol))
      .agg(min(col("b")).as("b0"), max(col("b")).as("b1"))
    val grid = span.select(col(typeCol),
      explode(sequence(col("b0"), col("b1"),
        expr(s"interval 1 $bucket"))).as("b"))
    val series = grid.join(counts, Seq(typeCol.toString, "b"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("b").asc)
    val cum = series
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("c", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = cum.groupBy(col(typeCol))
      .agg(max(col("k")).as("m"), max(col("c")).as("t"))
    // dNum and its square stay EXACT in decimal(38,0): the bigint
    // square overflows past |dNum| ~ 3e9 (total-events-per-type ×
    // buckets reaches that at scale), while the decimal form is exact
    // to 1e38 — the oracle mirrors with HUGEINT, so the single final
    // double division still sees identical integer operands.
    val dNum = (col("c").cast("decimal(19,0)") * col("m") -
      col("k") * col("t").cast("decimal(19,0)")).cast("decimal(38,0)")
    val g = (dNum * dNum).cast("double") /
      (col("k") * (col("m") - col("k")) * col("m")).cast("double")
    cum.join(tot, Seq(typeCol.toString))
      .filter(col("k") < col("m")) // splits leave both segments non-empty
      .select(col(typeCol), col("m"), col("t"), col("k"), col("b"),
        g.as("g"), col("c"))
      .groupBy(col(typeCol))
      // argmax by (G, earliest k): struct max compares fields in order
      .agg(max_by(
        struct(col("k"), col("b"), col("g"), col("c"), col("m"), col("t")),
        struct(col("g"), (-col("k")).as("nk"))).as("best"))
      .select(col(typeCol),
        col("best.m").as("n_buckets"),
        col("best.k").as("split_k"),
        unix_millis(col("best.b")).as("split_bucket_ms"),
        round(col("best.g"), 6).as("g_stat"),
        round(col("best.c").cast("double") / col("best.k").cast("double"), 6)
          .as("mean_before"),
        round((col("best.t") - col("best.c")).cast("double")
          / (col("best.m") - col("best.k")).cast("double"), 6).as("mean_after"))
  }

  /**
   * Percentile bands per (type, hour bucket) — the latency-SLO
   * dashboard read (p50/p90/p99 per service per hour): exact
   * `percentile` per group (group size is one type-hour's events —
   * data-model bounded; at extreme cardinality swap `percentile_approx`
   * under the error-contract pattern). One keyed aggregate, map-side
   * partials; values round to 6 dp for engine-stable interpolation.
   */
  def latencyBands(
      events: DataFrame,
      typeCol: String = "event_type",
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    events
      .groupBy(col(typeCol),
        unix_millis(date_trunc("hour", col(tsCol))).as("bar_start_ms"))
      .agg(
        count(lit(1)).as("n"),
        round(percentile(col(valueCol), lit(0.5)), 6).as("p50"),
        round(percentile(col(valueCol), lit(0.9)), 6).as("p90"),
        round(percentile(col(valueCol), lit(0.99)), 6).as("p99"))

  /**
   * CUSUM drift monitor per event type over the bucketed rate series —
   * the RUN-accumulating companion to [[changePoint]]'s single split:
   * a slow sustained rate creep that no single bucket flags still
   * accumulates in the cumulative sums. Statistic in exact integers:
   * with m buckets, total T and prefix counts c_k, the m-scaled
   * deviation from the uniform-rate line is D_k = m·c_k − k·T
   * ([[changePoint]]'s dNum); the upward CUSUM is
   * max_k (D_k − min_{j≤k} D_j) and the downward one mirrors it —
   * reported ÷m as average-events-per-bucket units, with each side's
   * peak bucket (earliest tie). D_k stays DECIMAL(38,0)-exact (the
   * BIGINT form overflows at scale), so the only doubles are the two
   * final divisions.
   *
   * Shape: the same densified per-type series as [[changePoint]]
   * (grid bounded by the resample-grid contract), ONE type-keyed
   * Exchange under three window passes, one argmax aggregate.
   */
  def cusum(
      events: DataFrame,
      bucket: String = "hour",
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val b = date_trunc(bucket, col(tsCol))
    val counts = events
      .groupBy(col(typeCol), b.as("b"))
      .agg(count(lit(1)).as("cnt"))
    val span = counts.groupBy(col(typeCol))
      .agg(min(col("b")).as("b0"), max(col("b")).as("b1"))
    val grid = span.select(col(typeCol),
      explode(sequence(col("b0"), col("b1"),
        expr(s"interval 1 $bucket"))).as("b"))
    val series = grid.join(counts, Seq(typeCol.toString, "b"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("b").asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = series
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("c", sum(col("cnt")).over(wRun))
    val tot = cum.groupBy(col(typeCol))
      .agg(max(col("k")).as("m"), max(col("c")).as("t"))
    val d = (col("c").cast("decimal(19,0)") * col("m") -
      col("k") * col("t").cast("decimal(19,0)")).cast("decimal(38,0)")
    val dev = cum.join(tot, Seq(typeCol.toString))
      .withColumn("d", d)
      .withColumn("up", col("d") - min(col("d")).over(wRun))
      .withColumn("dn", max(col("d")).over(wRun) - col("d"))
    dev.groupBy(col(typeCol))
      .agg(
        max(col("m")).as("n_buckets"), max(col("t")).as("total"),
        max_by(struct(col("b")), struct(col("up"), (-col("k")).as("nk")))
          .as("bu"),
        max(col("up")).as("cu"),
        max_by(struct(col("b")), struct(col("dn"), (-col("k")).as("nk")))
          .as("bd"),
        max(col("dn")).as("cd"))
      .select(col(typeCol), col("n_buckets"), col("total"),
        round(col("cu").cast("double") / col("n_buckets").cast("double"), 6)
          .as("cusum_up"),
        unix_millis(col("bu.b")).as("up_peak_ms"),
        round(col("cd").cast("double") / col("n_buckets").cast("double"), 6)
          .as("cusum_down"),
        unix_millis(col("bd.b")).as("down_peak_ms"))
  }

  /** Hour-of-day seasonal profile per event type — the diurnal-shape
    * readout behind capacity planning and "is this burst just the
    * daily peak" triage: events bucket to hours, hourly counts roll up
    * by clock hour (0..23), and each (type, hour-of-day) slot reports
    * its bucket count, event total, 6-dp mean events/bucket, and its
    * share of the type's total mass. The residual read is one
    * subtraction away (observed bucket − slot mean), and subtracting
    * the profile from the series is the additive seasonal-adjustment
    * step of a classical decomposition.
    *
    * Shape: one (type, hour-bucket) count, one (type, hour-of-day)
    * rollup, type totals as a tiny broadcast — no windows anywhere.
    * Share is one fixed-order double division of exact longs. */
  def seasonalProfile(
      events: DataFrame,
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val buckets = events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(typeCol), date_trunc("hour", col(tsCol)).as("b"))
      .agg(count(lit(1)).as("cnt"))
    val slots = buckets
      .groupBy(col(typeCol), hour(col("b")).as("hod"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("cnt")).as("events"))
    val totals = slots.groupBy(col(typeCol))
      .agg(sum(col("events")).as("total"))
    slots.join(broadcast(totals), Seq(typeCol.toString))
      .select(col(typeCol), col("hod").cast("int").as("hod"),
        col("n_buckets"), col("events"),
        round(col("events").cast("double")
          / col("n_buckets").cast("double"), 6).as("mean_per_bucket"),
        round(col("events").cast("double")
          / col("total").cast("double"), 6).as("share"))
  }
}
