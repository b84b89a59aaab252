package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery}
import org.apache.spark.sql.types.StructType

/**
 * Structured Streaming renditions of the event analytics. The reference is
 * batch-only (SURVEY.md §2.8), so this is pure extension surface: the same
 * windowed aggregation expressed once and bound to either a batch or a
 * streaming source — `readStream` → watermark → windowed agg → sink.
 *
 * The watermark bounds state: at production scale the 1h-window agg keeps
 * only (watermark horizon / window) panes per key in the state store, and
 * `dropDuplicates` state is similarly pruned by event-time.
 */
object EventStreams {

  /** The shared transform: 1-hour tumbling windows per event_type.
    * Works on a batch OR streaming DataFrame — same plan either way. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("total_value"))

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserAgg(user_id: Long, n: Long, total: Double)

  /** Custom state via `mapGroupsWithState`: per-user running (count, sum)
    * that persists across micro-batches (update mode). Also runs in batch
    * — same code path, state folds within the single batch. */
  def runningUserAgg(ds: Dataset[UserEvent]): Dataset[UserAgg] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, events: Iterator[UserEvent], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0))
          val agg = events.foldLeft(prev)((a, e) => UserAgg(uid, a.n + 1, a.total + e.value))
          state.update(agg)
          agg
      }
  }

  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessState(start_ms: Long, end_ms: Long, n: Long, total: Double)
  final case class ClosedSession(
      user_id: Long, session_start_ms: Long, session_end_ms: Long,
      n_events: Long, total_value: Double)

  /** Gap-based sessionization as a STREAM — the custom-state counterpart
    * of `Events.sessionize`: sessions accumulate in `GroupState`, merge
    * with in-gap events across micro-batches (late data within the
    * watermark re-opens bounds), and CLOSE — emit — when the event-time
    * timeout fires one gap after the session's last event. Emission is
    * append-mode (each session exactly once), so downstream sinks never
    * see retractions; state per user is one fixed-size session record,
    * pruned on close — bounded by active users regardless of history
    * length. */
  def sessionizeStream(
      events: Dataset[SessEvent],
      gapMinutes: Int = 30): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              ClosedSession(uid, s.start_ms, s.end_ms, s.n, s.total))
          } else {
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end_ms <= gapMs =>
                  cur = Some(SessState(math.min(t, s.start_ms),
                    math.max(t, s.end_ms), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= ClosedSession(uid, s.start_ms, s.end_ms, s.n, s.total)
                  cur = Some(SessState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout one gap after the last event; a timeout in the
              // event-time past is illegal, so clamp past the watermark
              state.setTimeoutTimestamp(
                math.max(s.end_ms + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /** STREAM-STATIC join surface: filter a streaming corpus against a
    * static exact-fingerprint blocklist (the incremental-ingest form of
    * exact decontamination — documents arriving on the stream whose
    * normalized-text md5 appears in the published blocklist are dropped
    * before they reach the training store). The static side is a plain
    * batch frame: Spark re-plans it per micro-batch, broadcasts it when
    * small (the blocklist case), and the join needs NO watermark or
    * state store — the stateless stream-static shape. `left_anti` keeps
    * clean documents; flip to `left_semi` to audit what was blocked. */
  def filterBlocklistStream(
      docs: DataFrame,
      blocklist: DataFrame,
      joinType: String = "left_anti",
      textCol: String = "text",
      fpCol: String = "fingerprint"): DataFrame =
    docs
      .withColumn("_fp", graft.functions.TextFunctions.md5Fingerprint(col(textCol)))
      .join(blocklist.select(col(fpCol).as("_fp")), Seq("_fp"), joinType)
      .drop("_fp")

  /** CONTINUOUS-INGEST dedup as a SELF-MAINTAINING stream — the
    * streaming rendition of the [[graft.operators.Dedup.writeFpIndex]]
    * lifecycle (where [[filterBlocklistStream]] filters against a
    * STATIC list, this one grows its own history): every micro-batch
    * runs [[graft.operators.Dedup.incrementalExact]] against the
    * bucketed on-disk fingerprint index and appends its own output
    * delta back with the same bucket spec, so a duplicate arriving in
    * micro-batch N of a document first seen in batch 1 collapses —
    * across batches and across restarts (the index is durable).
    *
    * `foreachBatch` — not `mapGroupsWithState` — because the history
    * does not belong in the state store: at 100 TB the fingerprint set
    * is index-scale, and the whole point of the bucketed table is that
    * the per-batch anti-join co-locates against it with zero history
    * movement. State stores hold watermark-bounded windows; unbounded
    * ingest history lives as a TABLE.
    *
    * Delivery contract: at-least-once batch replays are fp-idempotent —
    * re-appending a fingerprint only makes the anti-join drop MORE,
    * never resurrects a duplicate; a replayed batch's delta is empty
    * because its own first run's append already covers it.
    *
    * Two delta-consumption surfaces, with DIFFERENT replay guarantees:
    *
    *  - `sink` receives each batch's delta (fp, keep_id, n_batch) AFTER
    *    it is durably appended; consume it eagerly — its backing
    *    scratch table is dropped when the callback returns. The
    *    callback is AT-MOST-ONCE under replay: a crash after the
    *    history append but before the callback means the replayed
    *    batch's recomputed delta is EMPTY (its fps already sit in the
    *    index), so that batch's rows never reach the callback again.
    *  - `deltaTable` (when set) is the AT-LEAST-ONCE durable delta log:
    *    each batch's delta rows append as (fp, keep_id, n_batch,
    *    batch_id) BEFORE the history append, so no crash point loses
    *    them. A crash between the two appends replays the identical
    *    delta once more — byte-identical rows under the same batch_id —
    *    so consumers read `SELECT DISTINCT` (or dedup on (batch_id,
    *    fp)). Downstream systems that must not lose deltas read this
    *    table, not the callback. */
  def incrementalDedupStream(
      docs: DataFrame,
      table: String,
      buckets: Int = 32,
      idCol: String = "doc_id",
      textCol: String = "text",
      sink: (DataFrame, Long) => Unit = (_, _) => (),
      deltaTable: Option[String] = None): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processDedupBatch(batch, table, buckets, idCol, textCol,
          deltaTable, batchId, sink)
      }
      .start()

  /** The per-micro-batch body of [[incrementalDedupStream]], shared
    * with the batch-replay driver [[replayIncrementalDedup]] so the
    * gate query and the spec exercise the EXACT code the stream runs.
    * Order matters for the replay contract (see the stream scaladoc):
    * durable delta append FIRST, then the history append, then the
    * eager callback. */
  private[graft] def processDedupBatch(
      batch: DataFrame,
      table: String,
      buckets: Int,
      idCol: String,
      textCol: String,
      deltaTable: Option[String],
      batchId: Long,
      sink: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val delta = graft.operators.Dedup.incrementalExact(
      batch, graft.operators.Dedup.loadFpIndex(spark, table),
      idCol, textCol)
    // pin (or scratch past the Pin gate) BEFORE appending: the delta's
    // plan reads the very table the append mutates; a pinned
    // micro-batch-sized delta also appends from one task instead of
    // leaf-node parallelism
    val (mat0, path) = graft.ops.Pin.stateAt(delta, "stream_dedup_delta")
    val mat = if (path == null) mat0.coalesce(1) else mat0
    deltaTable.foreach { dt =>
      mat.withColumn("batch_id", lit(batchId))
        .write.mode("append").format("parquet").saveAsTable(dt)
    }
    mat.select(col("fp")).write.mode("append")
      .bucketBy(buckets, "fp").sortBy("fp").format("parquet")
      .saveAsTable(table)
    sink(mat, batchId)
    graft.ops.Scratch.drop(spark, path)
    ()
  }

  /** DETERMINISTIC batch replay of the [[incrementalDedupStream]] loop —
    * the correctness-gate surface for the streaming path: feed the
    * given frames through [[processDedupBatch]] in order (batch N sees
    * the history index as batches 0..N-1 left it, exactly like the
    * stream's micro-batches) and return the durable delta log. The
    * caller owns table lifecycle: `table` must exist as a
    * [[graft.operators.Dedup.writeFpIndex]]-shaped index (seed it
    * empty for a from-scratch run) and `deltaTable` as an empty
    * parquet table. Value-identity with the REAL MemoryStream run is
    * spec-proven in DedupStreamSpec; identity with the one-shot batch
    * [[graft.operators.Dedup.incrementalExact]] semantics is
    * oracle-gated (`dedup_stream_replay`). */
  def replayIncrementalDedup(
      batches: Seq[DataFrame],
      table: String,
      deltaTable: String,
      buckets: Int = 32,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(batches.nonEmpty, "replayIncrementalDedup: no batches")
    val spark = batches.head.sparkSession
    batches.zipWithIndex.foreach { case (b, i) =>
      processDedupBatch(b, table, buckets, idCol, textCol,
        Some(deltaTable), i.toLong, (_, _) => ())
    }
    spark.table(deltaTable)
  }

  // ==== incremental sessionization over a persisted open-sessions table ====

  /** Seed the two tables the incremental-sessionize loop maintains:
    * `openTable` (one row per still-open session: user_id, start_ms,
    * end_ms, n_events, total_raw) and `closedTable` (the append-only
    * closed-session log, + batch_id). Both are EXTERNAL parquet tables
    * on caller-supplied fresh paths — a managed table's warehouse dir
    * would orphan across killed JVMs and fail the next run's create
    * (the dedup-gate lesson, SparkEntry `dedup_stream_replay`). */
  def seedSessionTables(
      spark: SparkSession,
      openTable: String,
      closedTable: String,
      openPath: String,
      closedPath: String): Unit = {
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS $openTable")
    Seq.empty[(Long, Long, Long, Long, Double)]
      .toDF("user_id", "start_ms", "end_ms", "n_events", "total_raw")
      .write.option("path", openPath).format("parquet")
      .saveAsTable(openTable)
    spark.sql(s"DROP TABLE IF EXISTS $closedTable")
    Seq.empty[(Long, Long, Long, Long, Double, Long)]
      .toDF("user_id", "session_start_ms", "session_end_ms",
        "n_events", "total_raw", "batch_id")
      .write.option("path", closedPath).format("parquet")
      .saveAsTable(closedTable)
  }

  /** CONTINUOUS-INGEST sessionization as a self-maintaining stream —
    * the [[incrementalDedupStream]] shape applied to gap-based
    * sessions: the open-session frontier lives in a persisted TABLE
    * (not the state store), every micro-batch merges its events into
    * that frontier with the same gap rule the batch
    * [[graft.operators.Events.sessionize]] applies, closes every
    * session no future event can extend, and writes the rest back.
    *
    * Why a table and not `flatMapGroupsWithState`
    * ([[sessionizeStream]] above): the state store bounds state by
    * ACTIVE keys inside the watermark, which is right for exactly-once
    * session emission but couples the frontier's lifetime to one
    * query's checkpoint. The table form makes the frontier a first-
    * class dataset — restartable from any reader, auditable, and
    * mergeable into downstream batch jobs — which is the shape a
    * 100 TB log pipeline actually operates (the frontier is bounded by
    * concurrently-active users, orders of magnitude below the log).
    *
    * Correctness contract: micro-batches must partition the stream in
    * event-time order (batch N's min ts ≥ batch N-1's max ts — what a
    * log ingest with bounded disorder provides after its staging sort;
    * in-batch order is free). Under that contract a session CLOSES
    * when `end_ms + gap < batch max ts` (strict, so a boundary-tie
    * event in the next batch at exactly end + gap still merges):
    * every unseen event has ts ≥ that watermark, so none can land
    * within the gap — closure is exact, not heuristic. The closed log then equals the one-shot
    * batch sessionize output, which is what the `ev_session_stream_
    * replay` gate hash-checks against the DuckDB oracle.
    *
    * Crash/replay: the closed append (keyed by batch_id) runs BEFORE
    * the frontier replacement, so a crash between them replays the
    * batch against the OLD frontier and re-appends byte-identical rows
    * under the same batch_id — consumers dedup on (batch_id, user_id,
    * session_start_ms), i.e. at-least-once on the log, exactly-once
    * after the keyed dedup. Superseded frontier dirs are retired by
    * the scratch lifecycle. */
  def sessionizeIncrementalStream(
      events: DataFrame,
      openTable: String,
      closedTable: String,
      gapMinutes: Int = 30): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processSessionBatch(batch, openTable, closedTable,
          gapMinutes * 60000L, batchId)
      }
      .start()

  /** The per-micro-batch body of [[sessionizeIncrementalStream]],
    * shared with [[replaySessionize]] so gate and spec exercise the
    * exact code the stream runs. One keyed window + one keyed agg per
    * batch over (frontier ∪ batch) — batch-sized work; the frontier
    * side is one row per open session. */
  private[graft] def processSessionBatch(
      batch: DataFrame,
      openTable: String,
      closedTable: String,
      gapMs: Long,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.expressions.Window
    val open = spark.table(openTable)
    val asIntervals = batch.select(
      col("user_id"),
      unix_millis(col("ts")).as("start_ms"),
      unix_millis(col("ts")).as("end_ms"),
      lit(1L).as("n_events"),
      col("value").as("total_raw"))
    // merge-intervals-with-gap per user: prev_end is the RUNNING MAX of
    // earlier interval ends (the frontier row is an interval, events
    // are points), so the rule degrades to the batch sessionizer's
    // lag(ts) on pure points and still merges correctly against the
    // carried-in open session
    val w = Window.partitionBy("user_id")
      .orderBy(col("start_ms"), col("end_ms"))
    val merged = open
      .select("user_id", "start_ms", "end_ms", "n_events", "total_raw")
      .unionByName(asIntervals)
      .withColumn("prev_end",
        max(col("end_ms")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_session",
        when(col("prev_end").isNull ||
          col("start_ms") - col("prev_end") > gapMs, 1L).otherwise(0L))
      .withColumn("seq",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("seq"))
      .agg(
        min("start_ms").as("start_ms"), max("end_ms").as("end_ms"),
        sum("n_events").as("n_events"), sum("total_raw").as("total_raw"))
    // the batch watermark: its max event time. A grouping-free (1-row)
    // aggregate — broadcast-attach, bounded by plan shape. An EMPTY
    // batch yields a null watermark; `<=` null is null → nothing closes.
    val wmRow = broadcast(batch.agg(
      max(unix_millis(col("ts"))).as("graft_wm_ms")))
    // coalesce: the empty-batch null watermark must read "closes
    // nothing", not null — a bare null predicate would fail BOTH the
    // closed filter and its negation and silently wipe the frontier.
    // STRICT <: the ordering contract allows a tie at the batch
    // boundary (next batch's min ts == this batch's max), and an event
    // at exactly end + gap still merges under the gap rule — closing
    // at equality would split that session; under < it waits one batch
    // and closes correctly
    val scored = merged.crossJoin(wmRow)
      .withColumn("closed", coalesce(
        col("end_ms") + lit(gapMs) < col("graft_wm_ms"), lit(false)))
    // pin (or scratch past the Pin gate) before mutating either table
    // the plan reads; frontier-and-batch state is gap-horizon-bounded
    // by the sessionization contract. A pinned state writes its two
    // tiny outputs from one task each (a local scan defaults to
    // leaf-node parallelism — 32 near-empty files per micro-batch).
    val (mat0, path) = graft.ops.Pin.stateAt(scored, "session_state")
    val mat = if (path == null) mat0.coalesce(1) else mat0
    mat.filter(col("closed"))
      .select(col("user_id"), col("start_ms").as("session_start_ms"),
        col("end_ms").as("session_end_ms"), col("n_events"),
        col("total_raw"), lit(batchId).as("batch_id"))
      .write.mode("append").format("parquet").saveAsTable(closedTable)
    replaceTableAt(spark,
      mat.filter(!col("closed"))
        .select("user_id", "start_ms", "end_ms", "n_events", "total_raw"),
      openTable, "open_sessions")
    graft.ops.Scratch.drop(spark, path)
    ()
  }

  /** Swap a state table's contents to `df`'s rows: write a fresh
    * scratch snapshot, then re-point the table at it (drop + external
    * create keeps the catalog schema explicit even for an empty
    * state). `df` must not read `table` — callers pass a materialized
    * scan. Superseded state dirs are retired by the scratch
    * lifecycle. */
  private def replaceTableAt(
      spark: SparkSession, df: DataFrame, table: String,
      prefix: String): Unit = {
    val newPath = graft.ops.Scratch.dir(
      spark.conf.getOption("spark.graft.scratchDir"), prefix)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.option("path", newPath).format("parquet").saveAsTable(table)
  }

  /** Close EVERY still-open session (end-of-stream / end-of-replay
    * flush) into the closed log under `batchId`, leaving an empty
    * frontier. */
  def flushOpenSessions(
      spark: SparkSession,
      openTable: String,
      closedTable: String,
      batchId: Long): Unit = {
    val (mat, path) = graft.ops.Scratch.materializeAt(
      spark.table(openTable), "session_flush")
    mat.select(col("user_id"), col("start_ms").as("session_start_ms"),
        col("end_ms").as("session_end_ms"), col("n_events"),
        col("total_raw"), lit(batchId).as("batch_id"))
      .write.mode("append").format("parquet").saveAsTable(closedTable)
    replaceTableAt(spark, mat.limit(0)
      .select("user_id", "start_ms", "end_ms", "n_events", "total_raw"),
      openTable, "open_sessions")
    graft.ops.Scratch.drop(spark, path)
  }

  /** DETERMINISTIC batch replay of [[sessionizeIncrementalStream]] —
    * the correctness-gate surface: run the given event-time-ordered
    * frames through [[processSessionBatch]] in order, flush the
    * frontier, and return the closed-session log. The caller seeds the
    * tables ([[seedSessionTables]]). Value-identity with the one-shot
    * batch [[graft.operators.Events.sessionize]] is oracle-gated
    * (`ev_session_stream_replay`); identity with the real MemoryStream
    * run is spec-proven (IncrementalSessionSpec). */
  def replaySessionize(
      batches: Seq[DataFrame],
      openTable: String,
      closedTable: String,
      gapMinutes: Int = 30,
      flush: Boolean = true): DataFrame = {
    require(batches.nonEmpty, "replaySessionize: no batches")
    val spark = batches.head.sparkSession
    val gapMs = gapMinutes * 60000L
    batches.zipWithIndex.foreach { case (b, i) =>
      processSessionBatch(b, openTable, closedTable, gapMs, i.toLong)
    }
    if (flush)
      flushOpenSessions(spark, openTable, closedTable, batches.size.toLong)
    spark.table(closedTable)
  }

  // ==== incremental attribution over a persisted live-views table ====

  /** Seed the attribution loop's tables: the live-view state (views
    * still inside the click horizon, with a matched flag) and the
    * attribution log (matched pairs + null-click rows for views that
    * expired unconverted — the LEFT-OUTER output shape). External
    * parquet on caller paths, like the other loops. */
  def seedAttributionTables(
      spark: SparkSession,
      viewsTable: String,
      logTable: String,
      viewsPath: String,
      logPath: String): Unit = {
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS $viewsTable")
    Seq.empty[(Long, Long, Long, Boolean)]
      .toDF("user_id", "view_id", "view_ms", "matched")
      .write.option("path", viewsPath).format("parquet")
      .saveAsTable(viewsTable)
    spark.sql(s"DROP TABLE IF EXISTS $logTable")
    Seq.empty[(Long, Long, Option[Long], Long, Option[Long], Long)]
      .toDF("user_id", "view_id", "click_id", "view_ms", "click_ms",
        "batch_id")
      .write.option("path", logPath).format("parquet")
      .saveAsTable(logTable)
  }

  /** CONTINUOUS stream-stream attribution as a table-state loop — the
    * two-sided-state shape ([[attributeClicksOuter]]'s watermarked
    * stream-stream OUTER join, re-expressed the way the other loops
    * hold state): live views sit in a persisted table bounded by the
    * horizon (every view is dropped once the watermark proves no
    * future click can reach it), each micro-batch's clicks join
    * (live ∪ this batch's views), matched pairs append to the log, and
    * a view that expires unconverted appends exactly one null-click
    * row — the funnel-loss side an inner join can't see.
    *
    * Contracts, matching the family: micro-batches partition the event
    * stream in event-time order, with equal-ts events never split
    * across batches (a `≤ cutoff` range partition, as the replay gate
    * slices); a view EXPIRES under the strict `view_ms + horizon <
    * batch max ts` (a boundary-tie click at exactly the horizon edge
    * still matches). Each (view, click) pair is emitted exactly once —
    * by the click's batch — and each unconverted view exactly once, at
    * expiry or final flush. Log appends are keyed by batch_id and run
    * before the state replacement, so replays are at-least-once with
    * byte-identical rows; consumers dedup on (batch_id, view_id,
    * click_id). */
  def attributionIncrementalStream(
      events: DataFrame,
      viewsTable: String,
      logTable: String,
      horizonMinutes: Int = 60): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processAttributionBatch(batch, viewsTable, logTable,
          horizonMinutes * 60000L, batchId)
      }
      .start()

  /** Per-micro-batch body of [[attributionIncrementalStream]], shared
    * with [[replayAttribution]]. The batch carries raw events
    * (event_id, user_id, event_type, ts); views and clicks are split
    * here so one stream feeds both sides. */
  private[graft] def processAttributionBatch(
      batch: DataFrame,
      viewsTable: String,
      logTable: String,
      horizonMs: Long,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val live = spark.table(viewsTable)
    val nv = batch.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        unix_millis(col("ts")).as("view_ms"), lit(false).as("matched"))
    val nc = batch.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"),
        col("event_id").as("click_id"),
        unix_millis(col("ts")).as("click_ms"))
    val allViews = live.unionByName(nv)
    // this batch's pairs: every live-or-new view × this batch's clicks
    // inside the horizon — an equi-join on user with the range residual
    val pairs = allViews.join(nc,
        col("user_id") === col("c_user_id") &&
          col("click_ms") >= col("view_ms") &&
          col("click_ms") <= col("view_ms") + lit(horizonMs))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ms"), col("click_ms"))
    val (matPairs0, pPath) = graft.ops.Pin.stateAt(pairs, "attrib_pairs")
    val matPairs = if (pPath == null) matPairs0.coalesce(1) else matPairs0
    val wmRow = broadcast(batch.agg(
      max(unix_millis(col("ts"))).as("graft_wm_ms")))
    val scoredViews = allViews
      .join(matPairs.select(col("view_id")).distinct()
        .withColumn("m_now", lit(true)), Seq("view_id"), "left_outer")
      .select(col("user_id"), col("view_id"), col("view_ms"),
        (col("matched") || coalesce(col("m_now"), lit(false))).as("matched"))
      .crossJoin(wmRow)
      .withColumn("expired", coalesce(
        col("view_ms") + lit(horizonMs) < col("graft_wm_ms"), lit(false)))
    // both state tables are horizon-bounded by the attribution contract:
    // driver-pinned under the Pin gate (scratch fallback past it), with
    // single-task appends for the pinned micro-batch-sized deltas
    val (matViews0, vPath) = graft.ops.Pin.stateAt(scoredViews, "attrib_views")
    val matViews = if (vPath == null) matViews0.coalesce(1) else matViews0
    matPairs.withColumn("batch_id", lit(batchId))
      .write.mode("append").format("parquet").saveAsTable(logTable)
    matViews.filter(col("expired") && !col("matched"))
      .select(col("user_id"), col("view_id"),
        lit(null).cast("long").as("click_id"), col("view_ms"),
        lit(null).cast("long").as("click_ms"), lit(batchId).as("batch_id"))
      .write.mode("append").format("parquet").saveAsTable(logTable)
    replaceTableAt(spark,
      matViews.filter(!col("expired"))
        .select("user_id", "view_id", "view_ms", "matched"),
      viewsTable, "attrib_live")
    graft.ops.Scratch.drop(spark, pPath)
    graft.ops.Scratch.drop(spark, vPath)
    ()
  }

  /** Emit every still-live unconverted view as a null-click row under
    * `batchId` (end-of-stream flush), leaving empty state. Views that
    * already matched leave silently — their pairs are in the log. */
  def flushAttribution(
      spark: SparkSession,
      viewsTable: String,
      logTable: String,
      batchId: Long): Unit = {
    val (mat, path) = graft.ops.Scratch.materializeAt(
      spark.table(viewsTable), "attrib_flush")
    mat.filter(!col("matched"))
      .select(col("user_id"), col("view_id"),
        lit(null).cast("long").as("click_id"), col("view_ms"),
        lit(null).cast("long").as("click_ms"), lit(batchId).as("batch_id"))
      .write.mode("append").format("parquet").saveAsTable(logTable)
    replaceTableAt(spark, mat.limit(0)
      .select("user_id", "view_id", "view_ms", "matched"),
      viewsTable, "attrib_live")
    graft.ops.Scratch.drop(spark, path)
  }

  /** DETERMINISTIC batch replay of [[attributionIncrementalStream]]:
    * run the event-time-ordered frames through the shared body, flush,
    * return the attribution log — the LEFT-OUTER attribution output
    * (matched pairs + null-click funnel loss), oracle-gated as
    * `ev_attribution_stream_replay` against the same oracle as the
    * one-shot `ev_attribution_outer`. */
  def replayAttribution(
      batches: Seq[DataFrame],
      viewsTable: String,
      logTable: String,
      horizonMinutes: Int = 60,
      flush: Boolean = true): DataFrame = {
    require(batches.nonEmpty, "replayAttribution: no batches")
    val spark = batches.head.sparkSession
    batches.zipWithIndex.foreach { case (b, i) =>
      processAttributionBatch(b, viewsTable, logTable,
        horizonMinutes * 60000L, i.toLong)
    }
    if (flush)
      flushAttribution(spark, viewsTable, logTable, batches.size.toLong)
    spark.table(logTable)
  }

  // ==== incremental windowed rollup over a persisted pane table ====

  /** Seed the pane table [[windowPaneStream]] appends to (external
    * parquet on a caller-supplied fresh path, like the other loops). */
  def seedPaneTable(
      spark: SparkSession, paneTable: String, path: String): Unit = {
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS $paneTable")
    Seq.empty[(Long, String, Long, Double, Long)]
      .toDF("window_start_ms", "event_type", "n", "total_raw", "batch_id")
      .write.option("path", path).format("parquet").saveAsTable(paneTable)
  }

  /** CONTINUOUS windowed rollup as durable PANES — the third loop of
    * the family: each micro-batch appends its own map-side-combined
    * hourly partials (window × event_type × batch_id), and the rollup
    * any reader wants is [[mergePanes]] — a re-aggregation of the pane
    * table. Count and sum are commutative monoids, so the merge is
    * EXACT under any batch split (no event-time ordering contract, in
    * contrast to the sessionize loop) — the incremental form of
    * [[windowedCounts]] without a state store: panes are a dataset,
    * not checkpoint state, so the rollup is restartable, auditable,
    * and cheap to re-slice. At 100 TB the pane table is
    * |windows| × |types| × |batches| — log-scale input reduced at the
    * map side before anything persists.
    *
    * Replay contract: an at-least-once re-run of a batch re-appends
    * its panes under the SAME batch_id; [[mergePanes]] collapses them
    * (one row per (pane, batch_id)) before summing, so the rollup is
    * idempotent under replay. */
  def windowPaneStream(
      events: DataFrame,
      paneTable: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processPaneBatch(batch, paneTable, batchId)
      }
      .start()

  /** Per-micro-batch body of [[windowPaneStream]], shared with
    * [[replayWindowPanes]]. */
  private[graft] def processPaneBatch(
      batch: DataFrame, paneTable: String, batchId: Long): Unit = {
    batch
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_raw"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("total_raw"),
        lit(batchId).as("batch_id"))
      .write.mode("append").format("parquet").saveAsTable(paneTable)
    ()
  }

  /** The reader-side rollup of the pane table: collapse replayed
    * duplicates (at-least-once appends are keyed by batch_id — the
    * recomputed rows are semantically identical, so any survivor is
    * correct), then merge the monoid partials. Output matches
    * [[windowedCounts]] column-for-column. */
  def mergePanes(spark: SparkSession, paneTable: String): DataFrame =
    spark.table(paneTable)
      .dropDuplicates("window_start_ms", "event_type", "batch_id")
      .groupBy(col("window_start_ms"), col("event_type"))
      .agg(sum("n").as("n"), round(sum("total_raw"), 4).as("total_value"))

  /** COMPACT the pane table: collapse the per-batch partials (and any
    * replayed duplicates) into one pane row per (window, event_type)
    * under the reserved epoch `batch_id = -1`, re-pointing the table at
    * a fresh write — the [[graft.operators.Dedup.compactFpIndex]]
    * maintenance leg for the rollup loop. The stored partials stay RAW
    * (unrounded) monoid sums, so [[mergePanes]] over the compacted
    * table is value-identical to the uncompacted read, and subsequent
    * batches keep appending under their own batch_ids — compaction is
    * an epoch boundary, not a freeze. */
  def compactPanes(spark: SparkSession, paneTable: String): Unit = {
    val merged = graft.ops.Scratch.materialize(
      spark.table(paneTable)
        .dropDuplicates("window_start_ms", "event_type", "batch_id")
        .groupBy(col("window_start_ms"), col("event_type"))
        .agg(sum("n").as("n"), sum("total_raw").as("total_raw"))
        .withColumn("batch_id", lit(-1L)),
      "pane_compact")
    replaceTableAt(spark, merged
      .select("window_start_ms", "event_type", "n", "total_raw", "batch_id"),
      paneTable, "ev_panes")
  }

  /** Batch replay of [[windowPaneStream]] — feed the frames through
    * [[processPaneBatch]] and return the merged rollup. Identity with
    * the one-shot [[windowedCounts]] is oracle-gated
    * (`ev_window_pane_replay`) under an arbitrary (non-time-ordered)
    * split — the monoid-merge guarantee. */
  def replayWindowPanes(
      batches: Seq[DataFrame], paneTable: String): DataFrame = {
    require(batches.nonEmpty, "replayWindowPanes: no batches")
    batches.zipWithIndex.foreach { case (b, i) =>
      processPaneBatch(b, paneTable, i.toLong)
    }
    mergePanes(batches.head.sparkSession, paneTable)
  }

  // ==== continuous NEAR-dup: the streaming MinHash band-index loop ====

  /** Seed the three tables the streaming near-dup loop maintains: the
    * bucketed band-key index (via an empty
    * [[graft.operators.Dedup.lshBandKeys]] pass, so the schema is the
    * operator's own), the corpus text store, and the candidate-pair
    * log. External parquet on caller paths, like the other loops. */
  def seedLshStreamTables(
      spark: SparkSession,
      bandTable: String,
      corpusTable: String,
      pairsTable: String,
      bandPath: String,
      corpusPath: String,
      pairsPath: String,
      buckets: Int = 32): Unit = {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    graft.operators.Dedup.writeLshBandIndex(
      graft.operators.Dedup.lshBandKeys(emptyDocs), bandTable,
      buckets = buckets, path = Some(bandPath))
    spark.sql(s"DROP TABLE IF EXISTS $corpusTable")
    emptyDocs.write.option("path", corpusPath).format("parquet")
      .saveAsTable(corpusTable)
    spark.sql(s"DROP TABLE IF EXISTS $pairsTable")
    Seq.empty[(Long, Long, Double, Long)]
      .toDF("a", "b", "jaccard", "batch_id")
      .write.option("path", pairsPath).format("parquet")
      .saveAsTable(pairsTable)
  }

  /** CONTINUOUS-INGEST NEAR-dup as a self-maintaining stream — the
    * [[incrementalDedupStream]] lifecycle for MinHash-LSH: every
    * micro-batch probes the persisted band-key index
    * ([[graft.operators.Dedup.writeLshBandIndex]]) for cross-batch
    * candidates, self-joins for within-batch ones, exact-Jaccard
    * verifies against the corpus store, then appends its own band keys
    * (same bucket spec — the index stays Exchange-free on the history
    * side) and its text. Each unordered near-dup pair is discovered
    * exactly once, by the batch that completes it, so the union of the
    * per-batch pair logs equals the one-shot
    * [[graft.operators.Dedup.lshJaccard]] over the accumulated corpus —
    * which is what the `dedup_lsh_stream_replay` gate hash-checks.
    *
    * The history probe anti-joins away the batch's OWN ids first: a
    * no-op in normal operation (stream ids are unique, the dedup-loop
    * contract), but under an at-least-once replay that crashed after
    * the band append it keeps the recomputed pairs byte-identical
    * instead of self-matching the batch's already-appended keys.
    * Remaining replay residue (duplicate pair rows / band keys from a
    * crash mid-append-sequence) is absorbed downstream: consumers read
    * the pair log `DISTINCT` on (batch_id, a, b), and the candidate
    * probe itself de-duplicates band collisions, so duplicate index
    * keys cost a little index size, never correctness.
    *
    * Scale note: the anti-join broadcasts the batch's ID COLUMN only —
    * micro-batch-sized by the streaming contract (a bulk backfill is a
    * batch job, not a micro-batch), and the alternative would shuffle
    * the accumulated history, the exact movement the bucketed index
    * exists to avoid. */
  def lshDedupStream(
      docs: DataFrame,
      bandTable: String,
      corpusTable: String,
      pairsTable: String,
      buckets: Int = 32,
      shingleK: Int = 5,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.0): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processLshDedupBatch(batch, bandTable, corpusTable, pairsTable,
          batchId, buckets, shingleK, bands, rowsPerBand, minJaccard)
      }
      .start()

  /** Per-micro-batch body of [[lshDedupStream]], shared with
    * [[replayLshDedup]]. Pair rows are normalized to `a < b` (`least`/
    * `greatest`) so the log's orientation matches the one-shot batch
    * path regardless of which side of a pair arrived first. */
  private[graft] def processLshDedupBatch(
      batch: DataFrame,
      bandTable: String,
      corpusTable: String,
      pairsTable: String,
      batchId: Long,
      buckets: Int,
      shingleK: Int,
      bands: Int,
      rowsPerBand: Int,
      minJaccard: Double): Unit = {
    val spark = batch.sparkSession
    val hist = graft.operators.Dedup.loadLshBandIndex(spark, bandTable)
      .join(broadcast(batch.select(col("doc_id").as("id"))),
        Seq("id"), "left_anti")
    val corpus = spark.table(corpusTable).select("doc_id", "text")
      .unionByName(batch.select("doc_id", "text"))
    // the batch's band keys are computed ONCE: the probe/self-join reads
    // them here and the history append below re-reads the same frame —
    // previously the append re-ran the full MinHash signature pass over
    // the batch text. Micro-batch-sized by the ingest contract, so the
    // keys are driver-PINNED under the Pin row/byte gate (one collect,
    // no parquet round-trip; scratch fallback past the gate).
    val (bk, bkPath) = graft.ops.Pin.stateAt(
      graft.operators.Dedup.lshBandKeys(batch, shingleK = shingleK,
        bands = bands, rowsPerBand = rowsPerBand), "lsh_stream_keys")
    val pairs = graft.operators.Dedup.incrementalLshJaccardFromKeys(
      bk, hist, corpus, shingleK = shingleK, minJaccard = minJaccard)
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"), col("jaccard"))
    // the pair append runs FIRST, while every table its plan reads
    // (bandTable via hist, corpusTable via corpus) is still unmutated —
    // one direct write, no intermediate scratch round-trip (the append
    // is the plan's ONLY consumer; the band/corpus appends below read
    // the bk scratch table and the raw batch, never this plan)
    pairs.withColumn("batch_id", lit(batchId))
      .write.mode("append").format("parquet").saveAsTable(pairsTable)
    // a pinned (bkPath == null) key table writes its bucket files from
    // ONE task: a local scan defaults to leaf-node parallelism, and 32
    // tasks × ≤buckets files per micro-batch explodes the index's file
    // count for a batch-sized delta. The scratch fallback keeps its
    // natural parallelism (that path exists for the too-big batch).
    (if (bkPath == null) bk.coalesce(1) else bk)
      .select(col("id"), col("band"), col("h"))
      .write.mode("append")
      .bucketBy(buckets, "band", "h").sortBy("band", "h")
      .format("parquet").saveAsTable(bandTable)
    batch.select("doc_id", "text")
      .write.mode("append").format("parquet").saveAsTable(corpusTable)
    graft.ops.Scratch.drop(spark, bkPath)
    ()
  }

  /** DETERMINISTIC batch replay of [[lshDedupStream]] — the
    * correctness-gate surface: run the frames through
    * [[processLshDedupBatch]] in order and return the accumulated pair
    * log. Identity with the one-shot batch
    * [[graft.operators.Dedup.lshJaccard]] over the full corpus is
    * oracle-gated (`dedup_lsh_stream_replay`); identity with the real
    * MemoryStream run is spec-proven (LshStreamSpec). */
  def replayLshDedup(
      batches: Seq[DataFrame],
      bandTable: String,
      corpusTable: String,
      pairsTable: String,
      buckets: Int = 32,
      shingleK: Int = 5,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.0): DataFrame = {
    require(batches.nonEmpty, "replayLshDedup: no batches")
    batches.zipWithIndex.foreach { case (b, i) =>
      processLshDedupBatch(b, bandTable, corpusTable, pairsTable,
        i.toLong, buckets, shingleK, bands, rowsPerBand, minJaccard)
    }
    batches.head.sparkSession.table(pairsTable)
  }

  /** Streaming de-duplication by event_id within the watermark horizon. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates("event_id", "ts")

  /** De-duplication by KEY ALONE within the watermark — unlike
    * `dropDuplicates(key, ts)`, replays with a DIFFERENT timestamp (the
    * at-least-once-delivery case: same event re-sent seconds later) also
    * collapse. State holds one entry per key seen inside the horizon and
    * is pruned as the watermark passes — bounded by key arrival rate,
    * not history. Streaming-only (the within-watermark contract has no
    * batch meaning; use groupBy-min for batch). */
  def dedupKeyStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /**
   * Stream-stream attribution join: each `click` matches the same user's
   * `view`s at most `horizonMinutes` older. Both sides are watermarked
   * and the join carries the time-range predicate, so Spark can bound
   * BOTH state stores (view state expires one horizon after the
   * watermark; click state at the watermark) — the canonical bounded
   * stream-stream join shape. The same plan runs in batch (an ordinary
   * range-conditioned equi-join) for oracle checking.
   *
   * Inputs must carry the named columns: views(user_id, view_id, ts),
   * clicks(user_id, click_id, ts).
   */
  def attributeClicks(
      views: DataFrame,
      clicks: DataFrame,
      horizonMinutes: Int = 60): DataFrame =
    attributionJoin(views, clicks, horizonMinutes, "inner")

  /**
   * LEFT-OUTER rendition of [[attributeClicks]]: every view emits, with
   * null click columns for views no click converted — the funnel-loss
   * side the inner join can't see. In streaming mode this is the
   * watermarked stream-stream OUTER join: Spark holds a view in state
   * until the click-side watermark passes `view_ts + horizon`, then
   * emits the unmatched row with nulls — which is exactly why BOTH
   * watermarks and the two-sided time bound are required (an unbounded
   * outer join could never prove a view unmatched). Batch runs the
   * identical plan minus watermarks for the oracle.
   */
  def attributeClicksOuter(
      views: DataFrame,
      clicks: DataFrame,
      horizonMinutes: Int = 60): DataFrame =
    attributionJoin(views, clicks, horizonMinutes, "left_outer")

  private def attributionJoin(
      views: DataFrame,
      clicks: DataFrame,
      horizonMinutes: Int,
      joinType: String): DataFrame = {
    val v = views
      .withWatermark("ts", s"$horizonMinutes minutes")
      .select(col("user_id"), col("view_id"), col("ts").as("view_ts"))
    val c = clicks
      .withWatermark("ts", s"$horizonMinutes minutes")
      .select(col("user_id").as("c_user_id"), col("click_id"), col("ts").as("click_ts"))
    v.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"),
      joinType)
      .select(col("user_id"), col("view_id"), col("click_id"),
        unix_millis(col("view_ts")).as("view_ms"),
        unix_millis(col("click_ts")).as("click_ms"))
  }

  /** Bind the windowed agg to a parquet directory as a file stream and a
    * memory sink (for tests / local smoke); returns the running query. */
  def startFileStream(
      spark: SparkSession,
      schema: StructType,
      srcDir: String,
      queryName: String,
      prepare: DataFrame => DataFrame = identity,
      transform: DataFrame => DataFrame = windowedCounts): StreamingQuery = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    transform(prepare(stream)).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
