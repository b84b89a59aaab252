package graft

import graft.operators.Events
import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The incremental sessionization + durable-pane rollup loops: replay ≡
  * one-shot batch path, real MemoryStream run ≡ replay, and the
  * at-least-once idempotence contracts each loop's scaladoc promises. */
class IncrementalSessionSpec extends SparkTestBase {

  private def ts(minute: Long) =
    new java.sql.Timestamp(1700000000000L + minute * 60000L)

  /** Fixture with a session SPANNING the batch-1/batch-2 boundary for
    * user 1 (events at minutes 58+70 are 12 min apart, inside the
    * 30-min gap, split across the minute-60 cutoff), a batch-1-only
    * session for user 2, and a fresh batch-2 session for user 1. */
  private def fixture = Seq(
    (1L, ts(0), 1.0), (1L, ts(10), 2.0), // user-1 session A
    (1L, ts(58), 3.0),                   // user-1 session B, batch 1…
    (2L, ts(5), 5.0),                    // user-2 session (batch 1)
    (1L, ts(70), 4.0),                   // …continues in batch 2
    (1L, ts(150), 7.0),                  // user-1 session C (batch 2)
    (2L, ts(140), 6.0))                  // user-2 session 2 (batch 2)

  private def eventsDf: DataFrame = {
    import spark.implicits._
    fixture.toDF("user_id", "ts", "value")
  }

  private def seedSession(open: String, closed: String): Unit =
    EventStreams.seedSessionTables(spark, open, closed,
      java.nio.file.Files.createTempDirectory("graft_sess_open_").toString,
      java.nio.file.Files.createTempDirectory("graft_sess_closed_").toString)

  private def sessionSet(df: DataFrame) = df
    .select(col("user_id"), col("session_start_ms"), col("session_end_ms"),
      col("n_events"), round(col("total_raw"), 4).as("total_value"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)))
    .toSet

  private def batchSessionSet(events: DataFrame) =
    Events.sessionize(events)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(2),
        r.getDouble(5)))
      .toSet

  test("replaySessionize over time-ordered slices equals the one-shot " +
      "batch sessionize, including the session spanning the slice cut") {
    val ev = eventsDf
    seedSession("graft_sess_open_spec", "graft_sess_closed_spec")
    try {
      val ms = unix_millis(col("ts"))
      val cut = 1700000000000L + 60 * 60000L
      val closed = EventStreams.replaySessionize(
        Seq(ev.filter(ms < cut), ev.filter(ms >= cut)),
        "graft_sess_open_spec", "graft_sess_closed_spec")
      assert(sessionSet(closed) == batchSessionSet(ev))
      // the cross-cut session (user 1, minutes 58..70) must exist as ONE
      // 2-event session — the frontier carry this loop exists for
      assert(sessionSet(closed).contains(
        (1L, ts(58).getTime, ts(70).getTime, 2L, 7.0)))
    } finally Seq("graft_sess_open_spec", "graft_sess_closed_spec")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("sessionizeIncrementalStream over MemoryStream micro-batches " +
      "equals the replay driver's log (shared per-batch body)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val cut = 1700000000000L + 60 * 60000L
    val b1 = fixture.filter(_._2.getTime < cut)
    val b2 = fixture.filter(_._2.getTime >= cut)
    seedSession("graft_sess_open_ms", "graft_sess_closed_ms")
    seedSession("graft_sess_open_rp", "graft_sess_closed_rp")
    try {
      val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
      val q = EventStreams.sessionizeIncrementalStream(
        input.toDF().toDF("user_id", "ts", "value"),
        "graft_sess_open_ms", "graft_sess_closed_ms")
      try {
        input.addData(b1: _*); q.processAllAvailable()
        input.addData(b2: _*); q.processAllAvailable()
      } finally q.stop()
      // the stream has no end-of-stream flush; flush explicitly with the
      // same batch id the 2-batch replay driver uses
      EventStreams.flushOpenSessions(spark,
        "graft_sess_open_ms", "graft_sess_closed_ms", 2L)
      val streamed = spark.table("graft_sess_closed_ms")

      val replayed = EventStreams.replaySessionize(
        Seq(b1.toDF("user_id", "ts", "value"),
          b2.toDF("user_id", "ts", "value")),
        "graft_sess_open_rp", "graft_sess_closed_rp")
      def full(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          math.rint(r.getDouble(4) * 1e4) / 1e4, r.getLong(5)))
        .toSet
      // batch_id included: the logs must agree row-for-row, not just as
      // session values
      assert(full(streamed) == full(replayed))
    } finally Seq("graft_sess_open_ms", "graft_sess_closed_ms",
      "graft_sess_open_rp", "graft_sess_closed_rp")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("a session closes exactly when the batch watermark passes " +
      "end + gap; an empty micro-batch closes nothing") {
    import spark.implicits._
    seedSession("graft_sess_open_wm", "graft_sess_closed_wm")
    try {
      // batch 0: user 1 at minute 0; wm = minute 0 -> stays open
      EventStreams.processSessionBatch(
        Seq((1L, ts(0), 1.0)).toDF("user_id", "ts", "value"),
        "graft_sess_open_wm", "graft_sess_closed_wm", 30 * 60000L, 0L)
      assert(spark.table("graft_sess_closed_wm").count() == 0L)
      assert(spark.table("graft_sess_open_wm").count() == 1L)
      // batch 1: EMPTY — null watermark, nothing closes, frontier intact
      EventStreams.processSessionBatch(
        Seq.empty[(Long, java.sql.Timestamp, Double)]
          .toDF("user_id", "ts", "value"),
        "graft_sess_open_wm", "graft_sess_closed_wm", 30 * 60000L, 1L)
      assert(spark.table("graft_sess_closed_wm").count() == 0L)
      assert(spark.table("graft_sess_open_wm").count() == 1L)
      // batch 2: user 2 at minute 31 -> wm=31 > 0+30: user-1 session
      // closes; user-2 stays open (31+30 > 31)
      EventStreams.processSessionBatch(
        Seq((2L, ts(31), 2.0)).toDF("user_id", "ts", "value"),
        "graft_sess_open_wm", "graft_sess_closed_wm", 30 * 60000L, 2L)
      val closed = spark.table("graft_sess_closed_wm").collect()
      assert(closed.map(_.getLong(0)).toSet == Set(1L))
      assert(closed.head.getLong(5) == 2L) // closed under batch_id 2
      assert(spark.table("graft_sess_open_wm").collect()
        .map(_.getLong(0)).toSet == Set(2L))
    } finally Seq("graft_sess_open_wm", "graft_sess_closed_wm")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("replayWindowPanes equals the one-shot windowedCounts under an " +
      "arbitrary split, and re-appending a batch (at-least-once replay) " +
      "leaves the merged rollup unchanged") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(0), "click", 1.0), (2L, ts(10), "click", 2.0),
      (3L, ts(20), "view", 3.0), (4L, ts(70), "click", 4.0),
      (5L, ts(80), "view", 5.0), (6L, ts(130), "click", 6.0))
      .toDF("event_id", "ts", "event_type", "value")
    def seedPanes(t: String): Unit = EventStreams.seedPaneTable(spark, t,
      java.nio.file.Files.createTempDirectory("graft_panes_").toString)
    seedPanes("graft_panes_spec")
    try {
      val batches = (0 to 2).map(i =>
        ev.filter(pmod(col("event_id"), lit(3)) === i))
      val rolled = EventStreams.replayWindowPanes(batches, "graft_panes_spec")
      def rows(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3)))
        .toSet
      val oneShot = EventStreams.windowedCounts(ev)
        .select(col("window_start_ms"), col("event_type"), col("n"),
          col("total_value"))
      assert(rows(rolled) == rows(oneShot))
      // simulate an at-least-once replay of batch 1: same batch_id,
      // recomputed rows — the keyed dedup in mergePanes must absorb it
      EventStreams.processPaneBatch(batches(1), "graft_panes_spec", 1L)
      assert(rows(EventStreams.mergePanes(spark, "graft_panes_spec")) ==
        rows(oneShot))
      // COMPACT: one raw-sum row per pane under epoch -1 (the replayed
      // duplicate collapses too), rollup unchanged, and a post-compact
      // batch appends on top without disturbing it
      EventStreams.compactPanes(spark, "graft_panes_spec")
      val t = spark.table("graft_panes_spec")
      assert(t.count() ==
        t.select("window_start_ms", "event_type").distinct().count())
      assert(t.select("batch_id").distinct().collect()
        .map(_.getLong(0)).toSet == Set(-1L))
      assert(rows(EventStreams.mergePanes(spark, "graft_panes_spec")) ==
        rows(oneShot))
      EventStreams.processPaneBatch(batches(1), "graft_panes_spec", 10L)
      EventStreams.processPaneBatch(batches(1), "graft_panes_spec", 11L)
      val twice = EventStreams.mergePanes(spark, "graft_panes_spec")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      // two more real epochs of batch-1 events: counts grow by exactly
      // two extra batch-1 contributions — the epoch boundary is open
      val base = oneShot.collect()
        .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
      val b1Counts = batches(1)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("window.start")), col("event_type"), col("n"))
        .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
        .toMap
      twice.foreach { case (w, ty, n) =>
        assert(n == base((w, ty)) + 2 * b1Counts.getOrElse((w, ty), 0L)) }
    } finally spark.sql("DROP TABLE IF EXISTS graft_panes_spec")
  }
}
