package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The two-sided-state attribution loop: live views held in a persisted
  * horizon-bounded table, pairs emitted by the click's batch, funnel
  * loss emitted at expiry — replay ≡ one-shot LEFT-OUTER attribution,
  * stream ≡ replay, and the strict-expiry horizon-edge contract. */
class AttributionStreamSpec extends SparkTestBase {

  private def ts(minute: Long) =
    new java.sql.Timestamp(1700000000000L + minute * 60000L)

  /** u1: V1@0, V2@10 then C1@50 (matches both), C2@65 (matches V2
    * only — 65 min from V1 is outside the 60-min horizon); u2: V3@5
    * unconverted; u3: C3@20 with no view. Batch cut at minute 40. */
  private def fixture = Seq(
    (101L, 1L, "view", ts(0)), (102L, 1L, "view", ts(10)),
    (103L, 2L, "view", ts(5)), (104L, 3L, "click", ts(20)),
    (201L, 1L, "click", ts(50)), (202L, 1L, "click", ts(65)))

  private def eventsDf: DataFrame = {
    import spark.implicits._
    fixture.toDF("event_id", "user_id", "event_type", "ts")
  }

  private def seed(sfx: String): (String, String) = {
    val (vt, lt) = (s"graft_attr_live_$sfx", s"graft_attr_log_$sfx")
    EventStreams.seedAttributionTables(spark, vt, lt,
      java.nio.file.Files.createTempDirectory("graft_attr_v_").toString,
      java.nio.file.Files.createTempDirectory("graft_attr_l_").toString)
    (vt, lt)
  }

  private def logSet(df: DataFrame) = df
    .select("user_id", "view_id", "click_id", "view_ms", "click_ms")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) -1L else r.getLong(4)))
    .toSet

  test("replayAttribution over time-ordered slices equals the one-shot " +
      "LEFT-OUTER attribution, cross-batch pairs and funnel loss included") {
    val ev = eventsDf
    val (vt, lt) = seed("rp")
    try {
      val ms = unix_millis(col("ts"))
      val cut = 1700000000000L + 40 * 60000L
      val log = EventStreams.replayAttribution(
        Seq(ev.filter(ms <= cut), ev.filter(ms > cut)), vt, lt)
      val got = logSet(log)
      assert(got == Set(
        (1L, 101L, 201L, ts(0).getTime, ts(50).getTime),
        (1L, 102L, 201L, ts(10).getTime, ts(50).getTime),
        (1L, 102L, 202L, ts(10).getTime, ts(65).getTime),
        (2L, 103L, -1L, ts(5).getTime, -1L)))
      // one-shot identity via the batch operator
      val oneShot = EventStreams.attributeClicksOuter(
        ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"), col("ts")),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts")),
        horizonMinutes = 60)
      assert(got == logSet(oneShot))
    } finally Seq("graft_attr_live_rp", "graft_attr_log_rp")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("attributionIncrementalStream over MemoryStream micro-batches " +
      "reproduces the replay driver's log exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val cut = 1700000000000L + 40 * 60000L
    val b1 = fixture.filter(_._4.getTime <= cut)
    val b2 = fixture.filter(_._4.getTime > cut)
    val (vt, lt) = seed("ms")
    val (vt2, lt2) = seed("ms_rp")
    def full(t: String) = spark.table(t).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))
      .toSet
    try {
      val input = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
      val q = EventStreams.attributionIncrementalStream(
        input.toDF().toDF("event_id", "user_id", "event_type", "ts"),
        vt, lt)
      try {
        input.addData(b1: _*); q.processAllAvailable()
        input.addData(b2: _*); q.processAllAvailable()
      } finally q.stop()
      EventStreams.flushAttribution(spark, vt, lt, 2L)
      EventStreams.replayAttribution(
        Seq(b1.toDF("event_id", "user_id", "event_type", "ts"),
          b2.toDF("event_id", "user_id", "event_type", "ts")),
        vt2, lt2)
      assert(full(lt) == full(lt2) && full(lt).nonEmpty)
    } finally Seq("ms", "ms_rp").flatMap(sfx =>
      Seq(s"graft_attr_live_$sfx", s"graft_attr_log_$sfx"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("a view expires STRICTLY past the horizon: a click at exactly " +
      "view_ms + horizon in a later batch still matches") {
    import spark.implicits._
    val (vt, lt) = seed("edge")
    try {
      def b(rows: Seq[(Long, Long, String, java.sql.Timestamp)]) =
        rows.toDF("event_id", "user_id", "event_type", "ts")
      EventStreams.processAttributionBatch(
        b(Seq((1L, 7L, "view", ts(0)))), vt, lt, 3600000L, 0L)
      // wm = 60: 0 + 60 < 60 is false -> the view must still be live
      EventStreams.processAttributionBatch(
        b(Seq((2L, 7L, "click", ts(60)))), vt, lt, 3600000L, 1L)
      val pairs = spark.table(lt).filter(col("click_id").isNotNull)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(pairs == Set((1L, 2L)))
      // wm = 61 > 60: now it expires, matched -> leaves silently
      EventStreams.processAttributionBatch(
        b(Seq((3L, 8L, "click", ts(61)))), vt, lt, 3600000L, 2L)
      assert(spark.table(vt).count() == 0L)
      EventStreams.flushAttribution(spark, vt, lt, 3L)
      assert(spark.table(lt).filter(col("click_id").isNull).count() == 0L)
    } finally Seq("graft_attr_live_edge", "graft_attr_log_edge")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
