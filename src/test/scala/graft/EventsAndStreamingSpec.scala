package graft

import graft.operators.{Events, Multimodal}
import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class EventsAndStreamingSpec extends SparkTestBase {

  private def events: DataFrame = {
    Events.normalizeEventTs(spark.read.parquet(s"${sf()}/events.parquet"))
  }

  test("funnel: ordered steps, strictly-after semantics") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // full path
      (2L, "view", 10L), (2L, "click", 5L), (2L, "click", 40L),     // click-before-view ignored, later one counts
      (3L, "click", 10L), (3L, "purchase", 20L),                    // never viewed: enters no step
      (4L, "view", 10L), (4L, "purchase", 20L)                      // skipped click: stops at view
    ).map { case (u, t, s) => (u, t, ts(s)) }.toDF("user_id", "event_type", "ts")
    val out = Events.funnel(ev, Seq("view", "click", "purchase")).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L))
  }

  test("cohortRetention: cohort by first-seen period, offsets count distinct actives") {
    import spark.implicits._
    val day = 86400L
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // period = 1 week. u1 first in week 0, active weeks 0,1,2 (two
    // events in week 1 count once); u2 first in week 0, active week 0
    // only; u3 first in week 1, active weeks 1,3.
    val ev = Seq(
      (1L, 0L), (1L, 8L * day), (1L, 9L * day), (1L, 15L * day),
      (2L, 2L * day),
      (3L, 8L * day), (3L, 22L * day))
      .map { case (u, s) => (u, ts(s)) }.toDF("user_id", "ts")
    val cells = Events.cohortRetention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L))
  }

  test("resampleLastValue: carry-forward on the grid, collisions collapsed, guard") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(600L), 1.0), // 10 min in
      (1L, ts(600L), 0.5), // same-second collision: max wins
      (1L, ts(4200L), 5.0) // 70 min in
    ).toDF("user_id", "ts", "value")
    val out = Events.resampleLastValue(ev, stepSeconds = 3600L).collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // grid spans hour boundaries 0 and 3600; nothing precedes t=0,
    // t=3600 carries the 10-min event (its max-collapsed value)
    assert(out == Map(0L -> None, 3600L -> Some(1.0)))
    // a key spanning more grid points than the bound fails fast
    val err = intercept[Exception] {
      Events.resampleLastValue(ev, stepSeconds = 600L, maxPointsPerKey = 3L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("resampleLastValue")))
  }

  test("sessionize: session bounds ordered, events conserved") {
    val s = Events.sessionize(events).cache()
    assert(s.filter(col("session_end_ms") < col("session_start_ms")).count() == 0)
    assert(s.agg(sum("n_events")).head.getLong(0) == events.count())
    // session_seq starts at 1 per user
    assert(s.groupBy("user_id").agg(min("session_seq").as("m"))
      .filter(col("m") =!= 1).count() == 0)
  }

  test("tumbling window agg: totals conserve count") {
    val w = EventStreams.windowedCounts(events)
    assert(w.agg(sum("n")).head.getLong(0) == events.count())
  }

  test("running totals monotone per user") {
    val rt = Events.runningTotals(events)
    val perUser = rt.filter(col("user_id") === 1).orderBy("event_idx")
      .select("event_idx").collect().map(_.getInt(0))
    assert(perUser.toSeq == (1 to perUser.length))
  }

  test("streaming windowed agg equals batch windowed agg") {
    val raw = spark.read.parquet(s"${sf()}/events.parquet")
    // file streams need a directory source
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${sf()}/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStreams.startFileStream(
      spark, raw.schema, dir.toString, "stream_test",
      prepare = df => Events.normalizeEventTs(df))
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM stream_test")
      val batch = EventStreams.windowedCounts(events)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0)
    } finally q.stop()
  }

  test("streaming sliding agg equals batch sliding agg") {
    val raw = spark.read.parquet(s"${sf()}/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_slide")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${sf()}/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStreams.startFileStream(
      spark, raw.schema, dir.toString, "stream_slide_test",
      prepare = df => Events.normalizeEventTs(df),
      transform = df => Events.slidingCounts(df))
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM stream_slide_test")
      val batch = Events.slidingCounts(events)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0)
    } finally q.stop()
  }

  test("streaming dedup drops replayed events within watermark") {
    import spark.implicits._
    val doubled = events.unionAll(events)
    val out = EventStreams.dedupStream(doubled)
    assert(out.count() == events.count())
  }

  test("multimodal: decode meta is deterministic and bounded") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val meta = Multimodal.decodeMeta(spark, Multimodal.synthesizeMedia(docs)).cache()
    assert(meta.count() == docs.count())
    assert(meta.filter(col("width") >= 1024 || col("height") >= 768).count() == 0)
    assert(meta.filter(col("n_frames") < 1 || col("n_frames") > 8).count() == 0)
  }

  test("multimodal: frame sampling respects stride and count") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(50)
    val media = Multimodal.synthesizeMedia(docs)
    val meta = Multimodal.decodeMeta(spark, media).collect().map(m => m.doc_id -> m).toMap
    Multimodal.sampleFrames(spark, media, stride = 2).collect().groupBy(_.doc_id)
      .foreach { case (id, frames) =>
        val expected = (0 until meta(id).n_frames by 2).toSet
        assert(frames.map(_.frame_idx).toSet == expected)
      }
  }

  test("multimodal: feature vectors have fixed dims in [0,1]") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val feats = Multimodal.extractFeatures(spark, Multimodal.synthesizeMedia(docs), dims = 8)
    val rows = feats.collect()
    assert(rows.forall(_.getSeq[Float](1).length == 8))
    assert(rows.forall(_.getSeq[Float](1).forall(v => v >= 0f && v <= 1f)))
  }
}
