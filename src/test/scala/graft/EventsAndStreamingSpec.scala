package graft

import graft.operators.{Events, Multimodal}
import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class EventsAndStreamingSpec extends SparkTestBase {

  private def events: DataFrame = {
    val raw = spark.read.parquet(s"${sf()}/events.parquet")
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
      prepare = df => df.withColumn("ts", timestamp_micros(expr("ts div 1000"))))
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM stream_test")
      val batch = EventStreams.windowedCounts(events)
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
