package graft

import graft.operators.Events
import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object StreamJoinSpec {
  // top-level so Spark derives Encoders without closure capture
  final case class Ev(user_id: Long, id: Long, ts: java.sql.Timestamp)
}

/** Stream-stream join and within-watermark key dedup: the streaming
  * surfaces added on top of the windowed-agg/sessionization coverage.
  * Both compare a MemoryStream run against the equivalent batch
  * semantics on the same rows. */
class StreamJoinSpec extends SparkTestBase {
  import StreamJoinSpec._
  import spark.implicits._

  private def events: DataFrame = {
    Events.normalizeEventTs(spark.read.parquet(s"${sf()}/events.parquet"))
  }

  private def side(kind: String, idName: String): DataFrame =
    events.filter(col("event_type") === kind)
      .select(col("user_id"), col("event_id").as(idName), col("ts"))

  private def rowsOf(df: DataFrame, idName: String): Seq[Ev] =
    df.select(col("user_id"), col(idName).as("id"), col("ts")).as[Ev].collect().toSeq

  test("stream-stream attribution join emits exactly the batch matches") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val views = side("view", "view_id")
    val clicks = side("click", "click_id")
    val batch = EventStreams.attributeClicks(views, clicks, horizonMinutes = 60)

    val vs = MemoryStream[Ev]
    val cs = MemoryStream[Ev]
    vs.addData(rowsOf(views, "view_id"))
    cs.addData(rowsOf(clicks, "click_id"))
    val streamed = EventStreams.attributeClicks(
      vs.toDF().withColumnRenamed("id", "view_id"),
      cs.toDF().withColumnRenamed("id", "click_id"),
      horizonMinutes = 60)
    val q = streamed.writeStream.format("memory")
      .queryName("attr_test").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM attr_test")
      assert(batch.count() > 0, "fixture must produce matches")
      assert(got.count() == batch.count())
      assert(got.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("left-outer stream-stream attribution emits unmatched views once the watermark passes") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // base offset well past epoch 0: Spark's stream-stream join starts
    // with watermark = 0, and an outer-side row AT the initial watermark
    // is filtered as late — epoch-0 event times are the one fixture that
    // trips it (real event times are decades past it)
    val t = (m: Long) => new java.sql.Timestamp((100000L + m) * 60000L)
    val realViews = Seq(Ev(1L, 10L, t(0)), Ev(2L, 11L, t(5)))
    val realClicks = Seq(Ev(1L, 20L, t(30))) // user 2 never converts
    val batch = EventStreams.attributeClicksOuter(
      realViews.toDF().withColumnRenamed("id", "view_id"),
      realClicks.toDF().withColumnRenamed("id", "click_id"),
      horizonMinutes = 60)

    val vs = MemoryStream[Ev]
    val cs = MemoryStream[Ev]
    // sentinels far in the future advance BOTH watermarks past every
    // real view's [view_ts, view_ts + horizon] window so unmatched rows
    // flush; user -1 matches nothing
    vs.addData(realViews :+ Ev(-1L, 98L, t(100000)))
    cs.addData(realClicks :+ Ev(-1L, 99L, t(100000)))
    val streamed = EventStreams.attributeClicksOuter(
      vs.toDF().withColumnRenamed("id", "view_id"),
      cs.toDF().withColumnRenamed("id", "click_id"),
      horizonMinutes = 60)
    val q = streamed.writeStream.format("memory")
      .queryName("attr_outer_test").outputMode("append").start()
    try {
      q.processAllAvailable()
      // the watermark computed at the END of batch 1 takes effect in
      // batch 2 — push one more sentinel row so a second microbatch
      // actually runs and evicts/emits the unmatched view
      vs.addData(Seq(Ev(-1L, 96L, t(100001))))
      cs.addData(Seq(Ev(-1L, 97L, t(100001))))
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM attr_outer_test")
        .filter(col("user_id") =!= -1L)
      assert(batch.count() == 2L) // one match + one null-click row
      assert(batch.filter(col("click_id").isNull).count() == 1L)
      assert(got.count() == batch.count())
      assert(got.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("attribution horizon excludes older views") {
    val views = Seq(
      Ev(1L, 10L, new java.sql.Timestamp(0L)),          // 61 min before the click
      Ev(1L, 11L, new java.sql.Timestamp(60L * 60000L)) // 1 min before
    ).toDF().withColumnRenamed("id", "view_id")
    val clicks = Seq(Ev(1L, 20L, new java.sql.Timestamp(61L * 60000L)))
      .toDF().withColumnRenamed("id", "click_id")
    val out = EventStreams.attributeClicks(views, clicks, horizonMinutes = 60).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(11L))
  }

  test("dropDuplicatesWithinWatermark collapses replays with drifted timestamps") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = rowsOf(events.limit(200), "event_id")
    // replay every event 5 seconds later: dropDuplicates(key, ts) would
    // keep both; within-watermark key dedup must not
    val replayed = base.map(e => e.copy(ts = new java.sql.Timestamp(e.ts.getTime + 5000)))
    val src = MemoryStream[Ev]
    src.addData(base ++ replayed)
    val out = EventStreams.dedupKeyStream(
      src.toDF().withColumnRenamed("id", "event_id"))
    val q = out.writeStream.format("memory")
      .queryName("dedup_key_test").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(DISTINCT event_id) FROM dedup_key_test").head().getLong(0)
        == base.map(_.id).distinct.size)
      assert(spark.sql("SELECT count(*) FROM dedup_key_test").head().getLong(0)
        == base.map(_.id).distinct.size)
    } finally q.stop()
  }
}
