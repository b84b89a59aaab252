package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{UserAgg, UserEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StatefulStreamingSpec extends SparkTestBase {

  test("mapGroupsWithState carries per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val q = EventStreams.runningUserAgg(input.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("stateful_test").start()
    try {
      input.addData(UserEvent(1, 1.0), UserEvent(1, 2.0), UserEvent(2, 5.0))
      q.processAllAvailable()
      input.addData(UserEvent(1, 3.0)) // second batch: state must carry over
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, max(n) AS n, max(total) AS t FROM stateful_test GROUP BY 1")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(rows(1L) == ((3L, 6.0))) // 2 events batch 1 + 1 event batch 2
      assert(rows(2L) == ((1L, 5.0)))
    } finally q.stop()
  }

  test("sessionizeStream: gap-closed sessions match batch sessionize") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStreams.SessEvent
    // day-1 base: an event AT the initial watermark (epoch 0) would be
    // filtered as late by the stateful operator's late-row predicate
    def ts(min: Long) = new java.sql.Timestamp((1440 + min) * 60000L)
    val input = MemoryStream[SessEvent]
    val q = EventStreams.sessionizeStream(input.toDS(), gapMinutes = 30)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_stream").start()
    try {
      // batch 1: u1 opens a session (0,10); u2 a singleton (5)
      input.addData(SessEvent(1, ts(0), 1.0), SessEvent(1, ts(10), 2.0),
        SessEvent(2, ts(5), 7.0))
      q.processAllAvailable()
      // batch 2: u1 extends within gap across the batch boundary; the
      // sentinel user advances the watermark far past everyone
      input.addData(SessEvent(1, ts(20), 4.0), SessEvent(99, ts(1000), 0.0))
      q.processAllAvailable()
      // batch 3: timeouts fire against the advanced watermark
      input.addData(SessEvent(99, ts(1001), 0.0))
      q.processAllAvailable()
      val got = spark.sql(
        """SELECT user_id, session_start_ms, session_end_ms, n_events, total_value
           FROM sess_stream WHERE user_id < 99 ORDER BY user_id""")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      // batch reference over the same (non-sentinel) events
      val batch = graft.operators.Events.sessionize(
        Seq((1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(20), 4.0), (2L, ts(5), 7.0))
          .toDF("user_id", "ts", "value"), gapMinutes = 30)
        .select("user_id", "session_start_ms", "session_end_ms", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .sortBy(_._1)
      assert(got.toSeq == batch.toSeq)
      val base = 1440L * 60000L
      assert(got.toSeq == Seq(
        (1L, base, base + 1200000L, 3L, 7.0), // one merged session spanning both batches
        (2L, base + 300000L, base + 300000L, 1L, 7.0)))
    } finally q.stop()
  }

  test("property: streaming sessions equal batch sessions on random event sets") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStreams.SessEvent
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val base = 1440L * 60000L
    val eventGen = for {
      user <- Gen.choose(1L, 3L)
      minute <- Gen.choose(0L, 300L)
      value <- Gen.choose(1, 9) // integer-valued doubles: exact sums
    } yield (user, minute, value.toDouble)
    var round = 0
    val prop = Prop.forAll(Gen.listOfN(25, eventGen), Gen.choose(1, 3)) {
      (evs, nBatches) =>
        round += 1
        val sorted = evs.sortBy(_._2)
        val input = MemoryStream[SessEvent]
        val qn = s"sess_prop_$round"
        val q = EventStreams.sessionizeStream(input.toDS(), gapMinutes = 30)
          .writeStream.outputMode(OutputMode.Append())
          .format("memory").queryName(qn).start()
        try {
          // time-ordered batch splits keep every event ahead of the
          // watermark, matching batch semantics (no late drops)
          sorted.grouped(math.max(1, sorted.size / nBatches)).foreach { chunk =>
            input.addData(chunk.map(e =>
              SessEvent(e._1, new java.sql.Timestamp(base + e._2 * 60000L), e._3)))
            q.processAllAvailable()
          }
          input.addData(SessEvent(99, new java.sql.Timestamp(base + 100000L * 60000L), 0.0))
          q.processAllAvailable()
          input.addData(SessEvent(99, new java.sql.Timestamp(base + 100001L * 60000L), 0.0))
          q.processAllAvailable()
          val got = spark.table(qn).filter($"user_id" < 99)
            .select("user_id", "session_start_ms", "session_end_ms", "n_events", "total_value")
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
            .sorted.toSeq
          val want =
            if (evs.isEmpty) Seq.empty
            else graft.operators.Events.sessionize(
              sorted.map(e => (e._1, new java.sql.Timestamp(base + e._2 * 60000L), e._3))
                .toDF("user_id", "ts", "value"), gapMinutes = 30)
              .select("user_id", "session_start_ms", "session_end_ms", "n_events", "total_value")
              .collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
              .sorted.toSeq
          got == want
        } finally q.stop()
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(r.passed, r.status.toString)
  }

  test("runningUserAgg in batch mode equals groupBy aggregate") {
    import spark.implicits._
    val ds = Seq(UserEvent(1, 1.5), UserEvent(1, 2.5), UserEvent(2, 7.0)).toDS()
    val out = EventStreams.runningUserAgg(ds).collect().map(a => a.user_id -> a).toMap
    assert(out(1L) == UserAgg(1L, 2, 4.0))
    assert(out(2L) == UserAgg(2L, 1, 7.0))
  }
}
