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

  test("runningUserAgg in batch mode equals groupBy aggregate") {
    import spark.implicits._
    val ds = Seq(UserEvent(1, 1.5), UserEvent(1, 2.5), UserEvent(2, 7.0)).toDS()
    val out = EventStreams.runningUserAgg(ds).collect().map(a => a.user_id -> a).toMap
    assert(out(1L) == UserAgg(1L, 2, 4.0))
    assert(out(2L) == UserAgg(2L, 1, 7.0))
  }
}
