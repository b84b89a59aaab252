package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("asOf picks the latest right row at or before the left ts, null before any") {
    val left = Seq((1L, "u", 10L), (2L, "u", 20L), (3L, "u", 5L), (4L, "v", 50L))
      .toDF("event_id", "user_id", "ts_ms")
    val right = Seq(("u", 10L, 100L), ("u", 15L, 150L), ("w", 1L, 999L))
      .toDF("user_id", "ts_ms", "payload")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts_ms", "payload",
      leftCols = Seq("event_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out(1L).contains(100L)) // inclusive <= at equal ts
    assert(out(2L).contains(150L)) // latest of the two priors
    assert(out(3L).isEmpty)        // before any right row
    assert(out(4L).isEmpty)        // key with no right rows at all
  }

  test("asOf row count equals left row count (left-join semantics)") {
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
      .withColumn("ts_ms", expr("ts div 1000000"))
    val right = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_ms"), col("ts_ms").as("err_ms"))
    val out = AsOfJoin.asOf(ev.select(col("event_id"), col("user_id"), col("ts_ms")),
      right, "user_id", "ts_ms", "err_ms", leftCols = Seq("event_id"))
    assert(out.count() == ev.count())
  }
}
