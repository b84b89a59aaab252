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

  test("forward and nearest directions") {
    val left = Seq((1L, "u", 10L), (2L, "u", 20L), (3L, "u", 12L))
      .toDF("event_id", "user_id", "ts_ms")
    val right = Seq(("u", 10L, 100L), ("u", 15L, 150L), ("u", 30L, 300L))
      .toDF("user_id", "ts_ms", "payload")
    def run(dir: String) = AsOfJoin.asOf(left, right, "user_id", "ts_ms", "payload",
      leftCols = Seq("event_id"), direction = dir)
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val fwd = run("forward")
    assert(fwd(1L).contains(100L)) // inclusive >= at equal ts
    assert(fwd(2L).contains(300L)) // earliest at-or-after
    assert(fwd(3L).contains(150L))
    val near = run("nearest")
    assert(near(1L).contains(100L)) // distance 0 backward
    assert(near(2L).contains(150L)) // |20-15|=5 < |30-20|=10
    assert(near(3L).contains(100L)) // |12-10|=2 < |12-15|=3 -> backward wins
  }

  test("asOf row count equals left row count (left-join semantics)") {
    val ev = graft.operators.Events.normalizeEventTs(
        spark.read.parquet(s"${sf()}/events.parquet"))
      .withColumn("ts_ms", unix_millis(col("ts")))
    val right = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_ms"), col("ts_ms").as("err_ms"))
    val out = AsOfJoin.asOf(ev.select(col("event_id"), col("user_id"), col("ts_ms")),
      right, "user_id", "ts_ms", "err_ms", leftCols = Seq("event_id"))
    assert(out.count() == ev.count())
  }
}
