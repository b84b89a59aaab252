package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("intervalJoin equals the naive theta join on random intervals") {
    val rng = new scala.util.Random(42)
    val points = (1 to 300).map(i => (i.toLong, rng.nextInt(10000).toLong))
      .toDF("pid", "ts")
    val intervals = (1 to 80).map { i =>
      val s = rng.nextInt(9000).toLong
      (i.toLong, s, s + rng.nextInt(800).toLong)
    }.toDF("iid", "s", "e")
    val fast = RangeJoin.intervalJoin(points, intervals, "ts", "s", "e", chunkWidth = 500L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, $"ts" >= $"s" && $"ts" <= $"e")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive && naive.nonEmpty)
  }

  test("intervalJoin plans as an equi-join, not a nested loop") {
    val points = Seq((1L, 10L)).toDF("pid", "ts")
    val intervals = Seq((1L, 5L, 15L)).toDF("iid", "s", "e")
    val plan = RangeJoin.intervalJoin(points, intervals, "ts", "s", "e", chunkWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
    // the naive form really does degrade to a nested loop — the thing
    // this operator exists to avoid
    val naivePlan = points.join(intervals, $"ts" >= $"s" && $"ts" <= $"e")
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"))
  }

  test("property: parity with naive join holds for any chunk width") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rng = new scala.util.Random(7)
    val points = (1 to 120).map(i => (i.toLong, rng.nextInt(2000).toLong)).toDF("pid", "ts")
    val intervals = (1 to 40).map { i =>
      val s = rng.nextInt(1900).toLong
      (i.toLong, s, s + rng.nextInt(300).toLong)
    }.toDF("iid", "s", "e")
    points.cache(); intervals.cache()
    val naive = points.join(intervals, $"ts" >= $"s" && $"ts" <= $"e")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prop = Prop.forAll(Gen.oneOf(1L, 3L, 17L, 100L, 250L, 1000L, 10000L)) { w =>
      RangeJoin.intervalJoin(points, intervals, "ts", "s", "e", chunkWidth = w)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet == naive
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(7), prop)
    points.unpersist(); intervals.unpersist()
    assert(r.passed, r.status.toString)
  }

  test("boundary containment is inclusive on both ends") {
    val points = Seq((1L, 5L), (2L, 15L), (3L, 4L), (4L, 16L)).toDF("pid", "ts")
    val intervals = Seq((7L, 5L, 15L)).toDF("iid", "s", "e")
    val hits = RangeJoin.intervalJoin(points, intervals, "ts", "s", "e", chunkWidth = 7L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L))
  }

  test("an interval spanning more than 10000 chunks fails with guidance") {
    // Spark's sequence() caps at 10000 elements; one outlier interval
    // must raise the operator's actionable error, not sequence's opaque one
    val points = Seq((1L, 5L)).toDF("pid", "ts")
    val intervals = Seq((7L, 0L, 200000L)).toDF("iid", "s", "e")
    val e = intercept[Exception](
      RangeJoin.intervalJoin(points, intervals, "ts", "s", "e", chunkWidth = 10L)
        .write.mode("overwrite").format("noop").save())
    val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.toString
    assert(msg.contains("intervalJoin") && msg.contains("chunkWidth"))
    // the same span with an adequate chunkWidth runs fine
    assert(RangeJoin.intervalJoin(points, intervals, "ts", "s", "e",
      chunkWidth = 100L).count() == 1)
  }
}
