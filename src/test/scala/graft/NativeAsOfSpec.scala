package graft

import graft.operators.AsOfJoin
import graft.plans.{AsOfJoinExec, NativeAsOf}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** The custom as-of physical operator: plan shape, equivalence with the
  * window composition, and merge edge cases. */
class NativeAsOfSpec extends SparkTestBase with AdaptiveSparkPlanHelper {
  import spark.implicits._

  // raw parquet ts is TIMESTAMP_NTZ; unix_millis needs TIMESTAMP
  private def events() = spark.read.parquet(s"${sf()}/events.parquet")
    .withColumn("ts", col("ts").cast("timestamp"))

  test("plans as AsOfJoinExec with exchanges/sorts supplied by Catalyst") {
    val ev = events().withColumn("ts_ms", unix_millis(col("ts")))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_ms"), col("ts_ms").as("err_ms"))
    val out = NativeAsOf.asOf(
      ev.select("event_id", "user_id", "ts_ms"), errors,
      keyCol = "user_id", tsCol = "ts_ms", valueCol = "err_ms",
      leftCols = Seq("event_id"))
    out.collect() // force AQE to finalize the plan
    val plan = out.queryExecution.executedPlan
    val execs = collectWithSubqueries(plan) { case e: AsOfJoinExec => e }
    assert(execs.nonEmpty, s"no AsOfJoinExec in:\n$plan")
    // Catalyst supplied the SMJ-style requirements: both children sorted
    val e = execs.head
    assert(e.left.outputOrdering.nonEmpty && e.right.outputOrdering.nonEmpty)
  }

  test("differential: native exec equals the union+window composition") {
    val ev = events().withColumn("ts_ms", unix_millis(col("ts")))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_ms"), col("ts_ms").as("err_ms"))
    val native = NativeAsOf.asOf(
      ev.select("event_id", "user_id", "ts_ms"), errors,
      keyCol = "user_id", tsCol = "ts_ms", valueCol = "err_ms",
      leftCols = Seq("event_id"))
    val composed = AsOfJoin.asOf(
      left = ev.select(col("event_id"), col("user_id"), col("ts_ms")),
      right = errors.select(col("user_id"), col("ts_ms"),
        col("err_ms")),
      keyCol = "user_id", tsCol = "ts_ms", valueCol = "err_ms",
      leftCols = Seq("event_id"))
    assert(native.schema.fieldNames.toSeq ==
      composed.schema.fieldNames.toSeq)
    assert(native.exceptAll(composed).isEmpty &&
      composed.exceptAll(native).isEmpty)
  }

  test("merge edges: no match, null keys/ts, tie at equal ts, key gaps") {
    val left = Seq(
      (1L, 10L, 100L), // before any right row -> null
      (2L, 10L, 205L), // between rights -> 200
      (3L, 10L, 300L), // exact tie -> 300 (inclusive)
      (4L, 20L, 150L), // key with no right rows -> null
      (5L, 30L, 500L), // key after right's keys -> null
      (6L, -1L, 400L) // null-ish? no: plain key with right row below
    ).toDF("event_id", "user_id", "ts_ms")
    val right = Seq(
      (10L, 200L, 200L), (10L, 300L, 300L),
      (-1L, 350L, 350L),
      (25L, 100L, 100L) // key never asked for
    ).toDF("user_id", "ts_ms", "err_ms")
    val out = NativeAsOf.asOf(left, right, "user_id", "ts_ms", "err_ms",
      Seq("event_id")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(200L))
    assert(out(3L).contains(300L))
    assert(out(4L).isEmpty)
    assert(out(5L).isEmpty)
    assert(out(6L).contains(350L))
    // null key / null ts on the left never match
    val withNulls = Seq(
      (7L, Option.empty[Long], Option(100L)),
      (8L, Option(10L), Option.empty[Long]))
      .toDF("event_id", "user_id", "ts_ms")
    val out2 = NativeAsOf.asOf(withNulls, right, "user_id", "ts_ms",
      "err_ms", Seq("event_id")).collect()
    assert(out2.forall(_.isNullAt(3)))
  }

  test("forward direction: earliest right at-or-after, differential") {
    val ev = events().withColumn("ts_ms", unix_millis(col("ts")))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_ms"), col("ts_ms").as("err_ms"))
    val native = NativeAsOf.asOf(
      ev.select("event_id", "user_id", "ts_ms"), errors,
      keyCol = "user_id", tsCol = "ts_ms", valueCol = "err_ms",
      leftCols = Seq("event_id"), direction = "forward")
    val composed = AsOfJoin.asOf(
      left = ev.select(col("event_id"), col("user_id"), col("ts_ms")),
      right = errors.select(col("user_id"), col("ts_ms"), col("err_ms")),
      keyCol = "user_id", tsCol = "ts_ms", valueCol = "err_ms",
      leftCols = Seq("event_id"), direction = "forward")
    assert(native.exceptAll(composed).isEmpty &&
      composed.exceptAll(native).isEmpty)
    // hand edge: exact tie matches (inclusive), later rights skipped
    val l = Seq((1L, 10L, 200L), (2L, 10L, 201L), (3L, 10L, 999L))
      .toDF("event_id", "user_id", "ts_ms")
    val r = Seq((10L, 200L, 200L), (10L, 300L, 300L))
      .toDF("user_id", "ts_ms", "err_ms")
    val out = NativeAsOf.asOf(l, r, "user_id", "ts_ms", "err_ms",
      Seq("event_id"), direction = "forward").collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(3)) None else Some(x.getLong(3)))).toMap
    assert(out(1L).contains(200L)) // inclusive tie
    assert(out(2L).contains(300L)) // next one forward
    assert(out(3L).isEmpty) // nothing after
  }

  test("asOfMulti: k payload columns ride the same matched row") {
    // differential vs k independent single-value native runs — every
    // asof_<col> must come from the SAME matched right row
    val ev = events().withColumn("ts_ms", unix_millis(col("ts")))
    val errors = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts_ms"))
      .agg(max(col("event_id")).as("err_event_id"),
        max_by(col("value"), col("event_id")).as("err_value"))
      .withColumn("err_ms", col("ts_ms"))
    val multi = NativeAsOf.asOfMulti(
      ev.select("event_id", "user_id", "ts_ms"), errors,
      keyCol = "user_id", tsCol = "ts_ms",
      valueCols = Seq("err_ms", "err_event_id", "err_value"),
      leftCols = Seq("event_id"))
    assert(multi.schema.fieldNames.toSeq == Seq("event_id", "user_id",
      "ts_ms", "asof_err_ms", "asof_err_event_id", "asof_err_value"))
    for (vc <- Seq("err_ms", "err_event_id", "err_value")) {
      val single = NativeAsOf.asOf(
        ev.select("event_id", "user_id", "ts_ms"), errors,
        keyCol = "user_id", tsCol = "ts_ms", valueCol = vc,
        leftCols = Seq("event_id"))
      val m = multi.select(col("event_id"), col("user_id"), col("ts_ms"),
        col(s"asof_$vc"))
      assert(m.exceptAll(single).isEmpty && single.exceptAll(m).isEmpty,
        s"multi disagrees with single-value run on $vc")
    }
    // hand case incl. the miss path: ALL payload columns null together
    val l = Seq((1L, 10L, 100L), (2L, 10L, 250L))
      .toDF("event_id", "user_id", "ts_ms")
    val r = Seq((10L, 200L, 7L, 0.5)).toDF("user_id", "ts_ms", "rid", "rv")
    val out = NativeAsOf.asOfMulti(l, r, "user_id", "ts_ms",
      Seq("rid", "rv"), Seq("event_id")).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(out(1L).isNullAt(3) && out(1L).isNullAt(4))
    assert(out(2L).getLong(3) == 7L && out(2L).getDouble(4) == 0.5)
  }

  test("string keys merge correctly") {
    val left = Seq(("a", 5L, 1L), ("b", 5L, 2L), ("c", 5L, 3L))
      .toDF("k", "ts", "id")
    val right = Seq(("a", 1L, 11L), ("b", 9L, 22L), ("c", 2L, 33L))
      .toDF("k", "ts", "v")
    val out = NativeAsOf.asOf(left, right, "k", "ts", "v", Seq("id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out(1L).contains(11L) && out(2L).isEmpty && out(3L).contains(33L))
  }
}
