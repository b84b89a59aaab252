package graft

import graft.operators.Events
import java.sql.Timestamp

/** Holt linear-trend smoothing: coefficient unrolling vs the direct
  * recursion, plus operator edge cases. */
class HoltSpec extends SparkTestBase {
  import spark.implicits._

  private def r(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("holtCoeffs: coefficient form equals the direct recursion") {
    val (alpha, beta) = (0.5, 0.3)
    val ys = Array(3.0, 7.0, 4.0, 9.0, 6.0) // oldest..newest
    for (m <- 1 to ys.length) {
      val y = ys.take(m)
      // direct recursion
      var (l, b) = (y(0), if (m > 1) y(1) - y(0) else 0.0)
      for (t <- 1 until m) {
        val lNew = alpha * y(t) + (1 - alpha) * (l + b)
        b = beta * (lNew - l) + (1 - beta) * b
        l = lNew
      }
      val (cL, cB) = Events.holtCoeffs(alpha, beta, m)
      val lC = (0 until m).map(i => cL(i) * y(i)).sum
      val bC = (0 until m).map(i => cB(i) * y(i)).sum
      assert(math.abs(lC - l) < 1e-9, s"level m=$m")
      assert(math.abs(bC - b) < 1e-9, s"trend m=$m")
    }
  }

  test("holtForecast: hand-checked series, trend projects the drift") {
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 10.0, 1L),
      (1L, Timestamp.valueOf("2024-01-01 01:00:00"), 20.0, 2L),
      (1L, Timestamp.valueOf("2024-01-01 02:00:00"), 30.0, 3L),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00"), 5.0, 4L))
      .toDF("user_id", "ts", "value", "event_id")
    val out = Events.holtForecast(ev, alpha = 0.5, beta = 0.3,
      lastN = 8, horizon = 3)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4))).toMap
    // key 1: y = 10,20,30 — a perfect +10 trend keeps l_t = y_t, b = 10
    val (cL, cB) = Events.holtCoeffs(0.5, 0.3, 3)
    val y = Array(10.0, 20.0, 30.0)
    val lvl = (0 until 3).map(i => r(cL(i) * y(i), 9)).sum
    val tr = (0 until 3).map(i => r(cB(i) * y(i), 9)).sum
    assert(out(1L)._1 == 3L)
    assert(out(1L)._2 == r(lvl, 6) && out(1L)._2 == 30.0)
    assert(out(1L)._3 == r(tr, 6) && out(1L)._3 == 10.0)
    assert(out(1L)._4 == 60.0) // 30 + 3*10
    // key 2: single value -> level = y, trend 0, flat forecast
    assert(out(2L) == ((1L, 5.0, 0.0, 5.0)))
  }

  test("holtForecast: nulls are excluded, lastN truncates history") {
    val ev = (1 to 12).map(i =>
      (1L, Timestamp.valueOf(f"2024-01-01 ${i - 1}%02d:00:00"),
        if (i == 12) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf(i.toDouble), i.toLong))
      .toDF("user_id", "ts", "value", "event_id")
    val out = Events.holtForecast(ev, alpha = 0.5, beta = 0.3,
      lastN = 4, horizon = 1).collect()
    assert(out.length == 1)
    // newest non-null 4 values: 8,9,10,11 — pure +1 trend
    assert(out.head.getLong(1) == 4L)
    assert(out.head.getDouble(2) == 11.0 && out.head.getDouble(3) == 1.0)
    assert(out.head.getDouble(4) == 12.0)
  }
}
