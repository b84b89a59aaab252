package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics over the `events` table (batch side; the
 * streaming renditions live in graft.streaming.EventStreams).
 *
 * Scale notes: sessionization is one shuffle (partitionBy user) and runs
 * as a single window stage; tumbling aggregation is a plain partial+final
 * hash aggregate. Timestamps surface as epoch millis so results are
 * timezone-representation-proof across engines.
 */
object Events {

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. Output is one
    * row per session with bounds and counts. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val withGap = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMinutes * 60000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withGap
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_millis(min(col("ts"))).as("session_start_ms"),
        unix_millis(max(col("ts"))).as("session_end_ms"),
        round(sum(col("value")), 4).as("total_value"))
  }

  /** Tumbling-window aggregation: events per (hour, event_type). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(
        unix_millis(date_trunc("hour", col("ts"))).as("window_start_ms"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))

  /** Per-user running aggregates (event index + cumulative value). */
  def runningTotals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events.select(
      col("event_id"), col("user_id"),
      row_number().over(w).as("event_idx"),
      round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 4)
        .as("running_value"))
  }

  /** Sessionization via the built-in `session_window` (gap-merged
    * windows) — the declarative alternative to the lag/cumsum form that
    * also runs under Structured Streaming with a watermark. */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        col("n_events"), col("total_value"))

  /** Top-N event types per user by count (rank + filter — the classic
    * grouped top-k that stays one shuffle). */
  def topEventTypes(events: DataFrame, n: Int = 2): DataFrame = {
    val counts = events.groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("user_id").orderBy(col("cnt").desc, col("event_type").asc)
    counts.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= n)
  }
}
