package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (temporal) join: for each left row, attach the right row nearest
 * in time within the same key — the standard event-to-state join Spark
 * has no built-in for. Three directions:
 *
 *  - `backward` (default): latest right with `right.ts <= left.ts`
 *  - `forward`:  earliest right with `right.ts >= left.ts`
 *  - `nearest`:  whichever of the two is closer (ties → backward)
 *
 * Implementation is the union+window composition (preference (a) of the
 * build rules — no custom physical operator needed): tag both sides,
 * union, one window pass per key ordered by (ts, side) with a running
 * `last(payload, ignoreNulls)` carrying the adjacent right payload,
 * then keep left rows. `forward` is the same pass over descending time;
 * `nearest` evaluates both passes — still ONE shuffle, the two sorts
 * share the key partitioning. Big-to-big safe (no broadcast, no range
 * explosion), skew bounded by per-key event counts. Ties at equal ts
 * resolve right-before-left, giving inclusive `<=`/`>=` semantics —
 * identical to DuckDB's ASOF LEFT JOIN, which the oracles use.
 */
object AsOfJoin {

  /** Left rows keep `leftCols`; the carried right payload surfaces as
    * `asof_<valueCol>` (null when no right row qualifies). */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      leftCols: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val l = left.select(
      (leftCols.map(col) :+ col(keyCol) :+ col(tsCol) :+ lit(1).as("__side") :+
        lit(null).cast(right.schema(valueCol).dataType).as("__rv")): _*)
    val r = right.select(
      (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(keyCol) :+ col(tsCol) :+ lit(0).as("__side") :+
        col(valueCol).as("__rv")): _*)
    // right payload with its timestamp, null on left rows, so one
    // ignoreNulls-last per pass carries (value, ts) together
    val payload = when(col("__side") === 0,
      struct(col(tsCol).as("__rts"), col("__rv"))).otherwise(lit(null))
    val wB = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy(keyCol).orderBy(col(tsCol).desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried: Column = direction match {
      case "backward" => last(payload, ignoreNulls = true).over(wB)
      case "forward"  => last(payload, ignoreNulls = true).over(wF)
      case "nearest" =>
        // numeric distance without precision loss: timestamps compare in
        // microseconds (a bare cast("long") would truncate to SECONDS
        // and pick the farther neighbor at sub-second granularity)
        val toNum: Column => Column = left.schema(tsCol).dataType match {
          case org.apache.spark.sql.types.TimestampType => unix_micros _
          case _ => (c: Column) => c.cast("long")
        }
        val b = last(payload, ignoreNulls = true).over(wB)
        val f = last(payload, ignoreNulls = true).over(wF)
        when(b.isNull, f).when(f.isNull, b)
          .when(toNum(col(tsCol)) - toNum(b.getField("__rts")) <=
            toNum(f.getField("__rts")) - toNum(col(tsCol)), b)
          .otherwise(f)
    }
    l.unionByName(r)
      .withColumn("__asof", carried.getField("__rv"))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) :+ col(keyCol) :+ col(tsCol) :+
        col("__asof").as(s"asof_$valueCol")): _*)
  }
}
