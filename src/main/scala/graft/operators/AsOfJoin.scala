package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (temporal) join: for each left row, attach the latest right row
 * with `right.ts <= left.ts` within the same key — the standard
 * event-to-most-recent-state join Spark has no built-in for.
 *
 * Implementation is the union+window composition (preference (a) of the
 * build rules — no custom physical operator needed): tag both sides,
 * union, one window pass per key ordered by (ts, side) with a running
 * `last(value, ignoreNulls)` carrying the most recent right payload
 * forward, then keep left rows. Cost: ONE shuffle on the join key for
 * both sides together — big-to-big safe (no broadcast, no range
 * explosion), skew bounded by per-key event counts. Ties at equal ts
 * resolve right-before-left, giving inclusive `<=` semantics — identical
 * to DuckDB's ASOF LEFT JOIN, which the oracle uses.
 */
object AsOfJoin {

  /** Left rows keep `leftCols`; the carried right payload surfaces as
    * `asof_<valueCol>` (null when no right row precedes the left row). */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      leftCols: Seq[String]): DataFrame = {
    val l = left.select(
      (leftCols.map(col) :+ col(keyCol) :+ col(tsCol) :+ lit(1).as("__side") :+
        lit(null).cast(right.schema(valueCol).dataType).as("__rv")): _*)
    val r = right.select(
      (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(keyCol) :+ col(tsCol) :+ lit(0).as("__side") :+
        col(valueCol).as("__rv")): _*)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) :+ col(keyCol) :+ col(tsCol) :+
        col("__asof").as(s"asof_$valueCol")): _*)
  }
}
