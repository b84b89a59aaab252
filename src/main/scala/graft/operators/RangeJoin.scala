package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Interval (range-containment) join: match point rows to the interval
 * rows whose `[start, end]` contains them.
 *
 * Spark has no native range-join optimization — a bare
 * `p.join(i, p.ts >= i.start && p.ts <= i.end)` plans as
 * BroadcastNestedLoopJoin (or a full cartesian when neither side fits
 * in a broadcast): O(|points|·|intervals|) comparisons, the classic
 * scale cliff. This operator bucketizes instead:
 *
 *  - the domain is cut into fixed-width chunks;
 *  - an interval is exploded to every chunk its span touches
 *    (`sequence(start div W, end div W)` — integer division, exact);
 *  - a point lives in exactly ONE chunk;
 *  - the match becomes a chunk EQUI-join — one keyed shuffle whose key
 *    cardinality grows with the data (even partitioning) — plus the
 *    residual containment predicate.
 *
 * Cost: the interval side inflates by ≈ len/W + 1 rows; points never
 * inflate. Pick `chunkWidth` near the median interval length — much
 * smaller explodes the interval side, much larger degrades each chunk
 * toward a local cross product. Skewed hot chunks (many intervals
 * covering one chunk) fall under AQE's skew-join splitting since the
 * join is a plain equi-join.
 */
object RangeJoin {

  /**
   * Inner interval-containment join. `points`/`intervals` must not share
   * column names (select/alias first); the bound columns must be
   * integral (epoch millis or similar).
   */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      chunkWidth: Long): DataFrame = {
    require(chunkWidth > 0, "chunkWidth must be positive")
    def chunkOf(name: String): Column = expr(s"`$name` div ${chunkWidth}L")
    val p = points.withColumn("_graft_chunk", chunkOf(pointCol))
    // Spark's `sequence` caps at 10000 elements: ONE outlier interval
    // spanning > 10000·chunkWidth would otherwise kill the whole job
    // with sequence's opaque length error. Guard per row with the
    // actionable message (CaseWhen branches evaluate lazily, so the
    // sequence is never built for an oversized span).
    val nChunks = chunkOf(endCol) - chunkOf(startCol) + lit(1L)
    val i = intervals.withColumn("_graft_chunk",
      explode(when(nChunks <= lit(10000L), sequence(chunkOf(startCol), chunkOf(endCol)))
        .otherwise(raise_error(concat(
          lit("intervalJoin: interval ["), col(startCol).cast("string"),
          lit(", "), col(endCol).cast("string"),
          lit(s"] spans "), nChunks.cast("string"),
          lit(s" chunks of width $chunkWidth (cap 10000) - raise chunkWidth "
            + "or split outlier intervals"))))))
    p.join(i, Seq("_graft_chunk"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_graft_chunk")
  }
}
