package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted two-phase aggregation for skewed group keys.
 *
 * A plain `groupBy(k).agg(...)` hashes every row of a hot key to ONE
 * reducer; with few distinct keys (or a heavy-hitter key) that reducer
 * becomes the straggler. Salting splits each key into `saltBuckets`
 * sub-keys for the partial phase, then combines the partials in a second
 * (tiny) aggregation. Results are identical for decomposable aggregates
 * (sum/count/min/max).
 *
 * Spark's map-side partial aggregation already covers mild skew; salting
 * matters when the partial results themselves are large (high-cardinality
 * sub-aggregations, collect-style states) or when AQE's skew handling
 * can't kick in (single-stage aggs). Exposed as a library op so pipelines
 * can opt in per-aggregation.
 */
object SkewAgg {

  /** count + sum(valueCol) per key, salted. Deterministic salt from an id
    * column (not rand()) keeps the plan reproducible and retry-safe. */
  def saltedCountSum(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltFrom: Column,
      saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltFrom), lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).cast("long").as("n"),
        round(sum(col("__s")), 4).as("total"))
}
