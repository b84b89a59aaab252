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

  /** SALTED equi-join for a skewed fact key against a small dimension —
    * the shuffle-join skew fix when the dim side is too big (or the
    * join too mid-plan) for a broadcast and AQE's skew split can't see
    * the stage: every dim row replicates `saltBuckets` ways with an
    * explicit salt, every fact row picks ONE deterministic salt from
    * `saltFrom`, and the join key becomes (key, salt) — a hot key's
    * rows now spread over `saltBuckets` reducers instead of one.
    * Result identical to the plain join (each fact row meets exactly
    * its salt's dim replica); dim cost is `saltBuckets`× replication,
    * the standard trade. Fact columns pass through + the dim's
    * non-key columns. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keyCol: String,
      saltFrom: Column,
      saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val dimR = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    fact
      .withColumn("__salt", pmod(xxhash64(saltFrom), lit(saltBuckets.toLong)))
      .join(dimR, Seq(keyCol, "__salt"))
      .drop("__salt")
  }
}
