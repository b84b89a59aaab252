package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Load statistics — the reference's `Neo4jResult(count, nbytes, kind)`
  * namedtuple (neo4j_beam/_dofn.py:21); kind ∈ {node, edge, final}. */
final case class LoadResult(count: Long, nbytes: Long, kind: String) {
  /** Monoid combine — sum counts/bytes, keep the kind (sum_results,
    * _dofn.py:34-47). */
  def |+|(other: LoadResult): LoadResult =
    LoadResult(count + other.count, nbytes + other.nbytes, kind)
}

object Stats {

  /** A1: global combine of per-row stats into one LoadResult.
    * The reference folds per-batch `Neo4jResult`s with a CombineGlobally
    * (pipeline.py:66,81) — Beam lifts that into partial+final combines,
    * which is exactly what Spark's HashAggregate(partial) → Exchange →
    * HashAggregate(final) does for `sum`. `nbytesCol` is the per-row
    * payload size (we define nbytes as the sum of an explicit size column
    * — see ParquetWireSink for the wire-bytes accounting). */
  def sumResults(df: DataFrame, nbytesCol: String, kind: String): DataFrame =
    df.agg(
        count(lit(1)).as("count"),
        coalesce(sum(col(nbytesCol)), lit(0L)).cast("long").as("nbytes"))
      .withColumn("kind", lit(kind))

  /** A2: rewrite kind to "final" (pipeline.py:92-93). */
  def asFinal(df: DataFrame): DataFrame =
    df.withColumn("kind", lit("final"))

  /** U1: union stats streams then combine (pipeline.py:88-93). */
  def combineFinal(stats: Seq[DataFrame]): DataFrame = {
    val unioned = stats.reduce(_.unionByName(_))
    asFinal(
      unioned.agg(
        sum(col("count")).cast("long").as("count"),
        sum(col("nbytes")).cast("long").as("nbytes")))
  }

  /** The LoadResult monoid as a typed `Aggregator` — the Spark-idiomatic
    * surface for the reference's `sum_results` CombineFn (_dofn.py:34-47):
    * usable on `Dataset[LoadResult]` via `.select(statsAggregator.toColumn)`
    * with map-side partial combine, exactly CombineGlobally's contract. */
  def statsAggregator(kind: String): org.apache.spark.sql.expressions.Aggregator[LoadResult, LoadResult, LoadResult] =
    new org.apache.spark.sql.expressions.Aggregator[LoadResult, LoadResult, LoadResult] {
      override def zero: LoadResult = LoadResult(0L, 0L, kind)
      override def reduce(b: LoadResult, a: LoadResult): LoadResult = b |+| a
      override def merge(b1: LoadResult, b2: LoadResult): LoadResult = b1 |+| b2
      override def finish(r: LoadResult): LoadResult = r
      override def bufferEncoder: org.apache.spark.sql.Encoder[LoadResult] =
        org.apache.spark.sql.Encoders.product[LoadResult]
      override def outputEncoder: org.apache.spark.sql.Encoder[LoadResult] =
        org.apache.spark.sql.Encoders.product[LoadResult]
    }

  /** Typed variant for driver-side folding of already-collected rows. */
  def fold(results: Seq[LoadResult], kind: String): LoadResult =
    results.foldLeft(LoadResult(0L, 0L, kind))(_ |+| _)

  def toDataset(spark: SparkSession, rs: Seq[LoadResult]): Dataset[LoadResult] = {
    import spark.implicits._
    spark.createDataset(rs)
  }
}
