package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table helpers: pre-shuffle a table ONCE at write time so that
 * every later equi-join/aggregation on the bucket key runs shuffle-free.
 *
 * At 100 TB this is the difference between re-shuffling the fact table on
 * every join versus paying the partitioning cost once: two tables
 * bucketed by the same key into the same bucket count join with NO
 * Exchange on either side (verified by BucketingSpec against the physical
 * plan). Use for the stable join spine (orders⋈lineitem by orderkey,
 * nodes⋈edges by id); `sortBy` within buckets additionally enables
 * sort-merge joins without a sort step.
 */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // the in-memory catalog forgets tables across sessions but the
    // warehouse directory persists — clear both or CREATE TABLE fails
    // with LOCATION_ALREADY_EXISTS
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** Equi-join two registered bucketed tables on their bucket keys. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
