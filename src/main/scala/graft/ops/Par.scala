package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy fan-out stages. */
object Par {

  /** Ensure the DataFrame has at least the cluster's default parallelism
    * before a compute-heavy stage (hashing, shingling, vector math).
    *
    * Single-row-group parquet files yield ONE scan partition no matter how
    * many cores exist — the whole downstream pipeline would run on one
    * task. When the scan already provides enough splits (any real multi-
    * row-group / multi-file dataset, i.e. the 100 TB case) this is a
    * no-op and introduces NO shuffle; the round-robin repartition only
    * fires for pathologically under-split inputs, where shuffling a few
    * input MBs buys full-cluster compute parallelism. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
