package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
    * input MBs buys full-cluster compute parallelism.
    *
    * The split-count probe reads the scan relations' FILE INDEX (total
    * bytes → Spark's own maxSplitBytes packing formula) instead of
    * materializing `df.rdd`: an RDD probe physical-plans the whole frame
    * and builds its lineage on the driver — twice per operator that
    * fans out both sides of a self-join, measurable plan-time overhead
    * on wide plans. Only frames with no file relation at all (in-memory
    * test data) fall back to the RDD probe. */
  def fanOut(df: DataFrame): DataFrame = {
    // streaming frames: parallelism is the source's concern (maxFilesPerTrigger
    // / partition count), and both probes below are batch-only (an RDD
    // probe on a streaming frame throws). The operators stay usable
    // unchanged under readStream.
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val underSplit = fileSplitEstimate(df) match {
      case Some(estSplits) => estSplits < target
      case None => df.rdd.getNumPartitions < target
    }
    if (underSplit) df.repartition(target) else df
  }

  /** Estimated FileScan split count for a file-backed frame, from the
    * scan relations' FILE INDEX (total bytes → Spark's own
    * FilePartition.maxSplitBytes packing formula) — no physical
    * planning, no RDD materialization. Ignoring per-file boundaries
    * UNDERestimates splits, which errs toward repartitioning in
    * [[fanOut]] — the cheap, safe direction for small inputs. `None`
    * for frames with no file relation (in-memory test data). */
  def fileSplitEstimate(df: DataFrame): Option[Long] = {
    val spark = df.sparkSession
    val fileRels = df.queryExecution.analyzed.collect {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        l.relation.asInstanceOf[HadoopFsRelation]
    }
    if (fileRels.isEmpty) None
    else {
      val conf = spark.sessionState.conf
      val target = spark.sparkContext.defaultParallelism
      val totalBytes = fileRels.map(_.location.sizeInBytes).sum.max(1L)
      val bytesPerCore = (totalBytes / target).max(1L)
      val maxSplitBytes =
        math.min(conf.filesMaxPartitionBytes, math.max(conf.filesOpenCostInBytes, bytesPerCore))
      Some(math.ceil(totalBytes.toDouble / maxSplitBytes).toLong.max(1L))
    }
  }
}
