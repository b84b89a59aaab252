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

  /** [[fanOut]] for inputs feeding a QUADRATIC-OUTPUT equi-join on
    * `cols` (wedge/self joins): hash-repartition by the join key with
    * an explicit partition count instead of round-robin.
    *
    * Why round-robin is not enough there: the join re-shuffles by its
    * key, and AQE coalesces that post-shuffle read by INPUT bytes —
    * blind to the join's quadratic OUTPUT, so a byte-small adjacency
    * collapses the whole expansion onto 1–2 tasks (measured on the
    * wedge operators: one 3.6 s task computing 2M wedge pairs from a
    * 1.9 MB shuffle read). An EXPLICIT user repartition is exempt from
    * AQE coalescing, satisfies the join's distribution requirement (so
    * it costs no additional Exchange — it IS the join's exchange, with
    * a pinned count), and any keyed aggregate on the same columns
    * reuses it.
    *
    * Same no-op contract as [[fanOut]]: only fires for under-split
    * inputs (byte-small scans), where the pinned defaultParallelism is
    * the right order; a well-split 100 TB input keeps its planner
    * exchanges and AQE sizing, whose byte heuristic is correct once
    * input bytes are output-proportional. */
  def fanOutByKey(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val maxTarget = spark.sparkContext.defaultParallelism
    // bytes-proportional target, capped at the cluster parallelism: an
    // iterative peel (kTruss) calls this every round on a SHRINKING
    // input — pinning every round at full parallelism costs more in
    // per-task overhead than the late tiny rounds' expansion saves, so
    // rounds scale down with their input (~64 KB of compressed
    // adjacency per task of quadratic expansion, measured crossover)
    val target = fileBytesEstimate(df) match {
      case Some(bytes) =>
        math.min(maxTarget.toLong, math.max(1L, bytes / 65536L + 1L)).toInt
      case None => maxTarget
    }
    val underSplit = fileSplitEstimate(df) match {
      case Some(estSplits) => estSplits < target
      case None => df.rdd.getNumPartitions < target
    }
    if (underSplit) df.repartition(target, cols: _*) else df
  }

  /** Total bytes across the frame's file relations (`None` when it has
    * no file relation — in-memory test data). */
  def fileBytesEstimate(df: DataFrame): Option[Long] = {
    val fileRels = df.queryExecution.analyzed.collect {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        l.relation.asInstanceOf[HadoopFsRelation]
    }
    if (fileRels.isEmpty) None else Some(fileRels.map(_.location.sizeInBytes).sum)
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
