package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Physical-layout maintenance for file-backed tables — the two jobs a
 * 100 TB lakehouse runs continuously besides queries:
 *
 *  - the SMALL-FILES problem: streaming/sharded ingest leaves leaf
 *    directories with thousands of tiny parquet files; scan planning,
 *    footer reads and shuffle-partition minimums all degrade.
 *    [[compactionPlan]] measures it and plans the rewrite;
 *    [[compact]] executes the plan for chosen partitions.
 *  - DATA SKIPPING: min/max pruning only works when file value ranges
 *    are narrow. [[zorderBy]] rewrites a table in an interleaved-bit
 *    (Morton) order over several columns, so every file covers a small
 *    hyper-rectangle and multi-column predicates prune files the way a
 *    single-column sort only manages for its leading column.
 *
 * Both operate through the Hadoop FileSystem API (any configured
 * scheme) and plain DataFrame writes — no table-format dependency.
 */
object Layout {

  /** Per-leaf-partition file census + rewrite plan: one row per leaf
    * directory holding data files — `(partition, n_files, total_bytes,
    * target_files)` with `target_files = ceil(total_bytes /
    * targetBytes)`. A leaf needs compaction when `n_files >
    * target_files`. Driver-side FS walk (listing is metadata work the
    * driver does once; the number of LEAVES is bounded by the partition
    * layout, not the row count), rewrite fully distributed. */
  def compactionPlan(
      spark: SparkSession,
      dir: String,
      targetBytes: Long = 128L << 20): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify the root so relativize sees the same scheme/authority as
    // the listed children (file:/... vs /... otherwise never relativizes)
    val root = fs.makeQualified(new Path(dir))
    val leaves = scala.collection.mutable.ListBuffer.empty[(String, Long, Long)]
    def walk(p: Path): Unit = {
      val entries = fs.listStatus(p).filterNot(_.getPath.getName.startsWith("_"))
      val (dirs, files) = entries.partition(_.isDirectory)
      val dataFiles = files.filterNot(_.getPath.getName.startsWith("."))
      if (dataFiles.nonEmpty) {
        val rel = root.toUri.relativize(p.toUri).getPath match {
          case "" => "/"
          case r => r.stripSuffix("/")
        }
        leaves += ((rel, dataFiles.length.toLong, dataFiles.map(_.getLen).sum))
      }
      dirs.foreach(d => walk(d.getPath))
    }
    walk(root)
    import spark.implicits._
    leaves.toSeq.toDF("partition", "n_files", "total_bytes")
      .withColumn("target_files",
        greatest(ceil(col("total_bytes").cast("double") / targetBytes.toDouble)
          .cast("long"), lit(1L)))
  }

  /** Rewrite one leaf partition into its planned file count: read the
    * leaf, `coalesce` (narrow — no shuffle; merging small files never
    * needs one), write to a staging dir, then swap atomically-enough
    * for a maintenance window (rename old → write → delete). Returns
    * the new file count. */
  def compact(
      spark: SparkSession,
      leafDir: String,
      targetFiles: Int): Long = {
    require(targetFiles > 0, "targetFiles must be positive")
    val leaf = new Path(leafDir)
    val fs = leaf.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(leaf.getParent, s".compact_${leaf.getName}")
    spark.read.parquet(leafDir).coalesce(targetFiles)
      .write.mode("overwrite").parquet(staging.toString)
    // rename returns false (no exception) on failure — a silent false
    // here would strand the data mid-swap, so both renames are checked
    val old = new Path(leaf.getParent, s".old_${leaf.getName}")
    require(fs.rename(leaf, old), s"compact: could not stage away $leaf")
    if (!fs.rename(staging, leaf)) {
      fs.rename(old, leaf) // roll back; staging is left for inspection
      throw new IllegalStateException(s"compact: could not install $staging at $leaf")
    }
    fs.delete(old, true)
    fs.listStatus(leaf).count(s => !s.getPath.getName.startsWith("_") &&
      !s.getPath.getName.startsWith("."))
  }

  /** Morton (Z-order) key over up to 4 columns: each column is first
    * reduced to a bounded integer rank (`pmod` of its xxhash for
    * strings, scaled min-max bucket for numerics — pass the bucket
    * expressions), then the low `bitsPerCol` bits of each are
    * interleaved. Pure map-side expression — usable as a sort/range
    * key anywhere. */
  def mortonKey(buckets: Seq[Column], bitsPerCol: Int = 8): Column = {
    require(buckets.nonEmpty && buckets.size <= 4, "1..4 bucket columns")
    require(bitsPerCol > 0 && bitsPerCol * buckets.size <= 60,
      "interleaved width must fit a long")
    val n = buckets.size
    val terms = for {
      b <- 0 until bitsPerCol
      (c, i) <- buckets.zipWithIndex
    } yield shiftleft(
      shiftrightunsigned(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * n + i)
    terms.reduce[Column](_.bitwiseOR(_))
  }

  /** Rewrite a table Z-ordered over the given bucket expressions:
    * range-partition by the Morton key (equal-sized output files via
    * the range exchange's sampling) and sort within partitions, so each
    * written file covers a compact hyper-rectangle of the bucketed
    * space and min/max data skipping prunes on EVERY interleaved
    * column. One range shuffle — the price of the layout, paid once per
    * maintenance run. */
  def zorderBy(
      df: DataFrame,
      outDir: String,
      buckets: Seq[Column],
      nFiles: Int,
      bitsPerCol: Int = 8): Unit = {
    require(nFiles > 0, "nFiles must be positive")
    df.withColumn("__zkey", mortonKey(buckets, bitsPerCol))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Min-max bucket expression for a numeric column (the Z-order rank
    * input): `floor((v - lo) / (hi - lo) * 2^bits)` clamped to the bit
    * range. lo/hi come from the caller (one tiny agg, or known domain
    * bounds). */
  def minMaxBucket(v: Column, lo: Double, hi: Double, bits: Int = 8): Column = {
    require(hi > lo, "hi must exceed lo")
    val scaled = floor((v.cast("double") - lo) / (hi - lo) * (1 << bits))
    least(greatest(scaled, lit(0.0d)), lit(((1 << bits) - 1).toDouble)).cast("long")
  }
}
