package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× scale-probe fixture for the dedup spine (see Bench): replicates a
  * base `documents` table `factor`× with a controlled duplicate
  * structure, so the banded/blocked dedup operators can be timed at two
  * scales and their observed scaling compared against the sub-quadratic
  * design claims. Deterministic end to end (md5 coins, no RNG), written
  * once and reused across bench runs. */
object ScaleProbe {

  /** The queries whose 100×-safety claims the probe measures. */
  val spineQueries: Seq[String] =
    Seq("dedup_lsh_jaccard", "dedup_clusters", "dedup_simhash_pairs", "decontaminate")

  /** Generate `outDir/documents.parquet` = base replicated `factor`×
    * (skipped when already present): copy 0 is the identity; each other
    * copy keeps the original text byte-identical with probability ~30%
    * (an exact/near-dup cluster member) and otherwise appends an
    * md5-derived suffix token (a non-duplicate with the same length and
    * vocabulary shape). Ids are offset per copy, so clusters span
    * copies. */
  def ensureFixture(spark: SparkSession, sfDir: String, outDir: String, factor: Int): Unit = {
    val marker = new java.io.File(s"$outDir/_PROBE_READY")
    if (marker.exists()) return
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val nBase = base.count()
    val copies = spark.range(factor.toLong).select(col("id").as("copy"))
    val coin = pmod(
      conv(substring(md5(concat(col("doc_id"), lit(":"), col("copy"))), 1, 8), 16, 10)
        .cast("long"), lit(10L))
    base.crossJoin(copies)
      .select(
        (col("doc_id") + col("copy") * lit(nBase)).as("doc_id"),
        when(col("copy") === 0 || coin < 3, col("text"))
          .otherwise(concat(col("text"), lit(" "),
            substring(md5(concat(lit("mut:"), col("doc_id"), lit("/"), col("copy"))), 1, 12)))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    marker.getParentFile.mkdirs()
    marker.createNewFile()
    ()
  }
}
