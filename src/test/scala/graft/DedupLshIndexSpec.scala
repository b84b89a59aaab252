package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The persisted NEAR-dup band-key index lifecycle — [[DedupIndexSpec]]'s
  * discipline applied to MinHash-LSH state: build band keys → write
  * bucketed by (band, h) → load → incremental batch value-identical to
  * re-deriving the bipartite + within-batch joins from text, with the
  * co-location contract plan-asserted (the history side of the probe
  * join reads its buckets in place — at 100 TB re-shuffling the
  * accumulated band-key history per ingest batch is the scale killer
  * the bucketed index removes). */
class DedupLshIndexSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")
  private def split(i: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === i)
  private def batch = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  /** The from-text re-derivation the index path must match: bipartite
    * batch×history LSH-Jaccard plus the within-batch pairs. */
  private def rederived(b: org.apache.spark.sql.DataFrame,
      h: org.apache.spark.sql.DataFrame) =
    asSet(Dedup.crossLshJaccard(b, h, rightIdCol = "doc_id",
      minJaccard = 0.20)) ++
      asSet(Dedup.lshJaccard(b, minJaccard = 0.20))

  test("persisted band index round-trips: loaded incremental batch " +
      "equals the from-text bipartite + within-batch derivation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx_").toString
    try {
      Dedup.writeLshBandIndex(Dedup.lshBandKeys(split(0)),
        "graft_lsh_band_spec", buckets = 4, path = Some(dir))
      val got = asSet(Dedup.incrementalLshJaccard(batch,
        Dedup.loadLshBandIndex(spark, "graft_lsh_band_spec"),
        docs, minJaccard = 0.20))
      val want = rederived(batch, split(0))
      assert(got == want && want.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_lsh_band_spec")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("loaded band index probe co-locates: Exchange on the batch side " +
      "only, history buckets read in place") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx_").toString
    // pin broadcast OFF: at test SF the index side would broadcast and
    // the co-location question never arises — the 100 TB regime this
    // index exists for is history-too-big-to-broadcast
    val prevBroad = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Dedup.writeLshBandIndex(Dedup.lshBandKeys(split(0)),
        "graft_lsh_band_spec2", buckets = 4, path = Some(dir))
      // the probe join lives in the CANDIDATE plan — the exact lazy
      // plan incrementalLshJaccardFromKeys scratch-materializes once
      // per batch (the verify joins downstream read the materialized
      // pair table, so the returned frame no longer carries the probe)
      val out = Dedup.incrementalLshCandidates(
        Dedup.lshBandKeys(batch),
        Dedup.loadLshBandIndex(spark, "graft_lsh_band_spec2"))
      out.collect() // execute so AQE finalizes the plan
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      def collectNodes[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case _ => p.children
        }
        (if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil) ++
          kids.flatMap(c => collectNodes(c)(pf))
      }
      val plan = out.queryExecution.executedPlan
      // the probe join is the one whose (right) side scans the index
      // table: find joins with a bucketed FileSourceScan beneath a side
      val joins = collectNodes(plan) { case j: BaseJoinExec => j }
      val probe = joins.find(j =>
        collectNodes(j.right) { case s: FileSourceScanExec => s }
          .exists(_.tableIdentifier.exists(_.table == "graft_lsh_band_spec2")))
      assert(probe.nonEmpty,
        s"no join over the band-index table in the plan:\n$plan")
      val j = probe.get
      val rightShuffles = collectNodes(j.right) { case s: ShuffleExchangeLike => s }
      assert(rightShuffles.isEmpty,
        s"history side of the probe join re-shuffles - the bucketed " +
          s"index failed to co-locate:\n${j.right.treeString}")
      val rightScans = collectNodes(j.right) { case s: FileSourceScanExec => s }
      assert(rightScans.exists(_.bucketedScan),
        s"history side is not a bucketed scan:\n${j.right.treeString}")
      val leftShuffles = collectNodes(j.left) { case s: ShuffleExchangeLike => s }
      assert(leftShuffles.nonEmpty,
        s"expected the batch side to carry the Exchange:\n${j.left.treeString}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroad)
      spark.sql("DROP TABLE IF EXISTS graft_lsh_band_spec2")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("append maintenance: a second batch's band keys append into the " +
      "bucketed index and the next batch probes BOTH") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx_").toString
    try {
      Dedup.writeLshBandIndex(Dedup.lshBandKeys(split(0)),
        "graft_lsh_band_spec3", buckets = 4, path = Some(dir))
      // ingest batch 1 = split 1; its own band keys ARE the delta —
      // append with the SAME bucket spec
      Dedup.lshBandKeys(split(1))
        .write.mode("append").bucketBy(4, "band", "h").sortBy("band", "h")
        .format("parquet").saveAsTable("graft_lsh_band_spec3")
      // ingest batch 2 = split 2, against history(0) ∪ delta(1)
      val got = asSet(Dedup.incrementalLshJaccard(split(2),
        Dedup.loadLshBandIndex(spark, "graft_lsh_band_spec3"),
        docs, minJaccard = 0.20))
      val want = rederived(split(2),
        split(0).unionByName(split(1)))
      assert(got == want && want.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_lsh_band_spec3")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
