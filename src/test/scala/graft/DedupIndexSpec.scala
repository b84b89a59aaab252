package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The persisted dedup-index lifecycle (the [[IvfSpec]] round-trip
  * discipline applied to dedup state): build → write bucketed → load →
  * incremental batch value-identical to the in-memory path, with the
  * co-location contract plan-asserted — the history side of the
  * anti-join must read its buckets in place (no Exchange), because at
  * 100 TB re-shuffling the accumulated history per ingest batch is the
  * scale killer the bucketed index exists to remove. */
class DedupIndexSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")

  private def history = Dedup.exact(
    docs.filter(pmod(col("doc_id"), lit(3)) === 0))
    .select(col("fingerprint").as("fp"))
  private def batch = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)

  test("persisted fp index round-trips: loaded incremental batch equals " +
      "the in-memory history path") {
    val direct = Dedup.incrementalExact(batch, history)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_fpidx_").toString
    try {
      Dedup.writeFpIndex(history, "graft_fp_history_spec", buckets = 4,
        path = Some(dir))
      val loaded = Dedup.incrementalExact(batch,
        Dedup.loadFpIndex(spark, "graft_fp_history_spec"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(loaded == direct && direct.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_fp_history_spec")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("loaded index anti-join co-locates: Exchange on the batch side " +
      "only, history buckets read in place") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fpidx_").toString
    try {
      Dedup.writeFpIndex(history, "graft_fp_history_spec2", buckets = 4,
        path = Some(dir))
      val out = Dedup.incrementalExact(batch,
        Dedup.loadFpIndex(spark, "graft_fp_history_spec2"))
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
      val joins = collectNodes(plan) {
        case j: BaseJoinExec if j.joinType.toString.contains("LeftAnti") => j
      }
      assert(joins.nonEmpty, s"no anti join in the plan:\n$plan")
      val j = joins.head
      // the HISTORY (right/anti) side: a bucketed FileSourceScan of the
      // index table with NO shuffle above it
      val rightShuffles = collectNodes(j.right) { case s: ShuffleExchangeLike => s }
      assert(rightShuffles.isEmpty,
        s"history side of the anti-join re-shuffles - the bucketed index " +
          s"failed to co-locate:\n${j.right.treeString}")
      val rightScans = collectNodes(j.right) { case s: FileSourceScanExec => s }
      assert(rightScans.exists(_.bucketedScan),
        s"history side is not a bucketed scan:\n${j.right.treeString}")
      // the BATCH side pays the one Exchange (it must move to the
      // history's bucket partitioning, not the other way around)
      val leftShuffles = collectNodes(j.left) { case s: ShuffleExchangeLike => s }
      assert(leftShuffles.nonEmpty,
        s"expected the batch side to carry the Exchange:\n${j.left.treeString}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_fp_history_spec2")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("append maintenance: a second batch's delta appends into the " +
      "bucketed index and the next batch dedups against BOTH") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fpidx_").toString
    try {
      Dedup.writeFpIndex(history, "graft_fp_history_spec3", buckets = 4,
        path = Some(dir))
      val idx = () => Dedup.loadFpIndex(spark, "graft_fp_history_spec3")
      // ingest batch 1 = doc_id % 3 == 1; its output IS the delta
      val b1 = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
      val delta1 = Dedup.incrementalExact(b1, idx())
      // append with the SAME bucket spec: new files land per bucket,
      // existing bucket files untouched (insertInto does not carry
      // bucketing metadata — saveAsTable(Append) is the supported form)
      delta1.select(col("fp")).write.mode("append")
        .bucketBy(4, "fp").sortBy("fp").format("parquet")
        .saveAsTable("graft_fp_history_spec3")
      // ingest batch 2 = doc_id % 3 == 2, against history ∪ delta1
      val b2 = docs.filter(pmod(col("doc_id"), lit(3)) === 2)
      val got = Dedup.incrementalExact(b2, idx())
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val fullHistory = history.unionByName(delta1.select(col("fp")))
      val want = Dedup.incrementalExact(b2, fullHistory)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want && want.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_fp_history_spec3")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("compaction collapses appended files and replay residue, keeps " +
      "the answer, and preserves the Exchange-free history plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fpidx_").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_fpidx_").toString
    try {
      Dedup.writeFpIndex(history, "graft_fp_history_spec4", buckets = 4,
        path = Some(dir))
      // two replayed appends of the SAME fps: residue the anti-join
      // tolerates but every future scan pays for
      (1 to 2).foreach { _ =>
        history.write.mode("append").bucketBy(4, "fp").sortBy("fp")
          .format("parquet").saveAsTable("graft_fp_history_spec4")
      }
      val before = Dedup.incrementalExact(batch,
        Dedup.loadFpIndex(spark, "graft_fp_history_spec4"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val filesBefore =
        spark.table("graft_fp_history_spec4").inputFiles.length
      val rowsBefore = spark.table("graft_fp_history_spec4").count()

      Dedup.compactFpIndex(spark, "graft_fp_history_spec4", buckets = 4,
        path = Some(dir2))

      val compacted = spark.table("graft_fp_history_spec4")
      // rows collapsed to the distinct fp set; files back to one write
      assert(compacted.count() == rowsBefore / 3)
      assert(compacted.inputFiles.length < filesBefore)
      // answers unchanged
      val after = Dedup.incrementalExact(batch,
        Dedup.loadFpIndex(spark, "graft_fp_history_spec4"))
      assert(after.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet == before)
      // the co-location contract survives the rewrite: history side of
      // the anti-join still shuffle-free on a bucketed scan
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
      val plan = after.queryExecution.executedPlan
      val j = collectNodes(plan) {
        case jn: BaseJoinExec if jn.joinType.toString.contains("LeftAnti") => jn
      }.head
      assert(collectNodes(j.right) { case s: ShuffleExchangeLike => s }.isEmpty,
        s"compacted history side re-shuffles:\n${j.right.treeString}")
      assert(collectNodes(j.right) { case s: FileSourceScanExec => s }
        .exists(_.bucketedScan),
        s"compacted history side is not a bucketed scan:\n${j.right.treeString}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_fp_history_spec4")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir2))
    }
  }

  test("band-index compaction: distinct (id, band, h) rows survive, " +
      "replay-duplicated keys collapse, probe results unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lshc_").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_lshc_").toString
    try {
      val hist = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      val keys = Dedup.lshBandKeys(hist)
      Dedup.writeLshBandIndex(keys, "graft_lsh_compact_spec", buckets = 4,
        path = Some(dir))
      keys.write.mode("append").bucketBy(4, "band", "h")
        .sortBy("band", "h").format("parquet")
        .saveAsTable("graft_lsh_compact_spec")
      val b = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val before = Dedup.incrementalLshJaccard(b,
        Dedup.loadLshBandIndex(spark, "graft_lsh_compact_spec"), docs,
        minJaccard = 0.20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val rowsBefore = spark.table("graft_lsh_compact_spec").count()
      Dedup.compactLshBandIndex(spark, "graft_lsh_compact_spec",
        buckets = 4, path = Some(dir2))
      assert(spark.table("graft_lsh_compact_spec").count() == rowsBefore / 2)
      val after = Dedup.incrementalLshJaccard(b,
        Dedup.loadLshBandIndex(spark, "graft_lsh_compact_spec"), docs,
        minJaccard = 0.20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(after == before && before.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_lsh_compact_spec")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir2))
    }
  }
}
