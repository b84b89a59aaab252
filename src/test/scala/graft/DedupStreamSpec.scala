package graft

import graft.operators.Dedup
import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The self-maintaining streaming dedup loop: every micro-batch dedups
  * against the bucketed fingerprint index AND appends its delta, so
  * cross-batch duplicates collapse and the final state equals the batch
  * path — the stream≡batch proof for the continuous-ingest lifecycle
  * that writeFpIndex/incrementalExact define. */
class DedupStreamSpec extends SparkTestBase {

  test("incrementalDedupStream: cross-micro-batch duplicates collapse " +
      "and the union of deltas equals the batch path") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val table = "graft_fp_stream_spec"
    val dir = java.nio.file.Files.createTempDirectory("graft_fpstream_").toString
    try {
      // seed history: docs 1..3
      val history = Dedup.exact(
        Seq((1L, "alpha text"), (2L, "beta text"), (3L, "gamma text"))
          .toDF("doc_id", "text"))
        .select(col("fingerprint").as("fp"))
      Dedup.writeFpIndex(history, table, buckets = 4, path = Some(dir))

      val deltas = scala.collection.mutable.ArrayBuffer
        .empty[(Long, (String, Long, Long))]
      val input = MemoryStream[(Long, String)]
      val q = EventStreams.incrementalDedupStream(
        input.toDF().toDF("doc_id", "text"), table, buckets = 4,
        sink = (df, id) => df.collect().foreach(r =>
          deltas += ((id, (r.getString(0), r.getLong(1), r.getLong(2))))))
      try {
        // batch 1: a history dup (alpha), a new doc (delta) twice
        input.addData((10L, "alpha text"), (11L, "delta text"),
          (12L, "delta text"))
        q.processAllAvailable()
        // batch 2: a dup of batch-1's new doc, plus one genuinely new
        input.addData((20L, "delta text"), (21L, "epsilon text"))
        q.processAllAvailable()
      } finally q.stop()

      val batch1 = deltas.filter(_._1 == deltas.map(_._1).min).map(_._2)
      val batch2 = deltas.filter(_._1 == deltas.map(_._1).max).map(_._2)
      // batch 1: alpha collapsed against history; delta kept once (min id)
      assert(batch1.map(_._2).toSet == Set(11L))
      assert(batch1.head._3 == 2L) // two batch-1 copies of "delta text"
      // batch 2: "delta text" collapsed against BATCH 1's append — the
      // cross-batch maintenance this operator exists for
      assert(batch2.map(_._2).toSet == Set(21L))
      // union of deltas == the batch path over batch1 ∪ batch2 (ids
      // chosen so the per-batch min picks match the global ones)
      val batchPath = Dedup.incrementalExact(
        Seq((10L, "alpha text"), (11L, "delta text"), (12L, "delta text"),
          (20L, "delta text"), (21L, "epsilon text")).toDF("doc_id", "text"),
        history)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // n_batch differs across paths only for the cross-batch dup (the
      // batch path counts all 3 "delta text" copies at once) — compare
      // the kept (fp, keep_id) pairs, the dedup decision itself
      assert(deltas.map(d => (d._2._1, d._2._2)).toSet ==
        batchPath.map(t => (t._1, t._2)))
      // the index now holds history + both deltas: a third pass with all
      // prior texts yields nothing new
      val replay = Dedup.incrementalExact(
        Seq((30L, "alpha text"), (31L, "delta text"), (32L, "epsilon text"))
          .toDF("doc_id", "text"),
        Dedup.loadFpIndex(spark, table))
      assert(replay.count() == 0L)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("durable delta log: the deltaTable carries every batch's rows " +
      "with its batch_id, and the batch-replay driver reproduces the " +
      "stream's log exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fpstream_").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_fpstream_").toString
    def emptyHistory = Dedup.exact(
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
      .select(col("fingerprint").as("fp"))
    val b1 = Seq((10L, "alpha text"), (11L, "delta text"), (12L, "delta text"))
    val b2 = Seq((20L, "delta text"), (21L, "epsilon text"))
    def logSet(t: String) = spark.table(t).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // EXTERNAL delta tables on fresh temp paths (a managed table's
    // warehouse dir would orphan across killed JVMs and fail the next
    // run's create with LOCATION_ALREADY_EXISTS)
    def seedDeltaTable(name: String): Unit = {
      import spark.implicits._
      spark.sql(s"DROP TABLE IF EXISTS $name")
      Seq.empty[(String, Long, Long, Long)]
        .toDF("fp", "keep_id", "n_batch", "batch_id")
        .write.option("path",
          java.nio.file.Files.createTempDirectory("graft_fpdelta_").toString)
        .format("parquet").saveAsTable(name)
    }
    try {
      // STREAM over two micro-batches, delta log enabled
      Dedup.writeFpIndex(emptyHistory, "graft_fp_stream_dl", buckets = 4,
        path = Some(dir))
      seedDeltaTable("graft_fp_delta_dl")
      val input = MemoryStream[(Long, String)]
      val q = EventStreams.incrementalDedupStream(
        input.toDF().toDF("doc_id", "text"), "graft_fp_stream_dl",
        buckets = 4, deltaTable = Some("graft_fp_delta_dl"))
      try {
        input.addData(b1: _*); q.processAllAvailable()
        input.addData(b2: _*); q.processAllAvailable()
      } finally q.stop()
      val streamed = logSet("graft_fp_delta_dl")
      // batch 0 kept alpha(10) + delta(11, n=2); batch 1 kept epsilon(21)
      // (delta text collapsed against batch 0's append)
      assert(streamed.map(t => (t._2, t._4)) == Set((10L, 0L), (11L, 0L), (21L, 1L)))
      assert(streamed.find(_._2 == 11L).get._3 == 2L)

      // REPLAY the same batches through the shared per-batch body into
      // fresh tables: the durable log must match the stream's exactly
      Dedup.writeFpIndex(emptyHistory, "graft_fp_replay_dl", buckets = 4,
        path = Some(dir2))
      seedDeltaTable("graft_fp_delta_rp")
      val replayed = EventStreams.replayIncrementalDedup(
        Seq(b1.toDF("doc_id", "text"), b2.toDF("doc_id", "text")),
        "graft_fp_replay_dl", "graft_fp_delta_rp", buckets = 4)
      assert(replayed.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet == streamed)
    } finally {
      Seq("graft_fp_stream_dl", "graft_fp_delta_dl",
        "graft_fp_replay_dl", "graft_fp_delta_rp")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir2))
    }
  }
}
