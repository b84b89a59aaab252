package graft

import graft.operators.Dedup
import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming near-dup loop: cross-batch candidate discovery against
  * the persisted band index, stream ≡ replay ≡ one-shot batch path, and
  * the replay-idempotence property the history anti-join buys. */
class LshStreamSpec extends SparkTestBase {

  // two near-dup families (X ~ Y across batches, P ~ Q within batch 1)
  // plus singletons; texts long enough for 5-shingles to overlap heavily
  private val docX = (1L, "the quick brown fox jumps over the lazy dog again and again")
  private val docP = (2L, "pack my box with five dozen liquor jugs before the long trip")
  private val docQ = (3L, "pack my box with five dozen liquor jugs before the long trek")
  private val docZ = (4L, "completely unrelated text about distributed query processing")
  private val docY = (5L, "the quick brown fox jumps over the lazy dog again and again!")
  private def b1 = Seq(docX, docP, docQ)
  private def b2 = Seq(docY, docZ)

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def seed(suffix: String): (String, String, String) = {
    val (bt, ct, pt) = (s"graft_lshs_bands_$suffix",
      s"graft_lshs_corpus_$suffix", s"graft_lshs_pairs_$suffix")
    EventStreams.seedLshStreamTables(spark, bt, ct, pt,
      tmp("graft_lshs_b_"), tmp("graft_lshs_c_"), tmp("graft_lshs_p_"),
      buckets = 4)
    (bt, ct, pt)
  }

  private def pairSet(df: DataFrame) = df
    .select(col("a"), col("b"), col("jaccard"))
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("replayLshDedup finds within-batch AND cross-batch pairs and " +
      "equals the one-shot batch lshJaccard over the full corpus") {
    import spark.implicits._
    val (bt, ct, pt) = seed("rp")
    try {
      val log = EventStreams.replayLshDedup(
        Seq(b1.toDF("doc_id", "text"), b2.toDF("doc_id", "text")),
        bt, ct, pt, buckets = 4, minJaccard = 0.20)
      val got = pairSet(log)
      // within batch 1: (2,3); across batches: (1,5) — discovered by
      // batch 2 probing the persisted index
      assert(got.map(p => (p._1, p._2)) == Set((2L, 3L), (1L, 5L)))
      val batchIdOf = log.collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      assert(batchIdOf(2L) == 0L && batchIdOf(1L) == 1L)
      // one-shot identity
      assert(got == pairSet(Dedup.lshJaccard(
        (b1 ++ b2).toDF("doc_id", "text"), minJaccard = 0.20)))
    } finally Seq("graft_lshs_bands_rp", "graft_lshs_corpus_rp",
      "graft_lshs_pairs_rp")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("lshDedupStream over MemoryStream micro-batches reproduces the " +
      "replay driver's pair log exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (bt, ct, pt) = seed("ms")
    val (bt2, ct2, pt2) = seed("ms_rp")
    try {
      val input = MemoryStream[(Long, String)]
      val q = EventStreams.lshDedupStream(
        input.toDF().toDF("doc_id", "text"), bt, ct, pt,
        buckets = 4, minJaccard = 0.20)
      try {
        input.addData(b1: _*); q.processAllAvailable()
        input.addData(b2: _*); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table(pt).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      EventStreams.replayLshDedup(
        Seq(b1.toDF("doc_id", "text"), b2.toDF("doc_id", "text")),
        bt2, ct2, pt2, buckets = 4, minJaccard = 0.20)
      val replayed = spark.table(pt2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      assert(streamed == replayed && streamed.nonEmpty)
    } finally Seq("ms", "ms_rp").flatMap(sfx => Seq(
      s"graft_lshs_bands_$sfx", s"graft_lshs_corpus_$sfx",
      s"graft_lshs_pairs_$sfx"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("a replayed batch whose band keys were already appended emits " +
      "byte-identical pair rows (the history anti-join), never " +
      "self-matches") {
    import spark.implicits._
    val (bt, ct, pt) = seed("idem")
    try {
      EventStreams.processLshDedupBatch(b1.toDF("doc_id", "text"),
        bt, ct, pt, 0L, 4, 5, 4, 4, 0.20)
      val first = spark.table(pt).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      // crash-after-appends model: rerun batch 0 with its keys (and
      // text) already durable — the recomputed log rows must be the
      // SAME set (duplicated physically, identical logically), not
      // inflated by batch-vs-own-index self matches
      EventStreams.processLshDedupBatch(b1.toDF("doc_id", "text"),
        bt, ct, pt, 0L, 4, 5, 4, 4, 0.20)
      val after = spark.table(pt).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      assert(after == first)
      assert(first.map(p => (p._1, p._2)) == Set((2L, 3L)))
    } finally Seq("graft_lshs_bands_idem", "graft_lshs_corpus_idem",
      "graft_lshs_pairs_idem")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
