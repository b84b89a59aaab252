package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The curation gate (rule flags, PII redaction) is stateless map-side
  * projection, so the SAME operator code runs unchanged over a stream:
  * readStream → gopherRules/redactPii → writeStream. These specs prove
  * stream ≡ batch row-for-row across micro-batch boundaries — the
  * incremental-ingest form of the corpus quality gate. */
class CurationStreamingSpec extends SparkTestBase {

  private val fixture = Seq(
    (1L, "the quick brown foxes jumped over those lazy hounds and then rested"),
    (2L, "short text"),
    (3L, "quick brown foxes jumped over lazy hounds sprinting quite far"),
    (4L, "mail a@b.org or call +1-555-123-4567 from 10.0.0.7 today maybe"))

  test("gopherRules over a stream emits exactly the batch rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val q = TextAnalysis.gopherRules(
      input.toDS().toDF("doc_id", "text"),
      minTokens = 5, maxTokens = 100, minAvgTokenLen = 3.0,
      maxAvgTokenLen = 10.0, maxPunctRatio = 0.2, minStopwordHits = 2)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("gopher_stream").start()
    try {
      input.addData(fixture.take(2): _*)
      q.processAllAvailable()
      input.addData(fixture.drop(2): _*) // second micro-batch
      q.processAllAvailable()
      def asSet(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))).toSet
      val streamed = asSet(spark.sql("SELECT * FROM gopher_stream").collect())
      val batch = asSet(TextAnalysis.gopherRules(
        fixture.toDF("doc_id", "text"),
        minTokens = 5, maxTokens = 100, minAvgTokenLen = 3.0,
        maxAvgTokenLen = 10.0, maxPunctRatio = 0.2, minStopwordHits = 2).collect())
      assert(streamed == batch && streamed.size == 4)
    } finally q.stop()
  }

  test("filterBlocklistStream: stream-static anti join drops blocklisted docs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // blocklist carries the fingerprint of fixture doc 2 ("short text")
    val blocklist = Seq(Tuple1("short text")).toDF("text")
      .select(graft.functions.TextFunctions.md5Fingerprint(org.apache.spark.sql.functions.col("text"))
        .as("fingerprint"))
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.EventStreams.filterBlocklistStream(
      input.toDS().toDF("doc_id", "text"), blocklist)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("blocklist_stream").start()
    try {
      input.addData(fixture.take(2): _*)
      q.processAllAvailable()
      input.addData(fixture.drop(2): _*)
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM blocklist_stream").collect()
        .map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L, 4L)) // doc 2 blocked
      // the semi form audits exactly the blocked set
      val input2 = MemoryStream[(Long, String)]
      val q2 = graft.streaming.EventStreams.filterBlocklistStream(
        input2.toDS().toDF("doc_id", "text"), blocklist, joinType = "left_semi")
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("blocklist_semi").start()
      try {
        input2.addData(fixture: _*)
        q2.processAllAvailable()
        assert(spark.sql("SELECT doc_id FROM blocklist_semi").collect()
          .map(_.getLong(0)).toSet == Set(2L))
      } finally q2.stop()
    } finally q.stop()
  }

  test("redactPii over a stream matches batch redaction") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val q = TextAnalysis.redactPii(input.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("pii_stream").start()
    try {
      fixture.foreach { row => input.addData(row); q.processAllAvailable() }
      def asSet(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSet
      val streamed = asSet(spark.sql("SELECT * FROM pii_stream").collect())
      val batch = asSet(TextAnalysis.redactPii(fixture.toDF("doc_id", "text")).collect())
      assert(streamed == batch)
      assert(streamed.exists(_._2.contains("<EMAIL>")))
      assert(streamed.exists(_._2.contains("<PHONE>")))
      assert(streamed.exists(_._2.contains("<IP>")))
    } finally q.stop()
  }
}
