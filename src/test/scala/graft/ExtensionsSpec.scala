package graft

import graft.functions.MinHashSignature
import graft.operators.Events
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("minhash_signature callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((1L, "hello world document"), (2L, "hello world document"))
      .toDF("id", "text").createOrReplaceTempView("ext_docs")
    val rows = spark.sql(
      "SELECT id, minhash_signature(text, 5, 8) AS sig FROM ext_docs").collect()
    assert(rows.length == 2)
    assert(rows(0).getSeq[Long](1) == rows(1).getSeq[Long](1))
    assert(rows(0).getSeq[Long](1) == MinHashSignature.compute("hello world document", 5, 8).toSeq)
  }

  test("cosine_sim and simhash callable from SQL") {
    GraftExtensions.register(spark)
    val cos = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val s1 = spark.sql("SELECT simhash('alpha beta gamma', 32) AS s").head.getLong(0)
    val s2 = spark.sql("SELECT simhash('alpha  beta gamma ', 32) AS s").head.getLong(0)
    assert(s1 == s2) // whitespace-normalized
  }

  test("min_shingle_md5 and array_intersect_size callable from SQL") {
    GraftExtensions.register(spark)
    val fp1 = spark.sql("SELECT min_shingle_md5('a long enough sample text', 5) AS f")
      .head.getString(0)
    val fp2 = spark.sql("SELECT min_shingle_md5('a long  enough sample TEXT', 5) AS f")
      .head.getString(0) // normalization-insensitive
    assert(fp1 == fp2 && fp1.nonEmpty)
    val n = spark.sql(
      "SELECT array_intersect_size(array('a','b','c'), array('b','c','d','b')) AS n")
      .head.getInt(0)
    assert(n == 2)
  }

  test("extension class injects the function into a SparkSessionExtensions") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(exts) // must not throw; builder validated below
    intercept[IllegalArgumentException] {
      GraftExtensions.minhashBuilder(Seq.empty)
    }
  }

  test("session_window sessionization groups like the lag-based form") {
    val events = Events.normalizeEventTs(spark.read.parquet(s"${sf()}/events.parquet"))
    val lagBased = Events.sessionize(events)
    val windowed = Events.sessionWindows(events)
    // same number of sessions overall and per user
    assert(windowed.count() == lagBased.count())
    val a = windowed.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = lagBased.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // event conservation
    assert(windowed.agg(sum("n_events")).head.getLong(0) == events.count())
  }
}
