package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Round-11 operators: per-domain curation rollup and friends. */
class Round11OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("domainReport: host keying, exact dup fraction, token + quality mass") {
    val docs = Seq(
      (1L, "the quick brown fox jumps", "https://a.example.com/x/1"),
      (2L, "the quick brown fox jumps", "https://a.example.com/y/2"),
      (3L, "completely different text here", "https://a.example.com/z/3"),
      (4L, "another domain text", "https://b.example.org/1")
    ).toDF("doc_id", "text", "url")
      .withColumn("n_chars", length(col("text")))
    val r = Corpus.domainReport(docs).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("a.example.com", "b.example.org"))
    val a = r("a.example.com")
    assert(a.getLong(1) == 3L && a.getLong(2) == 2L) // n_docs, n_unique
    assert(math.abs(a.getDouble(3) - 0.333333) < 1e-9) // dup_frac
    assert(a.getLong(4) == 5L + 5L + 4L) // ws-token mass
    val b = r("b.example.org")
    assert(b.getLong(1) == 1L && b.getDouble(3) == 0.0)
    // quality mass is the 6-dp per-doc score summed exactly
    assert(b.getDouble(5) == b.getDouble(6)) // one doc: sum == mean
  }
}
