package graft

import graft.functions.MinHashSignature
import org.apache.spark.sql.functions._

class MinHashSignatureSpec extends SparkTestBase {
  import spark.implicits._

  test("contract: every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("signature has H values, deterministic, in [0, P)") {
    val d = Seq("hello world foo bar", "x").toDF("text")
      .select(MinHashSignature.minhashSignature(col("text"), 5, 8).as("sig"))
    val rows = d.collect().map(_.getSeq[Long](0))
    assert(rows.forall(_.length == 8))
    assert(rows.forall(_.forall(v => v >= 0 && v < MinHashSignature.P)))
    val again = d.collect().map(_.getSeq[Long](0))
    assert(rows.toSeq.map(_.toSeq) == again.toSeq.map(_.toSeq))
  }

  test("identical normalized text gives identical signatures") {
    val d = Seq((1, "Hello   World Zebra"), (2, "hello world zebra"), (3, "other text body"))
      .toDF("id", "text")
      .select(col("id"), MinHashSignature.minhashSignature(col("text"), 5, 8).as("sig"))
    val m = d.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(m(1) == m(2))
    assert(m(1) != m(3))
  }

  test("similar texts share more minhashes than dissimilar ones") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base + " x"
    val far = "completely unrelated content zzz qqq www abc def ghi jkl mno pqr"
    val d = Seq((1, base), (2, near), (3, far)).toDF("id", "text")
      .select(col("id"), MinHashSignature.minhashSignature(col("text"), 5, 16).as("sig"))
    val m = d.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    def overlap(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(overlap(m(1), m(2)) > overlap(m(1), m(3)))
  }

  test("null text yields null signature; eval and codegen paths agree") {
    val d = Seq(Some("abc def ghi"), None).toDF("text")
    val sig = d.select(MinHashSignature.minhashSignature(col("text"), 3, 4).as("s")).collect()
    assert(sig(1).isNullAt(0))
    // interpreted path (eval through filter/case) matches project path
    val direct = MinHashSignature.compute("abc def ghi", 3, 4).toSeq
    assert(sig(0).getSeq[Long](0) == direct)
  }

  test("short text (< k) produces one truncated gram, no crash") {
    val direct = MinHashSignature.compute("ab", 5, 4)
    assert(direct.length == 4)
    val empty = MinHashSignature.compute("", 5, 4)
    assert(empty.length == 4)
  }
}
