package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-13 operators: bigram stupid-backoff perplexity and
  * hard-negative mining. */
class Round13OpsSpec extends SparkTestBase {
  import spark.implicits._

  // Spark round() semantics: HALF_UP via BigDecimal
  private def r(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ngramLmPerplexity: hand-computed bigram scores, self-trained model") {
    val docs = Seq((1L, "a b a b"), (2L, "a a b")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramLmPerplexity(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2), x.getDouble(3)))
      .toMap
    // n_a=4, n_b=3, N=7; bigrams (a,b):3 (b,a):1 (a,a):1
    def avg(terms: Seq[Double]) = terms.map(r(_, 9)).sum / terms.size
    val a1 = avg(Seq(math.log(4.0 / 7), math.log(3.0 / 4),
      math.log(1.0 / 3), math.log(3.0 / 4)))
    val a2 = avg(Seq(math.log(4.0 / 7), math.log(1.0 / 4), math.log(3.0 / 4)))
    assert(out(1L)._1 == 4L && out(1L)._2 == r(a1, 6))
    assert(out(2L)._1 == 3L && out(2L)._2 == r(a2, 6))
    assert(out(1L)._3 == r(math.exp(r(-a1, 9)), 6)) // perplexity
    // self-trained: lower-perplexity doc is the more "typical" one
    assert(out(1L)._3 > 0.0 && out(2L)._3 > 0.0)
  }

  test("ngramLmPerplexity: external model exercises backoff and the OOV floor") {
    val model = Seq((10L, "a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "b a c")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramLmPerplexity(docs, Some(model)).collect()
    assert(out.length == 1)
    // model: n_a=1 n_b=1 N=2, bigrams (a,b):1
    // 'b' first -> 1/2; 'a' after b -> unseen bigram, 0.4*(1/2);
    // 'c' OOV -> 0.4*(1/2) via the count-1 floor
    val terms = Seq(math.log(0.5), math.log(0.4 * 0.5), math.log(0.4 * 0.5))
    val a = terms.map(r(_, 9)).sum / 3
    assert(out.head.getLong(1) == 3L)
    assert(out.head.getDouble(2) == r(a, 6))
  }

  test("stripDuplicateSpans: duplicated window cut from later occurrences only") {
    val docs = Seq(
      (1L, "x1 x2 a b c d x3"),
      (2L, "y1 a b c d y2"),
      (3L, "dup short"),
      (4L, "dup short")).toDF("doc_id", "text")
    val out = Dedup.stripDuplicateSpans(docs, spanTokens = 4).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3)))
      .toMap
    // "a b c d" occurs at (1,2) and (2,1): doc 1 keeps the first
    // occurrence, doc 2 loses tokens [1,5)
    assert(out(1L) == (("x1 x2 a b c d x3", 7, 0)))
    assert(out(2L) == (("y1 y2", 6, 4)))
    // short exact dups: the truncated-window convention removes the
    // whole later copy
    assert(out(3L) == (("dup short", 2, 0)))
    assert(out(4L) == (("", 2, 2)))
  }

  test("hardNegativesTopK: nearest wrong-class items, same-class excluded") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f), 0),  // same class as anchor - must not appear
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(0.1f, 0.9f), 1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegativesTopK(e, e.filter(col("vec_id") === 1), k = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getInt(3)))
    assert(out.length == 2)
    assert(out.forall(_._1 == 1L))
    assert(!out.exists(_._2 == 2L)) // nearest same-class item excluded
    val byRank = out.sortBy(_._4)
    assert(byRank(0)._2 == 4L && byRank(1)._2 == 3L) // hardest first
    assert(byRank(0)._3 > byRank(1)._3)
  }
}
