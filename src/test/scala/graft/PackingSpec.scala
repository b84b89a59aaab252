package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Doc-boundary greedy packing (next-fit per (group, shard)) and its
  * efficiency rollup. */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  // tokenCountBpe counts letter runs / digits / marks; "a b c" -> 3
  private def docsDf(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "source", "text")

  test("packGreedyBins: next-fit fills then opens a new bin") {
    // budget 5: [3, 2] fill bin 0 exactly; 4 overflows -> bin 1; 1 joins
    val docs = docsDf(
      (0L, "s", "a b c"), (1L, "s", "a b"), (2L, "s", "a b c d"),
      (3L, "s", "a"))
    val out = Corpus.packGreedyBins(docs, budgetTokens = 5L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    assert(out.toSeq == Seq((0L, 3L, 0L, false), (1L, 2L, 0L, false),
      (2L, 4L, 1L, false), (3L, 1L, 1L, false)))
  }

  test("packGreedyBins: oversize doc keeps its own bin, flagged") {
    val docs = docsDf(
      (0L, "s", "a b c d e f"), // 6 > budget 4 but FIRST: stays bin 0
      (1L, "s", "a b"), (2L, "s", "a b c"))
    val out = Corpus.packGreedyBins(docs, budgetTokens = 4L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(2), r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == Seq((0L, 0L, true), (1L, 1L, false), (2L, 2L, false)))
  }

  test("packGreedyBins: zero-token docs never open bins") {
    val docs = docsDf((0L, "s", ""), (1L, "s", "a b"), (2L, "s", ""))
    val out = Corpus.packGreedyBins(docs, budgetTokens = 3L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((0L, 0L), (2L, 0L), (0L, 0L)))
  }

  test("packGreedyBins: groups and shards pack independently") {
    val docs = Seq(
      (0L, "x", "a b"), (1L, "y", "a b"), // different groups
      (1030L, "x", "a b c")) // same group, shard 1 (1030 div 1024)
      .toDF("doc_id", "source", "text")
    val out = Corpus.packGreedyBins(docs, budgetTokens = 3L)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(4)))
      .toMap
    assert(out.size == 3 && out.values.forall(_ == 0L))
  }

  test("packEfficiency: waste counts only under-full bins") {
    val docs = docsDf(
      (0L, "s", "a b c"), (1L, "s", "a b"), // bin 0 fill 5 (budget 5)
      (2L, "s", "a b c d e f"), // bin 1: oversize fill 6, no waste
      (3L, "s", "a")) // bin 2 fill 1 -> waste 4
    val eff = Corpus.packEfficiency(
      Corpus.packGreedyBins(docs, budgetTokens = 5L), budgetTokens = 5L)
      .collect()
    assert(eff.length == 1)
    val r = eff.head
    assert(r.getLong(1) == 4L && r.getLong(2) == 3L) // n_docs, n_bins
    assert(r.getLong(3) == 12L) // total tokens
    assert(r.getLong(4) == 4L) // padding waste: only bin 2
    assert(r.getDouble(5) == BigDecimal(12.0 / 15)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
