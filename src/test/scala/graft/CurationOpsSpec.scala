package graft

import graft.operators.{Corpus, TextAnalysis}
import org.apache.spark.sql.functions._

/** Training-data curation additions: PII redaction, sliding-window
  * chunking with overlap, weighted (priority) sampling. */
class CurationOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("redactPii: replaces and counts emails, phones, IPs") {
    val d = Seq(
      (1L, "mail a@b.org and c.d+x@e-f.co today"),
      (2L, "call +1-555-0199 or +44-123-4567 from 192.168.0.1"),
      (3L, "plain prose with no identifiers at all")
    ).toDF("doc_id", "text")
    // schema: doc_id, text (redacted in place), n_emails, n_phones, n_ips
    val r = TextAnalysis.redactPii(d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getInt(2) == 2 && r(1L).getString(1) == "mail <EMAIL> and <EMAIL> today")
    assert(r(2L).getInt(3) == 2 && r(2L).getInt(4) == 1)
    assert(r(2L).getString(1) == "call <PHONE> or <PHONE> from <IP>")
    assert(r(3L).getInt(2) == 0 && r(3L).getInt(3) == 0 && r(3L).getInt(4) == 0)
    assert(r(3L).getString(1) == "plain prose with no identifiers at all")
  }

  test("chunkWithOverlap: windows tile with the configured overlap") {
    val d = Seq((1L, "t1 t2 t3 t4 t5 t6 t7")).toDF("doc_id", "text")
    val out = Corpus.chunkWithOverlap(d, chunkTokens = 4, overlapTokens = 2)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getString(3)).toSeq ==
      Seq("t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7"))
    assert(out.map(_.getInt(2)).toSeq == Seq(4, 4, 3))
    // every token position is covered; consecutive chunks share exactly
    // `overlap` tokens except the tail
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
  }

  test("chunkWithOverlap: doc shorter than one chunk emits a single window") {
    val d = Seq((1L, "just three tokens")).toDF("doc_id", "text")
    val out = Corpus.chunkWithOverlap(d, chunkTokens = 32, overlapTokens = 8).collect()
    assert(out.length == 1)
    assert(out(0).getString(3) == "just three tokens" && out(0).getInt(2) == 3)
  }

  test("redactPii: broadened formats — NANP variants match, bad octets don't") {
    val d = Seq(
      (1L, "dial (555) 123-4567 or 555.123.4567 or +1-555-123-4567"),
      (2L, "not an ip: 999.999.999.999 but 255.255.255.255 is"),
      (3L, "phone-shaped inside email x555-123-4567@y.com stays an email")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(d).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getInt(3) == 3)
    assert(r(1L).getString(1) == "dial <PHONE> or <PHONE> or <PHONE>")
    assert(r(2L).getInt(4) == 1)
    assert(r(2L).getString(1) == "not an ip: 999.999.999.999 but <IP> is")
    // the email pass consumes the local part; the phone count (taken on
    // the post-email text) must NOT claim a phone was redacted
    assert(r(3L).getInt(2) == 1 && r(3L).getInt(3) == 0)
    assert(r(3L).getString(1) == "phone-shaped inside email <EMAIL> stays an email")
  }

  test("chunkWithOverlap: empty and whitespace-only docs emit no chunks") {
    val d = Seq((1L, ""), (2L, "   "), (3L, "one real token")).toDF("doc_id", "text")
    val out = Corpus.chunkWithOverlap(d, chunkTokens = 8, overlapTokens = 2).collect()
    assert(out.map(_.getLong(0)).toSet == Set(3L))
  }

  test("weightedMixtureSample: weight scales the keep rate, nested in rate") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val one = docs.withColumn("w", lit(1.0))
    val zero = docs.withColumn("w", lit(0.0))
    // weight 0 keeps nothing; weight 1 ≡ plain rate thresholds
    assert(Corpus.weightedMixtureSample(zero, Map.empty, 0.9, "w").count() == 0)
    val atOne = Corpus.weightedMixtureSample(one, Map.empty, 0.5, "w")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val n = docs.count().toDouble
    assert(math.abs(atOne.size / n - 0.5) < 0.1)
    // nested: a higher rate yields a superset at the same weights
    val atOneHigher = Corpus.weightedMixtureSample(one, Map.empty, 0.8, "w")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(atOne.subsetOf(atOneHigher))
    // fractional weight thins the sample below the pure rate
    val half = docs.withColumn("w", lit(0.5))
    val atHalf = Corpus.weightedMixtureSample(half, Map.empty, 0.8, "w")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(atHalf.subsetOf(atOneHigher) && atHalf.size < atOneHigher.size)
  }

  test("temperatureMixtureSample: smallest source kept whole, big ones thinned") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val bySrc = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minSrc = bySrc.minBy(_._2)._1
    val sampled = Corpus.temperatureMixtureSample(docs, temperature = 2.0)
    val keptBySrc = sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate for the smallest source is exactly 1.0 → kept in full
    assert(keptBySrc(minSrc) == bySrc(minSrc))
    // every other source lands near sqrt(n_min/n_src) of its size
    for ((src, tot) <- bySrc if src != minSrc) {
      val expect = math.sqrt(bySrc(minSrc).toDouble / tot) * tot
      assert(math.abs(keptBySrc.getOrElse(src, 0L) - expect) < 6 * math.sqrt(expect) + 3)
    }
    // T=1 keeps the natural mixture untouched
    assert(Corpus.temperatureMixtureSample(docs, temperature = 1.0).count() == docs.count())
  }

  test("qualityThresholdFilter: histogram threshold, ties share a fate") {
    // group g: scores 0.9×1, 0.8×2, 0.5×2 (total 5)
    val d = Seq(
      (1L, "g", 0.9), (2L, "g", 0.8), (3L, "g", 0.8), (4L, "g", 0.5), (5L, "g", 0.5)
    ).toDF("doc_id", "source", "quality")
    // keep 50%: cum_before(0.9)=0, (0.8)=1 < 2.5; (0.5)=3 ≥ 2.5 → 3 docs
    val half = Corpus.qualityThresholdFilter(d, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half == Set(1L, 2L, 3L))
    // keep 70%: 0.5's cum_before=3 < 3.5 → the whole tie group rounds in
    assert(Corpus.qualityThresholdFilter(d, 0.7).count() == 5)
    // keepFraction 1.0 keeps everything
    assert(Corpus.qualityThresholdFilter(d, 1.0).count() == 5)
  }

  test("gopherRules: each rule trips independently, pass is the conjunction") {
    val d = Seq(
      (1L, "the quick brown foxes jumped over those lazy hounds and then rested"),
      (2L, "short text"), // too few tokens
      (3L, "quick brown foxes jumped over lazy hounds sprinting quite far"), // no stopwords
      (4L, "the !!! ??? ... !!! ??? and ... !!! ??? sputtering on as junk") // punct-heavy
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(d, minTokens = 5, maxTokens = 100,
      minAvgTokenLen = 3.0, maxAvgTokenLen = 10.0,
      maxPunctRatio = 0.2, minStopwordHits = 2)
      .collect().map(x => x.getLong(0) -> x).toMap
    def flags(id: Long) = (r(id).getBoolean(2), r(id).getBoolean(3),
      r(id).getBoolean(4), r(id).getBoolean(5), r(id).getBoolean(6))
    assert(flags(1L) == (true, true, true, true, true))
    assert(!r(2L).getBoolean(2) && !r(2L).getBoolean(6)) // token count trips
    assert(!r(3L).getBoolean(5) && !r(3L).getBoolean(6)) // stopwords trip
    assert(!r(4L).getBoolean(4) && !r(4L).getBoolean(6)) // punct ratio trips
  }

  test("c4Rules: each rule trips independently, pass is the conjunction") {
    val d = Seq(
      (1L, "the quick brown fox jumped over the lazy dog."),
      (2L, "no terminal punctuation on this line here"),
      (3L, "too few."),
      (4L, "some Lorem Ipsum dolor sit amet filler text."),
      (5L, "a config snippet with a { brace inside it."),
      (6L, "please enable JavaScript to view this content."),
      (7L, "ends with a quoted phrase \"like this one.\"")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.c4Rules(d, minWords = 5)
      .collect().map(x => x.getLong(0) -> x).toMap
    // columns: doc_id, ok_terminal_punct, ok_min_words, ok_no_lorem,
    //          ok_no_brace, ok_no_javascript, pass
    assert(r(1L).getBoolean(6))
    assert(!r(2L).getBoolean(1) && !r(2L).getBoolean(6))
    assert(!r(3L).getBoolean(2) && !r(3L).getBoolean(6))
    assert(!r(4L).getBoolean(3) && !r(4L).getBoolean(6)) // case-insensitive marker
    assert(!r(5L).getBoolean(4) && !r(5L).getBoolean(6))
    assert(!r(6L).getBoolean(5) && !r(6L).getBoolean(6))
    assert(r(7L).getBoolean(1) && r(7L).getBoolean(6)) // closing quote counts
    // empty input stays empty
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.c4Rules(empty).count() == 0)
  }

  test("chunkWithOverlap: reassembling zero-overlap chunks restores the text") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val chunks = Corpus.chunkWithOverlap(docs, chunkTokens = 10, overlapTokens = 0)
    // collect_list order is not orderBy-stable across partitions — sort
    // the (idx, text) structs inside the aggregate instead
    val glued = chunks
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
        x => x.getField("chunk_text")), " ").as("rebuilt"))
    val joined = docs
      .select(col("doc_id"), graft.functions.TextFunctions.normalizeText(col("text")).as("norm"))
      .join(glued, "doc_id")
    assert(joined.filter(col("norm") =!= col("rebuilt")).count() == 0)
  }

  test("prioritySample: exactly k per group, favors heavy docs, nested in k") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val s10 = Corpus.prioritySample(docs, k = 10)
    val sizes = s10.groupBy("source").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ == 10))
    // nested: the k=5 sample is a subset of the k=10 sample
    val s5 = Corpus.prioritySample(docs, k = 5)
    assert(s5.join(s10, Seq("doc_id"), "left_anti").count() == 0)
    // weighting works: mean sampled length exceeds corpus mean (the
    // fixture has enough docs per source for this to hold determin-
    // istically with the fixed salt)
    val meanAll = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    val meanSampled = s10.join(docs, "doc_id").agg(avg(col("n_chars"))).head().getDouble(0)
    assert(meanSampled > meanAll)
  }

  test("vocabulary: counts conserve the token volume; minCount prunes") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val v1 = TextAnalysis.vocabulary(docs, minCount = 1L)
    val totalTokens = docs
      .agg(sum(size(graft.functions.TextFunctions.tokens(col("text"))))).head().getLong(0)
    assert(v1.agg(sum(col("n"))).head().getLong(0) == totalTokens)
    val v5 = TextAnalysis.vocabulary(docs, minCount = 5L)
    assert(v5.filter(col("n") < 5).count() == 0)
    assert(v5.count() <= v1.count())
  }

  test("unigramLogProb: rare-token docs score below common-token docs") {
    val d = Seq(
      (1L, "the the the the the the the the"),
      (2L, "the the the the the the the zyxwvut")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.unigramLogProb(d).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(1L) < 0.0 && r(2L) < r(1L))
    // corpus run: every score is a negative mean of log-probs
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val scored = TextAnalysis.unigramLogProb(docs)
    assert(scored.count() == docs.count())
    assert(scored.filter(col("avg_logp") >= 0).count() == 0)
  }

  test("dsirScores: target-like docs outrank off-domain docs; exact smoothed value") {
    // corpus: d1 is pure target-domain vocabulary, d2 pure off-domain
    val corpus = Seq(
      (1L, "apple apple"),
      (2L, "banana banana")).toDF("doc_id", "text")
    val target = Seq((0L, "apple")).toDF("doc_id", "text")
    val r = TextAnalysis.dsirScores(corpus, target).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(1L) > r(2L))
    // hand-computed: vocab {apple, banana} (v=2), totr=4, tott=1;
    // lw(apple) = ln(2/3) - ln(3/6), lw(banana) = ln(1/3) - ln(3/6),
    // each rounded to 9 dp before the doc sum
    def lw(nt: Long, nr: Long) =
      math.round((math.log((nt + 1.0) / 3.0) - math.log((nr + 1.0) / 6.0)) * 1e9) / 1e9
    assert(math.abs(r(1L) - 2 * lw(1, 2)) < 1e-6)
    assert(math.abs(r(2L) - 2 * lw(0, 2)) < 1e-6)
    // empty target degrades to pure smoothing: all weights equal per
    // count profile, no crash
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.dsirScores(corpus, empty).count() == 2)
    // fixture run: scoring covers every document exactly once
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val scored = TextAnalysis.dsirScores(
      docs, docs.filter(pmod(col("doc_id"), lit(20)) === 0))
    assert(scored.count() == docs.count())
  }

  test("decontaminationReport: burned bench docs count their leakers; clean report zeros") {
    val leaked = "the quick brown fox jumps over the lazy dog sat down"
    val bench = Seq(
      (100L, leaked),
      (101L, "pristine eval item with entirely unshared phrasing throughout its text"))
      .toDF("bench_id", "text")
    val docs = Seq(
      (1L, "so " + leaked + " again"), // leaks 100
      (2L, leaked),                    // leaks 100
      (3L, "unrelated corpus document with no overlap at all in here"))
      .toDF("doc_id", "text")
    val r = Corpus.decontaminationReport(docs, bench).collect()
      .map(x => x.getLong(0) -> (x.getInt(1), x.getBoolean(2))).toMap
    assert(r(100L) == ((2, true)))
    assert(r(101L) == ((0, false))) // closure: clean bench docs still report
  }

  test("lmQualityBuckets: per-language terciles, ties share a bucket") {
    // 6 docs in one language with three distinct score levels (2 docs
    // each): the tercile boundaries land exactly on the tie groups
    val d = Seq(
      (1L, "the the the the", "en"), (2L, "the the the the", "en"),
      (3L, "the the the cat", "en"), (4L, "the the the cat", "en"),
      (5L, "cat dog bird fish", "en"), (6L, "cat dog bird fish", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.lmQualityBuckets(d).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "head" && out(2L) == "head")
    assert(out(3L) == "middle" && out(4L) == "middle")
    assert(out(5L) == "tail" && out(6L) == "tail")
    // ties share a fate: identical texts never split buckets
    assert(Seq(1L -> 2L, 3L -> 4L, 5L -> 6L).forall { case (a, b) => out(a) == out(b) })
  }

  test("empty input: curation ops return empty, not crash") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.redactPii(empty).count() == 0)
    assert(Corpus.chunkWithOverlap(empty, 8, 2).count() == 0)
    val emptyDocs = Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "n_chars")
    assert(Corpus.prioritySample(emptyDocs, k = 3).count() == 0)
  }
}
