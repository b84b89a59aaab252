package graft.operators

import graft.functions.TextFunctions._
import graft.ops.Par
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Document-level text analysis for training-data curation: token counts,
 * quality scores, language ID, fingerprints. One narrow projection per
 * document — no shuffle at all; at 100 TB this runs scan-speed.
 */
object TextAnalysis {

  /** Per-document stats: whitespace + BPE-ish token counts, punctuation /
    * stopword ratios, average token length, composite quality score. */
  def textStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    Par.fanOut(docs).select(
      col(idCol),
      length(t).as("n_chars_actual"),
      tokenCountWs(t).as("n_tokens_ws"),
      tokenCountBpe(t).as("n_tokens_bpe"),
      round(punctRatio(t), 6).as("punct_ratio"),
      round(stopwordRatio(t), 6).as("stopword_ratio"),
      round(avgTokenLen(t), 6).as("avg_token_len"),
      qualityScore(t, col("n_chars")).as("quality"))
  }

  /** Language-ID by marker-word overlap, with per-language hit counts. */
  def languageId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val hitCols = LangMarkers.map { case (lang, ms) =>
      langMarkerHits(t, ms).as(s"hits_$lang")
    }
    Par.fanOut(docs).select((col(idCol) +: hitCols :+ langId(t).as("lang_pred")): _*)
  }

  /** Within-document repetition ratio: the fraction of n-token windows
    * that are repeats of an earlier window (1 − distinct/total). The
    * standard corpus-filtering signal for boilerplate and degenerate
    * generation (navigation chrome, keyword stuffing, copy-paste spam
    * score high; clean prose scores near 0). Map-side only — the token
    * windows are computed once per row and never leave the projection. */
  def repetitionRatio(
      docs: DataFrame,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    Par.fanOut(docs)
      .select(
        col(idCol),
        greatest(tokenCountWs(t) - lit(n - 1), lit(1)).cast("int").as("n_windows"),
        size(tokenShingles(t, n)).as("n_distinct"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_windows").cast("double"), 6))
  }

  /** Corpus report card: per-(grouping) document counts, token totals,
    * quality mass and length extremes — the composition summary a
    * mixture designer reads before weighting sources. One keyed shuffle
    * with map-side partial aggregation; quality sums go through
    * DECIMAL(18,6) so the total is summation-order-exact (and therefore
    * engine-reproducible), not a float race. */
  def corpusReport(
      docs: DataFrame,
      groupCols: Seq[String] = Seq("lang", "source"),
      textCol: String = "text",
      nCharsCol: String = "n_chars"): DataFrame = {
    val t = col(textCol)
    docs.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_docs"),
      sum(tokenCountWs(t).cast("long")).as("total_tokens_ws"),
      round(sum(qualityScore(t, col(nCharsCol))
        .cast(org.apache.spark.sql.types.DecimalType(18, 6))).cast("double"), 6)
        .as("sum_quality"),
      min(length(t)).as("min_chars"),
      max(length(t)).as("max_chars"))
  }

  /** PII patterns, written to the common RE2-compatible subset so Java
    * regex (Spark) and RE2 (DuckDB, and most scale-out regex engines)
    * match identically: no backreferences, no lookaround. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII redaction: emails, phone numbers and IPv4 addresses replaced by
    * typed placeholder tokens, with per-document match counts (counted
    * on the ORIGINAL text, so the counts audit what was removed).
    * Replacement order (email → phone → ip) is part of the contract:
    * each later pattern scans the earlier passes' output. Map-side only
    * — codegen'd regexp expressions, no UDF, no shuffle. */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_emails", regexp_count(t, lit(EmailRe)).cast("int"))
      .withColumn("n_phones", regexp_count(t, lit(PhoneRe)).cast("int"))
      .withColumn("n_ips", regexp_count(t, lit(Ipv4Re)).cast("int"))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          Ipv4Re, "<IP>"))
  }

  /** Corpus vocabulary: whitespace tokens ranked by frequency — the
    * tokenizer-training / stopword-mining primitive. One explode + one
    * keyed count with map-side partial aggregation; `minCount` prunes
    * the hapax tail BEFORE the rank so the window input stays small. */
  def vocabulary(
      docs: DataFrame,
      minCount: Long = 1L,
      textCol: String = "text"): DataFrame =
    docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  // NOTE deliberately returns UNRANKED counts: a global dense rank over
  // a web-scale vocab is a single-partition window. Rank downstream with
  // orderBy(...).limit(k) (TakeOrderedAndProject) for top-k use.

  /** Per-document unigram cross-entropy against the corpus's own unigram
    * model: score(d) = mean over tokens of ln P(token), P = count/total.
    * Low (very negative) scores flag documents dominated by corpus-rare
    * tokens — a cheap, training-free fluency/outlier signal (the
    * KenLM-style filter's first rung). Two scans: one to build the
    * model, one to score; the token→logp join is left to AQE (broadcast
    * when the vocab is small, shuffle otherwise — a web-scale vocab must
    * NOT be forced broadcast). Per-token logs are rounded to 9 dp and
    * summed as DECIMAL, so the mean is summation-order-exact and
    * engine-reproducible. */
  def unigramLogProb(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    // total token count as a 1-row broadcast frame (a global window here
    // would single-partition the vocab)
    val total = toks.agg(count(lit(1)).as("total"))
    val model = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .select(col("token"),
        round(log(col("n").cast("double") / col("total").cast("double")), 9)
          .cast(dec).as("logp"))
    toks.join(model, "token")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(sum(col("logp")).cast("double") / count(lit(1)), 6).as("avg_logp"))
  }

  /** Document fingerprints: exact (md5 of normalized text) and
    * rolling-hash (min shingle hash, winnowing-style) via the native
    * one-pass MinShingleMd5 expression — no explode, no shuffle; both
    * fingerprints come out of a single map-side projection. */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      shingleK: Int = 8): DataFrame =
    Par.fanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        md5Fingerprint(col(textCol)).as("fp_exact"),
        graft.functions.MinShingleMd5.minShingleMd5(col(textCol), shingleK).as("fp_rolling"))
}
