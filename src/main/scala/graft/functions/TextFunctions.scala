package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Column-level text primitives for the training-data pipeline operators
 * (dedup, quality scoring, language ID, fingerprinting).
 *
 * Everything here composes Spark built-ins (`org.apache.spark.sql.functions`)
 * — codegen'd, whole-stage-compatible, no UDFs — so a 100 TB scan stays
 * inside WholeStageCodegen and filters/projections still push down.
 *
 * Hashing strategy: two interchangeable families —
 *  - `xxhash64(...)` (native, fastest) for production-scale runs;
 *  - `md5(...)` (hex string) where cross-engine reproducibility matters
 *    (the DuckDB oracle computes the identical value).
 */
object TextFunctions {

  /** Whitespace-collapsed, trimmed, lower-cased text. */
  def normalizeText(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column =
    split(normalizeText(text), " ")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(tokens(text))

  /** BPE-ish subword token count: letter runs, digits, and single
    * non-alphanumeric marks — a cheap proxy for BPE vocab tokenization. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Character k-shingles of the normalized text (distinct). At least one
    * shingle is produced even for short texts.
    *
    * The normalized text is bound ONCE per row through an outer
    * single-element `transform` lambda — referencing `normalizeText`
    * directly inside the per-position lambda would re-run the
    * regexp_replace for every gram (len(text)× per document: measured
    * 4-10× slowdown on every shingle consumer). */
  def shingles(text: Column, k: Int): Column =
    transform(
      array(normalizeText(text)),
      nt =>
        array_distinct(
          transform(
            sequence(lit(1), greatest(length(nt) - (k - 1), lit(1))),
            i => nt.substr(i, lit(k))))).getItem(0)

  /** Token n-grams of the normalized text (distinct, space-rejoined) —
    * the decontamination granularity (8-token overlap is the published
    * convention); ~wordcount grams per doc vs ~charcount for character
    * shingles. Tokens bind once per row (same trick as [[shingles]]);
    * texts shorter than n tokens yield one truncated gram, mirroring
    * the character form. */
  def tokenShingles(text: Column, n: Int): Column =
    transform(array(tokens(text)), tk =>
      array_distinct(
        transform(
          sequence(lit(1), greatest(size(tk) - (n - 1), lit(1))),
          i => concat_ws(" ", slice(tk, i, lit(n)))))).getItem(0)

  /** NON-distinct sliding token n-grams (space-rejoined) — the raw
    * window stream the repetition profile counts occurrences over;
    * [[tokenShingles]] is its distinct form. Tokens bind once per row
    * (same trick as [[shingles]]); short texts yield one truncated
    * gram. */
  def tokenWindows(text: Column, n: Int): Column =
    transform(array(tokens(text)), tk =>
      transform(
        sequence(lit(1), greatest(size(tk) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(tk, i, lit(n))))).getItem(0)

  /** Exact-dup fingerprint: md5 of the normalized text. */
  def md5Fingerprint(text: Column): Column =
    md5(normalizeText(text))

  /** Rolling-hash document fingerprint (winnowing-style): the minimum
    * shingle hash over the document — robust to local edits, unlike the
    * whole-text md5. Oracle-reproducible (md5 family). */
  def minShingleFingerprint(text: Column, k: Int): Column =
    array_min(transform(shingles(text, k), g => md5(g)))

  /** One MinHash value: min over shingles of md5(seed:shingle). A MinHash
    * signature is `Seq.tabulate(h)(i => minhash(text, k, i))`. */
  def minhash(text: Column, k: Int, seed: Int): Column =
    array_min(transform(shingles(text, k), g => md5(concat_ws(":", lit(seed), g))))

  /** Punctuation ratio: punctuation chars / total chars. */
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Ratio of tokens that are stopwords (fixed English stopword list). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => Stopwords.map(t === _).reduce(_ || _)))

  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") /
      greatest(tokenCountWs(text), lit(1)).cast("double")

  /** Mean token length (normalized text). */
  def avgTokenLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(tokenCountWs(text), lit(1)).cast("double")

  /** Composite quality score in [0,1]: favors mid-length docs with low
    * punctuation and a sane stopword rate. Deterministic arithmetic only. */
  def qualityScore(text: Column, nChars: Column): Column = {
    val lengthScore = least(nChars.cast("double") / lit(500.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * lit(5.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    round(lengthScore * lit(0.4) + punctScore * lit(0.3) + stopScore * lit(0.3), 6)
  }

  /** Language marker words, per language, for the n-gram/stopword-overlap
    * language-ID heuristic. Priority order breaks ties. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langMarkerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => markers.map(t === _).reduce(_ || _)))

  /** Predicted language: argmax of marker hits, ties broken by the fixed
    * priority order of LangMarkers; no hits at all → "und" (undetermined). */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> langMarkerHits(text, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(Option.empty[Column]) { case (acc, (lang, s)) =>
      val cond = s === best && s > 0
      Some(acc.map(c => c.when(cond, lit(lang))).getOrElse(when(cond, lit(lang))))
    }.map(_.otherwise(lit("und"))).getOrElse(lit("und"))
  }
}
