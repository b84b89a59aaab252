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
