package graft.pipeline

import graft.functions.TextFunctions
import graft.operators.Corpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * CLI entry point for the training-data curation pipeline — the
 * counterpart of [[Main]] (graph projection) for the corpus side: one
 * `spark-submit`-able job running [[Corpus.prepareTrainingSet]]'s
 * quality → dedup → decontaminate → split → shard chain end to end.
 *
 *   --input <dir/file.parquet>   corpus parquet (needs doc_id, text,
 *                                source, n_chars — the documents schema)
 *   --output <dir>               shard output root (split=/shard= leaves)
 *   --benchmark <path>           optional eval-set parquet for
 *                                decontamination (needs bench_id or
 *                                doc_id + text); omit to skip the stage
 *   --quality_keep 0.8           optional top-fraction-per-source
 *                                quality gate (omit to skip stage 0)
 *   --min_jaccard 0.2            LSH near-dup verify threshold
 *   --fuzzy_jaccard 0.5          optional FUZZY decontamination: also
 *                                drop docs whose shingle Jaccard
 *                                against any benchmark doc clears this
 *                                (needs --benchmark; omit to skip)
 *   --span_frac 0.95             optional span-level boilerplate cut:
 *                                drop docs whose distinct token-window
 *                                set is >= this fraction duplicated
 *                                elsewhere in the corpus (omit to skip)
 *   --span_tokens 8              window width for --span_frac
 *   --embeddings <path>          optional embeddings parquet keyed
 *                                (vec_id == doc_id, embedding) enabling
 *                                the SemDeDup stage
 *   --semantic_threshold 0.95    optional SemDeDup cosine threshold:
 *                                drop docs whose embedding has a
 *                                smaller-id within-cell twin at or
 *                                above it (needs --embeddings)
 *   --temperature 2.0            optional mixture balancing: flatten
 *                                post-decontamination source shares at
 *                                temperature T (omit to skip)
 *   --mixture web=0.5,books=1.0  optional explicit per-source keep
 *                                rates (mutually exclusive with
 *                                --temperature)
 *   --mixture_default 1.0        keep rate for sources not named in
 *                                --mixture (default 1.0)
 *   --classifier_dims 4096       score the quality gate with the hashed
 *                                LINEAR-CLASSIFIER model instead of the
 *                                heuristic (needs --quality_keep)
 *   --classifier_weights <path>  parquet (bucket, w_milli) weights for
 *                                --classifier_dims; omit for the
 *                                deterministic synthetic stand-in
 *   --splits train=0.98,valid=0.01,test=0.01
 *   --shards 64                  shard count per split
 *   --master <spark master>      default local[*]
 *   --debug                      bare flag → INFO logs
 *
 * Example:
 *   runMain graft.pipeline.CurateMain --input /data/documents.parquet \
 *     --benchmark /data/eval.parquet --output /data/shards \
 *     --quality_keep 0.8 --splits train=0.9,valid=0.05,test=0.05
 */
object CurateMain {
  def main(args: Array[String]): Unit = {
    val opts = Cli.parseArgs(args)
    val spark = SparkSession.builder()
      .master(opts.getOrElse("master", "local[*]"))
      .appName("graft-curate")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      if (opts.get("debug").exists(Cli.strtobool)) "INFO" else "WARN")
    try run(spark, opts) finally spark.stop()
  }

  /** The job body, session-agnostic (tests drive it on the shared
    * session; `main` owns session lifecycle). */
  private[graft] def run(spark: SparkSession, opts: Map[String, String]): Unit = {
    def req(k: String): String = opts.getOrElse(k,
      sys.error(s"missing required flag --$k"))
    val docs = spark.read.parquet(req("input"))
    val bench = opts.get("benchmark")
      .map { p =>
        val b = spark.read.parquet(p)
        if (b.columns.contains("bench_id")) b.select(col("bench_id"), col("text"))
        else b.select(col("doc_id").as("bench_id"), col("text"))
      }
      // no benchmark → decontamination stage passes everything through
      .getOrElse(docs.select(col("doc_id").as("bench_id"), col("text")).limit(0))

    val splits = parseSplits(opts.getOrElse("splits", "train=0.98,valid=0.01,test=0.01"))
    val qualityKeep = opts.get("quality_keep").map(_.toDouble)
    val temperature = opts.get("temperature").map(_.toDouble)
    val mixtureRates = opts.get("mixture").map(v =>
      parseSplits(v).toMap ->
        opts.get("mixture_default").map(_.toDouble).getOrElse(1.0))
    require(temperature.isEmpty || mixtureRates.isEmpty,
      "--temperature and --mixture are mutually exclusive")
    val classifierDims = opts.get("classifier_dims").map(_.toInt)
    require(classifierDims.isEmpty || qualityKeep.nonEmpty,
      "--classifier_dims needs --quality_keep (it only changes the gate's score)")
    // the gate's score column: model-based (hashed linear classifier)
    // when --classifier_dims is given, the heuristic otherwise
    val scoredDocs = (qualityKeep, classifierDims) match {
      case (Some(_), Some(d)) =>
        val w = opts.get("classifier_weights")
          .map(spark.read.parquet(_))
          .getOrElse(graft.operators.TextAnalysis.syntheticHashedWeights(spark, d))
        docs.join(
          graft.operators.TextAnalysis.hashedLinearScores(docs, w, d)
            .select(col("doc_id"), col("score").as("quality")),
          Seq("doc_id"))
      case (Some(_), None) => docs.withColumn("quality",
        TextFunctions.qualityScore(col("text"), col("n_chars")))
      case (None, _) => docs
    }
    val prepared = Corpus.prepareTrainingSet(
      scoredDocs,
      bench,
      req("output"),
      splits = splits,
      minJaccard = opts.get("min_jaccard").map(_.toDouble).getOrElse(0.2),
      nShards = opts.get("shards").map(_.toInt).getOrElse(64),
      qualityFilter = qualityKeep.map("quality" -> _),
      temperature = temperature,
      mixtureRates = mixtureRates,
      fuzzyDecontaminate = opts.get("fuzzy_jaccard").map(_.toDouble),
      spanDedup = opts.get("span_frac").map(f =>
        (opts.get("span_tokens").map(_.toInt).getOrElse(8), f.toDouble)),
      semanticDedup = opts.get("semantic_threshold").map { thr =>
        val embPath = opts.getOrElse("embeddings",
          sys.error("--semantic_threshold needs --embeddings"))
        spark.read.parquet(embPath) -> thr.toDouble
      })

    val bySplit = prepared.groupBy(col("split")).agg(count(lit(1)).as("n"))
      .collect().map(r => s"${r.get(0)}=${r.getLong(1)}").sorted.mkString(", ")
    println(s"[graft-curate] wrote ${req("output")}: $bySplit")
  }

  /** `name=weight,name=weight` → ordered split spec. */
  private[graft] def parseSplits(v: String): Seq[(String, Double)] = {
    val parsed = Cli.splitList(v).map { part =>
      part.split('=') match {
        case Array(name, w) => name.trim -> w.trim.toDouble
        case _ => sys.error(s"bad --splits entry '$part' (want name=weight)")
      }
    }
    require(parsed.nonEmpty, "--splits must name at least one split")
    parsed
  }
}
