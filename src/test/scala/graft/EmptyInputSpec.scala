package graft

import graft.operators.{Corpus, Dedup, RangeJoin, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input hygiene: every operator must return an EMPTY (or
  * well-defined) result on empty inputs, not throw — at warehouse scale
  * an empty partition, source, or date-slice is routine, and a pipeline
  * step that crashes on it takes the whole DAG down. */
class EmptyInputSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val noDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType), StructField("lang", StringType))))

  test("dedup operators on an empty corpus") {
    assert(Dedup.exact(noDocs).count() == 0)
    assert(Dedup.lshJaccard(noDocs, minJaccard = 0.2).count() == 0)
    assert(Dedup.simhashBuckets(noDocs).count() == 0)
    assert(Dedup.spanDuplicates(noDocs).count() == 0)
  }

  test("corpus operators on an empty corpus") {
    assert(Corpus.connectedComponents(Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0)
    assert(Corpus.dupClusters(noDocs, Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0)
    assert(Corpus.mixtureSample(noDocs, Map("x" -> 0.5), 0.1).count() == 0)
    assert(Corpus.assignSplits(noDocs, Seq("a" -> 1.0, "b" -> 1.0)).count() == 0)
    assert(Corpus.sampleFixedPerGroup(noDocs, 5).count() == 0)
    assert(Corpus.packChunks(noDocs, 512).count() == 0)
    assert(Corpus.tfidfTopTerms(noDocs).count() == 0)
    // empty benchmark: nothing is contaminated, every doc still present
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = Corpus.decontaminate(docs,
      noDocs.select($"doc_id".as("bench_id"), $"text")).collect()
    assert(out.length == 1 && !out.head.getBoolean(3))
  }

  test("text analysis on an empty corpus") {
    val noDocs2 = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))
    assert(graft.operators.TextAnalysis.repetitionRatio(noDocs2).count() == 0)
    assert(graft.operators.TextAnalysis.corpusReport(noDocs2).count() == 0)
    assert(graft.operators.TextAnalysis.corpusReport(noDocs2, quantileProbe = true).count() == 0)
    assert(graft.operators.TextAnalysis.gopherRules(noDocs2).count() == 0)
  }

  test("round-6 operators on empty inputs") {
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.Graph.pageRankDirected(noEdges).count() == 0)
    assert(graft.operators.Graph.nodeSimilarityTopK(noEdges).count() == 0)
    assert(graft.operators.Graph.connectedComponents(noEdges).count() == 0)
    val wq = noDocs.withColumn("w", lit(1.0)).withColumn("n_chars", lit(0L))
    assert(Corpus.weightedMixtureSample(wq, Map.empty, 0.5, "w").count() == 0)
    assert(Corpus.temperatureMixtureSample(noDocs).count() == 0)
    assert(Corpus.qualityThresholdFilter(wq, 0.5, scoreCol = "w").count() == 0)
    val noBench = noDocs.select($"doc_id".as("bench_id"), $"text")
    assert(Dedup.crossLshJaccard(noDocs, noBench).count() == 0)
    val noEvents = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("user_id", LongType),
        StructField("ts", TimestampType), StructField("value", DoubleType))))
    assert(graft.operators.Events.resampleLastValue(noEvents).count() == 0)
  }

  test("round-7 operators on empty inputs") {
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.Graph.labelPropagation(noEdges).count() == 0)
    assert(graft.operators.Graph.kCore(noEdges, k = 2).count() == 0)
    assert(graft.operators.Graph.shortestPaths(noEdges,
      Seq.empty[Tuple1[Long]].toDF("node")).count() == 0)
    assert(graft.operators.Graph.coOccurrenceEdges(
      noDocs.select($"doc_id".as("g"), $"doc_id".as("item")), "g", "item").count() == 0)
    assert(graft.operators.TextAnalysis.lmQualityBuckets(noDocs).count() == 0)
    val noEvents = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("user_id", LongType), StructField("ts", TimestampType))))
    assert(graft.operators.Events.cohortRetention(noEvents).count() == 0)
    // empty BENCHMARK: no eval item exists, so the report is empty —
    // and an empty CORPUS burns nothing (closure still lists the bench)
    val noBench = noDocs.select($"doc_id".as("bench_id"), $"text")
    assert(Corpus.decontaminationReport(noDocs, noBench).count() == 0)
    val bench1 = Seq((9L, "x y z")).toDF("bench_id", "text")
    val rep = Corpus.decontaminationReport(noDocs, bench1).collect()
    assert(rep.length == 1 && rep.head.getInt(1) == 0 && !rep.head.getBoolean(2))
    val noVecs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val knn = Similarity.knnGraph(noVecs)
    assert(knn.count() == 0)
    assert(knn.columns.toSeq == Seq("src", "neighbor_id", "sim", "rank"))
  }

  test("round-8 batch-2 operators on empty inputs") {
    assert(graft.operators.TextAnalysis.repetitionProfile(noDocs).count() == 0)
    assert(Dedup.ppjoinJaccard(noDocs, minJaccard = 0.9).count() == 0)
    val w = graft.operators.TextAnalysis.syntheticHashedWeights(spark, dims = 64)
    assert(graft.operators.TextAnalysis
      .hashedLinearScores(noDocs, w, dims = 64).count() == 0)
  }

  test("similarity and range join on empty inputs") {
    val noVecs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    assert(Similarity.bruteForceTopK(noVecs, noVecs).count() == 0)
    val lsh = Similarity.lshTopK(noVecs, noVecs)
    assert(lsh.count() == 0) // plan-time dim probe must not head() an empty corpus
    assert(lsh.columns.toSeq == Seq("query_id", "neighbor_id", "sim", "rank"))
    val pts = Seq((1L, 5L)).toDF("pid", "ts")
    val noIv = Seq.empty[(Long, Long, Long)].toDF("iid", "s", "e")
    assert(RangeJoin.intervalJoin(pts, noIv, "ts", "s", "e", 10L).count() == 0)
  }
}
