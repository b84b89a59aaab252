package graft

import graft.model.{EdgeSpec, GraphModel, NodeSpec}
import graft.operators.{Dedup, Events, Multimodal, Similarity, TextAnalysis}
import graft.ops.{GraphOps, Stats}
import graft.pipeline.GraphProjection
import graft.sink.ParquetWireSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator from SURVEY.md §2 (or an
  * extension operator); `oracleSql` holds the DuckDB-equivalent SQL over the
  * same parquet tables. Column names are aliased identically on both sides —
  * the driver sorts columns by name before hashing.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Gate-query staging dirs live under the per-JVM scratch root, which a
    * shutdown hook removes — no orphaned graft_* dirs after Verify/Bench. */
  private def tmpDir(prefix: String): String = graft.ops.Scratch.dir(None, prefix)

  /** events.parquet's `ts` flavor varies by driver version (long nanos /
    * TIMESTAMP_NTZ / TIMESTAMP) — normalize to session-UTC TIMESTAMP
    * micros (graft.operators.Events.normalizeEventTs). */
  private def eventsTable(s: SparkSession, dir: String): DataFrame =
    graft.operators.Events.normalizeEventTs(t(s, dir, "events"))

  /** The §7.3 minimum end-to-end slice: customer as node source, orders as
    * edge source, regex-routed, canonically projected, written through the
    * wire-schema sink with the nodes-before-edges barrier; returns the
    * 3-row stats frame (node, edge, final). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val model = GraphModel(
      name = "flagship",
      nodes = Seq(NodeSpec(
        source = ".*customer.*parquet",
        keyField = Some("c_custkey"),
        properties = Map("c_acctbal" -> "acctbal", "c_mktsegment" -> "segment"))),
      edges = Seq(EdgeSpec(
        source = ".*orders.*parquet",
        sourceField = Some("o_custkey"),
        targetField = Some("o_orderkey"),
        properties = Map("o_totalprice" -> "totalprice"))))
    val out = tmpDir("entry")
    val res = GraphProjection.run(
      spark, model,
      nodePattern = Seq(s"$dir/customer.parquet"),
      edgePattern = Seq(s"$dir/orders.parquet"),
      sink = new ParquetWireSink(out))
    Stats.toDataset(spark, res.nodeStats ++ res.edgeStats :+ res.finalStats).toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.2 P1: provenance tagging via input_file_name ----
    "p1_provenance" -> ((s, dir) => {
      val c = GraphOps.tagProvenance(t(s, dir, "customer"))
      val o = GraphOps.tagProvenance(t(s, dir, "orders"))
      c.unionByName(o, allowMissingColumns = true)
        .select(regexp_extract(col(GraphOps.SrcCol), "([^/]+)\\.parquet", 1).as("file"))
        .groupBy("file").agg(count(lit(1)).as("n"))
    }),
    // ---- §2.2 P3: regex routing (anchored first-match, over provenance) ----
    "p3_route_regex" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.withColumn("spec",
          when(GraphOps.matchesSource(col("source"), "src1"), "one")
            .when(GraphOps.matchesSource(col("source"), "src[02]"), "evenish")
            .otherwise("other"))
        .groupBy("spec").agg(count(lit(1)).as("n"))
    }),
    // ---- §2.2 P4: canonical node projection (rename-to-wire-schema) ----
    "p4_node_project" -> ((s, dir) => {
      val spec = NodeSpec(".*customer.*", keyField = Some("c_custkey"),
        properties = Map("c_acctbal" -> "acctbal", "c_mktsegment" -> "segment"))
      GraphOps.projectNode(t(s, dir, "customer"), spec)
    }),
    // ---- §2.2 P5: canonical edge projection ----
    "p5_edge_project" -> ((s, dir) => {
      val spec = EdgeSpec(".*orders.*", sourceField = Some("o_custkey"),
        targetField = Some("o_orderkey"),
        properties = Map("o_totalprice" -> "totalprice"))
      GraphOps.projectEdge(t(s, dir, "orders"), spec)
    }),
    // ---- §2.4 A1: monoid stats combine (count + nbytes) ----
    "a1_sum_results" -> ((s, dir) =>
      Stats.sumResults(t(s, dir, "documents"), "n_chars", "node")),
    // ---- §2.4 A2 + §2.5 U1: union of phase stats → final combine ----
    "u1_union_stats" -> ((s, dir) => {
      val n = Stats.sumResults(t(s, dir, "customer")
        .withColumn("b", lit(8L)), "b", "node")
      val e = Stats.sumResults(t(s, dir, "orders")
        .withColumn("b", lit(16L)), "b", "edge")
      Stats.combineFinal(Seq(n, e))
    }),

    // ---- §2.3 R1/R2: re-batch / reshuffle — assert the partition contract ----
    "r1_rebatch" -> ((s, dir) => {
      val re = GraphOps.rebatch(t(s, dir, "customer"), 8)
      re.select(spark_partition_id().as("pid"))
        .agg(countDistinct(col("pid")).as("n_partitions"))
    }),
    // ---- §3 lifecycle: full projection pipeline with barrier; checks the
    //      wire-sink stats (incl. nbytes accounting) end to end ----
    "k3_pipeline_stats" -> ((s, dir) => {
      val model = GraphModel(
        name = "gate",
        nodes = Seq(NodeSpec(".*customer.*parquet", keyField = Some("c_custkey"),
          properties = Map("c_acctbal" -> "acctbal", "c_mktsegment" -> "segment"))),
        edges = Seq(EdgeSpec(".*orders.*parquet", sourceField = Some("o_custkey"),
          targetField = Some("o_orderkey"),
          properties = Map("o_totalprice" -> "totalprice"))))
      val out = tmpDir("gate")
      val res = GraphProjection.run(spark = s, model = model,
        nodePattern = Seq(s"$dir/customer.parquet"),
        edgePattern = Seq(s"$dir/orders.parquet"),
        sink = new ParquetWireSink(out))
      Stats.toDataset(s, Seq(res.finalStats)).toDF()
    }),

    // ---- §2.2 P4 multi-label: label_field holding array<string> (the
    //      gcs_model.json:7 plural-"labels" case) through the wire sink
    //      end-to-end; read back and emit hashable scalars ----
    "p4_multilabel" -> ((s, dir) => {
      val staged = tmpDir("ml")
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"),
          array(lit("Customer"), col("c_mktsegment")).as("labels"))
        .write.mode("overwrite").parquet(s"$staged/multilabel_nodes.parquet")
      val model = GraphModel(name = "ml",
        nodes = Seq(NodeSpec(".*multilabel_nodes.*", labelField = Some("labels"),
          keyField = Some("c_custkey"), properties = Map("c_acctbal" -> "acctbal"))))
      val out = tmpDir("ml_out")
      GraphProjection.run(s, model,
        nodePattern = Seq(s"$staged/multilabel_nodes.parquet"),
        edgePattern = Seq.empty, sink = new ParquetWireSink(out))
      s.read.parquet(s"$out/nodes")
        .select(col("nodeId"), concat_ws("|", col("labels")).as("labels_str"),
          col("acctbal"))
    }),

    // ==== extension operators: text analysis ====
    "text_stats" -> ((s, dir) => TextAnalysis.textStats(t(s, dir, "documents"))),
    "text_langid" -> ((s, dir) => TextAnalysis.languageId(t(s, dir, "documents"))),
    "text_fingerprint" -> ((s, dir) => TextAnalysis.fingerprints(t(s, dir, "documents"))),
    "text_winnow" -> ((s, dir) =>
      // winnowing (MOSS) fingerprints: min-hash-per-window with the
      // rightmost-tie rule riding one string key
      TextAnalysis.winnowing(t(s, dir, "documents"), k = 5, w = 4)),
    "text_repetition" -> ((s, dir) =>
      // boilerplate / degenerate-generation signal: repeated 3-token
      // windows within a document
      TextAnalysis.repetitionRatio(t(s, dir, "documents"), n = 3)),
    "text_repetition_profile" -> ((s, dir) =>
      // the full Gopher repetition-rule family: top 2/3/4-gram char
      // fraction + duplicate 5/10-gram char fraction per document
      TextAnalysis.repetitionProfile(t(s, dir, "documents"))),
    "corpus_report" -> ((s, dir) =>
      // per-(lang, source) composition summary: doc counts, token totals,
      // order-exact quality mass, length extremes; quantileProbe swaps
      // the sketch p50 for its cross-engine error-contract boolean
      TextAnalysis.corpusReport(t(s, dir, "documents"), quantileProbe = true)),

    // ==== extension operators: deduplication ====
    "dedup_exact" -> ((s, dir) => Dedup.exact(t(s, dir, "documents"))),
    "dedup_cdc_chunks" -> ((s, dir) =>
      // content-defined chunking (Rabin-boundary storage dedup at
      // token granularity): map-side chunking, hash-keyed frequency
      Dedup.cdcChunks(t(s, dir, "documents"))),
    "corpus_span_corruption" -> ((s, dir) =>
      // T5-style denoising mask plan: block-aligned spans (never
      // overlap by construction), one md5 per block for all 3 coins
      graft.operators.Corpus.spanCorruptionPlan(t(s, dir, "documents"))),
    "vocab_kn_bigram" -> ((s, dir) =>
      // interpolated Kneser-Ney bigram LM, fixed discount 0.75: the
      // continuation-count smoothing over the observed-bigram table
      TextAnalysis.knBigramLm(t(s, dir, "documents"))),
    "shard_rendezvous" -> ((s, dir) =>
      // highest-random-weight placement: shard removal remaps only
      // that shard's docs (spec-pinned), zero shuffle
      graft.operators.Corpus.rendezvousShards(t(s, dir, "documents"))),
    "corpus_fim_plan" -> ((s, dir) =>
      // fill-in-the-middle split plan: one md5 per doc carries the
      // apply coin and both cut points, 0 <= a <= b <= n guaranteed
      graft.operators.Corpus.fimPlan(t(s, dir, "documents"))),
    "dq_dp_counts" -> ((s, dir) =>
      // epsilon-DP Laplace count release over (lang, source) with the
      // deterministic inverse-CDF draw (quantized uniform)
      graft.operators.Quality.dpCounts(
        t(s, dir, "documents"), Seq("lang", "source"))),
    "dedup_url" -> ((s, dir) =>
      // FineWeb-style URL-level dedup over the canonical key; noisy URL
      // fixture (the corpus ships none): case jitter, default port,
      // trailing slash and tracking params all derived from doc_id so
      // canonicalization provably collapses them
      graft.operators.Corpus.urlDedup(
        t(s, dir, "documents").select(col("doc_id"),
          concat(
            when(pmod(col("doc_id"), lit(2L)) === 0, lit("https://"))
              .otherwise(lit("HTTPS://")),
            when(pmod(col("doc_id"), lit(3L)) === 0, upper(col("source")))
              .otherwise(col("source")),
            lit(".Example.COM"),
            when(pmod(col("doc_id"), lit(5L)) === 0, lit(":443"))
              .otherwise(lit("")),
            lit("/Docs/"), pmod(col("doc_id"), lit(40L)).cast("string"),
            when(pmod(col("doc_id"), lit(4L)) === 0, lit("/"))
              .otherwise(lit("")),
            when(pmod(col("doc_id"), lit(4L)) === 1,
                lit("?utm_source=feed&id=7&ref=tw"))
              .when(pmod(col("doc_id"), lit(4L)) === 2,
                lit("?id=7&utm_campaign=x"))
              .otherwise(lit(""))).as("url")))),
    "dedup_spans" -> ((s, dir) =>
      // span-level ExactSubstr flag: docs sharing any exact 8-token
      // window with another doc (Lee et al. 2021 granularity)
      Dedup.spanDuplicates(t(s, dir, "documents"))),
    "dedup_strip_spans" -> ((s, dir) =>
      // ExactSubstr REMOVAL: duplicated 8-token windows keep their
      // globally-first occurrence; every other occurrence is cut and
      // the text rebuilt from surviving tokens
      Dedup.stripDuplicateSpans(t(s, dir, "documents"))),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshCandidates(t(s, dir, "documents"))),
    "dedup_simhash_pairs" -> ((s, dir) =>
      // multi-index Hamming pairing: ALL pairs within distance 3
      Dedup.simhashPairs(t(s, dir, "documents"), maxHamming = 3,
        md5Family = true)),
    "dedup_simhash" -> ((s, dir) => // md5 token-hash family: the full
      // fingerprint is re-derived bit-for-bit by the DuckDB oracle
      Dedup.simhashBuckets(t(s, dir, "documents"), md5Family = true)),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(t(s, dir, "documents"), blockCols = Seq("lang", "source"),
        minJaccard = 0.30)),
    "dedup_containment" -> ((s, dir) =>
      // asymmetric near-dup: one doc's shingles mostly INSIDE the
      // other's (quote lifting) - pairs symmetric Jaccard misses
      Dedup.ngramContainment(t(s, dir, "documents"),
        blockCols = Seq("lang", "source"), minContainment = 0.5)),

    "dedup_lsh_jaccard" -> ((s, dir) =>
      // the scalable near-dup pipeline: LSH candidates -> exact verify
      Dedup.lshJaccard(t(s, dir, "documents"), minJaccard = 0.20)),
    "dedup_minhash_estimate" -> ((s, dir) =>
      // signature-agreement Jaccard ESTIMATE next to the exact value
      // (Broder): what a 100 TB pass ranks candidates by before any
      // shingle arrays ship; the estimator itself is hash-gated
      Dedup.minhashEstimatePairs(t(s, dir, "documents"))),
    "dedup_ppjoin" -> ((s, dir) =>
      // EXACT token-set similarity join via rarest-first prefix
      // filtering (AllPairs/PPJoin) - no LSH false negatives. Gated on
      // the deterministic quarter stratum: the synthetic fixture's
      // ~40-word vocabulary is the operator's documented worst case
      // (every pair collides - real corpora are Zipfian), so the gate
      // exercises exactness without paying the degenerate fanout
      Dedup.ppjoinJaccard(
        t(s, dir, "documents").filter(pmod(col("doc_id"), lit(4)) === 0),
        minJaccard = 0.9)),
    "dedup_clusters" -> ((s, dir) => {
      // pairs -> clusters (connected components), every doc labeled by
      // its component's min id; keep-one dedup = doc_id == cluster_id
      val docs = t(s, dir, "documents")
      graft.operators.Corpus.dupClusters(
        docs, Dedup.lshJaccard(docs, minJaccard = 0.20))
    }),
    "split_assign_clustered" -> ((s, dir) => {
      // leakage-safe splits: every near-dup cluster lands WHOLLY in one
      // split (coin on the cluster id, members inherit) — a train/test
      // boundary can't run through a duplicate group
      val docs = t(s, dir, "documents")
      graft.operators.Corpus.assignSplitsClustered(
        docs, Dedup.lshJaccard(docs, minJaccard = 0.20),
        Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
    }),
    "skew_salted_join" -> ((s, dir) => {
      // salted shuffle join on the 5-value (maximally skewed) type key:
      // the dim replicates 16x, each event picks one deterministic
      // salt - a hot key spreads over 16 reducers; result == plain join
      val ev = eventsTable(s, dir).filter(col("event_type").isNotNull)
      val dim = ev.groupBy(col("event_type"))
        .agg(round(avg(col("value")), 4).as("type_avg"))
      graft.ops.SkewAgg.saltedJoin(
        ev.select(col("event_id"), col("event_type"), col("value")),
        dim, "event_type", col("event_id"))
        .select(col("event_id"), col("event_type"),
          round(col("value"), 4).as("value"), col("type_avg"))
    }),
    "skew_salted_agg" -> ((s, dir) =>
      graft.ops.SkewAgg.saltedCountSum(eventsTable(s, dir),
        keyCol = "event_type", valueCol = "value", saltFrom = col("event_id"))),
    "dedup_embedding" -> ((s, dir) => {
      // embedding-cosine near-dup: duplicates = high-cosine pairs within a
      // block; representative = min vec_id (same keep-min contract as exact)
      val pairs = Similarity.cosinePairs(t(s, dir, "embeddings"),
        blockCol = "label", threshold = 0.40)
      pairs.groupBy(col("b").as("dup_id"))
        .agg(min(col("a")).as("kept_id"))
    }),

    // ==== extension operators: similarity search ====
    "sim_cosine_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 8))
    }),
    "emb_hard_negatives" -> ((s, dir) => {
      // contrastive-training prep: per anchor, the most-similar
      // WRONG-class items (the negatives that teach the boundary)
      val e = t(s, dir, "embeddings")
      Similarity.hardNegativesTopK(e, e.filter(col("vec_id") < 8))
    }),
    "sim_cosine_pairs" -> ((s, dir) =>
      Similarity.cosinePairs(t(s, dir, "embeddings"), blockCol = "label",
        threshold = 0.40)),
    "sim_ivf_pairs" -> ((s, dir) =>
      // the scale path when no small natural block exists: pairs blocked
      // by IVF cell (similarity-structured blocks from the Lloyd build)
      Similarity.ivfCosinePairs(t(s, dir, "embeddings"),
        threshold = 0.40, cells = 8, iters = 2)),
    "sim_lsh_topk" -> ((s, dir) => { // full oracle: md5-literal planes
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(e, e.filter(col("vec_id") < 8))
    }),
    "sim_int8_topk" -> ((s, dir) => {
      // memory-bound retrieval over int8 codes: exact integer dot
      // products, two fixed-order IEEE multiplies — no float-summation
      // hazard anywhere
      val e = t(s, dir, "embeddings")
      Similarity.int8TopK(e, e.filter(col("vec_id") < 8))
    }),
    "sim_kmeans" -> ((s, dir) =>
      // GDS-kmeans surface: unrolled deterministic L2 Lloyd; sum of
      // sq_dist is the inertia the elbow heuristic reads
      Similarity.kmeans(t(s, dir, "embeddings"), k = 8, iters = 2)),
    "emb_outliers" -> ((s, dir) => {
      // density outliers: every vector beyond its OWN cluster's p90
      // distance fence (conformal order statistic off the sq_dist
      // histogram, broadcast back) — the embedding-space anomaly read
      // k-means centroids can't give alone. kmeans assignment is a
      // map-side projection over pinned literals, so the two references
      // cost two scans, not two Lloyd builds
      val km = Similarity.kmeans(t(s, dir, "embeddings"), k = 8, iters = 2)
      val fence = graft.operators.Quality
        .conformalThreshold(km, "sq_dist", "cluster", 9L, 10L)
        .filter(col("qhat").isNotNull)
        .select(col("cluster"), col("qhat"))
      km.join(broadcast(fence), Seq("cluster"))
        .select(col("vec_id"), col("cluster"), col("sq_dist"), col("qhat"),
          (col("sq_dist") > col("qhat")).as("outlier"))
    }),
    "sim_knn_graph" -> ((s, dir) =>
      // corpus-wide kNN graph (GDS K-Nearest Neighbors): every node's
      // top-3 in-bucket cosine neighbors via the bucket self-join
      Similarity.knnGraph(t(s, dir, "embeddings"), k = 3)),
    "sim_nsw_topk" -> ((s, dir) => {
      // graph-based ANN (NSW greedy descent over the knn graph): the
      // full trajectory is gated, so every hop's argmax is pinned
      val e = t(s, dir, "embeddings")
      Similarity.graphGreedyTopK(e, e.filter(col("vec_id") < 8),
        degree = 3, maxHops = 3)
    }),
    "sim_hnsw_topk" -> ((s, dir) => {
      // hierarchical graph ANN (the full HNSW search shape): sparse
      // upper layer navigates, layer 0 refines from its terminus
      val e = t(s, dir, "embeddings")
      Similarity.hnswTopK(e, e.filter(col("vec_id") < 8),
        degree = 3, maxHops1 = 2, maxHops0 = 3)
    }),
    "sim_nsw_recall" -> ((s, dir) => {
      // the graph index's tuning readout: does the greedy terminus hit
      // the exact cosine top-1? (recall@1 per anchor query)
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 8)
      val term = Similarity.graphGreedyTopK(e, q, degree = 3, maxHops = 3)
        .filter(col("hop") === 3)
        .select(col("query_id"), col("node_id").as("neighbor_id"))
      Similarity.recallAtK(Similarity.bruteForceTopK(e, q, k = 1), term, k = 1)
    }),
    "sim_ivf_topk" -> ((s, dir) => { // full oracle: unrolled Lloyd steps
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 8), nProbe = 4)
    }),

    "emb_normalize" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(Similarity.l2Normalize(col("embedding"))))
        .select(col("vec_id"), col("pos").cast("int").as("pos"),
          round(col("col"), 6).as("val"))),
    "emb_standardize" -> ((s, dir) =>
      // per-dimension z-scores: dim stats pinned as literal arrays
      // (bounded collect), scaling is a zero-shuffle map-side transform
      t(s, dir, "embeddings")
        .transform(e => Similarity.standardize(e))
        .select(col("vec_id"), posexplode(col("z")))
        .select(col("vec_id"), col("pos").cast("int").as("pos"),
          col("col").as("val"))),
    "emb_random_projection" -> ((s, dir) =>
      // JL sketch: 8 md5-literal hyperplane projections per vector,
      // map-side sequential folds, no shuffle
      Similarity.randomProjection(t(s, dir, "embeddings"), outDims = 8)
        .select(col("vec_id"), posexplode(col("proj")))
        .select(col("vec_id"), col("pos").cast("int").as("pos"),
          col("col").as("val"))),
    "emb_pca" -> ((s, dir) =>
      // top principal component via power iteration on the d×d
      // covariance: two map-side corpus passes, then constant-size
      // rounds over the d²-row scratch table
      Similarity.pcaTopComponent(t(s, dir, "embeddings"), iters = 4)),
    "emb_pca_scores" -> ((s, dir) => {
      // 1-d corpus coordinates: every vector projected onto the top
      // component (component = one broadcast array row, map-side fold)
      val emb = t(s, dir, "embeddings")
      Similarity.pcaProject(emb, Similarity.pcaTopComponent(emb, iters = 4))
    }),
    "emb_quantize" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.quantizeInt8(col("embedding")).as("qz"))
        .select(col("vec_id"), round(col("qz.scale"), 9).as("scale"),
          posexplode(col("qz.q")))
        .select(col("vec_id"), col("scale"), col("pos").cast("int").as("pos"),
          col("col").as("q"))),

    // ==== extension operators: corpus assembly (training mixture) ====
    "sample_mixture" -> ((s, dir) =>
      graft.operators.Corpus.mixtureSample(t(s, dir, "documents"),
          rates = Map("src0" -> 0.75, "src1" -> 0.5), defaultRate = 0.25)
        .select(col("doc_id"), col("source"))),
    "stats_fdr" -> ((s, dir) => {
      // Benjamini-Hochberg step-up over a per-key p-value table. The
      // gate's p column is the deterministic md5-coin uniform grid per
      // part key (the operator takes ANY p column; a coin fixture
      // exercises rank/threshold/k* mechanics reproducibly cross-engine)
      val p = t(s, dir, "part").select(col("p_partkey").as("key"),
        (conv(substring(md5(concat(lit("fdr:"),
          col("p_partkey").cast("string"))), 1, 8), 16, 10).cast("long")
          % 1000000L).cast("double") / lit(1e6)).toDF("key", "p_value")
      graft.operators.Quality.bhFdr(p, qPermille = 50)
    }),
    "ev_seasonal" -> ((s, dir) =>
      // hour-of-day seasonal profile per type: bucket counts rolled up
      // by clock hour, mean events/bucket + share of type mass
      graft.operators.Events.seasonalProfile(eventsTable(s, dir))),
    "dq_freshness" -> ((s, dir) =>
      // ingest-SLO staleness audit per type: lag behind the table-wide
      // watermark + trailing-24h activity, exact epoch-milli arithmetic
      graft.operators.Quality.freshnessReport(eventsTable(s, dir),
        "event_type", "ts")),
    "ev_seasonal_anomaly" -> ((s, dir) =>
      // hourly buckets clearing 1.5x their type's same-clock-hour
      // baseline — burst detection against the RIGHT reference
      graft.operators.Events.seasonalAnomalies(eventsTable(s, dir),
        ratioNum = 3L, ratioDen = 2L)),
    "ev_holt_winters" -> ((s, dir) =>
      // additive Holt-Winters over the zero-densified hourly rate
      // series: driver-unrolled coefficient literals shared with the
      // oracle, forecast = level + h*trend + clock-phase seasonal
      graft.operators.Events.holtWintersForecast(eventsTable(s, dir))),
    "sample_quality_weighted" -> ((s, dir) =>
      // mixture tuning: per-source rate × per-document quality weight;
      // the 6-dp-rounded quality score keeps the threshold product
      // engine-reproducible
      graft.operators.Corpus.weightedMixtureSample(
          t(s, dir, "documents").withColumn("quality",
            graft.functions.TextFunctions.qualityScore(col("text"), col("n_chars"))),
          rates = Map("src0" -> 0.9, "src1" -> 0.6), defaultRate = 0.75,
          weightCol = "quality")
        .select(col("doc_id"), col("source"), col("quality"))),
    "sample_temperature" -> ((s, dir) =>
      // T=2 source balancing: keep rate sqrt(n_min/n_src) — sqrt is
      // IEEE-correctly-rounded, so the rate is bit-identical cross-engine
      graft.operators.Corpus.temperatureMixtureSample(
          t(s, dir, "documents"), temperature = 2.0)
        .select(col("doc_id"), col("source"))),
    "filter_quality" -> ((s, dir) =>
      // top-70%-per-source quality filter via the score histogram (no
      // per-source window over documents; ties share a fate)
      graft.operators.Corpus.qualityThresholdFilter(
          t(s, dir, "documents").withColumn("quality",
            graft.functions.TextFunctions.qualityScore(col("text"), col("n_chars"))),
          keepFraction = 0.7)
        .select(col("doc_id"), col("source"), col("quality"))),
    "text_gopher_rules" -> ((s, dir) =>
      graft.operators.TextAnalysis.gopherRules(t(s, dir, "documents"),
        minTokens = 25, maxTokens = 100000)),
    "text_c4_rules" -> ((s, dir) =>
      // C4 heuristic cleanup (terminal punctuation, min words, template
      // markers) — per-rule booleans + verdict from one scan
      graft.operators.TextAnalysis.c4Rules(t(s, dir, "documents"), minWords = 5)),
    "sample_fixed_k" -> ((s, dir) =>
      graft.operators.Corpus.sampleFixedPerGroup(
          t(s, dir, "documents"), k = 25, groupCol = "source")
        .select(col("doc_id"), col("source"))),
    "split_assign" -> ((s, dir) =>
      graft.operators.Corpus.assignSplits(t(s, dir, "documents"),
          Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
        .select(col("doc_id"), col("split"))),
    "decontaminate" -> ((s, dir) => {
      // every 20th doc plays the held-out benchmark; 8-token grams
      val docs = t(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select(col("doc_id").as("bench_id"), col("text"))
      graft.operators.Corpus.decontaminate(docs, bench)
    }),
    "decontaminate_bloom" -> ((s, dir) => {
      // Bloom pre-gate + exact verify: same fixture as `decontaminate`,
      // and — because a Bloom filter has no false negatives — the same
      // oracle, full value equality (not just an error contract)
      val docs = t(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select(col("doc_id").as("bench_id"), col("text"))
      graft.operators.Corpus.decontaminateBloom(docs, bench)
    }),
    "decontaminate_fuzzy" -> ((s, dir) => {
      // near-dup contamination (vs exact 8-gram overlap): training docs
      // whose shingle Jaccard against any benchmark doc clears 0.5;
      // the benchmark fixture mirrors `decontaminate`'s
      val docs = t(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select(col("doc_id").as("bench_id"), col("text"))
      graft.operators.Dedup.crossLshJaccard(docs, bench, minJaccard = 0.5)
        .select(col("a").as("doc_id"), col("b").as("bench_id"), col("jaccard"))
    }),
    "pack_chunks" -> ((s, dir) =>
      graft.operators.Corpus.packChunks(t(s, dir, "documents"), targetTokens = 512)),
    "corpus_shard_plan" -> ((s, dir) =>
      // the END-TO-END shard chain: packChunks -> rendezvousShards
      // (per chunk) -> epoch-1 order coin; oracle pins (shard, chunk,
      // doc order) for every document
      graft.operators.Corpus.shardPlan(t(s, dir, "documents"),
        targetTokens = 512, nShards = 16, epoch = 1)),
    "pack_greedy" -> ((s, dir) =>
      // doc-boundary greedy next-fit packing per (source, shard) — the
      // padding-paying alternative to pack_chunks' split-at-boundary
      graft.operators.Corpus.packGreedyBins(t(s, dir, "documents"),
        budgetTokens = 512L)),
    "pack_efficiency" -> ((s, dir) =>
      // bins used + padding waste + utilization per source — the
      // budget-tuning audit over the greedy pack
      graft.operators.Corpus.packEfficiency(
        graft.operators.Corpus.packGreedyBins(t(s, dir, "documents"),
          budgetTokens = 512L), budgetTokens = 512L)),
    "corpus_prepare" -> ((s, dir) => {
      // the END-TO-END compositor: top-80%-per-source quality gate ->
      // LSH near-dup clustering -> keep-one -> benchmark
      // decontamination (against the RAW benchmark side) -> split
      // assignment -> sharded write, verified as ONE composition (each
      // stage is also oracle-gated on its own). The result is a scan of
      // the just-written shards.
      val docs = t(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select(col("doc_id").as("bench_id"), col("text"))
      val out = graft.ops.Scratch.dir(
        s.conf.getOption("spark.graft.scratchDir"), "corpus_prepare")
      graft.operators.Corpus.prepareTrainingSet(
          // fanOut BELOW the regex-heavy score projection: the byte-
          // small documents scan is one split, and an exchange above
          // the expression would still evaluate it on that one task
          graft.ops.Par.fanOut(docs).withColumn("quality",
            graft.functions.TextFunctions.qualityScore(col("text"), col("n_chars"))),
          bench, out,
          splits = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
          minJaccard = 0.20, nShards = 8,
          qualityFilter = Some("quality" -> 0.8))
        .select(col("doc_id"), col("split").cast("string").as("split"))
    }),
    "decontaminate_report" -> ((s, dir) => {
      // per-BENCHMARK-doc audit: which eval items are burned, by how
      // many leaking corpus docs (same fixture as `decontaminate`)
      val docs = t(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select(col("doc_id").as("bench_id"), col("text"))
      graft.operators.Corpus.decontaminationReport(docs, bench)
    }),
    "lm_quality_buckets" -> ((s, dir) =>
      // CCNet-style head/middle/tail terciles of the unigram-LM score
      // within each language (histogram thresholds, integer compares)
      graft.operators.TextAnalysis.lmQualityBuckets(t(s, dir, "documents"))),
    "vocab_zipf" -> ((s, dir) =>
      // power-law health check: ln-freq vs ln-rank least squares,
      // histogram min-ranks (no vocab-wide window), DECIMAL moments
      graft.operators.TextAnalysis.zipfFit(t(s, dir, "documents"))),
    "corpus_mixture_plan" -> ((s, dir) =>
      // per-source token-budget allocation sheet under T=2 flattening
      graft.operators.Corpus.mixturePlan(t(s, dir, "documents"),
        budgetTokens = 100000L)),
    "corpus_prepare_spans" -> ((s, dir) => {
      // the compositor with the opt-in span-level boilerplate cut:
      // docs >= 95% made of 8-token spans that appear elsewhere in the
      // quality-filtered corpus are removed entirely (the ExactSubstr
      // reading at document granularity), alongside the standard
      // quality -> dedup -> decontaminate -> split -> shard chain
      val docs = t(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select(col("doc_id").as("bench_id"), col("text"))
      val out = graft.ops.Scratch.dir(
        s.conf.getOption("spark.graft.scratchDir"), "corpus_prepare_spans")
      graft.operators.Corpus.prepareTrainingSet(
          // fanOut BELOW the regex-heavy score projection: the byte-
          // small documents scan is one split, and an exchange above
          // the expression would still evaluate it on that one task
          graft.ops.Par.fanOut(docs).withColumn("quality",
            graft.functions.TextFunctions.qualityScore(col("text"), col("n_chars"))),
          bench, out,
          splits = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
          minJaccard = 0.20, nShards = 8,
          qualityFilter = Some("quality" -> 0.8),
          spanDedup = Some((8, 0.95)))
        .select(col("doc_id"), col("split").cast("string").as("split"))
    }),
    "corpus_prepare_fuzzy" -> ((s, dir) => {
      // the compositor with the opt-in FUZZY decontamination stage:
      // exact 8-gram flags UNION near-dup (shingle-Jaccard >= 0.5)
      // flags against the same raw benchmark — the paraphrased-leak
      // check completing the curation story
      val docs = t(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select(col("doc_id").as("bench_id"), col("text"))
      val out = graft.ops.Scratch.dir(
        s.conf.getOption("spark.graft.scratchDir"), "corpus_prepare_fuzzy")
      graft.operators.Corpus.prepareTrainingSet(
          // fanOut BELOW the regex-heavy score projection: the byte-
          // small documents scan is one split, and an exchange above
          // the expression would still evaluate it on that one task
          graft.ops.Par.fanOut(docs).withColumn("quality",
            graft.functions.TextFunctions.qualityScore(col("text"), col("n_chars"))),
          bench, out,
          splits = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
          minJaccard = 0.20, nShards = 8,
          qualityFilter = Some("quality" -> 0.8),
          fuzzyDecontaminate = Some(0.5))
        .select(col("doc_id"), col("split").cast("string").as("split"))
    }),
    "corpus_prepare_semantic" -> ((s, dir) => {
      // the compositor with the opt-in SemDeDup stage: alongside the
      // lexical near-dup clustering, docs whose EMBEDDING has a
      // smaller-id within-cell twin at >= 0.40 cosine are dropped —
      // the paraphrase-level duplicate no lexical stage can pair
      val docs = t(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select(col("doc_id").as("bench_id"), col("text"))
      val out = graft.ops.Scratch.dir(
        s.conf.getOption("spark.graft.scratchDir"), "corpus_prepare_semantic")
      graft.operators.Corpus.prepareTrainingSet(
          // fanOut BELOW the regex-heavy score projection: the byte-
          // small documents scan is one split, and an exchange above
          // the expression would still evaluate it on that one task
          graft.ops.Par.fanOut(docs).withColumn("quality",
            graft.functions.TextFunctions.qualityScore(col("text"), col("n_chars"))),
          bench, out,
          splits = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
          minJaccard = 0.20, nShards = 8,
          qualityFilter = Some("quality" -> 0.8),
          semanticDedup = Some(t(s, dir, "embeddings") -> 0.40))
        .select(col("doc_id"), col("split").cast("string").as("split"))
    }),
    "corpus_prepare_classifier" -> ((s, dir) => {
      // the compositor with the MODEL-BASED quality gate: the hashed
      // linear classifier's mean-weight score replaces the heuristic in
      // the top-80%-per-source histogram gate — the rest of the
      // composition (dedup -> decon -> split -> shard) is unchanged
      val docs = t(s, dir, "documents")
      val clf = graft.operators.TextAnalysis.hashedLinearScores(
          docs,
          graft.operators.TextAnalysis.syntheticHashedWeights(s, dims = 4096),
          dims = 4096)
        .select(col("doc_id"), col("score").as("clf_score"))
      val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select(col("doc_id").as("bench_id"), col("text"))
      val out = graft.ops.Scratch.dir(
        s.conf.getOption("spark.graft.scratchDir"), "corpus_prepare_classifier")
      graft.operators.Corpus.prepareTrainingSet(
          docs.join(clf, Seq("doc_id")), bench, out,
          splits = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
          minJaccard = 0.20, nShards = 8,
          qualityFilter = Some("clf_score" -> 0.8))
        .select(col("doc_id"), col("split").cast("string").as("split"))
    }),
    "corpus_prepare_mixed" -> ((s, dir) => {
      // the compositor with the optional mixture stage ON: quality gate
      // -> dedup -> decontaminate -> temperature-flattened source
      // balancing (T=2, post-decon counts) -> split -> shard, gated as
      // ONE seven-stage composition
      val docs = t(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select(col("doc_id").as("bench_id"), col("text"))
      val out = graft.ops.Scratch.dir(
        s.conf.getOption("spark.graft.scratchDir"), "corpus_prepare_mixed")
      graft.operators.Corpus.prepareTrainingSet(
          // fanOut BELOW the regex-heavy score projection: the byte-
          // small documents scan is one split, and an exchange above
          // the expression would still evaluate it on that one task
          graft.ops.Par.fanOut(docs).withColumn("quality",
            graft.functions.TextFunctions.qualityScore(col("text"), col("n_chars"))),
          bench, out,
          splits = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
          minJaccard = 0.20, nShards = 8,
          qualityFilter = Some("quality" -> 0.8),
          temperature = Some(2.0))
        .select(col("doc_id"), col("split").cast("string").as("split"))
    }),
    "tfidf_terms" -> ((s, dir) =>
      graft.operators.Corpus.tfidfTopTerms(t(s, dir, "documents"), k = 3)),
    "tfidf_terms_salted" -> ((s, dir) =>
      // the tf ⨝ df join through SkewAgg.saltedJoin (stopword = hot
      // term key): result provably identical — same oracle as
      // tfidf_terms, hash-compared independently
      graft.operators.Corpus.tfidfTopTerms(t(s, dir, "documents"), k = 3,
        dfSaltBuckets = 8)),

    // ==== extension operators: event analytics (window functions) ====
    "ev_sessionize" -> ((s, dir) => Events.sessionize(eventsTable(s, dir))),
    "ev_retention" -> ((s, dir) =>
      // weekly cohort retention triangle over the events fixture
      Events.cohortRetention(eventsTable(s, dir))),
    "ev_interval_join" -> ((s, dir) => {
      // bucketized range join: each event counted against every session
      // (any user) whose [start, end] contains it — no cross product
      val ev = eventsTable(s, dir)
      val sessions = Events.sessionize(ev)
        .select(col("session_start_ms").as("s_start"),
          col("session_end_ms").as("s_end"))
      val points = ev.select(col("event_id"), unix_millis(col("ts")).as("ts_ms"))
      graft.operators.RangeJoin.intervalJoin(points, sessions,
          pointCol = "ts_ms", startCol = "s_start", endCol = "s_end",
          chunkWidth = 30 * 60000L)
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_active_sessions"))
    }),
    "ev_window_agg" -> ((s, dir) =>
      graft.streaming.EventStreams.windowedCounts(eventsTable(s, dir))),
    "ev_session_stream_replay" -> ((s, dir) => {
      // the incremental-sessionize LOOP (persisted open-session
      // frontier, the third table-state streaming loop), gate-checked
      // by deterministic replay: three contiguous event-time slices run
      // through the exact foreachBatch body (frontier merge →
      // close-at-watermark → append), the final flush closes the rest,
      // and the closed log must equal the one-shot batch sessionize
      // the oracle re-derives — cross-slice sessions prove the
      // frontier carry. Slice cutoffs come from the observed [min,max]
      // span (one 1-row aggregate), so the split is fixture-scale-free.
      val ev = eventsTable(s, dir)
      val span = ev.agg(min(unix_millis(col("ts"))).as("lo"),
        max(unix_millis(col("ts"))).as("hi")).head
      val (lo, hi) = (span.getLong(0), span.getLong(1))
      val c1 = lo + (hi - lo) / 3
      val c2 = lo + 2 * ((hi - lo) / 3)
      val scratch = s.conf.getOption("spark.graft.scratchDir")
      graft.streaming.EventStreams.seedSessionTables(s,
        "graft_sess_open", "graft_sess_closed",
        graft.ops.Scratch.dir(scratch, "sess_open"),
        graft.ops.Scratch.dir(scratch, "sess_closed"))
      val ms = unix_millis(col("ts"))
      graft.streaming.EventStreams.replaySessionize(
        Seq(ev.filter(ms <= c1), ev.filter(ms > c1 && ms <= c2),
          ev.filter(ms > c2)),
        "graft_sess_open", "graft_sess_closed")
        .select(col("user_id"), col("session_start_ms"),
          col("session_end_ms"), col("n_events"),
          round(col("total_raw"), 4).as("total_value"))
    }),
    "ev_attribution_stream_replay" -> ((s, dir) => {
      // the two-sided-state loop (live-views table within the click
      // horizon), gate-checked by deterministic replay over the same
      // three event-time slices as the sessionize gate: matched pairs
      // emit in the click's batch, unconverted views emit one
      // null-click row at expiry/flush — the accumulated log must
      // equal the one-shot LEFT-OUTER attribution the oracle
      // re-derives (same oracle as ev_attribution_outer)
      val ev = eventsTable(s, dir)
      val span = ev.agg(min(unix_millis(col("ts"))).as("lo"),
        max(unix_millis(col("ts"))).as("hi")).head
      val (lo, hi) = (span.getLong(0), span.getLong(1))
      val c1 = lo + (hi - lo) / 3
      val c2 = lo + 2 * ((hi - lo) / 3)
      val scratch = s.conf.getOption("spark.graft.scratchDir")
      graft.streaming.EventStreams.seedAttributionTables(s,
        "graft_attrib_live", "graft_attrib_log",
        graft.ops.Scratch.dir(scratch, "attrib_live"),
        graft.ops.Scratch.dir(scratch, "attrib_log"))
      val ms = unix_millis(col("ts"))
      graft.streaming.EventStreams.replayAttribution(
        Seq(ev.filter(ms <= c1), ev.filter(ms > c1 && ms <= c2),
          ev.filter(ms > c2)),
        "graft_attrib_live", "graft_attrib_log", horizonMinutes = 60)
        .select(col("user_id"), col("view_id"), col("click_id"),
          col("view_ms"), col("click_ms"))
    }),
    "ev_window_pane_replay" -> ((s, dir) => {
      // the durable-pane rollup loop under an ARBITRARY split (pmod of
      // event_id — deliberately NOT time-ordered: the pane merge is a
      // commutative monoid, so unlike the sessionize replay above the
      // result is split-order-free, which is exactly what this gate
      // proves against the one-shot windowed-agg oracle)
      val ev = eventsTable(s, dir)
      graft.streaming.EventStreams.seedPaneTable(s, "graft_ev_panes",
        graft.ops.Scratch.dir(
          s.conf.getOption("spark.graft.scratchDir"), "ev_panes"))
      graft.streaming.EventStreams.replayWindowPanes(
        (0 to 2).map(i => ev.filter(pmod(col("event_id"), lit(3)) === i)),
        "graft_ev_panes")
    }),
    "ev_session_window" -> ((s, dir) => Events.sessionWindows(eventsTable(s, dir))),
    "ev_running_totals" -> ((s, dir) => Events.runningTotals(eventsTable(s, dir))),
    "ev_rank_funcs" -> ((s, dir) => {
      // window rank-function family: lag/lead/ntile/percent_rank/
      // cume_dist over a total per-user order (ts, event_id — no ties,
      // so every rank function is deterministic cross-engine)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      eventsTable(s, dir).select(
        col("event_id"), col("user_id"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
    }),
    "hof_funcs" -> ((s, dir) => {
      // higher-order-function family: aggregate / filter / exists /
      // zip_with lambdas, double-promoted BEFORE arithmetic exactly as
      // the oracle's list_transform does (float arithmetic would differ)
      val v = col("embedding")
      t(s, dir, "embeddings").select(
        col("vec_id"),
        round(aggregate(transform(v, _.cast("double")), lit(0.0d), (a, x) => a + x), 6)
          .as("sum_elems"),
        size(filter(v, x => x.cast("double") > 0.0d)).as("n_pos"),
        exists(v, x => x.cast("double") < -0.5d).as("has_small"),
        round(aggregate(zip_with(v, v, (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0d), (a, x) => a + x), 6).as("self_dot"))
    }),
    "ev_top_types" -> ((s, dir) => Events.topEventTypes(eventsTable(s, dir))),
    "ev_top_paths" -> ((s, dir) =>
      // journey mining: most common 3-step consecutive event-type
      // sequences (the discovery step before funnel() measures one)
      graft.operators.Events.topPaths(eventsTable(s, dir), n = 3, k = 20)),
    "ev_transitions" -> ((s, dir) =>
      // first-order Markov matrix: P(next event type | current), the
      // per-user step counts behind path analysis
      Events.transitionMatrix(eventsTable(s, dir))),

    "ev_asof_join" -> ((s, dir) => {
      // each event joined to the user's most recent prior error event
      val ev = eventsTable(s, dir).withColumn("ts_ms", unix_millis(col("ts")))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_ms").as("err_ms"))
      graft.operators.AsOfJoin.asOf(
        left = ev.select(col("event_id"), col("user_id"), col("ts_ms")),
        right = errors.withColumnRenamed("err_ms", "ts_ms")
          .withColumn("err_ms", col("ts_ms")),
        keyCol = "user_id", tsCol = "ts_ms", valueCol = "err_ms",
        leftCols = Seq("event_id"))
    }),
    "ev_asof_native" -> ((s, dir) => {
      // the SAME as-of semantics through the custom physical operator
      // (AsOfJoinPlan -> AsOfJoinStrategy -> AsOfJoinExec): one
      // O(n+m) sort-merge pass per co-partition instead of the
      // union+window composition
      val ev = eventsTable(s, dir).withColumn("ts_ms", unix_millis(col("ts")))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_ms"), col("ts_ms").as("err_ms"))
      graft.plans.NativeAsOf.asOf(
        ev.select(col("event_id"), col("user_id"), col("ts_ms")), errors,
        keyCol = "user_id", tsCol = "ts_ms", valueCol = "err_ms",
        leftCols = Seq("event_id"))
    }),
    "ev_asof_native_fwd" -> ((s, dir) => {
      // forward direction through the same custom operator: earliest
      // error at-or-after each event
      val ev = eventsTable(s, dir).withColumn("ts_ms", unix_millis(col("ts")))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_ms"), col("ts_ms").as("err_ms"))
      graft.plans.NativeAsOf.asOf(
        ev.select(col("event_id"), col("user_id"), col("ts_ms")), errors,
        keyCol = "user_id", tsCol = "ts_ms", valueCol = "err_ms",
        leftCols = Seq("event_id"), direction = "forward")
    }),
    "ev_asof_native_multi" -> ((s, dir) => {
      // MULTIPLE payload columns through the native operator in ONE
      // merge — timestamp, id and value of the matched error row, all
      // from the SAME row (the whole-payload contract). The right side
      // is pre-aggregated to unique (user, ts) with a deterministic
      // max-event-id representative: the merge keeps the last of a
      // (key, ts) tie, which is sort-nondeterministic for payloads.
      val ev = eventsTable(s, dir).withColumn("ts_ms", unix_millis(col("ts")))
      val errors = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id"), col("ts_ms"))
        .agg(max(col("event_id")).as("err_event_id"),
          max_by(col("value"), col("event_id")).as("err_value"))
        .withColumn("err_ms", col("ts_ms"))
      graft.plans.NativeAsOf.asOfMulti(
        ev.select(col("event_id"), col("user_id"), col("ts_ms")), errors,
        keyCol = "user_id", tsCol = "ts_ms",
        valueCols = Seq("err_ms", "err_event_id", "err_value"),
        leftCols = Seq("event_id"))
    }),
    "ev_asof_nearest" -> ((s, dir) => {
      // each event joined to the user's CLOSEST error event either
      // direction (ties -> the earlier one)
      val ev = eventsTable(s, dir).withColumn("ts_ms", unix_millis(col("ts")))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_ms"))
        .withColumn("err_ms", col("ts_ms"))
      graft.operators.AsOfJoin.asOf(
        left = ev.select(col("event_id"), col("user_id"), col("ts_ms")),
        right = errors,
        keyCol = "user_id", tsCol = "ts_ms", valueCol = "err_ms",
        leftCols = Seq("event_id"), direction = "nearest")
    }),
    "agg_distinct" -> ((s, dir) =>
      eventsTable(s, dir).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))),
    "pct_agg" -> ((s, dir) =>
      eventsTable(s, dir).groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"))),

    // ==== extension operators: multimodal binary plumbing ====
    "mm_decode_meta" -> ((s, dir) =>
      Multimodal.decodeMeta(s, Multimodal.synthesizeMedia(t(s, dir, "documents"))).toDF()),
    "mm_sample_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(s, Multimodal.synthesizeMedia(t(s, dir, "documents"))).toDF()),
    "mm_features" -> ((s, dir) => {
      // features[d] = bucket byte-sum / (max(bytes/8,1)*255) as Float32.
      // The query reconstructs the exact integer bucket sums — Float32
      // division keeps ≥24 significant bits, so round(v*n*255) is exact —
      // giving hashable scalar output and an integer-exact DuckDB oracle
      // (no cross-engine float-formatting hazards).
      val feats = Multimodal.extractFeatures(s, Multimodal.synthesizeMedia(t(s, dir, "documents")))
      val lens = t(s, dir, "documents")
        .select(col("doc_id"), greatest(expr("octet_length(text) div 8"), lit(1L)).as("nb"))
      feats.join(lens, Seq("doc_id"))
        .select(col("doc_id"), col("nb"), posexplode(col("features")))
        .select(col("doc_id"), col("pos"),
          round(col("col").cast("double") * col("nb") * 255).cast("long").as("bucket_sum"))
    }),
    "mm_resize" -> ((s, dir) => // oracle checks geometry + content checksum
      Multimodal.resize(s, Multimodal.synthesizeMedia(t(s, dir, "documents")), 32, 32)
        .toDF().select(col("doc_id"), col("width"), col("height"),
          length(col("media")).as("n_bytes"),
          md5(col("media")).as("checksum"))),

    // ==== widened relational surface (classic OLAP over the star schema) ====
    "q1_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") < 45)
      val qty = col("l_quantity").cast("decimal(18,2)")
      val price = col("l_extendedprice").cast("decimal(18,2)")
      val disc = col("l_discount").cast("decimal(18,2)")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(qty).cast("double").as("sum_qty"),
          sum(price).cast("double").as("sum_base"),
          sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
          (sum(qty).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),
    "q3_topk_join" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val rev = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)")))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }),
    "q6_forecast_revenue" -> ((s, dir) =>
      // TPC-H Q6 shape: pure scan-pushdown aggregate — every predicate
      // reaches the parquet reader, decimal-exact revenue product
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(18,2)"))).cast("double")
          .as("revenue"))),
    "q12_priority_mix" -> ((s, dir) => {
      // TPC-H Q12 shape: conditional CASE counts per group — how many
      // critical- vs normal-priority orders each line status carries
      val li = t(s, dir, "lineitem").filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      val o = t(s, dir, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
    }),
    "q4_order_priority" -> ((s, dir) => {
      // TPC-H Q4 shape: EXISTS → LEFT SEMI join of the order quarter
      // against late-shipping lineitems; the priority rollup counts
      // each order once no matter how many lineitems were late
      val o = t(s, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      o.join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),
    "q10_returned_items" -> ((s, dir) => {
      // TPC-H Q10 shape: revenue lost to returns per customer for a
      // quarter — fact joins keyed, the nation dim broadcast, top 20
      // under a deterministic (revenue, custkey) order
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = t(s, dir, "nation")
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"),
          col("c_acctbal"), col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),
    "q5_local_supplier" -> ((s, dir) => {
      // TPC-H Q5 shape: the 6-way snowflake join. Dimension chain
      // region -> nation is broadcast (tiny); customer/supplier ride
      // keyed joins; the fact-side date filter pushes to the scan
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val o = t(s, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"))
    }),
    "q7_nation_volume" -> ((s, dir) => {
      // TPC-H Q7 shape: shipping volume between DISTINCT nation pairs
      // by ship year — the fact joins both role-played nation dims
      // (each broadcast), decimal-exact revenue
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n.select(col("n_nationkey").as("snk"),
          col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
        .join(broadcast(n.select(col("n_nationkey").as("cnk"),
          col("n_name").as("cust_nation"))), col("c_nationkey") === col("cnk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(rev).cast("double").as("revenue"))
    }),
    "q18_large_orders" -> ((s, dir) => {
      // TPC-H Q18 shape: a HAVING-filtered aggregate drives a semi-join
      // back into the fact table - the aggregate runs ONCE, its
      // survivors (few) then key two joins
      val li = t(s, dir, "lineitem")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("total_qty"))
        .filter(col("total_qty") > 200)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("total_qty").cast("double").as("total_qty"))
    }),
    "q15_top_supplier" -> ((s, dir) => {
      // TPC-H Q15 shape: a scalar subquery over an aggregated CTE — the
      // max-revenue supplier(s). Catalyst executes the subquery ONCE
      // (SubqueryExec, one-row broadcast into the filter), never
      // per-row; revenue arithmetic is DECIMAL-exact on both engines so
      // the equality against the max is bit-safe
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q15_v")
      t(s, dir, "supplier").createOrReplaceTempView("supplier_q15_v")
      s.sql("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
          FROM lineitem_q15_v
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM supplier_q15_v JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT max(total_rev) FROM revenue)""")
    }),
    "q17_small_qty_revenue" -> ((s, dir) => {
      // TPC-H Q17 shape: CORRELATED scalar subquery — revenue from
      // orders below half the part's average quantity. Catalyst
      // decorrelates (RewriteCorrelatedScalarSubquery) into one
      // per-part aggregate + equi-join — no per-row subquery execution;
      // quantities are integral doubles so the avg threshold is
      // IEEE-identical across engines
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q17_v")
      t(s, dir, "part").createOrReplaceTempView("part_q17_v")
      s.sql("""
        SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                               AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly
        FROM lineitem_q17_v JOIN part_q17_v ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#4' AND p_type = 'PROMO'
          AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                            FROM lineitem_q17_v l2
                            WHERE l2.l_partkey = p_partkey)""")
    }),
    "q20_promo_suppliers" -> ((s, dir) => {
      // TPC-H Q20 shape: nested IN subqueries with a CORRELATED scalar
      // inside — suppliers whose shipped volume of a promo part
      // dominates that part's total. The per-(supplier, part) rollup
      // plays partsupp; Catalyst decorrelates the threshold into a
      // per-part aggregate joined on l_partkey and turns both INs into
      // semi-joins
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q20_v")
      t(s, dir, "part").createOrReplaceTempView("part_q20_v")
      t(s, dir, "supplier").createOrReplaceTempView("supplier_q20_v")
      s.sql("""
        SELECT s_suppkey, s_name
        FROM supplier_q20_v
        WHERE s_suppkey IN (
          SELECT sp.l_suppkey FROM
            (SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
             FROM lineitem_q20_v GROUP BY 1, 2) sp
          WHERE sp.l_partkey IN (SELECT p_partkey FROM part_q20_v
                                 WHERE p_name LIKE 'red%')
            AND sp.qty > (SELECT 0.15 * sum(l2.l_quantity)
                          FROM lineitem_q20_v l2
                          WHERE l2.l_partkey = sp.l_partkey))""")
    }),
    "q21_waiting_suppliers" -> ((s, dir) => {
      // TPC-H Q21 shape: EXISTS + NOT EXISTS with a non-equality
      // correlated predicate (l_suppkey <>) — the sole-blame audit:
      // suppliers whose line was the ONLY late one in a multi-supplier
      // finished order. Catalyst plans both subqueries as semi/anti
      // joins on the equality key with the <> as join condition — no
      // per-row subquery
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q21_v")
      t(s, dir, "orders").createOrReplaceTempView("orders_q21_v")
      t(s, dir, "supplier").createOrReplaceTempView("supplier_q21_v")
      s.sql("""
        SELECT s_name, count(*) AS numwait
        FROM supplier_q21_v, lineitem_q21_v l1, orders_q21_v
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT * FROM lineitem_q21_v l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT * FROM lineitem_q21_v l3
                            JOIN orders_q21_v o3
                              ON l3.l_orderkey = o3.o_orderkey
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o3.o_orderdate
                                                + INTERVAL 60 DAY)
        GROUP BY s_name""")
    }),
    "q22_dormant_accounts" -> ((s, dir) => {
      // TPC-H Q22 shape: two uncorrelated scalar subqueries + a
      // correlated NOT EXISTS (anti-join) — above-average-balance
      // customers with no large order. The above-average compare is
      // cross-multiplied over exact integer CENTS (balance·n > Σcents),
      // the repo's integer-comparison discipline, so the boundary is
      // bit-identical across engines; nationkey buckets play Q22's
      // phone country code
      t(s, dir, "customer").createOrReplaceTempView("customer_q22_v")
      t(s, dir, "orders").createOrReplaceTempView("orders_q22_v")
      s.sql("""
        WITH cb AS (SELECT c_custkey, c_nationkey,
                           CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
                    FROM customer_q22_v),
             pos AS (SELECT count(*) AS n, sum(cents) AS s
                     FROM cb WHERE cents > 0)
        SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode,
               count(*) AS numcust,
               round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS totacctbal
        FROM cb
        WHERE cents * (SELECT n FROM pos) > (SELECT s FROM pos)
          AND NOT EXISTS (SELECT * FROM orders_q22_v
                          WHERE o_custkey = c_custkey
                            AND o_totalprice > 400000)
        GROUP BY c_nationkey % 5""")
    }),
    "q8_market_share" -> ((s, dir) => {
      // TPC-H Q8 shape: national market share — one nation's slice of a
      // region's PROMO-part revenue by order year. The conditional
      // numerator rides the SAME aggregate as the denominator (one
      // pass); region→nation chains broadcast; the share is a single
      // IEEE division of two exact DECIMAL sums, rounded to 6 dp
      val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "EUROPE")
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n.select(col("n_nationkey").as("cnk"),
          col("n_regionkey"))), col("c_nationkey") === col("cnk"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n.select(col("n_nationkey").as("snk"),
          col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_7", rev)
            .otherwise(lit(0).cast("decimal(18,2)"))).as("nat_rev"),
          sum(rev).as("all_rev"))
        .select(col("o_year"),
          round(col("nat_rev").cast("double") / col("all_rev").cast("double"),
            6).as("mkt_share"))
    }),
    "q9_product_profit" -> ((s, dir) => {
      // TPC-H Q9 shape: product-type profit by (supplier nation, year).
      // No partsupp table in this corpus, so supply cost is the
      // deterministic stand-in retailprice·0.5 — a MULTIPLY, not a
      // divide: decimal division rounds under engine-specific result
      // scales, while ·DECIMAL(2,1) 0.5 is exact on both engines;
      // amount = rev − cost·qty stays DECIMAL end to end. The p_name
      // LIKE plays Q9's '%green%' filter
      val p = t(s, dir, "part").filter(col("p_name").like("%widget%"))
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val amount = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)")) -
        col("p_retailprice").cast("decimal(18,2)") *
          lit(0.5).cast("decimal(2,1)") *
          col("l_quantity").cast("decimal(18,2)")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sum(amount).cast("double").as("sum_profit"))
    }),
    "q11_important_stock" -> ((s, dir) => {
      // TPC-H Q11 shape: HAVING against uncorrelated scalar subqueries
      // — parts whose stocked value exceeds 1.4× the mean national
      // value (mean-relative so the cut survives any SF, unlike Q11's
      // fixed fraction whose bar rises with the part count). The
      // per-(part,supplier) qty rollup plays partsupp (the q20
      // convention), retailprice plays supplycost. The compare is
      // cross-multiplied in DECIMAL (value·10n > 14·total — integers ×
      // exact decimals) so the boundary is exact on both engines;
      // Catalyst runs each total ONCE (SubqueryExec, one-row reuse)
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q11_v")
      t(s, dir, "part").createOrReplaceTempView("part_q11_v")
      t(s, dir, "supplier").createOrReplaceTempView("supplier_q11_v")
      s.sql("""
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS availqty
          FROM lineitem_q11_v GROUP BY 1, 2),
        v AS (
          SELECT l_partkey AS ps_partkey,
                 sum(CAST(p_retailprice AS DECIMAL(18,2)) * availqty) AS value
          FROM ps JOIN part_q11_v ON p_partkey = l_partkey
                  JOIN supplier_q11_v ON s_suppkey = l_suppkey
          WHERE s_nationkey % 5 = 2
          GROUP BY 1)
        SELECT ps_partkey, CAST(value AS DOUBLE) AS value
        FROM v
        WHERE value * (SELECT count(*) * 10 FROM v) >
              (SELECT sum(value) * 14 FROM v)""")
    }),
    "q13_customer_distribution" -> ((s, dir) => {
      // TPC-H Q13 shape: the double aggregate — orders-per-customer via
      // a LEFT OUTER join (zero-order customers must appear), then the
      // distribution of those counts. The priority filter plays Q13's
      // o_comment NOT LIKE; count(o_orderkey) counts only matched rows
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(!col("o_orderpriority").like("4-%"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),
    "q14_promo_revenue" -> ((s, dir) => {
      // TPC-H Q14 shape: conditional revenue share for one month —
      // promo-part revenue over all revenue, 100·(one IEEE division of
      // two exact DECIMAL sums), 6 dp. Part dim broadcast; the date
      // filter pushes to the lineitem scan
      val li = t(s, dir, "lineitem").filter(
        col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      val p = t(s, dir, "part")
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(18,2)"))).as("promo"),
          sum(rev).as("all_rev"))
        .select(round(lit(100.0) * col("promo").cast("double") /
          col("all_rev").cast("double"), 6).as("promo_revenue"))
    }),
    "q16_parts_supplier" -> ((s, dir) => {
      // TPC-H Q16 shape: supplier count per part profile with a NOT IN
      // exclusion — distinct (part,supplier) pairs from lineitem play
      // partsupp; negative-balance suppliers play the complaints
      // filter. Catalyst turns the NOT IN into a null-aware anti join
      // and the count(DISTINCT) expands in the aggregate
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q16_v")
      t(s, dir, "part").createOrReplaceTempView("part_q16_v")
      t(s, dir, "supplier").createOrReplaceTempView("supplier_q16_v")
      s.sql("""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem_q16_v) ps
          JOIN part_q16_v ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5'
          AND p_type NOT IN ('STANDARD', 'ECONOMY')
          AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier_q16_v
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size""")
    }),
    "q19_discounted_revenue" -> ((s, dir) => {
      // TPC-H Q19 shape: OR'd multi-bracket predicate over the
      // part⋈lineitem join — Catalyst extracts the common p_partkey =
      // l_partkey equi-key and keeps the three (brand, size, quantity)
      // brackets as the join residual; p_size plays the container list
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))
      val bracket =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 40))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey") && bracket)
        .agg(sum(rev).cast("double").as("revenue"))
    }),
    "semi_join" -> ((s, dir) =>
      t(s, dir, "customer").join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))),
    "anti_join" -> ((s, dir) =>
      t(s, dir, "customer").join(
          t(s, dir, "orders").filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))),
    "distinct_op" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_mktsegment"), col("c_nationkey")).distinct()),
    "lateral_topn" -> ((s, dir) => {
      // correlated LATERAL subquery: per-nation top-2 customers by
      // balance — the planner's lateral-join path (vs the window-rank
      // formulation ev_rank_funcs exercises)
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      t(s, dir, "nation").createOrReplaceTempView("nation_v")
      s.sql("""SELECT n.n_name, c.c_custkey, c.c_acctbal
               FROM nation_v n
               JOIN LATERAL (SELECT c_custkey, c_acctbal FROM customer_v c
                             WHERE c.c_nationkey = n.n_nationkey
                             ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c""")
    }),
    "grouping_sets_agg" -> ((s, dir) => {
      // explicit GROUPING SETS (vs the rollup/cube hierarchies already
      // covered): two disjoint single-column groupings plus the grand
      // total in ONE Expand pass, grouping ids disambiguate the nulls
      t(s, dir, "orders").createOrReplaceTempView("orders_gs_v")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
                      count(*) AS n, CAST(grouping(o_orderstatus) AS INT) AS g_status,
                      CAST(grouping(o_orderpriority) AS INT) AS g_prio
               FROM orders_gs_v
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
    }),
    "window_funcs" -> ((s, dir) => {
      // ranking/navigation window family over BOUNDED per-key partitions
      // (a customer's orders, ≤ ~40 rows — the safe window shape; the
      // unbounded-per-key cases elsewhere use groupBy+join instead):
      // lag/lead, rank vs dense_rank, ntile, percent_rank, cume_dist,
      // all over one deterministic (date, key) order → ONE Window node
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
    }),
    "null_funcs" -> ((s, dir) =>
      // null-safety family: try_divide (NULL on /0), nullif, nvl/nvl2,
      // null-aware equality
      t(s, dir, "orders").select(
        col("o_orderkey"),
        try_divide(col("o_totalprice"), col("o_custkey") % 100).as("safe_div"),
        nullif(col("o_orderpriority"), lit("1-URGENT")).as("non_urgent"),
        nvl2(nullif(col("o_orderstatus"), lit("O")), lit("closedish"), lit("open")).as("status_flag"),
        (col("o_custkey") <=> lit(7L)).as("is_cust7"))),
    "date_spine" -> ((s, dir) => {
      // zero-filled calendar: generate the full month spine between min
      // and max order date, left-join monthly counts — months with no
      // orders surface as 0, not as missing rows (the reporting gap-fill)
      val o = t(s, dir, "orders").withColumn("month", trunc(col("o_orderdate"), "month"))
      val spine = o.agg(min(col("month")).as("m0"), max(col("month")).as("m1"))
        .select(explode(sequence(col("m0"), col("m1"),
          expr("interval 1 month"))).as("month"))
      spine.join(
        o.groupBy(col("month")).agg(count(lit(1)).as("n_orders")),
        Seq("month"), "left")
        .select(date_format(col("month"), "yyyy-MM").as("month"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    }),
    "unpivot_op" -> ((s, dir) =>
      // wide → long melt (Dataset.unpivot): per-part metric rows
      t(s, dir, "part").unpivot(
        Array(col("p_partkey")),
        Array(col("p_retailprice").cast("double").as("p_retailprice"),
          col("p_size").cast("double").as("p_size")),
        "metric", "value")),
    "bitwise_funcs" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("k_and"),
        col("o_orderkey").bitwiseOR(lit(4096L)).as("k_or"),
        col("o_orderkey").bitwiseXOR(col("o_custkey")).as("k_xor"),
        shiftleft(col("o_orderkey"), 2).as("k_shl"),
        shiftright(col("o_orderkey"), 3).as("k_shr"),
        bit_count(col("o_orderkey")).cast("int").as("k_bits"))),
    "ev_funnel" -> ((s, dir) =>
      graft.operators.Events.funnel(eventsTable(s, dir),
        Seq("view", "click", "purchase"))),
    "ev_funnel_windowed" -> ((s, dir) =>
      // conversion-window funnel: each step must land within 24 h of
      // the user's previous step — the "converted within a day" read
      graft.operators.Events.funnel(eventsTable(s, dir),
        Seq("view", "click", "purchase"),
        windowSeconds = Some(86400L))),
    "ev_resample" -> ((s, dir) =>
      // irregular events -> hourly grid with last-value carry-forward
      graft.operators.Events.resampleLastValue(eventsTable(s, dir), stepSeconds = 3600L)),
    "ev_range_window" -> ((s, dir) => {
      // RANGE frame (value-based, not row-based): per user, the sum of
      // event values in the trailing 10-minute window — peers at the
      // same timestamp are always in-frame together, so the result is
      // deterministic under any tie order
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(unix_timestamp(col("ts")))
        .rangeBetween(-600L, 0L)
      eventsTable(s, dir).select(
        col("event_id"), col("user_id"),
        sum(col("value").cast("decimal(18,4)")).over(w).cast("double").as("trailing_10m"))
    }),
    "rollup_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))),
    // ---- scalar function families over the same tables ----
    "json_extract" -> ((s, dir) =>
      eventsTable(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_num"))),
    "string_funcs" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 6).as("name6"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        length(col("p_name")).as("name_len"))),
    "array_funcs" -> ((s, dir) => {
      // array function family (§2.8 widening) — scalar projections of
      // sort/element_at/position/distinct so the hash-compare sees plain
      // values, not engine-specific array renderings
      val tks = graft.functions.TextFunctions.tokens(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"), tks.as("tks"), array_sort(tks).as("srt"))
        .select(
          col("doc_id"),
          size(col("tks")).as("n_tokens"),
          element_at(col("srt"), 1).as("first_tok"),
          element_at(col("srt"), -1).as("last_tok"),
          array_position(col("srt"), "the").as("pos_the"),
          size(array_distinct(col("tks"))).as("n_distinct"))
    }),
    "math_funcs" -> ((s, dir) =>
      // math function family (§2.8 widening): 6-dp rounds on the
      // transcendentals (ln/exp — both engines' libm agree well inside
      // 6 dp, proven by the tfidf/cosine oracles that already rely on
      // ln/sqrt); floor/ceil are LONG in Spark, mirrored with ::BIGINT
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_discount") - 0.05), 6).as("abs_disc"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(exp(col("l_discount")), 6).as("exp_disc"),
        signum(col("l_quantity") - 25.0).cast("int").as("qty_sign"),
        pmod(col("l_partkey"), lit(7L)).as("key_mod"))),
    "regex_funcs" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
        col("p_name").rlike("red|blue").as("has_color"))),
    "map_funcs" -> ((s, dir) =>
      // map function family: per-order linenumber→quantity map built with
      // map_from_entries, probed with element_at / map_keys; the oracle
      // re-derives the same VALUES relationally (maps don't hash-compare
      // across engines, their probed scalars do). Keys pre-aggregate to
      // min(qty) per (order, lineno) — the synthetic lineitem carries
      // duplicate line numbers, and map keys must be unique (min is
      // summation-order-insensitive, so both engines agree exactly)
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(min(col("l_quantity")).as("qty"))
        .groupBy(col("l_orderkey"))
        .agg(map_from_entries(array_sort(collect_list(
          struct(col("l_linenumber").as("k"), col("qty").as("v")))))
          .as("m"))
        .select(
          col("l_orderkey"),
          size(col("m")).as("n_lines"),
          element_at(col("m"), 1).as("qty_line1"),
          array_max(map_keys(col("m"))).as("max_lineno"))),
    "date_funcs" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))),
    "pivot_agg" -> ((s, dir) =>
      eventsTable(s, dir).groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "error"))
        .agg(count(lit(1)))
        .select(col("user_id"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("view"), lit(0L)).as("n_view"),
          coalesce(col("error"), lit(0L)).as("n_error"))),
    "posexplode_op" -> ((s, dir) =>
      t(s, dir, "embeddings").filter(col("vec_id") < 3)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos"),
          round(col("col").cast("double"), 6).as("val"))),
    "cube_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))),
    "month_trend" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(unix_millis(date_trunc("month", col("o_orderdate"))).as("month_ms"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))),
    "except_op" -> ((s, dir) =>
      // nations with customers but no well-capitalized supplier
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
        .except(t(s, dir, "supplier").filter(col("s_acctbal") > 7000)
          .select(col("s_nationkey").as("nationkey")))),
    "intersect_op" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))),
    "full_outer_join" -> ((s, dir) => {
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val su = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    }),
    "sketch_approx" -> ((s, dir) => {
      // Sketch ESTIMATES are engine-specific (HLL++ / KLL) and can't be
      // hash-compared across engines — but their error CONTRACTS can: the
      // oracle emits `TRUE` for each bound, Spark emits whether its sketch
      // actually landed inside it, alongside exact anchors both engines
      // compute identically. approx_count_distinct's default rsd is 0.05,
      // checked at 3σ (15%); percentile_approx at accuracy 1000 has ≤0.1%
      // rank error, checked against the exact 45–55% quantile band.
      eventsTable(s, dir).groupBy(col("event_type"))
        .agg(
          count_distinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id")).as("au"),
          percentile_approx(col("value"), lit(0.5), lit(1000)).as("ap50"),
          expr("percentile(value, 0.45)").as("lo"),
          expr("percentile(value, 0.55)").as("hi"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("au") - col("exact_users")) <=
            col("exact_users").cast("double") * 0.15).as("approx_users_ok"),
          col("ap50").between(col("lo"), col("hi")).as("approx_p50_ok"))
    }),
    "stateful_running_agg" -> ((s, dir) => {
      // mapGroupsWithState custom state (batch execution of the same code
      // path the streaming query uses)
      import s.implicits._
      graft.streaming.EventStreams.runningUserAgg(
        eventsTable(s, dir).select(col("user_id"), col("value"))
          .as[graft.streaming.EventStreams.UserEvent])
        .toDF().withColumn("total", round(col("total"), 4))
    }),
    "topk_sort" -> ((s, dir) =>
      t(s, dir, "part")
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .limit(10)),
    // ---- graph analytics over a co-purchase graph (operators.Graph) ----
    // The fixture graph: parts co-appearing in an order become an edge,
    // restricted to partkey % 4 == 0 so node count and degree stay
    // proportional across scale factors (the operators themselves are
    // generic over any edge frame).
    "graph_degree" -> ((s, dir) =>
      graft.operators.Graph.degreeHistogram(coPurchaseEdges(s, dir))),
    "graph_pagerank" -> ((s, dir) =>
      graft.operators.Graph.pageRank(coPurchaseEdges(s, dir), iters = 3, damping = 0.85)
        .orderBy(round(col("rank"), 6).desc, col("node"))
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .limit(20)),
    "graph_pagerank_directed" -> ((s, dir) =>
      // directed form over the canonical (src < dst) co-purchase edges:
      // high-id parts never appear as src, so the dangling-mass term is
      // genuinely exercised by the fixture
      graft.operators.Graph.pageRankDirected(coPurchaseEdges(s, dir), iters = 3, damping = 0.85)
        .orderBy(round(col("rank"), 6).desc, col("node"))
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .limit(20)),
    "graph_pagerank_weighted" -> ((s, dir) =>
      // weighted directed form: edge weight = number of shared orders,
      // surfer follows weights proportionally (strength-normalized)
      graft.operators.Graph.pageRankDirected(
          graft.operators.Graph.coOccurrenceWeightedEdges(
            t(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0),
            "l_orderkey", "l_partkey"),
          iters = 3, damping = 0.85, weightCol = Some("weight"))
        .orderBy(round(col("rank"), 6).desc, col("node"))
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .limit(20)),
    "graph_pagerank_personalized" -> ((s, dir) => {
      // random-walk-with-restart relevance to a deterministic seed set
      // (every 25th part id): teleport mass goes only to the seeds,
      // unreachable nodes keep rank 0
      val e = coPurchaseEdges(s, dir)
      val seeds = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .filter(pmod(col("node"), lit(25)) === 0).distinct()
      graft.operators.Graph.pageRankPersonalized(e, seeds, iters = 3, damping = 0.85)
        .orderBy(round(col("rank"), 6).desc, col("node"))
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .limit(20)
    }),
    "graph_triangles" -> ((s, dir) =>
      graft.operators.Graph.triangleCount(coPurchaseEdges(s, dir))),
    "graph_clustering_coeff" -> ((s, dir) =>
      // GDS LocalClusteringCoefficient: per-node triangle count over
      // the guarded wedge join, lcc = 2T/(d(d-1)); top-50 keeps the
      // result frame bounded while still ranking the clique-est nodes
      graft.operators.Graph.localClusteringCoefficient(coPurchaseEdges(s, dir))
        .orderBy(col("lcc").desc, col("node"))
        .limit(50)),
    "graph_common_neighbors" -> ((s, dir) =>
      graft.operators.Graph.commonNeighborsTopK(coPurchaseEdges(s, dir), k = 10)),
    "graph_adamic_adar" -> ((s, dir) =>
      // GDS Adamic-Adar link prediction: shared neighbors weighted
      // 1/ln(deg) — DECIMAL-exact term sums, same wedge guard
      graft.operators.Graph.adamicAdarTopK(coPurchaseEdges(s, dir), k = 10)),
    "graph_harmonic" -> ((s, dir) => {
      // hop-bounded harmonic centrality over a deterministic landmark
      // sample (every 50th part id): exact per scored node; all-sources
      // on this dense graph is inherently Θ(V·V) frontier rows
      val e = coPurchaseEdges(s, dir)
      val landmarks = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .filter(pmod(col("node"), lit(50)) === 0).distinct()
      graft.operators.Graph.harmonicCentrality(e, maxHops = 3,
        sources = Some(landmarks))
    }),
    "graph_fastrp" -> ((s, dir) =>
      // GDS FastRP embeddings in the deterministic md5-projection form:
      // 8 dims, 2 neighbor-averaging rounds, equal iteration weights
      graft.operators.Graph.fastRP(coPurchaseEdges(s, dir),
        dims = 8, iterations = 2, iterationWeights = Seq(1.0, 1.0))),
    "graph_closeness" -> ((s, dir) => {
      // hop-bounded closeness over the same landmark sample: reached /
      // Σdist on the 3-hop ball — the inverse-farness companion to
      // graph_harmonic (exact per scored node, coverage-for-cost)
      val e = coPurchaseEdges(s, dir)
      val landmarks = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .filter(pmod(col("node"), lit(50)) === 0).distinct()
      graft.operators.Graph.closenessCentrality(e, maxHops = 3,
        sources = Some(landmarks))
    }),
    "graph_betweenness" -> ((s, dir) => {
      // Brandes dependency accumulation from the landmark sample
      // (Brandes–Pich pivot estimation — the published scale practice):
      // σ forward levels + δ backward levels over scratch tables.
      // Pivot set mod 400 (sparser than the harmonic/closeness dial —
      // ~|V|/100 pivots): betweenness runs ~7 σ/δ rounds over the
      // |S|·ball pair space, so the pivot count is the cost dial
      // Brandes–Pich says to keep small and near-CONSTANT as the graph
      // grows
      val e = coPurchaseEdges(s, dir)
      val landmarks = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .filter(pmod(col("node"), lit(400)) === 0).distinct()
      graft.operators.Graph.betweennessCentrality(e, maxHops = 3,
        sources = Some(landmarks))
        .orderBy(col("betweenness").desc, col("node"))
        .limit(50)
    }),
    "graph_random_walks" -> ((s, dir) =>
      // deterministic uniform walks (md5 coin per step) — the GDS
      // RandomWalk/node2vec sampling surface
      graft.operators.Graph.randomWalks(coPurchaseEdges(s, dir), steps = 3)),
    "graph_node2vec_walks" -> ((s, dir) =>
      // second-order p/q-biased walks (return 1 : triangle 4 : far 16
      // ⇒ p=4, q=1/4 — DFS-leaning), exact integer inverse-CDF choice
      graft.operators.Graph.node2vecWalks(coPurchaseEdges(s, dir),
        steps = 3)),
    "graph_weighted_walks" -> ((s, dir) =>
      // GDS relationship-weight walk sampling: next hop ∝ shared-order
      // count, same exact integer inverse-CDF choice
      graft.operators.Graph.weightedRandomWalks(
        graft.operators.Graph.coOccurrenceWeightedEdges(
          t(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0),
          "l_orderkey", "l_partkey"),
        steps = 3)),
    "graph_node_similarity" -> ((s, dir) =>
      // GDS-style node similarity: neighbor-set Jaccard from wedge
      // counts + degrees, no set arrays shipped
      graft.operators.Graph.nodeSimilarityTopK(coPurchaseEdges(s, dir), k = 10)),
    "graph_node_overlap" -> ((s, dir) =>
      // GDS overlap coefficient: common / min(deg) — flags sub/superset
      // neighborhoods that Jaccard dilutes
      graft.operators.Graph.nodeSimilarityTopK(coPurchaseEdges(s, dir), k = 10,
        metric = "overlap")),
    "graph_node_cosine" -> ((s, dir) =>
      // GDS cosine metric: common / sqrt(deg·deg); sqrt is IEEE-exact
      graft.operators.Graph.nodeSimilarityTopK(coPurchaseEdges(s, dir), k = 10,
        metric = "cosine")),
    "graph_components" -> ((s, dir) =>
      graft.operators.Graph.connectedComponents(coPurchaseEdges(s, dir))),
    "graph_influence_max" -> ((s, dir) =>
      // greedy IC-model seed selection over md5-coin live-edge samples
      // (the GDS CELF surface); spread = touched component mass
      graft.operators.Graph.influenceMaximization(coPurchaseEdges(s, dir),
        k = 3, p = 0.15, samples = 3)),
    "graph_scc" -> ((s, dir) => {
      // directed rendition of the co-purchase graph: the canonical
      // (src < dst) edges directed by id-sum PARITY — even sums point
      // low->high, odd high->low. Deterministic on both engines, and it
      // manufactures real cycles out of the dense undirected fixture
      // (uniformly low->high would be a DAG of singleton SCCs)
      val e0 = coPurchaseEdges(s, dir)
      val even = (col("src") + col("dst")) % 2 === 0
      graft.operators.Graph.stronglyConnectedComponents(
        e0.select(
          when(even, col("src")).otherwise(col("dst")).as("s"),
          when(even, col("dst")).otherwise(col("src")).as("d")),
        "s", "d")
    }),
    "graph_label_propagation" -> ((s, dir) =>
      // synchronous min-tie-break LPA communities (deterministic,
      // oracle = unrolled rounds)
      graft.operators.Graph.labelPropagation(coPurchaseEdges(s, dir), rounds = 3)),
    "graph_lpa_weighted" -> ((s, dir) =>
      // weighted votes (GDS relationship-weight semantic): label votes
      // are summed shared-order counts, not neighbor counts
      graft.operators.Graph.labelPropagation(
        graft.operators.Graph.coOccurrenceWeightedEdges(
          t(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0),
          "l_orderkey", "l_partkey"),
        rounds = 3, weightCol = Some("weight"))),
    "graph_louvain" -> ((s, dir) =>
      // modularity-optimizing community detection over the weighted
      // co-purchase graph: Gauss-Seidel half-sweep local moves with
      // exact integer gain arithmetic, rounds accepted only while the
      // integer modularity score strictly increases
      graft.operators.Graph.louvain(
        graft.operators.Graph.coOccurrenceWeightedEdges(
          t(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0),
          "l_orderkey", "l_partkey"),
        maxRounds = 2, weightCol = Some("weight"))),
    "graph_louvain2" -> ((s, dir) =>
      // MULTI-LEVEL Louvain: phase → contract communities into
      // super-nodes (intra mass as self-loops) → phase again → map back
      graft.operators.Graph.louvain(
        graft.operators.Graph.coOccurrenceWeightedEdges(
          t(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0),
          "l_orderkey", "l_partkey"),
        maxRounds = 2, weightCol = Some("weight"), levels = 2)),
    "graph_hits" -> ((s, dir) =>
      // Kleinberg hubs/authorities on the DIRECTED (src < dst) canonical
      // edges: low-id parts can only be hubs toward high-id authorities
      graft.operators.Graph.hits(coPurchaseEdges(s, dir), iters = 2)),
    "graph_articlerank" -> ((s, dir) =>
      // GDS ArticleRank: PageRank with avg-degree-damped contributions
      graft.operators.Graph.articleRank(coPurchaseEdges(s, dir),
        iters = 3, damping = 0.85)
        .orderBy(round(col("rank"), 6).desc, col("node"))
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .limit(20)),
    "graph_distance_distribution" -> ((s, dir) => {
      // hop histogram of the landmark balls (effective-diameter probe)
      val e = coPurchaseEdges(s, dir)
      val landmarks = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .filter(pmod(col("node"), lit(50)) === 0).distinct()
      graft.operators.Graph.distanceDistribution(e, maxHops = 3,
        sources = Some(landmarks))
    }),
    "graph_eigenvector" -> ((s, dir) =>
      // power-method eigenvector centrality, 3 L1-normalized rounds
      // (round 1 = degree centrality; oracle = unrolled rounds)
      graft.operators.Graph.eigenvectorCentrality(coPurchaseEdges(s, dir),
        iters = 3)),
    "graph_modularity" -> ((s, dir) => {
      // Newman modularity of the 3-round LPA communities — per-community
      // contributions; the quality score GDS reports for its community
      // algorithms
      val e = coPurchaseEdges(s, dir)
      graft.operators.Graph.modularity(e,
        graft.operators.Graph.labelPropagation(e, rounds = 3))
    }),
    "graph_conductance" -> ((s, dir) => {
      // boundary-leakage audit of the same LPA communities that
      // graph_modularity scores for density
      val e = coPurchaseEdges(s, dir)
      graft.operators.Graph.conductance(e,
        graft.operators.Graph.labelPropagation(e, rounds = 3))
    }),
    "graph_assortativity" -> ((s, dir) =>
      // degree-mixing Pearson coefficient over edge ends — one row
      graft.operators.Graph.degreeAssortativity(coPurchaseEdges(s, dir))),
    "graph_ktruss" -> ((s, dir) =>
      // 6-truss of the co-purchase graph (edges in >= 4 triangles after
      // peeling): 4 rounds to fixpoint at sf0.01; oracle unrolls 8
      // (peeling is idempotent past the fixpoint)
      graft.operators.Graph.kTruss(coPurchaseEdges(s, dir), k = 6)),
    "graph_kcore" -> ((s, dir) =>
      // 20-core of the co-purchase graph: at sf0.01 this takes 9 peel
      // rounds with real cascades (500 -> 404 nodes) to the fixpoint
      // (witness-observed); the oracle unrolls 12 rounds — peeling is
      // idempotent past the fixpoint, so the margin is free
      graft.operators.Graph.kCore(coPurchaseEdges(s, dir), k = 20)),
    "graph_shortest_paths" -> ((s, dir) => {
      // hop-bounded weighted SSSP from the minimum node id; weights are
      // shared-order counts (integer-valued doubles — exact sums)
      val we = graft.operators.Graph.coOccurrenceWeightedEdges(
        t(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0),
        "l_orderkey", "l_partkey")
      graft.operators.Graph.shortestPaths(we,
        we.agg(min(col("src")).as("node")), maxHops = 4,
        weightCol = Some("weight"))
    }),
    "graph_wsp_paths" -> ((s, dir) => {
      // Dijkstra-surface PATH reconstruction: id sequences ride the
      // relaxation inside the min struct; equal costs break to the
      // lexicographically smallest route
      val we = graft.operators.Graph.coOccurrenceWeightedEdges(
        t(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0),
        "l_orderkey", "l_partkey")
      graft.operators.Graph.shortestPathTree(we,
        we.agg(min(col("src")).as("node")), maxHops = 4,
        weightCol = Some("weight"), directed = true)
    }),
    "graph_wsp" -> ((s, dir) => {
      // DIRECTED weighted SSSP (the GDS Dijkstra surface, one-way
      // relaxation): canonical src<dst co-purchase edges read as a
      // low-id → high-id DAG, shared-order counts as costs
      val we = graft.operators.Graph.coOccurrenceWeightedEdges(
        t(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0),
        "l_orderkey", "l_partkey")
      graft.operators.Graph.shortestPaths(we,
        we.agg(min(col("src")).as("node")), maxHops = 4,
        weightCol = Some("weight"), directed = true)
    }),
    "graph_mst" -> ((s, dir) => {
      // minimum spanning forest by Borůvka rounds (the GDS spanning-tree
      // surface): per round every component claims its cheapest outgoing
      // edge under the (w, src, dst) total order, components merge
      val we = graft.operators.Graph.coOccurrenceWeightedEdges(
        t(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0),
        "l_orderkey", "l_partkey")
      graft.operators.Graph.boruvkaMst(we, maxRounds = 3,
        weightCol = Some("weight"))
    }),
    "graph_kshortest" -> ((s, dir) => {
      // Yen's-surface analogue for COSTS: k smallest distinct path costs
      // per node, hop-bounded k-frontier Bellman-Ford relaxation
      val we = graft.operators.Graph.coOccurrenceWeightedEdges(
        t(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0),
        "l_orderkey", "l_partkey")
      graft.operators.Graph.kShortestDistances(we,
        we.agg(min(col("src")).as("node")), k = 3, maxHops = 4,
        weightCol = Some("weight"), directed = true)
    }),
    // ---- text cleaning / sampling / chunking (training-data prep) ----
    "text_pii_redact" -> ((s, dir) => {
      // PII-laden fixture derived deterministically from doc_id (the
      // synthetic corpus has no natural PII): 1–3 emails, one phone, one
      // IP prepended to each document, then redacted and counted.
      val pii = t(s, dir, "documents").select(col("doc_id"),
        concat(
          expr("repeat(concat('user', cast(doc_id as string), '@example.com '), " +
            "cast(pmod(doc_id, 3) + 1 as int))"),
          lit("+1-555-"), lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
          lit(" 10."), pmod(col("doc_id"), lit(256L)).cast("string"), lit(".0.7 "),
          col("text")).as("text"))
      graft.operators.TextAnalysis.redactPii(pii)
        .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
          substring(col("text"), 1, 80).as("redacted_head"))
    }),
    "chunk_overlap" -> ((s, dir) =>
      graft.operators.Corpus.chunkWithOverlap(
        t(s, dir, "documents"), chunkTokens = 32, overlapTokens = 8)),
    "sample_weighted" -> ((s, dir) =>
      graft.operators.Corpus.prioritySample(t(s, dir, "documents"), k = 25)),
    "boilerplate_ngrams" -> ((s, dir) =>
      // most-shared 5-token grams across documents (boilerplate miner)
      graft.operators.TextAnalysis.topNgrams(t(s, dir, "documents"), n = 5, minDf = 2L)
        .orderBy(col("df").desc, col("gram").asc)
        .limit(20)),
    "vocab_topk" -> ((s, dir) =>
      graft.operators.TextAnalysis.vocabulary(t(s, dir, "documents"), minCount = 2L)
        .orderBy(col("n").desc, col("token").asc)
        .limit(50)),
    "text_unigram_lm" -> ((s, dir) =>
      graft.operators.TextAnalysis.unigramLogProb(t(s, dir, "documents"))),
    "text_perplexity" -> ((s, dir) =>
      // CCNet-style LM quality gate: bigram stupid-backoff perplexity,
      // model trained on the corpus itself in one pass
      graft.operators.TextAnalysis.ngramLmPerplexity(t(s, dir, "documents"))),
    "dsir_scores" -> ((s, dir) => {
      // DSIR importance scoring: the benchmark slice (every 20th doc,
      // the decontaminate fixture) plays the target domain
      val docs = t(s, dir, "documents")
      graft.operators.TextAnalysis.dsirScores(
        docs, docs.filter(pmod(col("doc_id"), lit(20)) === 0))
    }),
    "text_bm25" -> ((s, dir) =>
      // Okapi BM25 retrieval scores against a fixed query-term set —
      // filter-before-shuffle, broadcast df/N, decimal-exact term sum
      graft.operators.TextAnalysis.bm25Scores(t(s, dir, "documents"),
        queryTerms = Seq("join", "vector", "stream", "window"))),
    "text_blocklist" -> ((s, dir) =>
      // scan-time keyword safety gate: literal-array blocklist, one
      // codegen'd filter per row, zero shuffles; keep verdict under an
      // integer-exact hits/tokens fraction
      graft.operators.TextAnalysis.blocklistFilter(t(s, dir, "documents"),
        blocklist = Seq("slow", "broken", "stale"), maxHitFrac = 0.02)),
    "retrieval_rrf" -> ((s, dir) => {
      // hybrid retrieval: BM25 lexical top-50 fused with embedding-
      // cosine top-50 (query = vec 0) by reciprocal-rank fusion; both
      // lists rank above a TakeOrdered limit, never a global window
      import org.apache.spark.sql.expressions.Window
      val lexTop = graft.operators.TextAnalysis.bm25Scores(
          t(s, dir, "documents"),
          queryTerms = Seq("join", "vector", "stream", "window"))
        .orderBy(col("bm25").desc, col("doc_id").asc).limit(50)
      val lex = lexTop.withColumn("rank",
          row_number().over(Window.orderBy(col("bm25").desc, col("doc_id").asc)))
        .select(col("doc_id").as("id"), col("rank"))
      val emb = t(s, dir, "embeddings")
      val sem = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") === 0L), k = 50)
        .select(col("neighbor_id").as("id"), col("rank"))
      graft.operators.TextAnalysis.rrfFuse(Seq(lex, sem), topK = 20)
    }),
    "quality_classifier" -> ((s, dir) =>
      // model-based quality filter: hashed linear classifier scoring,
      // zero-shuffle (model rides as one broadcast weight-array row)
      graft.operators.TextAnalysis.hashedLinearScores(
        t(s, dir, "documents"),
        graft.operators.TextAnalysis.syntheticHashedWeights(s, dims = 4096))),
    "text_ttr" -> ((s, dir) =>
      graft.operators.TextAnalysis.lexicalDiversity(t(s, dir, "documents"))),
    "text_entropy" -> ((s, dir) =>
      // token-distribution Shannon entropy per doc: the graded
      // template/degenerate-text read TTR misses (map-side only)
      graft.operators.TextAnalysis.lexicalEntropy(t(s, dir, "documents"))),
    "dedup_semantic" -> ((s, dir) =>
      // SemDeDup: k-means cells from the deterministic Lloyd build, then
      // drop every vector with a smaller-id within-cell twin at >= 0.40
      Similarity.semanticDedup(t(s, dir, "embeddings"),
        threshold = 0.40, cells = 8, iters = 2)),
    "decontaminate_semantic" -> ((s, dir) => {
      // the EMBEDDING rung of the decontamination ladder (exact 8-gram
      // -> fuzzy lexical LSH -> semantic): corpus docs whose vector
      // sits at >= 0.40 cosine to any benchmark vector; bench side
      // probes its top-2 cells of the corpus IVF index so boundary
      // pairs are caught
      val e = t(s, dir, "embeddings")
      Similarity.semanticDecontaminate(
        e.filter(pmod(col("vec_id"), lit(20)) =!= 0),
        e.filter(pmod(col("vec_id"), lit(20)) === 0),
        threshold = 0.40, cells = 8, nProbe = 2, iters = 2)
    }),
    "ev_anomaly" -> ((s, dir) =>
      graft.operators.Events.anomalies(eventsTable(s, dir), zThreshold = 2.5)),
    "stats_corr" -> ((s, dir) =>
      // bivariate statistics family: corr / covariance / regression
      // aggregates — one partial+final hash aggregate, no shuffle beyond
      // the group keys; rounding sits far above parallel-sum ulp noise
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_samp_qp"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("covar_pop_qp"),
          round(stddev_samp(col("l_discount")), 6).as("sd_discount"),
          round(var_pop(col("l_quantity")), 6).as("var_qty"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope_price_qty"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("icept_price_qty"))),
    "sketch_merge" -> ((s, dir) => {
      // partition-wise sketch build + re-merge: per-source HLL sketches
      // of document fingerprints UNION into a corpus-wide sketch — the
      // incremental-distinct pattern (sketch per ingest partition,
      // merged on read) that replaces a global count_distinct at 100 TB.
      // Estimates are engine-specific; the ERROR CONTRACT is the oracle
      // (sketch_approx pattern): estimate within 15% of the exact count
      // both engines compute identically.
      val d = t(s, dir, "documents").select(col("source"),
        graft.functions.TextFunctions.md5Fingerprint(col("text")).as("fp"))
      val per = d.groupBy(col("source")).agg(
        hll_sketch_agg(col("fp")).as("sk"),
        count_distinct(col("fp")).as("exact_fps"))
      val perOut = per.select(col("source"), col("exact_fps"),
        (abs(hll_sketch_estimate(col("sk")) - col("exact_fps")) <=
          col("exact_fps").cast("double") * 0.15).as("approx_ok"))
      val globalSk = per.agg(hll_union_agg(col("sk")).as("sk"))
      val globalExact = d.agg(count_distinct(col("fp")).as("exact_fps"))
      val globalOut = globalSk.crossJoin(globalExact)
        .select(lit("__all__").as("source"), col("exact_fps"),
          (abs(hll_sketch_estimate(col("sk")) - col("exact_fps")) <=
            col("exact_fps").cast("double") * 0.15).as("approx_ok"))
      perOut.unionByName(globalOut)
    }),
    "hist_numeric" -> ((s, dir) =>
      // fixed-width numeric histogram: integer bucket arithmetic, exact
      // on both engines (floor of a double that is an exact .25-grid
      // TPC-H price is deterministic)
      t(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 25000.0d).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))),
    "ev_attribution" -> ((s, dir) => {
      // stream-stream attribution join, run here in its batch rendition
      // (identical plan minus watermarks); StreamJoinSpec proves the
      // MemoryStream run emits exactly these rows
      val ev = eventsTable(s, dir)
      graft.streaming.EventStreams.attributeClicks(
        ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"), col("ts")),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts")),
        horizonMinutes = 60)
    }),
    "dq_audit" -> ((s, dir) =>
      // Deequ-style column-profile audit: every metric from ONE global
      // aggregate (single Expand for the multi-distinct), long format
      // via a driver-free explode of the one result row
      graft.operators.Quality.dqAudit(t(s, dir, "lineitem"),
        numericCols = Seq("l_quantity", "l_extendedprice", "l_discount"),
        otherCols = Seq("l_returnflag", "l_shipdate"))),
    "cdc_scd2" -> ((s, dir) =>
      // SCD type-2 history from the event change stream: run-collapse +
      // interval close under a single entity-keyed Exchange
      graft.operators.Quality.scd2(eventsTable(s, dir))
        .select(col("user_id"), col("state"), col("version"),
          unix_millis(col("valid_from")).as("valid_from_ms"),
          unix_millis(col("valid_to")).as("valid_to_ms"),
          col("is_current"))),
    "stats_outliers" -> ((s, dir) =>
      // Tukey-fence outlier audit on the heavy-tailed event metric:
      // exact quartile fences broadcast back for one counting pass
      graft.operators.Quality.iqrOutliers(
        t(s, dir, "events"), "event_type", "value")),
    "fuzzy_join_edit" -> ((s, dir) =>
      // blocked Levenshtein record linkage over part names: block =
      // (last name token, size) — guarded quadratic contract, length
      // lower-bound prefilter, shuffle_hash self-join
      graft.operators.Quality.editLinkage(
        t(s, dir, "part"), idCol = "p_partkey", nameCol = "p_name",
        blockExprs = Seq(regexp_extract(col("p_name"), "(\\S+)$", 1),
          col("p_size").cast("string")),
        maxDist = 4)),
    "embed_dim_stats" -> ((s, dir) =>
      // per-dimension corpus profile: posexplode + one dim-keyed hash
      // aggregate (shuffle is O(partitions x dims)); decimal-exact sums
      Similarity.dimStats(t(s, dir, "embeddings"))),
    "vocab_bpe_merges" -> ((s, dir) =>
      // BPE tokenizer training: per-round weighted pair argmax over the
      // WORD table (corpus scanned once), greedy left-to-right merges,
      // scratch-state rounds — returns the merges.txt table
      graft.operators.TextAnalysis.bpeMerges(t(s, dir, "documents"),
        rounds = 6)),
    "vocab_unigram_lm" -> ((s, dir) =>
      // SentencePiece-style unigram-LM tokenizer training: EM over all
      // segmentations (forward-backward expectations, no Viterbi path),
      // prune-to-keepMulti rounds — the other tokenizer real pipelines
      // train beside BPE
      graft.operators.TextAnalysis.unigramLmVocab(t(s, dir, "documents"),
        seedMulti = 60, keepMulti = 40, emRounds = 2,
        maxPieceLen = 3, maxWordLen = 12)),
    "text_line_dedup" -> ((s, dir) =>
      // CCNet-style corpus-wide line dedup; line-structured fixture
      // (the corpus ships single-line docs): raw tokens, 6 per line
      graft.operators.TextAnalysis.lineDedup(
        t(s, dir, "documents").withColumn("text",
          array_join(
            transform(
              sequence(lit(0),
                floor((size(split(col("text"), " ")) - 1) / lit(6))
                  .cast("int")),
              i => array_join(
                slice(split(col("text"), " "), i * 6 + 1, lit(6)), " ")),
            "\n")))),
    "text_boilerplate_strip" -> ((s, dir) =>
      // line-df boilerplate filter: ALL copies of a line in >= 3 docs
      // drop (lineDedup keeps the first; this is the other policy)
      graft.operators.TextAnalysis.boilerplateStrip(
        t(s, dir, "documents").withColumn("text",
          array_join(
            transform(
              sequence(lit(0),
                floor((size(split(col("text"), " ")) - 1) / lit(6))
                  .cast("int")),
              i => array_join(
                slice(split(col("text"), " "), i * 6 + 1, lit(6)), " ")),
            "\n")),
        minDf = 3L)),
    "text_unigram_encode" -> ((s, dir) => {
      // encode the corpus with the learned unigram vocab: per-doc ws vs
      // Viterbi-segmentation piece counts — the real-tokenizer budget
      // arithmetic (bpeEncodeCounts companion)
      val docs = t(s, dir, "documents")
      graft.operators.TextAnalysis.unigramEncodeCounts(docs,
        graft.operators.TextAnalysis.unigramLmVocab(docs,
          seedMulti = 60, keepMulti = 40, emRounds = 2,
          maxPieceLen = 3, maxWordLen = 12),
        maxPieceLen = 3)
    }),
    "text_bpe_encode" -> ((s, dir) =>
      // token-budget arithmetic with the LEARNED tokenizer: per-doc ws
      // vs BPE symbol counts off the vocabulary-sized final state table
      graft.operators.TextAnalysis.bpeEncodeCounts(t(s, dir, "documents"),
        rounds = 6)),
    "basket_rules" -> ((s, dir) => {
      // association rules over co-purchases: pair support from the
      // guarded co-occurrence join (distinct (order, item) first so
      // support counts ORDERS), confidence and lift from broadcast item
      // counts — the market-basket readout of the co-purchase graph
      val li = t(s, dir, "lineitem")
        .filter(pmod(col("l_partkey"), lit(4)) === 0)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val pairs = graft.operators.Graph.coOccurrenceWeightedEdges(
        li, "l_orderkey", "l_partkey")
      val itemN = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_item"))
      val total = li.agg(count_distinct(col("l_orderkey")).as("n_orders"))
      pairs.filter(col("weight") >= 2)
        .join(itemN.select(col("l_partkey").as("src"), col("n_item").as("n_src")), "src")
        .join(itemN.select(col("l_partkey").as("dst"), col("n_item").as("n_dst")), "dst")
        .crossJoin(broadcast(total))
        .select(col("src"), col("dst"), col("weight").as("support"),
          round(col("weight") / col("n_src"), 6).as("conf_src_dst"),
          round((col("weight") * col("n_orders"))
            / (col("n_src") * col("n_dst")), 6).as("lift"))
    }),
    "customer_rfm" -> ((s, dir) => {
      // RFM segmentation: recency/frequency/monetary quartile scores
      // from broadcast quantile fences — never an ntile window over the
      // whole customer table
      val o = t(s, dir, "orders")
      val maxD = o.agg(max(col("o_orderdate")).as("dmax"))
      val per = o.groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("f"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("m"))
        .crossJoin(broadcast(maxD))
        .select(col("o_custkey"),
          datediff(col("dmax"), col("last_order")).cast("double").as("r"),
          col("f").cast("double").as("fd"), col("m"))
      val fences = per.agg(
        percentile(col("r"), lit(0.25)).as("r1"),
        percentile(col("r"), lit(0.5)).as("r2"),
        percentile(col("r"), lit(0.75)).as("r3"),
        percentile(col("fd"), lit(0.25)).as("f1"),
        percentile(col("fd"), lit(0.5)).as("f2"),
        percentile(col("fd"), lit(0.75)).as("f3"),
        percentile(col("m"), lit(0.25)).as("m1"),
        percentile(col("m"), lit(0.5)).as("m2"),
        percentile(col("m"), lit(0.75)).as("m3"))
      def score(v: org.apache.spark.sql.Column, a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column,
          c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        lit(1) + (v > a).cast("int") + (v > b).cast("int") + (v > c).cast("int")
      per.crossJoin(broadcast(fences))
        .select(col("o_custkey"),
          // fewer days since last order = better: invert the quartile
          (lit(5) - score(col("r"), col("r1"), col("r2"), col("r3"))).as("r_score"),
          score(col("fd"), col("f1"), col("f2"), col("f3")).as("f_score"),
          score(col("m"), col("m1"), col("m2"), col("m3")).as("m_score"),
          col("r").cast("long").as("recency_days"),
          col("fd").cast("long").as("frequency"),
          round(col("m"), 2).as("monetary"))
    }),
    "ev_point_in_time" -> ((s, dir) => {
      // temporal lookup: purchases join the SCD2 dimension version (from
      // the sparse signup/error state stream) current at their timestamp;
      // equi-join on the entity with the containment residual — versions
      // never overlap, so <=1 match; uncovered facts keep null version
      val ev = eventsTable(s, dir)
      val hist = graft.operators.Quality.scd2(
        ev.filter(col("event_type").isin("signup", "error")))
      graft.operators.Quality.pointInTimeJoin(
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts")),
        hist)
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts")).as("ts_ms"), col("state"), col("version"))
    }),
    "stats_ab_ttest" -> ((s, dir) =>
      // A/B readout: Welch t per metric group from one conditional
      // aggregate (variant = user_id parity)
      graft.operators.Quality.welchTTest(
        eventsTable(s, dir).withColumn("variant", pmod(col("user_id"), lit(2))),
        "event_type", "variant", "value")),
    "stats_anova" -> ((s, dir) =>
      // one-way ANOVA F across ALL event types (the k-ary jump from
      // the pairwise t-test): decimal-exact moment sums per group,
      // order-free cross-group reduce
      graft.operators.Quality.oneWayAnova(
        eventsTable(s, dir), "event_type", "value")),
    "stats_permutation" -> ((s, dir) =>
      // nonparametric permutation test on the ttest fixture: 32
      // md5-coin reshuffles, add-one Monte-Carlo p
      graft.operators.Quality.permutationTest(
        eventsTable(s, dir)
          .withColumn("variant", pmod(col("user_id"), lit(2))),
        "event_id", "variant", "value", nPerms = 32)),
    "dq_kanonymity" -> ((s, dir) =>
      // privacy audit: equivalence classes over (lang, source,
      // 100-char length bucket), at-risk mass per k threshold
      graft.operators.Quality.kAnonymity(
        t(s, dir, "documents")
          .withColumn("len_bucket", (col("n_chars") / 100).cast("long")),
        Seq("lang", "source", "len_bucket"))),
    "dq_ldiversity" -> ((s, dir) =>
      // the k-anonymity companion: within (source, length-bucket)
      // classes, how many distinct langs shield the sensitive value
      graft.operators.Quality.lDiversity(
        t(s, dir, "documents")
          .withColumn("len_bucket", (col("n_chars") / 100).cast("long")),
        Seq("source", "len_bucket"), "lang")),
    "stats_levene" -> ((s, dir) =>
      // homoscedasticity check feeding stats_anova: ANOVA F over
      // |x - group mean| (mean-centered Levene)
      graft.operators.Quality.leveneTest(
        eventsTable(s, dir), "event_type", "value")),
    "mm_audio_energy" -> ((s, dir) =>
      // windowed PCM energy profile: integer frame energies, integer
      // silence verdicts, one 6-dp ratio per clip
      Multimodal.audioEnergy(s,
        Multimodal.synthesizeMedia(t(s, dir, "documents"))).toDF()),
    "stats_winsorize" -> ((s, dir) =>
      // robust clipped mean per type over the heavy-tailed event metric
      graft.operators.Quality.winsorize(
        eventsTable(s, dir), "event_type", "value")),
    "stats_ks_test" -> ((s, dir) => {
      // nonparametric distribution-drift readout: exact two-sample KS
      // over even- vs odd-orderkey price populations
      val li = t(s, dir, "lineitem")
      graft.operators.Quality.ksTest(
        li.filter(col("l_orderkey") % 2 === 0),
        li.filter(col("l_orderkey") % 2 === 1),
        "l_extendedprice")
    }),
    "dq_snapshot_diff" -> ((s, dir) => {
      // warehouse reconciliation: the "new" snapshot is derived
      // deterministically (drop %13 keys, add 100 new keys, bump
      // %7 prices) so every status bucket is provably non-empty
      val old = t(s, dir, "orders")
      val neu = old.filter(pmod(col("o_orderkey"), lit(13L)) =!= 0)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(7L)) === 0,
            col("o_totalprice") + lit(1.0d)).otherwise(col("o_totalprice")))
        .unionByName(old.filter(pmod(col("o_orderkey"), lit(101L)) === 3)
          .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L)))
      graft.operators.Quality.snapshotDiff(old, neu,
        keyCols = Seq("o_orderkey"),
        compareCols = Seq("o_totalprice", "o_orderstatus"))
    }),
    "dq_skew_report" -> ((s, dir) =>
      // shuffle-risk audit: per candidate key, top-key share + exact
      // Gini from the count-of-counts histogram
      graft.operators.Quality.keySkewReport(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey"))),
    "stats_bootstrap" -> ((s, dir) =>
      // deterministic Poisson bootstrap: 32 md5-coin replicas, exact
      // decimal weighted sums, percentile interval from the sorted means
      graft.operators.Quality.bootstrapMeanCI(
        eventsTable(s, dir), "event_id", "value", b = 32)),
    "corpus_quantile_norm" -> ((s, dir) =>
      // batch-effect correction: per-returnflag quantity distributions
      // mapped onto the pooled quantiles, all-integer rank compares
      graft.operators.Corpus.quantileNormalize(
        t(s, dir, "lineitem"), "l_returnflag", "l_quantity")),
    "stats_psi" -> ((s, dir) => {
      // scorecard drift: current (odd-orderkey) prices binned against
      // the baseline's (even-orderkey) decile fences
      val li = t(s, dir, "lineitem")
      graft.operators.Quality.psi(
        li.filter(col("l_orderkey") % 2 === 0),
        li.filter(col("l_orderkey") % 2 === 1),
        "l_extendedprice")
    }),
    "stats_mannwhitney" -> ((s, dir) => {
      // rank-based location-shift test over the same two populations:
      // integer histogram mid-ranks, tie-corrected z
      val li = t(s, dir, "lineitem")
      graft.operators.Quality.mannWhitneyU(
        li.filter(col("l_orderkey") % 2 === 0),
        li.filter(col("l_orderkey") % 2 === 1),
        "l_extendedprice")
    }),
    "vocab_oov" -> ((s, dir) =>
      // tokenizer-coverage / drift check: per-source OOV rate against
      // the corpus top-N vocabulary (TakeOrdered, broadcast membership)
      graft.operators.TextAnalysis.oovRate(t(s, dir, "documents"))),
    "mm_phash_pairs" -> ((s, dir) =>
      // media near-dup: payload perceptual hash (stub fingerprint, real
      // pairing) through the Manku banded Hamming multi-index
      Multimodal.phashPairs(
        Multimodal.synthesizeMedia(t(s, dir, "documents")))),
    "mm_phash_clusters" -> ((s, dir) => {
      // media near-dup GROUPS: the Hamming pair list closed into min-id
      // clusters over every media doc (the keep-one-per-group input a
      // media dedup pass consumes)
      val media = Multimodal.synthesizeMedia(t(s, dir, "documents"))
      graft.operators.Corpus.dupClusters(
        media.select(col("doc_id")),
        Multimodal.phashPairs(media).select(col("a"), col("b")))
    }),
    "dq_constraints" -> ((s, dir) => {
      // declarative Deequ-style constraint suite: row-local checks +
      // uniqueness fold into ONE aggregate pass; each referential check
      // is one anti-join count against the dimension key
      import graft.operators.Quality
      Quality.checkConstraints(t(s, dir, "lineitem"), Seq(
        Quality.NotNull("l_orderkey"),
        Quality.InRange("l_quantity", 1.0, 49.0),
        Quality.AcceptedValues("l_returnflag", Seq("A", "N", "R")),
        Quality.UniqueKey(Seq("l_orderkey", "l_linenumber")),
        Quality.RefIntegrity("l_partkey", t(s, dir, "part"), "p_partkey"),
        Quality.RefIntegrity("l_orderkey", t(s, dir, "orders"), "o_orderkey")))
    }),
    "dedup_incremental" -> ((s, dir) => {
      // continuous-ingest dedup: the arriving batch anti-joined against
      // the compact fingerprint history, then collapsed per fp — output
      // IS the history delta to append
      val d = t(s, dir, "documents")
      val history = graft.operators.Dedup.exact(
        d.filter(pmod(col("doc_id"), lit(3)) === 0))
        .select(col("fingerprint").as("fp"))
      graft.operators.Dedup.incrementalExact(
        d.filter(pmod(col("doc_id"), lit(3)) =!= 0), history)
    }),
    "dedup_incremental_bloom" -> ((s, dir) => {
      // the Bloom fast path on continuous-ingest dedup: definitely-new
      // batch rows (sketch miss) never shuffle against history; only
      // the maybe sliver pays the exact anti-join — output is
      // bit-identical to the plain exact path, which the oracle
      // re-derives
      val d = t(s, dir, "documents")
      val history = graft.operators.Dedup.exact(
        d.filter(pmod(col("doc_id"), lit(3)) === 1))
        .select(col("fingerprint").as("fp"))
      graft.operators.Dedup.incrementalExactBloom(
        d.filter(pmod(col("doc_id"), lit(3)) =!= 1), history)
    }),
    "dedup_index_persisted" -> ((s, dir) => {
      // the dedup STATE lifecycle (the IVF-PQ persistence parity):
      // build fingerprint history -> persist as a bucketed-by-fp index
      // -> load via the catalog -> incremental batch against the
      // LOADED index. Value-identical to dedup_incremental's in-memory
      // history (same oracle); the loaded anti-join co-locates on the
      // history side — Exchange on the batch side only, plan-asserted
      // in DedupIndexSpec
      val d = t(s, dir, "documents")
      val history = graft.operators.Dedup.exact(
        d.filter(pmod(col("doc_id"), lit(3)) === 0))
        .select(col("fingerprint").as("fp"))
      val out = graft.ops.Scratch.dir(
        s.conf.getOption("spark.graft.scratchDir"), "fp_index")
      graft.operators.Dedup.writeFpIndex(history, "graft_fp_history",
        buckets = 8, path = Some(out))
      graft.operators.Dedup.incrementalExact(
        d.filter(pmod(col("doc_id"), lit(3)) =!= 0),
        graft.operators.Dedup.loadFpIndex(s, "graft_fp_history"))
    }),
    "dedup_index_compacted" -> ((s, dir) => {
      // the MAINTENANCE leg of the index lifecycle: write the history
      // index, append the SAME fps again (at-least-once replay
      // residue), COMPACT (distinct + fresh bucketed rewrite,
      // catalog re-pointed), then run the incremental batch against
      // the compacted index — value-identical to dedup_index_persisted
      // (same oracle): compaction changes files, never answers
      val d = t(s, dir, "documents")
      val history = graft.operators.Dedup.exact(
        d.filter(pmod(col("doc_id"), lit(3)) === 0))
        .select(col("fingerprint").as("fp"))
      val scratch = s.conf.getOption("spark.graft.scratchDir")
      graft.operators.Dedup.writeFpIndex(history, "graft_fp_compact_hist",
        buckets = 8, path = Some(graft.ops.Scratch.dir(scratch, "fpc_index")))
      history.write.mode("append").bucketBy(8, "fp").sortBy("fp")
        .format("parquet").saveAsTable("graft_fp_compact_hist")
      graft.operators.Dedup.compactFpIndex(s, "graft_fp_compact_hist",
        buckets = 8, path = Some(graft.ops.Scratch.dir(scratch, "fpc_index2")))
      graft.operators.Dedup.incrementalExact(
        d.filter(pmod(col("doc_id"), lit(3)) =!= 0),
        graft.operators.Dedup.loadFpIndex(s, "graft_fp_compact_hist"))
    }),
    "dedup_stream_replay" -> ((s, dir) => {
      // the STREAMING incremental-dedup loop, gate-checked by
      // deterministic batch replay: three doc_id%3 micro-batches run
      // through the exact foreachBatch body (durable delta-log append
      // -> bucketed history append), and the returned delta log is the
      // per-batch first-seen collapse the oracle re-derives — batch N
      // dedups against everything batches 0..N-1 appended. Stream ≡
      // replay is spec-proven (DedupStreamSpec); replay ≡ oracle is
      // this gate
      val d = t(s, dir, "documents")
      graft.operators.Dedup.writeFpIndex(
        d.select(graft.functions.TextFunctions
          .md5Fingerprint(col("text")).as("fp")).limit(0),
        "graft_stream_fp_history", buckets = 8,
        path = Some(graft.ops.Scratch.dir(
          s.conf.getOption("spark.graft.scratchDir"), "stream_fp_index")))
      // the delta log is EXTERNAL on a fresh scratch path: a managed
      // table's warehouse directory outlives the session catalog, and
      // the orphan location fails the NEXT session's create
      // (LOCATION_ALREADY_EXISTS) — a fresh UUID dir per run cannot
      s.sql("DROP TABLE IF EXISTS graft_stream_fp_delta")
      d.select(graft.functions.TextFunctions
          .md5Fingerprint(col("text")).as("fp"),
          col("doc_id").as("keep_id"), col("doc_id").as("n_batch"),
          col("doc_id").as("batch_id")).limit(0)
        .write.option("path", graft.ops.Scratch.dir(
          s.conf.getOption("spark.graft.scratchDir"), "stream_fp_delta"))
        .format("parquet").saveAsTable("graft_stream_fp_delta")
      graft.streaming.EventStreams.replayIncrementalDedup(
        (0 to 2).map(i => d.filter(pmod(col("doc_id"), lit(3)) === i)),
        "graft_stream_fp_history", "graft_stream_fp_delta", buckets = 8)
    }),
    "dedup_lsh_index_persisted" -> ((s, dir) => {
      // the NEAR-dup state lifecycle (writeFpIndex parity for MinHash
      // band keys — the last index asymmetry): band-key history written
      // bucketed by (band, h) -> loaded via the catalog -> an arriving
      // batch probes it for cross-batch candidates (Exchange-free on
      // the history side, plan-asserted in DedupLshIndexSpec) and
      // self-joins for within-batch ones, exact-Jaccard verified on
      // candidates only
      val d = t(s, dir, "documents")
      val hist = d.filter(pmod(col("doc_id"), lit(3)) === 0)
      val batch = d.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      graft.operators.Dedup.writeLshBandIndex(
        graft.operators.Dedup.lshBandKeys(hist),
        "graft_lsh_band_history", buckets = 8,
        path = Some(graft.ops.Scratch.dir(
          s.conf.getOption("spark.graft.scratchDir"), "lsh_band_index")))
      graft.operators.Dedup.incrementalLshJaccard(
        batch,
        graft.operators.Dedup.loadLshBandIndex(s, "graft_lsh_band_history"),
        d, minJaccard = 0.20)
    }),
    "dedup_lsh_stream_replay" -> ((s, dir) => {
      // the streaming NEAR-dup loop (band-key index + corpus store +
      // pair log, the fourth table-state loop), gate-checked by
      // deterministic replay: three doc_id%3 micro-batches run through
      // the exact foreachBatch body, each unordered pair discovered
      // once by the batch that completes it — the union of per-batch
      // pair logs must equal the one-shot full-corpus lshJaccard the
      // oracle re-derives
      val d = t(s, dir, "documents")
      val scratch = s.conf.getOption("spark.graft.scratchDir")
      graft.streaming.EventStreams.seedLshStreamTables(s,
        "graft_lsh_stream_bands", "graft_lsh_stream_corpus",
        "graft_lsh_stream_pairs",
        graft.ops.Scratch.dir(scratch, "lsh_stream_bands"),
        graft.ops.Scratch.dir(scratch, "lsh_stream_corpus"),
        graft.ops.Scratch.dir(scratch, "lsh_stream_pairs"), buckets = 8)
      graft.streaming.EventStreams.replayLshDedup(
        (0 to 2).map(i => d.filter(pmod(col("doc_id"), lit(3)) === i)),
        "graft_lsh_stream_bands", "graft_lsh_stream_corpus",
        "graft_lsh_stream_pairs", buckets = 8, minJaccard = 0.20)
        .select(col("a"), col("b"), col("jaccard"))
    }),
    "ev_window_pane_compacted" -> ((s, dir) => {
      // pane-table MAINTENANCE mid-stream: two batches append, the
      // table COMPACTS (one raw-sum pane row per window×type under the
      // reserved epoch -1), a third batch appends on top — the merged
      // rollup must still equal the one-shot windowed agg (same oracle
      // as ev_window_pane_replay): compaction is an epoch boundary,
      // never a value change
      val ev = eventsTable(s, dir)
      graft.streaming.EventStreams.seedPaneTable(s, "graft_ev_panes_cmp",
        graft.ops.Scratch.dir(
          s.conf.getOption("spark.graft.scratchDir"), "ev_panes_cmp"))
      val batches = (0 to 2).map(i =>
        ev.filter(pmod(col("event_id"), lit(3)) === i))
      graft.streaming.EventStreams.processPaneBatch(
        batches(0), "graft_ev_panes_cmp", 0L)
      graft.streaming.EventStreams.processPaneBatch(
        batches(1), "graft_ev_panes_cmp", 1L)
      graft.streaming.EventStreams.compactPanes(s, "graft_ev_panes_cmp")
      graft.streaming.EventStreams.processPaneBatch(
        batches(2), "graft_ev_panes_cmp", 2L)
      graft.streaming.EventStreams.mergePanes(s, "graft_ev_panes_cmp")
    }),
    "dedup_rate_report" -> ((s, dir) =>
      // per-source duplicate-rate report card: one keyed agg over
      // fingerprints, the corpus-health metric per crawl/source
      graft.operators.Dedup.dupRateReport(t(s, dir, "documents"))),
    "ev_sliding_topk" -> ((s, dir) =>
      // trending types per sliding window: slidingCounts + a
      // WindowGroupLimit-planned per-window rank
      graft.operators.Events.trendingTypes(eventsTable(s, dir))),
    "ev_sliding_window" -> ((s, dir) =>
      // sliding windows via the built-in window(size, slide): constant
      // map-side Expand then one keyed agg; streaming-compatible form
      graft.operators.Events.slidingCounts(eventsTable(s, dir))),
    "corpus_anneal_plan" -> ((s, dir) =>
      // two-phase anneal allocation sheet: phase-1 natural token
      // shares, phase-2 quality^2-boosted shares, integer per-phase
      // budgets, oversampling flags
      graft.operators.Corpus.annealPlan(
        t(s, dir, "documents").withColumn("quality",
          graft.functions.TextFunctions.qualityScore(col("text"), col("n_chars"))),
        budgetTokens = 1000000L, phase2Permille = 100)),
    "sample_neyman" -> ((s, dir) =>
      // variance-optimal stratified sampling: budget split per source
      // by n_h*sigma_h from one tiny decimal-exact moment aggregate,
      // realized as broadcast-joined integer-coin rates
      graft.operators.Corpus.neymanSample(
        t(s, dir, "documents").withColumn("quality",
          graft.functions.TextFunctions.qualityScore(col("text"), col("n_chars"))),
        budget = 600L, valueCol = "quality")),
    "sim_pq_topk" -> ((s, dir) => {
      // product-quantization ANN: M deterministic per-subspace
      // codebooks, corpus stored as M codes, queries answered by ADC
      // table lookups — the memory-bound ANN scale path
      val e = t(s, dir, "embeddings")
      Similarity.pqTopK(e, e.filter(pmod(col("vec_id"), lit(100)) === 0),
        k = 5, dims = 64, m = 4, ksub = 4, iters = 2)
    }),
    "sim_ivfpq_topk" -> ((s, dir) => {
      // IVF-PQ composed ANN (the FAISS IVFPQ architecture): coarse
      // cosine cells prune to nProbe per query, PQ codes score the
      // probed cells by ADC, exact cosine re-ranks the shortlist
      val e = t(s, dir, "embeddings")
      Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 8),
        k = 5, cells = 8, nProbe = 2, dims = 64, m = 4, ksub = 4,
        iters = 2, shortlist = 20)
    }),
    "sim_ivfpq_recall" -> ((s, dir) => {
      // the composed index's tuning readout: recall@5 vs the exact
      // cosine top-5 at the same probe budget as sim_ivfpq_topk
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 8)
      Similarity.recallAtK(
        Similarity.bruteForceTopK(e, q, k = 5),
        Similarity.ivfPqTopK(e, q, k = 5, cells = 8, nProbe = 2,
          dims = 64, m = 4, ksub = 4, iters = 2, shortlist = 20), k = 5)
    }),
    "sim_ivfpq_residual" -> ((s, dir) => {
      // the production IVFPQ refinement (Jégou 2011 §III): PQ codes
      // over (v − coarse centroid), ADC tables per (query, probed
      // cell) — residuals are centered within a cell, so the codebook
      // spends its precision on local structure
      val e = t(s, dir, "embeddings")
      Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 8),
        k = 5, cells = 8, nProbe = 2, dims = 64, m = 4, ksub = 4,
        iters = 2, shortlist = 20, residual = true)
    }),
    "sim_ivfpq_persisted" -> ((s, dir) => {
      // the complete ANN index LIFECYCLE: build → persist (cell-
      // partitioned codes + centroids + per-subspace codebooks) →
      // load → probe against the PRE-BUILT index, the way a 100 TB
      // serving pass runs (build amortized across query batches; the
      // loaded probe scan prunes to the probed cell= dirs via DPP).
      // Value-identical to sim_ivfpq_topk: doubles round-trip parquet
      // exactly, so the oracle is the same IVF-PQ re-derivation.
      val e = t(s, dir, "embeddings")
      val idx = Similarity.buildIvfPq(e, cells = 8, dims = 64, m = 4,
        ksub = 4, iters = 2)
      val out = graft.ops.Scratch.dir(
        s.conf.getOption("spark.graft.scratchDir"), "ivfpq_index")
      Similarity.writeIvfPqIndex(idx, out)
      val (codes, cents, books) = Similarity.loadIvfPqIndex(s, out)
      Similarity.ivfPqProbe(codes, cents, books,
        e.select(col("vec_id").as("vid"), col("embedding").as("v")),
        e.filter(col("vec_id") < 8),
        k = 5, nProbe = 2, shortlist = 20, dims = 64)
    }),
    "cdc_merge" -> ((s, dir) => {
      // MERGE/upsert snapshot maintenance: target = latest per-user
      // state from even-id events, change batch = odd-id events
      // (purchases read as deletes); latest change per key wins under
      // the (ts, event_id) total order
      // user_id % 4 == 0 users are absent from the target (their upserts
      // INSERT), % 4 == 1 users see no change (KEPT); purchases DELETE
      val ev = eventsTable(s, dir)
      val target = ev.filter(pmod(col("event_id"), lit(2)) === 0)
        .filter(pmod(col("user_id"), lit(4)) =!= 0)
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("event_type"), col("value"), col("ts")),
          struct(col("ts"), col("event_id"))).as("c"))
        .select(col("user_id"), col("c.event_type").as("state"),
          col("c.value").as("value"), unix_millis(col("c.ts")).as("last_ms"))
      val changes = ev.filter(pmod(col("event_id"), lit(2)) === 1)
        .filter(pmod(col("user_id"), lit(4)) =!= 1)
        .select(col("user_id"),
          when(col("event_type") === "purchase", "D").otherwise("U").as("op"),
          col("event_type").as("state"), col("value"),
          unix_millis(col("ts")).as("last_ms"), col("ts"), col("event_id"))
      graft.operators.Quality.mergeSnapshot(target, changes,
        keyCol = "user_id", opCol = "op",
        orderCols = Seq("ts", "event_id"),
        payloadCols = Seq("state", "value", "last_ms"))
    }),
    "dq_approx_distinct" -> ((s, dir) =>
      // HLL++ cardinality sketch vs the exact anchor: the oracle
      // falsifies the published error bound, not the sketch internals
      graft.operators.Quality.approxDistinctAudit(
        t(s, dir, "lineitem"), "l_partkey", "l_returnflag")),
    "corpus_epoch_shuffle" -> ((s, dir) =>
      // epoch-1 training order: per-doc salted coin = order key, shard
      // = key mod 64; a writer realizes it shard-by-shard
      graft.operators.Corpus.epochShuffle(
        t(s, dir, "documents"), epoch = 1, nShards = 64)),
    "dq_entropy" -> ((s, dir) =>
      // Shannon-entropy distribution profile of categorical audit
      // columns (plus a derived length bucket) — the drift companion
      // to dq_audit's count metrics
      graft.operators.Quality.categoricalEntropy(
        t(s, dir, "documents")
          .withColumn("len_bucket", (col("n_chars") / lit(500L)).cast("long")),
        Seq("lang", "source", "len_bucket"))),
    "dq_mutual_info" -> ((s, dir) =>
      // dependence audit between two categorical columns: joint-
      // distribution MI + joint entropy from one joint-count aggregate
      graft.operators.Quality.mutualInformation(
        t(s, dir, "lineitem"), "l_returnflag", "l_linestatus")),
    "ev_latency_bands" -> ((s, dir) =>
      // p50/p90/p99 per (type, hour) — the SLO dashboard aggregate
      graft.operators.Events.latencyBands(eventsTable(s, dir))),
    "ev_cusum" -> ((s, dir) =>
      // run-accumulating drift monitor: slow rate creep the single-split
      // changepoint can't flag; exact integer deviations, window pair
      graft.operators.Events.cusum(eventsTable(s, dir))),
    "ev_changepoint" -> ((s, dir) =>
      // single level-shift detection per event type over its hourly
      // rate series: integer-rational binary-segmentation statistic,
      // empty buckets densified to zero
      graft.operators.Events.changePoint(eventsTable(s, dir), "hour")),
    "graph_toposort" -> ((s, dir) =>
      // hop-bounded Kahn layering of the co-purchase DAG (canonical
      // src<dst orientation is acyclic by construction): layer = the
      // earliest parallel wave; null = deeper than the bound
      graft.operators.Graph.topoLayers(coPurchaseEdges(s, dir), maxRounds = 8)),
    "emb_dbscan" -> ((s, dir) =>
      // blocked DBSCAN over the embedding corpus: core/border/noise
      // roles + min-id cluster labels through the core-core eps-graph
      Similarity.dbscan(t(s, dir, "embeddings"),
        simThreshold = 0.25, minPts = 4)),
    "dq_benford" -> ((s, dir) =>
      // Benford first-digit audit: per (column, digit 1-9) counts,
      // observed vs log10(1+1/d) expected fractions, chi-square per
      // column — the fabricated-data / corrupted-feed screen
      graft.operators.Quality.benfordAudit(t(s, dir, "lineitem"),
        Seq("l_extendedprice", "l_quantity", "l_partkey"))),
    "ev_merge_intervals" -> ((s, dir) => {
      // gaps-and-islands interval union: per-user 30-minute activity
      // windows around view/click events coalesce into busy periods
      val iv = eventsTable(s, dir)
        .filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), unix_millis(col("ts")).as("start_ms"),
          (unix_millis(col("ts")) + lit(1800000L)).as("end_ms"))
      graft.operators.Events.mergeIntervals(iv, "user_id", "start_ms", "end_ms")
    }),
    "graph_coloring" -> ((s, dir) =>
      // deterministic K1 coloring: synchronous Jones-Plassmann rounds
      // with id priority, min-free-color (mex) assignment; null =
      // unresolved within the hop bound
      graft.operators.Graph.greedyColoring(coPurchaseEdges(s, dir),
        maxRounds = 8)),
    "text_readability" -> ((s, dir) =>
      // Flesch reading-ease profile: words / sentence runs / vowel-group
      // syllables, fixed-order double score — scan-speed curation dial
      graft.operators.TextAnalysis.readability(t(s, dir, "documents"))),
    "text_textrank" -> ((s, dir) =>
      // TextRank keywords: weighted PageRank over the word
      // co-occurrence graph (window 2, content tokens only) — the rank
      // loop reused verbatim with STRING node ids
      graft.operators.TextAnalysis.textRankKeywords(
        t(s, dir, "documents"), window = 2, minTokenLen = 3,
        iters = 3, damping = 0.85, k = 30)),
    "q2_min_cost" -> ((s, dir) => {
      // TPC-H Q2 shape: suppliers achieving each part's minimum unit
      // price — the correlated scalar subquery decorrelated into a
      // keyed min + equality join-back; dimension chain broadcast
      val u = t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("unit"))
      val m = u.groupBy(col("l_partkey")).agg(min(col("unit")).as("mu"))
      u.join(m, "l_partkey").filter(col("unit") === col("mu"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("l_partkey"), col("s_name"), col("n_name"),
          round(col("unit"), 6).as("unit_price"))
        .distinct()
    }),
    "dq_drift" -> ((s, dir) => {
      // snapshot drift report: dqAudit of even- vs odd-orderkey halves
      // joined per column, 6-dp deltas on null fraction / distinct /
      // mean — the between-batches monitoring readout
      val li = t(s, dir, "lineitem")
      graft.operators.Quality.auditDrift(
        li.filter(pmod(col("l_orderkey"), lit(2)) === 0),
        li.filter(pmod(col("l_orderkey"), lit(2)) === 1),
        numericCols = Seq("l_quantity", "l_extendedprice", "l_discount"),
        otherCols = Seq("l_returnflag"))
    }),
    "corpus_budget_trim" -> ((s, dir) =>
      // token-budget realization of a mixture plan: best-quality docs
      // per source until the token budget is spent — histogram
      // cumulative mass, never a per-source document window
      graft.operators.Corpus.tokenBudgetTrim(
          t(s, dir, "documents").withColumn("quality",
            graft.functions.TextFunctions.qualityScore(col("text"), col("n_chars"))),
          budgetTokens = 800L)
        .select(col("doc_id"), col("source"), col("quality"), col("n_tokens"))),
    "corpus_domain_report" -> ((s, dir) =>
      // per-domain dup-rate × quality × token rollup; deterministic URL
      // fixture (the corpus ships no natural URLs): host varies by
      // (source, doc_id % 7), parse_url extracts it back
      graft.operators.Corpus.domainReport(
        t(s, dir, "documents").withColumn("url",
          concat(lit("https://"), col("source"), lit("-"),
            pmod(col("doc_id"), lit(7)).cast("string"),
            lit(".example.com/docs/"), col("doc_id").cast("string"))))),
    "ev_twap" -> ((s, dir) =>
      // time-weighted average per user: each reading holds until the
      // next one; decimal-exact value x duration products
      graft.operators.Events.timeWeightedAvg(eventsTable(s, dir))),
    "ev_ewma" -> ((s, dir) =>
      // per-user EWMA of the latest 16 readings: closed-form weights
      // computed once on the driver and shared with the oracle
      graft.operators.Events.ewma(eventsTable(s, dir),
        alpha = 0.25, lastN = 16)),
    "ev_holt_forecast" -> ((s, dir) =>
      // Holt level+trend over the latest 8 readings, 3-step forecast:
      // the recursion unrolls to driver-computed coefficient literals
      graft.operators.Events.holtForecast(eventsTable(s, dir),
        alpha = 0.5, beta = 0.3, lastN = 8, horizon = 3)),
    "ev_ohlc" -> ((s, dir) =>
      // hourly OHLC bars per user: open/close ride struct min/max
      // aggregates — one keyed shuffle, no windows
      graft.operators.Events.ohlcBars(eventsTable(s, dir))),
    "ev_attribution_outer" -> ((s, dir) => {
      // LEFT-OUTER stream-stream attribution (batch rendition): every
      // view row emits; unconverted views carry null click columns
      val ev = eventsTable(s, dir)
      graft.streaming.EventStreams.attributeClicksOuter(
        ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"), col("ts")),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts")),
        horizonMinutes = 60)
    }),
    "graph_matching" -> ((s, dir) =>
      // deterministic greedy maximal matching: locally-minimal edges
      // under the canonical pair order, endpoints peel per round
      graft.operators.Graph.maximalMatching(coPurchaseEdges(s, dir),
        maxRounds = 8)),
    "stats_chi2" -> ((s, dir) =>
      // chi-square independence test: the significance companion to
      // dq_mutual_info, full |X|x|Y| cell spine (absent cells are zero
      // observations), 9-dp terms under decimal sums
      graft.operators.Quality.chiSquareIndependence(
        t(s, dir, "lineitem"), "l_returnflag", "l_linestatus")),
    "stats_cramers_v" -> ((s, dir) =>
      // normalized association strength: V = sqrt(chi2/(n·min dims)) —
      // comparable across tables and sample sizes, unlike raw chi2
      graft.operators.Quality.cramersV(
        t(s, dir, "lineitem"), "l_returnflag", "l_linestatus")),
    "emb_centroids" -> ((s, dir) =>
      // per-(label, dim) centroid + variance profile — the cluster-
      // quality audit; one keyed aggregate over posexploded coords
      Similarity.labelCentroids(t(s, dir, "embeddings"))),
    "emb_confusion" -> ((s, dir) =>
      // nearest-centroid classifier confusion matrix — the label-
      // quality eval rollup over the cohesion audit
      Similarity.nearestCentroid(t(s, dir, "embeddings"))
        .groupBy(col("true_label"), col("assigned_label"))
        .agg(count(lit(1)).as("n"))),
    "stats_cohens_kappa" -> ((s, dir) => {
      // chance-corrected agreement between the C4 and Gopher filters:
      // kappa ~ 1 means redundant filters, ~ 0 orthogonal signals
      val docs = t(s, dir, "documents")
      graft.operators.Quality.cohensKappa(
        graft.operators.TextAnalysis.c4Rules(docs, minWords = 5),
        graft.operators.TextAnalysis.gopherRules(docs,
          minTokens = 25, maxTokens = 100000))
    }),
    "emb_nearest_centroid" -> ((s, dir) =>
      // centroid-classifier confusion readout: assign every vector its
      // most cosine-similar label centroid, flag against the true label
      Similarity.nearestCentroid(t(s, dir, "embeddings"))),
    "dedup_incremental_fuzzy" -> ((s, dir) => {
      // incremental NEAR-dup ingest: the arriving batch LSH-joined
      // against the fingerprint history corpus (same split as
      // dedup_incremental), exact-Jaccard verified
      val d = t(s, dir, "documents")
      graft.operators.Dedup.crossLshJaccard(
          d.filter(pmod(col("doc_id"), lit(3)) =!= 0),
          d.filter(pmod(col("doc_id"), lit(3)) === 0)
            .select(col("doc_id").as("hist_id"), col("text")),
          rightIdCol = "hist_id", minJaccard = 0.5)
        .select(col("a").as("doc_id"), col("b").as("hist_id"), col("jaccard"))
    }),
    "stats_spearman" -> ((s, dir) =>
      // monotone-association audit: rank correlation of quantity vs
      // price — integer mid-ranks over the joint value histogram
      graft.operators.Quality.spearmanCorr(
        t(s, dir, "lineitem"), "l_quantity", "l_extendedprice")),
    "stats_wasserstein" -> ((s, dir) => {
      // magnitude-aware drift: earth-mover distance between the even-
      // and odd-orderkey price populations, in price units
      val li = t(s, dir, "lineitem")
      graft.operators.Quality.wasserstein1(
        li.filter(col("l_orderkey") % 2 === 0),
        li.filter(col("l_orderkey") % 2 === 1),
        "l_extendedprice")
    }),
    "stats_jsd" -> ((s, dir) => {
      // corpus-composition divergence: event-type mix of the even- vs
      // odd-user halves under symmetric, always-finite JSD
      val ev = eventsTable(s, dir).filter(col("user_id").isNotNull)
      graft.operators.Quality.jensenShannon(
        ev.filter(col("user_id") % 2 === 0),
        ev.filter(col("user_id") % 2 === 1),
        "event_type")
    }),
    "stats_kaplan_meier" -> ((s, dir) =>
      // retention curve: value as duration, click as the event, other
      // event types right-censored; log-survival product-limit steps
      graft.operators.Quality.kaplanMeier(
        eventsTable(s, dir).filter(col("event_type").isNotNull)
          .withColumn("is_click", col("event_type") === "click"),
        "value", "is_click")),
    "vocab_coverage" -> ((s, dir) =>
      // tokenizer-freeze readout: Good-Turing unseen mass + Chao1
      // richness lower bound from the count-of-counts
      graft.operators.TextAnalysis.vocabCoverage(t(s, dir, "documents"))),
    "graph_katz" -> ((s, dir) =>
      // attenuated-walk centrality: 3 rounds of x <- 1 + 0.05 A x over
      // the co-purchase graph, decimal-exact neighbor sums
      graft.operators.Graph.katzCentrality(
        coPurchaseEdges(s, dir), alpha = 0.05, iters = 3)),
    "graph_rectangles" -> ((s, dir) =>
      // 4-cycle census via the 2-diagonals identity over guarded
      // common-neighbor pairs
      graft.operators.Graph.rectangleCount(coPurchaseEdges(s, dir))),
    "sim_hamming_topk" -> ((s, dir) => {
      // binary-quantized ANN: sign-bit codes, Hamming shortlist of 20,
      // exact-cosine rerank to top 5
      val e = t(s, dir, "embeddings")
      Similarity.hammingTopK(e, e.filter(col("vec_id") < 8),
        dim = 64, m = 20, k = 5)
    }),
    "sim_kcenter" -> ((s, dir) =>
      // farthest-point coreset: 4 greedy k-center picks, pinned-center
      // map-side distance folds
      Similarity.kCenterCoreset(t(s, dir, "embeddings"), k = 4)),
    "retrieval_mmr" -> ((s, dir) => {
      // diversified retrieval: MMR greedy rerank of the query-0 top-20
      // shortlist, relevance traded against max-redundancy at 0.7
      val e = t(s, dir, "embeddings")
      Similarity.mmrDiversify(
        e.filter(col("vec_id") =!= 0),
        e.filter(col("vec_id") === 0),
        lambda = 0.7, m = 20, k = 5)
    }),
    "stats_theil_u" -> ((s, dir) =>
      // directional dependence audit: how much of returnflag does
      // knowing linestatus remove, and vice versa
      graft.operators.Quality.theilsU(
        t(s, dir, "lineitem"), "l_returnflag", "l_linestatus")),
    "sketch_heavy_hitters" -> ((s, dir) =>
      // hot-key audit: exact top-20 suppliers probed against the CMS,
      // never-undercount + 3eps*N overcount contracts as the gate
      graft.operators.Quality.cmsHeavyHitters(
        t(s, dir, "lineitem"), "l_suppkey",
        eps = 0.005, confidence = 0.99, seed = 42, k = 20)),
    "stats_two_proportion" -> ((s, dir) =>
      // conversion-rate A/B: odd-user arm vs even-user arm on the
      // click rate, pooled-null z
      graft.operators.Quality.twoProportionZ(
        eventsTable(s, dir).filter(col("user_id").isNotNull)
          .withColumn("arm", col("user_id") % 2 === 1)
          .withColumn("converted", col("event_type") === "click"),
        "arm", "converted")),
    "ev_anomaly_mad" -> ((s, dir) =>
      // robust anomaly flags: modified z over the median/MAD baseline
      // a fat-tailed burst cannot inflate
      graft.operators.Events.anomaliesMad(eventsTable(s, dir),
        threshold = 3.5)),
    "sim_matryoshka_recall" -> ((s, dir) => {
      // truncation eval: how much of the exact top-5 survives scoring
      // on the 16-dim embedding prefix (the matryoshka dial)
      val e = t(s, dir, "embeddings")
      val sliced = e.withColumn("embedding",
        slice(col("embedding"), 1, 16))
      Similarity.recallAtK(
        Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 8), k = 5),
        Similarity.bruteForceTopK(sliced,
          sliced.filter(col("vec_id") < 8), k = 5),
        k = 5)
    }),
    "stats_conformal" -> ((s, dir) =>
      // distribution-free alert thresholds: per event type, the
      // ceil((n+1)*0.9)-th smallest value - 90% coverage order statistic
      graft.operators.Quality.conformalThreshold(
        eventsTable(s, dir), "value", "event_type")),
    "sim_recall_at_k" -> ((s, dir) => {
      // the ANN tuning readout: IVF at nProbe=2 scored against the
      // exact cosine top-5 per query
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 8)
      Similarity.recallAtK(
        Similarity.bruteForceTopK(e, q, k = 5),
        Similarity.ivfTopK(e, q, k = 5, nProbe = 2), k = 5)
    }),
    "stats_auc" -> ((s, dir) => {
      // threshold-free filter-model eval: exact rank-sum AUC of the
      // heuristic quality score against the Gopher keep decision
      val docs = t(s, dir, "documents")
      graft.operators.Quality.aucRoc(
        graft.operators.TextAnalysis.textStats(docs)
          .select(col("doc_id"), col("quality"))
          .join(graft.operators.TextAnalysis.gopherRules(docs,
            minTokens = 25, maxTokens = 100000)
            .select(col("doc_id"), col("pass")), "doc_id"),
        "quality", "pass")
    }),
    "stats_pr_curve" -> ((s, dir) => {
      // operating-point table: precision/recall/F1 at each decile
      // threshold of the same score/label pair
      val docs = t(s, dir, "documents")
      graft.operators.Quality.prCurve(
        graft.operators.TextAnalysis.textStats(docs)
          .select(col("doc_id"), col("quality"))
          .join(graft.operators.TextAnalysis.gopherRules(docs,
            minTokens = 25, maxTokens = 100000)
            .select(col("doc_id"), col("pass")), "doc_id"),
        "quality", "pass")
    }),
    "stats_gains" -> ((s, dir) => {
      // cumulative gains/lift by score decile over the same score/label
      // pair: what fraction of the good docs the top-k% by score keep
      val docs = t(s, dir, "documents")
      graft.operators.Quality.gainsTable(
        graft.operators.TextAnalysis.textStats(docs)
          .select(col("doc_id"), col("quality"))
          .join(graft.operators.TextAnalysis.gopherRules(docs,
            minTokens = 25, maxTokens = 100000)
            .select(col("doc_id"), col("pass")), "doc_id"),
        "quality", "pass")
    }),
    "er_clusters" -> ((s, dir) => {
      // entity resolution end-to-end: blocked edit-distance linkage
      // pairs closed into entity clusters (min-id component labels)
      val parts = t(s, dir, "part")
      val pairs = graft.operators.Quality.editLinkage(
        parts, idCol = "p_partkey", nameCol = "p_name",
        blockExprs = Seq(regexp_extract(col("p_name"), "(\\S+)$", 1),
          col("p_size").cast("string")),
        maxDist = 4)
      val cc = graft.operators.Corpus.connectedComponents(
        pairs.select(col("a_id"), col("b_id")), "a_id", "b_id")
      parts.select(col("p_partkey"))
        .join(cc.withColumnRenamed("id", "p_partkey"), Seq("p_partkey"),
          "left")
        .select(col("p_partkey"),
          coalesce(col("label"), col("p_partkey")).as("entity_id"))
    }),
    "stats_woe_iv" -> ((s, dir) =>
      // feature-separability audit: order-value bands against the
      // finished-order label; per-band WOE + IV contribution
      graft.operators.Quality.woeIv(
        t(s, dir, "orders")
          .withColumn("band",
            floor(col("o_totalprice").cast("double") / lit(25000.0d))
              .cast("long"))
          .withColumn("is_f", col("o_orderstatus") === "F"),
        "band", "is_f")),
    "feat_target_encoding" -> ((s, dir) =>
      // m-estimate smoothed category rate: order priority encoded
      // against the finished-order label, shrunk toward the prior
      graft.operators.Quality.targetEncoding(
        t(s, dir, "orders")
          .withColumn("is_f", col("o_orderstatus") === "F"),
        "o_orderpriority", "is_f", m = 10.0d)),
    "ev_acf" -> ((s, dir) =>
      // seasonality/burstiness readout: lag-1..3 autocorrelation of the
      // per-type hourly rate series (zero-filled span)
      graft.operators.Events.acfByType(eventsTable(s, dir), maxLag = 3)),
    "quality_calibration" -> ((s, dir) => {
      // reliability diagram: heuristic quality score binned against the
      // C4 keep decision — predicted rate vs empirical rate per decile
      val docs = t(s, dir, "documents")
      graft.operators.TextAnalysis.calibrationReport(
        graft.operators.TextAnalysis.textStats(docs)
          .select(col("doc_id"), col("quality"))
          .join(graft.operators.TextAnalysis.c4Rules(docs, minWords = 5)
            .select(col("doc_id"), col("pass")), "doc_id"),
        "quality", "pass")
    }),
    "retrieval_ndcg" -> ((s, dir) => {
      // ranking-quality eval: NDCG@10 of the cosine top-k under
      // same-label relevance, shared-constant position discounts
      val e = t(s, dir, "embeddings")
      Similarity.ndcgAtK(e, e.filter(col("vec_id") < 8), k = 10)
    }),
    "layout_zorder_ranges" -> ((s, dir) => {
      // data-skipping readout of the Z-order layout: per Morton-range
      // bucket (the would-be file), row count + min/max of BOTH
      // interleaved columns — tight on both, which a single-column
      // sort can't give
      import graft.ops.Layout
      val li = t(s, dir, "lineitem")
      val mm = li.agg(
        min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey"))).head()
      val (p0, p1) = (mm.getLong(0).toDouble, mm.getLong(1).toDouble + 1.0d)
      val (s0, s1) = (mm.getLong(2).toDouble, mm.getLong(3).toDouble + 1.0d)
      val z = Layout.mortonKey(Seq(
        Layout.minMaxBucket(col("l_partkey"), p0, p1, 8),
        Layout.minMaxBucket(col("l_suppkey"), s0, s1, 8)), 8)
      li.select(col("l_partkey"), col("l_suppkey"), z.as("zkey"))
        .withColumn("bucket", shiftrightunsigned(col("zkey"), 11))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).as("min_part"),
          max(col("l_partkey")).as("max_part"),
          min(col("l_suppkey")).as("min_supp"),
          max(col("l_suppkey")).as("max_supp"))
    }),
  )

  /** Co-purchase edge fixture for the graph_* queries: parts sharing an
    * order, partkey-thinned 4× (see the queries-map comment). */
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.coOccurrenceEdges(
      t(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0),
      "l_orderkey", "l_partkey")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "p1_provenance" ->
      """SELECT 'customer' AS file, count(*) AS n FROM customer
         UNION ALL SELECT 'orders' AS file, count(*) AS n FROM orders""",
    "p3_route_regex" ->
      """SELECT CASE WHEN regexp_matches(source, '^(?:src1)') THEN 'one'
                     WHEN regexp_matches(source, '^(?:src[02])') THEN 'evenish'
                     ELSE 'other' END AS spec, count(*) AS n
         FROM documents GROUP BY 1""",
    "p4_node_project" ->
      """SELECT c_custkey AS "nodeId", c_acctbal AS acctbal,
                c_mktsegment AS segment FROM customer""",
    "p5_edge_project" ->
      """SELECT o_custkey AS "sourceNodeId", o_orderkey AS "targetNodeId",
                o_totalprice AS totalprice FROM orders""",
    "a1_sum_results" ->
      """SELECT count(*) AS "count", CAST(sum(n_chars) AS BIGINT) AS nbytes,
                'node' AS kind FROM documents""",
    "u1_union_stats" ->
      """SELECT (SELECT count(*) FROM customer) + (SELECT count(*) FROM orders) AS "count",
                (SELECT count(*)*8 FROM customer) + (SELECT count(*)*16 FROM orders) AS nbytes,
                'final' AS kind""",
    "r1_rebatch" -> "SELECT 8::BIGINT AS n_partitions",
    "p4_multilabel" ->
      """SELECT c_custkey AS "nodeId", 'Customer|' || c_mktsegment AS labels_str,
                c_acctbal AS acctbal FROM customer""",
    "k3_pipeline_stats" ->
      // wire bytes: nodes = nodeId(8) + acctbal(8) + octet_length(segment);
      // edges = sourceNodeId(8) + targetNodeId(8) + totalprice(8)
      """SELECT (SELECT count(*) FROM customer) + (SELECT count(*) FROM orders) AS "count",
                (SELECT CAST(sum(16 + strlen(c_mktsegment)) AS BIGINT) FROM customer)
              + (SELECT CAST(count(*) * 24 AS BIGINT) FROM orders) AS nbytes,
                'final' AS kind""",
    "dedup_embedding" -> s"""
        WITH q AS (SELECT label, vec_id AS a, embedding AS qv FROM embeddings),
             c AS (SELECT label, vec_id AS b, embedding AS cv FROM embeddings),
             pairs AS (
               SELECT q.a, c.b FROM q JOIN c ON q.label = c.label AND q.a < c.b
               WHERE ${OracleFragments.cosineExpr} >= 0.40)
        SELECT b AS dup_id, min(a) AS kept_id FROM pairs GROUP BY 1""",
    "text_stats" -> OracleFragments.textStats,
    "text_langid" -> OracleFragments.textLangid,
    "text_fingerprint" -> OracleFragments.textFingerprint,
    "text_winnow" -> OracleFragments.textWinnow(k = 5, w = 4),
    "text_repetition" -> OracleFragments.textRepetition(n = 3),
    "text_repetition_profile" ->
      OracleFragments.textRepetitionProfile(topNs = Seq(2, 3, 4), dupNs = Seq(5, 10)),
    "corpus_report" -> OracleFragments.corpusReport,
    "dedup_exact" -> OracleFragments.dedupExact,
    "dedup_cdc_chunks" -> OracleFragments.dedupCdcChunks(divisor = 64),
    "corpus_span_corruption" ->
      """WITH tkx AS (
           SELECT doc_id,
                  len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS n
           FROM documents),
         blocks AS (SELECT doc_id, n,
                           unnest(range(0, (n - 1) // 8 + 1)) AS b
                    FROM tkx),
         h AS (SELECT doc_id, b, least(8, n - b * 8) AS bl,
                      ('0x' || substr(md5('span:' || doc_id::VARCHAR
                        || ':' || b::VARCHAR), 1, 15))::BIGINT AS hv
               FROM blocks),
         spans AS (SELECT doc_id, b, bl, hv,
                          1 + ((hv // 1000) % least(3, bl)) AS len
                   FROM h WHERE hv % 1000 < 150)
         SELECT doc_id, b::INT AS block,
                (b * 8 + ((hv // 100000) % (bl - len + 1)))::INT AS start_tok,
                len::INT AS len_tok
         FROM spans""",
    "vocab_kn_bigram" -> OracleFragments.vocabKnBigram(topN = 50),
    "shard_rendezvous" ->
      """SELECT doc_id,
           substr(list_aggregate(list_transform(range(0, 16), s ->
             substr(md5('hrw:' || s::VARCHAR || ':' || doc_id::VARCHAR),
               1, 15) || lpad(s::VARCHAR, 4, '0')), 'max'), 16, 4)::INT
             AS shard
         FROM documents""",
    "corpus_fim_plan" ->
      """WITH x AS (
           SELECT doc_id,
                  len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS n,
                  ('0x' || substr(md5('fim:' || doc_id::VARCHAR), 1, 15))
                    ::BIGINT AS h
           FROM documents),
         cuts AS (
           SELECT doc_id, n, h, (h // 1000) % (n + 1) AS a
           FROM x WHERE h % 1000 < 900),
         ab AS (
           SELECT doc_id, n, a, a + (h // 1000000) % (n - a + 1) AS b
           FROM cuts)
         SELECT doc_id, a::INT AS prefix_len, (b - a)::INT AS middle_len,
                (n - b)::INT AS suffix_len
         FROM ab""",
    "dq_dp_counts" ->
      """WITH g AS (SELECT lang, source, count(*)::BIGINT AS n
                    FROM documents GROUP BY 1, 2),
         k AS (SELECT lang, source, n,
                      ('0x' || substr(md5('dp:' || lang || '|' || source
                        || '|'), 1, 15))::BIGINT AS h
               FROM g),
         u AS (SELECT lang, source, n,
                      ((h % 1000000000000) + 0.5::DOUBLE)
                        / 1000000000000.0::DOUBLE AS u
               FROM k)
         SELECT lang, source, n,
                round(n + round(-(1.0::DOUBLE) * sign(u - 0.5::DOUBLE)
                      * ln(1.0::DOUBLE - 2.0::DOUBLE * abs(u - 0.5::DOUBLE)),
                  3), 4) AS n_dp
         FROM u""",
    "dedup_url" -> OracleFragments.dedupUrl,
    "dedup_spans" -> OracleFragments.dedupSpans(spanTokens = 8),
    "dedup_strip_spans" -> OracleFragments.dedupStripSpans(spanTokens = 8),
    "dedup_minhash_lsh" -> OracleFragments.dedupMinhashLsh(bands = 4, rowsPerBand = 2),
    "dedup_ngram_jaccard" -> OracleFragments.dedupNgramJaccard(minJaccard = 0.30),
    "dedup_containment" ->
      OracleFragments.dedupContainment(minContainment = 0.5),
    "dedup_ppjoin" -> OracleFragments.dedupPpjoin(minJaccard = 0.9),
    "dedup_lsh_jaccard" -> OracleFragments.dedupLshJaccard(
      bands = 4, rowsPerBand = 4, minJaccard = 0.20),
    "dedup_lsh_stream_replay" ->
      // the replayed pair log must equal the ONE-SHOT full-corpus
      // near-dup pass — same oracle as dedup_lsh_jaccard, checked
      // against the streaming loop's accumulated log
      OracleFragments.dedupLshJaccard(
        bands = 4, rowsPerBand = 4, minJaccard = 0.20),
    "dedup_minhash_estimate" -> OracleFragments.dedupMinhashEstimate(
      bands = 4, rowsPerBand = 4),
    "dedup_clusters" -> OracleFragments.dedupClusters(
      bands = 4, rowsPerBand = 4, minJaccard = 0.20),
    "split_assign_clustered" -> OracleFragments.splitAssignClustered(
      bands = 4, rowsPerBand = 4, minJaccard = 0.20,
      splits = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05)),
    "sample_mixture" -> OracleFragments.sampleMixture(
      rates = Seq("src0" -> 0.75, "src1" -> 0.5), defaultRate = 0.25),
    "stats_fdr" ->
      """WITH h AS (SELECT p_partkey AS key,
                  round((('0x' || substr(md5('fdr:' || p_partkey::VARCHAR),
                     1, 8))::BIGINT % 1000000)::DOUBLE / 1000000.0::DOUBLE,
                    6) AS p,
                  (('0x' || substr(md5('fdr:' || p_partkey::VARCHAR),
                     1, 8))::BIGINT % 1000000) AS pu
                FROM part),
         m AS (SELECT count(*)::BIGINT AS m FROM h),
         r AS (SELECT key, p, pu, m.m,
                      row_number() OVER (ORDER BY pu ASC, key ASC) AS rank
               FROM h CROSS JOIN m),
         ks AS (SELECT coalesce(max(rank), 0) AS k_star FROM r
                WHERE pu * m * 1000 <= rank * 50 * 1000000)
        SELECT key, p AS p_value, rank::INT AS rank, m,
               (rank <= (SELECT k_star FROM ks)) AS reject
        FROM r""",
    "dq_freshness" ->
      """WITH r AS (SELECT event_type AS k, epoch_ms(ts) AS ms FROM events
                    WHERE event_type IS NOT NULL AND ts IS NOT NULL),
         wm AS (SELECT max(ms) AS wm_ms FROM r)
         SELECT k AS event_type, count(*)::BIGINT AS n_rows,
                min(ms) AS oldest_ms, max(ms) AS newest_ms,
                (max(wm.wm_ms) - max(ms))::BIGINT AS lag_ms,
                sum(CASE WHEN ms > wm.wm_ms - 86400000 THEN 1 ELSE 0 END)
                  ::BIGINT AS n_recent,
                (sum(CASE WHEN ms > wm.wm_ms - 86400000 THEN 1 ELSE 0 END)
                  = 0) AS stale
         FROM r CROSS JOIN wm GROUP BY k""",
    "ev_seasonal_anomaly" ->
      """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS b,
                           count(*)::BIGINT AS cnt
                    FROM events
                    WHERE event_type IS NOT NULL AND ts IS NOT NULL
                    GROUP BY 1, 2),
         s AS (SELECT event_type, extract(hour FROM b)::INT AS hod,
                      count(*)::BIGINT AS n_buckets,
                      sum(cnt)::BIGINT AS events,
                      round(sum(cnt)::DOUBLE / count(*)::DOUBLE, 6)
                        AS mean_per_bucket
               FROM b GROUP BY 1, 2)
        SELECT b.event_type, epoch_ms(b.b) AS bucket_ms,
               extract(hour FROM b.b)::INT AS hod, b.cnt,
               s.mean_per_bucket,
               round(b.cnt::DOUBLE / s.mean_per_bucket, 6) AS ratio
        FROM b JOIN s ON b.event_type = s.event_type
                     AND extract(hour FROM b.b)::INT = s.hod
        WHERE b.cnt * s.n_buckets * 2 >= 3 * s.events""",
    "ev_seasonal" ->
      """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS b,
                           count(*)::BIGINT AS cnt
                    FROM events
                    WHERE event_type IS NOT NULL AND ts IS NOT NULL
                    GROUP BY 1, 2),
         s AS (SELECT event_type, extract(hour FROM b)::INT AS hod,
                      count(*)::BIGINT AS n_buckets,
                      sum(cnt)::BIGINT AS events
               FROM b GROUP BY 1, 2),
         t AS (SELECT event_type, sum(events)::BIGINT AS total
               FROM s GROUP BY 1)
        SELECT s.event_type, s.hod, s.n_buckets, s.events,
               round(s.events::DOUBLE / s.n_buckets::DOUBLE, 6)
                 AS mean_per_bucket,
               round(s.events::DOUBLE / t.total::DOUBLE, 6) AS share
        FROM s JOIN t USING (event_type)""",
    "dq_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey)::BIGINT AS n_exact,
                TRUE AS within_bound
         FROM lineitem GROUP BY 1""",
    "corpus_epoch_shuffle" ->
      """SELECT doc_id, c % 64 AS shard, c AS order_key
         FROM (SELECT doc_id,
                      ('0x' || substr(md5('epoch1:' || doc_id::VARCHAR),
                        1, 8))::BIGINT AS c
               FROM documents)""",
    "decontaminate_fuzzy" -> OracleFragments.decontaminateFuzzy(
      bands = 4, rowsPerBand = 4, minJaccard = 0.5),
    "decontaminate_report" -> OracleFragments.decontaminateReport(
      nTokens = 8, minHits = 1, benchMod = 20),
    "lm_quality_buckets" -> OracleFragments.lmQualityBuckets,
    "corpus_mixture_plan" ->
      s"""WITH s AS (SELECT source, count(*) AS n_docs,
                 sum(len(${OracleFragments.toks}))::BIGINT AS total_tokens
               FROM documents GROUP BY 1),
          mn AS (SELECT min(total_tokens) AS min_tok FROM s),
          r AS (SELECT s.*,
                 sqrt(min_tok::DOUBLE / total_tokens::DOUBLE) AS kr,
                 round(total_tokens::DOUBLE *
                   sqrt(min_tok::DOUBLE / total_tokens::DOUBLE), 6) AS desired
               FROM s, mn),
          td AS (SELECT sum(desired::DECIMAL(28,6))::DOUBLE AS td FROM r)
         SELECT source, n_docs, total_tokens, round(kr, 6) AS keep_rate,
                least(floor(100000 * desired / td)::BIGINT, total_tokens) AS alloc_tokens,
                floor(100000 * desired / td)::BIGINT > total_tokens AS capped
         FROM r, td""",
    "vocab_zipf" ->
      s"""WITH v AS (SELECT tk, count(*) AS n
               FROM (SELECT unnest(${OracleFragments.toks}) AS tk FROM documents)
               GROUP BY 1),
          hist AS (SELECT n, count(*) AS nv FROM v GROUP BY 1),
          ranked AS (SELECT n, nv,
                 coalesce(sum(nv) OVER (ORDER BY n DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS rank
               FROM hist),
          t AS (SELECT nv, round(ln(rank), 9) AS x, round(ln(n), 9) AS y FROM ranked),
          m AS (SELECT sum(nv)::BIGINT AS nt,
                 sum(round(x * nv, 9)::DECIMAL(28,12))::DOUBLE AS sx,
                 sum(round(y * nv, 9)::DECIMAL(28,12))::DOUBLE AS sy,
                 sum(round(x * y * nv, 9)::DECIMAL(28,12))::DOUBLE AS sxy,
                 sum(round(x * x * nv, 9)::DECIMAL(28,12))::DOUBLE AS sxx
               FROM t)
         SELECT nt AS n_types,
                round((nt * sxy - sx * sy) / nullif(nt * sxx - sx * sx, 0), 6) AS zipf_slope,
                round((sy - round((nt * sxy - sx * sy) / nullif(nt * sxx - sx * sx, 0), 6) * sx)
                  / nt, 6) AS zipf_intercept
         FROM m""",
    "decontaminate" -> OracleFragments.decontaminate(
      nTokens = 8, minHits = 1, benchMod = 20),
    // the Bloom pre-gate is output-invisible (no false negatives; the
    // exact join re-verifies survivors), so the oracle is the SAME
    // exact re-derivation — full value equality
    "decontaminate_bloom" -> OracleFragments.decontaminate(
      nTokens = 8, minHits = 1, benchMod = 20),
    "corpus_prepare" -> OracleFragments.corpusPrepare(
      bands = 4, rowsPerBand = 4, minJaccard = 0.20,
      nTokens = 8, minHits = 1, benchMod = 20,
      splits = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
      qualityKeep = Some(0.8)),
    "corpus_prepare_mixed" -> OracleFragments.corpusPrepare(
      bands = 4, rowsPerBand = 4, minJaccard = 0.20,
      nTokens = 8, minHits = 1, benchMod = 20,
      splits = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
      qualityKeep = Some(0.8), temperature = Some(2.0)),
    "corpus_prepare_fuzzy" -> OracleFragments.corpusPrepare(
      bands = 4, rowsPerBand = 4, minJaccard = 0.20,
      nTokens = 8, minHits = 1, benchMod = 20,
      splits = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
      qualityKeep = Some(0.8), fuzzy = Some(0.5)),
    "corpus_prepare_spans" -> OracleFragments.corpusPrepare(
      bands = 4, rowsPerBand = 4, minJaccard = 0.20,
      nTokens = 8, minHits = 1, benchMod = 20,
      splits = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
      qualityKeep = Some(0.8), spanDedup = Some((8, 0.95))),
    "corpus_prepare_classifier" -> OracleFragments.corpusPrepare(
      bands = 4, rowsPerBand = 4, minJaccard = 0.20,
      nTokens = 8, minHits = 1, benchMod = 20,
      splits = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
      qualityKeep = Some(0.8), classifierDims = Some(4096)),
    "corpus_prepare_semantic" -> OracleFragments.corpusPrepare(
      bands = 4, rowsPerBand = 4, minJaccard = 0.20,
      nTokens = 8, minHits = 1, benchMod = 20,
      splits = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
      qualityKeep = Some(0.8), semantic = Some(0.40)),
    "sample_quality_weighted" -> OracleFragments.sampleQualityWeighted(
      Seq("src0" -> 0.9, "src1" -> 0.6), defaultRate = 0.75),
    "sample_temperature" -> OracleFragments.sampleTemperature,
    "sample_fixed_k" -> OracleFragments.sampleFixedPerGroup(k = 25),
    "split_assign" -> OracleFragments.assignSplits(
      Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05)),
    "emb_normalize" -> OracleFragments.embNormalize,
    "emb_standardize" -> OracleFragments.embStandardize,
    "emb_random_projection" ->
      OracleFragments.embRandomProjection(outDims = 8, dim = 64),
    "emb_pca" -> OracleFragments.embPca(iters = 4),
    "emb_pca_scores" -> OracleFragments.embPcaScores(iters = 4),
    "emb_quantize" -> OracleFragments.embQuantize,
    "pack_chunks" -> OracleFragments.packChunks(targetTokens = 512),
    "corpus_shard_plan" -> OracleFragments.shardPlan(
      targetTokens = 512, nShards = 16, epoch = 1),
    "pack_greedy" ->
      OracleFragments.packGreedy(budgetTokens = 512L, shardRows = 1024L),
    "pack_efficiency" ->
      OracleFragments.packEfficiency(budgetTokens = 512L, shardRows = 1024L),
    "tfidf_terms" -> OracleFragments.tfidfTerms(k = 3),
    // salted join is value-identical to the plain join by construction;
    // the gate proves it against the same re-derivation
    "tfidf_terms_salted" -> OracleFragments.tfidfTerms(k = 3),
    "skew_salted_join" ->
      """WITH d AS (SELECT event_type, round(avg(value), 4) AS type_avg
                    FROM events WHERE event_type IS NOT NULL GROUP BY 1)
         SELECT e.event_id, e.event_type, round(e.value, 4) AS value,
                d.type_avg
         FROM events e JOIN d USING (event_type)
         WHERE e.event_type IS NOT NULL""",
    "skew_salted_agg" ->
      """SELECT event_type, count(*) AS n,
                round(sum(value), 4) AS total
         FROM events GROUP BY 1""",
    // Sketch error-contract check: the oracle asserts TRUE for each bound
    // and recomputes only the exact anchors; the Spark side emits whether
    // its HLL++ / KLL estimates actually landed inside the bounds. A
    // sketch regression past its contract flips a boolean → hash mismatch.
    "sketch_approx" ->
      """SELECT event_type,
                count(DISTINCT user_id)::BIGINT AS exact_users,
                TRUE AS approx_users_ok,
                TRUE AS approx_p50_ok
         FROM events GROUP BY 1""",
    "sim_cosine_topk" -> OracleFragments.simCosineTopK(maxQueryId = 8, k = 5),
    "emb_hard_negatives" ->
      OracleFragments.embHardNegatives(maxAnchorId = 8, k = 5),
    "sim_cosine_pairs" -> OracleFragments.simCosinePairs(threshold = 0.40),
    // embeddings dim is 64 at every sf (TESTDATA.md); the plane matrix and
    // the unrolled Lloyd steps below are generated from the SAME Scala
    // constants the Spark plans embed, so nothing can drift.
    "sim_lsh_topk" -> OracleFragments.simLshTopK(
      numPlanes = 8, dim = 64, maxQueryId = 8, k = 5),
    "sim_knn_graph" -> OracleFragments.simKnnGraph(numPlanes = 8, dim = 64, k = 3),
    "sim_nsw_topk" -> OracleFragments.simNswTopK(numPlanes = 8, dim = 64,
      degree = 3, maxHops = 3, maxQueryId = 8),
    "sim_nsw_recall" -> OracleFragments.simNswRecall(numPlanes = 8, dim = 64,
      degree = 3, maxHops = 3, maxQueryId = 8),
    "sim_hnsw_topk" -> OracleFragments.simHnswTopK(numPlanes = 8, dim = 64,
      degree = 3, maxHops1 = 2, maxHops0 = 3, layerMod = 8, maxQueryId = 8),
    "sim_kmeans" -> OracleFragments.simKmeans(k = 8, iters = 2),
    "sim_ivf_topk" -> OracleFragments.simIvfTopK(
      cells = 8, iters = 2, nProbe = 4, maxQueryId = 8, k = 5),
    "sim_ivf_pairs" -> OracleFragments.simIvfPairs(
      cells = 8, iters = 2, threshold = 0.40),
    "ev_sessionize" -> OracleFragments.evSessionize(gapMinutes = 30),
    "ev_session_stream_replay" ->
      // same sessionization, minus the per-user ordinal the incremental
      // loop does not (and need not) reproduce — sessions are already
      // uniquely keyed by (user_id, session_start_ms)
      s"""WITH sess AS (${OracleFragments.evSessionize(gapMinutes = 30)})
          SELECT user_id, n_events, session_start_ms, session_end_ms,
                 total_value
          FROM sess""",
    "ev_attribution_stream_replay" ->
      // identical to ev_attribution_outer: the loop's accumulated log
      // IS the one-shot LEFT-OUTER attribution
      """WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
                    FROM events WHERE event_type = 'view'),
            c AS (SELECT user_id AS c_user_id, event_id AS click_id, ts AS click_ts
                    FROM events WHERE event_type = 'click')
         SELECT v.user_id, view_id, click_id,
                epoch_ms(view_ts) AS view_ms, epoch_ms(click_ts) AS click_ms
         FROM v LEFT JOIN c ON v.user_id = c.c_user_id
          AND click_ts >= view_ts
          AND click_ts <= view_ts + INTERVAL 60 MINUTE""",
    "ev_window_pane_replay" ->
      // identical to ev_window_agg: the pane loop's merged rollup IS
      // the one-shot windowed aggregate
      """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
                count(*) AS n, round(sum(value), 4) AS total_value
         FROM events GROUP BY 1, 2""",
    "ev_window_pane_compacted" ->
      // compaction preserves the monoid partials raw, so the rollup is
      // unchanged — same oracle as the replay gate
      """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
                count(*) AS n, round(sum(value), 4) AS total_value
         FROM events GROUP BY 1, 2""",
    "ev_retention" -> OracleFragments.evRetention(periodSeconds = 7L * 86400L),
    "ev_interval_join" -> OracleFragments.evIntervalJoin(gapMinutes = 30),
    "ev_session_window" ->
      """WITH g AS (
           SELECT user_id, ts, value,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
           FROM events),
         s AS (
           SELECT user_id, ts, value,
                  CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) >= 1800000
                       THEN 1 ELSE 0 END AS new_session
           FROM g),
         c AS (
           SELECT user_id, ts, value,
                  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) AS seq
           FROM s)
         SELECT user_id, epoch_ms(min(ts)) AS session_start_ms,
                count(*) AS n_events, round(sum(value), 4) AS total_value
         FROM c GROUP BY user_id, seq""",
    "ev_window_agg" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
                count(*) AS n, round(sum(value), 4) AS total_value
         FROM events GROUP BY 1, 2""",
    "ev_running_totals" ->
      """SELECT event_id, user_id,
                row_number() OVER w ::INT AS event_idx,
                round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING), 4) AS running_value
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "ev_rank_funcs" ->
      """SELECT event_id, user_id,
                lag(value) OVER w AS prev_value,
                lead(value) OVER w AS next_value,
                ntile(4) OVER w ::INT AS quartile,
                round(percent_rank() OVER w, 6) AS pct_rank,
                round(cume_dist() OVER w, 6) AS cume
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "hof_funcs" ->
      """SELECT vec_id,
                round(list_aggregate(list_transform(embedding, x -> x::DOUBLE), 'sum'), 6) AS sum_elems,
                len(list_filter(embedding, x -> x::DOUBLE > 0.0))::INT AS n_pos,
                len(list_filter(embedding, x -> x::DOUBLE < -0.5)) > 0 AS has_small,
                round(list_aggregate(list_transform(list_zip(embedding, embedding),
                  z -> z[1]::DOUBLE * z[2]::DOUBLE), 'sum'), 6) AS self_dot
         FROM embeddings""",
    "ev_top_types" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS cnt
                    FROM events GROUP BY 1, 2)
         SELECT user_id, event_type, cnt,
                row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type ASC)::INT AS rnk
         FROM c QUALIFY rnk <= 2""",
    "ev_top_paths" ->
      """WITH seq AS (SELECT user_id, event_type AS t0,
                lead(event_type, 1) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS t1,
                lead(event_type, 2) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS t2
              FROM events)
         SELECT t0 || '->' || t1 || '->' || t2 AS path,
                count(*)::BIGINT AS n_occurrences
         FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL
         GROUP BY 1 ORDER BY n_occurrences DESC, path ASC LIMIT 20""",
    "ev_transitions" ->
      """WITH seq AS (SELECT user_id, event_type,
                lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
              FROM events),
          c AS (SELECT event_type, next_type, count(*) AS n FROM seq
                WHERE next_type IS NOT NULL GROUP BY 1, 2),
          t AS (SELECT event_type, sum(n)::BIGINT AS tot FROM c GROUP BY 1)
         SELECT c.event_type, c.next_type, n::BIGINT AS n,
                round(n::DOUBLE / tot::DOUBLE, 6) AS p
         FROM c JOIN t USING (event_type)""",
    "ev_asof_join" ->
      """SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms,
                epoch_ms(r.ts) AS asof_err_ms
         FROM events e
         ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') r
           ON e.user_id = r.user_id AND e.ts >= r.ts""",
    "ev_asof_native" ->
      """SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms,
                epoch_ms(r.ts) AS asof_err_ms
         FROM events e
         ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') r
           ON e.user_id = r.user_id AND e.ts >= r.ts""",
    "ev_asof_native_fwd" ->
      """SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms,
                epoch_ms(r.ts) AS asof_err_ms
         FROM events e
         ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') r
           ON e.user_id = r.user_id AND e.ts <= r.ts""",
    "ev_asof_native_multi" ->
      """WITH r AS (SELECT user_id, ts, max(event_id) AS err_event_id,
                           max_by("value", event_id) AS err_value
                    FROM events WHERE event_type = 'error'
                    GROUP BY user_id, ts)
         SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms,
                epoch_ms(r.ts) AS asof_err_ms,
                r.err_event_id AS asof_err_event_id,
                r.err_value AS asof_err_value
         FROM events e
         ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts >= r.ts""",
    "ev_asof_nearest" ->
      """WITH r AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
          b AS (SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms,
                       epoch_ms(rb.ts) AS b_ms
                FROM events e
                ASOF LEFT JOIN r rb ON e.user_id = rb.user_id AND e.ts >= rb.ts),
          f AS (SELECT e.event_id, epoch_ms(rf.ts) AS f_ms
                FROM events e
                ASOF LEFT JOIN r rf ON e.user_id = rf.user_id AND e.ts <= rf.ts)
        SELECT b.event_id, b.user_id, b.ts_ms,
               CASE WHEN b_ms IS NULL THEN f_ms
                    WHEN f_ms IS NULL THEN b_ms
                    WHEN ts_ms - b_ms <= f_ms - ts_ms THEN b_ms
                    ELSE f_ms END AS asof_err_ms
        FROM b JOIN f USING (event_id)""",
    "agg_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
                count(*) AS n_events FROM events GROUP BY 1""",
    "pct_agg" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50,
                round(quantile_cont(value, 0.9), 4) AS p90
         FROM events GROUP BY 1""",
    "mm_decode_meta" -> OracleFragments.mmDecodeMeta,
    "mm_sample_frames" -> OracleFragments.mmSampleFrames(stride = 2),
    "mm_features" -> OracleFragments.mmFeatures(dims = 8),
    // The oracle reads the synthesized media payload back out of the
    // TEXT column: strlen counts BYTES while substr/ascii walk
    // CHARACTERS, so byte≡character only holds because the documents
    // fixture is ASCII (shared assumption with mm_features/mm_resize —
    // a non-ASCII fixture needs an encode()-based oracle). Zero-frame
    // docs (empty media) are kept total via the LEFT JOIN: Spark emits
    // an n_frames=0 row with ratio 0.0, so must the oracle.
    "mm_audio_energy" ->
      """WITH x AS (SELECT doc_id, text, strlen(text)::BIGINT AS mb
                    FROM documents),
         fr AS (SELECT doc_id, text, mb,
                       unnest(range(0, (mb + 63) // 64)) AS f
                FROM x),
         fe AS (SELECT doc_id,
                       least((f + 1) * 64, mb) - f * 64 AS flen,
                       list_aggregate(list_transform(
                         range(f * 64 + 1, least((f + 1) * 64, mb) + 1),
                         i -> ascii(substr(text, i::INT, 1))
                              * ascii(substr(text, i::INT, 1))), 'sum') AS e
                FROM fr),
         agg AS (SELECT doc_id, count(*)::INT AS n_frames,
                        sum(CASE WHEN e < flen * 3600 THEN 1 ELSE 0 END)
                          ::INT AS silent_frames,
                        sum(e)::BIGINT AS energy_sq
                 FROM fe GROUP BY doc_id)
         SELECT x.doc_id,
                coalesce(agg.n_frames, 0)::INT AS n_frames,
                coalesce(agg.silent_frames, 0)::INT AS silent_frames,
                CASE WHEN agg.n_frames IS NULL THEN 0.0::DOUBLE
                     ELSE round(agg.silent_frames::DOUBLE / agg.n_frames, 6)
                END AS silence_ratio,
                coalesce(agg.energy_sq, 0)::BIGINT AS energy_sq
         FROM x LEFT JOIN agg USING (doc_id)""",
    "dedup_simhash" -> OracleFragments.dedupSimhash(bits = 32, prefixBits = 8),
    "dedup_simhash_pairs" -> OracleFragments.dedupSimhashPairs(bits = 32, maxHamming = 3),
    "mm_resize" ->
      // resized payload = text bytes cycled to 32*32; checksum of the
      // same cycled string (ASCII text -> string md5 == byte md5)
      """SELECT doc_id, 32 AS width, 32 AS height, 1024::INT AS n_bytes,
                md5(substr(repeat(text, ((1024 + length(text) - 1) // length(text))::INT), 1, 1024)) AS checksum
         FROM documents""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
                sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
                sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base,
                sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2)))::DOUBLE AS sum_disc_price,
                sum(l_quantity::DECIMAL(18,2))::DOUBLE / count(*) AS avg_qty,
                count(*) AS count_order
         FROM lineitem WHERE l_quantity < 45 GROUP BY 1, 2""",
    "q3_topk_join" ->
      """SELECT o_orderkey,
                sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY 1 ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""",
    "q6_forecast_revenue" ->
      """SELECT sum(l_extendedprice::DECIMAL(18,2)
                    * l_discount::DECIMAL(18,2))::DOUBLE AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q12_priority_mix" ->
      """SELECT l_linestatus,
                sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
                sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END)::BIGINT AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY 1""",
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS order_count
         FROM orders o
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-04-01'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
         GROUP BY 1""",
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
                (sum(l_extendedprice::DECIMAL(18,2)
                     * (1 - l_discount::DECIMAL(18,2))))::DOUBLE AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-04-01'
           AND l_returnflag = 'R'
         GROUP BY 1, 2, 3, 4
         ORDER BY revenue DESC, c_custkey ASC
         LIMIT 20""",
    "ev_ohlc" ->
      """SELECT user_id,
                epoch_ms(date_trunc('hour', ts)) AS bar_start_ms,
                min({'t': epoch_ms(ts), 'e': event_id, 'v': "value"}).v AS open,
                max("value") AS high, min("value") AS low,
                max({'t': epoch_ms(ts), 'e': event_id, 'v': "value"}).v AS close,
                count(*)::BIGINT AS n_events
         FROM events GROUP BY 1, 2""",
    "q5_local_supplier" ->
      """SELECT n_name,
                sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
         GROUP BY 1""",
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                year(l_shipdate)::INT AS l_year,
                sum(l_extendedprice::DECIMAL(18,2)
                    * (1 - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE n1.n_name <> n2.n_name
         GROUP BY 1, 2, 3""",
    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice,
                total_qty::DOUBLE AS total_qty
         FROM orders
              JOIN (SELECT l_orderkey, sum(l_quantity::DECIMAL(18,2)) AS total_qty
                    FROM lineitem GROUP BY 1 HAVING total_qty > 200) big
                ON o_orderkey = big.l_orderkey
              JOIN customer ON o_custkey = c_custkey""",
    "q15_top_supplier" ->
      """WITH revenue AS (
           SELECT l_suppkey AS supplier_no,
                  sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_rev::DOUBLE AS total_revenue
         FROM supplier JOIN revenue ON s_suppkey = supplier_no
         WHERE total_rev = (SELECT max(total_rev) FROM revenue)""",
    "q17_small_qty_revenue" ->
      """SELECT round(sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE
                      / 7.0, 2)::DOUBLE AS avg_yearly
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE p_brand = 'Brand#4' AND p_type = 'PROMO'
           AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                             FROM lineitem l2
                             WHERE l2.l_partkey = p_partkey)""",
    "q20_promo_suppliers" ->
      """SELECT s_suppkey, s_name
         FROM supplier
         WHERE s_suppkey IN (
           SELECT sp.l_suppkey FROM
             (SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
              FROM lineitem GROUP BY 1, 2) sp
           WHERE sp.l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE 'red%')
             AND sp.qty > (SELECT 0.15 * sum(l2.l_quantity)
                           FROM lineitem l2
                           WHERE l2.l_partkey = sp.l_partkey))""",
    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*)::BIGINT AS numwait
         FROM supplier, lineitem l1, orders
         WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
           AND o_orderstatus = 'F'
           AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT * FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT * FROM lineitem l3
                             JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o3.o_orderdate
                                                 + INTERVAL 60 DAY)
         GROUP BY s_name""",
    "q22_dormant_accounts" ->
      """WITH cb AS (SELECT c_custkey, c_nationkey,
                            CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
                     FROM customer),
              pos AS (SELECT count(*)::BIGINT AS n, sum(cents)::BIGINT AS s
                      FROM cb WHERE cents > 0)
         SELECT (c_nationkey % 5)::INT AS cntrycode,
                count(*)::BIGINT AS numcust,
                round(sum(cents)::DOUBLE / 100, 2) AS totacctbal
         FROM cb
         WHERE cents * (SELECT n FROM pos) > (SELECT s FROM pos)
           AND NOT EXISTS (SELECT * FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_totalprice > 400000)
         GROUP BY c_nationkey % 5""",
    "q8_market_share" ->
      """SELECT year(o_orderdate)::INT AS o_year,
                round(sum(CASE WHEN n2.n_name = 'NATION_7'
                               THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                                    (1 - CAST(l_discount AS DECIMAL(18,2)))
                               ELSE CAST(0 AS DECIMAL(18,2)) END)::DOUBLE /
                      sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                          (1 - CAST(l_discount AS DECIMAL(18,2))))::DOUBLE,
                      6) AS mkt_share
         FROM lineitem
           JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON c_nationkey = n1.n_nationkey
           JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation n2 ON s_nationkey = n2.n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY 1""",
    "q9_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
                sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2))) -
                    CAST(p_retailprice AS DECIMAL(18,2)) *
                    CAST(0.5 AS DECIMAL(2,1)) *
                    CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS sum_profit
         FROM lineitem
           JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN nation ON s_nationkey = n_nationkey
         GROUP BY 1, 2""",
    "q11_important_stock" ->
      """WITH ps AS (
           SELECT l_partkey, l_suppkey,
                  sum(CAST(l_quantity AS DECIMAL(18,2))) AS availqty
           FROM lineitem GROUP BY 1, 2),
         v AS (
           SELECT l_partkey AS ps_partkey,
                  sum(CAST(p_retailprice AS DECIMAL(18,2)) * availqty) AS value
           FROM ps JOIN part ON p_partkey = l_partkey
                   JOIN supplier ON s_suppkey = l_suppkey
           WHERE s_nationkey % 5 = 2
           GROUP BY 1)
         SELECT ps_partkey, value::DOUBLE AS value
         FROM v
         WHERE value * (SELECT count(*) * 10 FROM v) >
               (SELECT sum(value) * 14 FROM v)""",
    "q13_customer_distribution" ->
      """SELECT c_count, count(*)::BIGINT AS custdist
         FROM (SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
               FROM customer LEFT OUTER JOIN orders
                 ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '4-%'
               GROUP BY c_custkey)
         GROUP BY c_count""",
    "q14_promo_revenue" ->
      """SELECT round(100.0 *
                      sum(CASE WHEN p_type = 'PROMO'
                               THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                                    (1 - CAST(l_discount AS DECIMAL(18,2)))
                               ELSE CAST(0 AS DECIMAL(18,2)) END)::DOUBLE /
                      sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                          (1 - CAST(l_discount AS DECIMAL(18,2))))::DOUBLE,
                      6) AS promo_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-03-01'
           AND l_shipdate < TIMESTAMP '1996-04-01'""",
    "q16_parts_supplier" ->
      """SELECT p_brand, p_type, p_size,
                count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
           JOIN part ON p_partkey = l_partkey
         WHERE p_brand <> 'Brand#5'
           AND p_type NOT IN ('STANDARD', 'ECONOMY')
           AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0)
         GROUP BY p_brand, p_type, p_size""",
    "q19_discounted_revenue" ->
      """SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                   (1 - CAST(l_discount AS DECIMAL(18,2))))::DOUBLE AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 20)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                AND l_quantity BETWEEN 10 AND 30)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                AND l_quantity BETWEEN 20 AND 40)""",
    "semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders)""",
    "anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)""",
    "distinct_op" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer""",
    "lateral_topn" ->
      """SELECT n.n_name, c.c_custkey, c.c_acctbal
         FROM nation n
         JOIN LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                       WHERE c.c_nationkey = n.n_nationkey
                       ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c ON TRUE""",
    "grouping_sets_agg" ->
      """SELECT o_orderstatus, o_orderpriority,
                count(*) AS n, grouping(o_orderstatus)::INT AS g_status,
                grouping(o_orderpriority)::INT AS g_prio
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",
    "window_funcs" ->
      """SELECT o_custkey, o_orderkey,
                lag(o_totalprice, 1) OVER w AS prev_price,
                lead(o_totalprice, 1) OVER w AS next_price,
                (rank() OVER w)::INT AS rnk,
                (dense_rank() OVER w)::INT AS drnk,
                (ntile(4) OVER w)::INT AS quartile,
                round(percent_rank() OVER w, 6) AS pct_rank,
                round(cume_dist() OVER w, 6) AS cume
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
    "null_funcs" ->
      """SELECT o_orderkey,
                o_totalprice / nullif(o_custkey % 100, 0) AS safe_div,
                nullif(o_orderpriority, '1-URGENT') AS non_urgent,
                CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL
                     THEN 'closedish' ELSE 'open' END AS status_flag,
                (o_custkey IS NOT DISTINCT FROM 7) AS is_cust7
         FROM orders""",
    "date_spine" ->
      """WITH o AS (SELECT date_trunc('month', o_orderdate)::DATE AS month FROM orders),
            b AS (SELECT min(month) AS m0, max(month) AS m1 FROM o),
            spine AS (SELECT unnest(generate_series(m0::TIMESTAMP, m1::TIMESTAMP,
                                                    INTERVAL 1 MONTH))::DATE AS month FROM b),
            cnt AS (SELECT month, count(*) AS n_orders FROM o GROUP BY 1)
          SELECT strftime(spine.month, '%Y-%m') AS month,
                 coalesce(cnt.n_orders, 0)::BIGINT AS n_orders
          FROM spine LEFT JOIN cnt USING (month)""",
    "unpivot_op" ->
      """SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice::DOUBLE AS value FROM part
         UNION ALL
         SELECT p_partkey, 'p_size' AS metric, p_size::DOUBLE AS value FROM part""",
    "bitwise_funcs" ->
      """SELECT o_orderkey,
                o_orderkey & 255 AS k_and,
                o_orderkey | 4096 AS k_or,
                xor(o_orderkey, o_custkey) AS k_xor,
                o_orderkey << 2 AS k_shl,
                o_orderkey >> 3 AS k_shr,
                bit_count(o_orderkey)::INT AS k_bits
         FROM orders""",
    "ev_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                     WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
                   WHERE e.event_type = 'click' GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
                   WHERE e.event_type = 'purchase' GROUP BY 1)
          SELECT 1 AS step_idx, 'view' AS step, (SELECT count(*) FROM s1)::BIGINT AS n_users
          UNION ALL
          SELECT 2, 'click', (SELECT count(*) FROM s2)::BIGINT
          UNION ALL
          SELECT 3, 'purchase', (SELECT count(*) FROM s3)::BIGINT""",
    "ev_funnel_windowed" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                     WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
                          AND e.ts <= s1.t + INTERVAL 86400 SECONDS
                   WHERE e.event_type = 'click' GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
                          AND e.ts <= s2.t + INTERVAL 86400 SECONDS
                   WHERE e.event_type = 'purchase' GROUP BY 1)
          SELECT 1 AS step_idx, 'view' AS step, (SELECT count(*) FROM s1)::BIGINT AS n_users
          UNION ALL
          SELECT 2, 'click', (SELECT count(*) FROM s2)::BIGINT
          UNION ALL
          SELECT 3, 'purchase', (SELECT count(*) FROM s3)::BIGINT""",
    "ev_resample" ->
      """WITH ev AS (SELECT user_id, (epoch_ms(ts) // 1000) AS sec,
                            max(value::DOUBLE) AS v
                     FROM events GROUP BY 1, 2),
            b AS (SELECT user_id, (min(sec) // 3600) * 3600 AS t0,
                         (max(sec) // 3600) * 3600 AS t1
                  FROM ev GROUP BY 1),
            grid AS (SELECT user_id, unnest(range(t0, t1 + 3600, 3600)) AS gsec FROM b)
          SELECT g.user_id, g.gsec AS grid_sec, e.v AS filled
          FROM grid g ASOF LEFT JOIN ev e
            ON g.user_id = e.user_id AND e.sec <= g.gsec""",
    "ev_range_window" ->
      """SELECT event_id, user_id,
                (sum(CAST(value AS DECIMAL(18,4))) OVER (
                  PARTITION BY user_id ORDER BY (epoch_ms(ts) // 1000)
                  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW))::DOUBLE AS trailing_10m
         FROM events""",
    "rollup_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
                coalesce(l_linestatus, 'ALL') AS status,
                count(*) AS n, sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "topk_sort" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
         ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10""",
    "json_extract" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
                json_extract_string(props, '$.k')::BIGINT AS k_num
         FROM events""",
    "array_funcs" -> {
      val toks = OracleFragments.toks
      s"""SELECT doc_id,
            len($toks)::INT AS n_tokens,
            (list_sort($toks))[1] AS first_tok,
            (list_sort($toks))[-1] AS last_tok,
            coalesce(list_position(list_sort($toks), 'the'), 0)::BIGINT AS pos_the,
            len(list_distinct($toks))::INT AS n_distinct
          FROM documents"""
    },
    "math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
                round(abs(l_discount - 0.05), 6) AS abs_disc,
                round(sqrt(l_quantity), 6) AS sqrt_qty,
                pow(l_quantity, 2) AS qty_sq,
                floor(l_extendedprice)::BIGINT AS price_floor,
                ceil(l_extendedprice)::BIGINT AS price_ceil,
                round(ln(l_extendedprice), 6) AS ln_price,
                round(exp(l_discount), 6) AS exp_disc,
                sign(l_quantity - 25.0)::INT AS qty_sign,
                (l_partkey % 7)::BIGINT AS key_mod
         FROM lineitem""",
    "regex_funcs" ->
      """SELECT p_partkey,
                regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
                regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
                regexp_matches(p_name, 'red|blue') AS has_color
         FROM part""",
    "map_funcs" ->
      """SELECT l_orderkey,
                count(DISTINCT l_linenumber)::INT AS n_lines,
                min(CASE WHEN l_linenumber = 1 THEN l_quantity END) AS qty_line1,
                max(l_linenumber)::INT AS max_lineno
         FROM lineitem GROUP BY 1""",
    "string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_upper,
                substr(p_name, 1, 6) AS name6,
                concat_ws('-', p_brand, p_type) AS brand_type,
                lpad(p_partkey::VARCHAR, 8, '0') AS key_padded,
                length(p_name)::INT AS name_len
         FROM part""",
    "date_funcs" ->
      """SELECT o_orderkey, year(o_orderdate)::INT AS yr,
                month(o_orderdate)::INT AS mo, dayofmonth(o_orderdate)::INT AS dom,
                strftime(o_orderdate, '%Y-%m') AS ym
         FROM orders""",
    "pivot_agg" ->
      """SELECT user_id,
                count(*) FILTER (event_type = 'click') AS n_click,
                count(*) FILTER (event_type = 'view') AS n_view,
                count(*) FILTER (event_type = 'error') AS n_error
         FROM events GROUP BY 1""",
    "posexplode_op" ->
      """SELECT vec_id, (idx - 1)::INT AS pos, round(val::DOUBLE, 6) AS val
         FROM (SELECT vec_id, unnest(embedding) AS val,
                      generate_subscripts(embedding, 1) AS idx
               FROM embeddings WHERE vec_id < 3)""",
    "cube_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
                coalesce(l_linestatus, 'ALL') AS status,
                count(*) AS n, sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    "month_trend" ->
      """SELECT epoch_ms(date_trunc('month', o_orderdate)) AS month_ms,
                count(*) AS n_orders,
                sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS revenue
         FROM orders GROUP BY 1""",
    "except_op" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
         EXCEPT SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 7000""",
    "intersect_op" ->
      """SELECT c_nationkey AS nationkey FROM customer
         INTERSECT SELECT s_nationkey AS nationkey FROM supplier""",
    "full_outer_join" ->
      """SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
                coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
               FROM customer GROUP BY 1) c
         FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp
               FROM supplier GROUP BY 1) s ON c.nationkey = s.nationkey""",
    "stateful_running_agg" ->
      """SELECT user_id, count(*) AS n, round(sum(value), 4) AS total
         FROM events GROUP BY 1""",
    "graph_degree" -> OracleFragments.graphDegree,
    "graph_pagerank" -> OracleFragments.graphPageRank(iters = 3, damping = 0.85, k = 20),
    "graph_pagerank_directed" ->
      OracleFragments.graphPageRankDirected(iters = 3, damping = 0.85, k = 20),
    "graph_pagerank_weighted" ->
      OracleFragments.graphPageRankWeighted(iters = 3, damping = 0.85, k = 20),
    "filter_quality" -> OracleFragments.filterQuality(keepFraction = 0.7),
    "text_gopher_rules" -> OracleFragments.textGopherRules(
      minTokens = 25, maxTokens = 100000, minAvgTokenLen = 3.0,
      maxAvgTokenLen = 10.0, maxPunctRatio = 0.2, minStopwordHits = 2),
    "text_c4_rules" -> OracleFragments.textC4Rules(minWords = 5),
    "graph_pagerank_personalized" ->
      OracleFragments.graphPageRankPersonalized(iters = 3, damping = 0.85,
        seedMod = 25, k = 20),
    "graph_triangles" -> OracleFragments.graphTriangles,
    "graph_clustering_coeff" -> OracleFragments.graphClusteringCoeff(k = 50),
    "graph_common_neighbors" -> OracleFragments.graphCommonNeighbors(k = 10),
    "graph_node_similarity" -> OracleFragments.graphNodeSimilarity(k = 10),
    "graph_node_overlap" -> OracleFragments.graphNodeSimilarity(k = 10, metric = "overlap"),
    "graph_node_cosine" -> OracleFragments.graphNodeSimilarity(k = 10, metric = "cosine"),
    "graph_adamic_adar" -> OracleFragments.graphAdamicAdar(k = 10),
    "graph_harmonic" -> OracleFragments.graphHarmonic(maxHops = 3, landmarkMod = 50),
    "graph_closeness" -> OracleFragments.graphCloseness(maxHops = 3, landmarkMod = 50),
    "graph_betweenness" ->
      OracleFragments.graphBetweenness(maxHops = 3, landmarkMod = 400, k = 50),
    "graph_random_walks" -> OracleFragments.graphRandomWalks(steps = 3, salt = "walk"),
    "graph_node2vec_walks" -> OracleFragments.graphNode2vecWalks(
      steps = 3, rw = 1L, cw = 4L, fw = 16L, salt = "n2v"),
    "graph_weighted_walks" ->
      OracleFragments.graphWeightedWalks(steps = 3, salt = "wwalk"),
    "graph_fastrp" -> OracleFragments.graphFastRP(
      dims = 8, iterations = 2, weights = Seq(1.0, 1.0), salt = "frp"),
    "graph_components" -> OracleFragments.graphComponents,
    "graph_influence_max" ->
      OracleFragments.graphInfluenceMax(k = 3, p = 0.15, samples = 3),
    "graph_scc" -> OracleFragments.graphScc,
    "graph_label_propagation" -> OracleFragments.graphLabelPropagation(rounds = 3),
    "graph_lpa_weighted" ->
      OracleFragments.graphLabelPropagation(rounds = 3, weighted = true),
    "graph_louvain" -> OracleFragments.graphLouvain(rounds = 2),
    "graph_louvain2" -> OracleFragments.graphLouvain(rounds = 2, levels = 2),
    "graph_hits" -> OracleFragments.graphHits(iters = 2),
    "graph_articlerank" ->
      OracleFragments.graphArticleRank(iters = 3, damping = 0.85, k = 20),
    "graph_distance_distribution" ->
      OracleFragments.graphDistanceDistribution(maxHops = 3, landmarkMod = 50),
    "graph_eigenvector" -> OracleFragments.graphEigenvector(iters = 3),
    "graph_modularity" -> OracleFragments.graphModularity(rounds = 3),
    "graph_conductance" -> OracleFragments.graphConductance(rounds = 3),
    "graph_assortativity" -> OracleFragments.graphAssortativity,
    "graph_kcore" -> OracleFragments.graphKCore(k = 20, rounds = 12),
    "graph_ktruss" -> OracleFragments.graphKTruss(k = 6, rounds = 8),
    "graph_shortest_paths" -> OracleFragments.graphShortestPaths(maxHops = 4),
    "graph_wsp" ->
      OracleFragments.graphShortestPaths(maxHops = 4, directed = true),
    "graph_wsp_paths" -> OracleFragments.graphWspPaths(maxHops = 4),
    "graph_mst" -> OracleFragments.graphMst(rounds = 3),
    "graph_kshortest" -> OracleFragments.graphKShortest(k = 3, maxHops = 4),
    "text_pii_redact" -> OracleFragments.textPiiRedact,
    "chunk_overlap" -> OracleFragments.chunkOverlap(chunkTokens = 32, overlapTokens = 8),
    "sample_weighted" -> OracleFragments.sampleWeighted(k = 25),
    "boilerplate_ngrams" -> OracleFragments.boilerplateNgrams(n = 5, minDf = 2L, k = 20),
    "vocab_topk" -> OracleFragments.vocabTopK(minCount = 2, k = 50),
    "text_unigram_lm" -> OracleFragments.textUnigramLm,
    "text_perplexity" -> OracleFragments.textPerplexity(alpha = 0.4),
    "dsir_scores" -> OracleFragments.dsirScores(benchMod = 20),
    "quality_classifier" ->
      OracleFragments.qualityClassifier(dims = 4096, thetaMilli = 0L),
    "retrieval_rrf" -> OracleFragments.retrievalRrf(
      terms = Seq("join", "vector", "stream", "window"),
      n = 50, kRrf = 60, topK = 20),
    "text_blocklist" -> OracleFragments.textBlocklist(
      terms = Seq("slow", "broken", "stale"), maxHitFrac = 0.02),
    "text_bm25" -> OracleFragments.textBm25(
      terms = Seq("join", "vector", "stream", "window"), k1 = 1.2, b = 0.75),
    "text_ttr" -> OracleFragments.textTtr,
    "text_entropy" -> OracleFragments.textLexicalEntropy,
    "dedup_semantic" -> OracleFragments.dedupSemantic(
      cells = 8, iters = 2, threshold = 0.40),
    "decontaminate_semantic" -> OracleFragments.decontaminateSemantic(
      cells = 8, iters = 2, nProbe = 2, threshold = 0.40, benchMod = 20),
    "ev_anomaly" -> OracleFragments.evAnomaly(zThreshold = 2.5),
    "stats_corr" ->
      """SELECT l_returnflag, count(*) AS n,
                round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
                round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_samp_qp,
                round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_pop_qp,
                round(stddev_samp(l_discount), 6) AS sd_discount,
                round(var_pop(l_quantity), 6) AS var_qty,
                round(regr_slope(l_extendedprice, l_quantity), 4) AS slope_price_qty,
                round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept_price_qty
         FROM lineitem GROUP BY 1""",
    "sketch_merge" -> OracleFragments.sketchMerge,
    "hist_numeric" ->
      """SELECT floor(o_totalprice / 25000.0)::BIGINT AS bucket,
                count(*) AS n,
                sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS total
         FROM orders GROUP BY 1""",
    "ev_attribution" ->
      """WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
                    FROM events WHERE event_type = 'view'),
            c AS (SELECT user_id AS c_user_id, event_id AS click_id, ts AS click_ts
                    FROM events WHERE event_type = 'click')
         SELECT v.user_id, view_id, click_id,
                epoch_ms(view_ts) AS view_ms, epoch_ms(click_ts) AS click_ms
         FROM v JOIN c ON v.user_id = c.c_user_id
          AND click_ts >= view_ts
          AND click_ts <= view_ts + INTERVAL 60 MINUTE""",
    "dq_audit" -> {
      def m(c: String, numeric: Boolean) = {
        val mn = if (numeric) s"min($c)::DOUBLE" else "NULL::DOUBLE"
        val mx = if (numeric) s"max($c)::DOUBLE" else "NULL::DOUBLE"
        val sm = if (numeric) s"sum($c::DECIMAL(28,6))::DOUBLE" else "NULL::DOUBLE"
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
                   count(*) - count($c) AS n_null,
                   count(DISTINCT $c) AS n_distinct,
                   $mn AS min_d, $mx AS max_d, $sm AS sum_d
            FROM lineitem"""
      }
      Seq(m("l_quantity", true), m("l_extendedprice", true),
        m("l_discount", true), m("l_returnflag", false),
        m("l_shipdate", false)).mkString("\nUNION ALL\n")
    },
    "cdc_scd2" ->
      """WITH o AS (
           SELECT user_id, event_type, ts, event_id,
                  lag(event_type) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS prev_state
           FROM events),
         r AS (
           SELECT user_id, event_type, ts,
                  CASE WHEN prev_state IS NULL OR prev_state <> event_type
                       THEN 1 ELSE 0 END AS chg,
                  sum(CASE WHEN prev_state IS NULL OR prev_state <> event_type
                           THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS version
           FROM o),
         s AS (
           SELECT user_id, event_type AS state, version,
                  ts AS valid_from FROM r WHERE chg = 1)
         SELECT user_id, state, version::BIGINT AS version,
                epoch_ms(valid_from) AS valid_from_ms,
                epoch_ms(lead(valid_from) OVER (PARTITION BY user_id
                    ORDER BY version)) AS valid_to_ms,
                lead(valid_from) OVER (PARTITION BY user_id
                    ORDER BY version) IS NULL AS is_current
         FROM s""",
    "stats_outliers" ->
      """WITH f AS (
           SELECT event_type,
                  quantile_cont("value", 0.25) AS q1,
                  quantile_cont("value", 0.75) AS q3
           FROM events GROUP BY 1),
         b AS (
           SELECT event_type, q1 - 1.5 * (q3 - q1) AS lo,
                  q3 + 1.5 * (q3 - q1) AS hi FROM f)
         SELECT e.event_type, count(*) AS n,
                sum(CASE WHEN "value" < lo OR "value" > hi
                         THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
                round(any_value(lo), 4) AS lo, round(any_value(hi), 4) AS hi
         FROM events e JOIN b USING (event_type)
         GROUP BY 1""",
    "fuzzy_join_edit" ->
      """WITH k AS (
           SELECT regexp_extract(p_name, '(\S+)$', 1) || '|' || p_size::VARCHAR AS blk,
                  p_partkey AS id, p_name AS name FROM part)
         SELECT a.id AS a_id, b.id AS b_id, a.name AS a_name, b.name AS b_name,
                levenshtein(a.name, b.name) AS dist
         FROM k a JOIN k b ON a.blk = b.blk AND a.id < b.id
         WHERE abs(length(a.name) - length(b.name)) <= 4
           AND levenshtein(a.name, b.name) <= 4""",
    "embed_dim_stats" ->
      """WITH ex AS (
           SELECT unnest(list_transform(generate_series(1, len(embedding)),
                    i -> {'dim': i - 1, 'v': embedding[i]})) AS u
           FROM embeddings),
         e AS (
           SELECT u.dim AS dim, round(u.v::DOUBLE, 6) AS vr FROM ex),
         a AS (
           SELECT dim, count(*) AS n,
                  sum(vr::DECIMAL(28,6))::DOUBLE AS s1,
                  sum((vr * vr)::DECIMAL(38,12))::DOUBLE AS s2,
                  min(vr) AS min_v, max(vr) AS max_v
           FROM e GROUP BY 1)
         SELECT dim::INT AS dim, n, round(s1 / n, 6) AS mean,
                round((s2 - s1 * s1 / n) / n, 8) AS var_pop, min_v, max_v
         FROM a""",
    "sim_int8_topk" -> OracleFragments.simInt8TopK(maxQueryId = 8, k = 5),
    "emb_outliers" ->
      s"""WITH km AS (SELECT * FROM (${OracleFragments.simKmeans(8, 2)}) x),
           h AS (SELECT cluster AS g, round(sq_dist, 6) AS v,
                        count(*)::BIGINT AS c
                 FROM km GROUP BY 1, 2),
           ns AS (SELECT g, sum(c)::BIGINT AS n,
                         floor(((sum(c) + 1) * 9 + 9)::DOUBLE
                           / 10.0::DOUBLE)::BIGINT AS k
                  FROM h GROUP BY g),
           cum AS (SELECT g, v,
                          (sum(c) OVER (PARTITION BY g ORDER BY v
                            ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
                   FROM h),
           q AS (SELECT cum.g, min(v) AS qhat
                 FROM cum JOIN ns USING (g)
                 WHERE cum.cum >= ns.k GROUP BY cum.g)
         SELECT km.vec_id, km.cluster, km.sq_dist, q.qhat,
                (km.sq_dist > q.qhat) AS outlier
         FROM km JOIN q ON km.cluster = q.g""",
    "sim_ivfpq_topk" -> OracleFragments.simIvfPqTopK(
      cells = 8, iters = 2, nProbe = 2, dims = 64, m = 4, ksub = 4,
      maxQueryId = 8, k = 5, shortlist = 20),
    "sim_ivfpq_recall" -> OracleFragments.simIvfPqRecall(
      cells = 8, iters = 2, nProbe = 2, dims = 64, m = 4, ksub = 4,
      maxQueryId = 8, k = 5, shortlist = 20),
    // persisted-index round trip is value-identical to the in-session
    // build (binary64 parquet round-trip) — same oracle re-derivation
    "sim_ivfpq_persisted" -> OracleFragments.simIvfPqTopK(
      cells = 8, iters = 2, nProbe = 2, dims = 64, m = 4, ksub = 4,
      maxQueryId = 8, k = 5, shortlist = 20),
    "sim_ivfpq_residual" -> OracleFragments.simIvfPqTopK(
      cells = 8, iters = 2, nProbe = 2, dims = 64, m = 4, ksub = 4,
      maxQueryId = 8, k = 5, shortlist = 20, residual = true),
    "sim_pq_topk" -> OracleFragments.simPqTopK(
      dims = 64, m = 4, ksub = 4, iters = 2, k = 5, queryMod = 100),
    "ev_sliding_window" ->
      """WITH w AS (
           SELECT (epoch_ms(ts) // 300000 - o.k) * 300000 AS ws,
                  event_type, "value"
           FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) o)
         SELECT ws AS window_start_ms, ws + 600000 AS window_end_ms,
                event_type, count(*) AS n,
                sum("value"::DECIMAL(18,2))::DOUBLE AS total_value
         FROM w GROUP BY 1, 2, 3""",
    "sample_neyman" -> OracleFragments.sampleNeyman(budget = 600L),
    "corpus_anneal_plan" -> OracleFragments.corpusAnnealPlan(
      budgetTokens = 1000000L, phase2Permille = 100),
    "mm_phash_pairs" -> OracleFragments.mmPhashPairs(bits = 32, maxHamming = 3),
    "mm_phash_clusters" ->
      OracleFragments.mmPhashClusters(bits = 32, maxHamming = 3),
    "vocab_bpe_merges" -> OracleFragments.vocabBpeMerges(rounds = 6),
    "vocab_unigram_lm" -> OracleFragments.vocabUnigramLm(
      seedMulti = 60, keepMulti = 40, emRounds = 2,
      maxPieceLen = 3, maxWordLen = 12),
    "text_unigram_encode" -> OracleFragments.textUnigramEncode(
      seedMulti = 60, keepMulti = 40, emRounds = 2,
      maxPieceLen = 3, maxWordLen = 12),
    "text_line_dedup" -> OracleFragments.textLineDedup,
    "text_boilerplate_strip" -> OracleFragments.textBoilerplateStrip(minDf = 3L),
    "text_bpe_encode" -> OracleFragments.vocabBpeEncode(rounds = 6),
    "basket_rules" ->
      """WITH li AS (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
           WHERE l_partkey % 4 = 0),
         pairs AS (
           SELECT a.l_partkey AS src, b.l_partkey AS dst,
                  count(*)::BIGINT AS support
           FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         items AS (SELECT l_partkey, count(*)::BIGINT AS n_item
                   FROM li GROUP BY 1),
         tot AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n_orders FROM li)
         SELECT p.src, p.dst, p.support,
                round(p.support / s.n_item, 6) AS conf_src_dst,
                round((p.support * t.n_orders) / (s.n_item * d.n_item), 6) AS lift
         FROM pairs p
         JOIN items s ON s.l_partkey = p.src
         JOIN items d ON d.l_partkey = p.dst
         CROSS JOIN tot t
         WHERE p.support >= 2""",
    "customer_rfm" ->
      """WITH mx AS (SELECT max(o_orderdate) AS dmax FROM orders),
         per AS (
           SELECT o_custkey,
                  date_diff('day', max(o_orderdate)::DATE,
                            (SELECT dmax FROM mx)::DATE)::DOUBLE AS r,
                  count(*)::DOUBLE AS fd,
                  sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS m
           FROM orders GROUP BY 1),
         f AS (
           SELECT quantile_cont(r, 0.25) AS r1, quantile_cont(r, 0.5) AS r2,
                  quantile_cont(r, 0.75) AS r3,
                  quantile_cont(fd, 0.25) AS f1, quantile_cont(fd, 0.5) AS f2,
                  quantile_cont(fd, 0.75) AS f3,
                  quantile_cont(m, 0.25) AS m1, quantile_cont(m, 0.5) AS m2,
                  quantile_cont(m, 0.75) AS m3
           FROM per)
         SELECT o_custkey,
                (5 - (1 + (r > r1)::INT + (r > r2)::INT + (r > r3)::INT))::INT
                  AS r_score,
                (1 + (fd > f1)::INT + (fd > f2)::INT + (fd > f3)::INT)::INT
                  AS f_score,
                (1 + (m > m1)::INT + (m > m2)::INT + (m > m3)::INT)::INT
                  AS m_score,
                r::BIGINT AS recency_days, fd::BIGINT AS frequency,
                round(m, 2) AS monetary
         FROM per CROSS JOIN f""",
    "ev_point_in_time" ->
      """WITH o AS (
           SELECT user_id, event_type, ts, event_id,
                  lag(event_type) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS prev_state
           FROM events WHERE event_type IN ('signup', 'error')),
         r AS (
           SELECT user_id, event_type, ts,
                  CASE WHEN prev_state IS NULL OR prev_state <> event_type
                       THEN 1 ELSE 0 END AS chg,
                  sum(CASE WHEN prev_state IS NULL OR prev_state <> event_type
                           THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS version
           FROM o),
         s AS (
           SELECT user_id, event_type AS state, version,
                  ts AS valid_from FROM r WHERE chg = 1),
         iv AS (
           SELECT user_id, state, version::BIGINT AS version, valid_from,
                  lead(valid_from) OVER (PARTITION BY user_id
                      ORDER BY version) AS valid_to
           FROM s)
         SELECT f.user_id, f.event_id, epoch_ms(f.ts) AS ts_ms,
                iv.state, iv.version
         FROM (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'purchase') f
         LEFT JOIN iv ON f.user_id = iv.user_id
                     AND f.ts >= iv.valid_from
                     AND (iv.valid_to IS NULL OR f.ts < iv.valid_to)""",
    "stats_ks_test" ->
      """WITH c AS (SELECT round(l_extendedprice::DOUBLE, 6) AS v,
                sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS ca,
                sum(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS cb
              FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
         cu AS (SELECT v,
                (sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING))::BIGINT AS cuma,
                (sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING))::BIGINT AS cumb
              FROM c),
         t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM c),
         d AS (SELECT max(abs(cuma::DOUBLE / (SELECT na FROM t)::DOUBLE
                - cumb::DOUBLE / (SELECT nb FROM t)::DOUBLE)) AS d FROM cu)
        SELECT (SELECT na FROM t) AS na, (SELECT nb FROM t) AS nb,
               round(d, 6) AS d_stat,
               round(sqrt((SELECT na FROM t)::DOUBLE * (SELECT nb FROM t)::DOUBLE
                 / ((SELECT na FROM t) + (SELECT nb FROM t))::DOUBLE) * d, 6)
                 AS ks_scaled
        FROM d""",
    "dq_snapshot_diff" ->
      """WITH old AS (SELECT o_orderkey, o_totalprice, o_orderstatus
                      FROM orders),
         neu AS (SELECT o_orderkey,
                        CASE WHEN o_orderkey % 7 = 0
                             THEN o_totalprice + 1.0::DOUBLE
                             ELSE o_totalprice END AS o_totalprice,
                        o_orderstatus
                 FROM orders WHERE o_orderkey % 13 <> 0
                 UNION ALL
                 SELECT o_orderkey + 1000000000, o_totalprice, o_orderstatus
                 FROM orders WHERE o_orderkey % 101 = 3),
         j AS (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
                      o.o_orderkey IS NOT NULL AS in_old,
                      n.o_orderkey IS NOT NULL AS in_new,
                      (o.o_totalprice IS DISTINCT FROM n.o_totalprice
                       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
                        AS chg,
                      o.o_totalprice IS DISTINCT FROM n.o_totalprice AS chg_p,
                      o.o_orderstatus IS DISTINCT FROM n.o_orderstatus AS chg_s
               FROM old o FULL OUTER JOIN neu n
                 ON o.o_orderkey = n.o_orderkey)
        SELECT CASE WHEN NOT in_old THEN 'added'
                    WHEN NOT in_new THEN 'removed'
                    WHEN chg THEN 'changed' ELSE 'unchanged' END AS metric,
               count(*)::BIGINT AS n
        FROM j GROUP BY 1
        UNION ALL
        SELECT 'changed:o_totalprice', sum(CASE WHEN chg_p THEN 1 ELSE 0 END)::BIGINT
        FROM j WHERE in_old AND in_new
        UNION ALL
        SELECT 'changed:o_orderstatus', sum(CASE WHEN chg_s THEN 1 ELSE 0 END)::BIGINT
        FROM j WHERE in_old AND in_new""",
    "dq_skew_report" -> OracleFragments.dqSkewReport(
      Seq("l_orderkey", "l_partkey", "l_suppkey")),
    "stats_bootstrap" -> OracleFragments.statsBootstrap(b = 32, salt = "boot"),
    "stats_psi" -> OracleFragments.statsPsi(nBins = 10),
    "corpus_quantile_norm" ->
      """WITH rows0 AS (SELECT l_returnflag AS g,
                               round(l_quantity::DOUBLE, 6) AS v
                        FROM lineitem WHERE l_quantity IS NOT NULL),
         gh AS (SELECT g, v, count(*)::BIGINT AS cnt FROM rows0 GROUP BY 1, 2),
         gg AS (SELECT g, v, cnt,
                       coalesce(sum(cnt) OVER (PARTITION BY g ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0)::BIGINT AS c0,
                       (sum(cnt) OVER (PARTITION BY g))::BIGINT AS ng
                FROM gh),
         ph AS (SELECT v AS pv, count(*)::BIGINT AS pcnt FROM rows0 GROUP BY 1),
         p AS (SELECT pv, (sum(pcnt) OVER (ORDER BY pv
                 ROWS UNBOUNDED PRECEDING))::BIGINT AS pc FROM ph),
         t AS (SELECT count(*)::BIGINT AS nn FROM rows0)
        SELECT gg.g AS l_returnflag, gg.v AS l_quantity, gg.cnt AS n,
               min(p.pv) AS v_norm
        FROM gg CROSS JOIN t JOIN p
          ON 2::HUGEINT * p.pc * gg.ng >= t.nn::HUGEINT * (2 * gg.c0 + gg.cnt + 1)
        GROUP BY 1, 2, 3""",
    "stats_mannwhitney" ->
      """WITH c AS (SELECT round(l_extendedprice::DOUBLE, 6) AS v,
                sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS ca,
                sum(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS cb,
                count(*)::BIGINT AS t
              FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
         r AS (SELECT ca, cb, t,
                 2 * coalesce(sum(t) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
               FROM c),
         g AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb,
                      sum(ca::DECIMAL(38,0) * r2) AS r2a,
                      sum(t::DECIMAL(38,0) * t * t - t) AS ties
               FROM r)
        SELECT na, nb,
               (r2a - na::DECIMAL(38,0) * (na + 1))::DOUBLE / 2.0::DOUBLE AS u_a,
               round(((r2a - na::DECIMAL(38,0) * (na + 1))::DOUBLE / 2.0::DOUBLE
                      - na::DOUBLE * nb::DOUBLE / 2.0::DOUBLE)
                     / sqrt(na::DOUBLE * nb::DOUBLE
                            * ((na + nb + 1)::DOUBLE
                               - ties::DOUBLE
                                 / ((na + nb)::DOUBLE * (na + nb - 1)::DOUBLE))
                            / 12.0::DOUBLE), 6) AS z
        FROM g""",
    "stats_ab_ttest" ->
      """WITH a AS (
           SELECT event_type,
                  sum(CASE WHEN user_id % 2 <> 1 THEN 1 ELSE 0 END)::BIGINT AS n0,
                  sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
                  sum((CASE WHEN user_id % 2 <> 1 THEN round("value", 6) END)
                      ::DECIMAL(28,6))::DOUBLE AS s0,
                  sum((CASE WHEN user_id % 2 <> 1
                       THEN round("value", 6) * round("value", 6) END)
                      ::DECIMAL(38,12))::DOUBLE AS q0,
                  sum((CASE WHEN user_id % 2 = 1 THEN round("value", 6) END)
                      ::DECIMAL(28,6))::DOUBLE AS s1,
                  sum((CASE WHEN user_id % 2 = 1
                       THEN round("value", 6) * round("value", 6) END)
                      ::DECIMAL(38,12))::DOUBLE AS q1
           FROM events GROUP BY 1),
         v AS (
           SELECT event_type, n0, n1, s0, s1,
                  (q0 - s0 * s0 / n0) / (n0 - 1) AS v0,
                  (q1 - s1 * s1 / n1) / (n1 - 1) AS v1
           FROM a),
         w AS (
           SELECT event_type, n0, n1, s0, s1, v0, v1,
                  v0 / n0 + v1 / n1 AS se2
           FROM v)
         SELECT event_type, n0, n1,
                round(s1 / n1 - s0 / n0, 6) AS lift,
                CASE WHEN n0 > 1 AND n1 > 1 AND se2 > 0
                     THEN round((s1 / n1 - s0 / n0) / sqrt(se2), 4) END AS t_stat,
                CASE WHEN n0 > 1 AND n1 > 1 AND se2 > 0
                     THEN round((se2 * se2) /
                          ((v0 / n0) * (v0 / n0) / (n0 - 1)
                           + (v1 / n1) * (v1 / n1) / (n1 - 1)), 2) END AS df_welch
         FROM w""",
    "stats_anova" ->
      """WITH per AS (
           SELECT event_type AS g, count(*)::BIGINT AS ng,
                  sum(round("value", 6)::DECIMAL(28,6)) AS sg,
                  sum((round("value", 6) * round("value", 6))
                      ::DECIMAL(38,12)) AS qg
           FROM events GROUP BY 1),
         terms AS (
           SELECT ng, qg, sg,
                  round(sg::DOUBLE * sg::DOUBLE / ng, 6)::DECIMAL(28,6) AS tg
           FROM per),
         a AS (
           SELECT count(*)::BIGINT AS k, sum(ng)::BIGINT AS n,
                  sum(sg)::DOUBLE AS s, sum(qg)::DOUBLE AS q,
                  sum(tg)::DOUBLE AS t
           FROM terms)
         SELECT k AS n_groups, n,
                round(t - s * s / n, 4) AS ss_between,
                round(q - t, 4) AS ss_within,
                (k - 1)::BIGINT AS df1, (n - k)::BIGINT AS df2,
                CASE WHEN k > 1 AND n > k AND q - t > 0
                     THEN round(((t - s * s / n) / (k - 1))
                                / ((q - t) / (n - k)), 4) END AS f_stat
         FROM a""",
    "stats_permutation" ->
      """WITH base AS (
           SELECT event_id::VARCHAR AS rk, (user_id % 2 = 1) AS b0,
                  round("value", 6) AS vr
           FROM events),
         obs AS (
           SELECT round(
                    sum(CASE WHEN b0 THEN vr END::DECIMAL(28,6))::DOUBLE
                      / sum(CASE WHEN b0 THEN 1 ELSE 0 END)
                    - sum(CASE WHEN NOT b0 THEN vr END::DECIMAL(28,6))::DOUBLE
                      / sum(CASE WHEN NOT b0 THEN 1 ELSE 0 END), 6) AS t_obs
           FROM base),
         coins AS (
           SELECT p, vr, ((h >> p) & 1 = 1) AS b
           FROM (SELECT vr,
                   ('0x' || substr(md5('perm:' || rk), 1, 15))::BIGINT AS h
                 FROM base)
           CROSS JOIN generate_series(0, 31) AS t(p)),
         perms AS (
           SELECT p, round(
                    sum(CASE WHEN b THEN vr END::DECIMAL(28,6))::DOUBLE
                      / sum(CASE WHEN b THEN 1 ELSE 0 END)
                    - sum(CASE WHEN NOT b THEN vr END::DECIMAL(28,6))::DOUBLE
                      / sum(CASE WHEN NOT b THEN 1 ELSE 0 END), 6) AS t_p
           FROM coins GROUP BY p)
         SELECT t_obs, count(*)::BIGINT AS n_perms,
                sum(CASE WHEN abs(t_p) >= abs(t_obs) THEN 1 ELSE 0 END)
                  ::BIGINT AS n_ge,
                round((sum(CASE WHEN abs(t_p) >= abs(t_obs) THEN 1 ELSE 0 END)
                       + 1)::DOUBLE / (count(*) + 1), 6) AS p_value
         FROM perms, obs WHERE t_p IS NOT NULL GROUP BY t_obs""",
    "dq_kanonymity" ->
      """WITH cls AS (
           SELECT lang, source, (n_chars // 100)::BIGINT AS len_bucket,
                  count(*)::BIGINT AS class_size
           FROM documents GROUP BY 1, 2, 3),
         hist AS (
           SELECT class_size, count(*)::BIGINT AS n_classes
           FROM cls GROUP BY 1),
         t AS (SELECT k, class_size, n_classes
               FROM hist CROSS JOIN (VALUES (2), (5), (10)) AS th(k))
         SELECT k::INT AS k, sum(n_classes)::BIGINT AS n_classes,
                sum(class_size * n_classes)::BIGINT AS n_rows,
                min(class_size)::BIGINT AS min_class_size,
                sum(CASE WHEN class_size < k THEN n_classes ELSE 0 END)
                  ::BIGINT AS at_risk_classes,
                sum(CASE WHEN class_size < k
                    THEN class_size * n_classes ELSE 0 END)
                  ::BIGINT AS at_risk_rows
         FROM t GROUP BY 1""",
    "dq_ldiversity" ->
      """WITH l1 AS (
           SELECT source, (n_chars // 100)::BIGINT AS len_bucket, lang,
                  count(*)::BIGINT AS nrows
           FROM documents GROUP BY 1, 2, 3),
         cls AS (
           SELECT source, len_bucket, count(*)::BIGINT AS diversity,
                  sum(nrows)::BIGINT AS class_size
           FROM l1 GROUP BY 1, 2),
         hist AS (
           SELECT diversity, count(*)::BIGINT AS n_classes,
                  sum(class_size)::BIGINT AS n_rows
           FROM cls GROUP BY 1),
         t AS (SELECT l, diversity, n_classes, n_rows
               FROM hist CROSS JOIN (VALUES (2), (3)) AS th(l))
         SELECT l::INT AS l, sum(n_classes)::BIGINT AS n_classes,
                sum(n_rows)::BIGINT AS n_rows,
                min(diversity)::BIGINT AS min_diversity,
                sum(CASE WHEN diversity < l THEN n_classes ELSE 0 END)
                  ::BIGINT AS at_risk_classes,
                sum(CASE WHEN diversity < l THEN n_rows ELSE 0 END)
                  ::BIGINT AS at_risk_rows
         FROM t GROUP BY 1""",
    "stats_levene" ->
      """WITH b AS (
           SELECT event_type AS g, round("value", 6) AS v0 FROM events),
         m AS (
           SELECT g, round(sum(v0::DECIMAL(28,6))::DOUBLE / count(*), 6)
                    AS gmean
           FROM b GROUP BY 1),
         zt AS (SELECT b.g, round(abs(b.v0 - m.gmean), 6) AS vr
                FROM b JOIN m USING (g)),
         per AS (
           SELECT g, count(*)::BIGINT AS ng,
                  sum(vr::DECIMAL(28,6)) AS sg,
                  sum((vr * vr)::DECIMAL(38,12)) AS qg
           FROM zt GROUP BY 1),
         terms AS (
           SELECT ng, qg, sg,
                  round(sg::DOUBLE * sg::DOUBLE / ng, 6)::DECIMAL(28,6) AS tg
           FROM per),
         a AS (
           SELECT count(*)::BIGINT AS k, sum(ng)::BIGINT AS n,
                  sum(sg)::DOUBLE AS s, sum(qg)::DOUBLE AS q,
                  sum(tg)::DOUBLE AS t
           FROM terms)
         SELECT k AS n_groups, n,
                round(t - s * s / n, 4) AS ss_between,
                round(q - t, 4) AS ss_within,
                (k - 1)::BIGINT AS df1, (n - k)::BIGINT AS df2,
                CASE WHEN k > 1 AND n > k AND q - t > 0
                     THEN round(((t - s * s / n) / (k - 1))
                                / ((q - t) / (n - k)), 4) END AS f_stat
         FROM a""",
    "stats_winsorize" ->
      """WITH f AS (
           SELECT event_type,
                  quantile_cont("value", 0.05) AS lo,
                  quantile_cont("value", 0.95) AS hi
           FROM events GROUP BY 1)
         SELECT e.event_type, count(*) AS n,
                sum(CASE WHEN "value" < lo THEN 1 ELSE 0 END)::BIGINT AS n_clip_lo,
                sum(CASE WHEN "value" > hi THEN 1 ELSE 0 END)::BIGINT AS n_clip_hi,
                round(sum(round(least(greatest("value", lo), hi), 6)
                          ::DECIMAL(28,6))::DOUBLE / count(*), 6) AS winsorized_mean,
                round(any_value(lo), 4) AS lo, round(any_value(hi), 4) AS hi
         FROM events e JOIN f USING (event_type)
         GROUP BY 1""",
    "vocab_oov" -> {
      val toks = OracleFragments.toks
      s"""WITH tok AS (SELECT source, unnest($toks) AS token FROM documents),
            vocab AS (SELECT token FROM (
                SELECT token, count(*) AS cnt FROM tok GROUP BY 1)
              ORDER BY cnt DESC, token ASC LIMIT 500)
          SELECT t0.source, count(*) AS n_tokens,
                 sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
                 round(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::DOUBLE
                       / count(*)::DOUBLE, 6) AS oov_rate
          FROM tok t0 LEFT JOIN vocab v ON t0.token = v.token
          GROUP BY 1"""
    },
    "dq_constraints" ->
      """WITH v AS (
           SELECT 'not_null(l_orderkey)' AS c,
                  sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n
           FROM lineitem
           UNION ALL
           SELECT 'in_range(l_quantity,1.0,49.0)',
                  sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1.0
                            OR l_quantity > 49.0 THEN 1 ELSE 0 END)::BIGINT
           FROM lineitem
           UNION ALL
           SELECT 'accepted_values(l_returnflag)',
                  sum(CASE WHEN l_returnflag IS NULL
                            OR l_returnflag NOT IN ('A','N','R')
                           THEN 1 ELSE 0 END)::BIGINT
           FROM lineitem
           UNION ALL
           SELECT 'unique(l_orderkey,l_linenumber)',
                  (count(*) - count(DISTINCT (l_orderkey, l_linenumber)))::BIGINT
           FROM lineitem
           UNION ALL
           SELECT 'ref_integrity(l_partkey)',
                  (SELECT count(*) FROM
                    (SELECT l_partkey FROM lineitem WHERE l_partkey IS NOT NULL) l
                    ANTI JOIN part p ON l.l_partkey = p.p_partkey)::BIGINT
           UNION ALL
           SELECT 'ref_integrity(l_orderkey)',
                  (SELECT count(*) FROM
                    (SELECT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL) l
                    ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey)::BIGINT)
         SELECT c AS "constraint", n AS n_violations, n = 0 AS ok FROM v""",
    "dedup_incremental" -> {
      val norm = OracleFragments.norm
      s"""WITH h AS (SELECT DISTINCT md5($norm) AS fp FROM documents
                     WHERE doc_id % 3 = 0),
            b AS (SELECT doc_id, md5($norm) AS fp FROM documents
                  WHERE doc_id % 3 <> 0)
          SELECT b.fp, min(b.doc_id) AS keep_id, count(*) AS n_batch
          FROM b ANTI JOIN h ON b.fp = h.fp
          GROUP BY 1"""
    },
    // identical oracle to dedup_incremental: the persisted-index path
    // must be value-identical to the in-memory history path
    "dedup_index_persisted" -> {
      val norm = OracleFragments.norm
      s"""WITH h AS (SELECT DISTINCT md5($norm) AS fp FROM documents
                     WHERE doc_id % 3 = 0),
            b AS (SELECT doc_id, md5($norm) AS fp FROM documents
                  WHERE doc_id % 3 <> 0)
          SELECT b.fp, min(b.doc_id) AS keep_id, count(*) AS n_batch
          FROM b ANTI JOIN h ON b.fp = h.fp
          GROUP BY 1"""
    },
    // compaction is invisible to answers: same anti-join semantics as
    // dedup_index_persisted, so the same oracle
    "dedup_index_compacted" -> {
      val norm = OracleFragments.norm
      s"""WITH h AS (SELECT DISTINCT md5($norm) AS fp FROM documents
                     WHERE doc_id % 3 = 0),
            b AS (SELECT doc_id, md5($norm) AS fp FROM documents
                  WHERE doc_id % 3 <> 0)
          SELECT b.fp, min(b.doc_id) AS keep_id, count(*) AS n_batch
          FROM b ANTI JOIN h ON b.fp = h.fp
          GROUP BY 1"""
    },
    // per-batch first-seen collapse: a fp's delta row lands in the
    // FIRST doc_id%3 micro-batch containing it, keyed stats within
    // that batch — the replay driver's durable delta log re-derived
    "dedup_stream_replay" -> {
      val norm = OracleFragments.norm
      s"""WITH b AS (SELECT doc_id, doc_id % 3 AS batch_id,
                            md5($norm) AS fp
                     FROM documents),
            fb AS (SELECT fp, min(batch_id) AS batch_id FROM b GROUP BY 1)
          SELECT b.fp, min(b.doc_id) AS keep_id, count(*) AS n_batch,
                 fb.batch_id
          FROM b JOIN fb ON b.fp = fb.fp AND b.batch_id = fb.batch_id
          GROUP BY b.fp, fb.batch_id"""
    },
    // bipartite batch×history LSH-Jaccard (the decontaminateFuzzy
    // fragment with the history split as the bench side) unioned with
    // the within-batch pairs — the persisted band index must be
    // value-identical to re-deriving both joins from text
    "dedup_lsh_index_persisted" ->
      s"""SELECT doc_id AS a, b, jaccard FROM (
            ${OracleFragments.decontaminateFuzzy(4, 4, 0.20,
              corpusSrc = "(SELECT * FROM documents WHERE doc_id % 3 <> 0)",
              benchWhere = "doc_id % 3 = 0", rightName = "b")})
          UNION ALL
          SELECT a, b, jaccard FROM (
            ${OracleFragments.dedupLshJaccard(4, 4, 0.20,
              src = "(SELECT * FROM documents WHERE doc_id % 3 <> 0)")})""",
    "dedup_incremental_bloom" -> {
      val norm = OracleFragments.norm
      s"""WITH h AS (SELECT DISTINCT md5($norm) AS fp FROM documents
                     WHERE doc_id % 3 = 1),
            b AS (SELECT doc_id, md5($norm) AS fp FROM documents
                  WHERE doc_id % 3 <> 1)
          SELECT b.fp, min(b.doc_id) AS keep_id, count(*) AS n_batch
          FROM b ANTI JOIN h ON b.fp = h.fp
          GROUP BY 1"""
    },
    "dedup_rate_report" -> {
      val norm = OracleFragments.norm
      s"""SELECT source, count(*) AS n_docs,
                 count(DISTINCT md5($norm)) AS n_unique,
                 round(1.0::DOUBLE - count(DISTINCT md5($norm))::DOUBLE
                       / count(*)::DOUBLE, 6) AS dup_frac
          FROM documents GROUP BY 1"""
    },
    "ev_sliding_topk" ->
      """WITH w AS (
           SELECT (epoch_ms(ts) // 300000 - o.k) * 300000 AS ws, event_type
           FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) o),
         c AS (SELECT ws, event_type, count(*) AS n FROM w GROUP BY 1, 2)
         SELECT ws AS window_start_ms, ws + 600000 AS window_end_ms,
                event_type, n, rank::INT AS rank
         FROM (SELECT ws, event_type, n,
                      row_number() OVER (PARTITION BY ws
                        ORDER BY n DESC, event_type ASC) AS rank
               FROM c)
         WHERE rank <= 2""",
    "cdc_merge" ->
      """WITH t AS (
           SELECT user_id, event_type AS state, "value", epoch_ms(ts) AS last_ms
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                          ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE event_id % 2 = 0 AND user_id % 4 <> 0)
           WHERE rn = 1),
         w AS (
           SELECT user_id AS wk,
                  CASE WHEN event_type = 'purchase' THEN 'D' ELSE 'U' END AS op,
                  event_type AS wstate, "value" AS wvalue,
                  epoch_ms(ts) AS wlast_ms
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                          ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE event_id % 2 = 1 AND user_id % 4 <> 1)
           WHERE rn = 1)
         SELECT coalesce(t.user_id, w.wk) AS user_id,
                CASE WHEN w.op = 'U' THEN w.wstate ELSE t.state END AS state,
                CASE WHEN w.op = 'U' THEN w.wvalue ELSE t."value" END AS "value",
                CASE WHEN w.op = 'U' THEN w.wlast_ms ELSE t.last_ms END AS last_ms,
                CASE WHEN w.op IS NULL THEN 'kept'
                     WHEN t.user_id IS NULL THEN 'inserted'
                     ELSE 'updated' END AS action
         FROM t FULL OUTER JOIN w ON t.user_id = w.wk
         WHERE w.op IS NULL OR w.op <> 'D'""",
    "dq_entropy" ->
      """WITH m AS (SELECT 'lang' AS colname, lang AS v FROM documents
                    UNION ALL SELECT 'source', source FROM documents
                    UNION ALL SELECT 'len_bucket', (n_chars // 500)::VARCHAR
                              FROM documents),
         c AS (SELECT colname, v, count(*) AS cnt FROM m GROUP BY 1, 2),
         n AS (SELECT colname, sum(cnt)::BIGINT AS n FROM c GROUP BY 1),
         t AS (SELECT c.colname, n.n,
                      round((cnt::DOUBLE / n::DOUBLE)
                            * ln(cnt::DOUBLE / n::DOUBLE), 9)::DECIMAL(28,12)
                        AS term
               FROM c JOIN n ON c.colname = n.colname)
         SELECT colname AS "column", max(n) AS n_rows, count(*) AS n_distinct,
                round((-sum(term))::DOUBLE, 6) AS entropy,
                CASE WHEN count(*) > 1
                     THEN round((-sum(term))::DOUBLE
                                / ln(count(*)::DOUBLE), 6) END AS entropy_norm
         FROM t GROUP BY 1""",
    "dq_mutual_info" ->
      """WITH j AS (SELECT l_returnflag AS x, l_linestatus AS y,
                           count(*) AS cxy
                    FROM lineitem GROUP BY 1, 2),
         mx AS (SELECT x, sum(cxy)::BIGINT AS cx FROM j GROUP BY 1),
         my AS (SELECT y, sum(cxy)::BIGINT AS cy FROM j GROUP BY 1),
         tt AS (SELECT sum(cxy)::BIGINT AS n FROM j)
         SELECT max(n) AS n,
                round(sum(round((cxy::DOUBLE / n::DOUBLE)
                      * ln(n::DOUBLE * cxy::DOUBLE
                           / (cx::DOUBLE * cy::DOUBLE)), 9)::DECIMAL(28,12)
                  )::DOUBLE, 6) AS mi,
                round((-sum(round((cxy::DOUBLE / n::DOUBLE)
                      * ln(cxy::DOUBLE / n::DOUBLE), 9)::DECIMAL(28,12))
                  )::DOUBLE, 6) AS h_joint
         FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tt""",
    "ev_changepoint" ->
      """WITH c AS (SELECT event_type, date_trunc('hour', ts) AS b,
                           count(*) AS cnt
                    FROM events GROUP BY 1, 2),
         s AS (SELECT event_type, min(b) AS b0, max(b) AS b1 FROM c GROUP BY 1),
         g AS (SELECT event_type,
                      unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS b
               FROM s),
         d AS (SELECT g.event_type, g.b, coalesce(c.cnt, 0)::BIGINT AS cnt
               FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.b = c.b),
         cu AS (SELECT event_type, b, cnt,
                       row_number() OVER (PARTITION BY event_type
                         ORDER BY b) AS k,
                       sum(cnt) OVER (PARTITION BY event_type ORDER BY b
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS c
                FROM d),
         t AS (SELECT event_type, max(k) AS m, max(c) AS tot FROM cu GROUP BY 1),
         sc AS (SELECT cu.event_type, m, tot, k, b, c,
                       ((c * m - k * tot)::HUGEINT
                         * (c * m - k * tot)::HUGEINT)::DOUBLE
                         / (k * (m - k) * m)::DOUBLE AS gs
                FROM cu JOIN t ON cu.event_type = t.event_type
                WHERE k < m)
         SELECT event_type, m AS n_buckets, k AS split_k,
                epoch_ms(b) AS split_bucket_ms,
                round(gs, 6) AS g_stat,
                round(c::DOUBLE / k::DOUBLE, 6) AS mean_before,
                round((tot - c)::DOUBLE / (m - k)::DOUBLE, 6) AS mean_after
         FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                        ORDER BY gs DESC, k ASC) AS rn FROM sc)
         WHERE rn = 1""",
    "ev_latency_bands" ->
      """SELECT event_type,
                epoch_ms(date_trunc('hour', ts)) AS bar_start_ms,
                count(*)::BIGINT AS n,
                round(quantile_cont("value", 0.5), 6) AS p50,
                round(quantile_cont("value", 0.9), 6) AS p90,
                round(quantile_cont("value", 0.99), 6) AS p99
         FROM events GROUP BY 1, 2""",
    "ev_cusum" ->
      """WITH c AS (SELECT event_type, date_trunc('hour', ts) AS b,
                           count(*) AS cnt
                    FROM events GROUP BY 1, 2),
         s AS (SELECT event_type, min(b) AS b0, max(b) AS b1 FROM c GROUP BY 1),
         g AS (SELECT event_type,
                      unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS b
               FROM s),
         d0 AS (SELECT g.event_type, g.b, coalesce(c.cnt, 0)::BIGINT AS cnt
                FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.b = c.b),
         cu AS (SELECT event_type, b, cnt,
                       row_number() OVER (PARTITION BY event_type
                         ORDER BY b) AS k,
                       sum(cnt) OVER (PARTITION BY event_type ORDER BY b
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS c
                FROM d0),
         t AS (SELECT event_type, max(k) AS m, max(c) AS tot FROM cu GROUP BY 1),
         dv AS (SELECT cu.event_type, b, k, m, tot,
                       (c * m - k * tot)::HUGEINT AS d
                FROM cu JOIN t ON cu.event_type = t.event_type),
         ud AS (SELECT event_type, b, k, m, tot,
                       d - min(d) OVER (PARTITION BY event_type ORDER BY b
                         ROWS UNBOUNDED PRECEDING) AS up,
                       max(d) OVER (PARTITION BY event_type ORDER BY b
                         ROWS UNBOUNDED PRECEDING) - d AS dn
                FROM dv),
         pu AS (SELECT event_type, b, up FROM (
                  SELECT event_type, b, up,
                         row_number() OVER (PARTITION BY event_type
                           ORDER BY up DESC, k ASC) AS rn
                  FROM ud) WHERE rn = 1),
         pd AS (SELECT event_type, b, dn FROM (
                  SELECT event_type, b, dn,
                         row_number() OVER (PARTITION BY event_type
                           ORDER BY dn DESC, k ASC) AS rn
                  FROM ud) WHERE rn = 1)
        SELECT u.event_type, max(u.m)::BIGINT AS n_buckets,
               max(u.tot)::BIGINT AS total,
               round(max(pu.up)::DOUBLE / max(u.m)::DOUBLE, 6) AS cusum_up,
               epoch_ms(max(pu.b)) AS up_peak_ms,
               round(max(pd.dn)::DOUBLE / max(u.m)::DOUBLE, 6) AS cusum_down,
               epoch_ms(max(pd.b)) AS down_peak_ms
        FROM ud u
        JOIN pu ON u.event_type = pu.event_type
        JOIN pd ON u.event_type = pd.event_type
        GROUP BY 1""",
    "graph_toposort" -> OracleFragments.graphTopoLayers(rounds = 8),
    "emb_dbscan" -> OracleFragments.embDbscan(threshold = 0.25, minPts = 4),
    "dq_benford" -> OracleFragments.dqBenford(
      Seq("l_extendedprice", "l_quantity", "l_partkey")),
    "ev_merge_intervals" ->
      """WITH iv AS (SELECT user_id, epoch_ms(ts) AS s,
                            epoch_ms(ts) + 1800000 AS e
                     FROM events WHERE event_type IN ('view', 'click')),
         x AS (SELECT user_id, s, e,
                      max(e) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS pmax
               FROM iv),
         y AS (SELECT user_id, s, e,
                      sum(CASE WHEN pmax IS NULL OR s > pmax
                               THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY s, e
                              ROWS UNBOUNDED PRECEDING)::BIGINT AS island
               FROM x)
         SELECT user_id, min(s) AS island_start, max(e) AS island_end,
                count(*) AS n_merged
         FROM y GROUP BY user_id, island""",
    "graph_coloring" -> OracleFragments.graphColoring(rounds = 8),
    "text_readability" -> OracleFragments.textReadability,
    "text_textrank" -> OracleFragments.textTextrank(
      window = 2, minLen = 3, iters = 3, damping = 0.85, k = 30),
    "q2_min_cost" ->
      """WITH u AS (SELECT l_partkey, l_suppkey,
                           l_extendedprice / l_quantity AS unit
                    FROM lineitem),
            m AS (SELECT l_partkey, min(unit) AS mu FROM u GROUP BY 1)
         SELECT DISTINCT u.l_partkey, s.s_name, n.n_name,
                round(u.unit, 6) AS unit_price
         FROM u JOIN m ON u.l_partkey = m.l_partkey AND u.unit = m.mu
         JOIN supplier s ON u.l_suppkey = s.s_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey""",
    "dq_drift" -> OracleFragments.dqDrift(
      Seq("l_quantity", "l_extendedprice", "l_discount"), Seq("l_returnflag")),
    "corpus_budget_trim" -> OracleFragments.corpusBudgetTrim(budget = 800L),
    "corpus_domain_report" -> OracleFragments.corpusDomainReport,
    "ev_twap" ->
      """WITH s AS (SELECT user_id, epoch_ms(ts) AS ms, "value",
                           lead(epoch_ms(ts)) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS nms
                    FROM events),
         d AS (SELECT user_id, nms - ms AS dur,
                      round("value", 6)::DECIMAL(18,6) * (nms - ms) AS wv
               FROM s WHERE nms IS NOT NULL)
         SELECT user_id, count(*) AS n_intervals, sum(dur)::BIGINT AS span_ms,
                round(sum(wv)::DOUBLE / sum(dur)::DOUBLE, 6) AS twap
         FROM d GROUP BY 1""",
    "ev_ewma" -> OracleFragments.evEwma(alpha = 0.25, lastN = 16),
    "ev_holt_winters" -> OracleFragments.evHoltWinters(
      alpha = 0.3, beta = 0.1, gamma = 0.2, season = 24, window = 48,
      horizon = 3),
    "ev_holt_forecast" -> OracleFragments.evHoltForecast(
      alpha = 0.5, beta = 0.3, lastN = 8, horizon = 3),
    "ev_attribution_outer" ->
      """WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
                    FROM events WHERE event_type = 'view'),
            c AS (SELECT user_id AS c_user_id, event_id AS click_id, ts AS click_ts
                    FROM events WHERE event_type = 'click')
         SELECT v.user_id, view_id, click_id,
                epoch_ms(view_ts) AS view_ms, epoch_ms(click_ts) AS click_ms
         FROM v LEFT JOIN c ON v.user_id = c.c_user_id
          AND click_ts >= view_ts
          AND click_ts <= view_ts + INTERVAL 60 MINUTE""",
    "graph_matching" -> OracleFragments.graphMatching(rounds = 8),
    "stats_chi2" ->
      """WITH j AS (SELECT l_returnflag AS x, l_linestatus AS y,
                           count(*) AS cxy
                    FROM lineitem GROUP BY 1, 2),
         mx AS (SELECT x, sum(cxy)::BIGINT AS cx FROM j GROUP BY 1),
         my AS (SELECT y, sum(cxy)::BIGINT AS cy FROM j GROUP BY 1),
         tt AS (SELECT sum(cxy)::BIGINT AS n,
                       count(DISTINCT x)::BIGINT AS nx,
                       count(DISTINCT y)::BIGINT AS ny FROM j),
         sp AS MATERIALIZED (SELECT coalesce(j.cxy, 0)::BIGINT AS o,
                       cx::DOUBLE * cy::DOUBLE / n::DOUBLE AS e,
                       n, nx, ny
                FROM mx CROSS JOIN my CROSS JOIN tt
                LEFT JOIN j ON j.x = mx.x AND j.y = my.y)
         SELECT max(n) AS n,
                round(sum(round((o::DOUBLE - e) * (o::DOUBLE - e) / e,
                  9)::DECIMAL(28,12))::DOUBLE, 6) AS chi_sq,
                max((nx - 1) * (ny - 1)) AS dof
         FROM sp""",
    "stats_cramers_v" ->
      """WITH j AS (SELECT l_returnflag AS x, l_linestatus AS y,
                           count(*) AS cxy
                    FROM lineitem GROUP BY 1, 2),
         mx AS (SELECT x, sum(cxy)::BIGINT AS cx FROM j GROUP BY 1),
         my AS (SELECT y, sum(cxy)::BIGINT AS cy FROM j GROUP BY 1),
         tt AS (SELECT sum(cxy)::BIGINT AS n,
                       count(DISTINCT x)::BIGINT AS nx,
                       count(DISTINCT y)::BIGINT AS ny FROM j),
         sp AS MATERIALIZED (SELECT coalesce(j.cxy, 0)::BIGINT AS o,
                       cx::DOUBLE * cy::DOUBLE / n::DOUBLE AS e,
                       n, nx, ny
                FROM mx CROSS JOIN my CROSS JOIN tt
                LEFT JOIN j ON j.x = mx.x AND j.y = my.y),
         c AS (SELECT max(n) AS n,
                      round(sum(round((o::DOUBLE - e) * (o::DOUBLE - e) / e,
                        9)::DECIMAL(28,12))::DOUBLE, 6) AS chi_sq,
                      max((nx - 1) * (ny - 1)) AS dof,
                      max(least(nx - 1, ny - 1)) AS mind
               FROM sp)
         SELECT n, chi_sq, dof,
                CASE WHEN mind > 0
                     THEN round(sqrt(chi_sq / (n * mind)::DOUBLE), 6)
                END AS cramers_v
         FROM c""",
    "emb_centroids" ->
      """WITH x AS (SELECT label, u.dim AS dim, u.v AS v FROM (
             SELECT label,
                    unnest(list_transform(generate_series(1, len(embedding)),
                      i -> {'dim': i - 1, 'v': embedding[i]})) AS u
             FROM embeddings)),
         r AS (SELECT label, dim::INT AS dim, round(v::DOUBLE, 6) AS vr
               FROM x)
         SELECT label, dim, count(*) AS n,
                round(sum(vr::DECIMAL(28,6))::DOUBLE
                      / count(*)::DOUBLE, 6) AS mean,
                round((sum((vr * vr)::DECIMAL(38,12))::DOUBLE
                       - sum(vr::DECIMAL(28,6))::DOUBLE
                         * sum(vr::DECIMAL(28,6))::DOUBLE
                         / count(*)::DOUBLE)
                      / count(*)::DOUBLE, 6) AS var_pop
         FROM r GROUP BY 1, 2""",
    "dedup_incremental_fuzzy" -> OracleFragments.decontaminateFuzzy(
      bands = 4, rowsPerBand = 4, minJaccard = 0.5,
      corpusSrc = "(SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0) corp",
      benchWhere = "doc_id % 3 = 0", rightName = "hist_id"),
    "emb_nearest_centroid" -> OracleFragments.embNearestCentroid,
    "emb_confusion" ->
      s"""WITH nc AS (${OracleFragments.embNearestCentroid})
        SELECT true_label, assigned_label, count(*)::BIGINT AS n
        FROM nc GROUP BY 1, 2""",
    "stats_cohens_kappa" -> OracleFragments.statsCohensKappa,
    "stats_spearman" ->
      """WITH rows0 AS (SELECT round(l_quantity::DOUBLE, 6) AS vx,
                               round(l_extendedprice::DOUBLE, 6) AS vy
                        FROM lineitem
                        WHERE l_quantity IS NOT NULL
                          AND l_extendedprice IS NOT NULL),
         joint AS (SELECT vx, vy, count(*)::BIGINT AS c
                   FROM rows0 GROUP BY 1, 2),
         hx AS (SELECT vx AS v, sum(c)::BIGINT AS t FROM joint GROUP BY 1),
         rx AS (SELECT v, 2 * coalesce(sum(t) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + t + 1 AS r2x FROM hx),
         hy AS (SELECT vy AS v, sum(c)::BIGINT AS t FROM joint GROUP BY 1),
         ry AS (SELECT v, 2 * coalesce(sum(t) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + t + 1 AS r2y FROM hy),
         j AS (SELECT c, r2x, r2y
               FROM joint JOIN rx ON joint.vx = rx.v
                          JOIN ry ON joint.vy = ry.v),
         g AS (SELECT sum(c)::BIGINT AS n,
                      sum(c::HUGEINT * r2x) AS sx,
                      sum(c::HUGEINT * r2y) AS sy,
                      sum(c::HUGEINT * r2x * r2x) AS sxx,
                      sum(c::HUGEINT * r2y * r2y) AS syy,
                      sum(c::HUGEINT * r2x * r2y) AS sxy FROM j)
        SELECT n, CASE WHEN (n::HUGEINT * sxx - sx * sx) > 0
                        AND (n::HUGEINT * syy - sy * sy) > 0 THEN
                 round((n::HUGEINT * sxy - sx * sy)::DOUBLE
                   / sqrt((n::HUGEINT * sxx - sx * sx)::DOUBLE
                        * (n::HUGEINT * syy - sy * sy)::DOUBLE), 6)
               END AS rho
        FROM g""",
    "stats_wasserstein" ->
      """WITH c AS (SELECT round(l_extendedprice::DOUBLE * 1000000.0::DOUBLE,
                                 0)::BIGINT AS vu,
                sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS ca,
                sum(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS cb
              FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
         cu AS (SELECT vu,
                (sum(ca) OVER w)::BIGINT AS cuma,
                (sum(cb) OVER w)::BIGINT AS cumb,
                lead(vu) OVER (ORDER BY vu) AS nextv
              FROM c WINDOW w AS (ORDER BY vu ROWS UNBOUNDED PRECEDING)),
         t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM c),
         s AS (SELECT sum(abs(cuma::HUGEINT * (SELECT nb FROM t)
                            - cumb::HUGEINT * (SELECT na FROM t))
                          * (nextv - vu)::HUGEINT) AS tsum
               FROM cu WHERE nextv IS NOT NULL)
        SELECT (SELECT na FROM t) AS na, (SELECT nb FROM t) AS nb,
               CASE WHEN (SELECT na FROM t) > 0 AND (SELECT nb FROM t) > 0
               THEN round(coalesce((SELECT tsum FROM s), 0)::DOUBLE
                 / ((SELECT na FROM t)::HUGEINT * (SELECT nb FROM t))::DOUBLE
                 / 1000000.0::DOUBLE, 6) END AS w1""",
    "stats_jsd" ->
      """WITH c AS (SELECT event_type AS k,
                sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS ca,
                sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS cb
              FROM events
              WHERE event_type IS NOT NULL AND user_id IS NOT NULL
              GROUP BY 1),
         t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM c),
         per AS (SELECT
                (CASE WHEN ca > 0 AND t.nb > 0 THEN
                   round((ca::DOUBLE / t.na::DOUBLE)
                     * ln((2::HUGEINT * ca * t.nb)::DOUBLE
                        / (ca::HUGEINT * t.nb + cb::HUGEINT * t.na)::DOUBLE), 9)
                 ELSE 0 END)::DECIMAL(28,12) AS tp,
                (CASE WHEN cb > 0 AND t.na > 0 THEN
                   round((cb::DOUBLE / t.nb::DOUBLE)
                     * ln((2::HUGEINT * cb * t.na)::DOUBLE
                        / (ca::HUGEINT * t.nb + cb::HUGEINT * t.na)::DOUBLE), 9)
                 ELSE 0 END)::DECIMAL(28,12) AS tq
              FROM c CROSS JOIN t)
        SELECT (SELECT na FROM t) AS na, (SELECT nb FROM t) AS nb,
               (SELECT count(*) FROM c)::BIGINT AS n_keys,
               round((sum(tp) + sum(tq))::DOUBLE / 2.0::DOUBLE, 6) AS jsd_nats
        FROM per""",
    "stats_kaplan_meier" ->
      """WITH h AS (SELECT round(value::DOUBLE, 6) AS t,
                sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
                  AS d_events,
                sum(CASE WHEN event_type = 'click' THEN 0 ELSE 1 END)::BIGINT
                  AS c_censored
              FROM events
              WHERE value IS NOT NULL AND event_type IS NOT NULL
              GROUP BY 1),
         tot AS (SELECT sum(d_events + c_censored)::BIGINT AS n_total FROM h),
         r AS (SELECT t, d_events, c_censored,
                 (SELECT n_total FROM tot)
                   - coalesce(sum(d_events + c_censored) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0)::BIGINT AS n_risk
               FROM h),
         s AS (SELECT t, n_risk, d_events, c_censored,
                 sum((CASE WHEN d_events > 0 AND n_risk > d_events THEN
                        round(ln((n_risk - d_events)::DOUBLE / n_risk::DOUBLE), 9)
                      ELSE 0 END)::DECIMAL(28,12))
                   OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS log_s
               FROM r)
        SELECT t, n_risk, d_events, c_censored,
               CASE WHEN n_risk = d_events THEN NULL
                    ELSE round(log_s::DOUBLE, 6) END AS log_s
        FROM s WHERE d_events > 0""",
    "vocab_coverage" -> OracleFragments.vocabCoverage,
    "graph_katz" -> OracleFragments.graphKatz(alpha = 0.05, iters = 3),
    "graph_rectangles" -> OracleFragments.graphRectangles,
    "sim_hamming_topk" ->
      OracleFragments.simHammingTopK(maxQueryId = 8, m = 20, k = 5),
    "sim_kcenter" -> OracleFragments.simKCenter(k = 4),
    "retrieval_mmr" ->
      OracleFragments.retrievalMmr(lambda = 0.7, m = 20, k = 5),
    "stats_theil_u" ->
      """WITH j AS (SELECT l_returnflag AS x, l_linestatus AS y,
                           count(*) AS cxy
                    FROM lineitem GROUP BY 1, 2),
         mx AS (SELECT x, sum(cxy)::BIGINT AS cx FROM j GROUP BY 1),
         my AS (SELECT y, sum(cxy)::BIGINT AS cy FROM j GROUP BY 1),
         tt AS (SELECT sum(cxy)::BIGINT AS n FROM j),
         hx AS (SELECT (-sum(round((cx::DOUBLE / n::DOUBLE)
                   * ln(cx::DOUBLE / n::DOUBLE), 9)::DECIMAL(28,12)))::DOUBLE
                   AS hx FROM mx CROSS JOIN tt),
         hy AS (SELECT (-sum(round((cy::DOUBLE / n::DOUBLE)
                   * ln(cy::DOUBLE / n::DOUBLE), 9)::DECIMAL(28,12)))::DOUBLE
                   AS hy FROM my CROSS JOIN tt),
         mi AS (SELECT max(n) AS n,
                  (sum(round((cxy::DOUBLE / n::DOUBLE)
                     * ln(n::DOUBLE * cxy::DOUBLE
                          / (cx::DOUBLE * cy::DOUBLE)), 9)::DECIMAL(28,12))
                    )::DOUBLE AS mi_raw
                FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tt)
        SELECT n, round(mi_raw, 6) AS mi,
               round(hx, 6) AS h_x, round(hy, 6) AS h_y,
               CASE WHEN hx > 0 THEN round(mi_raw / hx, 6) END AS u_x_given_y,
               CASE WHEN hy > 0 THEN round(mi_raw / hy, 6) END AS u_y_given_x
        FROM mi CROSS JOIN hx CROSS JOIN hy""",
    "sketch_heavy_hitters" ->
      // error-contract oracle (the approxDistinctAudit pattern): the
      // exact top-k anchors the rows; the CMS bounds must BOTH hold
      """SELECT l_suppkey::BIGINT AS key, count(*)::BIGINT AS n_exact,
                true AS est_ge_exact, true AS within_bound
         FROM lineitem WHERE l_suppkey IS NOT NULL
         GROUP BY 1 ORDER BY n_exact DESC, key ASC LIMIT 20""",
    "layout_zorder_ranges" -> OracleFragments.layoutZorderRanges,
    "stats_two_proportion" ->
      """WITH r AS (SELECT (user_id % 2 = 1) AS b,
                           (event_type = 'click') AS y
                    FROM events
                    WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         g AS (SELECT
                 sum(CASE WHEN NOT b THEN 1 ELSE 0 END)::BIGINT AS n0,
                 sum(CASE WHEN NOT b AND y THEN 1 ELSE 0 END)::BIGINT AS x0,
                 sum(CASE WHEN b THEN 1 ELSE 0 END)::BIGINT AS n1,
                 sum(CASE WHEN b AND y THEN 1 ELSE 0 END)::BIGINT AS x1
               FROM r)
        SELECT n0, x0, n1, x1,
               CASE WHEN n0 > 0 THEN round(x0::DOUBLE / n0::DOUBLE, 6) END
                 AS rate0,
               CASE WHEN n1 > 0 THEN round(x1::DOUBLE / n1::DOUBLE, 6) END
                 AS rate1,
               CASE WHEN n0 > 0 AND n1 > 0 AND x0 + x1 > 0
                     AND x0 + x1 < n0 + n1 THEN
                 round((x1::DOUBLE / n1::DOUBLE - x0::DOUBLE / n0::DOUBLE)
                   / sqrt(((x0 + x1)::DOUBLE / (n0 + n1)::DOUBLE)
                     * (1.0::DOUBLE - (x0 + x1)::DOUBLE / (n0 + n1)::DOUBLE)
                     * (1.0::DOUBLE / n0::DOUBLE + 1.0::DOUBLE / n1::DOUBLE)),
                   6) END AS z
        FROM g""",
    "ev_anomaly_mad" -> OracleFragments.evAnomalyMad(threshold = 3.5),
    "sim_matryoshka_recall" ->
      OracleFragments.simMatryoshkaRecall(maxQueryId = 8, k = 5, dims = 16),
    "stats_conformal" ->
      """WITH h AS (SELECT event_type AS g, round(value::DOUBLE, 6) AS v,
                           count(*)::BIGINT AS c
                    FROM events
                    WHERE value IS NOT NULL AND event_type IS NOT NULL
                    GROUP BY 1, 2),
         ns AS (SELECT g, sum(c)::BIGINT AS n,
                       floor(((sum(c) + 1) * 9 + 9)::DOUBLE
                         / 10.0::DOUBLE)::BIGINT AS k
                FROM h GROUP BY 1),
         cum AS (SELECT g, v, (sum(c) OVER (PARTITION BY g ORDER BY v
                   ROWS UNBOUNDED PRECEDING))::BIGINT AS cum FROM h),
         q AS (SELECT cum.g, min(v) AS qhat
               FROM cum JOIN ns ON cum.g = ns.g AND cum.cum >= ns.k
               GROUP BY 1)
        SELECT ns.g AS event_type, ns.n, ns.k,
               CASE WHEN ns.k <= ns.n THEN q.qhat END AS qhat
        FROM ns LEFT JOIN q ON q.g = ns.g""",
    "sim_recall_at_k" -> OracleFragments.simRecallAtK(
      maxQueryId = 8, k = 5, cells = 8, iters = 2, nProbe = 2),
    "stats_auc" -> OracleFragments.statsAuc,
    "stats_pr_curve" -> OracleFragments.statsPrCurve,
    "stats_gains" -> OracleFragments.statsGains,
    "er_clusters" ->
      """WITH RECURSIVE k AS (
           SELECT regexp_extract(p_name, '(\S+)$', 1) || '|' || p_size::VARCHAR AS blk,
                  p_partkey AS id, p_name AS name FROM part),
         pairs AS (
           SELECT a.id AS a_id, b.id AS b_id
           FROM k a JOIN k b ON a.blk = b.blk AND a.id < b.id
           WHERE abs(length(a.name) - length(b.name)) <= 4
             AND levenshtein(a.name, b.name) <= 4),
         edges AS (SELECT a_id AS s, b_id AS d FROM pairs
                   UNION SELECT b_id AS s, a_id AS d FROM pairs),
         reach AS (
           SELECT s AS x, s AS y FROM (SELECT DISTINCT s FROM edges)
           UNION
           SELECT r.x, e.d AS y FROM reach r JOIN edges e ON r.y = e.s),
         cc AS (SELECT x AS id, min(y) AS entity FROM reach GROUP BY x)
        SELECT p.p_partkey, coalesce(cc.entity, p.p_partkey) AS entity_id
        FROM part p LEFT JOIN cc ON p.p_partkey = cc.id""",
    "stats_woe_iv" ->
      """WITH r AS (SELECT floor(o_totalprice::DOUBLE / 25000.0::DOUBLE)::BIGINT
                      AS bucket,
                    (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT
                      AS y
              FROM orders
              WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL),
         c AS (SELECT bucket, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
                      (count(*) - sum(y))::BIGINT AS n_neg
               FROM r GROUP BY 1),
         t AS (SELECT sum(n_pos)::BIGINT AS tot_pos,
                      sum(n_neg)::BIGINT AS tot_neg FROM c)
        SELECT bucket, n, n_pos, n_neg,
               CASE WHEN n_pos > 0 AND n_neg > 0
                     AND tot_pos > 0 AND tot_neg > 0 THEN
                 round(round(ln((n_pos::HUGEINT * tot_neg)::DOUBLE
                   / (n_neg::HUGEINT * tot_pos)::DOUBLE), 9), 6) END AS woe,
               CASE WHEN n_pos > 0 AND n_neg > 0
                     AND tot_pos > 0 AND tot_neg > 0 THEN
                 round((n_pos::DOUBLE / tot_pos::DOUBLE
                      - n_neg::DOUBLE / tot_neg::DOUBLE)
                   * round(ln((n_pos::HUGEINT * tot_neg)::DOUBLE
                       / (n_neg::HUGEINT * tot_pos)::DOUBLE), 9), 6)
               END AS iv_term
        FROM c CROSS JOIN t""",
    "feat_target_encoding" ->
      """WITH r AS (SELECT o_orderpriority AS category,
                    (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT
                      AS y
              FROM orders
              WHERE o_orderpriority IS NOT NULL
                AND o_orderstatus IS NOT NULL),
         c AS (SELECT category, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos
               FROM r GROUP BY 1),
         t AS (SELECT sum(n)::BIGINT AS tot_n, sum(n_pos)::BIGINT AS tot_pos
               FROM c)
        SELECT category, n, n_pos,
               round(n_pos::DOUBLE / n::DOUBLE, 6) AS raw_rate,
               round((n_pos::DOUBLE
                   + 10.0::DOUBLE * (tot_pos::DOUBLE / tot_n::DOUBLE))
                 / (n::DOUBLE + 10.0::DOUBLE), 6) AS encoded
        FROM c CROSS JOIN t""",
    "ev_acf" -> OracleFragments.evAcf(maxLag = 3),
    "quality_calibration" -> OracleFragments.qualityCalibration(minWords = 5),
    "retrieval_ndcg" ->
      OracleFragments.retrievalNdcg(maxQueryId = 8, k = 10),
  )
}

/** DuckDB SQL mirroring the extension operators' Scala expressions exactly
  * (same normalization, same md5-family hashes, same rounding). Kept as
  * generated strings so the hash seeds / band structure can't drift from
  * the Spark side. */
object OracleFragments {
  /** lower(trim(ws-collapsed)) — mirrors TextFunctions.normalizeText. */
  val norm = """lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"""
  val toks = s"string_split($norm, ' ')"

  def shingles(k: Int): String =
    s"list_distinct(list_transform(generate_series(1, greatest(length($norm)-${k - 1}, 1)), i -> substr($norm, i, $k)))"

  /** Permutation minhash mirroring graft.functions.MinHashSignature:
    * x = first 4 md5 bytes of the gram; mh_i = min (A_i*x + B_i) mod P.
    * A_i/B_i/P come from the SAME Scala constants the expression uses. */
  def minhashExpr(k: Int, i: Int): String = {
    val a = graft.functions.MinHashSignature.paramA(i)
    val b = graft.functions.MinHashSignature.paramB(i)
    val p = graft.functions.MinHashSignature.P
    s"list_aggregate(list_transform(${shinglesAll(k)}, g -> ($a * ('0x' || substr(md5(g), 1, 8))::BIGINT + $b) % $p), 'min')"
  }

  /** Non-distinct sliding shingles (min is distinct-insensitive; the
    * expression iterates raw windows). */
  def shinglesAll(k: Int): String =
    s"list_transform(generate_series(1, greatest(length($norm)-${k - 1}, 1)), i -> substr($norm, i, $k))"

  val textStats: String = {
    val punctRaw = s"len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE / greatest(length(text), 1)::DOUBLE"
    val nToks = s"len($toks)"
    val stopList = graft.functions.TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
    val stopRaw = s"len(list_filter($toks, t -> t IN ($stopList)))::DOUBLE / greatest($nToks, 1)::DOUBLE"
    s"""SELECT doc_id,
          length(text)::INT AS n_chars_actual,
          $nToks::INT AS n_tokens_ws,
          len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))::INT AS n_tokens_bpe,
          round($punctRaw, 6) AS punct_ratio,
          round($stopRaw, 6) AS stopword_ratio,
          round(list_aggregate(list_transform($toks, t -> length(t)), 'sum')::DOUBLE / greatest($nToks, 1)::DOUBLE, 6) AS avg_token_len,
          round(least(n_chars::DOUBLE / 500.0, 1.0) * 0.4
              + (1.0 - least(($punctRaw) * 5.0, 1.0)) * 0.3
              + least(($stopRaw) * 4.0, 1.0) * 0.3, 6) AS quality
        FROM documents"""
  }

  val textLangid: String = {
    val markers = graft.functions.TextFunctions.LangMarkers
    val hitExprs = markers.map { case (lang, ms) =>
      val lst = ms.map(w => s"'$w'").mkString(", ")
      s"len(list_filter($toks, t -> t IN ($lst)))::INT AS hits_$lang"
    }
    val best = "greatest(" + markers.map { case (l, _) => s"hits_$l" }.mkString(", ") + ")"
    val caseChain = markers.map { case (l, _) =>
      s"WHEN hits_$l = $best AND hits_$l > 0 THEN '$l'"
    }.mkString(" ")
    s"""SELECT doc_id, ${markers.map { case (l, _) => s"hits_$l" }.mkString(", ")},
          CASE $caseChain ELSE 'und' END AS lang_pred
        FROM (SELECT doc_id, ${hitExprs.mkString(", ")} FROM documents)"""
  }

  /** Lexical token-distribution entropy (TextAnalysis.lexicalEntropy):
    * same 9-dp p·ln(p) terms per distinct token under a DECIMAL(28,12)
    * list sum (order-free), same 6-dp finals. */
  val textLexicalEntropy: String = {
    val cnt = s"len(list_filter($toks, x -> x = t))::DOUBLE"
    val n = s"len($toks)::DOUBLE"
    val sum = s"""coalesce(list_aggregate(list_transform(list_distinct($toks),
        t -> round(($cnt / $n) * ln($cnt / $n), 9)::DECIMAL(28,12)),
        'sum'), 0)"""
    s"""SELECT doc_id,
          len($toks)::BIGINT AS n_tokens,
          len(list_distinct($toks))::BIGINT AS n_types,
          round((-$sum)::DOUBLE, 6) AS entropy,
          CASE WHEN len(list_distinct($toks)) > 1 THEN
            round((-$sum)::DOUBLE / ln(len(list_distinct($toks))::DOUBLE), 6)
          ELSE NULL END AS norm_entropy
        FROM documents"""
  }

  /** Repetition ratio (TextAnalysis.repetitionRatio): same distinct
    * token-window count over the same greatest(len−(n−1), 1) total. */
  def textRepetition(n: Int): String =
    s"""SELECT doc_id,
          greatest(len($toks) - ${n - 1}, 1)::INT AS n_windows,
          len(${tokenShingles(n)})::INT AS n_distinct,
          round(1.0 - len(${tokenShingles(n)})::DOUBLE /
            greatest(len($toks) - ${n - 1}, 1)::DOUBLE, 6) AS rep_ratio
        FROM documents"""

  /** Gopher repetition profile (TextAnalysis.repetitionProfile): the
    * same NON-distinct space-rejoined token windows, occurrence-counted
    * in-list; numerators/denominator are integer char sums so only the
    * final 6-dp division rounds. */
  def textRepetitionProfile(topNs: Seq[Int], dupNs: Seq[Int]): String = {
    val ns = (topNs ++ dupNs).distinct.sorted
    def ws(n: Int) =
      s"list_transform(generate_series(1, greatest(len($toks)-${n - 1}, 1)), i -> array_to_string(list_slice($toks, i, i+${n - 1}), ' '))"
    def total(n: Int) =
      s"greatest(coalesce(list_aggregate(list_transform(ws$n, w -> length(w)), 'sum'), 0), 1)::DOUBLE"
    val tops = topNs.map { n =>
      s"round(list_aggregate(list_transform(list_distinct(ws$n), g -> len(list_filter(ws$n, x -> x = g)) * length(g)), 'max')::DOUBLE / ${total(n)}, 6) AS top${n}gram_char_frac"
    }
    val dups = dupNs.map { n =>
      s"round(coalesce(list_aggregate(list_transform(list_filter(ws$n, w -> len(list_filter(ws$n, x -> x = w)) > 1), w -> length(w)), 'sum'), 0)::DOUBLE / ${total(n)}, 6) AS dup${n}gram_char_frac"
    }
    s"""SELECT doc_id, ${(tops ++ dups).mkString(",\n          ")}
        FROM (SELECT doc_id, ${ns.map(n => s"${ws(n)} AS ws$n").mkString(", ")} FROM documents)"""
  }

  /** Corpus report card (TextAnalysis.corpusReport): per-(lang, source)
    * aggregates; the quality mass sums DECIMAL(18,6) so both engines add
    * exactly. */
  val corpusReport: String = {
    val punctRaw = s"len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE / greatest(length(text), 1)::DOUBLE"
    val nToks = s"len($toks)"
    val stopList = graft.functions.TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
    val stopRaw = s"len(list_filter($toks, t -> t IN ($stopList)))::DOUBLE / greatest($nToks, 1)::DOUBLE"
    val quality = s"""round(least(n_chars::DOUBLE / 500.0, 1.0) * 0.4
              + (1.0 - least(($punctRaw) * 5.0, 1.0)) * 0.3
              + least(($stopRaw) * 4.0, 1.0) * 0.3, 6)"""
    s"""SELECT lang, source, count(*) AS n_docs,
          sum($nToks)::BIGINT AS total_tokens_ws,
          round(sum(CAST($quality AS DECIMAL(18,6)))::DOUBLE, 6) AS sum_quality,
          min(length(text))::INT AS min_chars,
          max(length(text))::INT AS max_chars,
          TRUE AS approx_p50_chars_ok
        FROM documents GROUP BY 1, 2"""
  }

  /** Per-domain curation rollup (Corpus.domainReport): the same
    * deterministic URL fixture, host re-extracted from the URL string
    * (DuckDB has no parse_url — anchored regex over the same scheme),
    * exact md5 dup fraction, token mass, DECIMAL(18,6) quality mass. */
  val corpusDomainReport: String = {
    val punctRaw = s"len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE / greatest(length(text), 1)::DOUBLE"
    val nToks = s"len($toks)"
    val stopList = graft.functions.TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
    val stopRaw = s"len(list_filter($toks, t -> t IN ($stopList)))::DOUBLE / greatest($nToks, 1)::DOUBLE"
    val quality = s"""round(least(n_chars::DOUBLE / 500.0, 1.0) * 0.4
              + (1.0 - least(($punctRaw) * 5.0, 1.0)) * 0.3
              + least(($stopRaw) * 4.0, 1.0) * 0.3, 6)"""
    s"""WITH d AS (SELECT *,
                 'https://' || source || '-' || (doc_id % 7)::VARCHAR
                   || '.example.com/docs/' || doc_id::VARCHAR AS url
               FROM documents)
        SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS domain,
               count(*) AS n_docs,
               count(DISTINCT md5(text)) AS n_unique,
               round(1.0 - count(DISTINCT md5(text))::DOUBLE
                 / count(*)::DOUBLE, 6) AS dup_frac,
               sum($nToks)::BIGINT AS total_tokens_ws,
               round(sum(CAST($quality AS DECIMAL(18,6)))::DOUBLE, 6)
                 AS sum_quality,
               round(sum(CAST($quality AS DECIMAL(18,6)))::DOUBLE
                 / count(*)::DOUBLE, 6) AS mean_quality
        FROM d GROUP BY 1"""
  }

  val textFingerprint: String =
    s"""SELECT doc_id, md5($norm) AS fp_exact,
          list_aggregate(list_transform(${shingles(8)}, g -> md5(g)), 'min') AS fp_rolling
        FROM documents"""

  /** Mirror of TextAnalysis.winnowing: the same positional k-token
    * grams (normalized-text whitespace tokens, truncating slices), the
    * same 60-bit (15-hex-char) md5 gram hash, the same combined
    * hash ++ descending-position string key, and the same
    * min-over-w-window selection restricted to complete-window start
    * positions (a short document keeps its single truncated window at
    * pos 0). */
  def textWinnow(k: Int, w: Int): String =
    s"""WITH tk AS (SELECT doc_id, $toks AS tok FROM documents),
          p0 AS (SELECT doc_id, tok,
                        greatest(len(tok) - ${k - 1}, 1) AS ng FROM tk),
          pos AS (SELECT doc_id, ng, tok,
                         unnest(generate_series(1, ng)) AS i FROM p0),
          keyed AS (
            SELECT doc_id, ng, i - 1 AS pos,
                   substr(md5(array_to_string(tok[i:i+${k - 1}], ' ')), 1, 15)
                     || lpad((9999999 - (i - 1))::VARCHAR, 7, '0') AS key
            FROM pos),
          wmin AS (
            SELECT doc_id, ng, pos,
                   min(key) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS wk
            FROM keyed),
          sel AS (SELECT DISTINCT doc_id, wk FROM wmin
                  WHERE pos <= greatest(ng - $w, 0))
        SELECT doc_id, (9999999 - substr(wk, 16, 7)::INT)::INT AS fp_pos,
               substr(wk, 1, 15) AS fp
        FROM sel"""

  val dedupExact: String =
    s"""SELECT md5($norm) AS fingerprint, min(doc_id) AS keep_id,
          count(*) AS n_dups
        FROM documents GROUP BY 1"""

  /** Mirror of Dedup.cdcChunks: the same bigram-hash boundary rule
    * (60-bit md5 of "tokᵢ tokᵢ₊₁" ≡ 0 mod divisor), the same
    * [0]+bpos+[n] bounds list, the same md5 chunk keys, the same
    * corpus-wide frequency join. */
  def dedupCdcChunks(divisor: Int): String =
    s"""WITH tk AS (SELECT doc_id, $toks AS tok FROM documents),
          bx AS (SELECT doc_id, tok, len(tok) AS n,
                        list_filter(range(1, greatest(len(tok) - 1, 1) + 1),
                          i -> i < len(tok) AND
                               ('0x' || substr(md5(tok[i] || ' ' || tok[i + 1]),
                                 1, 15))::BIGINT % $divisor = 0) AS bpos
                 FROM tk),
          bd AS (SELECT doc_id, tok,
                        list_concat(list_concat([0], bpos), [n]) AS bounds
                 FROM bx),
          ch AS (SELECT doc_id,
                        unnest(list_transform(range(1, len(bounds)), j ->
                          {'chash': md5(array_to_string(
                             tok[bounds[j] + 1 : bounds[j + 1]], ' ')),
                           'clen': bounds[j + 1] - bounds[j]})) AS c
                 FROM bd),
          cf AS (SELECT doc_id, c.chash AS chash, c.clen::BIGINT AS clen
                 FROM ch),
          freq AS (SELECT chash, count(*)::BIGINT AS occ FROM cf GROUP BY 1)
        SELECT doc_id, count(*)::BIGINT AS n_chunks,
               sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END)::BIGINT AS dup_chunks,
               sum(clen)::BIGINT AS n_tokens,
               sum(CASE WHEN occ > 1 THEN clen ELSE 0 END)::BIGINT
                 AS dup_tokens,
               round(sum(CASE WHEN occ > 1 THEN clen ELSE 0 END)::DOUBLE
                     / sum(clen), 6) AS dup_token_frac
        FROM cf JOIN freq USING (chash) GROUP BY doc_id"""

  /** Mirror of TextAnalysis.knBigramLm: same bigram stream
    * (tokenWindows(2) with the 1-token truncated gram dropped), same
    * count tables, same fixed-order double P_kn with every literal
    * forced ::DOUBLE (a bare 0.75 would be DECIMAL and reroute the
    * arithmetic). */
  def vocabKnBigram(topN: Int): String =
    s"""WITH tk AS (SELECT $toks AS tok FROM documents),
          gr AS (SELECT unnest(list_transform(
                   range(1, greatest(len(tok) - 1, 1) + 1),
                   i -> array_to_string(tok[i:i+1], ' '))) AS g
                 FROM tk),
          bg AS (SELECT split_part(g, ' ', 1) AS w1,
                        split_part(g, ' ', 2) AS w2
                 FROM gr WHERE contains(g, ' ')),
          c AS (SELECT w1, w2, count(*)::BIGINT AS c_big FROM bg GROUP BY 1, 2),
          cw1 AS (SELECT w1, sum(c_big)::BIGINT AS c_w1,
                         count(*)::BIGINT AS n1p_w1
                  FROM c GROUP BY 1),
          cw2 AS (SELECT w2, count(*)::BIGINT AS n1p_w2 FROM c GROUP BY 1),
          tot AS (SELECT count(*)::BIGINT AS n1p_all FROM c),
          top AS (SELECT w1, w2, c_big FROM c
                  ORDER BY c_big DESC, w1 ASC, w2 ASC LIMIT $topN)
        SELECT t.w1, t.w2, t.c_big, a.c_w1,
               round(greatest(t.c_big - 0.75::DOUBLE, 0.0::DOUBLE) / a.c_w1
                     + 0.75::DOUBLE * a.n1p_w1 / a.c_w1
                       * (b.n1p_w2::DOUBLE / x.n1p_all), 6) AS p_kn
        FROM top t JOIN cw1 a USING (w1) JOIN cw2 b USING (w2), tot x"""

  /** Mirror of Corpus.urlDedup over the same noisy-URL fixture: the
    * canonicalization rules step by step (fragment strip, lowercase
    * head, default-port drop, one trailing slash, tracking-param
    * filter + bytewise sort). DuckDB's regexp_extract returns NULL on
    * no-match where Spark's returns '' — the coalesces align the
    * empty-query and no-head paths. */
  val dedupUrl: String =
    """WITH u AS (SELECT doc_id,
            (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END)
            || (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END)
            || '.Example.COM'
            || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
            || '/Docs/' || (doc_id % 40)::VARCHAR
            || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
            || (CASE WHEN doc_id % 4 = 1 THEN '?utm_source=feed&id=7&ref=tw'
                     WHEN doc_id % 4 = 2 THEN '?id=7&utm_campaign=x'
                     ELSE '' END) AS url
          FROM documents),
          s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nofrag
                 FROM u),
          s2 AS (SELECT doc_id, nofrag,
                        coalesce(regexp_extract(nofrag,
                          '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1), '') AS head
                 FROM s1),
          s3 AS (SELECT doc_id,
                        regexp_replace(lower(head), ':(80|443)$', '') AS headl,
                        substring(nofrag, length(head) + 1) AS tail
                 FROM s2),
          s4 AS (SELECT doc_id, headl,
                        regexp_replace(coalesce(
                          regexp_extract(tail, '^([^?]*)', 1), ''),
                          '/$', '') AS path,
                        coalesce(
                          regexp_extract(tail, '^[^?]*\?(.*)$', 1), '') AS q
                 FROM s3),
          s5 AS (SELECT doc_id, headl, path,
                        coalesce(array_to_string(list_sort(list_filter(
                          string_split(q, '&'),
                          p -> p <> '' AND NOT regexp_matches(p,
                            '(?i)^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)(=.*)?$'))),
                          '&'), '') AS kept
                 FROM s4),
          c AS (SELECT doc_id,
                       headl || path ||
                         (CASE WHEN kept = '' THEN ''
                               ELSE '?' || kept END) AS canonical_url
                FROM s5)
        SELECT canonical_url, min(doc_id) AS keep_id, count(*) AS n_docs
        FROM c GROUP BY 1"""

  def dedupMinhashLsh(bands: Int, rowsPerBand: Int): String = {
    val mh = Seq.tabulate(bands * rowsPerBand)(i => s"${minhashExpr(5, i)} AS mh$i").mkString(", ")
    val bandSelects = Seq.tabulate(bands) { b =>
      val slice = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => s"mh$i::VARCHAR")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', ${slice.mkString(", ")})) AS h FROM sigs"
    }.mkString(" UNION ALL ")
    s"""WITH sigs AS (SELECT doc_id, $mh FROM documents),
          bandkeys AS ($bandSelects)
        SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
        FROM bandkeys l JOIN bandkeys r
          ON l.band = r.band AND l.h = r.h AND l.doc_id < r.doc_id"""
  }

  /** LSH candidates (same SQL as dedup_minhash_lsh) + exact Jaccard on the
    * candidates' distinct-shingle sets. */
  def dedupLshJaccard(
      bands: Int, rowsPerBand: Int, minJaccard: Double,
      src: String = "documents"): String = {
    val mh = Seq.tabulate(bands * rowsPerBand)(i => s"${minhashExpr(5, i)} AS mh$i").mkString(", ")
    val bandSelects = Seq.tabulate(bands) { b =>
      val slice = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => s"mh$i::VARCHAR")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', ${slice.mkString(", ")})) AS h FROM sigs"
    }.mkString(" UNION ALL ")
    // sigs feeds every per-band select and bandkeys self-joins:
    // MATERIALIZED, or DuckDB inlines the k-minhash scan once per band
    s"""WITH sigs AS MATERIALIZED (SELECT doc_id, $mh FROM $src),
          bandkeys AS MATERIALIZED ($bandSelects),
          cands AS MATERIALIZED (
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
            FROM bandkeys l JOIN bandkeys r
              ON l.band = r.band AND l.h = r.h AND l.doc_id < r.doc_id),
          gs AS MATERIALIZED (SELECT doc_id AS gid, ${shingles(5)} AS g FROM $src),
          scored AS (
            SELECT a, b,
                   len(list_intersect(ga.g, gb.g)) AS inter,
                   len(ga.g) AS sa, len(gb.g) AS sb
            FROM cands JOIN gs ga ON cands.a = ga.gid
                       JOIN gs gb ON cands.b = gb.gid)
        SELECT a, b, round(inter::DOUBLE / (sa + sb - inter)::DOUBLE, 6) AS jaccard
        FROM scored
        WHERE round(inter::DOUBLE / (sa + sb - inter)::DOUBLE, 6) >= $minJaccard"""
  }

  /** Mirror of Dedup.minhashEstimatePairs: same banded candidates,
    * then the per-component signature-agreement count next to the
    * exact shingle Jaccard — every term the same md5 hash family, so
    * the ESTIMATOR itself hash-compares (no tolerance contract). */
  def dedupMinhashEstimate(bands: Int, rowsPerBand: Int): String = {
    val k = bands * rowsPerBand
    val mh = Seq.tabulate(k)(i => s"${minhashExpr(5, i)} AS mh$i").mkString(", ")
    val bandSelects = Seq.tabulate(bands) { b =>
      val slice = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => s"mh$i::VARCHAR")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', ${slice.mkString(", ")})) AS h FROM sigs"
    }.mkString(" UNION ALL ")
    val agree = (0 until k)
      .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH sigs AS MATERIALIZED (SELECT doc_id, $mh FROM documents),
          bandkeys AS MATERIALIZED ($bandSelects),
          cands AS MATERIALIZED (
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
            FROM bandkeys l JOIN bandkeys r
              ON l.band = r.band AND l.h = r.h AND l.doc_id < r.doc_id),
          agr AS (
            SELECT a, b, ($agree)::INT AS matches
            FROM cands JOIN sigs sa ON cands.a = sa.doc_id
                       JOIN sigs sb ON cands.b = sb.doc_id),
          gs AS MATERIALIZED (SELECT doc_id AS gid, ${shingles(5)} AS g FROM documents),
          ex AS (
            SELECT a, b, len(list_intersect(ga.g, gb.g)) AS inter,
                   len(ga.g) AS sa, len(gb.g) AS sb
            FROM cands JOIN gs ga ON cands.a = ga.gid
                       JOIN gs gb ON cands.b = gb.gid)
        SELECT agr.a, agr.b, agr.matches,
               round(agr.matches::DOUBLE / ${k}.0::DOUBLE, 6) AS est_jaccard,
               round(ex.inter::DOUBLE / (ex.sa + ex.sb - ex.inter)::DOUBLE, 6)
                 AS jaccard
        FROM agr JOIN ex ON agr.a = ex.a AND agr.b = ex.b"""
  }

  /** Mirror of Dedup.crossLshJaccard over the decontaminate benchmark
    * fixture (every `benchMod`-th RAW doc): bipartite band-key join,
    * exact shingle Jaccard on candidates. `corpusSrc` parameterizes the
    * left side so the compositor can run it over its post-dedup reps. */
  def decontaminateFuzzy(
      bands: Int, rowsPerBand: Int, minJaccard: Double,
      corpusSrc: String = "documents", benchMod: Int = 20,
      benchWhere: String = null, rightName: String = "bench_id"): String = {
    val bw = Option(benchWhere).getOrElse(s"doc_id % $benchMod = 0")
    val mh = Seq.tabulate(bands * rowsPerBand)(i => s"${minhashExpr(5, i)} AS mh$i").mkString(", ")
    def bandSelects(src: String, idc: String) = Seq.tabulate(bands) { b =>
      val slice = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => s"mh$i::VARCHAR")
      s"SELECT $idc, $b AS band, md5(concat_ws('|', ${slice.mkString(", ")})) AS h FROM $src"
    }.mkString(" UNION ALL ")
    s"""WITH bench AS MATERIALIZED (SELECT doc_id AS bench_id, text FROM documents WHERE $bw),
          sigsl AS MATERIALIZED (SELECT doc_id, $mh FROM $corpusSrc),
          sigsr AS MATERIALIZED (SELECT bench_id, $mh FROM bench),
          bkl AS MATERIALIZED (${bandSelects("sigsl", "doc_id")}),
          bkr AS MATERIALIZED (${bandSelects("sigsr", "bench_id")}),
          cands AS MATERIALIZED (
            SELECT DISTINCT l.doc_id AS a, r.bench_id AS b
            FROM bkl l JOIN bkr r ON l.band = r.band AND l.h = r.h),
          gsl AS MATERIALIZED (SELECT doc_id AS gid, ${shingles(5)} AS g FROM $corpusSrc),
          gsr AS MATERIALIZED (SELECT bench_id AS gid, ${shingles(5)} AS g FROM bench),
          scored AS (
            SELECT a, b,
                   len(list_intersect(ga.g, gb.g)) AS inter,
                   len(ga.g) AS sa, len(gb.g) AS sb
            FROM cands JOIN gsl ga ON cands.a = ga.gid
                       JOIN gsr gb ON cands.b = gb.gid)
        SELECT a AS doc_id, b AS $rightName,
               round(inter::DOUBLE / (sa + sb - inter)::DOUBLE, 6) AS jaccard
        FROM scored
        WHERE round(inter::DOUBLE / (sa + sb - inter)::DOUBLE, 6) >= $minJaccard"""
  }

  /** Dup clusters = connected components over the LSH-verified pairs,
    * re-derived with a recursive CTE (transitive closure over
    * both-direction edges; cluster id = min reachable id). */
  def dedupClusters(bands: Int, rowsPerBand: Int, minJaccard: Double): String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED (${dedupLshJaccard(bands, rowsPerBand, minJaccard)}),
          edges AS MATERIALIZED (SELECT a AS s, b AS d FROM pairs
                    UNION SELECT b AS s, a AS d FROM pairs),
          reach AS (
            SELECT s AS x, s AS y FROM (SELECT DISTINCT s FROM edges)
            UNION
            SELECT r.x, e.d AS y FROM reach r JOIN edges e ON r.y = e.s),
          cc AS MATERIALIZED (SELECT x AS id, min(y) AS cluster_id FROM reach GROUP BY x)
        SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN cc ON d.doc_id = cc.id"""

  /** Mirror of Corpus.assignSplitsClustered: the [[dedupClusters]]
    * closure, then the `split:` coin over DISTINCT cluster ids, members
    * inheriting their cluster's split. */
  def splitAssignClustered(bands: Int, rowsPerBand: Int,
      minJaccard: Double, splits: Seq[(String, Double)]): String = {
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
      .map(c => ((c / total) * 4294967296L).toLong)
    val coin =
      s"('0x' || substr(md5('split:' || cluster_id::VARCHAR), 1, 8))::BIGINT"
    val whens = splits.map(_._1).zip(bounds).init
      .map { case (name, b) => s"WHEN $coin < $b THEN '$name'" }.mkString(" ")
    s"""WITH cl AS (${dedupClusters(bands, rowsPerBand, minJaccard)}),
          sa AS (SELECT cluster_id,
                        CASE $whens ELSE '${splits.last._1}' END AS split
                 FROM (SELECT DISTINCT cluster_id FROM cl))
        SELECT cl.doc_id, cl.cluster_id, sa.split
        FROM cl JOIN sa USING (cluster_id)"""
  }

  /** Mirror of Events.holtWintersForecast: the SAME driver-computed
    * coefficient vectors ([[graft.operators.Events.holtWintersCoeffs]])
    * interpolated as CASE literals over the zero-densified hourly
    * spine; 9-dp terms under DECIMAL(28,12), forecast composed from
    * the 6-dp-rounded sums. */
  def evHoltWinters(alpha: Double, beta: Double, gamma: Double,
      season: Int, window: Int, horizon: Int): String = {
    val (cl, cb, cs) = graft.operators.Events.holtWintersCoeffs(
      alpha, beta, gamma, season, window, horizon)
    def caseOf(arr: Array[Double]): String =
      (1 to window).map(rn => s"WHEN $rn THEN ${arr(window - rn)}")
        .mkString(" ")
    s"""WITH c AS (SELECT event_type, date_trunc('hour', ts) AS b,
                          count(*)::BIGINT AS cnt
                   FROM events
                   WHERE event_type IS NOT NULL AND ts IS NOT NULL
                   GROUP BY 1, 2),
         g AS (SELECT event_type,
                      unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS b
               FROM (SELECT event_type, min(b) AS b0, max(b) AS b1
                     FROM c GROUP BY 1)),
         s AS (SELECT g.event_type, g.b, coalesce(c.cnt, 0)::BIGINT AS cnt
               FROM g LEFT JOIN c
                 ON g.event_type = c.event_type AND g.b = c.b),
         r AS (SELECT event_type, cnt,
                      row_number() OVER (PARTITION BY event_type
                        ORDER BY b DESC) AS rn
               FROM s),
         f AS (SELECT * FROM r WHERE rn <= $window),
         k AS (SELECT event_type FROM f GROUP BY 1
               HAVING count(*) = $window),
         t AS (SELECT f.event_type,
                      round(cnt::DOUBLE * (CASE rn ${caseOf(cl)} END), 9)
                        ::DECIMAL(28,12) AS tl,
                      round(cnt::DOUBLE * (CASE rn ${caseOf(cb)} END), 9)
                        ::DECIMAL(28,12) AS tb,
                      round(cnt::DOUBLE * (CASE rn ${caseOf(cs)} END), 9)
                        ::DECIMAL(28,12) AS tsn
               FROM f JOIN k USING (event_type)),
         a AS (SELECT event_type,
                      round(sum(tl)::DOUBLE, 6) AS level,
                      round(sum(tb)::DOUBLE, 6) AS trend,
                      round(sum(tsn)::DOUBLE, 6) AS seasonal
               FROM t GROUP BY 1)
        SELECT event_type, ${window}::BIGINT AS n_used, level, trend,
               seasonal,
               round(level + $horizon * trend + seasonal, 6) AS forecast
        FROM a"""
  }

  /** Mirror of Events.ewma: the SAME driver-computed weight table
    * (repeated IEEE multiplication, shortest-round-trip literals — the
    * cross-engine constant-sharing discipline), 9-dp terms summed under
    * DECIMAL(28,12). */
  def evEwma(alpha: Double, lastN: Int): String = {
    val pows = graft.operators.Events.ewmaPows(alpha, lastN)
    val wLast = (1 to lastN).map(i => s"WHEN $i THEN ${pows(i - 1)}").mkString(" ")
    val wMid = (1 to lastN).map(i => s"WHEN $i THEN ${alpha * pows(i - 1)}").mkString(" ")
    s"""WITH e AS (SELECT user_id, "value",
                          row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
                   FROM events WHERE "value" IS NOT NULL),
         f AS (SELECT * FROM e WHERE rn <= $lastN),
         g AS (SELECT user_id, "value", rn,
                      count(*) OVER (PARTITION BY user_id) AS m FROM f),
         t AS (SELECT user_id, m,
                      round("value" * (CASE WHEN rn = m THEN (CASE m $wLast END)
                                            ELSE (CASE rn $wMid END) END),
                        9)::DECIMAL(28,12) AS term
               FROM g)
        SELECT user_id, max(m)::BIGINT AS n_used,
               round(sum(term)::DOUBLE, 6) AS ewma
        FROM t GROUP BY 1"""
  }

  /** Mirror of Events.holtForecast: the evEwma window chain with TWO
    * coefficient CASE tables (level + trend) interpolated from the
    * SAME driver-computed Events.holtCoeffs literals. */
  def evHoltForecast(
      alpha: Double, beta: Double, lastN: Int, horizon: Int): String = {
    val coeffs = (1 to lastN)
      .map(m => m -> graft.operators.Events.holtCoeffs(alpha, beta, m)).toMap
    def caseTable(pick: (Int, Int) => Double): String =
      "CASE " + (for { m <- 1 to lastN; rn <- 1 to m } yield
        s"WHEN m = $m AND rn = $rn THEN ${pick(m, rn)}").mkString(" ") + " END"
    val wl = caseTable((m, rn) => coeffs(m)._1(m - rn))
    val wb = caseTable((m, rn) => coeffs(m)._2(m - rn))
    s"""WITH e AS (SELECT user_id, "value",
                          row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
                   FROM events WHERE "value" IS NOT NULL),
         f AS (SELECT * FROM e WHERE rn <= $lastN),
         g AS (SELECT user_id, "value", rn,
                      count(*) OVER (PARTITION BY user_id) AS m FROM f),
         t AS (SELECT user_id, m,
                      round("value" * ($wl), 9)::DECIMAL(28,12) AS tl,
                      round("value" * ($wb), 9)::DECIMAL(28,12) AS tb
               FROM g),
         s AS (SELECT user_id, max(m)::BIGINT AS n_used,
                      round(sum(tl)::DOUBLE, 6) AS level,
                      round(sum(tb)::DOUBLE, 6) AS trend
               FROM t GROUP BY 1)
        SELECT user_id, n_used, level, trend,
               round(level + $horizon.0 * trend, 6) AS forecast
        FROM s"""
  }

  /** Mirror of Similarity.nearestCentroid (moved here so the confusion
    * rollup can reuse it verbatim). */
  val embNearestCentroid: String = {
    val dot = "list_aggregate(list_transform(list_zip(e.embedding, c.cvec), " +
      "z -> z[1]::DOUBLE * z[2]::DOUBLE), 'sum')"
    val na = "sqrt(list_aggregate(list_transform(e.embedding, " +
      "x -> x::DOUBLE * x::DOUBLE), 'sum'))"
    val nb = "sqrt(list_aggregate(list_transform(c.cvec, x -> x * x), 'sum'))"
    s"""WITH x AS (SELECT label, u.dim AS dim, u.v AS v FROM (
             SELECT label,
                    unnest(list_transform(generate_series(1, len(embedding)),
                      i -> {'dim': i - 1, 'v': embedding[i]})) AS u
             FROM embeddings)),
         r AS (SELECT label, dim::INT AS dim, round(v::DOUBLE, 6) AS vr
               FROM x),
         ct AS (SELECT label AS clabel, dim,
                       round(sum(vr::DECIMAL(28,6))::DOUBLE
                             / count(*)::DOUBLE, 6) AS mean
                FROM r GROUP BY 1, 2),
         cv AS (SELECT clabel,
                       list_transform(list_sort(list({'dim': dim, 'mean': mean})),
                         s -> s.mean) AS cvec
                FROM ct GROUP BY 1),
         sc AS (SELECT e.vec_id, e.label, c.clabel,
                       round($dot / ($na * $nb), 6) AS sim
                FROM embeddings e CROSS JOIN cv c)
        SELECT vec_id, label AS true_label, clabel AS assigned_label,
               sim, clabel = label AS correct
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY sim DESC, clabel ASC) AS rn FROM sc)
        WHERE rn = 1"""
  }

  /** Mirror of Quality.cohensKappa over the C4 × Gopher verdicts: the
    * two rule fragments joined on doc_id, exact 2×2 confusion counts,
    * the same po/pe/kappa op order. */
  val statsCohensKappa: String =
    s"""WITH ca AS (${textC4Rules(minWords = 5)}),
         gb AS (${textGopherRules(minTokens = 25, maxTokens = 100000,
      minAvgTokenLen = 3.0, maxAvgTokenLen = 10.0,
      maxPunctRatio = 0.2, minStopwordHits = 2)}),
         j AS (SELECT ca.doc_id, ca.pass AS pa, gb.pass AS pb
               FROM ca JOIN gb ON ca.doc_id = gb.doc_id),
         m AS (SELECT count(*)::BIGINT AS n,
                      sum(CASE WHEN pa AND pb THEN 1 ELSE 0 END)::BIGINT AS n11,
                      sum(CASE WHEN NOT pa AND NOT pb THEN 1 ELSE 0 END)::BIGINT AS n00,
                      sum(CASE WHEN pa AND NOT pb THEN 1 ELSE 0 END)::BIGINT AS n10,
                      sum(CASE WHEN NOT pa AND pb THEN 1 ELSE 0 END)::BIGINT AS n01
               FROM j)
        SELECT n, (n11 + n00) AS n_agree,
               round((n11 + n00)::DOUBLE / n::DOUBLE, 6) AS po,
               round(((n11 + n10) * (n11 + n01)
                      + (n00 + n01) * (n00 + n10))::DOUBLE
                     / (n::DOUBLE * n::DOUBLE), 6) AS pe,
               CASE WHEN 1.0::DOUBLE - (((n11 + n10) * (n11 + n01)
                        + (n00 + n01) * (n00 + n10))::DOUBLE
                        / (n::DOUBLE * n::DOUBLE)) <> 0.0::DOUBLE
                    THEN round(((n11 + n00)::DOUBLE / n::DOUBLE
                          - ((n11 + n10) * (n11 + n01)
                             + (n00 + n01) * (n00 + n10))::DOUBLE
                            / (n::DOUBLE * n::DOUBLE))
                         / (1.0::DOUBLE - ((n11 + n10) * (n11 + n01)
                             + (n00 + n01) * (n00 + n10))::DOUBLE
                           / (n::DOUBLE * n::DOUBLE)), 6)
               END AS kappa
        FROM m"""

  /** Mirror of Quality.psi over the even/odd-orderkey price split: the
    * SAME Scala decile fractions, quantile_cont fences (≡ Spark's exact
    * `percentile`, the stats_outliers-proven idiom), fence-fold binning,
    * 1e-6-clamped shares, 9-dp (p−q)·ln(p/q) terms under DECIMAL. */
  def statsPsi(nBins: Int): String = {
    val pcts = (1 until nBins).map(_.toDouble / nBins).mkString(", ")
    def share(c: String, n: String) = // nullif: DuckDB's IEEE x/0 is
      // inf/NaN where Spark's non-ANSI divide is null — null both, then
      // the coalesce clamps both engines to the same 1e-6 floor
      s"greatest(coalesce($c::DOUBLE / nullif($n, 0)::DOUBLE, 1e-6), 1e-6)"
    s"""WITH a AS (SELECT l_extendedprice AS v FROM lineitem
                   WHERE l_orderkey % 2 = 0 AND l_extendedprice IS NOT NULL),
         b AS (SELECT l_extendedprice AS v FROM lineitem
               WHERE l_orderkey % 2 = 1 AND l_extendedprice IS NOT NULL),
         f AS (SELECT quantile_cont(v, [$pcts]) AS f FROM a),
         ba AS (SELECT len(list_filter(f.f, x -> a.v > x)) AS bin, 0 AS side
                FROM a CROSS JOIN f
                UNION ALL
                SELECT len(list_filter(f.f, x -> b.v > x)), 1
                FROM b CROSS JOIN f),
         c AS (SELECT bin,
                      sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)::BIGINT AS ca,
                      sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)::BIGINT AS cb
               FROM ba GROUP BY 1),
         t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM c),
         terms AS (SELECT na, nb,
                          round((${share("ca", "na")} - ${share("cb", "nb")})
                                * ln(${share("ca", "na")}
                                     / ${share("cb", "nb")}),
                            9)::DECIMAL(28,12) AS term
                   FROM c CROSS JOIN t)
        SELECT na, nb, round(sum(term)::DOUBLE, 6) AS psi
        FROM terms GROUP BY 1, 2"""
  }

  /** Mirror of Quality.keySkewReport: exact Gini from the
    * count-of-counts histogram, HUGEINT position-run sums, one final
    * double division per column. */
  def dqSkewReport(cols: Seq[String]): String =
    cols.map { kc =>
      s"""SELECT '$kc' AS "column", t::BIGINT AS n_rows, nk AS n_keys,
                 maxc AS max_count,
                 round(maxc::DOUBLE / t::DOUBLE, 6) AS top_share,
                 round((2 * s - (nk + 1)::HUGEINT * t)::DOUBLE
                       / (nk::DOUBLE * t::DOUBLE), 6) AS gini
          FROM (
            SELECT sum(c::HUGEINT * m) AS t, sum(m)::BIGINT AS nk,
                   max(c)::BIGINT AS maxc,
                   sum(c::HUGEINT * (m::HUGEINT * k0
                                     + m::HUGEINT * (m + 1) // 2)) AS s
            FROM (
              SELECT c, m,
                     coalesce(sum(m) OVER (ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0)::BIGINT AS k0
              FROM (SELECT c, count(*)::BIGINT AS m
                    FROM (SELECT $kc AS key, count(*)::BIGINT AS c
                          FROM lineitem GROUP BY 1)
                    GROUP BY 1)))"""
    }.mkString("\n        UNION ALL\n        ")

  /** Mirror of Quality.bootstrapMeanCI: the SAME Poisson(1) integer
    * thresholds (Quality.PoissonThresholds — one source of truth), the
    * same salted per-(replica, id) coin, decimal-exact weighted sums,
    * and the same percentile pick from the sorted replica means. */
  def statsBootstrap(b: Int, salt: String): String = {
    val cases = graft.operators.Quality.PoissonThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN c < $t THEN $k" }.mkString(" ")
    s"""WITH e AS (SELECT event_id, round("value"::DOUBLE, 6)::DECIMAL(28,6) AS v
                   FROM events WHERE "value" IS NOT NULL),
         reps AS (SELECT e.event_id, e.v, r.r,
                         ('0x' || substr(md5('$salt:' || r.r::VARCHAR || ':'
                           || e.event_id::VARCHAR), 1, 8))::BIGINT AS c
                  FROM e CROSS JOIN (SELECT unnest(range(0, $b)) AS r) r),
         wts AS (SELECT r, v, (CASE $cases ELSE 7 END)::BIGINT AS w FROM reps),
         m AS (SELECT r, sum(w::DECIMAL(28,6) * v)::DOUBLE
                        / sum(w)::DOUBLE AS m
               FROM wts GROUP BY 1),
         ms AS (SELECT list_sort(list(m)) AS ms FROM m),
         o AS (SELECT count(*)::BIGINT AS n_rows,
                      sum(v)::DOUBLE / count(*)::DOUBLE AS mean
               FROM e)
        SELECT o.n_rows, round(o.mean, 6) AS mean,
               round(ms.ms[2], 6) AS boot_lo,
               round(ms.ms[${b - 1}], 6) AS boot_hi
        FROM o CROSS JOIN ms"""
  }

  /** The per-purpose-salted coin mirroring Corpus.coin. */
  def coinSql(salt: String): String =
    s"('0x' || substr(md5('$salt' || doc_id::VARCHAR), 1, 8))::BIGINT"

  /** Integer-threshold md5-coin sampling (Corpus.mixtureSample): same
    * ⌊rate·2^32⌋ literals, same salted first-4-md5-bytes coin. */
  def sampleMixture(rates: Seq[(String, Double)], defaultRate: Double): String = {
    val coin = coinSql("mix:")
    val cases = rates.map { case (src, r) =>
      s"WHEN source = '$src' THEN ${(r * 4294967296L).toLong}"
    }.mkString(" ")
    s"""SELECT doc_id, source FROM documents
        WHERE $coin < CASE $cases ELSE ${(defaultRate * 4294967296L).toLong} END"""
  }

  /** Mirror of Corpus.weightedMixtureSample: keep iff the qmix-salted
    * coin falls under ⌊clamp(rate·quality)·2^32⌋. The quality weight is
    * the 6-dp-rounded score both engines compute identically; the
    * rate literals interpolate the same Scala doubles the Spark plan
    * embeds, so the product is one identical IEEE multiply. */
  def sampleQualityWeighted(rates: Seq[(String, Double)], defaultRate: Double): String = {
    val punctRaw = s"len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE / greatest(length(text), 1)::DOUBLE"
    val nToks = s"len($toks)"
    val stopList = graft.functions.TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
    val stopRaw = s"len(list_filter($toks, t -> t IN ($stopList)))::DOUBLE / greatest($nToks, 1)::DOUBLE"
    val quality = s"""round(least(n_chars::DOUBLE / 500.0, 1.0) * 0.4
              + (1.0 - least(($punctRaw) * 5.0, 1.0)) * 0.3
              + least(($stopRaw) * 4.0, 1.0) * 0.3, 6)"""
    val cases = rates.map { case (src, r) =>
      s"WHEN source = '$src' THEN ${r}::DOUBLE"
    }.mkString(" ")
    s"""WITH q AS (SELECT doc_id, source, $quality AS quality FROM documents)
        SELECT doc_id, source, quality FROM q
        WHERE ${coinSql("qmix:")} <
          floor(least(greatest((CASE $cases ELSE ${defaultRate}::DOUBLE END) * quality,
                               0.0), 1.0) * 4294967296.0)::BIGINT"""
  }

  /** Mirror of Corpus.temperatureMixtureSample at T=2: per-source keep
    * rate sqrt(n_min/n_src). sqrt is correctly rounded under IEEE 754,
    * so both engines derive the same threshold integer. */
  val sampleTemperature: String =
    s"""WITH cnt AS (SELECT source, count(*) AS src_n FROM documents GROUP BY 1),
          mn AS (SELECT min(src_n) AS min_n FROM cnt),
          r AS (SELECT source,
                       sqrt((SELECT min_n FROM mn)::DOUBLE / src_n::DOUBLE) AS keep_rate
                FROM cnt)
        SELECT d.doc_id, d.source
        FROM documents d JOIN r ON d.source = r.source
        WHERE ${coinSql("tmix:")} < floor(keep_rate * 4294967296.0)::BIGINT"""

  /** Token n-grams mirroring TextFunctions.tokenShingles: distinct
    * space-rejoined n-token windows of the normalized text. */
  def tokenShingles(n: Int): String =
    s"""list_distinct(list_transform(
          range(1, greatest(len($toks) - ${n - 1}, 1) + 1),
          i -> array_to_string(($toks)[i:i+${n - 1}], ' ')))"""

  /** Mirror of Dedup.stripDuplicateSpans: positioned NON-distinct token
    * windows, global first-occurrence keeper per duplicated gram
    * (row_number over (doc_id, spos)), cut list per doc, higher-order
    * token filter (a token survives iff NO cut covers it — merge-free,
    * identical to the Spark exists()). 0-based spos on both engines. */
  def dedupStripSpans(spanTokens: Int): String = {
    val L = spanTokens
    s"""WITH d AS (SELECT doc_id, $toks AS l FROM documents),
          w AS (SELECT doc_id, l,
                       list_transform(
                         range(1, greatest(len(l) - ${L - 1}, 1) + 1),
                         i -> array_to_string(l[i:i+${L - 1}], ' ')) AS wins
                FROM d),
          o0 AS (SELECT doc_id, wins,
                        unnest(range(1, len(wins) + 1)) AS i FROM w),
          occ AS (SELECT doc_id, (i - 1)::INT AS spos,
                         ('0x' || substr(md5(wins[i]), 1, 15))::BIGINT AS gram
                  FROM o0 WHERE length(wins[i]) > 0),
          rk AS (SELECT doc_id, spos, gram,
                        row_number() OVER (PARTITION BY gram
                          ORDER BY doc_id, spos) AS rn,
                        count(*) OVER (PARTITION BY gram) AS n_occ
                 FROM occ),
          cl AS (SELECT doc_id,
                        list(struct_pack(cstart := spos,
                                         cend := spos + $L)) AS cuts
                 FROM rk WHERE n_occ > 1 AND rn > 1 GROUP BY 1),
          kept AS (
            SELECT d.doc_id, d.l,
                   CASE WHEN cl.doc_id IS NULL THEN d.l
                        ELSE list_transform(
                          list_filter(
                            list_transform(range(1, len(d.l) + 1),
                              i -> struct_pack(i := i - 1, t := d.l[i])),
                            s -> len(list_filter(cl.cuts,
                              c -> s.i >= c.cstart AND s.i < c.cend)) = 0),
                          s -> s.t) END AS k
            FROM d LEFT JOIN cl USING (doc_id))
        -- coalesce: DuckDB array_to_string([]) is NULL, Spark's is ''
        SELECT doc_id, coalesce(array_to_string(k, ' '), '') AS clean_text,
               len(l)::INT AS n_tokens,
               (len(l) - len(k))::INT AS n_removed_tokens
        FROM kept"""
  }

  /** Mirror of Dedup.spanDuplicates: distinct per-doc token windows,
    * postings per gram hash, spans-in-≥2-docs rollup per document. */
  def dedupSpans(spanTokens: Int): String =
    s"""WITH dg AS (
          SELECT DISTINCT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gram
          FROM (SELECT doc_id, unnest(${tokenShingles(spanTokens)}) AS g
                FROM documents)
          WHERE length(g) > 0),
        p AS (SELECT gram, count(*)::BIGINT AS n_docs FROM dg GROUP BY 1),
        per AS (
          SELECT dg.doc_id, count(*)::INT AS n_spans,
                 sum(CASE WHEN p.n_docs > 1 THEN 1 ELSE 0 END)::INT AS n_dup_spans
          FROM dg JOIN p USING (gram) GROUP BY 1)
        SELECT d.doc_id,
               coalesce(per.n_spans, 0)::INT AS n_spans,
               coalesce(per.n_dup_spans, 0)::INT AS n_dup_spans,
               coalesce(per.n_dup_spans, 0) > 0 AS span_dup
        FROM documents d LEFT JOIN per USING (doc_id)"""

  /** Benchmark-overlap decontamination (Corpus.decontaminate): same
    * token n-grams, bench side = every `benchMod`-th doc. */
  def decontaminate(nTokens: Int, minHits: Int, benchMod: Int): String =
    s"""WITH bg AS (
          SELECT DISTINCT bench_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gram
          FROM (SELECT doc_id AS bench_id, unnest(${tokenShingles(nTokens)}) AS g
                FROM documents WHERE doc_id % $benchMod = 0)
          WHERE length(g) > 0),
        dg AS (
          SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gram
          FROM (SELECT doc_id, unnest(${tokenShingles(nTokens)}) AS g FROM documents)
          WHERE length(g) > 0),
        hits AS (
          SELECT dg.doc_id,
                 count(DISTINCT dg.gram)::INT AS n_gram_hits,
                 count(DISTINCT bg.bench_id)::INT AS n_bench_docs
          FROM dg JOIN bg USING (gram) GROUP BY dg.doc_id)
        SELECT d.doc_id,
               coalesce(h.n_gram_hits, 0)::INT AS n_gram_hits,
               coalesce(h.n_bench_docs, 0)::INT AS n_bench_docs,
               coalesce(h.n_gram_hits, 0) >= $minHits AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)"""

  /** Mirror of Corpus.decontaminationReport: per-benchmark-doc leak
    * audit — distinct shared-gram count per (bench, doc) pair, then
    * the per-bench leaking-doc count; closure over every bench doc. */
  def decontaminateReport(nTokens: Int, minHits: Int, benchMod: Int): String =
    s"""WITH bench AS (SELECT doc_id AS bench_id, text FROM documents
                       WHERE doc_id % $benchMod = 0),
        bg AS (
          SELECT DISTINCT bench_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gram
          FROM (SELECT bench_id, unnest(${tokenShingles(nTokens)}) AS g FROM bench)
          WHERE length(g) > 0),
        dg AS (
          SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gram
          FROM (SELECT doc_id, unnest(${tokenShingles(nTokens)}) AS g FROM documents)
          WHERE length(g) > 0),
        ph AS (
          SELECT bg.bench_id, dg.doc_id, count(DISTINCT dg.gram) AS n_shared
          FROM dg JOIN bg USING (gram) GROUP BY 1, 2),
        pb AS (
          SELECT bench_id,
                 sum(CASE WHEN n_shared >= $minHits THEN 1 ELSE 0 END)::INT
                   AS n_leaking_docs
          FROM ph GROUP BY 1)
        SELECT b.bench_id,
               coalesce(pb.n_leaking_docs, 0)::INT AS n_leaking_docs,
               coalesce(pb.n_leaking_docs, 0) > 0 AS burned
        FROM bench b LEFT JOIN pb USING (bench_id)"""

  /** Mirror of TextAnalysis.lmQualityBuckets: the [[textUnigramLm]]
    * score chain, then per-language tercile assignment from the
    * distinct-score histogram with the SAME integer comparison
    * (3·cum_before vs tot) — ties share their value's bucket. */
  val lmQualityBuckets: String =
    s"""WITH tok AS (SELECT doc_id, unnest($toks) AS token FROM documents),
          total AS (SELECT count(*)::DOUBLE AS total FROM tok),
          model AS (
            SELECT token,
                   round(ln(count(*)::DOUBLE / (SELECT total FROM total)), 9)::DECIMAL(28,12) AS logp
            FROM tok GROUP BY 1),
          sc AS (SELECT t.doc_id,
                        round(sum(m.logp)::DOUBLE / count(*), 6) AS avg_logp
                 FROM tok t JOIN model m ON t.token = m.token GROUP BY 1),
          scl AS (SELECT sc.doc_id, d.lang, sc.avg_logp
                  FROM sc JOIN documents d USING (doc_id)),
          bv AS (SELECT lang, avg_logp, count(*) AS nv FROM scl GROUP BY 1, 2),
          bb AS (SELECT lang, avg_logp,
                        coalesce(sum(nv) OVER (PARTITION BY lang ORDER BY avg_logp DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
                        sum(nv) OVER (PARTITION BY lang) AS tot
                 FROM bv),
          bk AS (SELECT lang, avg_logp,
                        CASE WHEN cum_before * 3 < tot THEN 'head'
                             WHEN cum_before * 3 < tot * 2 THEN 'middle'
                             ELSE 'tail' END AS bucket
                 FROM bb)
        SELECT s.doc_id, s.lang, s.avg_logp, bk.bucket
        FROM scl s JOIN bk ON s.lang = bk.lang AND s.avg_logp = bk.avg_logp"""

  /** Mirror of Events.cohortRetention: integer period ids from
    * epoch-millis floor division, distinct per-user activity, cohort =
    * min period, cells counted over the distinct activity rows. */
  def evRetention(periodSeconds: Long): String = {
    val periodMs = periodSeconds * 1000L
    s"""WITH act AS (SELECT DISTINCT user_id AS usr, epoch_ms(ts) // $periodMs AS period
                     FROM events),
          cohort AS (SELECT usr, min(period) AS cohort_period FROM act GROUP BY 1)
        SELECT c.cohort_period, a.period - c.cohort_period AS period_offset,
               count(*) AS n_users
        FROM act a JOIN cohort c ON a.usr = c.usr
        GROUP BY 1, 2"""
  }

  /** The END-TO-END compositor (Corpus.prepareTrainingSet) re-derived as
    * one chained query: quality gate (top `qualityKeep` per source by
    * the 6-dp score, histogram threshold) → LSH-verified pairs →
    * recursive-CTE components → keep-one reps → decontaminate the reps
    * against every `benchMod`-th RAW doc → split-assign the survivors.
    * Proves the COMPOSITION is exact, not just each stage: any drift in
    * how stages hand off (keep-one on the wrong id, decontaminating
    * pre-dedup docs, filtering the benchmark side, re-salted coins)
    * breaks the hash even while the per-stage oracles stay green. */
  def corpusPrepare(
      bands: Int, rowsPerBand: Int, minJaccard: Double,
      nTokens: Int, minHits: Int, benchMod: Int,
      splits: Seq[(String, Double)],
      qualityKeep: Option[Double] = None,
      temperature: Option[Double] = None,
      fuzzy: Option[Double] = None,
      spanDedup: Option[(Int, Double)] = None,
      semantic: Option[Double] = None,
      classifierDims: Option[Int] = None): String = {
    // the oracle gate pins T=2: its exponent 0.5 computes via sqrt,
    // IEEE-correctly-rounded hence bit-identical cross-engine (pow is
    // not — see temperatureMixtureSample)
    require(temperature.forall(_ == 2.0),
      "oracle-gated compositor mixture supports T=2 only")
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
      .map(c => ((c / total) * 4294967296L).toLong)
    val coin = coinSql("split:")
    val whens = splits.map(_._1).zip(bounds).init
      .map { case (name, b) => s"WHEN $coin < $b THEN '$name'" }.mkString(" ")
    val punctRaw = s"len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE / greatest(length(text), 1)::DOUBLE"
    val nToks = s"len($toks)"
    val stopList = graft.functions.TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
    val stopRaw = s"len(list_filter($toks, t -> t IN ($stopList)))::DOUBLE / greatest($nToks, 1)::DOUBLE"
    val quality = s"""round(least(n_chars::DOUBLE / 500.0, 1.0) * 0.4
              + (1.0 - least(($punctRaw) * 5.0, 1.0)) * 0.3
              + least(($stopRaw) * 4.0, 1.0) * 0.3, 6)"""
    // the gate's score: the hashed-linear-classifier mean weight when
    // classifierDims is set (mirrors hashedLinearScores), the heuristic
    // quality formula otherwise
    val qvCte = classifierDims match {
      case Some(dims) =>
        s"""cw AS MATERIALIZED (SELECT b, (('0x' || substr(md5('qw:' || b::VARCHAR), 1, 8))::BIGINT
                     % 2001 - 1000) AS wm
                  FROM (SELECT unnest(range(0, $dims)) AS b)),
          cf AS MATERIALIZED (SELECT doc_id, (('0x' || substr(md5(tk), 1, 8))::BIGINT % $dims) AS b
                 FROM (SELECT doc_id, unnest($toks) AS tk FROM documents)),
          cs AS MATERIALIZED (SELECT doc_id, count(*) AS n, sum(wm)::BIGINT AS sm
                 FROM cf JOIN cw USING (b) GROUP BY 1),
          qv AS MATERIALIZED (SELECT d.doc_id, d.source,
                        round(sm::DOUBLE / (1000.0 * n::DOUBLE), 6) AS quality
                 FROM documents d JOIN cs USING (doc_id)),"""
      case None =>
        s"""qv AS MATERIALIZED (SELECT doc_id, source, $quality AS quality FROM documents),"""
    }
    val (qualityCtes, corpusSrc) = qualityKeep match {
      case None => ("", "documents")
      case Some(f) =>
        (s"""$qvCte
          qbyval AS MATERIALIZED (SELECT source, quality, count(*) AS nv FROM qv GROUP BY 1, 2),
          qcum AS MATERIALIZED (SELECT source, quality,
                          coalesce(sum(nv) OVER (PARTITION BY source ORDER BY quality DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
                          sum(nv) OVER (PARTITION BY source) AS tot
                   FROM qbyval),
          qkeep AS MATERIALIZED (SELECT source, quality FROM qcum
                    WHERE cum_before::DOUBLE < $f * tot::DOUBLE),
          qids AS MATERIALIZED (SELECT qv.doc_id FROM qv
                   JOIN qkeep ON qv.source = qkeep.source AND qv.quality = qkeep.quality),
          qdocs AS MATERIALIZED (SELECT d.* FROM documents d JOIN qids USING (doc_id)),
          """, "qdocs")
    }
    // optional fuzzy decontamination (Dedup.crossLshJaccard over the
    // post-dedup reps against the RAW benchmark): kept additionally
    // anti-joins the near-dup-contaminated ids
    val (fuzzyCtes, fuzzyPred) = fuzzy match {
      case None => ("", "")
      case Some(fj) =>
        (s"""
          fuzzybad AS MATERIALIZED (SELECT DISTINCT doc_id FROM
            (${decontaminateFuzzy(bands, rowsPerBand, fj, corpusSrc = "reps", benchMod = benchMod)})),""",
          " AND NOT EXISTS (SELECT 1 FROM fuzzybad f WHERE f.doc_id = r.doc_id)")
    }
    // optional span-level boilerplate cut (Dedup.spanDuplicates over the
    // pre-dedup corpus): kept additionally drops docs whose distinct
    // span-window set is >= maxDupFraction duplicated corpus-wide
    val (spanCtes, spanPred) = spanDedup match {
      case None => ("", "")
      case Some((n, frac)) =>
        (s"""
          sdg AS MATERIALIZED (SELECT DISTINCT doc_id,
                         ('0x' || substr(md5(g), 1, 15))::BIGINT AS gram
                  FROM (SELECT doc_id, unnest(${tokenShingles(n)}) AS g
                        FROM $corpusSrc)
                  WHERE length(g) > 0),
          sp AS MATERIALIZED (SELECT gram, count(*) AS n_docs FROM sdg GROUP BY 1),
          spanstat AS MATERIALIZED (SELECT sdg.doc_id, count(*) AS n_spans,
                              sum(CASE WHEN sp.n_docs > 1 THEN 1 ELSE 0 END) AS n_dup
                       FROM sdg JOIN sp USING (gram) GROUP BY 1),
          spanbad AS MATERIALIZED (SELECT doc_id FROM spanstat
                      WHERE n_dup::DOUBLE >= $frac * n_spans::DOUBLE),""",
          " AND NOT EXISTS (SELECT 1 FROM spanbad sb WHERE sb.doc_id = r.doc_id)")
    }
    // optional SEMANTIC dedup (Similarity.semanticDedup over the
    // quality-filtered corpus's embeddings, restricted by the same
    // semi-join the Spark stage applies): kept additionally drops docs
    // whose vector has a smaller-id within-cell twin at >= threshold
    val (semCtes, semPred) = semantic match {
      case None => ("", "")
      case Some(thr) =>
        (s"""
          ${ivfLloydCtes(8, 2,
            src = s"embeddings e JOIN $corpusSrc d ON e.vec_id = d.doc_id")},
          sembad AS MATERIALIZED (SELECT DISTINCT y.vid AS doc_id
                     FROM af x JOIN af y ON x.cell = y.cell AND x.vid < y.vid
                     WHERE ${cosineOf("x.v", "y.v")} >= $thr),""",
          " AND NOT EXISTS (SELECT 1 FROM sembad sm WHERE sm.doc_id = r.doc_id)")
    }
    // optional mixture stage (Corpus.temperatureMixtureSample over the
    // post-decontamination survivors): rates from the kept per-source
    // counts, keep iff the tmix:-salted coin clears ⌊sqrt(min/n)·2^32⌋
    val (mixtureCtes, finalSrc) = temperature match {
      case None => ("", "kept")
      case Some(_) =>
        (s""",
          kdocs AS MATERIALIZED (SELECT d.doc_id, d.source FROM $corpusSrc d JOIN kept USING (doc_id)),
          srcn AS MATERIALIZED (SELECT source, count(*) AS n FROM kdocs GROUP BY 1),
          minn AS MATERIALIZED (SELECT min(n) AS mn FROM srcn),
          rates AS MATERIALIZED (SELECT source, sqrt(mn::DOUBLE / n::DOUBLE) AS keep_rate
                    FROM srcn, minn),
          mixed AS MATERIALIZED (SELECT kdocs.doc_id FROM kdocs JOIN rates USING (source)
                    WHERE ${coinSql("tmix:")} < floor(keep_rate * 4294967296.0)::BIGINT)""",
          "mixed")
    }
    // every non-recursive CTE is MATERIALIZED: DuckDB inlines plain
    // CTEs, and reps (which embeds the recursive closure) is referenced
    // by dg, kept, and every optional decontamination stage — inlined,
    // the closure re-evaluates once per reference and the sf0.1 oracle
    // ran 30-60 MIN; materialized it runs once (~20x at sf0.01, same
    // treatment that took graph_influence_max's oracle from OOM to
    // 1.4 s). `reach` is the recursive member and must stay plain.
    s"""WITH RECURSIVE $qualityCtes
          pairs AS MATERIALIZED (${dedupLshJaccard(bands, rowsPerBand, minJaccard, src = corpusSrc)}),
          edges AS MATERIALIZED (SELECT a AS s, b AS d FROM pairs
                    UNION SELECT b AS s, a AS d FROM pairs),
          reach AS (
            SELECT s AS x, s AS y FROM (SELECT DISTINCT s FROM edges)
            UNION
            SELECT r.x, e.d AS y FROM reach r JOIN edges e ON r.y = e.s),
          cc AS MATERIALIZED (SELECT x AS id, min(y) AS cluster_id FROM reach GROUP BY x),
          reps AS MATERIALIZED (SELECT d.doc_id, d.text FROM $corpusSrc d
                   LEFT JOIN cc ON d.doc_id = cc.id
                   WHERE coalesce(cc.cluster_id, d.doc_id) = d.doc_id),
          bg AS MATERIALIZED (SELECT DISTINCT ('0x' || substr(md5(g), 1, 15))::BIGINT AS gram
                 FROM (SELECT unnest(${tokenShingles(nTokens)}) AS g
                       FROM documents WHERE doc_id % $benchMod = 0)
                 WHERE length(g) > 0),
          dg AS MATERIALIZED (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gram
                 FROM (SELECT doc_id, unnest(${tokenShingles(nTokens)}) AS g
                       FROM reps)
                 WHERE length(g) > 0),
          hits AS MATERIALIZED (SELECT dg.doc_id, count(DISTINCT dg.gram) AS n_gram_hits
                   FROM dg JOIN bg USING (gram) GROUP BY dg.doc_id),$fuzzyCtes$spanCtes$semCtes
          kept AS MATERIALIZED (SELECT r.doc_id FROM reps r LEFT JOIN hits h USING (doc_id)
                   WHERE coalesce(h.n_gram_hits, 0) < $minHits$fuzzyPred$spanPred$semPred)$mixtureCtes
        SELECT doc_id, CASE $whens ELSE '${splits.last._1}' END AS split
        FROM $finalSrc"""
  }

  def packChunks(targetTokens: Int): String =
    s"""WITH t AS (SELECT lang AS part, doc_id,
            len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))::BIGINT AS n_tokens
          FROM documents)
        SELECT part, doc_id, n_tokens,
               ((sum(n_tokens) OVER (PARTITION BY part ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - n_tokens) // $targetTokens)::BIGINT AS chunk_id
        FROM t"""

  /** Mirror of Corpus.shardPlan: packChunks' cumulative window, then
    * per-CHUNK rendezvous placement (the shard_rendezvous HRW argmax
    * over the chunk key part:chunk_id) and the epoch-salted order coin
    * (corpus_epoch_shuffle's md5 prefix), joined back to the packed
    * docs with the in-chunk doc sequence pinned by row_number. */
  def shardPlan(targetTokens: Int, nShards: Int, epoch: Int): String =
    s"""WITH t AS (SELECT lang AS part, doc_id,
            len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))::BIGINT AS n_tokens
          FROM documents),
        packed AS (
          SELECT part, doc_id, n_tokens,
                 ((sum(n_tokens) OVER (PARTITION BY part ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tokens) // $targetTokens)::BIGINT AS chunk_id
          FROM t),
        chunks AS (
          SELECT part, chunk_id, part || ':' || chunk_id::VARCHAR AS ck,
                 count(*)::BIGINT AS n_docs,
                 sum(n_tokens)::BIGINT AS chunk_tokens
          FROM packed GROUP BY 1, 2, 3),
        placed AS (
          SELECT ck,
                 substr(list_aggregate(list_transform(range(0, $nShards), s ->
                   substr(md5('hrw:' || s::VARCHAR || ':' || ck), 1, 15)
                     || lpad(s::VARCHAR, 4, '0')), 'max'), 16, 4)::INT AS shard
          FROM chunks),
        ordered AS (
          SELECT ck, ('0x' || substr(md5('epoch$epoch:' || ck), 1, 8))::BIGINT
                   AS order_key
          FROM chunks)
        SELECT p.shard, o.order_key, c.part, c.chunk_id,
               row_number() OVER (PARTITION BY c.part, c.chunk_id
                                  ORDER BY k.doc_id)::INT AS doc_seq,
               k.doc_id, k.n_tokens, c.chunk_tokens, c.n_docs
        FROM packed k
        JOIN chunks c USING (part, chunk_id)
        JOIN placed p USING (ck)
        JOIN ordered o USING (ck)"""

  /** Mirror of Corpus.packGreedyBins: the greedy next-fit fold as a
    * recursive CTE stepping one ordered row per (group, shard) —
    * recursion depth = rows per shard, bounded by shardRows. The step
    * mirrors the Spark fold's exact newBin condition (fill > 0 AND
    * fill + n > budget), so zero-token docs and oversize-first docs
    * agree across engines. */
  private def packGreedyCte(budgetTokens: Long, shardRows: Long): String =
    s"""WITH RECURSIVE base AS (
          SELECT source AS "group", doc_id // $shardRows AS shard, doc_id,
                 len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))::BIGINT AS n_tokens,
                 row_number() OVER (PARTITION BY source, doc_id // $shardRows
                                    ORDER BY doc_id) AS rn
          FROM documents),
        st AS (
          SELECT "group", shard, rn, doc_id, n_tokens,
                 0::BIGINT AS bin, n_tokens AS fill
          FROM base WHERE rn = 1
          UNION ALL
          SELECT b."group", b.shard, b.rn, b.doc_id, b.n_tokens,
                 CASE WHEN s.fill > 0 AND s.fill + b.n_tokens > $budgetTokens
                      THEN s.bin + 1 ELSE s.bin END,
                 CASE WHEN s.fill > 0 AND s.fill + b.n_tokens > $budgetTokens
                      THEN b.n_tokens ELSE s.fill + b.n_tokens END
          FROM st s JOIN base b
            ON b."group" = s."group" AND b.shard = s.shard
               AND b.rn = s.rn + 1)"""

  def packGreedy(budgetTokens: Long, shardRows: Long): String =
    s"""${packGreedyCte(budgetTokens, shardRows)}
        SELECT "group", shard, doc_id, n_tokens, bin,
               n_tokens > $budgetTokens AS oversize
        FROM st"""

  /** Mirror of Corpus.packEfficiency over the packGreedy CTE. */
  def packEfficiency(budgetTokens: Long, shardRows: Long): String =
    s"""${packGreedyCte(budgetTokens, shardRows)},
        bins AS (
          SELECT "group", shard, bin, sum(n_tokens) AS fill,
                 count(*) AS n_docs
          FROM st GROUP BY 1, 2, 3)
        SELECT "group", sum(n_docs)::BIGINT AS n_docs,
               count(*)::BIGINT AS n_bins,
               sum(fill)::BIGINT AS total_tokens,
               sum(greatest($budgetTokens - fill, 0))::BIGINT AS padding_waste,
               round(sum(fill)::DOUBLE /
                     (count(*) * $budgetTokens)::DOUBLE, 6) AS utilization
        FROM bins GROUP BY 1"""

  def tfidfTerms(k: Int): String =
    s"""WITH terms AS (SELECT doc_id, unnest(string_split($norm, ' ')) AS term FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
          df AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
          n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
          scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   round(tf.tf::DOUBLE * ln(n.n_docs / df.df::DOUBLE), 6) AS tfidf
            FROM tf JOIN df USING (term) CROSS JOIN n),
          ranked AS (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, term ASC) AS rank
            FROM scored)
        SELECT doc_id, term, tf, df, tfidf, rank::INT AS rank
        FROM ranked WHERE rank <= $k"""

  def dedupNgramJaccard(minJaccard: Double): String =
    s"""WITH grams AS (
          SELECT doc_id AS id, lang, source, unnest(${shingles(5)}) AS gram FROM documents),
        sizes AS (SELECT id, count(*) AS sz FROM grams GROUP BY id),
        inter AS (
          SELECT g1.id AS a, g2.id AS b, count(*) AS inter
          FROM grams g1 JOIN grams g2
            ON g1.lang = g2.lang AND g1.source = g2.source
           AND g1.gram = g2.gram AND g1.id < g2.id
          GROUP BY 1, 2)
        SELECT a, b, round(inter::DOUBLE / (sa.sz + sb.sz - inter)::DOUBLE, 6) AS jaccard
        FROM inter JOIN sizes sa ON sa.id = a JOIN sizes sb ON sb.id = b
        WHERE round(inter::DOUBLE / (sa.sz + sb.sz - inter)::DOUBLE, 6) >= $minJaccard"""

  /** Mirror of Dedup.ngramContainment: same distinct-shingle sets and
    * block keys, score = |A∩B| / min(|A|,|B|), sizes kept in the output. */
  def dedupContainment(minContainment: Double): String =
    s"""WITH grams AS (
          SELECT doc_id AS id, lang, source, unnest(${shingles(5)}) AS gram
          FROM documents),
        sizes AS (SELECT id, count(*) AS sz FROM grams GROUP BY id),
        inter AS (
          SELECT g1.id AS a, g2.id AS b, count(*) AS inter
          FROM grams g1 JOIN grams g2
            ON g1.lang = g2.lang AND g1.source = g2.source
           AND g1.gram = g2.gram AND g1.id < g2.id
          GROUP BY 1, 2)
        SELECT a, b, sa.sz::INT AS sz_a, sb.sz::INT AS sz_b,
               round(inter::DOUBLE / least(sa.sz, sb.sz)::DOUBLE, 6)
                 AS containment
        FROM inter JOIN sizes sa ON sa.id = a JOIN sizes sb ON sb.id = b
        WHERE round(inter::DOUBLE / least(sa.sz, sb.sz)::DOUBLE, 6)
          >= $minContainment"""

  /** Hashed linear classifier scoring (TextAnalysis.hashedLinearScores
    * with syntheticHashedWeights): the oracle re-derives the bucket
    * weights from the same salted md5 formula and scores by per-token
    * explode+join — the Spark side's zero-shuffle lambda must agree
    * integer-for-integer. */
  def qualityClassifier(dims: Int, thetaMilli: Long): String =
    s"""WITH w AS (
          SELECT b, (('0x' || substr(md5('qw:' || b::VARCHAR), 1, 8))::BIGINT
                     % 2001 - 1000) AS wm
          FROM (SELECT unnest(range(0, $dims)) AS b)),
        tok AS (SELECT doc_id, unnest($toks) AS tk FROM documents),
        f AS (SELECT doc_id,
                (('0x' || substr(md5(tk), 1, 8))::BIGINT % $dims) AS b
              FROM tok),
        s AS (SELECT doc_id, count(*) AS n, sum(wm)::BIGINT AS sm
              FROM f JOIN w USING (b) GROUP BY 1)
        SELECT doc_id, n::INT AS n_tokens,
          round(sm::DOUBLE / (1000.0 * n::DOUBLE), 6) AS score,
          sm >= $thetaMilli * n AS keep
        FROM s"""

  /** PPJoin exact set-similarity join (Dedup.ppjoinJaccard): the oracle
    * is BRUTE FORCE over all token-sharing pairs — prefix filtering is
    * a pure optimization, so the outputs must be identical. The
    * threshold compare is the same integer cross-multiplication
    * (num/10⁶ rational) the Spark side uses. */
  def dedupPpjoin(minJaccard: Double): String = {
    val num = math.round(minJaccard * 1e6)
    s"""WITH tok AS (
          SELECT doc_id, unnest(list_distinct($toks)) AS tk FROM documents
          WHERE doc_id % 4 = 0),
        sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
          FROM tok a JOIN tok b ON a.tk = b.tk AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT i.a, i.b,
          round(c::DOUBLE / (sa.n + sb.n - c)::DOUBLE, 6) AS jaccard
        FROM inter i JOIN sz sa ON i.a = sa.doc_id JOIN sz sb ON i.b = sb.doc_id
        WHERE c * 1000000 >= $num * (sa.n + sb.n - c)"""
  }

  /** Fixed-size per-group sample (Corpus.sampleFixedPerGroup): k
    * smallest salted md5 coins per group, id-tiebroken. */
  def sampleFixedPerGroup(k: Int): String =
    s"""SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                   ORDER BY ${coinSql("fixk:")} ASC, doc_id ASC) AS rnk
          FROM documents)
        WHERE rnk <= $k"""

  /** Split assignment (Corpus.assignSplits): same salted md5 coin and
    * the same cumulative ⌊(w/Σw)·2^32⌋ integer thresholds, computed HERE
    * from the same inputs so the literals cannot drift. */
  def assignSplits(splits: Seq[(String, Double)]): String = {
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
      .map(c => ((c / total) * 4294967296L).toLong)
    val coin = coinSql("split:")
    val whens = splits.map(_._1).zip(bounds).init
      .map { case (name, b) => s"WHEN $coin < $b THEN '$name'" }.mkString(" ")
    s"""SELECT doc_id, CASE $whens ELSE '${splits.last._1}' END AS split
        FROM documents"""
  }

  /** L2 normalization (Similarity.l2Normalize): same double-promoted
    * norm fold, zero-norm vectors pass through, 6-dp rounding. Parallel
    * unnests zip pos with value. */
  val embNormalize: String =
    """WITH t AS (SELECT vec_id, embedding,
          sqrt(list_aggregate(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum')) AS nrm
        FROM embeddings)
      SELECT vec_id,
             (unnest(range(len(embedding))))::INT AS pos,
             unnest(list_transform(embedding,
               x -> round(CASE WHEN nrm = 0 THEN x::DOUBLE ELSE x::DOUBLE / nrm END, 6))) AS val
      FROM t"""

  /** Mirror of Similarity.standardize: identical decimal-exact per-dim
    * moments (x rounded to 6 dp FIRST — the dimStats contract), mean
    * rounded 6 dp, σ = IEEE sqrt of the 8-dp population variance
    * clamped at 0; the Spark side pins the same values as literals, so
    * recomputing them here lands on the identical doubles. */
  val embStandardize: String =
    """WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> round(x::DOUBLE, 6)) AS v
           FROM embeddings),
        xp AS (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos
               FROM e),
        d AS (SELECT pos, count(*)::BIGINT AS n,
                     sum(x::DECIMAL(28,6))::DOUBLE AS s1,
                     sum((x*x)::DECIMAL(38,12))::DOUBLE AS s2
              FROM xp GROUP BY pos),
        st AS (SELECT pos, round(s1 / n, 6) AS m,
                      sqrt(greatest(round((s2 - s1*s1/n) / n, 8),
                                    0.0::DOUBLE)) AS s
               FROM d),
        ls AS (SELECT list(m ORDER BY pos) AS ml,
                      list(s ORDER BY pos) AS sl FROM st)
      SELECT e.vec_id,
             (unnest(range(len(e.v))))::INT AS pos,
             unnest(list_transform(list_zip(e.v, ls.ml, ls.sl),
               t -> CASE WHEN t[3] > 0 THEN round((t[1] - t[2]) / t[3], 6)
                    ELSE 0.0 END)) AS val
      FROM e, ls"""

  /** Mirror of Similarity.randomProjection: the same md5 plane matrix
    * as literal arrays, 6-dp-rounded zip-multiply folds. */
  def embRandomProjection(outDims: Int, dim: Int): String = {
    val comps = graft.operators.Similarity.planeMatrix(outDims, dim)
      .map { plane =>
        val planeLit = plane.map(_.toString).mkString("[", ", ", "]")
        s"round(list_aggregate(list_transform(list_zip(embedding, $planeLit)," +
          s" z -> z[1]::DOUBLE * z[2]), 'sum'), 6)"
      }.mkString("[", ", ", "]")
    s"""WITH t AS (SELECT vec_id, $comps AS l FROM embeddings)
       SELECT vec_id, (unnest(range(len(l))))::INT AS pos,
              unnest(l) AS val
       FROM t"""
  }

  /** Top principal component (Similarity.pcaTopComponent): the same
    * two-pass mean/covariance build (9-dp terms under DECIMAL(28,12)
    * sums — order-free, engine-exact) and the same L1-normalized power
    * rounds, unrolled. The covariance join is the brute-force
    * per-vector pairing; Spark's per-row d² lambda must aggregate to
    * the identical cells. */
  private def embPcaCtes(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""u$i AS MATERIALIZED (
            SELECT cc.i, sum(round(cc.c * v${i - 1}.vv, 9)::DECIMAL(28,12)) AS u
            FROM cc JOIN v${i - 1} ON cc.j = v${i - 1}.vj GROUP BY 1),
          v$i AS MATERIALIZED (
            SELECT i AS vj,
                   round(u::DOUBLE / (SELECT sum(abs(u)) FROM u$i)::DOUBLE, 9) AS vv
            FROM u$i)"""
    }.mkString(",\n")
    s"""cells AS MATERIALIZED (
          SELECT vec_id, (idx - 1) AS i, val::DOUBLE AS x
          FROM (SELECT vec_id, unnest(embedding) AS val,
                       generate_subscripts(embedding, 1) AS idx
                FROM embeddings)),
        mu AS MATERIALIZED (
          SELECT i, round(sum(round(x, 9)::DECIMAL(28,12))::DOUBLE / count(*), 9) AS mu
          FROM cells GROUP BY 1),
        cc AS MATERIALIZED (
          SELECT a.i AS i, b.i AS j,
                 round(sum(round((a.x - ma.mu) * (b.x - mb.mu), 9)::DECIMAL(28,12))::DOUBLE
                   / count(*), 9) AS c
          FROM cells a JOIN cells b USING (vec_id)
               JOIN mu ma ON ma.i = a.i JOIN mu mb ON mb.i = b.i
          GROUP BY 1, 2),
        v0 AS MATERIALIZED (SELECT DISTINCT i AS vj, 1.0::DOUBLE AS vv FROM cc),
        $steps"""
  }

  def embPca(iters: Int): String =
    s"""WITH ${embPcaCtes(iters)}
      SELECT vj::INT AS dim_idx, vv AS loading FROM v$iters"""

  /** Projection onto the component (Similarity.pcaProject): the same
    * unrolled component, then a per-vector sequential zip-fold — the
    * dimension-order dot product both engines fold identically. */
  def embPcaScores(iters: Int): String =
    s"""WITH ${embPcaCtes(iters)},
        parr AS MATERIALIZED (
          SELECT list(vv ORDER BY vj) AS carr FROM v$iters)
      SELECT vec_id,
             round(list_aggregate(list_transform(
               list_zip(embedding, (SELECT carr FROM parr)),
               z -> z[1]::DOUBLE * z[2]::DOUBLE), 'sum'), 6) AS pc1
      FROM embeddings"""

  /** Symmetric int8 quantization (Similarity.quantizeInt8): same
    * amax/127 scale, same clamp(round(x·127/amax)) codes. */
  val embQuantize: String =
    """WITH t AS (SELECT vec_id, embedding,
          list_aggregate(list_transform(embedding, x -> abs(x::DOUBLE)), 'max') AS amax
        FROM embeddings)
      SELECT vec_id, round(amax / 127.0, 9) AS scale,
             (unnest(range(len(embedding))))::INT AS pos,
             unnest(list_transform(embedding,
               x -> CASE WHEN amax = 0 THEN 0
                    ELSE least(greatest(round(x::DOUBLE * 127.0 / amax), -127), 127)::INT END)) AS q
      FROM t"""

  /** Mirror of Similarity.int8TopK: the embQuantize quantization, the
    * exact BIGINT code dot, and (sq·sc)·dot in the same fixed multiply
    * order. */
  def simInt8TopK(maxQueryId: Int, k: Int): String = {
    val dot = "list_aggregate(list_transform(list_zip(qs.qq, c.q), " +
      "z -> z[1]::BIGINT * z[2]::BIGINT), 'sum')"
    s"""WITH t AS (SELECT vec_id, embedding,
            list_aggregate(list_transform(embedding, x -> abs(x::DOUBLE)),
              'max') AS amax
          FROM embeddings),
          z AS (SELECT vec_id, amax / 127.0 AS scale,
                  list_transform(embedding,
                    x -> CASE WHEN amax = 0 THEN 0
                         ELSE least(greatest(
                           round(x::DOUBLE * 127.0 / amax), -127), 127)::INT
                         END) AS q
                FROM t),
          qs AS (SELECT vec_id AS query_id, scale AS sq, q AS qq
                 FROM z WHERE vec_id < $maxQueryId),
          scored AS (
            SELECT qs.query_id, c.vec_id AS neighbor_id,
                   round((qs.sq * c.scale) * ($dot)::DOUBLE, 6) AS score
            FROM z c CROSS JOIN qs WHERE c.vec_id <> qs.query_id),
          ranked AS (
            SELECT query_id, neighbor_id, score,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, neighbor_id ASC) AS rank
            FROM scored)
        SELECT query_id, neighbor_id, score, rank::INT AS rank
        FROM ranked WHERE rank <= $k"""
  }

  /** Sequential-fold dot/norm identical to Similarity.dot/norm, over any
    * two SQL list expressions. */
  def cosineOf(a: String, b: String): String = {
    val dot = s"list_aggregate(list_transform(list_zip($a, $b), z -> z[1]::DOUBLE * z[2]::DOUBLE), 'sum')"
    val na = s"sqrt(list_aggregate(list_transform($a, x -> x::DOUBLE * x::DOUBLE), 'sum'))"
    val nb = s"sqrt(list_aggregate(list_transform($b, x -> x::DOUBLE * x::DOUBLE), 'sum'))"
    s"round($dot / ($na * $nb), 6)"
  }

  /** Sequential-fold dot/norm identical to Similarity.dot/norm. */
  val cosineExpr: String = cosineOf("q.qv", "c.cv")

  /** Mirror of the layout_zorder_ranges composition: Layout.minMaxBucket
    * (floor-scaled min-max 8-bit buckets, the +1.0 half-open hi) and
    * Layout.mortonKey's bit interleave (col 0 on even bits), bucketed by
    * zkey >> 11 into the 32 would-be files. */
  val layoutZorderRanges: String = {
    def bucketOf(c: String, lo: String, hi: String): String =
      s"least(greatest(floor((($c::DOUBLE - $lo) / ($hi - $lo)) * 256), " +
        s"0.0::DOUBLE), 255.0::DOUBLE)::BIGINT"
    val interleave = (0 until 8).flatMap { b =>
      Seq(s"(((bp >> $b) & 1) << ${2 * b})", s"(((bs >> $b) & 1) << ${2 * b + 1})")
    }.mkString(" | ")
    s"""WITH mm AS (SELECT min(l_partkey)::DOUBLE AS p0,
                         max(l_partkey)::DOUBLE + 1.0::DOUBLE AS p1,
                         min(l_suppkey)::DOUBLE AS s0,
                         max(l_suppkey)::DOUBLE + 1.0::DOUBLE AS s1
                  FROM lineitem),
          b AS (SELECT l_partkey, l_suppkey,
                  ${bucketOf("l_partkey", "p0", "p1")} AS bp,
                  ${bucketOf("l_suppkey", "s0", "s1")} AS bs
                FROM lineitem CROSS JOIN mm),
          z AS (SELECT l_partkey, l_suppkey, ($interleave) AS zkey FROM b)
        SELECT zkey >> 11 AS bucket, count(*)::BIGINT AS n,
               min(l_partkey) AS min_part, max(l_partkey) AS max_part,
               min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
        FROM z GROUP BY 1"""
  }

  /** Mirror of Events.acfByType: the changePoint zero-filled spine,
    * per-type lead() windows, 9-dp deviation products under
    * DECIMAL(38,12), one acf division per lag. */
  def evAcf(maxLag: Int): String = {
    val leads = (1 to maxLag)
      .map(kk => s"lead(cnt, $kk) OVER w AS lead$kk").mkString(", ")
    val devC = "(l.cnt::DOUBLE - st.s::DOUBLE / st.m::DOUBLE)"
    val nums = (1 to maxLag).map { kk =>
      s"""sum((CASE WHEN lead$kk IS NOT NULL THEN
            round($devC * (lead$kk::DOUBLE - st.s::DOUBLE / st.m::DOUBLE), 9)
          ELSE 0 END)::DECIMAL(38,12)) AS num$kk"""
    }.mkString(",\n")
    val sels = (1 to maxLag).map { kk =>
      s"""SELECT event_type, $kk AS lag, m,
            CASE WHEN den > 0 THEN round(num$kk::DOUBLE / den::DOUBLE, 6)
            END AS acf FROM a"""
    }.mkString("\nUNION ALL ")
    s"""WITH c AS (SELECT event_type, date_trunc('hour', ts) AS b,
                          count(*) AS cnt
                   FROM events GROUP BY 1, 2),
          s AS (SELECT event_type, min(b) AS b0, max(b) AS b1
                FROM c GROUP BY 1),
          g AS (SELECT event_type,
                       unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS b
                FROM s),
          d AS (SELECT g.event_type, g.b, coalesce(c.cnt, 0)::BIGINT AS cnt
                FROM g LEFT JOIN c ON g.event_type = c.event_type
                                  AND g.b = c.b),
          st AS (SELECT event_type, count(*)::BIGINT AS m,
                        sum(cnt)::BIGINT AS s FROM d GROUP BY 1),
          l AS (SELECT event_type, b, cnt, $leads
                FROM d WINDOW w AS (PARTITION BY event_type ORDER BY b)),
          a AS (SELECT l.event_type, st.m,
                  sum(round($devC * $devC, 9)::DECIMAL(38,12)) AS den,
                  $nums
                FROM l JOIN st USING (event_type) GROUP BY 1, 2)
        $sels"""
  }

  /** Mirror of Events.anomaliesMad: both lower medians as order
    * statistics off per-type histograms, the 0.6745 Iglewicz-Hoaglin
    * constant verbatim, MAD-0 types emit nothing. */
  def evAnomalyMad(threshold: Double): String =
    s"""WITH ev AS (SELECT event_type AS g, event_id AS id,
                           round(value::DOUBLE, 6) AS v
                    FROM events
                    WHERE event_type IS NOT NULL AND value IS NOT NULL),
         h1 AS (SELECT g, v, count(*)::BIGINT AS c FROM ev GROUP BY 1, 2),
         k1 AS (SELECT g, floor((sum(c) + 1)::DOUBLE / 2.0::DOUBLE)::BIGINT
                  AS k FROM h1 GROUP BY 1),
         c1 AS (SELECT g, v, (sum(c) OVER (PARTITION BY g ORDER BY v
                  ROWS UNBOUNDED PRECEDING))::BIGINT AS cum FROM h1),
         med AS (SELECT c1.g, min(v) AS med
                 FROM c1 JOIN k1 ON c1.g = k1.g AND c1.cum >= k1.k
                 GROUP BY 1),
         resid AS (SELECT ev.g, ev.id, ev.v, med.med,
                          round(abs(ev.v - med.med), 6) AS r
                   FROM ev JOIN med ON ev.g = med.g),
         h2 AS (SELECT g, r AS v, count(*)::BIGINT AS c
                FROM resid GROUP BY 1, 2),
         k2 AS (SELECT g, floor((sum(c) + 1)::DOUBLE / 2.0::DOUBLE)::BIGINT
                  AS k FROM h2 GROUP BY 1),
         c2 AS (SELECT g, v, (sum(c) OVER (PARTITION BY g ORDER BY v
                  ROWS UNBOUNDED PRECEDING))::BIGINT AS cum FROM h2),
         mad AS (SELECT c2.g, min(v) AS mad
                 FROM c2 JOIN k2 ON c2.g = k2.g AND c2.cum >= k2.k
                 GROUP BY 1)
        SELECT resid.id AS event_id, resid.g AS event_type, resid.v,
               resid.med,
               round(0.6745::DOUBLE * resid.r / mad.mad, 6) AS mod_z
        FROM resid JOIN mad ON resid.g = mad.g
        WHERE mad.mad > 0
          AND round(0.6745::DOUBLE * resid.r / mad.mad, 6) > $threshold"""

  /** Mirror of the sim_matryoshka_recall composition: the exact
    * simCosineTopK ranking against the same ranking scored on the
    * `dims`-prefix slice, intersected per query. */
  def simMatryoshkaRecall(maxQueryId: Int, k: Int, dims: Int): String = {
    val sliced =
      s"""WITH q AS (SELECT vec_id AS query_id, embedding[1:$dims] AS qv
                     FROM embeddings WHERE vec_id < $maxQueryId),
            c AS (SELECT vec_id AS neighbor_id, embedding[1:$dims] AS cv
                  FROM embeddings),
            scored AS (SELECT q.query_id, c.neighbor_id, $cosineExpr AS sim
                       FROM c CROSS JOIN q
                       WHERE c.neighbor_id <> q.query_id),
            ranked AS (SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id
                           ORDER BY sim DESC, neighbor_id ASC) AS rank
                       FROM scored)
          SELECT query_id, neighbor_id FROM ranked WHERE rank <= $k"""
    s"""WITH ex AS (SELECT query_id, neighbor_id
                    FROM (${simCosineTopK(maxQueryId, k)}) x),
          ap AS (SELECT query_id, neighbor_id FROM ($sliced) y),
          h AS (SELECT ap.query_id, count(*)::BIGINT AS hits
                FROM ap JOIN ex ON ap.query_id = ex.query_id
                              AND ap.neighbor_id = ex.neighbor_id
                GROUP BY 1)
        SELECT qq.query_id, coalesce(h.hits, 0)::BIGINT AS hits,
               round(coalesce(h.hits, 0)::DOUBLE / ${k.toDouble}::DOUBLE, 6)
                 AS recall
        FROM (SELECT DISTINCT query_id FROM ex) qq
        LEFT JOIN h ON h.query_id = qq.query_id"""
  }

  /** Mirror of the sim_recall_at_k composition: the simCosineTopK and
    * simIvfTopK re-derivations nested as SUBQUERIES (their CTE
    * namespaces collide — q/scored/ranked — so each keeps its own WITH
    * scope), intersected on the pair key. */
  def simRecallAtK(
      maxQueryId: Int, k: Int, cells: Int, iters: Int, nProbe: Int): String =
    s"""WITH ex AS (SELECT query_id, neighbor_id
                    FROM (${simCosineTopK(maxQueryId, k)}) x),
          ap AS (SELECT query_id, neighbor_id
                 FROM (${simIvfTopK(cells, iters, nProbe, maxQueryId, k)}) y),
          h AS (SELECT ap.query_id, count(*)::BIGINT AS hits
                FROM ap JOIN ex ON ap.query_id = ex.query_id
                              AND ap.neighbor_id = ex.neighbor_id
                GROUP BY 1)
        SELECT qq.query_id, coalesce(h.hits, 0)::BIGINT AS hits,
               round(coalesce(h.hits, 0)::DOUBLE / ${k.toDouble}::DOUBLE, 6)
                 AS recall
        FROM (SELECT DISTINCT query_id FROM ex) qq
        LEFT JOIN h ON h.query_id = qq.query_id"""

  /** The stats_auc / stats_pr_curve input: textStats quality joined to
    * the Gopher keep decision (the text_gopher_rules parameters). */
  private val scoreLabelCtes: String =
    s"""ts AS ($textStats),
        gb AS (${textGopherRules(minTokens = 25, maxTokens = 100000,
      minAvgTokenLen = 3.0, maxAvgTokenLen = 10.0,
      maxPunctRatio = 0.2, minStopwordHits = 2)}),
        sl AS (SELECT ts.quality AS score, gb.pass
               FROM ts JOIN gb USING (doc_id)
               WHERE ts.quality IS NOT NULL AND gb.pass IS NOT NULL)"""

  /** Mirror of Quality.aucRoc: mannWhitney's doubled mid-ranks on the
    * 6-dp score histogram, rank-sum AUC as one exact-integer division. */
  val statsAuc: String =
    s"""WITH $scoreLabelCtes,
          c AS (SELECT round(score::DOUBLE, 6) AS v,
                       sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS ca,
                       sum(CASE WHEN pass THEN 0 ELSE 1 END)::BIGINT AS cb,
                       count(*)::BIGINT AS t
                FROM sl GROUP BY 1),
          r AS (SELECT ca, cb,
                  2 * coalesce(sum(t) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + t + 1 AS r2
                FROM c),
          g AS (SELECT sum(ca)::BIGINT AS n_pos, sum(cb)::BIGINT AS n_neg,
                       sum(ca::HUGEINT * r2) AS r2a FROM r)
        SELECT n_pos, n_neg,
               CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                 round((r2a - n_pos::HUGEINT * (n_pos + 1))::DOUBLE
                   / (2::HUGEINT * n_pos * n_neg)::DOUBLE, 6) END AS auc,
               CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                 round(2.0::DOUBLE
                   * ((r2a - n_pos::HUGEINT * (n_pos + 1))::DOUBLE
                      / (2::HUGEINT * n_pos * n_neg)::DOUBLE)
                   - 1.0::DOUBLE, 6) END AS gini
        FROM g"""

  /** Mirror of Quality.prCurve: decile-bucket histogram, suffix-sum
    * tp/fp over the literal 0..9 spine, identical division chains. */
  /** Mirror of Quality.gainsTable: the statsPrCurve decile spine with
    * cumulative population/positive shares and lift. */
  val statsGains: String =
    s"""WITH $scoreLabelCtes,
          c AS (SELECT greatest(least(floor(score::DOUBLE * 10.0::DOUBLE),
                         9.0::DOUBLE), 0.0::DOUBLE)::BIGINT AS bucket,
                       sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS pos,
                       count(*)::BIGINT AS n
                FROM sl GROUP BY 1),
          spine AS (SELECT unnest(generate_series(0, 9)) AS i),
          d AS (SELECT spine.i, coalesce(c.pos, 0)::BIGINT AS pos,
                       coalesce(c.n, 0)::BIGINT AS n
                FROM spine LEFT JOIN c ON c.bucket = spine.i),
          cum AS (SELECT i,
                    (sum(pos) OVER w)::BIGINT AS cum_pos,
                    (sum(n) OVER w)::BIGINT AS cum_n
                  FROM d WINDOW w AS (ORDER BY i DESC
                    ROWS UNBOUNDED PRECEDING)),
          t AS (SELECT sum(pos)::BIGINT AS tot_pos,
                       sum(n)::BIGINT AS tot_n FROM d)
        SELECT i::INT AS score_decile, cum_n, cum_pos,
               CASE WHEN t.tot_n > 0 THEN
                 round(cum_n::DOUBLE / t.tot_n::DOUBLE, 6) END AS pop_share,
               CASE WHEN t.tot_pos > 0 THEN
                 round(cum_pos::DOUBLE / t.tot_pos::DOUBLE, 6) END AS gain,
               CASE WHEN cum_n > 0 AND t.tot_pos > 0 AND t.tot_n > 0 THEN
                 round((cum_pos::DOUBLE * t.tot_n::DOUBLE)
                   / (cum_n::DOUBLE * t.tot_pos::DOUBLE), 6) END AS lift
        FROM cum CROSS JOIN t"""

  val statsPrCurve: String =
    s"""WITH $scoreLabelCtes,
          c AS (SELECT greatest(least(floor(score::DOUBLE * 10.0::DOUBLE),
                         9.0::DOUBLE), 0.0::DOUBLE)::BIGINT AS bucket,
                       sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS pos,
                       sum(CASE WHEN pass THEN 0 ELSE 1 END)::BIGINT AS neg
                FROM sl GROUP BY 1),
          spine AS (SELECT unnest(generate_series(0, 9)) AS i),
          d AS (SELECT spine.i, coalesce(c.pos, 0)::BIGINT AS pos,
                       coalesce(c.neg, 0)::BIGINT AS neg
                FROM spine LEFT JOIN c ON c.bucket = spine.i),
          cum AS (SELECT i,
                    (sum(pos) OVER w)::BIGINT AS tp,
                    (sum(neg) OVER w)::BIGINT AS fp
                  FROM d WINDOW w AS (ORDER BY i DESC
                    ROWS UNBOUNDED PRECEDING)),
          t AS (SELECT sum(pos)::BIGINT AS tot_pos FROM d)
        SELECT i::INT AS threshold_decile, tp, fp,
               (t.tot_pos - tp)::BIGINT AS fn,
               CASE WHEN tp + fp > 0 THEN
                 round(tp::DOUBLE / (tp + fp)::DOUBLE, 6) END AS precision,
               CASE WHEN t.tot_pos > 0 THEN
                 round(tp::DOUBLE / t.tot_pos::DOUBLE, 6) END AS recall,
               CASE WHEN tp + fp > 0 AND t.tot_pos > 0 AND tp > 0 THEN
                 round(2.0::DOUBLE
                   * (tp::DOUBLE / (tp + fp)::DOUBLE)
                   * (tp::DOUBLE / t.tot_pos::DOUBLE)
                   / ((tp::DOUBLE / (tp + fp)::DOUBLE)
                     + (tp::DOUBLE / t.tot_pos::DOUBLE)), 6) END AS f1
        FROM cum CROSS JOIN t"""

  /** Mirror of the quality_calibration composition: textStats quality
    * joined to the C4 keep decision, decile bins, decimal mean score. */
  def qualityCalibration(minWords: Int): String =
    s"""WITH ts AS ($textStats),
          c4 AS (${textC4Rules(minWords)}),
          j AS (SELECT ts.quality AS score, c4.pass
                FROM ts JOIN c4 USING (doc_id)),
          b AS (SELECT greatest(least(floor(score * 10.0::DOUBLE),
                             9.0::DOUBLE), 0.0::DOUBLE)::BIGINT AS bin,
                       score,
                       (CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS y
                FROM j WHERE score IS NOT NULL AND pass IS NOT NULL)
        SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pass,
               round(sum(round(score, 6)::DECIMAL(28,6))::DOUBLE
                 / count(*)::DOUBLE, 6) AS mean_score,
               round(sum(y)::DOUBLE / count(*)::DOUBLE, 6) AS pass_rate
        FROM b GROUP BY 1"""

  /** Mirror of Similarity.ndcgAtK: same cosine ranking as simCosineTopK,
    * binary same-label relevance, and the SAME 9-dp discount/ideal
    * constants Similarity.discounts computes (no engine evaluates a
    * log at query time — the shared-constants pattern). */
  def retrievalNdcg(maxQueryId: Int, k: Int): String = {
    val disc = graft.operators.Similarity.discounts(k)
    val ideal = disc.scanLeft(BigDecimal(0))(_ + _).tail
    val dl = disc.map(d => s"$d::DECIMAL(18,9)").mkString(", ")
    val il = ideal.map(d => s"$d::DECIMAL(18,9)").mkString(", ")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
                   FROM embeddings WHERE vec_id < $maxQueryId),
          c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                       label AS clabel FROM embeddings),
          scored AS (
            SELECT q.query_id, q.qlabel, c.clabel, c.neighbor_id,
                   $cosineExpr AS sim
            FROM c CROSS JOIN q WHERE c.neighbor_id <> q.query_id),
          ranked AS (
            SELECT query_id, qlabel, clabel,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM scored),
          agg AS (
            SELECT query_id,
                   sum(CASE WHEN clabel = qlabel THEN 1 ELSE 0 END)::BIGINT
                     AS n_rel,
                   sum(CASE WHEN clabel = qlabel
                       THEN list_extract([$dl], rank)
                       ELSE 0::DECIMAL(18,9) END) AS dcg
            FROM ranked WHERE rank <= $k GROUP BY 1)
        SELECT query_id, n_rel, round(dcg::DOUBLE, 6) AS dcg,
               CASE WHEN n_rel > 0 THEN
                 round(dcg::DOUBLE
                   / list_extract([$il], n_rel::INT)::DOUBLE, 6)
               END AS ndcg
        FROM agg"""
  }

  /** One 32-bit sign word of Similarity.signWords: bit j−1 of word `w`
    * set iff component w·32+j is ≥ 0 — disjoint powers of two, summed. */
  private def signWord(e: String, w: Int): String =
    s"(list_aggregate(list_transform(generate_series(1, 32), " +
      s"j -> CASE WHEN $e[${w * 32} + j] >= 0 THEN (1::BIGINT << (j - 1)) " +
      s"ELSE 0 END), 'sum'))::BIGINT"

  /** Mirror of Similarity.hammingTopK: same sign-bit words, XOR +
    * bit_count coarse ranking, exact-cosine rerank of the shortlist. */
  def simHammingTopK(maxQueryId: Int, m: Int, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
                 ${signWord("embedding", 0)} AS qw0,
                 ${signWord("embedding", 1)} AS qw1
               FROM embeddings WHERE vec_id < $maxQueryId),
          c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                 ${signWord("embedding", 0)} AS cw0,
                 ${signWord("embedding", 1)} AS cw1
               FROM embeddings),
          h AS (SELECT q.query_id, c.neighbor_id, q.qv, c.cv,
                 (bit_count(xor(qw0, cw0)) + bit_count(xor(qw1, cw1)))::INT
                   AS hamming
               FROM c CROSS JOIN q WHERE c.neighbor_id <> q.query_id),
          coarse AS (SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY hamming, neighbor_id) AS crn FROM h),
          fine AS (SELECT query_id, neighbor_id, hamming,
                     ${cosineOf("qv", "cv")} AS sim
                   FROM coarse WHERE crn <= $m),
          ranked AS (SELECT query_id, neighbor_id, hamming, sim,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY sim DESC, neighbor_id) AS rank
                     FROM fine)
        SELECT query_id, neighbor_id, hamming, sim, rank::INT AS rank
        FROM ranked WHERE rank <= $k"""

  /** Mirror of Similarity.kCenterCoreset: unrolled farthest-point
    * rounds, min-dist accumulated by least() (associative — identical
    * to the Spark side's per-round least over all pinned centers). */
  def simKCenter(k: Int): String = {
    require(k >= 2, "the unrolled oracle needs k >= 2")
    val rounds = (2 to k).map { r =>
      val dPrev = if (r == 2) "c" else s"d${r - 2}"
      val dExpr =
        if (r == 2) sqDistOf("c.v", "s1.v")
        else s"least(d${r - 2}.d, ${sqDistOf(s"d${r - 2}.v", s"s${r - 1}.v")})"
      s"""d${r - 1} AS (SELECT $dPrev.vid, $dPrev.v, $dExpr AS d
            FROM $dPrev, s${r - 1} WHERE $dPrev.vid <> s${r - 1}.vid),
          s$r AS (SELECT vid, v, d FROM d${r - 1}
                  ORDER BY d DESC, vid LIMIT 1)"""
    }.mkString(",\n")
    val sel = (1 to k).map { r =>
      if (r == 1) s"SELECT 1 AS rank, vid AS vec_id, NULL::DOUBLE AS dist FROM s1"
      else s"SELECT $r AS rank, vid AS vec_id, d AS dist FROM s$r"
    }.mkString("\nUNION ALL ")
    s"""WITH c AS (SELECT vec_id AS vid, embedding AS v FROM embeddings),
          s1 AS (SELECT vid, v FROM c ORDER BY vid LIMIT 1),
          $rounds
        $sel"""
  }

  /** Mirror of Similarity.mmrDiversify: the query-0 cosine shortlist,
    * then unrolled greedy picks of λ·rel − (1−λ)·max-sim-to-chosen.
    * The (1−λ) literal is the Scala double's exact shortest repr, cast
    * ::DOUBLE so DuckDB lands on the same IEEE value. */
  def retrievalMmr(lambda: Double, m: Int, k: Int): String = {
    val oneMinus = 1.0d - lambda
    val rounds = (1 to k).map { r =>
      if (r == 1)
        s"""s1 AS (SELECT vid, v, rel,
              round($lambda::DOUBLE * rel - $oneMinus::DOUBLE * 0.0::DOUBLE, 9)
                AS score
            FROM cands ORDER BY score DESC, vid LIMIT 1)"""
      else {
        val prev = (1 until r).map(i => s"s$i")
        val sims = prev.map(p => cosineOf("c.v", s"$p.v")).mkString(", ")
        val red = if (prev.size == 1) sims else s"greatest($sims)"
        val excl = prev.map(p => s"c.vid <> $p.vid").mkString(" AND ")
        s"""s$r AS (SELECT c.vid, c.v, c.rel,
              round($lambda::DOUBLE * c.rel - $oneMinus::DOUBLE * ($red), 9)
                AS score
            FROM cands c, ${prev.mkString(", ")} WHERE $excl
            ORDER BY score DESC, c.vid LIMIT 1)"""
      }
    }.mkString(",\n")
    val sel = (1 to k)
      .map(r => s"SELECT $r AS rank, vid AS vec_id, rel, score FROM s$r")
      .mkString("\nUNION ALL ")
    s"""WITH qq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
          cands AS (SELECT vec_id AS vid, embedding AS v,
                           ${cosineOf("embedding", "qv")} AS rel
                    FROM embeddings, qq WHERE vec_id <> 0
                    ORDER BY rel DESC, vid LIMIT $m),
          $rounds
        $sel"""
  }

  /** Mirror of Similarity.knnGraph: the [[simLshTopK]] re-derivation
    * with the broadcast query join replaced by the bucket-key
    * self-join — every node ranked against its bucket mates. */
  def simKnnGraph(numPlanes: Int, dim: Int, k: Int,
      src: String = "embeddings"): String = {
    def bucketExpr(vcol: String): String =
      graft.operators.Similarity.planeMatrix(numPlanes, dim).zipWithIndex.map {
        case (plane, p) =>
          val planeLit = plane.map(_.toString).mkString("[", ", ", "]")
          val proj = s"list_aggregate(list_transform(list_zip($vcol, $planeLit), z -> z[1]::DOUBLE * z[2]), 'sum')"
          s"CASE WHEN round($proj, 6) > 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", " + ", ")")
    s"""WITH c AS (SELECT vec_id AS id, embedding AS v,
                          ${bucketExpr("embedding")} AS bucket FROM $src),
          scored AS (
            SELECT a.id AS src, b.id AS neighbor_id, ${cosineOf("a.v", "b.v")} AS sim
            FROM c a JOIN c b ON a.bucket = b.bucket AND a.id <> b.id),
          ranked AS (
            SELECT src, neighbor_id, sim,
                   row_number() OVER (PARTITION BY src ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM scored)
        SELECT src, neighbor_id, sim, rank::INT AS rank FROM ranked WHERE rank <= $k"""
  }

  /** Mirror of Similarity.graphGreedyTopK: the [[simKnnGraph]]
    * re-derivation as the edge CTE, then the greedy descent UNROLLED
    * hop by hop — candidates = out-edges of the current node ∪ the
    * current node itself, argmax of the 6-dp-rounded cosine with ties
    * to the lowest id, entry = lowest corpus id (second-lowest for
    * that node's own query). Emits the full trajectory. */
  def simNswTopK(numPlanes: Int, dim: Int, degree: Int, maxHops: Int,
      maxQueryId: Int): String = {
    val hopCtes = (1 to maxHops).map { h =>
      val p = if (h == 1) "h0" else s"h${h - 1}"
      s"""c$h AS (SELECT p.query_id, p.qv, k.neighbor_id AS cnode
                  FROM $p p JOIN knn k ON k.src = p.node
                               AND k.neighbor_id <> p.query_id
                  UNION ALL SELECT query_id, qv, node FROM $p),
          s$h AS (SELECT c.query_id, c.qv, c.cnode,
                         ${cosineOf("c.qv", "vv.v")} AS csim
                  FROM c$h c JOIN v vv ON vv.id = c.cnode),
          h$h AS (SELECT query_id, qv, cnode AS node, csim AS sim FROM (
                    SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY csim DESC, cnode ASC) AS rn FROM s$h)
                  WHERE rn = 1)"""
    }.mkString(",\n")
    val traj = (0 to maxHops)
      .map(h => s"SELECT query_id, $h::INT AS hop, node AS node_id, sim FROM h$h")
      .mkString("\nUNION ALL ")
    s"""WITH knn AS (${simKnnGraph(numPlanes, dim, degree)}),
          v AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
          q AS (SELECT vec_id AS query_id, embedding AS qv
                FROM embeddings WHERE vec_id < $maxQueryId),
          ent AS (SELECT min(id) AS m1, max(id) AS m2
                  FROM (SELECT id FROM v ORDER BY id LIMIT 2)),
          h0 AS (SELECT qq.query_id, qq.qv, vv.node,
                        ${cosineOf("qq.qv", "vv.v")} AS sim
                 FROM (SELECT q.query_id, q.qv,
                              CASE WHEN q.query_id = e.m1 THEN e.m2
                                   ELSE e.m1 END AS node
                       FROM q, ent e) qq
                 JOIN (SELECT v.id AS node, v.v AS v FROM v) vv USING (node)),
          $hopCtes
        $traj"""
  }

  /** Mirror of Similarity.hnswTopK: two [[simKnnGraph]] edge CTEs
    * (layer 1 = the md5-mod-layerMod node subset, layer 0 = full
    * corpus), the layer-1 greedy hops unrolled from the upper-layer
    * entry point, then the layer-0 hops unrolled from the layer-1
    * terminus. Same candidate rule (out-edges ∪ current, query node
    * excluded), same 6-dp cosine argmax, same tie-break. */
  def simHnswTopK(numPlanes: Int, dim: Int, degree: Int, maxHops1: Int,
      maxHops0: Int, layerMod: Int, maxQueryId: Int): String = {
    val upperSrc = "(SELECT vec_id, embedding FROM embeddings " +
      s"WHERE ('0x' || substr(md5('hnsw:' || vec_id::VARCHAR), 1, 15))" +
      s"::BIGINT % $layerMod = 0)"
    def hopChain(edge: String, tag: String, start: String, n: Int): String =
      (1 to n).map { h =>
        val p = if (h == 1) start else s"$tag${h - 1}"
        s"""c$tag$h AS (SELECT p.query_id, p.qv, k.neighbor_id AS cnode
                    FROM $p p JOIN $edge k ON k.src = p.node
                                 AND k.neighbor_id <> p.query_id
                    UNION ALL SELECT query_id, qv, node FROM $p),
            s$tag$h AS (SELECT c.query_id, c.qv, c.cnode,
                           ${cosineOf("c.qv", "vv.v")} AS csim
                    FROM c$tag$h c JOIN v vv ON vv.id = c.cnode),
            $tag$h AS (SELECT query_id, qv, cnode AS node, csim AS sim FROM (
                      SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY csim DESC, cnode ASC) AS rn FROM s$tag$h)
                    WHERE rn = 1)"""
      }.mkString(",\n")
    val l1 = hopChain("knn1", "g", "h0", maxHops1)
    val l0 = hopChain("knn0", "z", s"g$maxHops1", maxHops0)
    val traj =
      (Seq(s"SELECT query_id, 1::INT AS layer, 0::INT AS hop, node AS node_id, sim FROM h0") ++
        (1 to maxHops1).map(h =>
          s"SELECT query_id, 1::INT, $h::INT, node, sim FROM g$h") ++
        (1 to maxHops0).map(h =>
          s"SELECT query_id, 0::INT, $h::INT, node, sim FROM z$h"))
        .mkString("\nUNION ALL ")
    s"""WITH knn1 AS (${simKnnGraph(numPlanes, dim, degree, upperSrc)}),
          knn0 AS (${simKnnGraph(numPlanes, dim, degree)}),
          v AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
          q AS (SELECT vec_id AS query_id, embedding AS qv
                FROM embeddings WHERE vec_id < $maxQueryId),
          ent AS (SELECT min(id) AS m1, max(id) AS m2
                  FROM (SELECT vec_id AS id FROM $upperSrc uu
                        ORDER BY vec_id LIMIT 2)),
          h0 AS (SELECT qq.query_id, qq.qv, vv.node,
                        ${cosineOf("qq.qv", "vv.v")} AS sim
                 FROM (SELECT q.query_id, q.qv,
                              CASE WHEN q.query_id = e.m1 THEN e.m2
                                   ELSE e.m1 END AS node
                       FROM q, ent e) qq
                 JOIN (SELECT v.id AS node, v.v AS v FROM v) vv USING (node)),
          $l1,
          $l0
        $traj"""
  }

  /** Mirror of the sim_nsw_recall composition: [[simNswTopK]]'s
    * terminal hop vs the exact brute-force cosine top-1 per anchor
    * (Similarity.recallAtK at k = 1). */
  def simNswRecall(numPlanes: Int, dim: Int, degree: Int, maxHops: Int,
      maxQueryId: Int): String =
    s"""WITH nsw AS (${simNswTopK(numPlanes, dim, degree, maxHops, maxQueryId)}),
          term AS (SELECT query_id, node_id AS neighbor_id FROM nsw
                   WHERE hop = $maxHops),
          bf AS (SELECT query_id, neighbor_id FROM (
                   SELECT q.query_id, c.neighbor_id,
                          row_number() OVER (PARTITION BY q.query_id
                            ORDER BY $cosineExpr DESC, c.neighbor_id ASC) AS rn
                   FROM (SELECT vec_id AS neighbor_id, embedding AS cv
                         FROM embeddings) c,
                        (SELECT vec_id AS query_id, embedding AS qv
                         FROM embeddings WHERE vec_id < $maxQueryId) q
                   WHERE c.neighbor_id <> q.query_id) WHERE rn = 1),
          hits AS (SELECT t.query_id, count(*)::BIGINT AS hits
                   FROM term t JOIN bf b ON b.query_id = t.query_id
                     AND b.neighbor_id = t.neighbor_id
                   GROUP BY 1)
        SELECT q.query_id, coalesce(h.hits, 0)::BIGINT AS hits,
               round(coalesce(h.hits, 0)::DOUBLE, 6) AS recall
        FROM (SELECT DISTINCT query_id FROM bf) q
        LEFT JOIN hits h USING (query_id)"""

  /** Sign-LSH ANN top-k re-derived in full: the SAME md5-derived
    * hyperplane matrix (Similarity.planeMatrix — computed here in Scala
    * and embedded as double literals, exactly as the Spark plan embeds
    * it), the same 6-dp-rounded projection sign per plane, the same
    * in-bucket cosine ranking. `Double.toString` round-trips, so the SQL
    * literals are bit-identical to the plan's. */
  def simLshTopK(numPlanes: Int, dim: Int, maxQueryId: Int, k: Int): String = {
    def bucketExpr(vcol: String): String =
      graft.operators.Similarity.planeMatrix(numPlanes, dim).zipWithIndex.map {
        case (plane, p) =>
          val planeLit = plane.map(_.toString).mkString("[", ", ", "]")
          val proj = s"list_aggregate(list_transform(list_zip($vcol, $planeLit), z -> z[1]::DOUBLE * z[2]), 'sum')"
          s"CASE WHEN round($proj, 6) > 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", " + ", ")")
    s"""WITH c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                          ${bucketExpr("embedding")} AS bucket FROM embeddings),
          q AS (SELECT vec_id AS query_id, embedding AS qv,
                       ${bucketExpr("embedding")} AS bucket
                FROM embeddings WHERE vec_id < $maxQueryId),
          scored AS (
            SELECT q.query_id, c.neighbor_id, $cosineExpr AS sim
            FROM c JOIN q ON c.bucket = q.bucket
            WHERE c.neighbor_id <> q.query_id),
          ranked AS (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM scored)
        SELECT query_id, neighbor_id, sim, rank::INT AS rank FROM ranked WHERE rank <= $k"""
  }

  /** IVF ANN top-k re-derived in full: deterministic k-means-lite with
    * the Lloyd loop UNROLLED ($iters fixed steps), mirroring
    * Similarity.ivfIndex exactly — init centroids = first `cells` vectors
    * by id RANK, cell = rank-1 (6-dp-rounded doubles, as `pin` rounds;
    * identical to the id-VALUE form on the dense fixture, but robust to
    * sparse id spaces like the Spark side), assign = argmax of
    * 6-dp-rounded cosine with ties to the lowest cell, update = per-(cell,
    * pos) mean rounded to 6 dp (the rounding is what makes Spark's
    * summation-order-sensitive `avg` and DuckDB's agree). Probe + rank as
    * in ivfTopK. */
  /** The Lloyd-unroll CTE prefix shared by every IVF oracle: CTEs `v`
    * (the corpus), `c0..c$iters` (centroid generations) and `af` (the
    * final cell assignment) — mirroring Similarity.ivfIndex exactly. */
  private def ivfLloydCtes(cells: Int, iters: Int,
      src: String = "embeddings"): String = {
    // MATERIALIZED throughout: v is scanned by every unrolled Lloyd
    // round and af by every downstream pair join — inlined they
    // re-evaluate per reference
    def assign(name: String, centsCte: String): String =
      s"""$name AS MATERIALIZED (
            SELECT vid, v, cell FROM (
              SELECT vv.vid, vv.v, cc.cell,
                     row_number() OVER (PARTITION BY vv.vid
                       ORDER BY ${cosineOf("vv.v", "cc.cv")} DESC, cc.cell ASC) AS rn
              FROM v vv CROSS JOIN $centsCte cc) WHERE rn = 1)"""
    def update(name: String, assignCte: String): String =
      s"""$name AS MATERIALIZED (
            SELECT cell, list(mr ORDER BY pos) AS cv FROM (
              SELECT cell, pos, round(avg(x), 6) AS mr FROM (
                SELECT cell, unnest(v)::DOUBLE AS x, generate_subscripts(v, 1) AS pos
                FROM $assignCte)
              GROUP BY cell, pos) GROUP BY cell)"""
    val steps = (1 to iters).flatMap { i =>
      Seq(assign(s"a$i", s"c${i - 1}"), update(s"c$i", s"a$i"))
    }
    s"""v AS MATERIALIZED (SELECT vec_id AS vid, embedding AS v FROM $src),
          c0 AS MATERIALIZED (SELECT (row_number() OVER (ORDER BY vid) - 1)::INT AS cell,
                        list_transform(v, x -> round(x::DOUBLE, 6)) AS cv
                 FROM v QUALIFY row_number() OVER (ORDER BY vid) <= $cells),
          ${steps.mkString(",\n          ")},
          ${assign("af", s"c$iters")}"""
  }

  /** 6-dp-rounded Euclidean squared distance mirroring
    * Similarity.sqDist's fold. */
  def sqDistOf(a: String, b: String): String =
    s"round(list_aggregate(list_transform(list_zip($a, $b), " +
      s"z -> (z[1]::DOUBLE - z[2]::DOUBLE) * (z[1]::DOUBLE - z[2]::DOUBLE)), " +
      s"'sum'), 6)"

  /** Mirror of Similarity.kmeans: unrolled L2 Lloyd rounds — the
    * [[ivfLloydCtes]] shape with the Euclidean argmin (dist ASC, cell
    * ASC) instead of cosine — and a final assignment keeping the 6-dp
    * squared distance. */
  def simKmeans(k: Int, iters: Int): String = {
    def assign(name: String, centsCte: String, keepD: Boolean): String = {
      val dCol = if (keepD) ", d" else ""
      s"""$name AS (
            SELECT vid, v, cell$dCol FROM (
              SELECT vv.vid, vv.v, cc.cell,
                     ${sqDistOf("vv.v", "cc.cv")} AS d,
                     row_number() OVER (PARTITION BY vv.vid
                       ORDER BY ${sqDistOf("vv.v", "cc.cv")} ASC, cc.cell ASC) AS rn
              FROM v vv CROSS JOIN $centsCte cc) WHERE rn = 1)"""
    }
    def update(name: String, assignCte: String): String =
      s"""$name AS (
            SELECT cell, list(mr ORDER BY pos) AS cv FROM (
              SELECT cell, pos, round(avg(x), 6) AS mr FROM (
                SELECT cell, unnest(v)::DOUBLE AS x, generate_subscripts(v, 1) AS pos
                FROM $assignCte)
              GROUP BY cell, pos) GROUP BY cell)"""
    val steps = (1 to iters).flatMap { i =>
      Seq(assign(s"a$i", s"c${i - 1}", keepD = false), update(s"c$i", s"a$i"))
    }
    s"""WITH v AS (SELECT vec_id AS vid, embedding AS v FROM embeddings),
          c0 AS (SELECT (row_number() OVER (ORDER BY vid) - 1)::INT AS cell,
                        list_transform(v, x -> round(x::DOUBLE, 6)) AS cv
                 FROM v QUALIFY row_number() OVER (ORDER BY vid) <= $k),
          ${steps.mkString(",\n          ")},
          ${assign("af", s"c$iters", keepD = true)}
        SELECT vid AS vec_id, cell AS cluster, d AS sq_dist FROM af"""
  }

  /** IVF-cell-blocked cosine pairs (Similarity.ivfCosinePairs): the same
    * unrolled Lloyd assignment, then exact within-cell pair scoring. */
  def simIvfPairs(cells: Int, iters: Int, threshold: Double): String =
    s"""WITH ${ivfLloydCtes(cells, iters)}
        SELECT x.vid AS a, y.vid AS b, ${cosineOf("x.v", "y.v")} AS sim
        FROM af x JOIN af y ON x.cell = y.cell AND x.vid < y.vid
        WHERE ${cosineOf("x.v", "y.v")} >= $threshold"""

  /** SemDeDup verdicts (Similarity.semanticDedup): the same unrolled
    * Lloyd assignment; dropped = any vector with a SMALLER-id within-cell
    * neighbor at >= threshold (6-dp-rounded cosine, as cosineOf rounds). */
  /** Mirror of Similarity.semanticDecontaminate: the corpus-built
    * Lloyd unroll (corpus = vec_id % benchMod <> 0), bench vectors
    * ranked against the FINAL centroid table keeping top nProbe cells,
    * one bipartite cell join, hits at >= threshold — LEFT JOIN keeps
    * clean docs with n_bench_hits 0 and null max_sim. */
  def decontaminateSemantic(cells: Int, iters: Int, nProbe: Int,
      threshold: Double, benchMod: Int): String =
    s"""WITH ${ivfLloydCtes(cells, iters,
          src = s"embeddings WHERE vec_id % $benchMod <> 0")},
          bench AS (SELECT vec_id AS bench_id, embedding AS bv
                    FROM embeddings WHERE vec_id % $benchMod = 0),
          bp AS (SELECT bench_id, bv, cell FROM (
                   SELECT b.bench_id, b.bv, cc.cell,
                          row_number() OVER (PARTITION BY b.bench_id
                            ORDER BY ${cosineOf("b.bv", "cc.cv")} DESC,
                                     cc.cell ASC) AS rn
                   FROM bench b CROSS JOIN c$iters cc) WHERE rn <= $nProbe),
          hits AS (SELECT a.vid, count(*)::BIGINT AS n_bench_hits,
                          max(${cosineOf("a.v", "p.bv")}) AS max_sim
                   FROM af a JOIN bp p USING (cell)
                   WHERE ${cosineOf("a.v", "p.bv")} >= $threshold
                   GROUP BY 1)
        SELECT af.vid AS vec_id, af.cell,
               (h.vid IS NOT NULL) AS contaminated,
               coalesce(h.n_bench_hits, 0)::BIGINT AS n_bench_hits,
               h.max_sim
        FROM af LEFT JOIN hits h ON af.vid = h.vid"""

  def dedupSemantic(cells: Int, iters: Int, threshold: Double): String =
    s"""WITH ${ivfLloydCtes(cells, iters)},
          dropped AS (
            SELECT DISTINCT y.vid AS b
            FROM af x JOIN af y ON x.cell = y.cell AND x.vid < y.vid
            WHERE ${cosineOf("x.v", "y.v")} >= $threshold)
        SELECT af.vid AS vec_id, af.cell, (d.b IS NULL) AS kept
        FROM af LEFT JOIN dropped d ON af.vid = d.b"""

  /** Mirror of TextAnalysis.blocklistFilter: same tokens, literal term
    * list, integer cross-multiplied verdict. */
  def textBlocklist(terms: Seq[String], maxHitFrac: Double): String = {
    val fracMicro = math.round(maxHitFrac * 1e6)
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH h AS (SELECT doc_id, len($toks)::BIGINT AS n_tokens,
                 list_filter($toks, t -> list_contains([$termList], t)) AS h
               FROM documents)
        SELECT doc_id, n_tokens, len(h)::BIGINT AS n_hits,
               len(list_distinct(h))::BIGINT AS n_terms_hit,
               (len(h)::BIGINT * 1000000 <= $fracMicro * n_tokens) AS pass
        FROM h"""
  }

  /** Okapi BM25 (TextAnalysis.bm25Scores): same normalization/tokens,
    * exact long-sum avgdl, per-term 9-dp round summed as DECIMAL. */
  def textBm25(terms: Seq[String], k1: Double, b: Double): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH lens AS (SELECT doc_id, len($toks)::BIGINT AS dl FROM documents),
          st AS (SELECT count(*)::DOUBLE AS n_docs,
                        (sum(dl)::DOUBLE / count(*)) AS avgdl FROM lens),
          hits AS (SELECT doc_id, t.term FROM (
                     SELECT doc_id, unnest($toks) AS term FROM documents) t
                   WHERE t.term IN ($termList)),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM hits GROUP BY 1, 2),
          df AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
          per AS (
            SELECT tf.doc_id,
                   round(ln(1 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
                         * tf.tf * ${k1 + 1d}
                         / (tf.tf + $k1 * (${1d - b} + $b * l.dl / st.avgdl)),
                     9)::DECIMAL(28,12) AS score
            FROM tf JOIN df USING (term) JOIN lens l ON tf.doc_id = l.doc_id
            CROSS JOIN st)
        SELECT doc_id, count(*)::INT AS n_terms_matched,
               round(sum(score)::DOUBLE, 6) AS bm25
        FROM per GROUP BY 1"""
  }

  /** Mirror of the retrieval_rrf composition: the [[textBm25]] block
    * ranked to its lexical top-N, the query-0 cosine top-N, and the
    * 12-dp reciprocal-rank terms summed under DECIMAL(28,12). The
    * 1.0::DOUBLE keeps the reciprocal in IEEE doubles (DuckDB parses a
    * bare 1.0 as DECIMAL). */
  def retrievalRrf(terms: Seq[String], n: Int, kRrf: Int, topK: Int): String =
    s"""WITH bm AS (${textBm25(terms, k1 = 1.2, b = 0.75)}),
          lex AS (SELECT id, rank FROM (
                    SELECT doc_id AS id,
                           row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)
                             AS rank
                    FROM bm) WHERE rank <= $n),
          q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
          sem0 AS (SELECT c.vec_id AS id, ${cosineOf("q.qv", "c.embedding")} AS sim
                   FROM embeddings c CROSS JOIN q WHERE c.vec_id <> 0),
          sem AS (SELECT id, rank FROM (
                    SELECT id, row_number() OVER (ORDER BY sim DESC, id ASC)
                             AS rank
                    FROM sem0) WHERE rank <= $n),
          u AS (SELECT id, round(1.0::DOUBLE / ($kRrf + rank), 12)
                           ::DECIMAL(28,12) AS c FROM lex
                UNION ALL
                SELECT id, round(1.0::DOUBLE / ($kRrf + rank), 12)
                           ::DECIMAL(28,12) AS c FROM sem),
          f AS (SELECT id, count(*)::BIGINT AS n_lists, sum(c) AS rrf
                FROM u GROUP BY 1)
        SELECT id, n_lists, round(rrf::DOUBLE, 9) AS rrf
        FROM f ORDER BY rrf DESC, id ASC LIMIT $topK"""

  /** Type-token ratio (TextAnalysis.lexicalDiversity). */
  val textTtr: String =
    s"""SELECT doc_id,
               len($toks)::BIGINT AS n_tokens,
               len(list_distinct($toks))::BIGINT AS n_types,
               round(len(list_distinct($toks))::DOUBLE / len($toks)::DOUBLE, 6) AS ttr
        FROM documents"""

  /** Per-type z-score anomalies (Events.anomalies): the filter applies to
    * the ROUNDED z, exactly as the Spark side does. */
  def evAnomaly(zThreshold: Double): String =
    s"""WITH st AS (SELECT event_type, avg(value) AS m, stddev_pop(value) AS sd
                    FROM events GROUP BY 1)
        SELECT e.event_id, e.event_type, round(e.value, 4) AS value,
               round((e.value - st.m) / st.sd, 4) AS z
        FROM events e JOIN st USING (event_type)
        WHERE st.sd > 0 AND abs(round((e.value - st.m) / st.sd, 4)) > $zThreshold"""

  /** HLL sketch build/merge error contract (sketch_merge): exact
    * per-source and global distinct fingerprint counts both engines
    * compute identically; the estimate-within-15% boolean is TRUE by
    * contract (the sketch_approx pattern). */
  val sketchMerge: String =
    s"""WITH d AS (SELECT source, md5($norm) AS fp FROM documents)
        SELECT source, count(DISTINCT fp) AS exact_fps, TRUE AS approx_ok
        FROM d GROUP BY source
        UNION ALL
        SELECT '__all__' AS source, count(DISTINCT fp) AS exact_fps, TRUE AS approx_ok
        FROM d"""

  def simIvfTopK(cells: Int, iters: Int, nProbe: Int, maxQueryId: Int, k: Int): String = {
    s"""WITH ${ivfLloydCtes(cells, iters)},
          q AS (SELECT vec_id AS query_id, embedding AS qv
                FROM embeddings WHERE vec_id < $maxQueryId),
          probed AS (
            SELECT query_id, qv, cell FROM (
              SELECT q.query_id, q.qv, cc.cell,
                     row_number() OVER (PARTITION BY q.query_id
                       ORDER BY ${cosineOf("q.qv", "cc.cv")} DESC, cc.cell ASC) AS crn
              FROM q CROSS JOIN c$iters cc) WHERE crn <= $nProbe),
          scored AS (
            SELECT p.query_id, a.vid AS neighbor_id, ${cosineOf("p.qv", "a.v")} AS sim
            FROM af a JOIN probed p ON a.cell = p.cell
            WHERE a.vid <> p.query_id),
          ranked AS (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM scored)
        SELECT query_id, neighbor_id, sim, rank::INT AS rank FROM ranked WHERE rank <= $k"""
  }

  def simCosineTopK(maxQueryId: Int, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $maxQueryId),
          c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
          scored AS (
            SELECT q.query_id, c.neighbor_id, $cosineExpr AS sim
            FROM c CROSS JOIN q WHERE c.neighbor_id <> q.query_id),
          ranked AS (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM scored)
        SELECT query_id, neighbor_id, sim, rank::INT AS rank FROM ranked WHERE rank <= $k"""

  /** Mirror of Similarity.hardNegativesTopK: the simCosineTopK chain
    * with the label-mismatch filter in place of the self-pair filter. */
  def embHardNegatives(maxAnchorId: Int, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS anchor_id, embedding AS qv, label AS anchor_label
                   FROM embeddings WHERE vec_id < $maxAnchorId),
          c AS (SELECT vec_id AS negative_id, embedding AS cv, label AS neg_label
                FROM embeddings),
          scored AS (
            SELECT q.anchor_id, c.negative_id, $cosineExpr AS sim
            FROM c CROSS JOIN q WHERE c.neg_label <> q.anchor_label),
          ranked AS (
            SELECT anchor_id, negative_id, sim,
                   row_number() OVER (PARTITION BY anchor_id
                     ORDER BY sim DESC, negative_id ASC) AS rank
            FROM scored)
        SELECT anchor_id, negative_id, sim, rank::INT AS rank
        FROM ranked WHERE rank <= $k"""

  def evSessionize(gapMinutes: Int): String = {
    val gapMs = gapMinutes * 60000L
    s"""WITH g AS (
          SELECT user_id, ts, value,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
          FROM events),
        s AS (
          SELECT user_id, ts, value,
                 CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) > $gapMs
                      THEN 1 ELSE 0 END AS new_session
          FROM g),
        c AS (
          SELECT user_id, ts, value,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq
          FROM s)
        SELECT user_id, session_seq, count(*) AS n_events,
               epoch_ms(min(ts)) AS session_start_ms,
               epoch_ms(max(ts)) AS session_end_ms,
               round(sum(value), 4) AS total_value
        FROM c GROUP BY 1, 2"""
  }

  /** Interval-containment join (RangeJoin.intervalJoin) re-derived as a
    * plain theta join over the same sessionization — DuckDB's IEJoin
    * handles it; Spark needs the chunk-bucketized form. */
  def evIntervalJoin(gapMinutes: Int): String =
    s"""WITH sess AS (${evSessionize(gapMinutes)})
        SELECT e.event_id, count(*) AS n_active_sessions
        FROM events e JOIN sess s
          ON epoch_ms(e.ts) >= s.session_start_ms
         AND epoch_ms(e.ts) <= s.session_end_ms
        GROUP BY 1"""

  /** Byte i of the (ASCII) text payload, mirroring FakeCodec.b(i). */
  private def byteAt(i: Int): String =
    s"CASE WHEN strlen(text) > $i THEN ascii(substr(text, ${i + 1}, 1)) ELSE 0 END"

  val mmDecodeMeta: String =
    s"""SELECT doc_id,
          ((${byteAt(0)}) + 256 * (${byteAt(1)})) % 1024 AS width,
          ((${byteAt(2)}) + 256 * (${byteAt(3)})) % 768 AS height,
          (1 + (${byteAt(4)}) % 8)::INT AS n_frames,
          strlen(text)::BIGINT AS media_bytes
        FROM documents"""

  /** Integer bucket byte-sums mirroring FakeCodec feature extraction +
    * the query's exact reconstruction (see mm_features). Bucket d sums
    * bytes at 0-based offsets ≡ d (mod dims) — 1-based char positions
    * d+1, d+1+dims, … (documents text is ASCII: chars ≡ bytes, the same
    * assumption every mm oracle makes). */
  def mmFeatures(dims: Int): String =
    s"""WITH dims AS (SELECT unnest(range(0, $dims)) AS pos),
          x AS (SELECT doc_id, text, strlen(text) AS mb FROM documents)
        SELECT doc_id, pos::INT AS pos,
               COALESCE(list_aggregate(list_transform(range(pos + 1, mb + 1, $dims),
                 i -> ascii(substr(text, i::INT, 1))), 'sum'), 0)::BIGINT AS bucket_sum
        FROM x CROSS JOIN dims"""

  /** md5-family SimHash re-derived bit-for-bit: token hash = first 4 md5
    * bytes as unsigned 32-bit (same family as minhashExpr); per bit, sum
    * ±1 over tokens, keep the sign. Mirrors SimHash64.compute(md5Family). */
  def dedupSimhash(bits: Int, prefixBits: Int): String = {
    val bitTerms = (0 until bits).map { b =>
      s"CASE WHEN list_aggregate(list_transform(hs, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END), 'sum') > 0 THEN ${1L << b} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH t AS (SELECT doc_id,
            list_transform(string_split($norm, ' '),
              tk -> ('0x' || substr(md5(tk), 1, 8))::BIGINT) AS hs
          FROM documents),
          s AS (SELECT doc_id, ($bitTerms)::BIGINT AS simhash FROM t)
        SELECT doc_id, simhash, (simhash >> ${bits - prefixBits})::BIGINT AS bucket FROM s"""
  }

  /** Hamming-distance pairing over the SAME md5-family fingerprints,
    * re-derived brute-force (DuckDB handles the all-pairs join at
    * oracle scale; the Spark side is the banded multi-index form). */
  def dedupSimhashPairs(bits: Int, maxHamming: Int): String = {
    val bitTerms = (0 until bits).map { b =>
      s"CASE WHEN list_aggregate(list_transform(hs, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END), 'sum') > 0 THEN ${1L << b} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH t AS (SELECT doc_id,
            list_transform(string_split($norm, ' '),
              tk -> ('0x' || substr(md5(tk), 1, 8))::BIGINT) AS hs
          FROM documents),
          s AS (SELECT doc_id, ($bitTerms)::BIGINT AS fp FROM t)
        SELECT x.doc_id AS a, y.doc_id AS b,
               bit_count(xor(x.fp, y.fp))::INT AS hamming
        FROM s x JOIN s y ON x.doc_id < y.doc_id
        WHERE bit_count(xor(x.fp, y.fp)) <= $maxHamming"""
  }

  /** Media perceptual-hash pairs (Multimodal.phashPairs): the same
    * md5-family simhash, but over the payload's hex-grouped 4-byte
    * tokens (SimHash64 normalizes its input, so the grouping's trailing
    * space / case wash out) — brute-force Hamming pairing re-derivation
    * (the Spark side is the banded multi-index). */
  def mmPhashPairs(bits: Int, maxHamming: Int): String = {
    val grouped = """regexp_replace(hex(encode(text)), '(.{8})', '\1 ', 'g')"""
    val normed = s"""lower(trim(regexp_replace($grouped, '\\s+', ' ', 'g')))"""
    val bitTerms = (0 until bits).map { b =>
      s"CASE WHEN list_aggregate(list_transform(hs, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END), 'sum') > 0 THEN ${1L << b} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH t AS (SELECT doc_id,
            list_transform(string_split($normed, ' '),
              tk -> ('0x' || substr(md5(tk), 1, 8))::BIGINT) AS hs
          FROM documents),
          s AS (SELECT doc_id, ($bitTerms)::BIGINT AS fp FROM t)
        SELECT x.doc_id AS a, y.doc_id AS b,
               bit_count(xor(x.fp, y.fp))::INT AS hamming
        FROM s x JOIN s y ON x.doc_id < y.doc_id
        WHERE bit_count(xor(x.fp, y.fp)) <= $maxHamming"""
  }

  /** Mirror of the mm_phash_clusters composition: [[mmPhashPairs]]
    * closed into min-id components over every media doc (the
    * dedupClusters recursive-CTE shape). */
  def mmPhashClusters(bits: Int, maxHamming: Int): String =
    s"""WITH RECURSIVE pairs AS (${mmPhashPairs(bits, maxHamming)}),
          edges AS (SELECT a AS s, b AS d FROM pairs
                    UNION SELECT b AS s, a AS d FROM pairs),
          reach AS (
            SELECT s AS x, s AS y FROM (SELECT DISTINCT s FROM edges)
            UNION
            SELECT r.x, e.d AS y FROM reach r JOIN edges e ON r.y = e.s),
          cc AS (SELECT x AS id, min(y) AS cluster_id FROM reach GROUP BY x)
        SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN cc ON d.doc_id = cc.id"""

  def mmSampleFrames(stride: Int): String =
    s"""WITH meta AS ($mmDecodeMeta),
          fr AS (SELECT doc_id, media_bytes, n_frames,
                        unnest(range(0, n_frames, $stride)) AS i FROM meta)
        SELECT doc_id, i::INT AS frame_idx,
               (i * (media_bytes // greatest(n_frames, 1)))::BIGINT AS frame_offset
        FROM fr"""

  def simCosinePairs(threshold: Double): String =
    s"""WITH q AS (SELECT label, vec_id AS a, embedding AS qv FROM embeddings),
          c AS (SELECT label, vec_id AS b, embedding AS cv FROM embeddings)
        SELECT q.a, c.b, $cosineExpr AS sim
        FROM q JOIN c ON q.label = c.label AND q.a < c.b
        WHERE $cosineExpr >= $threshold"""

  // ---- graph analytics (operators.Graph over the co-purchase fixture) ----

  /** Canonical co-purchase edges: parts sharing an order, partkey-thinned
    * 4x — the same derivation SparkEntry.coPurchaseEdges builds. */
  val coPurchase: String =
    """SELECT a.l_partkey AS src, b.l_partkey AS dst
       FROM lineitem a JOIN lineitem b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0
       GROUP BY 1, 2"""

  val graphDegree: String =
    s"""WITH e0 AS ($coPurchase),
          d AS (SELECT node, count(*) AS degree
                FROM (SELECT src AS node FROM e0
                      UNION ALL SELECT dst AS node FROM e0)
                GROUP BY 1)
        SELECT degree, count(*) AS n_nodes FROM d GROUP BY 1"""

  /** Unrolled power iterations mirroring Graph.pageRank: symmetrized
    * edges, r0 = 1/N, r_t+1 = (1-d)/N + d * sum(r_t(u)/outdeg(u)).
    * The teleport constant is interpolated from the SAME Scala double
    * arithmetic the Spark plan embeds (1.0 - damping in IEEE 754), so
    * the two engines start from bit-identical constants; only summation
    * order differs, absorbed by the final 6-dp round. */
  def graphPageRank(iters: Int, damping: Double, k: Int): String = {
    val teleport = 1.0d - damping
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT e.dst AS node,
                    ($teleport::DOUBLE / (SELECT n FROM nn))
                    + $damping::DOUBLE * sum(r.rank / d.outdeg) AS rank
                  FROM e JOIN r${i - 1} r ON r.node = e.src
                         JOIN deg d ON d.node = e.src
                  GROUP BY e.dst)"""
    }.mkString(",\n")
    s"""WITH e0 AS ($coPurchase),
          e AS (SELECT src, dst FROM e0
                UNION ALL SELECT dst AS src, src AS dst FROM e0),
          deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY 1),
          nn AS (SELECT count(*)::DOUBLE AS n FROM deg),
          r0 AS (SELECT node, 1.0::DOUBLE / (SELECT n FROM nn) AS rank FROM deg),
          $steps
        SELECT node, round(rank, 6) AS rank FROM r$iters
        ORDER BY round(rank, 6) DESC, node LIMIT $k"""
  }

  /** Mirror of Graph.hits: unrolled Kleinberg half-rounds (authority
    * from current hubs, hub from NEW authorities), each a 9-dp-term
    * DECIMAL sum with an L1-normalizing division. Raw/normalized
    * tables MATERIALIZED — each raw table feeds its per-node
    * projection AND the scalar normalizer subquery. */
  def graphHits(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""ar$i AS MATERIALIZED (
            SELECT e.dst AS node, sum(round(h.s, 9)::DECIMAL(28,12)) AS c
            FROM e0 e JOIN h${i - 1} h ON h.node = e.src GROUP BY 1),
          a$i AS MATERIALIZED (
            SELECT node, round(c::DOUBLE / (SELECT sum(c) FROM ar$i)::DOUBLE, 9) AS s
            FROM ar$i),
          hr$i AS MATERIALIZED (
            SELECT e.src AS node, sum(round(a.s, 9)::DECIMAL(28,12)) AS c
            FROM e0 e JOIN a$i a ON a.node = e.dst GROUP BY 1),
          h$i AS MATERIALIZED (
            SELECT node, round(c::DOUBLE / (SELECT sum(c) FROM hr$i)::DOUBLE, 9) AS s
            FROM hr$i)"""
    }.mkString(",\n")
    s"""WITH e0 AS ($coPurchase),
          nodes AS (SELECT DISTINCT node FROM (
            SELECT src AS node FROM e0 UNION ALL SELECT dst AS node FROM e0)),
          h0 AS MATERIALIZED (SELECT node, 1.0::DOUBLE AS s FROM nodes),
          $rounds
        SELECT n.node,
               coalesce(h$iters.s, 0.0::DOUBLE) AS hub,
               coalesce(a$iters.s, 0.0::DOUBLE) AS authority
        FROM nodes n LEFT JOIN h$iters ON h$iters.node = n.node
                     LEFT JOIN a$iters ON a$iters.node = n.node"""
  }

  /** Mirror of Graph.articleRank: the [[graphPageRank]] unroll with
    * each contribution damped by outdeg + avgDeg (= 2|E|/N, the same
    * exact-integer ratio Spark's observed counts produce). */
  def graphArticleRank(iters: Int, damping: Double, k: Int): String = {
    val teleport = 1.0d - damping
    val avg = "((SELECT m FROM ne) / (SELECT n FROM nn))"
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT e.dst AS node,
                    ($teleport::DOUBLE / (SELECT n FROM nn))
                    + $damping::DOUBLE * sum(r.rank / (d.outdeg + $avg)) AS rank
                  FROM e JOIN r${i - 1} r ON r.node = e.src
                         JOIN deg d ON d.node = e.src
                  GROUP BY e.dst)"""
    }.mkString(",\n")
    s"""WITH e0 AS ($coPurchase),
          e AS (SELECT src, dst FROM e0
                UNION ALL SELECT dst AS src, src AS dst FROM e0),
          deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY 1),
          nn AS (SELECT count(*)::DOUBLE AS n FROM deg),
          ne AS (SELECT count(*)::DOUBLE AS m FROM e),
          r0 AS (SELECT node, 1.0::DOUBLE / (SELECT n FROM nn) AS rank FROM deg),
          $steps
        SELECT node, round(rank, 6) AS rank FROM r$iters
        ORDER BY round(rank, 6) DESC, node LIMIT $k"""
  }

  /** Mirror of Graph.distanceDistribution: the landmark BFS hop
    * histogram — all-integer, bit-exact. */
  def graphDistanceDistribution(maxHops: Int, landmarkMod: Int): String =
    s"""WITH ${bfsCtes(maxHops, landmarkMod)}
        SELECT dist, count(*)::BIGINT AS n_pairs
        FROM r$maxHops WHERE dist > 0 GROUP BY 1"""

  /** Mirror of Graph.kTruss: unrolled support-peel rounds. Per round,
    * edge support = common-neighbor count over the symmetrized
    * adjacency (the oracle needs no orientation — each common neighbor
    * IS one triangle through the edge), then edges below k−2 drop.
    * Rounds MATERIALIZED ([[graphKCore]] rationale); peeling is
    * idempotent past the fixpoint, so the fixed unroll cannot drift
    * from Spark's early convergence stop. Final select recomputes
    * support on the fixpoint subgraph — exactly what Spark returns. */
  def graphKTruss(k: Int, rounds: Int): String = {
    def supSql(prev: String): String =
      s"""SELECT e.src, e.dst, count(*) AS sup
          FROM $prev e
          JOIN (SELECT src AS n, dst AS x FROM $prev
                UNION ALL SELECT dst AS n, src AS x FROM $prev) a1
            ON a1.n = e.src
          JOIN (SELECT src AS n, dst AS x FROM $prev
                UNION ALL SELECT dst AS n, src AS x FROM $prev) a2
            ON a2.n = e.dst AND a1.x = a2.x
          GROUP BY 1, 2"""
    val steps = (1 to rounds).map { i =>
      val prev = if (i == 1) "e0" else s"e${i - 1}"
      s"""s$i AS MATERIALIZED (${supSql(prev)}),
          e$i AS MATERIALIZED (
            SELECT e.src, e.dst FROM $prev e
            LEFT JOIN s$i s ON s.src = e.src AND s.dst = e.dst
            WHERE coalesce(s.sup, 0) >= ${k - 2})"""
    }.mkString(",\n")
    s"""WITH e0 AS ($coPurchase),
          $steps,
          sf AS MATERIALIZED (${supSql(s"e$rounds")})
        SELECT e.src, e.dst, coalesce(s.sup, 0)::BIGINT AS support
        FROM e$rounds e LEFT JOIN sf s ON s.src = e.src AND s.dst = e.dst"""
  }

  /** Unrolled directed power iterations mirroring Graph.pageRankDirected:
    * canonical (src < dst) edges kept directed, dangling mass (nodes with
    * outdeg 0) redistributed uniformly each round. Constants interpolate
    * the SAME Scala doubles the Spark plan embeds (see graphPageRank);
    * summation-order noise is absorbed by the final 6-dp round. */
  def graphPageRankDirected(iters: Int, damping: Double, k: Int): String = {
    val teleport = 1.0d - damping
    val steps = (1 to iters).map { i =>
      s"""dang${i - 1} AS (SELECT coalesce(sum(rank), 0.0)::DOUBLE AS dm
                           FROM r${i - 1} WHERE outdeg = 0),
          r$i AS (SELECT nodes.node, nodes.outdeg,
                    ($teleport::DOUBLE / (SELECT n FROM nn))
                    + $damping::DOUBLE * (coalesce(c.contrib, 0.0::DOUBLE)
                        + (SELECT dm FROM dang${i - 1}) / (SELECT n FROM nn)) AS rank
                  FROM nodes LEFT JOIN (
                    SELECT e.dst AS node, sum(r.rank / r.outdeg) AS contrib
                    FROM e0 e JOIN r${i - 1} r ON r.node = e.src
                    GROUP BY 1) c ON c.node = nodes.node)"""
    }.mkString(",\n")
    s"""WITH e0 AS ($coPurchase),
          odeg AS (SELECT src AS node, count(*) AS outdeg FROM e0 GROUP BY 1),
          nodes AS (SELECT u.node, coalesce(odeg.outdeg, 0) AS outdeg
                    FROM (SELECT src AS node FROM e0
                          UNION SELECT dst AS node FROM e0) u
                    LEFT JOIN odeg ON odeg.node = u.node),
          nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
          r0 AS (SELECT node, outdeg,
                        1.0::DOUBLE / (SELECT n FROM nn) AS rank FROM nodes),
          $steps
        SELECT node, round(rank, 6) AS rank FROM r$iters
        ORDER BY round(rank, 6) DESC, node LIMIT $k"""
  }

  /** Unrolled WEIGHTED directed power iterations mirroring
    * Graph.pageRankDirected(weightCol): contributions are
    * rank·w/strength, strength = Σ out-weights; dangling = strength 0.
    * Weights are shared-order counts — integer-valued doubles, so the
    * strength sums are order-exact; contribution-sum noise is absorbed
    * by the final 6-dp round as in the unweighted forms. */
  def graphPageRankWeighted(iters: Int, damping: Double, k: Int): String = {
    val teleport = 1.0d - damping
    val steps = (1 to iters).map { i =>
      s"""dang${i - 1} AS (SELECT coalesce(sum(rank), 0.0)::DOUBLE AS dm
                           FROM r${i - 1} WHERE strength = 0),
          r$i AS (SELECT nodes.node, nodes.strength,
                    ($teleport::DOUBLE / (SELECT n FROM nn))
                    + $damping::DOUBLE * (coalesce(c.contrib, 0.0::DOUBLE)
                        + (SELECT dm FROM dang${i - 1}) / (SELECT n FROM nn)) AS rank
                  FROM nodes LEFT JOIN (
                    SELECT e.dst AS node, sum(r.rank * e.w / r.strength) AS contrib
                    FROM e0 e JOIN r${i - 1} r ON r.node = e.src
                    GROUP BY 1) c ON c.node = nodes.node)"""
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
                           count(*)::DOUBLE AS w
                    FROM lineitem a JOIN lineitem b
                      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                    WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0
                    GROUP BY 1, 2),
          odeg AS (SELECT src AS node, sum(w) AS strength FROM e0 GROUP BY 1),
          nodes AS (SELECT u.node, coalesce(odeg.strength, 0.0) AS strength
                    FROM (SELECT src AS node FROM e0
                          UNION SELECT dst AS node FROM e0) u
                    LEFT JOIN odeg ON odeg.node = u.node),
          nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
          r0 AS (SELECT node, strength,
                        1.0::DOUBLE / (SELECT n FROM nn) AS rank FROM nodes),
          $steps
        SELECT node, round(rank, 6) AS rank FROM r$iters
        ORDER BY round(rank, 6) DESC, node LIMIT $k"""
  }

  /** Mirror of Corpus.qualityThresholdFilter: score-histogram cumulative
    * counts, keep score values whose strictly-better count is under
    * fraction·total, join survivors back (ties share a fate). */
  def filterQuality(keepFraction: Double): String = {
    val punctRaw = s"len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE / greatest(length(text), 1)::DOUBLE"
    val nToks = s"len($toks)"
    val stopList = graft.functions.TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
    val stopRaw = s"len(list_filter($toks, t -> t IN ($stopList)))::DOUBLE / greatest($nToks, 1)::DOUBLE"
    val quality = s"""round(least(n_chars::DOUBLE / 500.0, 1.0) * 0.4
              + (1.0 - least(($punctRaw) * 5.0, 1.0)) * 0.3
              + least(($stopRaw) * 4.0, 1.0) * 0.3, 6)"""
    s"""WITH q AS (SELECT doc_id, source, $quality AS quality FROM documents),
          byval AS (SELECT source, quality, count(*) AS nv FROM q GROUP BY 1, 2),
          c AS (SELECT source, quality,
                       coalesce(sum(nv) OVER (PARTITION BY source ORDER BY quality DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
                       sum(nv) OVER (PARTITION BY source) AS tot
                FROM byval),
          kept AS (SELECT source, quality FROM c
                   WHERE cum_before::DOUBLE < $keepFraction * tot::DOUBLE)
        SELECT q.doc_id, q.source, q.quality
        FROM q JOIN kept ON q.source = kept.source AND q.quality = kept.quality"""
  }

  /** Mirror of TextAnalysis.gopherRules: identical normalized-token
    * statistics, identical bound literals, per-rule booleans + verdict. */
  def textGopherRules(
      minTokens: Int, maxTokens: Int,
      minAvgTokenLen: Double, maxAvgTokenLen: Double,
      maxPunctRatio: Double, minStopwordHits: Int): String = {
    val punctRaw = s"len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE / greatest(length(text), 1)::DOUBLE"
    val nToks = s"len($toks)"
    val stopList = graft.functions.TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
    val stopHits = s"len(list_filter($toks, t -> t IN ($stopList)))"
    val avgLen = s"list_aggregate(list_transform($toks, t -> length(t)), 'sum')::DOUBLE / greatest($nToks, 1)::DOUBLE"
    val okTok = s"($nToks BETWEEN $minTokens AND $maxTokens)"
    val okAvg = s"(($avgLen) BETWEEN $minAvgTokenLen AND $maxAvgTokenLen)"
    val okPunct = s"(($punctRaw) <= $maxPunctRatio)"
    val okStop = s"($stopHits >= $minStopwordHits)"
    s"""SELECT doc_id, $nToks::INT AS n_tokens_ws,
          $okTok AS ok_token_count,
          $okAvg AS ok_avg_token_len,
          $okPunct AS ok_punct_ratio,
          $okStop AS ok_stopwords,
          ($okTok AND $okAvg AND $okPunct AND $okStop) AS pass
        FROM documents"""
  }

  /** Mirror of TextAnalysis.c4Rules: identical raw/normalized text
    * predicates, identical marker strings, per-rule booleans + verdict. */
  def textC4Rules(minWords: Int): String = {
    val okPunct = """(right(rtrim(text), 1) IN ('.', '!', '?', '"'))"""
    val okWords = s"(len($toks) >= $minWords)"
    val okLorem = "(NOT contains(lower(text), 'lorem ipsum'))"
    val okBrace = "(NOT contains(text, '{'))"
    val okJs = "(NOT contains(lower(text), 'javascript'))"
    s"""SELECT doc_id,
          $okPunct AS ok_terminal_punct,
          $okWords AS ok_min_words,
          $okLorem AS ok_no_lorem,
          $okBrace AS ok_no_brace,
          $okJs AS ok_no_javascript,
          ($okPunct AND $okWords AND $okLorem AND $okBrace AND $okJs) AS pass
        FROM documents"""
  }

  /** Unrolled PERSONALIZED power iterations mirroring
    * Graph.pageRankPersonalized: symmetrized edges, seeds = nodes with
    * id % seedMod = 0, r0 = 1/|S| on seeds else 0, per-round teleport
    * only to seeds. Constants interpolate the SAME Scala doubles the
    * Spark plan embeds (see graphPageRank); summation-order noise is
    * absorbed by the final 6-dp round. */
  def graphPageRankPersonalized(
      iters: Int, damping: Double, seedMod: Int, k: Int): String = {
    val teleport = 1.0d - damping
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT e.dst AS node,
                    (CASE WHEN e.dst % $seedMod = 0
                          THEN $teleport::DOUBLE / (SELECT n FROM ns)
                          ELSE 0.0::DOUBLE END)
                    + $damping::DOUBLE * sum(r.rank / d.outdeg) AS rank
                  FROM e JOIN r${i - 1} r ON r.node = e.src
                         JOIN deg d ON d.node = e.src
                  GROUP BY e.dst)"""
    }.mkString(",\n")
    s"""WITH e0 AS ($coPurchase),
          e AS (SELECT src, dst FROM e0
                UNION ALL SELECT dst AS src, src AS dst FROM e0),
          deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY 1),
          ns AS (SELECT count(*)::DOUBLE AS n FROM deg WHERE node % $seedMod = 0),
          r0 AS (SELECT node,
                        CASE WHEN node % $seedMod = 0
                             THEN 1.0::DOUBLE / (SELECT n FROM ns)
                             ELSE 0.0::DOUBLE END AS rank FROM deg),
          $steps
        SELECT node, round(rank, 6) AS rank FROM r$iters
        ORDER BY round(rank, 6) DESC, node LIMIT $k"""
  }

  /** Mirror of Graph.localClusteringCoefficient: node-anchored wedges
    * between canonical-ordered neighbor pairs closed by the canonical
    * edge, lcc = 2T/(d(d-1)), top-k by (lcc desc, node). */
  def graphClusteringCoeff(k: Int): String =
    s"""WITH e0 AS ($coPurchase),
          adj AS (SELECT src AS n, dst AS x FROM e0
                  UNION ALL SELECT dst AS n, src AS x FROM e0),
          deg AS (SELECT n AS node, count(*) AS degree FROM adj GROUP BY 1),
          tri AS (SELECT a1.n AS node, count(*) AS triangles
                  FROM adj a1 JOIN adj a2 ON a1.n = a2.n AND a1.x < a2.x
                  JOIN e0 e ON e.src = a1.x AND e.dst = a2.x
                  GROUP BY 1)
        SELECT d.node, d.degree, coalesce(t.triangles, 0)::BIGINT AS triangles,
               round(CASE WHEN d.degree >= 2
                     THEN 2.0::DOUBLE * coalesce(t.triangles, 0)::DOUBLE
                          / (d.degree * (d.degree - 1))::DOUBLE
                     ELSE 0.0::DOUBLE END, 6) AS lcc
        FROM deg d LEFT JOIN tri t ON t.node = d.node
        ORDER BY lcc DESC, d.node LIMIT $k"""

  /** Canonical-order triangle enumeration (u<v<w counted once) — the
    * orientation-free form; Graph.triangleCount's degree-oriented wedge
    * join counts the same set. */
  val graphTriangles: String =
    s"""WITH e0 AS ($coPurchase)
        SELECT count(*)::BIGINT AS n_triangles
        FROM e0 e1
        JOIN e0 e2 ON e2.src = e1.dst
        JOIN e0 e3 ON e3.src = e1.src AND e3.dst = e2.dst"""

  /** Mirror of the text_pii_redact fixture + TextAnalysis.redactPii:
    * identical derived text, RE2-compatible patterns, same replacement
    * order (email → phone → ip), each count taken on the text that pass
    * scanned (the post-previous-pass text), matching the operator's
    * counts-audit contract. */
  val textPiiRedact: String = {
    val email = graft.operators.TextAnalysis.EmailRe
    val phone = graft.operators.TextAnalysis.PhoneRe
    val ip = graft.operators.TextAnalysis.Ipv4Re
    // DuckDB single-quoted strings keep backslashes literal — only the
    // quote needs escaping; the Java-regex string passes through as RE2.
    def esc(re: String) = re.replace("'", "''")
    s"""WITH pii AS (
          SELECT doc_id,
                 repeat('user' || doc_id::VARCHAR || '@example.com ', (doc_id % 3 + 1)::INT)
                 || '+1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                 || ' 10.' || (doc_id % 256)::VARCHAR || '.0.7 ' || text AS text
          FROM documents),
          s1 AS (SELECT doc_id, text,
                        regexp_replace(text, '${esc(email)}', '<EMAIL>', 'g') AS t1
                 FROM pii),
          s2 AS (SELECT doc_id, text, t1,
                        regexp_replace(t1, '${esc(phone)}', '<PHONE>', 'g') AS t2
                 FROM s1)
        SELECT doc_id,
               len(regexp_extract_all(text, '${esc(email)}'))::INT AS n_emails,
               len(regexp_extract_all(t1, '${esc(phone)}'))::INT AS n_phones,
               len(regexp_extract_all(t2, '${esc(ip)}'))::INT AS n_ips,
               substr(regexp_replace(t2, '${esc(ip)}', '<IP>', 'g'), 1, 80) AS redacted_head
        FROM s2"""
  }

  /** Mirror of Corpus.chunkWithOverlap: same ws-normalized tokens, same
    * window starts (0, step, …, < n), 1-based inclusive slices. */
  def chunkOverlap(chunkTokens: Int, overlapTokens: Int): String = {
    val step = chunkTokens - overlapTokens
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents
                   WHERE len($toks) > 1 OR ($toks)[1] <> ''),
          w AS (SELECT doc_id, toks, len(toks) AS n,
                       unnest(range(0, greatest(len(toks) - $overlapTokens, 1), $step)) AS s
                FROM t)
        SELECT doc_id, (s // $step)::BIGINT AS chunk_idx,
               least($chunkTokens, n - s)::INT AS n_chunk_tokens,
               array_to_string(toks[s + 1:s + $chunkTokens], ' ') AS chunk_text
        FROM w"""
  }

  /** Mirror of Corpus.prioritySample: priority = weight / (coin+1), one
    * IEEE-754 division of two integers — bit-identical across engines. */
  def sampleWeighted(k: Int): String = {
    val u = s"(${coinSql("wsamp:")} + 1)::DOUBLE"
    s"""SELECT doc_id, source, priority FROM (
          SELECT doc_id, source, n_chars::DOUBLE / $u AS priority,
                 row_number() OVER (PARTITION BY source
                   ORDER BY n_chars::DOUBLE / $u DESC, doc_id ASC) AS rnk
          FROM documents)
        WHERE rnk <= $k"""
  }

  /** Mirror of TextAnalysis.topNgrams + the top-k rank the query adds:
    * per-doc distinct n-token grams → document frequency. */
  def boilerplateNgrams(n: Int, minDf: Long, k: Int): String =
    s"""WITH g AS (SELECT unnest(${tokenShingles(n)}) AS gram FROM documents),
          d AS (SELECT gram, count(*) AS df FROM g
                WHERE length(gram) > 0 GROUP BY 1 HAVING count(*) >= $minDf)
        SELECT gram, df FROM d ORDER BY df DESC, gram ASC LIMIT $k"""

  /** Mirror of TextAnalysis.vocabulary + the top-k rank the query adds. */
  /** Mirror of TextAnalysis.vocabCoverage: count-of-counts from the
    * same whitespace tokens; exact integers into single double ops. */
  val vocabCoverage: String =
    s"""WITH tok AS (SELECT unnest($toks) AS token FROM documents),
          v AS (SELECT token, count(*)::BIGINT AS c FROM tok GROUP BY 1),
          g AS (SELECT sum(c)::BIGINT AS n_tokens,
                       count(*)::BIGINT AS n_distinct,
                       sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
                       sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS n2
                FROM v)
        SELECT n_tokens, n_distinct, n1, n2,
               round(n1::DOUBLE / n_tokens::DOUBLE, 6) AS gt_unseen_mass,
               round(1.0::DOUBLE - n1::DOUBLE / n_tokens::DOUBLE, 6)
                 AS coverage,
               round(n_distinct::DOUBLE
                 + (n1::DOUBLE * (n1 - 1)::DOUBLE)
                   / (2.0::DOUBLE * (n2 + 1)::DOUBLE), 6) AS chao1
        FROM g"""

  /** Mirror of Graph.katzCentrality: unrolled x <- 1 + alpha*A*x rounds
    * over the symmetrized co-purchase adjacency, 9-dp scores summed as
    * DECIMAL(28,12) per round (the eigenvector/HITS discipline). */
  def graphKatz(alpha: Double, iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""c$i AS MATERIALIZED (
            SELECT e.dst AS node,
                   sum(round(x.score, 9)::DECIMAL(28,12)) AS c
            FROM e e JOIN x${i - 1} x ON x.node = e.src GROUP BY 1),
          x$i AS MATERIALIZED (
            SELECT n.node,
                   round(1.0::DOUBLE + $alpha::DOUBLE
                     * coalesce(c.c::DOUBLE, 0.0::DOUBLE), 9) AS score
            FROM nodes n LEFT JOIN c$i c ON c.node = n.node)"""
    }.mkString(",\n")
    s"""WITH e0 AS ($coPurchase),
          e AS (SELECT src, dst FROM e0
                UNION ALL SELECT dst AS src, src AS dst FROM e0),
          nodes AS (SELECT DISTINCT src AS node FROM e),
          x0 AS MATERIALIZED (SELECT node, 1.0::DOUBLE AS score FROM nodes),
          $rounds
        SELECT node, round(score, 6) AS katz FROM x$iters"""
  }

  /** Mirror of Graph.rectangleCount: the common-neighbor pair census
    * and the exact Σc(c−1)//4 two-diagonals identity. */
  val graphRectangles: String =
    s"""WITH e0 AS ($coPurchase),
          adj AS (SELECT src AS n, dst AS x FROM e0
                  UNION ALL SELECT dst AS n, src AS x FROM e0),
          p AS (SELECT a1.x AS a, a2.x AS b, count(*)::BIGINT AS c
                FROM adj a1 JOIN adj a2 ON a1.n = a2.n AND a1.x < a2.x
                GROUP BY 1, 2)
        SELECT count(*)::BIGINT AS n_pairs,
               coalesce(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END), 0)::BIGINT
                 AS n_diagonal_pairs,
               coalesce(sum(c::HUGEINT * (c - 1)) // 4, 0)::BIGINT
                 AS rectangles
        FROM p"""

  def vocabTopK(minCount: Long, k: Int): String =
    s"""WITH tok AS (SELECT unnest($toks) AS token FROM documents),
          v AS (SELECT token, count(*) AS n FROM tok
                GROUP BY 1 HAVING count(*) >= $minCount)
        SELECT token, n FROM v ORDER BY n DESC, token ASC LIMIT $k"""

  /** Mirror of TextAnalysis.unigramLogProb: same 9-dp-rounded per-token
    * ln(count/total) summed as DECIMAL(28,12) — order-exact — then one
    * double division and the 6-dp output round. */
  val textUnigramLm: String =
    s"""WITH tok AS (SELECT doc_id, unnest($toks) AS token FROM documents),
          total AS (SELECT count(*)::DOUBLE AS total FROM tok),
          model AS (
            SELECT token,
                   round(ln(count(*)::DOUBLE / (SELECT total FROM total)), 9)::DECIMAL(28,12) AS logp
            FROM tok GROUP BY 1)
        SELECT t.doc_id, count(*) AS n_tokens,
               round(sum(m.logp)::DOUBLE / count(*), 6) AS avg_logp
        FROM tok t JOIN model m ON t.token = m.token
        GROUP BY 1"""

  /** Mirror of TextAnalysis.ngramLmPerplexity: bigram stupid backoff
    * (seen → c(v,w)/c(v); unseen → α·c(w)/N; first token → c(w)/N),
    * 9-dp ln terms under DECIMAL(28,12), exp over the 9-dp-rounded
    * negative mean so both engines exponentiate the same argument. */
  def textPerplexity(alpha: Double): String =
    s"""WITH d AS (SELECT doc_id, $toks AS l FROM documents),
          px AS (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM d),
          tok AS (SELECT doc_id, i AS pos, l[i] AS token,
                         CASE WHEN i > 1 THEN l[i - 1] END AS prev FROM px),
          total AS (SELECT count(*)::DOUBLE AS total FROM tok),
          uni AS (SELECT token, count(*)::BIGINT AS n_w FROM tok GROUP BY 1),
          bi AS (SELECT prev, token, count(*)::BIGINT AS n_vw FROM tok
                 WHERE prev IS NOT NULL GROUP BY 1, 2),
          t2 AS (
            SELECT t.doc_id,
                   round(ln(CASE
                       WHEN t.prev IS NULL
                         THEN coalesce(u.n_w, 1) / (SELECT total FROM total)
                       WHEN b.n_vw IS NOT NULL
                         THEN b.n_vw::DOUBLE / uv.n_w::DOUBLE
                       ELSE $alpha * (coalesce(u.n_w, 1)
                            / (SELECT total FROM total)) END),
                     9)::DECIMAL(28,12) AS term
            FROM tok t
            LEFT JOIN uni u ON t.token = u.token
            LEFT JOIN uni uv ON t.prev = uv.token
            LEFT JOIN bi b ON t.prev = b.prev AND t.token = b.token)
        SELECT doc_id, count(*)::BIGINT AS n_tokens,
               round(sum(term)::DOUBLE / count(*), 6) AS avg_logp,
               round(exp(round(-sum(term)::DOUBLE / count(*), 9)), 6)
                 AS perplexity
        FROM t2 GROUP BY 1"""

  /** Mirror of TextAnalysis.dsirScores: add-1-smoothed unigram LM ratio
    * over the union vocabulary, per-token ln-ratio rounded to 9 dp and
    * summed as DECIMAL(28,12), 6-dp output round. The target domain is
    * the benchmark slice (doc_id % benchMod = 0). */
  def dsirScores(benchMod: Int): String =
    s"""WITH tokc AS (SELECT doc_id, unnest($toks) AS token FROM documents),
          tokt AS (SELECT unnest($toks) AS token FROM documents
                   WHERE doc_id % $benchMod = 0),
          cr AS (SELECT token, count(*) AS nr FROM tokc GROUP BY 1),
          ct AS (SELECT token, count(*) AS nt FROM tokt GROUP BY 1),
          counts AS (SELECT coalesce(cr.token, ct.token) AS token,
                            coalesce(nr, 0) AS nr, coalesce(nt, 0) AS nt
                     FROM cr FULL OUTER JOIN ct ON cr.token = ct.token),
          tot AS (SELECT sum(nr)::BIGINT AS totr, sum(nt)::BIGINT AS tott,
                         count(*) AS v FROM counts),
          w AS (SELECT token,
                       round(ln((nt + 1)::DOUBLE / (tott + v)::DOUBLE)
                           - ln((nr + 1)::DOUBLE / (totr + v)::DOUBLE),
                             9)::DECIMAL(28,12) AS lw
                FROM counts, tot)
        SELECT t.doc_id, count(*) AS n_tokens,
               round(sum(w.lw)::DOUBLE, 6) AS dsir_score
        FROM tokc t JOIN w ON t.token = w.token GROUP BY 1"""

  /** Mirror of Graph.nodeSimilarityTopK: wedge-count common neighbors,
    * similarity per the GDS metric (jaccard/overlap/cosine; sqrt is
    * IEEE-correctly-rounded so cosine stays bit-exact), top-k. */
  def graphNodeSimilarity(k: Int, metric: String = "jaccard"): String = {
    val denom = metric match {
      case "jaccard" => "(da.d + db.d - common)::DOUBLE"
      case "overlap" => "least(da.d, db.d)::DOUBLE"
      case "cosine" => "sqrt((da.d * db.d)::DOUBLE)"
    }
    s"""WITH e0 AS ($coPurchase),
          adj AS (SELECT src AS n, dst AS x FROM e0
                  UNION ALL SELECT dst AS n, src AS x FROM e0),
          deg AS (SELECT n AS node, count(*) AS d FROM adj GROUP BY 1),
          p AS (SELECT a1.x AS a, a2.x AS b, count(*) AS common
                FROM adj a1 JOIN adj a2 ON a1.n = a2.n AND a1.x < a2.x
                GROUP BY 1, 2)
        SELECT a, b,
               round(common::DOUBLE / $denom, 6) AS similarity
        FROM p JOIN deg da ON da.node = p.a
               JOIN deg db ON db.node = p.b
        ORDER BY similarity DESC, a, b LIMIT $k"""
  }

  /** Mirror of Graph.kCore: `rounds` unrolled peel rounds (degree <
    * k nodes removed, degrees recomputed). `rounds` must be >= the
    * fixpoint round count on the fixture; past it the peel is
    * idempotent, so the Spark side's early convergence stop cannot
    * drift from the oracle's fixed unroll. */
  def graphKCore(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      val prev = if (i == 1) "e0" else s"e${i - 1}"
      // MATERIALIZED: DuckDB inlines plain CTEs, and each round
      // references the previous one three times — unrolled, that is
      // 3^rounds scans of the base (observed as an fd-exhaustion
      // failure at 12 rounds); materializing pins each round to one
      // evaluation, mirroring the Spark side's scratch tables
      s"""d$i AS MATERIALIZED (SELECT n, count(*) AS deg FROM
                   (SELECT src AS n FROM $prev UNION ALL SELECT dst AS n FROM $prev)
                  GROUP BY 1),
          b$i AS MATERIALIZED (SELECT n FROM d$i WHERE deg < $k),
          e$i AS MATERIALIZED (SELECT src, dst FROM $prev
                  WHERE src NOT IN (SELECT n FROM b$i)
                    AND dst NOT IN (SELECT n FROM b$i))"""
    }.mkString(",\n")
    s"""WITH e0 AS ($coPurchase),
          $steps
        SELECT n AS node, count(*) AS degree FROM
          (SELECT src AS n FROM e$rounds UNION ALL SELECT dst AS n FROM e$rounds)
        GROUP BY 1"""
  }

  /** Mirror of Graph.shortestPaths: `maxHops` unrolled Bellman-Ford
    * relaxation rounds from the min-node-id source over the
    * symmetrized weighted co-purchase graph. Weights are integer-
    * valued doubles, so the min-plus sums are bit-exact on both
    * engines. */
  /** Mirror of Graph.topoLayers over the co-purchase DAG: `rounds`
    * unrolled Kahn peel rounds — round i assigns layer i to the
    * remaining zero-in-degree nodes and drops their outgoing edges;
    * nodes never assigned surface with a NULL layer (the hop-bound /
    * cycle contract). Rounds past the fixpoint are empty, so a fixed
    * unroll is exact regardless of where Spark's observed-count early
    * stop fired. */
  def graphTopoLayers(rounds: Int): String = {
    val steps = (0 until rounds).map { i =>
      // MATERIALIZED: each round references the previous twice; inlined
      // CTEs would re-expand the whole chain exponentially
      s"""a$i AS MATERIALIZED (SELECT node, $i::BIGINT AS layer FROM r$i
                  WHERE node NOT IN (SELECT dst FROM e$i)),
          e${i + 1} AS MATERIALIZED (SELECT * FROM e$i
                        WHERE src NOT IN (SELECT node FROM a$i)),
          r${i + 1} AS MATERIALIZED (SELECT node FROM r$i
                        WHERE node NOT IN (SELECT node FROM a$i))"""
    }.mkString(",\n")
    val union = (0 until rounds)
      .map(i => s"SELECT node, layer FROM a$i")
      .mkString("\nUNION ALL ")
    s"""WITH e0 AS MATERIALIZED ($coPurchase),
          r0 AS MATERIALIZED (SELECT DISTINCT node FROM (
                   SELECT src AS node FROM e0
                   UNION ALL SELECT dst AS node FROM e0)),
          $steps
        $union
        UNION ALL SELECT node, NULL::BIGINT AS layer FROM r$rounds"""
  }

  /** Mirror of TextAnalysis.readability: identical ws-token words,
    * terminal-punctuation sentence runs (floored at 1), vowel-group
    * syllables (floored at the word count), and the Flesch score in
    * the same left-associated double order, 4-dp round. */
  val textReadability: String =
    s"""SELECT doc_id, nw::INT AS n_words, ns::INT AS n_sentences,
               nsy::INT AS n_syllables,
               round(206.835 - 1.015 * (nw::DOUBLE / ns::DOUBLE)
                     - 84.6 * (nsy::DOUBLE / nw::DOUBLE), 4) AS flesch
        FROM (SELECT doc_id, len($toks) AS nw,
                     greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS ns,
                     greatest(len(regexp_extract_all(lower(text),
                       '[aeiouy]+')), len($toks)) AS nsy
              FROM documents)
        WHERE nw > 0"""

  /** Mirror of TextAnalysis.textRankKeywords: content tokens (length ≥
    * minLen, non-stopword) with positions, window co-occurrence pairs,
    * corpus-weighted symmetric edges, then the EXACT weighted-PageRank
    * unroll [[graphPageRankWeighted]] runs — same damping/teleport
    * literals, same dangling term (zero here: symmetric graph), 6-dp
    * final round — over the word graph instead of co-purchase. */
  def textTextrank(
      window: Int, minLen: Int, iters: Int, damping: Double, k: Int): String = {
    val stopList =
      graft.functions.TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
    val teleport = 1.0d - damping
    val steps = (1 to iters).map { i =>
      s"""dang${i - 1} AS (SELECT coalesce(sum(rank), 0.0)::DOUBLE AS dm
                           FROM r${i - 1} WHERE strength = 0),
          r$i AS MATERIALIZED (SELECT nodes.node, nodes.strength,
                    ($teleport::DOUBLE / (SELECT n FROM nn))
                    + $damping::DOUBLE * (coalesce(c.contrib, 0.0::DOUBLE)
                        + (SELECT dm FROM dang${i - 1}) / (SELECT n FROM nn))
                      AS rank
                  FROM nodes LEFT JOIN (
                    SELECT e.dst AS node,
                           sum(r.rank * e.w / r.strength) AS contrib
                    FROM e0 e JOIN r${i - 1} r ON r.node = e.src
                    GROUP BY 1) c ON c.node = nodes.node)"""
    }.mkString(",\n")
    s"""WITH tk AS MATERIALIZED (
            SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
              SELECT doc_id,
                     unnest(list_transform(generate_series(1, len($toks)),
                       i -> {'pos': i, 'tok': ($toks)[i]})) AS u
              FROM documents) q
            WHERE length(u.tok) >= $minLen AND u.tok NOT IN ($stopList)),
          pairs AS MATERIALIZED (
            SELECT least(a.tok, b.tok) AS src, greatest(a.tok, b.tok) AS dst
            FROM tk a JOIN tk b ON a.doc_id = b.doc_id
              AND b.pos - a.pos BETWEEN 1 AND $window
            WHERE a.tok <> b.tok),
          ec AS MATERIALIZED (
            SELECT src, dst, count(*)::DOUBLE AS w FROM pairs GROUP BY 1, 2),
          e0 AS MATERIALIZED (
            SELECT src, dst, w FROM ec
            UNION ALL SELECT dst AS src, src AS dst, w FROM ec),
          odeg AS (SELECT src AS node, sum(w) AS strength FROM e0 GROUP BY 1),
          nodes AS MATERIALIZED (
            SELECT u.node, coalesce(odeg.strength, 0.0) AS strength
            FROM (SELECT src AS node FROM e0
                  UNION SELECT dst AS node FROM e0) u
            LEFT JOIN odeg ON odeg.node = u.node),
          nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
          r0 AS (SELECT node, strength,
                        1.0::DOUBLE / (SELECT n FROM nn) AS rank FROM nodes),
          $steps
        SELECT node AS token, round(rank, 6) AS rank FROM r$iters
        ORDER BY round(rank, 6) DESC, node LIMIT $k"""
  }

  /** Mirror of Corpus.tokenBudgetTrim over the quality-scored corpus:
    * per-(source, 6-dp score) token mass, cumulative over scores
    * descending, a score value kept while the strictly-better mass is
    * under the budget — ties share a fate, same as filterQuality. */
  def corpusBudgetTrim(budget: Long): String = {
    val punctRaw = s"len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE / greatest(length(text), 1)::DOUBLE"
    val nToks = s"len($toks)"
    val stopList = graft.functions.TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
    val stopRaw = s"len(list_filter($toks, t -> t IN ($stopList)))::DOUBLE / greatest($nToks, 1)::DOUBLE"
    val quality = s"""round(least(n_chars::DOUBLE / 500.0, 1.0) * 0.4
              + (1.0 - least(($punctRaw) * 5.0, 1.0)) * 0.3
              + least(($stopRaw) * 4.0, 1.0) * 0.3, 6)"""
    s"""WITH q AS (SELECT doc_id, source, $quality AS quality,
                          ($nToks)::BIGINT AS n_tokens
                   FROM documents),
          byval AS (SELECT source, quality, sum(n_tokens)::BIGINT AS tv
                    FROM q GROUP BY 1, 2),
          c AS (SELECT source, quality,
                       coalesce(sum(tv) OVER (PARTITION BY source
                         ORDER BY quality DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0)::BIGINT AS cum_before
                FROM byval),
          kept AS (SELECT source, quality FROM c WHERE cum_before < $budget)
        SELECT q.doc_id, q.source, q.quality, q.n_tokens
        FROM q JOIN kept ON q.source = kept.source
           AND q.quality = kept.quality"""
  }

  /** Mirror of Graph.maximalMatching over the co-purchase graph:
    * `rounds` unrolled local-minima rounds — the per-node minimum
    * incident edge under (src, dst) order is encoded as
    * src·2³² + dst (exact for 31-bit ids, same lexicographic order as
    * the Spark side's struct min); an edge minimal at BOTH endpoints
    * matches, its endpoints peel. MATERIALIZED per round. */
  def graphMatching(rounds: Int): String = {
    val K = 4294967296L
    val steps = (0 until rounds).map { i =>
      s"""me$i AS MATERIALIZED (
            SELECT node, min(src * $K + dst) AS me FROM (
              SELECT src AS node, src, dst FROM e$i
              UNION ALL SELECT dst AS node, src, dst FROM e$i)
            GROUP BY 1),
          w$i AS MATERIALIZED (
            SELECT e.src, e.dst, $i::BIGINT AS round
            FROM e$i e JOIN me$i a ON a.node = e.src
                       JOIN me$i b ON b.node = e.dst
            WHERE a.me = e.src * $K + e.dst
              AND b.me = e.src * $K + e.dst),
          e${i + 1} AS MATERIALIZED (
            SELECT src, dst FROM e$i
            WHERE src NOT IN (SELECT src FROM w$i UNION
                              SELECT dst FROM w$i)
              AND dst NOT IN (SELECT src FROM w$i UNION
                              SELECT dst FROM w$i))"""
    }.mkString(",\n")
    val union = ((0 until rounds)
      .map(i => s"SELECT src, dst, round FROM w$i") :+
      // the round-bound residual rides with a null round (non-maximality
      // is in-band, never silent); empty when the peel converged
      s"SELECT src, dst, NULL::BIGINT AS round FROM e$rounds")
      .mkString("\nUNION ALL ")
    s"""WITH e0 AS MATERIALIZED ($coPurchase),
          $steps
        $union"""
  }

  /** Mirror of Quality.auditDrift over even/odd-orderkey lineitem
    * halves: per-side dqAudit metrics per column joined on the column
    * name, 6-dp deltas; non-numeric columns carry null means. */
  def dqDrift(numericCols: Seq[String], otherCols: Seq[String]): String = {
    def sideSql(tag: String, parity: Int): String =
      (numericCols.map(c => (c, true)) ++ otherCols.map(c => (c, false))).map {
        case (c, numeric) =>
          val mean =
            if (numeric)
              s"""CASE WHEN count($c) > 0 THEN
                    round(sum($c::DECIMAL(28,6))::DOUBLE
                          / count($c)::DOUBLE, 6) END"""
            else "NULL::DOUBLE"
          s"""SELECT '$c' AS "column", count(*) AS n_$tag,
                     round((count(*) - count($c))::DOUBLE
                           / count(*)::DOUBLE, 6) AS null_frac_$tag,
                     count(DISTINCT $c) AS distinct_$tag,
                     $mean AS mean_$tag
              FROM lineitem WHERE l_orderkey % 2 = $parity"""
      }.mkString("\nUNION ALL\n")
    s"""WITH b AS (${sideSql("before", 0)}),
          a AS (${sideSql("after", 1)})
        SELECT b."column", b.n_before, b.null_frac_before, b.distinct_before,
               b.mean_before, a.n_after, a.null_frac_after, a.distinct_after,
               a.mean_after,
               round(a.null_frac_after - b.null_frac_before, 6)
                 AS null_frac_delta,
               a.distinct_after - b.distinct_before AS distinct_delta,
               round(a.mean_after - b.mean_before, 6) AS mean_delta
        FROM b JOIN a ON b."column" = a."column" """
  }

  /** Mirror of Quality.benfordAudit over lineitem: leading digit from
    * the integer-string rendition of floor(abs(x)), all-9-digit spine
    * (zero counts contribute to chi-square), expected fractions as the
    * SAME IEEE log10 doubles the Spark plan embeds, chi terms 9-dp
    * under decimal sums. */
  def dqBenford(cols: Seq[String]): String = {
    val melt = cols.map { c =>
      s"""SELECT '$c' AS colname,
                 substr(floor(abs($c::DOUBLE))::BIGINT::VARCHAR, 1, 1)::INT
                   AS digit,
                 abs($c::DOUBLE) AS a
          FROM lineitem"""
    }.mkString("\nUNION ALL\n")
    val expCase = graft.operators.Quality.BenfordP.zipWithIndex.map {
      case (p, i) => s"WHEN ${i + 1} THEN ${p}"
    }.mkString(" ")
    s"""WITH m AS ($melt),
          f AS (SELECT colname, digit FROM m
                WHERE a >= 1 AND digit BETWEEN 1 AND 9),
          c AS (SELECT colname, digit, count(*) AS n FROM f GROUP BY 1, 2),
          tt AS (SELECT colname, sum(n)::BIGINT AS tot FROM c GROUP BY 1),
          spine AS (SELECT colname, tot, unnest(range(1, 10))::INT AS digit
                    FROM tt),
          sc AS (SELECT s.colname, s.digit, coalesce(c.n, 0)::BIGINT AS n,
                        s.tot, CASE s.digit $expCase END AS p
                 FROM spine s LEFT JOIN c
                   ON s.colname = c.colname AND s.digit = c.digit),
          chi AS (SELECT colname,
                         round(sum(round(
                           (n::DOUBLE / tot::DOUBLE - p)
                             * (n::DOUBLE / tot::DOUBLE - p)
                             / p * tot::DOUBLE, 9)::DECIMAL(28,12)
                           )::DOUBLE, 6) AS chi_sq
                  FROM sc GROUP BY 1)
        SELECT sc.colname AS "column", sc.digit, sc.n,
               round(sc.n::DOUBLE / sc.tot::DOUBLE, 6) AS obs_frac,
               round(sc.p, 6) AS exp_frac, chi.chi_sq
        FROM sc JOIN chi ON sc.colname = chi.colname"""
  }

  /** Mirror of Graph.greedyColoring: `rounds` unrolled synchronous
    * Jones–Plassmann rounds over the co-purchase graph — winners are
    * the remaining nodes with no smaller-id remaining neighbor
    * (canonical src<dst: exactly the never-a-dst side), each taking
    * the minimum color absent from its already-colored neighbors
    * (mex via an unnest(range) anti-membership min); unresolved nodes
    * surface NULL. MATERIALIZED for the same exponential-inlining
    * reason as [[graphTopoLayers]]. */
  def graphColoring(rounds: Int): String = {
    val steps = (0 until rounds).map { i =>
      s"""w$i AS MATERIALIZED (SELECT node FROM r$i
                  WHERE node NOT IN (SELECT dst FROM e$i)),
          nc$i AS MATERIALIZED (
            SELECT w.node, coalesce(x.c, 0)::BIGINT AS color
            FROM w$i w LEFT JOIN (
              SELECT node, min(k)::BIGINT AS c FROM (
                SELECT g.node, unnest(range(0, g.nc + 1)) AS k, g.cs
                FROM (SELECT a.node, list(DISTINCT c.color) AS cs,
                             count(DISTINCT c.color) AS nc
                      FROM adj a JOIN w$i ww ON a.node = ww.node
                           JOIN col$i c ON a.nbr = c.node
                      GROUP BY a.node) g) t
              WHERE NOT list_contains(t.cs, t.k)
              GROUP BY node) x ON w.node = x.node),
          col${i + 1} AS MATERIALIZED (
            SELECT * FROM col$i UNION ALL SELECT * FROM nc$i),
          e${i + 1} AS MATERIALIZED (
            SELECT * FROM e$i
            WHERE src NOT IN (SELECT node FROM w$i)
              AND dst NOT IN (SELECT node FROM w$i)),
          r${i + 1} AS MATERIALIZED (
            SELECT node FROM r$i
            WHERE node NOT IN (SELECT node FROM w$i))"""
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED ($coPurchase),
          adj AS MATERIALIZED (SELECT src AS node, dst AS nbr FROM e0
                               UNION ALL SELECT dst, src FROM e0),
          r0 AS MATERIALIZED (SELECT DISTINCT node FROM adj),
          col0 AS MATERIALIZED (SELECT NULL::BIGINT AS node,
                                       NULL::BIGINT AS color WHERE 1 = 0),
          $steps
        SELECT node, color FROM col$rounds
        UNION ALL SELECT node, NULL::BIGINT AS color FROM r$rounds"""
  }

  /** Mirror of Similarity.dbscan over the label-blocked embedding
    * corpus: brute-force within-label cosine pairs at the same 6-dp
    * round, neighbor counts (self included) against `minPts`, min-id
    * closure over the core-core subgraph (the dedupClusters recursive
    * CTE), border = min core-neighbor cluster, rest noise. */
  def embDbscan(threshold: Double, minPts: Int): String =
    s"""WITH RECURSIVE
          q AS (SELECT label, vec_id AS a, embedding AS qv FROM embeddings),
          c AS (SELECT label, vec_id AS b, embedding AS cv FROM embeddings),
          p AS (SELECT q.a, c.b FROM q JOIN c
                ON q.label = c.label AND q.a < c.b
                WHERE round($cosineExpr, 6) >= $threshold),
          sym AS (SELECT a AS id, b AS nbr FROM p
                  UNION ALL SELECT b AS id, a AS nbr FROM p),
          core AS (SELECT id FROM (
                     SELECT id, count(*) + 1 AS nn FROM sym GROUP BY 1)
                   WHERE nn >= $minPts),
          cp AS (SELECT a, b FROM p
                 WHERE a IN (SELECT id FROM core)
                   AND b IN (SELECT id FROM core)),
          edges AS (SELECT a AS s, b AS d FROM cp
                    UNION SELECT b AS s, a AS d FROM cp),
          reach AS (
            SELECT s AS x, s AS y FROM (SELECT DISTINCT s FROM edges)
            UNION
            SELECT r.x, e.d AS y FROM reach r JOIN edges e ON r.y = e.s),
          cc AS (SELECT x AS id, min(y) AS lbl FROM reach GROUP BY 1),
          coreout AS (SELECT co.id, 'core' AS role,
                             coalesce(cc.lbl, co.id) AS cluster
                      FROM core co LEFT JOIN cc ON co.id = cc.id),
          border AS (SELECT s.id, 'border' AS role,
                            min(o.cluster) AS cluster
                     FROM sym s JOIN coreout o ON s.nbr = o.id
                     WHERE s.id NOT IN (SELECT id FROM core) GROUP BY 1),
          assigned AS (SELECT * FROM coreout
                       UNION ALL SELECT * FROM border)
        SELECT e.vec_id, coalesce(a.role, 'noise') AS role, a.cluster
        FROM embeddings e LEFT JOIN assigned a ON e.vec_id = a.id"""

  def graphShortestPaths(maxHops: Int, directed: Boolean = false): String = {
    val steps = (1 to maxHops).map { i =>
      s"""r$i AS (SELECT node, min(d) AS dist FROM (
                    SELECT node, dist AS d FROM r${i - 1}
                    UNION ALL
                    SELECT a.dst AS node, r.dist + a.w AS d
                    FROM adj a JOIN r${i - 1} r ON a.src = r.node)
                  GROUP BY 1)"""
    }.mkString(",\n")
    val adj =
      if (directed) "SELECT src, dst, w FROM e0"
      else """SELECT src, dst, w FROM e0
                  UNION ALL SELECT dst AS src, src AS dst, w FROM e0"""
    s"""WITH e0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
                           count(*)::DOUBLE AS w
                    FROM lineitem a JOIN lineitem b
                      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                    WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0
                    GROUP BY 1, 2),
          adj AS ($adj),
          r0 AS (SELECT (SELECT min(src) FROM e0) AS node, 0.0::DOUBLE AS dist),
          $steps
        SELECT node, dist FROM r$maxHops"""
  }

  /** Mirror of Graph.shortestPathTree (directed, weighted): the path
    * rides the relaxation as a BIGINT list inside the min struct —
    * (distance, lexicographically smallest sequence) total order. */
  def graphWspPaths(maxHops: Int): String = {
    val steps = (1 to maxHops).map { i =>
      s"""r$i AS MATERIALIZED (SELECT node, min({'d': d, 'p': p}) AS m FROM (
                    SELECT node, m.d AS d, m.p AS p FROM r${i - 1}
                    UNION ALL
                    SELECT a.dst AS node, r.m.d + a.w AS d,
                           list_append(r.m.p, a.dst) AS p
                    FROM adj a JOIN r${i - 1} r ON a.src = r.node)
                  GROUP BY 1)"""
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
                           count(*)::DOUBLE AS w
                    FROM lineitem a JOIN lineitem b
                      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                    WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0
                    GROUP BY 1, 2),
          adj AS (SELECT src, dst, w FROM e0),
          r0 AS (SELECT n AS node, {'d': 0.0::DOUBLE, 'p': [n]} AS m
                 FROM (SELECT (SELECT min(src) FROM e0) AS n)),
          $steps
        SELECT node, m.d AS dist, array_to_string(m.p, '->') AS path
        FROM r$maxHops"""
  }

  /** Mirror of Graph.boruvkaMst: `rounds` unrolled Borůvka rounds over
    * the BIGINT-weighted co-purchase edges. Per round: each component's
    * minimum outgoing edge under the (w, src, dst) total order (a
    * row_number window per component — fine on DuckDB's small data;
    * the Spark side is a keyed min-struct), DISTINCT across the two
    * claiming sides, then a min-label recursive-CTE closure over the
    * selected component pairs re-labels the merged components. */
  def graphMst(rounds: Int): String = {
    // every non-recursive CTE MATERIALIZED: e0 (a lineitem self-join)
    // is referenced by EVERY Boruvka round and each comp_i chains on
    // comp_{i-1} — inlined, the edge build re-evaluates once per round
    // per reference and the sf0.01 oracle ran ~10 min (the
    // graph_influence_max OOM lesson, round 13 edition)
    val steps = (1 to rounds).map { i =>
      s"""ce$i AS MATERIALIZED (SELECT e.src, e.dst, e.w, a.comp AS cs, b.comp AS cd
                   FROM e0 e JOIN comp${i - 1} a ON e.src = a.node
                             JOIN comp${i - 1} b ON e.dst = b.node
                   WHERE a.comp <> b.comp),
          pick$i AS MATERIALIZED (SELECT c, oc, w, src, dst,
                            row_number() OVER (PARTITION BY c
                              ORDER BY w, src, dst) AS rn
                     FROM (SELECT cs AS c, cd AS oc, w, src, dst FROM ce$i
                           UNION ALL
                           SELECT cd AS c, cs AS oc, w, src, dst FROM ce$i)),
          sel$i AS MATERIALIZED (SELECT DISTINCT src, dst, w FROM pick$i WHERE rn = 1),
          pe$i AS MATERIALIZED (SELECT c AS s, oc AS d FROM pick$i WHERE rn = 1
                   UNION SELECT oc AS s, c AS d FROM pick$i WHERE rn = 1),
          reach$i AS (SELECT s AS x, s AS y FROM (SELECT DISTINCT s FROM pe$i)
                      UNION
                      SELECT r.x, e2.d AS y
                      FROM reach$i r JOIN pe$i e2 ON r.y = e2.s),
          lab$i AS MATERIALIZED (SELECT x AS comp, min(y) AS lab FROM reach$i GROUP BY 1),
          comp$i AS MATERIALIZED (SELECT c.node, coalesce(l.lab, c.comp) AS comp
                     FROM comp${i - 1} c LEFT JOIN lab$i l ON c.comp = l.comp)"""
    }.mkString(",\n")
    val out = (1 to rounds).map { i =>
      s"SELECT src, dst, w, $i AS round FROM sel$i"
    }.mkString("\n        UNION ALL ")
    s"""WITH RECURSIVE e0 AS MATERIALIZED (
            SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS w
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0
            GROUP BY 1, 2),
          comp0 AS MATERIALIZED (SELECT node, node AS comp FROM (
                      SELECT src AS node FROM e0
                      UNION SELECT dst AS node FROM e0)),
          $steps
        $out"""
  }

  /** Mirror of Graph.kShortestDistances: ground truth enumerates ALL
    * hop-bounded walks from the source by recursive CTE, then takes the
    * k smallest DISTINCT costs per node — the definitionally-correct
    * answer the k-frontier relaxation must reproduce. Costs are sums of
    * integer-valued doubles (exact regardless of order). */
  def graphKShortest(k: Int, maxHops: Int): String =
    s"""WITH RECURSIVE e0 AS (
            SELECT a.l_partkey AS src, b.l_partkey AS dst,
                   count(*)::DOUBLE AS w
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0
            GROUP BY 1, 2),
          walk(node, cost, hops) AS (
            SELECT (SELECT min(src) FROM e0), 0.0::DOUBLE, 0
            UNION ALL
            SELECT a.dst, wk.cost + a.w, wk.hops + 1
            FROM walk wk JOIN e0 a ON a.src = wk.node
            WHERE wk.hops < $maxHops),
          d AS (SELECT DISTINCT node, cost FROM walk),
          r AS (SELECT node, cost,
                       row_number() OVER (PARTITION BY node
                         ORDER BY cost) AS k_idx
                FROM d)
        SELECT node, k_idx, cost AS dist FROM r WHERE k_idx <= $k"""

  /** Mirror of Graph.labelPropagation: synchronous min-tie-break LPA,
    * `rounds` unrolled iterations. Each round's argmax (strongest
    * neighbor-label vote, smallest label on ties) is a row_number
    * window on the oracle side — equivalent to the Spark side's
    * max-vote + min-label aggregate pair, and fine on DuckDB's small
    * data. `weighted` votes by summed co-purchase edge weights
    * (integer-valued doubles — order-exact sums) instead of counts. */
  def graphLabelPropagation(rounds: Int, weighted: Boolean = false): String = {
    val vote = if (weighted) "sum(a.w)" else "count(*)"
    val stages = (1 to rounds).map { i =>
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""c$i AS (SELECT a.n AS node, l.label, $vote AS c
                  FROM adj a JOIN $prev l ON a.x = l.node GROUP BY 1, 2),
          l$i AS (SELECT node, label FROM (
                    SELECT node, label,
                           row_number() OVER (PARTITION BY node
                             ORDER BY c DESC, label ASC) AS rn
                    FROM c$i) WHERE rn = 1)"""
    }.mkString(",\n")
    val (e0, adj) =
      if (weighted)
        (s"""SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*)::DOUBLE AS w
             FROM lineitem a JOIN lineitem b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0
             GROUP BY 1, 2""",
          """SELECT src AS n, dst AS x, w FROM e0
             UNION ALL SELECT dst AS n, src AS x, w FROM e0""")
      else
        (coPurchase,
          """SELECT src AS n, dst AS x FROM e0
             UNION ALL SELECT dst AS n, src AS x FROM e0""")
    s"""WITH e0 AS ($e0),
          adj AS ($adj),
          l0 AS (SELECT DISTINCT n AS node, n AS label FROM adj),
          $stages
        SELECT node, label FROM l$rounds"""
  }

  /** Mirror of Graph.eigenvectorCentrality: unrolled power iterations,
    * each neighbor-sum of 9-dp-rounded terms under a DECIMAL(28,12) sum
    * and an L1-normalizing division whose operands are the exact
    * decimal aggregates cast to DOUBLE (the same value Spark's observed
    * write hands back). Contribution tables MATERIALIZED — each is read
    * by its per-node projection AND the scalar normalizer subquery. */
  def graphEigenvector(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""c$i AS MATERIALIZED (
            SELECT a.dst AS node, sum(round(r.score, 9)::DECIMAL(28,12)) AS c
            FROM adj a JOIN r${i - 1} r ON r.node = a.src GROUP BY 1),
          r$i AS MATERIALIZED (
            SELECT node,
                   round(c::DOUBLE / (SELECT sum(c) FROM c$i)::DOUBLE, 9) AS score
            FROM c$i)"""
    }.mkString(",\n")
    s"""WITH e0 AS ($coPurchase),
          adj AS (SELECT src, dst FROM e0
                  UNION ALL SELECT dst AS src, src AS dst FROM e0),
          r0 AS MATERIALIZED (SELECT DISTINCT src AS node, 1.0::DOUBLE AS score
                              FROM adj),
          $steps
        SELECT node, score AS eigenvector FROM r$iters"""
  }

  /** Mirror of Graph.modularity over 3-round-LPA communities: the LPA
    * CTE block (same unrolled rounds as [[graphLabelPropagation]]),
    * then per-community intra-edge counts and degree mass — all exact
    * integers, so the Q-contribution arithmetic is IEEE-identical
    * cross-engine (9-dp-rounded as a belt). */
  def graphModularity(rounds: Int): String = {
    val vote = "count(*)"
    val stages = (1 to rounds).map { i =>
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""c$i AS (SELECT a.n AS node, l.label, $vote AS c
                  FROM adj a JOIN $prev l ON a.x = l.node GROUP BY 1, 2),
          l$i AS (SELECT node, label FROM (
                    SELECT node, label,
                           row_number() OVER (PARTITION BY node
                             ORDER BY c DESC, label ASC) AS rn
                    FROM c$i) WHERE rn = 1)"""
    }.mkString(",\n")
    s"""WITH e0 AS ($coPurchase),
          adj AS (SELECT src AS n, dst AS x FROM e0
                  UNION ALL SELECT dst AS n, src AS x FROM e0),
          l0 AS (SELECT DISTINCT n AS node, n AS label FROM adj),
          $stages,
          mm AS (SELECT count(*)::BIGINT AS m FROM e0),
          deg AS (SELECT node, count(*)::BIGINT AS degree
                  FROM (SELECT src AS node FROM e0
                        UNION ALL SELECT dst AS node FROM e0) GROUP BY 1),
          intra AS (SELECT ls.label AS label, count(*)::BIGINT AS intra_edges
                    FROM e0 JOIN l$rounds ls ON ls.node = e0.src
                            JOIN l$rounds ld ON ld.node = e0.dst
                    WHERE ls.label = ld.label GROUP BY 1),
          cs AS (SELECT l.label, count(*)::BIGINT AS n_nodes,
                        coalesce(sum(d.degree), 0)::BIGINT AS degree_sum
                 FROM l$rounds l LEFT JOIN deg d ON d.node = l.node GROUP BY 1)
        SELECT cs.label, cs.n_nodes,
               coalesce(i.intra_edges, 0)::BIGINT AS intra_edges,
               cs.degree_sum,
               round(coalesce(i.intra_edges, 0)::DOUBLE / (SELECT m FROM mm)::DOUBLE
                 - (cs.degree_sum::DOUBLE
                     / (2.0::DOUBLE * (SELECT m FROM mm)::DOUBLE))
                   * (cs.degree_sum::DOUBLE
                     / (2.0::DOUBLE * (SELECT m FROM mm)::DOUBLE)),
                 9) AS q_contrib
        FROM cs LEFT JOIN intra i ON i.label = cs.label"""
  }

  /** Mirror of Graph.conductance over 3-round-LPA communities: per
    * community, boundary-edge count (each boundary edge cuts both its
    * labeled sides) over min(volume, 2m − volume) — all-integer inputs,
    * one 9-dp division. */
  def graphConductance(rounds: Int): String = {
    val stages = (1 to rounds).map { i =>
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""c$i AS (SELECT a.n AS node, l.label, count(*) AS c
                  FROM adj a JOIN $prev l ON a.x = l.node GROUP BY 1, 2),
          l$i AS (SELECT node, label FROM (
                    SELECT node, label,
                           row_number() OVER (PARTITION BY node
                             ORDER BY c DESC, label ASC) AS rn
                    FROM c$i) WHERE rn = 1)"""
    }.mkString(",\n")
    val denom = s"least(cs.volume, 2*(SELECT m FROM mm) - cs.volume)"
    s"""WITH e0 AS ($coPurchase),
          adj AS (SELECT src AS n, dst AS x FROM e0
                  UNION ALL SELECT dst AS n, src AS x FROM e0),
          l0 AS (SELECT DISTINCT n AS node, n AS label FROM adj),
          $stages,
          mm AS (SELECT count(*)::BIGINT AS m FROM e0),
          deg AS (SELECT node, count(*)::BIGINT AS degree
                  FROM (SELECT src AS node FROM e0
                        UNION ALL SELECT dst AS node FROM e0) GROUP BY 1),
          sides AS (SELECT ls.label AS ls, ld.label AS ld FROM e0
                    LEFT JOIN l$rounds ls ON ls.node = e0.src
                    LEFT JOIN l$rounds ld ON ld.node = e0.dst),
          cuts AS (SELECT label,
                          sum(CASE WHEN other IS NULL OR other <> label
                              THEN 1 ELSE 0 END)::BIGINT AS cut_edges
                   FROM (SELECT ls AS label, ld AS other FROM sides
                         UNION ALL SELECT ld AS label, ls AS other FROM sides)
                   WHERE label IS NOT NULL GROUP BY 1),
          cs AS (SELECT l.label, count(*)::BIGINT AS n_nodes,
                        coalesce(sum(d.degree), 0)::BIGINT AS volume
                 FROM l$rounds l LEFT JOIN deg d ON d.node = l.node GROUP BY 1)
        SELECT cs.label, cs.n_nodes,
               coalesce(c.cut_edges, 0)::BIGINT AS cut_edges, cs.volume,
               CASE WHEN $denom > 0
                    THEN round(coalesce(c.cut_edges, 0)::DOUBLE
                               / ($denom)::DOUBLE, 9)
               END AS conductance
        FROM cs LEFT JOIN cuts c ON c.label = cs.label"""
  }

  /** Mirror of Graph.louvain over the weighted co-purchase graph:
    * unrolled Gauss-Seidel half-sweep local moves (odd-id nodes, then
    * even-id nodes against the half-updated labels), gain arithmetic
    * as exact HUGEINT (the 2m-scaled integer form), per-round 4m²-
    * scaled integer modularity scores, and the Spark loop's acceptance
    * rule re-derived as a CASE over those scores: the answer is the
    * last round whose score strictly increased. */
  def graphLouvain(rounds: Int, levels: Int = 1): String = {
    // the weighted co-purchase graph + the invariant degree mass 2m
    val base =
      s"""e0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
                        count(*)::BIGINT AS w
                 FROM lineitem a JOIN lineitem b
                   ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
                 WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0
                 GROUP BY 1, 2),
          sw0 AS (SELECT src AS node, 0::BIGINT AS selfw FROM e0 WHERE false),
          mm AS (SELECT 2 * sum(w)::BIGINT AS m2 FROM e0)"""
    val phases = (1 to levels).map { lv =>
      val p = s"p$lv"
      val (eT, swT) = if (lv == 1) ("e0", "sw0") else (s"e$lv", s"sw$lv")
      val contraction =
        if (lv == 1) ""
        else {
          val prevFin = s"p${lv - 1}fin"
          val prevE = if (lv == 2) "e0" else s"e${lv - 1}"
          val prevSw = if (lv == 2) "sw0" else s"sw${lv - 1}"
          s"""tag$lv AS (SELECT e.w, ls.label AS ls, ld.label AS ld
                FROM $prevE e JOIN $prevFin ls ON ls.node = e.src
                              JOIN $prevFin ld ON ld.node = e.dst),
          e$lv AS MATERIALIZED (
            SELECT least(ls, ld) AS src, greatest(ls, ld) AS dst,
                   sum(w)::BIGINT AS w
            FROM tag$lv WHERE ls <> ld GROUP BY 1, 2),
          sw$lv AS MATERIALIZED (
            SELECT c.node, coalesce(i.intra, 0)::BIGINT AS selfw
            FROM (SELECT DISTINCT label AS node FROM $prevFin) c
            LEFT JOIN (SELECT node, sum(intra)::BIGINT AS intra FROM (
                         SELECT ls AS node, sum(w)::BIGINT AS intra
                         FROM tag$lv WHERE ls = ld GROUP BY 1
                         UNION ALL
                         SELECT f.label AS node, sum(s.selfw)::BIGINT AS intra
                         FROM $prevFin f JOIN $prevSw s ON s.node = f.node
                         GROUP BY 1) GROUP BY 1) i ON i.node = c.node),
          """
        }
      contraction + louvainPhase(p, eT, swT, rounds)
    }.mkString(",\n")
    val mapBack = (2 to levels).foldLeft("p1fin.label") { (acc, lv) =>
      s"(SELECT f.label FROM p${lv}fin f WHERE f.node = $acc)"
    }
    s"""WITH $base,
          $phases
        SELECT p1fin.node, $mapBack AS community
        FROM p1fin"""
  }

  /** One Louvain phase over edge table `eT` (src, dst, w) and self-mass
    * table `swT` (node, selfw): unrolled Gauss-Seidel half-sweeps with
    * exact HUGEINT gain arithmetic, per-round 4m²-scaled integer
    * modularity scores (self mass enters k_i and L_C but never a move
    * decision), and the acceptance CASE folded into a `<p>fin` label
    * CTE: the answer is the last round whose score strictly rose. */
  private def louvainPhase(
      p: String, eT: String, swT: String, rounds: Int): String = {
    def half(t: String, prev: String, par: Int, out: String): String =
      s"""${t}st AS (SELECT l.label AS c, sum(k.ki)::BIGINT AS tot
                     FROM $prev l JOIN ${p}ki k ON k.node = l.node GROUP BY 1),
          ${t}cd AS (SELECT node, c, sum(w)::BIGINT AS kic FROM (
                       SELECT a.n AS node, l.label AS c, a.w AS w
                       FROM ${p}adj a JOIN $prev l ON a.x = l.node
                       UNION ALL
                       SELECT node, label AS c, 0 AS w FROM $prev)
                     GROUP BY 1, 2),
          ${t}mv AS (SELECT node, c AS label FROM (
                       SELECT cd.node, cd.c,
                              row_number() OVER (PARTITION BY cd.node ORDER BY
                                ((SELECT m2 FROM mm)::HUGEINT * cd.kic
                                  - k.ki::HUGEINT *
                                    (st.tot - CASE WHEN cd.c = cur.c0
                                              THEN k.ki ELSE 0 END)) DESC,
                                cd.c ASC) AS rn
                       FROM ${t}cd cd
                       JOIN (SELECT node, label AS c0 FROM $prev) cur
                         ON cur.node = cd.node
                       JOIN ${p}ki k ON k.node = cd.node
                       JOIN ${t}st st ON st.c = cd.c
                       WHERE cd.node % 2 = $par) WHERE rn = 1),
          $out AS MATERIALIZED (
            SELECT node, label FROM $prev WHERE node % 2 <> $par
            UNION ALL SELECT node, label FROM ${t}mv)"""
    def scoreCte(l: String, out: String): String =
      s"""$out AS MATERIALIZED (
            SELECT sum(2::HUGEINT * (SELECT m2 FROM mm)
                     * (coalesce(lc.lc, 0) + dc.swc)
                   - dc.dc::HUGEINT * dc.dc) AS s
            FROM (SELECT l.label AS c, sum(k.ki)::BIGINT AS dc,
                         sum(coalesce(s.selfw, 0))::BIGINT AS swc
                  FROM $l l JOIN ${p}ki k ON k.node = l.node
                  LEFT JOIN $swT s ON s.node = l.node GROUP BY 1) dc
            LEFT JOIN (SELECT ls.label AS c, sum(e.w)::BIGINT AS lc
                       FROM $eT e JOIN $l ls ON ls.node = e.src
                               JOIN $l ld ON ld.node = e.dst
                       WHERE ls.label = ld.label GROUP BY 1) lc
              ON lc.c = dc.c)"""
    val stages = (1 to rounds).map { r =>
      val prev = if (r == 1) s"${p}l0" else s"${p}l${r - 1}"
      half(s"${p}r${r}a", prev, 1, s"${p}h$r") + ",\n" +
        half(s"${p}r${r}b", s"${p}h$r", 0, s"${p}l$r") + ",\n" +
        scoreCte(s"${p}l$r", s"${p}sc$r")
    }.mkString(",\n")
    val accept = (1 to rounds).map { r =>
      s"WHEN (SELECT s FROM ${p}sc$r) <= (SELECT s FROM ${p}sc${r - 1}) " +
        s"THEN ${p}l${r - 1}.label"
    }.mkString("\n               ")
    val joins = (1 to rounds)
      .map(r => s"JOIN ${p}l$r ON ${p}l$r.node = ${p}l0.node").mkString(" ")
    s"""${p}adj AS (SELECT src AS n, dst AS x, w FROM $eT
                  UNION ALL SELECT dst AS n, src AS x, w FROM $eT),
          ${p}ki AS MATERIALIZED (
            SELECT u.node,
                   (coalesce(k.kw, 0) + 2 * coalesce(s.selfw, 0))::BIGINT AS ki
            FROM (SELECT n AS node FROM ${p}adj
                  UNION SELECT node FROM $swT) u
            LEFT JOIN (SELECT n AS node, sum(w)::BIGINT AS kw
                       FROM ${p}adj GROUP BY 1) k ON k.node = u.node
            LEFT JOIN $swT s ON s.node = u.node),
          ${p}l0 AS MATERIALIZED (SELECT node, node AS label FROM ${p}ki),
          ${scoreCte(s"${p}l0", s"${p}sc0")},
          $stages,
          ${p}fin AS MATERIALIZED (
            SELECT ${p}l0.node,
                   CASE $accept
                        ELSE ${p}l$rounds.label END AS label
            FROM ${p}l0 $joins)"""
  }

  /** Mirror of Graph.degreeAssortativity: exact BIGINT moment sums over
    * the symmetrized edge ends, then the covariance-form Pearson
    * coefficient — divisions and sqrt on bit-identical operands. */
  val graphAssortativity: String =
    s"""WITH e0 AS ($coPurchase),
          deg AS (SELECT node, count(*)::BIGINT AS degree
                  FROM (SELECT src AS node FROM e0
                        UNION ALL SELECT dst AS node FROM e0) GROUP BY 1),
          ends AS (SELECT dx.degree AS x, dy.degree AS y
                   FROM (SELECT src, dst FROM e0
                         UNION ALL SELECT dst AS src, src AS dst FROM e0) s
                   JOIN deg dx ON dx.node = s.src
                   JOIN deg dy ON dy.node = s.dst),
          agg AS (SELECT count(*)::BIGINT AS n,
                         coalesce(sum(x), 0)::BIGINT AS sx,
                         coalesce(sum(y), 0)::BIGINT AS sy,
                         coalesce(sum(x*y), 0)::BIGINT AS sxy,
                         coalesce(sum(x*x), 0)::BIGINT AS sxx,
                         coalesce(sum(y*y), 0)::BIGINT AS syy
                  FROM ends)
        SELECT n AS n_ends,
               CASE WHEN n > 0
                     AND (sxx::DOUBLE/n::DOUBLE
                          - (sx::DOUBLE/n::DOUBLE)*(sx::DOUBLE/n::DOUBLE)) > 0
                     AND (syy::DOUBLE/n::DOUBLE
                          - (sy::DOUBLE/n::DOUBLE)*(sy::DOUBLE/n::DOUBLE)) > 0
                    THEN round(
                      (sxy::DOUBLE/n::DOUBLE
                       - (sx::DOUBLE/n::DOUBLE)*(sy::DOUBLE/n::DOUBLE))
                      / sqrt((sxx::DOUBLE/n::DOUBLE
                              - (sx::DOUBLE/n::DOUBLE)*(sx::DOUBLE/n::DOUBLE))
                           * (syy::DOUBLE/n::DOUBLE
                              - (sy::DOUBLE/n::DOUBLE)*(sy::DOUBLE/n::DOUBLE))), 6)
               END AS assortativity
        FROM agg"""

  /** Mirror of Graph.connectedComponents: transitive closure over the
    * symmetrized canonical edges, component = min reachable id. */
  val graphComponents: String =
    s"""WITH RECURSIVE e0 AS ($coPurchase),
          edges AS (SELECT src AS s, dst AS d FROM e0
                    UNION SELECT dst AS s, src AS d FROM e0),
          reach AS (
            SELECT s AS x, s AS y FROM (SELECT DISTINCT s FROM edges)
            UNION
            SELECT r.x, e.d AS y FROM reach r JOIN edges e ON r.y = e.s),
          cc AS (SELECT x AS node, min(y) AS component FROM reach GROUP BY x)
        SELECT node, component FROM cc"""

  /** Mirror of Graph.influenceMaximization: per-sample md5-coin live
    * edges over the SAME canonical co-purchase fixture, per-sample
    * reachability closure → components (+ singleton fallback), the
    * (sample, node, comp, size) table, then `k` unrolled greedy rounds
    * — each an argmax over the not-yet-covered component sizes with
    * chosen-node exclusion, exactly the Spark loop's rule (gain DESC,
    * node ASC). All arithmetic integer-exact. */
  /** The per-sample component labels are derived by `ccRounds` UNROLLED
    * min-label + pointer-jump rounds (the kCore fixed-unroll
    * discipline: idempotent past the fixpoint, and an UNDER-unrolled
    * oracle diverges from Spark's exactly-converged labels and fails
    * the compare loudly — never a silent pass) instead of the previous
    * all-pairs reachability closure, whose |component|² row count OOMed
    * DuckDB at sf0.1 (the one heavy query the sf0.1 tier had to
    * exclude). Each round is two linear joins over (samples × nodes)
    * rows; pointer jumping doubles label-propagation distance per
    * round, so 10 rounds cover any diameter ≤ 2¹⁰. */
  def graphInfluenceMax(k: Int, p: Double, samples: Int,
      ccRounds: Int = 10): String = {
    val threshold = (p * 4294967296.0).toLong
    val sampleVals = (0 until samples).map(r => s"($r)").mkString(",")
    val ccChain = new StringBuilder
    for (i <- 1 to ccRounds) {
      val prev = s"l${i - 1}"
      ccChain.append(s""",
          l$i AS MATERIALIZED (
            SELECT l.s, l.node,
                   least(l.lab, coalesce(nm.mn, l.lab),
                         coalesce(jj.lab, l.lab)) AS lab
            FROM $prev l
            LEFT JOIN (SELECT e.s, e.a AS node, min(x.lab) AS mn
                       FROM ed e JOIN $prev x ON e.s = x.s AND e.b = x.node
                       GROUP BY 1, 2) nm
              ON nm.s = l.s AND nm.node = l.node
            LEFT JOIN $prev jj ON jj.s = l.s AND jj.node = l.lab)""")
    }
    val rounds = new StringBuilder
    for (i <- 1 to k) {
      val notCovered =
        if (i == 1) ""
        else (1 until i).map(j =>
          s"""AND NOT EXISTS (SELECT 1 FROM cov$j c
                              WHERE c.s = a.s AND c.comp = a.comp)""")
          .mkString(" ")
      val notChosen =
        if (i == 1) ""
        else "WHERE node NOT IN (" +
          (1 until i).map(j => s"SELECT node FROM s$j").mkString(" UNION ALL ") + ")"
      rounds.append(s""",
          g$i AS (SELECT a.node, sum(a.csize)::BIGINT AS gain
                  FROM a2 a WHERE TRUE $notCovered GROUP BY 1),
          s$i AS (SELECT node, gain FROM g$i $notChosen
                  ORDER BY gain DESC, node ASC LIMIT 1),
          cov$i AS (SELECT DISTINCT a.s, a.comp FROM a2 a
                    JOIN s$i ON a.node = s$i.node)""")
    }
    val res = (1 to k).map(i => s"SELECT $i AS rank, node, gain FROM s$i")
      .mkString(" UNION ALL ")
    s"""WITH e0 AS ($coPurchase),
          smp(s) AS (VALUES $sampleVals),
          live AS (SELECT t.s, e.src, e.dst FROM e0 e CROSS JOIN smp t
                   WHERE ('0x' || substr(md5('icm:' || t.s || ':' ||
                            e.src || ':' || e.dst), 1, 8))::BIGINT
                         < $threshold),
          ed AS MATERIALIZED (
                 SELECT s, src AS a, dst AS b FROM live
                 UNION SELECT s, dst AS a, src AS b FROM live),
          nodes AS MATERIALIZED (
                    SELECT DISTINCT node FROM
                    (SELECT src AS node FROM e0
                     UNION ALL SELECT dst AS node FROM e0)),
          l0 AS MATERIALIZED (SELECT t.s, n.node, n.node AS lab
                 FROM nodes n CROSS JOIN smp t)${ccChain},
          asgn AS MATERIALIZED (SELECT s, node, lab AS comp FROM l$ccRounds),
          sizes AS (SELECT s, comp, count(*) AS csize
                    FROM asgn GROUP BY 1, 2),
          a2 AS MATERIALIZED (SELECT a.s, a.node, a.comp, z.csize
                 FROM asgn a JOIN sizes z USING (s, comp))${rounds}
        SELECT rank::INT AS rank, node, gain,
               (sum(gain) OVER (ORDER BY rank))::BIGINT AS cum_spread
        FROM ($res)"""
  }

  /** Mirror of Graph.stronglyConnectedComponents: EXACT mutual
    * reachability over the parity-directed co-purchase edges (closure
    * both ways), scc id = min mutually-reachable id (incl. self). The
    * oracle needs no peeling — the closure is the ground truth the
    * min-label FW-BW peel must reproduce. */
  val graphScc: String =
    s"""WITH RECURSIVE e0 AS ($coPurchase),
          ed AS (SELECT CASE WHEN (src + dst) % 2 = 0 THEN src ELSE dst END AS s,
                        CASE WHEN (src + dst) % 2 = 0 THEN dst ELSE src END AS d
                 FROM e0),
          nodes AS (SELECT DISTINCT s AS node FROM ed
                    UNION SELECT DISTINCT d AS node FROM ed),
          reach AS (
            SELECT s, d FROM ed
            UNION
            SELECT r.s, e.d FROM reach r JOIN ed e ON r.d = e.s),
          mutual AS (
            SELECT a.s AS u, a.d AS v
            FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s)
        SELECT n.node, least(n.node, coalesce(min(m.u), n.node)) AS scc_id
        FROM nodes n LEFT JOIN mutual m ON m.v = n.node
        GROUP BY n.node"""

  def graphCommonNeighbors(k: Int): String =
    s"""WITH e0 AS ($coPurchase),
          adj AS (SELECT src AS n, dst AS x FROM e0
                  UNION ALL SELECT dst AS n, src AS x FROM e0),
          p AS (SELECT a1.x AS a, a2.x AS b, count(*) AS common
                FROM adj a1 JOIN adj a2 ON a1.n = a2.n AND a1.x < a2.x
                GROUP BY 1, 2)
        SELECT a, b, common FROM p
        WHERE NOT EXISTS (SELECT 1 FROM e0 WHERE e0.src = p.a AND e0.dst = p.b)
        ORDER BY common DESC, a, b LIMIT $k"""

  /** Mirror of Graph.adamicAdarTopK: wedge centers weighted 1/ln(deg),
    * per-term 9-dp rounding then DECIMAL(18,9) exact summation (the
    * library's order-exact double-aggregate pattern), final cast to
    * DOUBLE. 1.0::DOUBLE keeps the division in IEEE doubles — DuckDB
    * parses a bare 1.0 as DECIMAL(2,1). */
  def graphAdamicAdar(k: Int): String =
    s"""WITH e0 AS ($coPurchase),
          adj AS (SELECT src AS n, dst AS x FROM e0
                  UNION ALL SELECT dst AS n, src AS x FROM e0),
          deg AS (SELECT n AS node, count(*) AS d FROM adj GROUP BY 1),
          w AS (SELECT a.n, a.x,
                       round(1.0::DOUBLE / ln(dg.d::DOUBLE), 9)::DECIMAL(18,9) AS aa
                FROM adj a JOIN deg dg ON dg.node = a.n WHERE dg.d >= 2),
          p AS (SELECT a1.x AS a, a2.x AS b, sum(a1.aa) AS s
                FROM w a1 JOIN w a2 ON a1.n = a2.n AND a1.x < a2.x
                GROUP BY 1, 2)
        SELECT a, b, s::DOUBLE AS score FROM p
        WHERE NOT EXISTS (SELECT 1 FROM e0 WHERE e0.src = p.a AND e0.dst = p.b)
        ORDER BY score DESC, a, b LIMIT $k"""

  /** Mirror of Graph.harmonicCentrality: `maxHops` unrolled multi-source
    * BFS rounds from the landmark sample (node % landmarkMod = 0), then
    * Σ 1/dist over reached pairs with the same 9-dp-round + DECIMAL-sum
    * discipline. Rounds are MATERIALIZED — DuckDB inlines plain CTEs
    * and each round references its predecessor twice. */
  /** Shared landmark multi-source BFS CTE block (mirrors
    * Graph.bfsDistances over the co-purchase fixture): e0, symmetrized
    * adj, r0 = the landmark seeds (node % landmarkMod = 0), r1..rH
    * min-distance rounds, each MATERIALIZED (read twice by its
    * successor). Final table: r<maxHops> (s, node, dist). */
  private def bfsCtes(maxHops: Int, landmarkMod: Int): String = {
    val steps = (1 to maxHops).map { i =>
      s"""r$i AS MATERIALIZED (SELECT s, node, min(d) AS dist FROM (
                    SELECT s, node, dist AS d FROM r${i - 1}
                    UNION ALL
                    SELECT r.s, a.dst AS node, r.dist + 1 AS d
                    FROM adj a JOIN r${i - 1} r ON a.src = r.node)
                  GROUP BY 1, 2)"""
    }.mkString(",\n")
    s"""e0 AS ($coPurchase),
          adj AS (SELECT src, dst FROM e0
                  UNION ALL SELECT dst AS src, src AS dst FROM e0),
          r0 AS MATERIALIZED (SELECT DISTINCT src AS s, src AS node, 0 AS dist
                              FROM adj WHERE src % $landmarkMod = 0),
          $steps"""
  }

  def graphHarmonic(maxHops: Int, landmarkMod: Int): String =
    s"""WITH ${bfsCtes(maxHops, landmarkMod)}
        SELECT s AS node,
               sum(round(1.0::DOUBLE / dist, 9)::DECIMAL(18,9))::DOUBLE AS centrality
        FROM r$maxHops WHERE dist > 0 GROUP BY 1"""

  /** Mirror of Graph.closenessCentrality: reached count / distance sum
    * over the hop-bounded ball, 6-dp division — integer parts exact. */
  def graphCloseness(maxHops: Int, landmarkMod: Int): String =
    s"""WITH ${bfsCtes(maxHops, landmarkMod)}
        SELECT s AS node, count(*)::BIGINT AS reached,
               round(count(*)::DOUBLE / sum(dist)::DOUBLE, 6) AS closeness
        FROM r$maxHops WHERE dist > 0 GROUP BY 1"""

  /** Mirror of Graph.betweennessCentrality: the same BFS levels, then
    * Brandes forward σ (path counts, level equi-joins on the final
    * min-dist table) and backward δ (per-term 9-dp rounds under
    * DECIMAL sums; a node with no successors keeps δ = 0 via the LEFT
    * join), summed per node with sources excluded. σ/δ rounds
    * MATERIALIZED — each is read by its neighbor level. */
  def graphBetweenness(maxHops: Int, landmarkMod: Int, k: Int): String = {
    val rH = s"r$maxHops"
    val sigmas = (1 to maxHops).map { h =>
      s"""sg$h AS MATERIALIZED (
            SELECT d.s, d.node, sum(p.sigma)::BIGINT AS sigma
            FROM $rH d
            JOIN adj a ON a.dst = d.node
            JOIN sg${h - 1} p ON p.s = d.s AND p.node = a.src
            WHERE d.dist = $h
            GROUP BY 1, 2)"""
    }.mkString(",\n")
    val backs = (maxHops - 1 to 0 by -1).map { h =>
      s"""dep$h AS (SELECT b.s, a.src AS node,
                 sum(round(1.0::DOUBLE / b.sigma::DOUBLE
                     * (1.0::DOUBLE + b.delta), 9)::DECIMAL(28,12)) AS dep
               FROM adj a JOIN dl${h + 1} b ON b.node = a.dst
               GROUP BY 1, 2),
          dl$h AS MATERIALIZED (
            SELECT g.s, g.node, g.sigma,
                   round(g.sigma::DOUBLE * coalesce(d.dep::DOUBLE, 0.0::DOUBLE), 9)
                     AS delta
            FROM sg$h g LEFT JOIN dep$h d ON d.s = g.s AND d.node = g.node)"""
    }.mkString(",\n")
    val unions = (0 until maxHops)
      .map(h => s"SELECT s, node, delta FROM dl$h")
      .mkString("\n        UNION ALL ")
    s"""WITH ${bfsCtes(maxHops, landmarkMod)},
          sg0 AS MATERIALIZED (SELECT s, node, 1::BIGINT AS sigma
                               FROM $rH WHERE dist = 0),
          $sigmas,
          dl$maxHops AS MATERIALIZED (
            SELECT s, node, sigma, 0.0::DOUBLE AS delta FROM sg$maxHops),
          $backs
        SELECT node,
               round(sum(delta::DECIMAL(28,12))::DOUBLE, 6) AS betweenness
        FROM ($unions) WHERE node <> s
        GROUP BY 1
        ORDER BY betweenness DESC, node LIMIT $k"""
  }

  /** Mirror of Graph.randomWalks: per-step argmin of the
    * md5(salt:walk:step:neighbor) coin via a row_number window —
    * equivalent to the Spark side's min-struct aggregate on DuckDB's
    * small data. Steps MATERIALIZED (each is read by the next and by
    * the final union). */
  /** Mirror of Graph.fastRP: md5-coin Achlioptas s=2 projection init
    * (+1/−1 at p=1/4 each, 0 at p=1/2), per-iteration neighbor average
    * (DECIMAL-exact sums of 9-dp values, one division by the integer
    * degree) and L2 normalization (12-dp squared terms under a DECIMAL
    * sum, IEEE sqrt), weighted per-iteration sum at 6 dp. Rounds are
    * MATERIALIZED (each is read by its norm probe and its successor). */
  def graphFastRP(
      dims: Int, iterations: Int, weights: Seq[Double], salt: String): String = {
    val steps = (1 to iterations).map { k =>
      s"""a$k AS MATERIALIZED (
            SELECT adj.n AS node, h.dim,
                   round(sum(h.v::DECIMAL(28,12))::DOUBLE / adj.degree, 9) AS v
            FROM adj JOIN h${k - 1} h ON h.node = adj.x
            GROUP BY 1, 2, adj.degree),
          n$k AS (SELECT node,
                         sqrt(sum(round(v * v, 12)::DECIMAL(28,12))::DOUBLE) AS nrm
                  FROM a$k GROUP BY 1),
          h$k AS MATERIALIZED (
            SELECT a.node, a.dim,
                   CASE WHEN n.nrm > 0.0::DOUBLE THEN round(a.v / n.nrm, 9)
                        ELSE 0.0::DOUBLE END AS v
            FROM a$k a JOIN n$k n ON n.node = a.node)"""
    }.mkString(",\n")
    val terms = (1 to iterations).map { k =>
      s"SELECT node, dim, round(${weights(k - 1)}::DOUBLE * v, 9)::DECIMAL(28,12) AS t FROM h$k"
    }.mkString("\n        UNION ALL ")
    s"""WITH e0 AS ($coPurchase),
          sym AS (SELECT src AS n, dst AS x FROM e0
                  UNION ALL SELECT dst AS n, src AS x FROM e0),
          deg AS (SELECT n, count(*) AS degree FROM sym GROUP BY 1),
          adj AS (SELECT sym.n, sym.x, deg.degree FROM sym JOIN deg ON deg.n = sym.n),
          nodes AS (SELECT DISTINCT n AS node FROM sym),
          h0 AS MATERIALIZED (
            SELECT node, dim,
                   CASE WHEN c < 1073741824 THEN 1.0::DOUBLE
                        WHEN c < 2147483648 THEN (-1.0)::DOUBLE
                        ELSE 0.0::DOUBLE END AS v
            FROM (SELECT node, dim,
                         ('0x' || substr(md5(concat_ws(':', '$salt',
                            node::VARCHAR, dim::VARCHAR)), 1, 8))::BIGINT AS c
                  FROM nodes CROSS JOIN (SELECT unnest(range(0, $dims)) AS dim))),
          $steps
        SELECT node, dim::INT AS dim, round(sum(t)::DOUBLE, 6) AS value
        FROM ($terms)
        GROUP BY 1, 2"""
  }

  def graphRandomWalks(steps: Int, salt: String): String = {
    val stepCtes = (1 to steps).map { i =>
      s"""s$i AS MATERIALIZED (
            SELECT walk, node FROM (
              SELECT r.walk, a.x AS node,
                     row_number() OVER (PARTITION BY r.walk ORDER BY
                       md5(concat_ws(':', '$salt', r.walk::VARCHAR,
                                     '$i', a.x::VARCHAR)), a.x) AS rn
              FROM adj a JOIN s${i - 1} r ON a.n = r.node) WHERE rn = 1)"""
    }.mkString(",\n")
    val selects = (0 to steps)
      .map(i => s"SELECT walk, $i AS step, node FROM s$i")
      .mkString("\n        UNION ALL ")
    s"""WITH e0 AS ($coPurchase),
          adj AS (SELECT src AS n, dst AS x FROM e0
                  UNION ALL SELECT dst AS n, src AS x FROM e0),
          s0 AS MATERIALIZED (SELECT DISTINCT n AS walk, n AS node FROM adj),
          $stepCtes
        $selects"""
  }

  /** Mirror of Graph.node2vecWalks: unrolled second-order steps — the
    * same adjacency fanout + (prev, x) membership LEFT join for the
    * bias class, per-walk cumulative integer weights in ascending
    * neighbor-id order, and the exact (coin·W) >> 32 inverse-CDF
    * target re-derived from the same md5 coin. */
  def graphNode2vecWalks(
      steps: Int, rw: Long, cw: Long, fw: Long, salt: String): String = {
    val stepCtes = (1 to steps).map { i =>
      s"""c$i AS (SELECT cur.walk, cur.node AS at, cur.prev, a.x AS cx
                  FROM adj a JOIN s${i - 1} cur ON a.n = cur.node),
          w$i AS (SELECT c.walk, c.at, c.prev, c.cx,
                         CASE WHEN c.prev IS NULL THEN 1::BIGINT
                              WHEN c.cx = c.prev THEN $rw::BIGINT
                              WHEN p.n IS NOT NULL THEN $cw::BIGINT
                              ELSE $fw::BIGINT END AS wt
                  FROM c$i c LEFT JOIN adj p
                    ON p.n = c.prev AND p.x = c.cx),
          s$i AS MATERIALIZED (
            SELECT walk, min(cx) AS node, min(at) AS prev FROM (
              SELECT walk, at, cx,
                     (sum(wt) OVER (PARTITION BY walk ORDER BY cx
                       ROWS UNBOUNDED PRECEDING))::BIGINT AS cum,
                     (sum(wt) OVER (PARTITION BY walk))::BIGINT AS tw,
                     ('0x' || substr(md5(concat_ws(':', '$salt',
                       walk::VARCHAR, '$i')), 1, 8))::BIGINT AS c
              FROM w$i)
            WHERE cum > ((c * tw) >> 32) GROUP BY walk)"""
    }.mkString(",\n")
    val selects = (0 to steps)
      .map(i => s"SELECT walk, $i AS step, node FROM s$i")
      .mkString("\n        UNION ALL ")
    s"""WITH e0 AS ($coPurchase),
          adj AS (SELECT src AS n, dst AS x FROM e0
                  UNION ALL SELECT dst AS n, src AS x FROM e0),
          s0 AS MATERIALIZED (SELECT DISTINCT n AS walk, n AS node,
                                     NULL::BIGINT AS prev FROM adj),
          $stepCtes
        $selects"""
  }

  /** Mirror of Graph.weightedRandomWalks: unrolled steps, per-walk
    * cumulative integer edge weights in ascending neighbor-id order,
    * the exact (coin·W) >> 32 inverse-CDF target per (walk, step). */
  def graphWeightedWalks(steps: Int, salt: String): String = {
    val stepCtes = (1 to steps).map { i =>
      s"""s$i AS MATERIALIZED (
            SELECT walk, min(cx) AS node FROM (
              SELECT c.walk, c.cx,
                     (sum(c.wt) OVER (PARTITION BY c.walk ORDER BY c.cx
                        ROWS UNBOUNDED PRECEDING))::BIGINT AS cum,
                     (sum(c.wt) OVER (PARTITION BY c.walk))::BIGINT AS tw,
                     ('0x' || substr(md5(concat_ws(':', '$salt',
                        c.walk::VARCHAR, '$i')), 1, 8))::BIGINT AS coin
              FROM (SELECT r.walk, a.x AS cx, a.w AS wt
                    FROM adj a JOIN s${i - 1} r ON a.n = r.node) c)
            WHERE cum > ((coin * tw) >> 32) GROUP BY walk)"""
    }.mkString(",\n")
    val selects = (0 to steps)
      .map(i => s"SELECT walk, $i AS step, node FROM s$i")
      .mkString("\n        UNION ALL ")
    s"""WITH e0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
                           count(*)::BIGINT AS w
                    FROM lineitem a JOIN lineitem b
                      ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
                    WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0
                    GROUP BY 1, 2),
          adj AS (SELECT src AS n, dst AS x, w FROM e0
                  UNION ALL SELECT dst AS n, src AS x, w FROM e0),
          s0 AS MATERIALIZED (SELECT DISTINCT n AS walk, n AS node FROM adj),
          $stepCtes
        $selects"""
  }

  /** Neyman-allocation stratified sampling (Corpus.neymanSample): the
    * same 6-dp quality score, decimal-exact per-stratum moment sums,
    * round(n_h·σ_h, 6) weights summed as decimal, double-order rate
    * arithmetic, and the salted `ney:` integer coin. */
  /** Mirror of Corpus.annealPlan: same quality expression, decimal-
    * exact per-source moments, 1-row totals, quality² phase-2 weight,
    * integer per-phase budgets computed here exactly as the Scala
    * side computes them. */
  def corpusAnnealPlan(budgetTokens: Long, phase2Permille: Int): String = {
    val p1Budget = budgetTokens * (1000L - phase2Permille) / 1000L
    val p2Budget = budgetTokens * phase2Permille / 1000L
    val punctRaw = s"len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE / greatest(length(text), 1)::DOUBLE"
    val nToks = s"len($toks)"
    val stopList = graft.functions.TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
    val stopRaw = s"len(list_filter($toks, t -> t IN ($stopList)))::DOUBLE / greatest($nToks, 1)::DOUBLE"
    val quality = s"""round(least(n_chars::DOUBLE / 500.0, 1.0) * 0.4
              + (1.0 - least(($punctRaw) * 5.0, 1.0)) * 0.3
              + least(($stopRaw) * 4.0, 1.0) * 0.3, 6)"""
    s"""WITH d AS (SELECT source, $quality AS q, $nToks::BIGINT AS nt
                   FROM documents),
          per AS (SELECT source, count(*)::BIGINT AS n_docs,
                         sum(nt)::BIGINT AS n_tokens,
                         round(sum(q::DECIMAL(28,6))::DOUBLE / count(*), 6)
                           AS q_mean
                  FROM d GROUP BY 1),
          pw AS (SELECT source, n_docs, n_tokens, q_mean,
                        round(n_tokens * q_mean * q_mean, 6) AS w
                 FROM per),
          tot AS (SELECT sum(n_tokens)::BIGINT AS tot_tokens,
                         sum(w::DECIMAL(28,6))::DOUBLE AS tot_w FROM pw),
          sh AS (SELECT source, n_docs, n_tokens, q_mean,
                        round(n_tokens::DOUBLE / tot_tokens, 6) AS share_phase1,
                        CASE WHEN tot_w > 0 THEN round(w / tot_w, 6) END
                          AS share_phase2
                 FROM pw, tot)
        SELECT source, n_docs, n_tokens, q_mean, share_phase1, share_phase2,
               CASE WHEN share_phase1 > 0
                    THEN round(share_phase2 / share_phase1, 6) END
                 AS anneal_boost,
               round($p1Budget * share_phase1, 0)::BIGINT AS tokens_phase1,
               round($p2Budget * share_phase2, 0)::BIGINT AS tokens_phase2,
               (round($p2Budget * share_phase2, 0)::BIGINT > n_tokens)
                 AS oversampled
        FROM sh"""
  }

  def sampleNeyman(budget: Long): String = {
    val punctRaw = s"len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE / greatest(length(text), 1)::DOUBLE"
    val nToks = s"len($toks)"
    val stopList = graft.functions.TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
    val stopRaw = s"len(list_filter($toks, t -> t IN ($stopList)))::DOUBLE / greatest($nToks, 1)::DOUBLE"
    val quality = s"""round(least(n_chars::DOUBLE / 500.0, 1.0) * 0.4
              + (1.0 - least(($punctRaw) * 5.0, 1.0)) * 0.3
              + least(($stopRaw) * 4.0, 1.0) * 0.3, 6)"""
    s"""WITH d AS (SELECT doc_id, source, $quality AS q FROM documents),
          s AS (SELECT source, count(*) AS n_h,
                       sum(q::DECIMAL(28,6))::DOUBLE AS s1,
                       sum((q * q)::DECIMAL(38,12))::DOUBLE AS s2
                FROM d GROUP BY 1),
          w AS (SELECT source, n_h,
                       round(n_h * sqrt(greatest(
                         (s2 - s1 * s1 / n_h) / n_h, 0.0::DOUBLE)), 6) AS w_h
                FROM s),
          tw AS (SELECT sum(w_h::DECIMAL(28,6))::DOUBLE AS w_tot FROM w),
          r AS (SELECT source,
                       CASE WHEN w_tot > 0.0
                            THEN least(1.0::DOUBLE,
                                 $budget.0::DOUBLE * w_h / w_tot / n_h)
                            ELSE 0.0::DOUBLE END AS rate
                FROM w CROSS JOIN tw),
          t AS (SELECT source, rate,
                       floor(rate * 4294967296.0)::BIGINT AS thr FROM r)
        SELECT d.doc_id, d.source, round(t.rate, 6) AS rate
        FROM d JOIN t USING (source)
        WHERE ('0x' || substr(md5('ney:' || d.doc_id::VARCHAR), 1, 8))::BIGINT < t.thr"""
  }

  /** Unigram-LM tokenizer learning (TextAnalysis.unigramLmVocab):
    * the same word table, substring-occurrence explode, seed top-k,
    * and unrolled EM rounds — forward/backward DPs as list_reduce
    * folds (identical fixed evaluation order ⇒ bit-identical IEEE
    * chains), 12-dp expectation terms summed as DECIMAL(38,12), the
    * 1e-12 prob floor, and exact-decimal prune ranking. */
  def vocabUnigramLm(
      seedMulti: Int, keepMulti: Int, emRounds: Int,
      maxPieceLen: Int, maxWordLen: Int): String =
    s"""WITH ${unigramLmCtes(seedMulti, keepMulti, emRounds, maxPieceLen,
        maxWordLen)}
        SELECT piece, length(piece)::INT AS piece_len, p AS prob,
               round(ec::DOUBLE, 6) AS expected_count
        FROM v$emRounds"""

  /** The [[vocabUnigramLm]] WITH-body (word table → seed → EM rounds →
    * final vocab CTE `v<emRounds>`), shared with the encode mirror. */
  private def unigramLmCtes(
      seedMulti: Int, keepMulti: Int, emRounds: Int,
      maxPieceLen: Int, maxWordLen: Int): String = {
    val L = maxPieceLen
    def alphaTerms: String = (1 to L).map { k =>
      s"""CASE WHEN x[1]::INT >= $k
            THEN acc[x[1]::INT - $k + 1]
              * coalesce(map_extract(pm.pm,
                  substr(w.word, x[1]::INT - $k + 1, $k))[1], 0.0)
            ELSE 0.0 END"""
    }.mkString(" + ")
    def brevTerms: String = (1 to L).map { k =>
      s"""CASE WHEN x[1]::INT + $k <= w.n
            THEN coalesce(map_extract(pm.pm,
                   substr(w.word, x[1]::INT + 1, $k))[1], 0.0)
              * acc[w.n - x[1]::INT - $k + 1]
            ELSE 0.0 END"""
    }.mkString(" + ")
    val rounds = (1 to emRounds).map { r =>
      s"""pm$r AS (SELECT o.word,
                map_from_entries(list({'k': o.piece, 'v': v.p})) AS pm
              FROM (SELECT DISTINCT word, piece FROM occ) o
              JOIN v${r - 1} v ON v.piece = o.piece GROUP BY o.word),
        st$r AS MATERIALIZED (
          SELECT w.word, w.cnt, w.n, pm.pm,
                 list_reduce(list_prepend([1.0],
                     list_transform(generate_series(1, w.n),
                       i -> [i::DOUBLE])),
                   (acc, x) -> list_append(acc, $alphaTerms)) AS alpha,
                 list_reduce(list_prepend([1.0],
                     list_transform(generate_series(w.n - 1, 0, -1),
                       i -> [i::DOUBLE])),
                   (acc, x) -> list_append(acc, $brevTerms)) AS brev
          FROM w JOIN pm$r pm ON pm.word = w.word),
        tm$r AS (SELECT o.piece,
                round(st.cnt::DOUBLE * st.alpha[o.s]
                  * coalesce(map_extract(st.pm, o.piece)[1], 0.0)
                  * st.brev[st.n - o.s - o.k + 2]
                  / st.alpha[st.n + 1], 12) AS term
              FROM occ o JOIN st$r st ON st.word = o.word
              WHERE coalesce(map_extract(st.pm, o.piece)[1], 0.0) > 0.0),
        ec$r AS MATERIALIZED (SELECT piece, sum(term::DECIMAL(38,12)) AS ec
                              FROM tm$r GROUP BY 1),
        sc$r AS (SELECT piece, ec,
                greatest(round(ec::DOUBLE
                  / (SELECT sum(ec) FROM ec$r)::DOUBLE, 12), 1e-12) AS p
              FROM ec$r),
        v$r AS MATERIALIZED (
          SELECT piece, p, ec FROM sc$r WHERE length(piece) = 1
          UNION ALL
          SELECT piece, p, ec FROM (
            SELECT piece, p, ec,
                   row_number() OVER (ORDER BY ec DESC, piece ASC) AS rn
            FROM sc$r WHERE length(piece) > 1) WHERE rn <= $keepMulti)"""
    }.mkString(",\n")
    s"""w AS MATERIALIZED (
          SELECT word, count(*)::BIGINT AS cnt, length(word)::INT AS n
          FROM (SELECT unnest($toks) AS word FROM documents)
          WHERE length(word) >= 1 AND length(word) <= $maxWordLen
          GROUP BY 1),
        occ AS MATERIALIZED (
          SELECT word, cnt, n, o.s AS s, o.k AS k,
                 substr(word, o.s, o.k) AS piece
          FROM (SELECT word, cnt, n,
                       unnest(flatten(list_transform(generate_series(1, n),
                         j -> list_transform(
                           generate_series(1, least($L, n - j + 1)),
                           k -> {'s': j, 'k': k})))) AS o
                FROM w)),
        s0 AS (SELECT piece, sum(cnt)::BIGINT AS c0 FROM occ GROUP BY 1),
        sd AS (SELECT piece, c0 FROM s0 WHERE length(piece) = 1
               UNION ALL
               SELECT piece, c0 FROM (
                 SELECT piece, c0,
                        row_number() OVER (ORDER BY c0 DESC, piece ASC) AS rn
                 FROM s0 WHERE length(piece) > 1) WHERE rn <= $seedMulti),
        v0 AS MATERIALIZED (
          SELECT piece,
                 greatest(round(c0::DOUBLE
                   / (SELECT sum(c0)::BIGINT FROM sd)::DOUBLE, 12), 1e-12)
                   AS p,
                 NULL::DECIMAL(38,12) AS ec
          FROM sd),
        $rounds"""
  }

  /** Mirror of TextAnalysis.unigramEncodeCounts over the vocabulary
    * [[vocabUnigramLm]] learns: the same vocab CTE block, then a
    * Viterbi fold per distinct word — (score, count) cells, candidates
    * compared (score desc, count asc, shorter-last-piece first) with
    * exact double equality — joined back to the document word stream. */
  def textUnigramEncode(
      seedMulti: Int, keepMulti: Int, emRounds: Int,
      maxPieceLen: Int, maxWordLen: Int): String = {
    val L = maxPieceLen
    def cand(k: Int): String =
      s"""CASE WHEN x[1].sc::INT >= $k
            THEN {'sc': acc[x[1].sc::INT - $k + 1].sc
                    * coalesce(map_extract(pm.pm,
                        substr(w.word, x[1].sc::INT - $k + 1, $k))[1], 0.0),
                  'ct': acc[x[1].sc::INT - $k + 1].ct + 1}
            ELSE {'sc': -1.0::DOUBLE, 'ct': 0::BIGINT} END"""
    val fold = (2 to L).foldLeft(cand(1)) { (a, k) =>
      val b = cand(k)
      s"""CASE WHEN ($b).sc > ($a).sc
               OR (($b).sc = ($a).sc AND ($b).ct < ($a).ct)
          THEN ($b) ELSE ($a) END"""
    }
    s"""WITH ${unigramLmCtes(seedMulti, keepMulti, emRounds, maxPieceLen,
        maxWordLen)},
        dwords AS MATERIALIZED (
          SELECT doc_id, word FROM (
            SELECT doc_id, unnest($toks) AS word FROM documents)
          WHERE length(word) > 0),
        ewn AS (SELECT DISTINCT word, length(word)::INT AS n FROM dwords),
        eocc AS (SELECT DISTINCT word, substr(word, o.s, o.k) AS piece FROM (
                   SELECT word, n,
                          unnest(flatten(list_transform(generate_series(1, n),
                            j -> list_transform(
                              generate_series(1, least($L, n - j + 1)),
                              k -> {'s': j, 'k': k})))) AS o
                   FROM ewn)),
        epm AS (SELECT e.word,
                       map_from_entries(list({'k': e.piece, 'v': v.p})) AS pm
                FROM eocc e JOIN v$emRounds v ON v.piece = e.piece
                GROUP BY e.word),
        edp AS MATERIALIZED (
          SELECT w.word, w.n,
                 list_reduce(list_prepend([{'sc': 1.0::DOUBLE, 'ct': 0::BIGINT}],
                     list_transform(generate_series(1, w.n),
                       i -> [{'sc': i::DOUBLE, 'ct': 0::BIGINT}])),
                   (acc, x) -> list_append(acc, $fold)) AS dp
          FROM ewn w JOIN epm pm ON pm.word = w.word),
        ecnt AS (SELECT word,
                        CASE WHEN dp[n + 1].sc > 0.0
                             THEN dp[n + 1].ct END AS n_pieces
                 FROM edp)
        SELECT d.doc_id, count(*)::BIGINT AS n_tokens_ws,
               sum(c.n_pieces)::BIGINT AS n_tokens_unigram
        FROM dwords d JOIN ecnt c USING (word)
        GROUP BY 1"""
  }

  /** Mirror of TextAnalysis.lineDedup over the 6-tokens-per-line
    * fixture: same first-occurrence selection (min (doc, idx) as a
    * composite integer — idx < 2^20 by construction), per-doc rebuild
    * via ordered string_agg; a doc whose every line was seen earlier
    * keeps the empty string on both engines. */
  val textLineDedup: String =
    s"""WITH d AS (SELECT doc_id,
              array_to_string(list_transform(
                generate_series(0,
                  (len(string_split(text, ' ')) - 1) // 6),
                i -> array_to_string(
                  string_split(text, ' ')[i*6+1 : i*6+6], ' ')),
                chr(10)) AS text
            FROM documents),
          l AS (SELECT id, u.idx AS idx, u.line AS line,
                       md5(trim(lower(u.line))) AS h FROM (
                  SELECT doc_id AS id,
                         unnest(list_transform(generate_series(1, len(ls)),
                           i -> {'idx': i - 1, 'line': ls[i]})) AS u
                  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                        FROM d))),
          f AS (SELECT h, min(id * 1048576 + idx) AS fk FROM l GROUP BY 1)
        SELECT l.id AS doc_id, count(*)::BIGINT AS n_lines,
               sum(CASE WHEN l.id * 1048576 + l.idx = f.fk
                   THEN 1 ELSE 0 END)::BIGINT AS n_kept,
               coalesce(string_agg(CASE WHEN l.id * 1048576 + l.idx = f.fk
                 THEN l.line END, chr(10) ORDER BY l.idx), '') AS text_clean
        FROM l JOIN f USING (h) GROUP BY 1"""

  /** Mirror of TextAnalysis.boilerplateStrip over the same 6-words-per-
    * line fixture as [[textLineDedup]]: a line whose normalized hash
    * appears in >= minDf distinct docs drops EVERY occurrence. */
  def textBoilerplateStrip(minDf: Long): String =
    s"""WITH d AS (SELECT doc_id,
              array_to_string(list_transform(
                generate_series(0,
                  (len(string_split(text, ' ')) - 1) // 6),
                i -> array_to_string(
                  string_split(text, ' ')[i*6+1 : i*6+6], ' ')),
                chr(10)) AS text
            FROM documents),
          l AS (SELECT id, u.idx AS idx, u.line AS line,
                       md5(trim(lower(u.line))) AS h FROM (
                  SELECT doc_id AS id,
                         unnest(list_transform(generate_series(1, len(ls)),
                           i -> {'idx': i - 1, 'line': ls[i]})) AS u
                  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                        FROM d))),
          f AS (SELECT h, count(DISTINCT id)::BIGINT AS df FROM l GROUP BY 1)
        SELECT l.id AS doc_id, count(*)::BIGINT AS n_lines,
               sum(CASE WHEN f.df < $minDf THEN 1 ELSE 0 END)::BIGINT AS n_kept,
               coalesce(string_agg(CASE WHEN f.df < $minDf
                 THEN l.line END, chr(10) ORDER BY l.idx), '') AS text_clean
        FROM l JOIN f USING (h) GROUP BY 1"""

  /** BPE merge-rule learning (TextAnalysis.bpeMerges): same word table,
    * char symbols, per-round weighted pair argmax (count DESC, pair ASC)
    * and the same greedy left-to-right merge fold — after a merge the
    * new symbol is `l||r`, never `l`, so overlap skipping matches the
    * Spark aggregate() lambda exactly. */
  private def bpeChainCtes(rounds: Int): String = {
    def roundCtes(k: Int): String = s"""
      p$k AS (
        SELECT u.p.l AS l, u.p.r AS r, sum(u.cnt)::BIGINT AS n FROM (
          SELECT cnt, unnest(list_transform(generate_series(1, len(sym)-1),
             i -> {'l': sym[i], 'r': sym[i+1]})) AS p
          FROM s${k - 1} WHERE len(sym) >= 2) u
        GROUP BY 1, 2),
      b$k AS (SELECT l, r, n FROM p$k ORDER BY n DESC, l ASC, r ASC LIMIT 1),
      s$k AS (SELECT s.word, s.cnt,
        list_reduce(list_prepend([]::VARCHAR[], list_transform(s.sym, x -> [x])),
          (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND x[1] = b.r
                      THEN list_append(acc[:-2], b.l || b.r)
                      ELSE list_concat(acc, x) END) AS sym
        FROM s${k - 1} s CROSS JOIN b$k b)"""
    s"""w AS (
        SELECT t0.token AS word, count(*) AS cnt FROM (
          SELECT unnest($toks) AS token FROM documents) t0
        WHERE length(t0.token) > 0 GROUP BY 1),
      s0 AS (SELECT word, cnt, list_transform(generate_series(1, length(word)),
               i -> word[i]) AS sym FROM w),
      ${(1 to rounds).map(roundCtes).mkString(",")}"""
  }

  def vocabBpeMerges(rounds: Int): String = {
    val selects = (1 to rounds).map(k =>
      s"""SELECT $k AS round, l AS "left", r AS "right", l || r AS merged,
             n AS pair_count FROM b$k""").mkString("\n  UNION ALL ")
    s"""WITH ${bpeChainCtes(rounds)}
      $selects"""
  }

  /** BPE corpus encoding (TextAnalysis.bpeEncodeCounts): the same
    * chain's FINAL symbol table joined back to the per-doc word
    * stream. */
  def vocabBpeEncode(rounds: Int): String =
    s"""WITH ${bpeChainCtes(rounds)}
      SELECT d.doc_id, count(*) AS n_tokens_ws,
             sum(len(s$rounds.sym))::BIGINT AS n_tokens_bpe
      FROM (SELECT doc_id, unnest($toks) AS word FROM documents) d
      JOIN s$rounds ON d.word = s$rounds.word
      WHERE length(d.word) > 0
      GROUP BY 1"""

  /** Squared L2 between double lists — the dimension-order fold
    * Similarity.sqDist performs. */
  private def l2Of(a: String, b: String): String =
    s"""list_aggregate(list_transform(list_zip($a, $b),
        z -> (z[1]::DOUBLE - z[2]::DOUBLE) * (z[1]::DOUBLE - z[2]::DOUBLE)), 'sum')"""

  /** PQ ANN top-k (Similarity.pqTopK): per-subspace unrolled Lloyd
    * (Euclidean argmin, 6-dp-rounded pinned centroids — the ivfLloydCtes
    * discipline), corpus codes, and the ADC ranking: sum of exact
    * query-slice↔assigned-centroid distances, rounded 6 dp, id
    * tie-break. */
  /** Per-subspace PQ codebook CTEs over the shared `v` CTE: for each
    * subspace j — the slice table s$j, unrolled Lloyd rounds c$j0..a$ji,
    * and the final code assignment e$j (vid → cell). Shared between
    * [[simPqTopK]] and [[simIvfPqTopK]]; the CTE names never collide
    * with [[ivfLloydCtes]]' c0../a1../af namespace. */
  private def pqSliceCtes(dims: Int, m: Int, ksub: Int, iters: Int,
      src: String = "v"): String = {
    val sub = dims / m
    def sliceCtes(j: Int): String = {
      val lo = j * sub + 1
      val hi = (j + 1) * sub
      def assign(name: String, centsCte: String): String =
        s"""$name AS (
              SELECT vid, v, cell FROM (
                SELECT vv.vid, vv.v, cc.cell,
                       row_number() OVER (PARTITION BY vv.vid
                         ORDER BY round(${l2Of("vv.v", "cc.cv")}, 6) ASC,
                                  cc.cell ASC) AS rn
                FROM s$j vv CROSS JOIN $centsCte cc) WHERE rn = 1)"""
      def update(name: String, assignCte: String): String =
        s"""$name AS (
              SELECT cell, list(mr ORDER BY pos) AS cv FROM (
                SELECT cell, pos, round(avg(x), 6) AS mr FROM (
                  SELECT cell, unnest(v)::DOUBLE AS x,
                         generate_subscripts(v, 1) AS pos
                  FROM $assignCte)
                GROUP BY cell, pos) GROUP BY cell)"""
      val steps = (1 to iters).flatMap { i =>
        Seq(assign(s"a$j$i", s"c$j${i - 1}"), update(s"c$j$i", s"a$j$i"))
      }
      s"""s$j AS (SELECT vid, list_transform(v[$lo:$hi], x -> x::DOUBLE) AS v
                  FROM $src),
          c${j}0 AS (SELECT (row_number() OVER (ORDER BY vid) - 1)::INT AS cell,
                            list_transform(v, x -> round(x, 6)) AS cv
                     FROM s$j QUALIFY row_number() OVER (ORDER BY vid) <= $ksub),
          ${steps.mkString(",\n          ")},
          ${assign(s"e$j", s"c$j$iters")}"""
    }
    (0 until m).map(sliceCtes).mkString(",\n          ")
  }

  /** The M code joins (vid → per-subspace codebook row) shared by the
    * PQ oracles; `x` is the scored corpus alias. */
  private def pqCodeJoins(m: Int, iters: Int): String =
    (0 until m).map { j =>
      s"""JOIN e$j ON e$j.vid = x.vid
          JOIN c$j$iters cc$j ON cc$j.cell = e$j.cell"""
    }.mkString("\n          ")

  /** The ADC distance expression Σ_j l2(q-slice_j, codebook_j) against
    * query alias `q`; left-assoc + matches the Spark reduce order. */
  private def pqAdcExpr(dims: Int, m: Int, qAlias: String,
      qField: String = "qv"): String = {
    val sub = dims / m
    (0 until m).map { j =>
      val lo = j * sub + 1
      val hi = (j + 1) * sub
      l2Of(s"list_transform($qAlias.$qField[$lo:$hi], x -> x::DOUBLE)",
        s"cc$j.cv")
    }.mkString(" + ")
  }

  def simPqTopK(dims: Int, m: Int, ksub: Int, iters: Int,
      k: Int, queryMod: Int): String =
    s"""WITH v AS (SELECT vec_id AS vid, embedding AS v FROM embeddings),
          ${pqSliceCtes(dims, m, ksub, iters)},
          q AS (SELECT vid AS qid, v AS qv FROM v WHERE vid % $queryMod = 0),
          pairs AS (
            SELECT q.qid, x.vid, round(${pqAdcExpr(dims, m, "q")}, 6) AS adist
            FROM q CROSS JOIN v x
            ${pqCodeJoins(m, iters)}
            WHERE x.vid <> q.qid)
        SELECT qid AS query_id, vid AS neighbor_id, adist, rank::INT AS rank
        FROM (
          SELECT qid, vid, adist,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY adist ASC, vid ASC) AS rank
          FROM pairs) WHERE rank <= $k"""

  /** Mirror of Similarity.ivfPqTopK — [[ivfLloydCtes]] (coarse cells)
    * and [[pqSliceCtes]] (fine codes) composed: probe = per-query
    * top-nProbe cells by centroid cosine, ADC only against probed
    * cells' members, shortlist by (adist, id), exact cosine re-rank. */
  def simIvfPqTopK(cells: Int, iters: Int, nProbe: Int, dims: Int,
      m: Int, ksub: Int, maxQueryId: Int, k: Int, shortlist: Int,
      residual: Boolean = false): String = {
    // residual mode: codes are over (v − coarse centroid) and the ADC
    // table is per (query, probed cell) — rv/rqv mirror the Spark
    // side's IEEE-identical float→double subtraction of the 6-dp
    // pinned centroid
    val sliceSrc = if (residual) "rv" else "v"
    val rvCte = if (!residual) ""
      else s""",
          rv AS (
            SELECT af.vid, list_transform(list_zip(af.v, cc.cv),
                     z -> z[1]::DOUBLE - z[2]::DOUBLE) AS v
            FROM af JOIN c$iters cc USING (cell))"""
    val probeVec =
      if (residual)
        s""", list_transform(list_zip(q.qv, cc.cv),
             z -> z[1]::DOUBLE - z[2]::DOUBLE) AS rqv"""
      else ""
    val probeCols = if (residual) "query_id, qv, rqv, cell" else "query_id, qv, cell"
    val qField = if (residual) "rqv" else "qv"
    s"""WITH ${ivfLloydCtes(cells, iters)}$rvCte,
          ${pqSliceCtes(dims, m, ksub, iters, sliceSrc)},
          q AS (SELECT vid AS query_id, v AS qv FROM v
                WHERE vid < $maxQueryId),
          probed AS (
            SELECT $probeCols FROM (
              SELECT q.query_id, q.qv, cc.cell$probeVec,
                     row_number() OVER (PARTITION BY q.query_id
                       ORDER BY ${cosineOf("q.qv", "cc.cv")} DESC,
                                cc.cell ASC) AS crn
              FROM q CROSS JOIN c$iters cc) WHERE crn <= $nProbe),
          adc AS (
            SELECT p.query_id, x.vid AS neighbor_id,
                   round(${pqAdcExpr(dims, m, "p", qField)}, 6) AS adist
            FROM probed p JOIN af x ON x.cell = p.cell
            ${pqCodeJoins(m, iters)}
            WHERE x.vid <> p.query_id),
          short AS (
            SELECT query_id, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY adist ASC, neighbor_id ASC) AS srank
              FROM adc) WHERE srank <= $shortlist),
          rer AS (
            SELECT s.query_id, s.neighbor_id,
                   ${cosineOf("q.qv", "x.v")} AS sim
            FROM short s JOIN v x ON x.vid = s.neighbor_id
            JOIN q ON q.query_id = s.query_id)
        SELECT query_id, neighbor_id, sim, rank::INT AS rank FROM (
          SELECT query_id, neighbor_id, sim,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id ASC) AS rank
          FROM rer) WHERE rank <= $k"""
  }

  /** Mirror of the sim_ivfpq_recall composition: [[simCosineTopK]] and
    * [[simIvfPqTopK]] nested as subqueries (own WITH scopes),
    * intersected on the pair key — the [[simRecallAtK]] shape. */
  def simIvfPqRecall(cells: Int, iters: Int, nProbe: Int, dims: Int,
      m: Int, ksub: Int, maxQueryId: Int, k: Int, shortlist: Int): String =
    s"""WITH ex AS (SELECT query_id, neighbor_id
                    FROM (${simCosineTopK(maxQueryId, k)}) x),
          ap AS (SELECT query_id, neighbor_id
                 FROM (${simIvfPqTopK(cells, iters, nProbe, dims, m, ksub,
      maxQueryId, k, shortlist)}) y),
          h AS (SELECT ap.query_id, count(*)::BIGINT AS hits
                FROM ap JOIN ex ON ap.query_id = ex.query_id
                              AND ap.neighbor_id = ex.neighbor_id
                GROUP BY 1)
        SELECT qq.query_id, coalesce(h.hits, 0)::BIGINT AS hits,
               round(coalesce(h.hits, 0)::DOUBLE / ${k.toDouble}::DOUBLE, 6)
                 AS recall
        FROM (SELECT DISTINCT query_id FROM ex) qq
        LEFT JOIN h ON h.query_id = qq.query_id"""
}
