package graft.operators

import graft.functions.OptimizerFence.fence
import graft.functions.TextFunctions._
import graft.ops.{Par, Scratch}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large-scale text corpora. All variants are
 * expressed as declarative plans over built-in functions:
 *
 *  - exact: hash-groupBy on a normalized-text fingerprint — one shuffle on
 *    the fingerprint; map-side partial agg keeps the shuffle tiny.
 *  - MinHash + LSH: shingle → H minhashes → B bands → self-join on band
 *    key. The join key is (band_index, band_hash): high-cardinality, so
 *    the shuffle partitions evenly; candidate pairs come from within-bucket
 *    pairs only — never the O(n²) cross product.
 *  - SimHash: per-token 64-bit hashes folded into a weighted bit vector;
 *    near-dup buckets via the simhash prefix.
 *  - n-gram Jaccard: exact similarity, but only within candidate blocks
 *    (never all-pairs), with a map-side size-ratio bound in the join
 *    condition so the intersect only runs on pairs that could pass.
 *
 * Scale note: at 100 TB the only all-to-all movement is the band-key /
 * fingerprint shuffles, all key-partitioned and AQE-coalescible. Skewed
 * fingerprints (empty docs, boilerplate) are the classic hazard — the
 * group-by keys here include the full hash, so skew only appears for true
 * mass duplicates, which is exactly the signal we want.
 *
 * Algorithms (public literature): MinHash — Broder, "On the resemblance
 * and containment of documents" (1997); LSH banding — Leskovec/Rajaraman/
 * Ullman, "Mining of Massive Datasets" ch.3; SimHash — Charikar,
 * "Similarity estimation techniques from rounding algorithms" (2002);
 * rolling-hash fingerprinting — Schleimer/Wilkerson/Aiken, "Winnowing:
 * local algorithms for document fingerprinting" (2003).
 */
object Dedup {

  /** Exact dedup: one representative (min id) per normalized-text
    * fingerprint, with the duplicate count. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Par.fanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), md5Fingerprint(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** CONTENT-DEFINED CHUNKING dedup report (the Rabin-boundary storage
    * dedup classic — LBFS/Venti lineage — at token granularity): a
    * chunk boundary falls between tokens i and i+1 wherever the 60-bit
    * md5 hash of that (tokenᵢ, tokenᵢ₊₁) bigram ≡ 0 (mod `divisor`) —
    * boundaries move WITH the content, so an insertion reflows only
    * its own chunk where fixed windows would shift every downstream
    * chunk (the whole point of CDC). Per-document chunking is entirely
    * MAP-SIDE: the boundary list and the chunk slices are higher-order
    * array ops with the token array bound once; the only shuffles are
    * the corpus-wide chunk-hash frequency aggregate and the hash-keyed
    * join back (chunk text never rides the join — md5 keys only).
    * Per doc: chunk count, chunks whose hash repeats anywhere in the
    * corpus, and the duplicated-token fraction — the ExactSubstr-style
    * signal at storage granularity, at expected chunk length
    * ≈ `divisor` tokens. */
  def cdcChunks(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      divisor: Int = 64): DataFrame = {
    require(divisor >= 2, "divisor must be >= 2")
    val chunksCol = transform(array(tokens(col(textCol))), t => {
      val n = size(t)
      val bpos = filter(sequence(lit(1), greatest(n - 1, lit(1))), i =>
        (i < n) && (conv(substring(md5(concat_ws(" ",
          element_at(t, i), element_at(t, i + 1))), 1, 15), 16, 10)
          .cast("long") % divisor === 0))
      val bounds = concat(array(lit(0)), bpos, array(n))
      transform(sequence(lit(1), size(bounds) - 1), j =>
        struct(
          md5(concat_ws(" ", slice(t, element_at(bounds, j) + 1,
            element_at(bounds, j + 1) - element_at(bounds, j)))).as("chash"),
          (element_at(bounds, j + 1) - element_at(bounds, j)).as("clen")))
    }).getItem(0)
    // fence + two-step projection: the fenced chunk array is computed
    // ONCE in its own Project (Generate's implicit non-empty pre-filter
    // would otherwise inline and double-evaluate the chunking
    // pipeline), and the explode consumes the plain column
    val ch = Par.fanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), fence(chunksCol).as("chunks"))
      .select(col(idCol), explode(col("chunks")).as("c"))
      .select(col(idCol), col("c.chash").as("chash"),
        col("c.clen").cast("long").as("clen"))
    val freq = ch.groupBy(col("chash")).agg(count(lit(1)).as("occ"))
    ch.join(freq, "chash")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("occ") > 1, 1L).otherwise(0L)).as("dup_chunks"),
        sum(col("clen")).as("n_tokens"),
        sum(when(col("occ") > 1, col("clen")).otherwise(0L)).as("dup_tokens"))
      .select(col(idCol), col("n_chunks"), col("dup_chunks"),
        col("n_tokens"), col("dup_tokens"),
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6)
          .as("dup_token_frac"))
  }

  /** Incremental (cross-batch) exact dedup — the continuous-ingest
    * shape: an arriving batch is deduplicated against the compact
    * fingerprint HISTORY table maintained across ingests (never against
    * the full prior corpus), then collapsed to one representative per
    * fingerprint within the batch. One left-anti equi-join on the
    * fingerprint + one keyed agg, both shuffling on the same key; at
    * 100 TB the history table is bucketed by `fp` so the anti-join
    * co-locates with zero history shuffle, and the output's
    * `(fp, keep_id)` rows are exactly the history DELTA to append —
    * the operator is its own state maintainer. */
  def incrementalExact(
      batch: DataFrame,
      historyFps: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      fpCol: String = "fp"): DataFrame = {
    val b = Par.fanOut(batch.select(col(idCol), col(textCol)))
      .select(col(idCol), md5Fingerprint(col(textCol)).as("fp"))
    b.join(historyFps.select(col(fpCol).as("fp")), Seq("fp"), "left_anti")
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_batch"))
  }

  /** [[incrementalExact]] with a Bloom-filter fast path — the
    * continuous-ingest shape at 100 TB, where the history table is
    * giant and the arriving batch is mostly NEW: the history
    * fingerprint set aggregates into a driver-side Bloom sketch
    * (observed-count sized, ENFORCED under `maxSketchFps` — the
    * [[graft.operators.Corpus.decontaminateBloom]] contract), and each
    * batch row tests the sketch map-side. `mightContain = false` means
    * DEFINITELY absent from history (a Bloom filter has no false
    * negatives) — those rows take the fast path straight to the batch
    * collapse without ever shuffling against history; only the
    * `mightContain = true` sliver (true dups + an `fpp` fraction of
    * false positives) pays the exact anti-join. Output is bit-identical
    * to [[incrementalExact]] — the oracle re-derives the plain exact
    * path. The batch scan feeds both branches (a landed ingest batch is
    * re-read columnar, not recomputed — at warehouse scale it is a
    * staged file either way). */
  def incrementalExactBloom(
      batch: DataFrame,
      historyFps: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      fpCol: String = "fp",
      fpp: Double = 0.01,
      maxSketchFps: Long = 50000000L): DataFrame = {
    require(fpp > 0.0 && fpp < 1.0, "fpp must be in (0,1)")
    val b = Par.fanOut(batch.select(col(idCol), col(textCol)))
      .select(col(idCol), md5Fingerprint(col(textCol)).as("fp"))
    val (h, hm, _) = graft.ops.Scratch.materializeObservedAt(
      historyFps.select(col(fpCol).as("fp")).distinct(),
      "incb_hist", count(lit(1)).as("n_fps"))
    val nFps = hm("n_fps").asInstanceOf[Long]
    require(nFps <= maxSketchFps,
      s"incrementalExactBloom: observed $nFps history fingerprints " +
        s"exceeds maxSketchFps=$maxSketchFps — the driver sketch would " +
        s"cost ~${nFps * 10 / 8 / (1 << 20)} MiB and ride every task " +
        "binary. Raise the bound, raise fpp, or use incrementalExact " +
        "(bucket the history by fp and the anti-join co-locates).")
    if (nFps == 0L) // empty history: everything is new
      return b.groupBy(col("fp"))
        .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_batch"))
    val bloomLit: Column = {
      val bf = h.select(xxhash64(col("fp")).as("fph"))
        .stat.bloomFilter("fph", math.max(nFps, 1L), fpp)
      val os = new java.io.ByteArrayOutputStream()
      bf.writeTo(os)
      lit(os.toByteArray)
    }
    def mightContain(v: Column): Column =
      org.apache.spark.sql.GraftExpr.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.GraftExpr.expression(bloomLit),
          org.apache.spark.sql.GraftExpr.expression(v)))
    val tested = b.withColumn("mc", mightContain(xxhash64(col("fp"))))
    val sureNew = tested.filter(!col("mc")).select(col(idCol), col("fp"))
    val maybe = tested.filter(col("mc")).select(col(idCol), col("fp"))
      .join(h, Seq("fp"), "left_anti")
    sureNew.unionByName(maybe)
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_batch"))
  }

  /** Persist the exact-dedup fingerprint HISTORY as a BUCKETED on-disk
    * index — the state half of [[incrementalExact]]'s continuous-ingest
    * contract, and the dedup analogue of
    * [[graft.operators.Similarity.writeIvfPqIndex]]'s lifecycle: at
    * 100 TB the history is the accumulated fingerprint set of every
    * prior ingest, and re-shuffling it for every arriving batch's
    * anti-join is the scale killer. `bucketBy(buckets, fp)` +
    * `sortBy(fp)` writes hash-clustered files whose SCAN reports
    * `HashPartitioning(fp, buckets)` to Catalyst, so the per-batch
    * anti-join plans its Exchange on the (small) BATCH side only — the
    * history buckets are read in place, zero history movement
    * (plan-asserted in DedupIndexSpec; the loaded round-trip is
    * value-identical to the in-memory path under the
    * `dedup_index_persisted` gate, same oracle as `dedup_incremental`).
    * Maintenance is append-shaped by construction:
    * [[incrementalExact]]'s output (fp, keep_id, n_batch) IS the
    * history delta, and a bucketed table appends new files per bucket
    * without touching existing ones. `path` makes the catalog entry
    * EXTERNAL (the index directory is the durable artifact; the
    * catalog entry is per-session bookkeeping). */
  def writeFpIndex(
      historyFps: DataFrame,
      table: String,
      buckets: Int = 32,
      path: Option[String] = None,
      fpCol: String = "fp"): Unit = {
    require(buckets >= 1 && buckets <= 100000,
      s"writeFpIndex: buckets=$buckets outside [1, 100000] - size buckets" +
        " so one bucket's fingerprints fit an executor (history_rows/buckets)")
    val w = historyFps.select(col(fpCol).as("fp"))
      .write.mode("overwrite")
      .bucketBy(buckets, "fp").sortBy("fp")
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** COMPACT a [[writeFpIndex]] index in place: collapse the appended
    * delta files (and any at-least-once replay residue — duplicate
    * fingerprints are harmless to the anti-join but not free to scan)
    * into one fresh bucketed write at `path`, re-pointing the catalog
    * entry. The maintenance half the append-shaped contract defers: a
    * continuous-ingest index accretes one file per bucket per batch,
    * and at 100 TB the scan-side file count — not the data — becomes
    * the cost, so periodic compaction is part of the lifecycle, not an
    * afterthought. The rewrite is `distinct` (history is a SET of
    * fingerprints) and keeps the exact bucket spec, so every
    * Exchange-free-history plan property survives verbatim
    * (plan-asserted post-compaction in DedupIndexSpec). The snapshot
    * is scratch-materialized first — the rewrite reads the very table
    * it replaces; the superseded index directory is retired by the
    * scratch lifecycle. */
  def compactFpIndex(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      buckets: Int = 32,
      path: Option[String] = None): Unit = {
    val snapshot = Scratch.materialize(
      spark.table(table).select(col("fp")).distinct(), "fp_compact")
    writeFpIndex(snapshot, table, buckets, path)
  }

  /** Catalog scan of a [[writeFpIndex]] table. Must go through
    * `spark.table` (NOT `read.parquet` on the directory): only the
    * catalog carries the bucket spec that lets [[incrementalExact]]'s
    * anti-join co-locate on the history side. */
  def loadFpIndex(
      spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame =
    spark.table(table)

  /** Flat `(id, band, h)` MinHash band-key rows for a corpus — the
    * NEAR-dup analogue of the exact-fp history row: two docs are LSH
    * candidates iff they share a `(band, h)` key. One corpus scan
    * (native one-pass signatures, no shingle materialization); this is
    * the frame [[writeLshBandIndex]] persists and the delta an ingest
    * batch appends after [[incrementalLshJaccard]]. */
  def lshBandKeys(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 5,
      bands: Int = 4,
      rowsPerBand: Int = 4): DataFrame =
    bandedKeys(
      minhashSignatures(docs, idCol, textCol, shingleK, bands * rowsPerBand),
      bands, rowsPerBand)
      .select(col("id"), col("bk.band").as("band"), col("bk.h").as("h"))

  /** Persist the MinHash BAND-KEY history as a BUCKETED on-disk index —
    * [[writeFpIndex]]'s contract extended to NEAR-dup state (the one
    * index asymmetry left after round 12: exact-fp history persisted,
    * band tables rebuilt per run). `bucketBy(buckets, band, h)` +
    * `sortBy(band, h)` hash-clusters the keys so a per-batch candidate
    * join equi-joins on `(band, h)` with the Exchange planned on the
    * (small) BATCH side only — the accumulated history buckets are
    * read in place, zero history movement per ingest
    * (plan-asserted in DedupLshIndexSpec). Maintenance is append-shaped:
    * the arriving batch's own [[lshBandKeys]] rows ARE the delta;
    * append them with the SAME bucket spec
    * (`write.mode("append").bucketBy(buckets, "band", "h")
    * .sortBy("band", "h").saveAsTable(table)`) and the next batch
    * dedups against history ∪ delta. `path` makes the catalog entry
    * EXTERNAL (the directory is the durable artifact). */
  def writeLshBandIndex(
      keys: DataFrame,
      table: String,
      buckets: Int = 32,
      path: Option[String] = None): Unit = {
    require(buckets >= 1 && buckets <= 100000,
      s"writeLshBandIndex: buckets=$buckets outside [1, 100000] - size " +
        "buckets so one bucket's band keys fit an executor")
    val w = keys.select(col("id"), col("band"), col("h"))
      .write.mode("overwrite")
      .bucketBy(buckets, "band", "h").sortBy("band", "h")
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** [[compactFpIndex]] for the band-key index: distinct on the full
    * (id, band, h) row (a replayed batch re-appends identical key rows;
    * two DIFFERENT docs sharing a band key are distinct rows and both
    * survive), same bucket spec, catalog re-pointed at the fresh
    * write. */
  def compactLshBandIndex(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      buckets: Int = 32,
      path: Option[String] = None): Unit = {
    val snapshot = Scratch.materialize(
      spark.table(table).select(col("id"), col("band"), col("h"))
        .distinct(), "lsh_band_compact")
    writeLshBandIndex(snapshot, table, buckets, path)
  }

  /** Catalog scan of a [[writeLshBandIndex]] table ([[loadFpIndex]]
    * rationale: only `spark.table` carries the bucket spec). */
  def loadLshBandIndex(
      spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame =
    spark.table(table)

  /** Incremental (cross-batch) NEAR-dup — [[incrementalExact]]'s
    * continuous-ingest shape for MinHash-LSH: an arriving batch's band
    * keys probe the persisted band-key history ([[writeLshBandIndex]])
    * for cross-batch candidates AND self-join for within-batch
    * candidates, then exact shingle Jaccard verifies — computed ONLY
    * for candidate ids (a semi-join prunes `corpusText` before any
    * shingle array exists, so the verify cost scales with the
    * candidate set, never the accumulated corpus). Output
    * `(a = batch id, b = matched history id | smaller batch id,
    * jaccard)`; the batch's own key rows are the history delta to
    * append. The batch side is bucket-guarded (both the probe and the
    * self-join fan out quadratically per hot bucket); the history side
    * inherits the same bound from ITS ingest-time guards — exact dedup
    * first remains the pipeline contract. */
  def incrementalLshJaccard(
      batch: DataFrame,
      bandIndex: DataFrame,
      corpusText: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 5,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.0,
      maxBucketRows: Long = DefaultMaxBucketRows): DataFrame = {
    // the batch's key table is micro-batch-sized by the ingest contract:
    // driver-pinned under the Pin row/byte gate (probe + self-join then
    // broadcast it — zero exchange on either side), scratch past it
    val bk = graft.ops.Pin.state(
      lshBandKeys(batch, idCol, textCol, shingleK, bands, rowsPerBand),
      "lshidx_batch_keys")
    incrementalLshJaccardFromKeys(bk, bandIndex, corpusText, idCol, textCol,
      shingleK, minJaccard, maxBucketRows)
  }

  /** The CANDIDATE half of [[incrementalLshJaccard]] as one lazy plan —
    * cross-batch probe (equi-join on the index's bucket columns
    * (band, h), Exchange planned on the batch side only — the plan
    * shape DedupLshIndexSpec asserts) unioned with the guarded
    * within-batch self-join. [[incrementalLshJaccardFromKeys]]
    * materializes exactly this plan once per batch. */
  private[graft] def incrementalLshCandidates(
      bk: DataFrame,
      bandIndex: DataFrame,
      maxBucketRows: Long = DefaultMaxBucketRows): DataFrame = {
    val guarded = Blocks.guardBlockSize(
      bk.select(col("id"), struct(col("band"), col("h")).as("bk")),
      "bk", maxBucketRows, "incrementalLshJaccard",
      hint = "a mass-duplicate band bucket yields quadratic candidate "
        + "pairs - run exact dedup first or raise maxBucketRows deliberately",
      boundName = "maxBucketRows")
    val cross = guarded
      .select(col("id").as("a"), col("bk.band").as("band"), col("bk.h").as("h"))
      .join(bandIndex.select(col("id").as("b"), col("band"), col("h")),
        Seq("band", "h"))
      .select(col("a"), col("b")).distinct()
    val within = candidatePairs(
      bk.select(col("id"), struct(col("band"), col("h")).as("bk")),
      "incrementalLshJaccard", maxBucketRows)
    cross.unionByName(within)
  }

  /** [[incrementalLshJaccard]] against PRE-COMPUTED (already
    * materialized) batch band keys `(id, band, h)` — the streaming loop
    * computes the batch's keys exactly once and feeds them both here
    * (probe + self-join) and to the history append, instead of
    * re-scanning and re-hashing the batch text for the append
    * (one full MinHash signature pass saved per micro-batch). */
  private[graft] def incrementalLshJaccardFromKeys(
      bk: DataFrame,
      bandIndex: DataFrame,
      corpusText: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 5,
      minJaccard: Double = 0.0,
      maxBucketRows: Long = DefaultMaxBucketRows): DataFrame = {
    // the candidate table is a STAGE ARTIFACT: left lazy it would
    // evaluate its probe + self-join subtree three times (twice under
    // the ids union, once more in the verify join) — computed once and
    // driver-pinned (candidate-bounded 2-column pairs; scratch past the
    // Pin gate) so every consumer re-reads it
    val pairs = graft.ops.Pin.state(
      incrementalLshCandidates(bk, bandIndex, maxBucketRows), "lshidx_cands")
    val ids = pairs.select(col("a").as("id"))
      .unionByName(pairs.select(col("b").as("id"))).distinct()
    val gsets = Scratch.materialize(
      Par.fanOut(corpusText.select(col(idCol).as("id"), col(textCol).as("t")))
        .join(ids, Seq("id"), "left_semi")
        .select(col("id"), shingles(col("t"), shingleK).as("gs"))
        .withColumn("sz", size(col("gs"))),
      "lshidx_gsets")
    val withA = pairs.join(gsets.select(col("id").as("a"),
      col("gs").as("gs_a"), col("sz").as("sz_a")), Seq("a"))
    val withB = withA.join(gsets.select(col("id").as("b"),
      col("gs").as("gs_b"), col("sz").as("sz_b")), Seq("b"))
    exactJaccard(withB, minJaccard)
  }

  /** Per-source duplicate-rate report card: document count, distinct
    * fingerprints, and the duplicate fraction — the corpus-health
    * metric an ingest pipeline tracks per crawl/source. One pass, one
    * keyed agg (count_distinct plans its standard two-phase aggregate);
    * the fraction divides exact longs in a fixed order, then rounds. */
  def dupRateReport(
      docs: DataFrame,
      sourceCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    Par.fanOut(docs.select(col(sourceCol), col(textCol)))
      .select(col(sourceCol), md5Fingerprint(col(textCol)).as("fp"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("fp")).as("n_unique"))
      .withColumn("dup_frac",
        round(lit(1.0d) - col("n_unique").cast("double")
          / col("n_docs").cast("double"), 6))

  /** MinHash signatures via the native one-pass expression
    * (graft.functions.MinHashSignature): all H permutation-minhashes per
    * row in a single map-side loop — no shingle array materialization, no
    * exploded-gram shuffle. At 100 TB the signature stage is pure
    * scan-speed map work. */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int,
      numHashes: Int): DataFrame =
    Par.fanOut(docs.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"),
        graft.functions.MinHashSignature
          .minhashSignature(col(textCol), shingleK, numHashes).as("sig"))

  /** Per-band LSH keys for a minhash signature column: B structs of
    * (band index, md5 over that band's R minhash values). */
  private def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column = {
    val bandCols = Seq.tabulate(bands) { b =>
      val slice = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => element_at(sig, i + 1).cast("string"))
      struct(lit(b).as("band"), md5(concat_ws("|", slice: _*)).as("h"))
    }
    array(bandCols: _*)
  }

  /** (id, bk) band-key rows from a signature frame (columns `id`, `sig`). */
  private def bandedKeys(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sig.select(col("id"), explode(bandKeys(col("sig"), bands, rowsPerBand)).as("bk"))

  /** Candidate pairs from a band-key frame: within-bucket (a < b)
    * self-join on the band key, streamed (pairs are never materialized
    * as arrays — a mass-duplicate bucket yields quadratic OUTPUT in any
    * formulation, but here it flows row-by-row instead of building one
    * giant in-memory pair list per bucket).
    *
    * The bucket-size contract is ENFORCED (the guardBlockSize pattern):
    * a band bucket past `maxBucketRows` means ~|bucket|² candidate
    * pairs — on a boilerplate-heavy corpus at 100 TB that is an
    * accidental near-cross-product. Such buckets are almost always
    * verbatim mass duplicates, and the escape route is the standard
    * pipeline order: EXACT dedup first (one representative per
    * fingerprint), near-dup LSH on the survivors — or raise the bound
    * deliberately when quadratic output is truly wanted. */
  private def candidatePairs(
      banded: DataFrame,
      op: String,
      maxBucketRows: Long): DataFrame = {
    val guarded = Blocks.guardBlockSize(banded, "bk", maxBucketRows, op,
      hint = "a mass-duplicate band bucket yields quadratic candidate "
        + "pairs - run exact dedup first or raise maxBucketRows deliberately",
      boundName = "maxBucketRows")
    val l = guarded.select(col("id").as("a"), col("bk").as("bka"))
    val r = guarded.select(col("id").as("b"), col("bk").as("bkb"))
    l.join(r, col("bka") === col("bkb") && col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** MinHash+LSH candidate pairs: B bands of R rows each; a pair is a
    * candidate if ANY band agrees on all R minhashes. Output: distinct
    * (a, b) with a < b. Cost: ONE corpus scan — the n×B band-key frame is
    * written once as a scratch table (Scratch.materialize) so the
    * self-join reads keys, never re-hashes text; one band-key shuffle —
    * never the O(n²) cross product. No `persist`: the scratch table
    * needs no unpersist hand-off (the round-2 cache-leak fix). */
  def minhashLshCandidates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 5,
      bands: Int = 4,
      rowsPerBand: Int = 2,
      maxBucketRows: Long = DefaultMaxBucketRows): DataFrame = {
    val banded = Scratch.materialize(
      bandedKeys(
        minhashSignatures(docs, idCol, textCol, shingleK, bands * rowsPerBand),
        bands, rowsPerBand),
      "lsh_bandkeys")
    candidatePairs(banded, "minhashLshCandidates", maxBucketRows)
  }

  /** Default enforced band-bucket bound: 10^5 rows in one bucket is
    * ~5·10^9 candidate pairs from that bucket alone — past any plausible
    * near-dup bucket and squarely in run-exact-dedup-first territory. */
  val DefaultMaxBucketRows: Long = 100000L

  /** Choose `(bands, rowsPerBand)` under a signature budget: the pair
    * with `b·r ≤ numHashes` whose LSH S-curve threshold `(1/b)^(1/r)`
    * lands closest to `targetJaccard` — the tuning every MinHash-LSH
    * deployment otherwise does by hand (MMDS §3.4.3). Ties prefer the
    * pair using MORE of the budget (more hashes ⇒ steeper S-curve ⇒
    * fewer false positives AND negatives at the same threshold).
    * Driver-side arithmetic; feed the result to
    * [[minhashLshCandidates]] / [[lshJaccard]]. */
  def planLshBands(numHashes: Int, targetJaccard: Double): (Int, Int) = {
    require(numHashes >= 1, "numHashes must be positive")
    require(targetJaccard > 0 && targetJaccard < 1,
      "targetJaccard must be in (0, 1)")
    val candidates = for {
      r <- 1 to numHashes
      b <- 1 to numHashes / r
    } yield ((b, r), math.abs(math.pow(1.0 / b, 1.0 / r) - targetJaccard), -b * r)
    candidates.minBy { case (_, err, negUsed) => (err, negUsed) }._1
  }

  /** 32-bit SimHash: per whitespace token take a token hash, then for
    * each bit sum +1/-1 across tokens; the sign vector is the
    * fingerprint. Native one-pass expression (graft.functions.SimHash64)
    * — the composed alternative unrolls into `bits` interpreted
    * array-aggregate lambdas that re-tokenize per bit (~10× slower).
    * `md5Family = true` swaps xxhash64 for the md5-derived token hash
    * (cross-engine reproducible; same family as the MinHash oracle). */
  def simhash(text: Column, bits: Int = 32, md5Family: Boolean = false): Column =
    graft.functions.SimHash64.simhash64(text, bits, md5Family)

  /** Per-doc simhash fingerprints plus a bucket key (top `prefixBits`) for
    * near-dup candidate grouping. */
  def simhashBuckets(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      bits: Int = 32,
      prefixBits: Int = 8,
      md5Family: Boolean = false): DataFrame =
    Par.fanOut(docs.select(col(idCol), col(textCol))).select(
      col(idCol),
      simhash(col(textCol), bits, md5Family).as("simhash"),
      shiftrightunsigned(simhash(col(textCol), bits, md5Family), bits - prefixBits).as("bucket"))

  /** ALL pairs within Hamming distance `maxHamming` of each other's
    * simhash — the guaranteed completion of [[simhashBuckets]] (a single
    * prefix bucket misses any pair differing inside the prefix).
    * Multi-index construction (Manku, Jain, Sarma — "Detecting
    * Near-Duplicates for Web Crawling", WWW'07): split the `bits`-bit
    * fingerprint into `maxHamming + 1` bands; by pigeonhole, a pair
    * within distance d agrees EXACTLY on at least one band, so the
    * candidate set is the union of per-band equi-joins — keyed shuffles
    * whose cardinality grows with the corpus, never O(n²) — and the
    * residual `bit_count(xor) <= d` filter makes the guarantee exact.
    * Fingerprints are computed once into a scratch table; each band
    * re-reads the 2-column table, not the text. */
  def simhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      bits: Int = 32,
      maxHamming: Int = 3,
      md5Family: Boolean = false): DataFrame = {
    hammingPairs(
      Par.fanOut(docs.select(col(idCol).as("id"), col(textCol).as("t")))
        .select(col("id"), simhash(col("t"), bits, md5Family).as("fp")),
      bits, maxHamming)
  }

  /** Manku multi-index Hamming pairing over PRECOMPUTED fingerprints
    * `(id, fp)` — the banding core of [[simhashPairs]], reusable for any
    * bit fingerprint (text simhash, media perceptual hash): d+1 band
    * equi-joins (pigeonhole-exact candidates) + the `bit_count(xor) ≤ d`
    * residual filter. Fingerprints are scratch-materialized once; each
    * band re-reads the 2-column table. */
  def hammingPairs(
      fingerprints: DataFrame,
      bits: Int = 32,
      maxHamming: Int = 3): DataFrame = {
    require(bits > 0 && bits <= 64, "bits must be in 1..64")
    require(maxHamming >= 0 && maxHamming < bits, "maxHamming must be in 0..bits-1")
    val bands = maxHamming + 1
    val fp = graft.ops.Scratch.materialize(fingerprints, "simhash_fp")
    val w = bits / bands
    val cands = (0 until bands).map { k =>
      val lo = k * w
      val width = if (k == bands - 1) bits - lo else w
      val mask = if (width >= 64) -1L else (1L << width) - 1
      def key(c: Column) = shiftrightunsigned(c, lo).bitwiseAND(lit(mask))
      fp.select(col("id").as("a"), col("fp").as("fa"), key(col("fp")).as("bk"))
        .join(fp.select(col("id").as("b"), col("fp").as("fb"), key(col("fp")).as("bk")),
          Seq("bk"))
        .filter(col("a") < col("b"))
        .select("a", "b", "fa", "fb")
    }.reduce(_ unionByName _)
    val dist = bit_count(col("fa").bitwiseXOR(col("fb")))
    cands.filter(dist <= maxHamming)
      .select(col("a"), col("b"), dist.cast("int").as("hamming"))
      .distinct()
  }

  /** The scalable near-dup pipeline: MinHash+LSH candidate generation
    * followed by EXACT n-gram Jaccard verification on candidates only.
    * Pair count is bounded by LSH bucket collisions (linear-ish), never
    * O(n²); the per-pair verification uses set intersection on the docs'
    * distinct shingle arrays (two hash-joins keyed by doc id). This is
    * the form that survives 100 TB — `ngramJaccard` (blocked exact) is
    * the small-block alternative. */
  def lshJaccard(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 5,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.0,
      maxBucketRows: Long = DefaultMaxBucketRows): DataFrame = {
    // Signatures AND shingle sets in ONE pass over the corpus, written
    // once as a scratch signature table so candidate generation, the
    // size prefilter and both verification joins re-read the computed
    // columns instead of re-scanning + re-hashing the corpus — the
    // source parquet is touched exactly once, and (unlike the round-2
    // `persist`) nothing stays pinned in executor storage memory after
    // the query: this IS the "signature table between two jobs" form
    // that the warehouse-scale pipeline would use.
    val base = Scratch.materialize(
      Par.fanOut(docs.select(col(idCol).as("id"), col(textCol).as("t")))
        .select(
          col("id"),
          graft.functions.MinHashSignature
            .minhashSignature(col("t"), shingleK, bands * rowsPerBand).as("sig"),
          shingles(col("t"), shingleK).as("gs"))
        .withColumn("sz", size(col("gs"))),
      "lsh_signatures")
    val candidates = candidatePairs(
      bandedKeys(base.select(col("id"), col("sig")), bands, rowsPerBand),
      "lshJaccard", maxBucketRows)
    // Exact size-ratio prefilter: jaccard = |A∩B|/|A∪B| ≤ min/max of the
    // set sizes, so pairs that cannot reach the threshold are pruned
    // BEFORE shipping the (heavy) shingle arrays through the join.
    // Multiplication form (no division → no 0/0 NaN; sz > 0 excludes
    // degenerate null-shingle docs explicitly), with 1e-6 slack because
    // the final filter compares round(jaccard, 6). No broadcast hint:
    // sizes is O(corpus) rows, so the join strategy is AQE's call.
    val sized = candidates
      .join(base.select(col("id").as("a"), col("sz").as("sz_a")), Seq("a"))
      .join(base.select(col("id").as("b"), col("sz").as("sz_b")), Seq("b"))
      .filter(col("sz_a") > 0 && col("sz_b") > 0 &&
        least(col("sz_a"), col("sz_b")).cast("double") >=
          lit(minJaccard - 1e-6) * greatest(col("sz_a"), col("sz_b")).cast("double"))
      .select(col("a"), col("b"))
    val withA = sized.join(base.select(col("id").as("a"), col("gs").as("gs_a"),
      col("sz").as("sz_a")), Seq("a"))
    val withB = withA.join(base.select(col("id").as("b"), col("gs").as("gs_b"),
      col("sz").as("sz_b")), Seq("b"))
    exactJaccard(withB, minJaccard)
  }

  /** Shared verification tail: ONE fenced set-intersection per pair, the
    * exact (rounded) jaccard derived from it, the threshold applied above
    * the fence. The fence (OptimizerFence) stops Catalyst inlining the
    * jaccard filter back into the join condition, where it would
    * re-evaluate the intersect per reference ahead of the cheap pruning
    * conjuncts — the measured round-2 regression. */
  /** MinHash Jaccard ESTIMATION over the LSH candidate pairs: the
    * signature-agreement fraction est = |{i : sigA[i] = sigB[i]}| / k,
    * whose expectation IS the Jaccard similarity (Broder 1997) — the
    * statistic a 100 TB pass ranks candidates by INSTEAD of shipping
    * shingle arrays through a verify join (k ints per doc ride the
    * pair join; the exact verify then runs only on the estimate's
    * survivors). Emits the estimate NEXT TO the exact Jaccard so the
    * estimator itself is value-gated: every component is the same
    * deterministic md5 hash family, so the DuckDB oracle re-derives
    * est and exact bit-for-bit — no tolerance contract needed. Scale
    * shape = [[lshJaccard]]: one scan into the scratch signature
    * table, banded candidates under the enforced bucket guard, ids +
    * signatures only through the join. */
  def minhashEstimatePairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 5,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      maxBucketRows: Long = DefaultMaxBucketRows): DataFrame = {
    val k = bands * rowsPerBand
    val base = Scratch.materialize(
      Par.fanOut(docs.select(col(idCol).as("id"), col(textCol).as("t")))
        .select(
          col("id"),
          graft.functions.MinHashSignature
            .minhashSignature(col("t"), shingleK, k).as("sig"),
          shingles(col("t"), shingleK).as("gs"))
        .withColumn("sz", size(col("gs"))),
      "mh_est_signatures")
    val candidates = candidatePairs(
      bandedKeys(base.select(col("id"), col("sig")), bands, rowsPerBand),
      "minhashEstimatePairs", maxBucketRows)
    val withSigs = candidates
      .join(base.select(col("id").as("a"), col("sig").as("sig_a"),
        col("gs").as("gs_a"), col("sz").as("sz_a")), Seq("a"))
      .join(base.select(col("id").as("b"), col("sig").as("sig_b"),
        col("gs").as("gs_b"), col("sz").as("sz_b")), Seq("b"))
    val matches = aggregate(
      zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, lit(1)).otherwise(lit(0))),
      lit(0), (acc, x) => acc + x)
    val inter = fence(graft.functions.ArrayIntersectSize
      .arrayIntersectSize(col("gs_a"), col("gs_b")))
    withSigs
      .select(col("a"), col("b"), matches.as("matches"), inter.as("inter"),
        col("sz_a"), col("sz_b"))
      .select(col("a"), col("b"), col("matches"),
        round(col("matches").cast("double") / lit(k.toDouble), 6)
          .as("est_jaccard"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 6)
          .as("jaccard"))
  }

  private def exactJaccard(pairs: DataFrame, minJaccard: Double): DataFrame =
    pairs
      .select(col("a"), col("b"), col("sz_a"), col("sz_b"),
        fence(graft.functions.ArrayIntersectSize
          .arrayIntersectSize(col("gs_a"), col("gs_b"))).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("jaccard"))

  /** FUZZY decontamination / cross-corpus near-dup: MinHash-LSH
    * candidates BETWEEN two corpora (training docs × held-out benchmark),
    * verified by exact shingle Jaccard — the near-duplicate complement of
    * [[Corpus.decontaminate]]'s exact n-gram overlap (a lightly rephrased
    * eval document shares few exact 8-grams but keeps a high shingle
    * Jaccard). Same machinery and scale shape as [[lshJaccard]], with the
    * self-join replaced by a bipartite band-key join: each side is
    * scanned ONCE into its own scratch signature table, candidates come
    * from band-bucket collisions (never the |L|×|R| cross product), the
    * size-ratio prefilter prunes before shingle arrays ship, and the
    * benchmark side is typically small — AQE broadcasts it on its own.
    * Output: (a = left id, b = right id, jaccard), unordered pairs
    * across distinct id spaces (no a < b canonicalization). */
  def crossLshJaccard(
      left: DataFrame,
      right: DataFrame,
      leftIdCol: String = "doc_id",
      rightIdCol: String = "bench_id",
      textCol: String = "text",
      shingleK: Int = 5,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.0,
      maxBucketRows: Long = DefaultMaxBucketRows): DataFrame = {
    def sigTable(df: DataFrame, idc: String, prefix: String) =
      Scratch.materialize(
        Par.fanOut(df.select(col(idc).as("id"), col(textCol).as("t")))
          .select(
            col("id"),
            graft.functions.MinHashSignature
              .minhashSignature(col("t"), shingleK, bands * rowsPerBand).as("sig"),
            shingles(col("t"), shingleK).as("gs"))
          .withColumn("sz", size(col("gs"))),
        prefix)
    val l = sigTable(left, leftIdCol, "xlsh_left")
    val r = sigTable(right, rightIdCol, "xlsh_right")
    // BOTH sides' bucket bounds are enforced — the per-bucket fanout is
    // |L_bucket|×|R_bucket|, so a mass-duplicate benchmark side (the
    // "small by contract" side) could drive the bipartite join
    // quadratic just as well as the corpus side
    val guardHint = "a mass-duplicate band bucket yields quadratic candidate " +
      "pairs - run exact dedup first or raise maxBucketRows deliberately"
    val lb = Blocks.guardBlockSize(
      bandedKeys(l.select(col("id"), col("sig")), bands, rowsPerBand),
      "bk", maxBucketRows, "crossLshJaccard", hint = guardHint,
      boundName = "maxBucketRows")
      .select(col("id").as("a"), col("bk"))
    val rb = Blocks.guardBlockSize(
      bandedKeys(r.select(col("id"), col("sig")), bands, rowsPerBand),
      "bk", maxBucketRows, "crossLshJaccard", hint = guardHint,
      boundName = "maxBucketRows")
      .select(col("id").as("b"), col("bk"))
    val candidates = lb.join(rb, Seq("bk")).select(col("a"), col("b")).distinct()
    val sized = candidates
      .join(l.select(col("id").as("a"), col("sz").as("sz_a")), Seq("a"))
      .join(r.select(col("id").as("b"), col("sz").as("sz_b")), Seq("b"))
      .filter(col("sz_a") > 0 && col("sz_b") > 0 &&
        least(col("sz_a"), col("sz_b")).cast("double") >=
          lit(minJaccard - 1e-6) * greatest(col("sz_a"), col("sz_b")).cast("double"))
      .select(col("a"), col("b"))
    val withA = sized.join(l.select(col("id").as("a"), col("gs").as("gs_a"),
      col("sz").as("sz_a")), Seq("a"))
    val withB = withA.join(r.select(col("id").as("b"), col("gs").as("gs_b"),
      col("sz").as("sz_b")), Seq("b"))
    exactJaccard(withB, minJaccard)
  }

  /** Exact n-gram Jaccard similarity, computed only within blocks (e.g.
    * same source+lang) — the blocking keeps this linear-ish; an unblocked
    * version of this op at 100 TB would be the O(n²) anti-pattern. The
    * small-blocks contract is ENFORCED: a block past `maxBlockRows`
    * fails the query fast with the block value and the MinHash-LSH
    * escape route (Blocks.guardBlockSize), instead of silently running
    * an accidental near-cross-product for hours on a skewed corpus. */
  def ngramJaccard(
      docs: DataFrame,
      blockCols: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 5,
      minJaccard: Double = 0.0,
      maxBlockRows: Long = 100000L): DataFrame = {
    // One shingle-array per doc, then a within-block self-join with the
    // allocation-free intersect count — beats the gram-explode equi-join
    // (which shuffles k× the corpus bytes and grinds through high-
    // frequency gram keys) while computing the identical jaccard.
    val grams = Par.fanOut(docs.select(
        col(idCol).as("id"),
        struct(blockCols.map(col): _*).as("blk"),
        col(textCol)))
      .select(col("id"), col("blk"), shingles(col(textCol), shingleK).as("gs"))
      .withColumn("sz", size(col("gs")))
    // guard ONE side only — the join is on the same key, so per-block
    // sizes are checked exactly once per block
    val a = Blocks.guardBlockSize(
      grams.select(col("blk"), col("id").as("a"), col("gs").as("gs_a"), col("sz").as("sz_a")),
      "blk", maxBlockRows, "ngramJaccard")
    val b = grams.select(col("blk").as("blk_b"), col("id").as("b"), col("gs").as("gs_b"), col("sz").as("sz_b"))
    // Join condition: cheap conjuncts ONLY, ordered cheap-first — a < b,
    // then the size-ratio bound (jaccard ≤ min(sz)/max(sz)) in
    // multiplication form (no division → no 0/0-NaN escape hatch; an
    // explicit sz > 0 guard would be pushed to the scan and recompute
    // the shingles per input row — `shingles` yields ≥ 1 element by
    // construction and null text nulls the condition out, so the guard
    // is redundant here) with 1e-6 slack for the rounded final filter.
    // Sizes are computed map-side before the block shuffle, so pairs
    // that cannot reach the threshold are dropped before any O(sz)
    // intersect runs; the intersect itself is evaluated exactly once per
    // surviving pair, above the join, behind the optimizer fence (see
    // exactJaccard). Result-preserving for any minJaccard ≥ 0.
    //
    // shuffle_hash hint: both self-join sides derive from the corpus;
    // Spark's size estimate comes from the parquet TEXT bytes and badly
    // underestimates the in-memory shingle arrays (~k× the text), so
    // near the autoBroadcast threshold at scale the planner would
    // broadcast a NOT-small side — a driver/executor OOM at 100×. A
    // shuffle-hash join is the scale-safe strategy for same-size sides.
    a.hint("shuffle_hash")
      .join(b, col("blk") === col("blk_b") && col("a") < col("b") &&
        least(col("sz_a"), col("sz_b")).cast("double") >=
          lit(minJaccard - 1e-6) * greatest(col("sz_a"), col("sz_b")).cast("double"))
      .transform(exactJaccard(_, minJaccard))
  }

  /**
   * Exact n-gram CONTAINMENT within blocks — the asymmetric companion
   * to [[ngramJaccard]] (Broder's containment): score =
   * |A∩B| / min(|A|, |B|), which fires when one document's shingle set
   * sits mostly INSIDE the other's — quote lifting, page-in-page
   * embedding, prefix/suffix republication — exactly the pairs whose
   * JACCARD is tiny because the big doc's union term swamps it.
   *
   * The algorithmic consequence is the interesting part: Jaccard's
   * size-ratio prefilter (min(sz)/max(sz) ≥ j) is UNAVAILABLE here — a
   * 50-shingle doc inside a 50k-shingle doc is precisely the target —
   * so candidate volume is bounded ONLY by the blocking contract; the
   * `maxBlockRows` guard is doing all the scale work and is therefore
   * non-negotiable. Same fenced one-intersect-per-pair verification
   * tail, 6-dp rounding, (a < b) canonical pairs.
   */
  def ngramContainment(
      docs: DataFrame,
      blockCols: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 5,
      minContainment: Double = 0.5,
      maxBlockRows: Long = 100000L): DataFrame = {
    val grams = Par.fanOut(docs.select(
        col(idCol).as("id"),
        struct(blockCols.map(col): _*).as("blk"),
        col(textCol)))
      .select(col("id"), col("blk"), shingles(col(textCol), shingleK).as("gs"))
      .withColumn("sz", size(col("gs")))
    val a = Blocks.guardBlockSize(
      grams.select(col("blk"), col("id").as("a"), col("gs").as("gs_a"),
        col("sz").as("sz_a")),
      "blk", maxBlockRows, "ngramContainment",
      hint = "containment has no size-ratio prefilter - the block bound "
        + "is the only candidate-volume contract; refine the blocking "
        + "key or pre-cluster with LSH")
    val b = grams.select(col("blk").as("blk_b"), col("id").as("b"),
      col("gs").as("gs_b"), col("sz").as("sz_b"))
    a.hint("shuffle_hash")
      .join(b, col("blk") === col("blk_b") && col("a") < col("b"))
      .select(col("a"), col("b"), col("sz_a"), col("sz_b"),
        fence(graft.functions.ArrayIntersectSize
          .arrayIntersectSize(col("gs_a"), col("gs_b"))).as("inter"))
      .withColumn("containment",
        round(col("inter").cast("double") /
          least(col("sz_a"), col("sz_b")).cast("double"), 6))
      .filter(col("containment") >= minContainment)
      .select(col("a"), col("b"), col("sz_a"), col("sz_b"),
        col("containment"))
  }

  /**
   * Span-level exact-substring duplicate detection (Lee et al. 2021,
   * "Deduplicating Training Data Makes Language Models Better" — the
   * ExactSubstr criterion, at token-window granularity): flag every
   * document that shares an exact `spanTokens`-token span with at
   * least one OTHER document. This is the dedup mode BETWEEN
   * whole-document exact dedup (misses partial copies) and MinHash
   * near-dup (misses a verbatim paragraph inside an otherwise-unique
   * page): a quoted boilerplate block, a syndicated lead paragraph, or
   * a copied license header lights up here and nowhere else.
   *
   * Mechanism: distinct `spanTokens`-token windows per document (the
   * [[graft.functions.TextFunctions.tokenShingles]] decontamination
   * granularity, 60-bit md5 gram hashes), a posting count per gram
   * (distinct documents containing it), and a per-document rollup —
   * `n_dup_spans` counts this document's distinct spans that occur in
   * ≥2 documents. The suffix-array of the published recipe is a
   * single-machine construct; fixed-width token windows are the
   * shuffle-native equivalent at the same granularity.
   *
   * Scale shape: one corpus scan into a scratch gram table (read by
   * the posting count AND the rollup), then two keyed aggregates and
   * one gram-keyed equi-join — documents are never paired with
   * documents, so a mass-duplicated span costs its posting list, not a
   * quadratic fanout. Grams travel as fixed-width longs.
   *
   * Output: (doc_id, n_spans, n_dup_spans, span_dup) for every corpus
   * document; documents shorter than `spanTokens` contribute their one
   * truncated window, matching the decontamination convention.
   */
  /** EXACT all-pairs token-set Jaccard join via prefix filtering — the
    * AllPairs/PPJoin family (Bayardo/Ma/Srikant, "Scaling up all pairs
    * similarity search", WWW 2007; Xiao/Wang/Lin/Yu, "Efficient
    * similarity joins for near duplicate detection", WWW 2008). Unlike
    * [[lshJaccard]] this has NO false negatives: every pair of documents
    * whose distinct-token Jaccard reaches `minJaccard` is returned,
    * with the filter doing the work LSH's probabilistic bands do.
    *
    * Mechanism: tokens are globally ordered rarest-first (document
    * frequency, then token — both engines derive the identical order),
    * each document keeps only its PREFIX of p = n − ceil(t·n) + 1
    * sorted tokens, and two documents are candidates only if their
    * prefixes share a token: any pair at Jaccard ≥ t must collide on
    * the first p tokens of either side (pigeonhole over the shared
    * order). Prefix buckets are keyed by the corpus's RAREST tokens, so
    * bucket sizes track document frequency of rare terms — naturally
    * tiny — and the same enforced `maxBucketRows` contract as the LSH
    * band buckets covers the degenerate corpus (mass duplicates make
    * every prefix identical; escape: exact dedup first).
    *
    * Threshold arithmetic is EXACT: t is fixed to the rational
    * round(t·10⁶)/10⁶ and every comparison (length filter, prefix
    * length, final Jaccard ≥ t) is an integer cross-multiplication —
    * no float boundary can silently drop a pair whose Jaccard is
    * exactly t (J ≥ t ⇒ |small|·10⁶ ≥ num·|large|, integer-provable).
    *
    * TWO enforced contracts: per-prefix-token buckets stay under
    * `maxBucketRows`, and the TOTAL candidate volume Σ bn·(bn−1)/2
    * over the prefix buckets stays under `maxCandidateVolume` — prefix
    * filtering prunes only when the token-frequency distribution is
    * skewed (real corpora are Zipfian); a tiny or uniform vocabulary
    * makes every pair collide, and that corpus must fail fast with the
    * escape route (exact dedup first / pre-block the corpus / raise
    * the bound), not silently go quadratic. The volume check rides the
    * candidate plan as a 1-row broadcast cross join — no extra driver
    * action.
    *
    * Scale shape: one corpus scan into a scratch (id, sorted tokens, n)
    * table; the df aggregate and the per-doc regroup are keyed
    * shuffles; candidates come from the guarded prefix-token equi-join
    * (ids only — token arrays do NOT ride the explode), and the two
    * verification joins re-read the scratch table. Output:
    * (a, b, jaccard) with a < b, jaccard rounded to 6 dp. */
  def ppjoinJaccard(
      docs: DataFrame,
      minJaccard: Double = 0.8,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxBucketRows: Long = DefaultMaxBucketRows,
      maxCandidateVolume: Long = 200000000L): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      "ppjoinJaccard: minJaccard must be in (0, 1] — at 0 every pair qualifies")
    val num = math.round(minJaccard * 1e6) // exact rational num/10⁶
    val den = 1000000L
    val tok = Par.fanOut(docs.select(col(idCol).as("id"), col(textCol).as("t")))
      .select(col("id"), explode(array_distinct(tokens(col("t")))).as("tk"))
    // global rarest-first token order: (document frequency, token)
    val dfreq = tok.groupBy("tk").agg(count(lit(1)).as("df"))
    val sorted = Scratch.materialize(
      tok.join(dfreq, Seq("tk"))
        .groupBy("id")
        .agg(sort_array(collect_list(struct(col("df"), col("tk")))).as("ts"))
        .select(
          col("id"),
          transform(col("ts"), s => s.getField("tk")).as("toks"),
          size(col("ts")).as("n")),
      "ppjoin_sorted")
    // prefix length p = n − ceil(t·n) + 1, integer ceil
    val p = (col("n") - ((lit(num) * col("n") + lit(den - 1)) / lit(den)).cast("int") + lit(1))
      .cast("int")
    val pref = Blocks.guardBlockSize(
      sorted.select(col("id"), col("n"), explode(slice(col("toks"), lit(1), p)).as("tk")),
      "tk", maxBucketRows, "ppjoinJaccard",
      "a prefix token shared by that many documents makes candidate "
        + "generation quadratic - run exact dedup first or raise maxBucketRows",
      boundName = "maxBucketRows")
    // total-candidate-volume contract: Σ bn·(bn−1)/2 over the prefix
    // buckets bounds the pair fanout the join below can mint
    val volGuard = broadcast(
      pref.groupBy(col("tk")).agg(count(lit(1)).as("bn"))
        .agg(sum(col("bn") * (col("bn") - 1) / 2).as("vol"))
        .select(
          when(coalesce(col("vol"), lit(0L)) <= maxCandidateVolume, lit(true))
            .otherwise(raise_error(concat(
              lit("ppjoinJaccard: prefix candidate volume "),
              col("vol").cast("string"),
              lit(s" > maxCandidateVolume=$maxCandidateVolume - this corpus"
                + " defeats prefix filtering (tiny or uniform vocabulary);"
                + " run exact dedup first, pre-block the corpus, or raise"
                + " the bound")))).as("vol_ok")))
    val candidates = pref.as("l")
      .join(
        pref.as("r"),
        col("l.tk") === col("r.tk") && col("l.id") < col("r.id") &&
          // length filter, integer-exact: J ≥ t ⇒ min·10⁶ ≥ num·max
          least(col("l.n"), col("r.n")) * lit(den) >=
            lit(num) * greatest(col("l.n"), col("r.n")))
      .crossJoin(volGuard.filter(col("vol_ok")))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()
    candidates
      .join(sorted.select(col("id").as("a"), col("toks").as("ta"), col("n").as("na")), Seq("a"))
      .join(sorted.select(col("id").as("b"), col("toks").as("tb"), col("n").as("nb")), Seq("b"))
      .select(col("a"), col("b"), col("na"), col("nb"),
        fence(graft.functions.ArrayIntersectSize
          .arrayIntersectSize(col("ta"), col("tb"))).as("inter"))
      // integer-exact threshold: c·10⁶ ≥ num·(|A∪B|)
      .filter(col("inter") * lit(den) >= lit(num) * (col("na") + col("nb") - col("inter")))
      .select(col("a"), col("b"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 6).as("jaccard"))
  }

  def spanDuplicates(
      docs: DataFrame,
      spanTokens: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val dg = Scratch.materialize(
      Par.fanOut(docs.select(col(idCol).as("doc_id"), col(textCol).as("t")))
        .select(col("doc_id"),
          explode(tokenShingles(col("t"), spanTokens)).as("g"))
        .filter(length(col("g")) > 0)
        .select(col("doc_id"),
          conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("gram"))
        .distinct(),
      "span_grams")
    // postings: distinct docs per gram (dg is (doc, gram)-distinct, so a
    // plain count IS the doc count) — map-side combinable
    val postings = dg.groupBy(col("gram")).agg(count(lit(1)).as("n_docs"))
    val perDoc = dg.join(postings, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_spans"),
        sum(when(col("n_docs") > 1L, 1L).otherwise(0L)).cast("int")
          .as("n_dup_spans"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0)).as("n_dup_spans"),
        (coalesce(col("n_dup_spans"), lit(0)) > 0).as("span_dup"))
  }

  /** EXACT-substring dedup with REMOVAL (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * ExactSubstr stage, re-expressed relationally at token
    * granularity): every `spanTokens`-token sliding window that occurs
    * at more than one (doc, position) keeps its globally FIRST
    * occurrence (min (doc_id, pos) — deterministic) and every other
    * occurrence's token range is cut from its document; the cleaned
    * text is rebuilt from the surviving tokens. Suffix-array substring
    * matching becomes a keyed GROUP BY over hashed sliding windows —
    * the relational shape of the same criterion.
    *
    * Output: (doc_id, clean_text, n_tokens, n_removed_tokens) for every
    * input document (whole-doc duplicates of short texts collapse to an
    * empty clean_text — the truncated-window convention makes exact
    * short-doc dups mutual whole-doc spans, removed all but first).
    *
    * Scale shape: the positioned window table is ONE keyed groupBy
    * (60-bit gram hash) + one join back — two shuffles total; cut
    * intervals collect per document (bounded by the document's own
    * token count, never corpus-wide) and the rebuild is a per-row
    * higher-order filter whose work is |tokens| × |cuts| within one
    * document. No corpus-wide windows, no suffix arrays, no driver
    * state. Overlapping duplicated spans need no interval merge: a
    * token survives iff NO cut covers it, which is invariant under
    * merging. */
  def stripDuplicateSpans(
      docs: DataFrame,
      spanTokens: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(spanTokens >= 1, "spanTokens must be >= 1")
    val base = Scratch.materialize(
      docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"),
        tokenWindows(col(textCol), spanTokens).as("wins")),
      "strip_base")
    val occ = base
      .select(col("doc_id"), posexplode(col("wins")).as(Seq("spos", "g")))
      .filter(length(col("g")) > 0)
      .select(col("doc_id"), col("spos"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("gram"))
    val keepers = occ.groupBy(col("gram"))
      .agg(min(struct(col("doc_id"), col("spos"))).as("k"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1L)
      .select(col("gram"), col("k.doc_id").as("kdoc"), col("k.spos").as("kpos"))
    val cuts = occ.join(keepers, Seq("gram"))
      .filter(!(col("doc_id") === col("kdoc") && col("spos") === col("kpos")))
      .select(col("doc_id"), col("spos").as("cstart"),
        (col("spos") + lit(spanTokens)).as("cend"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("cstart"), col("cend"))).as("cuts"))
    base.join(cuts, Seq("doc_id"), "left")
      .withColumn("kept",
        when(col("cuts").isNull, col("toks"))
          .otherwise(transform(
            filter(
              transform(col("toks"), (t, i) =>
                struct(i.as("i"), t.as("t"))),
              s => !exists(col("cuts"), c =>
                s.getField("i") >= c.getField("cstart") &&
                  s.getField("i") < c.getField("cend"))),
            s => s.getField("t"))))
      .select(col("doc_id"),
        array_join(col("kept"), " ").as("clean_text"),
        size(col("toks")).as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).as("n_removed_tokens"))
  }
}
