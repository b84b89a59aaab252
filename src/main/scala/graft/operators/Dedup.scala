package graft.operators

import graft.functions.TextFunctions._
import graft.ops.Par
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
 *    (never all-pairs); the shingle-explode join carries (doc, gram)
 *    pairs deduped before joining.
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

  /** MinHash+LSH candidate pairs: B bands of R rows each; a pair is a
    * candidate if ANY band agrees on all R minhashes. Output: distinct
    * (a, b) with a < b. Cost: n×B rows through one band-key shuffle —
    * never the O(n²) cross product. */
  def minhashLshCandidates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 5,
      bands: Int = 4,
      rowsPerBand: Int = 2): DataFrame = {
    val sig = minhashSignatures(docs, idCol, textCol, shingleK, bands * rowsPerBand)
    val bandCols = Seq.tabulate(bands) { b =>
      val slice = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => element_at(col("sig"), i + 1).cast("string"))
      struct(lit(b).as("band"), md5(concat_ws("|", slice: _*)).as("h"))
    }
    val banded = sig.select(
      col("id"),
      explode(array(bandCols: _*)).as("bk"))
    val l = banded.select(col("id").as("a"), col("bk"))
    val r = banded.select(col("id").as("b"), col("bk"))
    l.join(r, l("bk") === r("bk") && col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** 32-bit SimHash: per whitespace token take xxhash64, then for each bit
    * sum +1/-1 across tokens; the sign vector is the fingerprint. Native
    * one-pass expression (graft.functions.SimHash64) — the composed
    * alternative unrolls into `bits` interpreted array-aggregate lambdas
    * that re-tokenize per bit (~10× slower). */
  def simhash(text: Column, bits: Int = 32): Column =
    graft.functions.SimHash64.simhash64(text, bits)

  /** Per-doc simhash fingerprints plus a bucket key (top `prefixBits`) for
    * near-dup candidate grouping. */
  def simhashBuckets(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      bits: Int = 32,
      prefixBits: Int = 8): DataFrame =
    Par.fanOut(docs.select(col(idCol), col(textCol))).select(
      col(idCol),
      simhash(col(textCol), bits).as("simhash"),
      shiftrightunsigned(simhash(col(textCol), bits), bits - prefixBits).as("bucket"))

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
      minJaccard: Double = 0.0): DataFrame = {
    val candidates = minhashLshCandidates(docs, idCol, textCol, shingleK, bands, rowsPerBand)
    val grams = Par.fanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("gid"), shingles(col(textCol), shingleK).as("gs"))
    // Exact size-ratio prefilter: jaccard = |A∩B|/|A∪B| ≤ min/max of the
    // set sizes, so pairs with min/max < minJaccard can never pass the
    // threshold — prune them BEFORE shipping the (heavy) shingle arrays
    // through the join. Sizes are a tiny broadcastable relation.
    val sizes = grams.select(col("gid"), size(col("gs")).as("sz"))
    val sized = candidates
      .join(broadcast(sizes.select(col("gid"), col("sz").as("sz_a"))), col("a") === col("gid")).drop("gid")
      .join(broadcast(sizes.select(col("gid"), col("sz").as("sz_b"))), col("b") === col("gid")).drop("gid")
      .filter(
        least(col("sz_a"), col("sz_b")).cast("double") /
          greatest(col("sz_a"), col("sz_b")).cast("double") >= minJaccard)
      .select(col("a"), col("b"))
    val withA = sized.join(grams.select(col("gid"), col("gs").as("gs_a")),
      col("a") === col("gid")).drop("gid")
    val withB = withA.join(grams.select(col("gid"), col("gs").as("gs_b")),
      col("b") === col("gid")).drop("gid")
    withB
      .withColumn("inter",
        graft.functions.ArrayIntersectSize.arrayIntersectSize(col("gs_a"), col("gs_b")))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (size(col("gs_a")) + size(col("gs_b")) - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Exact n-gram Jaccard similarity, computed only within blocks (e.g.
    * same source+lang) — the blocking keeps this linear-ish; an unblocked
    * version of this op at 100 TB would be the O(n²) anti-pattern. */
  def ngramJaccard(
      docs: DataFrame,
      blockCols: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 5,
      minJaccard: Double = 0.0): DataFrame = {
    // One shingle-array per doc, then a within-block self-join with the
    // allocation-free intersect count — beats the gram-explode equi-join
    // (which shuffles k× the corpus bytes and grinds through high-
    // frequency gram keys) while computing the identical jaccard.
    val grams = Par.fanOut(docs.select(
        col(idCol).as("id"),
        struct(blockCols.map(col): _*).as("blk"),
        col(textCol)))
      .select(col("id"), col("blk"), shingles(col(textCol), shingleK).as("gs"))
    val a = grams.select(col("blk"), col("id").as("a"), col("gs").as("gs_a"))
    val b = grams.select(col("blk").as("blk_b"), col("id").as("b"), col("gs").as("gs_b"))
    a.join(b, col("blk") === col("blk_b") && col("a") < col("b"))
      .withColumn("inter",
        graft.functions.ArrayIntersectSize.arrayIntersectSize(col("gs_a"), col("gs_b")))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (size(col("gs_a")) + size(col("gs_b")) - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("jaccard"))
  }
}
