package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Product-quantization ANN laws (Similarity.pqTopK) — the value-level
  * gate is the sim_pq_topk DuckDB oracle (full codebook/code/ADC
  * re-derivation). */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  // two well-separated clusters in 4-d; deterministic small jitter
  private def clustered = {
    val rows = (0 until 6).map { i =>
      val base = if (i < 3) 0.0f else 10.0f
      (i.toLong, Array(base + i * 0.01f, base, base - i * 0.01f, base))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("pqTopK: neighbors from the query's own cluster rank first") {
    val df = clustered
    val out = Similarity.pqTopK(df, df.filter(col("vec_id") === 0),
      k = 5, dims = 4, m = 2, ksub = 2, iters = 2)
      .orderBy(col("rank")).collect()
    assert(out.length == 5)
    // the two other cluster-A members (1,2) precede every cluster-B member
    val order = out.map(_.getLong(1)).toSeq
    assert(order.take(2).toSet == Set(1L, 2L))
    assert(out.map(_.getInt(3)).toSeq == Seq(1, 2, 3, 4, 5))
    // ADC distances are monotone with rank
    val d = out.map(_.getDouble(2)).toSeq
    assert(d == d.sorted)
  }

  test("pqTopK: deterministic across runs and excludes the query itself") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
    def run() = Similarity.pqTopK(e, q, k = 3, dims = 64, m = 4,
      ksub = 4, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    val a = run()
    assert(a == run())
    assert(a.forall { case (qid, nid, _, _) => qid != nid })
    assert(a.groupBy(_._1).forall(_._2.size == 3))
  }

  test("pqTopK: recall against brute force is far above chance") {
    val e = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    def asSets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    // brute force ranks by cosine; compare on L2-normalized vectors so
    // PQ's Euclidean geometry targets the same neighbors
    val norm = e.select(col("vec_id"),
      graft.operators.Similarity.l2Normalize(col("embedding")).as("embedding"))
    val qn = norm.filter(col("vec_id") < 5)
    val exact = asSets(graft.operators.Similarity.bruteForceTopK(e, q, k = 5))
    val pq = asSets(graft.operators.Similarity.pqTopK(norm, qn, k = 5,
      dims = 64, m = 8, ksub = 8, iters = 2))
    val recall = exact.keys.map(k =>
      (pq.getOrElse(k, Set.empty) & exact(k)).size.toDouble / 5).sum / exact.size
    info(f"PQ recall@5 = $recall%.2f")
    // these fixtures are near-isotropic noise (the hardest ANN case);
    // the claim is above-CHANCE retrieval: chance recall is k/n = 1%,
    // so a 5x-chance floor proves the codes carry real geometry
    assert(recall >= 0.05, f"recall $recall%.2f below 5x-chance floor")
  }

  test("ivfPqTopK: full probe budget + corpus shortlist equals brute force") {
    // nProbe = cells and shortlist = |corpus| disable both pruning
    // stages; the exact cosine re-rank must then reproduce
    // bruteForceTopK exactly — the nProbe=cells ≡ brute-force law the
    // plain IVF gate proves, extended through the PQ stage
    val e = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(e, q, k = 4)
      .select("query_id", "neighbor_id", "sim", "rank")
    val full = Similarity.ivfPqTopK(e, q, k = 4, cells = 4, nProbe = 4,
      dims = 64, m = 4, ksub = 4, iters = 1, shortlist = 100000)
    assert(full.exceptAll(exact).isEmpty && exact.exceptAll(full).isEmpty)
  }

  test("ivfPqTopK residual: full probe budget + corpus shortlist equals " +
      "brute force; residual ADC is well-formed when pruned") {
    // the nProbe=cells ≡ brute-force law must survive residual coding
    // (the exact re-rank sees raw vectors either way); the pruned run
    // checks the per-(query, cell) ADC tables produce a clean ranking
    val e = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(e, q, k = 4)
      .select("query_id", "neighbor_id", "sim", "rank")
    val full = Similarity.ivfPqTopK(e, q, k = 4, cells = 4, nProbe = 4,
      dims = 64, m = 4, ksub = 4, iters = 1, shortlist = 100000,
      residual = true)
    assert(full.exceptAll(exact).isEmpty && exact.exceptAll(full).isEmpty)
    val pruned = Similarity.ivfPqTopK(e, q, k = 4, cells = 4, nProbe = 2,
      dims = 64, m = 4, ksub = 4, iters = 1, shortlist = 12, residual = true)
      .collect()
    assert(pruned.groupBy(_.getLong(0)).forall(_._2.length == 4))
    assert(pruned.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("ivfPqTopK: pruned output is well-formed and deterministic") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
    def run() = Similarity.ivfPqTopK(e, q, k = 3, cells = 4, nProbe = 2,
      dims = 64, m = 4, ksub = 4, iters = 1, shortlist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    val a = run()
    assert(a == run())
    assert(a.forall { case (qid, nid, _, _) => qid != nid })
    // exact-cosine re-rank: sims are monotone non-increasing with rank
    a.groupBy(_._1).values.foreach { rs =>
      val sims = rs.sortBy(_._4).map(_._3)
      assert(sims == sims.sorted.reverse)
    }
    // shortlist below k is a caller error
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(e, q, k = 5, shortlist = 3)
    }
  }

  test("planLshBands: fits the budget and is the closest threshold in it") {
    val (b, r) = graft.operators.Dedup.planLshBands(16, 0.5)
    assert(b * r <= 16)
    val err = math.abs(math.pow(1.0 / b, 1.0 / r) - 0.5)
    for (rr <- 1 to 16; bb <- 1 to 16 / rr) {
      val e2 = math.abs(math.pow(1.0 / bb, 1.0 / rr) - 0.5)
      assert(err <= e2 + 1e-12, s"($bb,$rr) beats ($b,$r)")
    }
    // higher target threshold wants more rows per band (steeper, righter curve)
    val (_, rLow) = graft.operators.Dedup.planLshBands(64, 0.2)
    val (_, rHigh) = graft.operators.Dedup.planLshBands(64, 0.9)
    assert(rHigh >= rLow)
  }

  test("pqTopK: survives a codebook cell emptied during Lloyd (dense ADC table)") {
    // two identical seed points make cells 0 and 1 start at the same
    // centroid; the tie-to-lowest assignment empties cell 1, whose row
    // the Lloyd update's groupBy then DROPS — the surviving codebook is
    // {0, 2}, non-contiguous. The ADC table must stay indexed BY CELL
    // ID: a position-compacted table would look code 2 up one slot
    // left (cell 2's distance at position 3 is null), ranking every
    // far-cluster vector by a null adist.
    val df = Seq(
      (0L, Array(0.0f)), (1L, Array(0.0f)), (2L, Array(100.0f)),
      (3L, Array(0.5f)), (4L, Array(99.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(df, df.filter(col("vec_id") === 4),
      k = 4, dims = 1, m = 1, ksub = 3, iters = 1)
      .orderBy(col("rank")).collect()
    assert(out.length == 4)
    assert(out.forall(!_.isNullAt(2)), "null adist = compacted ADC lookup")
    // query [99] sits in the far cluster: its cluster-mate (vid 2,
    // code 2) must rank first, then the near-cluster ids by tie-break
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 0L, 1L, 3L))
  }

  test("pqTopK: rejects dims not divisible by m") {
    val df = clustered
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(df, df, dims = 4, m = 3)
    }
  }
}
