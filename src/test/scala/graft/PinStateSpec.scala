package graft

import org.apache.spark.sql.functions._
import graft.ops.Pin

/** The driver-pinned iteration-state gate (graft.ops.Pin): value
  * identity, the local-relation fast path, and the ENFORCED byte-aware
  * fallback (round-13 advisory: a row bound alone admits multi-GB
  * collects when state rows carry embedding vectors). */
class PinStateSpec extends SparkTestBase {

  private def isLocal(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves().forall {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _ => false
    }

  test("small fixed-width state pins to a local relation, values exact") {
    import spark.implicits._
    val df = Seq((1L, 0, 7L), (2L, 0, 9L)).toDF("walk", "step", "node")
      .withColumn("node", col("node") * 2L)
    val pinned = Pin.state(df, "pin_test")
    assert(isLocal(pinned), "expected a driver-pinned local relation")
    assert(pinned.schema == df.schema)
    assert(pinned.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(_._1).toSeq == Seq((1L, 0, 14L), (2L, 0, 18L)))
  }

  test("wide-vector state over the byte bound takes the distributed path") {
    import spark.implicits._
    // 200 rows x 512-dim double vectors ~ 820 KB of payload: over a
    // 64 KB byte bound even though far under any row bound
    val df = spark.range(200).select(col("id").as("query_id"),
      transform(sequence(lit(1), lit(512)),
        i => i.cast("double") / 7.0d).as("qv"))
    val prev = spark.conf.getOption("spark.graft.maxLocalStateBytes")
    spark.conf.set("spark.graft.maxLocalStateBytes", (64L * 1024).toString)
    try {
      val pinned = Pin.state(df, "pin_wide")
      assert(!isLocal(pinned),
        "a frontier past the byte bound must fall back to scratch parquet")
      assert(pinned.count() == 200L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.maxLocalStateBytes", v)
        case None => spark.conf.unset("spark.graft.maxLocalStateBytes")
      }
    }
  }

  test("pinned loops equal the distributed loops (bpe / walks / pagerank)") {
    import spark.implicits._
    // pinned fast path (default gate) vs forced-distributed
    // (maxLocalEdges = 0) — exact value equality, the louvain-style
    // differential discipline, on the gated-query fixtures
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .limit(120).select(col("doc_id"), col("text"))
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .filter(col("l_partkey") % 4 === 0)
    val e = graft.operators.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    def sets(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    def forcedDistributed[A](body: => A): A = {
      val prev = spark.conf.getOption("spark.graft.maxLocalEdges")
      spark.conf.set("spark.graft.maxLocalEdges", "0")
      try body finally prev match {
        case Some(v) => spark.conf.set("spark.graft.maxLocalEdges", v)
        case None => spark.conf.unset("spark.graft.maxLocalEdges")
      }
    }
    val bpeLocal = sets(graft.operators.TextAnalysis.bpeMerges(docs, rounds = 4))
    val bpeDist = forcedDistributed(
      sets(graft.operators.TextAnalysis.bpeMerges(docs, rounds = 4)))
    assert(bpeLocal == bpeDist, "bpe local/distributed divergence")
    val encLocal = sets(graft.operators.TextAnalysis.bpeEncodeCounts(docs, rounds = 4))
    val encDist = forcedDistributed(
      sets(graft.operators.TextAnalysis.bpeEncodeCounts(docs, rounds = 4)))
    assert(encLocal == encDist, "bpe-encode local/distributed divergence")
    val rwPinned = sets(graft.operators.Graph.randomWalks(e, steps = 3))
    val rwDist = forcedDistributed(
      sets(graft.operators.Graph.randomWalks(e, steps = 3)))
    assert(rwPinned == rwDist, "random-walk pinned/distributed divergence")
    val prPinned = graft.operators.Graph.pageRank(e, iters = 3)
      .select(col("node"), round(col("rank"), 9).as("r"))
    val prDist = forcedDistributed {
      sets(graft.operators.Graph.pageRank(e, iters = 3)
        .select(col("node"), round(col("rank"), 9).as("r")))
    }
    assert(sets(prPinned) == prDist, "pagerank pinned/distributed divergence")
  }

  test("state over the row bound takes the distributed path") {
    val df = spark.range(1000).select(col("id").as("walk"),
      lit(0).as("step"), (col("id") * 3L).as("node"))
    val prev = spark.conf.getOption("spark.graft.maxLocalEdges")
    spark.conf.set("spark.graft.maxLocalEdges", "100")
    try {
      val pinned = Pin.state(df, "pin_rows")
      assert(!isLocal(pinned),
        "state past the row bound must fall back to scratch parquet")
      assert(pinned.count() == 1000L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.maxLocalEdges", v)
        case None => spark.conf.unset("spark.graft.maxLocalEdges")
      }
    }
  }
}
