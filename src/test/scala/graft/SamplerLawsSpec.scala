package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based laws of the deterministic samplers — the invariants
  * mixture tuning relies on: nestedness (raising a rate/weight/k only
  * ADDS documents, never swaps them) and split totality. Each property
  * runs real Spark jobs, so the iteration count is kept small; the
  * samplers are deterministic, so passes are stable, not sampled luck. */
class SamplerLawsSpec extends SparkTestBase {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(r.passed, r.status.toString)
  }

  private lazy val docs = (1L to 120L)
    .map(i => (i, s"src${i % 3}", s"doc text number $i"))
    .toDF("doc_id", "source", "text")

  private val rateGen = Gen.choose(0.05, 0.95)

  test("property: mixtureSample is nested in the rate") {
    check(Prop.forAll(rateGen, rateGen) { (r1, r2) =>
      val (lo, hi) = if (r1 <= r2) (r1, r2) else (r2, r1)
      def ids(r: Double) = Corpus.mixtureSample(docs, Map.empty, r)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      ids(lo).subsetOf(ids(hi))
    })
  }

  test("property: weightedMixtureSample is monotone in the weight") {
    check(Prop.forAll(rateGen, Gen.choose(1.1, 3.0)) { (rate, boost) =>
      val w1 = docs.withColumn("w", (col("doc_id") % 7).cast("double") / 10.0)
      val w2 = w1.withColumn("w", least(col("w") * boost, lit(1.0)))
      def ids(df: org.apache.spark.sql.DataFrame) =
        Corpus.weightedMixtureSample(df, Map.empty, rate, "w")
          .select("doc_id").collect().map(_.getLong(0)).toSet
      ids(w1).subsetOf(ids(w2))
    })
  }

  test("property: sampleFixedPerGroup is nested in k and exactly sized") {
    check(Prop.forAll(Gen.choose(1, 20), Gen.choose(1, 20)) { (k1, k2) =>
      val (lo, hi) = if (k1 <= k2) (k1, k2) else (k2, k1)
      def sample(k: Int) = Corpus.sampleFixedPerGroup(docs, k)
        .select("doc_id", "source").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val sLo = sample(lo); val sHi = sample(hi)
      val groupsOk = sLo.groupBy(_._2).forall { case (_, rows) => rows.length == lo }
      sLo.toSet.subsetOf(sHi.toSet) && groupsOk
    })
  }

  test("property: assignSplits partitions the corpus exactly") {
    val nameGen = Gen.choose(2, 4).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0.05, 1.0)).map(_.zipWithIndex.map {
        case (w, i) => (s"s$i", w)
      }))
    check(Prop.forAll(nameGen) { splits =>
      val out = Corpus.assignSplits(docs, splits)
        .groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      out.values.sum == 120L && out.keySet.subsetOf(splits.map(_._1).toSet)
    })
  }
}
