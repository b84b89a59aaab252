package graft

import graft.functions.{MinHashSignature, TextFunctions}
import graft.model.NodeSpec
import graft.ops.GraphOps
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/**
 * Cross-implementation consistency properties — the invariants the DuckDB
 * oracle parity rests on: the JVM-side normalize used inside the native
 * expressions must agree with the Column-expression normalize, and
 * Scala-regex routing must agree with the Spark `rlike` routing.
 */
class ConsistencySpec extends SparkTestBase {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(80), p)
    assert(r.passed, r.status.toString)
  }

  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    3 -> Gen.oneOf(' ', '\t', '\n', '\r', '\f'),
    1 -> Gen.oneOf('.', ',', '!', 'ü', 'É', '中'))).map(_.mkString)

  test("driver contract: every oracleSql key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracle entries without a query (silently skipped by the gate): $orphans")
    // and the gate is strong: ~every query is oracle-checked (rows-only
    // checks need an explicit waiver here)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without oracle SQL (rows-only): $rowsOnly")
  }

  test("property: JVM normalize == Spark column normalize") {
    check(Prop.forAll(Gen.listOfN(20, textGen)) { texts =>
      val fromSpark = texts.toDF("text")
        .select(TextFunctions.normalizeText(col("text"))).collect().map(_.getString(0))
      val fromJvm = texts.map(MinHashSignature.normalize)
      fromSpark.toSeq == fromJvm
    })
  }

  test("property: Scala-regex routing == Spark rlike routing") {
    val regexGen = Gen.oneOf("src1", "src[02]", ".*abc.*", "a+b", "x|y", "^q.*z$")
    check(Prop.forAll(Gen.listOfN(30, Gen.alphaNumStr), regexGen) { (srcs, regex) =>
      val spec = NodeSpec(regex)
      val scalaSide = srcs.map(spec.matches)
      val sparkSide = srcs.toDF("s")
        .select(GraphOps.matchesSource(col("s"), regex)).collect().map(_.getBoolean(0))
      scalaSide == sparkSide.toSeq
    })
  }

  test("multi-label nodes: array-typed label column passes through projection") {
    val df = Seq((1L, Seq("Person", "Author"), 9.5), (2L, Seq("Person"), 1.0))
      .toDF("id", "labels", "score")
    val out = GraphOps.projectNode(df,
      NodeSpec(".*", labelField = Some("labels"), keyField = Some("id"),
        properties = Map("score" -> "weight")))
    assert(out.schema("labels").dataType.typeName == "array")
    val r = out.orderBy("nodeId").collect()
    assert(r(0).getSeq[String](1) == Seq("Person", "Author"))
    assert(out.columns.toSeq == Seq("nodeId", "labels", "weight"))
  }

  test("property: minhash signature invariant to leading/trailing/extra whitespace") {
    check(Prop.forAll(textGen) { t =>
      val base = MinHashSignature.compute(t, 5, 4).toSeq
      MinHashSignature.compute("  " + t.replace(" ", "   ") + "\t", 5, 4).toSeq == base
    })
  }
}
