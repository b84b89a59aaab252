package graft

import graft.model.{EdgeSpec, GraphModel, NodeSpec}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class GraphModelSpec extends AnyFunSuite {

  /** Raw-scalacheck bridge (scalatestplus isn't in the offline cache). */
  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  val citationJson: String =
    """{ "name": "test", "db": "neo4j",
       "nodes": [
         {"source": "gs://.*/papers.*parquet", "label_field": "labels", "key_field": "paper"},
         {"source": "gs://.*/authors.*parquet", "label_field": "labels", "key_field": "author"}
       ],
       "edges": [
         {"source": "gs://.*/citations.*parquet", "type_field": "type",
          "source_field": "source", "target_field": "target"}
       ]}"""

  val soJson: String =
    """{ "name": "so", "db": "neo4j",
       "nodes": [{"source": "users", "key_field": "id",
                  "properties": {"up_votes": "up_votes", "reputation": "rep"}}],
       "edges": [{"source": "posts_answers", "source_field": "owner_user_id",
                  "target_field": "id", "properties": {"score": "score"}}]}"""

  test("parses the citation-style model (gcs_model.json shape)") {
    val g = GraphModel.fromJson(citationJson)
    assert(g.name == "test" && g.db == "neo4j")
    assert(g.nodes.map(_.keyField) == Seq(Some("paper"), Some("author")))
    assert(g.edges.head.typeField.contains("type"))
    assert(g.nodes.head.properties.isEmpty)
  }

  test("parses the SO-style model: optional label/type fields absent") {
    val g = GraphModel.fromJson(soJson)
    assert(g.nodes.head.labelField.isEmpty)
    assert(g.edges.head.typeField.isEmpty)
    assert(g.nodes.head.properties == Map("up_votes" -> "up_votes", "reputation" -> "rep"))
  }

  test("routing: first matching spec wins, anchored at start (re.match semantics)") {
    val g = GraphModel.fromJson(citationJson)
    assert(g.nodeForSrc("gs://bucket/papers_part0.parquet").exists(_.keyField.contains("paper")))
    assert(g.nodeForSrc("gs://bucket/authors_x.parquet").exists(_.keyField.contains("author")))
    assert(g.nodeForSrc("file:///local/papers.parquet").isEmpty) // anchored: no gs:// prefix
    // lookingAt (prefix) not fullmatch: trailing junk after the regex is fine
    val prefix = GraphModel(name = "p", nodes = Seq(NodeSpec("src1", keyField = Some("k"))))
    assert(prefix.nodeForSrc("src1").isDefined)
    assert(prefix.nodeForSrc("src11_extra").isDefined)
    assert(prefix.nodeForSrc("xsrc1").isEmpty)
  }

  test("json round-trip preserves the model") {
    val g = GraphModel.fromJson(soJson)
    assert(GraphModel.fromJson(g.toJson) == g)
  }

  test("neededColumns: empty properties disables pruning (pipeline.py:111-112)") {
    val n = NodeSpec("x", labelField = Some("l"), keyField = Some("k"))
    assert(n.neededColumns.isEmpty)
    val n2 = n.copy(properties = Map("a" -> "b"))
    assert(n2.neededColumns.contains(Seq("k", "l", "a")))
    val e = EdgeSpec("x", sourceField = Some("s"), targetField = Some("t"),
      properties = Map("p" -> "q"))
    assert(e.neededColumns.contains(Seq("s", "t", "p")))
  }

  test("property: routing is total and deterministic over arbitrary srcs") {
    val g = GraphModel.fromJson(citationJson)
    check(Prop.forAll(Gen.alphaNumStr) { s =>
      g.nodeForSrc(s) == g.nodeForSrc(s) &&
        g.nodeForSrc(s).forall(_.matches(s))
    })
  }

  test("property: first-match — a spec earlier in the list shadows later ones") {
    check(Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      val g = GraphModel(name = "t",
        nodes = Seq(NodeSpec(java.util.regex.Pattern.quote(s), keyField = Some("first")),
          NodeSpec(".*", keyField = Some("second"))))
      g.nodeForSrc(s).flatMap(_.keyField).contains("first") &&
        g.nodeForSrc(s + "_x").flatMap(_.keyField).contains("first")
    })
  }

  test("property: json round-trip for arbitrary models") {
    val genNode = for {
      src <- Gen.alphaNumStr; lf <- Gen.option(Gen.alphaNumStr.suchThat(_.nonEmpty))
      kf <- Gen.option(Gen.alphaNumStr.suchThat(_.nonEmpty))
      props <- Gen.mapOf(Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.alphaNumStr))
    } yield NodeSpec(src, lf, kf, props)
    val genModel = for {
      name <- Gen.alphaNumStr; nodes <- Gen.listOf(genNode)
    } yield GraphModel(name, "neo4j", nodes)
    check(Prop.forAll(genModel) { g => GraphModel.fromJson(g.toJson) == g })
  }
}
