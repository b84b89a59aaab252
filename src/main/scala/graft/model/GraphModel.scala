package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import java.util.regex.Pattern
import scala.jdk.CollectionConverters._

/**
 * Declarative graph-projection model: which source (matched by regex over
 * provenance — a file path or table name) becomes which node label / edge
 * type, and which columns carry key / label / type / endpoints / properties.
 *
 * Mirrors the JSON shape of the reference's `Graph`/`Node`/`Edge` model
 * (reference: README.md:96-177, example_models/gcs_model.json:1-41,
 * example_models/so_model.json:1-50; consumed at pipeline.py:106-127).
 * Every field except `source` (and `keyField` / endpoint fields in practice)
 * is optional — so_model.json omits `label_field` / `type_field` entirely
 * and pipeline.py:109-112 guards each with truthiness checks.
 *
 * Routing semantics: the reference matches the spec's `source` regex against
 * the provenance string (README.md:165-167). We use Python `re.match`
 * semantics — anchored at the START of the string, not required to consume
 * it all — via `Matcher.lookingAt()`. First matching spec wins.
 */
final case class NodeSpec(
    source: String,
    labelField: Option[String] = None,
    keyField: Option[String] = None,
    properties: Map[String, String] = Map.empty) {
  @transient lazy val pattern: Pattern = Pattern.compile(source)
  def matches(src: String): Boolean = pattern.matcher(src).lookingAt()

  /** Source columns this spec needs (model-driven pruning, pipeline.py:106-112).
    * Empty `properties` means "take all columns" — then pruning is disabled. */
  def neededColumns: Option[Seq[String]] =
    if (properties.isEmpty) None
    else Some((keyField.toSeq ++ labelField.toSeq ++ properties.keys).distinct)
}

final case class EdgeSpec(
    source: String,
    typeField: Option[String] = None,
    sourceField: Option[String] = None,
    targetField: Option[String] = None,
    properties: Map[String, String] = Map.empty) {
  @transient lazy val pattern: Pattern = Pattern.compile(source)
  def matches(src: String): Boolean = pattern.matcher(src).lookingAt()

  def neededColumns: Option[Seq[String]] =
    if (properties.isEmpty) None
    else
      Some(
        (sourceField.toSeq ++ targetField.toSeq ++ typeField.toSeq ++
          properties.keys).distinct)
}

final case class GraphModel(
    name: String,
    db: String = "neo4j",
    nodes: Seq[NodeSpec] = Nil,
    edges: Seq[EdgeSpec] = Nil) {

  def withNode(n: NodeSpec): GraphModel = copy(nodes = nodes :+ n)
  def withEdge(e: EdgeSpec): GraphModel = copy(edges = edges :+ e)

  /** First node spec whose `source` regex matches the provenance (pipeline.py:108). */
  def nodeForSrc(src: String): Option[NodeSpec] = nodes.find(_.matches(src))

  /** First edge spec whose `source` regex matches the provenance (pipeline.py:118). */
  def edgeForSrc(src: String): Option[EdgeSpec] = edges.find(_.matches(src))

  def toJson: String = GraphModel.write(this)
}

object GraphModel {
  private val mapper = new ObjectMapper()

  /** Parse the model JSON (reference `Graph.from_json`, pipeline.py:29,41). */
  def fromJson(json: String): GraphModel = {
    val root = mapper.readTree(json)
    def optStr(n: JsonNode, f: String): Option[String] =
      Option(n.get(f)).filter(v => v.isTextual && !v.asText.isEmpty).map(_.asText)
    def props(n: JsonNode): Map[String, String] =
      Option(n.get("properties")) match {
        case Some(p) if p.isObject =>
          p.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
        case _ => Map.empty
      }
    def arr(f: String): Seq[JsonNode] =
      Option(root.get(f)).toSeq.flatMap(_.elements().asScala)

    GraphModel(
      name = optStr(root, "name").getOrElse(""),
      db = optStr(root, "db").getOrElse("neo4j"),
      nodes = arr("nodes").map { n =>
        NodeSpec(
          source = optStr(n, "source").getOrElse(""),
          labelField = optStr(n, "label_field"),
          keyField = optStr(n, "key_field"),
          properties = props(n))
      },
      edges = arr("edges").map { e =>
        EdgeSpec(
          source = optStr(e, "source").getOrElse(""),
          typeField = optStr(e, "type_field"),
          sourceField = optStr(e, "source_field"),
          targetField = optStr(e, "target_field"),
          properties = props(e))
      })
  }

  /** Load a model from any Hadoop-FS path — local file, `hdfs://`, or an
    * object store like the reference's `gs://` model location
    * (load_model_from_path/from_gcs, pipeline.py:24-45); the read is
    * capped at 64 KiB like the reference's GCS read (pipeline.py:40). */
  def fromPath(
      path: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): GraphModel = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val cap = 64 * 1024
      val buf = new Array[Byte](cap)
      var off = 0
      var n = in.read(buf, 0, cap)
      while (n > 0 && off + n < cap) { off += n; n = in.read(buf, off, cap - off) }
      if (n > 0) off += n
      fromJson(new String(buf.take(off), java.nio.charset.StandardCharsets.UTF_8))
    } finally in.close()
  }

  private def write(g: GraphModel): String = {
    val root = mapper.createObjectNode()
    root.put("name", g.name)
    root.put("db", g.db)
    def putProps(o: ObjectNode, m: Map[String, String]): Unit =
      if (m.nonEmpty) {
        val p = o.putObject("properties")
        m.foreach { case (k, v) => p.put(k, v) }
      }
    val ns: ArrayNode = root.putArray("nodes")
    g.nodes.foreach { n =>
      val o = ns.addObject()
      o.put("source", n.source)
      n.labelField.foreach(o.put("label_field", _))
      n.keyField.foreach(o.put("key_field", _))
      putProps(o, n.properties)
    }
    val es: ArrayNode = root.putArray("edges")
    g.edges.foreach { e =>
      val o = es.addObject()
      o.put("source", e.source)
      e.typeField.foreach(o.put("type_field", _))
      e.sourceField.foreach(o.put("source_field", _))
      e.targetField.foreach(o.put("target_field", _))
      putProps(o, e.properties)
    }
    mapper.writeValueAsString(root)
  }
}
