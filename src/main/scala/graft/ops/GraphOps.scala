package graft.ops

import graft.model.{EdgeSpec, GraphModel, NodeSpec}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The reference's operator inventory (SURVEY.md §2) re-expressed as small
 * declarative `DataFrame => DataFrame` transforms, so Catalyst sees one plan
 * (pruning + pushdown are free) instead of opaque per-batch callbacks.
 *
 * Reference operators covered here:
 *  - P1 CopyKeyToMetadata (neo4j_beam/_dofn.py:80-93) → a real `src` COLUMN
 *    from `input_file_name()` — schema metadata doesn't survive Spark
 *    operators; a column does, and it prunes away when unused.
 *  - P3 model routing (pipeline.py:108,118) → `filter(src regex)` per spec.
 *  - P4/P5 canonical projection (inferred from _dofn.py:111,135 +
 *    README.md:164-176) → `select` with aliases into the GDS wire schema.
 *  - P2 model-driven column pruning (pipeline.py:106-127) → explicit
 *    `select` of the spec's needed columns; Catalyst pushes it to the scan.
 *  - R1/R2 re-batch / reshuffle (_dofn.py:171-202, pipeline.py:148,161) →
 *    `repartition`.
 */
object GraphOps {

  /** Canonical wire-schema column names (GDS Arrow node/edge schema). */
  val NodeId = "nodeId"
  val Labels = "labels"
  val SourceNodeId = "sourceNodeId"
  val TargetNodeId = "targetNodeId"
  val RelationshipType = "relationshipType"
  val SrcCol = "src"

  /** P1: tag every row with its provenance (source file path). */
  def tagProvenance(df: DataFrame): DataFrame =
    df.withColumn(SrcCol, input_file_name())

  /** Read a parquet glob and tag provenance — the S1 scan
    * (pipeline.py:60-62). The vectorized reader keeps this columnar. */
  def scanParquet(spark: SparkSession, pattern: String): DataFrame =
    tagProvenance(spark.read.parquet(pattern))

  /** Python-`re.match` anchored-at-start regex as a Column predicate.
    * `rlike` is an unanchored search; prefixing `^(?:...)` anchors it. */
  def matchesSource(srcCol: Column, regex: String): Column =
    srcCol.rlike("^(?:" + regex + ")")

  /** P3 for one spec: keep only rows whose provenance matches. */
  def routeTo(df: DataFrame, sourceRegex: String): DataFrame =
    df.filter(matchesSource(col(SrcCol), sourceRegex))

  /** P4: project a routed batch into the canonical node wire schema:
    * `nodeId: long`, optional `labels`, renamed property columns.
    * Mirrors the optionality of pipeline.py:109-112 — a spec may omit
    * label_field; empty properties means "carry all remaining columns". */
  def projectNode(df: DataFrame, spec: NodeSpec): DataFrame = {
    val key = spec.keyField.getOrElse(
      throw new IllegalArgumentException(s"node spec '${spec.source}' has no key_field"))
    val keyCol = col(key).cast(LongType).as(NodeId)
    val labelCol = spec.labelField.map(f => col(f).as(Labels))
    val propCols: Seq[Column] =
      if (spec.properties.nonEmpty)
        spec.properties.toSeq.sortBy(_._2).map { case (s, t) => col(s).as(t) }
      else { // all columns except consumed ones (reference: full-batch pass-through)
        val consumed = Set(key) ++ spec.labelField + SrcCol
        df.columns.filterNot(consumed).sorted.toSeq.map(col)
      }
    df.select(keyCol +: (labelCol.toSeq ++ propCols): _*)
  }

  /** P5: project a routed batch into the canonical edge wire schema. */
  def projectEdge(df: DataFrame, spec: EdgeSpec): DataFrame = {
    def need(f: Option[String], what: String) = f.getOrElse(
      throw new IllegalArgumentException(s"edge spec '${spec.source}' has no $what"))
    val s = need(spec.sourceField, "source_field")
    val t = need(spec.targetField, "target_field")
    val base = Seq(
      col(s).cast(LongType).as(SourceNodeId),
      col(t).cast(LongType).as(TargetNodeId))
    val typeCol = spec.typeField.map(f => col(f).as(RelationshipType))
    val propCols: Seq[Column] =
      if (spec.properties.nonEmpty)
        spec.properties.toSeq.sortBy(_._2).map { case (src, tgt) => col(src).as(tgt) }
      else {
        val consumed = Set(s, t) ++ spec.typeField + SrcCol
        df.columns.filterNot(consumed).sorted.toSeq.map(col)
      }
    df.select(base ++ typeCol.toSeq ++ propCols: _*)
  }

  /** P2: model-driven column pruning — select only what the spec needs
    * (plus provenance). Catalyst pushes this into the parquet scan. */
  def pruneFor(df: DataFrame, needed: Option[Seq[String]]): DataFrame =
    needed match {
      case Some(cols) =>
        val keep = (cols :+ SrcCol).filter(df.columns.contains)
        df.select(keep.map(col): _*)
      case None => df
    }

  /** R1/R2: spread work across the cluster / break pipelining.
    * Only call when the downstream op needs it — every call is a shuffle. */
  def rebatch(df: DataFrame, numPartitions: Int): DataFrame =
    df.repartition(numPartitions)
}
