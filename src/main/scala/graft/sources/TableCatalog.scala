package graft.sources

import graft.model.{EdgeSpec, NodeSpec}
import graft.ops.GraphOps
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Named-table source over a directory of parquet files — the Spark
 * analogue of the reference's BigQuery table surface (S2/S3/S6,
 * neo4j_bigquery/_client.py:46-73):
 *
 *  - stream planning (`ReadSession` → ≤1000 stream names per table) ≙
 *    Spark's FileScan partition planning — free and automatic; the
 *    `planScan` probe exposes the resulting parallelism for inspection.
 *  - model-driven column pruning (`selected_fields`, pipeline.py:106-127)
 *    ≙ `select` of the spec's needed columns — Catalyst pushes it into
 *    the reader (visible as ReadSchema in the plan).
 *  - worker-side stream consumption ≙ FileScanRDD; nothing to build.
 *
 * Provenance for model routing is the table NAME (the reference's BQ
 * mode routes on table names, e.g. so_model.json's "users").
 */
final class TableCatalog(spark: SparkSession, baseDir: String) {

  /** Table names = parquet basenames in the directory, listed through
    * the Hadoop FileSystem API so ANY configured scheme works (file:,
    * hdfs:, gs:-style object stores) — same remote-table surface as the
    * reference's BQ dataset listing (_client.py:46-63) and same plumbing
    * as GraphProjection.expandGlob / GraphModel.fromPath. */
  def tables: Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(baseDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq.flatMap { st =>
      val n = st.getPath.getName
      // a format extension names the table whether the entry is a plain
      // file or a Spark-written output directory (part.parquet/); a bare
      // directory is a directory table (multi-file / hive-partitioned)
      formatOf(n).map(_ => n.substring(0, n.lastIndexOf('.')))
        .orElse(
          if (st.isDirectory && !n.startsWith("_") && !n.startsWith("."))
            Some(n)
          else None)
    }.distinct.sorted
  }

  /** Columnar formats first — when the same table name exists in more
    * than one format, the scan-friendly one wins. */
  private val Formats = Seq("parquet", "orc", "json", "csv")

  private def formatOf(fileName: String): Option[String] = {
    val i = fileName.lastIndexOf('.')
    if (i < 0) None
    else Some(fileName.substring(i + 1)).filter(Formats.contains)
  }

  private def resolve(table: String): (String, String) = {
    val path = new org.apache.hadoop.fs.Path(baseDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(s"$baseDir/$table")
    // a DIRECTORY table: multi-file parquet, optionally hive-partitioned
    // (split=/shard= leaves — the layout writeShards produces); Spark's
    // partition discovery turns the leaf dirs into partition columns and
    // filters on them prune to matching directories before any IO
    val isDir = fs.exists(dirPath) && fs.getFileStatus(dirPath).isDirectory
    val present = Formats.filter(f =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$baseDir/$table.$f"))) ++
      (if (isDir) Seq("dir") else Nil)
    if (present.size > 1)
      // format shadowing is deliberate (columnar wins) but must be
      // VISIBLE: a same-named parquet file silently replacing a CSV
      // table would otherwise change column types without a trace
      log.warn(s"TableCatalog: table '$table' exists as "
        + s"${present.mkString(", ")}; reading ${present.head} "
        + s"(shadows ${present.tail.mkString(", ")})")
    present.headOption
      .map {
        case "dir" => (s"$baseDir/$table", "dir")
        case f => (s"$baseDir/$table.$f", f)
      }
      .getOrElse(throw new IllegalArgumentException(
        s"TableCatalog: no table '$table' under $baseDir "
          + s"(tried ${Formats.mkString("/")} files and a directory)"))
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(classOf[TableCatalog])

  /** The storage format [[read]] will choose for `table` — exposed so
    * callers can audit format shadowing programmatically. */
  def resolvedFormat(table: String): String = resolve(table)._2

  /** Read a named table in whichever supported format it is stored —
    * parquet and ORC scan with native pushdown; JSON/CSV infer schema
    * here (an extra pass: at production scale prefer
    * [[readWithSchema]], which plans ONE scan with the given schema and
    * keeps the text formats streaming-friendly). */
  def read(table: String): DataFrame = {
    val (path, fmt) = resolve(table)
    fmt match {
      case "parquet" | "dir" => spark.read.parquet(path)
      case "orc" => spark.read.orc(path)
      case "json" => spark.read.json(path)
      case "csv" => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    }
  }

  /** Schema-explicit read — no inference scan for the text formats. */
  def readWithSchema(table: String, schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val (path, fmt) = resolve(table)
    fmt match {
      case "parquet" | "dir" => spark.read.schema(schema).parquet(path)
      case "orc" => spark.read.schema(schema).orc(path)
      case "json" => spark.read.schema(schema).json(path)
      case "csv" => spark.read.option("header", "true").schema(schema).csv(path)
    }
  }

  /** Read a table as a node source under a spec: prune to the spec's
    * columns (model-driven pruning) and tag provenance with the table
    * name for routing. */
  def readForNode(table: String, spec: NodeSpec): DataFrame = {
    val df = read(table).withColumn(GraphOps.SrcCol,
      org.apache.spark.sql.functions.lit(table))
    GraphOps.pruneFor(df, spec.neededColumns)
  }

  def readForEdge(table: String, spec: EdgeSpec): DataFrame = {
    val df = read(table).withColumn(GraphOps.SrcCol,
      org.apache.spark.sql.functions.lit(table))
    GraphOps.pruneFor(df, spec.neededColumns)
  }

  /** Scan-parallelism probe (≙ the reference's stream count, capped at
    * 1000 streams/table): how many splits the FileScan would plan,
    * estimated from the file index (`Par.fileSplitEstimate` — no
    * driver-side physical planning of the frame), capped at the
    * reference's 1000-stream ceiling. Every catalog format is
    * file-backed, so the estimate always resolves; the parallelism
    * floor is 1 split. */
  def planScan(table: String): Int =
    graft.ops.Par.fileSplitEstimate(read(table))
      .getOrElse(spark.sparkContext.defaultParallelism.toLong)
      .min(1000L).toInt
}
