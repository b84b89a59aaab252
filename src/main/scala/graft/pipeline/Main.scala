package graft.pipeline

import graft.model.GraphModel
import graft.sink.{FlightConfig, GdsSink, ParquetWireSink}
import org.apache.spark.sql.SparkSession

/**
 * CLI entry point — the Spark rendering of the reference's
 * `python pipeline.py` argument surface (pipeline.py:185-291):
 *
 *   --graph_json <path>        model JSON (local path; ≤64 KiB like the
 *                              reference's GCS read cap)
 *   --node_pattern <globs>     comma-separated parquet globs (≙ --gcs_node_pattern)
 *   --edge_pattern <globs>     comma-separated parquet globs (≙ --gcs_edge_pattern)
 *   --sink parquet:<dir>       wire-schema parquet sink (default)
 *   --sink arrow:<dir>         Arrow IPC stream files (the do_put payload)
 *   --sink flight:<host>:<port>  live GDS Arrow Flight (config accepted;
 *                              data plane requires the arrow-flight jars,
 *                              absent in this sandbox — fails with guidance)
 *   --neo4j_graph / --neo4j_database / --neo4j_user   (≙ reference flags)
 *   --master <spark master>    default local[*]
 *
 * Example:
 *   runMain graft.pipeline.Main --graph_json model.json \
 *     --node_pattern '/data/customer.parquet' \
 *     --edge_pattern '/data/orders.parquet' --sink parquet:/tmp/out
 */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    def req(k: String): String = opts.getOrElse(k,
      sys.error(s"missing required flag --$k"))

    val model = GraphModel.fromPath(req("graph_json"))
    val nodePatterns = req("node_pattern").split(',').toSeq.map(_.trim)
    val edgePatterns = opts.get("edge_pattern").toSeq
      .flatMap(_.split(',').toSeq.map(_.trim))

    val spark = SparkSession.builder()
      .master(opts.getOrElse("master", "local[*]"))
      .appName(s"graft-${model.name}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sink: GdsSink = opts.getOrElse("sink", "parquet:/tmp/graft_out") match {
      case s if s.startsWith("parquet:") => new ParquetWireSink(s.stripPrefix("parquet:"))
      case s if s.startsWith("arrow:") =>
        new graft.sink.ArrowIpcSink(s.stripPrefix("arrow:"))
      case s if s.startsWith("flight:") =>
        val hp = s.stripPrefix("flight:").split(':')
        val cfg = FlightConfig(host = hp(0),
          port = if (hp.length > 1) hp(1).toInt else 8491,
          graphName = opts.getOrElse("neo4j_graph", model.name),
          database = opts.getOrElse("neo4j_database", model.db),
          user = opts.getOrElse("neo4j_user", "neo4j"))
        sys.error(s"flight sink configured ($cfg) but the Arrow Flight data " +
          "plane is not on this classpath; use the parquet wire sink or add " +
          "the arrow-flight jars on a real cluster")
      case other => sys.error(s"unknown sink '$other'")
    }

    val res = GraphProjection.run(spark, model, nodePatterns, edgePatterns, sink)
    // P6 Echo: the reference logs each combined stat (pipeline.py:70,85,94)
    res.nodeStats.foreach(r => println(s"[graft] node stats: $r"))
    res.edgeStats.foreach(r => println(s"[graft] edge stats: $r"))
    println(s"[graft] final: ${res.finalStats}")
    spark.stop()
  }

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
}
