package graft.sink

import graft.ops.LoadResult
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Offline stand-in for the Arrow Flight sink: writes the exact canonical
 * wire-schema tables (`nodeId`/`labels`/props, `sourceNodeId`/
 * `targetNodeId`/`relationshipType`/props) the Flight client would stream,
 * as parquet under `outDir/nodes` and `outDir/edges`, and returns the same
 * load stats the reference's WriteNodes/WriteEdges DoFns produce
 * (_dofn.py:96-141: per-batch (rows, nbytes) → Neo4jResult).
 *
 * nbytes here is the in-flight columnar payload size: sum over rows of the
 * fixed-width column sizes + string/array byte lengths — a deterministic,
 * distributable estimate of the Arrow IPC body size (computed with
 * codegen'd built-ins, no UDF).
 */
final class ParquetWireSink(outDir: String) extends GdsSink {
  private var started = false
  private var nodesFinished = false

  override def start(): Unit = { started = true }

  override def writeNodes(nodes: DataFrame): LoadResult = {
    require(started, "sink not started (reference: client.start() precedes writes)")
    write(nodes, s"$outDir/nodes", "node")
  }

  override def nodesDone(): Unit = { nodesFinished = true }

  override def writeEdges(edges: DataFrame): LoadResult = {
    require(nodesFinished,
      "edges before nodesDone() — the reference enforces all nodes load first " +
        "(pipeline.py:68-77 barrier)")
    write(edges, s"$outDir/edges", "edge")
  }

  override def edgesDone(): Unit = ()

  private def write(df: DataFrame, path: String, kind: String): LoadResult = {
    // Stats ride along with the write job via Observation (an accumulator
    // collected by a QueryExecutionListener) — ONE pass over the data, no
    // second scan; this is how you'd account load stats at 100 TB too.
    val obs = org.apache.spark.sql.Observation(s"graft_sink_$kind")
    val sized = df.withColumn("__nbytes", ParquetWireSink.rowBytes(df))
      .observe(obs,
        count(lit(1)).as("count"),
        coalesce(sum(col("__nbytes")), lit(0L)).as("nbytes"))
    sized.drop("__nbytes").write.mode("overwrite").parquet(path)
    val m = obs.get
    LoadResult(m("count").asInstanceOf[Long], m("nbytes").asInstanceOf[Long], kind)
  }
}

object ParquetWireSink {
  /** Per-row wire-size estimate from the schema — fixed widths for numeric
    * types, data lengths for strings/binary/arrays. Pure built-ins. */
  def rowBytes(df: DataFrame): org.apache.spark.sql.Column = {
    val parts = df.schema.fields.map { f =>
      f.dataType match {
        case LongType | DoubleType | TimestampType => lit(8L)
        case IntegerType | FloatType | DateType    => lit(4L)
        case ShortType                             => lit(2L)
        case BooleanType | ByteType                => lit(1L)
        case StringType => coalesce(octet_length(col(f.name)).cast(LongType), lit(0L))
        case BinaryType => coalesce(length(col(f.name)).cast(LongType), lit(0L))
        case ArrayType(et, _) =>
          val width = et match {
            case DoubleType | LongType => 8L
            case FloatType | IntegerType => 4L
            case _ => 8L
          }
          coalesce(size(col(f.name)).cast(LongType) * width, lit(0L))
        case _ => lit(8L)
      }
    }
    parts.reduceOption(_ + _).getOrElse(lit(0L))
  }
}
