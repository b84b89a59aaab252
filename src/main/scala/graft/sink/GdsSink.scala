package graft.sink

import graft.ops.LoadResult
import org.apache.spark.sql.DataFrame

/**
 * Destination for projected graph data, with the reference client's
 * lifecycle (K1-K4, SURVEY.md §2.6):
 *
 *   start() → writeNodes()* → nodesDone() → writeEdges()* → edgesDone()
 *
 * The reference streams canonical-schema Arrow batches to Neo4j GDS over
 * Arrow Flight (`Neo4jArrowClient`: start ≙ CREATE_GRAPH, write_nodes /
 * write_edges ≙ do_put, nodes_done ≙ NODE_LOAD_DONE, edges_done ≙
 * RELATIONSHIP_LOAD_DONE — pipeline.py:56,304-308; _dofn.py:96-141).
 *
 * Spark-first difference: the reference encodes the nodes-before-edges
 * barrier in the DATAFLOW GRAPH (a Signal DoFn re-emits the edge source
 * list as data, pipeline.py:68-77). In Spark each write is a synchronous
 * job, so the barrier is just sequential driver code — strictly simpler
 * and the phases are still fully parallel internally.
 */
trait GdsSink {
  def start(): Unit
  /** Write one canonical node DataFrame; returns (rows, wire bytes). */
  def writeNodes(nodes: DataFrame): LoadResult
  def nodesDone(): Unit
  def writeEdges(edges: DataFrame): LoadResult
  def edgesDone(): Unit
}

/**
 * Connection config for a live GDS Arrow Flight endpoint — mirrors the
 * reference's client ctor args (pipeline.py:304-308) and flag defaults
 * (port 8491 / TLS on / concurrency 4, pipeline.py:208-234).
 *
 * The full sink (lifecycle + distributed per-batch IPC data plane) is
 * `FlightSink`; only the innermost gRPC binding (`FlightTransport.live`)
 * requires the arrow-flight jars, which are absent on this sandbox's
 * classpath (no egress). `ParquetWireSink` / `ArrowIpcSink` produce
 * byte-identical canonical payloads and are the offline-tested paths.
 */
final case class FlightConfig(
    host: String,
    port: Int = 8491,
    useTls: Boolean = true,
    graphName: String = "graph",
    database: String = "neo4j",
    user: String = "neo4j",
    password: String = "",
    concurrency: Int = 4)
