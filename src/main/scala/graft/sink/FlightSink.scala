package graft.sink

import graft.ops.LoadResult
import org.apache.spark.sql.DataFrame

/**
 * The Arrow Flight verbs the reference's sink uses, as a minimal
 * transport abstraction (call sites: `client.start()` ≙ the CREATE_GRAPH
 * action, pipeline.py:56; `write_nodes`/`write_edges` ≙ `do_put` of
 * Arrow record batches, _dofn.py:96-141; `nodes_done`/`edges_done` ≙
 * the NODE_LOAD_DONE / RELATIONSHIP_LOAD_DONE actions, _dofn.py:50-77 —
 * action/stream names [inferred from the neo4j_arrow client call sites;
 * the package itself is not vendored in the reference]).
 *
 * Implementations must be cheap to construct and are cached per executor
 * JVM (`FlightTransport.cached`) — the Spark answer to the reference's
 * `client.copy()` pickling workaround (_dofn.py:58,101,125): the factory
 * closure ships to executors, the live connection never does.
 */
trait FlightTransport {
  /** Fire a Flight action (control plane), e.g. CREATE_GRAPH. */
  def action(name: String, bodyJson: String): Unit
  /** Ship one Arrow IPC stream for `descriptor` (data plane do_put). */
  def putStream(descriptor: String, ipcStream: Array[Byte]): Unit
}

object FlightTransport {
  /** Factory closures serialize into write tasks; transports do not. */
  type Factory = FlightConfig => FlightTransport

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[FlightConfig, FlightTransport]()

  /** Per-executor transport: connect once per (JVM, config), reuse across
    * partitions and phases. */
  def cached(cfg: FlightConfig, factory: Factory): FlightTransport =
    cache.computeIfAbsent(cfg, c => factory(c))

  private[graft] def resetCacheForTests(): Unit = cache.clear()

  /** Live-endpoint factory: a reflection-bound FlightClient
    * (`LiveFlightTransport`) when org.apache.arrow:flight-core is on the
    * runtime classpath, a guidance failure when it is not (this sandbox —
    * no egress, jars can't be vendored). The jars stay optional at
    * COMPILE time either way; every byte the live path ships is already
    * produced (and round-trip tested) by GraftArrow's IPC stream writer. */
  val live: Factory = cfg => {
    if (!LiveFlightTransport.available)
      throw new UnsupportedOperationException(
        s"flight transport to ${cfg.host}:${cfg.port} needs " +
          "org.apache.arrow:flight-core on the classpath (absent in this " +
          "build); the parquet/arrow sinks produce the identical wire payload")
    val t = new LiveFlightTransport(cfg)
    // executor JVMs give no per-transport close callback; release the
    // gRPC channel + allocator with the JVM
    Runtime.getRuntime.addShutdownHook(new Thread(() => t.close()))
    t
  }
}

/**
 * Live GDS sink over Arrow Flight: the reference's actual destination
 * (`Neo4jArrowClient`, pipeline.py:304-308), with the same lifecycle and
 * ordering contract as the offline sinks:
 *
 *   start (CREATE_GRAPH) → do_put(nodes)* → NODE_LOAD_DONE →
 *   do_put(edges)* → RELATIONSHIP_LOAD_DONE
 *
 * Data plane: each partition's rows stream as per-batch Arrow IPC
 * payloads (GraftArrow.sendIpcStream) to a per-executor cached transport
 * — fully distributed, executor memory bounded by `batchSize`, exact
 * wire-byte stats via accumulators. Control plane actions run
 * driver-side between the synchronous write jobs, which is what makes
 * the nodes-before-edges barrier program order rather than a dataflow
 * trick (pipeline.py:68-77).
 */
final class FlightSink(
    cfg: FlightConfig,
    factory: FlightTransport.Factory = FlightTransport.live,
    batchSize: Int = 4096) extends GdsSink {

  private var started = false
  private var nodesFinished = false
  @transient private lazy val control: FlightTransport = factory(cfg)

  override def start(): Unit = {
    control.action("CREATE_GRAPH",
      s"""{"name":${FlightSink.jsonStr(cfg.graphName)},""" +
        s""""database_name":${FlightSink.jsonStr(cfg.database)},""" +
        s""""concurrency":${cfg.concurrency}}""")
    started = true
  }

  override def writeNodes(nodes: DataFrame): LoadResult = {
    require(started, "sink not started (reference: client.start() precedes writes)")
    put(nodes, "nodes", "node")
  }

  override def nodesDone(): Unit = {
    require(started, "nodesDone() before start()")
    control.action("NODE_LOAD_DONE", "{}")
    nodesFinished = true
  }

  override def writeEdges(edges: DataFrame): LoadResult = {
    require(nodesFinished,
      "edges before nodesDone() — the reference enforces all nodes load first " +
        "(pipeline.py:68-77 barrier)")
    put(edges, "edges", "edge")
  }

  override def edgesDone(): Unit = {
    require(nodesFinished, "edgesDone() before nodesDone()")
    control.action("RELATIONSHIP_LOAD_DONE", "{}")
  }

  private def put(df: DataFrame, descriptor: String, kind: String): LoadResult = {
    val (c, f) = (cfg, factory) // close over the pieces, not the sink
    val (rows, bytes) = org.apache.spark.sql.GraftArrow.sendIpcStream(df, batchSize) {
      (_, ipc) => FlightTransport.cached(c, f).putStream(descriptor, ipc)
    }
    LoadResult(rows, bytes, kind)
  }
}

object FlightSink {
  /** Quote a string as a JSON literal (escapes quotes, backslashes and
    * control chars) — graph/database names are user input and must not
    * be able to break the action payload. */
  private[sink] def jsonStr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }
}
