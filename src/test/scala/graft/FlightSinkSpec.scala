package graft

import java.util.concurrent.ConcurrentLinkedQueue

import graft.model.{EdgeSpec, GraphModel, NodeSpec}
import graft.pipeline.GraphProjection
import graft.sink.{FlightConfig, FlightSink, FlightTransport}

import scala.jdk.CollectionConverters._

/** In-JVM transport double: records every Flight verb in arrival order
  * (a ConcurrentLinkedQueue linearizes concurrent partition puts). */
class RecordingFlightTransport extends FlightTransport {
  override def action(name: String, bodyJson: String): Unit =
    RecordingFlightTransport.events.add(s"action:$name")
  override def putStream(descriptor: String, ipcStream: Array[Byte]): Unit = {
    require(ipcStream.length > 0, "empty IPC payload")
    // every payload must be a self-contained Arrow IPC stream: read it back
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val rdr = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(ipcStream), alloc)
    var rows = 0L
    try {
      while (rdr.loadNextBatch()) rows += rdr.getVectorSchemaRoot.getRowCount
    } finally { rdr.close(); alloc.close() }
    RecordingFlightTransport.events.add(s"put:$descriptor")
    RecordingFlightTransport.bytes.addAndGet(ipcStream.length.toLong)
    RecordingFlightTransport.rows.addAndGet(rows)
  }
}

object RecordingFlightTransport {
  val events = new ConcurrentLinkedQueue[String]()
  val bytes = new java.util.concurrent.atomic.AtomicLong()
  val rows = new java.util.concurrent.atomic.AtomicLong()
  def reset(): Unit = { events.clear(); bytes.set(0); rows.set(0) }
}

class FlightSinkSpec extends SparkTestBase {

  private def model = GraphModel(
    name = "fl",
    nodes = Seq(NodeSpec(".*customer.*", keyField = Some("c_custkey"),
      properties = Map("c_acctbal" -> "acctbal"))),
    edges = Seq(EdgeSpec(".*orders.*", sourceField = Some("o_custkey"),
      targetField = Some("o_orderkey"))))

  test("flight sink drives the reference lifecycle in order") {
    RecordingFlightTransport.reset()
    FlightTransport.resetCacheForTests()
    val cfg = FlightConfig(host = "test", graphName = "fl", database = "neo4j")
    val sink = new FlightSink(cfg, _ => new RecordingFlightTransport, batchSize = 256)
    val res = GraphProjection.run(spark, model,
      Seq(s"${sf()}/customer.parquet"), Seq(s"${sf()}/orders.parquet"), sink)

    val ev = RecordingFlightTransport.events.asScala.toSeq
    // start → put(nodes)* → NODE_LOAD_DONE → put(edges)* → RELATIONSHIP_LOAD_DONE
    assert(ev.head == "action:CREATE_GRAPH")
    assert(ev.last == "action:RELATIONSHIP_LOAD_DONE")
    val nodeDone = ev.indexOf("action:NODE_LOAD_DONE")
    assert(nodeDone > 0)
    val (before, after) = ev.zipWithIndex.partition(_._2 < nodeDone)
    assert(before.map(_._1).count(_ == "put:nodes") > 0)
    assert(before.map(_._1).forall(e => e == "action:CREATE_GRAPH" || e == "put:nodes"))
    assert(after.map(_._1).count(_ == "put:edges") > 0)
    assert(after.map(_._1).forall(e =>
      e == "action:NODE_LOAD_DONE" || e == "put:edges" || e == "action:RELATIONSHIP_LOAD_DONE"))

    // stats: counts match the source tables; bytes match what the transport saw
    val nCust = spark.read.parquet(s"${sf()}/customer.parquet").count()
    val nOrd = spark.read.parquet(s"${sf()}/orders.parquet").count()
    assert(res.finalStats.count == nCust + nOrd)
    assert(RecordingFlightTransport.rows.get() == nCust + nOrd) // IPC decodes row-exact
    assert(res.finalStats.nbytes == RecordingFlightTransport.bytes.get())
    assert(res.finalStats.nbytes > 0)
  }

  test("flight sink enforces the nodes-before-edges barrier") {
    RecordingFlightTransport.reset()
    FlightTransport.resetCacheForTests()
    val sink = new FlightSink(FlightConfig(host = "test2"),
      _ => new RecordingFlightTransport)
    val nodes = spark.read.parquet(s"${sf()}/customer.parquet")
      .selectExpr("c_custkey AS nodeId")
    intercept[IllegalArgumentException](sink.writeNodes(nodes)) // before start
    sink.start()
    intercept[IllegalArgumentException](sink.writeEdges(nodes)) // before nodesDone
    sink.writeNodes(nodes)
    sink.nodesDone()
    sink.writeEdges(nodes.selectExpr("nodeId AS sourceNodeId", "nodeId AS targetNodeId"))
    sink.edgesDone()
  }

  // ---- live reflective binding, driven against the test-scope stub of
  // org.apache.arrow.flight (src/test/java — exact flight-core public
  // signatures). This executes the code paths that production flight-core
  // would: Location.forGrpc*, FlightClient.builder/build/authenticateBasic,
  // doAction(Action, CallOption...), startPut(desc, root, listener,
  // CallOption...) → putNext/completed on a PACKAGE-PRIVATE stream (the
  // real gRPC listeners are too — proves interfaceMethod's public-interface
  // walk), AsyncPutListener.getResult blocking on onCompleted.

  private def stubClients = org.apache.arrow.flight.FlightClient.CLIENTS.asScala

  test("live transport constructs, authenticates and fires actions via the flight surface") {
    org.apache.arrow.flight.FlightClient.resetForTest()
    FlightTransport.resetCacheForTests()
    assert(graft.sink.LiveFlightTransport.available) // stub on test classpath
    val t = FlightTransport.live(
      FlightConfig(host = "stubhost", port = 9009, useTls = false,
        user = "neo4j", password = "s3cret"))
    assert(stubClients.size == 1)
    val c = stubClients.head
    assert(c.location.getUri.toString == "grpc+tcp://stubhost:9009")
    assert(c.authUser == "neo4j" && c.authPassword == "s3cret")

    t.action("CREATE_GRAPH", """{"name":"g1","database_name":"neo4j","concurrency":4}""")
    t.action("NODE_LOAD_DONE", "{}")
    val acts = c.actions.asScala.map(a => (a(0), a(1))).toSeq
    assert(acts == Seq(
      ("CREATE_GRAPH", """{"name":"g1","database_name":"neo4j","concurrency":4}"""),
      ("NODE_LOAD_DONE", "{}")))

    // TLS factory variant resolves the other static Location method
    val t2 = FlightTransport.live(FlightConfig(host = "tlshost", port = 9010,
      useTls = true, password = ""))
    assert(stubClients.size == 2)
    assert(stubClients(1).location.getUri.toString == "grpc+tls://tlshost:9010")
    assert(stubClients(1).authUser == null) // empty password skips authenticateBasic
    (t, t2)
  }

  test("live transport putStream decodes IPC payloads into startPut/putNext/completed") {
    org.apache.arrow.flight.FlightClient.resetForTest()
    FlightTransport.resetCacheForTests()
    val t = FlightTransport.live(FlightConfig(host = "puthost", port = 9011, useTls = false))
    val c = stubClients.head

    FlightSinkSpec.payloads.clear()
    val df = spark.read.parquet(s"${sf()}/customer.parquet")
      .selectExpr("c_custkey AS nodeId", "c_acctbal AS acctbal")
    val (rows, _) = org.apache.spark.sql.GraftArrow.sendIpcStream(df, batchSize = 64) {
      (_, ipc) => FlightSinkSpec.payloads.add(ipc); ()
    }
    FlightSinkSpec.payloads.asScala.foreach(ipc => t.putStream("nodes", ipc))

    val puts = c.puts.asScala
    assert(puts.size == FlightSinkSpec.payloads.size()) // one startPut per payload
    assert(puts.forall(_.descriptor.getPath.asScala.toSeq == Seq("nodes")))
    assert(puts.forall(_.schemaFieldCount == 2))
    assert(puts.forall(_.completed)) // completed() reached getResult on every stream
    assert(puts.forall(_.batches >= 1))
    assert(puts.map(_.rows).sum == rows) // stub read counts live from the root

    // per-stream verb order: startPut before first putNext before completed
    val log = org.apache.arrow.flight.FlightClient.LOG.asScala.toSeq
    assert(log.indexOf("startPut:nodes") >= 0)
    assert(log.indexOf("startPut:nodes") < log.indexWhere(_.startsWith("putNext:nodes")))
    assert(log.indexWhere(_.startsWith("putNext:nodes")) < log.indexOf("completed:nodes"))
  }

  test("flight sink runs the full graph lifecycle through the live binding") {
    org.apache.arrow.flight.FlightClient.resetForTest()
    FlightTransport.resetCacheForTests()
    val cfg = FlightConfig(host = "lifehost", port = 9012, useTls = false,
      graphName = "fl", database = "neo4j", password = "pw")
    val sink = new FlightSink(cfg, FlightTransport.live, batchSize = 256)
    val res = GraphProjection.run(spark, model,
      Seq(s"${sf()}/customer.parquet"), Seq(s"${sf()}/orders.parquet"), sink)

    val log = org.apache.arrow.flight.FlightClient.LOG.asScala.toSeq
    // control plane bracket in program order, data plane inside it
    val created = log.indexOf("action:CREATE_GRAPH")
    val nodesDone = log.indexOf("action:NODE_LOAD_DONE")
    val edgesDone = log.indexOf("action:RELATIONSHIP_LOAD_DONE")
    assert(created >= 0 && created < nodesDone && nodesDone < edgesDone)
    val nodePuts = log.zipWithIndex.filter(_._1.startsWith("putNext:nodes"))
    val edgePuts = log.zipWithIndex.filter(_._1.startsWith("putNext:edges"))
    assert(nodePuts.nonEmpty && edgePuts.nonEmpty)
    assert(nodePuts.map(_._2).max < nodesDone) // every node batch before the barrier
    assert(edgePuts.map(_._2).forall(i => i > nodesDone && i < edgesDone))

    // rows that crossed the stub wire match the sources exactly
    val nCust = spark.read.parquet(s"${sf()}/customer.parquet").count()
    val nOrd = spark.read.parquet(s"${sf()}/orders.parquet").count()
    val allPuts = stubClients.flatMap(_.puts.asScala)
    assert(allPuts.filter(_.descriptor.getPath.asScala.toSeq == Seq("nodes"))
      .map(_.rows).sum == nCust)
    assert(allPuts.filter(_.descriptor.getPath.asScala.toSeq == Seq("edges"))
      .map(_.rows).sum == nOrd)
    assert(allPuts.forall(_.completed))
    assert(res.finalStats.count == nCust + nOrd)
  }

  test("live transport batch decode: GraftArrow payloads round-trip batch-by-batch") {
    // the exact decode loop putStream drives between startPut/putNext —
    // unit-tested here without flight-core on the classpath
    FlightSinkSpec.payloads.clear()
    val payloads = FlightSinkSpec.payloads // static: survives closure serialization
    val df = spark.read.parquet(s"${sf()}/customer.parquet")
      .selectExpr("c_custkey AS nodeId", "c_acctbal AS acctbal")
    val (rows, _) = org.apache.spark.sql.GraftArrow.sendIpcStream(df, batchSize = 64) {
      (_, ipc) => FlightSinkSpec.payloads.add(ipc); ()
    }
    assert(rows == df.count())
    val alloc = new org.apache.arrow.memory.RootAllocator()
    var decoded = 0L
    var batches = 0L
    try payloads.asScala.foreach { ipc =>
      graft.sink.LiveFlightTransport.streamBatches(ipc, alloc) { root =>
        assert(root.getSchema.getFields.size() == 2) // schema visible at begin
        root
      } { root => batches += 1; decoded += root.getRowCount }
    } finally alloc.close()
    assert(decoded == rows)
    assert(batches >= payloads.size()) // >= 1 batch per payload
  }

  test("CREATE_GRAPH action body is valid JSON even for hostile names") {
    RecordingFlightTransport.reset()
    FlightTransport.resetCacheForTests()
    var body: String = null
    val sink = new FlightSink(
      FlightConfig(host = "t3", graphName = "g\"}\\evil\n", database = "db"),
      _ => new RecordingFlightTransport {
        override def action(name: String, bodyJson: String): Unit = { body = bodyJson }
      })
    sink.start()
    // must parse as JSON and preserve the name exactly
    val parsed = spark.read.json(
      spark.createDataset(Seq(body))(org.apache.spark.sql.Encoders.STRING))
    val row = parsed.select("name", "database_name", "concurrency").head()
    assert(row.getString(0) == "g\"}\\evil\n")
    assert(row.getString(1) == "db")
    assert(row.getLong(2) == 4L)
  }
}

object FlightSinkSpec {
  val payloads = new ConcurrentLinkedQueue[Array[Byte]]()
}
