package graft.sink

import java.io.ByteArrayInputStream
import java.lang.reflect.Method

import org.apache.arrow.memory.{BufferAllocator, RootAllocator}
import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.ArrowStreamReader

/**
 * Live Arrow Flight binding for `FlightTransport`, wrapping
 * `org.apache.arrow.flight.FlightClient` REFLECTIVELY so flight-core
 * stays an optional runtime dependency: this build compiles and all
 * other sinks run without the jars; put them on the classpath and
 * `--sink flight:` works (the reference's deployment,
 * pipeline.py:304-308 client ctor; _dofn.py:96-141 do_put).
 *
 * Verb mapping (same call sites as the trait doc):
 *  - `action(name, body)`   → `client.doAction(new Action(name, bytes))`,
 *    result iterator drained (the server acks CREATE_GRAPH /
 *    NODE_LOAD_DONE / RELATIONSHIP_LOAD_DONE with a summary payload).
 *  - `putStream(desc, ipc)` → `client.startPut(FlightDescriptor.path(desc),
 *    root, listener)` + one `putNext()` per batch decoded from the IPC
 *    payload + `completed()` + `listener.getResult()` (block for the
 *    server ack — at-least-once, like the reference DoFn).
 *
 * Only the flight classes are reflective; the IPC decode uses
 * arrow-vector directly (always on a Spark classpath). The payload
 * arrives as a self-contained IPC stream from `GraftArrow.sendIpcStream`
 * — decoding it back into a VectorSchemaRoot costs one in-memory pass
 * and keeps the transport contract a plain `Array[Byte]`, which is what
 * makes every other binding (recording double, filesystem sinks)
 * byte-identical to the live path.
 *
 * Lifecycle: constructed per (executor JVM, config) via
 * `FlightTransport.cached`, closed with the JVM (a shutdown hook —
 * executors give no other reliable callback).
 */
final class LiveFlightTransport(cfg: FlightConfig) extends FlightTransport with AutoCloseable {
  import LiveFlightTransport._

  private val allocator: BufferAllocator =
    new RootAllocator().newChildAllocator(s"flight-${cfg.host}:${cfg.port}", 0, Long.MaxValue)

  private val client: AnyRef = {
    val location =
      if (cfg.useTls) invokeStatic(locationCls, "forGrpcTls", classOf[String] -> cfg.host,
        classOf[Int] -> Int.box(cfg.port))
      else invokeStatic(locationCls, "forGrpcInsecure", classOf[String] -> cfg.host,
        classOf[Int] -> Int.box(cfg.port))
    val builder = method(clientCls, "builder", classOf[BufferAllocator], locationCls)
      .invoke(null, allocator, location)
    val c = method(builder.getClass, "build").invoke(builder)
    if (cfg.password.nonEmpty)
      method(clientCls, "authenticateBasic", classOf[String], classOf[String])
        .invoke(c, cfg.user, cfg.password)
    c
  }

  override def action(name: String, bodyJson: String): Unit = {
    val act = actionCls.getConstructor(classOf[String], classOf[Array[Byte]])
      .newInstance(name, bodyJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .asInstanceOf[AnyRef]
    val results = method(clientCls, "doAction", actionCls, callOptionArrayCls)
      .invoke(client, act, emptyCallOptions)
      .asInstanceOf[java.util.Iterator[_]]
    while (results.hasNext) results.next() // drain = wait for the server ack
  }

  override def putStream(descriptor: String, ipcStream: Array[Byte]): Unit = {
    // NB: the String[] must reach invoke() as ONE argument element —
    // typing it AnyRef stops any varargs spreading of the array itself.
    val desc = method(descriptorCls, "path", classOf[Array[String]])
      .invoke(null, Array(descriptor): AnyRef)
    val listener = asyncPutListenerCls.getConstructor().newInstance().asInstanceOf[AnyRef]
    val startPut = method(clientCls, "startPut",
      descriptorCls, classOf[VectorSchemaRoot], putListenerCls, callOptionArrayCls)
    val stream = streamBatches(ipcStream, allocator) { root =>
      startPut.invoke(client, desc, root, listener, emptyCallOptions)
    } { s => interfaceMethod(s, "putNext").invoke(s) }
    interfaceMethod(stream, "completed").invoke(stream)
    interfaceMethod(listener, "getResult").invoke(listener) // block for ack
  }

  override def close(): Unit = {
    method(clientCls, "close").invoke(client)
    allocator.close()
  }
}

object LiveFlightTransport {

  /** True iff org.apache.arrow:flight-core is on the runtime classpath. */
  def available: Boolean =
    try { Class.forName("org.apache.arrow.flight.FlightClient"); true }
    catch { case _: ClassNotFoundException => false }

  /** Decode a self-contained Arrow IPC stream payload batch-by-batch:
    * `begin` sees the (empty) schema root once and returns a handle,
    * `next(handle)` runs after each batch is loaded into the root.
    * Factored out of `putStream` so the decode loop is unit-testable
    * without flight-core (FlightSinkSpec round-trips GraftArrow bytes
    * through it). */
  private[graft] def streamBatches[A](ipc: Array[Byte], alloc: BufferAllocator)(
      begin: VectorSchemaRoot => A)(next: A => Unit): A = {
    val rdr = new ArrowStreamReader(new ByteArrayInputStream(ipc), alloc)
    try {
      val handle = begin(rdr.getVectorSchemaRoot)
      while (rdr.loadNextBatch()) next(handle)
      handle
    } finally rdr.close()
  }

  // --- reflective surface of org.apache.arrow.flight (absent at compile time) ---
  private lazy val clientCls = Class.forName("org.apache.arrow.flight.FlightClient")
  private lazy val locationCls = Class.forName("org.apache.arrow.flight.Location")
  private lazy val actionCls = Class.forName("org.apache.arrow.flight.Action")
  private lazy val descriptorCls = Class.forName("org.apache.arrow.flight.FlightDescriptor")
  private lazy val callOptionCls = Class.forName("org.apache.arrow.flight.CallOption")
  private lazy val callOptionArrayCls =
    java.lang.reflect.Array.newInstance(callOptionCls, 0).getClass
  private lazy val putListenerCls =
    Class.forName("org.apache.arrow.flight.FlightClient$PutListener")
  private lazy val asyncPutListenerCls =
    Class.forName("org.apache.arrow.flight.AsyncPutListener")
  private lazy val emptyCallOptions: AnyRef =
    java.lang.reflect.Array.newInstance(callOptionCls, 0).asInstanceOf[AnyRef]

  private def method(c: Class[_], name: String, params: Class[_]*): Method =
    c.getMethod(name, params: _*)

  /** Resolve a no-arg method against an instance whose concrete class may
    * be package-private (gRPC stream listeners): prefer the declaring
    * public interface so `invoke` passes access checks. */
  private def interfaceMethod(obj: AnyRef, name: String): Method = {
    def search(c: Class[_]): Option[Method] =
      (c.getInterfaces.view.flatMap(i =>
        scala.util.Try(i.getMethod(name)).toOption.orElse(search(i))) ++
        Option(c.getSuperclass).flatMap(search)).headOption
    if (java.lang.reflect.Modifier.isPublic(obj.getClass.getModifiers))
      obj.getClass.getMethod(name)
    else search(obj.getClass).getOrElse(obj.getClass.getMethod(name))
  }

  private def invokeStatic(c: Class[_], name: String, args: (Class[_], AnyRef)*): AnyRef =
    c.getMethod(name, args.map(_._1): _*).invoke(null, args.map(_._2): _*)
}
