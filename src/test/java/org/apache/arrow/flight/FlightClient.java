package org.apache.arrow.flight;

import java.nio.charset.StandardCharsets;
import java.util.ArrayList;
import java.util.Collections;
import java.util.Iterator;
import java.util.List;
import java.util.concurrent.CopyOnWriteArrayList;
import java.util.concurrent.atomic.AtomicBoolean;

import org.apache.arrow.memory.BufferAllocator;
import org.apache.arrow.vector.VectorSchemaRoot;

/**
 * Test-scope stub of flight-core's {@code FlightClient} with the exact
 * public call surface {@code graft.sink.LiveFlightTransport} binds to
 * reflectively (flight-core 12.x shapes):
 *
 * <pre>
 *   static Builder builder(BufferAllocator, Location)
 *   Builder.build() -> FlightClient
 *   void authenticateBasic(String, String)
 *   Iterator&lt;Result&gt; doAction(Action, CallOption...)
 *   ClientStreamListener startPut(FlightDescriptor, VectorSchemaRoot,
 *                                 PutListener, CallOption...)
 *   void close()
 *   interface PutListener { void getResult(); ... }          (nested)
 *   interface ClientStreamListener extends OutboundStreamListener
 * </pre>
 *
 * Every verb is RECORDED (static, JVM-wide — executor threads in
 * local-mode Spark share it) so FlightSinkSpec can assert the full
 * lifecycle: construct → authenticate → startPut → putNext (×batches) →
 * completed → getResult → doAction, with row counts read live from the caller's
 * {@code VectorSchemaRoot} at each {@code putNext()}, exactly as the real
 * gRPC stream serializes the root's current contents per call.
 */
public class FlightClient implements AutoCloseable {

  /** One recorded client per {@code build()}, in construction order. */
  public static final List<FlightClient> CLIENTS = new CopyOnWriteArrayList<>();

  /** Global verb log across all clients (linearizes concurrent puts). */
  public static final List<String> LOG = Collections.synchronizedList(new ArrayList<>());

  public static void resetForTest() {
    CLIENTS.clear();
    LOG.clear();
  }

  public final Location location;
  public final List<String[]> actions = new CopyOnWriteArrayList<>();
  public final List<PutRecord> puts = new CopyOnWriteArrayList<>();
  public volatile String authUser = null;
  public volatile String authPassword = null;
  public volatile boolean closed = false;

  private FlightClient(Location location) {
    this.location = location;
    CLIENTS.add(this);
    LOG.add("connect:" + location.getUri());
  }

  public static Builder builder(BufferAllocator allocator, Location location) {
    if (allocator == null) throw new IllegalArgumentException("null allocator");
    return new Builder(location);
  }

  public static final class Builder {
    private final Location location;

    private Builder(Location location) {
      this.location = location;
    }

    public FlightClient build() {
      return new FlightClient(location);
    }
  }

  public void authenticateBasic(String username, String password) {
    this.authUser = username;
    this.authPassword = password;
    LOG.add("auth:" + username);
  }

  public Iterator<Result> doAction(Action action, CallOption... options) {
    if (closed) throw new IllegalStateException("doAction on closed client");
    String body = new String(action.getBody(), StandardCharsets.UTF_8);
    actions.add(new String[] {action.getType(), body});
    LOG.add("action:" + action.getType());
    // one ack Result, like the GDS server's summary payload; the caller
    // must drain it (LiveFlightTransport does — that's the blocking ack)
    Result ack = new Result(("ack:" + action.getType()).getBytes(StandardCharsets.UTF_8));
    return Collections.singletonList(ack).iterator();
  }

  public ClientStreamListener startPut(
      FlightDescriptor descriptor,
      VectorSchemaRoot root,
      PutListener metadataListener,
      CallOption... options) {
    if (closed) throw new IllegalStateException("startPut on closed client");
    PutRecord rec = new PutRecord(descriptor, root.getSchema().getFields().size());
    puts.add(rec);
    LOG.add("startPut:" + String.join("/", descriptor.getPath()));
    return new RecordingStreamListener(rec, root, metadataListener, descriptor);
  }

  @Override
  public void close() {
    closed = true;
    LOG.add("close");
  }

  /** Everything one startPut stream saw. */
  public static final class PutRecord {
    public final FlightDescriptor descriptor;
    public final int schemaFieldCount;
    public volatile int batches = 0;
    public volatile long rows = 0;
    public volatile boolean completed = false;

    PutRecord(FlightDescriptor descriptor, int schemaFieldCount) {
      this.descriptor = descriptor;
      this.schemaFieldCount = schemaFieldCount;
    }
  }

  /** Nested exactly as in flight-core ({@code FlightClient$PutListener});
   * only the methods the binding touches plus the completion callbacks
   * {@code AsyncPutListener} implements. */
  public interface PutListener {
    /** Block until the server acknowledges the whole stream. */
    void getResult();

    void onNext(PutResult val);

    void onError(Throwable t);

    void onCompleted();
  }

  /** Nested exactly as in flight-core: the handle {@code startPut}
   * returns; all behavior is declared on the public interfaces. */
  public interface ClientStreamListener extends OutboundStreamListener {
    void getResult();
  }

  /** Package-private ON PURPOSE: the real gRPC stream listeners are too,
   * which is why {@code LiveFlightTransport.interfaceMethod} must resolve
   * {@code putNext}/{@code completed} via the public interface — this stub
   * would throw IllegalAccessException under a naive getClass().getMethod
   * lookup, so the spec proves the interface-walk works. */
  final class RecordingStreamListener implements ClientStreamListener {
    private final PutRecord rec;
    private final VectorSchemaRoot root;
    private final PutListener metadataListener;
    private final AtomicBoolean done = new AtomicBoolean(false);
    private final String path;

    RecordingStreamListener(
        PutRecord rec, VectorSchemaRoot root, PutListener metadataListener,
        FlightDescriptor descriptor) {
      this.rec = rec;
      this.root = root;
      this.metadataListener = metadataListener;
      this.path = String.join("/", descriptor.getPath());
    }

    @Override
    public boolean isReady() {
      return !done.get();
    }

    @Override
    public void start(VectorSchemaRoot ignored) {}

    @Override
    public void putNext() {
      if (done.get()) throw new IllegalStateException("putNext after completed");
      rec.batches += 1;
      rec.rows += root.getRowCount(); // read live, like the real serializer
      LOG.add("putNext:" + path + ":" + root.getRowCount());
    }

    @Override
    public void error(Throwable ex) {
      metadataListener.onError(ex);
    }

    @Override
    public void completed() {
      if (done.compareAndSet(false, true)) {
        rec.completed = true;
        LOG.add("completed:" + path);
        metadataListener.onNext(PutResult.EMPTY);
        metadataListener.onCompleted();
      }
    }

    @Override
    public void getResult() {
      metadataListener.getResult();
    }
  }
}
