package org.apache.arrow.flight;

import org.apache.arrow.vector.VectorSchemaRoot;

/**
 * Test-scope stub of flight-core's {@code OutboundStreamListener} — the
 * public interface through which {@code LiveFlightTransport.putStream}
 * drives {@code putNext()} / {@code completed()} on the (package-private)
 * stream returned by {@code startPut}. Keeping the concrete listener
 * package-private and the methods declared HERE mirrors the real library's
 * shape and is what exercises {@code interfaceMethod}'s
 * declared-on-a-public-interface lookup path.
 */
public interface OutboundStreamListener {
  boolean isReady();

  void start(VectorSchemaRoot root);

  void putNext();

  void error(Throwable ex);

  void completed();
}
