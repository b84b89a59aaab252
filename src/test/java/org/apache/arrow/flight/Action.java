package org.apache.arrow.flight;

/**
 * Test-scope stub of flight-core's {@code Action} (an opaque RPC verb +
 * body). {@code LiveFlightTransport} constructs it reflectively via the
 * {@code (String, byte[])} constructor — the signature must match exactly.
 */
public class Action {
  private final String type;
  private final byte[] body;

  public Action(String type) {
    this(type, null);
  }

  public Action(String type, byte[] body) {
    this.type = type;
    this.body = body == null ? new byte[0] : body;
  }

  public String getType() {
    return type;
  }

  public byte[] getBody() {
    return body;
  }
}
