package org.apache.arrow.flight;

/** Test-scope stub of flight-core's {@code Result} (one doAction reply). */
public class Result {
  private final byte[] body;

  public Result(byte[] body) {
    this.body = body;
  }

  public byte[] getBody() {
    return body;
  }
}
