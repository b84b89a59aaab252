package org.apache.arrow.flight;

/** Test-scope stub of flight-core's {@code PutResult} (server put ack). */
public class PutResult {
  public static final PutResult EMPTY = new PutResult();

  private PutResult() {}
}
