package org.apache.arrow.flight;

import java.util.Arrays;
import java.util.List;

/**
 * Test-scope stub of flight-core's {@code FlightDescriptor}. The varargs
 * static factory compiles to {@code path(String[])} — exactly the
 * signature {@code LiveFlightTransport} resolves reflectively.
 */
public class FlightDescriptor {
  private final List<String> path;

  private FlightDescriptor(List<String> path) {
    this.path = path;
  }

  public static FlightDescriptor path(String... path) {
    return new FlightDescriptor(Arrays.asList(path));
  }

  public List<String> getPath() {
    return path;
  }

  @Override
  public String toString() {
    return "FlightDescriptor{path=" + path + "}";
  }
}
