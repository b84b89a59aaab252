package org.apache.arrow.flight;

import java.net.URI;

/**
 * Test-scope stub of flight-core's {@code Location}: the two static
 * factories {@code LiveFlightTransport} resolves reflectively, with the
 * real signatures {@code forGrpcInsecure(String, int)} /
 * {@code forGrpcTls(String, int)}.
 */
public final class Location {
  private final URI uri;

  private Location(URI uri) {
    this.uri = uri;
  }

  public static Location forGrpcInsecure(String host, int port) {
    return new Location(URI.create("grpc+tcp://" + host + ":" + port));
  }

  public static Location forGrpcTls(String host, int port) {
    return new Location(URI.create("grpc+tls://" + host + ":" + port));
  }

  public URI getUri() {
    return uri;
  }

  @Override
  public String toString() {
    return "Location{uri=" + uri + "}";
  }
}
