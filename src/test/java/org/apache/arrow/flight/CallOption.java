package org.apache.arrow.flight;

/**
 * Test-scope stub of flight-core's {@code CallOption} (marker interface for
 * per-call gRPC options). Part of the exact-signature stub package that lets
 * {@code graft.sink.LiveFlightTransport}'s reflective binding execute under
 * {@code sbt test} without the real (unvendorable, zero-egress) flight-core
 * jars — see FlightSinkSpec "live transport drives the flight-core surface".
 */
public interface CallOption {}
