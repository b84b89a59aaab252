package org.apache.arrow.flight;

import java.util.concurrent.CompletableFuture;

/**
 * Test-scope stub of flight-core's {@code AsyncPutListener}: the default
 * {@code FlightClient.PutListener} with a public no-arg constructor (which
 * is exactly how {@code LiveFlightTransport.putStream} instantiates it
 * reflectively). {@code getResult()} blocks until {@code onCompleted} /
 * {@code onError} — so a spec that sees it return proves the binding
 * called {@code completed()} on the stream first.
 */
public class AsyncPutListener implements FlightClient.PutListener {
  private final CompletableFuture<Void> completed = new CompletableFuture<>();

  public AsyncPutListener() {}

  @Override
  public void getResult() {
    try {
      completed.get();
    } catch (InterruptedException e) {
      Thread.currentThread().interrupt();
      throw new RuntimeException(e);
    } catch (java.util.concurrent.ExecutionException e) {
      throw new RuntimeException(e.getCause());
    }
  }

  @Override
  public void onNext(PutResult val) {}

  @Override
  public void onError(Throwable t) {
    completed.completeExceptionally(t);
  }

  @Override
  public void onCompleted() {
    completed.complete(null);
  }
}
