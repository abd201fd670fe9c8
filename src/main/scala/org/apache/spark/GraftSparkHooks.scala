package org.apache.spark

/** Narrow bridge to two `private[spark]` members Bench's per-key byte
  * telemetry needs (r14 verdict #2: per-key shuffle/spill BYTE floors
  * beside the wall floors — bytes are deterministic for a fixed plan
  * and immune to ambient load, so a byte diff adjudicates what a wall
  * diff on a shared box cannot).
  *
  * Why a bridge at all: task-end events (the only place TaskMetrics
  * byte counters surface driver-side) arrive on the async listener
  * bus, so a per-key snapshot taken right after an action returns can
  * miss the final tasks' bytes. `LiveListenerBus.waitUntilEmpty()` is
  * the exact drain primitive — Spark's own test harness uses it for
  * the same purpose — but it is `private[spark]`; this one-file
  * package-escape keeps the rest of the repo out of Spark's internals.
  */
object GraftSparkHooks {
  /** Block until every queued listener event has been delivered. */
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
