package org.apache.spark

/** Test-only bridge into `private[spark]` internals: listener specs
  * need a deterministic "all events delivered" barrier instead of
  * sleeping an arbitrary interval (the bus posts asynchronously). */
object GraftTestBridge {

  /** Block until every queued listener event has been delivered (or
    * the timeout elapses — throws then, so a hang is loud). */
  def drainListeners(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
