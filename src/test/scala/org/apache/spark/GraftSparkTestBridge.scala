package org.apache.spark

/** Test-scope bridge into `private[spark]` scheduler internals: the
  * measurement tools need a DETERMINISTIC listener-bus drain before
  * reading their counters (a fixed sleep undercounted jobs/stages on a
  * loaded box — ADVICE r18). */
object GraftSparkTestBridge {
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
