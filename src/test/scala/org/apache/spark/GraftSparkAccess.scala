package org.apache.spark

/** Test-only bridge into `private[spark]` surface: QueryExecutionListener
  * callbacks are delivered ASYNC on the listener bus, so a plan-audit
  * sweep that registers a listener, runs a query closure, and reads the
  * captured executions must drain the bus first or it races the
  * delivery thread. `listenerBus.waitUntilEmpty()` is exactly that
  * barrier; it is package-private to org.apache.spark, hence this shim.
  */
object GraftSparkAccess {
  def flushListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
