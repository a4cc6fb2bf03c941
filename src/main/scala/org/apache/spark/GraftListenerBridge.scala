package org.apache.spark

/** Bridge to the private[spark] listener bus drain: task-metrics
  * listeners receive events asynchronously, so measurement tools that
  * reset-then-read an accumulating listener between runs must drain the
  * bus at the boundary or attribute one run's tail events to the next
  * (see graft.Scale). `waitUntilEmpty` is the exact synchronization
  * Spark's own test harness uses. */
object GraftListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
