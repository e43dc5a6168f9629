package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `private[spark] SparkContext.listenerBus` so benchmark
  * telemetry can drain the async listener queue before reading counters —
  * without it, job/stage counts read immediately after an action can miss
  * events still in flight on the bus.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
