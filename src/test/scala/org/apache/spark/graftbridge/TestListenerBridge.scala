package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only shim: `SparkContext.listenerBus` is `private[spark]`, and
  * job-counting specs must drain it before reading their counters
  * (listener delivery is asynchronous).
  */
object TestListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
