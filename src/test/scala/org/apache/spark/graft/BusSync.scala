package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge to the private[spark] listener bus: SpillSpec reads
  * task-level spill counters through a SparkListener, and listener events
  * are delivered asynchronously — asserting on the counters without
  * draining the bus first would race the delivery thread. */
object BusSync {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
