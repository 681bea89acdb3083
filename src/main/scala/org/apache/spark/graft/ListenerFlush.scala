package org.apache.spark.graft

import org.apache.spark.SparkContext

/** The one `private[spark]` doorway the bench telemetry needs: listener
  * events are delivered asynchronously, so per-query shuffle tallies are
  * only correct after the bus drains. Lives in an `org.apache.spark`
  * subpackage solely to reach `SparkContext.listenerBus` — no other
  * internals are touched. */
object ListenerFlush {
  def flush(sc: SparkContext, timeoutMillis: Long = 60000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
