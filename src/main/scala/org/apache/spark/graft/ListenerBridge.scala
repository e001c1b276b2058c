package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` listener-bus internals (same pattern as
  * [[org.apache.spark.sql.graft.ColumnBridge]]): benchmark
  * instrumentation needs to drain the async listener queue so per-query
  * shuffle-metric deltas attribute task events to the query that ran
  * them, not to whichever query snapshots next. */
object ListenerBridge {
  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
