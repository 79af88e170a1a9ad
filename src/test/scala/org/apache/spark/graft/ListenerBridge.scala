package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only escape hatch (same SNIPPETS.md pattern [3] as ColumnBridge):
  * `SparkContext.listenerBus` and `LiveListenerBus.waitUntilEmpty` are
  * `private[spark]`, and specs that assert on per-task metrics must
  * drain the bus before reading what their listener collected.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
