package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener-bus drain — the deterministic
  * alternative to sleeping when metrics attribution must see every
  * stage-completed event a job posted before reading accumulated state
  * (same shim pattern as sql.graftshim.ColumnShim). */
object ListenerShim {
  /** Block until every event posted so far has been delivered to all
    * registered listeners (bounded by `timeoutMillis`). */
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
