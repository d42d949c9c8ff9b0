// Lives under org.apache.spark so it can reach the private[spark]
// LiveListenerBus — the deterministic replacement for TimeQ's old
// fixed Thread.sleep listener-settle (ADVICE r17: on heavy queries
// late stage-completed events bled into the next query's work delta).
package org.apache.spark.graftshim

import org.apache.spark.SparkContext

object ListenerDrain {
  /** Block until every event posted so far has been delivered to every
    * registered listener (the same barrier Spark's own test harness
    * uses between actions and listener assertions). */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
