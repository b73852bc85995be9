package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** The one `private[spark]` doorway the graft BENCH harness needs:
  * draining the async listener bus so per-query task-metric
  * attribution ([[graft.GroupMetricsListener]]) reads a COMPLETE
  * count, not whatever the bus happened to deliver by the time the
  * query thread returned. Same shim pattern as
  * [[org.apache.spark.sql.GraftSqlBridge]]: the call delegates to a
  * public-in-bytecode, stable-across-4.x entry point
  * (`LiveListenerBus.waitUntilEmpty(long)`, the method every Spark
  * core test uses); no behavior lives in this file.
  */
object CoreBridge {

  /** Block until the listener bus has delivered every queued event or
    * `timeoutMs` elapses; returns false on timeout (callers treat a
    * timeout as "metrics possibly incomplete", never as fatal — the
    * bench must ship numbers even if the bus is wedged). */
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
