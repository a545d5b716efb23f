package org.apache.spark.graftbench

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for the bench's per-query task-metric
  * attribution. `SparkContext.listenerBus.waitUntilEmpty` is
  * `private[spark]`, so this one-method bridge lives in the
  * `org.apache.spark` package — the standard pattern public Spark test
  * harnesses (spark-testing-base, Spark's own SharedSparkContext) use to
  * reach test-only internals. Nothing else in the repo may import Spark
  * internals; this file exists so `Bench` can ATTRIBUTE TaskEnd events to
  * the query that produced them instead of sleeping and hoping the bus
  * drained (ADVICE r10: a loaded bus bled the previous query's shuffle
  * bytes into the next query's numbers).
  */
object ListenerDrain {

  /** Block until every queued listener event has been delivered, or the
    * timeout passes (TimeoutException is swallowed — metrics are
    * diagnostic; a hung bus must not fail the bench run).
    */
  def drain(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
