package org.apache.spark

/** Bridge to Spark-core `private[spark]` internals (the core twin of
  * `org.apache.spark.sql.GraftSqlShim`). Signatures expose only public
  * types.
  */
object GraftCoreShim {

  /** Block until the live listener bus has dispatched every queued
    * event. Task-end events arrive asynchronously, so a listener that
    * accumulates task metrics is only complete some time after an
    * action returns — Bench's per-query shuffle/spill accounting calls
    * this between queries so bytes never bleed into the next query's
    * bucket. */
  def flushListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(10000L)
}
