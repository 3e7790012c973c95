package graft

import org.apache.spark.sql.DataFrame

/** Lineage-severing helpers shared by the iterative / read-overwrite
  * operators (materialized-view refresh, connected components, the
  * idempotent event sink).
  */
object Lineage {

  /** Eager `localCheckpoint` plus an explicit releaser for its storage.
    *
    * Checkpoint blocks are NOT freed by `Dataset.unpersist` (they live
    * outside the cache manager) and are otherwise reclaimed only when
    * the driver's context cleaner happens to GC the dead RDD object —
    * asynchronous and timing-dependent. In a long-lived session running
    * many queries that is a steady storage-memory leak, so operators
    * that checkpoint internally must release their blocks explicitly
    * once the last consumer has run.
    */
  def checkpointed(df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = df.localCheckpoint(eager = true)
    val fresh = sc.getPersistentRDDs.keySet -- before
    (cp, () => fresh.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))))
  }
}
