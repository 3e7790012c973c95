package graft

import org.apache.spark.sql.DataFrame

/** Scoped Spark job descriptions (guide §1.5: label your jobs). The
  * multi-job operators (materialized-view build/refresh, generation
  * publishes) submit dozens of jobs per call; unlabeled they all read
  * as `withThreadLocalCaptured at CompletableFuture.java` in the UI and
  * in listener-based profiles, which makes per-phase attribution
  * impossible. The description is a thread-local Spark property, so the
  * helper restores the caller's previous label on exit (operators nest:
  * a refresh's publish runs inside the refresh's own label scope). */
object JobLabel {
  def apply[T](spark: org.apache.spark.sql.SparkSession, label: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(label)
    try body finally sc.setJobDescription(prev)
  }
}

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
    // Already a materialized leaf (a SharedFrames memo, or a prior
    // checkpoint): a second localCheckpoint would only copy the stored
    // blocks into a duplicate set. Reuse the frame as-is with a no-op
    // releaser — the blocks belong to the original owner, which is
    // exactly why they must NOT be released here.
    val existing = org.apache.spark.sql.GraftSqlShim.leafRdd(df)
    if (existing.exists(_.getStorageLevel !=
        org.apache.spark.storage.StorageLevel.NONE))
      return (df, () => ())
    // measured-size stats (see SharedFrames.cached): a checkpointed CDC
    // batch is usually tiny, and re-stamping it with its real block
    // bytes lets the planner broadcast it in the refresh's anti/semi
    // joins instead of trusting the origin plan's inflated estimate
    val cp = org.apache.spark.sql.GraftSqlShim.withMeasuredStats(
      df.localCheckpoint(eager = true))
    // The checkpoint's storage is exactly the RDD inside the returned
    // frame's LogicalRDD leaf. Releasing that (and only that) is safe
    // under concurrent jobs — unlike diffing getPersistentRDDs, which
    // could capture (and later drop) someone else's localCheckpoint
    // blocks, an unrecoverable loss once their lineage is severed.
    val rdd = org.apache.spark.sql.GraftSqlShim.leafRdd(cp)
    if (rdd.isEmpty)
      System.err.println(
        "graft.Lineage.checkpointed: no LogicalRDD leaf on the " +
          "checkpointed frame; its blocks will not be released")
    (cp, () => rdd.foreach(_.unpersist(blocking = false)))
  }
}
