package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.AtomicText
import graft.operators.ConnectedComponents

/** Continuously-maintained identity components — the streaming shell
  * around [[ConnectedComponents.incrementalMerge]]: each micro-batch of
  * match edges folds into a persisted `(id, comp)` label map, so the
  * identity graph the reference accumulates in its warehouse
  * (`identity-resolution/database-schema.sql:145-380`) stays resolved
  * CONTINUOUSLY instead of nightly, at batch-sized incremental cost.
  *
  * Crash contract (the CorpusIngest posture, simplified by algebra):
  * state generations are immutable parquet dirs (`gen=N/`) named by an
  * [[AtomicText]] `_CURRENT` marker — write the new generation fully,
  * THEN swap the marker. A crash before the swap leaves the old map
  * serving; a replay re-applies the batch. No processed-batch ledger
  * is needed, because folding a batch in is IDEMPOTENT — merging edges
  * already inside their components is a no-op — so at-least-once
  * delivery converges without dedup (pinned in
  * `IdentityComponentsStreamSpec`, including the double-apply case).
  *
  * 100 TB design: per batch, the delta CC runs on component-collapsed
  * METADATA (≤ batch edges); the full map is rewritten once per batch
  * — at the scale where that rewrite dominates, shard the map with
  * [[graft.etl.GenerationStore]]'s bucketed protocol and rewrite only
  * buckets holding relabeled components (same manifest algebra, per
  * bucket); the previous generation is pruned after each swap. */
object IdentityComponents {

  private def markerPath(statePath: String) = new Path(statePath, "_CURRENT")
  private def genDir(statePath: String, g: Long) = s"$statePath/gen=$g"

  /** Hook for crash-window tests: runs after the new generation is
    * fully written, before the marker swap. */
  @volatile var onBeforeSwap: () => Unit = () => ()

  def currentGen(spark: SparkSession, statePath: String): Option[Long] =
    AtomicText.read(markerPath(statePath),
      spark.sessionState.newHadoopConf()).map(_.trim.toLong)

  /** The served component map, exactly as last committed. */
  def labels(spark: SparkSession, statePath: String): Option[DataFrame] =
    currentGen(spark, statePath)
      .map(g => spark.read.parquet(genDir(statePath, g)))

  /** Fold one micro-batch of edges into the persisted map; returns the
    * committed generation. First batch bootstraps with a full CC. */
  def applyBatch(
      spark: SparkSession,
      batchEdges: DataFrame,
      srcCol: String,
      dstCol: String,
      statePath: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val cur = currentGen(spark, statePath)
    val (upd, release) = labels(spark, statePath) match {
      case Some(l) =>
        ConnectedComponents.incrementalMerge(l, batchEdges, srcCol, dstCol)
      case None =>
        val full = ConnectedComponents.run(batchEdges, srcCol, dstCol)
        (full, () => { full.unpersist(); () })
    }
    val next = cur.map(_ + 1).getOrElse(0L)
    try {
      // full new generation on disk FIRST; the old marker still serves
      upd.write.mode("overwrite").parquet(genDir(statePath, next))
      onBeforeSwap()
      AtomicText.write(markerPath(statePath), next.toString, conf)
    } finally release()
    // prune all but the committed and previous generation (the widest
    // window a concurrent reader can straddle)
    val fs = new Path(statePath).getFileSystem(conf)
    val keep = Set(next, next - 1).map(g => s"gen=$g")
    Option(fs.listStatus(new Path(statePath))).getOrElse(Array.empty)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen=") &&
        !keep.contains(s.getPath.getName))
      .foreach(s => fs.delete(s.getPath, true))
    next
  }
}
