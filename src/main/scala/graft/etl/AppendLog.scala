package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The append-log state mechanism shared by every small cross-batch
  * state store: appends are atomic-per-batch parquet writes, reads FOLD
  * the whole log through a store-specific collapse (distinct for an id
  * set, bitwise-OR for a bloom bitset), and [[compact]] rewrites the
  * log as one folded snapshot with a crash-safe swap.
  *
  * Extracted from [[graft.sinks.EventSink.ProcessedIds]] (which now
  * delegates here) when [[graft.operators.BloomDedup]] needed the same
  * discipline for its bitset state — the load/append/compact dance must
  * not drift between stores, and the crash-recovery contract is pinned
  * once: a compact that died between its two renames leaves the
  * previous snapshot at `<path>.old`, and [[load]] restores it rather
  * than silently starting empty.
  *
  * The fold MUST be idempotent over re-appended rows (set-union,
  * bitwise-OR): that is what makes at-least-once replay of a state
  * append harmless, and what makes compact ≡ no-compact for readers.
  */
object AppendLog {

  /** Read the folded state; `empty` bootstraps a missing store. */
  def load(spark: SparkSession, statePath: String,
      fold: DataFrame => DataFrame, empty: => DataFrame): DataFrame = {
    val dir = new java.io.File(statePath)
    val old = new java.io.File(statePath + ".old")
    if (!dir.exists() && old.exists()) old.renameTo(dir)
    if (dir.exists()) fold(spark.read.parquet(statePath))
    else empty
  }

  /** Append one batch's rows — atomic per batch (parquet append). */
  def append(rows: DataFrame, statePath: String): Unit =
    rows.write.mode("append").parquet(statePath)

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }

  /** Rewrite the append log as one folded snapshot. Swap order is
    * crash-safe on a local/posix fs: snapshot → .tmp, live → .old,
    * .tmp → live, drop .old. Every failure mode leaves either the live
    * dir or .old intact, and [[load]] knows to restore .old. */
  def compact(spark: SparkSession, statePath: String,
      fold: DataFrame => DataFrame, empty: => DataFrame): Unit = {
    val snap = load(spark, statePath, fold, empty).cache()
    snap.count() // materialize before touching the live dir
    val tmp = new java.io.File(statePath + ".tmp")
    val old = new java.io.File(statePath + ".old")
    val dir = new java.io.File(statePath)
    deleteRec(tmp); deleteRec(old) // stale leftovers from a past crash
    snap.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    snap.unpersist()
    if (dir.exists() && !dir.renameTo(old))
      throw new java.io.IOException(s"compact: cannot stage $dir aside")
    if (!tmp.renameTo(dir)) {
      old.renameTo(dir) // roll back to the previous snapshot
      throw new java.io.IOException(s"compact: cannot activate $tmp")
    }
    deleteRec(old)
  }
}
