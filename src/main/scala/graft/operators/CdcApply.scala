package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Apply a row-level changelog to a keyed replica — the CONSUME side
  * of `MaterializedView.changesBetween` (which emits `(keys…, change,
  * old_row, new_row)`): deletes and updates remove the touched keys,
  * inserts and updates add their `new_row`. Closes the CDC loop the
  * reference runs through DMS → Redshift (`SURVEY.md` §2.1's ingestion
  * path consumes exactly this shape): a downstream replica — cache,
  * cross-region copy, activation mirror — subscribes to what a refresh
  * DID and converges to the source snapshot without re-reading the
  * whole view.
  *
  * Semantics: applying `changesBetween(v1, v2)` to the exact `v1`
  * snapshot yields the exact `v2` snapshot; the operation is
  * IDEMPOTENT (re-applying the same changelog to the result is a
  * no-op), so an at-least-once delivery channel needs no dedup in
  * front of it.
  *
  * 100 TB design: one left-anti join on the key (removes every touched
  * key) + a union of the changelog's new rows — both key-partitioned,
  * changelog-sized work, nothing driver-side; the replica is scanned
  * once. Composes the same primitives as the ingest path's
  * [[Upsert]] (anti-join + union), restated here because CDC deletes
  * are first-class where upsert's are not. */
object CdcApply {

  /** `replica` after applying `changes` (schema of
    * `MaterializedView.changesBetween`): the touched keys' old rows
    * are dropped, non-delete changes contribute their `new_row`. */
  def applyChanges(replica: DataFrame, changes: DataFrame,
      keys: Seq[String]): DataFrame = {
    val touched = changes.select(keys.map(col): _*).distinct()
    val kept = replica.join(touched, keys, "left_anti")
    val upserts = changes.filter(col("change") =!= "delete")
      .select(col("new_row.*"))
    kept.unionByName(upserts)
  }
}
