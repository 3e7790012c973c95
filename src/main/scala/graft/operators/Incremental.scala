package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental extraction — the reference's activation feed
  * (`scripts/lambda_redshift_to_segment.py:137-230`):
  * date-range high-water mark + exclusion of already-processed keys +
  * deterministic top-k batch.
  *
  * The reference string-interpolated a `NOT IN (...)` list into SQL
  * (`lambda:159-163`) — O(n) SQL text and injection-shaped. Here the
  * processed set is a DataFrame and exclusion is a LEFT ANTI join:
  * shuffle-partitioned (or broadcast when small), scales to any state
  * size. The `orderBy.limit` compiles to TakeOrderedAndProject — a
  * per-partition top-k plus a k-row driver merge, never a full sort.
  */
object Incremental {

  def nextBatch(
      source: DataFrame,
      processed: DataFrame,       // one column: the processed key
      key: String,
      watermarkCol: String,
      lo: Column, hi: Column,
      order: Seq[Column],         // MUST be a total order for determinism
      limit: Int): DataFrame =
    source
      .filter(col(watermarkCol).between(lo, hi))
      // A NULL key is untrackable: a plain anti-join never matches NULL,
      // so a NULL-keyed row could never be marked processed and would be
      // re-delivered in EVERY batch (keys are often try_cast'd, so NULLs
      // are routine). They are excluded from incremental delivery by
      // design; callers that care route `source.filter(col(key).isNull)`
      // to a dead-letter path instead.
      .filter(col(key).isNotNull)
      .join(processed.select(key).distinct(), Seq(key), "left_anti")
      .orderBy(order: _*)
      .limit(limit)
}
