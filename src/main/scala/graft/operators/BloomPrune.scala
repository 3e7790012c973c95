package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pruning for the incremental anti-join — the 100 TB
  * shape of "which of these batch rows are NOT in the processed state".
  *
  * A plain `batch LEFT ANTI state` must shuffle BOTH sides on the key;
  * when the state is the accumulated history (every processed id ever),
  * that is a full shuffle of the largest table in the lake to answer a
  * question about a day-sized batch. Here the batch's keys are folded
  * into a bloom filter (built DISTRIBUTED, via Spark's
  * `BloomFilterAggregate` over `xxhash64(key)` — partial aggregates
  * merge sketches, only the ~MB filter reaches the driver), the state
  * is pre-filtered to keys that MIGHT be in the batch — a pure scan +
  * codegen'd probe, no shuffle — and only that sliver (true matches +
  * false positives) enters the exact anti-join, where AQE sees a small
  * side and broadcasts it.
  *
  * Correctness is INDEPENDENT of the filter's false-positive rate: the
  * bloom only ever keeps extra state rows, and the exact anti-join
  * removes their effect. `fpp` is purely a cost knob — size it against
  * the STATE's row count (false positives ≈ fpp × |state| rows surviving
  * the prune), not the batch's.
  *
  * Uses Spark's own bloom machinery (the same expressions behind
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`) rather than a
  * driver-side `stat.bloomFilter` + closure: the probe is a native
  * Catalyst predicate, so it stays inside whole-stage codegen and can
  * reach a future scan pushdown, where a Scala closure is an optimizer
  * black box.
  */
object BloomPrune {

  /** Serialized bloom filter over `xxhash64(key)` of `df`'s rows.
    * None when `df` has no rows with a non-null key (nothing to match —
    * callers short-circuit). */
  def keyBloom(
      df: DataFrame,
      key: String,
      expectedItems: Long,
      fpp: Double = 0.001): Option[Array[Byte]] = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      GraftSqlShim.expression(xxhash64(col(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    Option(df.select(GraftSqlShim.column(agg)).head().getAs[Array[Byte]](0))
  }

  /** Codegen'd membership probe: true when `key` MIGHT be in the bloom
    * (false positives possible, false negatives never). */
  def mightContainKey(bloom: Array[Byte], key: Column): Column =
    GraftSqlShim.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), GraftSqlShim.expression(xxhash64(key))))

  /** `batch LEFT ANTI state` on `key`, with the state side bloom-pruned
    * first. Result rows are EXACTLY the plain anti-join's (see class
    * doc); only the execution shape changes — the state contributes a
    * scan instead of a table-sized shuffle.
    *
    * `expectedBatchKeys` sizes the filter; passing an estimate (e.g. the
    * incremental batch's LIMIT) avoids a counting pass over the batch.
    */
  def antiJoinPruned(
      batch: DataFrame,
      state: DataFrame,
      key: String,
      expectedBatchKeys: Long,
      fpp: Double = 0.001): DataFrame =
    keyBloom(batch.filter(col(key).isNotNull), key, expectedBatchKeys, fpp) match {
      // no non-null batch keys: nothing can match state, anti-join is identity
      case None => batch
      case Some(bloom) =>
        val pruned = state.filter(mightContainKey(bloom, col(key)))
        batch.join(pruned.select(key), Seq(key), "left_anti")
    }
}
