package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact per-group WEIGHTED quantiles (percentile-disc semantics over a
  * weighted distribution) with bounded task memory.
  *
  * [[ExactQuantiles]] answers row-count questions ("the median
  * document"); this answers mass questions ("the document length below
  * which half the TOKENS sit") — the distinction that matters for a
  * training corpus, where a few huge documents can carry most of the
  * token mass while being invisible to a row-count median.
  *
  * Definition: for quantile q, the smallest value v such that the total
  * weight of rows with value ≤ v reaches q × (group's total weight).
  * Zero-weight rows are dropped (they carry no mass; keeping one at a
  * boundary would let a weightless value win the pick).
  *
  * Scale shape (100 TB):
  *   1. collapse `(group, value)` duplicates with one hash aggregate —
  *      partial map-side combine shrinks a corpus to its per-group
  *      VALUE HISTOGRAM (for integral metrics like token counts, at
  *      most |distinct lengths| rows per group);
  *   2. running weight in value order via [[PrefixSum.runningSum]]'s
  *      two-phase prefix sum — a hot group spans many range partitions
  *      instead of serializing into one window task;
  *   3. per-group totals collapse to one row per group; the quantile
  *      picks are conditional `min`s in a final hash aggregate.
  * No global sort, no per-group buffering, nothing driver-side.
  */
object WeightedQuantiles {

  /** One row per group: the group columns, `w_total` (the group's total
    * weight, LongType) and one value column per (q, name) pair. The
    * weight column must be integral (summed as LongType). */
  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      qs: Seq[(Double, String)]): DataFrame = {
    require(groupCols.nonEmpty, "perGroup needs at least one group column")
    require(qs.nonEmpty, "perGroup needs at least one quantile")
    qs.foreach { case (q, _) =>
      require(q > 0 && q <= 1, s"weighted quantile out of (0,1]: $q") }
    val groupC = groupCols.map(col)
    val hist = df
      .groupBy(groupC :+ col(valueCol): _*)
      .agg(sum(col(weightCol).cast("long")).as("__wq_w"))
      .filter(col("__wq_w") > 0)
    val cum = PrefixSum.runningSum(
      hist, groupCols, Seq(col(valueCol).asc), col("__wq_w"), "__wq_cum")
    val tot = cum.groupBy(groupC: _*).agg(max(col("__wq_cum")).as("__wq_tot"))
    val picks: Seq[Column] = qs.map { case (q, name) =>
      min(when(
        col("__wq_cum").cast("double") >= lit(q) * col("__wq_tot").cast("double"),
        col(valueCol))).as(name)
    }
    cum.join(tot, groupCols)
      .groupBy(groupC: _*)
      .agg(max(col("__wq_tot")).as("w_total"), picks: _*)
  }
}
