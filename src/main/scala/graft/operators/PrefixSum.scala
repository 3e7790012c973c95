package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable per-group running sums — the two-phase prefix sum that
  * replaces `Window.partitionBy(group).orderBy(...)` for corpus-sized
  * groups.
  *
  * The single-window spelling puts EVERY row of a group into ONE task:
  * with ~20 source strata at 100 TB, a hot source's rows are hundreds
  * of gigabytes in a single sorter — a straggler or an OOM. This
  * operator keeps the identical semantics with bounded tasks:
  *
  *   1. '''Range-partition''' on `(group, orderCols...)` — a hot group
  *      spans as many partitions as its row share demands, and
  *      partition ids are monotone in the group's sort order (the
  *      `RangePartitioner` contract). Ties across the range boundary
  *      cannot split wrongly because `orderCols` must totally order
  *      rows within a group (callers tiebreak by a unique key).
  *   2. '''Partition-local running sums''' — a window over
  *      `(group, partition_id)`: each window group is at most one
  *      range partition, so task memory is bounded by the partition
  *      size the range exchange already enforces, never by group size.
  *   3. '''Broadcast per-partition offsets''' — per-`(group, pid)`
  *      totals collapse map-side to ≤ groups×partitions metadata rows;
  *      a window over that tiny frame turns totals into exclusive
  *      prefix offsets, broadcast-joined back and added to the local
  *      sums.
  *
  * Same rank-arithmetic-over-bounded-state idea as [[ExactQuantiles]],
  * applied to prefix sums. Cost: the slim `(group, order, value)`
  * projection crosses two exchanges (range + the window's hash on
  * `(group, pid)`) instead of one — the price of unserializing the hot
  * group; the totals branch comes back as an AQE ReusedExchange at
  * stage materialization (plan-pinned in `PlanAuditSpec`), so the
  * corpus crosses the range exchange once and the totals shuffle
  * carries only the collapsed metadata rows.
  *
  * The value column must be integral (the running sum is a LongType);
  * `orderCols` may carry directions (`col.desc`) and MUST be a total
  * order within each group — equal full keys would make the running
  * sum itself ill-defined, single-window or not.
  */
object PrefixSum {

  private val PidCol = "__psum_pid"
  private val LocalCol = "__psum_local"
  private val TotalCol = "__psum_total"
  private val OffCol = "__psum_off"

  /** `df` plus `out` = running sum of `value` over `orderCols` within
    * each `groupCols` stratum (`ROWS UNBOUNDED PRECEDING`, inclusive).
    *
    * @param numPartitions range-partition count; 0 = the session's
    *   `spark.sql.shuffle.partitions` (the scale knob: partitions must
    *   outnumber executor cores × the hot group's row share)
    */
  def runningSum(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      value: Column,
      out: String,
      numPartitions: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "runningSum needs at least one group column")
    require(orderCols.nonEmpty, "runningSum needs an intra-group total order")
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val groupC = groupCols.map(col)
    val ranged = df
      .repartitionByRange(n, groupC ++ orderCols: _*)
      .withColumn(PidCol, spark_partition_id().cast("long"))
    val localW = Window
      .partitionBy(groupC :+ col(PidCol): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn(LocalCol, sum(value).over(localW))
    // partial aggregation collapses each range partition to ≤ |groups|
    // rows before this branch's exchange — metadata, not corpus
    val totals = ranged
      .groupBy(groupC :+ col(PidCol): _*)
      .agg(sum(value).as(TotalCol))
    val offW = Window
      .partitionBy(groupC: _*)
      .orderBy(col(PidCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn(OffCol, coalesce(sum(col(TotalCol)).over(offW), lit(0L)))
      .select(groupC ++ Seq(col(PidCol), col(OffCol)): _*)
    local
      .join(broadcast(offsets), groupCols :+ PidCol)
      .withColumn(out, col(LocalCol) + col(OffCol))
      .drop(PidCol, LocalCol, OffCol)
  }
}
