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
      numPartitions: Int = 0): DataFrame =
    runningSums(df, groupCols, orderCols, Seq(value -> out), numPartitions)

  /** Several running sums over the SAME (group, order) in one pass —
    * one range exchange and one local window carry every value column
    * (the rank family needs two: row count and tie-group count). */
  def runningSums(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      values: Seq[(Column, String)],
      numPartitions: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "runningSums needs at least one group column")
    require(orderCols.nonEmpty, "runningSums needs an intra-group total order")
    require(values.nonEmpty, "runningSums needs at least one value column")
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val groupC = groupCols.map(col)
    // FROZEN to one physical RDD instance: `ranged` feeds TWO branches
    // (the local window and the totals), and RangePartitioner samples
    // its bounds per plan instantiation — if the branches each re-plan
    // the exchange (AQE exchange reuse is an optimization, never a
    // guarantee; a cached upstream at low parallelism was observed to
    // defeat it), rows land in DIFFERENT partitions per branch and the
    // offsets join silently corrupts the sums. Freezing makes the pid
    // column a single consistent assignment by construction — for both
    // branches, for repeated actions, and for lost-partition recompute.
    val ranged = org.apache.spark.sql.GraftSqlShim.freeze(df
      .repartitionByRange(n, groupC ++ orderCols: _*)
      .withColumn(PidCol, spark_partition_id().cast("long")))
    val localW = Window
      .partitionBy(groupC :+ col(PidCol): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = values.zipWithIndex.foldLeft(ranged) {
      case (acc, ((value, _), i)) =>
        acc.withColumn(s"$LocalCol$i", sum(value).over(localW))
    }
    // partial aggregation collapses each range partition to ≤ |groups|
    // rows before this branch's exchange — metadata, not corpus
    val totals = ranged
      .groupBy(groupC :+ col(PidCol): _*)
      .agg(sum(values.head._1).as(s"${TotalCol}0"),
        values.tail.zipWithIndex.map { case ((value, _), i) =>
          sum(value).as(s"$TotalCol${i + 1}")
        }: _*)
    val offW = Window
      .partitionBy(groupC: _*)
      .orderBy(col(PidCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = values.indices.foldLeft(totals) { (acc, i) =>
      acc.withColumn(s"$OffCol$i",
        coalesce(sum(col(s"$TotalCol$i")).over(offW), lit(0L)))
    }.select(groupC ++ (col(PidCol) +: values.indices.map(i => col(s"$OffCol$i"))): _*)
    val joined = local.join(broadcast(offsets), groupCols :+ PidCol)
    values.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, out), i)) =>
        acc.withColumn(out, col(s"$LocalCol$i") + col(s"$OffCol$i"))
          .drop(s"$LocalCol$i", s"$OffCol$i")
    }.drop(PidCol)
  }

  /** The full ranking-function family — row_number / rank / dense_rank /
    * percent_rank / cume_dist over ONE global (or per-stratum-free)
    * order WITH ties — without a partition-less `WindowExec`: the
    * corpus-scale spelling of `w10_rank_variants`' dimension-sized
    * window (a partition-less window is ONE task; over a dimension that
    * grows 100× it is the exact straggler [[runningSum]] was built to
    * kill).
    *
    * Everything except row_number is a function of the TIE KEY alone,
    * so the corpus first collapses to one row per distinct key
    * (map-side partial aggregation — the exchange carries keys, not
    * rows), and ONE two-phase pass over that key frame yields, per key:
    *
    *   - `cum`  = running row count (inclusive)  → cume_dist = cum / n
    *   - `rank` = cum − key_count + 1 (exclusive prefix + 1)
    *   - `dense_rank` = running KEY count (running sum of 1)
    *   - `percent_rank` = (rank − 1) / (n − 1), 0 when n == 1 — the
    *     SQL-standard n−1 denominator vs cume_dist's n, the confusion
    *     w10 exists to pin
    *
    * and joins back to the corpus on the key. row_number additionally
    * needs a TOTAL order over rows, which has no per-key shortcut: it
    * is a second [[runningSums]] pass over the full frame on
    * `keys ++ tiebreak`.
    *
    * ntile(k) completes the family when requested: SQL-standard split
    * (the first n mod k buckets get ⌈n/k⌉ rows) is CLOSED-FORM in
    * (row_number, n) — `cut = rem·(base+1); rn ≤ cut ? (rn−1)/(base+1)+1
    * : rem + (rn−1−cut)/base + 1` — so it rides the row_number pass for
    * free, no extra window.
    *
    * @param keys     (column, ascending) pairs — the rank order; ties
    *                 share rank/dense_rank/percent_rank/cume_dist
    * @param tiebreak completes `keys` to a TOTAL order for row_number
    *                 (nondeterministic row_number over ties is the bug
    *                 w10 pins against)
    * @param ntile    Some(k) adds an `ntile` column over the SAME total
    *                 order row_number uses
    * @return df + columns `row_number, rank, dense_rank` (long),
    *         `percent_rank, cume_dist` (double), `ntile` (long, if
    *         requested)
    */
  def rankVariants(
      df: DataFrame,
      keys: Seq[(String, Boolean)],
      tiebreak: Seq[Column],
      numPartitions: Int = 0,
      ntile: Option[Int] = None): DataFrame = {
    require(keys.nonEmpty, "rankVariants needs at least one key column")
    require(tiebreak.nonEmpty,
      "rankVariants needs a tiebreak completing the total order for row_number")
    val keyNames = keys.map(_._1)
    val keyOrder = keys.map { case (name, asc) =>
      if (asc) col(name).asc else col(name).desc
    }
    val g = "__rv_g"
    // one row per distinct key; keyOrder is a total order on this frame
    val counts = df.groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as("__rv_cnt"))
      .withColumn(g, lit(1))
    val cums = runningSums(counts, Seq(g), keyOrder,
      Seq(col("__rv_cnt") -> "__rv_cum", lit(1L) -> "__rv_dense"),
      numPartitions)
    // n is ONE metadata row — broadcast it under every key row
    val total = counts.agg(sum(col("__rv_cnt")).as("__rv_n"))
    val perKey = cums.crossJoin(broadcast(total))
      .withColumn("rank", col("__rv_cum") - col("__rv_cnt") + 1)
      .withColumn("dense_rank", col("__rv_dense"))
      .withColumn("percent_rank",
        when(col("__rv_n") > 1,
          (col("rank") - 1).cast("double") / (col("__rv_n") - 1).cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("cume_dist",
        col("__rv_cum").cast("double") / col("__rv_n").cast("double"))
      .select(keyNames.map(col) ++
        Seq(col("rank"), col("dense_rank"), col("percent_rank"), col("cume_dist"),
          col("__rv_n")): _*)
    val numbered = runningSum(
      df.withColumn(g, lit(1)), Seq(g), keyOrder ++ tiebreak,
      lit(1L), "row_number", numPartitions).drop(g)
    val joined = numbered.join(perKey, keyNames)
    ntile.fold(joined.drop("__rv_n")) { k =>
      require(k >= 1, s"ntile buckets must be >= 1, got $k")
      // Column `/` is fractional — spell integer division as floor-div
      // (exact: every operand is far below 2^53)
      def fdiv(a: Column, b: Column): Column = floor(a / b).cast("long")
      val n = col("__rv_n")
      val rn = col("row_number")
      val base = fdiv(n, lit(k.toLong))
      val rem = n - base * k
      val cut = rem * (base + 1)
      joined.withColumn("ntile",
        when(rn <= cut, fdiv(rn - 1, base + 1) + 1)
          .otherwise(rem + fdiv(rn - 1 - cut, base) + 1))
        .drop("__rv_n")
    }
  }
}
