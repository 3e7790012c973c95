package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles (PERCENTILE_CONT semantics) without
  * per-group value buffering.
  *
  * Spark's built-in `percentile` aggregate collects EVERY group value
  * into one in-memory buffer before interpolating — exact, but a
  * straight OOM at 100 TB where a stratum holds billions of rows. The
  * mergeable-sketch alternative (`approx_percentile`) is the right
  * default at that scale, but some consumers (billing thresholds,
  * SLA percentiles, oracle checks) need the EXACT value.
  *
  * This operator gets exactness scalably from rank arithmetic: rank
  * rows within each group (one hash exchange + per-partition sort —
  * the same shuffle any grouped aggregate pays), compute each
  * quantile's fractional position `pos = (n-1)·q`, and fold the one or
  * two rows at `floor(pos)` / `floor(pos)+1` into
  * `v_lo·(1-frac) + v_hi·frac` with a conditional sum. No state beyond
  * the running windows; memory per task is O(1) regardless of group
  * size.
  *
  * NULL values are dropped internally — PERCENTILE_CONT semantics —
  * so `n_<valueCol>` is the NON-NULL count and a group of only NULLs
  * disappears (exactly as a grouped `percentile` aggregate returns no
  * interpolable value). Ties need no tiebreak: equal values make rank
  * assignment among them arbitrary but the value AT each rank — all
  * the arithmetic reads — deterministic.
  */
object ExactQuantiles {

  /** One row per group: the group columns, `n_<valueCol>` (the group's
    * row count), and one column per (q, name) pair. Quantile outputs
    * are doubles rounded to 4 dp. */
  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[(Double, String)]): DataFrame = {
    require(groupCols.nonEmpty, "perGroup needs at least one group column")
    require(qs.nonEmpty, "perGroup needs at least one quantile")
    qs.foreach { case (q, _) =>
      require(q >= 0 && q <= 1, s"quantile out of [0,1]: $q") }
    val part = Window.partitionBy(groupCols.map(col): _*)
    val ranked = df
      .select(groupCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)
      // a NULL would sit at rank 0 while still counting into __n,
      // shifting every quantile position one row off
      .filter(col("__v").isNotNull)
      .withColumn("__rn",
        (row_number().over(part.orderBy(col("__v"))) - 1).cast("long"))
      .withColumn("__n", count(lit(1)).over(part))
    val quantileAggs = qs.map { case (q, name) =>
      val pos = (col("__n") - 1).cast("double") * lit(q)
      val lo = floor(pos).cast("long")
      val frac = pos - floor(pos)
      round(sum(
        when(col("__rn") === lo, col("__v") * (lit(1.0) - frac))
          .when(col("__rn") === lo + 1 && frac > 0, col("__v") * frac)
          .otherwise(lit(0.0))), 4).as(name)
    }
    val aggs = max(col("__n")).as(s"n_$valueCol") +: quantileAggs
    ranked.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
