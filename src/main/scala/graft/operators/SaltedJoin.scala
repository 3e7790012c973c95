package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join/group keys (the 100 TB failure mode the
  * dedup windows W1/W2 and customer joins J1-J3 hit when one dealer or
  * one customer id dominates a partition).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) is the first line of defense — it splits oversized
  * shuffle partitions at runtime. Salting is the explicit fallback for
  * the cases AQE can't fix: skewed AGGREGATION, and joins where one key
  * exceeds a single task's memory even after splitting.
  *
  * KNOWN LIMIT: the salt hashes the WHOLE row, so fully identical
  * duplicate rows all land on one salt value — a hot key dominated by
  * bit-identical rows (common in raw CDC/event feeds) still
  * concentrates in a single partition. That trade is deliberate: a
  * row-content salt is stable under task retry/replay, where a
  * `rand()`/partition-id salt can lose or duplicate rows when a lost
  * map output is recomputed. When the feed has identical-row skew,
  * collapse it FIRST (`groupBy(all columns).count()` or dedup — the
  * semantics that make the rows identical usually make them collapsible)
  * and salt the collapsed frame.
  */
object SaltedJoin {

  /** Salted equi-join: the big (skewed) side gets a uniform salt in
    * [0, nSalts); the small side is replicated once per salt value, so
    * each hot key spreads over nSalts shuffle partitions instead of
    * one. Output = exactly the plain inner join's rows (salt column is
    * internal). The salt is derived from a hash of the whole big-side
    * row, so the plan stays deterministic — no rand() that would break
    * retry/replay semantics at scale. */
  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      nSalts: Int): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(nSalts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (keys, salt), then final aggregate on keys. Only
    * decomposable aggregates compose this way — provided here: count,
    * sum, max, min (avg = sum/count at the call site). Spark's hash
    * aggregate already does map-side partials; this adds a REDUCE-side
    * split for keys whose partials still overflow one task. */
  def skewedCounts(
      df: DataFrame,
      keys: Seq[String],
      countAs: String,
      nSalts: Int): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(nSalts)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(countAs))
  }

  /** Same two-phase split for sum/max/min over one value column. */
  def skewedAgg(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      nSalts: Int): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(nSalts)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        sum(col(valueCol)).as("__sum"),
        max(col(valueCol)).as("__max"),
        min(col(valueCol)).as("__min"),
        count(col(valueCol)).as("__cnt"))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__sum")).as(s"sum_$valueCol"),
        max(col("__max")).as(s"max_$valueCol"),
        min(col("__min")).as(s"min_$valueCol"),
        sum(col("__cnt")).as(s"cnt_$valueCol"))
  }
}
