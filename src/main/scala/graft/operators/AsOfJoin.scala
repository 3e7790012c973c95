package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (temporal point-in-time) join: for each left row, attach the
  * single right row in the same key group whose timestamp is the
  * closest one at-or-before (backward) / at-or-after (forward) the left
  * row's timestamp — the "latest state as of event time" lookup the
  * reference approximates with correlated-window SQL
  * (`sql/customer_360_views.sql:350-353`'s purchase sequencing and the
  * 24 h session-match fallback, `database-schema.sql:208-231`).
  *
  * Spark has no ASOF JOIN operator; the naive spellings are a range
  * join (`l.ts >= r.ts` inequality-only → BroadcastNestedLoop or a
  * cartesian per key, quadratic in group size) or a window over a
  * range-joined blowup. This implementation is the scalable re-plan:
  *
  *   1. tag both sides and UNION them (column-aligned, right payload
  *      packed in one struct);
  *   2. one window partitioned by the keys, ordered by (ts, side) with
  *      `last(value, ignoreNulls)` over UNBOUNDED PRECEDING..CURRENT —
  *      each left row picks up the most recent right struct;
  *   3. keep left rows, unpack the struct, apply the tolerance.
  *
  * Cost: ONE hash-partition exchange on the keys + one sort — the same
  * plan shape as the reference's dedup windows, independent of how many
  * right rows precede each left row. At 100 TB this is the difference
  * between a shuffle and a per-key quadratic join; a hot key degrades
  * to one big sorted partition (AQE cannot split a window partition —
  * pre-filter or salt upstream if one key holds a material fraction).
  *
  * Ordering semantics at equal timestamps: the right row sorts before
  * the left row (side 0 < 1), so an exactly-equal right timestamp IS
  * matched — `l.ts >= r.ts`, DuckDB/pandas `merge_asof` behavior.
  * Multiple right rows on the same (key, ts) are ambiguous in every
  * as-of implementation; this one keeps the last under `tieBreak` (pass
  * a unique column for determinism, e.g. an id — defaults to none).
  * NULL timestamps never match (left rows get a NULL right payload;
  * right rows with NULL ts are dropped), matching SQL comparison
  * semantics.
  */
object AsOfJoin {

  /** Backward as-of: latest right row with `r.tsCol <= l.tsCol`,
    * optionally within `tolerance` (matched row must additionally
    * satisfy `r.ts >= l.ts - tolerance`, e.g.
    * `expr("INTERVAL 24 HOURS")`).
    *
    * Key columns must share names across the two frames; non-key
    * columns must NOT collide (rename before joining — same contract as
    * `Dataset.join(df, usingColumns)` output disambiguation).
    */
  def backward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      tolerance: Option[Column] = None,
      tieBreak: Option[String] = None): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, tolerance, tieBreak, forward = false)

  /** Forward as-of: earliest right row with `r.tsCol >= l.tsCol`,
    * optionally within `tolerance` (`r.ts <= l.ts + tolerance`). */
  def forward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      tolerance: Option[Column] = None,
      tieBreak: Option[String] = None): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, tolerance, tieBreak, forward = true)

  private def asOf(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      tolerance: Option[Column], tieBreak: Option[String],
      forward: Boolean): DataFrame = {
    val leftPayload = left.columns.filterNot(keys.contains)
    val rightPayload = right.columns.filterNot(keys.contains)
    val overlap = leftPayload.intersect(rightPayload)
    require(overlap.isEmpty,
      s"as-of join: non-key columns collide: ${overlap.mkString(", ")} — rename one side")
    require(left.schema(leftTs).dataType == right.schema(rightTs).dataType,
      s"as-of join: timestamp types differ: ${left.schema(leftTs).dataType} vs " +
        s"${right.schema(rightTs).dataType}")
    tieBreak.foreach(t => require(rightPayload.contains(t),
      s"as-of join: tieBreak '$t' is not a non-key right column"))

    val valueType = StructType(right.schema.fields.filter(f => rightPayload.contains(f.name)))

    // NULL right timestamps can never satisfy ts-compare semantics but
    // WOULD be picked up by last(ignoreNulls) if left in the union; a
    // NULL key never joins in SQL but the window would group it.
    val taggedRight = right
      .filter(col(rightTs).isNotNull && keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__graft_t"),
        lit(0).as("__graft_side"),
        struct(rightPayload.map(col): _*).as("__graft_val")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__graft_t"),
        lit(1).as("__graft_side"),
        lit(null).cast(valueType).as("__graft_val")) ++
        leftPayload.map(col): _*)

    // Timestamp order pins NULLs FIRST on both scan directions so a
    // NULL-ts left row sorts before every right row and matches
    // nothing. The tieBreak order pins NULLs LAST: left rows carry a
    // NULL value struct, so their tie key is NULL, and they must sort
    // AFTER the right rows sharing their timestamp (else an equal-ts
    // right row would be invisible to them). Deterministic pick among
    // same-(key, ts) right rows: greatest tieBreak (backward) /
    // smallest (forward) — the one adjacent to the left row in scan
    // order.
    val tsOrder =
      if (forward) col("__graft_t").desc_nulls_first else col("__graft_t").asc_nulls_first
    val tieOrder = tieBreak.toSeq.map(t =>
      if (forward) col("__graft_val").getField(t).desc_nulls_last
      else col("__graft_val").getField(t).asc_nulls_last)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder +: tieOrder :+ col("__graft_side").asc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withMatch = taggedRight.unionByName(taggedLeft)
      .withColumn("__graft_match", last(col("__graft_val"), ignoreNulls = true).over(w))
      .filter(col("__graft_side") === 1)

    val matchedTs = col("__graft_match").getField(rightTs)
    val inTolerance = tolerance match {
      case None => matchedTs.isNotNull
      case Some(tol) =>
        if (forward) matchedTs <= col(leftTs) + tol
        else matchedTs >= col(leftTs) - tol
    }
    val gated = withMatch.withColumn("__graft_gated",
      when(col(leftTs).isNotNull && inTolerance, col("__graft_match")))

    gated.select(
      keys.map(col) ++ leftPayload.map(col) ++
        rightPayload.map(c => col("__graft_gated").getField(c).as(c)): _*)
  }
}
