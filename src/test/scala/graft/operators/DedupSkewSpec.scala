package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The OBSERVED-skew dedup question (SURVEY §4: "if a hot custno
  * skews, salting — custom only if observed") — answered by building
  * the observation. Verdict of the measurement, pinned here so nobody
  * re-litigates it:
  *
  *   - same-direction orders: DedupWindowToMaxBy collapses the window
  *     into a partially-aggregated max-struct (`SkewSpec` pins it);
  *   - EVERY other order (mixed directions, where our rewrite must
  *     decline): Spark's InferWindowGroupLimit plants a PARTIAL
  *     WindowGroupLimit BEFORE the exchange — each map partition emits
  *     at most one row per key, so a whale key crosses the shuffle as
  *     ≤ #map-partitions rows, never as its row set. The rank-1 dedup
  *     is skew-immune by construction under ANY order.
  *
  * Consequence, measured in this spec's A/B: a salted two-phase
  * variant (rank within (key, salt), re-rank the ≤ nSalts survivors —
  * the classic fallback for skewed windows) does NOT beat the plain
  * plan even at a 90% whale: it pays a whole-row hash and a wider
  * exchange to spread a hot key the group-limit already collapsed.
  * That is why `Dedup` ships NO salted variant and no auto-routing —
  * `Dedup.keySkewShare` remains as the observation probe for operators
  * that genuinely ship whole key groups (the irreducible W3 sequence
  * window, rank-without-filter analytics).
  */
class DedupSkewSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  // mixed directions: v DESC, id ASC — DedupWindowToMaxBy declines, so
  // this exercises the order family where only the group-limit protects
  private val order = Seq(col("v").desc, col("id").asc)

  /** ~2M rows; "whale" owns `whalePct`%, the rest uniform over 5000
    * keys. v is a full-period affine scramble of id rendered as a
    * fixed-width string (a version/timestamp-shaped sort key), so
    * (v desc, id asc) is a total order with one global winner per key. */
  private val N = 2000000L
  private def fixture(whalePct: Int): DataFrame =
    spark.range(N).select(
      col("id"),
      when(col("id") % 100 < whalePct, lit("whale"))
        .otherwise(concat(lit("k"), (col("id") % 5000).cast("string"))).as("key"),
      lpad(((col("id") * 2654435761L + 12345L) % N).cast("string"), 12, "0").as("v"),
      (col("id") % 97).as("payload"))

  /** The classic salted two-phase dedup, built inline as the A/B
    * CONTENDER (deliberately not part of the operator surface). */
  private def salted(df: DataFrame, nSalts: Int): DataFrame = {
    val s = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(nSalts.toLong)))
    Dedup.latestByKey(
      Dedup.latestByKey(s, Seq("key", "__salt"), order),
      Seq("key"), order).drop("__salt")
  }

  private def timeIt(body: => DataFrame): Double = {
    val t0 = System.nanoTime()
    body.write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }

  private def withPartitions[T](n: Int)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("mixed-order dedup is group-limited BEFORE the exchange (structural skew immunity)") {
    val df = fixture(30)
    val plan = Dedup.latestByKey(df, Seq("key"), order)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("max(struct"),
      "mixed-direction order must decline the max-by rewrite (fixture premise)")
    val partialIdx = plan.indexOf("WindowGroupLimit")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(plan.contains("Partial") && partialIdx >= 0 && exchangeIdx >= 0,
      s"expected a partial WindowGroupLimit in:\n$plan")
    // plan prints top-down: the Partial group-limit is a CHILD of the
    // exchange (runs map-side, before it)
    assert(plan.indexOf("Partial", exchangeIdx) > exchangeIdx,
      s"partial group-limit must sit below the exchange:\n$plan")
  }

  test("correctness on the whale fixture (and the salted contender agrees)") {
    val df = fixture(30)
    val plain = Dedup.latestByKey(df, Seq("key"), order)
    // independent oracle: the winner per key via max(struct) on an
    // order-inverted key (desc string inverts via negated id scramble is
    // messy — use a self-join-free argmax: max(struct(v, -id)) cannot
    // express id ASC tiebreak with v DESC in one struct, so check the
    // whale's winner directly instead: the max v among whale rows)
    val expectWhaleV = df.filter(col("key") === "whale").agg(max("v")).head.getString(0)
    val got = plain.filter(col("key") === "whale").collect()
    assert(got.length == 1 && got(0).getAs[String]("v") == expectWhaleV)
    assert(plain.count() == df.select("key").distinct().count(),
      "one survivor per key")
    val alt = salted(df, 16)
    assert(plain.exceptAll(alt).isEmpty && alt.exceptAll(plain).isEmpty,
      "salted contender diverged from the plain window")
  }

  test("A/B: the salted contender does not beat the group-limited plan, even at 90% whale") {
    withPartitions(32) {
      val df = fixture(90)
      // interleaved, min-of-2 per side
      val p1 = timeIt(Dedup.latestByKey(df, Seq("key"), order))
      val s1 = timeIt(salted(df, 16))
      val p2 = timeIt(Dedup.latestByKey(df, Seq("key"), order))
      val s2 = timeIt(salted(df, 16))
      val plainT = math.min(p1, p2)
      val saltedT = math.min(s1, s2)
      info(f"90%% whale: plain (group-limited) $plainT%.2f s, salted two-phase $saltedT%.2f s")
      // the claim is "no observable win worth routing to": allow noise,
      // fail only if salting ever looks like a >=30% improvement (which
      // would mean the group-limit protection regressed)
      assert(saltedT > plainT * 0.7,
        f"salting suddenly wins ($saltedT%.2f vs $plainT%.2f s): " +
          "group-limit skew immunity regressed — re-open SURVEY §4 salting")
    }
  }

  test("keySkewShare resolves a whale from a 1% sample (the observation probe)") {
    assert(math.abs(Dedup.keySkewShare(fixture(30), Seq("key")) - 0.3) < 0.05)
    assert(Dedup.keySkewShare(fixture(0), Seq("key")) < 0.01)
    assert(Dedup.keySkewShare(fixture(30).filter(lit(false)), Seq("key")) == 0.0)
  }
}
