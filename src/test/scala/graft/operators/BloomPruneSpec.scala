package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Bloom-pruned incremental anti-join: bit-identical to the plain
  * anti-join at any false-positive rate (the bloom only ever lets
  * EXTRA state rows into the exact join), prunes the state hard, and
  * degrades correctly on empty and all-null batches. */
class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def frames() = {
    val spark0 = spark
    import spark0.implicits._
    // batch keys 0..99 plus nulls; state covers evens up to 10k
    val batch = (0L to 99L).map(k => (k, s"payload_$k"))
      .toDF("k", "payload")
      .unionByName(Seq((Option.empty[Long], "null_a"), (Option.empty[Long], "null_b"))
        .toDF("k", "payload"))
    val state = (0L until 10000L by 2).toDF("k")
    (batch, state)
  }

  test("matches the plain anti-join exactly, including null batch keys") {
    val (batch, state) = frames()
    val plain = batch.join(state, Seq("k"), "left_anti")
      .collect().map(_.toSeq).toSet
    val pruned = BloomPrune.antiJoinPruned(batch, state, "k",
      expectedBatchKeys = 128)
      .collect().map(_.toSeq).toSet
    assert(pruned == plain)
    // odds survive (not in state), evens die, null keys survive
    assert(pruned.exists(_(1) == "null_a"))
    assert(!pruned.exists(_(0) == 2L))
    assert(pruned.exists(_(0) == 3L))
  }

  test("the bloom prunes the state to near the true match count") {
    val (batch, state) = frames()
    val bloom = BloomPrune.keyBloom(batch.filter(col("k").isNotNull), "k",
      expectedItems = 128).get
    val kept = state.filter(BloomPrune.mightContainKey(bloom, col("k"))).count()
    // true matches = evens in 0..99 = 50; fpp 0.001 over 5000 state rows
    // adds ~5 expected false positives — two orders of magnitude below
    // the unpruned 5000
    assert(kept >= 50 && kept < 200, s"pruned state kept $kept of 5000")
  }

  test("still exact when the filter is deliberately saturated") {
    val (batch, state) = frames()
    // 2 expected items for 100 actual → the bloom lies constantly; the
    // exact anti-join must absorb every false positive
    val out = BloomPrune.antiJoinPruned(batch, state, "k",
      expectedBatchKeys = 2, fpp = 0.5)
    val plain = batch.join(state, Seq("k"), "left_anti")
    assert(out.collect().map(_.toSeq).toSet ==
      plain.collect().map(_.toSeq).toSet)
  }

  test("all-null batch short-circuits to identity") {
    val spark0 = spark
    import spark0.implicits._
    val batch = Seq((Option.empty[Long], "x"), (Option.empty[Long], "y"))
      .toDF("k", "payload")
    val state = (0L to 10L).toDF("k")
    val out = BloomPrune.antiJoinPruned(batch, state, "k", expectedBatchKeys = 8)
    assert(out.collect().map(_.getString(1)).toSet == Set("x", "y"))
  }

  test("the probe is a native predicate, not a closure") {
    val (batch, _) = frames()
    val bloom = BloomPrune.keyBloom(batch.filter(col("k").isNotNull), "k", 128).get
    // a parquet-backed state: local relations evaluate the probe at
    // plan time, which would hide it from the executed plan
    val state = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val plan = state
      .filter(BloomPrune.mightContainKey(bloom, col("o_orderkey")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected native bloom probe in:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"))
  }
}
