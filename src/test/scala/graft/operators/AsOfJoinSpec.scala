package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** AsOfJoin: the union-tag + window re-plan must agree with the
  * obvious-but-quadratic definition (max right ts <= left ts via a
  * range join) on every edge the window trick could get wrong: equal
  * timestamps, ties, NULL keys/timestamps, tolerance, both directions.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def leftDf(rows: Seq[(java.lang.Long, Timestamp, String)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("k", "lts", "lpay")
  }
  private def rightDf(rows: Seq[(java.lang.Long, Timestamp, java.lang.Long)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("k", "rts", "rid")
  }

  /** Independent quadratic reference: range-join all candidates, keep
    * the closest (greatest rid as tiebreak for backward). */
  private def bruteBackward(left: DataFrame, right: DataFrame): Set[(Long, Timestamp, String, Option[Long])] =
    left.join(right, left("k") === right("k") && col("rts") <= col("lts"), "left")
      .groupBy(left("k").as("k"), col("lts"), col("lpay"))
      .agg(max(struct(col("rts"), col("rid"))).as("m"))
      .select(col("k"), col("lts"), col("lpay"), col("m.rid"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

  test("backward matches the quadratic range-join definition incl. equal ts") {
    val left = leftDf(Seq(
      (1L, ts("2024-01-05 00:00:00"), "a"),   // strictly after r1
      (1L, ts("2024-01-10 00:00:00"), "b"),   // EQUAL to r2 → must match r2
      (1L, ts("2024-01-01 00:00:00"), "c"),   // before everything → None
      (2L, ts("2024-01-07 00:00:00"), "d")))  // other key
    val right = rightDf(Seq(
      (1L, ts("2024-01-03 00:00:00"), 101L),
      (1L, ts("2024-01-10 00:00:00"), 102L),
      (2L, ts("2024-01-06 00:00:00"), 201L)))
    val got = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts")
      .select(col("k"), col("lts"), col("lpay"), col("rid"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == bruteBackward(left, right))
    assert(got.contains((1L, ts("2024-01-10 00:00:00"), "b", Some(102L))))
    assert(got.contains((1L, ts("2024-01-01 00:00:00"), "c", None)))
  }

  test("tolerance nulls out matches older than the lookback") {
    val left = leftDf(Seq((1L, ts("2024-01-10 00:00:00"), "a")))
    val right = rightDf(Seq((1L, ts("2024-01-02 00:00:00"), 101L)))
    val within = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts",
      tolerance = Some(expr("INTERVAL 10 DAYS"))).select("rid").collect()
    val outside = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts",
      tolerance = Some(expr("INTERVAL 7 DAYS"))).select("rid").collect()
    assert(within.head.getLong(0) == 101L)
    assert(outside.head.isNullAt(0))
    assert(outside.length == 1, "tolerance must not drop the left row")
  }

  test("forward picks the earliest at-or-after row") {
    val left = leftDf(Seq(
      (1L, ts("2024-01-05 00:00:00"), "a"),
      (1L, ts("2024-01-11 00:00:00"), "b")))  // after everything → None
    val right = rightDf(Seq(
      (1L, ts("2024-01-05 00:00:00"), 101L),  // equal → matches "a"
      (1L, ts("2024-01-08 00:00:00"), 102L)))
    val got = AsOfJoin.forward(left, right, Seq("k"), "lts", "rts")
      .select(col("lpay"), col("rid")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map("a" -> Some(101L), "b" -> None))
  }

  test("NULL keys and NULL timestamps never match but left rows survive") {
    val left = leftDf(Seq(
      (null.asInstanceOf[java.lang.Long], ts("2024-01-05 00:00:00"), "nullkey"),
      (1L, null, "nullts"),
      (1L, ts("2024-01-05 00:00:00"), "ok")))
    val right = rightDf(Seq(
      (null.asInstanceOf[java.lang.Long], ts("2024-01-01 00:00:00"), 900L),
      (1L, null, 901L),
      (1L, ts("2024-01-02 00:00:00"), 101L)))
    val got = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts")
      .select(col("lpay"), col("rid")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map("nullkey" -> None, "nullts" -> None, "ok" -> Some(101L)))
  }

  test("tieBreak picks deterministically among equal right timestamps") {
    val left = leftDf(Seq((1L, ts("2024-01-05 00:00:00"), "a")))
    val right = rightDf(Seq(
      (1L, ts("2024-01-05 00:00:00"), 101L),
      (1L, ts("2024-01-05 00:00:00"), 103L),
      (1L, ts("2024-01-05 00:00:00"), 102L)))
    val got = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts",
      tieBreak = Some("rid")).select("rid").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(103L), "backward keeps greatest tieBreak")
    val fwd = AsOfJoin.forward(left, right, Seq("k"), "lts", "rts",
      tieBreak = Some("rid")).select("rid").collect()
    assert(fwd.map(_.getLong(0)).toSeq == Seq(101L), "forward keeps smallest tieBreak")
  }

  test("colliding non-key columns are rejected up front") {
    val s = spark; import s.implicits._
    val l = Seq((1L, ts("2024-01-01 00:00:00"), "x")).toDF("k", "t", "v")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), "y")).toDF("k", "rt", "v")
    val e = intercept[IllegalArgumentException](
      AsOfJoin.backward(l, r, Seq("k"), "t", "rt"))
    assert(e.getMessage.contains("v"))
  }

  test("randomized equivalence with the quadratic definition") {
    val rnd = new scala.util.Random(42)
    val left = leftDf((1 to 300).map { i =>
      (java.lang.Long.valueOf(rnd.nextInt(20).toLong),
        new Timestamp(86400000L * rnd.nextInt(60)), s"l$i")
    })
    // unique (k, ts) on the right so no tiebreak is needed
    val rightRows = (1 to 200).map { i =>
      ((rnd.nextInt(20).toLong, 86400000L * rnd.nextInt(60)), i.toLong)
    }.toMap.toSeq.map { case ((k, t), id) =>
      (java.lang.Long.valueOf(k), new Timestamp(t), java.lang.Long.valueOf(id))
    }
    val right = rightDf(rightRows)
    val got = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts")
      .select(col("k"), col("lts"), col("lpay"), col("rid"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == bruteBackward(left, right))
  }

  test("the plan is one window over a union — no range join, no cartesian") {
    val left = leftDf(Seq((1L, ts("2024-01-05 00:00:00"), "a")))
    val right = rightDf(Seq((1L, ts("2024-01-03 00:00:00"), 101L)))
    val plan = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("Window"))
  }
}
