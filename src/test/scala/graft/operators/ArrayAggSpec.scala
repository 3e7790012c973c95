package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** U1 typed Aggregator: distinct values ordered by (max sortKey DESC,
  * value ASC) — the pinned semantics of the reference's
  * ARRAY_AGG(DISTINCT … ORDER BY …) (customer_360_views.sql:407-408). */
class ArrayAggSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("distinctOrdered dedups and orders by recency then value") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(
      (1, "toyota", 10L), (1, "honda", 30L), (1, "toyota", 50L), // toyota max=50
      (1, "ford", 30L), // tie with honda at 30 → ford < honda alphabetically
      (2, "bmw", 5L)
    ).toDF("cust", "brand", "ts")
    val out = df.groupBy("cust")
      .agg(ArrayAggDistinctOrdered.distinctOrdered(col("brand"), col("ts")).as("brands"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(out(1) == Seq("toyota", "ford", "honda"))
    assert(out(2) == Seq("bmw"))
  }

  test("nulls are dropped; empty group → empty array") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1, Option.empty[String], 10L), (1, Some("a"), 1L))
      .toDF("cust", "brand", "ts")
    val out = df.groupBy("cust")
      .agg(ArrayAggDistinctOrdered.distinctOrdered(col("brand"), col("ts")).as("brands"))
      .head().getSeq[String](1)
    assert(out == Seq("a"))
  }

  test("NULL sortKey ranks last instead of crashing the encoder") {
    val spark0 = graft.SharedSpark.spark
    import spark0.implicits._
    val df = Seq(
      ("g", "newest", Some(100L)),
      ("g", "nokey", Option.empty[Long]),
      ("g", "older", Some(50L)))
      .toDF("k", "v", "ts")
    val out = df.groupBy("k")
      .agg(ArrayAggDistinctOrdered.distinctOrdered(col("v"), col("ts")).as("vs"))
      .head().getSeq[String](1)
    assert(out == Seq("newest", "older", "nokey"))
  }

  test("agrees with the a3-style expression combo on random data") {
    val spark0 = spark
    import spark0.implicits._
    val rows = for { k <- 1 to 5; i <- 1 to 40 } yield
      (k, s"v${(k * 7 + i * 13) % 9}", ((i * 31 + k) % 17).toLong)
    val df = rows.toDF("k", "v", "ts")
    val viaAgg = df.groupBy("k")
      .agg(ArrayAggDistinctOrdered.distinctOrdered(col("v"), col("ts")).as("arr"))
    val viaExpr = df.groupBy("k", "v").agg(max("ts").as("m"))
      .groupBy("k")
      .agg(expr(
        """transform(
             array_sort(collect_list(struct(m, v)),
               (l, r) -> CASE WHEN l.m > r.m THEN -1 WHEN l.m < r.m THEN 1
                              WHEN l.v < r.v THEN -1 WHEN l.v > r.v THEN 1
                              ELSE 0 END),
             x -> x.v)""").as("arr"))
    val a = viaAgg.collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    val b = viaExpr.collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(a == b)
  }
}
