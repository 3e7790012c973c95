package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class WeightedQuantilesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def run(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long, Long)] = {
    val spark0 = spark
    import spark0.implicits._
    WeightedQuantiles.perGroup(
        rows.toDF("g", "v", "w"), Seq("g"), "v", "w",
        Seq(0.5 -> "p50", 0.9 -> "p90"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("a dominant-weight value pulls the mass median; equal weights reduce to disc ranks") {
    val out = run(Seq(
      // group a: token-mass shape — one huge doc carries 97% of the mass
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L), ("a", 10L, 97L),
      // group b: equal weights over 1..10 → p50 at cum ≥ 5, p90 at cum ≥ 9
      ("b", 1L, 1L), ("b", 2L, 1L), ("b", 3L, 1L), ("b", 4L, 1L), ("b", 5L, 1L),
      ("b", 6L, 1L), ("b", 7L, 1L), ("b", 8L, 1L), ("b", 9L, 1L), ("b", 10L, 1L)))
    assert(out("a") == ((100L, 10L, 10L)), out.toString)
    assert(out("b") == ((10L, 5L, 9L)), out.toString)
  }

  test("duplicate values merge their weights; zero-weight rows carry no mass") {
    val out = run(Seq(
      ("c", 5L, 2L), ("c", 5L, 2L), ("c", 7L, 4L), ("c", 6L, 0L)))
    // hist: 5→4, 7→4 (6 dropped); total 8; p50 at cum ≥ 4 → 5; p90 at ≥ 7.2 → 7
    assert(out("c") == ((8L, 5L, 7L)), out.toString)
  }
}
