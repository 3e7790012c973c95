package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Closed-form checks of the outer-product Aggregator: triangle
  * indexing, exact integer accumulation, and partition-merge
  * commutativity (the property that makes the distributed sum exact).
  */
class OuterProductSumSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val vecs: Seq[Seq[Float]] = Seq(
    Seq(1.0f, 2.0f, -3.0f),
    Seq(0.5f, -0.25f, 4.0f),
    Seq(-1.5f, 0.125f, 2.5f),
    Seq(0.1f, 0.2f, 0.3f),
    Seq(-0.000001f, 123.456788f, 0.0f))

  private def brute: (Long, Array[Long], Array[Array[Long]]) = {
    val d = 3
    val s = new Array[Long](d)
    val p = Array.ofDim[Long](d, d)
    for (v <- vecs) {
      val micros = v.map(x => OuterProductSum.micros6(x.toDouble)).toArray
      val xd = micros.map(_.toDouble / 1e6)
      for (i <- 0 until d) {
        s(i) += micros(i)
        for (j <- 0 until d) p(i)(j) += OuterProductSum.roundAway(xd(i) * xd(j) * 1e9)
      }
    }
    (vecs.length.toLong, s, p)
  }

  test("aggregator equals the closed form, across forced partition merges") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    for (parts <- Seq(1, 3, 5)) {
      val df = vecs.toDF("embedding").repartition(parts)
      val (n, s, look) = OuterProductSum.unpack(
        df.agg(OuterProductSum.of(col("embedding"), 3)).collect()(0))
      val (bn, bs, bp) = brute
      assert(n == bn)
      assert(s.toSeq == bs.toSeq, s"per-dim sums diverged at $parts partitions")
      for (i <- 0 until 3; j <- 0 until 3)
        assert(look(i, j) == bp(i)(j), s"($i,$j) at $parts partitions")
    }
  }

  test("roundAway is C round: half away from zero both signs") {
    assert(OuterProductSum.roundAway(2.5) == 3L)
    assert(OuterProductSum.roundAway(-2.5) == -3L)
    assert(OuterProductSum.roundAway(2.4999999) == 2L)
    assert(OuterProductSum.roundAway(-0.5) == -1L)
    assert(OuterProductSum.roundAway(0.0) == 0L)
  }

  test("micros6 is 6-dp HALF_UP in exact micros") {
    assert(OuterProductSum.micros6(0.1234565) == 123457L ||
      OuterProductSum.micros6(0.1234565) == 123456L) // depends on the double below/above the tie
    assert(OuterProductSum.micros6(1.0) == 1000000L)
    assert(OuterProductSum.micros6(-2.5e-7) == 0L)
    assert(OuterProductSum.micros6(-1.5) == -1500000L)
  }
}
