package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** The stride-scheduling guarantee itself: EVERY prefix of the
  * interleaved order holds each language at ≈ its target share (the
  * property naive concatenation catastrophically lacks), and the order
  * is a permutation — no document lost or duplicated.
  */
class StrideInterleaveSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"
  private val targets = Map(
    "en" -> 0.40, "zh" -> 0.18, "es" -> 0.16, "de" -> 0.14, "fr" -> 0.12)

  test("every prefix tracks the target shares; the order is a permutation") {
    val df = SparkEntry.queries("mix_stride_interleave")(spark, dir)
    val rows = df.collect().sortBy(_.getAs[Long]("interleave_rank"))
    df.unpersist()
    assert(rows.length == 500)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 500, "not a permutation")
    assert(rows.map(_.getAs[Long]("interleave_rank")).toSeq == (1L to 500L), "rank gaps")

    // a language exhausted early would break tracking from then on;
    // sf0.01 language counts comfortably cover these prefixes
    for (n <- Seq(25, 50, 100, 200, 400)) {
      val prefix = rows.take(n).groupBy(_.getAs[String]("lang"))
      for ((lang, target) <- targets) {
        val share = prefix.getOrElse(lang, Array.empty).length.toDouble / n
        assert(math.abs(share - target) <= 2.0 / n + 0.02,
          s"prefix $n: $lang share $share vs target $target")
      }
    }
  }
}
