package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** The perplexity gate's OOV path on a planted fixture (the sf lakes
  * share one vocabulary across languages, so out-of-vocabulary tokens
  * never occur there — this is where the smoothing floor is proven):
  * a token unseen by the English LM must score the add-one floor
  * `1/(t+v)`, and the whole score must reproduce the documented
  * decimal-term arithmetic exactly.
  */
class PerplexitySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def term(p: Double): java.math.BigDecimal =
    new java.math.BigDecimal(-math.log(p))
      .setScale(12, java.math.RoundingMode.HALF_UP)

  test("OOV tokens score the smoothing floor; scores replay the decimal arithmetic") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("perp_docs").toString
    // en LM corpus: tokens a(2) b(2) c(1) → t=5, v=3
    // doc 2 holds 'zz' — OOV to the en LM → floor 1/(5+3)
    Seq(
      (1L, "a b c a b", "en", "web"),
      (2L, "a zz", "fr", "web"))
      .map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("doc_perplexity")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap

    val pA = 3.0 / 8   // (2+1)/(5+3)
    val pB = 3.0 / 8
    val pC = 2.0 / 8
    val floor = 1.0 / 8
    def avg(ts: Seq[java.math.BigDecimal], n: Int): Double = {
      val sum = ts.reduce(_.add(_))
      BigDecimal(sum.doubleValue() / n).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val (n1, s1) = out(1L)
    assert(n1 == 5L)
    assert(s1 == avg(Seq(term(pA), term(pB), term(pC), term(pA), term(pB)), 5),
      s"in-vocab doc score $s1")
    val (n2, s2) = out(2L)
    assert(n2 == 2L)
    assert(s2 == avg(Seq(term(pA), term(floor)), 2), s"OOV doc score $s2")
    // the OOV-bearing doc is the more surprising one
    assert(s2 > s1)
  }
}
