package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.functions.TextFunctions

/** Native shingling: exact equivalence with the interpreted HOF combo
  * it replaced (split → sliding concat → distinct), including the
  * empty-token edge cases Spark's split(-1 limit) produces. */
class WordShinglesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** The original HOF implementation, kept here as the semantic oracle. */
  private def hofShingles(text: org.apache.spark.sql.Column, k: Int) = {
    val t = split(text, " ")
    when(size(t) >= k,
      array_distinct(transform(
        sequence(lit(0), size(t) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(t, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  private val fixtures = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b a b a b a b", // heavy shingle repetition
    "a b", // shorter than k=3
    "", // single empty token
    "one", "one two three",
    "double  space keeps empty token", // split(-1) keeps ""
    "trailing space ") // trailing empty token

  test("agrees with the HOF combo on every fixture, for k=2..4") {
    val spark0 = spark
    import spark0.implicits._
    val df = fixtures.toDF("text")
    for (k <- 2 to 4) {
      val rows = df.select(
        TextFunctions.shingles(col("text"), k).as("native"),
        hofShingles(col("text"), k).as("hof"))
        .collect()
      rows.zip(fixtures).foreach { case (r, fx) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"k=$k text='$fx'")
      }
    }
  }

  test("null text → empty array through TextFunctions (HOF contract)") {
    val spark0 = spark
    import spark0.implicits._
    val r = Seq(Option.empty[String]).toDF("text")
      .select(TextFunctions.shingles(col("text"), 3).as("s")).head()
    assert(r.getSeq[String](0) == Seq.empty)
  }

  test("distinct in first-occurrence order") {
    val spark0 = spark
    import spark0.implicits._
    val r = Seq("x y x y x y").toDF("text")
      .select(TextFunctions.shingles(col("text"), 2).as("s")).head()
    assert(r.getSeq[String](0) == Seq("x y", "y x"))
  }
}
