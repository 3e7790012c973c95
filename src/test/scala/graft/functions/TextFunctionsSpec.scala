package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Text-analysis column library: tokenization, shingles, language ID,
  * fingerprints — the LLM-pipeline primitives. */
class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def df(t: String) = Seq(t).toDF("text")

  test("tokenCount and tokenOccurrences") {
    val r = df("the cat and the hat")
      .select(TextFunctions.tokenCount(col("text")).as("n"),
        TextFunctions.tokenOccurrences(col("text"), "the").as("t")).head
    assert(r.getLong(0) == 5)
    assert(r.getLong(1) == 2)
  }

  test("bpeTokenCount: digits and punctuation split off, unlike whitespace count") {
    // "don't pay $12.50!" → don | ' | t | pay | $ | 12 | . | 50 | !  = 9
    val r = df("don't pay $12.50!")
      .select(TextFunctions.bpeTokenCount(col("text")).as("b"),
        TextFunctions.tokenCount(col("text")).as("w")).head
    assert(r.getLong(0) == 9)
    assert(r.getLong(1) == 3) // whitespace counting hides the splits
    assert(df("").select(TextFunctions.bpeTokenCount(col("text"))).head.getLong(0) == 0)
  }

  test("shingles: k=3 distinct word shingles; short docs → empty") {
    val r = df("a b c d c d")  // windows: "a b c","b c d","c d c","d c d"
      .select(TextFunctions.shingles(col("text"), 3).as("s"))
      .head.getSeq[String](0)
    assert(r == Seq("a b c", "b c d", "c d c", "d c d"))
    val short = df("a b").select(TextFunctions.shingles(col("text"), 3).as("s"))
      .head.getSeq[String](0)
    assert(short == Seq())
  }

  test("languageId: marker argmax with deterministic tie-break, und fallback") {
    val markers = Seq(
      "en" -> Seq("the", "a"),
      "es" -> Seq("la", "el"),
      "de" -> Seq("der", "und"))
    def lid(t: String): String =
      df(t).select(TextFunctions.languageId(col("text"), markers).as("l")).head.getString(0)
    assert(lid("the cat sat on the mat") == "en")
    assert(lid("la casa y el perro") == "es")
    assert(lid("der hund und die katze") == "de")
    assert(lid("xyz qrs") == "und")
    assert(lid("the la") == "en") // tie → earlier marker entry wins
  }

  test("vocabFingerprint: order-insensitive, content-sensitive") {
    val a = df("red blue green").select(TextFunctions.vocabFingerprint(col("text"))).head.getString(0)
    val b = df("green red blue red").select(TextFunctions.vocabFingerprint(col("text"))).head.getString(0)
    val c = df("red blue yellow").select(TextFunctions.vocabFingerprint(col("text"))).head.getString(0)
    assert(a == b) // same vocabulary, different order/multiplicity
    assert(a != c)
  }

  test("qualityScore: in-band length with stopwords beats short garbage") {
    val good = ("the quick brown fox " * 10).trim // 40 tokens incl 10 'the'
    val bad = "zz top"
    val g = df(good).select(TextFunctions.qualityScore(col("text"))).head.getDouble(0)
    val b = df(bad).select(TextFunctions.qualityScore(col("text"))).head.getDouble(0)
    assert(g > 0.5 && g <= 1.0)
    assert(b == 0.0)
  }

  test("minhashAgg: identical shingle sets → identical signatures") {
    val docs = Seq((1L, "w1 w2 w3 w4"), (2L, "w1 w2 w3 w4"), (3L, "zz yy xx ww"))
      .toDF("id", "text")
      .select(col("id"), explode(TextFunctions.shingles(col("text"), 3)).as("sh"))
    val sig = docs.groupBy("id").agg(
      TextFunctions.minhashAgg(col("sh"), 0).as("h0"),
      TextFunctions.minhashAgg(col("sh"), 1).as("h1"))
    val byId = sig.collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(byId(1L) == byId(2L))
    assert(byId(1L) != byId(3L))
  }
}
