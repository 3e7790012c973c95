package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.functions.TextFunctions

/** The fused signature vector must equal the explode + min-aggregate
  * form component-for-component (that form is also what the DuckDB
  * oracle computes). */
class MinHashSignaturesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("fused signatures == explode+groupBy min aggregation, per component") {
    val spark0 = spark
    import spark0.implicits._
    val nPerm = 8
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a b a b a b a b a b"),
      (3L, "one two three four five six"))
      .toDF("doc_id", "text")
    val withSh = docs.select(col("doc_id"),
      TextFunctions.shingles(col("text"), 3).as("sh"))
    val fused = withSh
      .select(col("doc_id"), MinHashSignatures.of(col("sh"), nPerm).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val agg = withSh
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .groupBy("doc_id")
      .agg(TextFunctions.minhashAgg(col("shingle"), 0).as("h0"),
        (1 until nPerm).map(i =>
          TextFunctions.minhashAgg(col("shingle"), i).as(s"h$i")): _*)
      .collect().map(r => r.getLong(0) ->
        (0 until nPerm).map(i => r.getString(i + 1))).toMap
    assert(fused.keySet == agg.keySet)
    fused.foreach { case (id, hs) => assert(hs == agg(id), s"doc $id") }
  }

  test("empty and null shingle arrays → null signature") {
    val spark0 = spark
    import spark0.implicits._
    val r = Seq(Option.empty[String], Option("a b")).toDF("text")
      .select(MinHashSignatures.of(
        graft.expressions.WordShingles.of(col("text"), 3), 4).as("hs"))
      .collect()
    assert(r.forall(_.isNullAt(0))) // null text and a 2-token doc
  }

  test("null shingle elements are skipped; all-null array → null") {
    // SQL-registered, so arbitrary containsNull=true arrays reach it:
    // min(md5('p|' || NULL)) skips the NULL, so must the fused form.
    val spark0 = spark
    import spark0.implicits._
    val out = Seq(
      (1L, Seq[String]("a", "b")),
      (2L, Seq[String]("a", null, "b")),
      (3L, Seq[String](null, null)))
      .toDF("id", "sh")
      .select(col("id"), MinHashSignatures.of(col("sh"), 4).as("hs"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(out(1L) != null && out(1L) == out(2L),
      "a null element must not change the signature")
    assert(out(3L) == null, "an all-null shingle array has no signature")
  }
}
