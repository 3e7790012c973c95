package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** Semantics of the corpus PII scan beyond what the DuckDB differential
  * proves: masking is complete (no needle survives in clean_text),
  * idempotent (re-scanning masked text finds nothing), and the
  * `has_pii` flag is non-vacuous in BOTH directions on the sf0.01
  * lake. Categories are checked individually so a single regex typo
  * can't hide behind the aggregate flag.
  */
class PiiRedactSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private val needleRes = CurationQueries.PiiNeedles.map { case (cat, re, tag) => (cat, re.r, tag) }

  test("masking is complete and both flag polarities occur per category") {
    val df = SparkEntry.queries("corpus_pii_redact")(spark, dir)
    val rows = df.collect()
    df.unpersist()
    assert(rows.length > 400, s"unexpectedly few docs: ${rows.length}")

    // every category fires somewhere AND is absent somewhere
    for (cat <- Seq("email", "ssn", "phone", "ipv4")) {
      val counts = rows.map(_.getAs[Int](s"n_$cat"))
      assert(counts.exists(_ > 0), s"$cat never detected — fixture vacuous")
      assert(counts.exists(_ == 0), s"$cat detected everywhere — absence case vacuous")
    }
    assert(rows.exists(!_.getAs[Boolean]("has_pii")), "no clean document at sf0.01")
    assert(rows.exists(_.getAs[Boolean]("has_pii")), "no PII-bearing document at sf0.01")

    // completeness: no needle pattern survives in any masked text,
    // and each detected span left its category tag behind
    for (r <- rows) {
      val clean = r.getAs[String]("clean_text")
      for ((cat, re, tag) <- needleRes) {
        assert(re.findFirstIn(clean).isEmpty,
          s"doc ${r.getAs[Long]("doc_id")}: un-masked $cat span in: $clean")
        val n = r.getAs[Int](s"n_$cat")
        assert(re.findAllIn(clean).isEmpty && tag.r.findAllIn(clean).length == n,
          s"doc ${r.getAs[Long]("doc_id")}: expected $n $tag tags")
      }
    }
  }

  test("scan is idempotent: masking already-masked text changes nothing") {
    import spark.implicits._
    val masked = SparkEntry.queries("corpus_pii_redact")(spark, dir)
      .select("doc_id", "clean_text").as[(Long, String)].collect()
    val again = CurationQueries.piiScan(
      masked.toSeq.toDF("doc_id", "raw_text").withColumn(
        "source", org.apache.spark.sql.functions.lit("x")))
      .collect()
    assert(again.forall(!_.getAs[Boolean]("has_pii")),
      "re-scan of masked text still detects PII — masking not idempotent")
    assert(again.map(_.getAs[String]("clean_text")).toSeq ==
      masked.map(_._2).toSeq, "re-masking altered already-clean text")
  }
}
