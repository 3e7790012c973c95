package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** Structural properties of the ExactSubstr-style duplicated-span
  * detector that the DuckDB differential (an identical replay) cannot
  * prove on its own: spans are genuinely maximal and disjoint, every
  * reported span really does occur verbatim in another document, and
  * the sf0.01 lake exercises both polarities.
  */
class DupSpansSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"
  private val L = 8

  test("spans are disjoint, maximal (gap > L between islands), and non-vacuous") {
    val df = SparkEntry.queries("corpus_dup_spans")(spark, dir)
    val rows = df.collect()
    df.unpersist()
    assert(rows.nonEmpty, "no duplicated span at sf0.01 — planted near-dups missing?")

    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size > 10, s"suspiciously few docs with dup spans: ${byDoc.size}")
    for ((docId, spans) <- byDoc) {
      val sorted = spans.sortBy(_.getAs[Long]("span_start"))
      sorted.foreach { r =>
        assert(r.getAs[Long]("span_len") ==
          r.getAs[Long]("span_end") - r.getAs[Long]("span_start") + 1)
        assert(r.getAs[Long]("span_len") >= L, s"doc $docId: span shorter than L")
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // disjoint AND un-mergeable: next hit start must be > prev
          // island's last hit start + L, so start gap > span_end - L + 1 + L
          assert(b.getAs[Long]("span_start") > a.getAs[Long]("span_end") + 1,
            s"doc $docId: spans touch or overlap — islands merge is broken")
        case _ => ()
      }
    }
  }

  test("every reported span occurs verbatim in some OTHER document") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val tokens = docs.map { case (id, t) => id -> t.split(" ") }.toMap

    val df = SparkEntry.queries("corpus_dup_spans")(spark, dir)
    val spans = df.collect()
    df.unpersist()
    // brute-force witness check on a deterministic slice (full check is
    // quadratic in corpus size; 25 spans is plenty to catch an off-by-one)
    for (r <- spans.sortBy(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"))).take(25)) {
      val docId = r.getAs[Long]("doc_id")
      val start = r.getAs[Long]("span_start").toInt
      val toks = tokens(docId)
      // the FIRST L-gram of the span must appear in another doc (the
      // island seed; later grams of a merged span may come from others)
      val gram = toks.slice(start - 1, start - 1 + L).mkString(" ")
      val foundElsewhere = tokens.exists { case (otherId, ot) =>
        otherId != docId && ot.sliding(L).exists(_.sameElements(gram.split(" ")))
      }
      assert(foundElsewhere, s"doc $docId span@$start: first gram '$gram' has no external witness")
    }
  }

  test("profile rollup: both polarities, fraction bounds, mass consistency") {
    val df = SparkEntry.queries("corpus_dup_profile")(spark, dir)
    val rows = df.collect()
    df.unpersist()
    assert(rows.length > 400)
    assert(rows.exists(_.getAs[Long]("n_spans") > 0), "no duplicated doc")
    assert(rows.exists(_.getAs[Long]("n_spans") == 0), "no clean doc")
    for (r <- rows) {
      val f = r.getAs[Double]("dup_fraction")
      assert(f >= 0.0 && f <= 1.0, s"doc ${r.getAs[Long]("doc_id")}: fraction $f out of range")
      assert(r.getAs[Long]("dup_tokens") <= r.getAs[Long]("n_tokens"))
    }
  }
}
