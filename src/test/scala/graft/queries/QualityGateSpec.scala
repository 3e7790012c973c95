package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** The composed quality gate must agree, reason by reason, with the
  * standalone oracle-proven signal queries on the same lake — a drift
  * between the shared implementations and the composition (a threshold
  * fork, a changed rounding, a lost signal) breaks this equality even
  * though each query stays individually green. */
class QualityGateSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("gate verdicts recombine exactly from the standalone signal queries") {
    val rep = SparkEntry.queries("corpus_repetition_stats")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val ppl = SparkEntry.queries("doc_perplexity")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    val out = SparkEntry.queries("corpus_quality_gate")(spark, dir).collect()
    assert(out.length == rep.size && out.length == ppl.size)
    val seenReasons = scala.collection.mutable.Set[String]()
    out.foreach { r =>
      val (id, n) = (r.getLong(0), r.getLong(3))
      val reasons = r.getString(7).split(",").filter(_.nonEmpty).toSet
      seenReasons ++= reasons
      val expected = Set(
        if (rep(id)) Some("repetitive") else None,
        if (ppl(id)) Some("high_perplexity") else None,
        if (n < 16) Some("too_short") else None,
        if (n > 96) Some("too_long") else None).flatten
      assert(reasons == expected, s"doc $id: $reasons != $expected")
      assert(r.getBoolean(8) == expected.isEmpty, s"doc $id keep flag")
    }
    // every reason fires somewhere on the lake, and some docs survive —
    // the gate is neither vacuous nor a rubber stamp
    assert(seenReasons == Set("repetitive", "high_perplexity",
      "too_short", "too_long"), s"unexercised reasons: $seenReasons")
    assert(out.exists(_.getBoolean(8)) && !out.forall(_.getBoolean(8)))
  }
}
