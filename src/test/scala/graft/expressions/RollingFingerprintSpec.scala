package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Winnowing fingerprint semantics: the guarantee that makes it a
  * near-dup key is that any shared character run of length ≥ k+w-1
  * forces at least one shared selected hash, regardless of what
  * surrounds the run. */
class RollingFingerprintSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def fp(texts: String*): Seq[Set[Long]] = {
    val spark0 = spark
    import spark0.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), RollingFingerprint.of(col("text"), 8, 4).as("fp"))
      .collect().sortBy(_.getLong(0))
      .map(_.getSeq[Long](1).toSet).toSeq
  }

  test("documents sharing a long run share a selected hash; disjoint texts don't") {
    val run = "the common quoted passage that both documents contain"
    val Seq(a, b, c) = fp(
      s"prefix one $run suffix alpha",
      s"completely different lead-in $run and another tail",
      "no overlap here at all with anything else whatsoever")
    assert(a.intersect(b).nonEmpty, "shared run must force a shared hash")
    assert(a.intersect(c).isEmpty && b.intersect(c).isEmpty)
  }

  test("identical text → identical fingerprint; edit inside the only run changes it") {
    val Seq(a, b, c) = fp("same exact text body", "same exact text body",
      "same exXct text body")
    assert(a == b)
    assert(a != c)
  }

  test("short and sub-k documents degrade cleanly") {
    val Seq(tiny, oneWindow) = fp("abc", "abcdefghij") // < k=8; m=3 < w=4
    assert(tiny.isEmpty)
    assert(oneWindow.size == 1) // single window over all k-grams
  }

  test("selected hashes are sorted distinct canonical mod-P values") {
    val Seq(a) = fp("a somewhat longer document with enough text to winnow properly")
    assert(a.forall(h => h >= 0 && h < RollingHashUtil.P))
    val asSeq = {
      val spark0 = spark
      import spark0.implicits._
      Seq(("x", "a somewhat longer document with enough text to winnow properly"))
        .toDF("id", "text")
        .select(RollingFingerprint.of(col("text"), 8, 4)).head().getSeq[Long](0)
    }
    assert(asSeq == asSeq.sorted && asSeq.distinct == asSeq)
  }
}
