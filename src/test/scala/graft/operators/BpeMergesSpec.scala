package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The DataFrame BPE loop must reproduce the classic merge semantics —
  * overlapping pair COUNTS but greedy left-to-right non-overlapping
  * APPLICATION — against an independent driver-side reference, converge
  * deterministically under ties, stop early when no pairs remain, and
  * release every per-round checkpoint block. */
class BpeMergesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def df(words: Seq[(String, Long)]) = {
    val spark0 = spark
    import spark0.implicits._
    words.toDF("w", "freq")
  }

  /** Independent reference: classic list-of-symbols BPE (Sennrich-style
    * get_stats + merge), no strings-with-delimiters trick. */
  private def reference(
      words: Seq[(String, Long)], k: Int): Seq[(Long, String, String, Long)] = {
    var vocab = words.map { case (w, f) => (w.map(_.toString).toList, f) }
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var round = 0
    var done = false
    while (round < k && !done) {
      round += 1
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((round.toLong, l, r, cnt))
        vocab = vocab.map { case (syms, f) =>
          val merged = scala.collection.mutable.ListBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += l + r; i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.toList, f)
        }
      }
    }
    out.toSeq
  }

  test("greedy non-overlapping application, overlapping counting (aaaa)") {
    // round 1: 'aaaa' has THREE overlapping (a,a) pairs, ×2 freq = 6;
    // applying the merge greedily leaves [aa, aa], NOT [aa, a, a]
    val got = BpeMerges.learn(df(Seq(("aaaa", 2L))), "w", "freq", 3)
    assert(got == Seq((1L, "a", "a", 6L), (2L, "aa", "aa", 2L)))
    // round 3 found no pairs (single symbol left) → early stop, 2 rows
  }

  test("matches the independent reference on a mixed vocabulary") {
    val words = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
      ("aaa", 4L), ("banana", 2L), ("b", 7L))
    val got = BpeMerges.learn(df(words), "w", "freq", 10)
    assert(got == reference(words, 10), s"diverged from reference:\n$got")
  }

  test("frequency ties break by (lhs, rhs) identically to the reference") {
    val words = Seq(("zy", 3L), ("ab", 3L), ("cd", 3L))
    val got = BpeMerges.learn(df(words), "w", "freq", 3)
    assert(got == reference(words, 3))
    assert(got.head._2 == "a", "tie must break to the lexicographic pair")
  }

  test("single-char vocabulary yields zero merges without failing") {
    assert(BpeMerges.learn(df(Seq(("a", 5L), ("b", 2L))), "w", "freq", 4).isEmpty)
  }

  test("per-round checkpoint blocks are all released") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    BpeMerges.learn(df(Seq(("newest", 6L), ("widest", 3L))), "w", "freq", 6)
    assert(sc.getPersistentRDDs.size == before,
      "BPE loop stranded checkpoint storage")
  }
}
