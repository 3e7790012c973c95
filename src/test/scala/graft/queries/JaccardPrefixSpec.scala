package graft.queries

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** The planted case that separates the exact-complete prefix-filter
  * join from the df-valve screen: a cluster of 12 IDENTICAL documents.
  * Every shingle those documents share has document frequency 12 —
  * past `dedup_ngram_jaccard`'s df ≤ 10 candidate valve, so the valve
  * query reports NO pairs for the cluster, while the prefix-filter
  * join must report all C(12,2) = 66 pairs at Jaccard 1.0. A distinct
  * singleton document must pair with nobody. */
class JaccardPrefixSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SharedSpark.spark
  private var dir: String = _

  override def beforeAll(): Unit = {
    val spark0 = spark
    import spark0.implicits._
    dir = Files.createTempDirectory("ppj_lake").toString
    val dupText = (1 to 40).map(i => s"w${i % 12} common run token").mkString(" ")
    val loneText = (1 to 40).map(i => s"z$i solitary stream word").mkString(" ")
    val docs = (0L until 12L).map(i => (i, dupText, "en", "srcA", dupText.length.toLong)) :+
      ((99L, loneText, "en", "srcB", loneText.length.toLong))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
  }

  test("prefix filter finds the high-df duplicate cluster the valve cannot") {
    val prefix = SparkEntry.queries("dedup_jaccard_prefix")(spark, dir).collect()
    assert(prefix.length == 66, s"expected C(12,2)=66 pairs, got ${prefix.length}")
    assert(prefix.forall(_.getDouble(2) == 1.0))
    assert(prefix.forall(r => r.getLong(0) < 12 && r.getLong(1) < 12))

    val valve = SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).collect()
    assert(valve.isEmpty,
      "the df<=10 valve must (by design) miss the df=12 cluster — if this " +
        "starts passing, the valve semantics changed and the prefix join's " +
        "scaladoc contrast needs updating")
  }
}
