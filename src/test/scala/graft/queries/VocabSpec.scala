package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** Vocabulary + encoding invariants on real testdata (sf0.001): dense
  * deterministic ids, and the encode→decode round trip reproducing
  * every in-vocabulary token in order. */
class VocabSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("ids are dense 0..K-1 and ordered by (freq desc, token)") {
    val rows = SparkEntry.queries("corpus_vocab")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).toSeq == rows.indices.map(_.toLong))
    val order = rows.map { case (t, f, _) => (-f, t) }
    assert(order.sorted.toSeq == order.toSeq, "ids must follow (freq desc, token)")
  }

  test("encode/decode round-trips every in-vocabulary token in order") {
    val vocab = SparkEntry.queries("corpus_vocab")(spark, dir)
      .collect().map(r => r.getLong(2) -> r.getString(0)).toMap
    val encoded = SparkEntry.queries("corpus_token_ids")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val texts = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(encoded.keySet == texts.keySet)
    var oovSeen = 0L
    texts.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val (n, oov, idsStr) = encoded(id)
      val ids = idsStr.split(" ", -1).map(_.toLong)
      assert(n == toks.length && ids.length == toks.length)
      assert(oov == ids.count(_ == -1L))
      oovSeen += oov
      toks.zip(ids).foreach { case (tok, tid) =>
        if (tid >= 0) assert(vocab(tid) == tok, s"doc $id: id $tid != '$tok'")
      }
    }
    // the fixture must exercise BOTH branches: some tokens out of the
    // top-K vocabulary, most in it
    assert(oovSeen > 0, "no OOV tokens — the -1 branch is untested")
    assert(oovSeen < encoded.values.map(_._1).sum / 2, "mostly OOV — vocab too small")
  }
}
