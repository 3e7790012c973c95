package graft.queries

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** Semantic properties of `emb_hard_negatives` on PLANTED vectors (the
  * sf-lake rows exercise it end-to-end in the differential gate): the
  * nearest DIFFERENT-label vector must rank first, a same-label vector
  * must be excluded no matter how close it is, and the scores must
  * equal an independent plain-Scala replay of the quantized-integer
  * cosine. */
class HardNegativesSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SharedSpark.spark
  private var dir: String = _

  // anchor is vec_id 0 (the % 100 == 0 slice). vec 7 is almost the
  // anchor but SAME label → must never appear. vec 1 is close with a
  // different label → hardest negative. 3/4 fan out, 5 is opposite.
  private val vecs: Seq[(Long, Array[Float], Int)] = Seq(
    (0L, Array(1.0f, 0.1f, 0.0f, 0.0f), 0),
    (7L, Array(0.99f, 0.11f, 0.0f, 0.0f), 0),  // same label — excluded
    (1L, Array(0.95f, 0.2f, 0.1f, 0.0f), 1),   // hardest negative
    (3L, Array(0.3f, 0.9f, 0.2f, 0.1f), 2),
    (4L, Array(0.0f, 0.2f, 1.0f, 0.5f), 3),
    (5L, Array(-1.0f, 0.0f, 0.0f, 0.2f), 4))

  override def beforeAll(): Unit = {
    val spark0 = spark
    import spark0.implicits._
    dir = Files.createTempDirectory("hardneg_embs").toString
    vecs.map { case (id, v, l) => (id, v.toSeq, l) }
      .toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "CAST(embedding AS array<float>) AS embedding",
        "CAST(label AS int) AS label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("hard negatives: same-label excluded, ranking equals the quantized-cosine replay") {
    // independent replay: 1e-6 floor quantization, exact integer
    // dot/norms, 6-dp rounded double score
    def q(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1000000.0).toLong)
    val a = q(vecs.head._2)
    def cos(v: Array[Float]): Double = {
      val c = q(v)
      val dot = a.zip(c).map { case (x, y) => x * y }.sum.toDouble
      val na = math.sqrt(a.map(x => x * x).sum.toDouble)
      val nc = math.sqrt(c.map(x => x * x).sum.toDouble)
      BigDecimal(dot / (na * nc)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val expected = vecs.drop(1).filter(_._3 != 0)
      .map { case (id, v, l) => (id, l, cos(v)) }
      .sortBy { case (id, _, c) => (-c, id) }

    val out = SparkEntry.queries("emb_hard_negatives")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getDouble(5)))
    assert(out.forall(_._1 == 0L), "only vec 0 is an anchor in this fixture")
    // the same-label near-copy never appears
    assert(!out.exists(_._4 == 7L), s"same-label vector leaked: ${out.toSeq}")
    // ranks follow the replayed cosine order exactly, scores equal
    assert(out.map(_._4).toSeq == expected.map(_._1),
      s"order mismatch: ${out.toSeq} vs $expected")
    out.zip(expected).zipWithIndex.foreach {
      case (((_, al, rank, id, l, c), (refId, refL, refC)), i) =>
        assert(al == 0 && rank == i + 1 && id == refId && l == refL)
        assert(c == refC, s"vec $id cosine $c != replay $refC")
    }
    // the planted near-duplicate with a different label is rank 1
    assert(out.head._4 == 1L)
  }
}
