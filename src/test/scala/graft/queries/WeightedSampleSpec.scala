package graft.queries

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** Independent reference check of the weighted sampler: a plain-Scala
  * Efraimidis-Spirakis selection (same hash, same ln(u)/w key, no
  * Spark) must pick the identical ranked set — and the weighting must
  * be non-vacuous: a heavy doc with a mediocre hash displaces a light
  * doc with a better one. */
class WeightedSampleSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SharedSpark.spark
  private var dir: String = _

  // 40 docs across two langs with token counts spread 1..400
  private val docs: Seq[(Long, String, String)] =
    (1L to 40L).map { id =>
      val lang = if (id % 2 == 0) "en" else "de"
      val n = if (id % 7 == 0) 400 else 1 + (id % 5).toInt
      (id, (1 to n).map(j => s"w$j").mkString(" "), lang)
    }

  override def beforeAll(): Unit = {
    val spark0 = spark
    import spark0.implicits._
    dir = Files.createTempDirectory("wsample_docs").toString
    docs.map { case (id, t, l) => (id, t, l, "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
  }

  private def knuthHash(id: Long): Long = {
    val x = id % 4294967296L
    val lo = x % 65536L
    val hi = x / 65536L
    (lo * 2654435761L % 4294967296L +
      hi * 2654435761L % 4294967296L * 65536L % 4294967296L) % 4294967296L
  }

  test("query equals the plain-Scala reference selection; weighting is non-vacuous") {
    val k = 15
    val expected = docs
      .map { case (id, t, l) =>
        val w = t.split(" ").length.toDouble
        val raw = math.log((knuthHash(id) + 1).toDouble / 4294967296.0) / w
        // mirror the query's 9-dp HALF_UP quantization
        val key = java.math.BigDecimal.valueOf(raw)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
        (l, id, key)
      }
      .groupBy(_._1)
      .flatMap { case (l, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex
          .map { case ((_, id, _), i) => (l, (i + 1).toLong, id) }
      }.toSet
    val got = SparkEntry.queries("mix_weighted_sample")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"got $got\nexpected $expected")
    // non-vacuity: every 400-token doc (ids 7,14,21,28,35) must be
    // drawn — u^(1/400) ≈ 1 dominates the 1..6-token docs
    val drawn = got.map(_._3)
    Seq(7L, 14L, 21L, 28L, 35L).foreach(id =>
      assert(drawn.contains(id), s"heavy doc $id not drawn"))
    // and the draw must differ from the UNWEIGHTED hash order (the
    // fixedSample ordering) — otherwise the weight changed nothing
    val unweightedTop = docs.map { case (id, _, l) => (l, id, knuthHash(id)) }
      .groupBy(_._1)
      .flatMap { case (_, rows) => rows.sortBy(r => (r._3, r._2)).take(k) }
      .map(_._2).toSet
    assert(drawn != unweightedTop, "weighted draw collapsed to the unweighted one")
  }
}
