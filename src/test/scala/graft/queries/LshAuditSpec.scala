package graft.queries

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** Independent plain-Scala replication of the MinHash estimator audit
  * (`dedup_lsh_audit`): shingling, the 12 md5 min-wise components, the
  * 4-band candidacy rule, exact Jaccard, and the component-agreement
  * estimate are ALL re-derived here from first principles — so a bug in
  * the banding, the signature expression wiring, or the agreement
  * arithmetic cannot self-confirm through the shared DuckDB oracle's
  * identical CTEs. */
class LshAuditSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SharedSpark.spark
  private var dir: String = _

  private val base =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
  private val docs = Seq(
    (1L, base, "en", "web"),                       // anchor
    (2L, base, "en", "web"),                       // exact copy → jaccard 1
    // near-copy: 13 distinct shingles, 10 shared → jaccard 10/13, which
    // is NOT a multiple of 1/12, so it can never coincide with the
    // 12-quantized estimate (the exact-copy pair covers the err=0 path)
    (3L, base + " mike november oscar", "en", "web"),
    (4L, "one two three four five six seven eight nine ten", "en", "web"),
    (5L, "uno dos tres cuatro cinco seis siete ocho nueve", "es", "web"))

  override def beforeAll(): Unit = {
    val spark0 = spark
    import spark0.implicits._
    dir = Files.createTempDirectory("lsh_audit_docs").toString
    docs.map { case (id, text, lang, source) =>
      (id, text, lang, source, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("audit rows equal the first-principles MinHash/banding replay") {
    val nPerm = 12
    def shingles(text: String): Set[String] =
      text.split(" ").toSeq.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    def sig(sh: Set[String]): IndexedSeq[String] =
      (0 until nPerm).map(p => sh.map(s => md5hex(s"p$p|$s")).min)
    val byId = docs.map(d => d._1 -> sig(shingles(d._2))).toMap
    val shById = docs.map(d => d._1 -> shingles(d._2)).toMap

    // candidacy: any of the 4 consecutive 3-component bands identical
    val ids = docs.map(_._1)
    val expected = (for {
      a <- ids; b <- ids if a < b
      bands = (0 until 4).count(k =>
        (3 * k until 3 * k + 3).forall(i => byId(a)(i) == byId(b)(i)))
      if bands > 0
    } yield {
      val (sa, sb) = (shById(a), shById(b))
      val inter = (sa intersect sb).size.toDouble
      val jac = BigDecimal(inter / (sa.size + sb.size - inter))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val est = BigDecimal(
        (0 until nPerm).count(i => byId(a)(i) == byId(b)(i)) / 12.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val err = BigDecimal(est - jac)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, jac, est, err)
    }).sortBy(r => (r._1, r._2))

    val out = SparkEntry.queries("dedup_lsh_audit")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
      .toSeq
    assert(out == expected, s"audit mismatch:\n got $out\n exp $expected")

    // fixture non-vacuity: the exact copy is a zero-error candidate and
    // the near-copy's estimate actually disagrees somewhere or the
    // estimator path would be untested (est is 12-quantized, jaccard
    // is not — on the near-copy pair they cannot coincide)
    val exact = out.find(r => r._1 == 1L && r._2 == 2L).get
    assert(exact._3 == 1.0 && exact._4 == 1.0 && exact._5 == 0.0)
    val near = out.filter(r => r._2 == 3L && (r._1 == 1L || r._1 == 2L))
    assert(near.nonEmpty, "near-copy pair must be an LSH candidate")
    assert(near.forall(r => r._5 != 0.0), s"near-copy error vacuous: $near")
    // the disjoint-vocabulary docs never become candidates
    assert(!out.exists(r => r._1 == 4L || r._2 == 4L || r._2 == 5L))
  }
}
