package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry, Tables}

/** Quality of the power-iteration principal component: the DuckDB
  * differential proves the arithmetic replays bit-for-bit; this spec
  * proves the RESULT means something — the reported direction captures
  * substantially more variance than an average direction (Rayleigh
  * quotient vs trace/dims), is unit-norm, and is deterministic.
  */
class EmbPcaSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("loading is unit-norm and its Rayleigh quotient beats the mean eigenvalue") {
    import spark.implicits._
    val df = SparkEntry.queries("emb_pca_power")(spark, dir)
    val v = df.collect().sortBy(_.getAs[Long]("dim")).map(_.getAs[Double]("loading"))
    df.unpersist()
    assert(v.length == 64)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"loading not unit-norm: $norm")

    // brute covariance from the raw embeddings (independent spec-side math)
    val rows = Tables.embeddings(spark, dir)
      .select("embedding").as[Seq[Float]].collect().map(_.map(_.toDouble).toArray)
    val n = rows.length
    val d = 64
    val mu = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    def cov(i: Int, j: Int) = rows.map(r => (r(i) - mu(i)) * (r(j) - mu(j))).sum / n
    val trace = (0 until d).map(i => cov(i, i)).sum
    val rayleigh = (0 until d).map(i =>
      (0 until d).map(j => v(i) * cov(i, j) * v(j)).sum).sum
    assert(rayleigh > 1.2 * trace / d,
      s"component captures no more variance than average: rayleigh=$rayleigh trace/d=${trace / d}")
  }

  test("deterministic across runs") {
    val a = SparkEntry.queries("emb_pca_power")(spark, dir)
    val r1 = a.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    a.unpersist()
    val b = SparkEntry.queries("emb_pca_power")(spark, dir)
    val r2 = b.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    b.unpersist()
    assert(r1 == r2)
  }
}
