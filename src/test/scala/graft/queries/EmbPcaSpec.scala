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

  test("top-2 plane: both unit-norm, near-orthogonal, PC2 consistent with PC1") {
    val df = SparkEntry.queries("emb_pca_top2")(spark, dir)
    val rows = df.collect().sortBy(_.getAs[Long]("dim"))
    df.unpersist()
    assert(rows.length == 64)
    val v1 = rows.map(_.getAs[Double]("loading1"))
    val v2 = rows.map(_.getAs[Double]("loading2"))
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm(v1) - 1.0) < 1e-3)
    assert(math.abs(norm(v2) - 1.0) < 1e-3)
    // deflation + 9-dp rounding on a flat random spectrum leaves the
    // pair NEAR-orthogonal, not exactly — bound it, don't assume it
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 0.15, s"components far from orthogonal: dot=$dot")
    // loading1 must be the emb_pca_power component, verbatim
    val df1 = SparkEntry.queries("emb_pca_power")(spark, dir)
    val l1 = df1.collect().sortBy(_.getAs[Long]("dim")).map(_.getAs[Double]("loading"))
    df1.unpersist()
    assert(v1.toSeq == l1.toSeq, "top2's first component drifted from emb_pca_power")
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
