package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** Statistical sanity of the per-dimension embedding moments and the
  * plan shape of the standardization pass (the differential proves the
  * arithmetic; these pin the semantics and the scale contract).
  */
class EmbDimStatsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("standardized components have ~zero mean and ~unit variance per dim") {
    val df = SparkEntry.queries("emb_standardize")(spark, dir)
    val rows = df.collect()
    df.unpersist()
    val byDim = rows.groupBy(_.getAs[Long]("dim"))
    assert(byDim.size == 64, s"expected 64 dims, got ${byDim.size}")
    for ((dim, zs) <- byDim) {
      val z = zs.map(_.getAs[Double]("z"))
      val mean = z.sum / z.length
      val varz = z.map(v => (v - mean) * (v - mean)).sum / z.length
      assert(math.abs(mean) < 1e-4, s"dim $dim: mean $mean not ~0")
      assert(math.abs(varz - 1.0) < 1e-3, s"dim $dim: variance $varz not ~1")
    }
  }

  test("standardize broadcasts the moments — the corpus side never shuffles pre-sort") {
    val df = SparkEntry.queries("emb_standardize")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    df.unpersist()
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"moments join is not broadcast:\n$plan")
    // dim-stats agg + broadcast + output range sort; anything above 4
    // static exchanges means the corpus-side explode started shuffling
    val n = "Exchange".r.findAllIn(plan).length
    assert(n <= 4, s"exchange count regressed to $n:\n$plan")
  }

  test("dim stats: variance positive, min <= mean <= max, full dim coverage") {
    val df = SparkEntry.queries("emb_dim_stats")(spark, dir)
    val rows = df.collect()
    df.unpersist()
    assert(rows.length == 64)
    for (r <- rows) {
      assert(r.getAs[Double]("var_x") > 0.0)
      assert(r.getAs[Double]("min_x") <= r.getAs[Double]("mean_x"))
      assert(r.getAs[Double]("mean_x") <= r.getAs[Double]("max_x"))
      assert(r.getAs[Long]("n_vectors") > 0)
    }
  }
}
