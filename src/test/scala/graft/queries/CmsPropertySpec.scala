package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The count-min guarantee, property-tested over seeded random
  * streams: for ANY input, the sketch estimate of a key is never
  * below its true count (cell sums only ever add colliding keys'
  * counts on top). Random streams drive keys into collision at the
  * deliberately narrow width, so the strict-overestimate branch is
  * exercised too, not just equality.
  */
class CmsPropertySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("CMS estimates never undercount, for any stream (12 seeded streams)") {
    val spark0 = spark
    import spark0.implicits._
    var sawOver = false
    (1 to 12).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(120)
      val words = List.fill(n)(s"k${1 + rnd.nextInt(40)}")
      val toks = words.toDF("tok")
      val grid = (0 until CurationQueries.CmsDepth).map(d =>
        struct(lit(d.toLong).as("d"),
          CurationQueries.cmsIdx(d, col("tok")).as("idx")))
      val cells = toks.select(explode(array(grid: _*)).as("c"))
        .groupBy(col("c.d").as("d"), col("c.idx").as("idx"))
        .agg(count(lit(1)).as("cell_cnt"))
      val est = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
        .select(col("tok"), col("exact_cnt"),
          explode(array(grid: _*)).as("c"))
        .join(cells, col("c.d") === cells("d") && col("c.idx") === cells("idx"))
        .groupBy("tok", "exact_cnt")
        .agg(min(col("cell_cnt")).as("cms_estimate"))
        .collect()
      assert(est.nonEmpty)
      est.foreach { r =>
        val (exact, e) = (r.getLong(1), r.getLong(2))
        assert(e >= exact,
          s"seed $seed undercount for ${r.getString(0)}: $e < $exact")
        if (e > exact) sawOver = true
      }
    }
    assert(sawOver, "no stream produced a collision — the property was never stressed")
  }
}
