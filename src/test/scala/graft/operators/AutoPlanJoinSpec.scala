package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The stats → strategy loop must actually CLOSE: three fixtures (tiny
  * dimension / uniform big / one hot key) must take the three different
  * branches — plan-pinned, not just labeled — and every branch must
  * produce exactly the plain inner join's rows. */
class AutoPlanJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def big(rs: (Long, Long)*): DataFrame = {
    val s = spark; import s.implicits._
    rs.toDF("k", "v")
  }
  private def dim(rs: (Long, String)*): DataFrame = {
    val s = spark; import s.implicits._
    rs.toDF("k", "name")
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.select("k", "v", "name").collect().map(_.toSeq.toVector).toVector
      .sortBy(_.toString())

  test("tiny dimension side takes the broadcast branch (plan-pinned)") {
    val b = big((1L to 400L).map(i => (i % 20, i)): _*)
    val d = dim((0L until 20L).map(i => (i, s"n$i")): _*)
    val p = AutoPlanJoin.inner(b, d, Seq("k"), broadcastRowLimit = 100)
    assert(p.strategy == "broadcast")
    assert(p.joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "broadcast branch did not plan a BroadcastHashJoin")
    assert(sortedRows(p.joined) == sortedRows(b.join(d, Seq("k"))))
    assert(p.stats.smallRows == 20 && p.stats.bigRows == 400 && p.stats.bigKeys == 20)
  }

  test("uniform big side over the broadcast budget takes the shuffle branch") {
    val b = big((1L to 3200L).map(i => (i % 320, i)): _*)
    val d = dim((0L until 320L).map(i => (i, s"n$i")): _*)
    // limit below the dimension size; per-key rows (10) stay under
    // 4 × the even share, so no salt either
    val p = AutoPlanJoin.inner(b, d, Seq("k"), broadcastRowLimit = 100)
    assert(p.strategy == "shuffle")
    assert(p.stats.bigMaxKeyRows == 10)
    assert(!p.joined.queryExecution.analyzed.toString.contains("__salt"),
      "shuffle branch must not salt")
    assert(sortedRows(p.joined) == sortedRows(b.join(d, Seq("k"))))
  }

  test("one hot key takes the salted branch (plan-pinned) with identical output") {
    // 90% of the big side on ONE key: max_key_rows (2700) far exceeds
    // 4 × the even per-task share
    val b = big(((1L to 2700L).map(i => (7L, i)) ++
      (1L to 300L).map(i => (i % 30 + 100L, i))): _*)
    val d = dim(((0L until 30L).map(i => (i + 100L, s"n$i")) :+ (7L, "hot")): _*)
    // factor 1.5 (not the 4.0 default): the test session runs 4 shuffle
    // partitions, so the even share is 750 and the 2700-row hot key
    // must clear factor × share regardless of that small denominator
    val p = AutoPlanJoin.inner(b, d, Seq("k"), broadcastRowLimit = 10,
      hotKeyTaskFactor = 1.5, nSalts = 8)
    assert(p.strategy == "salted")
    assert(p.joined.queryExecution.analyzed.toString.contains("__salt"),
      "salted branch did not plan the salt columns")
    assert(sortedRows(p.joined) == sortedRows(b.join(d, Seq("k"))))
  }

  test("choose() thresholds: boundaries fall on the documented sides") {
    val base = AutoPlanJoin.Stats(
      smallRows = 1000, bigRows = 3200, bigKeys = 320,
      bigMaxKeyRows = 10, cmsEstPairs = 3200)
    // at the limit → broadcast (<=); just above → not
    assert(AutoPlanJoin.choose(base, 32, 1000, 4.0) == "broadcast")
    assert(AutoPlanJoin.choose(base, 32, 999, 4.0) == "shuffle")
    // hot key exactly at factor × share is NOT salted (strict >)
    val share = 3200.0 / 32
    val atFactor = base.copy(bigMaxKeyRows = (4.0 * share).toLong)
    assert(AutoPlanJoin.choose(atFactor, 32, 999, 4.0) == "shuffle")
    val over = base.copy(bigMaxKeyRows = (4.0 * share).toLong + 1)
    assert(AutoPlanJoin.choose(over, 32, 999, 4.0) == "salted")
  }

  test("cms inner product estimates the real pair count within its inflation bound") {
    val b = big((1L to 2000L).map(i => (i % 50, i)): _*)
    val d = dim((0L until 50L).flatMap(i => Seq((i, s"a$i"), (i, s"b$i"))): _*)
    val exact = b.join(d, Seq("k")).count()
    val est = AutoPlanJoin.cmsInnerProduct(b, d, Seq("k"), depth = 4, width = 4096)
    // estimate never undercounts and inflates by at most (Σa)(Σb)/width
    assert(est >= exact, s"CMS inner product undercounted: $est < $exact")
    assert(est <= exact + (2000L * 100L) / 4096 + exact,
      s"CMS inner product inflated past its bound: $est vs exact $exact")
  }
}
