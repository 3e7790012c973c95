package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** The ANN eval harness must report NUMBERS THAT MEAN SOMETHING: the
  * probe is good (recall well above chance), genuinely approximate
  * (at least one query misses a true neighbor — if every recall is
  * 1.0 the harness can't detect regressions), and bounded.
  */
class AnnEvalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("recall is high but not vacuously perfect; bounds hold") {
    val df = SparkEntry.queries("ann_eval_recall")(spark, dir)
    val rows = df.collect()
    df.unpersist()
    assert(rows.length == 10)
    val r20 = rows.map(_.getAs[Double]("recall_at_20"))
    val r10 = rows.map(_.getAs[Double]("recall_at_10"))
    (r20 ++ r10).foreach(r => assert(r >= 0.0 && r <= 1.0))
    assert(r20.sum / r20.length >= 0.5, s"nprobe=4/16 probe lost too much: ${r20.toSeq}")
    assert(r20.exists(_ < 1.0),
      "every recall@20 is 1.0 — the harness cannot detect probe regressions on this corpus")
    // the probe finds the true nearest NEIGHBOR (self excluded) for
    // most queries — the top-1 contract users actually feel
    assert(rows.count(_.getAs[Boolean]("nearest_found")) >= 7)
  }

  test("the nprobe curve is monotone non-decreasing — nested probes can only add recall") {
    val df = SparkEntry.queries("ann_nprobe_curve")(spark, dir)
    val rows = df.collect().sortBy(_.getAs[Int]("nprobe"))
    df.unpersist()
    assert(rows.map(_.getAs[Int]("nprobe")).toSeq == Seq(1, 2, 4, 8))
    val recalls = rows.map(_.getAs[Double]("avg_recall_at_20"))
    recalls.sliding(2).foreach {
      case Array(a, b) => assert(b >= a, s"recall dropped as nprobe grew: ${recalls.toSeq}")
      case _ => ()
    }
    assert(recalls.last > recalls.head, "the curve is flat — the knob does nothing here")
    assert(recalls.last >= 0.9, s"nprobe=8 recall suspiciously low: ${recalls.last}")
  }
}
