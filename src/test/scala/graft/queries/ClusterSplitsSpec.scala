package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** The leakage-free property of `mix_cluster_splits`: a split is a
  * function of the near-dup CLUSTER id, so a document and all its
  * near-duplicates land in the same split — and the check is only
  * meaningful if the lake actually contains multi-document survivor
  * clusters (vacuity discipline: assert the fixture exercises the
  * property, not just that the code ran). Runs on sf0.01 — the same
  * lake the differential gate uses — so the session-shared survivor
  * component map is built once for both.
  */
class ClusterSplitsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("splits are cluster-atomic, all three populated, multi-doc clusters present, deterministic") {
    val df = SparkEntry.queries("mix_cluster_splits")(spark, dir)
    val rows = df.collect()
    df.unpersist() // harness contract: caller releases the returned frame
    assert(rows.length > 100, s"unexpectedly few survivors: ${rows.length}")

    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    // leakage-free: every cluster maps to exactly one split
    val straddlers = byCluster.filter(_._2.map(_.getAs[String]("split")).distinct.length > 1)
    assert(straddlers.isEmpty, s"clusters straddling splits: ${straddlers.keys.take(5)}")
    // non-vacuous: the property only bites if some cluster has >1 doc
    assert(byCluster.exists(_._2.length > 1),
      "no multi-document survivor cluster at sf0.01 — leakage property is vacuous")
    // all three splits populated (hash spread, pinned so a threshold
    // typo can't silently empty an eval split)
    assert(rows.map(_.getAs[String]("split")).distinct.toSet == Set("train", "val", "test"))

    // deterministic: a second run assigns every doc the same split
    val df2 = SparkEntry.queries("mix_cluster_splits")(spark, dir)
    val again = df2.collect()
    df2.unpersist()
    assert(rows.map(r => (r.getLong(0), r.getAs[String]("split"))).toSeq ==
      again.map(r => (r.getLong(0), r.getAs[String]("split"))).toSeq)
  }
}
