package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** Structural sanity of the synchronous LPA communities (the DuckDB
  * differential replays the identical rounds; this pins that the
  * output is a real partition with real structure, deterministically).
  */
class LpaSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("communities form a non-degenerate partition and are deterministic") {
    val df = SparkEntry.queries("graph_lpa_communities")(spark, dir)
    val rows = df.collect()
    df.unpersist()
    assert(rows.nonEmpty)
    val byComm = rows.groupBy(_.getAs[Long]("community"))
    assert(byComm.size > 1, "everything collapsed into one community")
    assert(byComm.size < rows.length, "no labels propagated — all singletons")
    assert(byComm.exists(_._2.length >= 5), "no community of meaningful size formed")
    // community_size is consistent with the actual partition
    for ((_, members) <- byComm)
      assert(members.forall(_.getAs[Long]("community_size") == members.length))

    val df2 = SparkEntry.queries("graph_lpa_communities")(spark, dir)
    val again = df2.collect()
    df2.unpersist()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "non-deterministic")
  }
}
