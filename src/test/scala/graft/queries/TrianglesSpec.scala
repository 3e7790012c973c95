package graft.queries

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** Independent hand-countable check of the degree-oriented triangle
  * query (the DuckDB oracle re-derives the same algorithm, so it can't
  * catch an orientation bug that's wrong the same way twice): a K4
  * clique plus a pendant node, where every count and clustering
  * coefficient is known in closed form. */
class TrianglesSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SharedSpark.spark
  private var dir: String = _

  override def beforeAll(): Unit = {
    val spark0 = spark
    import spark0.implicits._
    dir = Files.createTempDirectory("tri_lake").toString
    // two copies of the {1,2,3,4} basket → all six K4 edges at
    // support 2; two copies of {4,5} → the pendant edge. A single
    // {1,2,5} basket stays BELOW the support valve — its pairs must
    // not appear as edges.
    val baskets = Seq(
      100L -> Seq(1L, 2L, 3L, 4L), 101L -> Seq(1L, 2L, 3L, 4L),
      102L -> Seq(4L, 5L), 103L -> Seq(4L, 5L),
      104L -> Seq(1L, 2L, 5L))
    baskets.flatMap { case (ok, parts) => parts.map(pk => (ok, pk)) }
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
  }

  test("K4 + pendant: exact triangle counts and clustering coefficients") {
    val rows = SparkEntry.queries("graph_copurchase_triangles")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // K4: every node degree 3, in C(3,2)=3 triangles, clustering 1.0;
    // node 4 carries the pendant edge too (degree 4 → 2·3/(4·3)=0.5);
    // node 5 has one edge — no triangles, clustering 0 by the d<2 guard
    assert(rows == Map(
      1L -> ((3L, 3L, 1.0)), 2L -> ((3L, 3L, 1.0)), 3L -> ((3L, 3L, 1.0)),
      4L -> ((4L, 3L, 0.5)), 5L -> ((1L, 0L, 0.0))), rows.toString)
  }
}
