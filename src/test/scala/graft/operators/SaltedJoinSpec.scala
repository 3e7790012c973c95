package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Salting must be invisible in results: salted join ≡ plain join and
  * salted agg ≡ plain agg on a deliberately skewed fixture (one key
  * holds 90% of rows). */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def skewed() = {
    val spark0 = spark
    import spark0.implicits._
    // key 1 is hot: 900 rows; keys 2..101 one row each
    val rows = (1 to 900).map(i => (1L, i.toLong)) ++
      (2 to 101).map(k => (k.toLong, k.toLong * 10))
    rows.toDF("k", "v")
  }

  private def dims() = {
    val spark0 = spark
    import spark0.implicits._
    (1 to 101).map(k => (k.toLong, s"dim_$k")).toDF("k", "name")
  }

  test("saltedInnerJoin ≡ plain inner join on skewed data") {
    val big = skewed()
    val small = dims()
    val plain = big.join(small, Seq("k"))
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val salted = SaltedJoin.saltedInnerJoin(big, small, Seq("k"), nSalts = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(!SaltedJoin.saltedInnerJoin(big, small, Seq("k"), 8)
      .columns.contains("__salt"))
  }

  test("skewedCounts ≡ plain groupBy count") {
    val big = skewed()
    val plain = big.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SaltedJoin.skewedCounts(big, Seq("k"), "n", nSalts = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("skewedAgg ≡ plain sum/max/min/count") {
    val big = skewed()
    val plain = big.groupBy("k").agg(
      sum("v").as("s"), max("v").as("mx"), min("v").as("mn"),
      count("v").as("c"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val salted = SaltedJoin.skewedAgg(big, Seq("k"), "v", nSalts = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(salted == plain)
  }

  test("salt actually spreads the hot key across groups") {
    val big = skewed()
    val saltGroups = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(8)))
      .filter(col("k") === 1L)
      .select("__salt").distinct().count()
    assert(saltGroups > 1, "hot key stayed in one salt bucket")
  }
}
