package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scan layer's contract: temp-view registration composes with
  * Spark SQL text, and a typoed table/dir fails fast with the resolved
  * path instead of a late AnalysisException. */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("registerAll lets SQL text compose over every table") {
    Tables.registerAll(spark, dir)
    val n = spark.sql(
      "SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey")
      .head().getLong(0)
    assert(n > 0)
    assert(Tables.names.forall(t =>
      spark.sql(s"SELECT * FROM $t LIMIT 1").count() == 1))
  }

  test("load fails fast on unknown table and missing path") {
    val e1 = intercept[IllegalArgumentException](
      Tables.load(spark, dir, "nope"))
    assert(e1.getMessage.contains("unknown table"))
    val e2 = intercept[IllegalArgumentException](
      Tables.load(spark, "/tmp/does-not-exist", "orders"))
    assert(e2.getMessage.contains("/tmp/does-not-exist/orders.parquet"))
  }

  test("events normalizes ts to micros TimestampType whatever the drop's physical type") {
    val schema = Tables.events(spark, dir).schema
    assert(schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
  }
}
