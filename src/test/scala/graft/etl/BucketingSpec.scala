package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The co-location contract: two tables bucketed on the same key join
  * with NO shuffle exchange — the physical-plan property that makes
  * daily upserts/joins against a 100 TB customer master map-side. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("join of two same-key bucketed tables plans without Exchange") {
    val spark0 = spark
    import spark0.implicits._
    val left = (1 to 1000).map(i => (i.toLong, s"cust_$i")).toDF("custno", "name")
    val right = (1 to 2000).map(i => ((i % 500).toLong, i.toLong * 100)).toDF("custno", "amount")

    LakeWriter.writeBucketed(left, "bkt_left", Seq("custno"), 8, Seq("custno"))
    LakeWriter.writeBucketed(right, "bkt_right", Seq("custno"), 8, Seq("custno"))
    // disable auto-broadcast: at test size Spark prefers a BHJ (its own
    // BroadcastExchange), which hides the property under test — at
    // warehouse scale neither side broadcasts and the bucketed
    // sort-merge path below is exactly what runs
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "custno")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle, but plan has an Exchange:\n$plan")
      // and it still computes the right thing
      val expected = left.join(right, "custno").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("unbucketed same join DOES shuffle (the contrast case)") {
    val spark0 = spark
    import spark0.implicits._
    val left = (1 to 1000).map(i => (i.toLong, s"cust_$i")).toDF("custno", "name")
    val right = (1 to 2000).map(i => ((i % 500).toLong, i.toLong * 100)).toDF("custno", "amount")
    // disable auto-broadcast so the contrast isn't hidden by a BHJ
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = left.join(right, "custno").queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
