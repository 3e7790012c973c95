package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins the data invariant the (custno, dealno) dedup-window rewrite in
  * [[graft.views.Customer360.vehicleHistory]] / `validatedSales` rests
  * on: every version of a deal carries the same custno, so ranking per
  * (custno, dealno) groups exactly like the declared `PARTITION BY
  * dealno` and the two windows can share one custno exchange
  * (OPTIMIZATION guide §2.4; r15 ADVICE asked for this pin).
  *
  * The invariant holds BY CONSTRUCTION in this lake — `vehicleSales`
  * derives both dealno (`"D" + o_orderkey`) and custno (`o_custkey`)
  * from the same source row, and the synthetic CDC update copies every
  * key column — but the construction lives in one function and the
  * window rewrite in another file; this spec fails loudly if either
  * side drifts (e.g. a future CDC feed that "corrects" a deal's custno,
  * which would make the rewrite emit two rows where the declared SQL
  * keeps one). */
class DealCustnoInvariantSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("vehicle_sales: dealno functionally determines custno") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/orders.parquet").exists())
    val offenders = DomainQueries.vehicleSales(spark, dir)
      .groupBy("dealno")
      .agg(countDistinct("custno").as("n_custno"))
      .filter(col("n_custno") > 1)
      .count()
    assert(offenders == 0L,
      "a dealno spans multiple custno values — the (custno, dealno) " +
        "dedup-window rewrite in Customer360.vehicleHistory/validatedSales " +
        "is no longer equivalent to PARTITION BY dealno; revert to " +
        "dealno-only partitioning or fix the feed")
  }

  test("customer_master: custno versions all map to one dedup group") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/customer.parquet").exists())
    // same shape for the dim feed: the dedup key IS custno, so the
    // invariant is trivially structural; pin that the synthesized CDC
    // versions exist at all (the dedup window has real work to do)
    val cm = DomainQueries.customerMaster(spark, dir)
    val versions = cm.groupBy("custno").count().filter(col("count") > 1).count()
    assert(versions > 0L, "customer_master lost its CDC version fodder")
  }
}
