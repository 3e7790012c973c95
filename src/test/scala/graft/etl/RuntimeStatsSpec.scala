package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}

/** The measured-workload profiler: actual rows/bytes from the executed
  * plan's metric accumulators, attributed to named queries and lake
  * tables — see [[RuntimeStats]]. */
class RuntimeStatsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("profiled actions yield per-operator measurements and a hot-table ranking") {
    val spark = SharedSpark.spark
    val p = RuntimeStats.install(spark)
    try {
      // profile() the cardinality probe too: a bare count()'s
      // execution-end event can arrive AFTER the reset below on a
      // contended driver and be mis-attributed to the next profiled
      // body (observed as a doubled scan sample in the r16 full-suite
      // run); profile's drain loop awaits the event deterministically
      val nOrders = p.profile("warmup") { Tables.orders(spark, dir).count() }

      p.reset()
      p.profile("orders_by_status") {
        Tables.orders(spark, dir)
          .groupBy("o_orderstatus").agg(count(lit(1)).as("n")).collect()
      }
      p.profile("customer_scan") {
        Tables.customer(spark, dir).select("c_custkey").collect()
      }

      val samples = p.samples(spark).collect()
      assert(samples.nonEmpty, "no metrics harvested")

      // the orders scan's MEASURED row count must equal the table's
      // true cardinality — metrics are real, not plan estimates
      val scanRows = samples.filter(r =>
        r.getAs[String]("query") == "orders_by_status" &&
          r.getAs[String]("table") == "orders.parquet" &&
          r.getAs[String]("metric") == "numOutputRows" &&
          r.getAs[String]("operator").toLowerCase.contains("scan"))
      assert(scanRows.map(_.getAs[Long]("value")).sum == nOrders,
        s"measured scan rows != $nOrders: ${scanRows.mkString(", ")}")

      // the aggregate shuffled: exchange metrics present for the query
      assert(samples.exists(r =>
        r.getAs[String]("query") == "orders_by_status" &&
          r.getAs[String]("operator").contains("Exchange")),
        "no exchange measurement for the aggregating query")

      // hot-table ranking: orders read more rows than customer
      val hot = p.hotTables(spark).collect()
        .map(r => r.getAs[String]("table") -> r.getAs[Long]("rows_read")).toMap
      assert(hot.contains("orders.parquet") && hot.contains("customer.parquet"))
      assert(hot("orders.parquet") > hot("customer.parquet"),
        s"expected orders to dominate measured scan pressure: $hot")
    } finally RuntimeStats.remove(spark, p)
  }

  test("measured pressure prioritizes the advisor's layout work") {
    val spark = SharedSpark.spark
    val p = RuntimeStats.install(spark)
    try {
      val queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
          org.apache.spark.sql.DataFrame] = Map(
        "join" -> ((s, d) => {
          val c = Tables.customer(s, d)
          val o = Tables.orders(s, d)
          c.join(o, c("c_custkey") === o("o_custkey")).select(c("c_custkey"))
        }))
      val advice = LayoutAdvisor.analyze(spark, dir, queries)
      p.reset()
      p.profile("wk") {
        queries("join")(spark, dir).count()
      }
      val hot = p.hotTables(spark).collect()
        .map(r => r.getAs[String]("table") -> r.getAs[Long]("rows_read")).toMap
      val ranked = LayoutAdvisor.prioritize(advice, hot)
      assert(ranked.nonEmpty, "no prioritized work items")
      // orders is the bigger measured scan on the same advice shape, so
      // its layout work ranks first; every survivor has real pressure
      assert(ranked.head.advice.table == "orders", s"ranking: $ranked")
      assert(ranked.forall(_.priority > 0))
      // un-scanned (or un-advised) tables don't produce zero-value work
      assert(!ranked.exists(_.measuredRows == 0))
    } finally RuntimeStats.remove(spark, p)
  }

  test("removed profiler stops capturing") {
    val spark = SharedSpark.spark
    val p = RuntimeStats.install(spark)
    RuntimeStats.remove(spark, p)
    Tables.customer(spark, dir).count()
    org.apache.spark.GraftCoreShim.flushListeners(spark.sparkContext)
    assert(p.samples(spark).isEmpty, "unregistered profiler kept capturing")
  }
}
