package graft.plans

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.etl.LakeWriter

/** Dynamic partition pruning over the hive-partitioned lake — the
  * 100 TB join pattern [[LakeWriter.writePartitioned]] exists to
  * enable: a fact scan joined to a FILTERED dimension must prune its
  * partitions at RUNTIME from the dim side's surviving join keys
  * (the filter is on a dim attribute, so no static partition filter
  * can exist at plan time). Without DPP every such daily-slice join
  * reads the full fact history; with it the scan reads only the
  * partitions the dim actually selects — on a year of daily
  * partitions, 1/365th of the bytes. Spark plans this as a
  * `dynamicpruningexpression` inside the scan's PartitionFilters,
  * fed by reusing the join's broadcast — this spec pins both the
  * plan shape and the result. */
class DynamicPruningSpec extends AnyFunSuite {

  test("filtered-dim join prunes fact partitions at runtime") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft_dpp").toString

    // three daily drops into the partitioned lake
    for (d <- 1 to 3) {
      val fact = (1 to 100)
        .map(i => (i.toLong + d * 1000L, s"sku_$i", d * 100.0 + i))
        .toDF("order_id", "sku", "amount")
      LakeWriter.writePartitioned(fact, "fact_orders", root,
        LocalDate.of(2024, 1, d), vendor = "acme")
    }

    val fact = spark.read.parquet(s"$root/fact_orders")
    // the dim filter is on `label`, NOT on the partition column — the
    // only way the engine can prune `day` is from the join at runtime.
    // The dim must be LAKE-backed: a local relation folds the filter
    // into its literal rows at optimization time, leaving no selective
    // predicate for the PartitionPruning rule to key on (exactly what
    // happens to it in production — dims live in the lake).
    Seq((1, "keep"), (2, "drop"), (3, "drop")).toDF("day", "label")
      .write.mode("overwrite").parquet(s"$root/dim_days")
    val dim = spark.read.parquet(s"$root/dim_days")
    val joined = fact
      .join(broadcast(dim.filter(col("label") === "keep")), Seq("day"))
      .select("order_id", "amount")

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in the fact scan:\n$plan")

    val rows = joined.collect()
    assert(rows.length == 100, s"expected day-1 slice only, got ${rows.length}")
    assert(rows.forall(_.getLong(0) < 2000L), "rows from a pruned day leaked in")
  }
}
