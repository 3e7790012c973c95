package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Runtime bloom-filter join reduction — the SHUFFLE-join complement
  * of [[DynamicPruningSpec]]'s partition pruning: when the fact side
  * is not partitioned on the join key (so DPP has nothing to prune),
  * Spark can still build a bloom filter from the FILTERED dim side's
  * surviving keys and push `might_contain` into the fact scan,
  * discarding non-joining rows before the shuffle instead of after
  * the join. At 100 TB this is the difference between shuffling the
  * full fact table and shuffling the ~selectivity fraction that can
  * possibly match — the same big-join discipline as BloomPrune
  * (`operators/BloomPrune.scala`), provided by the optimizer when the
  * thresholds say it pays. The spec pins the injection conditions so
  * an engine-config regression can't silently turn it off.
  *
  * Threshold semantics (easy to hold backwards): the CREATION side
  * must be SMALLER than `creationSideThreshold` (the filter must be
  * cheap to build) while the APPLICATION side's scan must be LARGER
  * than `applicationSideScanSizeThreshold` (the saved shuffle must be
  * worth the build) — the test lowers only the latter; zeroing the
  * former disqualifies every join. */
class RuntimeFilterSpec extends AnyFunSuite {

  test("selective dim filter injects might_contain into the fact scan") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft_rtflt").toString
    (1 to 200000).map(i => (i.toLong, i % 1000)).toDF("k", "v")
      .write.parquet(s"$root/fact")
    (1 to 1000).map(i => (i.toLong, if (i % 100 == 0) "keep" else "drop"))
      .toDF("k", "label").write.parquet(s"$root/dim")

    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      // force a shuffle join (broadcast legs don't get bloom filters —
      // the broadcast itself already limits the probe) and let the tiny
      // test fact qualify as "large application side"
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")

      val fact = spark.read.parquet(s"$root/fact")
      val dim = spark.read.parquet(s"$root/dim").filter(col("label") === "keep")
      val joined = fact.join(dim, "k")

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter on the fact scan:\n$plan")
      assert(joined.count() == 10, "bloom filter changed the join result")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
