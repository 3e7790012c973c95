package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}
import graft.plans.MvRewrite

/** The advise → materialize → rewrite loop must CLOSE: the advisor
  * finds the rollup a workload shares, the found definition is directly
  * materializable, and registering it makes MvRewrite serve every
  * sharing consumer from the parquet. */
class MvAdvisorSpec extends AnyFunSuite with BeforeAndAfterEach {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  override def afterEach(): Unit = MvRewrite.clear()

  /** The shared rollup two consumers embed. */
  private def daily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  private val workload: Map[String, (SparkSession, String) => DataFrame] = Map(
    "monthly" -> ((s, d) => daily(s, d)
      .groupBy(date_format(col("day"), "yyyy-MM").as("month"))
      .agg(sum(col("n_events")).as("n_events"))),
    "by_type" -> ((s, d) => daily(s, d)
      .groupBy("event_type").agg(max(col("n_events")).as("peak_day"))),
    // an unrelated single-use aggregate — must NOT be recommended
    "lonely" -> ((s, d) => Tables.orders(s, d)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))))

  test("finds the shared rollup, not the single-use aggregate") {
    val cands = MvAdvisor.analyze(spark, dir, workload)
    assert(cands.nonEmpty, "shared daily rollup not found")
    val top = cands.head
    assert(top.nQueries == 2 && top.queries == Seq("by_type", "monthly"))
    // nothing single-use sneaks in at minQueries=2
    assert(cands.forall(_.nQueries >= 2))
    // the definition is the daily rollup itself (runnable, same rows)
    val got = top.definition.collect().map(_.toSeq.toVector).toSet
    val expect = daily(spark, dir).collect().map(_.toSeq.toVector).toSet
    assert(got == expect)
  }

  test("advise → materialize → rewrite: consumers read the recommended MV") {
    val top = MvAdvisor.analyze(spark, dir, workload).head
    val path = "/tmp/graft_mv_advisor/daily_events"
    top.definition.write.mode("overwrite").parquet(path)
    MvRewrite.register(top.definition, spark.read.parquet(path), path)
    for (name <- top.queries) {
      val plan = workload(name)(spark, dir).queryExecution.executedPlan.toString
      assert(plan.contains("daily_events"),
        s"consumer $name did not rewrite onto the advised MV:\n$plan")
      assert(!plan.contains("events.parquet"),
        s"consumer $name kept its base scan:\n$plan")
    }
    // and the rewritten results are the originals
    MvRewrite.clear()
    val direct = workload("monthly")(spark, dir).collect().map(_.toSeq).toSet
    top.definition.write.mode("overwrite").parquet(path)
    MvRewrite.register(daily(spark, dir), spark.read.parquet(path), path)
    val viaMv = workload("monthly")(spark, dir).collect().map(_.toSeq).toSet
    assert(viaMv == direct)
  }

  test("nondeterministic and non-scan aggregates are never candidates") {
    val s0 = spark
    import s0.implicits._
    val local = Seq((1, "x"), (2, "y")).toDF("id", "v")
    val bad: Map[String, (SparkSession, String) => DataFrame] = Map(
      "rand_a" -> ((s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus").agg(sum(rand(7)).as("r"))),
      "rand_b" -> ((s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus").agg(sum(rand(7)).as("r"))),
      "local_a" -> ((_, _) => local.groupBy("v").agg(count(lit(1)).as("n"))),
      "local_b" -> ((_, _) => local.groupBy("v").agg(count(lit(1)).as("n"))))
    assert(MvAdvisor.analyze(spark, dir, bad).isEmpty)
  }
}
