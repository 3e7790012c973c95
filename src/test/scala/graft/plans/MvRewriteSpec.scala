package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}

/** Transparent MV substitution: a consumer written against BASE tables
  * silently reads the registered rollup parquet instead — plan-pinned
  * (the physical plan scans the MV path, not the raw events) and
  * result-pinned (identical rows with the rule active vs cleared).
  */
class MvRewriteSpec extends AnyFunSuite with BeforeAndAfterEach {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"
  private val mvPath = "/tmp/graft_mv_rewrite/daily_events"

  override def afterEach(): Unit = MvRewrite.clear()

  /** The MV definition: daily per-type event rollup over base events. */
  private def definition: DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))

  private def registerMv(): Unit = {
    definition.write.mode("overwrite").parquet(mvPath)
    MvRewrite.register(definition, spark.read.parquet(mvPath), mvPath)
  }

  test("a monthly re-aggregation over the definition reads the MV parquet") {
    registerMv()
    // consumer is written against BASE tables — it embeds the defining
    // aggregate verbatim and rolls it up to months
    val consumer = definition
      .groupBy(date_format(col("day"), "yyyy-MM").as("month"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_value")).as("sum_value"))
      .orderBy("month", "event_type")

    val plan = consumer.queryExecution.executedPlan.toString
    assert(plan.contains("daily_events"), s"MV scan missing from plan:\n$plan")
    assert(!plan.contains("events.parquet"), s"base scan survived the rewrite:\n$plan")

    val viaMv = consumer.collect().map(_.toSeq)
    MvRewrite.clear()
    val direct = definition
      .groupBy(date_format(col("day"), "yyyy-MM").as("month"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_value")).as("sum_value"))
      .orderBy("month", "event_type")
      .collect().map(_.toSeq)
    assert(viaMv.toSeq == direct.toSeq, "MV-served result diverged from direct evaluation")
    assert(direct.nonEmpty)
  }

  test("a join consumer on top of the definition also rewrites") {
    registerMv()
    val types = Seq(("click", "engagement"), ("purchase", "revenue"))
    val dims = spark.createDataFrame(types).toDF("event_type", "family")
    val consumer = definition.join(broadcast(dims), Seq("event_type"))
      .groupBy("family").agg(sum(col("n_events")).as("n_events"))
      .orderBy("family")
    val plan = consumer.queryExecution.executedPlan.toString
    assert(plan.contains("daily_events"), s"MV scan missing from join consumer:\n$plan")
    assert(!plan.contains("events.parquet"))
    val rows = consumer.collect()
    assert(rows.length == 2 && rows.forall(_.getAs[Long]("n_events") > 0))
  }

  test("no registration, no rewrite; clear() restores base scans") {
    val plan = definition.queryExecution.executedPlan.toString
    assert(plan.contains("events") && !plan.contains("daily_events"))
    registerMv()
    assert(definition.queryExecution.executedPlan.toString.contains("daily_events"))
    MvRewrite.clear()
    assert(!definition.queryExecution.executedPlan.toString.contains("daily_events"))
  }

  test("withRuleDisabled: a refresh writer recomputes from base tables") {
    registerMv()
    // without the bypass, re-evaluating the definition to refresh the MV
    // is itself rewritten to scan the (stale) MV — the refresh would
    // read the MV and write it back, never actually refreshing
    assert(definition.queryExecution.executedPlan.toString.contains("daily_events"))
    MvRewrite.withRuleDisabled {
      val plan = definition.queryExecution.executedPlan.toString
      assert(!plan.contains("daily_events"),
        s"refresh recomputation was substituted with the stale MV:\n$plan")
      assert(plan.contains("events"), "refresh recomputation lost its base scan")
    }
    // consumers after the bypass window rewrite again
    assert(definition.queryExecution.executedPlan.toString.contains("daily_events"))
  }

  test("register resolves MV columns case-insensitively; consumers still wire") {
    // MV parquet whose column names differ ONLY in case from the
    // definition — Spark resolution is case-insensitive by default, so
    // register must accept it and apply() must wire columns through the
    // session resolver rather than an exact-name map
    definition
      .select(col("day").as("DAY"), col("event_type").as("Event_Type"),
        col("n_events").as("N_EVENTS"), col("sum_value").as("sum_value"))
      .write.mode("overwrite").parquet(mvPath)
    MvRewrite.register(definition, spark.read.parquet(mvPath), mvPath)
    val consumer = definition
      .groupBy("event_type").agg(sum(col("n_events")).as("n_events"))
    assert(consumer.queryExecution.executedPlan.toString.contains("daily_events"))
    MvRewrite.clear()
    val direct = definition
      .groupBy("event_type").agg(sum(col("n_events")).as("n_events"))
    assert(consumer.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      direct.collect().map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("register rejects an MV genuinely missing a definition column") {
    definition.drop("sum_value").write.mode("overwrite").parquet(mvPath)
    val e = intercept[IllegalArgumentException] {
      MvRewrite.register(definition, spark.read.parquet(mvPath), mvPath)
    }
    assert(e.getMessage.contains("sum_value"))
  }

  test("self-join of the definition gets distinct attribute instances") {
    registerMv()
    val a = definition.select(col("day"), col("event_type"), col("n_events").as("na"))
    val b = definition.select(col("day"), col("event_type"), col("n_events").as("nb"))
    val joined = a.join(b, Seq("day", "event_type"))
      .agg(sum(col("na") * col("nb")).as("x"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("events.parquet"), s"self-join consumer kept a base scan:\n$plan")
    assert(joined.collect()(0).getAs[Long]("x") > 0)
  }
}
