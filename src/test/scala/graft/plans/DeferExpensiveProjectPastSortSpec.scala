package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The expensive-projection-past-sort deferral: a global ORDER BY plans
  * a range exchange whose boundary-sampling job re-executes the child,
  * so an expensive projection under the sort runs twice. The rule moves
  * it above the sort when the sort keys are passthrough child columns —
  * same rows, same order, the JSON/regex/digest work runs once. */
class DeferExpensiveProjectPastSortSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def docs(): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    Seq(
      (3L, """{"k":7}""", "alpha"),
      (1L, """{"k":1}""", "bravo"),
      (2L, "not json", "charlie"),
      (4L, """{"k":9}""", "delta"))
      .toDF("id", "props", "name")
      // block ConvertToLocalRelation from folding projections eagerly —
      // the rule must see the Project the way a parquet-backed plan would
      .repartition(2)
  }

  private def projected(df: DataFrame): DataFrame =
    df.select(col("id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      upper(col("name")).as("uname"))

  /** Top-of-plan shape after optimization: Some(true) when the top node
    * is a Project directly over a global Sort (deferred), Some(false)
    * when a Sort is still on top (not deferred). */
  private def deferred(plan: LogicalPlan): Option[Boolean] = plan match {
    case Project(_, _: Sort) => Some(true)
    case _: Sort => Some(false)
    case _ => None
  }

  test("defers a JSON-parsing projection past a global sort, same result") {
    val df = projected(docs()).orderBy("id")
    assert(deferred(df.queryExecution.optimizedPlan).contains(true),
      s"expected Project over Sort:\n${df.queryExecution.optimizedPlan}")
    // order preserved and values identical to the driver-side reference
    assert(df.collect().map(_.toSeq).toSeq == Seq(
      Seq(1L, 1L, "BRAVO"), Seq(2L, null, "CHARLIE"),
      Seq(3L, 7L, "ALPHA"), Seq(4L, 9L, "DELTA")))
  }

  test("leaves a cheap projection's compact-shuffle shape alone") {
    val df = docs().select(col("id"), upper(col("name")).as("uname"))
      .orderBy("id")
    assert(deferred(df.queryExecution.optimizedPlan).contains(false),
      s"expected Sort on top:\n${df.queryExecution.optimizedPlan}")
  }

  test("declines when a sort key is computed by the projection") {
    val df = projected(docs()).orderBy(col("k"))
    // k only exists above the projection — the sort must stay above it
    assert(deferred(df.queryExecution.optimizedPlan).contains(false),
      s"expected Sort on top:\n${df.queryExecution.optimizedPlan}")
    assert(df.select("id").collect().map(_.getLong(0)).takeRight(2).toSeq
      == Seq(3L, 4L))
  }

  test("declines on a nondeterministic projection") {
    val df = docs()
      .select(col("id"), (rand() * get_json_object(col("props"), "$.k")).as("r"))
      .orderBy("id")
    assert(deferred(df.queryExecution.optimizedPlan).contains(false),
      s"expected Sort on top:\n${df.queryExecution.optimizedPlan}")
  }

  test("declines on a local sortWithinPartitions") {
    val df = projected(docs()).sortWithinPartitions("id")
    val sorts = df.queryExecution.optimizedPlan.collect { case s: Sort => s }
    assert(sorts.forall(!_.global))
    assert(deferred(df.queryExecution.optimizedPlan).contains(false),
      s"expected local Sort on top:\n${df.queryExecution.optimizedPlan}")
  }
}
