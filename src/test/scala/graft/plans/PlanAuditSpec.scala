package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** Physical-plan audit over EVERY registered query — the automated
  * version of ".explain and iterate until it's the plan you'd want".
  * Guards the two scale killers that can silently regress:
  *
  *   - CartesianProduct: a non-broadcast cross product is O(n²) shuffle
  *     at 100 TB. (BroadcastNestedLoopJoin with a tiny broadcast side —
  *     e.g. the IVF centroid fan-out — is fine and intentionally
  *     allowed.)
  *   - lost predicate pushdown on the point-lookup path.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.allQueries.flatMap { q =>
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"queries with a cartesian product in the plan: ${offenders.mkString(", ")}")
  }

  test("point lookup pushes its predicate into the parquet scan") {
    val plan = SparkEntry.queries("j6_point_lookup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["),
      s"expected pushed filters in:\n$plan")
    assert(!plan.contains("PushedFilters: []"),
      s"point lookup lost predicate pushdown:\n$plan")
  }

  test("small-dimension join broadcasts (J1 at test scale)") {
    val plan = SparkEntry.queries("j1_customer_order_totals")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("broadcast"),
      s"expected a broadcast join at sf0.001:\n$plan")
  }
}
