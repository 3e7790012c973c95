package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}

/** Plan + property pins for the k-center coreset round scan that the
  * engine-wide sweeps cannot reach: `mix_coreset_kcenter` returns a
  * driver-built local frame, so PlanAuditSpec's interpreted-HOF sweep
  * never sees the per-round corpus scan — this spec pins it directly. */
class CoresetSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("the round scan rides the native L2 expression, lambda-free, no shuffle") {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val centers = emb.orderBy("vec_id").limit(2).collect()
      .map(_.getSeq[Float](1).toSeq).toSeq
    val scan = emb.select(col("vec_id"),
      CurationQueries.kcenterMinDist(centers).as("d2"))
      .orderBy(col("d2").desc, col("vec_id")).limit(1)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("graft_l2sq"),
      s"round scan lost the native distance expression:\n$plan")
    assert(!plan.contains("lambdafunction"),
      s"interpreted HOF lambda crept into the round scan:\n$plan")
    assert(!plan.contains("Exchange"),
      s"the scan-and-reduce round must not shuffle (TakeOrdered merges driver-side):\n$plan")
  }

  test("farthest-point radii are non-increasing (the k-center invariant)") {
    val picked = SparkEntry_kcenter()
    val radii = picked.filter(_._3 != null).map(_._3.doubleValue)
    assert(radii.size >= 2)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"min-dist radii must not increase along the greedy traversal: $radii")
  }

  private def SparkEntry_kcenter(): Seq[(Long, Long, java.lang.Double)] =
    graft.SparkEntry.queries("mix_coreset_kcenter")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))))
      .toSeq
}
