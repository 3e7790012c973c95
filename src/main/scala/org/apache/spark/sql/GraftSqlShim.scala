package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so graft's native
  * Catalyst expressions get a Column API without requiring every
  * session to pre-register SQL functions. Signatures expose only
  * public types. This is the one file outside the `graft` package —
  * deliberately, since `private[sql]` access is scoped to this package.
  */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Execute a hand-built logical plan (test harness for optimizer
    * rules applied outside a session's rule pipeline). */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
