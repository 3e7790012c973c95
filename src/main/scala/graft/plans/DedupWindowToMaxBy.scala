package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, CreateStruct, EqualTo, Expression, Literal,
  NamedExpression, RowNumber, SortOrder, WindowExpression, Ascending, Descending}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the engine's signature dedup pattern
  *
  *   `ROW_NUMBER() OVER (PARTITION BY k ORDER BY o) = 1`  (W1/W2)
  *
  * into a `max_by`/`min_by` aggregate. The window form must shuffle
  * EVERY row to its key partition and fully sort each partition; the
  * aggregate form runs a partial aggregate map-side first, so only one
  * surviving row per (key, mapper) crosses the wire and nothing sorts —
  * on a 100 TB daily-versioned feed that is the difference between
  * shuffling the whole table and shuffling ~|distinct keys|.
  *
  * Fires only when provably semantics-preserving:
  *   - exactly one window expression, ROW_NUMBER, filtered `= 1`;
  *   - all ORDER BY directions identical (all DESC → max_by, all ASC →
  *     min_by; the tuple comparison is the struct's lexicographic one);
  *   - every order key is deterministic AND non-nullable (max_by skips
  *     null keys, row_number ranks them — nullable keys could diverge);
  *   - partition keys are plain attributes.
  *
  * Ties in the order key pick an arbitrary row in BOTH forms (the
  * `Dedup.latestByKey` contract already requires callers to pass a
  * total order), so tie behavior does not change the contract.
  * Registered through [[graft.expressions.GraftExtensions]].
  */
object DedupWindowToMaxBy extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def isRnEqOne(e: Expression, rn: NamedExpression): Boolean = e match {
    case EqualTo(a: AttributeReference, Literal(1, _)) => a.exprId == rn.exprId
    case EqualTo(Literal(1, _), a: AttributeReference) => a.exprId == rn.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(rnAlias @ Alias(WindowExpression(RowNumber(), _), _)),
          partitionSpec, orderSpec, child, _)) =>
      val conjuncts = splitConjuncts(cond)
      val (rnPreds, rest) = conjuncts.partition(isRnEqOne(_, rnAlias))
      val applicable =
        rnPreds.nonEmpty &&
          rest.forall(!_.references.contains(rnAlias.toAttribute)) &&
          orderSpec.nonEmpty &&
          orderSpec.forall(o => o.child.deterministic && !o.child.nullable) &&
          (orderSpec.forall(_.direction == Descending) ||
            orderSpec.forall(_.direction == Ascending)) &&
          partitionSpec.forall(_.isInstanceOf[AttributeReference]) &&
          partitionSpec.nonEmpty
      if (!applicable) f
      else {
        val groupAttrs = partitionSpec.map(_.asInstanceOf[AttributeReference])
        val keyStruct = CreateStruct(orderSpec.map(_.child))
        val desc = orderSpec.head.direction == Descending
        val aggOut: Seq[NamedExpression] = child.output.map { a =>
          if (groupAttrs.exists(_.exprId == a.exprId)) a
          else {
            val fn = if (desc) MaxBy(a, keyStruct) else MinBy(a, keyStruct)
            Alias(AggregateExpression(fn, Complete, isDistinct = false), a.name)(
              exprId = a.exprId)
          }
        }
        // rank = 1 by construction; keep the column so parents that
        // still project or filter on it stay resolved
        val rnOut = Alias(Literal(1), rnAlias.name)(exprId = rnAlias.exprId)
        val agg = Aggregate(groupAttrs, aggOut :+ rnOut, child)
        if (rest.isEmpty) agg
        else Filter(rest.reduce(org.apache.spark.sql.catalyst.expressions.And), agg)
      }
  }
}
