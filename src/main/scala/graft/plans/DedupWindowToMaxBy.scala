package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, AttributeReference, CreateStruct, Descending, EqualTo,
  Expression, GetStructField, Literal, NamedExpression, NullsFirst, NullsLast,
  RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the engine's signature dedup pattern
  *
  *   `ROW_NUMBER() OVER (PARTITION BY k ORDER BY o) = 1`  (W1/W2)
  *
  * into ONE `max(struct(orderKeys…, payload…))`/`min(…)` aggregate plus
  * an unpacking projection. The window form must shuffle EVERY row to
  * its key partition and fully sort each partition; the aggregate form
  * runs a partial aggregate map-side first, so only one surviving row
  * per (key, mapper) crosses the wire and nothing sorts — on a 100 TB
  * daily-versioned feed that is the difference between shuffling the
  * whole table and shuffling ~|distinct keys|. A single packed struct
  * (order keys leading, so the lexicographic comparison decides on them
  * first) keeps one aggregation buffer per group; the per-column
  * `max_by` alternative regressed wide tables — N buffers each carrying
  * its own copy of the order keys.
  *
  * Fires only when provably semantics-preserving:
  *   - exactly one window expression, ROW_NUMBER, filtered `= 1`;
  *   - all ORDER BY directions identical (all DESC → max, all ASC →
  *     min of the packed struct);
  *   - every order key is deterministic and uses the DEFAULT null
  *     ordering (DESC NULLS LAST / ASC NULLS FIRST). The packed struct
  *     is itself never null, so max/min skips nothing; struct
  *     comparison ranks a null FIELD below any value, which is exactly
  *     where the default null ordering ranks it (last under DESC, first
  *     under ASC) — asserted with null-key fixtures in the spec;
  *   - partition keys are plain attributes.
  *
  * Ties in the order key resolve through the payload fields of the
  * packed struct — deterministic, and within the `Dedup.latestByKey`
  * contract (callers must pass a total order; under a total order ties
  * don't exist). Registered through
  * [[graft.expressions.GraftExtensions]].
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
      val defaultNullOrdering = orderSpec.forall(o =>
        (o.direction == Descending && o.nullOrdering == NullsLast) ||
          (o.direction == Ascending && o.nullOrdering == NullsFirst))
      // the packed struct must be orderable as a whole: a map-typed
      // payload column is fine under the window form but would make
      // max(struct(...)) unresolvable
      val allOrderable =
        child.output.forall(a =>
          org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(a.dataType)) &&
          orderSpec.forall(o =>
            org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(o.child.dataType))
      val applicable =
        rnPreds.nonEmpty &&
          rest.forall(!_.references.contains(rnAlias.toAttribute)) &&
          orderSpec.nonEmpty &&
          orderSpec.forall(_.child.deterministic) &&
          defaultNullOrdering &&
          allOrderable &&
          (orderSpec.forall(_.direction == Descending) ||
            orderSpec.forall(_.direction == Ascending)) &&
          partitionSpec.forall(_.isInstanceOf[AttributeReference]) &&
          partitionSpec.nonEmpty
      if (!applicable) f
      else {
        val groupAttrs = partitionSpec.map(_.asInstanceOf[AttributeReference])
        val payload = child.output.filterNot(a =>
          groupAttrs.exists(_.exprId == a.exprId))
        val packed = CreateStruct(orderSpec.map(_.child) ++ payload)
        val desc = orderSpec.head.direction == Descending
        val fn = if (desc) Max(packed) else Min(packed)
        val topAlias = Alias(
          AggregateExpression(fn, Complete, isDistinct = false), "__top")()
        val agg = Aggregate(groupAttrs, groupAttrs :+ topAlias, child)
        val offset = orderSpec.length
        val unpacked: Seq[NamedExpression] = child.output.map { a =>
          if (groupAttrs.exists(_.exprId == a.exprId)) a
          else {
            val i = payload.indexWhere(_.exprId == a.exprId)
            Alias(GetStructField(topAlias.toAttribute, offset + i, Some(a.name)),
              a.name)(exprId = a.exprId)
          }
        }
        // rank = 1 by construction; keep the column so parents that
        // still project or filter on it stay resolved
        val rnOut = Alias(Literal(1), rnAlias.name)(exprId = rnAlias.exprId)
        val proj = Project(unpacked :+ rnOut, agg)
        if (rest.isEmpty) proj
        else Filter(rest.reduce(org.apache.spark.sql.catalyst.expressions.And), proj)
      }
  }
}
