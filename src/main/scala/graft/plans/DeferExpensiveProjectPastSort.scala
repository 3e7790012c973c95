package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Expression, GetJsonObject, JsonToStructs, JsonTuple, Levenshtein,
  RegExpExtract, RegExpExtractAll, RegExpReplace, RLike, ScalaUDF,
  StructsToJson}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: pull an EXPENSIVE projection above a global sort.
  *
  *   Sort(keys, Project(exprs, child))  →  Project(exprs, Sort(keys, child))
  *
  * A global sort plans as a range exchange, and range partitioning runs a
  * SEPARATE sampling job over its child to pick the range boundaries
  * before the real pass — so everything below the sort executes twice.
  * When the projection parses JSON, runs regexes, or computes digests,
  * `ORDER BY` after the projection re-parses the entire input just to
  * sample the (cheap, passthrough) sort key. On a 100 TB corpus that is
  * the whole extraction stage run twice. Deferring the projection past
  * the sort makes the sample pass a raw column scan and runs the
  * expensive work exactly once, after the shuffle.
  *
  * The flip side: the exchange then ships the projection's INPUT columns
  * instead of its output. That is why the rule fires only when the
  * projection is provably expensive — for cheap projections the compact
  * post-project shuffle shape is usually the better trade, and the plan
  * is left alone.
  *
  * Fires only when provably semantics-preserving:
  *   - the sort is global (`ORDER BY`, not `sortWithinPartitions` —
  *     a local sort has no sampling pass to save);
  *   - every sort key references only CHILD attributes the projection
  *     passes through unchanged (same exprId), so the reordered sort
  *     resolves against the child directly;
  *   - every projected expression is deterministic (moving a
  *     nondeterministic expression across a sort changes which row gets
  *     which value);
  *   - at least one projected expression is expensive: JSON
  *     parse/render, regex, levenshtein, a Scala UDF, or one of the
  *     engine's native expressions (minhash, shingles, rolling
  *     fingerprints, …, all in `graft.expressions`).
  *
  * Column pruning then inserts a cheap passthrough projection under the
  * sort, so the scan still reads only the columns the deferred
  * projection needs. Registered through
  * [[graft.expressions.GraftExtensions]].
  */
object DeferExpensiveProjectPastSort extends Rule[LogicalPlan] {

  // Digests (md5/sha) are deliberately NOT in this set: they are
  // narrow-output/wide-input (a 32-char hash of an arbitrarily large
  // column) and cheap per byte, so deferring them past the exchange
  // can ship far more shuffle data than the duplicated hash it saves.
  // Bare Invoke/StaticInvoke are excluded for the same reason: many
  // CHEAP built-ins lower to object invokes before this rule runs
  // (encode, char/varchar padding), and treating them all as expensive
  // would over-trigger the deferral on wide columns.
  private def expensive(e: Expression): Boolean = e.exists {
    case _: GetJsonObject | _: JsonToStructs | _: StructsToJson |
        _: JsonTuple => true
    case _: RegExpReplace | _: RegExpExtract | _: RegExpExtractAll |
        _: RLike | _: Levenshtein => true
    case _: ScalaUDF => true
    case other => other.getClass.getName.startsWith("graft.expressions.")
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Sort(order, true, Project(projectList, child), hint)
        if order.forall(_.references.subsetOf(child.outputSet)) &&
          projectList.forall(_.deterministic) &&
          projectList.exists(expensive) =>
      Project(projectList, Sort(order, global = true, child, hint))
  }
}
