package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Transparent materialized-view substitution — the warehouse feature
  * the reference leans on Redshift for (its analytical layers ARE
  * materialized views the dashboards re-query): when a query plan
  * CONTAINS a registered view's defining plan as a subtree, the
  * optimizer swaps that subtree for a scan of the view's parquet, so
  * consumers keep writing queries against base tables and silently
  * read the precomputed rollup instead.
  *
  * Matching is SYNTACTIC CONTAINMENT over canonicalized ANALYZED
  * plans (early Redshift/Oracle-style): the consumer must embed the
  * definition verbatim modulo attribute renaming/exprIds — Catalyst
  * canonicalization normalizes ids and literals for us. Semantic
  * subsumption (matching a WIDER aggregate and compensating) is
  * deliberately out of scope; what this buys at 100 TB is the common
  * case — re-aggregation and joins layered ON TOP of a shared daily
  * rollup hit metadata-sized parquet instead of rescanning raw events.
  *
  * Mechanics worth noting:
  *   - the rule runs at ANALYSIS time (post-hoc resolution), not in
  *     the optimizer: once the optimizer's column pruning and
  *     project-collapse touch the consumer, the embedded definition
  *     subtree no longer equals anything (pruned aggregates, folded
  *     grouping expressions) — at analysis time the containment is
  *     literal. The substituted scan then flows through the normal
  *     optimizer, so a consumer using two MV columns still gets its
  *     pruned two-column parquet read;
  *   - the replacement wires a Project of Aliases that REUSE the
  *     matched subtree's exprIds, so parent operators' references
  *     survive untouched;
  *   - the stored scan is re-instanced per match
  *     ([[MultiInstanceRelation]]), so one view appearing twice in a
  *     plan (self-join of an MV) gets distinct attribute ids;
  *   - a rewrite-on-top-of-rewrite cannot loop: the substituted
  *     Project-over-relation no longer canonicalizes to the stored
  *     aggregate.
  *
  * Staleness is the registrar's contract: pair registration with the
  * incremental-refresh machinery ([[graft.etl.MaterializedView]] /
  * [[graft.etl.AggregateView]]) and register only views those refresh
  * loops keep current.
  *
  * REFRESH BYPASS: while a view is registered, re-evaluating its own
  * definition is ALSO rewritten to scan the MV parquet — so a refresh
  * job that recomputes the definition to rewrite the MV would silently
  * read the stale MV and write it back, and the view would never
  * actually refresh. Refresh writers must run inside
  * [[withRuleDisabled]]; the engine's own refresh paths
  * ([[graft.etl.MaterializedView]].build/refresh,
  * [[graft.etl.AggregateView]].build/refresh*) do this automatically.
  */
object MvRewrite extends Rule[LogicalPlan] {

  private final case class Entry(canonical: LogicalPlan, scan: LogicalPlan, path: String)

  @volatile private var entries: List[Entry] = Nil
  private val disabledDepth = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run `body` with the rewrite suspended — REQUIRED around any job
    * that recomputes a registered definition in order to rewrite its
    * materialization (otherwise the recomputation itself is substituted
    * with a scan of the stale MV). Reentrant; concurrent consumer
    * queries during the window simply read base tables — a lost
    * optimization, never a lost result. DataFrame analysis is eager
    * (construction runs the analyzer), so building the refresh plan
    * inside `body` is sufficient even if the action runs later. */
  def withRuleDisabled[T](body: => T): T = {
    disabledDepth.incrementAndGet()
    try body finally disabledDepth.decrementAndGet()
  }

  /** Register `path` (already written, already current) as the
    * materialization of `definition`. `mv` must be a reader of that
    * path whose column NAMES cover the definition's output — checked
    * with the session's resolver (case-insensitive by default), the
    * same comparison [[apply]] later wires columns with, so a miss or
    * a case-only ambiguity fails HERE with a clear error instead of as
    * a bare lookup failure inside an unrelated-looking consumer query. */
  def register(definition: DataFrame, mv: DataFrame, path: String): Unit = {
    val resolver = definition.sparkSession.sessionState.conf.resolver
    val canonical = definition.queryExecution.analyzed.canonicalized
    val scan = mv.queryExecution.analyzed
    val defCols = definition.queryExecution.analyzed.output.map(_.name)
    val mvCols = scan.output.map(_.name)
    val missing = defCols.filterNot(d => mvCols.exists(m => resolver(m, d)))
    require(missing.isEmpty,
      s"MV at $path lacks definition columns: ${missing.mkString(", ")}")
    val ambiguous = defCols.filter(d => mvCols.count(m => resolver(m, d)) > 1)
    require(ambiguous.isEmpty,
      s"MV at $path has multiple columns resolving to: ${ambiguous.mkString(", ")}")
    entries = Entry(canonical, scan, path) :: entries
  }

  def clear(): Unit = entries = Nil

  /** Registered paths, for tests/ops introspection. */
  def registered: Seq[String] = entries.map(_.path)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val es = entries
    if (es.isEmpty || disabledDepth.get > 0) plan
    else plan.transformUp {
      // class check first — canonicalization is the expensive part
      case p if es.exists(e => e.canonical.getClass == p.getClass &&
          e.canonical == p.canonicalized) =>
        val e = es.find(_.canonical == p.canonicalized).get
        val fresh = e.scan match {
          case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
          case other => other
        }
        // session-resolver name matching (register() pre-validated
        // existence and uniqueness under this same resolver)
        val resolver = conf.resolver
        Project(
          p.output.map { o =>
            val a = fresh.output.find(a => resolver(a.name, o.name)).getOrElse(
              throw new IllegalStateException(
                s"MV at ${e.path} no longer resolves column ${o.name}"))
            Alias(a, o.name)(exprId = o.exprId)
          },
          fresh)
    }
  }
}
