package graft.etl

import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Workload-driven MATERIALIZATION advisor — the missing first step of
  * the engine's MV loop. [[graft.plans.MvRewrite]] can transparently
  * serve any registered rollup and [[MaterializedView]]/[[AggregateView]]
  * keep it fresh, but deciding WHAT to materialize was still a human
  * reading dashboards. This advisor reads the workload instead: it
  * walks every query's ANALYZED plan — the same canonicalization level
  * MvRewrite matches at, so "the advisor found it" implies "the rewrite
  * will hit it" — collects Aggregate subtrees whose leaves are all
  * base-table scans and whose expressions are deterministic (i.e.
  * materializable and refreshable), and ranks the ones shared by at
  * least `minQueries` distinct queries.
  *
  * This is the counterpart of [[LayoutAdvisor]] one level up: layout
  * advice optimizes HOW tables are stored, this advises WHICH derived
  * tables should exist. Like the reference's warehouse practice —
  * `sql/customer_360_views.sql` is exactly a hand-curated list of such
  * shared rollups — automated from the plans themselves. Everything is
  * driver-side plan analysis; no data is read.
  */
object MvAdvisor {

  /** One recommendation: a subtree `nQueries` queries embed verbatim
    * (modulo attribute ids). `definition` is runnable — write it, then
    * `MvRewrite.register(definition, reader, path)` closes the loop. */
  final case class Candidate(
      nQueries: Int,
      queries: Seq[String],
      planNodes: Int,
      definition: DataFrame)

  /** Analyze `queries` (name → builder) against `dir`; candidates
    * sorted by (breadth of sharing, subtree size) descending. */
  def analyze(
      spark: SparkSession,
      dir: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      minQueries: Int = 2): Seq[Candidate] = {
    // canonicalized subtree -> (representative plan, node count, query names)
    val seen = scala.collection.mutable.LinkedHashMap
      .empty[LogicalPlan, (LogicalPlan, Int, scala.collection.mutable.LinkedHashSet[String])]
    for ((name, build) <- queries) {
      val analyzed =
        try build(spark, dir).queryExecution.analyzed
        catch { case scala.util.control.NonFatal(_) => null }
      if (analyzed != null) {
        // distinct canonical subtrees within ONE query count once —
        // sharing is measured across queries
        val subtrees = analyzed.collect {
          case a: Aggregate if materializable(a) => a
        }
        subtrees.groupBy(_.canonicalized).foreach { case (canon, as) =>
          val entry = seen.getOrElseUpdate(canon,
            (as.head, planSize(as.head), scala.collection.mutable.LinkedHashSet.empty))
          entry._3 += name
        }
      }
    }
    seen.values.toSeq
      .filter(_._3.size >= minQueries)
      .map { case (rep, size, names) =>
        Candidate(names.size, names.toSeq.sorted, size,
          GraftSqlShim.ofRows(spark, rep))
      }
      .sortBy(c => (-c.nQueries, -c.planNodes))
  }

  /** Materializable = every leaf is a base-table scan (no local/test
    * relations, no streaming sources) and every expression in the
    * subtree is deterministic (a rand() rollup can neither be verified
    * against nor refreshed to a stable artifact). */
  private def materializable(p: LogicalPlan): Boolean = {
    val leaves = p.collectLeaves()
    leaves.nonEmpty &&
      leaves.forall(_.isInstanceOf[LogicalRelation]) &&
      p.collect { case n => n.expressions.forall(_.deterministic) }.forall(identity)
  }

  private def planSize(p: LogicalPlan): Int = p.collect { case _ => 1 }.size
}
