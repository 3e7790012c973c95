package graft.etl

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.GraftCoreShim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** MEASURED workload statistics — the runtime twin of
  * [[LayoutAdvisor]]'s plan-walk: the advisor counts how often a
  * column WOULD be shuffled or filtered; this profiler records what a
  * run actually DID — rows out of every operator, bytes through every
  * exchange, spill if any — straight from the executed plan's SQL
  * metrics after the action completes. Together they close the
  * feedback loop the reference delegates to its warehouse ("let the
  * optimizer decide", `sql/redshift_table_schemas.sql:114`): estimate
  * → run → measure → re-advise. At 100 TB the measured side is the
  * one that catches estimate drift — a scan whose measured rows
  * dwarf its sibling's says which table earns compaction/bucketing
  * BUDGET, not just which key would benefit.
  *
  * Mechanics: a [[QueryExecutionListener]] captures each action's
  * executed plan; [[Profiler.profile]] runs a body, flushes the
  * listener bus ([[GraftCoreShim.flushListeners]] — metric
  * accumulators arrive asynchronously after the action returns), then
  * walks the final (post-AQE) plan and snapshots every non-zero
  * metric. Driver-side metadata only — no data is re-read, the
  * metrics already exist on the accumulators. The protocol is
  * sequential by design (profile one named body at a time per
  * session); concurrent actions from other threads would interleave
  * captures and are out of contract. */
object RuntimeStats {

  /** One harvested metric: `(query, operator, table, metric, value)`.
    * `table` is non-empty only on file scans (basename of the scan's
    * root path — the lake's table directory). */
  final case class Sample(
      query: String, operator: String, table: String,
      metric: String, value: Long)

  final class Profiler(spark: SparkSession) extends QueryExecutionListener {
    private val pending = new ConcurrentLinkedQueue[QueryExecution]()
    private val out = new ConcurrentLinkedQueue[Sample]()

    /** Actions seen by the listener since install — a liveness probe
      * for the async capture path (and the spec's wiring check). */
    @volatile var captured: Long = 0L

    /** Jobs started on the scheduler bus since install — the PROMPT
      * side of the liveness question: job-start events ride the main
      * listener bus, which `profile` flushes before polling, so this
      * has advanced by the first poll whenever any job ran — unlike the
      * QueryExecutionListener capture, whose extra ExecutionListenerBus
      * hop completes after the flush returns. */
    @volatile var jobsSeen: Long = 0L
    private[RuntimeStats] val jobCounter = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobsSeen += 1
    }

    /** Failed actions seen — they harvest nothing, but they DO tell
      * `profile` the execution-end hop completed, so the drain loop can
      * stop waiting for a capture that will never arrive. */
    @volatile var failed: Long = 0L

    override def onSuccess(
        funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      captured += 1
      pending.add(qe)
    }
    override def onFailure(
        funcName: String, qe: QueryExecution, exception: Exception): Unit =
      failed += 1

    /** Run `body` and attribute every action it triggers to `name`.
      * Draining is a flush + STABILITY poll, not a single flush: the
      * execution-end hop that invokes QueryExecutionListeners
      * completes asynchronously even after the listener bus reports
      * empty (measured: a lone flushListeners misses the event every
      * time), so we wait until at least one capture arrives and the
      * count stops moving. */
    def profile[T](name: String)(body: => T): T = {
      pending.clear()
      val jobs0 = jobsSeen
      val ev0 = captured + failed
      val r = body
      GraftCoreShim.flushListeners(spark.sparkContext)
      val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
      // A body that triggers no Spark action must not spin the full
      // deadline — but "pending is still zero" alone can't distinguish
      // nothing-to-drain from a listener hop delayed past the window
      // on a contended driver. The scheduler-side job counter is the
      // liveness tiebreak: a body that ran ANY Spark job has a capture
      // in flight, so the zero short-circuit is only taken when no job
      // ran either; a job-running body waits for its event — bounded
      // two ways so bodies whose jobs never produce an onSuccess don't
      // spin the full 10 s every call: a FAILED action still fires
      // onFailure (counted in `failed` — nothing to harvest, stop
      // waiting once the count advanced and pending stayed zero), and
      // an RDD-level job that bypasses QueryExecution entirely fires
      // neither, so a ~2 s secondary stable-zero window gives up on a
      // capture that is never coming. (A job-free local action — e.g.
      // collect on a literal frame — still fires the listener; the
      // longer no-job stable-zero window covers that hop latency.)
      var stableFor = 0
      var last = -1
      var done = false
      while (!done && System.nanoTime < deadline) {
        val n = pending.size
        if (n == last) stableFor += 1 else stableFor = 0
        last = n
        done = (n > 0 && stableFor >= 5) ||
          (n == 0 && stableFor >= 25 && jobsSeen == jobs0) ||
          (n == 0 && stableFor >= 5 && (captured + failed) > ev0) ||
          (n == 0 && stableFor >= 100)
        if (!done) Thread.sleep(20)
      }
      // visibility for the stable-zero escape / deadline: a body that ran
      // Spark jobs but produced no listener event leaves a hole in the
      // profile — log it so a dropped capture is diagnosable, not silent
      if (pending.isEmpty && jobsSeen != jobs0 && (captured + failed) == ev0)
        System.err.println(
          s"graft RuntimeStats.profile($name): saw Spark jobs but no " +
            "QueryExecution event arrived within the drain window; " +
            "this action's plan is missing from the profile")
      pending.asScala.foreach(qe => harvest(name, qe.executedPlan))
      pending.clear()
      r
    }

    /** Walk the executed plan INCLUDING through AQE's wrappers: the
      * adaptive root and every `QueryStageExec` are LEAF nodes whose
      * real operators hang off `executedPlan`/`plan` — a naive
      * `plan.foreach` sees only `ResultQueryStage` and harvests
      * nothing (measured on Spark 4.1). Subquery plans are not
      * traversed — their metrics attribute to their own action. */
    private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
      f(p)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)(f)
        case q: QueryStageExec => walk(q.plan)(f)
        case other => other.children.foreach(walk(_)(f))
      }
    }

    private def harvest(name: String, plan: SparkPlan): Unit =
      walk(plan) { node =>
        val table = node match {
          case s: FileSourceScanExec =>
            s.relation.location.rootPaths.headOption
              .map(_.getName).getOrElse("")
          case _ => ""
        }
        node.metrics.foreach { case (key, m) =>
          // unset accumulators report 0 or -1 depending on the metric
          // type; neither is a measurement
          if (m.value > 0) out.add(Sample(name, node.nodeName, table, key, m.value))
        }
      }

    /** Everything measured so far, one row per (query, operator,
      * metric) sample, queryable like any other frame. */
    def samples(spark: SparkSession): DataFrame = {
      import spark.implicits._
      out.asScala.toSeq.toDF()
    }

    /** Measured scan pressure per lake table: rows actually read by
      * file scans, over all profiled queries — the compaction/
      * bucketing BUDGET ranking (LayoutAdvisor says which key; this
      * says which table pays off first). */
    def hotTables(spark: SparkSession): DataFrame =
      samples(spark)
        .filter(col("table") =!= "" && col("metric") === "numOutputRows")
        .groupBy("table")
        .agg(sum(col("value")).as("rows_read"),
          countDistinct(col("query")).as("n_queries"))
        .orderBy(col("rows_read").desc, col("table"))

    def reset(): Unit = { pending.clear(); out.clear() }
  }

  /** Install a profiler on the session's listener manager; pair with
    * [[remove]] — a leaked listener keeps capturing (and retaining
    * plans) for the session's lifetime. */
  def install(spark: SparkSession): Profiler = {
    val p = new Profiler(spark)
    spark.listenerManager.register(p)
    spark.sparkContext.addSparkListener(p.jobCounter)
    p
  }

  def remove(spark: SparkSession, p: Profiler): Unit = {
    spark.listenerManager.unregister(p)
    spark.sparkContext.removeSparkListener(p.jobCounter)
  }
}
