package graft

/** Targeted silencing of known-benign WARN spam that floods the bench /
  * test logs (the driver captures a bounded stdout/stderr tail, and r15's
  * `sbt test` capture was mostly these two messages):
  *
  *   - `MapPartitionsRDD: RDD N was locally checkpointed, its lineage
  *     has been truncated...` — logged on EVERY release of a
  *     localCheckpoint block ([[Lineage.checkpointed]] releases them
  *     deliberately and eagerly; the warning describes exactly the
  *     intended behavior).
  *   - `WindowExec: No Partition Defined for Window operation!` — the
  *     global-rank windows behind it run over post-aggregate frames of
  *     at most a few thousand rows (RelationalQueries scaladocs note
  *     each); benign at any realistic cardinality.
  *
  * Scoped to the two emitting loggers, not a package: real warnings
  * from other classes keep flowing. */
object Logging {
  def quietNoise(): Unit =
    try {
      import org.apache.logging.log4j.Level
      import org.apache.logging.log4j.core.config.Configurator
      Configurator.setLevel("org.apache.spark.rdd.MapPartitionsRDD", Level.ERROR)
      Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec", Level.ERROR)
    } catch {
      // log4j-core absent (foreign deployment): noise is cosmetic, skip
      case _: NoClassDefFoundError | scala.util.control.NonFatal(_) => ()
    }
}
