package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence tool: dump `.explain("formatted")` for named queries (and
  * the un-memoized SharedFrames build expressions, which a consumer's
  * plan can't show once they collapse to a checkpoint leaf) into
  * `plans/r<N>/<name>_<tag>.txt` — the committed before/after plan
  * pairs the optimization-round judge checks claims against.
  *
  * Env: `PLAN_QUERIES` (comma list; a `build:` prefix names an internal
  * memo build — see `builds` below), `PLAN_TAG` (`before`/`after`),
  * `PLAN_OUT` (default `plans/r16`), plus the Bench contract's
  * `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS`. Never run by the driver;
  * plan-only (no job executes unless the expression itself memoizes). */
object PlanDump {
  private val asOf = lit("2024-06-01").cast("date")

  /** Internal build expressions, pre-memoization. */
  private def builds: Map[String, (SparkSession, String) => DataFrame] = Map(
    "build:vehicle_history" -> ((s, d) =>
      graft.views.Customer360.vehicleHistory(DomainQueries.vehicleSales(s, d), asOf)),
    "build:validated_sales" -> ((s, d) =>
      graft.views.Customer360.validatedSales(
        DomainQueries.vehicleSales(s, d),
        graft.views.Customer360.customerProfiles(
          DomainQueries.customerMaster(s, d), asOf, Seq(col("sourcerowid").desc)))),
    "build:customer_profiles" -> ((s, d) =>
      graft.views.Customer360.customerProfiles(
        DomainQueries.customerMaster(s, d), asOf, Seq(col("sourcerowid").desc))),
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("PLAN_OUT", "plans/r16")
    val tag = sys.env.getOrElse("PLAN_TAG", "before")
    val names = sys.env("PLAN_QUERIES").split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val df = builds.get(n)
        .map(_(spark, sfDir))
        .getOrElse(graft.SparkEntry.allQueries.find(_.name == n)
          .getOrElse(sys.error(s"no query or build named $n")).run(spark, sfDir))
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val file = s"$outDir/${n.replace(":", "_")}_$tag.txt"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(file), plan)
      // count operator-detail headers only (the tree section repeats them)
      val exchanges = plan.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
      println(s"PLANDUMP $file exchanges=$exchanges")
    }
    spark.stop()
  }
}
