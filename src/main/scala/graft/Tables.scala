package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-generated testdata lake (TESTDATA.md).
  *
  * Mirrors the reference's partitioned-lake scan layer
  * (`scripts/s3_upload_automation.py:189-216`,
  * `scripts/glue_vehicle_sales_etl.py:54-68`) re-expressed as plain
  * Spark parquet sources: columnar scan, predicate pushdown, column
  * pruning and partition discovery all come from the Parquet source.
  */
object Tables {
  /** All driver-generated tables. TESTDATA.md's prose lists the TPC-H-ish
    * eight; `documents` and `embeddings` additionally exist on disk at
    * every scale factor (they back the LLM-pipeline operators) — this
    * list, not the doc, is authoritative. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Fail fast with the resolved path on a typoed table name or wrong
    * dir, instead of a late, context-free AnalysisException. The
    * existence probe is local-fs only — harmless here; drop it if this
    * loader ever fronts an object store. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name),
      s"unknown table '$name' — known tables: ${names.mkString(", ")}")
    val path = s"$dir/$name.parquet"
    require(new java.io.File(path).exists(), s"no parquet at $path")
    spark.read.parquet(path)
    // NO scan fan-out. The testdata lake ships one row group per table,
    // so scans (and everything fused into them) run as one task — and a
    // measured A/B (OPTIMIZATION_r15.md) of a footer-census-gated
    // `repartition(defaultParallelism)` after every starved scan made
    // the full sf0.1 bench WORSE by a third (309.5 s → 411.7 s, task
    // CPU 550 s → 2292 s): per-task fixed cost on this class of box
    // dwarfs the parallelized per-row work at bench scale, where
    // stages are small. At 100 TB the question is moot (row groups ≫
    // cores) — the right production posture is splittable inputs, not
    // a post-scan exchange.
  }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `events.ts` has shipped in two physical forms across testdata
    * drops: TIMESTAMP(NANOS) (readable only as nanos longs under
    * `nanosAsLong`, then truncated to micros — the same conversion
    * DuckDB applies on read) and plain micros TIMESTAMP_NTZ. Normalize
    * either to micros `TimestampType`; with the session TZ pinned to
    * UTC the NTZ→instant cast is wall-clock identity, so downstream
    * window/date arithmetic and the DuckDB oracle line up in both
    * cases. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Engine-owned session builders (Verify, Bench, the test harness) set
    // this at construction; the write-once guard here covers foreign
    // sessions only (e.g. a bare spark-shell driving SparkEntry.entry).
    // Guarded so repeated loads don't keep writing session state — and a
    // concurrent first call is benign (both writers set the same value).
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view so Spark SQL text composes
    * the same way the reference's layered warehouse views do
    * (`sql/customer_360_views.sql:23-742`). `events` must go through
    * its ts-normalizing accessor — a raw load of a TIMESTAMP(NANOS)
    * drop throws PARQUET_TYPE_ILLEGAL, and an NTZ drop would leak a
    * second timestamp flavor into the query layer (TablesSpec pins the
    * normalized type). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n => load(spark, dir, n).createOrReplaceTempView(n)
    }
}
