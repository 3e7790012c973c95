package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Upsert

/** The daily vehicle-sales ETL — re-expression of the reference Glue job
  * (`scripts/glue_vehicle_sales_etl.py:28-392`) as one declarative Spark
  * pipeline: CSV scan (S1) → projection + quality filter (P1/P3) →
  * per-column cast map (P2) → idempotent upsert into the partitioned
  * lake (S5/J8 + S2).
  *
  * Scale notes: all-string CSV read ("DMS exports all fields as
  * strings", `glue:182-188`) with an explicit schema, so the scan never
  * infers; the projection/filter/casts are one codegen'd stage;
  * the upsert anti-join broadcasts the daily staging side.
  */
object VehicleSalesEtl {

  /** Columns kept by the cleaning projection (`glue:80-168`). */
  val projected: Seq[String] = Seq(
    "dealno", "branch", "custno", "email1", "homephone", "address", "city",
    "state", "ziporpostalcode", "crmsalesmgrname", "crmsp1name", "vin",
    "stockno", "year", "makename", "modelname", "bodystyle", "color",
    "vehiclemileage", "modeltype", "saletype", "dealtype", "contractdate",
    "salesdate", "cashprice", "outthedoorprice", "costprice", "totalgross",
    "frontgross", "backgross", "grossprofit", "customercashdown", "totaldown",
    "financesource", "financeamt", "apr", "term", "paymentamt", "payments",
    "trade1vin", "trade1year", "trade1makename", "trade1modelname",
    "trade1mileage", "trade1acv", "trade1payoff", "nettrade1",
    "totaltradeallowance", "leasetype", "leasepayment",
    "leasemileageallowance", "leaseendvalue", "warrantyfee",
    "rowlastupdatedutc", "mbicarrier", "accountingaccount", "cora_acct_code",
    "weowesaletotal")

  /** string → decimal(18,2) columns of the cast map (`glue:220-248`). */
  val decimalCols: Seq[String] = Seq(
    "frontgross", "backgross", "weowesaletotal", "customercashdown", "apr",
    "warrantyfee", "cashprice", "totalgross", "paymentamt", "outthedoorprice",
    "costprice", "grossprofit", "vehiclemileage", "term", "financeamt",
    "totaldown", "payments", "trade1acv", "trade1payoff", "nettrade1",
    "trade1mileage", "totaltradeallowance", "leasepayment",
    "leasemileageallowance", "leaseendvalue")

  /** string → timestamp columns of the cast map (`glue:251-253`). */
  val timestampCols: Seq[String] = Seq(
    "contractdate", "salesdate", "rowlastupdatedutc")

  /** Upsert key (`glue:277-288`). */
  val upsertKeys: Seq[String] = Seq("dealno", "custno", "vin", "rowlastupdatedutc")

  /** S1: header/quoted CSV scan over the hive-partitioned lake, every
    * column as string (`glue:54-68`). `recursiveFileLookup` replaces the
    * Glue `recurse` option; partition discovery prunes year=/month=/day=. */
  def readRawCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("recursiveFileLookup", "true")
      // DMS exports distinguish absent (null) from explicit empty string
      // (quoted ""); emptyValue keeps the quoted form as '' while absent
      // fields still read as NULL (SURVEY §7.4.1 — Redshift keeps the
      // two distinct, so must we)
      .option("emptyValue", "")
      .csv(path)

  /** S1 with a QUARANTINE lane: PERMISSIVE parse capturing each
    * malformed line verbatim in `_corrupt_record`, split into
    * (good, quarantine) frames — the production posture for DMS drops
    * (a single truncated export line must neither kill the batch like
    * FAILFAST nor silently become a row of NULLs like plain
    * PERMISSIVE; it lands in the quarantine table with its raw text
    * for replay after the upstream fix). The quarantine frame carries
    * (raw_line, src_file) — file provenance via `input_file_name`, the
    * metadata column the replay tooling keys on.
    *
    * Arity contract (univocity under an explicit schema): a row is
    * malformed when it cannot bind the schema — broken quoting, too
    * many OR too few fields; only exact-arity rows reach the good
    * lane, so a truncated export line can never silently become a
    * row of trailing NULLs. */
  def readCsvWithQuarantine(
      spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    // schema = the file's OWN header columns (all string, a header-only
    // read) + the corrupt-record capture column: a schema narrower than
    // the file would positionally mis-bind every row
    val schema = org.apache.spark.sql.types.StructType(
      readRawCsv(spark, path).schema.fields.toSeq
        :+ org.apache.spark.sql.types.StructField(
          "_corrupt_record", org.apache.spark.sql.types.StringType, nullable = true))
    val raw = spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("recursiveFileLookup", "true")
      .option("emptyValue", "")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema)
      .csv(path)
      // provenance must be stamped AT the scan — input_file_name()
      // evaluates empty once rows come back out of the cache
      .withColumn("__src_file", input_file_name())
      // the corrupt-record column is lazily populated; materializing the
      // split through a persisted frame avoids the Spark restriction on
      // filtering _corrupt_record directly off the scan
      .cache()
    val good = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record", "__src_file")
    val quarantine = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"),
        col("__src_file").as("src_file"))
    (good, quarantine)
  }

  /** P1+P3: projection + quality filter (`glue:80-168`). */
  def clean(raw: DataFrame): DataFrame =
    raw.select(projected.map(col): _*)
      .filter(col("vin").isNotNull && col("custno").isNotNull &&
        col("salesdate").isNotNull)

  /** P2: the cast map (`glue:190-266`). Strings with thousands
    * separators ("1,234.50") are normalized first; unparseable values →
    * NULL (try_cast), matching permissive warehouse COPY behavior. */
  def applyCastMap(cleaned: DataFrame): DataFrame = {
    val castCols = cleaned.columns.toSeq.map {
      case c if decimalCols.contains(c) =>
        regexp_replace(col(c), ",", "").try_cast("decimal(18,2)").as(c)
      case c if timestampCols.contains(c) => col(c).try_cast("timestamp").as(c)
      case c => col(c)
    }
    cleaned.select(castCols: _*)
  }

  /** Full batch: raw CSV lake path → typed, deduped staging frame. */
  def stage(spark: SparkSession, path: String): DataFrame =
    applyCastMap(clean(readRawCsv(spark, path)))

  /** S5/J8: idempotent upsert of a staging batch into the target on the
    * 4-part key — `(target ANTI staging) ∪ staging`, replacing the
    * reference's Redshift staging-table delete+insert (`glue:289-392`). */
  def upsertBatch(target: DataFrame, staging: DataFrame): DataFrame =
    Upsert.upsert(target, staging, upsertKeys)
}
