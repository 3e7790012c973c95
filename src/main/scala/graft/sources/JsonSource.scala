package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines event-drop source — the landing format of the reference's
  * whole event path (the tracking API ingests JSON event payloads,
  * `identity-resolution/api-server.js:83,150-182`; the activation feed
  * emits JSON event bodies, `scripts/lambda_redshift_to_segment.py:316-325`),
  * read the way a 100 TB lake must read it:
  *
  *   - EXPLICIT schema, never inference. Schema inference is a full
  *     extra pass over every byte before the real scan, and it lets one
  *     bad drop silently retype a column for the whole read (a single
  *     `"value": "n/a"` string widens the column and every downstream
  *     cast moves). The schema is declared once; a drop that disagrees
  *     with the contract surfaces as quarantined LINES, not as a
  *     mutated schema.
  *   - QUARANTINE lane, same production posture as the CSV lane
  *     ([[graft.etl.VehicleSalesEtl.readCsvWithQuarantine]]): a
  *     malformed line — truncated JSON, broken nesting, a scalar where
  *     the schema demands another type, a bare array — must neither
  *     kill the batch (FAILFAST) nor silently become a row of NULLs
  *     (plain PERMISSIVE). It lands VERBATIM in the quarantine frame
  *     with scan-time file provenance for replay after the upstream fix.
  *
  * Split mechanics: the drop is scanned as TEXT and each line parsed
  * with `from_json` under PERMISSIVE + corrupt-record capture. That
  * buys two things over the native JSON reader's corrupt column:
  * the raw line is a REAL column, so both lanes are plain filters (the
  * native `_corrupt_record` cannot be filtered right off the scan —
  * Spark requires materializing through a cache first, and caching a
  * 100 TB scan to split it is exactly backwards: each lane here is one
  * flat pass, nothing persists); and the quarantine capture is the
  * byte-verbatim input line by construction, not a parser reconstruction.
  *
  * JSON-specific lane semantics (pinned in `JsonSourceSpec`, because
  * they differ from CSV's exact-arity contract): a syntactically valid
  * object with MISSING fields is GOOD (absent → NULL — JSON carries
  * per-row structure, there is no positional mis-bind to defend
  * against), and one with EXTRA fields is GOOD (schema projection drops
  * them); only a line Jackson cannot bind to the schema — parse error
  * or type conflict — is quarantined. Blank lines are skipped, as the
  * native reader skips them — "blank" meaning JSON-whitespace-only
  * (space/tab/CR, the RFC 8259 insignificant set minus the LF the text
  * source already consumed as the delimiter); a line of any OTHER
  * character, form feed included, is not valid JSON and quarantines.
  */
object JsonSource {

  val CorruptCol = "_corrupt_record"

  /** Shared parse + split over a text frame (batch or streaming): one
    * `from_json` pass, two filter lanes. */
  private def requireLaneFree(schema: StructType): Unit =
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — the lane owns that column")

  private def split(lines: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    val withLane = StructType(
      schema.fields.toSeq :+ StructField(CorruptCol, StringType, nullable = true))
    // JSON-whitespace-aware blank check: Spark's 1-arg trim strips only
    // ASCII spaces, which quarantined a tab-only line in violation of
    // the skip contract above
    val parsed = lines
      .filter(length(trim(col("value"), " \t\r")) > 0)
      .withColumn("__src_file", input_file_name())
      .withColumn("j", from_json(col("value"), withLane,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)))
    // a null struct (a failure class some parser paths report instead
    // of populating the corrupt field) quarantines too — the lane's
    // contract is "good means BOUND", not "good means not-flagged"
    val bad = col("j").isNull || col("j").getField(CorruptCol).isNotNull
    val good = parsed.filter(!bad)
      .select(schema.fieldNames.map(f => col("j").getField(f).as(f)).toSeq: _*)
    val quarantine = parsed.filter(bad)
      .select(col("value").as("raw_line"), col("__src_file").as("src_file"))
    (good, quarantine)
  }

  /** Read a newline-delimited-JSON drop under `schema`, split into
    * (good, quarantine). The good frame carries exactly `schema`'s
    * columns; the quarantine frame is (raw_line, src_file). Provenance
    * is stamped AT the scan — `input_file_name()` evaluates empty once
    * rows leave the scan's context. */
  def readWithQuarantine(
      spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    requireLaneFree(schema)
    split(
      spark.read.option("recursiveFileLookup", "true").text(path),
      schema)
  }

  /** The STREAMING twin — the shape the reference's event path actually
    * runs (payloads arrive continuously, `api-server.js:150-182`; drops
    * land as files): a file-source stream over the drop directory,
    * same schema contract and quarantine semantics as the batch lane.
    * Returns two streaming frames; each started query keeps its own
    * file-source checkpoint (its high-water mark, ST1 discipline), so
    * the good-lane pipeline and the quarantine writer advance
    * independently — a stalled quarantine sink never back-pressures
    * event delivery. `maxFilesPerTrigger` bounds per-micro-batch work
    * exactly as the parquet incremental source does. */
  def streamWithQuarantine(
      spark: SparkSession,
      path: String,
      schema: StructType,
      maxFilesPerTrigger: Int = 10): (DataFrame, DataFrame) = {
    requireLaneFree(schema)
    split(
      spark.readStream
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .text(path),
      schema)
  }
}
