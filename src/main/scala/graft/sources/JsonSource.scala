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
  *     cast moves). The schema is declared once; the data path is one
  *     pass, column-pruned, and a drop that disagrees with the contract
  *     surfaces as quarantined LINES, not as a mutated schema.
  *   - QUARANTINE lane, same production posture as the CSV lane
  *     ([[graft.etl.VehicleSalesEtl.readCsvWithQuarantine]]): a
  *     malformed line — truncated JSON, broken nesting, a scalar where
  *     the schema demands another type, a bare array — must neither
  *     kill the batch (FAILFAST) nor silently become a row of NULLs
  *     (plain PERMISSIVE). It lands verbatim in the quarantine frame
  *     with scan-time file provenance for replay after the upstream fix.
  *
  * JSON-specific lane semantics (pinned in `JsonSourceSpec`, because
  * they differ from CSV's exact-arity contract): a syntactically valid
  * object with MISSING fields is GOOD (absent → NULL — JSON carries
  * per-row structure, there is no positional mis-bind to defend
  * against), and one with EXTRA fields is GOOD (schema projection drops
  * them); only a line Jackson cannot bind to the schema — parse error
  * or type conflict — is quarantined.
  */
object JsonSource {

  val CorruptCol = "_corrupt_record"

  /** Read a newline-delimited-JSON drop under `schema`, split into
    * (good, quarantine). The good frame carries exactly `schema`'s
    * columns; the quarantine frame is (raw_line, src_file).
    *
    * The corrupt-record column is lazily populated by the scan, and
    * Spark refuses a filter directly over it (the same restriction as
    * the CSV lane) — the split goes through one persisted pass, which
    * also stamps `input_file_name()` AT the scan: it evaluates empty
    * once rows come back out of a cache. */
  def readWithQuarantine(
      spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — the lane owns that column")
    val withLane = StructType(
      schema.fields.toSeq :+ StructField(CorruptCol, StringType, nullable = true))
    val raw = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("recursiveFileLookup", "true")
      .schema(withLane)
      .json(path)
      .withColumn("__src_file", input_file_name())
      .cache()
    val good = raw.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantine = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"), col("__src_file").as("src_file"))
    (good, quarantine)
  }
}
