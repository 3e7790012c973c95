package graft.etl

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lake layout + ingest-side file handling — re-expression of the
  * reference's S3 upload automation (`scripts/s3_upload_automation.py`).
  */
object LakeWriter {

  /** S2: hive-partitioned lake write `<table>/year=Y/month=M/day=D/`
    * (`s3_upload_automation.py:189-216`) with source/vendor metadata as
    * literal columns (object tags have no parquet analog). Partition
    * discovery + pruning then come free on every read. Optionally sorts
    * within partitions to emulate the warehouse SORTKEY zone maps
    * (`redshift_table_schemas.sql:115`). */
  def writePartitioned(
      df: DataFrame,
      table: String,
      lakeRoot: String,
      loadDate: java.time.LocalDate,
      vendor: String,
      sortCols: Seq[String] = Nil): Unit = {
    val stamped = df
      .withColumn("year", lit(f"${loadDate.getYear}%04d"))
      .withColumn("month", lit(f"${loadDate.getMonthValue}%02d"))
      .withColumn("day", lit(f"${loadDate.getDayOfMonth}%02d"))
      .withColumn("source_vendor", lit(vendor))
    val sorted =
      if (sortCols.nonEmpty) stamped.sortWithinPartitions(sortCols.map(col): _*)
      else stamped
    sorted.write
      .mode("append")
      .partitionBy("year", "month", "day")
      .parquet(s"$lakeRoot/$table")
  }

  /** Schema-evolved lake read: daily drops gain columns over time (the
    * DMS source adds a field, the vendor enriches the feed) and the
    * lake must read old and new drops as ONE table — `mergeSchema`
    * unions the per-file schemas, rows from drops that predate a
    * column read NULL there. The flip side is enforced rather than
    * inherited: merging requires per-column TYPE agreement, so a
    * redefined column (string one day, long the next) fails the read
    * loudly here instead of corrupting silently downstream — schema
    * evolution is additive, redefinition is an upstream bug.
    *
    * Footer-schema merging is metadata work (one footer per file);
    * the data path still prunes and pushes down per file. */
  def readEvolved(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Bucketed warehouse table: hash-bucket (and optionally sort) on the
    * join/dedup key — the engine's answer to the reference warehouse's
    * DISTKEY/SORTKEY declarations (`redshift_table_schemas.sql:114-115`).
    * Two tables bucketed on the same key join with NO shuffle exchange
    * (asserted in EtlSpec), which at 100 TB converts every daily
    * upsert/join against the customer master from a full-table shuffle
    * into a map-side merge. `bucketBy` requires the table catalog, hence
    * `saveAsTable` rather than a path write. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** S3/O5: newest export file per table by modification time
    * (`s3_upload_automation.py:97-126`) — a driver-side concern by
    * nature (listing a landing directory), not a distributed job. */
  def latestFile(dir: String, suffix: String): Option[Path] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) None
    else Files.list(d).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(suffix))
      .maxByOption(p => Files.getLastModifiedTime(p).toMillis)
  }

  /** Filename → (vendor, table, date) partition routing
    * (`s3_upload_automation.py:189-200`):
    * `VENDOR_VehicleSales_Export_2025-08-07.csv` →
    * `raw-data/VehicleSales/year=2025/month=08/day=07/`. */
  // table and export-type segments are underscore-free, so a vendor
  // containing underscores (ACME_CORP_VehicleSales_Export_…) parses as
  // vendor=ACME_CORP / table=VehicleSales rather than shifting segments
  private val FilePattern = """(\w+?)_([A-Za-z]+)_[A-Za-z]+_(\d{4})-(\d{2})-(\d{2})\.\w+""".r

  def partitionFor(fileName: String): Option[(String, String, String)] =
    fileName match {
      case FilePattern(vendor, table, y, m, d) =>
        Some((vendor, table, s"$table/year=$y/month=$m/day=$d"))
      case _ => None
    }

  /** One compacted leaf partition: path, files before, files after. */
  final case class CompactionReport(partition: String, before: Int, after: Int)

  /** Small-file compaction for an append-heavy partitioned table: every
    * micro-batch/daily append (`writePartitioned` runs in append mode)
    * leaves another file set in each touched partition, and at 100 TB
    * the scan cost of a fragmented lake is dominated by task-per-file
    * scheduling and parquet footer reads, not bytes. Each leaf
    * partition whose file count exceeds ⌈bytes / targetBytes⌉ is
    * rewritten to exactly that many files; partitions already at or
    * under the target are left byte-untouched (no blanket rewrite —
    * compaction must not churn the 99% of a lake that is already
    * healthy, or every run rewrites 100 TB).
    *
    * Directory walking and the swap are driver-side by nature (a
    * metadata-plane operation, like [[latestFile]]); the rewrite itself
    * is a distributed read + coalesce write. The new files land in a
    * sibling temp dir first and replace the originals only after the
    * write succeeds — a crash mid-compaction leaves the partition's
    * original files intact. */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      tableRoot: String,
      targetBytes: Long = 128L * 1024 * 1024): Seq[CompactionReport] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    def leaves(d: java.io.File): Seq[java.io.File] = {
      // a crashed prior run can leave a ._compact_tmp sibling behind —
      // never treat it as a partition (its files are an incomplete copy)
      if (d.getName.endsWith("._compact_tmp")) Nil
      else {
        val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
        val here =
          if (kids.exists(f => f.isFile && f.getName.endsWith(".parquet"))) Seq(d)
          else Nil
        here ++ kids.filter(_.isDirectory).flatMap(leaves)
      }
    }
    leaves(new java.io.File(tableRoot)).flatMap { leaf =>
      val files = leaf.listFiles().filter(f =>
        f.isFile && f.getName.endsWith(".parquet"))
      val bytes = files.map(_.length()).sum
      val want = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      if (files.length <= want) None
      else {
        val tmp = new java.io.File(leaf.getParentFile, leaf.getName + "._compact_tmp")
        // read THIS leaf only — no partition columns in scope, so the
        // rewrite round-trips the file schema exactly
        spark.read.parquet(leaf.getPath)
          .coalesce(want)
          .write.mode("overwrite").parquet(tmp.getPath)
        val newFiles = tmp.listFiles().filter(f =>
          f.isFile && f.getName.endsWith(".parquet"))
        files.foreach(_.delete())
        newFiles.foreach { f =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(leaf, f.getName).toPath)
        }
        tmp.listFiles().foreach(_.delete()) // _SUCCESS, .crc leftovers
        tmp.delete()
        Some(CompactionReport(leaf.getPath, files.length, newFiles.length))
      }
    }
  }
}
