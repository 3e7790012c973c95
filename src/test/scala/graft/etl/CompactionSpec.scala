package graft.etl

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Small-file compaction: fragmented partitions collapse to the target
  * file count with byte-identical data; healthy partitions are not
  * churned (same physical files afterwards — the property that keeps a
  * compaction run from rewriting the whole lake).
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def parquetNames(dir: java.io.File): Set[String] =
    dir.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).toSet

  test("compaction merges fragmented partitions, leaves healthy ones untouched") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft-compact").toFile.getAbsolutePath
    val day = java.time.LocalDate.of(2025, 8, 7)
    // six append batches → ≥6 files in the same leaf partition
    (1 to 6).foreach { i =>
      LakeWriter.writePartitioned(
        Seq((i.toLong, s"row$i")).toDF("id", "payload"),
        "frag", root, day, vendor = "ACME")
    }
    // one single-file partition that is already healthy (coalesced —
    // a parallel local write would itself fragment into task files)
    LakeWriter.writePartitioned(
      (100L to 120L).map(i => (i, s"row$i")).toDF("id", "payload").coalesce(1),
      "frag", root, day.plusDays(1), vendor = "ACME")

    val fragLeaf = new java.io.File(s"$root/frag/year=2025/month=08/day=07")
    val okLeaf = new java.io.File(s"$root/frag/year=2025/month=08/day=08")
    assert(parquetNames(fragLeaf).size >= 6)
    val okBefore = parquetNames(okLeaf)
    val before = spark.read.parquet(s"$root/frag")
      .collect().map(_.toString).sorted

    val reports = LakeWriter.compact(spark, s"$root/frag")

    // the fragmented leaf compacted to ONE file (total bytes << target)
    assert(parquetNames(fragLeaf).size == 1)
    val r = reports.find(_.partition == fragLeaf.getPath)
    assert(r.exists(r => r.before >= 6 && r.after == 1), s"report: $reports")
    // the healthy leaf kept its exact physical files — zero churn
    assert(parquetNames(okLeaf) == okBefore)
    assert(!reports.exists(_.partition == okLeaf.getPath))
    // data is identical row-for-row, partition values included
    val after = spark.read.parquet(s"$root/frag")
      .collect().map(_.toString).sorted
    assert(after.toSeq == before.toSeq)
    // idempotent: a second run finds nothing to do
    assert(LakeWriter.compact(spark, s"$root/frag").isEmpty)
  }

  test("a stale ._compact_tmp from a crashed run is never treated as a partition") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft-compact-crash").toFile.getAbsolutePath
    val day = java.time.LocalDate.of(2025, 8, 7)
    (1 to 3).foreach { i =>
      LakeWriter.writePartitioned(
        Seq((i.toLong, s"row$i")).toDF("id", "payload"),
        "t", root, day, vendor = "ACME")
    }
    val leaf = new java.io.File(s"$root/t/year=2025/month=08/day=07")
    // simulate a crash: an incomplete tmp copy next to the real leaf
    val tmp = new java.io.File(leaf.getParentFile, leaf.getName + "._compact_tmp")
    Seq((999L, "partial")).toDF("id", "payload")
      .write.parquet(tmp.getPath)
    val reports = LakeWriter.compact(spark, s"$root/t")
    assert(reports.map(_.partition) == Seq(leaf.getPath))
    // the real leaf compacted; the tmp dir's bogus row never surfaced
    val rows = spark.read.parquet(leaf.getPath).collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == Seq(1L, 2L, 3L))
  }
}
