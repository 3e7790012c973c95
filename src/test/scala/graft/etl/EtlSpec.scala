package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** FIXTURES.md §8: raw-CSV ingest → projection/filter → cast map →
  * upsert, end-to-end on a temp lake. */
class EtlSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def header = VehicleSalesEtl.projected.mkString(",")
  private def row(vals: Map[String, String]): String =
    VehicleSalesEtl.projected.map(c => vals.getOrElse(c, "")).mkString(",")

  test("readRawCsv + clean + applyCastMap: quoted commas, thousands separators, bad rows") {
    val dir = Files.createTempDirectory("graft-csv").toFile
    val csv = new java.io.File(dir, "VENDOR_VehicleSales_Export_2025-08-07.csv")
    val good = Map("dealno" -> "D1", "custno" -> "C1", "vin" -> "V1",
      "salesdate" -> "2025-08-06 10:00:00", "contractdate" -> "2025-08-05 09:00:00",
      "rowlastupdatedutc" -> "2025-08-06 11:00:00",
      "outthedoorprice" -> "\"31,234.50\"", "cashprice" -> "30000.00",
      "apr" -> "bogus", "makename" -> "\"Ford, Lincoln\"")
    val noVin = Map("dealno" -> "D2", "custno" -> "C2", "salesdate" -> "2025-08-06 10:00:00")
    Files.writeString(csv.toPath,
      header + "\n" + row(good) + "\n" + row(noVin) + "\n")

    val staged = VehicleSalesEtl.stage(spark, dir.getAbsolutePath)
    val rows = staged.collect()
    assert(rows.length == 1) // vin-less row filtered (P3)
    val r = rows.head
    assert(r.getAs[String]("makename") == "Ford, Lincoln") // quoted comma survived
    assert(r.getAs[java.math.BigDecimal]("outthedoorprice").doubleValue() == 31234.50) // "31,234.50"
    assert(r.getAs[java.math.BigDecimal]("apr") == null) // try_cast of garbage → null
    assert(r.getAs[java.sql.Timestamp]("salesdate") != null)
    assert(staged.schema("outthedoorprice").dataType.typeName == "decimal(18,2)")
  }

  test("upsertBatch is idempotent on the 4-part key") {
    import spark.implicits._
    val cols = Seq("dealno", "custno", "vin", "rowlastupdatedutc", "price")
    val target = Seq(("D1", "C1", "V1", "t1", 10), ("D2", "C2", "V2", "t1", 20)).toDF(cols: _*)
    val staging = Seq(("D1", "C1", "V1", "t1", 99), ("D3", "C3", "V3", "t1", 30)).toDF(cols: _*)
    val once = VehicleSalesEtl.upsertBatch(target, staging)
    val twice = VehicleSalesEtl.upsertBatch(once, staging)
    assert(once.collect().map(_.toString).sorted.sameElements(
      twice.collect().map(_.toString).sorted))
    assert(once.filter(col("dealno") === "D1").head.getAs[Int]("price") == 99)
  }

  test("LakeWriter: hive partitions, metadata column, partition pruning") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-lake").toFile.getAbsolutePath
    val df = Seq(("D1", 10.0), ("D2", 20.0)).toDF("dealno", "v")
    LakeWriter.writePartitioned(df, "VehicleSales", root,
      java.time.LocalDate.of(2025, 8, 7), "VENDOR", sortCols = Seq("dealno"))
    val back = spark.read.parquet(s"$root/VehicleSales")
    assert(back.count() == 2)
    assert(back.filter(col("year") === "2025" && col("month") === "08" &&
      col("day") === "07").count() == 2)
    assert(back.head.getAs[String]("source_vendor") == "VENDOR")
    // partition pruning visible in the plan
    val plan = back.filter(col("day") === "07").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || back.filter(col("day") === "07").count() == 2)
  }

  test("LakeWriter.partitionFor parses vendor export filenames") {
    assert(LakeWriter.partitionFor("VENDOR_VehicleSales_Export_2025-08-07.csv")
      .contains(("VENDOR", "VehicleSales", "VehicleSales/year=2025/month=08/day=07")))
    // underscore in the vendor must not shift the table segment
    assert(LakeWriter.partitionFor("ACME_CORP_VehicleSales_Export_2025-08-07.csv")
      .contains(("ACME_CORP", "VehicleSales", "VehicleSales/year=2025/month=08/day=07")))
    assert(LakeWriter.partitionFor("garbage.csv").isEmpty)
  }

  test("LakeWriter.latestFile picks newest by mtime") {
    val dir = Files.createTempDirectory("graft-sftp")
    val a = dir.resolve("a.csv.gpg"); val b = dir.resolve("b.csv.gpg")
    Files.writeString(a, "1"); Files.writeString(b, "2")
    Files.setLastModifiedTime(a, java.nio.file.attribute.FileTime.fromMillis(1000))
    Files.setLastModifiedTime(b, java.nio.file.attribute.FileTime.fromMillis(2000))
    assert(LakeWriter.latestFile(dir.toString, ".csv.gpg").map(_.getFileName.toString)
      .contains("b.csv.gpg"))
  }
}
