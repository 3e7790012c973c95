package graft.etl

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The quarantine lane: malformed CSV lines land verbatim in the
  * quarantine frame with file provenance, good lines parse untouched,
  * and arity is enforced EXACTLY — a row with too few fields
  * quarantines like any other malformed row (readCsvWithQuarantine's
  * exact-arity contract; a truncated row padded with nulls would be
  * indistinguishable from a legitimately-null tail).
  */
class QuarantineSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("only exact-arity rows parse; malformed rows quarantine verbatim with provenance") {
    val dir = Files.createTempDirectory("quarantine").toString
    // 4-column file: one good row, one broken-quote row (unparseable),
    // one over-long row, one truncated row — only the good row may land
    val csv =
      """a,b,c,d
        |1,alpha,x,y
        |2,"broken,x,y
        |3,beta,x,y,EXTRA,MORE
        |4,gamma
        |""".stripMargin
    Files.writeString(Paths.get(dir, "drop.csv"), csv)

    val (good, quarantine) = VehicleSalesEtl.readCsvWithQuarantine(spark, dir)
    val goodRows = good.collect()
    val qRows = quarantine.collect()

    val goodA = goodRows.map(_.getAs[String]("a")).toSet
    assert(goodA == Set("1"), s"good lane must hold exactly the exact-arity row: $goodA")

    val raws = qRows.map(_.getAs[String]("raw_line"))
    assert(raws.exists(_.startsWith("3,beta")), s"over-long row not captured: ${raws.toSeq}")
    assert(raws.exists(_.startsWith("4,gamma")),
      s"truncated row must quarantine, not pad to NULLs: ${raws.toSeq}")
    assert(qRows.forall(_.getAs[String]("src_file").contains("drop.csv")),
      "file provenance missing")
    assert(raws.forall(_.nonEmpty))
  }

  test("a clean file quarantines nothing") {
    val dir = Files.createTempDirectory("quarantine_clean").toString
    Files.writeString(Paths.get(dir, "ok.csv"), "a,b\n1,x\n2,y\n")
    val (good, quarantine) = VehicleSalesEtl.readCsvWithQuarantine(spark, dir)
    assert(good.count() == 2)
    assert(quarantine.count() == 0)
  }
}
