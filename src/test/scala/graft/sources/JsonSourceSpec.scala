package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The JSON quarantine lane, and the places its contract DIFFERS from
  * the CSV lane's exact-arity rule: JSON rows carry their own structure,
  * so missing fields null-backfill and extra fields project away (both
  * GOOD), while anything Jackson cannot bind to the declared schema —
  * truncated line, broken nesting, a type conflict, a bare array —
  * quarantines verbatim with file provenance.
  */
class JsonSourceSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("kind", StringType),
    StructField("score", DoubleType)))

  test("parse/type failures quarantine verbatim; structural variance stays good") {
    val dir = Files.createTempDirectory("json_lane").toString
    val lines = Seq(
      """{"id": 1, "kind": "view", "score": 0.5}""", // good
      """{"id": 2, "kind": "click"}""", // missing field -> good, score NULL
      """{"id": 3, "kind": "buy", "score": 1.0, "extra": "ignored"}""", // extra field -> good
      """{"id": "not-a-number", "kind": "view", "score": 0.1}""", // type conflict -> quarantine
      """{"id": 5, "kind": "vi""", // truncated -> quarantine
      """[1, 2, 3]""") // bare array -> quarantine
    Files.writeString(Paths.get(dir, "drop.json"), lines.mkString("\n") + "\n")

    val (good, quarantine) = JsonSource.readWithQuarantine(spark, dir, schema)
    val goodRows = good.collect()
    val qRows = quarantine.collect()

    val goodIds = goodRows.map(r => Option(r.getAs[java.lang.Long]("id")).map(_.toLong)).toSet
    assert(goodIds == Set(Some(1L), Some(2L), Some(3L)),
      s"good lane must hold exactly the bindable objects: $goodIds")
    val nullScore = goodRows.find(_.getAs[java.lang.Long]("id") == 2L).get
    assert(nullScore.isNullAt(nullScore.fieldIndex("score")),
      "missing field must null-backfill, not quarantine")
    assert(goodRows.forall(_.schema.fieldNames.toSeq == schema.fieldNames.toSeq),
      "extra fields must project away")

    val raws = qRows.map(_.getAs[String]("raw_line")).toSeq
    assert(raws.size == 3, s"exactly the unbindable lines quarantine: $raws")
    assert(raws.exists(_.contains("not-a-number")), s"type conflict not captured: $raws")
    assert(raws.exists(_.startsWith("""{"id": 5""")), s"truncated line not captured: $raws")
    assert(raws.exists(_.startsWith("[1")), s"bare array not captured: $raws")
    assert(qRows.forall(_.getAs[String]("src_file").contains("drop.json")),
      "file provenance missing")
  }

  test("whitespace-only lines skip; non-JSON-whitespace lines quarantine") {
    val dir = Files.createTempDirectory("json_lane_blank").toString
    Files.writeString(Paths.get(dir, "drop.json"),
      """{"id": 1, "kind": "a", "score": 0.1}""" + "\n" +
        "\t\t\n" + // tab-only: JSON whitespace -> skipped, not quarantined
        "   \r\n" + // space+CR: skipped
        "\n" + // empty: skipped
        "\f\n") // form feed is NOT JSON whitespace -> quarantines
    val (good, quarantine) = JsonSource.readWithQuarantine(spark, dir, schema)
    assert(good.count() == 1)
    val raws = quarantine.collect().map(_.getAs[String]("raw_line")).toSeq
    assert(raws == Seq("\f"),
      s"only the form-feed line may quarantine: ${raws.map(_.map(_.toInt))}")
  }

  test("a clean drop quarantines nothing") {
    val dir = Files.createTempDirectory("json_lane_clean").toString
    Files.writeString(Paths.get(dir, "ok.json"),
      """{"id": 1, "kind": "a", "score": 0.1}""" + "\n" +
        """{"id": 2, "kind": "b", "score": 0.2}""" + "\n")
    val (good, quarantine) = JsonSource.readWithQuarantine(spark, dir, schema)
    assert(good.count() == 2)
    assert(quarantine.count() == 0)
  }

  test("the lane refuses a schema that claims the corrupt column") {
    val bad = StructType(Seq(StructField("_corrupt_record", StringType)))
    assertThrows[IllegalArgumentException] {
      JsonSource.readWithQuarantine(spark, "/tmp/nowhere", bad)
    }
  }

  test("streaming twin: both lanes pick up new drops incrementally") {
    val dir = Files.createTempDirectory("json_stream").toString
    Files.writeString(Paths.get(dir, "drop1.json"),
      """{"id": 1, "kind": "a", "score": 0.1}""" + "\n" + """{"id": "bad"}""" + "\n")
    val (good, quarantine) = JsonSource.streamWithQuarantine(spark, dir, schema)
    val gq = good.writeStream.format("memory").queryName("js_good")
      .outputMode("append").start()
    val qq = quarantine.writeStream.format("memory").queryName("js_quar")
      .outputMode("append").start()
    try {
      gq.processAllAvailable(); qq.processAllAvailable()
      assert(spark.table("js_good").collect().map(_.getAs[Long]("id")).toSet == Set(1L))
      assert(spark.table("js_quar").collect()
        .map(_.getAs[String]("raw_line")).toSet == Set("""{"id": "bad"}"""))
      // a later drop is discovered without restarting either query —
      // each lane's file-source checkpoint is its own high-water mark
      Files.writeString(Paths.get(dir, "drop2.json"),
        """{"id": 2, "kind": "b", "score": 0.2}""" + "\n" + """[7]""" + "\n")
      gq.processAllAvailable(); qq.processAllAvailable()
      assert(spark.table("js_good").collect().map(_.getAs[Long]("id")).toSet ==
        Set(1L, 2L))
      assert(spark.table("js_quar").collect()
        .map(_.getAs[String]("raw_line")).toSet ==
        Set("""{"id": "bad"}""", "[7]"))
      assert(spark.table("js_quar").collect()
        .forall(_.getAs[String]("src_file").nonEmpty), "streaming provenance missing")
    } finally { gq.stop(); qq.stop() }
  }
}
