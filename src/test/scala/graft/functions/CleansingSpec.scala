package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** FIXTURES.md §1 edge cases for the cleansing library, pinned against
  * the reference semantics (`sql/customer_360_views.sql:83-172`). */
class CleansingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val asOf = lit("2024-06-01").cast("date")

  private def one(in: java.lang.String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String = {
    Seq(Option(in)).toDF("v").select(c(col("v")).as("r")).head.getAs[String]("r")
  }

  test("cleanEmail: dummy prefixes and test domains → null; valid → lower(trim)") {
    assert(one("no@x.com", Cleansing.cleanEmail) == null)
    assert(one("noemail@dealer.com", Cleansing.cleanEmail) == null)
    assert(one("a@example.com", Cleansing.cleanEmail) == null)
    assert(one("b@test.com", Cleansing.cleanEmail) == null)
    assert(one("bad-email", Cleansing.cleanEmail) == null)
    assert(one("", Cleansing.cleanEmail) == null)
    assert(one(null, Cleansing.cleanEmail) == null)
    assert(one(" A@B.Co ", Cleansing.cleanEmail) == "a@b.co")
    // faithful reference quirk: leading space dodges the anchored prefix check
    assert(one(" no@x.com", Cleansing.cleanEmail) == "no@x.com")
  }

  test("normalizePhone: >=10 digits keeps ALL digits, else null") {
    assert(one("(555) 123-4567", Cleansing.normalizePhone) == "5551234567")
    assert(one("+1 (555) 123-4567", Cleansing.normalizePhone) == "15551234567")
    assert(one("555-1234", Cleansing.normalizePhone) == null) // 7 digits
    assert(one("555-123-456", Cleansing.normalizePhone) == null) // 9 digits
    assert(one(null, Cleansing.normalizePhone) == null)
  }

  test("normalizeGender: exact IN-lists only") {
    for ((in, out) <- Seq("M" -> "Male", "m" -> "Male", "Male" -> "Male",
        "MALE" -> "Male", "F" -> "Female", "f" -> "Female", "FEMALE" -> "Female",
        "Female" -> "Female", "x" -> "Unknown", "FeMale" -> "Unknown"))
      assert(one(in, Cleansing.normalizeGender) == out, s"gender $in")
    assert(one(null, Cleansing.normalizeGender) == "Unknown")
  }

  test("generation ladder boundaries at ages 24/25/39/40/54/55/74/75") {
    def gen(birthYear: Int): String =
      Seq(s"$birthYear-06-15").toDF("b")
        .select(Cleansing.generation(col("b").cast("date"), asOf).as("g"))
        .head.getString(0)
    // age = 2024 - birthYear (calendar-year diff, not floored)
    assert(gen(2000) == "Gen Z (Under 25)") // 24
    assert(gen(1999) == "Millennial (25-39)") // 25
    assert(gen(1985) == "Millennial (25-39)") // 39
    assert(gen(1984) == "Gen X (40-54)") // 40
    assert(gen(1970) == "Gen X (40-54)") // 54
    assert(gen(1969) == "Boomer (55-74)") // 55
    assert(gen(1950) == "Boomer (55-74)") // 74
    assert(gen(1949) == "Silent (75+)") // 75
  }

  test("serviceRecency boundaries at 89/90/180/365/366 days") {
    def rec(daysAgo: Int): String =
      spark.sql(s"SELECT date_sub(DATE '2024-06-01', $daysAgo) AS d")
        .select(Cleansing.serviceRecency(col("d"), asOf).as("r")).head.getString(0)
    assert(rec(89) == "Recent (0-90 days)")
    assert(rec(90) == "Recent (0-90 days)")
    assert(rec(91) == "Moderate (91-180 days)")
    assert(rec(180) == "Moderate (91-180 days)")
    assert(rec(365) == "Distant (181-365 days)")
    assert(rec(366) == "Inactive (365+ days)")
    assert(spark.sql("SELECT CAST(NULL AS DATE) AS d")
      .select(Cleansing.serviceRecency(col("d"), asOf).as("r")).head.getString(0)
      == "Never Serviced")
  }

  test("daysSinceOrSentinel: null date → 999999") {
    val r = spark.sql("SELECT CAST(NULL AS DATE) AS d, DATE '2024-01-01' AS d2")
      .select(
        Cleansing.daysSinceOrSentinel(col("d"), asOf).as("a"),
        Cleansing.daysSinceOrSentinel(col("d2"), asOf).as("b")).head
    assert(r.getInt(0) == 999999)
    assert(r.getInt(1) == 152)
  }

  test("valueSegment ladder boundaries 25000/50000/100000 inclusive") {
    def seg(v: Double): String =
      Seq(v).toDF("v").select(Cleansing.valueSegment(col("v")).as("s")).head.getString(0)
    assert(seg(100000.0) == "platinum")
    assert(seg(99999.99) == "gold")
    assert(seg(50000.0) == "gold")
    assert(seg(49999.99) == "silver")
    assert(seg(25000.0) == "silver")
    assert(seg(24999.99) == "bronze")
  }

  test("messageId is deterministic md5 of joined parts") {
    val r = spark.range(1)
      .select(Cleansing.messageId(lit("vehicle_purchase"), lit("D1"), lit("VIN9")).as("m"))
      .head.getString(0)
    // md5("vehicle_purchase_D1_VIN9")
    assert(r == java.security.MessageDigest.getInstance("MD5")
      .digest("vehicle_purchase_D1_VIN9".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
  }

  test("isContactable: loose email OR 10-digit phone (raw-value semantics)") {
    def c(e: java.lang.String, p: java.lang.String): Boolean =
      Seq((Option(e), Option(p))).toDF("e", "p")
        .select(Cleansing.isContactable(col("e"), col("p")).as("c")).head.getBoolean(0)
    assert(c("a@test.com", null)) // test domain still contactable, faithfully
    assert(!c("bad-email", null))
    assert(c(null, "(555) 123-4567"))
    assert(!c(null, "555-1234"))
    assert(!c(null, null))
  }
}
