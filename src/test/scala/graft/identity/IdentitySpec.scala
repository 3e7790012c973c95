package graft.identity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.functions.LeadFunctions

/** FIXTURES.md §4-6 scenario seeded from the reference's sample data
  * (`database-schema.sql:418-480`): session-id match found; contact
  * fallback inside/outside the 24h window; unmatched lead feeds the
  * rollup; ADF parsing and fuzzy scoring. */
class IdentitySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val sessions = Seq(
    // id, dr_session_id, email, phone, last_seen
    (1, "dr_session_67890", "visitor1@gmail.com", null, "2024-01-10 10:00:00"),
    (2, null, "visitor2@gmail.com", "(512) 555-0100", "2024-01-10 09:00:00"),
    (3, null, null, "(512) 555-0200", "2024-01-01 00:00:00"))
    .toDF("id", "digital_retailing_session_id", "email", "phone", "last_seen")
    .withColumn("last_seen", col("last_seen").cast("timestamp"))
    .withColumn("created_at", col("last_seen"))

  private val leads = Seq(
    // id, crm_session_id, email, phone, created_at
    (101, "dr_session_67890", "other@x.com", null, "2024-01-10 12:00:00"), // exact session match
    (102, null, "VISITOR2@GMAIL.COM ", null, "2024-01-10 20:00:00"), // email fallback inside 24h
    (103, null, null, "512-555-0200", "2024-01-05 00:00:00"), // phone, but 4 days after session → no match
    (104, null, "nobody@x.com", null, "2024-01-10 13:00:00")) // unmatched
    .toDF("id", "crm_session_id", "email", "phone", "created_at")
    .withColumn("created_at", col("created_at").cast("timestamp"))
    .withColumn("lead_source", lit("website"))
    .withColumn("lead_type", lit("sales"))
    .withColumn("estimated_deal_value", lit(35000).cast("decimal(10,2)"))

  test("matchLeads: session-id exact, contact fallback in-window, none outside") {
    val m = IdentityResolution.matchLeads(sessions, leads)
      .collect().map(r => r.getAs[Int]("crm_lead_id") ->
        (r.getAs[Int]("visitor_session_id"), r.getAs[String]("match_method"))).toMap
    assert(m(101) == (1, "session_id"))
    assert(m(102) == (2, "email_phone"))
    assert(!m.contains(103)) // outside the 24h window
    assert(!m.contains(104))
  }

  test("blank-string emails are missing data, never a join key") {
    val blankSessions = Seq(
      (10, null.asInstanceOf[String], "  ", null.asInstanceOf[String], "2024-01-10 10:00:00"))
      .toDF("id", "digital_retailing_session_id", "email", "phone", "last_seen")
      .withColumn("last_seen", col("last_seen").cast("timestamp"))
      .withColumn("created_at", col("last_seen"))
    val blankLeads = Seq(
      (201, null.asInstanceOf[String], "", null.asInstanceOf[String], "2024-01-10 12:00:00"))
      .toDF("id", "crm_session_id", "email", "phone", "created_at")
      .withColumn("created_at", col("created_at").cast("timestamp"))
    // '' lead email vs '  ' session email inside the 24h window: both
    // normalize to null → no email_phone match (previously '' === ''
    // would mass-match every blank contact)
    assert(IdentityResolution.matchLeads(blankSessions, blankLeads).count() == 0)
  }

  test("recomputeMatchState fills denormalized flags on both sides") {
    val matches = IdentityResolution.matchLeads(sessions, leads)
    val (s2, l2) = IdentityResolution.recomputeMatchState(sessions, leads, matches)
    val sm = s2.collect().map(r => r.getAs[Int]("id") -> r.getAs[Boolean]("is_matched")).toMap
    assert(sm(1) && sm(2) && !sm(3))
    val lm = l2.collect().map(r => r.getAs[Int]("id") ->
      (r.getAs[Boolean]("is_matched"), r.getAs[String]("match_method"))).toMap
    assert(lm(101) == (true, "session_id"))
    assert(lm(102) == (true, "email_phone"))
    assert(lm(103) == (false, null))
    assert(lm(104) == (false, null))
  }

  test("unmatchedLeads rollup counts only unmatched recent leads") {
    val matches = IdentityResolution.matchLeads(sessions, leads)
    val (_, l2) = IdentityResolution.recomputeMatchState(sessions, leads, matches)
    val roll = IdentityResolution.unmatchedLeads(l2, lit("2024-01-12").cast("date"))
      .collect()
    // The reference view uses `created_at >= CURRENT_DATE - 7 days`
    // (database-schema.sql:355), so 103 at exactly 2024-01-05 00:00:00 is
    // boundary-INCLUDED alongside 104.
    assert(roll.map(_.getAs[Long]("unmatched_count")).sum == 2)
    val roll2 = IdentityResolution.unmatchedLeads(l2, lit("2024-01-13").cast("date"))
      .collect()
    // one day later 103 falls out of the window; only 104 remains
    assert(roll2.map(_.getAs[Long]("unmatched_count")).sum == 1)
  }

  test("expireUnmatchedSessions keeps matched and recent rows only") {
    val old = Seq((9, null.asInstanceOf[String], null.asInstanceOf[String],
      null.asInstanceOf[String], "2020-01-01 00:00:00"))
      .toDF("id", "digital_retailing_session_id", "email", "phone", "last_seen")
      .withColumn("last_seen", col("last_seen").cast("timestamp"))
      .withColumn("created_at", col("last_seen"))
    val all = sessions.unionByName(old)
      .withColumn("is_matched", col("id").isin(1, 9))
    val kept = IdentityResolution.expireUnmatchedSessions(
      all, lit("2024-06-01").cast("date"))
    // id 9 is ancient but matched → kept; ids 1-3 are within 2y → kept
    assert(kept.select("id").as[Int].collect().toSet == Set(1, 2, 3, 9))
    val unmatchedOld = all.withColumn("is_matched", lit(false))
    assert(IdentityResolution.expireUnmatchedSessions(
      unmatchedOld, lit("2026-06-01").cast("date")).count() == 0)
  }

  test("adfLead parses the ADF/XML lead shape (U4)") {
    val xml = """<?xml version="1.0"?><adf><prospect>
      <requestdate>2024-01-10T12:00:00</requestdate>
      <id source="lead">LEAD_12345</id>
      <customer><contact>
        <name part="first">John</name><name part="last">Smith</name>
        <email>john.smith@email.com</email>
        <phone>512-555-0199</phone>
      </contact><id source="sd_session">dr_session_67890</id></customer>
      <vehicle><year>2024</year><make>Subaru</make>
        <model>Outback</model><vin>4S4BTANC5P3123456</vin></vehicle>
    </prospect></adf>"""
    val r = Seq(xml).toDF("raw")
      .select(LeadFunctions.adfLead(col("raw")).as("lead"))
      .select("lead.*").head
    assert(r.getAs[String]("lead_id") == "LEAD_12345")
    assert(r.getAs[String]("first_name") == "John")
    assert(r.getAs[String]("last_name") == "Smith")
    assert(r.getAs[String]("email") == "john.smith@email.com")
    assert(r.getAs[Int]("vehicle_year") == 2024)
    assert(r.getAs[String]("vehicle_vin") == "4S4BTANC5P3123456")
    assert(r.getAs[String]("sd_session_id") == "dr_session_67890")
  }

  test("matchScore blends email/phone/name components (U5)") {
    def score(le: String, lp: String, ln: String, ve: String, vp: String, vn: String) =
      Seq((le, lp, ln, ve, vp, vn)).toDF("le", "lp", "ln", "ve", "vp", "vn")
        .select(LeadFunctions.matchScore(col("le"), col("lp"), col("ln"),
          col("ve"), col("vp"), col("vn")).as("s")).head.getDouble(0)
    assert(score("a@x.com", "512-555-0100", "John Smith",
      "A@X.COM", "(512) 555-0100", "John Smith") == 1.0)
    assert(score("a@x.com", null, "Jon Smith", "a@x.com", null, "John Smith") > 0.6)
    assert(score("a@x.com", null, null, "b@y.com", null, null) == 0.0)
  }
}
