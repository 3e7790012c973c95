package graft.views

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Golden fixture tests for the six customer-360 views (FIXTURES.md §1-2),
  * frozen at asOf = 2024-06-01. Fixtures go through the same code the
  * driver gate exercises (`views.Customer360`), so these pin the
  * business-rule boundaries the differential oracle can't name:
  * dedup tie handling, segment/flag thresholds, id-prefix routing. */
class Customer360Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val asOf = lit("2024-06-01").cast("date")

  /** customer_master fixture: 4 marketable customers + rejects. */
  private def cm: DataFrame = {
    val rows = Seq(
      // custno, firstname, lastname, email, telephone, gender, birthdate, lastservicedate, blockemail, optoutflag, isdeleted, deletedataflag, labor, parts, lastupdated
      ("C1", "Ann", "Lee", "Ann@Shop.Net", "(555) 123-4567", "F", "1990-06-15", "2024-05-01", false, false, null, null, "100.00", "50.00", "2024-01-02 00:00:00"),
      ("C1", "Old", "Lee", "old@shop.net", "(555) 123-4567", "F", "1990-06-15", "2024-05-01", false, false, null, null, "1.00", "1.00", "2024-01-01 00:00:00"), // stale dup
      ("C2", "Bob", "Ray", "no@x.com", "555-123-4567", "M", null, null, true, false, null, null, null, null, "2024-01-01 00:00:00"), // dummy email, phone ok
      ("C3", "Cat", "Kim", "cat@example.com", "(555) 999-8888", "x", "1949-01-01", "2023-01-01", false, true, null, null, "10.00", null, "2024-01-01 00:00:00"), // test-domain email cleans to null; phone keeps row marketable
      ("C4", "", "Empty", "d@ok.com", null, "f", "2000-01-01", null, false, false, null, null, null, null, "2024-01-01 00:00:00"), // empty firstname → dropped
      ("C5", "Del", "Gone", "e@ok.com", null, "M", "2000-01-01", null, false, false, java.lang.Boolean.TRUE, null, null, null, "2024-01-01 00:00:00"), // soft-deleted
      ("C6", "Una", "Reach", "bad-email", "555-1234", "F", "2000-01-01", null, false, false, null, null, null, null, "2024-01-01 00:00:00")) // no valid contact → dropped
    rows.toDF("custno", "firstname", "lastname", "email", "telephone", "gender",
        "birthdate", "lastservicedate", "blockemail", "optoutflag", "isdeleted",
        "deletedataflag", "totallabor", "totalparts", "lastupdated")
      .withColumn("birthdate", col("birthdate").cast("date"))
      .withColumn("lastservicedate", col("lastservicedate").cast("date"))
      .withColumn("totallabor", col("totallabor").cast("decimal(18,2)"))
      .withColumn("totalparts", col("totalparts").cast("decimal(18,2)"))
      .withColumn("lastupdated", col("lastupdated").cast("timestamp"))
      .withColumn("address", lit(" 1 Way "))
      .withColumn("addresssecondline", lit(null).cast("string"))
      .withColumn("city", lit("Town"))
      .withColumn("state", lit(" tx "))
      .withColumn("ziporpostalcode", lit("78701-1234x"))
      .withColumn("preferredlanguage", lit(null).cast("string"))
      .withColumn("blockphone", lit(false))
      .withColumn("blockmail", lit(false))
      .withColumn("optoutdate", lit(null).cast("date"))
      .withColumn("ytdpurchases", lit(null).cast("decimal(18,2)"))
      .withColumn("dateadded", lit("2020-01-01 00:00:00").cast("timestamp"))
  }

  /** vehicle_sales fixture: thresholds + dedup versions + branches. */
  private def vs: DataFrame = {
    val rows = Seq(
      // dealno, custno, vin, branch, modeltype, saletype, outthedoor, trade1vin, contract, rowupdated, color
      ("D1", "C1", "V1", "FORD-MAIN", "NEW CAR", "CASH DEAL", "30000.00", "TV1", "2024-05-20 00:00:00", "2024-05-20 01:00:00", "Red"),
      ("D2", "C1", "V2", "FORD-MAIN", "used vehicle", "Retail Finance", "40000.00", null, "2021-01-01 00:00:00", "2021-01-02 00:00:00", "Blue"),
      ("D2", "C1", "V2", "FORD-MAIN", "used vehicle", "Retail Finance", "45000.00", null, "2021-01-01 00:00:00", "2021-01-03 00:00:00", "Green"), // later version wins
      ("D3", "C2", "V3", "TOYOTA-NORTH", "Certified pre-owned", "Smart Lease", "20000.00", null, "2020-06-20 00:00:00", "2020-06-21 00:00:00", "White"),
      ("D4", null, "V4", "CHEV-SOUTH", "DEMO", "Other", "1.00", null, "2024-01-01 00:00:00", "2024-01-01 00:00:00", "Black"), // null custno dropped
      ("D5", "C3", null, "CHEV-SOUTH", "DEMO", "Other", "1.00", null, "2024-01-01 00:00:00", "2024-01-01 00:00:00", "Black")) // null vin dropped
    rows.toDF("dealno", "custno", "vin", "branch", "modeltype", "saletype",
        "outthedoorprice", "trade1vin", "contractdate", "rowlastupdatedutc", "color")
      .withColumn("outthedoorprice", col("outthedoorprice").cast("decimal(18,2)"))
      .withColumn("contractdate", col("contractdate").cast("timestamp"))
      .withColumn("rowlastupdatedutc", col("rowlastupdatedutc").cast("timestamp"))
      .withColumn("stockno", concat(lit("S"), col("dealno")))
      .withColumn("makename", lit("Subaru"))
      .withColumn("modelname", lit("Outback"))
      .withColumn("year", lit("2023"))
      .withColumn("bodystyle", lit("SUV"))
      .withColumn("vehiclemileage", lit("100.00").cast("decimal(18,2)"))
      .withColumn("dealtype", lit("Retail"))
      .withColumn("cashprice", col("outthedoorprice") - 250)
      .withColumn("costprice", col("outthedoorprice") - 500)
      .withColumn("totalgross", lit("1000.00").cast("decimal(18,2)"))
      .withColumn("frontgross", lit("600.00").cast("decimal(18,2)"))
      .withColumn("backgross", lit("400.00").cast("decimal(18,2)"))
      .withColumn("customercashdown", lit("500.00").cast("decimal(18,2)"))
      .withColumn("totaldown", lit("700.00").cast("decimal(18,2)"))
      .withColumn("financesource", lit(null).cast("string"))
      .withColumn("financeamt", lit(null).cast("decimal(18,2)"))
      .withColumn("apr", lit(null).cast("decimal(18,2)"))
      .withColumn("term", lit(null).cast("decimal(18,0)"))
      .withColumn("paymentamt", lit(null).cast("decimal(18,2)"))
      .withColumn("trade1acv", when(col("trade1vin").isNotNull, lit("2000.00").cast("decimal(18,2)")))
      .withColumn("trade1payoff", when(col("trade1vin").isNotNull, lit("1500.00").cast("decimal(18,2)")))
      .withColumn("nettrade1", when(col("trade1vin").isNotNull, lit("500.00").cast("decimal(18,2)")))
      .withColumn("trade1year", when(col("trade1vin").isNotNull, lit("2018")))
      .withColumn("trade1makename", when(col("trade1vin").isNotNull, lit("Mazda")))
      .withColumn("trade1modelname", when(col("trade1vin").isNotNull, lit("3")))
      .withColumn("leasetype", lit(null).cast("string"))
      .withColumn("leasepayment", lit(null).cast("decimal(18,2)"))
      .withColumn("leasemileageallowance", lit(null).cast("decimal(18,2)"))
      .withColumn("leaseendvalue", lit(null).cast("decimal(18,2)"))
      .withColumn("crmsalesmgrname", lit("Mgr"))
      .withColumn("crmsp1name", lit("SP"))
      .withColumn("salesdate", col("contractdate") + expr("INTERVAL 2 DAYS"))
  }

  private lazy val profiles = Customer360.customerProfiles(cm, asOf)
  private lazy val history = Customer360.vehicleHistory(vs, asOf)

  test("customerProfiles: an explicit tiebreak makes tied versions deterministic") {
    // two versions tie on BOTH lastupdated and dateadded — without a
    // unique tiebreak rank-1 is engine-arbitrary (the differential gate
    // would flap); with the rowid tiebreak the higher rowid wins
    val tied = cm.filter(col("custno") === "C1")
      .withColumn("lastupdated", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withColumn("rowid", when(col("firstname") === "Ann", 2L).otherwise(1L))
    val out = Customer360.customerProfiles(tied, asOf, Seq(col("rowid").desc))
      .select("firstname").as[String].collect().toSeq
    assert(out == Seq("Ann"))
    val outFlipped = Customer360.customerProfiles(tied, asOf, Seq(col("rowid").asc))
      .select("firstname").as[String].collect().toSeq
    assert(outFlipped == Seq("Old"))
  }

  test("customerProfiles: dedup keeps latest version; rejects drop out") {
    val out = profiles.collect().map(r => r.getAs[String]("custno") -> r).toMap
    assert(out.keySet == Set("C1", "C2", "C3"))
    val c1 = out("C1")
    assert(c1.getAs[String]("firstname") == "Ann") // latest lastupdated won
    assert(c1.getAs[String]("email") == "ann@shop.net")
    assert(c1.getAs[String]("phone") == "5551234567")
    assert(c1.getAs[String]("state") == "TX")
    assert(c1.getAs[String]("zip") == "78701-1234")
    assert(c1.getAs[String]("gender") == "Female")
    assert(c1.getAs[Int]("age") == 34)
    assert(c1.getAs[String]("generation") == "Millennial (25-39)")
    assert(c1.getAs[String]("service_recency") == "Recent (0-90 days)")
    assert(c1.getAs[java.math.BigDecimal]("lifetime_service_value").doubleValue() == 150.0)
    val c2 = out("C2")
    assert(c2.getAs[String]("email") == null) // dummy prefix rejected
    assert(c2.getAs[Boolean]("email_opt_out")) // blockemail carried through
    val c3 = out("C3")
    assert(c3.getAs[String]("email") == null) // test domain rejected but row kept (raw contactable quirk)
    assert(c3.getAs[java.math.BigDecimal]("lifetime_service_value").doubleValue() == 0.0) // null+10 → null → 0
  }

  test("vehicleHistory: latest deal version wins; ladders and sequence correct") {
    val out = history.collect().map(r => r.getAs[String]("deal_number") -> r).toMap
    assert(out.keySet == Set("D1", "D2", "D3"))
    val d2 = out("D2")
    assert(d2.getAs[java.math.BigDecimal]("total_price").doubleValue() == 45000.0)
    assert(d2.getAs[String]("color") == "Green")
    assert(d2.getAs[String]("vehicle_condition") == "Used")
    assert(d2.getAs[String]("transaction_type") == "Financed")
    assert(out("D1").getAs[String]("vehicle_condition") == "New")
    assert(out("D1").getAs[String]("transaction_type") == "Cash")
    assert(out("D3").getAs[String]("vehicle_condition") == "Certified Pre-Owned")
    assert(out("D3").getAs[String]("transaction_type") == "Lease")
    assert(out("D1").getAs[String]("trade_vehicle_description") == "2018 Mazda 3")
    assert(out("D2").getAs[String]("trade_vehicle_description") == null) // null trade → null concat
    // C1's deals ordered by contractdate: D2 (2021) = 1, D1 (2024) = 2
    assert(out("D2").getAs[Int]("purchase_sequence") == 1)
    assert(out("D1").getAs[Int]("purchase_sequence") == 2)
    assert(out("D1").getAs[String]("purchase_recency") == "Recent (0-30 days)")
    assert(out("D3").getAs[String]("purchase_recency") == "Legacy (3+ years)")
  }

  test("customerSegments: ladder, flags and ordered-distinct arrays") {
    val segs = Customer360.customerSegments(profiles, history, asOf)
      .collect().map(r => r.getAs[String]("custno") -> r).toMap
    assert(segs.keySet == Set("C1", "C2", "C3"))
    val c1 = segs("C1")
    assert(c1.getAs[Long]("total_purchases") == 2)
    // 30000 + 45000 + 150 service = 75150 → >=50000 and 2 purchases
    assert(c1.getAs[String]("customer_segment") == "High Value Repeat")
    assert(c1.getAs[Boolean]("recent_buyer")) // D1 within 30 days of asOf
    assert(c1.getSeq[String](c1.fieldIndex("purchase_patterns")) == Seq("New", "Used"))
    val c2 = segs("C2")
    assert(c2.getAs[Long]("total_purchases") == 1)
    // purchase 2020-06-20 → ~4 years ago, single purchase
    assert(c2.getAs[String]("customer_segment") == "Historical First-Time")
    assert(c2.getAs[Int]("days_since_last_service") == 999999)
    val c3 = segs("C3")
    assert(c3.getAs[Long]("total_purchases") == 0) // its only sale had null vin
    assert(c3.getAs[String]("customer_segment") == "Prospect") // service value 0
    assert(c3.getSeq[String](c3.fieldIndex("preferred_makes")) == Seq())
    assert(c3.getAs[Int]("days_since_last_purchase") == 999999)
  }

  test("dealershipProfiles: primary branch by count then recency; CDP id prefixes") {
    val dp = Customer360.dealershipProfiles(profiles, vs)
      .collect().map(r => r.getAs[String]("custno") -> r).toMap
    // C1 kept (valid email, no opt-outs); C2 has blockemail → dropped; C3 has optoutflag + null email → dropped
    assert(dp.keySet == Set("C1"))
    assert(dp("C1").getAs[String]("dealership_code") == "FORD-MAIN")
    assert(dp("C1").getAs[String]("user_id") == "FORD-MAIN-C1")
    assert(dp("C1").getAs[String]("dealership") == "Downtown Ford")
    assert(dp("C1").getAs[Long]("transaction_count") == 3) // both D2 versions + D1
  }

  test("validatedSales: only marketable customers' deals, latest versions") {
    val out = Customer360.validatedSales(vs, profiles)
      .collect().map(r => r.getAs[String]("deal_number") -> r).toMap
    // C1 valid email → D1, D2; C2 email null → D3 dropped; D4/D5 invalid
    assert(out.keySet == Set("D1", "D2"))
    assert(out("D2").getAs[java.math.BigDecimal]("total_price").doubleValue() == 45000.0)
    assert(out("D1").getAs[String]("data_source") == "Vehicle Sale")
    assert(out("D2").getAs[Int]("customer_purchase_sequence") == 1)
    assert(out("D1").getAs[Int]("customer_purchase_sequence") == 2)
  }

  test("registerAll: SQL text over the registered stack matches the DataFrame path") {
    Customer360.registerAll(cm, vs, asOf)
    // every view is queryable by name, and row counts match the builders
    val expected = Map(
      "customer_profiles" -> profiles.count(),
      "customer_vehicle_history" -> history.count(),
      "customer_segments" -> Customer360.customerSegments(profiles, history, asOf).count(),
      "dealership_customer_profiles" -> Customer360.dealershipProfiles(profiles, vs).count(),
      "validated_vehicle_sales" -> Customer360.validatedSales(vs, profiles).count(),
      "data_privacy_status" -> Customer360.privacyStatus(profiles).count())
    expected.foreach { case (name, n) =>
      assert(spark.sql(s"SELECT count(*) FROM $name").head().getLong(0) == n, name)
    }
    // the SURVEY §7.1(4) contract verbatim: aggregate SQL over the
    // registered segments view == the DataFrame path
    val sqlOut = spark.sql(
        "SELECT customer_segment, count(*) AS n FROM customer_segments GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dfOut = Customer360.customerSegments(profiles, history, asOf)
      .groupBy("customer_segment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sqlOut.nonEmpty && sqlOut == dfOut)
    // views compose BY NAME like the reference warehouse: a SQL join of
    // two registered views resolves without touching the builders
    val joined = spark.sql(
      """SELECT s.custno FROM customer_segments s
         JOIN data_privacy_status p ON s.custno = p.custno
         WHERE p.can_email""").collect().map(_.getString(0)).toSet
    assert(joined == Set("C1", "C3")) // C2's blockemail drops it
  }

  test("marketableContactsOfLatest == the contact slice of customerProfilesOfLatest") {
    // the narrow projection duplicates the gate + cleansing expressions
    // (so the validated-sales dim state can stay 11 columns wide); any
    // drift between the two must fail here, not in a view differential
    val narrow = Customer360.marketableContactsOfLatest(cm)
      .collect().map(_.toSeq).toSet
    val slice = Customer360.customerProfilesOfLatest(cm, asOf)
      .select("user_id", "custno", "email", "phone", "email_opt_out")
      .collect().map(_.toSeq).toSet
    assert(narrow.nonEmpty && narrow == slice)
  }

  test("segmentProfilesOfLatest == the segment slice of customerProfilesOfLatest") {
    // same drift guard as the marketable-contact slice: the segments
    // aggregate view stores a 16-column dim state, and its narrow
    // projection must stay expression-identical to the full path
    val cols = Seq("user_id", "custno", "firstname", "lastname", "email",
      "phone", "state", "zip", "age", "generation", "customer_tenure_years",
      "last_service_date", "lifetime_service_value")
    // sourcerowid (a fold tiebreak column, not a projection input) is
    // absent from this fixture; the slice list minus it still feeds the
    // projection — completeness of the full list is what the
    // mv_segments_refresh differential proves
    val srcCols = Customer360.SegmentProfileSourceCols.filterNot(_ == "sourcerowid")
    val narrow = Customer360
      .segmentProfilesOfLatest(cm.select(srcCols.map(col): _*), asOf)
      .collect().map(_.toSeq).toSet
    val slice = Customer360.customerProfilesOfLatest(cm, asOf)
      .select(cols.head, cols.tail: _*)
      .collect().map(_.toSeq).toSet
    assert(narrow.nonEmpty && narrow == slice)
  }

  test("segmentHistoryOfLatest == the segment slice of vehicleHistoryOfLatest") {
    val cols = Seq("user_id", "deal_number", "total_price", "purchase_date",
      "make", "vehicle_condition", "transaction_type", "cash_down",
      "trade_vin", "trade_equity")
    // equality holds for ANY common input (same gate, same expressions);
    // dedup status is irrelevant to projection equivalence
    val narrow = Customer360
      .segmentHistoryOfLatest(vs.select(
        Customer360.SegmentHistorySourceCols.map(col): _*))
      .collect().map(_.toSeq).toSet
    val slice = Customer360.vehicleHistoryOfLatest(vs, asOf)
      .select(cols.head, cols.tail: _*)
      .collect().map(_.toSeq).toSet
    assert(narrow.nonEmpty && narrow == slice)
  }

  test("privacyStatus: marketing-status ladder + can_* flags") {
    val ps = Customer360.privacyStatus(profiles)
      .collect().map(r => r.getAs[String]("custno") -> r).toMap
    assert(ps("C1").getAs[String]("marketing_status") == "Full Marketing Consent")
    assert(ps("C1").getAs[Boolean]("can_email"))
    assert(ps("C2").getAs[String]("marketing_status") == "Phone/Mail Only") // blockemail
    assert(!ps("C2").getAs[Boolean]("can_email"))
    assert(ps("C3").getAs[String]("marketing_status") == "Opted Out - No Marketing")
    assert(!ps("C3").getAs[Boolean]("can_market"))
  }
}
