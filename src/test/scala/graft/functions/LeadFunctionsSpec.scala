package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** U4 ADF parsing + U5 fuzzy scoring edge cases (field surface
  * reconstructed from reference README.md:69-79; scorer from
  * api-server.js:254-260). */
class LeadFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val adf =
    """<?ADF VERSION "1.0"?>
      |<adf><prospect>
      |  <id source="lead">L-42</id>
      |  <requestdate>2024-03-05T10:30:00</requestdate>
      |  <customer><contact>
      |    <name part="first"> Jane </name>
      |    <name part="last">Doe</name>
      |    <email>JANE@example.com</email>
      |    <phone>(555) 010-1234</phone>
      |  </contact></customer>
      |  <vehicle><year>2021</year><make>Toyota</make>
      |    <model>Camry</model><vin>4T1B11HK5MU123456</vin></vehicle>
      |  <id source="sd_session">sd_abc123</id>
      |</prospect></adf>""".stripMargin

  private def parse(xml: String) = {
    val spark0 = spark
    import spark0.implicits._
    Seq(xml).toDF("xml").select(LeadFunctions.adfLead(col("xml")).as("l"))
      .select("l.*").head()
  }

  test("adfLead extracts the full field surface") {
    val r = parse(adf)
    assert(r.getAs[String]("lead_id") == "L-42")
    assert(r.getAs[String]("request_date") == "2024-03-05T10:30:00")
    assert(r.getAs[String]("first_name") == "Jane") // whitespace trimmed
    assert(r.getAs[String]("last_name") == "Doe")
    assert(r.getAs[String]("email") == "JANE@example.com")
    assert(r.getAs[String]("phone") == "(555) 010-1234")
    assert(r.getAs[Int]("vehicle_year") == 2021)
    assert(r.getAs[String]("vehicle_make") == "Toyota")
    assert(r.getAs[String]("vehicle_model") == "Camry")
    assert(r.getAs[String]("vehicle_vin") == "4T1B11HK5MU123456")
    assert(r.getAs[String]("sd_session_id") == "sd_abc123")
  }

  test("adfLead: missing tags → null fields; plain <id> fallback") {
    val r = parse("<adf><prospect><id>99</id><customer><contact>" +
      "<email>a@b.c</email></contact></customer></prospect></adf>")
    assert(r.getAs[String]("lead_id") == "99") // falls back to unsourced <id>
    assert(r.getAs[String]("email") == "a@b.c")
    assert(r.getAs[String]("phone") == null)
    assert(r.getAs[String]("sd_session_id") == null)
    assert(r.get(r.fieldIndex("vehicle_year")) == null) // non-numeric absent
  }

  test("adfLead: non-numeric year → null (try_cast), case-insensitive tags") {
    val r = parse("<ADF><PROSPECT><VEHICLE><YEAR>unknown</YEAR>" +
      "<MAKE>Honda</MAKE></VEHICLE></PROSPECT></ADF>")
    assert(r.get(r.fieldIndex("vehicle_year")) == null)
    assert(r.getAs[String]("vehicle_make") == "Honda")
  }

  private def score(le: String, lp: String, ln: String,
      ve: String, vp: String, vn: String): Double = {
    val spark0 = spark
    import spark0.implicits._
    Seq((le, lp, ln, ve, vp, vn)).toDF("le", "lp", "ln", "ve", "vp", "vn")
      .select(LeadFunctions.matchScore(col("le"), col("lp"), col("ln"),
        col("ve"), col("vp"), col("vn")).as("s"))
      .head().getDouble(0)
  }

  test("matchScore: exact contact + name = 1.0; email-only = 0.4+name") {
    assert(score("a@b.c", "5550101234", "Jane Doe",
      "A@B.C ", "+1 (555) 010-1234", "jane doe") == 1.0)
    // email matches (0.4), phone differs, identical name (0.3) → 0.7
    assert(score("a@b.c", "5550101234", "Jane",
      "a@b.c", "5559999999", "Jane") == 0.7)
  }

  test("matchScore: levenshtein name similarity and short-phone guard") {
    // names "abcd" vs "abcf": lev 1, maxlen 4 → 0.3*(1-0.25)=0.225
    assert(score("x@y.z", "555", "abcd", "q@r.s", "555", "abcf") == 0.225)
    // 9-digit phones never match (normalizePhone-style >=10 guard)
    assert(score("x@y.z", "123456789", "n", "q@r.s", "123456789", "m") == 0.0)
  }
}
