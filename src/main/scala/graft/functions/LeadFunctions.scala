package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lead-side custom functions: the ADF/XML lead parser (U4) and the
  * fuzzy contact-match scorer (U5).
  *
  * The reference parses ADF (Auto-lead Data Format, the public
  * automotive XML standard) in `utils/adf-parser.js` — a module
  * truncated out of the snapshot (`identity-resolution/api-server.js:28,228`);
  * the field surface is reconstructed from `README.md:69-79`. The
  * extraction is pure regexp `Column`s — no UDF, no XML library — which
  * is both codegen-friendly and robust to the pseudo-XML that email
  * gateways emit.
  */
object LeadFunctions {

  private def nonEmpty(c: Column): Column = when(c =!= "", c)

  private def tag(xml: Column, name: String): Column =
    nonEmpty(regexp_extract(xml, s"(?is)<$name[^>]*>\\s*([^<]*?)\\s*</$name>", 1))

  private def namePart(xml: Column, part: String): Column =
    nonEmpty(regexp_extract(xml,
      s"""(?is)<name[^>]*part="$part"[^>]*>\\s*([^<]*?)\\s*</name>""", 1))

  private def sourcedId(xml: Column, source: String): Column =
    nonEmpty(regexp_extract(xml,
      s"""(?is)<id[^>]*source="$source"[^>]*>\\s*([^<]*?)\\s*</id>""", 1))

  /** U4: ADF/XML → lead struct (README.md:69-79 field surface):
    * id, request date, customer name/email/phone, vehicle interest,
    * and the CRM session bridge (`<id source="sd_session">`). Returns a
    * struct column; null-field when a tag is absent. */
  /** Attribute-less `<id>` only — the fallback must NOT swallow
    * `<id source="sd_session">` (that is the session bridge, not the
    * lead id). */
  private def plainId(xml: Column): Column =
    nonEmpty(regexp_extract(xml, """(?is)<id\s*>\s*([^<]*?)\s*</id>""", 1))

  def adfLead(xml: Column): Column = struct(
    coalesce(sourcedId(xml, "lead"), plainId(xml)).as("lead_id"),
    tag(xml, "requestdate").as("request_date"),
    namePart(xml, "first").as("first_name"),
    namePart(xml, "last").as("last_name"),
    tag(xml, "email").as("email"),
    tag(xml, "phone").as("phone"),
    tag(xml, "year").try_cast("int").as("vehicle_year"),
    tag(xml, "make").as("vehicle_make"),
    tag(xml, "model").as("vehicle_model"),
    tag(xml, "vin").as("vehicle_vin"),
    sourcedId(xml, "sd_session").as("sd_session_id"))

  /** U5: fuzzy contact-match score in [0,1]
    * (`api-server.js:254-260`, "fuzzy matching on name/phone/email"
    * `README.md:253`): exact normalized email (0.4) + exact normalized
    * phone (0.3) + Levenshtein name similarity (0.3). */
  def matchScore(
      leadEmail: Column, leadPhone: Column, leadName: Column,
      visitorEmail: Column, visitorPhone: Column, visitorName: Column): Column = {
    // '' → null so two missing emails never score as an exact match
    def ne(c: Column) = nullif(lower(trim(c)), lit(""))
    def np(c: Column) = {
      val d = regexp_replace(c, "[^0-9]", "")
      when(length(d) >= 10, substring(d, -10, 10))
    }
    val emailPart = when(ne(leadEmail).isNotNull &&
      ne(leadEmail) === ne(visitorEmail), 0.4).otherwise(0.0)
    val phonePart = when(np(leadPhone).isNotNull &&
      np(leadPhone) === np(visitorPhone), 0.3).otherwise(0.0)
    val a = ne(leadName)
    val b = ne(visitorName)
    val nameSim = when(a.isNotNull && b.isNotNull && greatest(length(a), length(b)) > 0,
      lit(1.0) - levenshtein(a, b).cast("double") /
        greatest(length(a), length(b)).cast("double"))
      .otherwise(0.0)
    round(emailPart + phonePart + lit(0.3) * nameSim, 4)
  }
}
