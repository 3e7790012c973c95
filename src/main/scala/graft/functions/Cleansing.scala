package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cleansing / derivation column-expression library.
  *
  * Re-expresses the reference's SQL cleansing idioms
  * (`sql/customer_360_views.sql:83-172` in
  * bill-hoerr/automotive-data-pipeline-demo) as pure `Column`
  * functions — no UDFs, so everything stays inside Catalyst
  * whole-stage codegen and is pushdown/prune-friendly at 100 TB.
  *
  * Semantics match the reference exactly, including its quirks (see
  * each function's note); `~*` (POSIX case-insensitive) becomes a
  * `(?i)` Java-regex prefix — the patterns used are dialect-neutral.
  */
object Cleansing {

  /** Valid-email cleanse (reference `customer_360_views.sql:93-101`):
    * reject dummy prefixes (`no@`, `noemail@`, …) and test domains,
    * require an `@` + dotted domain, then LOWER(TRIM(…)).
    *
    * Faithful quirk: the regexes run against the RAW value, so
    * `"  NoEmail@x.com"` (leading spaces) dodges the `^(…)@` prefix
    * check and survives — exactly as in the reference.
    */
  def cleanEmail(email: Column): Column =
    when(
      email.isNotNull && (email =!= "") &&
        !email.rlike("(?i)^(no|nothanks|none|noemail|no.email|na)@") &&
        !email.rlike("(?i)(@example.com|@test.com|@invalid.com)") &&
        email.rlike("(?i)@.+\\..+"),
      lower(trim(email))
    ).otherwise(lit(null).cast("string"))

  /** Digits-only phone, NULL unless >= 10 digits; keeps ALL digits
    * (reference `customer_360_views.sql:103-109`). */
  def normalizePhone(phone: Column): Column = {
    val digits = regexp_replace(phone, "[^0-9]", "")
    when(phone.isNotNull && (phone =!= "") && length(digits) >= 10, digits)
      .otherwise(lit(null).cast("string"))
  }

  /** Male/Female/Unknown normalization via the reference's exact IN
    * lists (`customer_360_views.sql:119-123`) — note `F` but not `FeMale`
    * etc.; unlisted spellings fall to Unknown. */
  def normalizeGender(g: Column): Column =
    when(g.isin("M", "Male", "MALE", "m"), "Male")
      .when(g.isin("F", "Female", "FEMALE", "f"), "Female")
      .otherwise("Unknown")

  /** Calendar-year age (reference uses EXTRACT(YEAR) diff, not floored
    * age — `customer_360_views.sql:127-131`). NULL birthdate → NULL. */
  def ageYears(birthDate: Column, asOf: Column): Column =
    when(birthDate.isNotNull, year(asOf) - year(birthDate))
      .otherwise(lit(null).cast("int"))

  /** Generation bucket ladder (reference `customer_360_views.sql:133-143`). */
  def generation(birthDate: Column, asOf: Column): Column = {
    val age = year(asOf) - year(birthDate)
    when(birthDate.isNull, "Unknown")
      .when(age < 25, "Gen Z (Under 25)")
      .when(age < 40, "Millennial (25-39)")
      .when(age < 55, "Gen X (40-54)")
      .when(age < 75, "Boomer (55-74)")
      .otherwise("Silent (75+)")
  }

  /** Service-recency bucket (reference `customer_360_views.sql:161-167`). */
  def serviceRecency(lastServiceDate: Column, asOf: Column): Column =
    when(lastServiceDate.isNull, "Never Serviced")
      .when(lastServiceDate >= date_sub(asOf, 90), "Recent (0-90 days)")
      .when(lastServiceDate >= date_sub(asOf, 180), "Moderate (91-180 days)")
      .when(lastServiceDate >= date_sub(asOf, 365), "Distant (181-365 days)")
      .otherwise("Inactive (365+ days)")

  /** Purchase-recency bucket (reference `customer_360_views.sql:358-364`).
    * `contractDate` is a timestamp; the date bound is promoted to
    * midnight, matching the warehouse coercion. */
  def purchaseRecency(contractDate: Column, asOf: Column): Column =
    when(contractDate >= date_sub(asOf, 30), "Recent (0-30 days)")
      .when(contractDate >= date_sub(asOf, 90), "Moderate (31-90 days)")
      .when(contractDate >= date_sub(asOf, 365), "Past Year (91-365 days)")
      .when(contractDate >= date_sub(asOf, 1095), "Historical (1-3 years)")
      .otherwise("Legacy (3+ years)")

  /** Null dates sort to the sentinel 999999 days (reference
    * `customer_360_views.sql:462-470`). */
  def daysSinceOrSentinel(dateCol: Column, asOf: Column): Column =
    coalesce(datediff(asOf, dateCol), lit(999999))

  /** Value-segment ladder (reference `customer_360_views.sql:473-482`,
    * boundaries 100000/50000/25000 — plain-value variant used by the
    * flagship entry; the full 8-way customer_segment ladder lives in
    * views.Customer360). */
  def valueSegment(totalSpend: Column): Column =
    when(totalSpend >= 100000, "platinum")
      .when(totalSpend >= 50000, "gold")
      .when(totalSpend >= 25000, "silver")
      .otherwise("bronze")

  /** Prefixed surrogate user id (reference `customer_360_views.sql:85`:
    * `CONCAT('AUTO-', custno)`). */
  def userId(prefix: String, key: Column): Column =
    concat(lit(prefix), key.cast("string"))

  /** Deterministic idempotency key (reference
    * `lambda_redshift_to_segment.py:316-325`: md5 of event name + keys). */
  def messageId(parts: Column*): Column =
    md5(concat_ws("_", parts: _*))

  /** Contactability predicate on RAW contact fields (reference
    * `customer_360_views.sql:181-186`): loosely-valid email OR
    * >=10-digit phone. Note this is looser than [[cleanEmail]] — a
    * test-domain email still counts as contactable, faithfully. */
  def isContactable(email: Column, phone: Column): Column =
    (email.isNotNull && (email =!= "") && email.rlike("(?i)@.+\\..+")) ||
      (phone.isNotNull && (phone =!= "") &&
        length(regexp_replace(phone, "[^0-9]", "")) >= 10)

  /** Soft-delete filter predicate (reference `customer_360_views.sql:77-80`):
    * row survives when every flag is NULL or false. */
  def notSoftDeleted(flags: Column*): Column =
    flags.map(f => f.isNull || f === lit(false)).reduce(_ && _)

  /** PII regex needles `(category, pattern, mask-tag)` — ONE list for
    * the batch redaction (`corpus_pii_redact`/`corpus_pii_report`) and
    * the streaming ingest scrub ([[graft.streaming.CorpusIngest]]), so
    * what the nightly pass masks and what the stream refuses to
    * persist can never drift. Plain-ASCII patterns meaning the same
    * thing under Java regex and RE2; categories are mutually
    * non-overlapping, so mask order can't change counts. */
  val PiiNeedles: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\+1 \\(\\d{3}\\) \\d{3}-\\d{4}", "<PHONE>"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IPV4>"))

  /** Mask every PII span with its category tag — compiled regex chain,
    * rides any scan, idempotent (tags match no needle). */
  def piiMask(text: Column): Column =
    PiiNeedles.foldLeft(text) { case (c, (_, re, tag)) => regexp_replace(c, re, tag) }
}
