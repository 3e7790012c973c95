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
  */
object Cleansing {

  /** Valid-email cleanse (reference `customer_360_views.sql:93-101`):
    * lowercase+trim, then NULL unless it matches a sane address shape
    * and is not a known dummy/placeholder. `~*` (POSIX case-insensitive
    * regex) becomes a `(?i)` Java-regex prefix.
    */
  def cleanEmail(email: Column): Column = {
    val e = lower(trim(email))
    when(
      e.isNotNull && (e =!= "") &&
        e.rlike("^[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}$") &&
        !e.rlike("(?i)(noemail|nomail|none@|test@|example\\.com|dealer\\.com)"),
      e
    ).otherwise(lit(null).cast("string"))
  }

  /** Digits-only phone, NULL unless >= 10 digits
    * (reference `customer_360_views.sql:103-109`). Keeps the last 10
    * digits so "1-800-..." and bare numbers normalize identically.
    */
  def normalizePhone(phone: Column): Column = {
    val digits = regexp_replace(coalesce(phone, lit("")), "[^0-9]", "")
    when(length(digits) >= 10, substring(digits, -10, 10))
      .otherwise(lit(null).cast("string"))
  }

  /** M/F/NULL normalization (reference `customer_360_views.sql:119-123`). */
  def normalizeGender(g: Column): Column = {
    val u = upper(trim(g))
    when(u.isin("M", "MALE"), "M")
      .when(u.isin("F", "FEMALE"), "F")
      .otherwise(lit(null).cast("string"))
  }

  /** Calendar-year age (reference uses EXTRACT(YEAR) diff, not floored
    * age — `customer_360_views.sql:129`). */
  def ageYears(birthDate: Column, asOf: Column): Column =
    year(asOf) - year(birthDate)

  /** Recency bucket ladder (reference `customer_360_views.sql:161-167`):
    * days-since → label. Bucket edges inclusive on the lower side.
    */
  def recencyBucket(lastDate: Column, asOf: Column): Column = {
    val d = datediff(asOf, lastDate)
    when(d <= 30, "active_30d")
      .when(d <= 90, "active_90d")
      .when(d <= 365, "active_1y")
      .when(d <= 730, "active_2y")
      .otherwise("dormant")
  }

  /** Null dates sort to the sentinel 999999 days (reference
    * `customer_360_views.sql:462-470`). */
  def daysSinceOrSentinel(dateCol: Column, asOf: Column): Column =
    coalesce(datediff(asOf, dateCol), lit(999999))

  /** Value-segment ladder (reference `customer_360_views.sql:473-482`,
    * boundaries 100000/50000/25000). */
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

  /** Contactability predicate (reference `customer_360_views.sql:181-186`):
    * valid email OR >=10-digit phone. */
  def isContactable(email: Column, phone: Column): Column =
    cleanEmail(email).isNotNull || normalizePhone(phone).isNotNull

  /** Soft-delete filter predicate (reference `customer_360_views.sql:77-80`):
    * row survives when every flag is NULL or false. */
  def notSoftDeleted(flags: Column*): Column =
    flags.map(f => coalesce(f, lit(false)) === lit(false)).reduce(_ && _)
}
