package graft.identity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Identity resolution — visitor sessions ↔ CRM leads (reference
  * `identity-resolution/api-server.js:249-260`,
  * `database-schema.sql:145-277,300-380`, `README.md:83-106`),
  * re-expressed as batch joins:
  *
  *   1. exact match on digital-retailing session id (J6);
  *   2. fallback contact match — same normalized email OR phone with the
  *     lead submitted within `windowHours` after the session was last
  *     seen (J7/ST4);
  *   3. trigger-maintained denormalized match state (ST8) recomputed as
  *     joins — no triggers in a distributed engine;
  *   4. the three analytics views (A5/A6/A7) and the 2-year TTL sweep
  *     (ST7).
  *
  * Confidence defaults (1.00 session, 0.85 contact) are ours: the
  * reference's values live in a dbService module truncated out of the
  * snapshot (`api-server.js:287` EOF), inferred from README.md:100-106.
  *
  * Scale: both match paths are equi-joins (session id / email / phone)
  * with the time window as a post-join predicate — hash-partitioned,
  * skew-safe, no theta join; best-match-per-lead is one window over the
  * candidate set.
  */
object IdentityResolution {

  val SessionConfidence = 1.00
  val ContactConfidence = 0.85

  // empty string → null: '' is a MISSING email, not a join key — without
  // this, every blank-email lead would equi-join every blank-email
  // session (mass false matches + a quadratic hot key at scale)
  private def normEmail(c: Column): Column = nullif(lower(trim(c)), lit(""))
  private def normPhone(c: Column): Column = {
    val d = regexp_replace(c, "[^0-9]", "")
    when(length(d) >= 10, substring(d, -10, 10))
  }

  /** Match leads to visitor sessions. `sessions` needs (id,
    * digital_retailing_session_id, email, phone, last_seen); `leads`
    * needs (id, crm_session_id, email, phone, created_at). Returns one
    * edge row per matched lead: (crm_lead_id, visitor_session_id,
    * match_method, match_confidence, matched_at). */
  def matchLeads(
      sessions: DataFrame,
      leads: DataFrame,
      windowHours: Int = 24): DataFrame = {
    val s = sessions.select(
      col("id").as("visitor_session_id"),
      col("digital_retailing_session_id").as("s_session_id"),
      normEmail(col("email")).as("s_email"),
      normPhone(col("phone")).as("s_phone"),
      col("last_seen").as("s_last_seen"))
    val l = leads.select(
      col("id").as("crm_lead_id"),
      col("crm_session_id").as("l_session_id"),
      normEmail(col("email")).as("l_email"),
      normPhone(col("phone")).as("l_phone"),
      col("created_at").as("l_created_at"))

    // 1. exact session-id match (api-server.js:249-251)
    val bySession = l.filter(col("l_session_id").isNotNull)
      .join(s, col("l_session_id") === col("s_session_id"))
      .select(col("crm_lead_id"), col("visitor_session_id"),
        lit("session_id").as("match_method"),
        lit(SessionConfidence).cast("decimal(3,2)").as("match_confidence"),
        col("l_created_at").as("matched_at"))

    // 2. contact fallback within the time window (api-server.js:254-260,
    //    README.md:83-88): email OR phone equality, lead within
    //    windowHours after the session's last activity.
    val windowSecs = windowHours * 3600L
    def contact(onKey: (Column, Column)) = l
      .join(s, onKey._1.isNotNull && onKey._1 === onKey._2 &&
        col("l_created_at") >= col("s_last_seen") &&
        col("l_created_at") <= col("s_last_seen") + expr(s"INTERVAL $windowSecs SECONDS"))
    val byContact = contact((col("l_email"), col("s_email")))
      .unionByName(contact((col("l_phone"), col("s_phone"))))
      .select(col("crm_lead_id"), col("visitor_session_id"),
        col("l_created_at"), col("s_last_seen")).distinct()
      // best candidate per lead: most recent session activity, then id
      .withColumn("rn", row_number().over(Window.partitionBy("crm_lead_id")
        .orderBy(col("s_last_seen").desc, col("visitor_session_id").asc)))
      .filter(col("rn") === 1)
      .select(col("crm_lead_id"), col("visitor_session_id"),
        lit("email_phone").as("match_method"),
        lit(ContactConfidence).cast("decimal(3,2)").as("match_confidence"),
        col("l_created_at").as("matched_at"))

    // session matches take priority; contact fallback only for the rest
    val sessionLeadIds = bySession.select("crm_lead_id").distinct()
    bySession.unionByName(
      byContact.join(sessionLeadIds, Seq("crm_lead_id"), "left_anti"))
  }

  /** ST8: recompute the trigger-maintained denormalized state
    * (`database-schema.sql:236-277`) — returns (sessions', leads') with
    * is_matched / matched ids / matched_at filled from the edge table. */
  def recomputeMatchState(
      sessions: DataFrame,
      leads: DataFrame,
      matches: DataFrame): (DataFrame, DataFrame) = {
    val bySession = matches
      .withColumn("rn", row_number().over(
        Window.partitionBy("visitor_session_id")
          .orderBy(col("matched_at").asc, col("crm_lead_id").asc)))
      .filter(col("rn") === 1)
      .select(col("visitor_session_id"), col("crm_lead_id").as("m_lead_id"),
        col("matched_at").as("m_at"))
    val byLead = matches
      .withColumn("rn", row_number().over(
        Window.partitionBy("crm_lead_id")
          .orderBy(col("matched_at").asc, col("visitor_session_id").asc)))
      .filter(col("rn") === 1)
      .select(col("crm_lead_id"), col("visitor_session_id").as("m_session_id"),
        col("matched_at").as("m_at"), col("match_method").as("m_method"))
    val s2 = sessions.join(bySession, sessions("id") === bySession("visitor_session_id"), "left")
      .withColumn("is_matched", col("m_lead_id").isNotNull)
      .withColumn("matched_lead_id", col("m_lead_id"))
      .withColumn("matched_at", col("m_at"))
      .drop("visitor_session_id", "m_lead_id", "m_at")
    val l2 = leads.join(byLead, leads("id") === byLead("crm_lead_id"), "left")
      .withColumn("is_matched", col("m_session_id").isNotNull)
      .withColumn("matched_visitor_id", col("m_session_id"))
      .withColumn("matched_at", col("m_at"))
      .withColumn("match_method", col("m_method"))
      .drop("crm_lead_id", "m_session_id", "m_at", "m_method")
    (s2, l2)
  }

  /** A5: v_matching_performance (`database-schema.sql:304-317`) — daily
    * rollup of the last 30 days of matches. */
  def matchingPerformance(matches: DataFrame, asOf: Column): DataFrame =
    matches
      .filter(col("created_at") >= date_sub(asOf, 30))
      .groupBy(col("created_at").cast("date").as("match_date"))
      .agg(
        count(lit(1)).as("total_matches"),
        count_if(col("match_method") === "session_id").as("session_matches"),
        count_if(col("match_method") === "email_phone").as("contact_matches"),
        count_if(col("match_method") === "manual").as("manual_matches"),
        (sum(col("match_confidence")).cast("double") /
          count(col("match_confidence"))).as("avg_confidence"),
        count_if(col("is_converted") === true).as("conversions"),
        sum(when(col("is_converted") === true, col("conversion_value")))
          .as("total_revenue"))
      .orderBy(col("match_date").desc)

  /** A6: v_attribution_analysis (`database-schema.sql:320-342`) —
    * match-rate and revenue per UTM group, HAVING >= 10 visitors. */
  def attributionAnalysis(sessions: DataFrame, matches: DataFrame, asOf: Column): DataFrame =
    sessions.alias("vs")
      .filter(col("created_at") >= date_sub(asOf, 30))
      .join(matches.alias("im"), col("vs.id") === col("im.visitor_session_id"), "left")
      .groupBy(col("vs.utm_source").as("utm_source"),
        col("vs.utm_medium").as("utm_medium"),
        col("vs.utm_campaign").as("utm_campaign"))
      .agg(
        countDistinct(col("vs.id")).as("total_visitors"),
        countDistinct(col("im.id")).as("matched_visitors"),
        round(countDistinct(col("im.id")).cast("double") * 100 /
          nullif(countDistinct(col("vs.id")), lit(0)), 2).as("match_rate_percent"),
        count_if(col("im.is_converted") === true).as("conversions"),
        sum(col("im.conversion_value")).as("total_revenue"),
        round(sum(col("im.conversion_value")).cast("double") /
          nullif(countDistinct(col("vs.id")), lit(0)), 2).as("revenue_per_visitor"))
      .filter(col("total_visitors") >= 10)
      .orderBy(col("total_revenue").desc_nulls_last)

  /** A7: v_unmatched_leads (`database-schema.sql:345-357`) — 7-day
    * unmatched rollup by source/type/day. */
  def unmatchedLeads(leads: DataFrame, asOf: Column): DataFrame =
    leads
      .filter(col("is_matched") === false &&
        col("created_at") >= date_sub(asOf, 7))
      .groupBy(col("lead_source"), col("lead_type"),
        col("created_at").cast("date").as("lead_date"))
      .agg(
        count(lit(1)).as("unmatched_count"),
        round(sum(col("estimated_deal_value")).cast("double") /
          count(col("estimated_deal_value")), 2).as("avg_deal_value"),
        sum(col("estimated_deal_value")).as("total_potential_value"))
      .orderBy(col("total_potential_value").desc_nulls_last)

  /** ST7: GDPR retention — drop unmatched sessions older than
    * `retentionDays` (`database-schema.sql:364-380`); batch
    * filter-and-rewrite instead of DELETE. */
  def expireUnmatchedSessions(sessions: DataFrame, asOf: Column,
      retentionDays: Int = 730): DataFrame =
    sessions.filter(
      col("created_at") >= date_sub(asOf, retentionDays) ||
        col("is_matched") === true)
}
