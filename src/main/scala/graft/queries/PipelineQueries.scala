package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.activation.Activation
import graft.identity.IdentityResolution
import graft.views.Customer360

/** Correctness entries for the activation feed (the reference Lambda)
  * and identity resolution (the reference Postgres/Express side),
  * exercised end-to-end through the real module code over deterministic
  * testdata-derived inputs — same pattern as [[DomainQueries]]. */
object PipelineQueries {

  import DomainQueries.{pinTypes => pin}

  // ---------------------------------------------------------- activation

  /** The Lambda's SELECT list (`lambda_redshift_to_segment.py:166-203`):
    * history view joined to profile contact columns. */
  private def activationFeed(s: SparkSession, dir: String): DataFrame = {
    // the as-of date is pinned inside DomainQueries' shared frames
    val vh = DomainQueries.sharedVehicleHistory(s, dir)
    val cp = DomainQueries.sharedProfiles(s, dir)
      .select(col("user_id"), col("email"), col("phone"))
    vh.join(cp, Seq("user_id"))
      .select("deal_number", "user_id", "vin", "stock_number", "email", "phone",
        "make", "model", "year", "body_style", "color", "vehicle_condition",
        "odometer_reading", "purchase_date", "transaction_type", "deal_category",
        "dealership_location", "vehicle_price", "total_price",
        "total_gross_profit", "cash_down", "lender", "amount_financed",
        "interest_rate", "finance_term_months", "monthly_payment",
        "trade_equity", "trade_vehicle_description", "sales_manager",
        "salesperson", "purchase_sequence")
  }

  private def activationBatch(s: SparkSession, dir: String): DataFrame = {
    val feed = activationFeed(s, dir)
    // processed state: every 7th deal already delivered in a prior run
    val processed = feed
      .filter(substring(col("deal_number"), 2, 10).cast("long") % 7 === 0)
      .select("deal_number")
    Activation.cleanAndValidate(Activation.nextBatch(feed, processed,
      lit("1996-01-01").cast("timestamp"), lit("1998-12-31").cast("timestamp"), 1000))
  }

  /** Shared oracle CTEs: feed + batch replicating nextBatch +
    * cleanAndValidate (string-trim-or-null, float-or-null coercions). */
  private val ACT_SQL = """
      , feed AS (
        SELECT vh.deal_number, vh.user_id, vh.vin, vh.stock_number,
               cp.email, cp.phone, vh.make, vh.model, vh."year", vh.body_style,
               vh.color, vh.vehicle_condition, vh.odometer_reading,
               vh.purchase_date, vh.transaction_type, vh.deal_category,
               vh.dealership_location, vh.vehicle_price, vh.total_price,
               vh.total_gross_profit, vh.cash_down, vh.lender,
               vh.amount_financed, vh.interest_rate, vh.finance_term_months,
               vh.monthly_payment, vh.trade_equity, vh.trade_vehicle_description,
               vh.sales_manager, vh.salesperson, vh.purchase_sequence
        FROM vh JOIN cp ON vh.user_id = cp.user_id),
      batch AS (
        SELECT * FROM feed
        WHERE purchase_date BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
          AND TRY_CAST(substr(deal_number, 2, 10) AS BIGINT) % 7 <> 0
        ORDER BY purchase_date DESC, deal_number DESC LIMIT 1000),
      cleaned AS (
        SELECT CAST(deal_number AS VARCHAR) AS deal_number,
               CAST(user_id AS VARCHAR) AS user_id, CAST(vin AS VARCHAR) AS vin,
               nullif(trim(CAST(stock_number AS VARCHAR)), '') AS stock_number,
               nullif(trim(CAST(email AS VARCHAR)), '') AS email,
               nullif(trim(CAST(phone AS VARCHAR)), '') AS phone,
               nullif(trim(CAST(make AS VARCHAR)), '') AS make,
               nullif(trim(CAST(model AS VARCHAR)), '') AS model,
               nullif(trim(CAST(body_style AS VARCHAR)), '') AS body_style,
               nullif(trim(CAST(color AS VARCHAR)), '') AS color,
               nullif(trim(CAST(vehicle_condition AS VARCHAR)), '') AS vehicle_condition,
               nullif(trim(CAST(transaction_type AS VARCHAR)), '') AS transaction_type,
               nullif(trim(CAST(deal_category AS VARCHAR)), '') AS deal_category,
               nullif(trim(CAST(dealership_location AS VARCHAR)), '') AS dealership_location,
               nullif(trim(CAST(trade_vehicle_description AS VARCHAR)), '') AS trade_vehicle_description,
               nullif(trim(CAST(sales_manager AS VARCHAR)), '') AS sales_manager,
               nullif(trim(CAST(salesperson AS VARCHAR)), '') AS salesperson,
               nullif(trim(CAST(lender AS VARCHAR)), '') AS lender,
               TRY_CAST(CAST("year" AS VARCHAR) AS DOUBLE) AS "year",
               TRY_CAST(CAST(odometer_reading AS VARCHAR) AS DOUBLE) AS odometer_reading,
               TRY_CAST(CAST(vehicle_price AS VARCHAR) AS DOUBLE) AS vehicle_price,
               TRY_CAST(CAST(total_price AS VARCHAR) AS DOUBLE) AS total_price,
               TRY_CAST(CAST(total_gross_profit AS VARCHAR) AS DOUBLE) AS total_gross_profit,
               TRY_CAST(CAST(cash_down AS VARCHAR) AS DOUBLE) AS cash_down,
               TRY_CAST(CAST(amount_financed AS VARCHAR) AS DOUBLE) AS amount_financed,
               TRY_CAST(CAST(interest_rate AS VARCHAR) AS DOUBLE) AS interest_rate,
               TRY_CAST(CAST(finance_term_months AS VARCHAR) AS DOUBLE) AS finance_term_months,
               TRY_CAST(CAST(monthly_payment AS VARCHAR) AS DOUBLE) AS monthly_payment,
               TRY_CAST(CAST(trade_equity AS VARCHAR) AS DOUBLE) AS trade_equity,
               TRY_CAST(CAST(purchase_sequence AS VARCHAR) AS DOUBLE) AS purchase_sequence,
               purchase_date
        FROM batch
        WHERE deal_number IS NOT NULL AND user_id IS NOT NULL AND vin IS NOT NULL)"""

  private val actBatch = Q(
    "act_incremental_batch",
    (s, dir) => activationBatch(s, dir).orderBy("deal_number"),
    Some(DomainQueries.withPrelude(ACT_SQL +
      " SELECT * FROM cleaned ORDER BY deal_number")),
  )

  private val actEvents = Q(
    "act_segment_events",
    (s, dir) => Activation.toSegmentTrackEvents(activationBatch(s, dir))
      .orderBy("deal_number"),
    Some(DomainQueries.withPrelude(ACT_SQL + """
      SELECT deal_number,
             substr('vp_' || md5('vehicle_purchase_' || deal_number || '_' || vin), 1, 50) AS message_id,
             to_json(struct_pack(
               "type" := 'track',
               "messageId" := substr('vp_' || md5('vehicle_purchase_' || deal_number || '_' || vin), 1, 50),
               "userId" := user_id,
               "event" := 'Vehicle Purchased',
               "timestamp" := strftime(purchase_date, '%Y-%m-%dT12:00:00Z'),
               "properties" := struct_pack(
                 deal_number := deal_number, vin := vin, stock_number := stock_number,
                 vehicle_make := make, vehicle_model := model, vehicle_year := "year",
                 body_style := body_style, vehicle_color := color,
                 vehicle_condition := vehicle_condition,
                 odometer_reading := odometer_reading,
                 transaction_type := transaction_type, deal_category := deal_category,
                 dealership := dealership_location,
                 vehicle_price := vehicle_price, total_price := total_price,
                 revenue := total_price, gross_profit := total_gross_profit,
                 down_payment := cash_down, amount_financed := amount_financed,
                 interest_rate := interest_rate, finance_term := finance_term_months,
                 monthly_payment := monthly_payment, lender := lender,
                 had_trade := coalesce(trade_equity <> 0, false),
                 trade_equity := trade_equity,
                 trade_description := trade_vehicle_description,
                 sales_manager := sales_manager, salesperson := salesperson,
                 customer_purchase_number := purchase_sequence,
                 customer_email := email, customer_phone := phone),
               "context" := struct_pack(
                 library := struct_pack(name := 'graft-activation', version := '2.0.0'),
                 source := 'data_warehouse'))) AS event_json
      FROM cleaned ORDER BY deal_number""")),
  )

  // ------------------------------------------------------------ identity

  /** Sessions from 'view' events, leads from 'signup' events; matches
    * arise when a signup's dr-session id / contact + 24h window lines
    * up with a view session — all deterministic functions of the data. */
  private def sessions(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === "view").select(
      col("event_id").as("id"),
      when(col("event_id") % 3 =!= 0,
        concat(lit("dr_"), col("event_id").cast("string")))
        .otherwise(lit(null).cast("string")).as("digital_retailing_session_id"),
      when(col("user_id") % 4 =!= 0,
        concat(lit("U"), col("user_id").cast("string"), lit("@x.com")))
        .otherwise(lit(null).cast("string")).as("email"),
      when(col("user_id") % 3 =!= 0,
        concat(lit("55501"), lpad(col("user_id").cast("string"), 5, "0")))
        .otherwise(lit(null).cast("string")).as("phone"),
      col("ts").as("last_seen"),
      col("ts").as("created_at"),
      when(col("user_id") % 3 === 0, "google")
        .when(col("user_id") % 3 === 1, "facebook")
        .otherwise(lit(null).cast("string")).as("utm_source"),
      when(col("user_id") % 3 === 0, "cpc")
        .when(col("user_id") % 3 === 1, "social")
        .otherwise(lit(null).cast("string")).as("utm_medium"),
      concat(lit("camp_"), (col("user_id") % 5).cast("string")).as("utm_campaign"))

  private def leads(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === "signup").select(
      col("event_id").as("id"),
      // every other signup claims the dr session of the previous event id
      when(col("event_id") % 2 === 0,
        concat(lit("dr_"), (col("event_id") - 1).cast("string")))
        .otherwise(lit(null).cast("string")).as("crm_session_id"),
      when(col("user_id") % 4 =!= 0,
        concat(lit("u"), col("user_id").cast("string"), lit("@X.COM")))
        .otherwise(lit(null).cast("string")).as("email"),
      when(col("user_id") % 3 =!= 0,
        concat(lit("+1-55501"), lpad(col("user_id").cast("string"), 5, "0")))
        .otherwise(lit(null).cast("string")).as("phone"),
      col("ts").as("created_at"),
      when(col("event_id") % 3 === 0, "website").otherwise("third_party").as("lead_source"),
      when(col("event_id") % 2 === 0, "sales").otherwise("service").as("lead_type"),
      (col("event_id") % 50000).cast("decimal(10,2)").as("estimated_deal_value"))

  private val SESSIONS_SQL = """
      SELECT event_id AS id,
        CASE WHEN event_id % 3 <> 0 THEN 'dr_' || CAST(event_id AS VARCHAR) END AS digital_retailing_session_id,
        CASE WHEN user_id % 4 <> 0 THEN 'U' || CAST(user_id AS VARCHAR) || '@x.com' END AS email,
        CASE WHEN user_id % 3 <> 0 THEN '55501' || lpad(CAST(user_id AS VARCHAR), 5, '0') END AS phone,
        ts AS last_seen, ts AS created_at,
        CASE WHEN user_id % 3 = 0 THEN 'google' WHEN user_id % 3 = 1 THEN 'facebook' END AS utm_source,
        CASE WHEN user_id % 3 = 0 THEN 'cpc' WHEN user_id % 3 = 1 THEN 'social' END AS utm_medium,
        'camp_' || CAST(user_id % 5 AS VARCHAR) AS utm_campaign
      FROM events WHERE event_type = 'view'"""

  private val LEADS_SQL = """
      SELECT event_id AS id,
        CASE WHEN event_id % 2 = 0 THEN 'dr_' || CAST(event_id - 1 AS VARCHAR) END AS crm_session_id,
        CASE WHEN user_id % 4 <> 0 THEN 'u' || CAST(user_id AS VARCHAR) || '@X.COM' END AS email,
        CASE WHEN user_id % 3 <> 0 THEN '+1-55501' || lpad(CAST(user_id AS VARCHAR), 5, '0') END AS phone,
        ts AS created_at,
        CASE WHEN event_id % 3 = 0 THEN 'website' ELSE 'third_party' END AS lead_source,
        CASE WHEN event_id % 2 = 0 THEN 'sales' ELSE 'service' END AS lead_type,
        CAST(event_id % 50000 AS DECIMAL(10,2)) AS estimated_deal_value
      FROM events WHERE event_type = 'signup'"""

  /** matchLeads replicated: exact session join; contact fallback =
    * (email ∪ phone equi-join within 24h) → best session per lead →
    * minus session-matched leads. */
  private val MATCHES_SQL = s"""
      WITH vs AS ($SESSIONS_SQL),
      cl AS ($LEADS_SQL),
      by_session AS (
        SELECT cl.id AS crm_lead_id, vs.id AS visitor_session_id,
               'session_id' AS match_method,
               CAST(1.00 AS DECIMAL(3,2)) AS match_confidence,
               cl.created_at AS matched_at
        FROM cl JOIN vs ON cl.crm_session_id = vs.digital_retailing_session_id
        WHERE cl.crm_session_id IS NOT NULL),
      contact_cand AS (
        SELECT DISTINCT cl.id AS crm_lead_id, vs.id AS visitor_session_id,
               cl.created_at, vs.last_seen
        FROM cl JOIN vs ON (
          (lower(trim(cl.email)) IS NOT NULL AND lower(trim(cl.email)) = lower(trim(vs.email)))
          OR (CASE WHEN length(regexp_replace(cl.phone, '[^0-9]', '', 'g')) >= 10
                   THEN right(regexp_replace(cl.phone, '[^0-9]', '', 'g'), 10) END IS NOT NULL
              AND CASE WHEN length(regexp_replace(cl.phone, '[^0-9]', '', 'g')) >= 10
                       THEN right(regexp_replace(cl.phone, '[^0-9]', '', 'g'), 10) END
                = CASE WHEN length(regexp_replace(vs.phone, '[^0-9]', '', 'g')) >= 10
                       THEN right(regexp_replace(vs.phone, '[^0-9]', '', 'g'), 10) END))
          AND cl.created_at >= vs.last_seen
          AND cl.created_at <= vs.last_seen + INTERVAL 86400 SECOND),
      by_contact AS (
        SELECT crm_lead_id, visitor_session_id,
               'email_phone' AS match_method,
               CAST(0.85 AS DECIMAL(3,2)) AS match_confidence,
               created_at AS matched_at
        FROM (SELECT cc.*, row_number() OVER (PARTITION BY crm_lead_id
                ORDER BY last_seen DESC, visitor_session_id) AS rn
              FROM contact_cand cc) t
        WHERE rn = 1),
      matches AS (
        SELECT * FROM by_session
        UNION ALL
        SELECT * FROM by_contact bc
        WHERE NOT EXISTS (SELECT 1 FROM by_session bs WHERE bs.crm_lead_id = bc.crm_lead_id))"""

  /** The identity match-edge frame, built ONCE per session via the
    * SharedFrames memo and shared by the whole id_* family (edge dump,
    * graph stats, enriched conversions, unmatched rollup, incremental
    * components) — the fuzzy-match pipeline behind it is the dominant
    * repeated cost of the family, and at 100 TB it is the difference
    * between one pass over sessions×leads and five (same doctrine as
    * the co-purchase edge memo in RelationalQueries; measured: the
    * incremental-components query alone recomputed it ~5× through its
    * split/endpoint/relabel consumers — 11.3 s → the family now pays
    * the build once). Consumers must not unpersist it. */
  private[graft] def matchEdges(s: SparkSession, dir: String): DataFrame =
    graft.SharedFrames.cached(s, s"id_match_edges:$dir") {
      IdentityResolution.matchLeads(sessions(s, dir), leads(s, dir))
    }

  private val idMatches = Q(
    "id_match_edges",
    (s, dir) => DomainQueries.pinTypes(
      matchEdges(s, dir))
      .orderBy("crm_lead_id"),
    Some(MATCHES_SQL + """
      SELECT crm_lead_id, visitor_session_id, match_method,
             CAST(match_confidence AS DOUBLE) AS match_confidence, matched_at
      FROM matches ORDER BY crm_lead_id"""),
  )

  /** Matches enriched with deterministic conversion facts for the
    * analytics views. */
  private def enrichedMatches(s: SparkSession, dir: String): DataFrame =
    matchEdges(s, dir)
      .withColumn("id", col("crm_lead_id"))
      .withColumn("created_at", col("matched_at"))
      .withColumn("is_converted", col("crm_lead_id") % 3 === 0)
      .withColumn("conversion_value",
        when(col("crm_lead_id") % 3 === 0,
          (col("crm_lead_id") % 40000).cast("decimal(10,2)")))

  private val ENRICHED_SQL = MATCHES_SQL + """
      , em AS (
        SELECT m.*, crm_lead_id AS id, matched_at AS created_at,
               crm_lead_id % 3 = 0 AS is_converted,
               CASE WHEN crm_lead_id % 3 = 0
                    THEN CAST(crm_lead_id % 40000 AS DECIMAL(10,2)) END AS conversion_value
        FROM matches m)"""

  private val idPerformance = Q(
    "id_matching_performance",
    (s, dir) => DomainQueries.pinTypes(
      IdentityResolution.matchingPerformance(
        enrichedMatches(s, dir), lit("2024-02-01").cast("date")))
      .withColumn("match_date", date_format(col("match_date"), "yyyy-MM-dd"))
      .orderBy(col("match_date").desc),
    Some(ENRICHED_SQL + """
      SELECT strftime(CAST(created_at AS DATE), '%Y-%m-%d') AS match_date,
             count(*) AS total_matches,
             count(*) FILTER (WHERE match_method = 'session_id') AS session_matches,
             count(*) FILTER (WHERE match_method = 'email_phone') AS contact_matches,
             count(*) FILTER (WHERE match_method = 'manual') AS manual_matches,
             CAST(sum(match_confidence) AS DOUBLE) / count(match_confidence) AS avg_confidence,
             count(*) FILTER (WHERE is_converted = true) AS conversions,
             CAST(sum(conversion_value) FILTER (WHERE is_converted = true) AS DOUBLE) AS total_revenue
      FROM em WHERE created_at >= (DATE '2024-02-01' - 30)
      GROUP BY CAST(created_at AS DATE) ORDER BY match_date DESC"""),
  )

  private val idAttribution = Q(
    "id_attribution_analysis",
    (s, dir) => DomainQueries.pinTypes(
      IdentityResolution.attributionAnalysis(
        sessions(s, dir), enrichedMatches(s, dir), lit("2024-02-01").cast("date")))
      .orderBy(col("total_revenue").desc_nulls_last, col("utm_campaign"),
        col("utm_source").asc_nulls_last),
    Some(ENRICHED_SQL + """
      SELECT vs.utm_source, vs.utm_medium, vs.utm_campaign,
             count(DISTINCT vs.id) AS total_visitors,
             count(DISTINCT em.id) AS matched_visitors,
             round(CAST(count(DISTINCT em.id) AS DOUBLE) * 100
                   / nullif(count(DISTINCT vs.id), 0), 2) AS match_rate_percent,
             count(*) FILTER (WHERE em.is_converted = true) AS conversions,
             CAST(sum(em.conversion_value) AS DOUBLE) AS total_revenue,
             round(CAST(sum(em.conversion_value) AS DOUBLE)
                   / nullif(count(DISTINCT vs.id), 0), 2) AS revenue_per_visitor
      FROM (SELECT * FROM vs WHERE created_at >= (DATE '2024-02-01' - 30)) vs
      LEFT JOIN em ON vs.id = em.visitor_session_id
      GROUP BY vs.utm_source, vs.utm_medium, vs.utm_campaign
      HAVING count(DISTINCT vs.id) >= 10
      ORDER BY total_revenue DESC NULLS LAST, utm_campaign, utm_source"""),
  )

  private val idUnmatched = Q(
    "id_unmatched_leads",
    (s, dir) => {
      val (_, leads2) = IdentityResolution.recomputeMatchState(
        sessions(s, dir), leads(s, dir),
        matchEdges(s, dir))
      DomainQueries.pinTypes(
        IdentityResolution.unmatchedLeads(leads2, lit("2024-02-01").cast("date")))
        .withColumn("lead_date", date_format(col("lead_date"), "yyyy-MM-dd"))
        .orderBy(col("total_potential_value").desc_nulls_last,
          col("lead_source"), col("lead_type"), col("lead_date"))
    },
    Some(MATCHES_SQL + """
      SELECT cl.lead_source, cl.lead_type,
             strftime(CAST(cl.created_at AS DATE), '%Y-%m-%d') AS lead_date,
             count(*) AS unmatched_count,
             round(CAST(sum(cl.estimated_deal_value) AS DOUBLE)
                   / count(cl.estimated_deal_value), 2) AS avg_deal_value,
             CAST(sum(cl.estimated_deal_value) AS DOUBLE) AS total_potential_value
      FROM cl
      WHERE NOT EXISTS (SELECT 1 FROM matches m WHERE m.crm_lead_id = cl.id)
        AND cl.created_at >= (DATE '2024-02-01' - 7)
      GROUP BY cl.lead_source, cl.lead_type, CAST(cl.created_at AS DATE)
      ORDER BY total_potential_value DESC NULLS LAST, lead_source, lead_type, lead_date"""),
  )

  // -------------------------------------------- identity graph health
  /** Identity-graph health report — the CDP ops metric behind "is the
    * match graph sane": component-size histogram of the lead↔session
    * match graph. Healthy identity resolution yields many small
    * components (one person = a lead plus their sessions); a giant
    * component is the classic HAIRBALL — one shared contact point
    * (dealer front-desk phone, shared kiosk email) transitively
    * merging thousands of real people, and the histogram's tail is
    * where it shows up first.
    *
    * Bipartite ids share one space via even/odd encoding (lead → 2k,
    * session → 2k+1). Components run the iterative
    * [[graft.operators.ConnectedComponents]] operator (pointer-jumped,
    * per-round checkpoint release); the histogram is two metadata
    * aggregates on top. The oracle recomputes components with a
    * recursive CTE — an independent algorithm, same partition. */
  private val idGraphStats = Q(
    "id_graph_stats",
    (s, dir) => {
      val edges = matchEdges(s, dir)
        .select((col("crm_lead_id") * 2).as("src"),
          (col("visitor_session_id") * 2 + 1).as("dst"))
      val comp = graft.operators.ConnectedComponents.run(edges, "src", "dst")
      val out = comp.groupBy("comp").agg(count(lit(1)).as("component_size"))
        .groupBy("component_size")
        .agg(count(lit(1)).as("n_components"),
          (count(lit(1)) * col("component_size")).as("n_nodes"))
        .orderBy("component_size")
        .persist()
      out.count() // materialize before releasing the component map
      comp.unpersist()
      out
    },
    Some(MATCHES_SQL.replaceFirst("WITH ", "WITH RECURSIVE ") + """,
      ed AS (
        SELECT crm_lead_id * 2 AS src, visitor_session_id * 2 + 1 AS dst FROM matches
        UNION
        SELECT visitor_session_id * 2 + 1 AS src, crm_lead_id * 2 AS dst FROM matches),
      reach(id, r) AS (
        SELECT src, src FROM ed
        UNION
        SELECT e.dst, reach.r FROM reach JOIN ed e ON e.src = reach.id),
      comp AS (SELECT id, min(r) AS c FROM reach GROUP BY id),
      sz AS (SELECT c, CAST(count(*) AS BIGINT) AS component_size FROM comp GROUP BY c)
      SELECT component_size,
             CAST(count(*) AS BIGINT) AS n_components,
             CAST(count(*) * component_size AS BIGINT) AS n_nodes
      FROM sz GROUP BY component_size
      ORDER BY component_size"""),
  )

  /** Incremental identity-graph maintenance — the DAILY posture the
    * reference's identity store actually runs (yesterday's resolved
    * components + today's match edges;
    * `identity-resolution/database-schema.sql:145-380` accumulates
    * matches continuously): the Jan-1..14 match edges resolve via full
    * CC, the Jan-15..31 batch folds in via
    * [[graft.operators.ConnectedComponents.incrementalMerge]] —
    * component-collapse makes the delta work BATCH-sized metadata
    * (new endpoints map to current components, CC runs on the
    * component-level edge list) and history is touched exactly once by
    * the relabel join. The oracle recomputes components over ALL edges
    * with the recursive-reach replay, so the differential IS the proof
    * that incremental ≡ full recompute on real identity data (357 old
    * edges + 381 new, all merge classes present). Lead/session id
    * namespaces stay disjoint via the 2k / 2k+1 encoding. */
  private val idIncremental = Q(
    "id_incremental_components",
    (s, dir) => {
      val cutoff = lit("2024-01-15").cast("timestamp")
      val edges = matchEdges(s, dir)
        .select((col("crm_lead_id") * 2).as("src"),
          (col("visitor_session_id") * 2 + 1).as("dst"),
          col("matched_at"))
      val old = edges.filter(col("matched_at") < cutoff).select("src", "dst")
      val batch = edges.filter(col("matched_at") >= cutoff).select("src", "dst")
      val labels = graft.operators.ConnectedComponents.run(old, "src", "dst")
      val (upd, release) = graft.operators.ConnectedComponents
        .incrementalMerge(labels, batch, "src", "dst")
      // per-component size as a whole-partition window count: ONE
      // shuffle on comp and one pass over `upd` — the groupBy +
      // join-back spelling shuffles the same rows twice and re-derives
      // the (lazy) merge plan once per join side
      val out = upd
        .withColumn("component_size", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("comp")))
        .select(col("id").as("node_id"), col("comp"), col("component_size"))
        .orderBy("node_id")
        .persist()
      out.count() // materialize before releasing the internal maps
      release(); labels.unpersist()
      out
    },
    Some(MATCHES_SQL.replaceFirst("WITH ", "WITH RECURSIVE ") + """,
      ed AS (
        SELECT crm_lead_id * 2 AS src, visitor_session_id * 2 + 1 AS dst FROM matches
        UNION
        SELECT visitor_session_id * 2 + 1 AS src, crm_lead_id * 2 AS dst FROM matches),
      reach(id, r) AS (
        SELECT src, src FROM ed
        UNION
        SELECT e.dst, reach.r FROM reach JOIN ed e ON e.src = reach.id),
      comp AS (SELECT id, min(r) AS c FROM reach GROUP BY id),
      sz AS (SELECT c, CAST(count(*) AS BIGINT) AS component_size FROM comp GROUP BY c)
      SELECT comp.id AS node_id, comp.c AS comp, sz.component_size
      FROM comp JOIN sz ON comp.c = sz.c
      ORDER BY node_id"""),
  )

  val all: Seq[Q] = Seq(actBatch, actEvents, idMatches, idGraphStats, idPerformance,
    idAttribution, idUnmatched, idIncremental)
}
