package graft.views

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Cleansing

/** The six marketing "customer 360" views (reference
  * `sql/customer_360_views.sql:23-742` in
  * bill-hoerr/automotive-data-pipeline-demo), re-expressed as DataFrame
  * transformers. Each takes source DataFrames shaped like
  * `schema.Schemas` and returns the view; callers can register temp
  * views so Spark SQL composes them exactly like the warehouse did.
  *
  * Deliberate, documented divergences from the reference:
  *   - `asOf` replaces CURRENT_DATE so results are testable/frozen
  *     (SURVEY §7.4.3).
  *   - View-level ORDER BY is dropped — cosmetic in a warehouse view,
  *     meaningless under Spark's lazy composition (SURVEY §7.4.7);
  *     consumers order at the sink.
  *   - ROW_NUMBER windows get a deterministic tiebreak column appended
  *     (the reference leaves ties engine-arbitrary).
  *   - Money averages are computed as exact-decimal-sum / count in
  *     DOUBLE (engine-portable); sums stay DecimalType.
  *   - `days_since_last_purchase` uses datediff(asOf, date(ts)) — the
  *     reference's `CURRENT_DATE - timestamp` arithmetic is not
  *     well-typed in any strict dialect.
  *
  * Scale notes (100 TB): profiles dedups with one hash-partition
  * exchange on `custno` (skew-prone key → AQE skew handling stays on);
  * segments joins profiles⟕history shuffled on `user_id` with map-side
  * partial aggregation; no collects, no NOT-IN, no UDFs anywhere.
  */
object Customer360 {

  /** marketing.customer_profiles (`customer_360_views.sql:23-186`):
    * soft-delete filter → W1 dedup (latest per custno) → quality gate
    * (names + contactable) → cleansing projection.
    *
    * `tiebreak` extends the dedup window's order past the reference's
    * (lastupdated, dateadded): two versions of a customer CAN share
    * both timestamps (same-day CDC loads), and rank-1 under a non-total
    * order is engine-arbitrary — callers that need reproducible output
    * (every differential entry does) pass a unique source column. */
  def customerProfiles(
      customerMaster: DataFrame,
      asOf: Column,
      tiebreak: Seq[Column] = Nil): DataFrame =
    customerProfilesOfLatest(
      customerMaster
        .filter(Cleansing.notSoftDeleted(col("isdeleted"), col("deletedataflag")))
        .withColumn("customer_rank", row_number().over(
          Window.partitionBy("custno")
            .orderBy(Seq(col("lastupdated").desc, col("dateadded").desc) ++
              tiebreak: _*)))
        .filter(col("customer_rank") === 1),
      asOf)

  /** [[customerProfiles]] minus its W1 dedup window, for inputs ALREADY
    * unique per custno — the derive stage over a latest-per-key state
    * store (MaterializedView/AggregateView fold output, whose version
    * order replicates the view's rank order by contract). Ranking a
    * one-row partition picks that row; what it costs is a full hash
    * exchange + window pass over the state on every build and refresh,
    * so the state path skips it. The soft-delete and quality gates are
    * REAPPLIED here (narrow scans, no exchange): state is pre-view-
    * filter by design — a key whose winner fails the gate must have no
    * view row. */
  def customerProfilesOfLatest(latest: DataFrame, asOf: Column): DataFrame = {
    latest
      .filter(Cleansing.notSoftDeleted(col("isdeleted"), col("deletedataflag")))
      .filter(
        col("firstname").isNotNull && col("firstname") =!= "" &&
        col("lastname").isNotNull && col("lastname") =!= "" &&
        Cleansing.isContactable(col("email"), col("telephone")))
      .select(
        Cleansing.userId("AUTO-", col("custno")).as("user_id"),
        col("custno"), col("firstname"), col("lastname"),
        Cleansing.cleanEmail(col("email")).as("email"),
        Cleansing.normalizePhone(col("telephone")).as("phone"),
        trim(col("address")).as("address"),
        trim(col("addresssecondline")).as("address2"),
        trim(col("city")).as("city"),
        upper(trim(col("state"))).as("state"),
        regexp_replace(col("ziporpostalcode"), "[^0-9-]", "").as("zip"),
        Cleansing.normalizeGender(col("gender")).as("gender"),
        col("birthdate"),
        Cleansing.ageYears(col("birthdate"), asOf).as("age"),
        Cleansing.generation(col("birthdate"), asOf).as("generation"),
        coalesce(col("preferredlanguage"), lit("English")).as("preferred_language"),
        coalesce(col("blockemail"), lit(false)).as("email_opt_out"),
        coalesce(col("blockphone"), lit(false)).as("phone_opt_out"),
        coalesce(col("blockmail"), lit(false)).as("mail_opt_out"),
        coalesce(col("optoutflag"), lit(false)).as("marketing_opt_out"),
        col("optoutdate").as("opt_out_date"),
        coalesce(col("ytdpurchases"), lit(0)).as("ytd_purchases"),
        coalesce(col("totallabor") + col("totalparts"), lit(0))
          .as("lifetime_service_value"),
        col("lastservicedate").as("last_service_date"),
        Cleansing.serviceRecency(col("lastservicedate"), asOf).as("service_recency"),
        col("dateadded").as("customer_since"),
        (year(asOf) - year(col("dateadded"))).as("customer_tenure_years"),
        col("lastupdated").as("last_updated"))
  }

  /** The marketable-contact slice of [[customerProfilesOfLatest]] —
    * IDENTICAL gates and cleansing expressions, projection reduced to
    * the five columns the validated-sales join and the activation
    * contact join actually read. Exists so the validated-sales
    * aggregate view can store an 11-column dimension state instead of
    * the full 26-column master (the fold, state write and every
    * refresh scan shrink with it; at 100 TB the dim store is a
    * contact table, not a second copy of the master). Equivalence to
    * the full projection is pinned in `Customer360Spec`. */
  def marketableContactsOfLatest(latest: DataFrame): DataFrame =
    latest
      .filter(Cleansing.notSoftDeleted(col("isdeleted"), col("deletedataflag")))
      .filter(
        col("firstname").isNotNull && col("firstname") =!= "" &&
        col("lastname").isNotNull && col("lastname") =!= "" &&
        Cleansing.isContactable(col("email"), col("telephone")))
      .select(
        Cleansing.userId("AUTO-", col("custno")).as("user_id"),
        col("custno"),
        Cleansing.cleanEmail(col("email")).as("email"),
        Cleansing.normalizePhone(col("telephone")).as("phone"),
        coalesce(col("blockemail"), lit(false)).as("email_opt_out"))

  /** The master columns [[marketableContactsOfLatest]] (and the dim
    * fold feeding it) consume — the validated-sales view's dimension
    * state projection, order/tiebreak columns included. */
  val MarketableContactCols: Seq[String] = Seq(
    "custno", "firstname", "lastname", "email", "telephone", "blockemail",
    "isdeleted", "deletedataflag", "lastupdated", "dateadded", "sourcerowid")

  /** The profile slice [[customerSegments]] consumes — IDENTICAL gates
    * and cleansing expressions as [[customerProfilesOfLatest]], the
    * projection reduced to the 13 columns the segments aggregate reads.
    * Exists for the same reason as [[marketableContactsOfLatest]]: the
    * segments aggregate view has no reason to fold, write and rescan
    * the other 13 profile columns (gender, address block, opt-out
    * block, …) on every build and refresh — at 100 TB the dim state is
    * a segment-input table, not a second copy of the master. The
    * differential gate (`mv_segments_refresh` vs the full-rebuild
    * oracle) proves the slice complete: a missing column fails
    * analysis, a wrong expression fails the row hash. */
  def segmentProfilesOfLatest(latest: DataFrame, asOf: Column): DataFrame =
    latest
      .filter(Cleansing.notSoftDeleted(col("isdeleted"), col("deletedataflag")))
      .filter(
        col("firstname").isNotNull && col("firstname") =!= "" &&
        col("lastname").isNotNull && col("lastname") =!= "" &&
        Cleansing.isContactable(col("email"), col("telephone")))
      .select(
        Cleansing.userId("AUTO-", col("custno")).as("user_id"),
        col("custno"), col("firstname"), col("lastname"),
        Cleansing.cleanEmail(col("email")).as("email"),
        Cleansing.normalizePhone(col("telephone")).as("phone"),
        upper(trim(col("state"))).as("state"),
        regexp_replace(col("ziporpostalcode"), "[^0-9-]", "").as("zip"),
        Cleansing.ageYears(col("birthdate"), asOf).as("age"),
        Cleansing.generation(col("birthdate"), asOf).as("generation"),
        (year(asOf) - year(col("dateadded"))).as("customer_tenure_years"),
        col("lastservicedate").as("last_service_date"),
        coalesce(col("totallabor") + col("totalparts"), lit(0))
          .as("lifetime_service_value"))

  /** The master columns [[segmentProfilesOfLatest]] (and the dim fold
    * feeding it) consume — the segments view's dimension state
    * projection (16 of the master's 26), fold order/tiebreak columns
    * included. */
  val SegmentProfileSourceCols: Seq[String] = Seq(
    "custno", "firstname", "lastname", "email", "telephone", "state",
    "ziporpostalcode", "birthdate", "totallabor", "totalparts",
    "lastservicedate", "isdeleted", "deletedataflag",
    "lastupdated", "dateadded", "sourcerowid")

  /** The vehicle-history slice [[customerSegments]] consumes — same
    * validity gate and normalization expressions as
    * [[vehicleHistoryOfLatest]], projection reduced to the 10 columns
    * the segments aggregate reads (the 45-column sales feed folds to a
    * 12-column fact state; the purchase-sequence window, which segments
    * never reads, is not computed at all instead of relying on the
    * optimizer to prune it). Completeness proven by the same
    * differential as the dim slice. */
  def segmentHistoryOfLatest(latest: DataFrame): DataFrame =
    latest
      .filter(col("custno").isNotNull && col("vin").isNotNull &&
        col("contractdate").isNotNull)
      .select(
        Cleansing.userId("AUTO-", col("custno")).as("user_id"),
        col("dealno").as("deal_number"),
        col("outthedoorprice").as("total_price"),
        col("contractdate").as("purchase_date"),
        col("makename").as("make"),
        when(col("modeltype").ilike("%new%"), "New")
          .when(col("modeltype").ilike("%used%"), "Used")
          .when(col("modeltype").ilike("%certified%"), "Certified Pre-Owned")
          .otherwise(col("modeltype")).as("vehicle_condition"),
        when(col("saletype").ilike("%cash%"), "Cash")
          .when(col("saletype").ilike("%finance%"), "Financed")
          .when(col("saletype").ilike("%lease%"), "Lease")
          .otherwise(col("saletype")).as("transaction_type"),
        col("customercashdown").as("cash_down"),
        col("trade1vin").as("trade_vin"),
        col("nettrade1").as("trade_equity"))

  /** The sales columns [[segmentHistoryOfLatest]] (and the fact fold
    * feeding it) consume — the segments view's fact state projection
    * (12 of the feed's ~45), fold key/order columns included. */
  val SegmentHistorySourceCols: Seq[String] = Seq(
    "dealno", "custno", "vin", "contractdate", "makename", "modeltype",
    "saletype", "outthedoorprice", "customercashdown", "trade1vin",
    "nettrade1", "rowlastupdatedutc")

  /** marketing.customer_vehicle_history (`customer_360_views.sql:192-370`):
    * validity filter → W2 dedup (latest per dealno) → normalization
    * projection + W3 purchase sequence + recency buckets. */
  def vehicleHistory(vehicleSales: DataFrame, asOf: Column): DataFrame =
    vehicleHistoryOfLatest(
      vehicleSales
        .filter(col("custno").isNotNull && col("vin").isNotNull &&
          col("contractdate").isNotNull)
        // ONE exchange for both windows (guide §2.4, same contract as
        // Dedup.latestByKeyClustered): every version of a deal carries
        // the same custno (the fact-state precondition AggregateView
        // already declares), so ranking per (custno, dealno) groups
        // exactly like (dealno), and hash-partitioning on custno alone
        // satisfies BOTH this window's clustered distribution and the
        // downstream purchase-sequence window's (per custno) — the
        // dedup's survivors flow into the sequence window with no
        // second full-width shuffle. Verified: 2 Exchange → 1 in the
        // executed plan; proven result-identical by the
        // v_vehicle_history oracle differential.
        .repartition(col("custno"))
        .withColumn("deal_rank", row_number().over(
          Window.partitionBy("custno", "dealno")
            .orderBy(col("rowlastupdatedutc").desc, col("vin").desc)))
        .filter(col("deal_rank") === 1)
        .drop("deal_rank"),
      asOf)

  /** [[vehicleHistory]] minus its W2 dedup window, for inputs ALREADY
    * unique per dealno (latest-per-key fact state — same contract as
    * [[customerProfilesOfLatest]]). The validity gate is reapplied; the
    * purchase-sequence window is REAL work (per-custno ordering across
    * deals) and stays. */
  def vehicleHistoryOfLatest(latest: DataFrame, asOf: Column): DataFrame = {
    val ranked = latest
      .filter(col("custno").isNotNull && col("vin").isNotNull &&
        col("contractdate").isNotNull)
    ranked.select(
      Cleansing.userId("AUTO-", col("custno")).as("user_id"),
      col("custno"),
      col("dealno").as("deal_number"),
      col("vin"),
      col("stockno").as("stock_number"),
      col("makename").as("make"),
      col("modelname").as("model"),
      col("year"),
      col("bodystyle").as("body_style"),
      col("color"),
      when(col("modeltype").ilike("%new%"), "New")
        .when(col("modeltype").ilike("%used%"), "Used")
        .when(col("modeltype").ilike("%certified%"), "Certified Pre-Owned")
        .otherwise(col("modeltype")).as("vehicle_condition"),
      col("vehiclemileage").as("odometer_reading"),
      when(col("saletype").ilike("%cash%"), "Cash")
        .when(col("saletype").ilike("%finance%"), "Financed")
        .when(col("saletype").ilike("%lease%"), "Lease")
        .otherwise(col("saletype")).as("transaction_type"),
      col("dealtype").as("deal_category"),
      col("branch").as("dealership_location"),
      col("cashprice").as("vehicle_price"),
      col("outthedoorprice").as("total_price"),
      col("costprice").as("dealer_cost"),
      col("totalgross").as("total_gross_profit"),
      col("frontgross").as("vehicle_gross_profit"),
      col("backgross").as("finance_insurance_profit"),
      col("customercashdown").as("cash_down"),
      col("totaldown").as("total_down_payment"),
      col("financesource").as("lender"),
      col("financeamt").as("amount_financed"),
      col("apr").as("interest_rate"),
      col("term").as("finance_term_months"),
      col("paymentamt").as("monthly_payment"),
      col("trade1vin").as("trade_vin"),
      col("trade1acv").as("trade_actual_value"),
      col("trade1payoff").as("trade_payoff"),
      col("nettrade1").as("trade_equity"),
      concat(col("trade1year"), lit(" "), col("trade1makename"), lit(" "),
        col("trade1modelname")).as("trade_vehicle_description"),
      col("leasetype").as("lease_type"),
      col("leasepayment").as("lease_payment"),
      col("leasemileageallowance").as("lease_mile_allowance"),
      col("leaseendvalue").as("lease_residual_value"),
      col("crmsalesmgrname").as("sales_manager"),
      col("crmsp1name").as("salesperson"),
      col("contractdate").as("purchase_date"),
      col("salesdate").as("delivery_date"),
      row_number().over(Window.partitionBy("custno")
        .orderBy(col("contractdate").asc, col("dealno").asc))
        .as("purchase_sequence"),
      datediff(asOf, col("contractdate").cast("date")).as("days_since_purchase"),
      Cleansing.purchaseRecency(col("contractdate"), asOf).as("purchase_recency"),
      col("rowlastupdatedutc").as("last_updated"))
  }

  /** marketing.customer_segments (`customer_360_views.sql:376-515`):
    * profiles ⟕ history → 13-key aggregate (A1-A3) → lifetime value,
    * segment ladder, campaign flags.
    *
    * ARRAY_AGG(DISTINCT x ORDER BY purchase_date DESC) semantics are
    * engine-defined in the reference (SURVEY §7.4.2); ours: distinct
    * values ordered by most recent purchase, ties by value, nulls
    * dropped.
    */
  def customerSegments(profiles: DataFrame, history: DataFrame, asOf: Column): DataFrame = {
    val cp = profiles.alias("cp")
    val vh = history.alias("vh")
    // Distinct values ordered by (max purchase_date per value DESC, value ASC),
    // nulls dropped. Computed by the ArrayAggDistinctOrdered typed Aggregator:
    // its buffer is Map(value -> max sortKey), so per-group state is bounded by
    // the distinct-value count, and there is no interpreted higher-order-function
    // comparator in the aggregate (HOF lambdas are CodegenFallback). unix_micros
    // keeps the full ms precision of the timestamp — a plain cast-to-long would
    // truncate to seconds and could alias two distinct purchase instants. The
    // cast to TIMESTAMP absorbs TIMESTAMP_NTZ sources (parquet timestamp[ms]
    // without UTC adjustment); it is monotonic, so ordering is unaffected.
    val distinctByRecency = (valueCol: String) =>
      graft.operators.ArrayAggDistinctOrdered.distinctOrdered(
        col(valueCol), unix_micros(col("vh_purchase_date").cast("timestamp")))
    val metrics = cp.join(vh, col("cp.user_id") === col("vh.user_id"), "left")
      .select(
        col("cp.user_id").as("user_id"), col("cp.custno").as("custno"),
        col("cp.firstname").as("firstname"), col("cp.lastname").as("lastname"),
        col("cp.email").as("email"), col("cp.phone").as("phone"),
        col("cp.state").as("state"), col("cp.zip").as("zip"),
        col("cp.age").as("age"), col("cp.generation").as("generation"),
        col("cp.customer_tenure_years").as("customer_tenure_years"),
        col("cp.last_service_date").as("last_service_date"),
        col("cp.lifetime_service_value").as("lifetime_service_value"),
        col("vh.deal_number").as("vh_deal_number"),
        col("vh.total_price").as("vh_total_price"),
        col("vh.purchase_date").as("vh_purchase_date"),
        col("vh.make").as("vh_make"),
        col("vh.vehicle_condition").as("vh_vehicle_condition"),
        col("vh.cash_down").as("vh_cash_down"),
        col("vh.transaction_type").as("vh_transaction_type"),
        col("vh.trade_vin").as("vh_trade_vin"),
        col("vh.trade_equity").as("vh_trade_equity"))
      .groupBy("user_id", "custno", "firstname", "lastname", "email", "phone",
        "state", "zip", "age", "generation", "customer_tenure_years",
        "last_service_date", "lifetime_service_value")
      .agg(
        count(col("vh_deal_number")).as("total_purchases"),
        sum(col("vh_total_price")).as("lifetime_purchase_value"),
        (sum(col("vh_total_price")).cast("double") / count(col("vh_total_price")))
          .as("avg_purchase_value"),
        max(col("vh_purchase_date")).as("last_purchase_date"),
        min(col("vh_purchase_date")).as("first_purchase_date"),
        distinctByRecency("vh_make").as("preferred_makes"),
        distinctByRecency("vh_vehicle_condition").as("purchase_patterns"),
        (sum(col("vh_cash_down")).cast("double") / count(col("vh_cash_down")))
          .as("avg_down_payment"),
        count_if(col("vh_transaction_type") === "Cash").as("cash_purchases"),
        count_if(col("vh_transaction_type") === "Financed").as("financed_purchases"),
        count_if(col("vh_transaction_type") === "Lease").as("lease_purchases"),
        count_if(col("vh_trade_vin").isNotNull).as("trades_made"),
        (sum(col("vh_trade_equity")).cast("double") / count(col("vh_trade_equity")))
          .as("avg_trade_equity"))
    val tlv = col("lifetime_purchase_value") + col("lifetime_service_value")
    val daysSincePurchase = datediff(asOf, col("last_purchase_date").cast("date"))
    val daysSinceService = datediff(asOf, col("last_service_date"))
    metrics
      .filter(col("email").isNotNull || col("phone").isNotNull)
      .select(
        col("user_id"), col("custno"), col("firstname"), col("lastname"),
        col("email"), col("phone"), col("state"), col("zip"), col("age"),
        col("generation"),
        col("total_purchases"),
        col("lifetime_purchase_value"),
        col("lifetime_service_value"),
        tlv.as("total_lifetime_value"),
        col("avg_purchase_value"),
        col("preferred_makes"), col("purchase_patterns"),
        col("avg_down_payment"),
        col("cash_purchases"), col("financed_purchases"), col("lease_purchases"),
        col("trades_made"), col("avg_trade_equity"),
        col("last_purchase_date"), col("first_purchase_date"),
        col("last_service_date"),
        coalesce(daysSincePurchase, lit(999999)).as("days_since_last_purchase"),
        coalesce(daysSinceService, lit(999999)).as("days_since_last_service"),
        when(tlv >= 100000, "VIP")
          .when(tlv >= 50000 && col("total_purchases") >= 2, "High Value Repeat")
          .when(tlv >= 25000, "High Value")
          .when(col("total_purchases") >= 2, "Repeat Customer")
          .when(col("total_purchases") === 1 && daysSincePurchase <= 365, "Recent First-Time")
          .when(col("total_purchases") === 1, "Historical First-Time")
          .when(col("lifetime_service_value") > 0, "Service Only")
          .otherwise("Prospect").as("customer_segment"),
        coalesce(col("last_purchase_date") >= date_sub(asOf, 30), lit(false))
          .as("recent_buyer"),
        coalesce(col("total_purchases") >= 2 &&
          daysSincePurchase.between(1095, 1460), lit(false)).as("trade_up_candidate"),
        coalesce(col("last_service_date").isNotNull &&
          daysSinceService.between(90, 180), lit(false)).as("service_due_candidate"),
        coalesce(col("lifetime_service_value") === 0 &&
          col("last_purchase_date").isNotNull && daysSincePurchase >= 90, lit(false))
          .as("service_acquisition_target"),
        col("customer_tenure_years"))
  }

  /** marketing.dealership_customer_profiles (`customer_360_views.sql:521-608`):
    * A4 per-(custno,branch) aggregate → W4 primary-dealership rank →
    * join to profiles, CDP id mapping, opt-in filters. */
  def dealershipProfiles(profiles: DataFrame, vehicleSales: DataFrame): DataFrame = {
    val lc = vehicleSales
      .filter(col("custno").isNotNull && col("branch").isNotNull)
      .groupBy("custno", "branch")
      .agg(count(lit(1)).as("transaction_count"),
        max(col("contractdate")).as("last_transaction_date"))
      .withColumn("dealership_rank", row_number().over(
        Window.partitionBy("custno").orderBy(
          col("transaction_count").desc, col("last_transaction_date").desc,
          col("branch").asc)))
      .filter(col("dealership_rank") === 1)
      .withColumnRenamed("branch", "primary_dealership")
    profiles.alias("cp")
      .join(lc.alias("lc"), Seq("custno"))
      .filter(col("cp.email").isNotNull &&
        col("cp.email_opt_out") === false &&
        col("cp.marketing_opt_out") === false &&
        col("lc.primary_dealership").isNotNull)
      .select(
        when(col("primary_dealership") === "FORD-MAIN",
          concat(lit("FORD-MAIN-"), col("custno")))
          .when(col("primary_dealership") === "TOYOTA-NORTH",
            concat(lit("TOY-NORTH-"), col("custno")))
          .when(col("primary_dealership") === "CHEV-SOUTH",
            concat(lit("CHEV-SOUTH-"), col("custno")))
          .otherwise(concat(lit("AUTO-"), col("primary_dealership"), lit("-"),
            col("custno"))).as("user_id"),
        col("custno"),
        col("firstname").as("first_name"),
        col("lastname").as("last_name"),
        col("email"), col("phone"), col("address"), col("address2"),
        col("city"), col("state"), col("zip"),
        when(col("primary_dealership") === "FORD-MAIN", "Downtown Ford")
          .when(col("primary_dealership") === "TOYOTA-NORTH", "North Toyota")
          .when(col("primary_dealership") === "CHEV-SOUTH", "South Chevrolet")
          .otherwise(col("primary_dealership")).as("dealership"),
        col("primary_dealership").as("dealership_code"),
        col("transaction_count"),
        col("last_transaction_date"),
        col("gender"), col("age"), col("generation"), col("preferred_language"),
        col("email_opt_out"), col("phone_opt_out"), col("mail_opt_out"),
        col("marketing_opt_out"), col("opt_out_date"),
        col("ytd_purchases"), col("lifetime_service_value"),
        col("last_service_date"), col("service_recency"),
        col("customer_since"), col("customer_tenure_years"), col("last_updated"))
  }

  /** marketing.validated_vehicle_sales (`customer_360_views.sql:614-697`):
    * sales ⋈ marketable profiles (J3 existence-style) → W2 dedup →
    * event-ready projection + purchase sequence. */
  def validatedSales(vehicleSales: DataFrame, profiles: DataFrame): DataFrame = {
    val joined = vehicleSales.alias("vs")
      .join(profiles.alias("cp"), col("vs.custno") === col("cp.custno"))
      .filter(col("vs.custno").isNotNull && col("vs.vin").isNotNull &&
        col("vs.contractdate").isNotNull &&
        col("cp.email").isNotNull && col("cp.email_opt_out") === false)
      .select(col("vs.*"))
      // ONE exchange for both windows — same custno-clustered dedup as
      // [[vehicleHistory]] (deal versions never change custno), so the
      // sale-rank window and the projection's purchase-sequence window
      // (per custno) share this single shuffle. Verified: 2 Exchange →
      // 1; result-identical per the v_validated_sales differential.
      .repartition(col("custno"))
      .withColumn("sale_rank", row_number().over(
        Window.partitionBy("custno", "dealno")
          .orderBy(col("rowlastupdatedutc").desc, col("vin").desc)))
      .filter(col("sale_rank") === 1)
    validatedSalesProjection(joined)
  }

  /** [[validatedSales]] minus its W2 dedup window, for sales inputs
    * ALREADY unique per dealno (latest-per-key fact state — same
    * contract as [[vehicleHistoryOfLatest]]). The validity gate and the
    * marketable-profile join are REAPPLIED (state is pre-view-filter);
    * skipping the rank is sound under the fact-state contract that
    * every version of a deal carries the same custno — the marketable
    * predicate is then constant across a deal's versions for a fixed
    * profile snapshot, so filter-then-rank ≡ fold-then-filter. The
    * purchase-sequence window (per custno, across deals) is REAL work
    * and stays — which is why the maintained form of this view is an
    * [[graft.etl.AggregateView]] bucketed on custno, not a per-dealno
    * MaterializedView: the sequence makes each view row depend on its
    * customer's whole deal set, i.e. derive is bucket-closed on custno
    * and nothing smaller. */
  def validatedSalesOfLatest(latestSales: DataFrame, profiles: DataFrame): DataFrame =
    validatedSalesProjection(
      latestSales.alias("vs")
        .join(profiles.alias("cp"), col("vs.custno") === col("cp.custno"))
        .filter(col("vs.custno").isNotNull && col("vs.vin").isNotNull &&
          col("vs.contractdate").isNotNull &&
          col("cp.email").isNotNull && col("cp.email_opt_out") === false)
        .select(col("vs.*")))

  /** The sales columns [[validatedSalesOfLatest]] consumes (projection
    * inputs + the fold's order columns) — the validated-sales view's
    * FACT state projection: the full feed carries ~45 columns, the view
    * reads 34, and a maintained fact store has no reason to fold, write
    * and rescan the other 11 on every refresh. */
  val ValidatedSalesSourceCols: Seq[String] = Seq(
    "dealno", "custno", "vin", "stockno", "makename", "modelname", "year",
    "bodystyle", "color", "modeltype", "vehiclemileage", "saletype",
    "dealtype", "branch", "contractdate", "salesdate", "cashprice",
    "outthedoorprice", "totalgross", "customercashdown", "financesource",
    "financeamt", "apr", "term", "paymentamt", "trade1vin", "trade1acv",
    "nettrade1", "trade1year", "trade1makename", "trade1modelname",
    "crmsalesmgrname", "crmsp1name", "rowlastupdatedutc")

  /** The event-ready projection both [[validatedSales]] paths share
    * (`customer_360_views.sql:638-693`), including the per-custno
    * purchase-sequence window. */
  private def validatedSalesProjection(sales: DataFrame): DataFrame =
    sales.select(
      col("dealno").as("deal_number"),
      Cleansing.userId("AUTO-", col("custno")).as("user_id"),
      col("custno"),
      col("vin"),
      col("stockno").as("stock_number"),
      col("makename").as("make"),
      col("modelname").as("model"),
      col("year"),
      col("bodystyle").as("body_style"),
      col("color"),
      col("modeltype").as("vehicle_type"),
      col("vehiclemileage").as("mileage"),
      col("saletype").as("sale_type"),
      col("dealtype").as("deal_type"),
      col("branch").as("dealership_code"),
      col("contractdate").as("sale_date"),
      col("salesdate").as("delivery_date"),
      col("cashprice").as("vehicle_price"),
      col("outthedoorprice").as("total_price"),
      col("totalgross").as("gross_profit"),
      col("customercashdown").as("customer_down"),
      col("financesource").as("lender"),
      col("financeamt").as("amount_financed"),
      col("apr").as("interest_rate"),
      col("term").as("finance_term"),
      col("paymentamt").as("monthly_payment"),
      col("trade1vin").as("trade_vin"),
      col("trade1acv").as("trade_value"),
      col("nettrade1").as("trade_equity"),
      concat(col("trade1year"), lit(" "), col("trade1makename"), lit(" "),
        col("trade1modelname")).as("trade_description"),
      col("crmsalesmgrname").as("sales_manager"),
      col("crmsp1name").as("salesperson"),
      col("rowlastupdatedutc").as("last_updated"),
      lit("Vehicle Sale").as("data_source"),
      row_number().over(Window.partitionBy("custno")
        .orderBy(col("contractdate").asc, col("dealno").asc))
        .as("customer_purchase_sequence"))

  /** marketing.data_privacy_status (`customer_360_views.sql:703-742`):
    * privacy projection + marketing-status ladder + can_* flags. */
  def privacyStatus(profiles: DataFrame): DataFrame =
    profiles
      .filter(col("email").isNotNull || col("phone").isNotNull)
      .select(
        col("user_id"), col("custno"), col("firstname"), col("lastname"),
        col("email"),
        col("email_opt_out"), col("phone_opt_out"), col("mail_opt_out"),
        col("marketing_opt_out").as("general_opt_out"),
        col("opt_out_date"),
        when(col("marketing_opt_out") === true, "Opted Out - No Marketing")
          .when(col("email_opt_out") === true && col("phone_opt_out") === true,
            "Limited Contact Only")
          .when(col("email_opt_out") === true, "Phone/Mail Only")
          .when(col("phone_opt_out") === true, "Email/Mail Only")
          .otherwise("Full Marketing Consent").as("marketing_status"),
        (!coalesce(col("marketing_opt_out"), lit(false))).as("can_market"),
        (!coalesce(col("email_opt_out"), lit(false))).as("can_email"),
        (!coalesce(col("phone_opt_out"), lit(false))).as("can_call"),
        (!coalesce(col("mail_opt_out"), lit(false))).as("can_mail"),
        col("last_updated").as("preferences_last_updated"))

  /** Register the whole view stack as session temp views so SQL-text
    * users compose them by name exactly like the reference warehouse
    * (`sql/customer_360_views.sql:23-742` — views referencing views):
    * `spark.sql("SELECT customer_segment, count(*) FROM
    * customer_segments GROUP BY 1")` works after one call. Names drop
    * the reference's `marketing.` schema prefix (temp views are
    * unqualified). Views are LAZY — registration plans nothing; each
    * query's optimizer prunes the stack to what it actually reads.
    *
    * `profileTiebreak` is threaded to [[customerProfiles]]'s dedup
    * window for reproducible rank-1 (pass a unique source column). */
  def registerAll(
      customerMaster: DataFrame,
      vehicleSales: DataFrame,
      asOf: Column,
      profileTiebreak: Seq[Column] = Nil): Unit = {
    val profiles = customerProfiles(customerMaster, asOf, profileTiebreak)
    val history = vehicleHistory(vehicleSales, asOf)
    profiles.createOrReplaceTempView("customer_profiles")
    history.createOrReplaceTempView("customer_vehicle_history")
    customerSegments(profiles, history, asOf)
      .createOrReplaceTempView("customer_segments")
    dealershipProfiles(profiles, vehicleSales)
      .createOrReplaceTempView("dealership_customer_profiles")
    validatedSales(vehicleSales, profiles)
      .createOrReplaceTempView("validated_vehicle_sales")
    privacyStatus(profiles).createOrReplaceTempView("data_privacy_status")
  }
}
