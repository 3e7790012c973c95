package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cleansing
import graft.operators.{AsOfJoin, BloomPrune, Dedup, Incremental, Upsert}

/** The relational operator suite over the driver testdata lake.
  *
  * Each query re-expresses one operator family from SURVEY.md §2 (the
  * reference's SQL surface, `sql/customer_360_views.sql`,
  * `scripts/glue_vehicle_sales_etl.py`, `scripts/lambda_redshift_to_segment.py`,
  * `identity-resolution/database-schema.sql` in
  * bill-hoerr/automotive-data-pipeline-demo) as an idiomatic Spark
  * DataFrame pipeline, with a DuckDB oracle for the differential gate.
  *
  * Scale notes (100 TB): every query is a declarative plan — predicate
  * pushdown / column pruning reach the parquet scan; windows and
  * aggregations shuffle once on their natural key; anti-joins replace
  * NOT-IN lists; top-k compiles to TakeOrderedAndProject (per-partition
  * heap + k-row driver merge, never a global sort).
  */
object RelationalQueries {

  /** Exact, order-independent sum of a 2-dp double column. */
  private def sumd(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  // ---------------------------------------------------------------- W1/W2
  /** W1/W2 — dedup-by-window "latest row per key"
    * (reference `sql/customer_360_views.sql:71-74,262-265`). */
  private val w1 = Q(
    "w1_latest_event",
    (s, dir) => {
      val e = Tables.events(s, dir)
      Dedup
        .latestByKey(e, Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
        .select("user_id", "event_id", "event_type", "ts", "value")
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, event_id, event_type, ts, value
      FROM (SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events e) t
      WHERE rn = 1 ORDER BY user_id"""),
  )

  // ------------------------------------------------------------------ W3
  /** W3 — purchase sequence number
    * (reference `sql/customer_360_views.sql:350-353`). */
  private val w3 = Q(
    "w3_order_sequence",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      Dedup
        .sequenceNumber(o, Seq("o_custkey"),
          Seq(col("o_orderdate").asc, col("o_orderkey").asc), "purchase_seq")
        .withColumn("purchase_seq", col("purchase_seq").cast("long"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "purchase_seq")
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_orderdate,
             CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS purchase_seq
      FROM orders ORDER BY o_orderkey"""),
  )

  // --------------------------------------------------------------- A4+W4
  /** A4+W4 — aggregate per (key, dim), then window over the aggregate
    * with a 2-key tiebreak: "primary dealership per customer"
    * (reference `sql/customer_360_views.sql:531-541`). */
  private val w4 = Q(
    "w4_primary_event_type",
    (s, dir) => {
      val agg = Tables.events(s, dir)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("cnt"), max(col("ts")).as("last_ts"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("cnt").desc, col("last_ts").desc, col("event_type").asc)
      agg.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, event_type, cnt, last_ts
      FROM (SELECT user_id, event_type, count(*) AS cnt, max(ts) AS last_ts,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY count(*) DESC, max(ts) DESC, event_type) AS rn
            FROM events GROUP BY user_id, event_type) t
      WHERE rn = 1 ORDER BY user_id"""),
  )

  // ------------------------------------------------------------------ A1
  /** A1 — count/sum/avg/min/max groupBy (reference
    * `sql/customer_360_views.sql:397-401,422-425`). Partial (map-side)
    * aggregation is automatic; one shuffle on the grouping key. */
  private val a1 = Q(
    "a1_pricing_summary",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      l.groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          sumd(col("l_quantity")).as("sum_qty"),
          sumd(col("l_extendedprice")).as("sum_price"),
          (sumd(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          min(col("l_discount")).as("min_disc"),
          max(col("l_tax")).as("max_tax"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
             min(l_discount) AS min_disc, max(l_tax) AS max_tax
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
  )

  // ------------------------------------------------------------------ A2
  /** A2 — conditional counts `COUNT(CASE WHEN …)`
    * (reference `sql/customer_360_views.sql:412-417`). */
  private val a2 = Q(
    "a2_conditional_counts",
    (s, dir) => {
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("total"),
          count_if(col("o_orderstatus") === "F").as("n_f"),
          count_if(col("o_orderstatus") === "O").as("n_o"),
          count_if(col("o_orderstatus") === "P").as("n_p"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, count(*) AS total,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
             count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
  )

  // ------------------------------------------------------------------ A3
  /** A3 — ARRAY_AGG(DISTINCT x ORDER BY y DESC): distinct brands ordered
    * by most recent ship date (reference `sql/customer_360_views.sql:407-408`).
    * Redshift leaves the order engine-defined; we DEFINE ours as
    * (last_ship DESC, brand ASC) and express it as a two-level aggregate —
    * no custom UDAF, no lambda comparator (HOF comparators are
    * CodegenFallback): the sort key is pre-inverted (`-unix_date`) so plain
    * `sort_array`'s natural struct ordering (field-by-field ascending)
    * yields (last_ship DESC, brand ASC). The output column is the
    * '|'-joined string — arrays don't cross the driver's compare boundary.
    */
  private val a3 = Q(
    "a3_brands_by_recency",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      val perBrand = li.groupBy("o_custkey", "p_brand")
        .agg(max(col("l_shipdate").cast("date")).as("last_ship"))
      perBrand.groupBy("o_custkey")
        .agg(sort_array(collect_list(struct(
          (-unix_date(col("last_ship"))).as("neg_day"),
          col("p_brand")))).as("sorted"))
        .select(
          col("o_custkey"),
          array_join(col("sorted.p_brand"), "|").as("brands_by_recency"))
        .orderBy("o_custkey")
    },
    Some("""
      SELECT o_custkey,
             string_agg(p_brand, '|' ORDER BY last_ship DESC, p_brand) AS brands_by_recency
      FROM (SELECT o_custkey, p_brand, max(CAST(l_shipdate AS DATE)) AS last_ship
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN part ON l_partkey = p_partkey
            GROUP BY o_custkey, p_brand) t
      GROUP BY o_custkey ORDER BY o_custkey"""),
  )

  // --------------------------------------------------------------- A5/A7
  /** A5/A7 — FILTER(WHERE) aggregates + daily rollup
    * (reference `identity-resolution/database-schema.sql:304-317,345-357`). */
  private val a5 = Q(
    "a5_daily_event_stats",
    (s, dir) => {
      val e = Tables.events(s, dir)
      // event_date as an ISO string, not DATE: date-typed outputs are
      // representation-ambiguous across the oracle boundary.
      e.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("event_date"))
        .agg(
          count(lit(1)).as("total"),
          count_if(col("event_type") === "click").as("clicks"),
          count_if(col("event_type") === "error").as("errors"),
          countDistinct(col("user_id")).as("users"),
          sumd(col("value")).as("sum_value"),
          (sumd(col("value")) / count(lit(1))).as("avg_value"))
        .orderBy("event_date")
    },
    Some("""
      SELECT strftime(ts, '%Y-%m-%d') AS event_date, count(*) AS total,
             count(*) FILTER (WHERE event_type = 'click') AS clicks,
             count(*) FILTER (WHERE event_type = 'error') AS errors,
             count(DISTINCT user_id) AS users,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
      FROM events GROUP BY strftime(ts, '%Y-%m-%d') ORDER BY event_date"""),
  )

  // --------------------------------------------------------------- A6/O3
  /** A6 — COUNT(DISTINCT) + NULLIF-guarded rate + HAVING; O3 — ORDER BY
    * … DESC NULLS LAST (reference `identity-resolution/database-schema.sql:320-342`). */
  private val a6 = Q(
    "a6_event_type_rates",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("total"),
          countDistinct(col("user_id")).as("users"),
          round(count_if(col("value") > 50).cast("double") * 100 /
            nullif(count(lit(1)), lit(0)), 2).as("high_value_rate"))
        .filter(col("total") >= 10)
        .orderBy(col("high_value_rate").desc_nulls_last, col("event_type"))
    },
    Some("""
      SELECT event_type, count(*) AS total, count(DISTINCT user_id) AS users,
             round(CAST(count(*) FILTER (WHERE value > 50) AS DOUBLE) * 100
                   / nullif(count(*), 0), 2) AS high_value_rate
      FROM events GROUP BY event_type
      HAVING count(*) >= 10
      ORDER BY high_value_rate DESC NULLS LAST, event_type"""),
  )

  // ------------------------------------------------------------------ J1
  /** J1+A8 — profiles ⟕ history feeding aggregation (reference
    * `sql/customer_360_views.sql:420-425`). The 1500-row customer side is
    * broadcast by AQE; at 100 TB the join shuffles on the key with
    * map-side partial aggregation. */
  private val j1 = Q(
    "j1_customer_order_totals",
    (s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey", "c_name")
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
          count(col("o_orderkey")).as("order_cnt"),
          coalesce(sumd(col("o_totalprice")), lit(0.0)).as("total_spend"))
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, count(o_orderkey) AS order_cnt,
             coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name ORDER BY c_custkey"""),
  )

  // ------------------------------------------------------------------ O3
  /** O3 — NULLS LAST ranking over a left-join aggregate (customers with
    * no orders keep NULL spend; reference `database-schema.sql:342`). */
  private val o3 = Q(
    "o3_spend_ranking",
    (s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey")
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(sumd(col("o_totalprice")).as("total_spend"))
        .orderBy(col("total_spend").desc_nulls_last, col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY total_spend DESC NULLS LAST, c_custkey"""),
  )

  // ------------------------------------------------------------------ J3
  /** J3 — join-as-existence-filter → LEFT SEMI (reference
    * `sql/customer_360_views.sql:629-635`): never multiplies rows, and
    * Spark broadcasts the filtered build side. */
  private val j3 = Q(
    "j3_building_segment_orders",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      o.join(c, o("o_custkey") === c("c_custkey"), "left_semi")
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT * FROM orders o
      WHERE EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
      ORDER BY o_orderkey"""),
  )

  // ------------------------------------------------------------------ J9
  /** J9 — exclusion anti-join replacing the reference's materialized
    * `NOT IN (…)` list (`scripts/lambda_redshift_to_segment.py:159-163`). */
  private val j9 = Q(
    "j9_orders_excluding_negative_balance",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val bad = Tables.customer(s, dir).filter(col("c_acctbal") < 0)
      o.join(bad, o("o_custkey") === bad("c_custkey"), "left_anti")
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT * FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey AND c.c_acctbal < 0)
      ORDER BY o_orderkey"""),
  )

  // ------------------------------------------------------------------ J5
  /** J5/ST4 — session join with a 24h time window (reference
    * `README.md:83-88`): equi-join on the user key plus an interval
    * predicate — the range filter rides on the hash join, no theta join. */
  private val j5 = Q(
    "j5_click_purchase_24h",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      clicks.join(purchases, "user_id")
        .filter(col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 24 HOURS"))
        .orderBy("user_id", "click_id", "purchase_id")
    },
    Some("""
      SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
             p.event_id AS purchase_id, p.ts AS purchase_ts
      FROM events c JOIN events p
        ON c.user_id = p.user_id
       AND c.event_type = 'click' AND p.event_type = 'purchase'
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 24 HOURS
      ORDER BY c.user_id, click_id, purchase_id"""),
  )

  // ------------------------------------------------------------------ O2
  /** O2 — top-k (reference `scripts/lambda_redshift_to_segment.py:207-208`):
    * compiles to TakeOrderedAndProject, never a global sort. */
  private val o2 = Q(
    "o2_top_orders",
    (s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100),
    Some("SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"),
  )

  // ----------------------------------------------------------------- SET
  /** SET — DISTINCT / EXCEPT / UNION (SURVEY §2.7). */
  private val setOps = Q(
    "set_customer_buckets",
    (s, dir) => {
      val active = Tables.orders(s, dir).select(col("o_custkey").as("custkey")).distinct()
      val negative = Tables.customer(s, dir).filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("custkey"))
      val all = Tables.customer(s, dir).select(col("c_custkey").as("custkey"))
      active.except(negative).withColumn("bucket", lit("active_ok"))
        .unionByName(all.except(active).withColumn("bucket", lit("inactive")))
        .orderBy("bucket", "custkey")
    },
    Some("""
      SELECT custkey, 'active_ok' AS bucket
      FROM (SELECT DISTINCT o_custkey AS custkey FROM orders
            EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal < 0) a
      UNION ALL
      SELECT custkey, 'inactive' AS bucket
      FROM (SELECT c_custkey AS custkey FROM customer
            EXCEPT SELECT DISTINCT o_custkey FROM orders) i
      ORDER BY bucket, custkey"""),
  )

  // -------------------------------------------------------- P3-P8 + U2/U3
  /** P3-P8 + cleansing library (U2/U3/F-str/F-re/F-cond) — the
    * customer_profiles cleansing block re-expressed over testdata
    * (reference `sql/customer_360_views.sql:77-186`). Emails/phones are
    * derived deterministically so the cleansing rules have real work:
    * dummy domains → NULL, short phones → NULL, soft-deleted rows drop. */
  private val pClean = Q(
    "p_clean_customer_profile",
    (s, dir) => {
      val c = Tables.customer(s, dir)
        .withColumn("raw_email",
          when(col("c_custkey") % 10 === 0, lit("  NoEmail@dealer.com "))
            .when(col("c_custkey") % 7 === 0,
              concat(lit("user"), col("c_custkey").cast("string"), lit("@Example.COM")))
            .otherwise(concat(lit("Cust_"), col("c_custkey").cast("string"), lit("@Shop.Net"))))
        .withColumn("raw_phone",
          when(col("c_custkey") % 5 === 0, lit("555-01"))
            .otherwise(concat(lit("+1 (555) 010-"),
              lpad((col("c_custkey") % 10000).cast("string"), 4, "0"))))
        .withColumn("soft_deleted",
          when(col("c_custkey") % 97 === 0, lit(true)).otherwise(lit(null).cast("boolean")))
      c.filter(Cleansing.notSoftDeleted(col("soft_deleted")))
        .select(
          col("c_custkey"),
          Cleansing.cleanEmail(col("raw_email")).as("clean_email"),
          Cleansing.normalizePhone(col("raw_phone")).as("clean_phone"),
          Cleansing.isContactable(col("raw_email"), col("raw_phone")).as("contactable"),
          Cleansing.valueSegment(col("c_acctbal") * 20).as("value_segment"),
          col("c_mktsegment").isin("BUILDING", "AUTOMOBILE").as("is_priority"),
          col("c_acctbal").between(0, 5000).as("mid_balance"))
        .orderBy("c_custkey")
    },
    Some("""
      WITH raw AS (
        SELECT c_custkey, c_acctbal, c_mktsegment,
               CASE WHEN c_custkey % 10 = 0 THEN '  NoEmail@dealer.com '
                    WHEN c_custkey % 7 = 0 THEN 'user' || CAST(c_custkey AS VARCHAR) || '@Example.COM'
                    ELSE 'Cust_' || CAST(c_custkey AS VARCHAR) || '@Shop.Net' END AS raw_email,
               CASE WHEN c_custkey % 5 = 0 THEN '555-01'
                    ELSE '+1 (555) 010-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') END AS raw_phone,
               CASE WHEN c_custkey % 97 = 0 THEN TRUE ELSE NULL END AS soft_deleted
        FROM customer),
      cleaned AS (
        SELECT c_custkey, c_acctbal, c_mktsegment, raw_email, raw_phone,
               CASE WHEN raw_email IS NOT NULL AND raw_email <> ''
                         AND NOT regexp_matches(raw_email, '^(no|nothanks|none|noemail|no.email|na)@', 'i')
                         AND NOT regexp_matches(raw_email, '(@example.com|@test.com|@invalid.com)', 'i')
                         AND regexp_matches(raw_email, '@.+\..+', 'i')
                    THEN lower(trim(raw_email)) END AS clean_email,
               CASE WHEN raw_phone IS NOT NULL AND raw_phone <> ''
                         AND length(regexp_replace(raw_phone, '[^0-9]', '', 'g')) >= 10
                    THEN regexp_replace(raw_phone, '[^0-9]', '', 'g') END AS clean_phone
        FROM raw
        WHERE soft_deleted IS NULL OR soft_deleted = FALSE)
      SELECT c_custkey, clean_email, clean_phone,
             ((raw_email IS NOT NULL AND raw_email <> '' AND regexp_matches(raw_email, '@.+\..+', 'i'))
              OR (raw_phone IS NOT NULL AND raw_phone <> ''
                  AND length(regexp_replace(raw_phone, '[^0-9]', '', 'g')) >= 10)) AS contactable,
             CASE WHEN c_acctbal * 20 >= 100000 THEN 'platinum'
                  WHEN c_acctbal * 20 >= 50000 THEN 'gold'
                  WHEN c_acctbal * 20 >= 25000 THEN 'silver'
                  ELSE 'bronze' END AS value_segment,
             c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AS is_priority,
             c_acctbal BETWEEN 0 AND 5000 AS mid_balance
      FROM cleaned ORDER BY c_custkey"""),
  )

  // ------------------------------------------------------ P2/F-cast/F-json
  /** P2 — per-column cast map ("DMS exports all fields as strings",
    * reference `scripts/glue_vehicle_sales_etl.py:182-266`) + try_cast +
    * JSON extraction (F-json). */
  private val p2 = Q(
    "p2_typed_casts",
    (s, dir) => {
      Tables.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        expr("try_cast(event_type AS BIGINT)").as("k_bad"),
        date_format(col("ts").cast("date"), "yyyy-MM-dd").as("event_date"),
        // string → decimal(18,2) cast map, surfaced as double so the
        // output type is oracle-unambiguous (the decimal hop still runs)
        col("value").cast("decimal(18,2)").cast("double").as("value_dec"),
        col("user_id").cast("string").as("user_str"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
             TRY_CAST(event_type AS BIGINT) AS k_bad,
             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
             CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_dec,
             CAST(user_id AS VARCHAR) AS user_str
      FROM events ORDER BY event_id"""),
  )

  // --------------------------------------------- P8/P10/F-date/F-hash/U6
  /** P8/P10 — literal + derived column injection, deterministic md5
    * messageId (U6), date functions (reference
    * `sql/customer_360_views.sql:85,687`; `lambda_redshift_to_segment.py:316-325`). */
  private val p8 = Q(
    "p8_event_shaping",
    (s, dir) => {
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        concat(lit("AUTO-"), col("o_custkey").cast("string")).as("auto_user_id"),
        lit("Vehicle Sale").as("data_source"),
        Cleansing.messageId(lit("purchase"), col("o_orderkey").cast("string"),
          col("o_custkey").cast("string")).as("message_id"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        datediff(lit("2024-06-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_before_asof"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
             'AUTO-' || CAST(o_custkey AS VARCHAR) AS auto_user_id,
             'Vehicle Sale' AS data_source,
             md5(concat_ws('_', 'purchase', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR))) AS message_id,
             strftime(o_orderdate, '%Y-%m') AS order_month,
             CAST(year(o_orderdate) AS BIGINT) AS order_year,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2024-06-01') AS BIGINT) AS days_before_asof
      FROM orders ORDER BY o_orderkey"""),
  )

  // ----------------------------------------------------------------- S1
  /** S1 — CSV scan with header/quote/recursive options (reference
    * `scripts/glue_vehicle_sales_etl.py:54-68`): round-trip the orders
    * table through a CSV lake layout and read it back typed. The oracle
    * compares against the original parquet rows, so the differential
    * check proves the CSV parse+cast path is lossless (timestamps at
    * second precision, doubles via shortest-roundtrip formatting). */
  private val s1 = Q(
    "s1_csv_scan",
    (s, dir) => {
      val csvDir = s"/tmp/graft_csv_cache/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/orders"
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_orderdate"),
          col("o_orderpriority"))
        .write.mode("overwrite").option("header", true).csv(csvDir)
      s.read
        .option("header", true)
        .option("quote", "\"")
        .option("recursiveFileLookup", true)
        .csv(csvDir)
        .select(
          col("o_orderkey").cast("long"),
          col("o_custkey").cast("long"),
          col("o_orderstatus"),
          col("o_totalprice").cast("double"),
          col("o_orderdate").cast("timestamp"),
          col("o_orderpriority"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders ORDER BY o_orderkey"""),
  )

  // ---------------------------------------------------------------- S11
  /** S11 — JSON-lines event-drop scan ([[graft.sources.JsonSource]]):
    * round-trip the events table through a newline-JSON lake drop — the
    * landing format of the reference's event path
    * (`identity-resolution/api-server.js:83,150-182`) — and read it back
    * under the EXPLICIT schema with the quarantine lane armed. The
    * oracle compares against the original parquet rows, so the
    * differential proves the JSON emit+parse+cast path is lossless
    * (timestamps pinned at microsecond precision via one explicit
    * format; doubles ride Java's round-trip-exact `Double.toString`;
    * the `props` JSON payload string nests as an escaped value and
    * comes back byte-identical). Lane semantics — what quarantines and
    * what doesn't — are pinned in `JsonSourceSpec`.
    *
    * BENCH NOTE: this query times its own fixture write — `write.json`
    * below is roughly half its bench cost. That is deliberate (the
    * round-trip IS the operator under test; emit and parse must be
    * priced together), but when reading this entry's wall-time against
    * scan-only queries, remember it is a write+read number. */
  private val s11 = Q(
    "s11_json_scan",
    (s, dir) => {
      // session- and dir-scoped drop path: the app id isolates concurrent
      // harness runs (mode=overwrite would otherwise delete files a
      // sibling run's scan is reading), and the hash keeps distinct data
      // dirs injective after sanitization collapses their punctuation
      val jsonDir = s"/tmp/graft_json_cache/${s.sparkContext.applicationId}/" +
        s"${dir.replaceAll("[^a-zA-Z0-9]", "_")}_${Integer.toHexString(dir.hashCode)}/events"
      Tables.events(s, dir)
        .select(
          col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .write.mode("overwrite").json(jsonDir)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
      val (good, _) = graft.sources.JsonSource.readWithQuarantine(s, jsonDir, schema)
      good.select(
        col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, ts, user_id, event_type, value, props
      FROM events ORDER BY event_id"""),
  )

  // -------------------------------------------------------------- S5/J8
  /** S5/J8 — idempotent upsert as LEFT ANTI + UNION (reference
    * `scripts/glue_vehicle_sales_etl.py:277-288,368-377`). */
  private val s5 = Q(
    "s5_upsert_orders",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val target = o.filter(col("o_orderkey") % 3 =!= 0)
      val staging = o.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      Upsert.upsert(target, staging, Seq("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .orderBy("o_orderkey")
    },
    Some("""
      WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
           staging AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
                       FROM orders WHERE o_orderkey % 5 = 0)
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM (
        SELECT t.o_orderkey, t.o_custkey, t.o_totalprice, t.o_orderstatus FROM target t
        WHERE NOT EXISTS (SELECT 1 FROM staging st WHERE st.o_orderkey = t.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM staging) u
      ORDER BY o_orderkey"""),
  )

  // -------------------------------------------------------------- S8/J9
  /** S8 — incremental extraction: high-water date range + processed-set
    * anti-join + deterministic top-k batch (reference
    * `scripts/lambda_redshift_to_segment.py:137-230`). */
  private val s8 = Q(
    "s8_incremental_batch",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val processed = e.filter(col("event_id") % 7 === 0).select("event_id")
      Incremental.nextBatch(e, processed, "event_id", "ts",
        lit("2024-01-10").cast("timestamp"), lit("2024-01-20").cast("timestamp"),
        Seq(col("ts").desc, col("event_id").desc), 1000)
    },
    Some("""
      SELECT * FROM events e
      WHERE ts BETWEEN TIMESTAMP '2024-01-10' AND TIMESTAMP '2024-01-20'
        AND e.event_id % 7 <> 0
      ORDER BY ts DESC, event_id DESC LIMIT 1000"""),
  )

  /** S8/J9 at the 100 TB state size — the processed-set exclusion with
    * the state side BLOOM-PRUNED before the exact anti-join
    * ([[graft.operators.BloomPrune]]: a distributed
    * `BloomFilterAggregate` of the batch's keys, a codegen'd
    * `might_contain` scan over the state, exact anti-join on the
    * sliver). Scenario: click events from users with no order history —
    * the reference's unconverted-leads question
    * (`identity-resolution/database-schema.sql:322-343`) asked against
    * an order-history table too large to shuffle. The result is
    * bit-identical to the plain anti-join at ANY false-positive rate,
    * and the oracle IS the plain anti-join — the equivalence is the
    * correctness gate. */
  private val s8bloom = Q(
    "inc_bloom_unconverted",
    (s, dir) => {
      val clicks = Tables.events(s, dir)
        .filter(col("event_type") === "click" && col("user_id").isNotNull)
        .select(col("event_id"), col("user_id"))
      val orderedUsers = Tables.orders(s, dir)
        .select(col("o_custkey").as("user_id"))
      BloomPrune.antiJoinPruned(clicks, orderedUsers, "user_id",
          expectedBatchKeys = 1 << 16)
        .select("event_id", "user_id")
        .orderBy("event_id")
    },
    Some("""
      SELECT e.event_id, e.user_id
      FROM events e
      WHERE e.event_type = 'click' AND e.user_id IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.user_id)
      ORDER BY e.event_id"""),
  )

  // ----------------------------------------------------------------- J10
  /** J10 — as-of join: each click annotated with the user's most recent
    * purchase at-or-before it, within a 7-day lookback. The reference
    * needs exactly this shape for lead attribution
    * (`database-schema.sql:208-231` correlates a lead to the nearest
    * prior session) but spells it as a correlated subquery; the engine's
    * `AsOfJoin` re-plans it as one union + one window — a single
    * exchange, no per-key range blowup (see AsOfJoin scaladoc).
    *
    * The purchase side is deduped per (user, ts) first, which makes the
    * DuckDB `ASOF LEFT JOIN` oracle deterministic (ASOF with duplicate
    * right timestamps is an arbitrary pick in any engine). */
  private val j10 = Q(
    "j10_asof_last_purchase",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      val purchases = Dedup.latestByKey(
        e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"), col("value").as("purchase_value")),
        Seq("user_id", "purchase_ts"), Seq(col("purchase_id").desc))
      AsOfJoin.backward(clicks, purchases, Seq("user_id"),
          "click_ts", "purchase_ts", tolerance = Some(expr("INTERVAL 7 DAYS")))
        .orderBy("user_id", "click_id")
    },
    Some("""
      WITH clicks AS (
        SELECT user_id, event_id AS click_id, ts AS click_ts
        FROM events WHERE event_type = 'click'),
      purch AS (
        SELECT user_id, purchase_id, purchase_ts, purchase_value FROM (
          SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
                 value AS purchase_value,
                 row_number() OVER (PARTITION BY user_id, ts
                                    ORDER BY event_id DESC) AS rn
          FROM events WHERE event_type = 'purchase') t WHERE rn = 1),
      j AS (
        SELECT c.user_id, c.click_id, c.click_ts,
               p.purchase_id, p.purchase_ts, p.purchase_value
        FROM clicks c ASOF LEFT JOIN purch p
          ON c.user_id = p.user_id AND c.click_ts >= p.purchase_ts)
      SELECT user_id, click_id, click_ts,
        CASE WHEN purchase_ts >= click_ts - INTERVAL 7 DAYS THEN purchase_id END AS purchase_id,
        CASE WHEN purchase_ts >= click_ts - INTERVAL 7 DAYS THEN purchase_ts END AS purchase_ts,
        CASE WHEN purchase_ts >= click_ts - INTERVAL 7 DAYS THEN purchase_value END AS purchase_value
      FROM j ORDER BY user_id, click_id"""),
  )

  /** Ordered conversion funnel — the sequential-step analytic the
    * flat event-type rates (A6) can't express: per user, the earliest
    * view, the earliest click STRICTLY AFTER that view (within a 24h
    * step window), the earliest purchase within 24h after that click,
    * and the furthest stage reached. Step ordering is enforced by
    * construction (each stage filters on the previous stage's
    * timestamp before aggregating), not by post-hoc comparison of
    * independent minima — a user who purchases before ever clicking
    * does NOT complete the funnel, and the step windows keep every
    * stage non-vacuously populated at sf0.01 (90/35/25 across stages
    * 1-3; stage 0 is the schema-complete no-view branch).
    *
    * 100 TB design: three min-aggregates and three joins, all keyed on
    * user_id — after the first hash exchange every stage is
    * co-partitioned, and each aggregate's partial min collapses
    * map-side. No windows, no per-user event buffering. */
  private val a11Funnel = Q(
    "a11_event_funnel",
    (s, dir) => {
      val e = Tables.events(s, dir).select("user_id", "event_type", "ts")
      val users = e.select("user_id").distinct()
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("view_ts"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") > col("view_ts") &&
          col("ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"))
        .groupBy("user_id").agg(min("ts").as("click_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("click_ts") &&
          col("ts") <= col("click_ts") + expr("INTERVAL 24 HOURS"))
        .groupBy("user_id").agg(min("ts").as("purchase_ts"))
      users
        .join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .withColumn("funnel_stage",
          when(col("purchase_ts").isNotNull, 3L)
            .when(col("click_ts").isNotNull, 2L)
            .when(col("view_ts").isNotNull, 1L)
            .otherwise(0L))
        .orderBy("user_id")
    },
    Some("""
      WITH u AS (SELECT DISTINCT user_id FROM events),
      v AS (SELECT user_id, min(ts) AS view_ts FROM events
            WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, min(e.ts) AS click_ts
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.view_ts
              AND e.ts <= v.view_ts + INTERVAL 24 HOURS
            GROUP BY e.user_id),
      p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
              AND e.ts <= c.click_ts + INTERVAL 24 HOURS
            GROUP BY e.user_id)
      SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts,
             CAST(CASE WHEN p.purchase_ts IS NOT NULL THEN 3
                       WHEN c.click_ts IS NOT NULL THEN 2
                       WHEN v.view_ts IS NOT NULL THEN 1
                       ELSE 0 END AS BIGINT) AS funnel_stage
      FROM u LEFT JOIN v USING (user_id)
             LEFT JOIN c USING (user_id)
             LEFT JOIN p USING (user_id)
      ORDER BY u.user_id"""),
  )

  /** Retention cohort matrix — users grouped by their signup week,
    * counted as active in each week since: the classic retention
    * triangle behind every "week-4 retention" metric. Weeks are
    * ISO-Monday truncations (identical in both engines); a user's
    * cohort anchors at their EARLIEST signup, and only activity at or
    * after the signup counts.
    *
    * 100 TB design: one aggregate to anchor each user's cohort, one
    * broadcast-or-shuffle join back to the event stream, and the
    * cohort×week aggregate whose partial distinct collapses map-side —
    * no windows, and the output is cohortWeeks × maxWeeks rows of
    * pure metadata. */
  private val a12Cohorts = Q(
    "a12_retention_cohorts",
    (s, dir) => {
      val e = Tables.events(s, dir).select("user_id", "event_type", "ts")
      val cohort = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("signup_ts"))
        .withColumn("cohort_week", date_trunc("week", col("signup_ts")))
      e.join(cohort, "user_id")
        .filter(col("ts") >= col("signup_ts"))
        .withColumn("week_n",
          floor(datediff(col("ts").cast("date"), col("cohort_week").cast("date"))
            / 7).cast("long"))
        .groupBy("cohort_week", "week_n")
        .agg(countDistinct(col("user_id")).as("active_users"))
        .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
          col("week_n"), col("active_users"))
        .orderBy("cohort_week", "week_n")
    },
    Some("""
      WITH su AS (
        SELECT user_id, min(ts) AS signup_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
      co AS (SELECT user_id, signup_ts,
                    date_trunc('week', signup_ts) AS cohort_week FROM su)
      SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
             CAST(datediff('day', CAST(cohort_week AS DATE), CAST(e.ts AS DATE)) // 7
               AS BIGINT) AS week_n,
             CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
      FROM events e JOIN co ON e.user_id = co.user_id
      WHERE e.ts >= co.signup_ts
      GROUP BY co.cohort_week,
               datediff('day', CAST(cohort_week AS DATE), CAST(e.ts AS DATE)) // 7
      ORDER BY cohort_week, week_n"""),
  )

  /** A13 — hopping (sliding) time-window aggregation: 6-hour windows
    * advancing every 2 hours, so each event contributes to exactly
    * three overlapping windows — the standard smoothed-traffic /
    * rolling-error-rate shape that a tumbling daily rollup (A5) cannot
    * express. Spark-first: the built-in `window()` generator expands
    * the slot membership INSIDE codegen (no explode of a handcrafted
    * array), and the aggregate behind it is an ordinary partial-final
    * groupBy — one shuffle of (window × type) partial rows, metadata-
    * sized output. The oracle replays slot assignment with integer
    * micros arithmetic (`start_k = (⌊us/hop⌋ − k)·hop`, k ∈ 0..2 —
    * every event lands in exactly width/hop = 3 slots).
    *
    * 100 TB design: partial aggregation collapses each task to
    * (windows × types) rows before the exchange — slot fan-out never
    * reaches the shuffle; window starts are epoch-aligned so the same
    * query incrementalizes per arriving hop in Structured Streaming. */
  private val a13Hopping = Q(
    "a13_hopping_windows",
    (s, dir) => {
      val e = Tables.events(s, dir)
      e.groupBy(window(col("ts"), "6 hours", "2 hours").as("w"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("users"),
          sumd(col("value")).as("sum_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n_events"), col("users"), col("sum_value"))
        .orderBy("window_start", "event_type")
    },
    Some("""
      SELECT strftime(make_timestamp((epoch_us(ts) // 7200000000 - k.k) * 7200000000),
               '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type,
             count(*) AS n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) AS users,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events, unnest(range(0, 3)) k(k)
      GROUP BY 1, 2 ORDER BY window_start, event_type"""),
  )

  /** ST6 (batch form) — gap-close sessionization as an oracle-checked
    * query: a session is a maximal run of one user's events with no
    * 30-minute silence inside it (the same gap contract as the
    * streaming sessionizer, `streaming/Streams.scala:133` — this is
    * its batch/backfill twin over the events lake). Spark-first:
    * batch `session_window` — Catalyst's native merging-session
    * operator — rather than the lag/flag/running-sum window idiom;
    * the oracle replays sessionization with exactly that independent
    * lag + cumulative-flag algorithm in DuckDB, so a session-merge
    * bug on either side cannot self-confirm.
    *
    * 100 TB design: one shuffle on user_id (high-cardinality key,
    * bounded per-user rows — the benign window shape, not a corpus
    * stratum), partial session-merge map-side, metadata-sized output. */
  private val st6Sessions = Q(
    "st6_session_rollup",
    (s, dir) => {
      val e = Tables.events(s, dir)
      e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          sumd(col("value")).as("sum_value"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
          col("n_events"), col("n_types"), col("sum_value"))
        .orderBy("user_id", "session_start")
    },
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_type, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged)
      SELECT user_id,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
             strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
             count(*) AS n_events,
             CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM sess GROUP BY user_id, sid
      ORDER BY user_id, session_start"""),
  )

  /** Weighted PageRank over the event-type TRANSITION graph — "which
    * journey stage is central": consecutive events per user (ordered
    * by ts, event_id) define src→dst edges weighted by transition
    * counts; [[graft.operators.PageRank]] then ranks the stages in
    * exact fixed-point LONG arithmetic (reference domain: the
    * website-tracker clickstream, `identity-resolution/
    * website-tracker.js` — funnel stages ranked by how journeys
    * concentrate on them, not just raw visit counts like A6).
    *
    * The oracle unrolls the SAME eight rounds as materialized DuckDB
    * CTEs with `//` floor division — per-edge floors before exact
    * integer sums make the comparison bit-level, something float
    * PageRank could never pass.
    *
    * 100 TB design: the corpus-sized work is the lead-window (one
    * shuffle on user_id, the benign high-cardinality key) and the
    * transition aggregate whose partials collapse map-side to ≤
    * |types|² rows; the 8-round loop then iterates on that collapsed
    * edge frame — metadata-sized, checkpoint-hygienic
    * ([[graft.Lineage.checkpointed]] per round). */
  private val graphPagerank = Q(
    "graph_event_pagerank",
    (s, dir) => {
      val e = Tables.events(s, dir).select("user_id", "ts", "event_id", "event_type")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val trans = e
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("w"))
      val pr = graft.operators.PageRank.run(trans, "src", "dst", "w", iterations = 8)
      val out = pr
        .select(col("id").as("event_type"), col("pr").as("pr_scaled"))
        .orderBy("event_type")
        .persist()
      // materialize, then drop the operator's internal result frame —
      // same hygiene contract as dedup_clusters: the harness unpersists
      // the returned frame, everything internal is already released
      out.count()
      pr.unpersist()
      out
    },
    Some(prOracle),
  )

  private def prOracle: String = {
    val rounds = (1 to 8).map { i =>
      s"""r$i AS MATERIALIZED (
        SELECT v.id, 150000000 + coalesce(c.s, 0) AS pr
        FROM v LEFT JOIN (
          SELECT e.dst AS id,
                 CAST(sum((85 * r${i - 1}.pr * e.p) // 100000000) AS BIGINT) AS s
          FROM e JOIN r${i - 1} ON e.src = r${i - 1}.id GROUP BY e.dst) c
        ON v.id = c.id)"""
    }.mkString(",\n      ")
    s"""
      WITH s AS MATERIALIZED (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events),
      t AS (SELECT event_type AS src, nxt AS dst, count(*) AS w FROM s
            WHERE nxt IS NOT NULL GROUP BY 1, 2),
      ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM t GROUP BY src),
      e AS MATERIALIZED (SELECT t.src, t.dst, (1000000 * t.w) // ow.outw AS p
           FROM t JOIN ow ON t.src = ow.src),
      v AS MATERIALIZED (SELECT DISTINCT src AS id
           FROM (SELECT src FROM e UNION ALL SELECT dst FROM e) u),
      r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS pr FROM v),
      $rounds
      SELECT id AS event_type, pr AS pr_scaled FROM r8 ORDER BY event_type"""
  }

  /** A14 — multi-level CUBE aggregation: every (status × priority)
    * subtotal level in ONE pass, disambiguated by `grouping_id()`
    * (rollup-null vs data-null can't be confused). The warehouse-report
    * shape Redshift serves with GROUPING SETS; Spark plans it as a
    * single Expand + one aggregate — 4× row fan-out collapses in
    * partial agg before the only exchange, so at 100 TB the shuffle
    * carries ≤ |status|×|priority|×4 partial rows, not the corpus. */
  private val a14Cube = Q(
    "a14_cube_subtotals",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      o.cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          sumd(col("o_totalprice")).as("sum_price"),
          grouping_id().as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("gid"), col("n_orders"), col("sum_price"))
        .orderBy("gid", "status", "priority")
    },
    Some("""
      SELECT coalesce(o_orderstatus, '(all)') AS status,
             coalesce(o_orderpriority, '(all)') AS priority,
             CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY gid, status, priority"""),
  )

  /** A14b — hierarchical ROLLUP subtotals: revenue by region → nation
    * with per-region subtotals and a grand total, the drill-down
    * report shape (CUBE's sibling — ROLLUP emits only the prefix
    * hierarchy's grouping sets, 3 levels here vs CUBE's 4, which at
    * 100 TB is the difference between a report and a blow-up when the
    * hierarchy is deep). Same single Expand+aggregate plan as A14:
    * the level fan-out collapses in partial aggregation before the
    * one exchange; dims broadcast onto the customer→orders spine. */
  private val a14bRollup = Q(
    "a14b_rollup_totals",
    (s, dir) => {
      val n = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
      val c = Tables.customer(s, dir)
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"), col("r_name"))
      Tables.orders(s, dir)
        .join(c, col("o_custkey") === col("c_custkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sumd(col("o_totalprice")).as("sum_price"),
          grouping_id().as("gid"))
        .select(
          coalesce(col("r_name"), lit("(all)")).as("region"),
          coalesce(col("n_name"), lit("(all)")).as("nation"),
          col("gid"), col("n_orders"), col("sum_price"))
        .orderBy("gid", "region", "nation")
    },
    Some("""
      WITH c AS (
        SELECT c_custkey, n_name, r_name
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey)
      SELECT coalesce(r_name, '(all)') AS region,
             coalesce(n_name, '(all)') AS nation,
             CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders JOIN c ON o_custkey = c_custkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY gid, region, nation"""),
  )

  /** A15 — pivot to a fixed column set: per-user activity matrix with
    * one column per event type (the BI-export shape). Spark-first:
    * `pivot` with EXPLICIT values — the pinned value list skips the
    * distinct-key discovery job and makes the schema static (the only
    * sane contract at 100 TB). The plan is two agg phases — a
    * (user, type) pre-count, then pivotfirst keyed on user whose
    * exchange carries ≤ users×types pre-collapsed rows — one exchange
    * more than hand-written FILTER counts, bought back in API
    * generality; absent combinations coalesce to 0 exactly like the
    * oracle's FILTER counts. */
  private val a15Pivot = Q(
    "a15_event_pivot",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val types = Seq("click", "error", "purchase", "signup", "view")
      val piv = e.groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      piv.select(col("user_id") +:
          types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id,
             count(*) FILTER (WHERE event_type = 'click') AS click,
             count(*) FILTER (WHERE event_type = 'error') AS error,
             count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             count(*) FILTER (WHERE event_type = 'signup') AS signup,
             count(*) FILTER (WHERE event_type = 'view') AS view
      FROM events GROUP BY user_id ORDER BY user_id"""),
  )

  /** A16 — market-basket co-purchase lift: part pairs bought together
    * in one order, with support counts and lift (the "customers who
    * bought X also bought Y" analytic; reference domain: accessory /
    * service attach-rate mining on the deals feed).
    *
    * Scale shape: baskets are distinct (order, part) — one shuffle;
    * the pair stage is a SELF-JOIN ON THE ORDER KEY, so Spark reuses
    * one hash exchange for both sides and pair fan-out is bounded by
    * the per-order item count (≤ 7 in this lake), never all-pairs
    * across the catalog; per-part counts come back as broadcasts and
    * the order total as a 1-row broadcast. Lift is integer products
    * cast to DOUBLE with ONE correctly-rounded division — the exact
    * FP tree the oracle mirrors, so the hash compare is bit-level. */
  private val a16Basket = Q(
    "a16_copurchase_lift",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val totals = li.select(countDistinct("l_orderkey").as("n_orders"))
      val counts = li.groupBy("l_partkey").agg(count(lit(1)).as("n_item"))
      // the supported-pair table is the session-shared memo the graph
      // family also reads — identical distinct + self-join + count +
      // support filter, computed once (guide §2.4: don't recompute
      // what another operator already materialized)
      val pairs = copurchasePairs(s, dir)
        .select(col("x").as("part_a"), col("y").as("part_b"), col("n_ab"))
      pairs
        .join(broadcast(counts.select(col("l_partkey").as("part_a"),
          col("n_item").as("n_a"))), "part_a")
        .join(broadcast(counts.select(col("l_partkey").as("part_b"),
          col("n_item").as("n_b"))), "part_b")
        .crossJoin(broadcast(totals))
        .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
          ((col("n_ab") * col("n_orders")).cast("double") /
            (col("n_a") * col("n_b")).cast("double")).as("lift"))
        .orderBy("part_a", "part_b")
    },
    Some("""
      WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
      cnt AS (SELECT l_partkey, count(*) AS n_item FROM li GROUP BY 1),
      p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   count(*) AS n_ab
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT part_a, part_b,
             CAST(n_ab AS BIGINT) AS n_ab,
             CAST(ca.n_item AS BIGINT) AS n_a,
             CAST(cb.n_item AS BIGINT) AS n_b,
             CAST(n_ab * n_orders AS DOUBLE)
               / CAST(ca.n_item * cb.n_item AS DOUBLE) AS lift
      FROM p
      JOIN cnt ca ON part_a = ca.l_partkey
      JOIN cnt cb ON part_b = cb.l_partkey
      CROSS JOIN tot
      ORDER BY part_a, part_b"""),
  )

  /** GRAPH-2 — per-node triangle counting + local clustering
    * coefficient on the repeat-co-purchase graph (edges = part pairs
    * co-ordered ≥ 2 times, the same support valve as A16): the
    * community-structure signal behind bundle detection and
    * neighborhood-quality scoring, and the classic "can your engine do
    * graph analytics without a graph engine" test.
    *
    * Scale shape — DEGREE ORIENTATION: each undirected edge is
    * directed from its (degree, id)-smaller endpoint to the larger,
    * making the edge set a DAG whose out-degrees are O(√m); the wedge
    * self-join `u→v→w` then enumerates O(m^{3/2}) candidates TOTAL
    * (Σ out-deg², the Schank-Wagner bound) instead of Σ deg² — on a
    * power-law co-purchase graph the difference between a hot-hub
    * blow-up and a bounded join; closure is one more equi-join on the
    * oriented (u,w). Orientation totally orders any triangle, so each
    * is emitted exactly once — no /3 correction, no double counting.
    * Per-node counts are one explode + aggregate; everything exchanges
    * on node/edge keys, no window anywhere.
    *
    * Determinism: counts are exact longs; clustering = 2T/(d(d−1)) is
    * ONE correctly-rounded division of exact longs. */
  /** The co-purchase part graph's undirected edge list `(x, y)` with
    * x < y and support ≥ 2 — built ONCE per session via the
    * SharedFrames memo and shared by the entire iterative-graph
    * family (triangles, LPA, k-core, BFS). The distinct + self-join +
    * support filter is the dominant per-query cost of the family and
    * is textually identical in all four consumers, so at 100 TB the
    * graph materializes once and every algorithm times ITS OWN work
    * (measured: ~2-3 s per query of redundant edge builds at sf0.1
    * before the memo). Consumers must not unpersist it. */
  /** The supported co-purchase PAIR table `(x, y, n_ab)` with x < y
    * and support ≥ 2 — the expensive distinct + order-key self-join +
    * pair count, materialized once per session. [[copurchaseEdges]]
    * projects the graph's edge list off it, and `a16_copurchase_lift`
    * reads the support counts directly instead of re-running the
    * identical self-join (its third recomputation in the suite before
    * this memo). */
  private[graft] def copurchasePairs(
      s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    graft.SharedFrames.cached(s, s"copurchase_pairs:$dir") {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("x"), col("b.l_partkey").as("y"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 2)
    }

  /** NOT a second memo: the edge list is a trivial projection over the
    * [[copurchasePairs]] checkpoint leaf, and memoizing it separately
    * stored a SECOND full copy of every edge in non-evictable storage
    * for the session lifetime (r15 ADVICE finding; the duplicate copy
    * was also the round's leading suspect for squeezing execution
    * memory under `local[32]`). Consumers pay only the column prune. */
  private[graft] def copurchaseEdges(
      s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    copurchasePairs(s, dir).select("x", "y")

  private val graphTriangles = Q(
    "graph_copurchase_triangles",
    (s, dir) => {
      val edges = copurchaseEdges(s, dir)
      val deg = edges.select(col("x").as("node"))
        .unionByName(edges.select(col("y").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
      val fwd = col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y"))
      val e = edges
        .join(deg.select(col("node").as("x"), col("degree").as("dx")), "x")
        .join(deg.select(col("node").as("y"), col("degree").as("dy")), "y")
        .select(when(fwd, col("x")).otherwise(col("y")).as("u"),
          when(fwd, col("y")).otherwise(col("x")).as("v"))
      val tri = e.as("e1").join(e.as("e2"), col("e1.v") === col("e2.u"))
        .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
        .join(e.as("e3"),
          col("a") === col("e3.u") && col("c") === col("e3.v"))
        .select("a", "b", "c")
      val nodeTri = tri
        .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("triangles"))
      deg.join(nodeTri, Seq("node"), "left")
        .select(col("node").as("partkey"), col("degree"),
          coalesce(col("triangles"), lit(0L)).as("triangles"))
        .withColumn("clustering",
          when(col("degree") >= 2,
            (col("triangles") * 2).cast("double")
              / (col("degree") * (col("degree") - 1)).cast("double"))
            .otherwise(lit(0.0)))
        .orderBy("partkey")
    },
    Some("""
      WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      p AS (SELECT a.l_partkey AS x, b.l_partkey AS y
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS (SELECT node, count(*) AS degree FROM (
              SELECT x AS node FROM p UNION ALL SELECT y AS node FROM p) n
              GROUP BY 1),
      e AS (SELECT CASE WHEN dx.degree < dy.degree
                          OR (dx.degree = dy.degree AND x < y)
                        THEN x ELSE y END AS u,
                   CASE WHEN dx.degree < dy.degree
                          OR (dx.degree = dy.degree AND x < y)
                        THEN y ELSE x END AS v
            FROM p JOIN deg dx ON p.x = dx.node
                   JOIN deg dy ON p.y = dy.node),
      tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM e e1 JOIN e e2 ON e1.v = e2.u
                        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      nt AS (SELECT node, count(*) AS triangles FROM (
             SELECT a AS node FROM tri
             UNION ALL SELECT b AS node FROM tri
             UNION ALL SELECT c AS node FROM tri) x GROUP BY 1)
      SELECT deg.node AS partkey, deg.degree,
             coalesce(nt.triangles, CAST(0 AS BIGINT)) AS triangles,
             CASE WHEN deg.degree >= 2
                  THEN CAST(coalesce(nt.triangles, 0) * 2 AS DOUBLE)
                       / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
                  ELSE 0.0 END AS clustering
      FROM deg LEFT JOIN nt ON deg.node = nt.node
      ORDER BY partkey"""),
  )

  /** W5 — rolling time-RANGE window: trailing-7-day spend per customer
    * at each order (the "rolling revenue" metric every BI layer wants)
    * — a RANGE frame over day numbers, the one window frame shape the
    * rows-frame queries (W1-W4, prefix sums) can't express: peers at
    * the same day aggregate together regardless of tiebreak, so the
    * result is deterministic without a total order on the frame key.
    *
    * 100 TB design: one hash exchange on custkey; window groups are
    * per-customer order chains (tens of rows), never a stratum. Day
    * numbers are integer datediffs from epoch — identical arithmetic
    * both engines; the sum is decimal-exact before the double cast. */
  // ------------------------------------- new vs returning users
  /** A30 — the growth-accounting curve: per day, how many active
    * users are NEW (first ever appearance) vs RETURNING, plus the
    * cumulative registered-user count. The first chart on every
    * product dashboard, and the canonical first-touch attribution of
    * identity: `min(day) per user` is a map-side-collapsing aggregate,
    * never a window over the event stream.
    *
    * 100 TB design: two hash aggregates over events (per-(user, day)
    * activity, then per-user first day), a day-level join, and a
    * cumulative window over the DAY aggregate — ~365 metadata rows,
    * not a stratum. Counts are exact longs throughout. */
  private val a30NewReturning = Q(
    "a30_new_vs_returning",
    (s, dir) => {
      val act = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val first = act.groupBy("user_id").agg(min(col("day")).as("first_day"))
      val daily = act.join(first, Seq("user_id"))
        .groupBy("day")
        .agg(count(lit(1)).as("active_users"),
          sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
            .as("new_users"))
        .withColumn("returning_users", col("active_users") - col("new_users"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("cumulative_users", sum(col("new_users")).over(w))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("active_users"), col("new_users"), col("returning_users"),
          col("cumulative_users"))
        .orderBy("day")
    },
    Some("""
      WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      fst AS (SELECT user_id, min(day) AS first_day FROM act GROUP BY 1),
      d AS (SELECT a.day,
              CAST(count(*) AS BIGINT) AS active_users,
              CAST(sum(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
                AS new_users
            FROM act a JOIN fst f USING (user_id) GROUP BY a.day)
      SELECT strftime(day, '%Y-%m-%d') AS day, active_users, new_users,
             active_users - new_users AS returning_users,
             CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cumulative_users
      FROM d ORDER BY day"""),
  )

  // ------------------------------------- daily anomaly detection
  /** A29 — trailing-window anomaly flags on daily purchase revenue:
    * each day scored against the mean/σ of the PRECEDING 7 days
    * (current day excluded — an outlier must not vote on its own
    * baseline), |z| > 2 flags the day. The ops-monitoring primitive
    * behind every "metric moved" alert; the EWMA query (w8) smooths,
    * this one DECIDES.
    *
    * Exactness: daily revenue is an exact DECIMAL(18,2) sum; the
    * trailing moments are exact decimal window sums of x and x² with
    * one double conversion at the end (the a17 discipline applied to
    * a window frame), so z is bit-identical cross-engine. The
    * day-level window runs over an AGGREGATE output — a year is ~365
    * rows of metadata, not a corpus stratum. */
  private val a29Anomalies = Q(
    "a29_daily_anomalies",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("rev"))
      val w = Window.orderBy("day").rowsBetween(-7, -1)
      def toD(c: Column) = c.cast("string").cast("double")
      val framed = daily
        .withColumn("s7", sum(col("rev")).over(w))
        .withColumn("q7", sum(col("rev") * col("rev")).over(w))
        .withColumn("n7", count(lit(1)).over(w))
        .filter(col("n7") === 7)
      val n = col("n7").cast("double")
      val mean = toD(col("s7")) / n
      val sd = sqrt((toD(col("q7")) - toD(col("s7")) * toD(col("s7")) / n) / n)
      val z = (toD(col("rev")) - mean) / nullif(sd, lit(0.0))
      framed.select(
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          toD(col("rev")).as("revenue"),
          round(mean, 6).as("mean7"),
          round(sd, 6).as("sd7"),
          round(z, 6).as("z_score"),
          (abs(z) > 2.0).as("is_anomaly"))
        .orderBy("day")
    },
    Some("""
      WITH d AS (SELECT CAST(ts AS DATE) AS day,
                        sum(CAST(value AS DECIMAL(18,2))) AS rev
                 FROM events WHERE event_type = 'purchase' GROUP BY 1),
      f AS (SELECT day, rev,
              sum(rev) OVER w AS s7,
              sum(rev * rev) OVER w AS q7,
              count(*) OVER w AS n7
            FROM d WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      g AS (SELECT strftime(day, '%Y-%m-%d') AS day,
              CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
              CAST(CAST(s7 AS VARCHAR) AS DOUBLE) AS s7d,
              CAST(CAST(q7 AS VARCHAR) AS DOUBLE) AS q7d,
              CAST(n7 AS DOUBLE) AS n
            FROM f WHERE n7 = 7)
      SELECT day, revenue,
             round(s7d / n, 6) AS mean7,
             round(sqrt((q7d - s7d * s7d / n) / n), 6) AS sd7,
             round((revenue - s7d / n)
                   / nullif(sqrt((q7d - s7d * s7d / n) / n), 0.0), 6) AS z_score,
             abs((revenue - s7d / n)
                 / nullif(sqrt((q7d - s7d * s7d / n) / n), 0.0)) > 2.0 AS is_anomaly
      FROM g ORDER BY day"""),
  )

  // ------------------------------- label-propagation communities
  /** Synchronous label propagation over the co-purchase graph —
    * community DETECTION beside the triangle query's local clustering
    * and PageRank's centrality: parts that sell together cluster into
    * merchandising groups. Rounds, tie-breaking, checkpoint hygiene and
    * the r12 cost-gated driver-side solve live in
    * [[graft.operators.Lpa]]; the argmax spelling (max-count then
    * min-label-at-max) is chosen over a packed struct max because it
    * means the same thing in ANY engine — which is what the
    * differential proves. */
  private val graphLpa = Q(
    "graph_lpa_communities",
    (s, dir) => {
      val labels = graft.operators.Lpa.run(copurchaseEdges(s, dir), "x", "y", 4)
      // whole-partition window count: one shuffle on lbl, one pass over
      // the labels (groupBy + join-back shuffles them twice)
      val out = labels
        .withColumn("community_size", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("lbl")))
        .select(col("node").as("partkey"), col("lbl").as("community"),
          col("community_size"))
        .orderBy("partkey")
        .persist()
      out.count() // materialize before releasing the label frame
      labels.unpersist()
      out
    },
    Some {
      val rounds = (1 to 4).map { k =>
        s"""c$k AS (SELECT e.node, l.lbl AS nl, count(*) AS cnt
               FROM eb e JOIN l${k - 1} l ON e.nbr = l.node GROUP BY 1, 2),
      m$k AS (SELECT node, max(cnt) AS mc FROM c$k GROUP BY 1),
      l$k AS MATERIALIZED (SELECT c.node, min(c.nl) AS lbl
               FROM c$k c JOIN m$k m ON c.node = m.node AND c.cnt = m.mc
               GROUP BY 1)"""
      }.mkString(",\n      ")
      s"""
      WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      ed AS (SELECT a.l_partkey AS x, b.l_partkey AS y
             FROM li a JOIN li b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 2),
      eb AS MATERIALIZED (SELECT x AS nbr, y AS node FROM ed
                          UNION ALL SELECT y AS nbr, x AS node FROM ed),
      l0 AS MATERIALIZED (SELECT DISTINCT node, node AS lbl FROM eb),
      $rounds,
      sz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS community_size
             FROM l4 GROUP BY 1)
      SELECT l.node AS partkey, l.lbl AS community, sz.community_size
      FROM l4 l JOIN sz USING (lbl) ORDER BY partkey"""
    },
  )

  private val w5Rolling = Q(
    "w5_rolling_7d_spend",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"), lit("1970-01-01").cast("date")).as("day"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
      val w = Window.partitionBy("o_custkey").orderBy(col("day"))
        .rangeBetween(-6, 0)
      o.select(col("o_custkey"), col("o_orderkey"),
          col("day").cast("long").as("day"),
          sum(col("price")).over(w).cast("double").as("spend_7d"),
          count(lit(1)).over(w).as("orders_7d"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_7d,
             CAST(count(*) OVER w AS BIGINT) AS orders_7d
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""),
  )

  /** J12 — FULL OUTER reconciliation: the CRM extract (BUILDING
    * segment) against the orders feed — matched customers, CRM rows
    * with no orders, and order activity outside the extract, in ONE
    * pass with presence flags (the reconciliation report shape of
    * every two-system migration). The aggregate side collapses
    * map-side before the join; the join key is the high-cardinality
    * custkey, so the full-outer SMJ shuffles both sides once. */
  private val j12Reconcile = Q(
    "j12_full_outer_reconcile",
    (s, dir) => {
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_acctbal").cast("double").as("acctbal"))
      val o = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), sumd(col("o_totalprice")).as("spend"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_custkey").isNotNull.as("in_crm"),
          col("o_custkey").isNotNull.as("has_orders"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("spend"), lit(0.0)).as("spend"),
          col("acctbal"))
        .orderBy("custkey")
    },
    Some("""
      WITH c AS (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal
                 FROM customer WHERE c_mktsegment = 'BUILDING'),
      o AS (SELECT o_custkey, count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
            FROM orders GROUP BY o_custkey)
      SELECT coalesce(c_custkey, o_custkey) AS custkey,
             c_custkey IS NOT NULL AS in_crm,
             o_custkey IS NOT NULL AS has_orders,
             coalesce(n_orders, 0) AS n_orders,
             coalesce(spend, 0.0) AS spend,
             acctbal
      FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
      ORDER BY custkey"""),
  )

  /** W6 — calendar-spine gap filling with forward-fill: one row per
    * customer per MONTH between their first and last order (inactive
    * months included at zero), with the last known monthly spend
    * carried forward (`last(…, ignoreNulls)` over the running frame) —
    * the time-series densification every retention/LTV model needs,
    * and the IGNORE NULLS window surface nothing else here exercises.
    *
    * 100 TB design: the spine explodes per-customer month ranges
    * in-place (narrow fan-out of a metadata-sized span frame, no
    * cross join against a calendar table); the fill window is one
    * custkey exchange over per-customer chains — never a stratum. */
  private val w6GapFill = Q(
    "w6_month_spine_fill",
    (s, dir) => {
      val b = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val om = Tables.orders(s, dir)
        .join(b, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_custkey"), date_trunc("month", col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n_orders"), sumd(col("o_totalprice")).as("month_spend"))
      val spine = om.groupBy("o_custkey")
        .agg(min("m").as("lo"), max("m").as("hi"))
        .select(col("o_custkey"),
          explode(expr("sequence(lo, hi, interval 1 month)")).as("m"))
      val w = Window.partitionBy("o_custkey").orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(om, Seq("o_custkey", "m"), "left")
        .select(col("o_custkey"),
          date_format(col("m"), "yyyy-MM").as("month"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("month_spend"), lit(0.0)).as("month_spend"),
          last(col("month_spend"), ignoreNulls = true).over(w).as("latest_spend"))
        .orderBy("o_custkey", "month")
    },
    Some("""
      WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      om AS (SELECT o_custkey, date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
                    count(*) AS n_orders,
                    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_spend
             FROM orders JOIN b ON o_custkey = c_custkey
             GROUP BY 1, 2),
      span AS (SELECT o_custkey, min(m) AS lo, max(m) AS hi FROM om GROUP BY 1),
      spine AS (SELECT o_custkey, unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS m
                FROM span)
      SELECT s.o_custkey,
             strftime(s.m, '%Y-%m') AS month,
             coalesce(om.n_orders, 0) AS n_orders,
             coalesce(om.month_spend, 0.0) AS month_spend,
             last_value(om.month_spend IGNORE NULLS) OVER (
               PARTITION BY s.o_custkey ORDER BY s.m
               ROWS UNBOUNDED PRECEDING) AS latest_spend
      FROM spine s LEFT JOIN om ON s.o_custkey = om.o_custkey AND s.m = om.m
      ORDER BY s.o_custkey, month"""),
  )

  /** A17 — distribution statistics (stddev, correlation) that the hash
    * gate can actually check: the built-in `stddev`/`corr` are
    * single-pass Welford updates whose float result depends on
    * partition merge order — unreproducible across engines (or even
    * runs). Here the MOMENTS are exact DECIMAL sums (associative, so
    * shuffle order is irrelevant), and the closed-form formulas run in
    * DOUBLE on the final one-row-per-group values with an expression
    * tree the oracle mirrors operation for operation — deterministic
    * to the last bit. Same partial-agg shuffle shape as A1; the
    * quantity/price moment columns ride one scan. */
  private val a17Stats = Q(
    "a17_group_stats",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select(
        col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("decimal(18,2)").as("q"),
        col("l_extendedprice").cast("decimal(18,2)").as("p"))
      val agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        count(lit(1)).as("n"),
        sum(col("q")).as("sq"), sum(col("p")).as("sp"),
        sum(col("q") * col("q")).as("sqq"),
        sum(col("q") * col("p")).as("sqp"),
        sum(col("p") * col("p")).as("spp"))
      val nd = col("n").cast("double")
      def d(c: String) = col(c).cast("double")
      val varQ = nd * d("sqq") - d("sq") * d("sq")
      val varP = nd * d("spp") - d("sp") * d("sp")
      agg.select(col("l_returnflag"), col("l_linestatus"), col("n"),
          (d("sq") / nd).as("avg_qty"),
          sqrt(varQ / (nd * (nd - 1))).as("std_qty"),
          ((nd * d("sqp") - d("sq") * d("sp")) / (sqrt(varQ) * sqrt(varP)))
            .as("corr_qty_price"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               sum(q) AS sq, sum(p) AS sp,
               sum(q * q) AS sqq, sum(q * p) AS sqp, sum(p * p) AS spp
        FROM (SELECT l_returnflag, l_linestatus,
                     CAST(l_quantity AS DECIMAL(18,2)) AS q,
                     CAST(l_extendedprice AS DECIMAL(18,2)) AS p
              FROM lineitem) t
        GROUP BY 1, 2),
      -- DECIMAL→DOUBLE through VARCHAR: DuckDB's direct decimal cast
      -- double-rounds (int128 → double, then /10^scale) and can land
      -- one ulp off the correctly-rounded value Spark's BigDecimal
      -- conversion produces; strtod is correctly rounded.
      d AS (SELECT l_returnflag, l_linestatus, n,
                   CAST(CAST(sq AS VARCHAR) AS DOUBLE) AS sqd,
                   CAST(CAST(sp AS VARCHAR) AS DOUBLE) AS spd,
                   CAST(CAST(sqq AS VARCHAR) AS DOUBLE) AS sqqd,
                   CAST(CAST(sqp AS VARCHAR) AS DOUBLE) AS sqpd,
                   CAST(CAST(spp AS VARCHAR) AS DOUBLE) AS sppd,
                   CAST(n AS DOUBLE) AS nd
            FROM m)
      SELECT l_returnflag, l_linestatus, n,
             sqd / nd AS avg_qty,
             sqrt((nd * sqqd - sqd * sqd) / (nd * (nd - 1))) AS std_qty,
             (nd * sqpd - sqd * spd)
               / (sqrt(nd * sqqd - sqd * sqd)
                  * sqrt(nd * sppd - spd * spd)) AS corr_qty_price
      FROM d ORDER BY l_returnflag, l_linestatus"""),
  )

  /** W7 — inter-purchase gap statistics: `lag` the previous order date
    * per customer, diff in days, then per-customer count/avg/max of the
    * gaps — the purchase-cadence signal behind every churn model (days
    * since last order vs the customer's OWN typical gap), and the only
    * place the engine exercises the `lag` offset-window surface.
    *
    * 100 TB design: one custkey exchange feeds BOTH the lag window and
    * the per-customer aggregate (the agg rides the window's hash
    * partitioning — no second shuffle); per-customer chains are tens of
    * rows, never a stratum. Exact arithmetic: gaps are integer days,
    * the average is ONE correctly-rounded division of exact longs. */
  private val w7Gaps = Q(
    "w7_order_gaps",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .select(col("o_custkey"),
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
            .cast("long").as("gap"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), count(col("gap")).as("n_gaps"),
          sum(col("gap")).as("sum_gap"), max(col("gap")).as("max_gap_days"))
        .filter(col("n_gaps") > 0)
        .select(col("o_custkey"), col("n_orders"), col("n_gaps"),
          (col("sum_gap").cast("double") / col("n_gaps").cast("double"))
            .as("avg_gap_days"),
          col("max_gap_days"))
        .orderBy("o_custkey")
    },
    Some("""
      WITH g AS (
        SELECT o_custkey,
               date_diff('day',
                 lag(CAST(o_orderdate AS DATE)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                 CAST(o_orderdate AS DATE)) AS gap
        FROM orders)
      SELECT o_custkey, count(*) AS n_orders, count(gap) AS n_gaps,
             CAST(sum(gap) AS DOUBLE) / CAST(count(gap) AS DOUBLE) AS avg_gap_days,
             max(gap) AS max_gap_days
      FROM g GROUP BY 1 HAVING count(gap) > 0 ORDER BY o_custkey"""),
  )

  /** W8 — trailing exponentially-decayed monthly spend (half-life 1
    * observation, 16-term horizon): each customer-month's score is
    * Σ_{i=0..15} cents_{t-i}·2^{-i} — the recency-weighted LTV signal a
    * plain trailing average flattens.
    *
    * Bit-exactness by construction (the reason this is hash-checkable
    * at all): weights are powers of two, so every term cents·2^{-i} is
    * an EXACT double (mantissa unchanged, exponent shifted), and the
    * 16-term sum spans ≤ 31+4+15 < 53 mantissa bits — exact regardless
    * of association order. The oracle mirrors the identical 16-term
    * expression; both engines fold left. A general α would NOT replay
    * (pow is not correctly rounded cross-engine) — α=1/2 is the
    * deliberately chosen reproducible point, same trick as the
    * temperature-mix α=0.5.
    *
    * 100 TB design: monthly pre-aggregation collapses map-side before
    * its (custkey, month) shuffle; the 16 lags are ONE window pass on
    * the custkey exchange (per-customer chains, never a stratum). */
  private val w8Ewma = {
    // 2^-i as exact decimal literals, shared by both expression trees.
    val halfPow: Int => java.math.BigDecimal =
      i => new java.math.BigDecimal(0.5).pow(i)
    Q(
      "w8_ewma_spend",
      (s, dir) => {
        val om = Tables.orders(s, dir)
          .groupBy(col("o_custkey"), date_trunc("month", col("o_orderdate")).as("m"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long").as("cents"))
        val w = Window.partitionBy("o_custkey").orderBy("m")
        val terms = (0 until 16).map { i =>
          val c = if (i == 0) col("cents")
                  else coalesce(lag(col("cents"), i).over(w), lit(0L))
          c.cast("double") * lit(halfPow(i).doubleValue)
        }
        om.select(col("o_custkey"), date_format(col("m"), "yyyy-MM").as("month"),
            (col("cents").cast("double") / lit(100.0)).as("month_spend"),
            (terms.reduce(_ + _) / lit(100.0)).as("ewma_spend"))
          .orderBy("o_custkey", "month")
      },
      Some {
        val terms = (0 until 16).map { i =>
          val c = if (i == 0) "cents"
                  else s"coalesce(lag(cents, $i) OVER w, 0)"
          s"CAST($c AS DOUBLE) * ${halfPow(i).toPlainString}"
        }
        s"""
        WITH om AS (
          SELECT o_custkey, date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
          FROM orders GROUP BY 1, 2)
        SELECT o_custkey, strftime(m, '%Y-%m') AS month,
               CAST(cents AS DOUBLE) / 100.0 AS month_spend,
               (${terms.mkString("\n                + ")}) / 100.0 AS ewma_spend
        FROM om
        WINDOW w AS (PARTITION BY o_custkey ORDER BY m)
        ORDER BY o_custkey, month"""
      },
    )
  }

  /** W13 — trend-aware smoothing and one-step forecast (Brown's double
    * exponential smoothing): w8's EWMA tracks LEVEL but lags any
    * trending series by construction; smoothing the smoothed series a
    * second time measures that lag, and level = 2S′−S″, trend = S′−S″
    * (α/(1−α) = 1 at α = ½), forecast = level + trend — the classic
    * "where is next month heading" primitive a demand planner runs per
    * customer, and the forecasting member of the time-series family
    * (w8 smooths, a29 detects, this projects).
    *
    * Exactness (w8's power-of-two doctrine, extended one level): the
    * first 16-term smoothing is exact (cents·2⁻ⁱ shifts the exponent,
    * the sum spans < 53 mantissa bits) and then FLOORS to integer
    * cents — the deliberate contract that keeps the SECOND smoothing's
    * terms (s1·2⁻ⁱ, ≤ 27+15 bits) and sum exact as well; without the
    * floor the stacked sum needs ~57 mantissa bits and the last bits
    * would be association-order noise. Level/trend/forecast are then
    * sums of exact doubles — emitted through ONE trailing /100.0 (a
    * single IEEE op both engines round identically), deliberately NOT
    * re-rounded: a decimal round() after the division turns exact
    * half-cent values into cross-engine tie-break noise (observed:
    * ±0.01 on a .675 boundary), and the oracle mirrors Spark's
    * (level + trend) association for the forecast for the same
    * reason.
    *
    * 100 TB design: monthly pre-aggregation collapses map-side; BOTH
    * window passes (cents lags, then s1 lags) ride the SAME
    * (custkey × month) sort order on ONE custkey exchange — stacking
    * the window adds zero shuffles (pinned by the exchange ceiling);
    * per-customer chains, never a stratum. */
  private val w13Holt = {
    val halfPow: Int => java.math.BigDecimal =
      i => new java.math.BigDecimal(0.5).pow(i)
    Q(
      "w13_holt_trend",
      (s, dir) => {
        val om = Tables.orders(s, dir)
          .groupBy(col("o_custkey"), date_trunc("month", col("o_orderdate")).as("m"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long").as("cents"))
        val w = Window.partitionBy("o_custkey").orderBy("m")
        def smooth(src: org.apache.spark.sql.Column,
            lagged: Int => org.apache.spark.sql.Column) =
          (0 until 16).map { i =>
            val c = if (i == 0) src else coalesce(lagged(i), lit(0L))
            c.cast("double") * lit(halfPow(i).doubleValue)
          }.reduce(_ + _)
        val s1 = om.withColumn("s1",
          floor(smooth(col("cents"), i => lag(col("cents"), i).over(w)))
            .cast("long"))
        val s2 = s1.withColumn("s2",
          smooth(col("s1"), i => lag(col("s1"), i).over(w)))
        val level = col("s1").cast("double") * 2.0 - col("s2")
        val trend = col("s1").cast("double") - col("s2")
        s2.select(col("o_custkey"), date_format(col("m"), "yyyy-MM").as("month"),
            (col("cents").cast("double") / 100.0).as("month_spend"),
            (level / 100.0).as("level"),
            (trend / 100.0).as("trend"),
            ((level + trend) / 100.0).as("forecast_next"))
          .orderBy("o_custkey", "month")
      },
      Some {
        def terms(src: String) = (0 until 16).map { i =>
          val c = if (i == 0) src else s"coalesce(lag($src, $i) OVER w, 0)"
          s"CAST($c AS DOUBLE) * ${halfPow(i).toPlainString}"
        }.mkString("\n                + ")
        s"""
        WITH om AS (
          SELECT o_custkey, date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
          FROM orders GROUP BY 1, 2),
        sm1 AS (
          SELECT o_custkey, m, cents,
                 CAST(floor(${terms("cents")}) AS BIGINT) AS s1
          FROM om
          WINDOW w AS (PARTITION BY o_custkey ORDER BY m)),
        sm2 AS (
          SELECT o_custkey, m, cents, s1,
                 (${terms("s1")}) AS s2
          FROM sm1
          WINDOW w AS (PARTITION BY o_custkey ORDER BY m))
        SELECT o_custkey, strftime(m, '%Y-%m') AS month,
               CAST(cents AS DOUBLE) / 100.0 AS month_spend,
               (CAST(s1 AS DOUBLE) * 2.0 - s2) / 100.0 AS level,
               (CAST(s1 AS DOUBLE) - s2) / 100.0 AS trend,
               ((CAST(s1 AS DOUBLE) * 2.0 - s2) + (CAST(s1 AS DOUBLE) - s2)) / 100.0 AS forecast_next
        FROM sm2
        ORDER BY o_custkey, month"""
      },
    )
  }

  /** A18 — HyperLogLog approximate distinct counts
    * ([[graft.operators.HllSketch]]): per event type, the approximate
    * distinct-user count (raw-estimate branch) and distinct-active-day
    * count (small enough for the linear-counting branch) next to the
    * exact `COUNT(DISTINCT …)` and the signed estimation error.
    *
    * Why a sketch when A6/A8 already do exact distincts: at 100 TB a
    * high-cardinality `COUNT(DISTINCT)` shuffles every distinct key —
    * the single most expensive aggregate in a warehouse. The register
    * sketch's exchange carries ≤ groups × 64 `(register, rho)` rows of
    * metadata instead, and registers are mergeable (element-wise max)
    * so daily partial sketches roll up without rescanning history —
    * the operator doc and `HllSketchSpec` pin that algebra. Unlike
    * Spark's built-in `approx_count_distinct` (opaque binary buffer),
    * the registers are plain rows an independent engine can replay:
    * the oracle rebuilds the identical md5-bridge hash, rho, exact
    * power-of-two harmonic sum and one-division estimate in DuckDB and
    * matches to the bit. The exact side rides the SAME keyed frame, so
    * the reported `err` is self-auditing. */
  // ------------------------------- A31: ratio-to-report (Q11 shape)
  /** A31 — TPC-H Q11's correlated shape: keep the parts whose revenue
    * exceeds a FRACTION of the corpus-wide total — 0.05%, just above
    * the mean share of this lake's ~2000 parts, so both the kept and
    * dropped sides are populated (the "important stock" /
    * ratio-to-report pattern — a per-group aggregate judged
    * against a scalar over the WHOLE table). The textbook phrasing
    * puts the total in a correlated scalar subquery re-evaluated per
    * row; here it decorrelates into one extra 1-row aggregate that
    * BROADCASTS against the per-part rollup — the fact table is
    * scanned once and shuffles once, and the threshold comparison is
    * a compiled filter.
    *
    * Exactness: revenue is the exact-decimal Σ price·(1−disc) (the
    * j13 formula); the threshold comparison runs on DECIMAL
    * (`2000·rev > total`, integer-scaled), so no float boundary part
    * exists. */
  private val a31RevShare = Q(
    "a31_part_revenue_share",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_partkey"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
            .as("rev"))
      val perPart = li.groupBy("l_partkey").agg(sum(col("rev")).as("part_rev"))
      val total = perPart.agg(sum(col("part_rev")).as("total_rev"))
      perPart.crossJoin(broadcast(total))
        .filter(col("part_rev") * 2000 > col("total_rev"))
        .select(col("l_partkey"),
          col("part_rev").cast("double").as("part_revenue"),
          round(col("part_rev").cast("double")
            / col("total_rev").cast("double"), 8).as("revenue_share"))
        .orderBy(col("part_revenue").desc, col("l_partkey"))
    },
    Some("""
      WITH li AS (SELECT l_partkey,
                    CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS rev
                  FROM lineitem),
      pp AS (SELECT l_partkey, sum(rev) AS part_rev FROM li GROUP BY 1),
      tt AS (SELECT sum(part_rev) AS total_rev FROM pp)
      SELECT p.l_partkey,
             CAST(CAST(p.part_rev AS VARCHAR) AS DOUBLE) AS part_revenue,
             round(CAST(CAST(p.part_rev AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(t.total_rev AS VARCHAR) AS DOUBLE), 8) AS revenue_share
      FROM pp p, tt t
      WHERE p.part_rev * 2000 > t.total_rev
      ORDER BY part_revenue DESC, p.l_partkey"""),
  )

  // --------------------------- J20: nearest-event (bidirectional as-of)
  /** J20 — the NEAREST-event temporal join: for every purchase, the
    * closest click by the same user in EITHER direction (j10's as-of
    * join looks strictly backward — correct for "state at time T",
    * wrong for "which interaction belongs to this purchase" when the
    * click lands seconds after the order event; sensor alignment has
    * the same shape). Spelled as the union-tag trick run BOTH ways in
    * one pass: one sorted window per user carries last-click-before
    * via `last(ignoreNulls)` over the preceding frame and
    * first-click-after via `first(ignoreNulls)` over the following
    * frame, then a compiled three-way CASE picks the smaller gap.
    *
    * 100 TB design: ONE shuffle on user_id, windows over per-user
    * event chains (bounded), zero self-joins — the naive spelling is
    * two range joins; this is neither. */
  private val j20Nearest = Q(
    "j20_nearest_click",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts"), unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val clickUs = when(col("event_type") === "click", col("us"))
      val tagged = ev
        .withColumn("prev_click_us", last(clickUs, ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("next_click_us", first(clickUs, ignoreNulls = true)
          .over(w.rowsBetween(1, Window.unboundedFollowing)))
        .filter(col("event_type") === "purchase")
      val dPrev = col("us") - col("prev_click_us")
      val dNext = col("next_click_us") - col("us")
      val dir3 = when(col("prev_click_us").isNull && col("next_click_us").isNull,
          lit(null).cast("string"))
        .when(col("next_click_us").isNull, lit("before"))
        .when(col("prev_click_us").isNull, lit("after"))
        .when(dPrev <= dNext, lit("before"))
        .otherwise(lit("after"))
      tagged.select(col("event_id").as("purchase_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_at"),
          dir3.as("nearest_direction"),
          when(dir3 === "before", dPrev).when(dir3 === "after", dNext)
            .as("gap_us"))
        .orderBy("purchase_id")
    },
    Some("""
      WITH ev AS (SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us
                  FROM events WHERE event_type IN ('click', 'purchase')),
      t AS (SELECT *,
              last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_us,
              first_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY us, event_id
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_click_us
            FROM ev),
      p AS (SELECT *, us - prev_click_us AS d_prev, next_click_us - us AS d_next,
              CASE WHEN prev_click_us IS NULL AND next_click_us IS NULL THEN NULL
                   WHEN next_click_us IS NULL THEN 'before'
                   WHEN prev_click_us IS NULL THEN 'after'
                   WHEN us - prev_click_us <= next_click_us - us THEN 'before'
                   ELSE 'after' END AS nearest_direction
            FROM t WHERE event_type = 'purchase')
      SELECT event_id AS purchase_id, user_id,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_at,
             nearest_direction,
             CAST(CASE WHEN nearest_direction = 'before' THEN d_prev
                       WHEN nearest_direction = 'after' THEN d_next END AS BIGINT) AS gap_us
      FROM p ORDER BY purchase_id"""),
  )

  // ----------------------------- A32: conversion latency quantiles
  /** A32 — time-to-convert distribution: per user, the gap from first
    * click to the first purchase AFTER it, summarized as exact
    * p50/p90 quantiles (the funnel counts of a11 say HOW MANY convert;
    * this says HOW LONG conversion takes — the metric that prices
    * retargeting windows). Users who never purchase after their first
    * click drop out via the inner join + filter, so the distribution
    * is over genuine converters only.
    *
    * 100 TB design: first-click and first-purchase-after are two
    * map-side-collapsing per-user aggregates over one event scan; the
    * quantiles ride [[graft.operators.ExactQuantiles]]' rank
    * arithmetic (O(1) task memory, no global sort); latencies are
    * exact integer seconds, interpolation is the engine's pinned
    * formula replayed verbatim by the oracle. */
  private val a32ConvLatency = Q(
    "a32_conversion_latency",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val firstClick = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min(col("ts")).as("first_click"))
      val lat = ev.filter(col("event_type") === "purchase")
        .join(firstClick, Seq("user_id"))
        .filter(col("ts") >= col("first_click"))
        .groupBy("user_id", "first_click")
        .agg(min(col("ts")).as("first_purchase"))
        .select(col("user_id"),
          // floor of a double division is exact here: the quotient is
          // ≥ 1e-6 away from any integer it doesn't equal, ulp ~1e-10
          floor((unix_micros(col("first_purchase")) - unix_micros(col("first_click")))
            .cast("double") / 1000000.0).cast("long").as("latency_sec"))
        .withColumn("corpus", lit("all"))
      graft.operators.ExactQuantiles.perGroup(
          lat, Seq("corpus"), "latency_sec",
          Seq(0.5 -> "p50_sec", 0.9 -> "p90_sec"))
        .withColumnRenamed("n_latency_sec", "n_converters")
    },
    Some("""
      WITH fc AS (SELECT user_id, min(ts) AS first_click
                  FROM events WHERE event_type = 'click' GROUP BY 1),
      lat AS (SELECT e.user_id,
                CAST(floor(CAST(epoch_us(min(e.ts)) - epoch_us(fc.first_click) AS DOUBLE)
                           / 1000000.0) AS BIGINT) AS latency_sec
              FROM events e JOIN fc USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts >= fc.first_click
              GROUP BY e.user_id, fc.first_click),
      v AS (SELECT 'all' AS corpus, CAST(latency_sec AS DOUBLE) AS val FROM lat),
      r AS (SELECT corpus, val,
                   CAST(row_number() OVER (PARTITION BY corpus ORDER BY val) - 1
                        AS BIGINT) AS rn,
                   CAST(count(*) OVER (PARTITION BY corpus) AS BIGINT) AS n
            FROM v)
      SELECT corpus, max(n) AS n_converters,
             round(sum(CASE WHEN rn = CAST(floor((n-1) * 0.5) AS BIGINT)
                              THEN val * (1.0 - ((n-1) * 0.5 - floor((n-1) * 0.5)))
                            WHEN rn = CAST(floor((n-1) * 0.5) AS BIGINT) + 1
                                 AND (n-1) * 0.5 - floor((n-1) * 0.5) > 0
                              THEN val * ((n-1) * 0.5 - floor((n-1) * 0.5))
                            ELSE 0.0 END), 4) AS p50_sec,
             round(sum(CASE WHEN rn = CAST(floor((n-1) * 0.9) AS BIGINT)
                              THEN val * (1.0 - ((n-1) * 0.9 - floor((n-1) * 0.9)))
                            WHEN rn = CAST(floor((n-1) * 0.9) AS BIGINT) + 1
                                 AND (n-1) * 0.9 - floor((n-1) * 0.9) > 0
                              THEN val * ((n-1) * 0.9 - floor((n-1) * 0.9))
                            ELSE 0.0 END), 4) AS p90_sec
      FROM r GROUP BY corpus"""),
  )

  // ---------------------------------- W9: last-observation carry-forward
  /** W9 — LOCF gap fill: each user's last observed event value carried
    * forward across a dense daily spine (the sensor/finance standard
    * for "what was the balance ON day X" when observations are
    * sparse; w6 fills gaps with zeros — absence of activity — this
    * fills with the LAST KNOWN state, a different semantic). Days
    * before a user's first observation stay NULL — LOCF must not
    * invent history.
    *
    * 100 TB design: per-(user, day) latest observation is the Dedup
    * operator (one shuffle, latest-wins); the ~30-row day spine
    * broadcasts against the user list; the carry-forward window
    * (`last(... ignoreNulls)` over user/day order) partitions per
    * USER over day-spine-sized groups — bounded, never a stratum. */
  private val w9Locf = Q(
    "w9_locf_value",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("ts"), col("event_id"), col("value"))
      val dailyLast = Dedup.latestByKey(ev, Seq("user_id", "day"),
          Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("day"), col("value").as("observed"))
      val days = ev.select("day").distinct()
      val users = ev.select("user_id").distinct()
      val spine = users.crossJoin(broadcast(days))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(dailyLast, Seq("user_id", "day"), "left")
        .withColumn("locf_value", last(col("observed"), ignoreNulls = true).over(w))
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("observed").isNotNull.as("is_observed"),
          col("locf_value"))
        .orderBy("user_id", "day")
    },
    Some("""
      WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, value
                  FROM events),
      daily AS (SELECT user_id, day, value AS observed FROM (
                  SELECT user_id, day, value,
                         row_number() OVER (PARTITION BY user_id, day
                           ORDER BY ts DESC, event_id DESC) AS rn
                  FROM ev) t WHERE rn = 1),
      spine AS (SELECT u.user_id, d.day
                FROM (SELECT DISTINCT user_id FROM ev) u,
                     (SELECT DISTINCT day FROM ev) d)
      SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
             dl.observed IS NOT NULL AS is_observed,
             last_value(dl.observed IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
      FROM spine s LEFT JOIN daily dl
        ON s.user_id = dl.user_id AND s.day = dl.day
      ORDER BY s.user_id, day"""),
  )

  // ----------------------- join-size estimation (CMS inner product)
  /** Join-cardinality estimation by sketch inner product (AMS/CMS,
    * Alon-Matias-Szegedy): |A ⋈_k B| = Σ_k a_k·b_k, estimated as
    * min_d Σ_idx cmsA[d]·cmsB[d] from count-min sketches of each
    * side — here the CO-PURCHASE SELF-JOIN on l_partkey, the exact
    * question the triangle/LPA queries' planner faces (self-join
    * size Σc² decides broadcast vs shuffle vs salt) answered WITHOUT
    * scanning a second time: the sketches are mergeable streamed
    * state, like the HLL registers. The exact Σc² rides along as the
    * self-auditing twin — inner-product estimates inflate by
    * ~(Σc)²/width, so the report carries its own error ratio.
    *
    * One scan builds depth×width cells map-side; the inner product
    * and the exact twin are metadata aggregates. Width 4096 (vs the
    * frequency demo's 16): inner products square the collision term,
    * needing the wider table — exactly the sizing lesson the ratio
    * column teaches.
    *
    * The four depth rows share ONE md5 per key, sliced into four
    * disjoint 8-hex (32-bit) chunks — md5 dominated the scan-side cost
    * when each depth hashed separately (r12: 3.0→~1.5 s at sf0.1), and
    * disjoint chunks of one digest are exactly as pairwise-independent
    * as CMS needs. 32 bits per chunk caps the usable width at 2^32 —
    * far above any sane sketch width. */
  private val JsWidth = 4096L
  private val statsJoinSize = Q(
    "stats_join_size_estimate",
    (s, dir) => {
      val depth = CurationQueries.CmsDepth // 4 × 8 hex chars = one digest
      def idx(d: Int, h: Column): Column = pmod(
        conv(substring(h, 1 + 8 * d, 8), 16, 10).cast("long"), lit(JsWidth))
      val keys = Tables.lineitem(s, dir)
        .select(col("l_partkey").cast("string").as("k"))
      val cells = keys
        .withColumn("h", md5(col("k")))
        .select(explode(array((0 until depth).map(d =>
          struct(lit(d.toLong).as("d"), idx(d, col("h")).as("idx"))): _*)).as("c"))
        .groupBy(col("c.d").as("d"), col("c.idx").as("idx"))
        .agg(count(lit(1)).as("cnt"))
      val est = cells.groupBy("d")
        .agg(sum(col("cnt") * col("cnt")).as("ip"))
        .agg(min(col("ip")).as("cms_estimate"))
      val exact = keys.groupBy("k").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("exact_pairs"))
      exact.crossJoin(broadcast(est))
        .select(lit("lineitem self-join on l_partkey").as("join_key"),
          col("exact_pairs"), col("cms_estimate"),
          round(col("cms_estimate").cast("double")
            / col("exact_pairs").cast("double"), 4).as("inflation"))
    },
    Some(s"""
      WITH keys AS (SELECT CAST(l_partkey AS VARCHAR) AS k, md5(CAST(l_partkey AS VARCHAR)) AS h
                    FROM lineitem),
      cells AS (SELECT d.d AS d,
                  CAST(concat('0x', substring(h, CAST(1 + 8 * d.d AS INT), 8))
                    AS BIGINT) % $JsWidth AS idx,
                  CAST(count(*) AS BIGINT) AS cnt
                FROM keys, unnest(range(0, ${CurationQueries.CmsDepth})) d(d)
                GROUP BY 1, 2),
      est AS (SELECT min(ip) AS cms_estimate FROM (
                SELECT d, sum(cnt * cnt) AS ip FROM cells GROUP BY d) t),
      ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS exact_pairs FROM (
               SELECT count(*) AS c FROM keys GROUP BY k) u)
      SELECT 'lineitem self-join on l_partkey' AS join_key,
             ex.exact_pairs, CAST(est.cms_estimate AS BIGINT) AS cms_estimate,
             round(CAST(est.cms_estimate AS DOUBLE) / CAST(ex.exact_pairs AS DOUBLE), 4)
               AS inflation
      FROM ex, est"""),
  )

  /** The statistics → join-strategy loop CLOSED in a production call
    * site (the reference's `DISTSTYLE AUTO` — "optimizer decides from
    * stats", `sql/redshift_table_schemas.sql:114,310-313` — done in the
    * engine): [[graft.operators.AutoPlanJoin]] measures the two sides
    * (small-side rows, big-side key-skew profile, CMS inner-product
    * output estimate — all metadata-sized), CHOOSES broadcast / salted /
    * plain shuffle, and executes the chosen join. The emitted row
    * carries the decision, every input that drove it, and the joined
    * row count — the oracle replays the measurement AND the decision
    * rule, so a silently-changed threshold or stat breaks the hash. The
    * three-branch behavior is plan-pinned in `AutoPlanJoinSpec`; at
    * bench scale customer is dimension-sized so the live branch here is
    * broadcast. */
  private val statsAutoplanJoin = Q(
    "stats_autoplan_join",
    (s, dir) => {
      val depth = CurationQueries.CmsDepth
      val orders = Tables.orders(s, dir)
        .select(col("o_custkey").cast("long").as("k"), col("o_totalprice"))
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey").cast("long").as("k"), col("c_name"))
      val p = graft.operators.AutoPlanJoin.inner(
        orders, cust, Seq("k"), cmsDepth = depth, cmsWidth = JsWidth)
      p.joined.agg(count(lit(1)).as("n_joined"))
        .select(
          lit("orders/customer on custkey").as("join_key"),
          lit(p.strategy).as("strategy"),
          lit(p.stats.smallRows).as("small_rows"),
          lit(p.stats.bigRows).as("big_rows"),
          lit(p.stats.bigKeys).as("big_keys"),
          lit(p.stats.bigMaxKeyRows).as("big_max_key_rows"),
          lit(p.stats.cmsEstPairs).as("cms_est_pairs"),
          col("n_joined"))
    },
    Some(s"""
      -- the key rides into the CMS hash JSON-ENCODED ({"k":"<v>"} —
      -- AutoPlanJoin's null-distinct tuple encoding, single keys
      -- included); custkeys are digit strings so no JSON escaping can fire
      WITH bk AS (SELECT concat('{"k":"', CAST(CAST(o_custkey AS BIGINT) AS VARCHAR), '"}') AS k FROM orders),
      sk AS (SELECT concat('{"k":"', CAST(CAST(c_custkey AS BIGINT) AS VARCHAR), '"}') AS k FROM customer),
      bc AS (SELECT d.d AS d,
               CAST(concat('0x', substring(md5(k), CAST(1 + 8 * d.d AS INT), 8))
                 AS BIGINT) % $JsWidth AS idx,
               CAST(count(*) AS BIGINT) AS cnt
             FROM bk, unnest(range(0, ${CurationQueries.CmsDepth})) d(d) GROUP BY 1, 2),
      sc AS (SELECT d.d AS d,
               CAST(concat('0x', substring(md5(k), CAST(1 + 8 * d.d AS INT), 8))
                 AS BIGINT) % $JsWidth AS idx,
               CAST(count(*) AS BIGINT) AS cnt
             FROM sk, unnest(range(0, ${CurationQueries.CmsDepth})) d(d) GROUP BY 1, 2),
      est AS (SELECT min(ip) AS cms_est_pairs FROM (
                SELECT bc.d, sum(bc.cnt * sc.cnt) AS ip
                FROM bc JOIN sc ON bc.d = sc.d AND bc.idx = sc.idx
                GROUP BY 1) t),
      prof AS (SELECT CAST(count(*) AS BIGINT) AS big_keys,
                      CAST(sum(c) AS BIGINT) AS big_rows,
                      CAST(max(c) AS BIGINT) AS big_max_key_rows
               FROM (SELECT count(*) AS c FROM orders GROUP BY o_custkey) u),
      sm AS (SELECT CAST(count(*) AS BIGINT) AS small_rows FROM customer),
      jn AS (SELECT CAST(count(*) AS BIGINT) AS n_joined
             FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
      SELECT 'orders/customer on custkey' AS join_key,
             -- the decision rule replayed: broadcast budget 500000 rows,
             -- hot-key factor 4.0 over the even share at 32 partitions
             -- (the session's spark.sql.shuffle.partitions)
             CASE WHEN sm.small_rows <= 500000 THEN 'broadcast'
                  WHEN CAST(prof.big_max_key_rows AS DOUBLE)
                       > 4.0 * (CAST(prof.big_rows AS DOUBLE) / 32.0) THEN 'salted'
                  ELSE 'shuffle' END AS strategy,
             sm.small_rows, prof.big_rows, prof.big_keys, prof.big_max_key_rows,
             CAST(est.cms_est_pairs AS BIGINT) AS cms_est_pairs, jn.n_joined
      FROM sm, prof, est, jn"""),
  )

  // --------------------- correlated-subquery conformance (SQ1-SQ3)
  /** SQ1 — correlated EXISTS (TPC-H Q4 shape): orders having at least
    * one line shipped > 80 days after the order date, counted by
    * priority. Written AS a subquery via `spark.sql` — the point is
    * pinning that Catalyst DECORRELATES it to a left-semi join (one
    * pass over each table, no per-row subquery execution), the
    * relational class Redshift users write daily that had no explicit
    * conformance pin. Plan shape pinned in `PlanAuditSpec`. */
  private val sq1Exists = Q(
    "sq1_exists_late_ship",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("sq_orders")
      Tables.lineitem(s, dir).createOrReplaceTempView("sq_lineitem")
      s.sql("""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM sq_orders o
        WHERE EXISTS (SELECT 1 FROM sq_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND CAST(l.l_shipdate AS DATE)
                            > date_add(CAST(o.o_orderdate AS DATE), 80))
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    },
    Some("""
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND CAST(l.l_shipdate AS DATE)
                          > CAST(o.o_orderdate AS DATE) + 80)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
  )

  /** SQ2 — correlated NOT EXISTS + uncorrelated scalar subqueries
    * (TPC-H Q22 shape): above-average-balance customers with no large
    * order, by segment. The threshold comparison is REARRANGED to
    * `bal·count > sum` — decimal×bigint and decimal sums are exact in
    * both engines, where `bal > avg` would compare against a
    * division whose rounding differs cross-engine (Spark decimal
    * division vs DuckDB double avg). NOT EXISTS must plan as a
    * left-anti join; the scalars execute once and broadcast. */
  private val sq2NotExists = Q(
    "sq2_not_exists_dormant",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("sq_customer")
      Tables.orders(s, dir).createOrReplaceTempView("sq_orders")
      s.sql("""
        SELECT c_mktsegment, count(*) AS n_customers,
               CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS STRING) AS DOUBLE)
                 AS total_acctbal
        FROM sq_customer c
        WHERE CAST(c_acctbal AS DECIMAL(18,2))
                * (SELECT count(*) FROM sq_customer WHERE c_acctbal > 0)
              > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2)))
                 FROM sq_customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM sq_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 250000.0)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")
    },
    Some("""
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
             CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               AS total_acctbal
      FROM customer c
      WHERE CAST(c_acctbal AS DECIMAL(18,2))
              * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
            > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2)))
               FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 250000.0)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
  )

  /** SQ4 — uncorrelated IN subquery: orders of negative-balance
    * customers, by status. IN must plan as a left-semi join (one pass
    * each side), the remaining membership-predicate class after
    * sq1/sq2's EXISTS forms. */
  private val sq4In = Q(
    "sq4_in_subquery",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("sq_customer")
      Tables.orders(s, dir).createOrReplaceTempView("sq_orders")
      s.sql("""
        SELECT o_orderstatus, count(*) AS n_orders
        FROM sq_orders
        WHERE o_custkey IN (SELECT c_custkey FROM sq_customer
                            WHERE c_acctbal < 0.0)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0.0)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),
  )

  /** SQ5 — NOT IN, the NULL-AWARE anti-join class: `x NOT IN (sub)` is
    * three-valued — one NULL in the subquery empties the result — so
    * engines plan a null-aware anti join, not a plain one. Here the
    * subquery key is non-null (c_custkey), making the result the plain
    * complement of sq4; the conformance value is that BOTH engines
    * apply the same NOT IN semantics and Spark's plan stays a hash
    * anti join rather than a nested loop. */
  private val sq5NotIn = Q(
    "sq5_not_in_subquery",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("sq_customer")
      Tables.orders(s, dir).createOrReplaceTempView("sq_orders")
      s.sql("""
        SELECT o_orderstatus, count(*) AS n_orders
        FROM sq_orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM sq_customer
                                WHERE c_acctbal < 0.0)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders
      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0.0)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),
  )

  /** SQ6 — LEFT JOIN LATERAL with a correlated ORDER BY … LIMIT 1
    * subquery: each BUILDING customer's single largest order above
    * 300k, customers with none kept as NULL rows (295 matched / 7
    * null at sf0.01 — both polarities). The lateral-derived-table
    * class is the last subquery position after sq1-sq5's
    * WHERE-clause forms: "top-1 related row per driving row" written
    * the way warehouse users actually write it.
    *
    * Conformance pin (PlanAuditSpec): Catalyst must DECORRELATE the
    * per-row subquery — the correlated LIMIT becomes a rank window
    * over the orders side joined back (DecorrelateInnerQuery), never
    * a per-customer subquery execution; the audit asserts no
    * nested-loop shape and an exchange ceiling. At 100 TB the
    * decorrelated spelling is one shuffle of each side on custkey;
    * the naive spelling is |customer| point queries. */
  /** SQ12 — EXISTS inside a DISJUNCTION, the ExistenceJoin class: when
    * `EXISTS (…) OR <predicate>` appears, the subquery CANNOT filter as
    * a semi join (a row failing the EXISTS may still pass the OR), so
    * Catalyst plans the third subquery-join kind after sq1-sq7's
    * semi/anti/aggregate forms: an ExistenceJoin that ATTACHES a
    * boolean marker column and lets the disjunction evaluate as a
    * compiled filter — one pass over each table, never a per-row
    * subquery and never a fallback to the quadratic nested loop
    * (both pinned in `PlanAuditSpec`). Fixture picked so all three
    * populations are real at sf0.01: both-branch matches, 1585
    * price-only qualifiers, 2357 excluded. */
  private val sq12ExistsOr = Q(
    "sq12_exists_or_predicate",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("sq_orders")
      Tables.lineitem(s, dir).createOrReplaceTempView("sq_lineitem")
      s.sql("""
        SELECT o_orderstatus, count(*) AS n_orders
        FROM sq_orders o
        WHERE EXISTS (SELECT 1 FROM sq_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
           OR o.o_totalprice > 300000.0
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")
    },
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_returnflag = 'R')
         OR o.o_totalprice > 300000.0
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),
  )

  private val sq6Lateral = Q(
    "sq6_lateral_top1",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("sq_customer")
      Tables.orders(s, dir).createOrReplaceTempView("sq_orders")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.top_price
        FROM sq_customer c LEFT JOIN LATERAL (
          SELECT o_orderkey, o_totalprice AS top_price
          FROM sq_orders
          WHERE o_custkey = c.c_custkey AND o_totalprice > 300000.0
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t ON true
        WHERE c.c_mktsegment = 'BUILDING'
        ORDER BY c.c_custkey""")
    },
    Some("""
      SELECT c.c_custkey, t.o_orderkey, t.top_price
      FROM customer c LEFT JOIN LATERAL (
        SELECT o_orderkey, o_totalprice AS top_price
        FROM orders
        WHERE o_custkey = c.c_custkey AND o_totalprice > 300000.0
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t ON true
      WHERE c.c_mktsegment = 'BUILDING'
      ORDER BY c.c_custkey"""),
  )

  /** SQ7 — correlated scalar COUNT in the SELECT list: each MACHINERY
    * customer's number of 330k+ orders, INCLUDING the customers with
    * none — the classic COUNT-bug conformance pin. Decorrelating
    * `(SELECT count(*) …)` into an aggregate-then-LEFT-join makes the
    * unmatched rows' count come out NULL unless the engine
    * compensates (Catalyst wraps the joined-in count in a coalesce;
    * a naive rewrite silently drops the difference between "no rows"
    * and "unknown") — so the 7 zero-count customers at sf0.01 are the
    * load-bearing rows of this differential: both engines must print
    * 0, not NULL, and not omit them. WHERE-position scalars (sq3)
    * never see the bug because a NULL comparison filters the row
    * either way; SELECT position is where it bites.
    *
    * 100 TB: same decorrelated shape as sq3 — one aggregate over
    * orders + one custkey join; never |customer| point queries. */
  private val sq7SelectCount = Q(
    "sq7_select_scalar_count",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("sq_customer")
      Tables.orders(s, dir).createOrReplaceTempView("sq_orders")
      s.sql("""
        SELECT c.c_custkey,
               (SELECT count(*) FROM sq_orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 330000.0) AS n_big_orders
        FROM sq_customer c
        WHERE c.c_mktsegment = 'MACHINERY'
        ORDER BY c.c_custkey""")
    },
    Some("""
      SELECT c.c_custkey,
             CAST((SELECT count(*) FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_totalprice > 330000.0) AS BIGINT) AS n_big_orders
      FROM customer c
      WHERE c.c_mktsegment = 'MACHINERY'
      ORDER BY c.c_custkey"""),
  )

  /** SQ3 — CORRELATED SCALAR subquery (TPC-H Q17 shape): lines of one
    * brand whose quantity is below 20% of their part's average.
    * Catalyst must rewrite the per-part average into an aggregate
    * joined back (RewriteCorrelatedScalarSubquery) — executing it per
    * outer row would be quadratic. Quantities are integral doubles, so
    * per-part `avg` (exact integer sum / exact count) and `0.2·avg`
    * are bit-identical cross-engine; the revenue sum rides the decimal
    * bridge. */
  private val sq3ScalarAvg = Q(
    "sq3_scalar_part_avg",
    (s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("sq_lineitem")
      Tables.part(s, dir).createOrReplaceTempView("sq_part")
      s.sql("""
        SELECT count(*) AS n_small_qty,
               round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS STRING)
                     AS DOUBLE) / 7.0, 2) AS avg_yearly
        FROM sq_lineitem l JOIN sq_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#4'
          AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                              FROM sq_lineitem l2
                              WHERE l2.l_partkey = p.p_partkey)""")
    },
    Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_small_qty,
             round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                   AS DOUBLE) / 7.0, 2) AS avg_yearly
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#4'
        AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = p.p_partkey)"""),
  )

  /** A34 — CUBE with grouping_id: line counts and exact revenue at all
    * four granularities of (returnflag, linestatus) in ONE pass — the
    * multi-granularity rollup a BI layer otherwise runs as four
    * queries. Spark expands CUBE before aggregation (partial aggs still
    * collapse map-side), so the corpus is scanned once. The grouping id
    * pins the BIT SEMANTICS (flag is the high bit in both engines);
    * NULL group keys render as 'ALL' — safe here because neither column
    * is nullable in the lake, and gid disambiguates regardless. */
  private val a34Cube = Q(
    "a34_cube_revenue",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
            .as("rv"))
      li.cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_lines"),
          sum(col("rv")).as("srv"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("gid"), col("n_lines"),
          col("srv").cast("string").cast("double").as("revenue"))
        .orderBy("flag", "status")
    },
    Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS flag,
             coalesce(l_linestatus, 'ALL') AS status,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                  AS VARCHAR) AS DOUBLE) AS revenue
      FROM lineitem
      GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY flag, status"""),
  )

  /** A35 — PIVOT: monthly revenue spread into one column per return
    * flag (the spreadsheet shape every reporting layer exports). The
    * pivot values are ENUMERATED ('A','N','R') so Spark skips the
    * extra distinct-values job and the plan is one aggregate — at
    * 100 TB an unenumerated pivot is two corpus scans. The oracle
    * replays it as conditional aggregation, pinning that pivot is pure
    * sugar over FILTERed sums; empty cells coalesce to 0 on both
    * sides. */
  private val a35Pivot = Q(
    "a35_pivot_flag_revenue",
    (s, dir) => {
      val dec0 = lit(0).cast("decimal(24,4)")
      val li = Tables.lineitem(s, dir)
        .select(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
          col("l_returnflag"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
            .as("rv"))
      li.groupBy("month")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("rv")))
        .select(col("month"),
          coalesce(col("A"), dec0).cast("string").cast("double").as("rev_a"),
          coalesce(col("N"), dec0).cast("string").cast("double").as("rev_n"),
          coalesce(col("R"), dec0).cast("string").cast("double").as("rev_r"))
        .orderBy("month")
    },
    Some("""
      SELECT strftime(l_shipdate, '%Y-%m') AS month,
             CAST(CAST(coalesce(sum(CASE WHEN l_returnflag = 'A'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) END),
                  CAST(0 AS DECIMAL(24,4))) AS VARCHAR) AS DOUBLE) AS rev_a,
             CAST(CAST(coalesce(sum(CASE WHEN l_returnflag = 'N'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) END),
                  CAST(0 AS DECIMAL(24,4))) AS VARCHAR) AS DOUBLE) AS rev_n,
             CAST(CAST(coalesce(sum(CASE WHEN l_returnflag = 'R'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) END),
                  CAST(0 AS DECIMAL(24,4))) AS VARCHAR) AS DOUBLE) AS rev_r
      FROM lineitem
      GROUP BY 1
      ORDER BY month"""),
  )

  /** W12 — RANGE vs ROWS window frames, the conformance distinction
    * that silently corrupts trailing-window metrics when days have
    * gaps: `RANGE 6 PRECEDING` over the day NUMBER covers a true
    * trailing week (missing days contribute nothing), `ROWS 3
    * PRECEDING` covers the last four OBSERVED days regardless of
    * spacing. Both frames ride one window pass over the per-(priority,
    * day) aggregate — day-grain, partitioned by priority, never a
    * stratum. The RANGE key is an epoch-day LONG because Spark's
    * rangeBetween needs a numeric order — the portable spelling of
    * `RANGE INTERVAL '6' DAY` that means the same thing in any
    * engine. Exact DECIMAL sums inside the frames, one double
    * conversion at the edge. */
  private val w12RangeFrames = Q(
    "w12_range_vs_rows_frames",
    (s, dir) => {
      val d = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("pri"),
          to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"),
          count(lit(1)).as("n"))
        .withColumn("day_num",
          datediff(col("day"), lit("1995-01-01").cast("date")).cast("long"))
      val byDay = Window.partitionBy("pri").orderBy(col("day_num"))
      d.select(col("pri"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
          sum(col("rev")).over(byDay.rangeBetween(-6, 0))
            .cast("string").cast("double").as("rev_7d"),
          sum(col("rev")).over(byDay.rowsBetween(-3, 0))
            .cast("string").cast("double").as("rev_4rows"))
        .orderBy("pri", "day")
    },
    Some("""
      WITH d AS (SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
                   CAST(count(*) AS BIGINT) AS n
                 FROM orders GROUP BY 1, 2),
      e AS (SELECT pri, day, n, rev,
              CAST(day - DATE '1995-01-01' AS BIGINT) AS day_num FROM d)
      SELECT pri, strftime(day, '%Y-%m-%d') AS day, n,
             CAST(CAST(sum(rev) OVER (PARTITION BY pri ORDER BY day_num
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
               AS rev_7d,
             CAST(CAST(sum(rev) OVER (PARTITION BY pri ORDER BY day_num
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
               AS rev_4rows
      FROM e ORDER BY pri, day"""),
  )

  /** J21 — nation-pair trade volume (TPC-H Q7 shape): revenue shipped
    * between two specific nations, by direction and year — the deepest
    * join chain in the conformance surface (lineitem ⋈ supplier ⋈
    * nation ⋈ orders ⋈ customer ⋈ nation). Join order is the 100 TB
    * story: the NATION filter lands on the two dimension legs FIRST, so
    * the broadcast sides carry only the two nations' suppliers and the
    * customer leg shrinks 2/25 before the fact joins — the fact table
    * crosses exactly two shuffles (orderkey, and the groupBy), never a
    * post-join filter over the full cross-nation volume. */
  private val j21NationTrade = Q(
    "j21_nation_pair_trade",
    (s, dir) => {
      val nat = Tables.nation(s, dir)
        .filter(col("n_name").isin("NATION_0", "NATION_1"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("cust_nation"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
            .as("rv"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("rv")).cast("string").cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(strftime(l.l_shipdate, '%Y') AS BIGINT) AS l_year,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                           (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                  AS VARCHAR) AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE n1.n_name IN ('NATION_0', 'NATION_1')
        AND n2.n_name IN ('NATION_0', 'NATION_1')
        AND n1.n_name <> n2.n_name
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3"""),
  )

  /** SET2 — BAG semantics of INTERSECT ALL / EXCEPT ALL, the set-op
    * class `set_customer_buckets`' DISTINCT ops don't pin: per key,
    * INTERSECT ALL keeps min(countA, countB) copies and EXCEPT ALL
    * keeps max(countA − countB, 0) — multiplicity arithmetic engines
    * get subtly wrong (and that dedup-happy rewrites silently break).
    * The multisets are order custkeys under two overlapping predicates,
    * so both ops produce genuine >1 multiplicities (4920 intersect
    * copies over 1450 keys at sf0.01); the result re-aggregates the bag
    * outputs per key, which makes the multiplicities themselves the
    * hashed contract. */
  private val set2BagOps = Q(
    "set2_bag_ops",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val a = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k"))
      val b = o.filter(col("o_totalprice") > 150000.0).select(col("o_custkey").as("k"))
      val ia = a.intersectAll(b).groupBy("k").agg(count(lit(1)).as("n_intersect"))
      val ea = a.exceptAll(b).groupBy("k").agg(count(lit(1)).as("n_except"))
      ia.join(ea, Seq("k"), "full")
        .select(col("k"),
          coalesce(col("n_intersect"), lit(0L)).as("n_intersect"),
          coalesce(col("n_except"), lit(0L)).as("n_except"))
        .orderBy("k")
    },
    Some("""
      WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
      b AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000.0),
      ia AS (SELECT k, CAST(count(*) AS BIGINT) AS n_intersect
             FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY 1),
      ea AS (SELECT k, CAST(count(*) AS BIGINT) AS n_except
             FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY 1)
      SELECT coalesce(ia.k, ea.k) AS k,
             coalesce(ia.n_intersect, 0) AS n_intersect,
             coalesce(ea.n_except, 0) AS n_except
      FROM ia FULL JOIN ea ON ia.k = ea.k
      ORDER BY k"""),
  )

  /** GRAPH — k-core peeling schedule over the co-purchase graph (same
    * edge construction as LPA/triangles): per round, how many parts and
    * co-purchase edges survive degree-3 pruning — the "dense backbone"
    * extraction that filters noise nodes before community/centrality
    * passes, and the fourth member of the iterative-graph family
    * (CC, LPA, PageRank). Fixed 6-round budget as the contract; the
    * output is the rounds-sized peel schedule (monotone by
    * construction), exact-replayed by an unrolled oracle. */
  private val graphKcore = Q(
    "graph_kcore_peel",
    (s, dir) => {
      val edges = copurchaseEdges(s, dir)
      val stats = graft.operators.KCore.peelStats(edges, k = 3, rounds = 6)
      val s0 = s
      import s0.implicits._
      stats.map(st => (st.round.toLong, st.nodesAlive, st.edgesAlive))
        .toDF("round", "nodes_alive", "edges_alive")
        .orderBy("round")
    },
    Some("""
      WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      ed AS (SELECT a.l_partkey AS x, b.l_partkey AS y FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 2),
      e0 AS MATERIALIZED (SELECT x AS node, y AS nbr FROM ed
                          UNION ALL SELECT y, x FROM ed),
      k1 AS (SELECT node FROM (SELECT node, count(*) c FROM e0 GROUP BY 1) WHERE c >= 3),
      e1 AS MATERIALIZED (SELECT e.node, e.nbr FROM e0 e
            JOIN k1 a ON e.node = a.node JOIN k1 b ON e.nbr = b.node),
      k2 AS (SELECT node FROM (SELECT node, count(*) c FROM e1 GROUP BY 1) WHERE c >= 3),
      e2 AS MATERIALIZED (SELECT e.node, e.nbr FROM e1 e
            JOIN k2 a ON e.node = a.node JOIN k2 b ON e.nbr = b.node),
      k3 AS (SELECT node FROM (SELECT node, count(*) c FROM e2 GROUP BY 1) WHERE c >= 3),
      e3 AS MATERIALIZED (SELECT e.node, e.nbr FROM e2 e
            JOIN k3 a ON e.node = a.node JOIN k3 b ON e.nbr = b.node),
      k4 AS (SELECT node FROM (SELECT node, count(*) c FROM e3 GROUP BY 1) WHERE c >= 3),
      e4 AS MATERIALIZED (SELECT e.node, e.nbr FROM e3 e
            JOIN k4 a ON e.node = a.node JOIN k4 b ON e.nbr = b.node),
      k5 AS (SELECT node FROM (SELECT node, count(*) c FROM e4 GROUP BY 1) WHERE c >= 3),
      e5 AS MATERIALIZED (SELECT e.node, e.nbr FROM e4 e
            JOIN k5 a ON e.node = a.node JOIN k5 b ON e.nbr = b.node),
      k6 AS (SELECT node FROM (SELECT node, count(*) c FROM e5 GROUP BY 1) WHERE c >= 3),
      e6 AS MATERIALIZED (SELECT e.node, e.nbr FROM e5 e
            JOIN k6 a ON e.node = a.node JOIN k6 b ON e.nbr = b.node)
      SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS round,
               CAST((SELECT count(DISTINCT node) FROM e0) AS BIGINT) AS nodes_alive,
               CAST((SELECT count(*) FROM e0) AS BIGINT) AS edges_alive
        UNION ALL SELECT 1, (SELECT count(DISTINCT node) FROM e1), (SELECT count(*) FROM e1)
        UNION ALL SELECT 2, (SELECT count(DISTINCT node) FROM e2), (SELECT count(*) FROM e2)
        UNION ALL SELECT 3, (SELECT count(DISTINCT node) FROM e3), (SELECT count(*) FROM e3)
        UNION ALL SELECT 4, (SELECT count(DISTINCT node) FROM e4), (SELECT count(*) FROM e4)
        UNION ALL SELECT 5, (SELECT count(DISTINCT node) FROM e5), (SELECT count(*) FROM e5)
        UNION ALL SELECT 6, (SELECT count(DISTINCT node) FROM e6), (SELECT count(*) FROM e6))
      ORDER BY round"""),
  )

  /** GRAPH — bounded-depth multi-source BFS over the co-purchase graph
    * (same edge construction as LPA/triangles/k-core): the minimum
    * number of co-purchase hops from the size-50 seed assortment to
    * every part it can reach within 3 hops — the "campaign radius"
    * query behind "which parts does a promotion plausibly touch".
    * Completes the iterative-graph family: CC answers membership, LPA
    * communities, PageRank centrality, k-core density — this is
    * REACHABILITY with hop distance, which none of them expose. Parts
    * beyond the cap (or disconnected) are absent, so both polarities
    * occur: at sf0.01 the fixture spreads 40/156/477/713 over hops
    * 0-3 with 614 parts unreached.
    *
    * 100 TB design: classic frontier expansion — per hop ONE
    * (frontier ⋈ edges) shuffle + distinct + an anti-join against the
    * visited union; work per round is proportional to the FRONTIER,
    * not the graph, and rounds are bounded by the hop cap (unbounded
    * transitive closure is ConnectedComponents' pointer-jumping job —
    * a hop-capped BFS through it would lose the distances). Each
    * layer is cut and released via Lineage.checkpointed like the
    * other iterative operators (measured load-bearing in the LPA
    * loop: 6.0→27.3 s without), so the visited union scans K tiny
    * checkpoints instead of recomputing K join chains. The oracle
    * replays the identical frontier algebra as a recursive CTE:
    * UNION-distinct over (node, dist) with the same hop cap —
    * min(dist) is the BFS distance in both spellings. */
  private val graphBfs = Q(
    "graph_bfs_frontier",
    (s, dir) => {
      val edges = copurchaseEdges(s, dir)
      val eb = edges.select(col("x").as("nbr"), col("y").as("node"))
        .unionByName(edges.select(col("y").as("nbr"), col("x").as("node")))
        .persist()
      val seeds = Tables.part(s, dir).filter(col("p_size") === 50)
        .select(col("p_partkey").as("node"))
        .withColumn("dist", lit(0L))
      var (front, release0) = graft.Lineage.checkpointed(seeds)
      val layers = scala.collection.mutable.ArrayBuffer[(DataFrame, () => Unit)]()
      layers += ((front, release0))
      for (d <- 1 to 3) {
        val visited = layers.map(_._1).reduce(_ unionByName _).select("node")
        val (next, releaseNext) = graft.Lineage.checkpointed(
          front.select(col("node").as("nbr"))
            .join(eb, "nbr").select("node").distinct()
            .join(visited, Seq("node"), "left_anti")
            .withColumn("dist", lit(d.toLong)))
        layers += ((next, releaseNext))
        front = next
      }
      val out = layers.map(_._1).reduce(_ unionByName _)
        .select(col("node").as("partkey"), col("dist"))
        .orderBy("partkey")
        .persist()
      out.count() // materialize before releasing the layer checkpoints
      layers.foreach(_._2())
      eb.unpersist()
      out
    },
    Some("""
      WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      ed AS (SELECT a.l_partkey AS x, b.l_partkey AS y FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 2),
      eb AS MATERIALIZED (SELECT x AS nbr, y AS node FROM ed
                          UNION ALL SELECT y, x FROM ed),
      bfs(node, dist) AS (
        SELECT p_partkey, 0 FROM part WHERE p_size = 50
        UNION
        SELECT e.node, b.dist + 1 FROM bfs b JOIN eb e ON e.nbr = b.node
        WHERE b.dist < 3)
      SELECT node AS partkey, CAST(min(dist) AS BIGINT) AS dist
      FROM bfs GROUP BY 1 ORDER BY 1"""),
  )

  /** A37 — GROUPING SETS with explicitly DISJOINT sets: the
    * by-returnflag and by-linestatus breakdowns in ONE scan — the
    * general grouping form that neither CUBE (a34: all 2^n subsets)
    * nor ROLLUP (a14b: the prefix chain) can spell, and the reason
    * the clause exists: two independent BI breakdowns without a
    * second pass or a UNION ALL of two aggregates. grouping_id pins
    * the cross-engine bit contract (a bit is SET when its column is
    * aggregated away; first listed column = high bit), and
    * disambiguates the 'ALL' placeholders.
    *
    * 100 TB design: Spark plans Expand (each row fans to its 2 set
    * copies) feeding ONE hash aggregate with map-side partials — scan
    * once, shuffle the aggregate domain only (5 rows here); revenue
    * rides the exact decimal bridge. */
  private val a37GroupingSets = Q(
    "a37_grouping_sets",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
            .as("rv"))
      li.groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_lines"),
          sum(col("rv")).as("srv"))
        .select(col("gid"),
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n_lines"),
          col("srv").cast("double").as("revenue"))
        .orderBy("gid", "flag", "status")
    },
    Some("""
      SELECT CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             coalesce(l_returnflag, 'ALL') AS flag,
             coalesce(l_linestatus, 'ALL') AS status,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                   (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                 AS VARCHAR) AS DOUBLE) AS revenue
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      ORDER BY gid, flag, status"""),
  )

  /** A38 — UNPIVOT (melt), the inverse of a35's enumerated pivot: the
    * wide per-day metric columns (click/view/purchase counts) fold
    * back into tidy (day, metric, n) rows — the wide→long reshape
    * every feature pipeline runs before a union or a generic
    * per-metric model, and the missing half of the reshape pair
    * (pivot without unpivot is a one-way door). Metric NAMES become
    * DATA here, so the differential also pins the engines' generated
    * name column agreement.
    *
    * 100 TB design: unpivot is a per-row Expand (3 output rows per
    * input row, no shuffle of its own) — the plan stays scan → agg →
    * expand → sort; the day-grain aggregate bounds the frame long
    * before the fan-out. */
  private val a38Unpivot = Q(
    "a38_unpivot_metrics",
    (s, dir) => {
      val wide = Tables.events(s, dir)
        .groupBy(date_format(col("ts").cast("date"), "yyyy-MM-dd").as("day"))
        .agg(
          count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("event_type") === "view", 1)).as("n_view"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"))
      wide.unpivot(
          Array(col("day")),
          Array(col("n_click"), col("n_view"), col("n_purchase")),
          "metric", "n")
        .orderBy("day", "metric")
    },
    Some("""
      WITH wide AS (
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
               CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase
        FROM events GROUP BY 1)
      SELECT day, metric, n
      FROM (UNPIVOT wide ON n_click, n_view, n_purchase INTO NAME metric VALUE n)
      ORDER BY day, metric"""),
  )

  /** A36 — customer distribution by order count (TPC-H Q13 shape): a
    * LEFT join whose FILTER LIVES IN THE JOIN CONDITION (orders below
    * '3-MEDIUM' priority are excluded from the COUNT, but customers
    * with no qualifying orders are NOT excluded from the report — a
    * WHERE would silently drop them, the classic Q13 trap; the zero
    * bucket is non-vacuous here, 2 customers at sf0.01), then an
    * aggregate OF the aggregate: per-customer counts → how many
    * customers share each count. The histogram-of-activity report
    * every CRM runs ("how many one-order customers do we have").
    *
    * Spark-first: the right-side-only predicate is a pre-filter on
    * orders (equivalent algebra for a left join, and it pushes to the
    * parquet scan, which an ON-clause residual would not); count over
    * the possibly-null order key skips the unmatched-row nulls in
    * both engines. Two hash aggregates, each collapsing map-side; the
    * second one's domain is order-count-sized (tiny). The custdist
    * sort is total because c_count is the group key. */
  private val a36Custdist = Q(
    "a36_custdist",
    (s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey")
      val o = Tables.orders(s, dir)
        .filter(!col("o_orderpriority").like("3%"))
        .select("o_custkey", "o_orderkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      WITH co AS (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority NOT LIKE '3%'
        GROUP BY 1)
      SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      FROM co GROUP BY 1
      ORDER BY custdist DESC, c_count DESC"""),
  )

  // ----------------------------- A33: revenue concentration (Gini)
  /** A33 — assortment concentration as a Gini coefficient over
    * per-part revenue: G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n with x sorted
    * ascending — the one-number "do a few parts carry the business"
    * complement to A31's threshold list (A31 names the heavy parts;
    * this says how heavy the head is overall, the metric assortment
    * planning tracks quarter over quarter).
    *
    * Exactness: revenues are exact decimal sums; the ascending rank
    * rides [[graft.operators.PrefixSum]] (single corpus stratum,
    * bounded); i·xᵢ stays DECIMAL (rank × decimal is exact), both
    * moments convert to double once, and the closed form is identical
    * double arithmetic cross-engine. */
  private val a33Gini = Q(
    "a33_revenue_gini",
    (s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .select(col("l_partkey"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
            .as("rv"))
        .groupBy("l_partkey").agg(sum(col("rv")).as("x"))
        .withColumn("corpus", lit("all"))
      val ranked = graft.operators.PrefixSum.runningSum(rev, Seq("corpus"),
        Seq(col("x").asc, col("l_partkey")), lit(1L), "i")
      val m = ranked.agg(
        count(lit(1)).as("n_parts"),
        sum(col("x")).as("s1"),
        sum(col("i") * col("x")).as("s2"))
      def toD(c: String) = col(c).cast("string").cast("double")
      val n = col("n_parts").cast("double")
      m.select(col("n_parts"),
          toD("s1").as("total_revenue"),
          round(lit(2.0) * toD("s2") / (n * toD("s1"))
            - (n + 1.0) / n, 9).as("gini"))
    },
    Some("""
      WITH rev AS (SELECT l_partkey,
                     sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS x
                   FROM lineitem GROUP BY 1),
      r AS (SELECT x, CAST(row_number() OVER (ORDER BY x, l_partkey) AS BIGINT) AS i
            FROM rev),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
                   sum(x) AS s1, sum(i * x) AS s2
            FROM r)
      SELECT n_parts,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS total_revenue,
             round(2.0 * CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                   / (CAST(n_parts AS DOUBLE) * CAST(CAST(s1 AS VARCHAR) AS DOUBLE))
                   - (CAST(n_parts AS DOUBLE) + 1.0) / CAST(n_parts AS DOUBLE), 9) AS gini
      FROM m"""),
  )

  // --------------------------- W10: ranking-function surface with ties
  /** W10 — the full ranking-function surface over a distribution WITH
    * TIES (spend bucketed to force them): row_number / rank /
    * dense_rank / percent_rank / cume_dist, the five the reference's
    * BI layer leans on and whose tie semantics differ in exactly the
    * ways that silently corrupt reports (rank gaps vs dense, the
    * n−1 vs n denominators of percent_rank vs cume_dist).
    * row_number gets its own fully-tiebroken window — ranking ties
    * with row_number alone is nondeterministic, the bug this query
    * exists to pin against.
    *
    * Scale note: the global window runs over the CUSTOMER dimension
    * (already one aggregate deep, thousands of rows) — dimension-
    * sized, not a corpus stratum; the corpus-scale spelling of a
    * global rank is [[graft.operators.PrefixSum]] (see
    * `emb_pca_project`). percent_rank/cume_dist are exact rationals
    * of small integers — identical doubles cross-engine. */
  private def customerSpendBuckets(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
      .select(col("custkey"),
        (floor(col("spend").cast("double") / 100000.0) * 100000).cast("long")
          .as("spend_bucket"))

  private val RankVariantsOracle = """
      WITH spend AS (SELECT o_custkey AS custkey,
                       CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                  / 100000.0) * 100000 AS BIGINT) AS spend_bucket
                     FROM orders GROUP BY 1)
      SELECT custkey, spend_bucket,
             CAST(row_number() OVER (ORDER BY spend_bucket DESC, custkey) AS BIGINT) AS rn,
             CAST(rank() OVER w AS BIGINT) AS rnk,
             CAST(dense_rank() OVER w AS BIGINT) AS dense_rnk,
             round(percent_rank() OVER w, 9) AS pct_rank,
             round(cume_dist() OVER w, 9) AS cume,
             CAST(ntile(7) OVER (ORDER BY spend_bucket DESC, custkey) AS BIGINT) AS nt7
      FROM spend
      WINDOW w AS (ORDER BY spend_bucket DESC)
      ORDER BY rn"""

  /** W14 — VALUE-window conformance family: the offset/frame functions
    * `w10_rank_variants` (ranks) and `w9_locf`/`j20` (IGNORE NULLS
    * first/last) don't pin — lead/lag with explicit offset AND
    * default, nth_value over a running frame, and first/last_value
    * over BOUNDED sliding frames, all in one pass per customer. The
    * classes engines get subtly wrong: lead/lag defaults at partition
    * edges (NULL vs default), nth_value's null-until-nth-row contract,
    * and last_value's frame-end sensitivity (the classic bug is the
    * default frame ending at CURRENT ROW — here the frame is explicit
    * on both sides). Values pass through unaggregated (2-dp doubles,
    * exact), so the differential pins SEMANTICS, not arithmetic.
    *
    * 100 TB design: ONE custkey exchange carries all five functions
    * (every window shares partitioning and ordering); partitions are
    * per-customer order counts, never a global dimension. */
  private val w14ValueWindows = Q(
    "w14_value_windows",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("prev2_price", lag(col("o_totalprice"), 2, -1.0).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1, -1.0).over(w))
        .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nbr_first", first(col("o_totalprice")).over(
          w.rowsBetween(-1, 1)))
        .withColumn("tail_last", last(col("o_totalprice")).over(
          w.rowsBetween(0, 2)))
        .select(col("o_custkey"), col("o_orderkey"),
          col("prev2_price"), col("next_price"), col("second_price"),
          col("nbr_first"), col("tail_last"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             lag(o_totalprice, 2, -1.0) OVER w AS prev2_price,
             lead(o_totalprice, 1, -1.0) OVER w AS next_price,
             nth_value(o_totalprice, 2) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_price,
             first_value(o_totalprice) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS nbr_first,
             last_value(o_totalprice) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS tail_last
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""),
  )

  private val w10Ranks = Q(
    "w10_rank_variants",
    (s, dir) => {
      val spend = customerSpendBuckets(s, dir)
      val tied = Window.orderBy(col("spend_bucket").desc)
      val total = Window.orderBy(col("spend_bucket").desc, col("custkey"))
      spend
        .withColumn("rn", row_number().over(total).cast("long"))
        .withColumn("rnk", rank().over(tied).cast("long"))
        .withColumn("dense_rnk", dense_rank().over(tied).cast("long"))
        .withColumn("pct_rank", round(percent_rank().over(tied), 9))
        .withColumn("cume", round(cume_dist().over(tied), 9))
        // ntile over the fully-tiebroken order (7 does not divide 1500,
        // so the uneven-bucket split is exercised)
        .withColumn("nt7", ntile(7).over(total).cast("long"))
        .orderBy("rn")
    },
    Some(RankVariantsOracle),
  )

  /** W11 — the SAME five-function ranking surface as w10, spelled for
    * corpus scale: [[graft.operators.PrefixSum.rankVariants]] computes
    * every rank variant with range-partitioned two-phase prefix sums —
    * no partition-less `WindowExec` anywhere in the plan, so the frame
    * can grow 100× without ever putting the whole dimension into one
    * task (w10's scaladoc promised this spelling; the oracle is
    * IDENTICAL to w10's, pinning the two plans to the same answer —
    * including tie semantics and the n−1 vs n denominators). */
  private val w11ScalableRanks = Q(
    "w11_scalable_ranks",
    (s, dir) => {
      val spend = customerSpendBuckets(s, dir)
      graft.operators.PrefixSum
        .rankVariants(spend, Seq("spend_bucket" -> false), Seq(col("custkey")),
          ntile = Some(7))
        .select(col("custkey"), col("spend_bucket"),
          col("row_number").cast("long").as("rn"),
          col("rank").cast("long").as("rnk"),
          col("dense_rank").cast("long").as("dense_rnk"),
          round(col("percent_rank"), 9).as("pct_rank"),
          round(col("cume_dist"), 9).as("cume"),
          col("ntile").cast("long").as("nt7"))
        .orderBy("rn")
    },
    Some(RankVariantsOracle),
  )

  private val a18Hll = Q(
    "a18_hll_distinct",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val keyed = ev
        .select(col("event_type"), lit("users").as("metric"),
          col("user_id").cast("string").as("k"))
        .unionByName(ev.select(col("event_type"), lit("days").as("metric"),
          to_date(col("ts")).cast("string").as("k")))
        // event_id is unique per row — thousands of distinct keys per
        // type at sf0.01, so the raw harmonic branch fires in the gate
        // (users/days stay small enough for linear counting)
        .unionByName(ev.select(col("event_type"), lit("events").as("metric"),
          col("event_id").cast("string").as("k")))
      val groups = Seq("event_type", "metric")
      val approx = graft.operators.HllSketch.estimate(
        graft.operators.HllSketch.registers(keyed, groups, "k"), groups)
      val exact = keyed.groupBy(groups.map(col): _*)
        .agg(countDistinct(col("k")).as("exact_distinct"))
      exact.join(approx, groups)
        .select(col("event_type"), col("metric"), col("exact_distinct"),
          col("approx_distinct"),
          (col("approx_distinct") - col("exact_distinct").cast("double"))
            .as("err"))
        .orderBy("event_type", "metric")
    },
    Some {
      import graft.operators.HllSketch.{AlphaM2Pow, LcThreshold, M, RhoMax}
      s"""
      WITH keyed AS (
        SELECT event_type, 'users' AS metric, CAST(user_id AS VARCHAR) AS k
        FROM events
        UNION ALL
        SELECT event_type, 'days' AS metric,
               CAST(CAST(ts AS DATE) AS VARCHAR) AS k
        FROM events
        UNION ALL
        SELECT event_type, 'events' AS metric, CAST(event_id AS VARCHAR) AS k
        FROM events),
      h AS (SELECT event_type, metric,
                   CAST(concat('0x', substring(md5(k), 1, 15)) AS BIGINT) AS h
            FROM keyed),
      regs AS (SELECT event_type, metric, h % $M AS register,
                      max(CASE WHEN h // $M = 0 THEN $RhoMax
                               ELSE $RhoMax - length(bin(h // $M)) END) AS rho
               FROM h GROUP BY 1, 2, 3),
      est AS (SELECT event_type, metric,
                     sum(CAST(1 AS BIGINT) << ($RhoMax - rho)) AS s_present,
                     count(*) AS n_present
              FROM regs GROUP BY 1, 2),
      fin AS (SELECT event_type, metric,
                     s_present
                       + ($M - n_present) * (CAST(1 AS BIGINT) << $RhoMax)
                       AS s_scaled,
                     $M - n_present AS zeros
              FROM est),
      appx AS (SELECT event_type, metric,
                      CASE WHEN $AlphaM2Pow / CAST(s_scaled AS DOUBLE)
                                  <= $LcThreshold
                                AND zeros > 0
                           THEN ${M.toDouble}
                                  * ln(${M.toDouble} / CAST(zeros AS DOUBLE))
                           ELSE $AlphaM2Pow / CAST(s_scaled AS DOUBLE)
                      END AS approx_distinct
               FROM fin),
      ex AS (SELECT event_type, metric, count(DISTINCT k) AS exact_distinct
             FROM keyed GROUP BY 1, 2)
      SELECT ex.event_type, ex.metric, ex.exact_distinct, a.approx_distinct,
             a.approx_distinct - CAST(ex.exact_distinct AS DOUBLE) AS err
      FROM ex JOIN appx a USING (event_type, metric)
      ORDER BY event_type, metric"""
    },
  )

  /** A26 — SKETCH ROLLUP (partial reaggregation): daily HLL register
    * tables merged to WEEKLY and ALL-TIME distinct-user estimates
    * without ever rescanning the raw events — the warehouse pattern
    * that makes multi-granularity distinct counts affordable at 100 TB:
    * the corpus is scanned ONCE into per-(type, day) registers
    * (metadata — ≤ M rows per group), persisted, and every coarser
    * granularity is an element-wise `max(rho)` over those register
    * rows. `COUNT(DISTINCT)` does not reaggregate (a day's distinct
    * counts cannot sum to a week's); the sketch's register algebra does,
    * exactly — `HllSketchSpec` pins registers(A∪B) == merge(registers).
    *
    * Each estimate sits beside its exact twin (affordable at bench
    * scale) so the error is self-auditing, same doctrine as
    * `a18_hll_distinct`. The oracle replays daily registers, both
    * merges, and the estimator arithmetic in SQL. */
  private val a26HllRollup = Q(
    "a26_hll_rollup",
    (s, dir) => {
      val groupsW = Seq("event_type", "week")
      val keyed = Tables.events(s, dir).select(
        col("event_type"),
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"),
        to_date(col("ts")).cast("string").as("day"),
        col("user_id").cast("string").as("k"))
      // ONE raw scan; every granularity below reads these ~|types·days·M|
      // register rows
      val daily = graft.operators.HllSketch
        .registers(keyed, Seq("event_type", "week", "day"), "k")
        .persist()
      val weekly = graft.operators.HllSketch.estimate(
        daily.groupBy(col("register"), col("event_type"), col("week"))
          .agg(max(col("rho")).as("rho")), groupsW)
      val total = graft.operators.HllSketch.estimate(
        daily.groupBy(col("register"), col("event_type"))
          .agg(max(col("rho")).as("rho")), Seq("event_type"))
        .withColumn("week", lit("ALL"))
      val exactW = keyed.groupBy("event_type", "week")
        .agg(countDistinct(col("k")).as("exact_distinct"))
      val exactA = keyed.groupBy("event_type")
        .agg(countDistinct(col("k")).as("exact_distinct"))
        .withColumn("week", lit("ALL"))
      val out = exactW.unionByName(exactA)
        .join(weekly.unionByName(total.select(weekly.columns.map(col): _*)),
          Seq("event_type", "week"))
        .select(col("event_type"), col("week"), col("exact_distinct"),
          col("approx_distinct"),
          (col("approx_distinct") - col("exact_distinct").cast("double"))
            .as("err"))
        .orderBy("event_type", "week")
        .persist()
      out.count() // materialize before releasing the register table
      daily.unpersist()
      out
    },
    Some {
      import graft.operators.HllSketch.{AlphaM2Pow, LcThreshold, M, RhoMax}
      def estSql(regs: String, keys: String): String = s"""
        (SELECT $keys,
                CASE WHEN $AlphaM2Pow / CAST(s_present
                            + ($M - n_present) * (CAST(1 AS BIGINT) << $RhoMax)
                            AS DOUBLE) <= $LcThreshold
                          AND $M - n_present > 0
                     THEN ${M.toDouble}
                            * ln(${M.toDouble} / CAST($M - n_present AS DOUBLE))
                     ELSE $AlphaM2Pow / CAST(s_present
                            + ($M - n_present) * (CAST(1 AS BIGINT) << $RhoMax)
                            AS DOUBLE)
                END AS approx_distinct
         FROM (SELECT $keys,
                      sum(CAST(1 AS BIGINT) << ($RhoMax - rho)) AS s_present,
                      count(*) AS n_present
               FROM $regs GROUP BY $keys) t)"""
      s"""
      WITH keyed AS (
        SELECT event_type,
               strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
               CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               CAST(user_id AS VARCHAR) AS k
        FROM events),
      h AS (SELECT event_type, week, day,
                   CAST(concat('0x', substring(md5(k), 1, 15)) AS BIGINT) AS h
            FROM keyed),
      daily AS (SELECT event_type, week, day, h % $M AS register,
                       max(CASE WHEN h // $M = 0 THEN $RhoMax
                                ELSE $RhoMax - length(bin(h // $M)) END) AS rho
                FROM h GROUP BY 1, 2, 3, 4),
      wregs AS (SELECT event_type, week, register, max(rho) AS rho
                FROM daily GROUP BY 1, 2, 3),
      aregs AS (SELECT event_type, register, max(rho) AS rho
                FROM daily GROUP BY 1, 2),
      wappx AS ${estSql("wregs", "event_type, week")},
      aappx AS ${estSql("aregs", "event_type")},
      appx AS (SELECT * FROM wappx
               UNION ALL
               SELECT event_type, 'ALL' AS week, approx_distinct FROM aappx),
      ex AS (SELECT event_type, week, count(DISTINCT k) AS exact_distinct
             FROM keyed GROUP BY 1, 2
             UNION ALL
             SELECT event_type, 'ALL' AS week, count(DISTINCT k)
             FROM keyed GROUP BY 1)
      SELECT ex.event_type, ex.week, ex.exact_distinct, a.approx_distinct,
             a.approx_distinct - CAST(ex.exact_distinct AS DOUBLE) AS err
      FROM ex JOIN appx a USING (event_type, week)
      ORDER BY event_type, week"""
    },
  )

  /** A27 — sketch-algebra audience overlap: |click ∩ purchase| users
    * estimated from HLL registers by inclusion–exclusion
    * (|A| + |B| − |A∪B|, with |A∪B| the element-wise register max —
    * the ONLY set operation HLL supports natively), beside the exact
    * overlap as a self-auditing twin. The flagship CDP question —
    * "how much do these two segments overlap?" — answered from
    * metadata-sized sketches without rescanning raw events: at 100 TB
    * the per-segment register tables are what's stored (a26 persists
    * them daily), and ANY pair of segments intersects in O(M)
    * register arithmetic. Intersection error grows as the overlap
    * shrinks relative to the union (inclusion–exclusion subtracts two
    * large estimates), which is why the exact twin rides along: the
    * operator reports its own trustworthiness.
    *
    * One raw scan builds the 2×M register table (map-side collapse);
    * every estimate below reads those ~128 metadata rows. */
  private val a27Overlap = Q(
    "a27_segment_overlap",
    (s, dir) => {
      import graft.operators.HllSketch
      // segments chosen to overlap PARTIALLY (at sf0.01: 32 / 29 / 7
      // shared) — every user both clicks and purchases at least once,
      // so plain type membership would make A = B = A∪B and the
      // intersection estimate vacuous
      val keyed = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase") && col("value") >= 200)
        .select(col("event_type"), col("user_id").cast("string").as("k"))
      val regs = HllSketch.registers(keyed, Seq("event_type"), "k").persist()
      val ab = HllSketch.estimate(regs, Seq("event_type"))
      val u = HllSketch.estimate(
        regs.groupBy("register").agg(max(col("rho")).as("rho"))
          .withColumn("seg", lit("u")),
        Seq("seg"))
      val a = ab.filter(col("event_type") === "click")
        .select(col("approx_distinct").as("approx_click"))
      val b = ab.filter(col("event_type") === "purchase")
        .select(col("approx_distinct").as("approx_purchase"))
      val uu = u.select(col("approx_distinct").as("approx_union"))
      val exact = keyed.groupBy("k")
        .agg(countDistinct(col("event_type")).as("nt"))
        .filter(col("nt") === 2)
        .agg(count(lit(1)).as("exact_overlap"))
      val out = a.crossJoin(broadcast(b)).crossJoin(broadcast(uu))
        .crossJoin(broadcast(exact))
        .select(
          lit("click*purchase").as("pair"),
          col("approx_click"), col("approx_purchase"), col("approx_union"),
          (col("approx_click") + col("approx_purchase") - col("approx_union"))
            .as("approx_overlap"),
          col("exact_overlap"),
          (col("approx_click") + col("approx_purchase") - col("approx_union")
            - col("exact_overlap").cast("double")).as("overlap_err"))
        .persist()
      out.count() // materialize before releasing the register table
      regs.unpersist()
      out
    },
    Some {
      import graft.operators.HllSketch.{AlphaM2Pow, LcThreshold, M, RhoMax}
      def estSql(regs: String, keys: String): String = s"""
        (SELECT $keys,
                CASE WHEN $AlphaM2Pow / CAST(s_present
                            + ($M - n_present) * (CAST(1 AS BIGINT) << $RhoMax)
                            AS DOUBLE) <= $LcThreshold
                          AND $M - n_present > 0
                     THEN ${M.toDouble}
                            * ln(${M.toDouble} / CAST($M - n_present AS DOUBLE))
                     ELSE $AlphaM2Pow / CAST(s_present
                            + ($M - n_present) * (CAST(1 AS BIGINT) << $RhoMax)
                            AS DOUBLE)
                END AS approx_distinct
         FROM (SELECT $keys,
                      sum(CAST(1 AS BIGINT) << ($RhoMax - rho)) AS s_present,
                      count(*) AS n_present
               FROM $regs GROUP BY $keys) t)"""
      s"""
      WITH keyed AS (
        SELECT event_type, CAST(user_id AS VARCHAR) AS k
        FROM events WHERE event_type IN ('click', 'purchase') AND value >= 200),
      h AS (SELECT event_type,
                   CAST(concat('0x', substring(md5(k), 1, 15)) AS BIGINT) AS h
            FROM keyed),
      regs AS (SELECT event_type, h % $M AS register,
                      max(CASE WHEN h // $M = 0 THEN $RhoMax
                               ELSE $RhoMax - length(bin(h // $M)) END) AS rho
               FROM h GROUP BY 1, 2),
      uregs AS (SELECT 'u' AS seg, register, max(rho) AS rho
                FROM regs GROUP BY 2),
      ab AS ${estSql("regs", "event_type")},
      uu AS ${estSql("uregs", "seg")},
      ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_overlap FROM (
               SELECT k FROM keyed GROUP BY k
               HAVING count(DISTINCT event_type) = 2))
      SELECT 'click*purchase' AS pair,
             a.approx_distinct AS approx_click,
             b.approx_distinct AS approx_purchase,
             u.approx_distinct AS approx_union,
             a.approx_distinct + b.approx_distinct - u.approx_distinct AS approx_overlap,
             ex.exact_overlap,
             a.approx_distinct + b.approx_distinct - u.approx_distinct
               - CAST(ex.exact_overlap AS DOUBLE) AS overlap_err
      FROM (SELECT approx_distinct FROM ab WHERE event_type = 'click') a,
           (SELECT approx_distinct FROM ab WHERE event_type = 'purchase') b,
           (SELECT approx_distinct FROM uu) u, ex"""
    },
  )

  /** A28 — A/B experiment analysis as an A/A CALIBRATION: users are
    * deterministically hashed into two arms (the same Knuth
    * multiplicative hash the data-mix samplers share — reproducible,
    * retry-safe assignment is THE experiment-platform requirement),
    * purchase conversion is compared with the two-proportion pooled
    * z-test, and because both arms draw from the same population the
    * z-score MUST be insignificant — a harness that can't pass an A/A
    * test produces false launches. Real experiments swap the arm
    * predicate for treatment membership; the statistics don't change.
    *
    * 100 TB design: per-user conversion collapses map-side in one
    * hash aggregate; the arm rollup is a 2-row aggregate; the z
    * arithmetic is exact-count double expressions with identical
    * shape on both sides. */
  private val a28AbCalibration = Q(
    "a28_ab_calibration",
    (s, dir) => {
      // conversion = a ≥200-value purchase: EVERY user purchases at
      // least once in this lake, so plain purchase conversion is 100%
      // in both arms and the pooled variance degenerates to 0/0
      val perUser = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" && col("value") >= 200, 1L)
          .otherwise(0L)).as("converted"))
        .withColumn("arm",
          when(CurationQueries.mixBucketHash(col("user_id")) % 2 === 0, "A")
            .otherwise("B"))
      val arms = perUser.groupBy("arm")
        .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_converted"))
      val a = arms.filter(col("arm") === "A")
        .select(col("n_users").as("na"), col("n_converted").as("ca"))
      val b = arms.filter(col("arm") === "B")
        .select(col("n_users").as("nb"), col("n_converted").as("cb"))
      val naD = col("na").cast("double"); val nbD = col("nb").cast("double")
      val caD = col("ca").cast("double"); val cbD = col("cb").cast("double")
      val pa = caD / naD; val pb = cbD / nbD
      val pPool = (caD + cbD) / (naD + nbD)
      val z = (pa - pb) / nullif(
        sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / naD + lit(1.0) / nbD)), lit(0.0))
      a.crossJoin(broadcast(b))
        .select(col("na"), col("ca"), col("nb"), col("cb"),
          pa.as("rate_a"), pb.as("rate_b"), z.as("z_score"),
          (abs(z) > 1.96).as("significant"))
    },
    Some(s"""
      WITH pu AS (SELECT user_id,
                    max(CASE WHEN event_type = 'purchase' AND value >= 200
                             THEN 1 ELSE 0 END) AS converted,
                    CASE WHEN (${CurationQueries.mixBucketHashSql("user_id")}) % 2 = 0
                         THEN 'A' ELSE 'B' END AS arm
                  FROM events GROUP BY user_id),
      arms AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
                      CAST(sum(converted) AS BIGINT) AS n_converted
               FROM pu GROUP BY arm),
      ab AS (SELECT
               (SELECT n_users FROM arms WHERE arm = 'A') AS na,
               (SELECT n_converted FROM arms WHERE arm = 'A') AS ca,
               (SELECT n_users FROM arms WHERE arm = 'B') AS nb,
               (SELECT n_converted FROM arms WHERE arm = 'B') AS cb)
      SELECT na, ca, nb, cb,
             CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS rate_a,
             CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS rate_b,
             (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
               / nullif(sqrt((CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE)) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                      * (1.0 - (CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE)) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
                      * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))), 0.0) AS z_score,
             abs((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
               / nullif(sqrt((CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE)) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                      * (1.0 - (CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE)) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
                      * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))), 0.0)) > 1.96 AS significant
      FROM ab"""),
  )

  /** A20 — time-weighted average (TWAP-style): per user, the average
    * of `value` weighted by how LONG each value was the user's latest
    * — Σ value·Δt / ΣΔt with Δt the micros until the next event. The
    * metric behind session-quality and exposure analytics that a
    * plain AVG silently mis-states when events cluster (a spike held
    * for 1 s shouldn't weigh like a level held for a day), and the
    * only consumer of the lead()-over-time surface.
    *
    * Exactness: value is 2-dp → exact integer cents; Δt is exact
    * micros from the lead; each cents·Δt product is cast to
    * DECIMAL(38,0) BEFORE the sum (a LONG sum would wrap at ~70
    * day-scale events — DuckDB's HUGEINT sum is exact the same way),
    * so both sides divide the IDENTICAL exact integers once. The
    * decimal→double goes through VARCHAR on the DuckDB side (its
    * direct cast double-rounds; strtod is correctly rounded — the
    * a17_group_stats finding).
    *
    * 100 TB design: one user_id exchange feeds the lead window AND the
    * per-user aggregate (the agg rides the window's partitioning);
    * per-user chains are tens of rows, never a stratum. */
  private val a20Twap = Q(
    "a20_time_weighted_value",
    (s, dir) => {
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("dt", lead(col("tus"), 1).over(
          Window.partitionBy("user_id").orderBy(col("tus").asc, col("event_id").asc)) - col("tus"))
        .filter(col("dt").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dt")).as("span_micros"),
          sum((col("cents") * col("dt")).cast("decimal(38,0)")).as("ws"))
        .select(col("user_id"), col("n_intervals"), col("span_micros"),
          (col("ws").cast("double") / (col("span_micros") * 100L).cast("double"))
            .as("twap"))
        .orderBy("user_id")
      },
    Some("""
      WITH e AS (SELECT user_id, event_id,
                        CAST(round(value * 100, 0) AS BIGINT) AS cents,
                        epoch_us(ts) AS tus
                 FROM events),
      d AS (SELECT user_id, cents, tus,
                   lead(tus) OVER (PARTITION BY user_id
                     ORDER BY tus, event_id) - tus AS dt
            FROM e),
      a AS (SELECT user_id, count(*) AS n_intervals,
                   CAST(sum(dt) AS BIGINT) AS span_micros,
                   sum(cents * dt) AS ws
            FROM d WHERE dt IS NOT NULL GROUP BY 1)
      SELECT user_id, n_intervals, span_micros,
             CAST(CAST(ws AS VARCHAR) AS DOUBLE)
               / CAST(span_micros * 100 AS DOUBLE) AS twap
      FROM a ORDER BY user_id"""),
  )

  /** J13 — snowflake join chain (TPC-H Q5 shape): yearly revenue per
    * nation for one region — region ⋈ nation ⋈ customer ⋈ orders ⋈
    * lineitem, the deepest join tree in the suite and the
    * representative of the multi-way dimensional queries every
    * warehouse report runs.
    *
    * Scale shape: the region filter prunes nation BEFORE it reaches
    * customer, region/nation broadcast (dimension tables), customer
    * broadcasts under the default threshold at test scale and
    * shuffle-joins at 100 TB — either way the ONLY big-table exchanges
    * are orders⋈lineitem on the order key; the date filter pushes into
    * the orders scan (PushedFilters pinned below). Revenue is
    * Σ price·(1−disc) in exact DECIMAL (products exact at (22,4),
    * order-independent), one double cast at the end. */
  private val j13Snowflake = Q(
    "j13_snowflake_revenue",
    (s, dir) => {
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, dir)
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val c = Tables.customer(s, dir)
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "n_name")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
          .as("rev"))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(count(lit(1)).as("n_items"), sum(col("rev")).as("revenue"))
        .select(col("n_name"), col("o_year").cast("long").as("o_year"),
          col("n_items"), col("revenue").cast("double").as("revenue"))
        .orderBy("n_name", "o_year")
    },
    Some("""
      WITH n AS (SELECT n_nationkey, n_name FROM nation
                 JOIN region ON n_regionkey = r_regionkey
                 WHERE r_name = 'ASIA'),
      c AS (SELECT c_custkey, n_name FROM customer
            JOIN n ON c_nationkey = n_nationkey),
      o AS (SELECT o_orderkey, o_custkey,
                   CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'),
      li AS (SELECT l_orderkey,
                    CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(4,2))
                         - CAST(l_discount AS DECIMAL(4,2))) AS rev
             FROM lineitem)
      SELECT n_name, o_year, count(*) AS n_items,
             CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE) AS revenue
      FROM o JOIN c ON o_custkey = c_custkey
             JOIN li ON o_orderkey = l_orderkey
      GROUP BY 1, 2 ORDER BY 1, 2"""),
  )

  /** A21 — first/last-touch conversion attribution: every purchase is
    * attributed to the user's earliest and latest non-purchase event
    * inside a 7-day lookback, then conversions roll up per channel
    * under both models side by side — the marketing-attribution core
    * of the reference's activation layer (the Segment feed exists to
    * power exactly this analytic downstream;
    * `scripts/lambda_redshift_to_segment.py:327-424`).
    *
    * Shape: purchases equi-join the user's touch events on user_id
    * with the lookback as a residual range predicate (per-user
    * bounded, the J5/J11 class — never a cartesian); first/last touch
    * are ONE min/max of a (tus, event_id, event_type) struct per
    * purchase — lexicographic on a unique (time, id) prefix, so both
    * engines pick the identical row without a window; the channel
    * rollup is a conditional-count aggregate over the two models
    * unioned. All outputs are exact counts. */
  private val a21Attribution = Q(
    "a21_touch_attribution",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("tus"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"), col("tus").as("ptus"))
      val touches = ev.filter(col("event_type") =!= "purchase")
      val lookback = 7L * 86400L * 1000000L
      val attrib = purch.join(touches,
          purch("user_id") === touches("user_id") &&
            touches("tus") < purch("ptus") &&
            touches("tus") >= purch("ptus") - lookback)
        .groupBy(col("pid"))
        .agg(
          min(struct(col("tus"), col("event_id"), col("event_type"))).as("ft"),
          max(struct(col("tus"), col("event_id"), col("event_type"))).as("lt"))
      attrib.select(col("ft.event_type").as("channel"), lit(1L).as("first"),
          lit(0L).as("last"))
        .unionByName(attrib.select(col("lt.event_type").as("channel"),
          lit(0L).as("first"), lit(1L).as("last")))
        .groupBy("channel")
        .agg(sum(col("first")).as("first_touch_convs"),
          sum(col("last")).as("last_touch_convs"))
        .orderBy("channel")
    },
    Some("""
      WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
                  FROM events),
      p AS (SELECT user_id, event_id AS pid, tus AS ptus FROM ev
            WHERE event_type = 'purchase'),
      t AS (SELECT * FROM ev WHERE event_type <> 'purchase'),
      j AS (SELECT p.pid, t.event_type, t.tus, t.event_id
            FROM p JOIN t ON p.user_id = t.user_id
                         AND t.tus < p.ptus
                         AND t.tus >= p.ptus - 604800000000),
      r AS (SELECT pid, event_type,
                   row_number() OVER (PARTITION BY pid
                     ORDER BY tus, event_id) AS rf,
                   row_number() OVER (PARTITION BY pid
                     ORDER BY tus DESC, event_id DESC) AS rl
            FROM j),
      u AS (SELECT event_type AS channel, 1 AS first, 0 AS last
            FROM r WHERE rf = 1
            UNION ALL
            SELECT event_type, 0, 1 FROM r WHERE rl = 1)
      SELECT channel, CAST(sum(first) AS BIGINT) AS first_touch_convs,
             CAST(sum(last) AS BIGINT) AS last_touch_convs
      FROM u GROUP BY channel ORDER BY channel"""),
  )

  /** A22 — behavioral transition matrix: P(next event type | current)
    * per user journey — the first-order Markov model behind next-best-
    * action scoring and journey anomaly detection (the funnel A11
    * checks ONE prescribed path; this measures every observed edge).
    *
    * Shape: one user_id exchange feeds the lead window (per-user
    * chains, never a stratum); transitions collapse map-side to the
    * 5×5 type matrix; row totals come back as a ≤types-row broadcast;
    * the probability is ONE division of exact longs. */
  private val a22Transitions = Q(
    "a22_event_transitions",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("tus").asc, col("event_id").asc)
      val trans = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n_transitions"))
      val totals = trans.groupBy("from_type")
        .agg(sum(col("n_transitions")).as("n_from"))
      trans.join(broadcast(totals), "from_type")
        .select(col("from_type"), col("to_type"), col("n_transitions"),
          (col("n_transitions").cast("double") / col("n_from").cast("double"))
            .as("p"))
        .orderBy("from_type", "to_type")
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
                 FROM events),
      t AS (SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                     ORDER BY tus, event_id) AS to_type
            FROM e),
      c AS (SELECT from_type, to_type, count(*) AS n_transitions
            FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS n_from
              FROM c GROUP BY 1)
      SELECT c.from_type, c.to_type, c.n_transitions,
             CAST(c.n_transitions AS DOUBLE) / CAST(t2.n_from AS DOUBLE) AS p
      FROM c JOIN tot t2 USING (from_type)
      ORDER BY from_type, to_type"""),
  )

  /** A24 — cohort LTV curves: customers grouped by first-order month,
    * then cumulative revenue per cohort at each age-month and the
    * running LTV per cohort customer — the payback-curve view that
    * turns A12's retention counts into money (when does a cohort's
    * cumulative value cross acquisition cost).
    *
    * Shape: first-order months are one custkey aggregate joined back
    * (the cohort assignment); the (cohort, age) revenue aggregate
    * collapses map-side to cohorts×months METADATA rows, and the
    * cumulative window runs over those month chains — a window above
    * an Aggregate, never a stratum. Revenue stays DECIMAL through the
    * cumulative sum (exact, order-independent); the per-customer LTV
    * is ONE double division, decimal→double via the VARCHAR bridge on
    * the oracle side. */
  private val a24CohortLtv = Q(
    "a24_cohort_ltv",
    (s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).as("m"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      val first = o.groupBy("o_custkey").agg(min(col("m")).as("cohort_m"))
      val sizes = first.groupBy("cohort_m")
        .agg(countDistinct(col("o_custkey")).as("n_customers"))
      val rev = o.join(first, "o_custkey")
        .withColumn("age_months",
          months_between(col("m"), col("cohort_m")).cast("long"))
        .groupBy("cohort_m", "age_months")
        .agg(sum(col("price")).as("month_rev"))
      val w = Window.partitionBy("cohort_m").orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev.withColumn("cum_rev", sum(col("month_rev")).over(w))
        .join(broadcast(sizes), "cohort_m")
        .select(date_format(col("cohort_m"), "yyyy-MM").as("cohort"),
          col("age_months"), col("n_customers"),
          col("month_rev").cast("double").as("month_rev"),
          col("cum_rev").cast("double").as("cum_rev"),
          (col("cum_rev").cast("double") / col("n_customers").cast("double"))
            .as("ltv_per_customer"))
        .orderBy("cohort", "age_months")
    },
    Some("""
      WITH o AS (SELECT o_custkey,
                        date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
                        CAST(o_totalprice AS DECIMAL(18,2)) AS price
                 FROM orders),
      f AS (SELECT o_custkey, min(m) AS cohort_m FROM o GROUP BY 1),
      sz AS (SELECT cohort_m, CAST(count(DISTINCT o_custkey) AS BIGINT)
                      AS n_customers
             FROM f GROUP BY 1),
      rev AS (SELECT f.cohort_m,
                     CAST(date_diff('month', f.cohort_m, o.m) AS BIGINT)
                       AS age_months,
                     sum(o.price) AS month_rev
              FROM o JOIN f USING (o_custkey) GROUP BY 1, 2),
      c AS (SELECT cohort_m, age_months, month_rev,
                   sum(month_rev) OVER (PARTITION BY cohort_m
                     ORDER BY age_months ROWS UNBOUNDED PRECEDING) AS cum_rev
            FROM rev)
      SELECT strftime(c.cohort_m, '%Y-%m') AS cohort, c.age_months,
             sz.n_customers,
             CAST(CAST(c.month_rev AS VARCHAR) AS DOUBLE) AS month_rev,
             CAST(CAST(c.cum_rev AS VARCHAR) AS DOUBLE) AS cum_rev,
             CAST(CAST(c.cum_rev AS VARCHAR) AS DOUBLE)
               / CAST(sz.n_customers AS DOUBLE) AS ltv_per_customer
      FROM c JOIN sz USING (cohort_m)
      ORDER BY cohort, age_months"""),
  )

  private val WilsonZ = 1.96

  /** A23 — conversion rates with Wilson 95% confidence intervals: each
    * non-purchase event is a trial, converting when the same user
    * purchases within 24 h after it; per channel the rate ships with
    * its Wilson score interval — the uncertainty-aware readout an A/B
    * or channel-mix decision actually needs (a raw rate from 20 trials
    * and one from 20,000 look identical without the interval; Wilson
    * stays sane near 0/1 where the normal approximation dies).
    *
    * Determinism: trials/conversions are exact counts; the interval is
    * a fixed IEEE expression tree — divisions, one sqrt (correctly
    * rounded BY IEEE-754 REQUIREMENT, unlike ln) — evaluated in the
    * identical association order both sides, z² interpolated from one
    * Scala constant so both engines parse the same double.
    *
    * Shape: the 24 h conversion join is the J5 class (user equi-join +
    * residual range, per-user bounded); the distinct converted-trial
    * set and the channel rollup collapse map-side. */
  private val a23Wilson = Q(
    "a23_conversion_wilson",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("tus"))
      val touches = ev.filter(col("event_type") =!= "purchase")
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("tus").as("ptus"))
      val converted = touches.join(purch,
          touches("user_id") === col("p_user") &&
            col("ptus") > touches("tus") &&
            col("ptus") <= touches("tus") + lit(86400000000L))
        .select(touches("event_id")).distinct()
      val agg = touches
        .join(converted.withColumn("hit", lit(1L)), Seq("event_id"), "left")
        .groupBy(col("event_type").as("channel"))
        .agg(count(lit(1)).as("n_trials"),
          sum(coalesce(col("hit"), lit(0L))).as("n_converted"))
      val z2 = WilsonZ * WilsonZ
      val nD = col("n_trials").cast("double")
      val p = col("n_converted").cast("double") / nD
      val denom = lit(1.0) + lit(z2) / nD
      val center = (p + lit(z2) / (lit(2.0) * nD)) / denom
      val half = lit(WilsonZ) * sqrt(p * (lit(1.0) - p) / nD +
        lit(z2) / (lit(4.0) * nD * nD)) / denom
      agg.select(col("channel"), col("n_trials"), col("n_converted"),
          p.as("conv_rate"), (center - half).as("wilson_lo"),
          (center + half).as("wilson_hi"))
        .orderBy("channel")
    },
    Some {
      val z2 = WilsonZ * WilsonZ
      s"""
      WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
                  FROM events),
      t AS (SELECT * FROM ev WHERE event_type <> 'purchase'),
      pu AS (SELECT user_id AS p_user, tus AS ptus FROM ev
             WHERE event_type = 'purchase'),
      s AS (SELECT DISTINCT t.event_id
            FROM t JOIN pu ON t.user_id = p_user
                          AND ptus > t.tus
                          AND ptus <= t.tus + 86400000000),
      agg AS (SELECT event_type AS channel,
                     CAST(count(*) AS BIGINT) AS n_trials,
                     CAST(sum(CASE WHEN s.event_id IS NOT NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_converted
              FROM t LEFT JOIN s USING (event_id) GROUP BY 1),
      d AS (SELECT channel, n_trials, n_converted,
                   CAST(n_trials AS DOUBLE) AS nd,
                   CAST(n_converted AS DOUBLE) AS xd
            FROM agg)
      SELECT channel, n_trials, n_converted,
             xd / nd AS conv_rate,
             (xd / nd + $z2 / (2.0 * nd)) / (1.0 + $z2 / nd)
               - $WilsonZ * sqrt(xd / nd * (1.0 - xd / nd) / nd
                                 + $z2 / (4.0 * nd * nd))
                 / (1.0 + $z2 / nd) AS wilson_lo,
             (xd / nd + $z2 / (2.0 * nd)) / (1.0 + $z2 / nd)
               + $WilsonZ * sqrt(xd / nd * (1.0 - xd / nd) / nd
                                 + $z2 / (4.0 * nd * nd))
                 / (1.0 + $z2 / nd) AS wilson_hi
      FROM d ORDER BY channel"""
    },
  )

  private val HistBins = 32
  private val HistQs = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")

  /** A19 — histogram quantile sketch: per event type, p50/p90/p99 of
    * `value` estimated from a fixed 32-bin equi-width histogram, next
    * to the EXACT rank-arithmetic values so the estimation error is
    * self-auditing (the same discipline as the HLL and CMS rows). This
    * completes the mergeable-sketch trio — distinct (HLL), frequency
    * (CMS), distribution (histogram): bin counts are plain summable
    * rows, so per-day/per-partition histograms union and re-aggregate
    * into the global sketch without touching raw values again — the
    * Redshift/warehouse "approximate percentile over a pre-aggregated
    * cube" pattern Spark's buffering `percentile` can't serve at
    * 100 TB.
    *
    * Shape: one 1-row min/max aggregate broadcast back, one
    * (group, bin) aggregate that collapses map-side to ≤ groups×32
    * rows, cumulative windows over those METADATA rows (never the
    * data), and the exact side rides [[graft.operators.ExactQuantiles]].
    * Estimate arithmetic is identical-association IEEE: bin edges from
    * exact min/max doubles, counts exact longs, one interpolation per
    * quantile. */
  private val a19Hist = Q(
    "a19_histogram_quantiles",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
        .filter(col("value").isNotNull)
      val bounds = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      val binned = ev.crossJoin(broadcast(bounds))
        .withColumn("width", (col("hi") - col("lo")) / lit(HistBins.toDouble))
        .withColumn("bin", least(lit(HistBins - 1L),
          floor((col("value") - col("lo")) / col("width")).cast("long")))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("cnt"))
      val wcum = Window.partitionBy("event_type").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = binned
        .withColumn("cum", sum(col("cnt")).over(wcum))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy("event_type")))
        .withColumn("cum_before", col("cum") - col("cnt"))
        .crossJoin(broadcast(bounds))
        .withColumn("width", (col("hi") - col("lo")) / lit(HistBins.toDouble))
      val estAggs = HistQs.map { case (q, name) =>
        val p = col("n").cast("double") * lit(q)
        min(when(col("cum").cast("double") >= p &&
            col("cum_before").cast("double") < p,
          col("lo") + col("width") * (col("bin").cast("double") +
            (p - col("cum_before").cast("double")) / col("cnt").cast("double"))))
          .as(s"est_$name")
      }
      val est = c.groupBy("event_type")
        .agg(max(col("n")).as("n_events"), estAggs: _*)
      val exact = graft.operators.ExactQuantiles.perGroup(
          ev, Seq("event_type"), "value",
          HistQs.map { case (q, name) => (q, s"ex_$name") })
        .drop("n_value")
      est.join(exact, "event_type")
        .select(col("event_type") +: col("n_events") +:
          HistQs.flatMap { case (_, n) => Seq(col(s"est_$n"), col(s"ex_$n")) }: _*)
        .orderBy("event_type")
    },
    Some {
      val estSql = HistQs.map { case (q, name) =>
        s"""min(CASE WHEN CAST(cum AS DOUBLE) >= CAST(n AS DOUBLE) * $q
                      AND CAST(cum_before AS DOUBLE) < CAST(n AS DOUBLE) * $q
                     THEN lo + width * (CAST(bin AS DOUBLE)
                          + (CAST(n AS DOUBLE) * $q - CAST(cum_before AS DOUBLE))
                            / CAST(cnt AS DOUBLE))
                END) AS est_$name"""
      }.mkString(",\n             ")
      val exSql = HistQs.map { case (q, name) =>
        s"""round(sum(CASE WHEN rn = CAST(floor((n-1) * $q) AS BIGINT)
                             THEN val * (1.0 - ((n-1) * $q - floor((n-1) * $q)))
                           WHEN rn = CAST(floor((n-1) * $q) AS BIGINT) + 1
                                AND (n-1) * $q - floor((n-1) * $q) > 0
                             THEN val * ((n-1) * $q - floor((n-1) * $q))
                           ELSE 0.0 END), 4) AS ex_$name"""
      }.mkString(",\n             ")
      s"""
      WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
      b AS (SELECT min(value) AS lo, max(value) AS hi,
                   (max(value) - min(value)) / ${HistBins}.0 AS width
            FROM ev),
      binned AS (SELECT event_type,
                        least(${HistBins - 1},
                          CAST(floor((value - lo) / width) AS BIGINT)) AS bin,
                        count(*) AS cnt
                 FROM ev, b GROUP BY 1, 2),
      c AS (SELECT event_type, bin, cnt,
                   sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                     ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(cnt) OVER (PARTITION BY event_type) AS n
            FROM binned),
      c2 AS (SELECT c.*, cum - cnt AS cum_before, b.lo, b.width FROM c, b),
      est AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
             $estSql
             FROM c2 GROUP BY 1),
      r AS (SELECT event_type, CAST(value AS DOUBLE) AS val,
                   CAST(row_number() OVER (PARTITION BY event_type
                     ORDER BY CAST(value AS DOUBLE)) - 1 AS BIGINT) AS rn,
                   CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
            FROM ev),
      ex AS (SELECT event_type,
             $exSql
             FROM r GROUP BY 1)
      SELECT est.event_type, est.n_events,
             ${HistQs.map { case (_, n) => s"est.est_$n, ex.ex_$n" }.mkString(", ")}
      FROM est JOIN ex USING (event_type)
      ORDER BY event_type"""
    },
  )

  /** A25 — CORRELATED SUBQUERY, decorrelated (TPC-H Q17 shape): revenue
    * sitting in "small" order lines, where small means below 20% of
    * that PART's average quantity — the correlated scalar subquery
    * `l_quantity < (SELECT 0.2·avg(l_quantity) WHERE same part)` that
    * a naive engine re-executes per outer row. Spark-first the
    * decorrelation is explicit: ONE per-part aggregate over the fact
    * table, an equi-join back on the part key, a compiled filter — the
    * subquery becomes a same-key shuffle join (AQE broadcasts the
    * collapsed aggregate side when it fits).
    *
    * The 0.2·avg threshold is evaluated in EXACT integer arithmetic:
    * quantities are integral, so `qty < 0.2·(sum/n)` ⟺ `5·n·qty < sum`
    * — no double division on either side, hence no last-ulp boundary
    * row to disagree about with the oracle.
    *
    * 100 TB design: the per-part aggregate collapses map-side to
    * |parts| rows before its exchange; the fact table crosses ONE
    * exchange on l_partkey shared by the aggregate and the join
    * (co-partitioned, AQE-reused); the brand dimension broadcasts. */
  private val a25SmallQty = Q(
    "a25_small_quantity_revenue",
    (s, dir) => {
      val l = Tables.lineitem(s, dir).select(
        col("l_partkey"),
        col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice"))
      val stats = l.groupBy("l_partkey")
        .agg(sum(col("qty")).as("sq"), count(lit(1)).as("n"))
      val p = Tables.part(s, dir).select("p_partkey", "p_brand")
      l.join(stats, Seq("l_partkey"))
        .filter(col("qty") * lit(5L) * col("n") < col("sq"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_small_lines"),
          sumd(col("l_extendedprice")).as("small_revenue"))
        .orderBy("p_brand")
    },
    Some("""
      WITH l AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
                        l_extendedprice
                 FROM lineitem),
      s AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sq,
                   CAST(count(*) AS BIGINT) AS n
            FROM l GROUP BY 1)
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n_small_lines,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS small_revenue
      FROM l JOIN s USING (l_partkey)
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE qty * 5 * n < sq
      GROUP BY 1 ORDER BY 1"""),
  )

  /** J14 — INTERVAL-OVERLAP (range) join, big-big, without a cartesian:
    * which user pairs were active at the same time, and for how long
    * ("household / shared-device co-presence" — the identity-resolution
    * signal one step beyond `id_match_edges`' exact-contact fallback).
    * Sessions come from the same gap-close sessionizer as
    * `st6_session_rollup` (end = last event + 30 min, half-open
    * `[start, end)`); two sessions of DIFFERENT users overlap iff
    * `a.start < b.end AND b.start < a.end`.
    *
    * Spark has no native band/range join, and the naive spelling is a
    * theta self-join = CartesianProduct. This plans it as an EQUI-join:
    * each session explodes to its covered hour buckets
    * (`sequence(date_trunc(hour, start), date_trunc(hour, end))`), the
    * self-join runs on the bucket key, and the true overlap predicate
    * filters inside the bucket. A pair spanning many shared hours would
    * double-count, so emission is OWNED by exactly one bucket — the
    * hour containing `greatest(a.start, b.start)` (the overlap's first
    * instant, provably inside both sessions' bucket ranges): exactly-
    * once emission with zero `distinct`/dedup shuffle.
    *
    * 100 TB design: two narrow exploded scans + ONE shuffle on the
    * bucket key + a hash aggregate on (user_a, user_b); per-bucket
    * fanout is (concurrent sessions per hour)², bounded by picking the
    * bucket width near the median interval length — at higher
    * concurrency, narrow the bucket, never widen to a theta join. The
    * oracle brute-forces the same overlap with a plain theta join in
    * DuckDB, so the blocking scheme's exactly-once emission is what the
    * differential check proves. */
  private val j14Overlap = Q(
    "j14_session_overlap",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val sess = e
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("s_start"), col("w.end").as("s_end"))
      // 30-minute buckets as epoch-interval ordinals (date_trunc has no
      // sub-hour grain): per-bucket fanout is (concurrent sessions)² —
      // halving the width halves the pairs each bucket compares, while
      // the ownership filter keeps emission exactly-once for ANY width
      val bw = 1800L * 1000000L // bucket width in microseconds
      // (r12 measured 900 s buckets at sf0.1: replication cost cancels
      // the per-bucket pair reduction — 4.6 s both widths; 1800 s stays)
      def bucketOf(c: Column): Column = floor(unix_micros(c) / bw)
      // Sessionize ONCE: without the persist, the bucket self-join's
      // broadcast side is a BroadcastExchange (not a reusable shuffle),
      // so the full events scan + MergingSessions aggregation ran twice
      // per execution — the most expensive stage of the query, paid
      // double for identical rows. Same cache-scoping pattern as
      // dedup_ngram_jaccard: materialize, join, release.
      val buckets = sess.withColumn("bucket",
        explode(sequence(bucketOf(col("s_start")), bucketOf(col("s_end")))))
        .persist()
      val a = buckets.select(col("bucket"), col("user_id").as("user_a"),
        col("s_start").as("start_a"), col("s_end").as("end_a"))
      val b = buckets.select(col("bucket"), col("user_id").as("user_b"),
        col("s_start").as("start_b"), col("s_end").as("end_b"))
      val out = a.join(b, Seq("bucket"))
        .filter(col("user_a") < col("user_b"))
        .filter(col("start_a") < col("end_b") && col("start_b") < col("end_a"))
        .filter(col("bucket") ===
          bucketOf(greatest(col("start_a"), col("start_b"))))
        .withColumn("ov_us",
          unix_micros(least(col("end_a"), col("end_b"))) -
            unix_micros(greatest(col("start_a"), col("start_b"))))
        .groupBy("user_a", "user_b")
        .agg(count(lit(1)).as("n_overlaps"), sum(col("ov_us")).as("total_overlap_us"))
        .orderBy("user_a", "user_b")
        .persist()
      // unpersist in finally: a failed materialization would otherwise
      // leak the sessionized frame for the session lifetime (the
      // harness only unpersists the RETURNED frame)
      try out.count()
      finally buckets.unpersist()
      out
    },
    Some("""
      WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged),
      s2 AS (
        SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end
        FROM sess GROUP BY user_id, sid)
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             count(*) AS n_overlaps,
             CAST(sum(epoch_us(least(a.s_end, b.s_end))
                      - epoch_us(greatest(a.s_start, b.s_start))) AS BIGINT)
               AS total_overlap_us
      FROM s2 a JOIN s2 b
        ON a.user_id < b.user_id
       AND a.s_start < b.s_end AND b.s_start < a.s_end
      GROUP BY 1, 2 ORDER BY user_a, user_b"""),
  )

  // --------------------------------------- J15: sole-late supplier (Q21)
  /** TPC-H Q21 shape — "suppliers who kept orders waiting": for each
    * supplier, how many multi-supplier orders had THAT supplier as the
    * only one with a returned line. (This lake carries no
    * receipt/commit dates, so `l_returnflag = 'R'` stands in for
    * "late" — the join topology, which is the operator under test, is
    * unchanged.) The textbook phrasing is a correlated
    * EXISTS (another supplier in the order) + NOT EXISTS (another
    * LATE supplier) — and the DuckDB oracle runs EXACTLY that
    * phrasing, so the differential proves the rewrite below.
    *
    * 100 TB design: the correlated sub-queries decorrelate into
    * per-(order, supplier) flags + two windowed counts over the ORDER
    * — a window whose group is one order's suppliers (single digits),
    * never a stratum. The fact table crosses two exchanges (the
    * (orderkey, suppkey) aggregate, then the orderkey window); the
    * EXISTS/NOT-EXISTS never materialize as self-joins, so there is
    * no second corpus-sized shuffle pair. Supplier and nation dims
    * broadcast. */
  private val j15SoleLate = Q(
    "j15_sole_late_supplier",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val perSupp = li.groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("is_late"))
      val win = Window.partitionBy("l_orderkey")
      val sole = perSupp
        .withColumn("n_supp", count(lit(1)).over(win))
        .withColumn("n_late", sum(col("is_late")).over(win))
        .filter(col("is_late") === 1L && col("n_supp") >= 2 && col("n_late") === 1L)
      val numwait = sole.groupBy("l_suppkey")
        .agg(count(lit(1)).as("numwait"))
      numwait
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
    },
    Some("""
      WITH late AS (SELECT DISTINCT l_orderkey, l_suppkey
                    FROM lineitem WHERE l_returnflag = 'R'),
      alls AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      sole AS (SELECT l.l_orderkey, l.l_suppkey FROM late l
               WHERE EXISTS (SELECT 1 FROM alls a
                             WHERE a.l_orderkey = l.l_orderkey
                               AND a.l_suppkey <> l.l_suppkey)
                 AND NOT EXISTS (SELECT 1 FROM late o
                                 WHERE o.l_orderkey = l.l_orderkey
                                   AND o.l_suppkey <> l.l_suppkey))
      SELECT s.s_suppkey, s.s_name, n.n_name,
             CAST(count(*) AS BIGINT) AS numwait
      FROM sole j
      JOIN supplier s ON j.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2, 3
      ORDER BY numwait DESC, s.s_suppkey"""),
  )

  val all: Seq[Q] = Seq(
    j14Overlap, a25SmallQty, j15SoleLate,
    w1, w3, w4, a1, a2, a3, a5, a6, a11Funnel, a12Cohorts, a13Hopping,
    st6Sessions, j1, o3, j3, j9, j5, o2, setOps, pClean, p2, p8, s1, s11, s5, s8,
    s8bloom, j10, j20Nearest, graphPagerank, graphTriangles, graphLpa, a14Cube, a14bRollup, a15Pivot, a16Basket, w5Rolling,
    j12Reconcile, w6GapFill, a17Stats, w7Gaps, w8Ewma, w13Holt, w9Locf, w10Ranks, w11ScalableRanks, w14ValueWindows, a18Hll, a26HllRollup, a27Overlap, a28AbCalibration, a29Anomalies, a30NewReturning, a31RevShare, a32ConvLatency, a33Gini, statsJoinSize, statsAutoplanJoin, sq1Exists, sq2NotExists, sq3ScalarAvg, sq4In, sq5NotIn, sq6Lateral, sq7SelectCount, sq12ExistsOr, a34Cube, a35Pivot, w12RangeFrames, j21NationTrade, set2BagOps, graphKcore, graphBfs, a36Custdist, a37GroupingSets, a38Unpivot, a19Hist,
    a20Twap, a21Attribution, a22Transitions, a23Wilson, a24CohortLtv,
    j13Snowflake)
}
