package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar-function family queries — one differential entry per family
  * from SURVEY.md §2.8 (date/time, math with guarded division,
  * conditional ladders, JSON/map, hash ids, permissive casts). The
  * string/regex/LIKE/array families live in MiscQueries.
  *
  * All are single-pass projections: no shuffle except the final
  * presentation sort, so they stay inside one WholeStageCodegen span
  * and scale linearly with input.
  */
object FunctionQueries {

  // -------------------------------------------------------------- F-date
  /** Date/time family (reference `sql/customer_360_views.sql:129-171`,
    * `identity-resolution/database-schema.sql:306-355`): year extract,
    * month formatting, date arithmetic against a fixed as-of date,
    * ISO timestamp formatting. */
  private val fDate = Q(
    "f_date_functions",
    (s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
        datediff(lit("2024-06-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_before_asof"),
        date_format(date_sub(col("o_orderdate").cast("date"), 7), "yyyy-MM-dd")
          .as("week_earlier"),
        date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("iso_ts"))
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS BIGINT) AS order_year,
             strftime(o_orderdate, '%Y-%m') AS order_month,
             datediff('day', CAST(o_orderdate AS DATE), DATE '2024-06-01') AS days_before_asof,
             strftime(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY, '%Y-%m-%d') AS week_earlier,
             strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso_ts
      FROM orders ORDER BY o_orderkey"""),
  )

  // -------------------------------------------------------------- F-math
  /** Math family (reference `database-schema.sql:327-336`,
    * `customer_360_views.sql:157,444`): ROUND, NULLIF-guarded division,
    * exact decimal money arithmetic, modulo bucketing. */
  private val fMath = Q(
    "f_math_guarded",
    (s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1.00).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")), 2)
          .cast("double").as("revenue"),
        round(col("l_quantity") / nullif(col("l_tax"), lit(0.0)), 4).as("qty_per_tax"),
        (col("l_orderkey") % 97).as("bucket_97"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))), 2)
                  AS DOUBLE) AS revenue,
             round(l_quantity / nullif(l_tax, 0.0), 4) AS qty_per_tax,
             l_orderkey % 97 AS bucket_97
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
  )

  // -------------------------------------------------------------- F-cond
  /** Conditional family (reference `customer_360_views.sql:93-167,
    * 473-482`): CASE ladder bucketing, IN-lists, BETWEEN, COALESCE with
    * empty-string normalization. */
  private val fCond = Q(
    "f_cond_buckets",
    (s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        when(col("c_acctbal") >= 5000, "high")
          .when(col("c_acctbal") >= 1000, "mid")
          .when(col("c_acctbal") >= 0, "low")
          .otherwise("negative").as("balance_band"),
        col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY").as("is_target_segment"),
        col("c_acctbal").between(0, 1000).as("is_small_positive"),
        coalesce(nullif(trim(col("c_name")), lit("")), lit("UNKNOWN")).as("display_name"))
        .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey,
             CASE WHEN c_acctbal >= 5000 THEN 'high'
                  WHEN c_acctbal >= 1000 THEN 'mid'
                  WHEN c_acctbal >= 0 THEN 'low'
                  ELSE 'negative' END AS balance_band,
             c_mktsegment IN ('AUTOMOBILE', 'MACHINERY') AS is_target_segment,
             c_acctbal BETWEEN 0 AND 1000 AS is_small_positive,
             coalesce(nullif(trim(c_name), ''), 'UNKNOWN') AS display_name
      FROM customer ORDER BY c_custkey"""),
  )

  // -------------------------------------------------------------- F-json
  /** JSON/map family (reference JSONB columns
    * `database-schema.sql:49,78,211-213` + event payload build
    * `lambda_redshift_to_segment.py:327-424`): parse a JSON props
    * string into a typed map, extract a key, re-serialize a struct. */
  private val fJson = Q(
    "f_json_roundtrip",
    (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        element_at(from_json(col("props"), lit("map<string,bigint>")), "k").as("k_val"),
        to_json(struct(col("event_type"),
          element_at(from_json(col("props"), lit("map<string,bigint>")), "k").as("k")))
          .as("event_json"))
        .orderBy("event_id"),
    Some("""
      SELECT event_id,
             CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_val,
             '{"event_type":"' || event_type || '","k":' ||
               regexp_extract(props, '"k": ([0-9]+)', 1) || '}' AS event_json
      FROM events ORDER BY event_id"""),
  )

  // -------------------------------------------------------------- F-hash
  /** Hash/id family (reference deterministic messageId
    * `lambda_redshift_to_segment.py:316-325`): md5 over a joined key,
    * hash prefix bucketing, sha-256. uuid() is excluded by design —
    * nondeterministic ids break replay idempotence (ST2); the engine's
    * id story IS the deterministic md5. */
  private val fHash = Q(
    "f_hash_ids",
    (s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        md5(concat_ws("_", lit("order"), col("o_orderkey"), col("o_custkey")))
          .as("message_id"),
        substring(md5(col("o_orderstatus")), 1, 8).as("status_hash8"),
        sha2(col("o_orderpriority").cast("binary"), 256).as("priority_sha256"))
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
             md5('order_' || CAST(o_orderkey AS VARCHAR) || '_' || CAST(o_custkey AS VARCHAR))
               AS message_id,
             substr(md5(o_orderstatus), 1, 8) AS status_hash8,
             sha256(o_orderpriority) AS priority_sha256
      FROM orders ORDER BY o_orderkey"""),
  )

  // -------------------------------------------------------------- F-cast
  /** Permissive-cast family (reference Python float-or-null coercion
    * `lambda_redshift_to_segment.py:248-254`, P2 cast map): TRY_CAST
    * turns unparseable values into NULL instead of failing the job —
    * the "bad value → NULL" contract a 100 TB dirty-CSV load needs. */
  private val fCast = Q(
    "f_try_casts",
    (s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        expr("TRY_CAST(c_name AS BIGINT)").as("name_as_int"),
        expr("TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT)").as("name_digits"),
        expr("TRY_CAST(c_mktsegment AS DECIMAL(10,2))").cast("double").as("segment_as_num"),
        expr("CAST(TRY_CAST(concat('2024-', CAST(c_custkey % 20 AS STRING), '-01') AS DATE) AS STRING)")
          .as("maybe_date"))
        .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey,
             TRY_CAST(c_name AS BIGINT) AS name_as_int,
             TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_digits,
             CAST(TRY_CAST(c_mktsegment AS DECIMAL(10,2)) AS DOUBLE) AS segment_as_num,
             CAST(TRY_CAST('2024-' || CAST(c_custkey % 20 AS VARCHAR) || '-01' AS DATE) AS VARCHAR)
               AS maybe_date
      FROM customer ORDER BY c_custkey"""),
  )

  /** Advanced string-function surface — the second string family
    * beyond MiscQueries' regex/LIKE/basics: ucfirst display-name
    * normalization, translate (character scrubbing), levenshtein
    * (the fuzzy-match distance U5 scores with, here exposed raw),
    * reverse / repeat / left-right slicing. One codegen'd projection
    * pass over the customer dimension; every function chosen to mean
    * the same thing in DuckDB so the differential is a function-level
    * conformance check. */
  private val fStr2 = Q(
    "f_string_advanced",
    (s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        // ucfirst spelled explicitly: DuckDB (this build) has no initcap,
        // and Spark's is per-word — the explicit form means ONE thing
        concat(upper(substring(col("c_mktsegment"), 1, 1)),
          lower(substring(col("c_mktsegment"), 2, 100))).as("seg_display"),
        translate(col("c_name"), "#0", "-x").as("scrubbed"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).as("lev_building"),
        reverse(col("c_mktsegment")).as("seg_rev"),
        concat(repeat(lit("*"), (col("c_custkey") % 4 + 1).cast("int")),
          substring(col("c_name"), -4, 4)).as("masked_tail"))
        .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey,
             upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2, 100))
               AS seg_display,
             translate(c_name, '#0', '-x') AS scrubbed,
             CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS lev_building,
             reverse(c_mktsegment) AS seg_rev,
             repeat('*', CAST(c_custkey % 4 + 1 AS INT)) || right(c_name, 4) AS masked_tail
      FROM customer ORDER BY c_custkey"""),
  )

  /** Advanced calendar surface beyond `f_date_functions`: quarter,
    * ISO week, month-end (last_day), and day-of-week — the last
    * NORMALIZED to ISO 1=Monday..7=Sunday by arithmetic on both
    * sides, because the raw builtins disagree (Spark's dayofweek is
    * 1=Sunday, DuckDB's dow is 0=Sunday): the conformance value IS
    * pinning one cross-engine meaning for the trap functions. */
  private val fDate2 = Q(
    "f_date_advanced",
    (s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        // Spark dayofweek: 1=Sunday..7=Saturday → ISO via ((x+5)%7)+1
        (((dayofweek(col("o_orderdate")) + 5) % 7) + 1).cast("long").as("iso_dow"))
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS d,
             CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
             CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
             strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
             -- DuckDB dayofweek: 0=Sunday..6=Saturday → ISO via ((x+6)%7)+1
             CAST((CAST(dayofweek(o_orderdate) AS BIGINT) + 6) % 7 + 1 AS BIGINT) AS iso_dow
      FROM orders ORDER BY o_orderkey"""),
  )

  /** Calendar-interval conformance — the arithmetic class where engines
    * genuinely diverge and `f_date_advanced`'s extraction functions
    * can't catch it: month addition must CLAMP at end-of-month (Jan 31
    * + 1 month = Feb 29/28, not Mar 2/3), year-over-year must survive
    * leap day (Feb 29 + 12 months = Feb 28), week truncation must
    * agree on the week start (both engines: Monday), and day
    * arithmetic must be pure day counts. The order-date domain spans
    * 1995-2001, so real month-ends and both leap years (1996, 2000)
    * exercise every clamp branch. `months_between` is deliberately
    * NOT pinned: Spark's 31-day-fraction convention has no DuckDB
    * twin (date_diff('month') counts boundary crossings — a
    * different function), and pinning a fake equivalence would paper
    * over exactly the divergence this query exists to surface. */
  private val fCal = Q(
    "f_calendar_intervals",
    (s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        date_format(add_months(col("o_orderdate"), 1), "yyyy-MM-dd").as("plus_1m"),
        date_format(add_months(col("o_orderdate"), 12), "yyyy-MM-dd").as("plus_12m"),
        date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd").as("week_start"),
        datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_y2k"),
        date_format(date_add(col("o_orderdate").cast("date"), -45), "yyyy-MM-dd")
          .as("minus_45d"))
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS d,
             strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus_1m,
             strftime(o_orderdate + INTERVAL 12 MONTH, '%Y-%m-%d') AS plus_12m,
             strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT)
               AS days_to_y2k,
             strftime(CAST(o_orderdate AS DATE) - 45, '%Y-%m-%d') AS minus_45d
      FROM orders ORDER BY o_orderkey"""),
  )

  val all: Seq[Q] = Seq(fDate, fMath, fCond, fJson, fHash, fCast, fStr2, fDate2, fCal)
}
