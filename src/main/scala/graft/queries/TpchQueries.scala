package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** TPC-H-shape conformance wave: the classic decision-support query
  * shapes not yet pinned by the existing surface (Q17/Q21/Q11/Q7/Q13/
  * Q4/Q5 shapes live in [[RelationalQueries]]), adapted to this lake's
  * reduced star schema — no `partsupp`, no ship-mode/commit-date
  * columns, so each query keeps the SHAPE (the join topology, the
  * subquery class, the predicate structure the optimizer must handle)
  * while re-anchoring constants on columns that exist. The reference
  * delegates exactly this query class to Redshift
  * (`sql/customer_360_views.sql`, `sql/redshift_table_schemas.sql`);
  * a user switching to this engine writes these daily.
  *
  * Float discipline (see [[Q]] scaladoc): revenue terms are
  * DECIMAL(18,2) × (1 − DECIMAL(4,2)) summed exactly and converted to
  * DOUBLE once through the VARCHAR bridge; thresholds compare in
  * integer/decimal space so no boundary row can flip cross-engine.
  */
object TpchQueries {

  /** Exact revenue term: extendedprice·(1−discount) in DECIMAL. */
  private def rev(price: Column, disc: Column): Column =
    price.cast("decimal(18,2)") *
      (lit(1).cast("decimal(4,2)") - disc.cast("decimal(4,2)"))

  /** Exact decimal sum → one double conversion (cross-engine stable). */
  private def sumRev(price: Column, disc: Column): Column =
    sum(rev(price, disc)).cast("string").cast("double")

  // ------------------------------------------------------------------ Q3
  /** J22 — shipping-priority (TPC-H Q3 shape): the top 10 unshipped
    * orders by open revenue for one market segment at a cutoff date —
    * the canonical dim-filter → fact-join → top-k plan. 100 TB story:
    * the segment filter lands on the customer DIM leg (broadcast, 1/5
    * of customers), the date filters push into BOTH fact scans
    * (`PushedFilters` on o_orderdate and l_shipdate), and the top-10
    * compiles to TakeOrderedAndProject — per-partition heaps and a
    * 10-row driver merge, never a global sort of the aggregate. */
  private val j22Q3 = Q(
    "j22_shipping_priority",
    (s, dir) => {
      val cutoff = "1998-06-01"
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate").cast("date") < lit(cutoff).cast("date"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate").cast("date") > lit(cutoff).cast("date"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(sumRev(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""
      SELECT l.l_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
             CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                           (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                  AS VARCHAR) AS DOUBLE) AS revenue
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND CAST(o.o_orderdate AS DATE) < DATE '1998-06-01'
        AND CAST(l.l_shipdate AS DATE) > DATE '1998-06-01'
      GROUP BY 1, 2
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10"""),
  )

  // ----------------------------------------------------------------- Q10
  /** J23 — returned-item revenue loss (TPC-H Q10 shape): the top 20
    * customers by revenue on returned lines in one quarter — the
    * churn-risk report joining fact → orders → customer → nation.
    * 100 TB story: the quarter predicate pushes into the orders scan
    * and the returnflag predicate into the lineitem scan BEFORE the
    * orderkey join; nation broadcasts; top-20 is TakeOrdered. The
    * output carries c_acctbal (2-dp, exact in double) — the classic
    * "is this a customer worth saving" column. */
  private val j23Q10 = Q(
    "j23_returned_revenue_loss",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate").cast("date") >= lit("1998-01-01").cast("date") &&
          col("o_orderdate").cast("date") < lit("1998-04-01").cast("date"))
        .select("o_orderkey", "o_custkey")
      val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
      val c = Tables.customer(s, dir)
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(count(lit(1)).as("n_lines"),
          sumRev(col("l_extendedprice"), col("l_discount")).as("lost_revenue"))
        .orderBy(col("lost_revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""
      SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                           (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                  AS VARCHAR) AS DOUBLE) AS lost_revenue
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'R'
        AND CAST(o.o_orderdate AS DATE) >= DATE '1998-01-01'
        AND CAST(o.o_orderdate AS DATE) <  DATE '1998-04-01'
      GROUP BY 1, 2, 3, 4
      ORDER BY lost_revenue DESC, c_custkey
      LIMIT 20"""),
  )

  // ----------------------------------------------------------------- Q12
  /** A39 — late-shipment priority mix (TPC-H Q12 shape; this lake has
    * no ship mode, so the classification dimension is l_linestatus):
    * for lines shipped ≥ 90 days after order placement, how many came
    * from high-priority vs low-priority orders — the conditional-count
    * pivot over a fact⋈fact date predicate. 100 TB story: the join is
    * one orderkey shuffle, the date predicate is compiled row-level
    * arithmetic (no window), and the conditional counts collapse
    * map-side to |linestatus| rows. */
  private val a39Q12 = Q(
    "a39_priority_ship_lag",
    (s, dir) => {
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, dir).select("l_orderkey", "l_linestatus", "l_shipdate")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate").cast("date") >=
          date_add(col("o_orderdate").cast("date"), 90))
        .groupBy("l_linestatus")
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_priority_lines"),
          sum(when(high, 0L).otherwise(1L)).as("low_priority_lines"))
        .orderBy("l_linestatus")
    },
    Some("""
      SELECT l.l_linestatus,
             CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
             CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                           THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_lines
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE) + 90
      GROUP BY 1 ORDER BY 1"""),
  )

  // ----------------------------------------------------------------- Q14
  /** A40 — promo revenue share by month (TPC-H Q14 shape): what
    * fraction of each month's revenue came from PROMO-type parts — the
    * conditional-aggregate ratio over a fact⋈dim join, by period.
    * The share divides two VARCHAR-bridged exact decimal sums — ONE
    * IEEE division of identical operands per engine, bit-stable.
    * 100 TB story: part broadcasts (2 columns), the month rollup
    * collapses map-side to |months| rows; no per-month subquery. */
  private val a40Q14 = Q(
    "a40_promo_revenue_share",
    (s, dir) => {
      val p = Tables.part(s, dir).select("p_partkey", "p_type")
      Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_shipdate"),
          rev(col("l_extendedprice"), col("l_discount")).as("rv"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rv"))
            .otherwise(lit(0).cast("decimal(18,2)")))
            .cast("string").cast("double").as("promo_revenue"),
          sum(col("rv")).cast("string").cast("double").as("total_revenue"))
        .withColumn("promo_share", col("promo_revenue") / col("total_revenue"))
        .orderBy("ship_month")
    },
    Some("""
      WITH m AS (
        SELECT strftime(l.l_shipdate, '%Y-%m') AS ship_month,
               CAST(CAST(sum(CASE WHEN p.p_type = 'PROMO'
                             THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                                  (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                             ELSE CAST(0 AS DECIMAL(18,2)) END)
                    AS VARCHAR) AS DOUBLE) AS promo_revenue,
               CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                             (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                    AS VARCHAR) AS DOUBLE) AS total_revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1)
      SELECT ship_month, promo_revenue, total_revenue,
             promo_revenue / total_revenue AS promo_share
      FROM m ORDER BY ship_month"""),
  )

  // ----------------------------------------------------------------- Q15
  /** SQ8 — top supplier (TPC-H Q15 shape): the supplier(s) whose
    * quarterly revenue equals the MAX over all suppliers — the
    * scalar-subquery-over-aggregate class (Q15's CREATE VIEW + max
    * correlate). Written AS SQL so Catalyst's one-shot scalar subquery
    * is what's pinned: the revenue CTE computes once, the max is a
    * 1-row broadcast back onto it — never a re-scan per supplier.
    * Revenue equality compares EXACT decimal sums, so the "which
    * supplier is top" answer cannot flip on a last-ulp double.
    * DuckDB side materializes the twice-referenced CTE. */
  private val sq8Q15 = Q(
    "sq8_top_supplier",
    (s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("sq_lineitem")
      Tables.supplier(s, dir).createOrReplaceTempView("sq_supplier")
      s.sql("""
        WITH r AS (
          SELECT l_suppkey,
                 sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total
          FROM sq_lineitem
          WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
            AND CAST(l_shipdate AS DATE) <  DATE '1998-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name,
               CAST(CAST(total AS STRING) AS DOUBLE) AS total_revenue
        FROM sq_supplier JOIN r ON s_suppkey = l_suppkey
        WHERE total = (SELECT max(total) FROM r)
        ORDER BY s_suppkey""")
    },
    Some("""
      WITH r AS MATERIALIZED (
        SELECT l_suppkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                   (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
          AND CAST(l_shipdate AS DATE) <  DATE '1998-04-01'
        GROUP BY l_suppkey)
      SELECT s.s_suppkey, s.s_name,
             CAST(CAST(r.total AS VARCHAR) AS DOUBLE) AS total_revenue
      FROM supplier s JOIN r ON s.s_suppkey = r.l_suppkey
      WHERE r.total = (SELECT max(total) FROM r)
      ORDER BY s.s_suppkey"""),
  )

  // ----------------------------------------------------------------- Q16
  /** A41 — supplier variety per part class (TPC-H Q16 shape, partsupp
    * re-anchored on observed lineitem supply): COUNT(DISTINCT supplier)
    * per (brand, type, size bucket), excluding one brand/type and — the
    * class under test — suppliers in a NOT IN subquery (negative
    * balance). NOT IN over a nullable-free key must plan as a hash
    * anti join; the distinct count shuffles once on the group key.
    * 100 TB story: the 6-row exclusion list broadcasts as a null-aware
    * anti build; no per-group subquery. */
  private val a41Q16 = Q(
    "a41_part_supplier_variety",
    (s, dir) => {
      Tables.part(s, dir).createOrReplaceTempView("sq_part")
      Tables.lineitem(s, dir).createOrReplaceTempView("sq_lineitem")
      Tables.supplier(s, dir).createOrReplaceTempView("sq_supplier")
      s.sql("""
        SELECT p_brand, p_type, p_size DIV 10 AS size_bucket,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM sq_part JOIN sq_lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#45' AND p_type <> 'ECONOMY'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM sq_supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, size_bucket
        ORDER BY supplier_cnt DESC, p_brand, p_type, size_bucket""")
    },
    Some("""
      SELECT p_brand, p_type, p_size // 10 AS size_bucket,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM part JOIN lineitem ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#45' AND p_type <> 'ECONOMY'
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, size_bucket"""),
  )

  // ----------------------------------------------------------------- Q18
  /** SQ9 — large-volume orders (TPC-H Q18 shape): customers whose
    * orders total > 250 units — IN over a GROUP BY … HAVING subquery,
    * the membership-after-aggregation class. Catalyst plans the
    * subquery ONCE (aggregate → semi join on orderkey); quantities sum
    * as BIGINT so the 250 threshold is exact. 100 TB story: the HAVING
    * aggregate collapses map-side per orderkey before its shuffle, and
    * the semi join + final rollup share the orderkey partitioning. */
  private val sq9Q18 = Q(
    "sq9_large_volume_orders",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("sq_customer")
      Tables.orders(s, dir).createOrReplaceTempView("sq_orders")
      Tables.lineitem(s, dir).createOrReplaceTempView("sq_lineitem")
      s.sql("""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice,
               sum(CAST(l_quantity AS BIGINT)) AS total_qty
        FROM sq_customer JOIN sq_orders ON c_custkey = o_custkey
        JOIN sq_lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM sq_lineitem
                             GROUP BY l_orderkey
                             HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
        GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey""")
    },
    Some("""
      SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
      GROUP BY 1, 2, 3, 4
      ORDER BY o_totalprice DESC, o_orderkey"""),
  )

  // ----------------------------------------------------------------- Q19
  /** J24 — disjunctive-predicate join (TPC-H Q19 shape): revenue from
    * three OR'd (brand, size-range, quantity-range) branches — the
    * query class where a weak optimizer degrades to a cartesian
    * because the join key hides inside the disjunction. Catalyst must
    * extract the common `p_partkey = l_partkey` conjunct into the join
    * and leave the OR as a post-join compiled filter; the part dim
    * broadcasts. Grouped by brand so all three branches land as
    * visible rows (both polarities per branch). */
  private val j24Q19 = Q(
    "j24_disjunctive_predicate_join",
    (s, dir) => {
      val p = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
      val l = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          col("l_extendedprice"), col("l_discount"))
      val branch =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("qty").between(1L, 20L)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("qty").between(10L, 30L)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
          col("qty").between(20L, 40L))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(branch)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_lines"),
          sumRev(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy("p_brand")
    },
    Some("""
      SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                           (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                  AS VARCHAR) AS DOUBLE) AS revenue
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
             AND CAST(l.l_quantity AS BIGINT) BETWEEN 1 AND 20)
         OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
             AND CAST(l.l_quantity AS BIGINT) BETWEEN 10 AND 30)
         OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
             AND CAST(l.l_quantity AS BIGINT) BETWEEN 20 AND 40)
      GROUP BY 1 ORDER BY 1"""),
  )

  // ----------------------------------------------------------------- Q20
  /** SQ10 — dominant promo suppliers (TPC-H Q20 shape, availqty
    * re-anchored as shipped share): suppliers who shipped more than
    * half of some PROMO part's 1998 volume — the two-level nested
    * subquery class (IN over a join of two HAVING-style aggregates,
    * itself filtered by an IN over a dim scan). Both aggregates
    * collapse map-side per (part[,supplier]) and join on the part key;
    * the dim IN-list plans as a broadcast semi join — nothing
    * re-executes per supplier. The 2·sq > tq dominance test is exact
    * BIGINT arithmetic. */
  private val sq10Q20 = Q(
    "sq10_dominant_promo_suppliers",
    (s, dir) => {
      Tables.part(s, dir).createOrReplaceTempView("sq_part")
      Tables.supplier(s, dir).createOrReplaceTempView("sq_supplier")
      Tables.lineitem(s, dir).createOrReplaceTempView("sq_lineitem")
      s.sql("""
        SELECT s_suppkey, s_name
        FROM sq_supplier
        WHERE s_suppkey IN (
          SELECT ps.l_suppkey
          FROM (SELECT l_suppkey, l_partkey,
                       sum(CAST(l_quantity AS BIGINT)) AS sq
                FROM sq_lineitem
                WHERE l_partkey IN (SELECT p_partkey FROM sq_part
                                    WHERE p_type = 'PROMO')
                  AND CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
                  AND CAST(l_shipdate AS DATE) <  DATE '1999-01-01'
                GROUP BY l_suppkey, l_partkey) ps
          JOIN (SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS tq
                FROM sq_lineitem
                WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
                  AND CAST(l_shipdate AS DATE) <  DATE '1999-01-01'
                GROUP BY l_partkey) t
            ON ps.l_partkey = t.l_partkey
          WHERE 2 * ps.sq > t.tq)
        ORDER BY s_suppkey""")
    },
    Some("""
      SELECT s_suppkey, s_name
      FROM supplier
      WHERE s_suppkey IN (
        SELECT ps.l_suppkey
        FROM (SELECT l_suppkey, l_partkey,
                     sum(CAST(l_quantity AS BIGINT)) AS sq
              FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_type = 'PROMO')
                AND CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
                AND CAST(l_shipdate AS DATE) <  DATE '1999-01-01'
              GROUP BY 1, 2) ps
        JOIN (SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS tq
              FROM lineitem
              WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
                AND CAST(l_shipdate AS DATE) <  DATE '1999-01-01'
              GROUP BY 1) t
          ON ps.l_partkey = t.l_partkey
        WHERE 2 * ps.sq > t.tq)
      ORDER BY s_suppkey"""),
  )

  // ------------------------------------------------------------------ Q2
  /** SQ11 — cheapest supplier per part (TPC-H Q2 shape, supplycost
    * re-anchored as observed unit price): for every part, the
    * supplier(s) achieving the MINIMUM unit price — the CORRELATED
    * scalar-min subquery (`price = (SELECT min … WHERE same part)`)
    * that Catalyst must decorrelate into one per-part aggregate + an
    * equi-join back, never a per-part rescan. Unit price is computed
    * in EXACT integer micros (`price_cents·10⁶ DIV qty` — both engines
    * floor positive integer division identically), so the min and the
    * equality join cannot disagree on a last-ulp double division.
    * Ties resolve to the smallest supplier key. */
  private val sq11Q2 = Q(
    "sq11_cheapest_supplier",
    (s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("sq_lineitem")
      s.sql("""
        WITH up AS (
          SELECT l_partkey, l_suppkey,
                 min(CAST(round(l_extendedprice * 100) AS BIGINT) * 1000000
                     DIV CAST(l_quantity AS BIGINT)) AS unit_micros
          FROM sq_lineitem
          GROUP BY l_partkey, l_suppkey)
        SELECT u.l_partkey AS partkey,
               min(u.l_suppkey) AS best_suppkey,
               min(u.unit_micros) AS min_unit_micros
        FROM up u
        WHERE u.unit_micros = (SELECT min(u2.unit_micros) FROM up u2
                               WHERE u2.l_partkey = u.l_partkey)
        GROUP BY u.l_partkey
        ORDER BY partkey""")
    },
    Some("""
      WITH up AS MATERIALIZED (
        SELECT l_partkey, l_suppkey,
               min(CAST(round(l_extendedprice * 100) AS BIGINT) * 1000000
                   // CAST(l_quantity AS BIGINT)) AS unit_micros
        FROM lineitem
        GROUP BY 1, 2)
      SELECT u.l_partkey AS partkey,
             CAST(min(u.l_suppkey) AS BIGINT) AS best_suppkey,
             CAST(min(u.unit_micros) AS BIGINT) AS min_unit_micros
      FROM up u
      WHERE u.unit_micros = (SELECT min(u2.unit_micros) FROM up u2
                             WHERE u2.l_partkey = u.l_partkey)
      GROUP BY 1
      ORDER BY partkey"""),
  )

  // ------------------------------------------------------------------ Q8
  /** A42 — national market share (TPC-H Q8 shape): NATION_1 suppliers'
    * share of all revenue delivered to AMERICA-region customers, by
    * order year — the deepest conformance join (lineitem ⋈ supplier ⋈
    * nation ⋈ orders ⋈ customer ⋈ nation ⋈ region) with a conditional
    * ratio on top. 100 TB story: the region filter shrinks the
    * customer leg 1/5 BEFORE the fact join; supplier+nation broadcast
    * as a 2-column flag; the fact crosses one orderkey shuffle; the
    * share divides two VARCHAR-bridged exact decimal sums per year. */
  private val a42Q8 = Q(
    "a42_market_share",
    (s, dir) => {
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir).filter(col("r_name") === "AMERICA")
      val cn = nat.join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
        .select("c_custkey")
      val ord = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_year")
      val sup = Tables.supplier(s, dir)
        .join(broadcast(nat.select(col("n_nationkey").as("sn_key"), col("n_name"))),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), (col("n_name") === "NATION_1").as("is_target"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
          rev(col("l_extendedprice"), col("l_discount")).as("rv"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_year")
        .agg(
          sum(when(col("is_target"), col("rv"))
            .otherwise(lit(0).cast("decimal(18,2)")))
            .cast("string").cast("double").as("target_revenue"),
          sum(col("rv")).cast("string").cast("double").as("total_revenue"))
        .withColumn("market_share", col("target_revenue") / col("total_revenue"))
        .orderBy("o_year")
    },
    Some("""
      WITH m AS (
        SELECT CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) AS o_year,
               CAST(CAST(sum(CASE WHEN sn.n_name = 'NATION_1'
                             THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                                  (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                             ELSE CAST(0 AS DECIMAL(18,2)) END)
                    AS VARCHAR) AS DOUBLE) AS target_revenue,
               CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                             (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                    AS VARCHAR) AS DOUBLE) AS total_revenue
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = cn.n_regionkey
        WHERE r.r_name = 'AMERICA'
        GROUP BY 1)
      SELECT o_year, target_revenue, total_revenue,
             target_revenue / total_revenue AS market_share
      FROM m ORDER BY o_year"""),
  )

  // ------------------------------------------------------------------ Q9
  /** A43 — product-line margin by supplier nation × year (TPC-H Q9
    * shape; supplycost re-anchored as 8% of retail price): margin =
    * revenue − 0.08·retailprice·quantity for MEDIUM-type parts. The
    * whole margin is computed in EXACT 10⁻⁴ integer units —
    * `price_cents·(100−disc_pct) − retail_cents·qty·8` — summed as
    * DECIMAL and divided by 10⁴ once at the end, so the profit report
    * is bit-identical cross-engine (a double spelling would disagree
    * in the last ulp after millions of adds). 100 TB story: part and
    * supplier⋈nation broadcast; the fact crosses one orderkey shuffle;
    * the rollup is |nations|×|years| rows. */
  private val a43Q9 = Q(
    "a43_nation_year_margin",
    (s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_type") === "MEDIUM")
        .select(col("p_partkey"),
          round(col("p_retailprice") * 100).cast("long").as("retail_cents"))
      val sup = Tables.supplier(s, dir)
      val nat = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
      val sn = sup.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          round(col("l_extendedprice") * 100).cast("long").as("price_cents"),
          round(col("l_discount") * 100).cast("long").as("disc_pct"),
          col("l_quantity").cast("long").as("qty"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("supp_nation"), col("o_year"),
          (col("price_cents") * (lit(100L) - col("disc_pct")) -
            col("retail_cents") * col("qty") * lit(8L)).as("margin_u"))
        .groupBy("supp_nation", "o_year")
        .agg(count(lit(1)).as("n_lines"),
          (sum(col("margin_u").cast("decimal(28,0)"))
            .cast("string").cast("double") / lit(10000.0)).as("margin"))
        .orderBy("supp_nation", "o_year")
    },
    Some("""
      SELECT sn.n_name AS supp_nation,
             CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) AS o_year,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(CAST(sum(CAST(
                 CAST(round(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                 - CAST(round(p.p_retailprice * 100) AS BIGINT)
                   * CAST(l.l_quantity AS BIGINT) * 8
               AS DECIMAL(28,0))) AS VARCHAR) AS DOUBLE) / 10000.0 AS margin
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE p.p_type = 'MEDIUM'
      GROUP BY 1, 2
      ORDER BY 1, 2"""),
  )

  // ------------------------------------------------------------------ Q6
  /** A44 — banded discount revenue delta (TPC-H Q6 shape): the revenue
    * that would be recovered by eliminating mid-band discounts on
    * small-quantity lines, by year — the pure scan-predicate-aggregate
    * query whose entire value is PUSHDOWN: no join, the quantity/
    * discount band compiles into the scan filter, and the delta
    * (`extendedprice·discount`) sums in exact 10⁻⁴ integer units.
    * The discount band tests the INTEGER percent (5..7), not a float
    * between — no boundary line can flip engines. */
  private val a44Q6 = Q(
    "a44_banded_discount_delta",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .select(year(col("l_shipdate")).cast("long").as("ship_year"),
          round(col("l_extendedprice") * 100).cast("long").as("price_cents"),
          round(col("l_discount") * 100).cast("long").as("disc_pct"),
          col("l_quantity").cast("long").as("qty"))
        .filter(col("disc_pct").between(5L, 7L) && col("qty") < 24L)
        .groupBy("ship_year")
        .agg(count(lit(1)).as("n_lines"),
          (sum((col("price_cents") * col("disc_pct")).cast("decimal(28,0)"))
            .cast("string").cast("double") / lit(10000.0)).as("discount_delta"))
        .orderBy("ship_year")
    },
    Some("""
      SELECT CAST(strftime(l_shipdate, '%Y') AS BIGINT) AS ship_year,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(CAST(sum(CAST(
                 CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round(l_discount * 100) AS BIGINT)
               AS DECIMAL(28,0))) AS VARCHAR) AS DOUBLE) / 10000.0
               AS discount_delta
      FROM lineitem
      WHERE CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
        AND CAST(l_quantity AS BIGINT) < 24
      GROUP BY 1 ORDER BY 1"""),
  )

  val all: Seq[Q] = Seq(
    j22Q3, j23Q10, a39Q12, a40Q14, sq8Q15, a41Q16, sq9Q18, j24Q19,
    sq10Q20, sq11Q2, a42Q8, a43Q9, a44Q6)
}
