package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistics-driven join-strategy choice — the engine-side analog of
  * the reference warehouse's `DISTSTYLE AUTO` ("let the optimizer
  * decide from the data", `sql/redshift_table_schemas.sql:114,310-313`):
  * measure the two sides, then CHOOSE broadcast / plain shuffle /
  * salted join instead of hoping the default shuffle survives.
  *
  * The three stats are each metadata-sized collections, the same
  * discipline as `stats_key_skew` / `stats_join_size_estimate`:
  *
  *   - the small side's ROW COUNT (one long — what AQE itself measures
  *     at runtime; measuring it up front lets the choice be explicit,
  *     logged, and testable);
  *   - the big side's per-key skew profile via its grouped counts
  *     collapsed to `(n_keys, total, max_key_rows)` — one row; a key
  *     whose row count exceeds `hotKeyTaskFactor` × the even per-task
  *     share will straggle or OOM a plain shuffle join regardless of
  *     AQE splitting (splitting helps the PROBE side; a build-side hot
  *     key still concentrates);
  *   - the expected OUTPUT size via the CMS inner product
  *     (Σ_k a_k·b_k estimated as min over depths of Σ cell products —
  *     AMS/Alon-Matias-Szegedy), from one streaming sketch pass per
  *     side. The output estimate doesn't pick the strategy (output
  *     size is the same under all three) but is the advisory that
  *     prices the join and sizes downstream partitioning, and at
  *     100 TB it is the ONLY affordable way to see a pair explosion
  *     coming before paying for it.
  *
  * Strategy rule, in priority order:
  *   1. `broadcast`  — small side fits the broadcast budget;
  *   2. `salted`     — hot key exceeds the per-task share by
  *                     `hotKeyTaskFactor`: [[SaltedJoin.saltedInnerJoin]]
  *                     spreads it over `nSalts` partitions;
  *   3. `shuffle`    — plain equi-join; AQE finishes the tuning.
  *
  * The joined OUTPUT is identical under every strategy (plan-pinned in
  * `AutoPlanJoinSpec`); only the physical shape changes. At 100 TB the
  * stats passes amortize: persist per-table key profiles once per load
  * (the `stats_*` queries are exactly those artifacts) and feed
  * [[choose]] directly instead of re-measuring per join.
  */
object AutoPlanJoin {

  /** Metadata-sized join statistics (all driver-held longs). */
  final case class Stats(
      smallRows: Long,
      bigRows: Long,
      bigKeys: Long,
      bigMaxKeyRows: Long,
      cmsEstPairs: Long)

  final case class Planned(joined: DataFrame, strategy: String, stats: Stats)

  /** The pure decision — exposed separately so precomputed table stats
    * can drive it without a measurement pass. */
  def choose(
      stats: Stats,
      shufflePartitions: Int,
      broadcastRowLimit: Long,
      hotKeyTaskFactor: Double): String =
    if (stats.smallRows <= broadcastRowLimit) "broadcast"
    else if (stats.bigMaxKeyRows.toDouble >
      hotKeyTaskFactor * (stats.bigRows.toDouble / shufflePartitions)) "salted"
    else "shuffle"

  /** Measure both sides, choose, and build the inner equi-join on
    * `keys` with the chosen physical strategy. */
  def inner(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      broadcastRowLimit: Long = 500000L,
      hotKeyTaskFactor: Double = 4.0,
      nSalts: Int = 16,
      cmsDepth: Int = 4,
      cmsWidth: Long = 4096L): Planned = {
    val spark = big.sparkSession
    val smallRows = small.count()
    // grouped counts collapse map-side; the agg output is ONE row
    val prof = big.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("nk"), sum(col("c")).as("tot"), max(col("c")).as("mx"))
      .collect()(0)
    val (bigKeys, bigRows, bigMax) =
      if (prof.isNullAt(0) || prof.getLong(0) == 0L) (0L, 0L, 0L)
      else (prof.getLong(0), prof.getLong(1), prof.getLong(2))
    val est = cmsInnerProduct(big, small, keys, cmsDepth, cmsWidth)
    val stats = Stats(smallRows, bigRows, bigKeys, bigMax, est)
    val strategy = choose(stats, spark.sessionState.conf.numShufflePartitions,
      broadcastRowLimit, hotKeyTaskFactor)
    val joined = strategy match {
      case "broadcast" => big.join(broadcast(small), keys)
      case "salted" => SaltedJoin.saltedInnerJoin(big, small, keys, nSalts)
      case _ => big.join(small, keys)
    }
    Planned(joined, strategy, stats)
  }

  /** AMS/CMS inner-product estimate of |big ⋈ small| on `keys`: each
    * side streams once into depth×width counter cells (map-side
    * collapse — the exchange carries ≤ depth·width rows per side), and
    * the estimate is the min over depths of the cell-wise product sum.
    * Inflation is ~(Σa)(Σb)/width per depth — callers compare widths
    * to their key cardinality. */
  def cmsInnerProduct(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      depth: Int,
      width: Long): Long = {
    // up to 4 depths share ONE md5 per key, sliced into disjoint 8-hex
    // (32-bit) chunks — hashing once per row, not once per depth,
    // halves-to-quarters the scan-side cost, and disjoint chunks of one
    // digest are as pairwise-independent as CMS needs (same spelling as
    // stats_join_size_estimate's oracle). Deeper sketches fall back to
    // one digest per depth.
    def idx(d: Int, k: Column): Column =
      if (depth <= 4) pmod(
        conv(substring(md5(k), 1 + 8 * d, 8), 16, 10).cast("long"), lit(width))
      else pmod(
        conv(substring(md5(concat(lit(d.toString), k)), 1, 15), 16, 10).cast("long"),
        lit(width))
    def cells(df: DataFrame) = {
      // Unambiguous key encoding: JSON-escape the tuple (single keys
      // included) rather than concat with a separator — separator-in-
      // value and concat_ws's null-skipping both alias DISTINCT tuples
      // to one cell in every depth, deterministically inflating the
      // estimate beyond normal CMS collision error; and the JSON form
      // keeps NULL distinct from '' (`{"c":null}` vs `{"c":""}`), the
      // aliasing the old single-key coalesce preserved. Nulls are KEPT
      // in the serialization for exactly that reason.
      val k = to_json(
        struct(keys.map(c => col(c).cast("string").as(c)): _*),
        Map("ignoreNullFields" -> "false"))
      df.select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), idx(d, k).as("idx"))): _*)).as("c"))
        .groupBy(col("c.d").as("d"), col("c.idx").as("idx"))
        .agg(count(lit(1)).as("cnt"))
    }
    val rows = cells(big).as("a")
      .join(cells(small).as("b"), Seq("d", "idx"))
      .groupBy("d").agg(sum(col("a.cnt") * col("b.cnt")).as("ip"))
      .agg(min(col("ip")).as("est"))
      .collect()
    if (rows.isEmpty || rows(0).isNullAt(0)) 0L else rows(0).getLong(0)
  }
}
