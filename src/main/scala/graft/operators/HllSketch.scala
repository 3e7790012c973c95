package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog distinct-count sketch (Flajolet et al.,
  * "HyperLogLog: the analysis of a near-optimal cardinality estimation
  * algorithm", AofA 2007) in pure column arithmetic.
  *
  * Why it exists: `COUNT(DISTINCT key)` shuffles EVERY distinct key —
  * at 100 TB a high-cardinality distinct is a full-data exchange and
  * the single most expensive aggregate in a warehouse. A register
  * sketch replaces that with a map-side-collapsing aggregate whose
  * exchange carries ≤ groups × m rows of `(register, rho)` longs —
  * metadata, not data — and the registers are MERGEABLE (element-wise
  * max), so partial sketches combine across partitions, days, or
  * streams without touching raw keys again. Spark ships
  * `approx_count_distinct` (HLL++), but its binary sketch buffer is
  * opaque: it cannot be stored as a table, merged incrementally by SQL,
  * or replayed by an independent engine. These registers are plain
  * rows — persistable, unionable, oracle-checkable.
  *
  * Determinism (what makes the estimate hash-comparable bit-for-bit
  * cross-engine, the same discipline as `corpus_token_quantiles`):
  *   - the hash is the md5-prefix 60-bit integer (Spark
  *     `conv(substring(md5(k),1,15),16,10)` == DuckDB
  *     `CAST('0x'||substring(md5(k),1,15) AS BIGINT)`);
  *   - rho comes from integer/string ops only (`length(bin(w))`), no
  *     floating point;
  *   - the harmonic-mean denominator Σ 2^(-M[j]) is computed EXACTLY:
  *     scaled by 2^RhoMax every term is an integer power of two and the
  *     64-term LONG sum is ≤ 2^61 — no FP accumulation at all;
  *   - the estimate is then alphaM2Pow / s_scaled: ONE correctly-
  *     rounded double division of identical inputs, identical in any
  *     IEEE-754 engine. The linear-counting branch uses m·ln(m/V) —
  *     one division + `ln` + an exact ×64, and JVM `Math.log` matches
  *     DuckDB `ln` bit-for-bit on the verified inputs (see
  *     `a17_group_stats` precedent for the probe discipline).
  *
  * m = 64 registers (p = 6) gives the standard error 1.04/√64 ≈ 13% —
  * chosen small so the whole register table stays human-inspectable in
  * tests; the arithmetic is identical at any power-of-two m. The
  * large-range correction is omitted: it triggers near 2^32/30
  * cardinalities where the 60-bit hash space is nowhere near saturated.
  */
object HllSketch {
  /** log2(m): register-index bits taken from the low end of the hash. */
  val P = 6
  /** Register count m = 2^P. */
  val M: Int = 1 << P
  /** md5-prefix hash width (15 hex digits). */
  val HashBits = 60
  /** Width of the rho window w = hash >> P. */
  val WBits: Int = HashBits - P
  /** rho ∈ [1, RhoMax]; w = 0 maps to RhoMax. */
  val RhoMax: Int = WBits + 1
  /** alpha_64 · m² · 2^RhoMax with alpha_64 = 0.709 (Flajolet Fig. 3
    * constant for m = 64): 2904.064 rounds once at parse, the 2^55
    * factor is an exact exponent shift — both engines reproduce the
    * identical double. */
  val AlphaM2Pow: Double = 2904.064 * math.pow(2, RhoMax).toLong.toDouble
  /** Linear-counting threshold 2.5·m (Flajolet's small-range bound). */
  val LcThreshold: Double = 2.5 * M

  /** Per-(group, register) max-rho frame: `groupCols* ++ (register,
    * rho)`. One map-side-collapsing aggregate; the exchange carries
    * ≤ |groups|·m rows. `keyCol` is hashed via its canonical string
    * form (cast both sides), so any atomic key type works. */
  def registers(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame = {
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val w = shiftright(col("h"), P)
    df.select(groupCols.map(col) :+ h.as("h"): _*)
      .select(
        groupCols.map(col) :+
          (col("h") % M).as("register") :+
          when(w === 0L, RhoMax)
            .otherwise(lit(RhoMax) - length(bin(w)))
            .cast("int")
            .as("rho"): _*)
      .groupBy("register", groupCols: _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Merge two register frames (same group columns): element-wise max.
    * The algebra of the sketch — registers(A ∪ B) == merge(registers(A),
    * registers(B)) exactly, which `HllSketchSpec` pins. */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy("register", groupCols: _*)
      .agg(max(col("rho")).as("rho"))

  /** Collapse a register frame to one `approx_distinct` double per
    * group (absent registers count as rho = 0). Deterministic to the
    * bit — see object doc. */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val sScaled =
      (col("s_present") + (lit(M.toLong) - col("n_present")) * (1L << RhoMax))
        .as("s_scaled")
    val zeros = (lit(M.toLong) - col("n_present")).as("zeros")
    val raw = lit(AlphaM2Pow) / col("s_scaled").cast("double")
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoMax - rho)"))
          .as("s_present"),
        count(lit(1)).as("n_present"))
      .select(groupCols.map(col) :+ sScaled :+ zeros: _*)
      .select(
        groupCols.map(col) :+
          when(raw <= LcThreshold && col("zeros") > 0L,
            lit(M.toDouble) * log(lit(M.toDouble) / col("zeros").cast("double")))
            .otherwise(raw)
            .as("approx_distinct"): _*)
  }
}
