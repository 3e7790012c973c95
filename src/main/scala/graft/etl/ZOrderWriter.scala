package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered writes — multi-column data skipping
  * for the lake layer.
  *
  * A single-column SORTKEY ([[LakeWriter.writePartitioned]]'s
  * `sortCols`) gives parquet files tight min/max zone maps on ONE
  * column: filters on it skip files, filters on anything else scan
  * everything. Interleaving the bits of two normalized sort dimensions
  * puts rows that are close in BOTH dimensions into the same files, so
  * each file covers a small rectangle of the (a, b) space and min/max
  * pruning works for predicates on EITHER column — the standard
  * lakehouse OPTIMIZE ZORDER layout, built here from pure column
  * arithmetic (shifts/masks, fully codegen'd; no UDF, no custom
  * partitioner).
  *
  * Scale shape: one metadata-sized min/max aggregate to fix the value
  * ranges, then `repartitionByRange` on the z-value (one range
  * exchange — the same cost any global sort-for-write pays) with a
  * within-partition sort so row groups inside each file stay tight.
  * Range bounds come from Spark's reservoir sampling; the write
  * parallelism is `numFiles`, independent of cluster size.
  *
  * Normalization quantizes each dimension to 16 bits over its observed
  * [min, max]. Quantization only affects LAYOUT (two rows mapping to
  * the same cell keep distinct column values) — correctness of reads
  * never depends on it, exactly like the bloom prune's fpp.
  */
object ZOrderWriter {

  /** Spread the low 16 bits of `x` to even bit positions 0,2,…,30 —
    * the classic mask ladder, as column arithmetic. */
  private def spreadBits(x: Column): Column = {
    val s8 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s4 = (s8.bitwiseOR(shiftleft(s8, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s2 = (s4.bitwiseOR(shiftleft(s4, 2))).bitwiseAND(lit(0x33333333L))
    (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit cell coordinates. */
  private def morton2(a16: Column, b16: Column): Column =
    spreadBits(a16).bitwiseOR(shiftleft(spreadBits(b16), 1))

  /** Quantize a numeric column to a 16-bit cell index over [lo, hi].
    * A degenerate range (hi == lo, or non-finite bounds) maps
    * everything to cell 0; NULL/NaN/±Inf values map to cell 0 so they
    * cluster together at the curve's origin — layout only, the rows'
    * actual values are untouched (an ANSI `floor(NaN).cast(long)`
    * would instead abort the whole write on one bad row). */
  private def cell16(c: Column, lo: Double, hi: Double): Column =
    if (!(lo < hi) || lo.isInfinite || hi.isInfinite) lit(0L)
    else {
      val v = c.cast("double")
      val finite = v.isNotNull && !isnan(v) &&
        v > Double.NegativeInfinity && v < Double.PositiveInfinity
      val cell = floor((v - lit(lo)) / lit(hi - lo) * lit(65536.0)).cast("long")
      when(finite, least(lit(65535L), greatest(lit(0L), cell))).otherwise(lit(0L))
    }

  /** The z-value column for (a, b) given their observed bounds. */
  def zValue(a: Column, b: Column, bounds: Bounds): Column =
    morton2(cell16(a, bounds.aLo, bounds.aHi), cell16(b, bounds.bLo, bounds.bHi))

  final case class Bounds(aLo: Double, aHi: Double, bLo: Double, bHi: Double)

  /** Observed min/max of both dimensions — one metadata-sized aggregate
    * (4 doubles to the driver). Non-finite values are excluded so one
    * NaN/Inf row can't collapse a dimension's whole range (they land
    * in cell 0 at quantization time instead). */
  def bounds(df: DataFrame, a: String, b: String): Bounds = {
    def finiteOnly(name: String): Column = {
      val v = col(name).cast("double")
      when(!isnan(v) && v > Double.NegativeInfinity &&
        v < Double.PositiveInfinity, v)
    }
    val r = df.agg(
      min(finiteOnly(a)), max(finiteOnly(a)),
      min(finiteOnly(b)), max(finiteOnly(b))).head()
    def d(i: Int) = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
    Bounds(d(0), d(1), d(2), d(3))
  }

  /** Write `df` z-order-clustered on (a, b) into `numFiles` parquet
    * files at `path`. */
  def write(df: DataFrame, path: String, a: String, b: String,
      numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    val z = zValue(col(a), col(b), bounds(df, a, b))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
