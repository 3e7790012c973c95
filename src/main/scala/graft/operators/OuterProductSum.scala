package graft.operators

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass Gram/outer-product accumulation over a float-vector column
  * — the covariance input for PCA ([[graft.queries.MiscQueries]]
  * `emb_pca_power`) without the explode → self-join → dims²-group
  * aggregate pipeline (which materializes corpus × dims rows and paid
  * ~20 s at sf0.1 in per-row decimal arithmetic).
  *
  * The buffer is dims counts/sums + a dims·(dims+1)/2 upper-triangle
  * of product sums, ALL as exact integers:
  *
  *   - per-dimension sums accumulate the 6-dp-quantized component in
  *     MICROS (`round6(x)·10⁶`, exact long — the component quantization
  *     every embedding query in this engine shares);
  *   - product sums accumulate `round(x_i·x_j·10⁹)` NANOS (round half
  *     away from zero, i.e. C `round()` — the same function the DuckDB
  *     oracle applies), so partial aggregation is an exact commutative
  *     long sum: no float accumulation order exists anywhere, and
  *     map-side partials collapse to ONE buffer per task.
  *
  * Long headroom: |x_i·x_j| ≤ 64 for unit-ish embeddings → ≤ 6.4·10¹⁰
  * nanos/row → overflow at ~10⁸ rows per FINAL aggregation. At
  * larger-than-that corpora, switch the buffer to 128-bit (two longs)
  * or pre-aggregate per shard — the buffer layout, not the algorithm,
  * changes. The aggregate output is a single struct row: dims² + dims
  * metadata longs, independent of corpus size.
  */
object OuterProductSum {

  /** C-style round half away from zero — matches DuckDB `round(x, 0)`. */
  def roundAway(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5d) else -math.floor(-x + 0.5d)).toLong

  /** 6-dp HALF_UP quantization in exact micros — matches
    * `CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(12,6)) * 1000000`. */
  def micros6(x: Double): Long =
    new JBD(x).setScale(6, RoundingMode.HALF_UP).movePointRight(6).longValueExact

  final case class OPSum(n: Long, s: Array[Long], p: Array[Long])

  private def triIndex(i: Int, j: Int): Int = j * (j + 1) / 2 + i // requires i <= j

  private def agg(dims: Int): Aggregator[Seq[Float], OPSum, OPSum] =
    new Aggregator[Seq[Float], OPSum, OPSum] {
      def zero: OPSum = OPSum(0L, new Array[Long](dims), new Array[Long](dims * (dims + 1) / 2))
      def reduce(b: OPSum, v: Seq[Float]): OPSum = {
        require(v.length == dims, s"expected $dims dims, got ${v.length}")
        val micros = new Array[Long](dims)
        val xd = new Array[Double](dims)
        var i = 0
        while (i < dims) {
          micros(i) = micros6(v(i).toDouble)
          xd(i) = micros(i).toDouble / 1e6 // nearest double of the 6-dp decimal
          i += 1
        }
        // addExact: past the documented ~1e8-rows-per-final-aggregation
        // headroom the nanos sums would wrap SILENTLY and the Gram matrix
        // (and every PCA result downstream) would be wrong with no error —
        // exceeding the limit must fail loudly instead
        var j = 0
        while (j < dims) {
          b.s(j) = Math.addExact(b.s(j), micros(j))
          var k = 0
          while (k <= j) {
            val t = triIndex(k, j)
            b.p(t) = Math.addExact(b.p(t), roundAway(xd(k) * xd(j) * 1e9))
            k += 1
          }
          j += 1
        }
        OPSum(b.n + 1, b.s, b.p)
      }
      def merge(l: OPSum, r: OPSum): OPSum = {
        var i = 0
        while (i < l.s.length) { l.s(i) = Math.addExact(l.s(i), r.s(i)); i += 1 }
        i = 0
        while (i < l.p.length) { l.p(i) = Math.addExact(l.p(i), r.p(i)); i += 1 }
        OPSum(l.n + r.n, l.s, l.p)
      }
      def finish(b: OPSum): OPSum = b
      def bufferEncoder: Encoder[OPSum] = ExpressionEncoder[OPSum]()
      def outputEncoder: Encoder[OPSum] = ExpressionEncoder[OPSum]()
    }

  /** Column form: `df.agg(OuterProductSum.of(col("embedding"), 64))` →
    * one struct row `(n, s[dims] micros-sums, p[tri] nanos-product-sums)`. */
  def of(vec: Column, dims: Int): Column =
    udaf(agg(dims), ExpressionEncoder[Seq[Float]]())(vec)

  /** Unpack a collected [[OPSum]] row into (n, per-dim micro-sums,
    * symmetric nanos product lookup). */
  def unpack(row: org.apache.spark.sql.Row): (Long, Array[Long], (Int, Int) => Long) = {
    val r = row.getStruct(0)
    val n = r.getLong(0)
    val s = r.getSeq[Long](1).toArray
    val p = r.getSeq[Long](2).toArray
    (n, s, (i: Int, j: Int) => if (i <= j) p(triIndex(i, j)) else p(triIndex(j, i)))
  }
}
