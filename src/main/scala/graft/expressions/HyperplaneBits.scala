package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Random-hyperplane (sign-random-projection) signature over a packed
  * int8 vector — the LSH analog of [[MinHashSignatures]] for the
  * embedding column: bit `p` of the result is set iff the vector's dot
  * product with pseudo-random hyperplane `p` is non-negative. Vectors
  * with a small angle agree on most bits (collision probability per
  * plane is `1 − θ/π`), so banding the bits buckets near-duplicates
  * together without any training step — the complementary scale path to
  * the IVF centroids, which need a k-means pass first.
  *
  * Exactness is the design driver: the input is the int8-quantized
  * vector (per-vector scale is positive, so quantization never flips a
  * dot-product sign except within quantization noise of zero) and the
  * hyperplane weights are integers from a splitless LCG —
  *
  *   w(p, d) = ((1103515245 · (seed + p·8192 + d) + 12345) mod 2001) − 1000
  *
  * — so every dot product is exact 64-bit integer arithmetic that a SQL
  * oracle replays literally (|dot| ≤ dims·127·1000, overflow-free below
  * ~7·10¹¹ dimensions). No floats anywhere means no cross-engine
  * rounding can flip a sign at a bucket boundary.
  */
object HyperplaneBitsUtil {
  /** Signature of one packed-int8 vector; dims must stay below the 8192
    * LCG plane stride (one row of weights per plane, no overlap). */
  def bits(q: Array[Byte], nPlanes: Int, seed: Int): Long = {
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0L
      var d = 0
      while (d < q.length) {
        val w = ((1103515245L * (seed + p * 8192 + d) + 12345L) % 2001L) - 1000L
        dot += q(d).toLong * w
        d += 1
      }
      if (dot >= 0L) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** packed-int8 `binary` → `bigint` signature bitmask (bit p = sign of
  * the dot with hyperplane p). `nPlanes` ≤ 64 so the mask fits a long;
  * callers slice bands out with shiftright/bitwiseAND — plain integer
  * SQL, no further expressions needed. */
case class HyperplaneBits(child: Expression, nPlanes: Int, seed: Int)
    extends UnaryExpression {

  require(nPlanes >= 1 && nPlanes <= 64,
    s"nPlanes must be in [1, 64] to fit a long bitmask, got $nPlanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a packed-int8 binary vector, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hyperplane_bits"

  override def nullSafeEval(input: Any): Any =
    HyperplaneBitsUtil.bits(input.asInstanceOf[Array[Byte]], nPlanes, seed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HyperplaneBitsUtil.bits($c, $nPlanes, $seed);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBits {
  def of(q: Column, nPlanes: Int, seed: Int): Column =
    GraftSqlShim.column(HyperplaneBits(GraftSqlShim.expression(q), nPlanes, seed))
}
