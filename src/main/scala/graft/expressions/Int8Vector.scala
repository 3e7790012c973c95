package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Int8 vector quantization for the IVF probe path (the 100 TB knob:
  * the probe scan reads 1 byte per dimension instead of 4).
  *
  * Scheme: symmetric per-vector max-abs scaling —
  * `q_i = round(v_i / (max|v| / 127))`, clamped to [-127, 127]. The
  * per-vector scale CANCELS in cosine (`cos(s_a·a8, s_b·b8) =
  * cos(a8, b8)`), so quantized scoring needs NO stored scale at all:
  * [[Int8CosineSimilarity]] runs directly on the int8 payloads, and the
  * exact float cosine is recomputed only for the top `rerank`
  * candidates. Output is `binary` (not `array<tinyint>`): a packed
  * byte per dimension, parquet-compact and cheap to shuffle.
  */
object Int8VectorUtil {
  /** Quantize one float vector; null/NaN/Inf elements → null result
    * (mirrors CosineSimilarity's refuse-to-guess null semantics). */
  def quantize(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    var maxAbs = 0.0f
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = v.getFloat(i)
      if (java.lang.Float.isNaN(x) || java.lang.Float.isInfinite(x)) return null
      val a = math.abs(x)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxAbs == 0.0f) return out // zero vector → zero bytes
    val scale = maxAbs / 127.0f
    i = 0
    while (i < n) {
      // round-half-up computed IN float32 — floor(fl32(x + 0.5f)) — not
      // Math.round: since JDK 9 Math.round floors the EXACT x+0.5, which
      // diverges from any engine that adds in float32 (the DuckDB oracle
      // does) when x sits within half an ulp below k-0.5. Keeping the
      // arithmetic float32 end-to-end is what makes the differential
      // replay bit-exact.
      val half = v.getFloat(i) / scale + 0.5f
      val q = math.floor(half.toDouble).toInt
      out(i) = math.max(-127, math.min(127, q)).toByte
      i += 1
    }
    out
  }
}

/** `array<float>` → packed int8 `binary` via symmetric max-abs
  * quantization. See [[Int8VectorUtil]] for the scheme and why no
  * scale is stored. */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // also null on null/non-finite elements
  override def prettyName: String = "graft_quantize_int8"

  override def nullSafeEval(input: Any): Any =
    Int8VectorUtil.quantize(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.Int8VectorUtil.quantize($c);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8 {
  def of(vec: Column): Column =
    GraftSqlShim.column(QuantizeInt8(GraftSqlShim.expression(vec)))
}

/** Cosine similarity over two packed-int8 `binary` vectors — the
  * quantized probe scorer. Exact 64-bit integer dot/norm accumulation
  * (dims × 127² never overflows a long below ~5·10¹⁴ dimensions), one
  * division at the end. Null semantics match [[CosineSimilarity]]:
  * null input → null, length mismatch → null, zero norm → null. */
case class Int8CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine_int8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return null
    var dot = 0L
    var nx = 0L
    var ny = 0L
    var i = 0
    while (i < x.length) {
      val xv = x(i).toLong
      val yv = y(i).toLong
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble)
    if (denom == 0.0) null else dot.toDouble / denom
  }

  // all locals freshName'd — two scorers can share one generated
  // function (same lesson as CosineSimilarity's janino collision)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |if ($x.length != $y.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L, $nx = 0L, $ny = 0L;
         |  for (int $i = 0; $i < $x.length; $i++) {
         |    long $xv = (long) $x[$i];
         |    long $yv = (long) $y[$i];
         |    $dot += $xv * $yv;
         |    $nx += $xv * $xv;
         |    $ny += $yv * $yv;
         |  }
         |  double $denom = java.lang.Math.sqrt((double) $nx) * java.lang.Math.sqrt((double) $ny);
         |  if ($denom == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = ((double) $dot) / $denom;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8CosineSimilarity {
  def of(a: Column, b: Column): Column =
    GraftSqlShim.column(Int8CosineSimilarity(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}
