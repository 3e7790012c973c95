package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity between two
  * `array<float>` vectors, accumulated in double, in ONE pass (dot and
  * both norms together).
  *
  * Why an expression and not a HOF combo: `zip_with`/`aggregate`
  * higher-order functions are CodegenFallback — every element bounces
  * through an interpreted lambda with boxing, and a cosine needs three
  * such aggregates. This measured ~2× slower end-to-end on the
  * embedding near-dup query. `doGenCode` below emits a tight primitive
  * loop that whole-stage codegen inlines into the surrounding operator,
  * which is the preference order SURVEY §7.3 prescribes (native
  * expression > HOF combo > UDF).
  *
  * Null semantics: null input array → null (nullIntolerant); a
  * zero-norm vector → null (cosine undefined); mismatched dimensions →
  * null (a ragged corpus is a data bug — never silently score the
  * common prefix); a null ELEMENT in either vector → null (the
  * expression is SQL-registered, so arbitrary `containsNull` arrays
  * reach it — reading a null slot as 0.0 would silently skew scores).
  * Callers `filter($"cosine".isNotNull)` instead of seeing NaN or
  * inflated scores.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null also on zero-norm inputs, not just null inputs
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // dimension mismatch → null, never a silently-truncated "similarity"
    // computed over the common prefix (which inflates the score)
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else dot / denom
  }

  // every local is ctx.freshName'd: this expression can appear more than
  // once in one generated function (e.g. the IVF probe projects two
  // cosines), and bare `int i` locals collide there — janino rejects the
  // redefinition and the whole projection falls back to interpreted mode
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = (double) $x.getFloat($i);
         |    double $yv = (double) $y.getFloat($i);
         |    $dot += $xv * $yv;
         |    $nx += $xv * $xv;
         |    $ny += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |    if ($denom == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot / $denom;
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point: `CosineSimilarity.of($"a", $"b")`. */
  def of(a: Column, b: Column): Column =
    GraftSqlShim.column(CosineSimilarity(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}
