package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (the MOSS scheme): Rabin–Karp ROLLING
  * polynomial hashes over character k-grams, then the minimum hash of
  * every window of `w` consecutive k-gram positions, deduplicated.
  * Two documents sharing any run of ≥ k+w-1 characters share a selected
  * hash — a position-robust near-dup key that survives edits outside
  * the shared run (unlike [[graft.functions.TextFunctions.vocabFingerprint]],
  * which is order-insensitive but whole-document).
  *
  * Portability is part of the contract: hashes are the canonical value
  * of the k-gram polynomial (base 256, modulus 1e9+7 — products stay
  * under 2⁶³), so a non-rolling evaluator (the DuckDB oracle) computes
  * bit-identical values; the rolling update is just the O(n) way to
  * get them.
  */
object RollingHashUtil {
  val P = 1000000007L
  val B = 256L

  /** Sorted distinct selected hashes; empty array when the document is
    * shorter than k. One window over all positions when there are fewer
    * than w k-grams. */
  def winnow(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val m = n - k + 1
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + (bytes(i) & 0xff)) % P; i += 1 }
    hs(0) = h
    var bk = 1L // B^(k-1) mod P, the dropped character's weight
    i = 0
    while (i < k - 1) { bk = bk * B % P; i += 1 }
    i = 1
    while (i < m) {
      h = ((h - (bytes(i - 1) & 0xff) * bk % P + P) % P * B +
        (bytes(i + k - 1) & 0xff)) % P
      hs(i) = h
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var mn = Long.MaxValue
      i = 0
      while (i < m) { if (hs(i) < mn) mn = hs(i); i += 1 }
      selected.add(mn)
    } else {
      // O(m·w) is fine for the small w this is used with (w ≈ 4-8);
      // swap in a monotonic deque if w ever grows
      var s = 0
      while (s + w <= m) {
        var mn = Long.MaxValue
        var j = s
        while (j < s + w) { if (hs(j) < mn) mn = hs(j); j += 1 }
        selected.add(mn)
        s += 1
      }
    }
    val out = new Array[Any](selected.size())
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }
}

/** `string` → sorted distinct `array<long>` of winnowing-selected
  * rolling hashes. Null text → null. */
case class RollingFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    RollingHashUtil.winnow(input.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RollingHashUtil.winnow($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  def of(text: Column, k: Int, w: Int): Column =
    GraftSqlShim.column(RollingFingerprint(GraftSqlShim.expression(text), k, w))
}
