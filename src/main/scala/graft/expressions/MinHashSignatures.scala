package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper the generated code calls: all `nPerm` MinHash
  * components in ONE pass over the shingle array. Values are pinned to
  * the aggregation form they replace (and to the DuckDB oracle):
  * component i = min over shingles of lowercase-hex
  * `md5("p<i>|" + shingle)` — md5 over the UTF-8 bytes of the
  * concatenation, identical to SQL `md5('p<i>|' || shingle)`. */
object MinHashUtil {
  private val HEX = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HEX(b >>> 4)
      out(i * 2 + 1) = HEX(b & 0x0f)
      i += 1
    }
    new String(out)
  }

  // per-row setup is pure overhead on a corpus-scan hot path: prefixes
  // depend only on nPerm (cached), and the digest instance is reused
  // per thread instead of a JCA lookup per row
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Null shingle elements are skipped — the SQL form this replaces
    * (`min(md5('p<i>|' || shingle))`) concatenates NULL to NULL and `min`
    * ignores it. Returns null when no non-null shingle exists (the
    * all-NULL aggregate is NULL), so the output array never holds nulls. */
  def signatures(sh: ArrayData, nPerm: Int): ArrayData = {
    val n = sh.numElements()
    val prefixes = prefixCache.computeIfAbsent(nPerm, np =>
      Array.tabulate(np)(p =>
        s"p$p|".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val mins = new Array[String](nPerm)
    val md = mdLocal.get()
    var used = 0
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        used += 1
        val bytes = sh.getUTF8String(i).getBytes
        var p = 0
        while (p < nPerm) {
          md.reset()
          md.update(prefixes(p))
          md.update(bytes)
          val hex = toHex(md.digest())
          if (mins(p) == null || hex.compareTo(mins(p)) < 0) mins(p) = hex
          p += 1
        }
      }
      i += 1
    }
    if (used == 0) return null
    val out = new Array[Any](nPerm)
    var p = 0
    while (p < nPerm) { out(p) = UTF8String.fromString(mins(p)); p += 1 }
    new GenericArrayData(out)
  }
}

/** Native MinHash signature vector: `array<string>` of `nPerm` min-wise
  * md5 components over a shingle array, one compiled pass per document.
  * Replaces an explode + 12-way min groupBy — the signature step loses
  * its shuffle entirely. Null/empty/all-null-element shingle arrays →
  * null (no signature; callers filter empty documents out anyway);
  * null elements are skipped, matching the SQL aggregate this fuses. */
case class MinHashSignatures(child: Expression, nPerm: Int)
    extends UnaryExpression {

  require(nPerm >= 1, s"nPerm must be >= 1, got $nPerm")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // also null on empty input
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else MinHashUtil.signatures(arr, nPerm)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.MinHashUtil.signatures($c, $nPerm);
         |  if (${ev.value} == null) ${ev.isNull} = true;
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignatures {
  def of(shingles: Column, nPerm: Int): Column =
    GraftSqlShim.column(MinHashSignatures(GraftSqlShim.expression(shingles), nPerm))
}
