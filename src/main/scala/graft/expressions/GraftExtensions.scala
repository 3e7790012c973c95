package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native expressions with
  * the SQL function registry (so `SELECT graft_cosine(…)` works in
  * plain SQL text as well as through the Column API) and the
  * dedup-window → max_by optimizer rewrite. Activate with
  * `.config("spark.sql.extensions", "graft.expressions.GraftExtensions")`
  * — on a cluster this is one `--conf`, no code change.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.DedupWindowToMaxBy)
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"graft_cosine(a, b) expects 2 arguments, got ${children.length}")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_quantize_int8"),
      new ExpressionInfo(classOf[QuantizeInt8].getName, "graft_quantize_int8"),
      (children: Seq[Expression]) => {
        if (children.length != 1) throw new IllegalArgumentException(
          s"graft_quantize_int8(vec) expects 1 argument, got ${children.length}")
        QuantizeInt8(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine_int8"),
      new ExpressionInfo(classOf[Int8CosineSimilarity].getName, "graft_cosine_int8"),
      (children: Seq[Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"graft_cosine_int8(a, b) expects 2 arguments, got ${children.length}")
        Int8CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "graft_winnow"),
      (children: Seq[Expression]) => {
        if (children.length != 3) throw new IllegalArgumentException(
          s"graft_winnow(text, k, w) expects 3 arguments, got ${children.length}")
        (children(1), children(2)) match {
          case (org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _),
                org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _)) =>
            RollingFingerprint(children.head, k, w)
          case other => throw new IllegalArgumentException(
            s"graft_winnow(text, k, w): k and w must be integer literals, got $other")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"graft_shingles(text, k) expects 2 arguments, got ${children.length}")
        children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _) =>
            WordShingles(children.head, k)
          case other => throw new IllegalArgumentException(
            s"graft_shingles(text, k): k must be an integer literal, got $other")
        }
      }))
  }
}
