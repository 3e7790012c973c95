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
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.DedupWindowToMaxBy)
    ext.injectOptimizerRule(_ => graft.plans.DeferExpensiveProjectPastSort)
    // analysis-time hook — see MvRewrite's scaladoc for why it cannot
    // live in the optimizer (pruning destroys the containment)
    ext.injectPostHocResolutionRule(_ => graft.plans.MvRewrite)
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      cosineBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[L2SquaredDistance].getName, "graft_l2sq"),
      l2sqBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_quantize_int8"),
      new ExpressionInfo(classOf[QuantizeInt8].getName, "graft_quantize_int8"),
      quantizeBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine_int8"),
      new ExpressionInfo(classOf[Int8CosineSimilarity].getName, "graft_cosine_int8"),
      cosineInt8Builder))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "graft_winnow"),
      winnowBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      shinglesBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignatures].getName, "graft_minhash"),
      minhashBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_bits"),
      new ExpressionInfo(classOf[HyperplaneBits].getName, "graft_hyperplane_bits"),
      hyperplaneBuilder))
  }
}

/** The SQL-text builders, exposed for direct testing (the shared test
  * session may predate the extension conf, and getOrCreate() never
  * re-runs extensions on a live session). */
object GraftExtensions {

  /** Fold a statically-known integral argument (bare literal, typed
    * literal like `8::BIGINT`, or any foldable expression such as
    * `CAST(8 AS INT)`) down to an Int. The k/w arguments of the native
    * fingerprint expressions are compile-time parameters, but rejecting
    * everything except a bare INT literal made legitimate SQL spellings
    * throw. */
  private[expressions] def foldToInt(fn: String, arg: String, e: Expression): Int = {
    import org.apache.spark.sql.types._
    val v = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType if e.foldable =>
        e.eval()
      case _ => null
    }
    v match {
      case null => throw new IllegalArgumentException(
        s"$fn: $arg must be a statically-known integer, got $e")
      case b: Byte => b.toInt
      case s: Short => s.toInt
      case i: Int => i
      case l: Long =>
        if (l < Int.MinValue || l > Int.MaxValue)
          throw new IllegalArgumentException(s"$fn: $arg out of Int range: $l")
        l.toInt
    }
  }

  val cosineBuilder: Seq[Expression] => Expression = { children =>
    if (children.length != 2) throw new IllegalArgumentException(
      s"graft_cosine(a, b) expects 2 arguments, got ${children.length}")
    CosineSimilarity(children.head, children(1))
  }

  val l2sqBuilder: Seq[Expression] => Expression = { children =>
    if (children.length != 2) throw new IllegalArgumentException(
      s"graft_l2sq(a, b) expects 2 arguments, got ${children.length}")
    L2SquaredDistance(children.head, children(1))
  }

  val quantizeBuilder: Seq[Expression] => Expression = { children =>
    if (children.length != 1) throw new IllegalArgumentException(
      s"graft_quantize_int8(vec) expects 1 argument, got ${children.length}")
    QuantizeInt8(children.head)
  }

  val cosineInt8Builder: Seq[Expression] => Expression = { children =>
    if (children.length != 2) throw new IllegalArgumentException(
      s"graft_cosine_int8(a, b) expects 2 arguments, got ${children.length}")
    Int8CosineSimilarity(children.head, children(1))
  }

  val winnowBuilder: Seq[Expression] => Expression = { children =>
    if (children.length != 3) throw new IllegalArgumentException(
      s"graft_winnow(text, k, w) expects 3 arguments, got ${children.length}")
    RollingFingerprint(children.head,
      foldToInt("graft_winnow(text, k, w)", "k", children(1)),
      foldToInt("graft_winnow(text, k, w)", "w", children(2)))
  }

  val shinglesBuilder: Seq[Expression] => Expression = { children =>
    if (children.length != 2) throw new IllegalArgumentException(
      s"graft_shingles(text, k) expects 2 arguments, got ${children.length}")
    WordShingles(children.head,
      foldToInt("graft_shingles(text, k)", "k", children(1)))
  }

  val minhashBuilder: Seq[Expression] => Expression = { children =>
    if (children.length != 2) throw new IllegalArgumentException(
      s"graft_minhash(shingles, nPerm) expects 2 arguments, got ${children.length}")
    MinHashSignatures(children.head,
      foldToInt("graft_minhash(shingles, nPerm)", "nPerm", children(1)))
  }

  val hyperplaneBuilder: Seq[Expression] => Expression = { children =>
    if (children.length != 3) throw new IllegalArgumentException(
      s"graft_hyperplane_bits(q, nPlanes, seed) expects 3 arguments, got ${children.length}")
    HyperplaneBits(children.head,
      foldToInt("graft_hyperplane_bits(q, nPlanes, seed)", "nPlanes", children(1)),
      foldToInt("graft_hyperplane_bits(q, nPlanes, seed)", "seed", children(2)))
  }
}
