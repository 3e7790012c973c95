package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Native cosine expression: value parity with hand math (codegen path)
  * and with direct interpreted eval, null/zero-norm semantics, and SQL
  * availability through the same builder GraftExtensions injects. */
class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def df(rows: (Long, Seq[Float], Seq[Float])*) = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("id", "a", "b")
  }

  test("matches hand-computed cosine through the codegen path") {
    val out = df(
      (1L, Seq(1f, 0f), Seq(1f, 0f)),
      (2L, Seq(1f, 0f), Seq(0f, 1f)),
      (3L, Seq(1f, 1f), Seq(1f, 0f)),
      (4L, Seq(3f, 4f), Seq(4f, 3f)))
      .select(col("id"), CosineSimilarity.of(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)
    assert(math.abs(out(2L) - 0.0) < 1e-12)
    assert(math.abs(out(3L) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(math.abs(out(4L) - 24.0 / 25.0) < 1e-12)
  }

  test("interpreted eval agrees with codegen on pseudo-random vectors") {
    val vecs = (0 until 50).map { i =>
      (i.toLong,
        Seq.tabulate(16)(d => (((i * 31 + d * 17) % 13) - 6).toFloat / 6f),
        Seq.tabulate(16)(d => (((i * 7 + d * 23) % 11) - 5).toFloat / 5f))
    }
    val viaDf = df(vecs: _*)
      .select(col("id"), CosineSimilarity.of(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vecs.foreach { case (id, a, b) =>
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      assert(math.abs(viaDf(id) - dot / (na * nb)) < 1e-12, s"id $id")
    }
  }

  test("null input → null; zero-norm vector → null (not NaN)") {
    val out = df((1L, Seq(1f, 0f), Seq(0f, 0f)))
      .select(
        CosineSimilarity.of(col("a"), col("b")).as("zero"),
        CosineSimilarity.of(col("a"), lit(null).cast("array<float>")).as("nul"))
      .head()
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("mismatched dimensions → null, never a common-prefix score") {
    // a ragged pair like ([1,0,...], [1]) would score 1.0 if truncated
    val out = df((1L, Seq(1f, 0f, 0f, 0f), Seq(1f)))
      .select(CosineSimilarity.of(col("a"), col("b")).as("c")).head()
    assert(out.isNullAt(0))
  }

  test("null ELEMENT in either vector → null, never read as 0.0") {
    // graft_cosine is SQL-registered, so containsNull=true arrays reach
    // it; treating a null slot as 0.0 would silently skew the score.
    val nullSlot = array(lit(1.0f), lit(null).cast("float"))
    val full = array(lit(1.0f), lit(1.0f))
    val out = df((1L, Seq(1f), Seq(1f)))
      .select(
        CosineSimilarity.of(nullSlot, full).as("l"),
        CosineSimilarity.of(full, nullSlot).as("r"))
      .head()
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("two cosines in one projection codegen cleanly and agree") {
    // Regression pin: bare codegen locals collided ("Redefinition of
    // local variable i") when the expression appeared twice in one
    // generated function — the IVF probe's exact shape — silently
    // dropping the projection to interpreted mode.
    val out = df((1L, Seq(3f, 4f), Seq(4f, 3f)))
      .select(
        CosineSimilarity.of(col("a"), col("b")).as("c1"),
        CosineSimilarity.of(col("b"), col("a")).as("c2"))
      .head()
    assert(math.abs(out.getDouble(0) - 24.0 / 25.0) < 1e-12)
    assert(out.getDouble(0) == out.getDouble(1))
  }

  test("graft_cosine is callable from SQL text via the extension builder") {
    // Same registration GraftExtensions.injectFunction performs at
    // session build; applied to the live registry here because
    // getOrCreate() won't re-run extensions on an existing session.
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children.head, children(1)))
    val r = spark.sql(
      "SELECT graft_cosine(array(cast(1.0 as float), cast(1.0 as float)), " +
        "array(cast(1.0 as float), cast(0.0 as float))) AS c").head()
    assert(math.abs(r.getDouble(0) - 1.0 / math.sqrt(2)) < 1e-12)
  }
}
