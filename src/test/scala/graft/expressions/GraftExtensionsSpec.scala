package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-text function builders: statically-known integer arguments
  * must be accepted in every spelling a user can legitimately write —
  * bare literal, typed literal (8::BIGINT), foldable cast — and
  * data-dependent arguments must be rejected with a clear error
  * (the k/w parameters compile into the expression, they cannot vary
  * per row). */
class GraftExtensionsSpec extends AnyFunSuite {

  private val text = Literal("some text")

  test("graft_winnow accepts bare INT literals") {
    val e = GraftExtensions.winnowBuilder(
      Seq(text, Literal(8), Literal(4))).asInstanceOf[RollingFingerprint]
    assert(e.k == 8 && e.w == 4)
  }

  test("graft_winnow accepts BIGINT literals and foldable casts") {
    val e = GraftExtensions.winnowBuilder(
      Seq(text, Literal(8L), Cast(Literal(4L), IntegerType)))
      .asInstanceOf[RollingFingerprint]
    assert(e.k == 8 && e.w == 4)
  }

  test("graft_shingles accepts a foldable integral expression") {
    val e = GraftExtensions.shinglesBuilder(
      Seq(text, Cast(Literal(3), LongType))).asInstanceOf[WordShingles]
    assert(e.k == 3)
  }

  test("non-foldable and non-integral arguments are rejected") {
    val attr = org.apache.spark.sql.catalyst.expressions
      .AttributeReference("k", IntegerType)()
    intercept[IllegalArgumentException] {
      GraftExtensions.winnowBuilder(Seq(text, attr, Literal(4)))
    }
    intercept[IllegalArgumentException] {
      GraftExtensions.winnowBuilder(Seq(text, Literal("8"), Literal(4)))
    }
    intercept[IllegalArgumentException] {
      GraftExtensions.winnowBuilder(
        Seq(text, Literal(Int.MaxValue.toLong + 1), Literal(4)))
    }
  }

  test("arity errors name the function signature") {
    val err = intercept[IllegalArgumentException] {
      GraftExtensions.winnowBuilder(Seq(text))
    }
    assert(err.getMessage.contains("graft_winnow"))
  }

  test("graft_minhash and graft_hyperplane_bits build with folded int params") {
    val mh = GraftExtensions.minhashBuilder(
      Seq(text, Literal(12L))).asInstanceOf[MinHashSignatures]
    assert(mh.nPerm == 12)
    val hp = GraftExtensions.hyperplaneBuilder(
      Seq(Literal(Array[Byte](1, 2)), Cast(Literal(32), LongType), Literal(1)))
      .asInstanceOf[HyperplaneBits]
    assert(hp.nPlanes == 32 && hp.seed == 1)
    intercept[IllegalArgumentException] {
      GraftExtensions.hyperplaneBuilder(Seq(text, Literal(32)))
    }
  }
}
