package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Random-hyperplane signatures: exact-integer reference equivalence,
  * the angle→bit-agreement property LSH banding relies on, and null
  * plumbing through the column form. */
class HyperplaneBitsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** Straight-line reference: same LCG weights, BigInt accumulation —
    * an overflow or sign slip in the expression can't self-confirm. */
  private def reference(q: Array[Byte], nPlanes: Int, seed: Int): Long = {
    var sig = 0L
    for (p <- 0 until nPlanes) {
      val dot = (0 until q.length).map { d =>
        val w = ((BigInt(1103515245) * (seed + p * 8192 + d) + 12345) % 2001) - 1000
        BigInt(q(d).toInt) * w
      }.sum
      if (dot >= 0) sig |= (1L << p)
    }
    sig
  }

  test("expression matches the BigInt reference on random vectors") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 20) {
      val q = Array.fill(64)((rnd.nextInt(255) - 127).toByte)
      assert(HyperplaneBitsUtil.bits(q, 32, 1) == reference(q, 32, 1))
      assert(HyperplaneBitsUtil.bits(q, 64, 7) == reference(q, 64, 7))
    }
  }

  test("near-identical vectors agree on almost all bits; random pairs don't") {
    val rnd = new scala.util.Random(23)
    val agreeNear = scala.collection.mutable.ArrayBuffer[Int]()
    val agreeRand = scala.collection.mutable.ArrayBuffer[Int]()
    for (_ <- 1 to 30) {
      val a = Array.fill(64)((rnd.nextInt(255) - 127).toByte)
      val near = a.clone(); near(63) = math.max(-127, near(63) - 10).toByte
      val b = Array.fill(64)((rnd.nextInt(255) - 127).toByte)
      def agree(x: Array[Byte], y: Array[Byte]) =
        64 - java.lang.Long.bitCount(
          HyperplaneBitsUtil.bits(x, 64, 1) ^ HyperplaneBitsUtil.bits(y, 64, 1))
      agreeNear += agree(a, near)
      agreeRand += agree(a, b)
    }
    val nearAvg = agreeNear.sum.toDouble / agreeNear.size
    val randAvg = agreeRand.sum.toDouble / agreeRand.size
    assert(nearAvg > 58, s"near pairs agreed on only $nearAvg/64 bits")
    assert(randAvg < 42, s"random pairs agreed on $randAvg/64 bits — planes not random")
  }

  test("column form: codegen path, null in → null out") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Array(0.5f, -0.25f, 0.125f, 1.0f)),
      (2L, null.asInstanceOf[Array[Float]])
    ).toDF("id", "v")
      .select(col("id"), HyperplaneBits.of(QuantizeInt8.of(col("v")), 16, 1).as("sig"))
    val rows = df.orderBy("id").collect()
    val q = Int8VectorUtil.quantize(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(0.5f, -0.25f, 0.125f, 1.0f)))
    assert(rows(0).getLong(1) == reference(q, 16, 1))
    assert(rows(1).isNullAt(1))
  }
}
