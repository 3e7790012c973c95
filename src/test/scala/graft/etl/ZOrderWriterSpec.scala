package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Z-order clustering: the Morton code must match a reference bit
  * interleave, and the written layout must actually enable two-column
  * data skipping — per-file value ranges tight on BOTH dimensions,
  * where a single-column sort leaves the second dimension unclustered. */
class ZOrderWriterSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def grid(): org.apache.spark.sql.DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    // a deterministic pseudo-uniform scatter over [0,1)² — seeded PRNG
    // per row so x and y are decorrelated (two linear congruential
    // hashes of i would correlate, and sorting by x would then
    // accidentally cluster y, breaking the control fixture)
    (0 until 10000).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, rnd.nextDouble(), rnd.nextDouble())
    }.toDF("id", "x", "y").repartition(8)
  }

  test("z-value equals a reference bit interleave") {
    val b = ZOrderWriter.Bounds(0.0, 1.0, 0.0, 1.0)
    val got = grid().limit(500)
      .select(col("x"), col("y"), ZOrderWriter.zValue(col("x"), col("y"), b).as("z"))
      .collect()
    def cell(v: Double) = math.min(65535L, math.max(0L, math.floor(v * 65536.0).toLong))
    def interleave(a: Long, bb: Long): Long =
      (0 until 16).map { i =>
        (((a >> i) & 1L) << (2 * i)) | (((bb >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    got.foreach { r =>
      val expected = interleave(cell(r.getDouble(0)), cell(r.getDouble(1)))
      assert(r.getLong(2) == expected,
        s"(${r.getDouble(0)}, ${r.getDouble(1)}): got ${r.getLong(2)}, expected $expected")
    }
  }

  test("files cover small rectangles in BOTH dimensions; 1-col sort does not") {
    val df = grid()
    val zDir = Files.createTempDirectory("zorder").toString + "/t"
    ZOrderWriter.write(df, zDir, "x", "y", numFiles = 16)
    val xDir = Files.createTempDirectory("xsort").toString + "/t"
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)

    def meanFileRange(path: String, c: String): Double = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("r"))
        .agg(avg("r")).head().getDouble(0)
      r
    }
    // 16 z-files ≈ a 4×4 grid: expect ~1/4 global range per dimension;
    // allow generous slack for curve boundary crossings
    assert(meanFileRange(zDir, "x") < 0.5, "z-order: x ranges not tight")
    assert(meanFileRange(zDir, "y") < 0.5, "z-order: y ranges not tight")
    // the single-column layout clusters x tightly but leaves y ~full-range
    assert(meanFileRange(xDir, "x") < 0.2)
    assert(meanFileRange(xDir, "y") > 0.9,
      "fixture broken: x-sorted files should NOT cluster y")
    // round trip: layout changes, rows don't
    assert(spark.read.parquet(zDir).count() == 10000)
    assert(spark.read.parquet(zDir).agg(sum("id")).head().getLong(0)
      == (0L until 10000L).sum)
  }

  test("degenerate, null, NaN and infinite dimensions cluster to the origin") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(
      (1L, 5.0, Option(1.0)), (2L, 5.0, None), (3L, 5.0, Option(2.0)),
      // one bad row must neither abort the write (ANSI floor(NaN) cast)
      // nor collapse the observed bounds to ±Inf
      (4L, Double.NaN, Option(1.5)),
      (5L, Double.PositiveInfinity, Option(Double.NegativeInfinity)))
      .toDF("id", "a", "b")
    val dir = Files.createTempDirectory("zdegen").toString + "/t"
    ZOrderWriter.write(df, dir, "a", "b", numFiles = 2)
    assert(spark.read.parquet(dir).count() == 5)
    // the finite b-range [1.0, 2.0] survived the Inf row
    val b = ZOrderWriter.bounds(df, "a", "b")
    assert(b.bLo == 1.0 && b.bHi == 2.0, b.toString)
  }
}
