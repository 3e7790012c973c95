package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The HLL register sketch's contract: registers are a deterministic
  * pure function of the key SET (partitioning-invariant), the merge is
  * exactly the union's sketch (the algebra incremental rollups rely
  * on), and the estimate lands within the published error bound on
  * both branches (raw harmonic estimate and small-range linear
  * counting). */
class HllSketchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def keyed(gs: (String, Int)*) = {
    val spark0 = spark
    import spark0.implicits._
    gs.flatMap { case (g, n) => (0 until n).map(i => (g, s"$g-key-$i")) }
      .toDF("g", "k")
  }

  private def estimates(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    HllSketch.estimate(HllSketch.registers(df, Seq("g"), "k"), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("estimate within 3 sigma on the raw branch, tight on linear counting") {
    val est = estimates(keyed("big" -> 5000, "small" -> 12, "one" -> 1))
    // raw branch: standard error 1.04/sqrt(64) ~= 13%; allow 3 sigma
    assert(math.abs(est("big") - 5000.0) / 5000.0 < 0.39, s"big=${est("big")}")
    // linear counting is near-exact at n << m
    assert(math.abs(est("small") - 12.0) / 12.0 < 0.25, s"small=${est("small")}")
    assert(est("one") > 0.0 && est("one") < 4.0, s"one=${est("one")}")
  }

  test("linear-counting branch actually fires for the small group") {
    val regs = HllSketch.registers(keyed("small" -> 12), Seq("g"), "k")
    val nPresent = regs.count()
    // n < m registers touched and the raw estimate is under the LC
    // threshold, so the branch the estimate takes is linear counting
    assert(nPresent < HllSketch.M)
  }

  test("registers are partitioning-invariant") {
    val df = keyed("a" -> 900, "b" -> 33)
    def regSet(parts: Int) =
      HllSketch.registers(df.repartition(parts), Seq("g"), "k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(regSet(1) == regSet(13))
  }

  test("merge(registers(A), registers(B)) == registers(A union B) exactly") {
    val a = keyed("a" -> 400, "b" -> 7)
    // overlapping keys with a, plus new ones — the union must dedup
    val b = keyed("a" -> 650, "b" -> 3, "c" -> 40)
    val merged = HllSketch.merge(
        HllSketch.registers(a, Seq("g"), "k"),
        HllSketch.registers(b, Seq("g"), "k"), Seq("g"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val whole = HllSketch.registers(a.unionByName(b), Seq("g"), "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(merged == whole)
  }

  test("incremental rollup estimate equals the batch estimate") {
    val day1 = keyed("g" -> 800)
    val day2 = keyed("g" -> 1200) // first 800 keys overlap day1
    val inc = HllSketch.estimate(
        HllSketch.merge(
          HllSketch.registers(day1, Seq("g"), "k"),
          HllSketch.registers(day2, Seq("g"), "k"), Seq("g")), Seq("g"))
      .collect().head.getDouble(1)
    val batch = estimates(day1.unionByName(day2))("g")
    assert(inc == batch)
  }
}
