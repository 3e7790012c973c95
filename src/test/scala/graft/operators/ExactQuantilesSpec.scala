package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Rank-arithmetic quantiles must equal Spark's built-in exact
  * `percentile` (which buffers per group — an independent algorithm)
  * across group sizes 1/2/odd/even, heavy ties, and the q=0/q=1
  * boundaries. */
class ExactQuantilesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val qs = Seq(0.0 -> "q000", 0.25 -> "q025", 0.5 -> "q050",
    0.9 -> "q090", 0.99 -> "q099", 1.0 -> "q100")

  private def data() = {
    val spark0 = spark
    import spark0.implicits._
    val rows =
      Seq("single" -> Seq(42.0),
        "pair" -> Seq(1.0, 2.0),
        "odd" -> Seq(5.0, 1.0, 9.0, 3.0, 7.0),
        "even" -> Seq(10.0, 40.0, 20.0, 30.0),
        "ties" -> Seq(2.0, 2.0, 2.0, 8.0, 8.0, 1.0),
        "wide" -> (1 to 101).map(_.toDouble))
    rows.flatMap { case (g, vs) => vs.map(v => (g, v)) }
      .toDF("g", "v").repartition(4)
  }

  test("matches the built-in exact percentile on every shape") {
    val df = data()
    val ours = ExactQuantiles.perGroup(df, Seq("g"), "v", qs)
      .collect().map(r => r.getString(0) ->
        qs.indices.map(i => r.getDouble(i + 2))).toMap
    val builtin = df.groupBy("g")
      .agg(expr(s"percentile(v, array(${qs.map(_._1).mkString(",")}))").as("p"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Double](1).map(v => math.rint(v * 1e4) / 1e4)).toMap
    assert(ours.keySet == builtin.keySet)
    ours.foreach { case (g, got) =>
      got.zip(builtin(g)).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) < 1e-6,
          s"group $g q=${qs(i)._1}: got $a, built-in $b")
      }
    }
  }

  test("NULL values are ignored, PERCENTILE_CONT-style") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("g", Option(1.0)), ("g", None), ("g", Option(3.0)),
      ("g", None), ("g", Option(2.0)), ("allnull", None))
      .toDF("g", "v").repartition(3)
    val rows = ExactQuantiles.perGroup(df, Seq("g"), "v",
      Seq(0.5 -> "p50", 1.0 -> "p100")).collect()
    // the all-NULL group vanishes (nothing to interpolate), and the
    // mixed group's ranks/count see only the three real values
    assert(rows.map(_.getString(0)).toSeq == Seq("g"))
    assert(rows.head.getLong(1) == 3L)
    assert(rows.head.getDouble(2) == 2.0 && rows.head.getDouble(3) == 3.0)
  }

  test("group row counts ride along") {
    val counts = ExactQuantiles.perGroup(data(), Seq("g"), "v", Seq(0.5 -> "p50"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("single" -> 1L, "pair" -> 2L, "odd" -> 5L,
      "even" -> 4L, "ties" -> 6L, "wide" -> 101L))
  }

  test("randomized: agrees with the built-in percentile on 30 arbitrary group shapes") {
    // hand-rolled property sampling (no scalatest-scalacheck bridge in
    // the offline cache): seeded, so a failure is reproducible
    val rnd = new scala.util.Random(20260812)
    val spark0 = spark
    import spark0.implicits._
    val qsR = Seq(0.1 -> "a", 0.5 -> "b", 0.75 -> "c", 0.95 -> "d")
    (1 to 3).foreach { round =>
      val rows = (1 to 30).flatMap { g =>
        val n = 1 + rnd.nextInt(40)
        // mix continuous values and heavy ties
        (1 to n).map(_ => (s"g$g",
          if (rnd.nextBoolean()) rnd.nextInt(5).toDouble else rnd.nextDouble() * 100))
      }
      val df = rows.toDF("g", "v").repartition(5)
      val ours = ExactQuantiles.perGroup(df, Seq("g"), "v", qsR)
        .collect().map(r => r.getString(0) ->
          qsR.indices.map(i => r.getDouble(i + 2))).toMap
      val builtin = df.groupBy("g")
        .agg(expr(s"percentile(v, array(${qsR.map(_._1).mkString(",")}))").as("p"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      ours.foreach { case (g, got) =>
        got.zip(builtin(g)).foreach { case (a, b) =>
          assert(math.abs(a - b) < 5e-5, // ours rounds to 4 dp
            s"round $round group $g: got $a, built-in $b")
        }
      }
    }
  }

  test("approx_percentile (the mergeable-sketch scale default) tracks the exact values") {
    // The operator doc points hot 100 TB paths at approx_percentile;
    // this pins that the recommendation is sound — the sketch stays
    // within its accuracy contract of the exact rank-arithmetic values
    // on real data (sf0.001 token counts).
    val toks = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("lang"), graft.functions.TextFunctions.tokenCount(col("text")).as("v"))
    val exact = ExactQuantiles.perGroup(toks, Seq("lang"), "v",
      Seq(0.5 -> "p50", 0.9 -> "p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val approx = toks.groupBy("lang")
      .agg(expr("approx_percentile(v, array(0.5, 0.9), 1000)").as("p"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Long](1)(0).toDouble, r.getSeq[Long](1)(1).toDouble)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (lang, (e50, e90)) =>
      val (a50, a90) = approx(lang)
      // approx_percentile returns an actual data value at a rank within
      // accuracy; token counts are small integers, so within a few units
      assert(math.abs(a50 - e50) <= 3, s"$lang p50: approx $a50 vs exact $e50")
      assert(math.abs(a90 - e90) <= 3, s"$lang p90: approx $a90 vs exact $e90")
    }
  }

  test("plans one exchange on the group key, no value buffering aggregate") {
    val df = data()
    val plan = ExactQuantiles.perGroup(df, Seq("g"), "v", Seq(0.5 -> "p50"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("),
      s"must not fall back to the buffering percentile aggregate:\n$plan")
    // hashpartitioning(g) for the window; the final groupBy reuses it
    assert("hashpartitioning\\(g".r.findAllIn(plan).length >= 1)
  }
}
