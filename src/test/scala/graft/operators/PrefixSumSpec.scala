package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The two-phase prefix sum must equal the single-window running sum
  * (an independent spelling) on every shape — including the scale
  * scenario it exists for: one stratum holding ~90% of the rows — and
  * must actually SPREAD a hot stratum across range partitions rather
  * than re-serializing it into one task. */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def singleWindow(
      df: org.apache.spark.sql.DataFrame,
      group: String,
      order: Seq[org.apache.spark.sql.Column]) =
    df.withColumn("expect",
      sum(col("v")).over(Window.partitionBy(group).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  test("equals the single-window running sum on skewed strata") {
    val spark0 = spark
    import spark0.implicits._
    // one hot stratum with 90% of rows, several cold ones, plus a
    // 1-row stratum and heavy value ties (the range-boundary case)
    val rng = new scala.util.Random(7)
    val rows =
      (1 to 1800).map(i => ("hot", i.toLong, rng.nextInt(5).toLong)) ++
        (1 to 120).map(i => ("cold_a", i.toLong, rng.nextInt(50).toLong)) ++
        (1 to 60).map(i => ("cold_b", i.toLong, 3L)) ++
        Seq(("solo", 1L, 9L))
    val df = rows.toDF("g", "id", "v").repartition(8)

    val got = PrefixSum.runningSum(df, Seq("g"),
        Seq(col("v").desc, col("id")), col("v"), "cum", numPartitions = 16)
    val expect = singleWindow(df, "g", Seq(col("v").desc, col("id")))
    val joined = got.join(expect.select("g", "id", "expect"), Seq("g", "id"))
    assert(joined.filter(col("cum") =!= col("expect")).count() == 0,
      "two-phase prefix sum diverged from the single-window oracle")
    assert(got.count() == rows.size.toLong)
  }

  test("spreads the hot stratum across many range partitions") {
    val spark0 = spark
    import spark0.implicits._
    val rows = (1 to 5000).map(i => ("hot", i.toLong, 1L)) ++
      (1 to 50).map(i => ("cold", i.toLong, 1L))
    val df = rows.toDF("g", "id", "v").repartition(8)
    // count the distinct (g, pid) cells the hot stratum lands in — the
    // whole point of the operator is that this exceeds 1
    val cells = df.repartitionByRange(16, col("g"), col("id"))
      .withColumn("pid", spark_partition_id())
      .filter(col("g") === "hot")
      .select("pid").distinct().count()
    assert(cells > 1,
      s"hot stratum still serialized into one range partition ($cells)")
    // and the result over that layout is still exact
    val got = PrefixSum.runningSum(df, Seq("g"), Seq(col("id")),
      col("v"), "cum", numPartitions = 16)
    val expect = singleWindow(df, "g", Seq(col("id")))
    val joined = got.join(expect.select("g", "id", "expect"), Seq("g", "id"))
    assert(joined.filter(col("cum") =!= col("expect")).count() == 0)
  }

  test("matches the single window across 25 seeded random shapes") {
    val spark0 = spark
    import spark0.implicits._
    (1 to 25).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val nGroups = 1 + rng.nextInt(6)
      val rows = (1 to 300 + rng.nextInt(700)).map { i =>
        // skewed group pick: group 0 absorbs ~half of each draw range
        val g = math.max(0, rng.nextInt(2 * nGroups) - nGroups)
        (s"g$g", i.toLong, rng.nextInt(100).toLong)
      }
      val df = rows.toDF("g", "id", "v").repartition(1 + rng.nextInt(7))
      val order =
        if (rng.nextBoolean()) Seq(col("v").desc, col("id")) else Seq(col("id"))
      val parts = 2 + rng.nextInt(20)
      val got = PrefixSum.runningSum(df, Seq("g"), order, col("v"), "cum", parts)
      val expect = singleWindow(df, "g", order)
      val bad = got.join(expect.select("g", "id", "expect"), Seq("g", "id"))
        .filter(col("cum") =!= col("expect")).count()
      assert(bad == 0, s"seed $seed (parts=$parts): $bad diverging rows")
    }
  }

  test("correct and repeatable over a PERSISTED input (pid-frame freeze regression)") {
    // The observed corruption mode: a cached upstream defeated AQE's
    // exchange reuse, each branch re-sampled DIFFERENT range bounds
    // (the sample seed involves the RDD id), and the offsets join
    // silently mis-assigned partition offsets — results varied run to
    // run (corpus_training_tokens flipped 256/257/258 rows at 4
    // shuffle partitions). The pid frame is now frozen to one RDD
    // instance; this pins both correctness and run-to-run stability
    // over a persisted input at low partition counts.
    val spark0 = spark
    import spark0.implicits._
    val rng = new scala.util.Random(3)
    val rows = (1 to 900).map { i =>
      (s"g${rng.nextInt(4)}", i.toLong, rng.nextInt(50).toLong)
    }
    val df = rows.toDF("g", "id", "v").repartition(5).persist()
    df.count()
    try {
      val expect = singleWindow(df, "g", Seq(col("id")))
        .select("g", "id", "expect")
      val runs = (1 to 3).map { _ =>
        val got = PrefixSum.runningSum(df, Seq("g"), Seq(col("id")),
          col("v"), "cum", numPartitions = 4)
        val bad = got.join(expect, Seq("g", "id"))
          .filter(col("cum") =!= col("expect")).count()
        assert(bad == 0, s"$bad diverging rows on persisted input")
        got.orderBy("g", "id").collect().map(_.toString).toSeq
      }
      assert(runs.distinct.size == 1, "running sums varied across identical runs")
    } finally df.unpersist()
  }

  test("rankVariants equals the five single-window rank functions on a skewed tie-heavy frame") {
    val spark0 = spark
    import spark0.implicits._
    // heavy ties (7 distinct keys over 2k rows, one key holding ~90%)
    // force every divergence mode: rank gaps, dense compaction, the
    // n−1 vs n denominators, and tie-group spans crossing range
    // partition boundaries
    val rng = new scala.util.Random(11)
    val rows = (1 to 1800).map(i => (i.toLong, 100L)) ++
      (1 to 200).map(i => ((i + 1800).toLong, (rng.nextInt(6) + 1) * 10L)) ++
      Seq((2001L, 999L)) // a unique max key (rank 1 under desc)
    val df = rows.toDF("id", "k").repartition(8)

    val got = PrefixSum.rankVariants(
      df, Seq("k" -> false), Seq(col("id")), numPartitions = 16,
      ntile = Some(7)) // 7 ∤ 2001 — uneven buckets exercised

    val tied = Window.orderBy(col("k").desc)
    val total = Window.orderBy(col("k").desc, col("id"))
    val expect = df
      .withColumn("e_rn", row_number().over(total).cast("long"))
      .withColumn("e_rnk", rank().over(tied).cast("long"))
      .withColumn("e_dense", dense_rank().over(tied).cast("long"))
      .withColumn("e_pct", percent_rank().over(tied))
      .withColumn("e_cume", cume_dist().over(tied))
      .withColumn("e_nt", ntile(7).over(total).cast("long"))

    val joined = got.join(
      expect.select("id", "e_rn", "e_rnk", "e_dense", "e_pct", "e_cume", "e_nt"), "id")
    assert(joined.filter(
      col("row_number") =!= col("e_rn") ||
        col("rank") =!= col("e_rnk") ||
        col("dense_rank") =!= col("e_dense") ||
        col("percent_rank") =!= col("e_pct") ||
        col("cume_dist") =!= col("e_cume") ||
        col("ntile") =!= col("e_nt")).count() == 0,
      "two-phase rank family diverged from the single-window oracle")
    assert(got.count() == rows.size.toLong)

    // the scale contract itself: the only partition-less Windows are
    // the per-partition offsets frames — bounded metadata (their child
    // aggregates on the range-partition id, ≤ numPartitions rows); no
    // window ever holds the full data frame in one task
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val bare = got.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
          !w.child.collectFirst {
            case a: Aggregate if a.groupingExpressions.exists(
              _.references.exists(_.name == "__psum_pid")) => a
          }.isDefined => w
    }
    assert(bare.isEmpty, s"rankVariants planned an unbounded partition-less window:\n${bare.mkString("\n")}")
  }

  test("rankVariants: single row and all-ties degenerate cases") {
    val spark0 = spark
    import spark0.implicits._
    // n == 1: percent_rank must be 0 (the n−1 denominator guard)
    val one = PrefixSum.rankVariants(
      Seq((1L, 5L)).toDF("id", "k"), Seq("k" -> true), Seq(col("id")))
      .collect().head
    assert(one.getAs[Long]("row_number") == 1L && one.getAs[Long]("rank") == 1L &&
      one.getAs[Long]("dense_rank") == 1L &&
      one.getAs[Double]("percent_rank") == 0.0 &&
      one.getAs[Double]("cume_dist") == 1.0)
    // every row tied: rank 1, dense 1, pct 0, cume 1 for all
    val all = PrefixSum.rankVariants(
      (1 to 40).map(i => (i.toLong, 7L)).toDF("id", "k"),
      Seq("k" -> true), Seq(col("id")), numPartitions = 6)
    assert(all.filter(col("rank") =!= 1L || col("dense_rank") =!= 1L ||
      col("percent_rank") =!= 0.0 || col("cume_dist") =!= 1.0).count() == 0)
    assert(all.select("row_number").distinct().count() == 40)
  }

  test("ascending single-key order and defaults work (packing shape)") {
    val spark0 = spark
    import spark0.implicits._
    val df = (1 to 300).map(i => (s"s${i % 3}", i.toLong, (i % 7).toLong))
      .toDF("g", "id", "v").repartition(5)
    val got = PrefixSum.runningSum(df, Seq("g"), Seq(col("id")), col("v"), "cum")
    val expect = singleWindow(df, "g", Seq(col("id")))
    val joined = got.join(expect.select("g", "id", "expect"), Seq("g", "id"))
    assert(joined.filter(col("cum") =!= col("expect")).count() == 0)
  }
}
