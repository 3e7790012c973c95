package graft.views

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Hot-key behavior of the flagship view stack: one custno holding ~10%
  * of all sales rows (the whale-customer / data-bug shape that kills
  * naive plans at 100 TB).
  *
  * What protects each stage, and what this spec pins:
  *
  *   - W1/W2 dedup (rank=1 per custno/dealno): the DedupWindowToMaxBy
  *     rewrite turns the window into a max-struct AGGREGATE, so the hot
  *     key collapses map-side via partial aggregation — each input
  *     partition contributes one row per key to the shuffle, and the hot
  *     key's reduce-side work is O(#partitions), not O(#rows). Pinned:
  *     zero Window nodes in the dedup plan AND correct results on the
  *     skewed fixture.
  *   - Joins on custno: AQE skew-join splitting (on by default) plus the
  *     explicit SaltedJoin fallback (equivalence pinned in
  *     SaltedJoinSpec on a 90%-skew fixture).
  *   - W3 purchase_sequence (row_number per custno): irreducibly
  *     windowed — a per-key sequence needs the key's rows together, and
  *     salting cannot split it without breaking the global order. Its
  *     skew exposure is bounded by per-key CARDINALITY (deals per
  *     customer), not corpus size; a customer with 10% of a 100 TB feed
  *     is a data bug the validity filters should reject upstream.
  *     Pinned: correct dense sequence on the hot key at test scale.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val asOf = to_date(lit("2024-06-01"))

  /** ~10k sales rows; custno "whale" owns ~10% (1000 rows, one deal
    * each version-duplicated 10×), the rest spread over 900 customers. */
  private def skewedSales(): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val whale = (1 to 1000).flatMap { d =>
      (1 to 10).map { v => // 10 versions per deal → dedup pressure
        ("whale", s"W$d", s"VINW%09d".format(d), s"2023-01-%02d".format(d % 28 + 1),
          java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${v % 60}.0"), v.toLong)
      }
    }
    val rest = (1 to 900).map { c =>
      (s"C$c", s"D$c", s"VINC%09d".format(c), s"2023-02-%02d".format(c % 28 + 1),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00.0"), 1L)
    }
    (whale ++ rest)
      .toDF("custno", "dealno", "vin", "contractdate", "rowlastupdatedutc", "ver")
      .select(
        col("custno"), col("dealno"), col("vin"),
        col("contractdate").cast("timestamp").as("contractdate"),
        // version v carries second v → the LAST version wins W2's
        // rowlastupdatedutc-desc dedup deterministically
        col("rowlastupdatedutc"),
        concat(lit("S"), col("dealno")).as("stockno"),
        lit("Ford").as("makename"), lit("Model-1").as("modelname"),
        lit("2020").as("year"), lit("Sedan").as("bodystyle"),
        lit("Blue").as("color"), lit("new").as("modeltype"),
        lit(1000).cast("decimal(18,2)").as("vehiclemileage"),
        lit("cash").as("saletype"), lit("Retail").as("dealtype"),
        lit("B1").as("branch"),
        lit(30000).cast("decimal(18,2)").as("cashprice"),
        lit(31000).cast("decimal(18,2)").as("outthedoorprice"),
        lit(29000).cast("decimal(18,2)").as("costprice"),
        lit(2000).cast("decimal(18,2)").as("totalgross"),
        lit(1500).cast("decimal(18,2)").as("frontgross"),
        lit(500).cast("decimal(18,2)").as("backgross"),
        lit(1000).cast("decimal(18,2)").as("customercashdown"),
        lit(1000).cast("decimal(18,2)").as("totaldown"),
        lit(null).cast("string").as("financesource"),
        lit(null).cast("decimal(18,2)").as("financeamt"),
        lit(null).cast("decimal(18,2)").as("apr"),
        lit(null).cast("decimal(18,2)").as("term"),
        lit(null).cast("decimal(18,2)").as("paymentamt"),
        lit(null).cast("string").as("trade1vin"),
        lit(null).cast("decimal(18,2)").as("trade1acv"),
        lit(null).cast("decimal(18,2)").as("trade1payoff"),
        lit(null).cast("decimal(18,2)").as("nettrade1"),
        lit(null).cast("string").as("trade1year"),
        lit(null).cast("string").as("trade1makename"),
        lit(null).cast("string").as("trade1modelname"),
        lit(null).cast("string").as("leasetype"),
        lit(null).cast("decimal(18,2)").as("leasepayment"),
        lit(null).cast("decimal(18,2)").as("leasemileageallowance"),
        lit(null).cast("decimal(18,2)").as("leaseendvalue"),
        lit("Mgr").as("crmsalesmgrname"), lit("SP").as("crmsp1name"),
        col("contractdate").cast("timestamp").as("salesdate"))
  }

  test("vehicleHistory under a 10%-hot custno: dedup collapses, sequence stays dense") {
    val vh = Customer360.vehicleHistory(skewedSales(), asOf)

    // the dedup window must have been rewritten to an aggregate — that
    // rewrite IS the skew protection for W2 (map-side partial agg)
    val plan = vh.queryExecution.executedPlan.toString
    val windows = "Window \\[".r.findAllIn(plan).length
    assert(windows == 1,
      s"expected exactly the W3 sequence window (dedup rewritten), got $windows:\n$plan")

    val whale = vh.filter(col("custno") === "whale")
    // 10 versions per deal collapsed to 1
    assert(whale.count() == 1000)
    // last version won: rowlastupdatedutc carries the max per deal
    val d1 = whale.filter(col("deal_number") === "W1")
      .select("last_updated").head().getTimestamp(0)
    assert(d1 == java.sql.Timestamp.valueOf("2024-01-01 00:00:10.0"))
    // W3: the hot key's sequence is a dense 1..1000 permutation
    val seqs = whale.select("purchase_sequence")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(seqs == (1 to 1000))
    // cold keys unaffected
    assert(vh.filter(col("custno") === "C7")
      .select("purchase_sequence").head().getInt(0) == 1)
  }

  test("AQE skew handling is live in the engine session (the join-side guard)") {
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true",
      "AQE skew-join splitting must stay on — it is the first line of " +
        "defense for hot-key joins (SaltedJoin is the explicit fallback)")
  }

  test("AQE actually SPLITS a skewed join partition at runtime (skew=true in the final plan)") {
    // The config pin above says the guard is armed; this proves it
    // FIRES. A sort-merge join where one key owns ~95% of the bytes
    // must come out of AQE re-planning with its hot partition split
    // (OptimizeSkewedJoin marks the SMJ `skew=true`) — the runtime
    // behavior SaltedJoin exists to replicate when a join is NOT
    // AQE-splittable (e.g. feeding a same-key aggregate). Thresholds
    // are scaled down so the test-sized fixture crosses the same code
    // path a 100 TB hot key would; every conf is restored.
    val spark0 = spark
    import spark0.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot key 1: 60k rows with a padding payload; 100 cold keys
      val big = ((1 to 60000).map(i => (1L, i.toLong)) ++
        (2 to 101).flatMap(k => (1 to 20).map(i => (k.toLong, i.toLong))))
        .toDF("k", "v")
        .withColumn("pad", concat_ws("", (0 until 8).map(_ => md5(col("v").cast("string"))): _*))
      val dim = (1 to 101).map(k => (k.toLong, s"dim_$k")).toDF("k", "name")
      val joined = big.join(dim, "k")
      assert(joined.count() == 60000L + 100L * 20L)
      // count() runs its own QueryExecution; AQE finalizes per
      // execution — drive THIS frame's AdaptiveSparkPlanExec to its
      // final plan and read skew markers from that same execution
      val qe = joined.queryExecution
      assert(qe.executedPlan.execute().count() == 60000L + 100L * 20L)
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the hot partition (no skew=true in the final plan):\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
