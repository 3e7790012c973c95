package graft.plans

import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.Dedup

/** The dedup-window → packed max/min-struct rewrite: fires on the
  * canonical latestByKey plan (provably same results, including null
  * order keys under default null ordering), declines on mixed
  * directions and non-default null ordering, and engages end-to-end
  * when the session carries GraftExtensions. */
class DedupWindowToMaxBySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def versioned() = {
    val spark0 = spark
    import spark0.implicits._
    Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"), (1L, 20L, 99L, "c"),
      (2L, 5L, 50L, "d"),
      (3L, 7L, 70L, "e"), (3L, 7L, 71L, "f"))
      .toDF("k", "version", "seq", "payload")
  }

  private def windowNodes(p: LogicalPlan) =
    p.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }

  /** SharedSpark registers the rule session-wide; capture the
    * UN-rewritten optimized plan by excluding it for the duration. */
  private def planWithoutRule(df: => DataFrame): LogicalPlan = {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "graft.plans.DedupWindowToMaxBy")
    try df.queryExecution.optimizedPlan
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("rewrites rank=1 window to a packed max-struct with identical results") {
    val df = versioned()
    def deduped = Dedup.latestByKey(df, Seq("k"),
      Seq(col("version").desc, col("seq").desc))
    val before = planWithoutRule(deduped)
    assert(windowNodes(before).nonEmpty, s"expected a Window in:\n$before")
    val after = DedupWindowToMaxBy(before)
    assert(windowNodes(after).isEmpty, s"rule did not fire on:\n$before")
    assert(after.toString.contains("max("), s"expected max(struct) in:\n$after")
    val expected = GraftSqlShim.ofRows(spark, before).collect().map(_.toSeq).toSet
    val got = GraftSqlShim.ofRows(spark, after).collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.map(_.head) == Set(1L, 2L, 3L))
  }

  test("ascending order rewrites to min of the packed struct") {
    val df = versioned()
    def first = Dedup.latestByKey(df, Seq("k"),
      Seq(col("version").asc, col("seq").asc))
    val before = planWithoutRule(first)
    val after = DedupWindowToMaxBy(before)
    assert(windowNodes(after).isEmpty)
    assert(after.toString.contains("min("), s"expected min(struct) in:\n$after")
    val expected = GraftSqlShim.ofRows(spark, before).collect().map(_.toSeq).toSet
    assert(GraftSqlShim.ofRows(spark, after).collect().map(_.toSeq).toSet == expected)
  }

  test("declines: mixed directions, non-default null ordering") {
    val df = versioned()
    val mixedPlan = planWithoutRule(Dedup.latestByKey(df, Seq("k"),
      Seq(col("version").desc, col("seq").asc)))
    assert(windowNodes(DedupWindowToMaxBy(mixedPlan)).nonEmpty)

    val nfPlan = planWithoutRule(Dedup.latestByKey(df, Seq("k"),
      Seq(col("version").desc_nulls_first, col("seq").desc_nulls_first)))
    assert(windowNodes(DedupWindowToMaxBy(nfPlan)).nonEmpty)

    // a map-typed payload column is fine under the window form but not
    // inside max(struct(...)) — the rule must decline, not break the query
    val withMap = df.withColumn("props",
      map(lit("a"), col("payload")))
    val mapPlan = planWithoutRule(Dedup.latestByKey(withMap, Seq("k"),
      Seq(col("version").desc, col("seq").desc)))
    assert(windowNodes(DedupWindowToMaxBy(mapPlan)).nonEmpty,
      "rule must decline on non-orderable payload types")
    // and the un-rewritten plan still executes
    assert(GraftSqlShim.ofRows(spark, DedupWindowToMaxBy(mapPlan)).count() == 3)
  }

  test("nullable order keys with default null ordering: fires and matches") {
    val spark0 = spark
    import spark0.implicits._
    // groups: mixed null/value versions, an all-null-version group, a
    // null-version row winning/losing on the non-null seq tiebreak —
    // order (version, seq) stays total so both forms pick the same row
    val nullable = Seq(
      (1L, Option(10L), 1L, "a"), (1L, Option.empty[Long], 2L, "b"),
      (2L, Option.empty[Long], 1L, "c"), (2L, Option.empty[Long], 2L, "d"),
      (3L, Option(5L), 9L, "e"), (3L, Option(5L), 8L, "f"))
      .toDF("k", "version", "seq", "payload")
    for (dirDesc <- Seq(true, false)) {
      val order =
        if (dirDesc) Seq(col("version").desc, col("seq").desc)
        else Seq(col("version").asc, col("seq").asc)
      val before = planWithoutRule(Dedup.latestByKey(nullable, Seq("k"), order))
      assert(windowNodes(before).nonEmpty)
      val after = DedupWindowToMaxBy(before)
      assert(windowNodes(after).isEmpty, s"should fire (desc=$dirDesc):\n$before")
      val expected = GraftSqlShim.ofRows(spark, before).collect().map(_.toSeq).toSet
      val got = GraftSqlShim.ofRows(spark, after).collect().map(_.toSeq).toSet
      assert(got == expected, s"desc=$dirDesc")
    }
  }

  test("property: rewrite ≡ window on 20 seeded random datasets, both directions") {
    val spark0 = spark
    import spark0.implicits._
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(40)((
        rnd.nextInt(5).toLong, // key: few groups → guaranteed dups
        if (rnd.nextInt(4) == 0) Option.empty[Long] else Option(rnd.nextInt(8).toLong),
        rnd.nextLong(), // unique-ish tiebreak keeps the order total
        rnd.alphanumeric.take(6).mkString))
      val df = rows.toDF("k", "version", "seq", "payload")
      val desc = seed % 2 == 0
      val order =
        if (desc) Seq(col("version").desc, col("seq").desc)
        else Seq(col("version").asc, col("seq").asc)
      val before = planWithoutRule(Dedup.latestByKey(df, Seq("k"), order))
      val after = DedupWindowToMaxBy(before)
      assert(windowNodes(after).isEmpty, s"seed=$seed did not fire")
      val expected = GraftSqlShim.ofRows(spark, before).collect().map(_.toSeq).toSet
      val got = GraftSqlShim.ofRows(spark, after).collect().map(_.toSeq).toSet
      assert(got == expected, s"seed=$seed desc=$desc diverged")
    }
  }

  test("fires end-to-end through the session's optimizer (SharedSpark extensions)") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "version", "payload")
    val deduped = Dedup.latestByKey(df, Seq("k"), Seq(col("version").desc))
    val opt = deduped.queryExecution.optimizedPlan
    assert(windowNodes(opt).isEmpty && opt.toString.contains("max("),
      s"extension rule did not fire:\n$opt")
    assert(deduped.collect().map(r => (r.getLong(0), r.getString(2))).toSet ==
      Set((1L, "b"), (2L, "c")))
    // and the SQL functions ride along in the same extension
    val c = spark.sql(
      "SELECT graft_cosine(array(cast(1.0 as float)), array(cast(1.0 as float)))")
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("fires in a session built explicitly withExtensions") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions rather than the spark.sql.extensions conf: the
      // conf is static and ignored when reusing an existing SparkContext
      val ext = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.expressions.GraftExtensions()(_))
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      try {
        import ext.implicits._
        val df = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
          .toDF("k", "version", "payload")
        val deduped = Dedup.latestByKey(df, Seq("k"), Seq(col("version").desc))
        val opt = deduped.queryExecution.optimizedPlan
        assert(windowNodes(opt).isEmpty, s"extension rule did not fire:\n$opt")
      } finally {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
