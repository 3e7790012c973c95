package graft.plans

import org.apache.spark.sql.{GraftSqlShim, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.Dedup

/** The dedup-window → max_by rewrite: fires on the canonical
  * latestByKey plan (provably same results), declines on nullable or
  * mixed-direction order keys, and engages end-to-end when the session
  * is built with GraftExtensions. */
class DedupWindowToMaxBySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  // Long fields → non-nullable columns, so the rule's nullability gate
  // passes without extra casts.
  private def versioned() = {
    val spark0 = spark
    import spark0.implicits._
    Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"), (1L, 20L, 99L, "c"),
      (2L, 5L, 50L, "d"),
      (3L, 7L, 70L, "e"), (3L, 7L, 71L, "f"))
      .toDF("k", "version", "seq", "payload")
  }

  private def windowNodes(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    p.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }

  test("rewrites rank=1 window to max_by with identical results") {
    val df = versioned()
    val deduped = Dedup.latestByKey(df, Seq("k"),
      Seq(col("version").desc, col("seq").desc))
    val before = deduped.queryExecution.optimizedPlan
    assert(windowNodes(before).nonEmpty, s"expected a Window in:\n$before")
    val after = DedupWindowToMaxBy(before)
    assert(windowNodes(after).isEmpty, s"rule did not fire on:\n$before")
    assert(after.toString.contains("max_by"), s"expected max_by in:\n$after")
    val expected = deduped.collect().map(_.toSeq).toSet
    val got = GraftSqlShim.ofRows(spark, after).collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.map(_.head) == Set(1L, 2L, 3L))
  }

  test("ascending order rewrites to min_by") {
    val df = versioned()
    val first = Dedup.latestByKey(df, Seq("k"),
      Seq(col("version").asc, col("seq").asc))
    val after = DedupWindowToMaxBy(first.queryExecution.optimizedPlan)
    assert(after.toString.contains("min_by"))
    val expected = first.collect().map(_.toSeq).toSet
    assert(GraftSqlShim.ofRows(spark, after).collect().map(_.toSeq).toSet == expected)
  }

  test("declines: mixed directions, nullable keys") {
    val df = versioned()
    val mixed = Dedup.latestByKey(df, Seq("k"),
      Seq(col("version").desc, col("seq").asc))
    val mixedPlan = mixed.queryExecution.optimizedPlan
    assert(windowNodes(DedupWindowToMaxBy(mixedPlan)).nonEmpty)

    val spark0 = spark
    import spark0.implicits._
    val nullable = Seq((1L, Option(10L), "a"), (1L, Option.empty[Long], "b"))
      .toDF("k", "version", "payload")
    val plan = Dedup.latestByKey(nullable, Seq("k"), Seq(col("version").desc))
      .queryExecution.optimizedPlan
    assert(windowNodes(DedupWindowToMaxBy(plan)).nonEmpty)
  }

  test("fires end-to-end in a session built with GraftExtensions") {
    val base = spark // ensure context exists
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
        assert(windowNodes(opt).isEmpty && opt.toString.contains("max_by"),
          s"extension rule did not fire:\n$opt")
        assert(deduped.collect().map(r => (r.getLong(0), r.getString(2))).toSet ==
          Set((1L, "b"), (2L, "c")))
        // and the SQL functions ride along in the same extension
        val c = ext.sql(
          "SELECT graft_cosine(array(cast(1.0 as float)), array(cast(1.0 as float)))")
          .head().getDouble(0)
        assert(math.abs(c - 1.0) < 1e-12)
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
