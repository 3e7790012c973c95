package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Cross-view snapshot isolation ([[SnapshotCatalog]]): two views
  * maintained from the same source must never serve a TORN PAIR — one
  * view post-refresh next to the other pre-refresh — to a reader that
  * resolves them through the catalog, even though each view's own live
  * manifest moves the instant its refresh publishes.
  *
  * The invariant used throughout: view A serves (custno, amount), view
  * B serves (custno, amount * 2) derived from the SAME state — any
  * consistent snapshot has B = 2·A for every customer; a torn pair
  * breaks it exactly when one view has absorbed a batch the other
  * hasn't.
  */
class SnapshotCatalogSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def rows(rs: (Long, Long, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rs.toDF("custno", "version", "amount")
  }

  private def mkViews() = {
    val rootA = Files.createTempDirectory("graft_cat_a").toString
    val rootB = Files.createTempDirectory("graft_cat_b").toString
    val a = new MaterializedView(rootA, Seq("custno"), Seq(col("version").desc),
      derive = st => st.select(col("custno"), col("amount")),
      nBuckets = 4, keepVersions = 2)
    val b = new MaterializedView(rootB, Seq("custno"), Seq(col("version").desc),
      derive = st => st.select(col("custno"), (col("amount") * 2).as("double_amount")),
      nBuckets = 4, keepVersions = 2)
    val catalog = new SnapshotCatalog(
      Files.createTempDirectory("graft_cat").toString)
      .register("amounts", a.store)
      .register("doubled", b.store)
    (a, b, catalog)
  }

  private def amounts(df: DataFrame, valueCol: String): Map[Long, Double] =
    df.collect().map(r => r.getAs[Long]("custno") -> r.getAs[Double](valueCol)).toMap

  private def assertConsistent(views: Map[String, DataFrame]): Unit = {
    val a = amounts(views("amounts"), "amount")
    val b = amounts(views("doubled"), "double_amount")
    assert(a.keySet == b.keySet, s"snapshot keys tore: $a vs $b")
    a.foreach { case (k, v) =>
      assert(b(k) == v * 2, s"snapshot values tore at $k: $v vs ${b(k)}")
    }
  }

  test("a cycle that dies between member refreshes never serves a torn pair") {
    val (a, b, catalog) = mkViews()
    val base = rows((1L, 1L, 10.0), (2L, 1L, 20.0))
    a.build(base); b.build(base)
    catalog.commitCycle(spark)
    assertConsistent(catalog.readAll(spark).get)

    // refresh cycle dies after A publishes, before B refreshes: A's own
    // live manifest already serves the new amount...
    val batch = rows((1L, 2L, 99.0))
    a.refresh(batch)
    assert(amounts(a.view(spark), "amount")(1L) == 99.0)
    // ...but the catalog still serves the complete OLD pair
    val midCycle = catalog.readAll(spark).get
    assertConsistent(midCycle)
    assert(amounts(midCycle("amounts"), "amount")(1L) == 10.0,
      "catalog must pin the pre-cycle snapshot until the cycle commits")

    // recovery: replay the batch into BOTH views, then commit the cycle
    b.refresh(batch)
    catalog.commitCycle(spark)
    val committed = catalog.readAll(spark).get
    assertConsistent(committed)
    assert(amounts(committed("amounts"), "amount")(1L) == 99.0)
  }

  test("a reader's resolved snapshot survives the next full cycle (retention >= 2)") {
    val (a, b, catalog) = mkViews()
    a.build(rows((1L, 1L, 10.0))); b.build(rows((1L, 1L, 10.0)))
    val pinned = catalog.commitCycle(spark)

    val next = rows((1L, 2L, 50.0))
    a.refresh(next); b.refresh(next)
    catalog.commitCycle(spark)

    // the old pinned versions are still readable as one consistent pair
    val oldA = a.store.readVersion(spark, pinned("amounts")).get
    val oldB = b.store.readVersion(spark, pinned("doubled")).get
    assert(amounts(oldA, "amount")(1L) == 10.0)
    assert(amounts(oldB, "double_amount")(1L) == 20.0)
    // and the live catalog serves the new pair
    assert(amounts(catalog.readAll(spark).get("amounts"), "amount")(1L) == 50.0)
  }

  test("registration rejects a store whose retention cannot back the catalog") {
    val mv = new MaterializedView(
      Files.createTempDirectory("graft_cat_k1").toString,
      Seq("custno"), Seq(col("version").desc),
      derive = st => st, nBuckets = 2) // keepVersions = 1
    val catalog = new SnapshotCatalog(
      Files.createTempDirectory("graft_cat_r").toString)
    assertThrows[IllegalArgumentException] {
      catalog.register("too_short", mv.store)
    }
  }

  test("commitCycle refuses a member that has never published") {
    val (a, _, catalog) = mkViews()
    a.build(rows((1L, 1L, 1.0))) // b never built
    assertThrows[IllegalArgumentException] {
      catalog.commitCycle(spark)
    }
  }

  test("retention grace window: a stale catalog ages out whole, never serves torn") {
    // keepVersions = 2 plus lazy GC buys the catalog two refreshes of
    // lag — but a catalog that sleeps through a THIRD finds its pins
    // GC'd, and the all-or-nothing read must then refuse rather than
    // mix a live member with a vanished one.
    val (a, b, catalog) = mkViews()
    val base = rows((1L, 1L, 10.0))
    a.build(base); b.build(base)
    catalog.commitCycle(spark)

    // two refresh cycles WITHOUT a catalog commit: still inside the
    // grace window — retention keeps the last keepVersions COMMITTED
    // manifests at each publish's GC, and GC is lazy (it runs at the
    // START of the next publish), so the pinned v1 survives the second
    // uncommitted cycle too and the catalog keeps serving the old pair
    val r1 = rows((1L, 2L, 20.0))
    a.refresh(r1); b.refresh(r1)
    val r2 = rows((1L, 3L, 30.0))
    a.refresh(r2); b.refresh(r2)
    val inGrace = catalog.readAll(spark).get
    assertConsistent(inGrace)
    assert(amounts(inGrace("amounts"), "amount")(1L) == 10.0)

    // the third uncommitted cycle's publish GCs the pinned version:
    // the catalog read refuses whole instead of serving a torn or
    // partial set
    val r3 = rows((1L, 4L, 40.0))
    a.refresh(r3); b.refresh(r3)
    assert(catalog.readAll(spark).isEmpty,
      "an aged-out catalog must refuse, not serve a torn set")

    // the recovery is one cycle commit, after which reads serve again
    catalog.commitCycle(spark)
    val recovered = catalog.readAll(spark).get
    assertConsistent(recovered)
    assert(amounts(recovered("amounts"), "amount")(1L) == 40.0)
  }
}
