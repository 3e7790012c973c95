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

  test("catalog pin survives any number of uncommitted refreshes (pinned GC retention)") {
    // The catalog-pinned version is passed into each member store's GC
    // at registration: however many member refreshes — crash replays
    // included, each publishing a FRESH generation — land between two
    // catalog commits, the pinned snapshot stays readable. (Before the
    // pin hook, keepVersions = 2 bought exactly two cycles of lag and a
    // third uncommitted cycle GC'd the pins — availability loss.)
    val (a, b, catalog) = mkViews()
    val base = rows((1L, 1L, 10.0))
    a.build(base); b.build(base)
    val pinned = catalog.commitCycle(spark)

    // FOUR refresh cycles without a catalog commit — far past the
    // rolling keepVersions = 2 window
    (2L to 5L).foreach { v =>
      val r = rows((1L, v, v * 10.0))
      a.refresh(r); b.refresh(r)
    }
    val stale = catalog.readAll(spark).get
    assertConsistent(stale)
    assert(amounts(stale("amounts"), "amount")(1L) == 10.0,
      "catalog must keep serving its pinned snapshot through uncommitted refreshes")

    // one cycle commit advances the live pin — but the SUPERSEDED
    // cycle stays an addressable snapshot within keepCycles (= 2), so
    // its member versions remain GC-retained through further refreshes
    catalog.commitCycle(spark)
    val recovered = catalog.readAll(spark).get
    assertConsistent(recovered)
    assert(amounts(recovered("amounts"), "amount")(1L) == 50.0)
    val r6 = rows((1L, 6L, 60.0))
    a.refresh(r6)
    assert(a.store.versions(spark).contains(pinned("amounts")),
      "a version named by a RETAINED archived cycle must survive member GC")

    // ...and once the cycle ages past keepCycles (two more commits),
    // the pin releases and member GC reclaims the old version
    val r7 = rows((1L, 7L, 70.0))
    b.refresh(r6); catalog.commitCycle(spark)
    a.refresh(r7); b.refresh(r7); catalog.commitCycle(spark)
    a.refresh(rows((1L, 8L, 80.0)))
    assert(!a.store.versions(spark).contains(pinned("amounts")),
      "a pin must be collectable once its cycle leaves the keepCycles window")
  }

  test("open(): a fresh session resolves the pinned snapshot from the lake alone") {
    val (a, b, _) = mkViews()
    val catRoot = {
      // mkViews hides the root; rebuild with a known one
      val base = rows((1L, 1L, 10.0), (2L, 1L, 20.0))
      a.build(base); b.build(base)
      val root = Files.createTempDirectory("graft_cat_open").toString
      val c2 = new SnapshotCatalog(root)
        .register("amounts", a.store).register("doubled", b.store)
      c2.commitCycle(spark)
      root
    }

    // a second SparkSession with NO registration wiring — the
    // cross-process reader shape: everything resolves from the manifest
    val reader = spark.newSession()
    val opened = SnapshotCatalog.open(reader, catRoot).get
    val views = opened.readAll(reader).get
    assertConsistent(views)
    assert(amounts(views("amounts"), "amount") == Map(1L -> 10.0, 2L -> 20.0))

    // a member refreshes and even re-commits through the WRITER's
    // catalog object: the opened handle re-reads the manifest per
    // resolve, so it follows commits — and between them keeps serving
    // the committed pin, never the live mid-cycle state
    val writer = new SnapshotCatalog(catRoot)
      .register("amounts", a.store).register("doubled", b.store)
    a.refresh(rows((1L, 2L, 99.0)))
    val midCycle = opened.readAll(reader).get
    assertConsistent(midCycle)
    assert(amounts(midCycle("amounts"), "amount")(1L) == 10.0,
      "an opened catalog must serve the committed pin, not the live view")
    b.refresh(rows((1L, 2L, 99.0)))
    writer.commitCycle(spark)
    val post = opened.readAll(reader).get
    assertConsistent(post)
    assert(amounts(post("amounts"), "amount")(1L) == 99.0)
  }

  test("open() under the object-store commit profile (ScanCommit end-to-end)") {
    // the cross-process read story must hold on stores with NO atomic
    // rename: catalog manifest AND member manifests all ScanCommit
    val commit = new ScanCommit()
    val rootA = Files.createTempDirectory("graft_cat_scan_a").toString
    val a = new GenerationStore(rootA, "__mv_bucket", keepVersions = 2, commit)
    val rows = spark.range(4).select(col("id").as("custno"),
      (col("id") * 10.0).as("amount"),
      org.apache.spark.sql.functions.pmod(col("id"), lit(2)).as("__mv_bucket"))
    a.publish(rows, Seq(0L, 1L))
    val catRoot = Files.createTempDirectory("graft_cat_scan").toString
    new SnapshotCatalog(catRoot, commit).register("amounts", a)
      .commitCycle(spark)

    val reader = spark.newSession()
    val opened = SnapshotCatalog.open(reader, catRoot, commit).get
    val served = opened.readAll(reader).get("amounts")
    assert(served.count() == 4)
    // a second publish does not move the opened reader off the pin
    a.publish(rows.withColumn("amount", col("amount") + 1), Seq(0L))
    assert(opened.readAll(reader).get("amounts")
      .agg(org.apache.spark.sql.functions.sum("amount")).head.getDouble(0) == 60.0)
  }

  test("snapshot history: a fresh process opens cycle N-1 after N commits; pins release beyond keepCycles") {
    val (a, b, _) = mkViews()
    val base = rows((1L, 1L, 10.0), (2L, 1L, 20.0))
    a.build(base); b.build(base)
    val catRoot = Files.createTempDirectory("graft_cat_hist").toString
    val writer = new SnapshotCatalog(catRoot)
      .register("amounts", a.store).register("doubled", b.store)
    writer.commitCycle(spark)
    val c1 = writer.liveCycle(spark).get
    val aPinnedAtC1 = a.store.versions(spark).last

    // cycle N: both members absorb a batch, one commit
    val batch = rows((1L, 2L, 50.0))
    a.refresh(batch); b.refresh(batch)
    writer.commitCycle(spark)
    val c2 = writer.liveCycle(spark).get
    assert(c2 == c1 + 1 && writer.cycles(spark) == Seq(c1, c2))

    // ...plus an UNCOMMITTED refresh on one member, so the archived
    // read must thread through pins, not luck
    a.refresh(rows((1L, 3L, 77.0)))

    // a fresh session, no wiring: open cycle N-1 from the lake alone
    // and get the EXACT older consistent pair
    val reader = spark.newSession()
    val oldCat = SnapshotCatalog.open(reader, catRoot, atCycle = Some(c1)).get
    val oldViews = oldCat.readAll(reader).get
    assertConsistent(oldViews)
    assert(amounts(oldViews("amounts"), "amount") == Map(1L -> 10.0, 2L -> 20.0),
      "cycle N-1 must serve the exact frame set it committed")
    // the live open still serves cycle N
    val liveViews = SnapshotCatalog.open(reader, catRoot).get.readAll(reader).get
    assertConsistent(liveViews)
    assert(amounts(liveViews("amounts"), "amount")(1L) == 50.0)
    // an at-cycle handle is a reader: it refuses to coordinate
    assertThrows[IllegalArgumentException] { oldCat.commitCycle(reader) }
    // a cycle that never committed is not addressable
    assert(SnapshotCatalog.open(reader, catRoot, atCycle = Some(99L)).isEmpty)

    // a crashed partial commit (archive newer than the live header) is
    // never served, and the next commit GCs it
    AtomicText.write(new org.apache.hadoop.fs.Path(catRoot, "_CATALOG.v41"),
      "!cycle=41\nbogus:1:x:y", spark.sparkContext.hadoopConfiguration)
    assert(writer.cycles(spark) == Seq(c1, c2),
      "a partial archive newer than the live header must not be listed")
    assert(SnapshotCatalog.open(reader, catRoot, atCycle = Some(41L)).isEmpty)

    // two more cycles age c1 out of keepCycles = 2: it stops being
    // addressable and its member pins release at the next member GC
    val b3 = rows((1L, 4L, 60.0))
    a.refresh(b3); b.refresh(b3); writer.commitCycle(spark)
    val b4 = rows((1L, 5L, 70.0))
    a.refresh(b4); b.refresh(b4); writer.commitCycle(spark)
    assert(!writer.cycles(spark).contains(c1))
    assert(SnapshotCatalog.open(reader, catRoot, atCycle = Some(c1)).isEmpty,
      "an aged-out cycle must not open")
    assert(new java.io.File(catRoot, s"_CATALOG.v41").exists() == false,
      "the crashed partial archive must be GC'd by a later commit")
    a.refresh(rows((1L, 6L, 80.0)))
    assert(!a.store.versions(spark).contains(aPinnedAtC1),
      "member versions pinned only by an aged-out cycle must be reclaimed")
  }

  test("re-wiring through a fresh catalog handle replaces the pin hook instead of stacking; open honors a custom keepCycles") {
    val (a, b, _) = mkViews()
    val base = rows((1L, 1L, 10.0))
    a.build(base); b.build(base)
    val catRoot = Files.createTempDirectory("graft_cat_rewire").toString

    // three registrations of the same (root, name) through fresh
    // handles — the long-lived-JVM re-wiring shape — must add ONE
    // hook total (mkViews already wired its own catalog: relative
    // counts); a catalog at a DIFFERENT root adds a second
    val before = a.store.pinHookCount
    (1 to 3).foreach { _ =>
      new SnapshotCatalog(catRoot).register("amounts", a.store)
    }
    assert(a.store.pinHookCount == before + 1,
      "re-registering the same catalog root must replace its hook, not stack")
    new SnapshotCatalog(Files.createTempDirectory("graft_cat_other").toString)
      .register("amounts", a.store)
    assert(a.store.pinHookCount == before + 2, "distinct catalog roots compose")

    // a coordinator with keepCycles = 3 retains three cycles; opening
    // the oldest needs the coordinator's window — the default-2 reader
    // correctly refuses it (its pins may be gone under ITS contract)
    val writer = new SnapshotCatalog(catRoot, keepCycles = 3)
      .register("amounts", a.store).register("doubled", b.store)
    writer.commitCycle(spark)
    val c1 = writer.liveCycle(spark).get
    (2L to 3L).foreach { ver =>
      val batch = rows((1L, ver, ver * 10.0))
      a.refresh(batch); b.refresh(batch)
      writer.commitCycle(spark)
    }
    assert(writer.cycles(spark).size == 3)
    val reader = spark.newSession()
    assert(SnapshotCatalog.open(reader, catRoot, atCycle = Some(c1)).isEmpty,
      "a default-window reader must refuse a cycle outside ITS window")
    val opened = SnapshotCatalog.open(reader, catRoot,
      atCycle = Some(c1), keepCycles = 3).get
    assert(amounts(opened.readAll(reader).get("amounts"), "amount") ==
      Map(1L -> 10.0),
      "the coordinator-window reader must resolve the oldest retained cycle")
  }

  test("open() refuses a manifest it cannot resolve; snapshot() skips foreign lines") {
    val root = Files.createTempDirectory("graft_cat_mal").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(root, "_CATALOG")
    // a v1-era line (no location), a foreign line, and garbage
    AtomicText.write(path, "amounts:3\nnot a manifest line\n:junk:\n", conf)
    val cat = new SnapshotCatalog(root)
    // the version map degrades to the well-formed entries — no throw
    assert(cat.snapshot(spark).get == Map("amounts" -> 3L))
    // but a cross-process open cannot place "amounts" and must say so
    assertThrows[IllegalArgumentException] {
      SnapshotCatalog.open(spark, root)
    }
    // an absent manifest is None, not an error
    assert(SnapshotCatalog.open(spark,
      Files.createTempDirectory("graft_cat_none").toString).isEmpty)
  }
}
