package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.etl.{MaterializedView, SnapshotCatalog}

/** `Streams.maintainCycle`: one CDC stream maintaining TWO views under
  * cross-view snapshot isolation. The invariant (view B = 2·view A per
  * key, both derived from the same state) must hold at EVERY catalog
  * read — across clean batches, and across a crash injected BETWEEN the
  * two member refreshes, the window where the live per-view manifests
  * are torn (A post-batch, B pre-batch) and only the catalog pins a
  * consistent pair. */
class SnapshotCycleSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def rows(rs: (Long, Long, Double)*): DataFrame = {
    val s = spark; import s.implicits._
    rs.toDF("custno", "version", "amount")
  }

  private def amounts(df: DataFrame, c: String): Map[Long, Double] =
    df.collect().map(r => r.getAs[Long]("custno") -> r.getAs[Double](c)).toMap

  private def assertConsistent(catalog: SnapshotCatalog): Map[Long, Double] = {
    val views = catalog.readAll(spark).get
    val a = amounts(views("amounts"), "amount")
    val b = amounts(views("doubled"), "double_amount")
    assert(a.keySet == b.keySet, s"catalog served a torn key set: $a vs $b")
    a.foreach { case (k, v) =>
      assert(b(k) == v * 2, s"catalog served torn values at $k: $v vs ${b(k)}")
    }
    a
  }

  test("stream cycle: invariant holds per batch and across a mid-cycle crash replay") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("graft_cycle").toString
    val a = new MaterializedView(s"$root/a", Seq("custno"), Seq(col("version").desc),
      derive = st => st.select(col("custno"), col("amount")),
      nBuckets = 4, keepVersions = 2)
    val b = new MaterializedView(s"$root/b", Seq("custno"), Seq(col("version").desc),
      derive = st => st.select(col("custno"), (col("amount") * 2).as("double_amount")),
      nBuckets = 4, keepVersions = 2)
    val catalog = new SnapshotCatalog(s"$root/catalog")
      .register("amounts", a.store).register("doubled", b.store)
    val base = rows((1L, 1L, 10.0), (2L, 1L, 20.0))
    a.build(base); b.build(base)
    catalog.commitCycle(spark)
    assert(assertConsistent(catalog) == Map(1L -> 10.0, 2L -> 20.0))

    val crashBetween = new AtomicBoolean(false)
    def start(in: MemoryStream[(Long, Long, Double)]) =
      Streams.maintainCycle(
        in.toDF().toDF("custno", "version", "amount"), catalog, s"$root/ckpt")(
        batch => a.refresh(batch),
        batch => {
          if (crashBetween.getAndSet(false))
            throw new RuntimeException("injected crash between member refreshes")
          b.refresh(batch)
        })

    val in = MemoryStream[(Long, Long, Double)]
    // clean batch
    val q1 = start(in)
    try { in.addData((1L, 2L, 99.0)); q1.processAllAvailable() } finally q1.stop()
    assert(assertConsistent(catalog) == Map(1L -> 99.0, 2L -> 20.0))

    // crash between A's refresh and B's: A's live manifest is now a
    // batch ahead of B's — the exact torn window — but the catalog must
    // keep serving the last committed consistent cycle
    crashBetween.set(true)
    val q2 = start(in)
    in.addData((2L, 2L, 55.0))
    try q2.processAllAvailable()
    catch { case _: Exception => () } // injected crash kills the query
    finally q2.stop()
    assert(!crashBetween.get(), "the injected crash must have fired")
    assert(amounts(a.view(spark), "amount")(2L) == 55.0,
      "A should have absorbed the batch before the crash")
    assert(assertConsistent(catalog)(2L) == 20.0,
      "catalog must still serve the pre-crash cycle")

    // restart from the same checkpoint: the uncommitted batch replays;
    // A's replayed refresh is a byte-identical no-op (no new
    // generation), B catches up, the cycle commits a consistent pair
    val aGens = a.viewVersions(spark)
    val q3 = start(in)
    try q3.processAllAvailable() finally q3.stop()
    assert(a.viewVersions(spark) == aGens,
      "replaying an absorbed batch must publish no new generation")
    assert(assertConsistent(catalog) == Map(1L -> 99.0, 2L -> 55.0))
  }
}
