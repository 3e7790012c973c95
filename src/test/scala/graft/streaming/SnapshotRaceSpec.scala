package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.etl.{MaterializedView, SnapshotCatalog}

/** The catalog's CONCURRENT-READER property: a reader thread resolving
  * `readAll` in a tight loop WHILE `maintainCycle` commits cycle after
  * cycle must only ever observe version sets that some committed cycle
  * pinned — all members from ONE cycle, never a torn mixture, never a
  * missing-version partial — and materializing the resolved frames must
  * keep honoring the derived invariant (view B = 2·view A per key).
  * `SnapshotCycleSpec` pins the crash/replay contract; this spec pins
  * the live race: manifest swaps, generation publishes and GC all land
  * mid-loop, and the pinned-version GC retention
  * ([[graft.etl.GenerationStore.pinnedVersions]]) plus keepVersions = 2
  * grace must hold under fire, not just between carefully sequenced
  * test steps. */
class SnapshotRaceSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def rows(rs: (Long, Long, Double)*): DataFrame = {
    val s = spark; import s.implicits._
    rs.toDF("custno", "version", "amount")
  }

  test("readAll races N streamed cycles: every resolution is one committed cycle") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("graft_race").toString
    val a = new MaterializedView(s"$root/a", Seq("custno"), Seq(col("version").desc),
      derive = st => st.select(col("custno"), col("amount")),
      nBuckets = 4, keepVersions = 2)
    val b = new MaterializedView(s"$root/b", Seq("custno"), Seq(col("version").desc),
      derive = st => st.select(col("custno"), (col("amount") * 2).as("double_amount")),
      nBuckets = 4, keepVersions = 2)
    val catalog = new SnapshotCatalog(s"$root/catalog")
      .register("amounts", a.store).register("doubled", b.store)
    a.build(rows((1L, 0L, 10.0), (2L, 0L, 20.0)))
    b.build(rows((1L, 0L, 10.0), (2L, 0L, 20.0)))
    catalog.commitCycle(spark)

    val committed = new ConcurrentLinkedQueue[Map[String, Long]]()
    committed.add(catalog.snapshot(spark).get)

    val observed = new ConcurrentLinkedQueue[Map[String, Long]]()
    val failures = new ConcurrentLinkedQueue[String]()
    val stop = new AtomicBoolean(false)
    val reader = new Thread(() => {
      var i = 0
      try {
        while (!stop.get()) {
          i += 1
          catalog.readAll(spark) match {
            case None =>
              failures.add(s"resolution $i: readAll refused (missing pinned version)")
            case Some(views) =>
              // the version set the frames were resolved AT: re-read for
              // bookkeeping — the frames themselves came from ONE
              // snapshot read inside readAll
              catalog.snapshot(spark).foreach(observed.add)
              if (i % 25 == 0) {
                // materialize occasionally: generation data must still
                // be on disk (GC grace) and the cross-view invariant
                // must hold on the resolved pair
                val av = views("amounts").collect()
                  .map(r => r.getAs[Long]("custno") -> r.getAs[Double]("amount")).toMap
                val bv = views("doubled").collect()
                  .map(r => r.getAs[Long]("custno") -> r.getAs[Double]("double_amount")).toMap
                if (av.keySet != bv.keySet ||
                    av.exists { case (k, v) => bv(k) != v * 2 })
                  failures.add(s"resolution $i served a torn pair: $av vs $bv")
              }
          }
        }
      } catch {
        case e: Throwable => failures.add(s"reader died at resolution $i: $e")
      }
    }, "graft-race-reader")

    val in = MemoryStream[(Long, Long, Double)]
    val q = Streams.maintainCycle(
      in.toDF().toDF("custno", "version", "amount"), catalog, s"$root/ckpt")(
      batch => a.refresh(batch),
      batch => b.refresh(batch))
    reader.start()
    try {
      (1L to 12L).foreach { v =>
        in.addData((1L, v, 10.0 * (v + 1)), (2L, v, 20.0 * (v + 1)))
        q.processAllAvailable()
        committed.add(catalog.snapshot(spark).get)
      }
      // let the reader spin a moment against the final quiescent state
      // in case the cycles outpaced it (they never do locally)
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (observed.size() < 100 && System.nanoTime() < deadline)
        Thread.sleep(10)
    } finally {
      stop.set(true)
      reader.join(30000)
      q.stop()
    }

    assert(failures.isEmpty, s"race violations: ${failures.asScala.take(3).toSeq}")
    val obs = observed.asScala.toSeq
    assert(obs.size >= 100, s"need >= 100 interleaved resolutions, got ${obs.size}")
    val legal = committed.asScala.toSet
    val torn = obs.filterNot(legal.contains)
    assert(torn.isEmpty,
      s"${torn.size} resolutions saw version sets no cycle committed, e.g. ${torn.take(2)}; " +
        s"legal=${legal.toSeq.sortBy(_.values.max)}")
  }
}
