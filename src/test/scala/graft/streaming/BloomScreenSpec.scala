package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.{BloomDedup, Dedup}

/** `Streams.bloomDedupScreen`: the bounded-state streaming dedup screen.
  * Pins sequential-prefix parity (streamed verdicts ≡ the batch replay
  * of the same prefix semantics), the no-false-negative guarantee
  * across batches, the bounded state row count under ingest, and the
  * crash shape: a replay AFTER the state absorbed the batch quarantines
  * rather than re-emits, and never loses a document. */
class BloomScreenSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def mkDocs(ids: Seq[Long], tag: String): Seq[(Long, String)] =
    ids.map(i => (i, s"$tag stream document body $i"))

  /** The batch replay of the screen's documented semantics over
    * sequential batches: in-batch survivor dedup + bloom vs the filter
    * of all PRIOR batches. */
  private def batchReplay(batches: Seq[Seq[(Long, String)]]): (Set[Long], Set[Long]) = {
    val s0 = spark
    import s0.implicits._
    var state: DataFrame = null
    var fresh = Set.empty[Long]
    var dup = Set.empty[Long]
    batches.foreach { b =>
      val df = b.toDF("doc_id", "text")
      val survivors = Dedup.exactByHash(df, "text", "doc_id")
      val survIds = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
      val flagged =
        if (state == null) Set.empty[Long]
        else BloomDedup.screen(df, col("text"), state, Seq("doc_id"))
          .filter(col("flagged")).select("doc_id").collect().map(_.getLong(0)).toSet
      val dupIds = df.select("doc_id").collect().map(_.getLong(0)).toSet
        .filter(id => flagged.contains(id) || !survIds.contains(id))
      dup ++= dupIds
      fresh ++= df.select("doc_id").collect().map(_.getLong(0)).toSet -- dupIds
      val bits = BloomDedup.buildBitset(survivors, col("text"))
      state = if (state == null) bits else BloomDedup.mergeBitsets(state, bits)
      state = state.localCheckpoint(true)
    }
    (fresh, dup)
  }

  test("streamed verdicts over K batches == the sequential batch replay") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_bloomscreen").toString

    // batch 1: 40 fresh; batch 2: 30 fresh + 5 replays of batch 1 (new
    // ids, same text) + an in-batch content dup pair; batch 3: replays
    // of batch 2 + fresh
    val b1 = mkDocs(0L until 40L, "b1")
    val b2 = mkDocs(100L until 130L, "b2") ++
      b1.take(5).zipWithIndex.map { case ((_, t), j) => (200L + j, t) } ++
      Seq((250L, "b2 stream document body 100"))
    val b3 = mkDocs(300L until 320L, "b3") ++
      b2.take(3).zipWithIndex.map { case ((_, t), j) => (400L + j, t) }
    val (expFresh, expDup) = batchReplay(Seq(b1, b2, b3))

    val fresh = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val dup = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val in = MemoryStream[(Long, String)]
    val q = Streams.bloomDedupScreen(
      in.toDF().toDF("doc_id", "text"), s"$root/state", s"$root/ckpt")(
      onFresh = b => b.select("doc_id").collect().foreach(r => fresh.add(r.getLong(0))),
      onDup = b => b.select("doc_id").collect().foreach(r => dup.add(r.getLong(0))))
    try {
      Seq(b1, b2, b3).foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    assert(fresh.asScala.toSet == expFresh,
      s"fresh lanes drifted: streamed ${fresh.asScala.toSet} vs replay $expFresh")
    assert(dup.asScala.toSet == expDup)
    // every known replay was caught (ids 200-204, 250, 400-402)
    assert(Set(200L, 201L, 202L, 203L, 204L, 250L, 400L, 401L, 402L).subsetOf(dup.asScala.toSet))
    // nothing dropped, exactly one lane each
    assert(fresh.asScala.toSet.intersect(dup.asScala.toSet).isEmpty)
    assert((fresh.asScala.toSet ++ dup.asScala.toSet) ==
      (b1 ++ b2 ++ b3).map(_._1).toSet)
    // the state stayed bounded
    val stateRows = BloomDedup.State.load(spark, s"$root/state").count()
    assert(stateRows <= BloomDedup.Words)
  }

  test("crash after the state append: the replayed batch quarantines, never drops") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_bloomcrash").toString
    val docs = mkDocs(0L until 25L, "crash")

    // simulate "crashed after the state absorbed the batch, before the
    // checkpoint committed": pre-append the batch's bitset out-of-band,
    // then run the stream from a fresh checkpoint (= the replay)
    BloomDedup.State.append(
      BloomDedup.buildBitset(docs.toDF("doc_id", "text"), col("text")),
      s"$root/state")

    val fresh = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val dup = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val in = MemoryStream[(Long, String)]
    val q = Streams.bloomDedupScreen(
      in.toDF().toDF("doc_id", "text"), s"$root/state", s"$root/ckpt")(
      onFresh = b => b.select("doc_id").collect().foreach(r => fresh.add(r.getLong(0))),
      onDup = b => b.select("doc_id").collect().foreach(r => dup.add(r.getLong(0))))
    try { in.addData(docs: _*); q.processAllAvailable() } finally q.stop()

    import scala.jdk.CollectionConverters._
    // the replay sees every probe already set → quarantined, not lost
    assert(fresh.asScala.isEmpty, "a replayed batch must not re-emit fresh rows")
    assert(dup.asScala.toSet == docs.map(_._1).toSet)
    // and the replayed append was a no-op on the folded state
    val bits = BloomDedup.State.load(spark, s"$root/state")
    val direct = BloomDedup.buildBitset(docs.toDF("doc_id", "text"), col("text"))
    assert(bits.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      direct.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("replayed copies of one id inside a batch collapse to one verdict") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_bloomdupid").toString
    val fresh = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val dup = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val in = MemoryStream[(Long, String)]
    val q = Streams.bloomDedupScreen(
      in.toDF().toDF("doc_id", "text"), s"$root/state", s"$root/ckpt")(
      onFresh = b => b.select("doc_id").collect().foreach(r => fresh.add(r.getLong(0))),
      onDup = b => b.select("doc_id").collect().foreach(r => dup.add(r.getLong(0))))
    try {
      in.addData((7L, "only doc"), (7L, "only doc"), (7L, "only doc"))
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    assert(fresh.asScala.toSeq == Seq(7L), "3 copies of one id must collapse to one fresh row")
    assert(dup.asScala.isEmpty)
  }
}
