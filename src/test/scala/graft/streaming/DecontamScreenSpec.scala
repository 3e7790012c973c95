package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.functions.TextFunctions
import graft.queries.CurationQueries

/** `Streams.decontamScreen`: the ingest-time decontamination screen
  * must agree EXACTLY with the nightly batch sweep — a document flagged
  * (or passed) at the door in whatever micro-batch it arrived in gets
  * the same verdict, hit count and ratio the batch `decontam_overlap`
  * stage would assign on the full corpus, because the stats are
  * per-document functions of (document, broadcast dictionary). Also
  * pins the quarantine-lane posture: every document lands in exactly
  * one lane, flagged documents are diverted WITH their stats (review
  * evidence), nothing is dropped. */
class DecontamScreenSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("streamed screen over K batches == the batch sweep on the union") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_decontam").toString

    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val dict = CurationQueries.benchShingleDict(docs)
    val corpus = docs.filter(!expr(CurationQueries.BenchPred))

    // the batch sweep's verdicts over the whole corpus
    val batchStats = TextFunctions.dictOverlapStats(corpus, dict)
      .select("doc_id", "n_hit", "n_shingles", "contam_ratio").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val batchFlagged = batchStats.filter(_._2._3 >= 0.2).keySet
    assert(batchFlagged.nonEmpty, "fixture must contain contaminated documents")

    // stream the corpus in 3 micro-batches through the screen
    val flagged = DecontamScreenSpec.flagged
    val clean = DecontamScreenSpec.clean
    flagged.clear(); clean.clear()
    val in = MemoryStream[Long]
    val cdc = in.toDF().toDF("__id")
      .join(corpus, col("__id") === col("doc_id")).drop("__id")
    val q = Streams.decontamScreen(cdc, dict, s"$root/ckpt")(
      onClean = b => b.select("doc_id", "n_hit", "n_shingles", "contam_ratio")
        .collect().foreach(r => DecontamScreenSpec.clean.add(
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))),
      onFlagged = b => b.select("doc_id", "n_hit", "n_shingles", "contam_ratio")
        .collect().foreach(r => DecontamScreenSpec.flagged.add(
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))))
    val ids = corpus.select("doc_id").collect().map(_.getLong(0))
    try {
      (0 to 2).foreach { i =>
        in.addData(ids.filter(_ % 3 == i).toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    val streamedFlagged = flagged.asScala.toSeq
    val streamedClean = clean.asScala.toSeq
    val all = streamedFlagged ++ streamedClean
    // exactly-one-lane, nothing dropped
    assert(all.map(_._1).sorted.toSeq == ids.sorted.toSeq,
      s"lanes must partition the corpus: ${all.size} of ${ids.length} docs")
    // verdict parity with the batch sweep
    assert(streamedFlagged.map(_._1).toSet == batchFlagged,
      s"flagged sets differ: streamed ${streamedFlagged.map(_._1).toSet} vs batch $batchFlagged")
    // stat parity, per document
    all.foreach { case (id, nHit, nSh, ratio) =>
      assert(batchStats(id) == ((nHit, nSh, ratio)),
        s"stats drifted for doc $id: streamed ($nHit,$nSh,$ratio) vs ${batchStats(id)}")
    }
    // the flagged lane carries its evidence (ratio at/over threshold)
    assert(streamedFlagged.forall(_._4 >= 0.2))
  }

  test("replayed copies of a document inside one micro-batch do not inflate its ratio") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_decontam_dup").toString

    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val dict = CurationQueries.benchShingleDict(docs)
    val corpus = docs.filter(!expr(CurationQueries.BenchPred))
    // a CLEAN document (per the batch sweep) that still has hits would be
    // the one a doubled hit count could flip — prefer one, else any clean
    val batchStats = TextFunctions.dictOverlapStats(corpus, dict)
      .select("doc_id", "n_hit", "n_shingles", "contam_ratio").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val target = batchStats.collectFirst {
      case (id, (nHit, _, ratio)) if ratio < 0.2 && ratio >= 0.1 && nHit > 0 => id
    }.getOrElse(batchStats.collectFirst {
      case (id, (_, _, ratio)) if ratio < 0.2 => id
    }.get)

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double, String)]()
    val in = MemoryStream[Long]
    val cdc = in.toDF().toDF("__id")
      .join(corpus, col("__id") === col("doc_id")).drop("__id")
    val q = Streams.decontamScreen(cdc, dict, s"$root/ckpt")(
      onClean = b => b.select("doc_id", "n_hit", "contam_ratio")
        .collect().foreach(r => seen.add((r.getLong(0), r.getLong(1), r.getDouble(2), "clean"))),
      onFlagged = b => b.select("doc_id", "n_hit", "contam_ratio")
        .collect().foreach(r => seen.add((r.getLong(0), r.getLong(1), r.getDouble(2), "flagged"))))
    try {
      // the at-least-once shape: the same id delivered 3× IN ONE batch
      in.addData(target, target, target)
      q.processAllAvailable()
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    val rows = seen.asScala.toSeq
    assert(rows.size == 1, s"replayed copies must collapse to one verdict row: $rows")
    val (id, nHit, ratio, lane) = rows.head
    val (expHit, _, expRatio) = batchStats(target)
    assert(id == target && nHit == expHit && ratio == expRatio,
      s"duplicate copies inflated the stats: got ($nHit,$ratio), batch says ($expHit,$expRatio)")
    assert(lane == "clean")
  }
}

object DecontamScreenSpec {
  val flagged = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Double)]()
  val clean = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Double)]()
}
