package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.ext.TextLsh

/** The streaming corpus-ingest composition: quality gate, within-batch
  * exact dedup, cross-batch exact dedup against persistent state, LSH
  * screen against the corpus index — each stage provably catching its
  * planted document, unit-level and through real micro-batches. */
class CorpusIngestSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  // ≥20 tokens with 'the'/'a' stopwords → qualityScore 1.0; vocabulary
  // is per-doc unique so no accidental cross-doc band collisions
  private def goodText(stem: String): String = {
    val ws = (1 to 10).map(i => s"$stem$i")
    ("the " + ws.mkString(" ") + " a " + ws.reverse.mkString(" "))
  }
  private val junkText = "zzz yyy xxx" // 3 tokens, no stopwords → score 0

  private def corpus() = {
    val spark0 = spark
    import spark0.implicits._
    Seq((101L, goodText("corpusone")), (102L, goodText("corpustwo")))
      .toDF("doc_id", "text")
  }

  test("each stage rejects exactly its planted document") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("ingest_unit").toString
    val bands = TextLsh.bandRows(corpus(), "doc_id", "text")

    val batch1 = Seq(
      (1L, goodText("fresh")),          // accepted
      (2L, junkText),                   // quality gate
      (3L, goodText("corpusone")),      // exact copy of corpus → LSH screen
      (4L, goodText("fresh")))          // in-batch dup of doc 1
      .toDF("doc_id", "text")
    val s1 = CorpusIngest.ingestBatch(batch1, "doc_id", "text",
      bands, s"$dir/state", s"$dir/accept")
    assert(s1 == CorpusIngest.BatchStats(
      input = 4, lowQuality = 1, dupInBatch = 1, dupExact = 0,
      dupNear = 1, accepted = 1), s1.toString)

    val batch2 = Seq(
      (5L, goodText("fresh")),          // cross-batch dup of doc 1 → state
      (6L, goodText("brandnew")))       // accepted
      .toDF("doc_id", "text")
    val s2 = CorpusIngest.ingestBatch(batch2, "doc_id", "text",
      bands, s"$dir/state", s"$dir/accept")
    assert(s2 == CorpusIngest.BatchStats(
      input = 2, lowQuality = 0, dupInBatch = 0, dupExact = 1,
      dupNear = 0, accepted = 1), s2.toString)

    val landed = spark.read.parquet(s"$dir/accept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(landed == Set(1L, 6L))
    // state holds exactly the accepted content hashes
    assert(spark.read.parquet(s"$dir/state").distinct().count() == 2)
  }

  test("crash between document write and state append re-ingests one batch, once") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("ingest_crash").toString
    val bands = TextLsh.bandRows(corpus(), "doc_id", "text")
    val batch = Seq((1L, goodText("crashy"))).toDF("doc_id", "text")

    // simulate the documented crash window: documents landed, hashes
    // did not (state append is the SECOND write) — replay by running
    // the same batch again against the state that lacks its hashes
    CorpusIngest.ingestBatch(batch, "doc_id", "text",
      bands, s"$dir/state", s"$dir/accept")
    deleteRec(new java.io.File(s"$dir/state")) // as if the append was lost
    val replay = CorpusIngest.ingestBatch(batch, "doc_id", "text",
      bands, s"$dir/state", s"$dir/accept")
    // the replay re-accepts (at-least-once window): accept dir now holds
    // the doc twice — the bound the scaladoc promises — and state heals
    assert(replay.accepted == 1)
    assert(spark.read.parquet(s"$dir/accept").count() == 2)
    // with state intact, a further replay is a no-op: duplicates are
    // bounded to the single interrupted batch
    val again = CorpusIngest.ingestBatch(batch, "doc_id", "text",
      bands, s"$dir/state", s"$dir/accept")
    assert(again == replay.copy(accepted = 0, dupExact = 1))
    assert(spark.read.parquet(s"$dir/accept").count() == 2)
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }

  test("flows through deliverStream micro-batches end to end") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("ingest_stream").toString
    val bands = TextLsh.bandRows(corpus(), "doc_id", "text")

    val in = MemoryStream[(Long, String)]
    val q = Streams.deliverStream(
      in.toDF().toDF("doc_id", "text"), s"$dir/ckpt") { (batch, _) =>
      CorpusIngest.ingestBatch(batch, "doc_id", "text",
        bands, s"$dir/state", s"$dir/accept")
      ()
    }
    try {
      in.addData((10L, goodText("streamed")), (11L, goodText("corpustwo")))
      q.processAllAvailable()
      in.addData((12L, goodText("streamed")), (13L, goodText("later")))
      q.processAllAvailable()
    } finally q.stop()

    val landed = spark.read.parquet(s"$dir/accept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 11 screened (corpus near-dup), 12 deduped against 10's hash in state
    assert(landed == Set(10L, 13L))
  }

  test("PII is scrubbed at the boundary: nothing persisted holds a needle, PII-only variants dedup") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("ingest_pii").toString
    val bands = TextLsh.bandRows(corpus(), "doc_id", "text")

    val base = goodText("piidoc")
    val batch = Seq(
      (21L, base + " reach cust7@shop3.net"),    // same doc, two different
      (22L, base + " reach cust9@shop1.net"),    //   contact strings
      (23L, goodText("cleanpii") + " id 987-65-4321 from 192.168.7.49"))
      .toDF("doc_id", "text")
    val s = CorpusIngest.ingestBatch(batch, "doc_id", "text",
      bands, s"$dir/state", s"$dir/accept")
    // masked, 21 and 22 are byte-identical → in-batch dedup catches 22
    assert(s.dupInBatch == 1, s.toString)
    assert(s.accepted == 2, s.toString)

    val accepted = spark.read.parquet(s"$dir/accept")
    val texts = accepted.select("text").collect().map(_.getString(0))
    val needles = graft.functions.Cleansing.PiiNeedles.map(_._2.r)
    for (t <- texts; re <- needles)
      assert(re.findFirstIn(t).isEmpty, s"persisted text leaked PII: $t")
    assert(texts.exists(_.contains("<EMAIL>")))
    assert(texts.exists(t => t.contains("<SSN>") && t.contains("<IPV4>")))
  }
}
