package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Structured Streaming semantics through MemoryStream: watermarked
  * dedup (ST2), latest-version-wins state (ST3), stream-stream 24h join
  * (ST4), sessionization (ST6). Every query stops in a finally block —
  * a leaked query spins the state-store coordinator forever. */
class StreamsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def withQuery[A](q: StreamingQuery)(body: => A): A =
    try body finally q.stop()

  test("ST3 latestVersionWins: later version replaces, state carries across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Streams.Versioned]
    val q = Streams.latestVersionWins(in.toDS())
      .writeStream.format("memory").queryName("lvw").outputMode("update").start()
    withQuery(q) {
      in.addData(Streams.Versioned("d1", 1, "v1"), Streams.Versioned("d2", 5, "a"))
      q.processAllAvailable()
      in.addData(Streams.Versioned("d1", 3, "v3"), Streams.Versioned("d2", 2, "stale"))
      q.processAllAvailable()
      val out = spark.table("lvw").as[Streams.Versioned].collect()
      // last update per key must be the max version ever seen
      val lastPerKey = out.zipWithIndex.groupBy(_._1.key)
        .map { case (k, vs) => k -> vs.maxBy(_._2)._1 }
      assert(lastPerKey("d1") == Streams.Versioned("d1", 3, "v3"))
      assert(lastPerKey("d2") == Streams.Versioned("d2", 5, "a"))
    }
  }

  test("ST2 dedupedEvents drops replayed keys within the watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, java.sql.Timestamp)]
    val df = in.toDF().toDF("deal", "ts")
    val q = Streams.dedupedEvents(df, "deal", "ts")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    withQuery(q) {
      in.addData(("d1", ts("2024-01-01 10:00:00")), ("d1", ts("2024-01-01 10:00:00")),
        ("d2", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      // replays in a later batch — including one whose event time was
      // re-stamped; the processed-ID contract is time-blind, key-only
      in.addData(("d1", ts("2024-01-01 10:00:00")),
        ("d1", ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    }
  }

  test("streaming corpus dedup drops vocabulary-colliding documents within the watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = in.toDF().toDF("doc_id", "text", "ts")
    val q = Streams.dedupDocumentsStream(docs, "text", "ts")
      .writeStream.format("memory").queryName("docdedup").outputMode("append").start()
    withQuery(q) {
      in.addData(
        (1L, "the quick brown fox", ts("2024-01-01 10:00:00")),
        (2L, "fox brown quick the", ts("2024-01-01 10:05:00")), // same vocab, shuffled → dup
        (3L, "an entirely different doc", ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      // a later re-crawl of doc 1's content inside the watermark → dropped
      in.addData((4L, "the quick brown fox", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      val kept = spark.table("docdedup").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept.intersect(Set(1L, 2L, 4L)).size == 1,
        s"exactly one of the vocab-colliding docs must survive, kept $kept")
      assert(kept.contains(3L))
      // the fingerprint key is internal — the output schema is the input's
      assert(!spark.table("docdedup").columns.contains("__fp"))
    }
  }

  test("ST4 sessionLeadJoin matches only inside the 24h bound") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val sIn = MemoryStream[(String, java.sql.Timestamp)]
    val lIn = MemoryStream[(String, java.sql.Timestamp)]
    val sessions = sIn.toDF().toDF("session_id", "s_time")
    val leads = lIn.toDF().toDF("crm_session_id", "l_time")
    val q = Streams.sessionLeadJoin(sessions, leads)
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    withQuery(q) {
      sIn.addData(("dr_1", ts("2024-01-01 00:00:00")), ("dr_2", ts("2024-01-01 00:00:00")))
      lIn.addData(("dr_1", ts("2024-01-01 12:00:00")), // inside 24h → match
        ("dr_2", ts("2024-01-03 00:00:00")), // outside → no match
        ("dr_9", ts("2024-01-01 01:00:00"))) // unknown session
      q.processAllAvailable()
      val out = spark.table("ssj").collect()
      assert(out.length == 1)
      assert(out.head.getAs[String]("crm_session_id") == "dr_1")
    }
  }

  test("ST4b outer join: an unmatched session surfaces null-padded once the watermark closes its window") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val sIn = MemoryStream[(String, java.sql.Timestamp)]
    val lIn = MemoryStream[(String, java.sql.Timestamp)]
    val sessions = sIn.toDF().toDF("session_id", "s_time")
    val leads = lIn.toDF().toDF("crm_session_id", "l_time")
    val q = Streams.sessionLeadJoinOuter(sessions, leads)
      .writeStream.format("memory").queryName("ssjo").outputMode("append").start()
    withQuery(q) {
      sIn.addData(("dr_1", ts("2024-01-01 00:00:00")), // will match
        ("dr_2", ts("2024-01-01 00:00:00"))) // never matches
      lIn.addData(("dr_1", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // the matched row emits eagerly; dr_2's verdict is still OPEN —
      // a lead could arrive until the watermark passes its window
      val eager = spark.table("ssjo").collect()
      assert(eager.map(_.getAs[String]("session_id")).toSet == Set("dr_1"))
      // advance BOTH watermarks (the global watermark is their min)
      // far past dr_2's window → the null-padded row must emit
      sIn.addData(("dr_late", ts("2024-01-10 00:00:00")))
      lIn.addData(("dr_late", ts("2024-01-10 00:00:00")))
      q.processAllAvailable()
      val out = spark.table("ssjo").collect()
        .map(r => r.getAs[String]("session_id") ->
          Option(r.getAs[String]("crm_session_id"))).toMap
      assert(out("dr_1").contains("dr_1"))
      assert(out.contains("dr_2") && out("dr_2").isEmpty,
        s"unmatched session did not surface null-padded after the watermark: $out")
    }
  }

  test("ST1 incrementalParquetSource picks up new files in bounded micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st1").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val q = Streams.incrementalParquetSource(spark, dir, schema,
      maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName("inc").outputMode("append").start()
    withQuery(q) {
      q.processAllAvailable()
      val first = spark.table("inc").as[(Long, String)].collect().toSet
      assert(first == Set((1L, "a"), (2L, "b")))
      // a new daily drop is discovered without restarting the query —
      // the file-source checkpoint is the high-water mark (ST1)
      Seq((3L, "c")).toDF("id", "v").coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val all = spark.table("inc").as[(Long, String)].collect().toSet
      assert(all == Set((1L, "a"), (2L, "b"), (3L, "c")))
    }
  }

  test("windowedEventCounts finalizes tumbling windows past the watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val events = in.toDF().toDF("ts", "event_type")
    val q = Streams.windowedEventCounts(events, "1 hour", "1 hour")
      .writeStream.format("memory").queryName("wins").outputMode("append").start()
    withQuery(q) {
      in.addData(
        (ts("2024-01-01 10:05:00"), "click"), (ts("2024-01-01 10:40:00"), "click"),
        (ts("2024-01-01 10:50:00"), "view"))
      q.processAllAvailable()
      // advance watermark beyond 11:00 + 1h delay → 10:00 window closes
      in.addData((ts("2024-01-01 13:00:00"), "click"))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 15:00:00"), "click"))
      q.processAllAvailable()
      val out = spark.table("wins")
        .filter(col("period_start") === ts("2024-01-01 10:00:00"))
        .collect().map(r => r.getAs[String]("event_type") ->
          r.getAs[Long]("event_count")).toMap
      assert(out == Map("click" -> 2L, "view" -> 1L))
      // the drop contract: an event arriving AFTER its window finalized
      // (watermark is past 14:00 by now; this one belongs to 10:00) must
      // be discarded — the already-emitted append row CANNOT be amended,
      // so admitting it would either corrupt downstream sums (re-emit)
      // or silently vanish into a closed state. Nothing about the 10:00
      // window may change.
      in.addData((ts("2024-01-01 10:30:00"), "click"))
      q.processAllAvailable()
      val after = spark.table("wins")
        .filter(col("period_start") === ts("2024-01-01 10:00:00"))
        .collect().map(r => r.getAs[String]("event_type") ->
          r.getAs[Long]("event_count")).toMap
      assert(after == Map("click" -> 2L, "view" -> 1L),
        s"late event past the watermark was not dropped: $after")
    }
  }

  test("ST6 sessionize closes sessions after the inactivity gap") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val pings = in.toDF().toDF("visitor_id", "ts")
    val q = Streams.sessionize(pings, gap = "30 minutes")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    withQuery(q) {
      in.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
        (1L, ts("2024-01-01 12:00:00"))) // >30min later → second session
      q.processAllAvailable()
      // advance the watermark far enough to close both sessions
      in.addData((2L, ts("2024-01-02 00:00:00")))
      q.processAllAvailable()
      in.addData((2L, ts("2024-01-03 00:00:00")))
      q.processAllAvailable()
      val out = spark.table("sess").filter(col("visitor_id") === 1).collect()
      assert(out.length == 2)
      val spans = out.map(r => (r.getAs[java.sql.Timestamp]("first_seen"),
        r.getAs[Long]("ping_count"))).toSet
      assert(spans == Set((ts("2024-01-01 10:00:00"), 2L), (ts("2024-01-01 12:00:00"), 1L)))
    }
  }
}
