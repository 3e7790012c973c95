package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins the claim `a13_hopping_windows` makes: epoch-aligned hopping
  * windows incrementalize under Structured Streaming — the SAME
  * `window(ts, width, hop)` spec fed event-by-event across micro-
  * batches must converge to the batch aggregation of the same rows,
  * every overlapping slot included.
  */
class HoppingParitySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def withQuery[A](q: StreamingQuery)(body: => A): A =
    try body finally q.stop()

  test("streaming hopping windows equal the batch aggregation of the same events") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Seq(
      (ts("2024-01-01 00:10:00"), "click", 1.0),
      (ts("2024-01-01 01:50:00"), "click", 2.0),
      (ts("2024-01-01 02:10:00"), "view", 4.0),
      (ts("2024-01-01 05:59:00"), "click", 8.0),
      (ts("2024-01-01 06:01:00"), "view", 16.0),
      (ts("2024-01-01 11:30:00"), "click", 32.0))
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = Streams.hoppingCounts(in.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("hopping")
      .outputMode("complete").start()
    withQuery(q) {
      // two micro-batches so incremental state merge is exercised
      in.addData(rows.take(3))
      q.processAllAvailable()
      in.addData(rows.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("hopping")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("event_type"), col("n_events"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sorted
      val batch = rows.toDF("ts", "event_type", "value")
        .groupBy(window(col("ts"), "6 hours", "2 hours"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("event_type"), col("n_events"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sorted
      assert(streamed.nonEmpty, "no windows emitted")
      assert(streamed.toSeq == batch.toSeq)
      // each event lands in exactly width/hop = 3 overlapping slots
      assert(streamed.map(_._3).sum == rows.length * 3)
    }
  }
}
