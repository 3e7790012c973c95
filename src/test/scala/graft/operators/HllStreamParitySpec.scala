package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The HLL register sketch's mergeability, proven live (the CMS parity
  * spec's twin): registers are per-(group, register) maxima — an
  * associative, idempotent aggregate — so a sketch grown incrementally
  * over micro-batches must be REGISTER-FOR-REGISTER identical to the
  * batch sketch of the same keys, including re-deliveries. That is
  * what lets a stream maintain the 100 TB distinct sketch instead of
  * nightly recomputes, with zero approximation drift. */
class HllStreamParitySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def withQuery[A](q: StreamingQuery)(body: => A): A =
    try body finally q.stop()

  test("registers grown across micro-batches equal the batch registers") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val keys = (1 to 300).map(i => ("g1", s"k$i")) ++
      (1 to 40).map(i => ("g2", s"k$i")) ++
      (1 to 120).map(i => ("g1", s"k$i")) // re-delivered keys: max is idempotent
    val in = MemoryStream[(String, String)]
    val q = HllSketch.registers(in.toDF().toDF("g", "k"), Seq("g"), "k")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    withQuery(q) {
      in.addData(keys.take(200))
      q.processAllAvailable()
      in.addData(keys.drop(200))
      q.processAllAvailable()
      val streamed = spark.table("hll_stream")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted
      val batch = HllSketch.registers(keys.toDF("g", "k"), Seq("g"), "k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
      // and therefore the estimates agree exactly too
      val est = HllSketch.estimate(
          spark.table("hll_stream"), Seq("g"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val bEst = HllSketch.estimate(
          HllSketch.registers(keys.toDF("g", "k"), Seq("g"), "k"), Seq("g"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(est == bEst)
    }
  }
}
