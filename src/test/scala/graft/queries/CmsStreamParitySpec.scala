package graft.queries

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The count-min sketch's mergeability, proven live: cell counts are
  * plain sums, so the sketch built incrementally over micro-batches
  * must be CELL-FOR-CELL identical to the batch sketch of the same
  * rows — the property that lets a 100 TB sketch be maintained by a
  * stream instead of recomputed, with zero approximation drift.
  */
class CmsStreamParitySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def withQuery[A](q: StreamingQuery)(body: => A): A =
    try body finally q.stop()

  private def cellsOf(df: org.apache.spark.sql.DataFrame) = {
    val c = (0 until CurationQueries.CmsDepth).map(d =>
      struct(lit(d.toLong).as("d"),
        CurationQueries.cmsIdx(d, col("tok")).as("idx")))
    df.select(explode(array(c: _*)).as("c"))
      .groupBy(col("c.d").as("d"), col("c.idx").as("idx"))
      .agg(count(lit(1)).as("cell_cnt"))
  }

  test("a sketch grown across micro-batches equals the batch sketch, cell for cell") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val words = Seq("alpha", "beta", "gamma", "alpha", "delta", "beta",
      "alpha", "epsilon", "zeta", "beta", "gamma", "alpha")
    val in = MemoryStream[String]
    val q = cellsOf(in.toDF().toDF("tok"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    withQuery(q) {
      in.addData(words.take(5))
      q.processAllAvailable()
      in.addData(words.drop(5))
      q.processAllAvailable()
      val streamed = spark.table("cms_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      val batch = cellsOf(words.toDF("tok"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
      // every occurrence lands in exactly CmsDepth cells
      assert(streamed.map(_._3).sum == words.length * CurationQueries.CmsDepth)
    }
  }
}
