package graft.ext

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}

/** The streaming drift alarm end to end: a frozen reference occupancy
  * (built once, like the frozen LM gate), micro-batches scored by
  * add-one-smoothed KL as they arrive — a same-distribution batch
  * stays under the calibration threshold, a collapsed (drifted) batch
  * spikes far above it. Real micro-batches through foreachBatch, real
  * state: the alarm log the ops dashboard would read.
  */
class DriftAlarmSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("same-distribution batch stays quiet; a collapsed batch trips the alarm") {
    val spark0 = spark
    import spark0.implicits._

    val emb = Tables.embeddings(spark, dir)
    val centroids = Similarity.trainCentroidsById(emb, 16)
    val centroidIds = centroids.select("centroid_id")
      .collect().map(_.getLong(0)).toSeq
    def occMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Similarity.centroidOccupancy(df, centroids)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // frozen reference: the first half of the corpus
    val refOcc = occMap(emb.filter(col("vec_id") < 250))

    // batch 1: the second half — same distribution. batch 2: every
    // vector replaced by one fixed embedding — total collapse into a
    // single bucket, the unmistakable drift signature.
    val half2 = emb.filter(col("vec_id") >= 250)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
    val fixed = half2.head._2
    val collapsed = half2.map { case (id, _) => (id + 10000L, fixed) }

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val alarms = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val q = stream.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        alarms.synchronized { alarms += id -> Similarity.occupancyKl(
          refOcc, occMap(batch), centroidIds) }
        ()
      }
      .start()
    try {
      stream.addData(half2.toSeq)
      q.processAllAvailable()
      stream.addData(collapsed.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val byBatch = alarms.toMap
    assert(byBatch.size == 2, alarms.toString)
    assert(byBatch(0L) < 0.2, s"same-distribution batch tripped the alarm: ${byBatch(0L)}")
    assert(byBatch(1L) > 1.0, s"collapsed batch did not trip the alarm: ${byBatch(1L)}")
  }
}
