package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.QualityClassifier

/** Train/serve consistency of the TRAINED quality classifier: a model
  * fit by the nightly batch and FROZEN must admit, at the stream
  * boundary, exactly the documents the batch scorer passes — the same
  * contract `GateStreamParitySpec` pins for the frozen LM gate, now
  * for the learned signal. The feature surface and the standardize+
  * score transform are single definitions ([[QualityClassifier
  * .textFeatures]]/[[QualityClassifier.applyModel]]), so parity is
  * structural; this spec proves the WIRING preserves it through the
  * ingest pipeline's PII mask, batching and semi-joins. */
class LrGateParitySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val lakeDir = "/root/testdata/sf0.001"

  private def emptyBands = {
    val spark0 = spark
    import spark0.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "band")
  }

  test("3-batch streamed admission equals the batch model verdict") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("lr_gate_parity").toString
    val docs = graft.Tables.documents(spark, lakeDir)
      .select("doc_id", "text")
      // the ingest boundary masks PII before scoring; train on the same
      // masked text so the fit and the stream see one distribution
      .withColumn("text", graft.functions.Cleansing.piiMask(col("text")))

    // the nightly batch fit: label = the repetition-gate rule verdict
    val feat = QualityClassifier
      .textFeatures(docs, Seq("doc_id"), "text")
      .withColumn("label",
        when(col("x_dup_tok") <= 0.3 && col("x_dup_bi") <= 0.15, 1.0)
          .otherwise(0.0))
    val model = QualityClassifier.fit(feat, QualityClassifier.TextFeatCols, "label")

    // batch-side verdicts under the frozen model
    val batchPass = QualityClassifier.applyModel(model, feat)
      .filter(col("predicted")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(batchPass.nonEmpty && batchPass.size < docs.count(),
      "fixture must be non-trivial: some pass, some fail")

    // unique-content docs only, so only the GATE decides acceptance
    val uniq = docs.withColumn("h", md5(col("text")))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("n") === 1).drop("h", "n").cache()

    (0 until 3).foreach { k =>
      CorpusIngest.ingestBatch(
        uniq.filter(col("doc_id") % 3 === k), "doc_id", "text",
        emptyBands, s"$dir/state", s"$dir/accept",
        minQuality = -1.0, // heuristic gate admits all; the model decides
        frozenModel = Some(model))
    }
    val streamed = spark.read.parquet(s"$dir/accept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val uniqIds = uniq.select("doc_id").collect().map(_.getLong(0)).toSet

    assert(streamed == (batchPass intersect uniqIds),
      s"stream/batch model divergence: only-stream=${streamed -- batchPass}, " +
        s"only-batch=${(batchPass intersect uniqIds) -- streamed}")
    uniq.unpersist()
    ()
  }
}
