package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** [[QualityClassifier]]: the deterministic in-engine GD trainer.
  * Pins the properties the differential alone cannot state as
  * invariants — learning actually happens (loss decreases, accuracy
  * beats the majority class, a separable fixture is solved), and the
  * determinism doctrine holds under the exact perturbation a cluster
  * introduces: PARTITIONING. The decimal-quantized gradient sums must
  * make training bit-identical at any partition count — that is the
  * whole reason the operator can claim reproducible fits at 100 TB. */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** A linearly separable fixture: y = 1 iff a + b > 1 (with margin). */
  private def separable(): DataFrame = {
    val s0 = spark
    import s0.implicits._
    val rows = for {
      i <- 0 until 20; j <- 0 until 20
      a = i / 10.0; b = j / 10.0
      if math.abs(a + b - 1.0) > 0.15 // margin keeps it cleanly separable
    } yield (a, b, if (a + b > 1.0) 1.0 else 0.0)
    rows.toDF("a", "b", "label")
  }

  test("separable data: GD reaches 100% training accuracy") {
    val feat = separable()
    val (std, _, _) = QualityClassifier.standardize(feat, Seq("a", "b"))
    val hist = QualityClassifier.train(std, Seq("a", "b"), "label", lr = 2.0, iters = 25)
    assert(hist.last.accuracy == 1.0,
      s"separable fixture must be solved, got ${hist.last.accuracy}")
    assert(hist.last.sse < hist.head.sse / 2)
  }

  test("real corpus: SSE decreases every iteration; accuracy beats majority") {
    val s0 = spark
    import s0.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val nTok = size(split(col("text"), " ")).cast("long")
    val feat = docs.select(col("doc_id"),
        graft.functions.GateSignals.dupTokenFrac(col("text")).as("x1"),
        graft.functions.GateSignals.dupBigramFrac(col("text")).as("x2"),
        nTok.as("n_tok"), length(col("text")).cast("long").as("nc"))
      .filter(col("n_tok") > 0)
      .select(col("doc_id"), col("x1"), col("x2"),
        (col("n_tok").cast("double") / 64.0).as("x3"),
        ((col("nc").cast("double") / col("n_tok").cast("double")) / 8.0).as("x4"),
        when(col("x1") <= 0.3 && col("x2") <= 0.15, 1.0).otherwise(0.0).as("label"))
    val cols = Seq("x1", "x2", "x3", "x4")
    val (std, _, _) = QualityClassifier.standardize(feat, cols)
    val hist = QualityClassifier.train(std, cols, "label")
    hist.sliding(2).foreach { case Seq(a, b) =>
      assert(b.sse < a.sse, s"SSE must decrease: iter ${a.iter} ${a.sse} -> ${b.sse}")
    }
    val n = feat.count().toDouble
    val pos = feat.filter(col("label") === 1.0).count().toDouble
    val majority = math.max(pos, n - pos) / n
    assert(hist.last.accuracy > majority + 0.05,
      s"fit ${hist.last.accuracy} must beat majority $majority")
  }

  test("training is bit-identical under repartitioning (order-independent sums)") {
    val feat = separable()
    val cols = Seq("a", "b")
    val (std, means, stds) = QualityClassifier.standardize(feat, cols)
    val w1 = QualityClassifier.train(std, cols, "label", iters = 10)
    val w2 = QualityClassifier.train(std.repartition(13), cols, "label", iters = 10)
    val w3 = QualityClassifier.train(std.coalesce(1), cols, "label", iters = 10)
    assert(w1.map(_.weights) == w2.map(_.weights), "13-partition fit drifted")
    assert(w1.map(_.weights) == w3.map(_.weights), "1-partition fit drifted")
    assert(w1.map(_.sse) == w2.map(_.sse))
    // standardization itself is partition-invariant too
    val (_, means2, stds2) = QualityClassifier.standardize(feat.repartition(7), cols)
    assert(means == means2 && stds == stds2)
  }

  test("a zero-variance feature keeps std 1 and weight 0 (no NaN poisoning)") {
    val s0 = spark
    import s0.implicits._
    val feat = separable().withColumn("c", lit(0.75))
    val cols = Seq("a", "b", "c")
    val (std, _, stds) = QualityClassifier.standardize(feat, cols)
    assert(stds(2) == 1.0)
    val hist = QualityClassifier.train(std, cols, "label", iters = 5)
    assert(hist.last.weights(3) == 0.0, "constant feature must keep zero weight")
    assert(!hist.last.weights.exists(_.isNaN))
    assert(hist.last.sse < hist.head.sse)
  }

  test("score is consistent with the decision rule and the model weights") {
    val feat = separable()
    val cols = Seq("a", "b")
    val model = QualityClassifier.fit(feat, cols, "label", iters = 10)
    val (std, _, _) = QualityClassifier.standardize(feat, cols)
    val scored = QualityClassifier.score(std, model.weights, cols)
    // away from the 6-dp rounding boundary, decision == rounded score
    assert(scored.filter(col("score") =!= 0.5)
      .filter(col("predicted") =!= (col("score") >= 0.5)).count() == 0)
    assert(model.history.size == 11)
    assert(model.weights == model.history.last.weights)
  }
}
