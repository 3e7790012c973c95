package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** An in-engine TRAINED quality classifier — logistic-style regression
  * fit by full-batch gradient descent, every step expressed as one
  * distributed aggregate. This is the "train the quality filter inside
  * the pipeline" capability production curation stacks use (a linear
  * model distilled from heuristic gate labels, then applied corpus-wide
  * as a cheap scorer): the engine already computes the raw quality
  * SIGNALS ([[graft.functions.GateSignals]]); this operator learns a
  * weighting of them instead of hand-tuning thresholds.
  *
  * Training is DETERMINISTIC and bit-replayable in ANSI SQL — the
  * property every differential in this engine is built on — by three
  * choices:
  *
  *   - the squashing function is the RATIONAL sigmoid
  *     `σ̃(z) = 0.5 + z / (2·(1+|z|))`: add/mul/div/abs are exactly
  *     rounded under IEEE-754, so Spark, DuckDB and the driver compute
  *     identical bits by CONSTRUCTION — where `1/(1+exp(−z))` would
  *     hinge on two libms agreeing ULP-for-ULP. Same monotone S-shape,
  *     same `σ̃(0)=0.5` decision point; only the tail steepness
  *     differs, which a trained weight scale absorbs.
  *   - every per-row contribution (gradient component, squared error)
  *     is quantized by the ARITHMETIC 8-dp rounder [[q8]]
  *     (`floor(x·1e8+0.5)/1e8` — floor is exact, so the quantizer is
  *     the same function everywhere) and summed as DECIMAL(28,8):
  *     sums are exact and order-independent, immune to partition
  *     count, scheduling and fold order.
  *   - weight updates replay the same double arithmetic on the driver
  *     (decimal sum → canonical string → double, the engine-portable
  *     decimal hop), then re-quantize through [[q8d]] — so the weights
  *     entering iteration i+1 are the same 8-dp values in every engine.
  *
  * 100 TB posture: one pass per iteration over a persisted feature
  * frame (map-side partial aggregation collapses each partition to one
  * (d+2)-value row; the exchange is d+2 decimals × partitions), driver
  * state is d+1 doubles, and standardization is two more passes of the
  * same shape. Full-batch GD is CHOSEN over SGD: at this scale a
  * "batch" pass is embarrassingly parallel and deterministic, while
  * SGD's sequential updates are exactly what a distributed engine
  * cannot replay. Iteration count is the cost knob (iters × scans).
  */
object QualityClassifier {

  /** Arithmetic 8-dp quantizer: `floor(x·1e8+0.5)/1e8`. Exactly the
    * same function in Spark, SQL and driver code — see class doc. */
  def q8(c: Column): Column = floor(c * lit(1e8) + lit(0.5)) / lit(1e8)

  /** Driver twin of [[q8]]. */
  def q8d(x: Double): Double = math.floor(x * 1e8 + 0.5) / 1e8

  /** 6-dp / 4-dp display quantizers (same construction). */
  def q6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  def q4d(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  /** The rational sigmoid — see class doc for why not exp. */
  def sigmoid(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** One training iteration's record: the weights IN EFFECT (intercept
    * first) and the metrics they score on the training set. */
  final case class IterStat(
      iter: Int, weights: Seq[Double], sse: Double, accuracy: Double)

  /** The fitted model: 8-dp weights (intercept first) plus the
    * standardization that must be applied at scoring time. */
  final case class Model(
      featCols: Seq[String], weights: Seq[Double],
      means: Seq[Double], stds: Seq[Double], history: Seq[IterStat])

  private def decToDouble(d: java.math.BigDecimal): Double =
    if (d == null) 0.0 else d.toString.toDouble

  /** Standardize `cols` in place: `x' = q8((x − mean) / std)` with
    * `mean = q8(Σ q8(x) / n)` (exact decimal sum) and
    * `std = sqrt(q8(Σ q8((x−mean)²) / n))` (sqrt is exactly rounded —
    * still bit-portable). A zero-variance column keeps std 1 (the
    * standardized column is all zeros, weight stays at init). Two
    * passes; other columns ride through untouched. */
  def standardize(feat: DataFrame, cols: Seq[String]): (DataFrame, Seq[Double], Seq[Double]) = {
    // The two statistics passes run over a checkpointed copy: the
    // feature plan is expression-heavy (tokenization per row), and
    // without materialization each pass recomputes it AND the driver
    // re-optimizes the full tree per aggregate (guide §3.3 — a
    // materialized intermediate truncates the plan). The returned
    // frame keeps the CALLER's recomputable lineage, so the blocks are
    // released here and nothing the caller holds depends on them.
    val (mat, release) = graft.Lineage.checkpointed(feat)
    val (mRow, vRow) = try {
      val mAggs = count(lit(1)).as("n") +:
        cols.map(c => sum(q8(col(c)).cast("decimal(28,8)")).as(s"s_$c"))
      val m = mat.agg(mAggs.head, mAggs.tail: _*).head()
      val n0 = m.getLong(0).toDouble
      require(n0 > 0, "standardize: empty feature frame")
      val means0 = cols.indices.map(j => q8d(decToDouble(m.getDecimal(j + 1)) / n0))
      val vAggs = cols.zipWithIndex.map { case (c, j) =>
        sum(q8((col(c) - lit(means0(j))) * (col(c) - lit(means0(j))))
          .cast("decimal(28,8)")).as(s"v_$c")
      }
      (m, mat.agg(vAggs.head, vAggs.tail: _*).head())
    } finally release()
    val n = mRow.getLong(0).toDouble
    val means = cols.indices.map(j => q8d(decToDouble(mRow.getDecimal(j + 1)) / n))
    val stds = cols.indices.map { j =>
      val v = q8d(decToDouble(vRow.getDecimal(j)) / n)
      if (v > 0) math.sqrt(v) else 1.0
    }
    val std = cols.zipWithIndex.foldLeft(feat) { case (df, (c, j)) =>
      df.withColumn(c, q8((col(c) - lit(means(j))) / lit(stds(j))))
    }
    (std, means, stds)
  }

  /** The linear score `w0 + Σ wj·xj` with the EXACT association order
    * the SQL replay uses (left fold), so the doubles agree bitwise. */
  def linear(weights: Seq[Double], featCols: Seq[String]): Column =
    featCols.zipWithIndex.foldLeft(lit(weights.head): Column) {
      case (acc, (c, j)) => acc + lit(weights(j + 1)) * col(c)
    }

  /** Fit by `iters` full-batch GD steps from zero weights at rate `lr`.
    * `std` must already be standardized; `labelCol` is 1.0/0.0.
    * Returns the per-iteration history INCLUDING the final weights
    * (`iters + 1` records: metrics of w₀=0 through w_iters). */
  def train(
      std: DataFrame, featCols: Seq[String], labelCol: String,
      lr: Double = 2.0, iters: Int = 8): Seq[IterStat] = {
    val d = featCols.size + 1
    // Checkpoint, not cache: every GD iteration is one tiny full-batch
    // aggregate whose PLAN used to carry the whole feature-extraction
    // lineage — the driver re-analyzed and re-optimized that tree (and
    // codegen'd fresh classes, the weights being new literals each
    // step) per iteration, dominating the fit's wall time on any
    // cluster (9 aggregate jobs of milliseconds each under seconds of
    // driver work). Over a checkpoint leaf each iteration plans a
    // 2-node tree. Aggregation input rows are identical either way, so
    // the fit stays bit-exact (the differential oracle replays it).
    val (frame, release) = graft.Lineage.checkpointed(std)
    try {
      var w = Seq.fill(d)(0.0)
      // Weights enter each iteration's plan as a broadcast ONE-ROW
      // frame, not as literals: literal weights made every iteration's
      // generated code unique, so whole-stage codegen recompiled the
      // identical aggregate `iters` times (hundreds of driver-ms per
      // step). As join-input values the code is literal-free and the
      // janino cache serves every iteration after the first. The
      // arithmetic tree (left-fold `w0 + Σ wj·xj`, same IEEE ops in
      // the same order) is unchanged, so the fit stays bit-exact.
      val spark = std.sparkSession
      val wSchema = org.apache.spark.sql.types.StructType((0 until d).map(j =>
        org.apache.spark.sql.types.StructField(s"__w$j",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
      (0 to iters).map { it =>
        val wDf = spark.createDataFrame(
          java.util.Collections.singletonList(
            org.apache.spark.sql.Row.fromSeq(w)), wSchema)
        val z = featCols.zipWithIndex.foldLeft(col("__w0"): Column) {
          case (acc, (c, j)) => acc + col(s"__w${j + 1}") * col(c)
        }
        val p = sigmoid(z)
        val e = p - col(labelCol)
        val xs = lit(1.0) +: featCols.map(col)
        val aggs = Seq(
          count(lit(1)).as("n"),
          sum(q8(e * e).cast("decimal(28,8)")).as("sse"),
          sum(when((p >= 0.5) === (col(labelCol) === 1.0), 1L).otherwise(0L)).as("ok")) ++
          xs.zipWithIndex.map { case (x, j) =>
            sum(q8(e * x).cast("decimal(28,8)")).as(s"g$j") }
        val r = frame.crossJoin(broadcast(wDf)).agg(aggs.head, aggs.tail: _*).head()
        val n = r.getLong(0).toDouble
        val stat = IterStat(it, w,
          q6d(decToDouble(r.getDecimal(1)) / n),
          q4d(r.getLong(2).toDouble / n))
        if (it < iters)
          w = w.indices.map(j => q8d(w(j) - lr * (decToDouble(r.getDecimal(3 + j)) / n)))
        stat
      }
    } finally release()
  }

  /** Convenience: standardize + train in one call. */
  def fit(
      feat: DataFrame, featCols: Seq[String], labelCol: String,
      lr: Double = 2.0, iters: Int = 8): Model = {
    val (std, means, stds) = standardize(feat, featCols)
    val history = train(std, featCols, labelCol, lr, iters)
    Model(featCols, history.last.weights, means, stds, history)
  }

  /** Score a STANDARDIZED frame with fitted weights: the 6-dp
    * probability and the ≥0.5 decision. */
  def score(std: DataFrame, weights: Seq[Double], featCols: Seq[String]): DataFrame = {
    val p = sigmoid(linear(weights, featCols))
    std.withColumn("score", floor(p * lit(1e6) + lit(0.5)) / lit(1e6))
      .withColumn("predicted", p >= 0.5)
  }

  /** The canonical TEXT feature surface (the signals a document-quality
    * fit trains on) — ONE definition shared by the training queries
    * ([[graft.queries.CurationQueries]]) and the streaming admission
    * gate ([[graft.streaming.CorpusIngest]]), so a model trained by the
    * nightly batch scores streamed documents on byte-identical columns:
    * dup-token/dup-bigram fractions ([[graft.functions.GateSignals]]),
    * token count / 64, avg token length / 8. Rows with no tokens are
    * dropped (their fractions are undefined). */
  val TextFeatCols: Seq[String] =
    Seq("x_dup_tok", "x_dup_bi", "x_n_tok", "x_tok_len")

  def textFeatures(docs: DataFrame, idCols: Seq[String], textCol: String): DataFrame = {
    val nTok =
      size(graft.functions.TextFunctions.tokens(col(textCol))).cast("long")
    docs.select(idCols.map(col) ++ Seq(
        graft.functions.GateSignals.dupTokenFrac(col(textCol)).as("x_dup_tok"),
        graft.functions.GateSignals.dupBigramFrac(col(textCol)).as("x_dup_bi"),
        nTok.as("n_tok"),
        length(col(textCol)).cast("long").as("n_chars_c")): _*)
      .filter(col("n_tok") > 0)
      .select(idCols.map(col) ++ Seq(col("x_dup_tok"), col("x_dup_bi"),
        (col("n_tok").cast("double") / lit(64.0)).as("x_n_tok"),
        ((col("n_chars_c").cast("double") / col("n_tok").cast("double")) / lit(8.0))
          .as("x_tok_len")): _*)
  }

  /** Apply a FROZEN model to a raw feature frame: standardize with the
    * model's training-time means/stds (the same [[q8]] transform, so a
    * document scores identically whether it meets the model in the
    * nightly batch or at the stream boundary), then [[score]]. */
  def applyModel(m: Model, raw: DataFrame): DataFrame = {
    val std = m.featCols.zipWithIndex.foldLeft(raw) { case (df, (c, j)) =>
      df.withColumn(c, q8((col(c) - lit(m.means(j))) / lit(m.stds(j))))
    }
    score(std, m.weights, m.featCols)
  }
}
