package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.functions.GateSignals

/** Train/serve consistency of the quality gate: the sf0.001 lake
  * streamed through [[CorpusIngest]] in three micro-batches with a
  * FROZEN LM must admit exactly the documents the one-shot batch
  * `corpus_quality_gate` keeps — and the frozen-ness itself is pinned
  * by a planted fixture a per-batch-retrained LM would judge
  * differently. */
class GateStreamParitySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val lakeDir = "/root/testdata/sf0.001"

  private def emptyBands = {
    val spark0 = spark
    import spark0.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "band")
  }

  test("3-batch streamed admission equals the batch gate verdict on the lake") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("gate_parity").toString
    val docs = graft.Tables.documents(spark, lakeDir)
      .select("doc_id", "lang", "source", "text")
    val (probs, floorP) = GateSignals.trainUnigramLm(
      docs, col("text"), col("lang") === "en")
    // freeze: materialize the LM rows once, as a curation run would
    val frozen = CorpusIngest.FrozenGate(
      probs.cache(), floorP.cache(), minTokens = 16L, maxTokens = 96L)

    // lake texts are NOT unique (dedup_exact finds dups) — restrict the
    // parity set to unique-content docs so only the GATE decides
    val uniq = docs.withColumn("h", md5(col("text")))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("n") === 1).drop("h", "n").cache()

    (0 until 3).foreach { k =>
      CorpusIngest.ingestBatch(
        uniq.filter(col("doc_id") % 3 === k), "doc_id", "text",
        emptyBands, s"$dir/state", s"$dir/accept",
        frozenGate = Some(frozen))
    }
    val streamed = spark.read.parquet(s"$dir/accept")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val uniqIds = uniq.select("doc_id").collect().map(_.getLong(0)).toSet
    val batchKeeps = graft.SparkEntry.queries("corpus_quality_gate")(spark, lakeDir)
      .filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == (batchKeeps intersect uniqIds),
      s"stream/batch gate divergence: only-stream=${streamed -- batchKeeps}, " +
        s"only-batch=${(batchKeeps intersect uniqIds) -- streamed}")
    assert(streamed.nonEmpty && streamed != uniqIds,
      "parity vacuous: gate admitted everything or nothing")
    uniq.unpersist(); frozen.probs.unpersist(); frozen.floorP.unpersist()
  }

  test("the LM stays frozen: a batch cannot teach the gate its own vocabulary") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("gate_frozen").toString
    // corpus: 5 clean English docs over ONE shared 20-token vocabulary
    // define the frozen LM — per token c=5, t=100, v=20, so an
    // in-vocabulary 20-token doc scores avg_nll = ln(120/6) ≈ 3.00
    // (admitted) while a fully-OOV doc scores ln(120) ≈ 4.79 (rejected)
    // against the 3.43 cutoff
    val corpusDocs = (1L to 5L).map(i =>
      (i, (1 to 20).map(j => s"baset$j").mkString(" "), "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val (probs, floorP) = GateSignals.trainUnigramLm(
      corpusDocs, col("text"), col("lang") === "en")
    val frozen = CorpusIngest.FrozenGate(probs, floorP, 16L, 96L)
    // a spam flood: 20-distinct-token docs sharing a vocabulary that is
    // OOV to the frozen LM. A per-batch-retrained LM would see these
    // tokens dominate the batch and score them likely; the frozen gate
    // must reject every one as high_perplexity.
    val flood = (100L to 104L).map(i =>
      (i, (1 to 20).map(j => s"spam${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    val stats = CorpusIngest.ingestBatch(flood, "doc_id", "text",
      emptyBands, s"$dir/state", s"$dir/accept",
      frozenGate = Some(frozen))
    assert(stats.input == 5 && stats.lowQuality == 5 && stats.accepted == 0,
      s"flood must be rejected wholesale by the frozen LM: $stats")
    // sanity: corpus-vocabulary text sails through the same gate
    // distinct rotations of the corpus vocabulary: different content
    // hashes (no in-batch dedup interference), same unigram profile
    val ok = (200L to 201L).map(i =>
      (i, (1 to 20).map(j => s"baset${(j + i) % 20 + 1}").mkString(" ")))
      .toDF("doc_id", "text")
    val s2 = CorpusIngest.ingestBatch(ok, "doc_id", "text",
      emptyBands, s"$dir/state2", s"$dir/accept2",
      frozenGate = Some(frozen))
    assert(s2.accepted == 2, s"in-vocabulary docs must pass: $s2")
  }
}
