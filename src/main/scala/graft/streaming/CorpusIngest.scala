package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ext.TextLsh
import graft.sinks.EventSink.ProcessedIds

/** Continuous crawl ingestion — the corpus-cleaning pipeline
  * (`corpus_clean`'s gates + dedup stages) run per micro-batch against
  * PERSISTENT state, so a long-lived stream of scraped documents lands
  * in the lake already gated and deduplicated:
  *
  *   1. quality gate — stateless column scoring
  *      ([[TextFunctions.qualityScore]]), rides the batch scan;
  *   2. within-batch exact dedup — lowest-id-wins on the md5 content
  *      hash (an at-least-once crawler repeats documents inside one
  *      batch; state only absorbs PRIOR batches);
  *   3. cross-batch exact dedup — anti-join against the persistent
  *      content-hash state ([[ProcessedIds]], the same parquet state
  *      table the event sink replays against);
  *   4. near-dup screen — LSH band collision against the corpus band
  *      index ([[TextLsh]], byte-compatible with the batch index): the
  *      batch's bands broadcast into one scan of the index, band
  *      collision ≈ Jaccard ≳ 0.63 rejects. A conservative SCREEN, not
  *      an exact verdict — the weekly batch pass (`corpus_clean` +
  *      clusters) remains the exactness backstop, same division of
  *      labor as the streaming embedding screens.
  *
  * Crash contract (mirrors `EventSink.deliverBatchIdempotent`): the
  * post-anti-join batch is eagerly checkpointed BEFORE any write — the
  * state append writes to the directory the anti-join read, so a
  * recomputation mid-write must be impossible by construction (and the
  * checkpoint also bounds the growing state table to ONE scan per
  * micro-batch) — then documents land first, hashes second. A crash between the two re-ingests exactly
  * one batch on replay, and the content-hash anti-join turns the
  * replayed rows into no-ops; duplicates in the accept dir are bounded
  * to the single interrupted batch and collapse in the batch dedup
  * pass. Checkpoint blocks release in the `finally`
  * ([[graft.Lineage.checkpointed]]).
  */
object CorpusIngest {

  final case class BatchStats(
      input: Long, lowQuality: Long, dupInBatch: Long,
      dupExact: Long, dupNear: Long, accepted: Long)

  /** A FROZEN multi-signal admission gate — the batch curation pass's
    * `corpus_quality_gate` verdict ([[graft.functions.GateSignals]])
    * applied at the stream boundary: `probs`/`floorP` are the unigram
    * LM the last batch curation trained ([[GateSignals.trainUnigramLm]]
    * output, persisted and re-loaded — NEVER retrained per micro-batch,
    * which would let a spam flood teach the gate its own vocabulary),
    * plus the length bounds. Train/serve consistency is the contract:
    * a document the stream admits is exactly a document the nightly
    * batch gate would keep, pinned by `GateStreamParitySpec`. */
  final case class FrozenGate(
      probs: DataFrame, floorP: DataFrame,
      minTokens: Long, maxTokens: Long)

  /** Ingest one micro-batch of `(idCol, textCol, …)` documents. Returns
    * the per-stage counts (cheap — every count is on an already-small
    * or already-materialized frame except the input scan). Call from
    * [[Streams.deliverStream]]'s `onBatch` for the streaming form, or
    * directly for a backfill. `frozenGate` upgrades stage 1 from the
    * stateless heuristic score to the frozen multi-signal batch gate. */
  def ingestBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      corpusBands: DataFrame, // (doc_id, band) — the TextLsh index
      statePath: String,
      acceptPath: String,
      minQuality: Double = 0.25,
      frozenGate: Option[FrozenGate] = None,
      frozenModel: Option[graft.operators.QualityClassifier.Model] = None): BatchStats = {
    // the stage counts + the two writes drive several actions over this
    // batch; pin it once so a file-backed micro-batch isn't re-read per
    // action (released before returning)
    val pinned = batch.persist()
    try ingestPinned(pinned, idCol, textCol, corpusBands, statePath,
      acceptPath, minQuality, frozenGate, frozenModel)
    finally pinned.unpersist()
  }

  private def ingestPinned(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      corpusBands: DataFrame,
      statePath: String,
      acceptPath: String,
      minQuality: Double,
      frozenGate: Option[FrozenGate],
      frozenModel: Option[graft.operators.QualityClassifier.Model]): BatchStats = {
    val input = batch.count()
    // PII scrub at the BOUNDARY, before gating/hashing/state: the
    // state store, band index and accept table only ever hold masked
    // text (nothing downstream can leak what was never persisted), and
    // two documents differing only in contact strings dedup together.
    // Same needle list as the batch redaction (Cleansing.PiiNeedles) —
    // the train/serve-consistency discipline applied to compliance.
    val nonNull = batch.filter(col(textCol).isNotNull)
      .withColumn(textCol, graft.functions.Cleansing.piiMask(col(textCol)))
    val admitted = frozenGate match {
      case None =>
        nonNull.filter(TextFunctions.qualityScore(col(textCol)) >= minQuality)
      case Some(g) =>
        // the repetition fractions ride the LM aggregate as grouping
        // keys (functionally dependent on the id) — the batch-query
        // shape; survivors rejoin the batch semi-style on the id so
        // arbitrary payload columns pass through untouched
        val scored = graft.functions.GateSignals.nllScored(
          nonNull.select(col(idCol),
            graft.functions.GateSignals.dupTokenFrac(col(textCol))
              .as("dup_token_frac"),
            graft.functions.GateSignals.dupBigramFrac(col(textCol))
              .as("dup_bigram_frac"),
            col(textCol)),
          Seq(idCol, "dup_token_frac", "dup_bigram_frac"),
          col(textCol), g.probs, g.floorP)
        val keeps = graft.functions.GateSignals
          .verdict(scored, g.minTokens, g.maxTokens)
          .filter(col("keep")).select(col(idCol))
        nonNull.join(keeps, Seq(idCol), "left_semi")
    }
    // optional FROZEN TRAINED classifier on top of the rule/LM gate —
    // the learned admission signal ([[graft.operators
    // .QualityClassifier]]): weights/means/stds come from the last
    // batch fit (NEVER refit per micro-batch — the frozen-LM rule
    // again), and the features are the operator's textFeatures, the
    // byte-identical columns the training queries standardized. A
    // document the stream admits is exactly a document the batch
    // scorer would pass (`LrGateParitySpec`). Scores on MASKED text,
    // like every other signal past the PII boundary.
    val modeled = frozenModel match {
      case None => admitted
      case Some(m) =>
        import graft.operators.QualityClassifier
        val keep = QualityClassifier
          .applyModel(m, QualityClassifier.textFeatures(
            nonNull.select(col(idCol), col(textCol)), Seq(idCol), textCol))
          .filter(col("predicted")).select(col(idCol))
        admitted.join(keep, Seq(idCol), "left_semi")
    }
    val gated = modeled.withColumn("__hash", md5(col(textCol)))
    val nGated = gated.count()

    // 2: one winner per content hash inside the batch (lowest id — the
    // same deterministic canonical-pick as the batch dedup)
    val batchDeduped = graft.operators.Dedup.latestByKey(
      gated, Seq("__hash"), Seq(col(idCol).asc))
    // 3: drop documents whose content already landed in ANY prior batch.
    // Checkpointed IMMEDIATELY: `fresh` embeds the anti-join against the
    // persistent state table — the table that grows every batch and is
    // the expensive side at scale — and three consumers read it (the
    // count, the band build, the accepted anti-join). One eager
    // checkpoint = one state scan per micro-batch, and it doubles as
    // the read-overwrite guard for the state append below.
    val spark = batch.sparkSession
    val (fresh, release) = graft.Lineage.checkpointed(batchDeduped.join(
      ProcessedIds.load(spark, statePath, "__hash",
        org.apache.spark.sql.types.StringType),
      Seq("__hash"), "left_anti"))

    // 4: near-dup screen — batch bands broadcast into one index scan;
    // any band collision rejects the document
    val batchBands = TextLsh.bandRows(fresh, idCol, textCol)
      .withColumnRenamed(idCol, "__screen_id")
    val hit = corpusBands.join(broadcast(batchBands), Seq("band"))
      .select(col("__screen_id").as(idCol)).distinct()
    val accepted = fresh.join(hit, Seq(idCol), "left_anti")
    try {
      val nBatchDeduped = batchDeduped.count()
      val nFresh = fresh.count()
      val nAccepted = accepted.count()
      if (nAccepted > 0) {
        accepted.drop("__hash")
          .write.mode("append").parquet(acceptPath)
        ProcessedIds.append(accepted.select(col("__hash")), statePath)
      }
      BatchStats(
        input = input,
        lowQuality = input - nGated,
        dupInBatch = nGated - nBatchDeduped,
        dupExact = nBatchDeduped - nFresh,
        dupNear = nFresh - nAccepted,
        accepted = nAccepted)
    } finally release()
  }
}
