package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The quality-gate signal implementations, ONE definition for every
  * consumer: the batch queries (`corpus_repetition_stats`,
  * `doc_perplexity`, the composed `corpus_quality_gate`) and the
  * streaming ingest gate ([[graft.streaming.CorpusIngest]]) all build
  * their columns here, so the batch curation pass and the streaming
  * admission decision can never drift — the train/serve-consistency
  * property: a document the nightly batch gate would drop is exactly a
  * document the stream refuses to admit, given the same FROZEN LM.
  */
object GateSignals {

  /** Gopher-style repetition cutoffs (string form feeds the SQL
    * oracles verbatim). */
  val DupTokenGate = "0.3"
  val DupBigramGate = "0.15"
  /** CCNet avg-NLL cutoff. */
  val PplGate = 3.43

  /** Fraction of token occurrences that repeat an earlier token —
    * per-row arithmetic over `text`, rides any scan. */
  def dupTokenFrac(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val nTok = size(toks).cast("long")
    round((nTok - size(array_distinct(toks)).cast("long")).cast("double") /
      nullif(nTok, lit(0L)).cast("double"), 4)
  }

  /** Fraction of adjacent bigrams that repeat an earlier bigram. */
  def dupBigramFrac(text: Column): Column = {
    val nTok = size(TextFunctions.tokens(text)).cast("long")
    val nBigram = greatest(nTok - 1, lit(0L))
    coalesce(round(
      (nBigram - size(TextFunctions.shingles(text, 2)).cast("long"))
        .cast("double") / nullif(nBigram, lit(0L)).cast("double"), 4), lit(0.0))
  }

  /** Add-one-smoothed unigram LM over the `filter`-selected slice of
    * `docs`: `(probs(tok, pr), floorP(prf))` — vocabulary-sized and
    * 1-row frames, both broadcastable; the OOV floor is `1/(t+v)`.
    * Freezing = persisting these two frames (or their rows) and
    * handing them to every later scorer, batch or streaming. */
  def trainUnigramLm(docs: DataFrame, textCol: Column,
      filter: Column): (DataFrame, DataFrame) = {
    val lm = docs.filter(filter)
      .select(explode(TextFunctions.tokens(textCol)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = lm.agg(sum(col("c")).as("t"), count(lit(1)).as("v"))
    val probs = lm.crossJoin(broadcast(tot))
      .select(col("tok"),
        ((col("c").cast("double") + 1.0) /
          (col("t").cast("double") + col("v").cast("double"))).as("pr"))
    val floorP = tot.select((lit(1.0) /
      (col("t").cast("double") + col("v").cast("double"))).as("prf"))
    (probs, floorP)
  }

  /** Score `df` against a (frozen) LM: per row of `keyNames` (which
    * must functionally determine a document — extra key columns ride
    * the aggregate free), `n_tokens` and the 8-dp `avg_nll`. The
    * per-token `-ln p` terms are cast DECIMAL(28,12) BEFORE the sum so
    * every document score is exact and order-independent; the LM
    * broadcasts, and the ONE exchange is the map-side-collapsing
    * per-document aggregate. */
  def nllScored(df: DataFrame, keyNames: Seq[String], textCol: Column,
      probs: DataFrame, floorP: DataFrame): DataFrame = {
    val toks = df.select(keyNames.map(col) :+
      explode(TextFunctions.tokens(textCol)).as("tok"): _*)
    toks.join(broadcast(probs), Seq("tok"), "left")
      .crossJoin(broadcast(floorP))
      .select(keyNames.map(col) :+
        (-log(coalesce(col("pr"), col("prf")))).cast("decimal(28,12)").as("nll_term"): _*)
      .groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as("n_tokens"), sum(col("nll_term")).as("nll_sum"))
      .select(keyNames.map(col) ++ Seq(col("n_tokens"),
        round(col("nll_sum").cast("double") / col("n_tokens").cast("double"), 8)
          .as("avg_nll")): _*)
  }

  /** The composed verdict over a frame carrying `dup_token_frac`,
    * `dup_bigram_frac`, `n_tokens`, `avg_nll`: machine-readable
    * `fail_reasons` + the `keep` flag. */
  def verdict(scored: DataFrame, minTokens: Long, maxTokens: Long): DataFrame =
    scored
      .withColumn("fail_reasons", concat_ws(",",
        when(col("dup_token_frac") > DupTokenGate.toDouble ||
          col("dup_bigram_frac") > DupBigramGate.toDouble, lit("repetitive")),
        when(col("avg_nll") > PplGate, lit("high_perplexity")),
        when(col("n_tokens") < minTokens, lit("too_short")),
        when(col("n_tokens") > maxTokens, lit("too_long"))))
      .withColumn("keep", col("fail_reasons") === "")
}
