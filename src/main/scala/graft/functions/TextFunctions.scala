package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library for the LLM-training-data pipeline ops
  * (north-star extensions beyond the reference surface; see SURVEY.md §7.1
  * module `ext`). Pure `Column` expressions — codegen-friendly, no UDFs,
  * so they vectorize over 100 TB document scans.
  */
object TextFunctions {

  /** Whitespace tokens (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword token count: matches of a GPT-2-style pretokenizer
    * simplified to the engine-portable subset — optional leading space +
    * (letter run | digit run | punctuation run). Tracks how byte-pair
    * tokenizers segment far better than whitespace counting (digits and
    * punctuation split off), which is what corpus token budgeting needs.
    * Kept RE2-compatible (no lookarounds, ASCII classes) so the DuckDB
    * oracle counts the identical matches; both engines use leftmost-first
    * alternation. */
  val BpeTokenPattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern)).cast("long")

  /** Count of occurrences of one exact token.
    *
    * Implemented with plain string `replace` + `length`, not
    * `filter(tokens(...))`: higher-order-function lambdas are
    * CodegenFallback (interpreted per element with boxing), and this
    * runs per (document, marker token) on corpus scans. Delimiters are
    * doubled first so adjacent tokens don't share a space, making
    * occurrences of `" token "` non-overlapping; the count is then a
    * length delta — one compiled pass per token, fully inside
    * whole-stage codegen. */
  def tokenOccurrences(text: Column, token: String): Column =
    occurrencesInPadded(paddedText(text), token)

  /** Space-doubled, space-padded text — the shared precondition of
    * [[occurrencesInPadded]]. Multi-token scorers (qualityScore,
    * languageId) build this ONE Column and count every needle against
    * it; the repeated identical subtree collapses in whole-stage
    * codegen's subexpression elimination (safe here: a deterministic
    * projection-local expression), so each document is doubled once,
    * not once per marker. */
  private def paddedText(text: Column): Column =
    concat(lit(" "), replace(text, lit(" "), lit("  ")), lit(" "))

  private def occurrencesInPadded(padded: Column, token: String): Column = {
    require(!token.contains(" ") && token.nonEmpty,
      s"tokenOccurrences counts single tokens, got '$token'")
    val needle = s" $token "
    ((length(padded) - length(replace(padded, lit(needle), lit("")))) /
      lit(needle.length)).cast("long")
  }

  /** Ratio of characters in [a-z ] after lowercasing — an "is mostly
    * clean prose" signal for quality scoring. */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[^a-z ]", "")).cast("double") /
      nullif(length(text), lit(0)).cast("double")

  /** Heuristic quality score in [0,1]: length band + stopword presence.
    * Deterministic, SQL-expressible (mirrors the DuckDB oracle). */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text)
    val padded = paddedText(text)
    val stop = occurrencesInPadded(padded, "the") + occurrencesInPadded(padded, "a")
    round(
      when(n.between(20, 2000), lit(0.5)).otherwise(lit(0.0)) +
        least(stop.cast("double") * 5 / nullif(n, lit(0)).cast("double"), lit(0.5)),
      4)
  }

  /** N-gram-marker language ID: score each candidate language by marker
    * token hits, pick the argmax (ties → earlier entry). Marker sets are
    * caller-supplied so tests can pin real multi-language fixtures.
    * Scoring goes through [[tokenOccurrences]] — compiled string passes,
    * no interpreted HOF lambda per (document, marker). */
  def languageId(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val padded = paddedText(text)
    val scores = markers.map { case (lang, ws) =>
      lang -> ws.map(w => occurrencesInPadded(padded, w)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Word k-shingles (distinct, first-occurrence order), the unit of
    * MinHash/Jaccard dedup. Empty array when the document has fewer
    * than k tokens — including null text, matching the HOF combo this
    * wrapped before [[graft.expressions.WordShingles]] replaced it
    * (the interpreted combo dominated both shingle-dedup queries). */
  def shingles(text: Column, k: Int): Column =
    coalesce(graft.expressions.WordShingles.of(text, k),
      array().cast("array<string>"))

  /** Per-document overlap stats against a shingle DICTIONARY — the
    * decontamination core shared by the batch queries
    * (`decontam_overlap` & friends via
    * [[graft.queries.CurationQueries]]'s benchOverlapStats) and the
    * streaming screen ([[graft.streaming.Streams.decontamScreen]]), so
    * the hit count and rounded ratio can never drift between them.
    * Appends `(n_hit, n_shingles, contam_ratio)` to `docs`' columns.
    *
    * 100 TB design: `dict` is the tiny side (an eval set's distinct
    * shingles) and is BROADCAST; the corpus is scanned once — map-side
    * hash semi-join on the exploded shingles, partial-aggregated hit
    * counts, one exchange keyed by `idCol`. The corpus never self-joins
    * and never shuffles its shingle sets.
    *
    * PRECONDITION: `idCol` must be unique within `docs`. Hit counts are
    * keyed by id and joined back to the rows, so N copies of one id
    * would each receive the SUM of all copies' hits — inflating
    * `contam_ratio` and flagging clean duplicates. Batch callers own
    * dedup upstream; the streaming screen
    * ([[graft.streaming.Streams.decontamScreen]]) enforces it per
    * micro-batch (at-least-once replays deliver identical copies, so
    * dropping them loses nothing). */
  def dictOverlapStats(
      docs: org.apache.spark.sql.DataFrame,
      dict: org.apache.spark.sql.DataFrame, // one `shingle` column, tiny
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 4): org.apache.spark.sql.DataFrame = {
    val sh = docs.withColumn("__sh", shingles(col(textCol), shingleN))
    val hits = sh.select(col(idCol), explode(col("__sh")).as("shingle"))
      .join(broadcast(dict.select(col("shingle"))), Seq("shingle"))
      .groupBy(idCol).agg(count(lit(1)).as("n_hit"))
    sh.join(hits, Seq(idCol), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("n_shingles", size(col("__sh")).cast("long"))
      .withColumn("contam_ratio",
        coalesce(round(col("n_hit").cast("double") /
          nullif(col("n_shingles"), lit(0L)).cast("double"), 4), lit(0.0)))
      .drop("__sh")
  }

  /** Vocabulary fingerprint: md5 over the sorted distinct token set.
    * Two documents with identical vocabulary collide — a cheap
    * order-insensitive near-dup key (rolling-hash analog). `sort_array`,
    * not `array_sort`: the latter's default comparator is still a
    * lambdafunction in the plan (interpreted per comparison), while
    * SortArray sorts by natural ordering without one; token arrays
    * contain no nulls, so the null-placement difference is moot. */
  def vocabFingerprint(text: Column): Column =
    md5(concat_ws(" ", sort_array(array_distinct(tokens(text)))))

  /** One MinHash signature component: min over md5("p<i>|" + shingle).
    * Using md5 keeps the permutation family portable (identical in any
    * engine) and uniformly distributed; min over hex strings is a valid
    * min-wise hash because hex compare = byte compare. Aggregate this
    * over an exploded shingle column. */
  def minhashAgg(shingle: Column, perm: Int): Column =
    min(md5(concat(lit(s"p$perm|"), shingle)))
}
