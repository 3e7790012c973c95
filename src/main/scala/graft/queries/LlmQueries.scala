package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{BloomDedup, Dedup}

/** LLM-training-data pipeline operators over the `documents` and
  * `embeddings` testdata tables — the north-star extensions beyond the
  * reference surface (text analysis, exact + near dedup, similarity
  * search, multimodal plumbing).
  *
  * Scale design: every near-dup / similarity operator is bucketed
  * (LSH bands, fingerprints, shared-shingle join) — candidate
  * generation never enumerates all pairs, so the plans survive 100 TB
  * document sets; the only pairwise work happens inside buckets.
  * All hashing is md5-based so the DuckDB oracle computes bit-identical
  * signatures.
  */
object LlmQueries {

  // ----------------------------------------------------------- text stats
  /** Text analysis: token counting, stopword stats, alpha ratio, quality
    * score, marker-based language ID — one codegen'd projection pass. */
  private val textStats = Q(
    "text_stats",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val markers = Seq(
        "en" -> Seq("the", "a"),
        "es" -> Seq("la", "el"),
        "de" -> Seq("der", "und"))
      d.select(
        col("doc_id"), col("lang"), col("source"),
        length(col("text")).cast("long").as("char_cnt"),
        TextFunctions.tokenCount(col("text")).as("token_cnt"),
        TextFunctions.bpeTokenCount(col("text")).as("bpe_token_cnt"),
        TextFunctions.tokenOccurrences(col("text"), "the").as("the_cnt"),
        round(TextFunctions.alphaRatio(col("text")), 4).as("alpha_ratio"),
        TextFunctions.qualityScore(col("text")).as("quality_score"),
        TextFunctions.languageId(col("text"), markers).as("lang_guess"))
        .orderBy("doc_id")
    },
    Some(s"""
      SELECT doc_id, lang, source,
             CAST(length(text) AS BIGINT) AS char_cnt,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS token_cnt,
             CAST(len(regexp_extract_all(text, '${TextFunctions.BpeTokenPattern}'))
               AS BIGINT) AS bpe_token_cnt,
             CAST(len(list_filter(string_split(text, ' '), t -> t = 'the')) AS BIGINT) AS the_cnt,
             round(CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE)
                   / CAST(nullif(length(text), 0) AS DOUBLE), 4) AS alpha_ratio,
             round(
               (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 2000 THEN 0.5 ELSE 0.0 END)
               + least(CAST(len(list_filter(string_split(text, ' '), t -> t = 'the'))
                            + len(list_filter(string_split(text, ' '), t -> t = 'a')) AS DOUBLE) * 5
                       / CAST(nullif(len(string_split(text, ' ')), 0) AS DOUBLE), 0.5),
               4) AS quality_score,
             CASE
               WHEN len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a')) >=
                    greatest(len(list_filter(string_split(text, ' '), t -> t = 'la' OR t = 'el')),
                             len(list_filter(string_split(text, ' '), t -> t = 'der' OR t = 'und')))
                    AND len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a')) > 0
               THEN 'en'
               WHEN len(list_filter(string_split(text, ' '), t -> t = 'la' OR t = 'el')) >=
                    len(list_filter(string_split(text, ' '), t -> t = 'der' OR t = 'und'))
                    AND len(list_filter(string_split(text, ' '), t -> t = 'la' OR t = 'el')) > 0
               THEN 'es'
               WHEN len(list_filter(string_split(text, ' '), t -> t = 'der' OR t = 'und')) > 0
               THEN 'de'
               ELSE 'und' END AS lang_guess
      FROM documents ORDER BY doc_id"""),
  )

  // ------------------------------------------------------------- BM25
  /** Fixed keyword query for the BM25 scorer — common / stopword /
    * rare, so the idf spread is real (df ≈ 402 / 388 / 25 at sf0.01). */
  private val Bm25Terms = Seq("batch", "the", "dup")

  /** BM25 relevance scoring of every document against a fixed keyword
    * query — the retrieval primitive behind corpus search and
    * quality-targeted selection ("find training docs about X").
    *
    * Shape: term frequencies ride the scan as compiled `replace`-based
    * counts (no explode, no posting-list shuffle — the query is k fixed
    * terms, so tf is k extra columns); the corpus stats the formula
    * needs (N, Σdl, per-term df) collapse to ONE metadata row broadcast
    * back; the score is then closed-form column arithmetic. Zero
    * corpus-sized shuffles at any scale — a 100 TB corpus pays one
    * stats aggregate and one codegen'd projection pass.
    *
    * Oracle exactness: every aggregate is summed as LONG (exact, order-
    * independent — the double-sum ordering trap never arises), and the
    * score tree uses only IEEE-correctly-rounded ops plus `ln`, which
    * this container's JVM and DuckDB produce bit-identically (probed
    * over the relevant input range); both engines evaluate the SAME
    * association order, so the doubles hash-match. */
  /** Shared BM25 frame: `(doc_id, lang, source, dl, bm25)` for docs
    * with a positive score, unordered — the `doc_bm25_scores` gate
    * query orders it, the RRF fusion ranks its top pool. */
  private def bm25Frame(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val withTf = d.select(
      col("doc_id") +: col("lang") +: col("source") +:
        TextFunctions.tokenCount(col("text")).as("dl") +:
        Bm25Terms.map(t =>
          TextFunctions.tokenOccurrences(col("text"), t).as(s"tf_$t")): _*)
    val stats = withTf.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl") +:
        Bm25Terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)
    // one metadata row; avgdl divides two exact longs — deterministic
    def nD = col("n_docs").cast("double")
    val scored = withTf.crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / nD)
    def part(t: String): Column = {
      val tf = col(s"tf_$t").cast("double")
      val df = col(s"df_$t").cast("double")
      log((nD - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl")))
    }
    scored
      .withColumn("bm25",
        round(Bm25Terms.map(part).reduceLeft(_ + _), 8))
      .filter(col("bm25") > 0)
      .select("doc_id", "lang", "source", "dl", "bm25")
  }

  /** Shared BM25 oracle CTE chain ending in relation
    * `bm25_scored(doc_id, lang, source, dl, bm25)` (positive scores
    * only) — the textual twin of [[bm25Frame]]. */
  private val bm25OracleCtes: String = {
    val tfSql = Bm25Terms.map { t =>
      s"(length(pt) - length(replace(pt, ' $t ', ''))) // ${t.length + 2} AS tf_$t"
    }.mkString(",\n               ")
    val dfSql = Bm25Terms.map { t =>
      s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t"
    }.mkString(", ")
    val partSql = Bm25Terms.map { t =>
      s"""ln((CAST(n_docs AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5)
         / (CAST(df_$t AS DOUBLE) + 0.5) + 1.0)
         * (CAST(tf_$t AS DOUBLE) * 2.2)
         / (CAST(tf_$t AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))"""
    }.mkString(" + ")
    s"""tf AS (
        SELECT doc_id, lang, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
               $tfSql
        FROM (SELECT *, ' ' || replace(text, ' ', '  ') || ' ' AS pt FROM documents) p),
      stats AS (
        SELECT count(*) AS n_docs, sum(dl) AS sum_dl, $dfSql FROM tf),
      bm25_scored AS (
        SELECT * FROM (
          SELECT doc_id, lang, source, dl, round($partSql, 8) AS bm25
          FROM tf, (SELECT *, CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
                    FROM stats) s) q
        WHERE bm25 > 0)"""
  }

  private val bm25 = Q(
    "doc_bm25_scores",
    (s, dir) => bm25Frame(s, dir).orderBy(col("bm25").desc, col("doc_id")),
    Some(s"""
      WITH $bm25OracleCtes
      SELECT doc_id, lang, source, dl, bm25 FROM bm25_scored
      ORDER BY bm25 DESC, doc_id"""),
  )

  // ------------------------------------------------------- perplexity
  /** CCNet-style perplexity quality gate: score every document by its
    * average negative log-probability under a unigram LM trained on
    * the corpus's English slice (add-one smoothed), flag the
    * high-perplexity tail. This is the classic model-based quality
    * filter — cheap LM, trained on in-domain text, scores the crawl;
    * what the heuristic `quality_score` approximates with counts, this
    * does with a real (if tiny) language model.
    *
    * Determinism contract: each token's `-ln p` term is cast to
    * DECIMAL(28,12) BEFORE the per-document sum, making the sum exact
    * and order-independent (a raw double sum varies with partition
    * order); the double→decimal rounding and `ln` itself are probed
    * bit-identical JVM↔DuckDB. The OOV floor term (`1/(t+v)`) is part
    * of the formula but unexercised on this lake — the synthetic
    * corpus shares one 31-token vocabulary across languages, so no
    * token is out-of-vocabulary at any SF (noted per the fixture-
    * vacuity discipline; `PerplexitySpec` exercises the OOV path on a
    * planted fixture instead).
    *
    * 100 TB design: the LM is a vocabulary-sized aggregate broadcast
    * back (never a corpus shuffle); scoring explodes tokens but the
    * per-doc partial aggregate collapses them map-side — the one
    * shuffle carries a row per document, not per token. */
  /** The avg-NLL cutoff shared by `doc_perplexity`, the composed
    * `corpus_quality_gate`, and the streaming ingest gate — the
    * [[graft.functions.GateSignals]] definition. */
  private[queries] val PplGate = graft.functions.GateSignals.PplGate

  /** ONE implementation of the CCNet scorer — train + score through
    * [[graft.functions.GateSignals]], the same code the streaming
    * ingest gate freezes — shared by `doc_perplexity` and the composed
    * quality gate: per-document `(doc_id, lang, source, extraCols…,
    * n_tokens, avg_nll)`. `extraCols` are computed on the DOCUMENT row
    * before the token explode and ride the aggregate as grouping keys
    * (functionally dependent on doc_id) — the same no-corpus-rejoin
    * trick lang/source use. */
  private[queries] def perplexityScored(
      s: SparkSession, dir: String,
      extraCols: Seq[(String, Column)] = Nil): DataFrame = {
    val d = Tables.documents(s, dir)
    val (probs, floorP) = graft.functions.GateSignals.trainUnigramLm(
      d, col("text"), col("lang") === "en")
    val keyed = d.select(
      Seq(col("doc_id"), col("lang"), col("source")) ++
        extraCols.map { case (n, c) => c.as(n) } :+ col("text"): _*)
    graft.functions.GateSignals.nllScored(keyed,
      Seq("doc_id", "lang", "source") ++ extraCols.map(_._1),
      col("text"), probs, floorP)
  }

  /** The LM-scorer oracle CTE chain ending in `ppl_sc(doc_id, n_tokens,
    * nll_sum)` — the textual twin of [[perplexityScored]], shared by
    * the perplexity query and the composed quality gate. */
  private[queries] val PPL_CTES = """toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents),
      lm AS (SELECT tok, count(*) AS c FROM toks WHERE lang = 'en' GROUP BY tok),
      tot AS (SELECT sum(c) AS t, count(*) AS v FROM lm),
      p AS (SELECT tok, (CAST(c AS DOUBLE) + 1.0)
                        / (CAST(t AS DOUBLE) + CAST(v AS DOUBLE)) AS pr
            FROM lm, tot),
      terms AS (
        SELECT t2.doc_id,
               CAST(-ln(coalesce(p.pr,
                 1.0 / (CAST(tot.t AS DOUBLE) + CAST(tot.v AS DOUBLE))))
                 AS DECIMAL(28,12)) AS nll_term
        FROM toks t2 LEFT JOIN p USING (tok), tot),
      ppl_sc AS (SELECT doc_id, count(*) AS n_tokens, sum(nll_term) AS nll_sum
             FROM terms GROUP BY doc_id)"""

  private val perplexity = Q(
    "doc_perplexity",
    (s, dir) =>
      // lang/source ride the explode as grouping keys — ONE corpus
      // scan and ONE per-doc shuffle; a rejoin back to documents for
      // the label columns would shuffle the corpus a second time
      perplexityScored(s, dir)
        .withColumn("high_perplexity", col("avg_nll") > PplGate)
        .orderBy("doc_id"),
    Some(s"""
      WITH $PPL_CTES
      SELECT d.doc_id, d.lang, d.source, ppl_sc.n_tokens,
             round(CAST(nll_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE), 8) AS avg_nll,
             round(CAST(nll_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE), 8) > $PplGate
               AS high_perplexity
      FROM documents d JOIN ppl_sc USING (doc_id) ORDER BY d.doc_id"""),
  )


  // ----------------------------------------------- CCNet ppl buckets
  /** CCNet's actual OUTPUT shape — each language split into
    * head/middle/tail perplexity terciles (Wenzek et al. 2020): "head"
    * is the cleanest third under the LM, "tail" the noisiest, and
    * published pipelines train on head+middle or reweight by bucket.
    * Complements `doc_perplexity`'s absolute cutoff with the
    * RELATIVE, per-language split that made CCNet robust across
    * languages with different baseline perplexities.
    *
    * 100 TB design: scoring is the shared [[perplexityScored]] stage
    * (one corpus scan, broadcast LM); the per-language rank rides
    * [[graft.operators.PrefixSum]]'s two-phase shape — a language IS
    * a hot stratum, exactly what it bounds; tercile cuts are integer
    * rank arithmetic (`3·rank ≤ k·n`), no float boundary. */
  private val ccnetBuckets = Q(
    "corpus_ccnet_buckets",
    (s, dir) => {
      val scored = perplexityScored(s, dir)
        .select("doc_id", "lang", "avg_nll")
      val ranked = graft.operators.PrefixSum.runningSum(scored, Seq("lang"),
        Seq(col("avg_nll").asc, col("doc_id")), lit(1L), "lang_rank")
      val n = scored.groupBy("lang").agg(count(lit(1)).as("n_lang"))
      ranked.join(broadcast(n), Seq("lang"))
        .withColumn("bucket",
          when(col("lang_rank") * 3 <= col("n_lang"), "head")
            .when(col("lang_rank") * 3 <= col("n_lang") * 2, "middle")
            .otherwise("tail"))
        .select("doc_id", "lang", "avg_nll", "lang_rank", "n_lang", "bucket")
        .orderBy("doc_id")
    },
    Some(s"""
      WITH $PPL_CTES,
      sc AS (SELECT d.doc_id, d.lang,
               round(CAST(nll_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE), 8) AS avg_nll
             FROM documents d JOIN ppl_sc USING (doc_id)),
      r AS (SELECT doc_id, lang, avg_nll,
              CAST(row_number() OVER (PARTITION BY lang
                ORDER BY avg_nll, doc_id) AS BIGINT) AS lang_rank,
              CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
            FROM sc)
      SELECT doc_id, lang, avg_nll, lang_rank, n_lang,
             CASE WHEN lang_rank * 3 <= n_lang THEN 'head'
                  WHEN lang_rank * 3 <= n_lang * 2 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM r ORDER BY doc_id"""),
  )

  // ------------------------------------------------------ quality gate
  /** Length cutoffs, sized against the synthetic lake (token counts run
    * 10–99 at every SF) so BOTH failure paths are non-vacuous — the
    * CMS-width discipline. A web-scale run would use ~50/100k. */
  private val MinTokensGate = 16L
  private val MaxTokensGate = 96L

  /** The composed quality gate — the FineWeb/CCNet-style multi-signal
    * document filter as ONE operator: repetition (Gopher cutoffs),
    * LM perplexity (CCNet cutoff), and length bounds, each already
    * oracle-proven standalone (`corpus_repetition_stats`,
    * `doc_perplexity`), composed here through the SHARED
    * implementations ([[CurationQueries.dupTokenFrac]],
    * [[perplexityScored]]) so this query checks the COMPOSITION — the
    * per-doc verdict plus machine-readable failure reasons a curation
    * run logs before dropping a document.
    *
    * 100 TB design: the repetition fractions are per-row arithmetic
    * computed BEFORE the token explode and ride the LM aggregate as
    * grouping keys (functionally dependent on doc_id — no corpus
    * rejoin); the gate then adds ZERO exchanges to the perplexity
    * plan: one corpus scan into the map-side-collapsing per-doc
    * aggregate, vocabulary-sized LM broadcasts, verdict arithmetic on
    * the aggregated rows. */
  private val qualityGate = Q(
    "corpus_quality_gate",
    (s, dir) => {
      val scored = perplexityScored(s, dir, Seq(
        "dup_token_frac" -> CurationQueries.dupTokenFrac,
        "dup_bigram_frac" -> CurationQueries.dupBigramFrac))
      graft.functions.GateSignals.verdict(scored, MinTokensGate, MaxTokensGate)
        .select("doc_id", "lang", "source", "n_tokens", "dup_token_frac",
          "dup_bigram_frac", "avg_nll", "fail_reasons", "keep")
        .orderBy("doc_id")
    },
    Some(s"""
      WITH $PPL_CTES,
      ${CurationQueries.REP_CTE},
      g AS (
        SELECT d.doc_id, d.lang, d.source, ppl_sc.n_tokens,
               rep.dup_token_frac, rep.dup_bigram_frac,
               round(CAST(nll_sum AS DOUBLE) / CAST(ppl_sc.n_tokens AS DOUBLE), 8)
                 AS avg_nll
        FROM documents d
        JOIN ppl_sc USING (doc_id) JOIN rep USING (doc_id)),
      v AS (
        SELECT g.*,
               concat_ws(',',
                 CASE WHEN dup_token_frac > ${CurationQueries.DupTokenGate}
                        OR dup_bigram_frac > ${CurationQueries.DupBigramGate}
                      THEN 'repetitive' END,
                 CASE WHEN avg_nll > $PplGate THEN 'high_perplexity' END,
                 CASE WHEN n_tokens < $MinTokensGate THEN 'too_short' END,
                 CASE WHEN n_tokens > $MaxTokensGate THEN 'too_long' END)
                 AS fail_reasons
        FROM g)
      SELECT doc_id, lang, source, n_tokens, dup_token_frac, dup_bigram_frac,
             avg_nll, fail_reasons, fail_reasons = '' AS keep
      FROM v ORDER BY doc_id"""),
  )

  // ---------------------------------------------------------- fingerprint
  /** Document fingerprinting: md5 over the sorted vocabulary; cluster
    * size via a count window — order-insensitive near-dup key. */
  private val fingerprint = Q(
    "doc_fingerprint",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.vocabFingerprint(col("text")).as("fp"))
      d.withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("fp")).cast("long"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, fp, CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS cluster_size
      FROM (SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
            FROM documents) t
      ORDER BY doc_id"""),
  )

  // ---------------------------------------------------------- exact dedup
  /** Exact dedup by content hash: one shuffle on md5(text), survivor =
    * lowest doc_id (deterministic). */
  private val dedupExact = Q(
    "dedup_exact",
    (s, dir) => {
      Dedup.exactByHash(Tables.documents(s, dir), "text", "doc_id")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, lang, source, n_chars
      FROM (SELECT d.*, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM documents d) t
      WHERE rn = 1 ORDER BY doc_id"""),
  )

  // ----------------------------------------------------- bloom dedup state
  /** The bloom-screen fixture both `dedup_bloom_*` queries share: the
    * corpus splits into HISTORY (doc_id % 3 < 2 — the content the
    * filter has absorbed) and an INCOMING batch = the unseen slice
    * (doc_id % 3 = 2) plus a known sliver of history re-arriving
    * (doc_id % 21 = 0 — injected TRUE duplicates, since the testdata
    * texts are otherwise all distinct). The screen must flag every
    * replay (Bloom filters cannot false-negative) and may flag some
    * new documents (the measured false-positive path). */
  private def bloomScreenFrame(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val history = d.filter(pmod(col("doc_id"), lit(3L)) < 2)
    val incoming = d.filter(pmod(col("doc_id"), lit(3L)) === 2)
      .unionByName(history.filter(pmod(col("doc_id"), lit(21L)) === 0))
    BloomDedup.screen(incoming, col("text"),
        BloomDedup.buildBitset(history, col("text")), Seq("doc_id"))
      .withColumn("is_replay", pmod(col("doc_id"), lit(3L)) < 2)
  }

  /** Shared oracle CTE chain: history positions (`hp`), incoming batch
    * (`inc`), per-doc probe rows (`ip`), per-doc hit counts (`hits`) —
    * the bloom probe replayed position-by-position in SQL. */
  private val BloomCtes: String = s"""
      WITH hist AS (SELECT text FROM documents WHERE doc_id % 3 < 2),
      hp AS (SELECT DISTINCT substr(md5('bloom' || CAST(u.i AS VARCHAR) || '|' || text), 1, 3) AS pos
             FROM hist, unnest([0, 1]) u(i)),
      inc AS (SELECT doc_id, text, (doc_id % 3 < 2) AS is_replay
              FROM documents
              WHERE doc_id % 3 = 2 OR (doc_id % 3 < 2 AND doc_id % 21 = 0)),
      ip AS (SELECT doc_id, substr(md5('bloom' || CAST(u.i AS VARCHAR) || '|' || text), 1, 3) AS pos
             FROM inc, unnest([0, 1]) u(i)),
      hits AS (SELECT ip.doc_id, count(*) AS n_set
               FROM ip JOIN hp USING (pos) GROUP BY ip.doc_id)"""

  /** Bloom dedup screen ([[graft.operators.BloomDedup]]): per incoming
    * document, how many of its 2 probes hit the history filter and the
    * membership verdict. `is_replay → flagged` must hold on every row
    * (no false negatives — checked by the differential itself, since
    * both columns are in the output) while `flagged ∧ ¬is_replay`
    * rows are the filter's false positives, priced in
    * `dedup_bloom_fpr`. */
  private val bloomScreen = Q(
    "dedup_bloom_screen",
    (s, dir) =>
      bloomScreenFrame(s, dir)
        .select(col("doc_id"), col("is_replay"), col("n_probes_set"),
          col("flagged"),
          (col("flagged") && !col("is_replay")).as("false_pos"))
        .orderBy("doc_id"),
    Some(s"""
      $BloomCtes
      SELECT i.doc_id, i.is_replay,
             CAST(coalesce(h.n_set, 0) AS BIGINT) AS n_probes_set,
             (coalesce(h.n_set, 0) = 2) AS flagged,
             ((coalesce(h.n_set, 0) = 2) AND NOT i.is_replay) AS false_pos
      FROM inc i LEFT JOIN hits h ON i.doc_id = h.doc_id
      ORDER BY i.doc_id"""),
  )

  /** The false-positive ACCOUNTING the bloom state's bounded memory is
    * bought with: one row pricing the screen — missed duplicates (must
    * be 0, the structural guarantee), observed vs expected FPR (fill²
    * for k=2 probes), and the filter's fill ratio. The position space
    * is deliberately small (4096 bits) so this accounting is
    * non-vacuous at differential scale; production sizing is the
    * standard bits-per-key trade and changes only the constants. */
  private val bloomFpr = Q(
    "dedup_bloom_fpr",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val history = d.filter(pmod(col("doc_id"), lit(3L)) < 2)
      val bits = BloomDedup.positionsOf(history, col("text"))
        .agg(count(lit(1)).as("bits_set"))
      bloomScreenFrame(s, dir)
        .agg(
          count(lit(1)).as("n_screened"),
          sum(when(col("is_replay"), 1L).otherwise(0L)).as("n_replayed"),
          sum(when(!col("is_replay"), 1L).otherwise(0L)).as("n_new"),
          sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
          sum(when(col("is_replay") && !col("flagged"), 1L).otherwise(0L))
            .as("n_missed_dups"),
          sum(when(col("flagged") && !col("is_replay"), 1L).otherwise(0L))
            .as("n_false_pos"))
        .crossJoin(broadcast(bits))
        .select(
          col("n_screened"), col("n_replayed"), col("n_new"),
          col("n_flagged"), col("n_missed_dups"), col("n_false_pos"),
          round(col("n_false_pos").cast("double") /
            expr("nullif(n_new, 0)").cast("double"), 6).as("observed_fpr"),
          col("bits_set"),
          round(col("bits_set").cast("double") / 4096.0, 6).as("fill_ratio"),
          round((col("bits_set").cast("double") / 4096.0) *
            (col("bits_set").cast("double") / 4096.0), 6).as("expected_fpr"))
        .orderBy("n_screened")
    },
    Some(s"""
      $BloomCtes,
      scr AS (SELECT i.doc_id, i.is_replay, (coalesce(h.n_set, 0) = 2) AS flagged
              FROM inc i LEFT JOIN hits h ON i.doc_id = h.doc_id),
      bits AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM hp)
      SELECT CAST(count(*) AS BIGINT) AS n_screened,
             CAST(sum(CASE WHEN is_replay THEN 1 ELSE 0 END) AS BIGINT) AS n_replayed,
             CAST(sum(CASE WHEN NOT is_replay THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
             CAST(sum(CASE WHEN is_replay AND NOT flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_missed_dups,
             CAST(sum(CASE WHEN flagged AND NOT is_replay THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
             round(CAST(sum(CASE WHEN flagged AND NOT is_replay THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(nullif(sum(CASE WHEN NOT is_replay THEN 1 ELSE 0 END), 0) AS DOUBLE), 6)
               AS observed_fpr,
             b.bits_set,
             round(CAST(b.bits_set AS DOUBLE) / 4096.0, 6) AS fill_ratio,
             round((CAST(b.bits_set AS DOUBLE) / 4096.0)
                   * (CAST(b.bits_set AS DOUBLE) / 4096.0), 6) AS expected_fpr
      FROM scr, bits b
      GROUP BY b.bits_set ORDER BY n_screened"""),
  )

  // ------------------------------------------------------ rolling hash
  /** Winnowing fingerprint (rolling-hash document fingerprinting; see
    * [[graft.expressions.RollingFingerprint]]): k=8 char-gram Rabin–Karp
    * hashes, window-of-4 minima, per-document selected-hash set. The
    * oracle recomputes every hash NON-rolling (the nested polynomial
    * below — canonical mod-1e9+7 values are representation-independent)
    * and replays the winnowing with a windowed min, so the rolling
    * update, the window selection and the dedup are all differential.
    * The set crosses the boundary as (count, md5 of the sorted joined
    * values); `ord(substr(...))` equals the byte because the corpus is
    * ASCII at every SF (verified; see multimodal_frames). */
  /** The k=8 polynomial as nested SQL, shared by both winnow oracles.
    * The seed is CAST AS BIGINT so the whole fold stays 64-bit — an
    * INT32 accumulator overflows at the first *256 past 2^23. */
  private val WINNOW_POLY: String =
    (0 until 8).foldLeft("CAST(0 AS BIGINT)")((acc, j) =>
      s"(($acc * 256 + ord(substr(text, CAST(u.i AS INT) + $j, 1))) % 1000000007)")

  /** Non-rolling winnow replay (grams → windowed min → selected set),
    * ONE definition for both winnow oracles — the selection rules (the
    * full-window filter, the m ≤ w single-window branch) must never
    * drift between them. Yields CTEs `d` and `sel(doc_id, mh)`. */
  private val WINNOW_SEL: String = s"""
      WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
      grams AS (
        SELECT doc_id, CAST(u.i AS INT) AS i,
               CAST(d.n AS INT) - 8 + 1 AS m,
               $WINNOW_POLY AS h
        FROM d, unnest(range(1, CAST(n AS INT) - 8 + 2)) u(i)
        WHERE n >= 8),
      wmin AS (
        SELECT doc_id, i, m,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
        FROM grams),
      sel AS (
        SELECT DISTINCT doc_id, mh FROM wmin WHERE m > 4 AND i <= m - 4 + 1
        UNION
        SELECT doc_id, min(h) AS mh FROM grams GROUP BY doc_id HAVING count(*) <= 4)"""

  private val winnowQ = Q(
    "doc_winnow_fingerprint",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          // coalesce mirrors the oracle's LEFT JOIN: a NULL/short text is
          // "no selected hashes", not a NULL fingerprint row
          coalesce(graft.expressions.RollingFingerprint.of(col("text"), 8, 4),
            array().cast("array<long>")).as("fp"))
        .select(col("doc_id"),
          size(col("fp")).cast("long").as("n_selected"),
          md5(array_join(col("fp").cast("array<string>"), "|")).as("fp_md5"))
        .orderBy("doc_id"),
    Some(s"""$WINNOW_SEL,
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_selected,
                 md5(string_agg(CAST(mh AS VARCHAR), '|' ORDER BY mh)) AS fp_md5
          FROM sel GROUP BY doc_id)
        SELECT d.doc_id, coalesce(a.n_selected, 0) AS n_selected,
               coalesce(a.fp_md5, md5('')) AS fp_md5
        FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
        ORDER BY d.doc_id"""),
  )

  /** Winnow-bucketed near-dup pairs: documents sharing a RARE selected
    * hash (df ∈ [2,10]) paired by a hash-bucket self-join, scored by how
    * many rare hashes they share. The df valve is load-bearing: the
    * corpus has boilerplate hashes shared by ~400 documents (measured),
    * and an unvalved self-join would go quadratic on exactly those —
    * same design as dedup_ngram_jaccard's rare-shingle valve. */
  private val winnowPairs = Q(
    "dedup_winnow_pairs",
    (s, dir) => {
      val fp = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.expressions.RollingFingerprint.of(col("text"), 8, 4)).as("h"))
        .persist() // feeds the df valve and both sides of the pair join
      val rare = fp.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 10))
        .select("h")
      val cand = fp.join(rare, Seq("h"))
      val pairs = cand.select(col("h"), col("doc_id").as("doc_a"))
        .join(cand.select(col("h"), col("doc_id").as("doc_b")), Seq("h"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("shared_hashes"))
        .orderBy("doc_a", "doc_b")
        .persist()
      pairs.count() // materialize, then drop the corpus-sized fingerprint table
      fp.unpersist()
      pairs
    },
    Some(s"""$WINNOW_SEL,
      rare AS (SELECT mh FROM sel GROUP BY mh HAVING count(*) BETWEEN 2 AND 10)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS shared_hashes
      FROM sel a JOIN rare r ON a.mh = r.mh
      JOIN sel b ON a.mh = b.mh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      ORDER BY doc_a, doc_b"""),
  )

  // ------------------------------------------------------ corpus pipeline
  /** The composed training-data cleaning pipeline — the flagship
    * LLM-corpus flow as ONE declarative plan: marker language-ID →
    * quality gate → exact content dedup (md5, lowest doc_id wins) →
    * vocabulary-fingerprint near-dup collapse. Everything is a filter
    * or a rank=1 dedup, so Catalyst fuses the scoring into the scan
    * projection and DedupWindowToMaxBy turns BOTH dedup stages into
    * partial aggregates — the executed plan is three exchanges (one per
    * dedup aggregate + the deterministic output sort), zero joins, zero
    * windows, at any scale (pinned in PlanAuditSpec). */
  /** The corpus_clean survivor stage — language gate → quality gate →
    * exact content dedup → vocab-fingerprint near-dup collapse — shared
    * by `corpus_clean` (emits it) and `corpus_clean_clustered` (feeds
    * it to connected components for transitive cluster resolution). */
  private[graft] def corpusSurvivors(s: SparkSession, dir: String): DataFrame =
    graft.SharedFrames.cached(s, s"corpus_survivors:$dir") {
      val markers = Seq(
        "en" -> Seq("the", "a"),
        "es" -> Seq("la", "el"),
        "de" -> Seq("der", "und"))
      val scored = Tables.documents(s, dir)
        .withColumn("lang_guess", TextFunctions.languageId(col("text"), markers))
        .withColumn("quality_score", TextFunctions.qualityScore(col("text")))
        .filter(col("lang_guess") === "en" && col("quality_score") >= 0.5)
      val exact = Dedup.exactByHash(scored, "text", "doc_id")
      exact
        .withColumn("fp", TextFunctions.vocabFingerprint(col("text")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("fp").orderBy(col("doc_id").asc)))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("source"), col("quality_score"))
    }

  /** DuckDB CTE chain ending in `fpd(doc_id, lang, source,
    * quality_score, …)` — mirrors [[corpusSurvivors]]. */
  private val CORPUS_CTES = """scored AS (
        SELECT doc_id, lang, source, text,
               CASE
                 WHEN len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a')) >=
                      greatest(len(list_filter(string_split(text, ' '), t -> t = 'la' OR t = 'el')),
                               len(list_filter(string_split(text, ' '), t -> t = 'der' OR t = 'und')))
                      AND len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a')) > 0
                 THEN 'en'
                 WHEN len(list_filter(string_split(text, ' '), t -> t = 'la' OR t = 'el')) >=
                      len(list_filter(string_split(text, ' '), t -> t = 'der' OR t = 'und'))
                      AND len(list_filter(string_split(text, ' '), t -> t = 'la' OR t = 'el')) > 0
                 THEN 'es'
                 WHEN len(list_filter(string_split(text, ' '), t -> t = 'der' OR t = 'und')) > 0
                 THEN 'de'
                 ELSE 'und' END AS lang_guess,
               round(
                 (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 2000 THEN 0.5 ELSE 0.0 END)
                 + least(CAST(len(list_filter(string_split(text, ' '), t -> t = 'the'))
                              + len(list_filter(string_split(text, ' '), t -> t = 'a')) AS DOUBLE) * 5
                         / CAST(nullif(len(string_split(text, ' ')), 0) AS DOUBLE), 0.5),
                 4) AS quality_score
        FROM documents),
      filtered AS (
        SELECT * FROM scored WHERE lang_guess = 'en' AND quality_score >= 0.5),
      exd AS (
        SELECT * FROM (
          SELECT f.*, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn1
          FROM filtered f) t WHERE rn1 = 1),
      fpd AS (
        SELECT * FROM (
          SELECT e.*, row_number() OVER (
            PARTITION BY md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
            ORDER BY doc_id) AS rn2
          FROM exd e) t WHERE rn2 = 1)"""

  /** Survivor near-dup components (edges → min-reachable-id `comp`) —
    * the oracle spelling of [[survivorComponents]], shared by the
    * clustered-clean, capstone, and cluster-split oracles. Must follow
    * `$MINHASH_CTES, $CORPUS_CTES` (uses `pairs` and `fpd`). */
  private val COMP_CTES = """edges AS (
        SELECT p.doc_a AS src, p.doc_b AS dst FROM pairs p
        JOIN fpd a ON p.doc_a = a.doc_id
        JOIN fpd b ON p.doc_b = b.doc_id
        WHERE p.jaccard >= 0.5
        UNION
        SELECT p.doc_b AS src, p.doc_a AS dst FROM pairs p
        JOIN fpd a ON p.doc_a = a.doc_id
        JOIN fpd b ON p.doc_b = b.doc_id
        WHERE p.jaccard >= 0.5),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
      comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)"""

  private val corpusClean = Q(
    "corpus_clean",
    (s, dir) => corpusSurvivors(s, dir).orderBy("doc_id"),
    Some(s"""
      WITH $CORPUS_CTES
      SELECT doc_id, lang, source, quality_score
      FROM fpd ORDER BY doc_id"""),
  )

  // -------------------------------------------------------- MinHash + LSH
  /** Near-dup dedup: 3-word shingles → 12 md5 MinHash components →
    * 4 LSH bands of 3 → banded self-join for candidates → exact shingle
    * Jaccard on candidates only.
    *
    * 100 TB story: the band join buckets documents so pairwise work is
    * confined to same-band collisions (expected O(n · dups)); with 12
    * hashes in 4 bands the match threshold is ≈ (1/4)^(1/3) ≈ 0.63
    * Jaccard. No all-pairs stage exists in the plan.
    */
  /** The MinHash+LSH candidate-pair stage, shared by
    * `dedup_minhash_lsh` (emits the pairs), `dedup_clusters` and
    * `corpus_clean_clustered` (both feed them to connected components).
    * Memoized per session ([[graft.SharedFrames]]): the signature +
    * band-join work runs ONCE, every later consumer reuses the persisted
    * (small) pair frame; corpus-sized intermediates are
    * materialized-and-released inside the build. Consumers must NOT
    * unpersist the returned frame. */
  private[graft] def minhashPairs(s: SparkSession, dir: String): DataFrame =
    graft.SharedFrames.cachedPrepersisted(s, s"minhash_pairs:$dir") {
      minhashPairsBuild(s, dir)
    }

  private def minhashPairsBuild(s: SparkSession, dir: String): DataFrame = {
      val nPerm = 12
      val bandSize = 3
      val d = Tables.documents(s, dir)
      // Native shingling + the fused MinHashSignatures expression keep
      // the whole signature stage shuffle-free (one compiled pass per
      // document). withSh is persisted — it feeds the signature stage
      // and both sides of the candidate pair join, and at 100 TB this
      // is exactly the shingle table a real run would checkpoint.
      val withSh = d
        .select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .persist()
      val sig = withSh.select(col("doc_id"),
        graft.expressions.MinHashSignatures.of(col("sh"), nPerm).as("hs"))
      val bands = mkBands(sig, nPerm, bandSize).persist()
      val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      // Exact Jaccard via in-row array_intersect on the (tiny) candidate
      // set — replaces a 3-way exploded join + two groupBys. Candidates
      // with an empty intersection keep jaccard 0, as before.
      val sets = withSh.select(col("doc_id"), col("sh"),
        size(col("sh")).cast("long").as("n"))
      val out = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sha"),
          col("n").as("na")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("shb"),
          col("n").as("nb")), "doc_b")
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
        .select(col("doc_a"), col("doc_b"),
          round(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")).cast("double"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
        .persist()
      // materialize the (small) result, then release the corpus-sized
      // intermediates — queries can't unpersist after returning, and
      // leaking a shingle table per invocation adds up over a 60-query
      // bench session
      out.count()
      withSh.unpersist()
      bands.unpersist()
      out
  }

  /** LSH band rows `(doc_id, band)` from a `(doc_id, hs)` signature
    * frame — one md5 per band over its slice of the signature. Shared
    * by the self-join pair stage, the incremental screen, and (through
    * [[graft.ext.TextLsh]], the single band-format definition) the
    * streaming corpus ingest. */
  private def mkBands(sig: DataFrame, nPerm: Int, bandSize: Int): DataFrame =
    sig.select(col("doc_id"),
      explode(graft.ext.TextLsh.bandArray(col("hs"), nPerm, bandSize)).as("band"))

  /** DuckDB CTE chain ending in `pairs(doc_a, doc_b, jaccard)` —
    * mirrors [[minhashPairs]]; shared by the pair and cluster oracles. */
  private val MINHASH_CTES = """
      tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) >= 3
                    THEN list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                    ELSE [] END)) AS shingle
             FROM tok),
      sig AS (SELECT doc_id,
                min(md5('p0|' || shingle)) AS h0, min(md5('p1|' || shingle)) AS h1,
                min(md5('p2|' || shingle)) AS h2, min(md5('p3|' || shingle)) AS h3,
                min(md5('p4|' || shingle)) AS h4, min(md5('p5|' || shingle)) AS h5,
                min(md5('p6|' || shingle)) AS h6, min(md5('p7|' || shingle)) AS h7,
                min(md5('p8|' || shingle)) AS h8, min(md5('p9|' || shingle)) AS h9,
                min(md5('p10|' || shingle)) AS h10, min(md5('p11|' || shingle)) AS h11
              FROM sh GROUP BY doc_id),
      bands AS (SELECT doc_id, unnest([
                  md5(concat_ws('|', '0', h0, h1, h2)),
                  md5(concat_ws('|', '1', h3, h4, h5)),
                  md5(concat_ws('|', '2', h6, h7, h8)),
                  md5(concat_ws('|', '3', h9, h10, h11))]) AS band
                FROM sig),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
                FROM cand c
                JOIN sh sa ON c.doc_a = sa.doc_id
                JOIN sh sb ON c.doc_b = sb.doc_id AND sa.shingle = sb.shingle
                GROUP BY c.doc_a, c.doc_b),
      pairs AS (
        SELECT c.doc_a, c.doc_b,
               round(CAST(coalesce(i.inter, 0) AS DOUBLE)
                     / CAST(na.n + nb.n - coalesce(i.inter, 0) AS DOUBLE), 4) AS jaccard
        FROM cand c
        LEFT JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
        JOIN sizes na ON c.doc_a = na.doc_id
        JOIN sizes nb ON c.doc_b = nb.doc_id)"""

  private val minhash = Q(
    "dedup_minhash_lsh",
    // Returns the session-shared pair memo directly. (A trivial
    // projection "shield" used to sit here on the theory that uncache
    // matches only the exact cached plan — false: uncache compares
    // CANONICALIZED plans and a no-op Project canonicalizes away, so
    // the shield never shielded, measured as the memo evicting on every
    // bench rep. The harnesses now guard their unpersist with
    // SharedFrames.isShared instead, which also covers aliases.)
    (s, dir) => minhashPairs(s, dir),
    Some(s"""
      WITH $MINHASH_CTES
      SELECT doc_a, doc_b, jaccard FROM pairs ORDER BY doc_a, doc_b"""),
  )

  // ------------------------------------------------- LSH estimator audit
  /** MinHash estimator self-audit — for every LSH candidate pair, the
    * SIGNATURE-estimated Jaccard (fraction of the 12 minhash components
    * that agree) next to the exact shingle Jaccard the pair stage
    * already computes, plus the signed estimator error. Completes the
    * self-auditing-sketch doctrine (HLL / CMS / histogram rows): the
    * near-dup pipeline thresholds on MinHash theory, and this query
    * measures that estimator's spread on exactly the pairs the
    * pipeline acts on (banding biases candidates toward high
    * similarity, so the audit runs where the decisions happen, not on
    * random pairs).
    *
    * 100 TB design: the candidate pair frame is the session-memoized
    * [[minhashPairs]] output — tiny next to the corpus — and it
    * BROADCASTS into the signature frame twice (doc_a then doc_b), so
    * the corpus-sized signature scan is never shuffled; the signature
    * rebuild is one compiled [[graft.expressions.MinHashSignatures]]
    * pass (the shared pair build releases its own intermediates, so
    * signatures are recomputed rather than held corpus-sized in
    * storage). The component-agreement count is a closed-form sum of
    * 12 `element_at` comparisons — no HOF lambda, fully codegen. */
  private val lshAudit = Q(
    "dedup_lsh_audit",
    (s, dir) => {
      // must match minhashPairsBuild's signature geometry (nPerm = 12)
      val nPerm = 12
      val pairs = minhashPairs(s, dir)
      val sig = Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"),
          graft.expressions.MinHashSignatures.of(col("sh"), nPerm).as("hs"))
      val withA = sig.as("a").join(
        broadcast(pairs.select(col("doc_a"), col("doc_b"), col("jaccard"))),
        col("a.doc_id") === col("doc_a"))
      val both = sig.as("b").join(broadcast(withA), col("b.doc_id") === col("doc_b"))
      val nEq = (0 until nPerm).map(i =>
        when(element_at(col("a.hs"), i + 1) === element_at(col("b.hs"), i + 1),
          1L).otherwise(0L)).reduce(_ + _)
      both.select(col("doc_a"), col("doc_b"), col("jaccard"),
          round(nEq.cast("double") / lit(nPerm.toDouble), 4).as("est_jaccard"))
        .withColumn("est_error", round(col("est_jaccard") - col("jaccard"), 4))
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH $MINHASH_CTES,
      est AS (
        SELECT p.doc_a, p.doc_b, p.jaccard,
               round((  CASE WHEN a.h0 = b.h0 THEN 1 ELSE 0 END
                      + CASE WHEN a.h1 = b.h1 THEN 1 ELSE 0 END
                      + CASE WHEN a.h2 = b.h2 THEN 1 ELSE 0 END
                      + CASE WHEN a.h3 = b.h3 THEN 1 ELSE 0 END
                      + CASE WHEN a.h4 = b.h4 THEN 1 ELSE 0 END
                      + CASE WHEN a.h5 = b.h5 THEN 1 ELSE 0 END
                      + CASE WHEN a.h6 = b.h6 THEN 1 ELSE 0 END
                      + CASE WHEN a.h7 = b.h7 THEN 1 ELSE 0 END
                      + CASE WHEN a.h8 = b.h8 THEN 1 ELSE 0 END
                      + CASE WHEN a.h9 = b.h9 THEN 1 ELSE 0 END
                      + CASE WHEN a.h10 = b.h10 THEN 1 ELSE 0 END
                      + CASE WHEN a.h11 = b.h11 THEN 1 ELSE 0 END) / 12.0,
                 4) AS est_jaccard
        FROM pairs p
        JOIN sig a ON p.doc_a = a.doc_id
        JOIN sig b ON p.doc_b = b.doc_id)
      SELECT doc_a, doc_b, jaccard, est_jaccard,
             round(est_jaccard - jaccard, 4) AS est_error
      FROM est ORDER BY doc_a, doc_b"""),
  )

  // ------------------------------------------------- incremental screen
  /** Incremental corpus dedup — screen a NEW batch of documents against
    * the EXISTING corpus without recomputing (or reshuffling) the
    * corpus: the operational "dedup today's crawl against the lake"
    * flow, the batch-text analog of `stream_near_dup_screen`.
    *
    * The corpus's LSH band rows play the stored index (in a deployment
    * they are a maintained parquet table, like the streaming screens'
    * quantized index; here they derive inline so the oracle can replay
    * end-to-end). The BATCH side — the small side by construction — is
    * broadcast into the band join, so the index is scanned exactly once
    * and nothing corpus-sized moves. Candidates sharing a band get an
    * exact shingle-Jaccard, and each batch doc reports its best corpus
    * match (highest jaccard, smallest corpus doc_id on ties — a packed
    * max-struct, no window) with `is_dup` at the 0.5 threshold. Batch
    * docs with no candidate band collision survive with null match —
    * every batch doc gets a verdict row. */
  private val incrementalScreen = Q(
    "dedup_incremental_screen",
    (s, dir) => {
      val nPerm = 12
      val bandSize = 3
      val isBatch = col("doc_id") % 10 === 3
      val d = Tables.documents(s, dir)
      val withSh = d
        .select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .persist()
      val sig = withSh.select(col("doc_id"),
        graft.expressions.MinHashSignatures.of(col("sh"), nPerm).as("hs"))
      val corpusBands = mkBands(sig.filter(!isBatch), nPerm, bandSize)
      val batchBands = mkBands(sig.filter(isBatch), nPerm, bandSize)
        .withColumnRenamed("doc_id", "batch_id")
      val cand = corpusBands.join(broadcast(batchBands), Seq("band"))
        .select(col("batch_id"), col("doc_id").as("corpus_id"))
        .distinct()
      val sets = withSh.select(col("doc_id"), col("sh"),
        size(col("sh")).cast("long").as("n"))
      val scored = cand
        .join(sets.select(col("doc_id").as("batch_id"), col("sh").as("sha"),
          col("n").as("na")), "batch_id")
        .join(sets.select(col("doc_id").as("corpus_id"), col("sh").as("shb"),
          col("n").as("nb")), "corpus_id")
        .withColumn("inter",
          size(array_intersect(col("sha"), col("shb"))).cast("long"))
        .select(col("batch_id"), col("corpus_id"),
          round(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")).cast("double"), 4).as("j"))
      // best match per batch doc: jaccard DESC then corpus_id ASC, as
      // one packed max-struct aggregate (corpus_id negated so both
      // components maximize) — no rank window over the candidate set
      val best = scored.groupBy("batch_id")
        .agg(max(struct(col("j"), (-col("corpus_id")).as("neg"))).as("m"))
        .select(col("batch_id").as("doc_id"),
          (-col("m.neg")).as("dup_of"), col("m.j").as("jaccard"))
      val out = d.filter(isBatch).select("doc_id")
        .join(best, Seq("doc_id"), "left")
        .withColumn("is_dup", coalesce(col("jaccard") >= 0.5, lit(false)))
        .orderBy("doc_id")
        .persist()
      out.count()
      withSh.unpersist()
      out
    },
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) >= 3
                    THEN list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                    ELSE [] END)) AS shingle
             FROM tok),
      sig AS (SELECT doc_id,
                min(md5('p0|' || shingle)) AS h0, min(md5('p1|' || shingle)) AS h1,
                min(md5('p2|' || shingle)) AS h2, min(md5('p3|' || shingle)) AS h3,
                min(md5('p4|' || shingle)) AS h4, min(md5('p5|' || shingle)) AS h5,
                min(md5('p6|' || shingle)) AS h6, min(md5('p7|' || shingle)) AS h7,
                min(md5('p8|' || shingle)) AS h8, min(md5('p9|' || shingle)) AS h9,
                min(md5('p10|' || shingle)) AS h10, min(md5('p11|' || shingle)) AS h11
              FROM sh GROUP BY doc_id),
      bands AS (SELECT doc_id, unnest([
                  md5(concat_ws('|', '0', h0, h1, h2)),
                  md5(concat_ws('|', '1', h3, h4, h5)),
                  md5(concat_ws('|', '2', h6, h7, h8)),
                  md5(concat_ws('|', '3', h9, h10, h11))]) AS band
                FROM sig),
      cand AS (SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
               FROM bands b JOIN bands c ON b.band = c.band
               WHERE b.doc_id % 10 = 3 AND c.doc_id % 10 <> 3),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT cd.batch_id, cd.corpus_id, count(*) AS i
                FROM cand cd
                JOIN sh sa ON cd.batch_id = sa.doc_id
                JOIN sh sb ON cd.corpus_id = sb.doc_id AND sa.shingle = sb.shingle
                GROUP BY cd.batch_id, cd.corpus_id),
      scored AS (SELECT c.batch_id, c.corpus_id,
                   round(CAST(coalesce(i.i, 0) AS DOUBLE)
                         / CAST(na.n + nb.n - coalesce(i.i, 0) AS DOUBLE), 4) AS j
                 FROM cand c
                 LEFT JOIN inter i ON c.batch_id = i.batch_id
                                  AND c.corpus_id = i.corpus_id
                 JOIN sizes na ON c.batch_id = na.doc_id
                 JOIN sizes nb ON c.corpus_id = nb.doc_id),
      best AS (SELECT batch_id, corpus_id, j FROM (
                 SELECT batch_id, corpus_id, j,
                        row_number() OVER (PARTITION BY batch_id
                                           ORDER BY j DESC, corpus_id) AS rn
                 FROM scored) t WHERE rn = 1)
      SELECT d.doc_id, b.corpus_id AS dup_of, b.j AS jaccard,
             coalesce(b.j >= 0.5, FALSE) AS is_dup
      FROM documents d LEFT JOIN best b ON d.doc_id = b.batch_id
      WHERE d.doc_id % 10 = 3
      ORDER BY d.doc_id"""),
  )

  // ---------------------------------------------------- duplicate clusters
  /** Near-dup CLUSTERS: LSH pairs (jaccard ≥ 0.5) are edges; connected
    * components ([[graft.operators.ConnectedComponents]], min-label
    * propagation + pointer jumping) collapse chains a↔b↔c into one
    * cluster with the smallest doc_id as canonical — the step that
    * makes pair-wise near-dup detection actually DELETE correctly
    * (keeping one survivor per cluster, not one per pair). Every
    * document gets a row; edge-less documents are their own cluster.
    *
    * The oracle recomputes the same components with a recursive CTE
    * (min reachable id per vertex) — a genuinely independent algorithm,
    * so a propagation bug on the Spark side cannot self-confirm. */
  /** Session-shared component map of the FULL-corpus near-dup graph
    * (jaccard ≥ 0.5 LSH pairs) — the propagation runs once, then
    * `dedup_clusters` and `dedup_canonical_quality` both label against
    * it. Same amortization story as [[survivorComponents]]; entry
    * accounted by `SharedFrames.entryCount` in the storage sweep. */
  private[graft] def clusterComponents(s: SparkSession, dir: String): DataFrame =
    graft.SharedFrames.cachedPrepersisted(s, s"cluster_components:$dir") {
      graft.operators.ConnectedComponents.run(
        minhashPairs(s, dir).filter(col("jaccard") >= 0.5)
          .select("doc_a", "doc_b"),
        "doc_a", "doc_b")
    }

  /** `df` (must carry doc_id) labeled with its near-dup `cluster_id`
    * off the shared full-corpus map; edge-less docs are singletons. */
  private def clusterLabeled(s: SparkSession, dir: String, df: DataFrame): DataFrame = {
    val comp = clusterComponents(s, dir)
      .select(col("id").as("doc_id"), col("comp").as("__cc"))
    df.join(comp, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("__cc"), col("doc_id")))
      .drop("__cc")
  }

  private val dedupClusters = Q(
    "dedup_clusters",
    (s, dir) => {
      val labeled = clusterLabeled(s, dir,
        Tables.documents(s, dir).select("doc_id"))
      labeled
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy("cluster_id")).cast("long"))
        .withColumn("is_canonical", (col("doc_id") === col("cluster_id")).cast("boolean"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE $MINHASH_CTES,
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE jaccard >= 0.5
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs WHERE jaccard >= 0.5),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
      comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)
      SELECT doc_id, cluster_id,
             CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
             (doc_id = cluster_id) AS is_canonical
      FROM (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.id) t
      ORDER BY doc_id"""),
  )

  /** Canonical selection by QUALITY, not by id: within each near-dup
    * cluster keep the LONGEST document (n_chars desc, doc_id
    * tiebreak) — what a curation pipeline actually wants from cluster
    * resolution (the min-id canonical of `dedup_clusters` is
    * deterministic but arbitrary; dropping the longer member throws
    * away content). Same shared pair + component maps; the keep-pick
    * window partitions on cluster_id — high-cardinality, member
    * counts are cluster sizes (single digits), so the single-task
    * stratum hazard does not apply at any scale. */
  private val dedupCanonical = Q(
    "dedup_canonical_quality",
    (s, dir) => {
      val labeled = clusterLabeled(s, dir,
        Tables.documents(s, dir).select("doc_id", "n_chars"))
      val w = Window.partitionBy("cluster_id")
        .orderBy(col("n_chars").desc, col("doc_id"))
      labeled
        .withColumn("keep", row_number().over(w) === 1)
        .select(col("doc_id"), col("cluster_id"), col("n_chars"), col("keep"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE $MINHASH_CTES,
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE jaccard >= 0.5
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs WHERE jaccard >= 0.5),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
      comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
      lab AS (SELECT d.doc_id, d.n_chars,
                     coalesce(c.comp, d.doc_id) AS cluster_id
              FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
      SELECT doc_id, cluster_id, n_chars,
             (row_number() OVER (PARTITION BY cluster_id
                ORDER BY n_chars DESC, doc_id) = 1) AS keep
      FROM lab ORDER BY doc_id"""),
  )

  /** Near-dup edges (jaccard >= 0.5) restricted to surviving
    * endpoints. Restriction loses nothing: LSH candidacy for a pair
    * depends only on the two documents' own signatures, so full-corpus
    * pairs restricted to survivors ARE the pairs among survivors.
    * Shared by corpus_clean_clustered and the training-mix capstone. */
  private def survivorEdges(pairs: DataFrame, surv: DataFrame): DataFrame = {
    val sd = surv.select("doc_id")
    pairs.filter(col("jaccard") >= 0.5)
      .join(sd.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_semi")
      .join(sd.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_semi")
      .select("doc_a", "doc_b")
  }

  /** Session-shared component MAP of the survivor near-dup graph —
    * the min-label propagation runs ONCE per session
    * ([[graft.operators.ConnectedComponents.run]] persists the
    * vertex-sized result and releases its iterative checkpoints), then
    * `corpus_clean_clustered` and BOTH capstone heads reuse it: three
    * consumers, one propagation. Same amortization story as the
    * minhash pair memo; the entry is accounted by
    * `SharedFrames.entryCount` in the storage-hygiene sweep. */
  private[graft] def survivorComponents(s: SparkSession, dir: String): DataFrame =
    graft.SharedFrames.cachedPrepersisted(s, s"survivor_components:$dir") {
      graft.operators.ConnectedComponents.run(
        survivorEdges(minhashPairs(s, dir), corpusSurvivors(s, dir)),
        "doc_a", "doc_b")
    }

  /** Survivors labeled with their cluster id off the shared map
    * (unmatched rows are singleton clusters — their own id). */
  private def labeledSurvivors(s: SparkSession, dir: String): DataFrame = {
    val comp = survivorComponents(s, dir)
      .select(col("id").as("doc_id"), col("comp").as("__cc"))
    corpusSurvivors(s, dir).join(comp, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("__cc"), col("doc_id")))
      .drop("__cc")
  }

  /** The cleaning pipeline with the dedup loop CLOSED: pair-wise
    * near-dup detection under-deletes (a↔b, b↔c must collapse to ONE
    * survivor, but pair-wise rank keeps two) — so the survivors of
    * `corpus_clean` feed their LSH near-dup pairs (Jaccard ≥ 0.5)
    * through connected components and only the cluster canonical (the
    * smallest reachable doc_id) is kept. Edge filtering to surviving
    * endpoints loses nothing: LSH candidacy for a pair depends only on
    * the two documents' own signatures, so full-corpus pairs restricted
    * to survivors ARE the pairs among survivors.
    *
    * Mirrors the reference's cross-record collapse story
    * (`README.md:124`, 47%→98% match accuracy) applied to corpus
    * hygiene; the oracle recomputes components with a recursive CTE —
    * an independent algorithm, so a propagation bug can't self-confirm. */
  private val corpusCleanClustered = Q(
    "corpus_clean_clustered",
    (s, dir) => {
      // labeled off the session-shared component map (one propagation
      // serves this query and both capstone heads)
      val out = labeledSurvivors(s, dir)
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy("cluster_id")).cast("long"))
        .filter(col("doc_id") === col("cluster_id")) // canonical survivor only
        .select(col("doc_id"), col("lang"), col("source"),
          col("quality_score"), col("cluster_size"))
        .orderBy("doc_id")
        .persist()
      // materialize the (small) result; the component map is a shared
      // memo entry, the harness unpersists `out`
      out.count()
      out
    },
    Some(s"""
      WITH RECURSIVE $MINHASH_CTES,
      $CORPUS_CTES,
      $COMP_CTES,
      labeled AS (
        SELECT f.doc_id, f.lang, f.source, f.quality_score,
               coalesce(c.comp, f.doc_id) AS cluster_id
        FROM fpd f LEFT JOIN comp c ON f.doc_id = c.id),
      sized AS (
        SELECT doc_id, lang, source, quality_score, cluster_id,
               CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
        FROM labeled)
      SELECT doc_id, lang, source, quality_score, cluster_size
      FROM sized WHERE doc_id = cluster_id ORDER BY doc_id"""),
  )

  /** Leakage-free train/val/test assignment: the split is decided by a
    * deterministic hash of the near-dup CLUSTER id, not the document
    * id — so a document and all its near-duplicates land in the SAME
    * split by construction. Splitting on doc_id would leak train
    * documents into eval through their near-copies, silently inflating
    * held-out scores; cluster-keyed assignment is how production
    * corpora (and the reference's cross-record identity collapse,
    * `README.md:124`, applied to splits) keep eval honest.
    *
    * 100 TB design: rides the session-shared survivor component map
    * ([[survivorComponents]] — one propagation per session) plus a
    * pure per-row hash; no shuffle beyond the cluster-label join,
    * which co-partitions on doc_id. The 90/5/5 thresholds are hash
    * buckets, so splits are reproducible run-to-run, survive task
    * retries, and a document's fate never changes as the corpus grows
    * (the same determinism contract as `mix_stratified_sample`). */
  private val clusterSplits = Q(
    "mix_cluster_splits",
    (s, dir) => {
      val bucket =
        CurationQueries.mixBucketHash(col("cluster_id")) % lit(100L)
      val out = labeledSurvivors(s, dir)
        .withColumn("split",
          when(bucket < 90L, lit("train"))
            .when(bucket < 95L, lit("val"))
            .otherwise(lit("test")))
        .select("doc_id", "lang", "source", "cluster_id", "split")
        .orderBy("doc_id")
        .persist()
      // materialize off the shared component map; the harness
      // unpersists `out`, the map is a session-accounted memo entry
      out.count()
      out
    },
    Some(s"""
      WITH RECURSIVE $MINHASH_CTES,
      $CORPUS_CTES,
      $COMP_CTES,
      labeled AS (
        SELECT f.doc_id, f.lang, f.source,
               coalesce(c.comp, f.doc_id) AS cluster_id
        FROM fpd f LEFT JOIN comp c ON f.doc_id = c.id)
      SELECT doc_id, lang, source, cluster_id,
             CASE WHEN ${CurationQueries.mixBucketHashSql("cluster_id")} % 100 < 90 THEN 'train'
                  WHEN ${CurationQueries.mixBucketHashSql("cluster_id")} % 100 < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM labeled ORDER BY doc_id"""),
  )

  /** Dedup observability report — per source: raw docs, survivors of
    * the clean+exact+fingerprint stage, canonical count after near-dup
    * clustering, docs sitting inside multi-doc clusters, and the
    * overall dedup rate. The pipeline-health dashboard every curation
    * run is judged by ("which crawl source is 40% duplicates?"), and
    * the observability face of machinery that is otherwise only
    * consumed by downstream stages. A cluster spanning two sources
    * counts toward each source's canonical tally (per-source view of a
    * global cluster — documented, mirrored by the oracle).
    *
    * Shape: rides the session-shared survivor component map (built
    * once per session); everything above it is counts collapsing
    * map-side to source cardinality; dedup rate is ONE double
    * division. */
  private val dedupReport = Q(
    "dedup_report",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
      val clusterSizes = labeledSurvivors(s, dir)
        .groupBy("source", "cluster_id").agg(count(lit(1)).as("sz"))
      val stats = clusterSizes.groupBy("source").agg(
        sum(col("sz")).as("n_survivors"),
        count(lit(1)).as("n_canonical"),
        sum(when(col("sz") >= 2, col("sz")).otherwise(0L)).as("n_near_dup_docs"))
      docs.join(stats, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_survivors"), lit(0L)).as("n_survivors"),
          coalesce(col("n_canonical"), lit(0L)).as("n_canonical"),
          coalesce(col("n_near_dup_docs"), lit(0L)).as("n_near_dup_docs"),
          (lit(1.0) - coalesce(col("n_canonical"), lit(0L)).cast("double") /
            col("n_docs").cast("double")).as("dedup_rate"))
        .orderBy("source")
    },
    Some(s"""
      WITH RECURSIVE $MINHASH_CTES,
      $CORPUS_CTES,
      $COMP_CTES,
      labeled AS (
        SELECT f.doc_id, f.source, coalesce(c.comp, f.doc_id) AS cluster_id
        FROM fpd f LEFT JOIN comp c ON f.doc_id = c.id),
      cs AS (SELECT source, cluster_id, count(*) AS sz
             FROM labeled GROUP BY 1, 2),
      st AS (SELECT source,
                    CAST(sum(sz) AS BIGINT) AS n_survivors,
                    CAST(count(*) AS BIGINT) AS n_canonical,
                    CAST(sum(CASE WHEN sz >= 2 THEN sz ELSE 0 END) AS BIGINT)
                      AS n_near_dup_docs
             FROM cs GROUP BY 1),
      d AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
      SELECT d.source, d.n_docs,
             CAST(coalesce(st.n_survivors, 0) AS BIGINT) AS n_survivors,
             CAST(coalesce(st.n_canonical, 0) AS BIGINT) AS n_canonical,
             CAST(coalesce(st.n_near_dup_docs, 0) AS BIGINT) AS n_near_dup_docs,
             1.0 - CAST(coalesce(st.n_canonical, 0) AS DOUBLE)
                   / CAST(d.n_docs AS DOUBLE) AS dedup_rate
      FROM d LEFT JOIN st USING (source)
      ORDER BY source"""),
  )

  // ----------------------------------------------------- training mix
  /** The CAPSTONE pipeline — everything between a raw crawl and a
    * training-ready token stream, composed as ONE declarative plan:
    *
    *   clean (lang + quality + exact + fingerprint dedup, the shared
    *   survivor stage) → cluster-dedup (LSH pairs → connected
    *   components, canonical per cluster) → decontaminate (broadcast
    *   benchmark shingle dictionary, eval slice excluded) → stratified
    *   sample (deterministic hash, per-source) → token budget (greedy
    *   quality-ordered prefix per source) → context-window chunks.
    *
    *   Every stage is the already-oracle-checked operator applied
    *   unchanged; what this query adds — and checks — is their
    *   COMPOSITION: the same doc survives or dies through six stages
    *   in both engines, down to the final chunk text. Scale shape is
    *   the sum of the parts: the only corpus-sized shuffles are the
    *   survivor dedups and the budget stage's two-phase prefix sum
    *   ([[graft.operators.PrefixSum]] — bounded tasks even with one
    *   hot source); clusters, decontamination and sampling ride joins
    *   that are bucketed, broadcast, or filter-only. */
  /** Oracle CTE chain replaying capstone stages 1-6 (dedup survivors →
    * components → canon → decontamination → sample → budget → chunk
    * `starts`) — ONE spelling shared by both capstone heads, mirroring
    * [[trainingChunkStage]] on the Spark side. Must be preceded by
    * `WITH RECURSIVE $MINHASH_CTES, $CORPUS_CTES,`. */
  private val TRAINING_CTES = s"""$COMP_CTES,
      canon AS (
        SELECT f.doc_id, f.source, f.quality_score, f.text
        FROM fpd f LEFT JOIN comp c ON f.doc_id = c.id
        WHERE coalesce(c.comp, f.doc_id) = f.doc_id),
      tok4 AS (SELECT doc_id, string_split(text, ' ') AS t4 FROM documents),
      sh4 AS (SELECT doc_id, list_distinct(
                CASE WHEN len(t4) >= 4
                     THEN list_transform(range(1, len(t4) - 2),
                            i -> t4[i] || ' ' || t4[i+1] || ' ' || t4[i+2] || ' ' || t4[i+3])
                     ELSE [] END) AS shl
              FROM tok4),
      bench AS (SELECT DISTINCT unnest(shl) AS shingle FROM sh4
                WHERE ${CurationQueries.BenchPred}),
      hits AS (SELECT e.doc_id, count(*) AS n_hit
               FROM (SELECT doc_id, unnest(shl) AS shingle FROM sh4
                     WHERE NOT (${CurationQueries.BenchPred})) e
               JOIN bench USING (shingle) GROUP BY e.doc_id),
      cleand AS (
        SELECT c.* FROM canon c
        JOIN sh4 s ON c.doc_id = s.doc_id
        LEFT JOIN hits h ON c.doc_id = h.doc_id
        WHERE NOT (${CurationQueries.benchPred("c.doc_id")})
          AND coalesce(round(CAST(coalesce(h.n_hit, 0) AS DOUBLE)
                             / nullif(len(s.shl), 0), 4), 0.0) < 0.2),
      sampled AS (
        SELECT * FROM cleand
        WHERE ${CurationQueries.mixBucketHashSql("doc_id")} % 100 < 60),
      budgeted AS (
        SELECT doc_id, source, text, token_cnt FROM (
          SELECT doc_id, source, text, quality_score,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS token_cnt,
                 CAST(sum(len(string_split(text, ' '))) OVER (
                   PARTITION BY source
                   ORDER BY quality_score DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM sampled) t
        WHERE cum <= 800),
      chunkbase AS (
        SELECT doc_id, source, string_split(text, ' ') AS t, token_cnt AS n
        FROM budgeted),
      starts AS (
        SELECT doc_id, source, t, n, CAST(u.s AS BIGINT) AS chunk_start
        FROM chunkbase, unnest(range(0, CAST(n AS INT), ${CurationQueries.ChunkStride})) u(s))"""

  /** Stages 1-6 of the capstone (clean → cluster → decontaminate →
    * sample → budget → chunk) — ONE implementation shared by
    * `corpus_training_mix` and `corpus_training_tokens`, so the two
    * capstone heads can never drift. Returns the chunk frame
    * (pre-sort); cluster labels come from the session-shared
    * [[survivorComponents]] map, so there is nothing per-call to
    * release. */
  private[graft] def trainingChunkStage(s: SparkSession, dir: String): DataFrame =
    // session-shared: BOTH capstone heads (corpus_training_mix and
    // corpus_training_tokens) consume the identical six-stage chunk
    // frame — and its size is bounded by the per-source token budget,
    // so the memo is batch-sized, not corpus-sized
    graft.SharedFrames.cached(s, s"training_chunks:$dir") {
      trainingChunkStageUncached(s, dir)
    }

  private def trainingChunkStageUncached(s: SparkSession, dir: String): DataFrame = {
    // canon set off the session-shared component map (one propagation
    // serves corpus_clean_clustered and both capstone heads)
    val canon = labeledSurvivors(s, dir)
      .filter(col("doc_id") === col("cluster_id"))
      .select("doc_id", "source", "quality_score")
    val d = Tables.documents(s, dir)
    val withText = canon.join(d.select("doc_id", "text"), Seq("doc_id"))
    // decontamination — the SAME stage as decontam_overlap
    // (CurationQueries.benchOverlapStats), applied to the canon set;
    // the stats frame covers exactly the non-bench docs, so the inner
    // join also drops the eval slice from training
    val contam = CurationQueries.benchOverlapStats(d)
      .select("doc_id", "contam_ratio")
    val cleanDocs = withText
      .join(contam, Seq("doc_id"))
      .filter(col("contam_ratio") < 0.2)
    // deterministic stratified sample, then the per-source token budget
    val sampled = cleanDocs.filter(
      CurationQueries.mixBucketHash(col("doc_id")) % lit(100L) < 60)
    // two-phase prefix sum, not Window.partitionBy(source): a hot
    // source must not serialize into one task (see PrefixSum)
    val budgeted = graft.operators.PrefixSum.runningSum(
        sampled.withColumn("token_cnt", TextFunctions.tokenCount(col("text"))),
        Seq("source"), Seq(col("quality_score").desc, col("doc_id")),
        col("token_cnt"), "cum")
      .filter(col("cum") <= 800)
    // context-window chunks — the SAME stage as corpus_chunks
    CurationQueries.chunkExplode(budgeted, Seq("doc_id", "source"))
  }

  private val trainingMix = Q(
    "corpus_training_mix",
    (s, dir) => {
      val out = trainingChunkStage(s, dir)
        .orderBy("doc_id", "chunk_idx").persist()
      out.count()
      out
    },
    Some(s"""
      WITH RECURSIVE $MINHASH_CTES,
      $CORPUS_CTES,
      $TRAINING_CTES
      SELECT doc_id, source,
             chunk_start // ${CurationQueries.ChunkStride} AS chunk_idx,
             chunk_start,
             least(${CurationQueries.ChunkSize}, n - chunk_start) AS chunk_len,
             array_to_string(
               list_slice(t, CAST(chunk_start + 1 AS INT),
                 CAST(least(chunk_start + ${CurationQueries.ChunkSize}, n) AS INT)), ' ') AS chunk_text
      FROM starts
      ORDER BY doc_id, chunk_idx"""),
  )

  /** The capstone extended to MODEL-READY token streams — stages 7+8 on
    * top of [[trainingChunkStage]]: the selected context-window chunks
    * are packed into fixed [[CurationQueries.SeqLen]]-token training
    * sequences per source (the `mix_pack_emit` geometry with chunks as
    * the units) and every sequence is numericalized against the
    * `corpus_vocab` vocabulary (broadcast id join, OOV → -1). One
    * declarative plan from raw crawl to the id streams a trainer
    * consumes — eight stages, each individually oracle-proven, their
    * COMPOSITION replayed end-to-end in DuckDB.
    *
    * 100 TB design: the sum of the proven parts — the chunk assignment
    * rides [[graft.operators.PrefixSum]] (bounded tasks; chunk text
    * rides along rather than re-running the six-stage pipeline for a
    * join-back), piece slicing is column arithmetic on the scan side,
    * the K-row vocabulary broadcasts, and ONE `(source, seq_id)`
    * regroup both assembles each sequence and orders its token ids —
    * pack and encode merged so the bytes cross a single exchange, not
    * one per stage. Per-task state is one sequence (≤ SeqLen ids). */
  private val trainingTokens = Q(
    "corpus_training_tokens",
    (s, dir) => {
      val L = CurationQueries.SeqLen
      val chunks = trainingChunkStage(s, dir)
      val asg = graft.operators.PrefixSum.runningSum(
          chunks.select(col("doc_id"), col("source"), col("chunk_idx"),
            col("chunk_len"), col("chunk_text")),
          Seq("source"), Seq(col("doc_id"), col("chunk_idx")),
          col("chunk_len"), "cum_end")
        .withColumn("cum_start", col("cum_end") - col("chunk_len"))
      val pieces = asg
        .withColumn("seq_id", explode(sequence(
          (col("cum_start") / L).cast("long"),
          ((col("cum_end") - 1) / L).cast("long"))))
        .withColumn("pst", greatest(col("seq_id") * L - col("cum_start"), lit(0L)))
        .withColumn("pen",
          least(col("chunk_len"), (col("seq_id") + 1) * L - col("cum_start")))
        .withColumn("soff", greatest(col("cum_start") - col("seq_id") * L, lit(0L)))
      val toks = pieces
        .select(col("source"), col("seq_id"), col("soff"),
          posexplode(slice(TextFunctions.tokens(col("chunk_text")),
            (col("pst") + 1).cast("int"), (col("pen") - col("pst")).cast("int")))
            .as(Seq("pos", "token")))
        .withColumn("gpos", col("soff") + col("pos"))
      val enc = toks
        .join(broadcast(
          CurationQueries.vocabFrame(s, dir).select("token", "token_id")),
          Seq("token"), "left")
        .withColumn("tid", coalesce(col("token_id"), lit(-1L)))
      val out = enc.groupBy("source", "seq_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("tid") === -1L, 1L).otherwise(0L)).as("n_oov"),
          array_join(
            sort_array(collect_list(struct(col("gpos"), col("tid"))))
              .getField("tid").cast("array<string>"), " ").as("ids_str"))
        .orderBy("source", "seq_id")
        .persist()
      out.count()
      out
    },
    Some(s"""
      WITH RECURSIVE $MINHASH_CTES,
      $CORPUS_CTES,
      ${CurationQueries.VOCAB_CTE},
      $TRAINING_CTES,
      chunks2 AS (
        SELECT doc_id, source,
               chunk_start // ${CurationQueries.ChunkStride} AS chunk_idx,
               least(${CurationQueries.ChunkSize}, n - chunk_start) AS clen,
               list_slice(t, CAST(chunk_start + 1 AS INT),
                 CAST(least(chunk_start + ${CurationQueries.ChunkSize}, n) AS INT)) AS ct
        FROM starts),
      pasg AS (
        SELECT source, doc_id, chunk_idx, clen, ct,
               CAST(sum(clen) OVER (PARTITION BY source
                 ORDER BY doc_id, chunk_idx
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
        FROM chunks2),
      pasg2 AS (SELECT *, cum_end - clen AS cum_start FROM pasg),
      pieces AS (
        SELECT source, CAST(u.q AS BIGINT) AS seq_id, cum_start, ct,
               greatest(u.q * ${CurationQueries.SeqLen} - cum_start, 0) AS pst,
               least(clen, (u.q + 1) * ${CurationQueries.SeqLen} - cum_start) AS pen,
               greatest(cum_start - u.q * ${CurationQueries.SeqLen}, 0) AS soff
        FROM pasg2, unnest(range(cum_start // ${CurationQueries.SeqLen},
                                 (cum_end - 1) // ${CurationQueries.SeqLen} + 1)) u(q)),
      ptok AS (
        SELECT source, seq_id, soff + u.i - 1 AS gpos,
               ct[CAST(pst + u.i AS INT)] AS token
        FROM pieces, unnest(range(1, pen - pst + 1)) u(i)),
      penc AS (
        SELECT p.source, p.seq_id, p.gpos, coalesce(v.token_id, -1) AS tid
        FROM ptok p LEFT JOIN vocab v USING (token))
      SELECT source, seq_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY gpos) AS ids_str
      FROM penc GROUP BY source, seq_id ORDER BY source, seq_id"""),
  )

  // ------------------------------------------------------ n-gram Jaccard
  /** N-gram Jaccard near-dup: candidate pairs share at least one RARE
    * 4-shingle (document frequency ≤ 10), then exact shingle Jaccard ≥
    * 0.5 on candidates only.
    *
    * 100 TB story: the df-filter is the scale valve — joining on raw
    * shingles explodes on stop-phrase postings (a shingle shared by 1M
    * docs creates 10^12 pairs), but near-dups by definition share rare
    * shingles, so dropping hot shingles from CANDIDATE GENERATION loses
    * no true pairs above threshold while bounding the self-join to
    * df² ≤ 100 per surviving shingle. The exact Jaccard still uses all
    * shingles. */
  private val ngramJaccard = Q(
    "dedup_ngram_jaccard",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      // Persisted for the same multi-consumer reason as dedup_minhash_lsh:
      // the shingle-set table feeds the df-filter (via explode), both
      // candidate self-join sides, and the pair intersection.
      val withSh = d
        .select(col("doc_id"), TextFunctions.shingles(col("text"), 4).as("sh"))
        .filter(size(col("sh")) > 0)
        .persist()
      // Candidate generation shuffles 8-byte shingle HASHES, never the
      // ~30-byte shingle strings (guide §2.3 "shuffle keys and metadata
      // instead of payloads"): the df-count exchange, the df-filter
      // join and the candidate self-join all key on xxhash64(shingle).
      // Equivalence: exact unless two DISTINCT shingles of this corpus
      // collide in 64 bits (~n²/2⁶⁵ ≈ 10⁻⁸ at sf0.1) — and the exact
      // Jaccard below still compares full shingle SETS, so a collision
      // could only add/drop a CANDIDATE, never misscore a pair;
      // ShingleHashSpec pins collision-freedom on the shipped corpus
      // and the differential oracle re-proves the full result.
      val sh = withSh.select(col("doc_id"), explode(col("sh")).as("shingle"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
      val rare = sh.join(
        sh.groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") <= 10).select("h"),
        "h")
        .persist()
      val cand = rare.as("a").join(rare.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      // Exact Jaccard via in-row array_intersect on candidate pairs only
      // (the exploded table above exists just for the df-filter and
      // candidate generation).
      val sets = withSh.select(col("doc_id"), col("sh"),
        size(col("sh")).cast("long").as("n"))
      val out = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sha"),
          col("n").as("na")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("shb"),
          col("n").as("nb")), "doc_b")
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
        .select(col("doc_a"), col("doc_b"),
          round(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")).cast("double"), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
        .persist()
      // same cache-scoping as dedup_minhash_lsh: keep the small result,
      // release the corpus-sized shingle/rare tables
      out.count()
      withSh.unpersist()
      rare.unpersist()
      out
    },
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) >= 4
                    THEN list_transform(range(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
                    ELSE [] END)) AS shingle
             FROM tok),
      rare AS (SELECT sh.doc_id, sh.shingle FROM sh
               JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 10) r
               USING (shingle)),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
                FROM cand c
                JOIN sh sa ON c.doc_a = sa.doc_id
                JOIN sh sb ON c.doc_b = sb.doc_id AND sa.shingle = sb.shingle
                GROUP BY c.doc_a, c.doc_b)
      SELECT c.doc_a, c.doc_b,
             round(CAST(i.inter AS DOUBLE) / CAST(na.n + nb.n - i.inter AS DOUBLE), 4) AS jaccard
      FROM cand c
      JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
      JOIN sizes na ON c.doc_a = na.doc_id
      JOIN sizes nb ON c.doc_b = nb.doc_id
      WHERE round(CAST(i.inter AS DOUBLE) / CAST(na.n + nb.n - i.inter AS DOUBLE), 4) >= 0.5
      ORDER BY c.doc_a, c.doc_b"""),
  )

  /** EXACT-COMPLETE set-similarity self-join via PPJoin/AllPairs-style
    * PREFIX FILTERING (Bayardo et al. 2007; Xiao et al. 2008) — the
    * provably lossless upgrade of `dedup_ngram_jaccard`'s df-valve:
    * the valve drops hot shingles from candidate generation, which is
    * complete only while every true pair still shares a RARE shingle —
    * eleven copies of one document push every shared shingle's df past
    * any fixed cutoff and the whole cluster silently vanishes. Prefix
    * filtering keeps the candidate join bounded WITHOUT that failure
    * mode: order shingles by a global (df ASC, shingle) total order;
    * each document emits only its first `n − ceil(t·n) + 1` shingles
    * as candidate keys. If J(a,b) ≥ t, the globally-smallest common
    * shingle is provably inside BOTH prefixes (were it outside a's,
    * all |a∩b| ≥ t·n_a common shingles would sit in a suffix of size
    * ceil(t·n_a) − 1 < t·n_a), so joining prefix-to-prefix misses
    * nothing; hot shingles sort LAST and rarely enter any prefix, so
    * the df² blowup they cause under a raw inverted-index join never
    * materializes.
    *
    * 100 TB shape: one corpus exchange on shingle (df join), a per-doc
    * rank window (groups = one document's shingles — bounded by doc
    * length, never a stratum), the prefix self-join, exact in-row
    * Jaccard on survivors. The oracle is the UNfiltered complete
    * inverted-index join — the differential gate is literally checking
    * that prefix filtering lost nothing. */
  private val jaccardPrefix = Q(
    "dedup_jaccard_prefix",
    (s, dir) => {
      val t = 0.5
      val withSh = Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.shingles(col("text"), 4).as("sh"))
        .filter(size(col("sh")) > 0)
        .persist()
      val sh = withSh.select(col("doc_id"), explode(col("sh")).as("shingle"))
      val dfTab = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("df").asc, col("shingle").asc)
      val pref = sh.join(dfTab, "shingle")
        .withColumn("rnk", row_number().over(w))
        .join(withSh.select(col("doc_id"), size(col("sh")).cast("long").as("n")),
          "doc_id")
        .filter(col("rnk") <= col("n") - ceil(lit(t) * col("n")) + 1)
        .select("doc_id", "shingle", "n")
        .persist()
      // PPJoin's LENGTH filter rides the candidate join: J ≥ t bounds
      // the size ratio (J ≤ min/max), so pairs with t·max(n) > min(n)
      // can be dropped before the distinct — a pure candidate pruner,
      // never a correctness lever (the complete oracle still checks)
      val cand = pref.as("a").join(pref.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id")
          && lit(t) * greatest(col("a.n"), col("b.n")) <=
            least(col("a.n"), col("b.n")).cast("double"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val sets = withSh.select(col("doc_id"), col("sh"),
        size(col("sh")).cast("long").as("n"))
      val out = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sha"),
          col("n").as("na")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("shb"),
          col("n").as("nb")), "doc_b")
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
        .select(col("doc_a"), col("doc_b"),
          round(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")).cast("double"), 4).as("jaccard"))
        .filter(col("jaccard") >= t)
        .orderBy("doc_a", "doc_b")
        .persist()
      out.count() // keep the pair result, release the corpus-sized tables
      withSh.unpersist()
      pref.unpersist()
      out
    },
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) >= 4
                    THEN list_transform(range(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
                    ELSE [] END)) AS shingle
             FROM tok),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
                FROM cand c
                JOIN sh sa ON c.doc_a = sa.doc_id
                JOIN sh sb ON c.doc_b = sb.doc_id AND sa.shingle = sb.shingle
                GROUP BY c.doc_a, c.doc_b)
      SELECT c.doc_a, c.doc_b,
             round(CAST(i.inter AS DOUBLE) / CAST(na.n + nb.n - i.inter AS DOUBLE), 4) AS jaccard
      FROM cand c
      JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
      JOIN sizes na ON c.doc_a = na.doc_id
      JOIN sizes nb ON c.doc_b = nb.doc_id
      WHERE round(CAST(i.inter AS DOUBLE) / CAST(na.n + nb.n - i.inter AS DOUBLE), 4) >= 0.5
      ORDER BY c.doc_a, c.doc_b"""),
  )

  // -------------------------------------------------------------- SimHash
  /** SimHash near-dup signature: 16 bits, bit b = majority of the high
    * bit of md5 hex digit b+1 over the distinct token set. Identical
    * signatures → near-dup cluster. Portable (pure md5/substr), no
    * bit-twiddling that differs across engines. */
  private val simhash = Q(
    "dedup_simhash",
    (s, dir) => {
      val bits = 16
      val tok = Tables.documents(s, dir).select(col("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col("text")))).as("w"))
      // md5 is hoisted to ONE column per token: the bit projection then
      // reads 16 one-char substrings of it instead of re-deriving the
      // digest per bit (the plan's cost is explicit, not delegated to
      // common-subexpression elimination). A lowercase hex digit has its
      // high bit set iff it sorts >= '8' ('8','9' < 'a'..'f' in ASCII),
      // which is the oracle's strpos('89abcdef', d) > 0 in one compare.
      val hashed = tok.select(col("doc_id"), md5(col("w")).as("h"))
      val withBits = hashed.select(col("doc_id") +:
        (0 until bits).map { b =>
          (substring(col("h"), b + 1, 1) >= "8").cast("long").as(s"b$b")
        }: _*)
      val agg = withBits.groupBy("doc_id").agg(
        count(lit(1)).as("n"),
        (0 until bits).map(b => sum(col(s"b$b")).as(s"ones$b")): _*)
      val sim = agg.select(col("doc_id"),
        (0 until bits).map { b =>
          when(col(s"ones$b") * 2 >= col("n"), lit(1L << b)).otherwise(lit(0L))
        }.reduce(_ + _).as("simhash"))
      sim.withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("simhash")).cast("long"))
        .orderBy("doc_id")
    },
    Some("""
      WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
                   FROM documents),
      bits AS (SELECT doc_id, md5(w) AS h FROM tok),
      agg AS (SELECT doc_id, count(*) AS n,
        """ + (0 until 16).map(b =>
          s"sum(CASE WHEN strpos('89abcdef', substr(h, ${b + 1}, 1)) > 0 THEN 1 ELSE 0 END) AS ones$b")
          .mkString(",\n        ") + """
        FROM bits GROUP BY doc_id),
      sim AS (SELECT doc_id,
        """ + (0 until 16).map(b =>
          s"(CASE WHEN ones$b * 2 >= n THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)")
          .mkString(" +\n        ") + """ AS simhash
        FROM agg)
      SELECT doc_id, simhash,
             CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT) AS cluster_size
      FROM sim ORDER BY doc_id"""),
  )

  // ------------------------------------------------------------ ANN top-k
  /** Brute-force cosine top-k against a fixed query vector (vec_id 0).
    * Components are quantized to 1e-6 integers (floor) so the dot
    * product is exact 64-bit arithmetic — order-independent and
    * bit-identical in any engine; only the final score is a double.
    * This is the correctness baseline; `ext.Similarity` holds the fast
    * double-precision production path and the LSH-bucketed scale path.
    */
  /** Shared exact-quantized cosine frame: `(vec_id, cosine)` of every
    * vector ≠ 0 against the fixed query vector (vec_id 0), unordered.
    * Components floor-quantized to 1e-6 integers so the dot product is
    * exact 64-bit arithmetic; only the final score is a double. */
  private def cosineFrame(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")))
      .toDF("vec_id", "pos", "x")
      .withColumn("xq", floor(col("x").cast("double") * lit(1000000.0)).cast("long"))
    val qv = e.filter(col("vec_id") === 0).select(col("pos"), col("xq").as("qq"))
    val qn = qv.agg(sum(col("qq") * col("qq")).as("qnorm2"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(qv), "pos")
      .groupBy("vec_id")
      .agg(sum(col("xq") * col("qq")).as("dot"), sum(col("xq") * col("xq")).as("norm2"))
      .crossJoin(broadcast(qn))
      .select(col("vec_id"),
        round(col("dot").cast("double") /
          (sqrt(col("norm2").cast("double")) * sqrt(col("qnorm2").cast("double"))), 6)
          .as("cosine"))
  }

  /** Shared cosine oracle CTE chain ending in `cos_scored(vec_id,
    * cosine)` — the textual twin of [[cosineFrame]]. */
  private val cosineOracleCtes: String = """e AS (
        SELECT vec_id, unnest(range(0, len(embedding))) AS pos, unnest(embedding) AS x
        FROM embeddings),
      eq AS (SELECT vec_id, pos, CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS xq FROM e),
      q AS (SELECT pos, xq AS qq FROM eq WHERE vec_id = 0),
      qn AS (SELECT sum(qq * qq) AS qnorm2 FROM q),
      cos_scored AS (
        SELECT vec_id,
               round(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(qnorm2 AS DOUBLE))), 6) AS cosine
        FROM (SELECT vec_id, sum(xq * qq) AS dot, sum(xq * xq) AS norm2
              FROM eq JOIN q USING (pos) WHERE vec_id <> 0 GROUP BY vec_id) d, qn)"""

  private val annTopK = Q(
    "ann_cosine_topk",
    (s, dir) => cosineFrame(s, dir)
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10),
    Some(s"""
      WITH $cosineOracleCtes
      SELECT vec_id, cosine FROM cos_scored
      ORDER BY cosine DESC, vec_id LIMIT 10"""),
  )

  // --------------------------------------------- hard-negative mining
  /** Negatives per anchor, and the deterministic anchor slice (the
    * "mini-batch" being mined — every 100th vector). */
  private val HardNegK = 5

  /** Hard-negative mining for contrastive training — for each anchor
    * vector, the top-k most-cosine-similar vectors with a DIFFERENT
    * label: the negatives that sit closest to the decision boundary,
    * which is what a contrastive/triplet objective actually needs
    * (random negatives are trivially separable and contribute ~zero
    * gradient). The anchor slice stands in for the training mini-batch;
    * candidates are the rest of the corpus, same-label candidates are
    * excluded BEFORE ranking.
    *
    * Exactness: the [[cosineFrame]] discipline — components floor-
    * quantized to 1e-6 integers so every dot/norm is exact 64-bit
    * arithmetic; only the final score is a double, rounded to 6 dp,
    * with vec_id the total tiebreak.
    *
    * 100 TB design: this is the exact brute-force baseline (the
    * `ann_cosine_topk` doctrine — `ext.Similarity`'s IVF bucket path is
    * the scale route for the candidate side): the anchor batch
    * BROADCASTS into one candidate scan, the per-(anchor, candidate)
    * dot-product aggregate collapses map-side, the candidate label
    * rides the aggregate keys (functionally dependent on vec_id — no
    * corpus rejoin), and per-anchor top-k is the k-bounded
    * [[graft.operators.TopKPerGroup]] heap (k·mappers rows per anchor
    * cross the shuffle, never a per-anchor rank-window task); winner
    * labels re-attach by broadcasting the k·anchors winner set back to
    * the narrow label column, per the heap's narrow-payload doctrine. */
  private val hardNegatives = Q(
    "emb_hard_negatives",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val e = emb.select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .toDF("vec_id", "label", "pos", "x")
        .withColumn("xq", floor(col("x").cast("double") * lit(1000000.0)).cast("long"))
      val isAnchor = col("vec_id") % 100 === 0
      val anchors = e.filter(isAnchor)
        .select(col("vec_id").as("anchor_id"), col("pos"), col("xq").as("aq"))
      val aNorm = anchors.groupBy("anchor_id")
        .agg(sum(col("aq") * col("aq")).as("anorm2"))
      val aLab = emb.filter(isAnchor)
        .select(col("vec_id").as("anchor_id"), col("label").as("anchor_label"))
      val scored = e.filter(!isAnchor)
        .join(broadcast(anchors), "pos")
        .groupBy("anchor_id", "vec_id", "label")
        .agg(sum(col("xq") * col("aq")).as("dot"),
          sum(col("xq") * col("xq")).as("norm2"))
        .join(broadcast(aNorm), "anchor_id")
        .join(broadcast(aLab), "anchor_id")
        .filter(col("label") =!= col("anchor_label"))
        .select(col("anchor_id"), col("anchor_label"), col("vec_id"),
          round(col("dot").cast("double") /
            (sqrt(col("norm2").cast("double")) * sqrt(col("anorm2").cast("double"))),
            6).as("cosine"))
      val winners = scored.groupBy("anchor_id", "anchor_label")
        .agg(graft.operators.TopKPerGroup.topK(HardNegK)(
          col("cosine"), col("vec_id")).as("top"))
        .select(col("anchor_id"), col("anchor_label"), posexplode(col("top")))
        .select(col("anchor_id"), col("anchor_label"),
          (col("pos") + 1).cast("long").as("neg_rank"),
          col("col._2").as("vec_id"), col("col._1").as("cosine"))
      emb.select(col("vec_id"), col("label"))
        .join(broadcast(winners), "vec_id")
        .select(col("anchor_id"), col("anchor_label"), col("neg_rank"),
          col("vec_id"), col("label"), col("cosine"))
        .orderBy("anchor_id", "neg_rank")
    },
    Some(s"""
      WITH e AS (
        SELECT vec_id, label, unnest(range(0, len(embedding))) AS pos,
               unnest(embedding) AS x
        FROM embeddings),
      eq AS (SELECT vec_id, label, pos,
                    CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS xq
             FROM e),
      a AS (SELECT vec_id AS anchor_id, pos, xq AS aq FROM eq
            WHERE vec_id % 100 = 0),
      an AS (SELECT anchor_id, sum(aq * aq) AS anorm2 FROM a GROUP BY 1),
      al AS (SELECT vec_id AS anchor_id, label AS anchor_label
             FROM embeddings WHERE vec_id % 100 = 0),
      s AS (SELECT a.anchor_id, c.vec_id, c.label,
                   sum(c.xq * a.aq) AS dot, sum(c.xq * c.xq) AS norm2
            FROM eq c JOIN a USING (pos)
            WHERE c.vec_id % 100 <> 0 GROUP BY 1, 2, 3),
      sc AS (SELECT s.anchor_id, al.anchor_label, s.vec_id, s.label,
                    round(CAST(dot AS DOUBLE)
                      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(anorm2 AS DOUBLE))),
                      6) AS cosine
             FROM s JOIN an USING (anchor_id) JOIN al USING (anchor_id)
             WHERE s.label <> al.anchor_label),
      r AS (SELECT anchor_id, anchor_label, vec_id, label, cosine,
                   row_number() OVER (PARTITION BY anchor_id
                     ORDER BY cosine DESC, vec_id) AS rn
            FROM sc)
      SELECT anchor_id, anchor_label, CAST(rn AS BIGINT) AS neg_rank,
             vec_id, label, cosine
      FROM r WHERE rn <= $HardNegK ORDER BY anchor_id, neg_rank"""),
  )

  // ------------------------------------------------- hybrid retrieval
  /** RRF constant (Cormack & Clarke's k = 60) and per-ranker candidate
    * pool size. */
  private val RrfK = 60.0
  private val RagPoolK = 100
  private val RagTopK = 20

  /** Hybrid retrieval — Reciprocal Rank Fusion of the lexical (BM25)
    * and semantic (cosine) rankings: each ranker contributes
    * 1/(60 + rank) for its top-100 candidates, candidates outside a
    * pool contribute 0, and the fused top-20 is the answer the RAG
    * serving layer returns. The classic two-tower retrieval pattern —
    * both towers are the already-oracle-proven scorers REUSED verbatim
    * ([[bm25Frame]], [[cosineFrame]]), so this query checks the
    * composition.
    *
    * 100 TB design: each pool is `orderBy().limit(K)` —
    * TakeOrderedAndProject (per-partition heaps + a K-row driver
    * merge), never a global sort; the rank window then runs over K
    * METADATA rows (same discipline as `corpus_vocab`'s K-row rank),
    * and the fusion join touches ≤ 2K rows. Zero corpus-sized shuffles
    * beyond what the two scorers already pay.
    *
    * Determinism: ranks are integers from total orders on already-
    * deterministic rounded scores; each RRF term is ONE correctly-
    * rounded division 1/(60+rank) and the fused score one sum of two
    * such doubles — identical in any IEEE engine. */
  private val ragHybrid = Q(
    "rag_hybrid_topk",
    (s, dir) => {
      val bmPool = bm25Frame(s, dir).select("doc_id", "bm25")
        .orderBy(col("bm25").desc, col("doc_id")).limit(RagPoolK)
        .withColumn("bm25_rank", row_number()
          .over(Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
      val cosPool = cosineFrame(s, dir)
        .orderBy(col("cosine").desc, col("vec_id")).limit(RagPoolK)
        .withColumn("cos_rank", row_number()
          .over(Window.orderBy(col("cosine").desc, col("vec_id"))).cast("long"))
      def rrfTerm(rank: Column): Column =
        when(rank.isNotNull, lit(1.0) / (lit(RrfK) + rank.cast("double")))
          .otherwise(lit(0.0))
      bmPool.join(cosPool, col("doc_id") === col("vec_id"), "full_outer")
        .select(coalesce(col("doc_id"), col("vec_id")).as("id"),
          col("bm25"), col("bm25_rank"), col("cosine"), col("cos_rank"),
          (rrfTerm(col("bm25_rank")) + rrfTerm(col("cos_rank"))).as("rrf"))
        .orderBy(col("rrf").desc, col("id"))
        .limit(RagTopK)
    },
    Some(s"""
      WITH $bm25OracleCtes,
      $cosineOracleCtes,
      bm AS (SELECT doc_id, bm25,
                    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS bm25_rank
             FROM bm25_scored ORDER BY bm25 DESC, doc_id LIMIT $RagPoolK),
      cs AS (SELECT vec_id, cosine,
                    row_number() OVER (ORDER BY cosine DESC, vec_id) AS cos_rank
             FROM cos_scored ORDER BY cosine DESC, vec_id LIMIT $RagPoolK),
      f AS (SELECT coalesce(bm.doc_id, cs.vec_id) AS id,
                   bm.bm25, bm.bm25_rank, cs.cosine, cs.cos_rank,
                   coalesce(1.0 / ($RrfK + CAST(bm25_rank AS DOUBLE)), 0.0)
                     + coalesce(1.0 / ($RrfK + CAST(cos_rank AS DOUBLE)), 0.0) AS rrf
            FROM bm FULL OUTER JOIN cs ON bm.doc_id = cs.vec_id)
      SELECT id, bm25, bm25_rank, cosine, cos_rank, rrf
      FROM f ORDER BY rrf DESC, id LIMIT $RagTopK"""),
  )

  // ---------------------------------------------- MMR diversification
  private val MmrPoolK = 24
  private val MmrTopK = 10

  /** Greedy MMR selection over a bounded pool — the pure driver-side
    * core of `rag_mmr_rerank`, extracted for first-principles testing
    * (`MmrSpec`). `rel` is (id, relevance); `sim` holds pairwise
    * similarities keyed (lo, hi). Step 1 picks argmax relevance (score
    * λ·rel); each later step picks argmax λ·rel(c) − μ·max_{s∈chosen}
    * sim(c, s). μ is an EXPLICIT parameter, not `1 − λ`: the oracle
    * writes the literal 0.3, and `1 − 0.7` is 0.30000000000000004 in
    * doubles — a bit-level differential mismatch waiting to happen.
    * Ties break to the smaller id, matching the oracle's
    * `ORDER BY mmr DESC, vec_id`. Returns (id, mmr score at selection)
    * in selection order; stops early if the pool exhausts. */
  private[graft] def mmrSelect(
      rel: Seq[(Long, Double)],
      sim: Map[(Long, Long), Double],
      lambda: Double,
      mu: Double,
      k: Int): Seq[(Long, Double)] = {
    require(rel.nonEmpty, "mmrSelect needs a non-empty pool")
    def simOf(i: Long, j: Long): Double =
      if (i < j) sim((i, j)) else sim((j, i))
    val relMap = rel.toMap
    val first = rel.maxBy { case (id, c) => (c, -id) }
    var chosen = Vector((first._1, lambda * first._2))
    var remaining = rel.map(_._1).toSet - first._1
    while (chosen.size < k && remaining.nonEmpty) {
      val best = remaining.toSeq
        .map { c =>
          val maxSim = chosen.map(x => simOf(c, x._1)).max
          (c, lambda * relMap(c) - mu * maxSim)
        }
        .maxBy { case (id, m) => (m, -id) }
      chosen :+= best
      remaining -= best._1
    }
    chosen
  }

  /** MMR-diversified re-rank (Carbonell & Goldstein's Maximal Marginal
    * Relevance, λ = 0.7) of the semantic retrieval pool — the RAG
    * serving stage after `rag_hybrid_topk`'s fusion: a near-duplicate-
    * heavy corpus makes pure relevance ranking return ten copies of the
    * same passage, so the re-ranker greedily picks
    * argmax λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s) — each next
    * result must be relevant AND novel versus everything already
    * selected.
    *
    * 100 TB design: the corpus-sized work is exactly the scorer the
    * pool reuses ([[cosineFrame]] + TakeOrdered top-24) plus ONE
    * pool-scoped pairwise-similarity aggregate (24 vectors semi-joined
    * out by broadcast, ≤276 pair rows — never all-pairs over the
    * corpus). The greedy selection itself is inherently sequential and
    * runs on the driver over those ≤24+276 collected METADATA rows (the
    * same bounded-driver doctrine as the gated graph solves; a
    * per-round Spark job for a 24-row argmax would be pure scheduling
    * tax).
    *
    * Determinism: rel and sim are the proven 6-dp-rounded quantized
    * cosines; each MMR score is (0.7·rel) − (0.3·maxsim) — two IEEE
    * multiplies and one subtract, expressed identically in the oracle's
    * recursive CTE (the greedy loop spelled as SQL recursion, ties
    * broken by vec_id both sides). */
  private val ragMmr = Q(
    "rag_mmr_rerank",
    (s, dir) => {
      val pool = cosineFrame(s, dir)
        .orderBy(col("cosine").desc, col("vec_id")).limit(MmrPoolK)
      val poolIds = pool.select("vec_id")
      val pv = Tables.embeddings(s, dir)
        .join(broadcast(poolIds), "vec_id")
        .select(col("vec_id"), posexplode(col("embedding")))
        .toDF("vec_id", "pos", "x")
        .withColumn("xq", floor(col("x").cast("double") * lit(1000000.0)).cast("long"))
      val norms = pv.groupBy("vec_id").agg(sum(col("xq") * col("xq")).as("n2"))
      val sims = pv.select(col("vec_id").as("ia"), col("pos"), col("xq").as("xa"))
        .join(pv.select(col("vec_id").as("ib"), col("pos"), col("xq").as("xb")), Seq("pos"))
        .filter(col("ia") < col("ib"))
        .groupBy("ia", "ib").agg(sum(col("xa") * col("xb")).as("dot"))
        .join(broadcast(norms.select(col("vec_id").as("ia"), col("n2").as("na"))), "ia")
        .join(broadcast(norms.select(col("vec_id").as("ib"), col("n2").as("nb"))), "ib")
        .select(col("ia"), col("ib"),
          round(col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6)
            .as("s"))
      // bounded driver solve: ≤ MmrPoolK rel rows + ≤ K(K-1)/2 sim rows
      val rel = pool.collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine"))
      val relMap = rel.toMap
      val simMap = sims.collect()
        .map(r => (r.getAs[Long]("ia"), r.getAs[Long]("ib")) -> r.getAs[Double]("s"))
        .toMap
      val chosen = mmrSelect(rel.toSeq, simMap, lambda = 0.7, mu = 0.3, k = MmrTopK)
      val s0 = s
      import s0.implicits._
      chosen.zipWithIndex
        .map { case ((id, m), i) => (i + 1L, id, relMap(id), m) }
        .toDF("mmr_rank", "vec_id", "cosine", "mmr_score")
        .orderBy("mmr_rank")
    },
    Some(s"""
      WITH RECURSIVE $cosineOracleCtes,
      pool AS (SELECT vec_id, cosine FROM cos_scored
               ORDER BY cosine DESC, vec_id LIMIT $MmrPoolK),
      pv AS (SELECT eq.vec_id, pos, xq FROM eq JOIN pool USING (vec_id)),
      pn AS (SELECT vec_id, sum(xq * xq) AS n2 FROM pv GROUP BY 1),
      pp AS (SELECT a.vec_id AS ia, b.vec_id AS ib, sum(a.xq * b.xq) AS dot
             FROM pv a JOIN pv b USING (pos) WHERE a.vec_id < b.vec_id
             GROUP BY 1, 2),
      sim AS (SELECT ia, ib,
                     round(CAST(dot AS DOUBLE)
                       / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS s
              FROM pp JOIN pn na ON na.vec_id = pp.ia
                      JOIN pn nb ON nb.vec_id = pp.ib),
      sim2 AS (SELECT ia AS i, ib AS j, s FROM sim
               UNION ALL SELECT ib, ia, s FROM sim),
      sel AS (
        (SELECT 1 AS step, vec_id AS sel_id,
                CAST(0.7 AS DOUBLE) * cosine AS mmr, [vec_id] AS chosen
         FROM pool ORDER BY cosine DESC, vec_id LIMIT 1)
        UNION ALL
        SELECT s.step + 1, c.vec_id, c.mmr, list_append(s.chosen, c.vec_id)
        FROM sel s, LATERAL (
          SELECT p.vec_id,
                 CAST(0.7 AS DOUBLE) * p.cosine - CAST(0.3 AS DOUBLE) *
                   (SELECT max(m.s) FROM sim2 m
                    WHERE m.i = p.vec_id AND list_contains(s.chosen, m.j)) AS mmr
          FROM pool p WHERE NOT list_contains(s.chosen, p.vec_id)
          ORDER BY mmr DESC, p.vec_id LIMIT 1) c
        WHERE s.step < $MmrTopK)
      SELECT CAST(sel.step AS BIGINT) AS mmr_rank, sel.sel_id AS vec_id,
             p.cosine, sel.mmr AS mmr_score
      FROM sel JOIN pool p ON p.vec_id = sel.sel_id
      ORDER BY mmr_rank"""),
  )

  // ----------------------------------------------------------- multimodal
  /** Multimodal plumbing (relational part): opaque binary payload +
    * typed metadata + deterministic content digest + a "thumbnail"
    * byte-slice. The decode/feature-extract stage lives in
    * `ext.Multimodal` (mapPartitions with a stubbed decoder). */
  private val multimodal = Q(
    "multimodal_metadata",
    (s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text").cast("binary")).as("blob_md5"),
        octet_length(col("text")).cast("long").as("byte_len"),
        base64(expr("substring(cast(text as binary), 1, 16)")).as("head_b64"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, lang, source, n_chars,
             md5(text) AS blob_md5,
             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             to_base64(encode(substr(text, 1, 16))) AS head_b64
      FROM documents ORDER BY doc_id"""),
  )

  // ------------------------------------------- lang-ID confusion matrix
  /** Language-ID CONFUSION MATRIX — the classifier-evaluation view of
    * the marker-based lang_guess the gates rely on: true label (the
    * documents table carries ground truth) × guess, with per-cell
    * counts and the per-true-language recall. `text_stats` emits the
    * guess; this query grades it — fr/zh have no marker set, so the
    * matrix SHOWS them collapsing into 'en'/'und', the honest failure
    * mode a dashboard must surface before anyone trusts per-language
    * corpus stats built on the guess.
    *
    * On THIS lake the matrix shows something stronger: every language
    * label guesses 'en' or 'und' (~90% en), because the synthetic
    * text draws the same English-ish token vocabulary regardless of
    * its lang column — the guess grades the CONTENT, the label is
    * metadata, and per-language corpus stats keyed on content-derived
    * language would differ completely from label-keyed ones. Exactly
    * the discrepancy this report exists to catch.
    *
    * One scan, one (true, guess) aggregate that collapses map-side to
    * ≤ |langs|² cells, a broadcast per-language total for recall —
    * nothing here scales with the corpus. */
  private val langConfusion = Q(
    "text_langid_confusion",
    (s, dir) => {
      val markers = Seq(
        "en" -> Seq("the", "a"),
        "es" -> Seq("la", "el"),
        "de" -> Seq("der", "und"))
      val guessed = Tables.documents(s, dir)
        .select(col("lang").as("true_lang"),
          TextFunctions.languageId(col("text"), markers).as("guess"))
      val cells = guessed.groupBy("true_lang", "guess")
        .agg(count(lit(1)).as("n"))
      val totals = cells.groupBy("true_lang").agg(sum(col("n")).as("n_true"))
      cells.join(broadcast(totals), Seq("true_lang"))
        .select(col("true_lang"), col("guess"), col("n"), col("n_true"),
          round(col("n").cast("double") / col("n_true").cast("double"), 4)
            .as("cell_rate"),
          (col("true_lang") === col("guess")).as("is_correct"))
        .orderBy("true_lang", "guess")
    },
    Some("""
      WITH g AS (SELECT lang AS true_lang,
             CASE
               WHEN len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a')) >=
                    greatest(len(list_filter(string_split(text, ' '), t -> t = 'la' OR t = 'el')),
                             len(list_filter(string_split(text, ' '), t -> t = 'der' OR t = 'und')))
                    AND len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a')) > 0
               THEN 'en'
               WHEN len(list_filter(string_split(text, ' '), t -> t = 'la' OR t = 'el')) >=
                    len(list_filter(string_split(text, ' '), t -> t = 'der' OR t = 'und'))
                    AND len(list_filter(string_split(text, ' '), t -> t = 'la' OR t = 'el')) > 0
               THEN 'es'
               WHEN len(list_filter(string_split(text, ' '), t -> t = 'der' OR t = 'und')) > 0
               THEN 'de'
               ELSE 'und' END AS guess
           FROM documents),
      cells AS (SELECT true_lang, guess, CAST(count(*) AS BIGINT) AS n
                FROM g GROUP BY 1, 2),
      tot AS (SELECT true_lang, CAST(sum(n) AS BIGINT) AS n_true
              FROM cells GROUP BY 1)
      SELECT c.true_lang, c.guess, c.n, t.n_true,
             round(CAST(c.n AS DOUBLE) / CAST(t.n_true AS DOUBLE), 4) AS cell_rate,
             c.true_lang = c.guess AS is_correct
      FROM cells c JOIN tot t USING (true_lang)
      ORDER BY c.true_lang, c.guess"""),
  )

  // --------------------------------------- dedup threshold sensitivity
  /** Threshold-sensitivity sweep over the SHARED MinHash candidate
    * pairs — the tuning artifact a dedup owner reads before picking
    * the Jaccard cutoff: pairs kept and documents touched at each
    * candidate threshold, from ONE pair build (the session-memoized
    * [[minhashPairs]] frame; the sweep itself is four aggregates over
    * an already-small persisted table — at 100 TB the pair build is
    * the cost and this report adds nothing to it). A cliff between
    * two rows means the corpus has a near-dup family right at that
    * similarity — exactly where a blind threshold choice flips
    * thousands of keep/drop decisions. (This lake's planted family
    * sits at jaccard 0.90–0.99, so the sweep brackets that range —
    * a flat sweep over generic cutoffs would report nothing.) */
  private val dedupSweep = Q(
    "dedup_threshold_sweep",
    (s, dir) => {
      val pairs = minhashPairs(s, dir) // memoized — consumers must not unpersist
      val melted = pairs.select(col("jaccard"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc"))
      Seq(0.5, 0.95, 0.97, 0.985).map { th =>
        pairs.filter(col("jaccard") >= th)
          .agg(count(lit(1)).as("n_pairs"))
          .crossJoin(melted.filter(col("jaccard") >= th)
            .agg(countDistinct(col("doc")).as("n_docs")))
          .select(lit(th).as("threshold"), col("n_pairs"), col("n_docs"))
      }.reduce(_ unionByName _).orderBy("threshold")
    },
    Some(s"""
      WITH $MINHASH_CTES,
      md AS (SELECT jaccard, doc_a AS doc FROM pairs
             UNION ALL SELECT jaccard, doc_b FROM pairs),
      th AS (SELECT unnest([0.5, 0.95, 0.97, 0.985]) AS threshold)
      SELECT t.threshold,
             (SELECT CAST(count(*) AS BIGINT) FROM pairs p
              WHERE p.jaccard >= t.threshold) AS n_pairs,
             (SELECT CAST(count(DISTINCT doc) AS BIGINT) FROM md
              WHERE md.jaccard >= t.threshold) AS n_docs
      FROM th t ORDER BY t.threshold"""),
  )

  // ------------------------------------------- exact duplicated spans
  /** Duplicated-span gram length: long enough that a shared run means
    * copying, not chance (published ExactSubstr uses 50 tokens over
    * web text; the ~50-token synthetic docs need L=8 to be selective
    * yet non-vacuous — 47 of 500 docs carry a shared 8-gram at
    * sf0.01, all from the planted near-dup families). */
  private val DupSpanL = 8

  /** Positions of every cross-document duplicated token span, merged
    * maximal: `(doc_id, t, n)` tokens → `(doc_id, span_start,
    * span_end, span_len)`. ONE implementation behind
    * `corpus_dup_spans` (span rows) and `corpus_dup_profile` (per-doc
    * duplicated-mass rollup).
    *
    * This is the Spark-native re-expression of suffix-array
    * ExactSubstr dedup (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better"): a suffix array is a single-node
    * structure, so instead the corpus builds a positional L-gram
    * inverted index — (a) positional L-grams as `element_at` column
    * arithmetic off the scan; (b) grams appearing in ≥2 DISTINCT
    * documents found with one map-side-collapsing aggregate; (c)
    * positions of shared grams recovered by an equi-join on the gram
    * (at 100 TB key this join on xxhash64(gram) to cut shuffle bytes
    * — raw text kept here so the DuckDB replay is bit-identical); (d)
    * overlapping-or-adjacent hits (gap ≤ L) merged into maximal spans
    * with a gaps-and-islands window PARTITIONed BY doc_id — bounded
    * by document length, never a stratum. No stage enumerates
    * document pairs, so the plan survives a corpus where a hot
    * boilerplate span appears in millions of documents (the df≥2 set
    * is metadata-sized; its positions scale with the corpus, not with
    * pairs of it). */
  private def dupSpanFrame(toks: DataFrame): DataFrame = {
    val pos = toks.filter(col("n") >= DupSpanL)
      .select(col("doc_id"),
        explode(sequence(lit(1L), col("n") - (DupSpanL - 1))).as("i"),
        col("t"))
      .select(col("doc_id"), col("i"),
        concat_ws(" ", (0 until DupSpanL).map(o =>
          element_at(col("t"), col("i").cast("int") + o)): _*).as("g"))
    val shared = pos.groupBy("g")
      .agg(countDistinct(col("doc_id")).as("d"))
      .filter(col("d") >= 2).select("g")
    val hits = pos.join(shared, Seq("g")).select(col("doc_id"), col("i"))
    val w = Window.partitionBy("doc_id").orderBy("i")
    hits
      .withColumn("prev", lag(col("i"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("i") - col("prev") > DupSpanL, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min(col("i")).as("span_start"),
        (max(col("i")) + (DupSpanL - 1)).as("span_end"))
      .withColumn("span_len", col("span_end") - col("span_start") + 1)
      .select("doc_id", "span_start", "span_end", "span_len")
  }

  /** SQL twin of [[dupSpanFrame]] as CTEs over `tok(doc_id, t)`. */
  private def dupSpanSql: String = {
    val g = (0 until DupSpanL).map(o =>
      if (o == 0) "t[CAST(u.i AS INT)]" else s"t[CAST(u.i AS INT) + $o]")
      .mkString(" || ' ' || ")
    s"""pos AS (SELECT doc_id, CAST(u.i AS BIGINT) AS i, $g AS g
              FROM tok, unnest(range(1, CAST(len(t) AS INT) - ${DupSpanL - 2})) u(i)
              WHERE len(t) >= $DupSpanL),
      sharedg AS (SELECT g FROM pos GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
      hits AS (SELECT p.doc_id, p.i FROM pos p JOIN sharedg USING (g)),
      brk AS (SELECT doc_id, i,
                CASE WHEN lag(i) OVER w IS NULL OR i - lag(i) OVER w > $DupSpanL
                     THEN 1 ELSE 0 END AS b
              FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
      isl AS (SELECT doc_id, i,
                sum(b) OVER (PARTITION BY doc_id ORDER BY i) AS island
              FROM brk),
      spans AS (SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
                       CAST(max(i) + ${DupSpanL - 1} AS BIGINT) AS span_end,
                       CAST(max(i) + ${DupSpanL - 1} - min(i) + 1 AS BIGINT) AS span_len
                FROM isl GROUP BY doc_id, island)"""
  }

  /** Exact cross-document duplicated spans — which token ranges of
    * which documents also occur verbatim elsewhere in the corpus (the
    * span-level complement of the document-level near-dup family: LSH
    * finds similar DOCUMENTS, this finds copied PASSAGES inside
    * otherwise-distinct ones). See [[dupSpanFrame]] for the 100 TB
    * design. */
  private val dupSpans = Q(
    "corpus_dup_spans",
    (s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
        .withColumn("n", size(col("t")).cast("long"))
      dupSpanFrame(toks).orderBy("doc_id", "span_start")
    },
    Some(s"""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      $dupSpanSql
      SELECT doc_id, span_start, span_end, span_len
      FROM spans ORDER BY doc_id, span_start"""),
  )

  /** Per-document duplicated-mass profile — the drop/trim decision
    * input ExactSubstr pipelines act on: how many tokens of each doc
    * sit inside a cross-document duplicated span. Spans are disjoint
    * by construction (the islands merge), so the duplicated mass is a
    * plain sum; docs with no duplicated span report 0/0.0 via the
    * left join, keeping both polarities non-vacuous. */
  private val dupProfile = Q(
    "corpus_dup_profile",
    (s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
        .withColumn("n", size(col("t")).cast("long"))
      val perDoc = dupSpanFrame(toks)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"), sum(col("span_len")).as("dup_tokens"))
      toks.select(col("doc_id"), col("n").as("n_tokens"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
        .withColumn("dup_fraction",
          round(col("dup_tokens").cast("double") / col("n_tokens"), 4))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      $dupSpanSql,
      perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                        CAST(sum(span_len) AS BIGINT) AS dup_tokens
                 FROM spans GROUP BY doc_id)
      SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
             coalesce(p.n_spans, 0) AS n_spans,
             coalesce(p.dup_tokens, 0) AS dup_tokens,
             round(CAST(coalesce(p.dup_tokens, 0) AS DOUBLE) / len(t.t), 4) AS dup_fraction
      FROM tok t LEFT JOIN perdoc p USING (doc_id)
      ORDER BY t.doc_id"""),
  )

  /** Duplicated-span EXCISION — the CUT step of ExactSubstr dedup
    * (Lee et al. 2022 §4.2: duplicated substrings are REMOVED, not
    * just reported): every token position covered by a cross-document
    * duplicated span (per [[dupSpanFrame]]) is excised and the
    * document rebuilt from the survivors — applied symmetrically to
    * every occurrence, the shared-boilerplate treatment (a canonical-
    * owner variant keeps one copy; boilerplate wants zero). Completes
    * the family: `corpus_dup_spans` reports, `corpus_dup_profile`
    * sizes the decision, this one acts on it.
    *
    * 100 TB design: spans collapse to ONE bounded hit-position array
    * per document (duplication-sized metadata, ≤ doc length), the
    * rebuild joins that array back on doc_id and regroups on the SAME
    * key — the token stream crosses a single exchange; membership is
    * compiled `array_contains`, the rebuild the compiled
    * `sort_array(collect_list(struct))` idiom (no HOF lambda). */
  private val dupExcise = Q(
    "corpus_dup_excise",
    (s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
        .withColumn("n", size(col("t")).cast("long"))
      val hitSets = dupSpanFrame(toks)
        .select(col("doc_id"),
          explode(sequence(col("span_start"), col("span_end"))).as("p"))
        .groupBy("doc_id").agg(collect_set(col("p")).as("hits"))
      toks.join(hitSets, Seq("doc_id"), "left")
        .select(col("doc_id"), col("hits"),
          posexplode(col("t")).as(Seq("p0", "tok")))
        .withColumn("p", col("p0").cast("long") + 1)
        .withColumn("hit",
          coalesce(array_contains(col("hits"), col("p")), lit(false)))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_removed"),
          array_join(
            sort_array(collect_list(when(!col("hit"), struct(col("p"), col("tok")))))
              .getField("tok"), " ").as("clean_text"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      $dupSpanSql,
      hitp AS (SELECT DISTINCT s.doc_id, CAST(u.p AS BIGINT) AS p
               FROM spans s, unnest(range(s.span_start, s.span_end + 1)) u(p)),
      allp AS (SELECT doc_id, CAST(u.i AS BIGINT) AS p, t[CAST(u.i AS INT)] AS tok
               FROM tok, unnest(range(1, CAST(len(t) AS INT) + 1)) u(i))
      SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(h.p) AS BIGINT) AS n_removed,
             coalesce(string_agg(a.tok, ' ' ORDER BY a.p)
               FILTER (WHERE h.p IS NULL), '') AS clean_text
      FROM allp a LEFT JOIN hitp h ON a.doc_id = h.doc_id AND a.p = h.p
      GROUP BY a.doc_id ORDER BY a.doc_id"""),
  )

  /** Per-document n-gram NOVELTY — the leave-one-out diversity signal
    * dedup scores miss: the share of a document's distinct 3-word
    * shingles appearing in NO other document (document frequency 1).
    * Boilerplate-heavy docs score near 0 even when no single partner
    * crosses a pairwise dedup threshold (their shingles are spread
    * across MANY docs); genuinely original text scores near 1 — the
    * complement that ranks what dedup KEEPS. All-pairs-free by
    * construction: one inverted-index aggregate (shingle → df, partials
    * collapse map-side), one join back on the shingle, one per-doc
    * rollup. Docs under 3 tokens have no shingles and drop out, same
    * contract as the MinHash signature builder. */
  private val ngramNovelty = Q(
    "corpus_ngram_novelty",
    (s, dir) => {
      val sh = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.shingles(col("text"), 3)).as("shingle"))
      val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          round(col("n_novel").cast("double") / col("n_shingles").cast("double"), 6)
            .as("novelty"))
        .orderBy("doc_id")
    },
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) >= 3
                    THEN list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                    ELSE [] END)) AS shingle
             FROM tok),
      dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
      SELECT s.doc_id,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
             round(CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*), 6) AS novelty
      FROM sh s JOIN dfreq d ON s.shingle = d.shingle
      GROUP BY s.doc_id
      ORDER BY s.doc_id"""),
  )

  /** Per-document READABILITY (Flesch reading-ease shape) — the
    * classic quality-gating signal beside length/stopword/entropy:
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words), with
    * syllables approximated by VOWEL GROUPS (the standard cheap
    * heuristic) counted compiled-regex-only: replace each `[aeiouy]+`
    * group with one char vs delete it — the length difference IS the
    * group count, no per-token lambda. This corpus has no sentence
    * punctuation (synthetic fragments), so each document is honestly
    * ONE sentence — the guard `greatest(1, enders)` is still exercised
    * as written and the formula's spread (−21…96 at sf0.01) comes from
    * the word-count and syllable-density terms. Everything is exact
    * integer ratios × constants — bit-identical doubles cross-engine. */
  private val readability = Q(
    "corpus_readability",
    (s, dir) => {
      def groups(x: Column, pat: String): Column =
        (length(regexp_replace(x, pat, "V")) -
          length(regexp_replace(x, pat, ""))).cast("long")
      val m = Tables.documents(s, dir)
        .select(col("doc_id"), lower(col("text")).as("x"))
        .select(col("doc_id"),
          size(split(col("x"), " ")).cast("long").as("words"),
          greatest(lit(1L), groups(col("x"), "[.!?]+")).as("sentences"),
          groups(col("x"), "[aeiouy]+").as("vgroups"))
      m.select(col("doc_id"), col("words"), col("sentences"), col("vgroups"),
          round(lit(206.835)
            - lit(1.015) * (col("words").cast("double") / col("sentences").cast("double"))
            - lit(84.6) * (col("vgroups").cast("double") / col("words").cast("double")), 4)
            .as("flesch"))
        .withColumn("band",
          when(col("flesch") >= 60, "easy")
            .when(col("flesch") >= 30, "medium")
            .otherwise("hard"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id, lower(text) AS x FROM documents),
      m AS (SELECT doc_id,
              CAST(len(string_split(x, ' ')) AS BIGINT) AS words,
              greatest(1, CAST(length(regexp_replace(x, '[.!?]+', 'V', 'g'))
                               - length(regexp_replace(x, '[.!?]+', '', 'g')) AS BIGINT))
                AS sentences,
              CAST(length(regexp_replace(x, '[aeiouy]+', 'V', 'g'))
                   - length(regexp_replace(x, '[aeiouy]+', '', 'g')) AS BIGINT) AS vgroups
            FROM d)
      SELECT doc_id, words, sentences, vgroups,
             round(206.835
                   - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
                   - 84.6 * (CAST(vgroups AS DOUBLE) / CAST(words AS DOUBLE)), 4) AS flesch,
             CASE WHEN round(206.835
                   - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
                   - 84.6 * (CAST(vgroups AS DOUBLE) / CAST(words AS DOUBLE)), 4) >= 60
                  THEN 'easy'
                  WHEN round(206.835
                   - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
                   - 84.6 * (CAST(vgroups AS DOUBLE) / CAST(words AS DOUBLE)), 4) >= 30
                  THEN 'medium'
                  ELSE 'hard' END AS band
      FROM m ORDER BY doc_id"""),
  )

  /** Per-source lexical richness — type-token ratio and hapax share,
    * the corpus-statistics pair beside Heaps' law that flags template
    * farms (low TTR, near-zero hapax share) vs organic text: per
    * source, total tokens, distinct types, hapax count (tokens seen
    * ONCE within the source) and their ratios. One (source, token)
    * aggregate — the per-source term frequency table the BM25/vocab
    * queries already shape — then a per-source rollup; exact integer
    * ratios, all-pairs-free. */
  private val hapaxStats = Q(
    "corpus_hapax_stats",
    (s, dir) => {
      val tf = Tables.documents(s, dir)
        .select(col("source"), explode(split(lower(col("text")), " ")).as("t"))
        .groupBy("source", "t").agg(count(lit(1)).as("c"))
      tf.groupBy("source")
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
          round(col("n_types").cast("double") / col("n_tokens").cast("double"), 6)
            .as("ttr"),
          round(col("n_hapax").cast("double") / col("n_types").cast("double"), 6)
            .as("hapax_share"))
        .orderBy("source")
    },
    Some("""
      WITH tok AS (SELECT source, unnest(string_split(lower(text), ' ')) AS t
                   FROM documents),
      tf AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2)
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
             round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr,
             round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*), 6) AS hapax_share
      FROM tf GROUP BY source ORDER BY source"""),
  )

  val all: Seq[Q] = Seq(
    ngramNovelty, readability, hapaxStats,
    textStats, bm25, perplexity, ccnetBuckets, langConfusion, qualityGate, fingerprint, winnowQ, winnowPairs, corpusClean,
    corpusCleanClustered, clusterSplits, dedupReport, trainingMix, trainingTokens, dedupExact, minhash,
    lshAudit, incrementalScreen, dedupClusters, dedupCanonical, ngramJaccard, jaccardPrefix, simhash,
    bloomScreen, bloomFpr,
    annTopK, hardNegatives, ragHybrid, ragMmr, multimodal, dupSpans, dupProfile, dupExcise, dedupSweep)
}
