package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.expr.WinnowKernels
import graft.operators.{Dedup, Sketches}
import graft.text.TextAnalysis._

/** Text-analysis + deduplication catalog entries over the `documents`
  * table (LLM-pipeline extension surface; no reference counterpart —
  * SURVEY §2.7 note). Oracle SQL is generated from the same constants as
  * the Spark plans (see [[graft.text.TextAnalysis]]), so both engines
  * compute identical doubles and the driver's hash compare is exact. */
object TextQueries {

  /** Shingle size for near-dup detection (word trigrams). */
  val ShingleN = 3

  /** Near-dup Jaccard threshold. The synthetic corpus separates cleanly
    * (planted pairs ≥ 0.8, background ≤ 0.14), and 0.5 keeps the LSH
    * band-miss probability negligible (k=128, b=32: P[miss|s=0.8] ≈ 5e-8). */
  val MinJaccard = 0.5

  /** Per-document token/quality statistics — P1/P2-style projection with
    * pure scalar text functions, no shuffle at all (scan → project).
    * Doubles are emitted UNROUNDED: every value is rational arithmetic on
    * small integers evaluated in the same operation order in both engines,
    * so the bits agree exactly — whereas rounding would sit on .5 decimal
    * boundaries (e.g. 0.59625) where Spark's HALF_UP and C-style rounding
    * disagree. */
  val qTextStats = QueryDef("q_text_stats",
    (spark, dir) => Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.expr.TextStats(col("text")).as("s"))
      .select(col("doc_id"), col("s.n_tokens").as("n_tokens"),
        col("s.avg_token_len").as("avg_token_len"),
        col("s.stopword_ratio").as("stopword_ratio"),
        col("s.distinct_ratio").as("distinct_ratio"),
        col("s.quality").as("quality"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id,
            |  CAST(${tokenCountSql("text")} AS BIGINT) AS n_tokens,
            |  ${avgTokenLenSql("text")} AS avg_token_len,
            |  ${stopwordRatioSql("text")} AS stopword_ratio,
            |  ${distinctRatioSql("text")} AS distinct_ratio,
            |  ${qualityScoreSql("text")} AS quality
            |FROM documents ORDER BY doc_id""".stripMargin))

  /** Token accounting both ways — whitespace words and BPE-pretokenizer
    * subword units — rolled up per source (the budget numbers a training
    * run plans against). */
  val qTokenBudget = QueryDef("q_token_budget_by_source",
    (spark, dir) => Tables.documents(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text")).cast("long")).as("ws_tokens"),
        sum(bpeTokenCount(col("text")).cast("long")).as("bpe_tokens"))
      .orderBy("source"),
    Some(s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            |       CAST(sum(${tokenCountSql("text")}) AS BIGINT) AS ws_tokens,
            |       CAST(sum(${bpeTokenCountSql("text")}) AS BIGINT) AS bpe_tokens
            |FROM documents GROUP BY source ORDER BY source""".stripMargin))

  /** Language-ID heuristic per document + corpus rollup: predicted code
    * from marker-word argmax (deterministic tie-break). */
  val qLangId = QueryDef("q_lang_id",
    (spark, dir) => Tables.documents(spark, dir)
      .select(col("doc_id"), langId(col("text")).as("pred_lang"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id, ${langIdSql("text")} AS pred_lang
            |FROM documents ORDER BY doc_id""".stripMargin))

  /** Corpus token frequencies, top 50 — the canonical explode → groupBy
    * word-count (the generic 1→n FlatMap shape of SURVEY §2.8, T2). */
  val qTokenFreq = QueryDef("q_token_freq",
    (spark, dir) => Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("word"))
      .limit(50),
    Some("""SELECT word, CAST(count(*) AS BIGINT) AS freq
           |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
           |GROUP BY word ORDER BY freq DESC, word LIMIT 50""".stripMargin))

  /** Exact dedup groups: our side groups by the 64-bit content
    * fingerprint; the oracle groups by the raw text — results agree iff
    * the fingerprint is collision-free and content-faithful, so this
    * doubles as a fingerprint correctness check. */
  val qDedupExact = QueryDef("q_dedup_exact",
    (spark, dir) => Dedup.exactGroups(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("keeper_id"),
    Some("""SELECT min(doc_id) AS keeper_id, CAST(count(*) AS BIGINT) AS n_copies
           |FROM documents WHERE text IS NOT NULL
           |GROUP BY text ORDER BY keeper_id""".stripMargin))

  /** Repetition quality stats (the Gopher/MassiveText-style filtering
    * rules, Rae et al. 2021 §A1.1): per document,
    *   - `top_bigram_frac` — occurrences of the most frequent token
    *     bigram over all bigram occurrences (templated/boilerplate text
    *     scores high);
    *   - `dup_trigram_frac` — fraction of trigram occurrences that are
    *     repeats (1 − distinct/total; loops and stutter score high).
    * Docs need ≥ 3 tokens (both denominators positive). All-integer
    * numerators/denominators with one CAST-DOUBLE division on each
    * side — bit-identical across engines, no rounding. */
  val qRepetitionStats = QueryDef("q_repetition_stats",
    (spark, dir) => {
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"), tokens(col("text")).as("ws"),
          graft.text.TextAnalysis.shingles(col("text"), 3).as("tri"))
        .filter(size(col("ws")) >= 3)
      val bigrams = toks.select(col("doc_id"),
        explode(arrays_zip(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1))).as("bg"))
        .select(col("doc_id"),
          concat_ws(" ", col("bg.0"), col("bg.1")).as("bigram"))
      val topBigram = bigrams
        .groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg((max(col("c")).cast("double") / sum(col("c")).cast("double"))
          .as("top_bigram_frac"))
      toks
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_tokens"),
          (lit(1.0) - size(col("tri")).cast("double") /
            (size(col("ws")) - 2).cast("double")).as("dup_trigram_frac"))
        .join(topBigram, "doc_id")
        .select("doc_id", "n_tokens", "top_bigram_frac", "dup_trigram_frac")
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (
            |  SELECT doc_id, string_split(text, ' ') AS ws
            |  FROM documents WHERE len(string_split(text, ' ')) >= 3
            |), bi AS (
            |  SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1]
            |                         for i in generate_series(1, len(ws) - 1)]) AS bigram
            |  FROM toks
            |), topbi AS (
            |  SELECT doc_id,
            |         CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac
            |  FROM (SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY 1, 2)
            |  GROUP BY doc_id
            |), tri AS (
            |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
            |         1.0 - CAST(len(list_distinct(${shinglesOverWsSql(3)})) AS DOUBLE)
            |               / CAST(len(ws) - 2 AS DOUBLE) AS dup_trigram_frac
            |  FROM toks
            |)
            |SELECT t.doc_id, t.n_tokens, b.top_bigram_frac, t.dup_trigram_frac
            |FROM tri t JOIN topbi b ON t.doc_id = b.doc_id
            |ORDER BY t.doc_id""".stripMargin))

  /** The full Gopher REPETITION family ([[graft.text.Repetition]],
    * Rae et al. 2021 App. A1.1) as a SHUFFLE-FREE per-document sweep:
    * top-{2,3,4}-gram CHARACTER coverage, duplicated-5-gram weight
    * fraction, and the keep flag at the Gopher-style thresholds —
    * computed by sorting each document's own n-gram list and
    * run-length-folding it with higher-order functions, so the plan
    * is scan → project with NO exchange (contrast
    * [[qRepetitionStats]]'s explode → groupBy form, which shuffles a
    * row per n-gram: at corpus scale the difference between a map job
    * and the pipeline's largest shuffle). Every fraction is one IEEE
    * division of exact integers, shipped unrounded; the oracle
    * recomputes relationally with (count DESC, gram ASC) tie-break —
    * equal by construction to the fold's first-max-in-sorted-order. */
  val qGopherQuality = QueryDef("q_gopher_quality",
    (spark, dir) => graft.text.Repetition.repetitionStats(
      Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH d AS (
           |  SELECT doc_id, string_split(text, ' ') AS toks,
           |         length(text) AS nchars
           |  FROM documents WHERE text IS NOT NULL
           |), grams AS (
           |  SELECT doc_id, n.n AS n,
           |         unnest([array_to_string(toks[i : i + n.n - 1], ' ')
           |                 for i in generate_series(1, len(toks) - n.n + 1)])
           |           AS g
           |  FROM d, (VALUES (2), (3), (4), (5)) AS n(n)
           |  WHERE len(toks) >= n.n
           |), cnt AS (
           |  SELECT doc_id, n, g, count(*) AS c FROM grams
           |  GROUP BY doc_id, n, g
           |), top AS (
           |  -- a once-only top n-gram is no repetition: weight 0
           |  SELECT doc_id, n,
           |         CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END AS w
           |  FROM (
           |    SELECT *, row_number() OVER (PARTITION BY doc_id, n
           |      ORDER BY c DESC, g) AS rn FROM cnt) WHERE rn = 1
           |), dup AS (
           |  SELECT doc_id,
           |         COALESCE(SUM(CASE WHEN c > 1 THEN c * length(g) END), 0)
           |           AS dupw,
           |         SUM(c * length(g)) AS totw
           |  FROM cnt WHERE n = 5 GROUP BY doc_id
           |)
           |SELECT d.doc_id,
           |       t2.w / d.nchars AS top2gram_frac,
           |       t3.w / d.nchars AS top3gram_frac,
           |       t4.w / d.nchars AS top4gram_frac,
           |       CASE WHEN dup.totw > 0
           |            THEN CAST(dup.dupw AS DOUBLE) / dup.totw
           |       END AS dup5gram_frac,
           |       COALESCE(t2.w / d.nchars <= 0.20, TRUE)
           |         AND COALESCE(t3.w / d.nchars <= 0.18, TRUE)
           |         AND COALESCE(t4.w / d.nchars <= 0.16, TRUE)
           |         AND COALESCE(CAST(dup.dupw AS DOUBLE) / dup.totw <= 0.15,
           |                      TRUE) AS keep
           |FROM d
           |LEFT JOIN top t2 ON t2.doc_id = d.doc_id AND t2.n = 2
           |LEFT JOIN top t3 ON t3.doc_id = d.doc_id AND t3.n = 3
           |LEFT JOIN top t4 ON t4.doc_id = d.doc_id AND t4.n = 4
           |LEFT JOIN dup ON dup.doc_id = d.doc_id
           |ORDER BY d.doc_id""".stripMargin))

  /** Per-document SHANNON ENTROPY signals ([[graft.text.Entropy]]):
    * character- and token-level entropy in bits — the cheap
    * garbled-text detector (low = repeated-char junk, high =
    * random/encoded spills). Shuffle-free per-row run-length folds;
    * each −p·log₂p term rounds to 1e-9 then sums EXACTLY as decimals
    * (the chi-squared convention), and the exact decimal total ships
    * UNROUNDED — order-independent, and safe from the .5e-6 final-
    * rounding ties a grained sum makes likely. */
  val qCharEntropy = QueryDef("q_char_entropy",
    (spark, dir) => graft.text.Entropy.entropyStats(
      Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH d AS (
           |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
           |), ch AS (
           |  SELECT doc_id,
           |         unnest(list_filter(string_split_regex(text, ''),
           |                            c -> c <> '')) AS s
           |  FROM d
           |), chc AS (
           |  SELECT doc_id, s, count(*) AS c FROM ch GROUP BY doc_id, s
           |), chn AS (
           |  SELECT doc_id, SUM(c) AS n FROM chc GROUP BY doc_id
           |), che AS (
           |  SELECT c.doc_id,
           |         -CAST(SUM(CAST(round((c.c / n.n) *
           |             log2(c.c / n.n), 9) AS DECIMAL(38,12)))
           |           AS DOUBLE) AS char_entropy
           |  FROM chc c JOIN chn n USING (doc_id) GROUP BY c.doc_id
           |), tk AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS s FROM d
           |), tkc AS (
           |  SELECT doc_id, s, count(*) AS c FROM tk GROUP BY doc_id, s
           |), tkn AS (
           |  SELECT doc_id, SUM(c) AS n FROM tkc GROUP BY doc_id
           |), tke AS (
           |  SELECT c.doc_id,
           |         -CAST(SUM(CAST(round((c.c / n.n) *
           |             log2(c.c / n.n), 9) AS DECIMAL(38,12)))
           |           AS DOUBLE) AS token_entropy
           |  FROM tkc c JOIN tkn n USING (doc_id) GROUP BY c.doc_id
           |)
           |SELECT d.doc_id,
           |       -- empty (non-null) text degenerates to ONE empty symbol
           |       -- on the engine side (entropy −0.0, the single-symbol
           |       -- value); the ch CTE above filters empty chars and
           |       -- would drop the doc to NULL — coalesce to the engine's
           |       -- answer so the hash gate cannot diverge on empty text
           |       -- (the token side already agrees: string_split('',' ')
           |       -- IS the single empty token in both engines)
           |       COALESCE(che.char_entropy,
           |                CASE WHEN length(d.text) = 0
           |                     THEN -CAST(0.0 AS DOUBLE) END)
           |         AS char_entropy,
           |       tke.token_entropy,
           |       CAST(length(d.text) AS BIGINT) AS n_chars,
           |       CAST(len(string_split(d.text, ' ')) AS BIGINT)
           |         AS n_tokens
           |FROM d
           |LEFT JOIN che ON che.doc_id = d.doc_id
           |LEFT JOIN tke ON tke.doc_id = d.doc_id
           |ORDER BY d.doc_id""".stripMargin))

  /** Quality-classifier feature dim (a power of two, so the signed
    * Spark `pmod` and the oracle's unsigned `mod` agree: 2⁶⁴ ≡ 0 mod
    * dim) and the exported-model path (the PQ-codebook convention). */
  val QcDim = 256
  val QcWeightsPath = "/tmp/graft_qc_weights.parquet"

  /** TRAINED document-quality classifier under the hash gate
    * ([[graft.text.QualityClassifier]]): logistic regression over
    * hashed bag-of-tokens features, trained IN THE ENGINE with
    * decimal-exact gradient sums (bit-identical weights at any
    * partitioning — spec-asserted) against a target-language label,
    * then applied in-plan. The trained weights export as parquet and
    * the oracle re-derives every document's EXACT margin from them —
    * FNV token hash, bucket mod, tf features, the decimal-summed
    * sparse dot product — bit-for-bit; only the sigmoid `score` is
    * libm-rounded (1e-6), and `keep` decides on the exact margin.
    * This is the curation stage after the rule-based filters (CCNet /
    * LLaMA / GPT-3 all run one); the per-iteration cost is two
    * shuffles at (doc, bucket) sparse cardinality — no dense matrix,
    * no vector collect. */
  val qQualityClassifier = QueryDef("q_quality_classifier",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val model = graft.text.QualityClassifier.trainCached(
        docs.withColumn("y", (col("lang") === "en").cast("double")),
        "doc_id", "text", "y", dim = QcDim, iters = 8, lr = 4.0)
      graft.text.QualityClassifier.exportModel(spark, model, QcWeightsPath)
      graft.text.QualityClassifier.score(docs, "doc_id", "text", model)
        .orderBy("doc_id")
    },
    Some(classifierOracle(QcWeightsPath)))

  /** The DuckDB inference replay for a trained classifier exported at
    * `weightsPath` — shared by the batch entry and the model-in-stream
    * entry ([[graft.StreamingQueries.qStreamQuality]]); deterministic
    * training makes both exported models bit-identical, so one SQL
    * text serves both. */
  def classifierOracle(weightsPath: String): String =
    s"""WITH wt AS (
       |  SELECT bucket, wv
       |  FROM read_parquet('$weightsPath/*.parquet')
       |), d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents WHERE text IS NOT NULL
       |), tok AS (
       |  SELECT doc_id, len(toks) AS n, unnest(toks) AS tok FROM d
       |), dt AS (
       |  SELECT DISTINCT tok FROM tok
       |), hs AS (  -- unsigned fold mod dim == Spark's signed pmod
       |  SELECT tok, CAST(${fnvFoldSql("tok")} % $QcDim AS BIGINT)
       |           AS bucket
       |  FROM dt
       |), feat AS (
       |  SELECT t.doc_id, h.bucket,
       |         CAST(count(*) AS DOUBLE) / any_value(t.n) AS x
       |  FROM tok t JOIN hs h ON h.tok = t.tok
       |  GROUP BY t.doc_id, h.bucket
       |), dot AS (
       |  SELECT f.doc_id,
       |         CAST(SUM(CAST(f.x * w.wv AS DECIMAL(38,15)))
       |              AS DOUBLE)
       |           + (SELECT wv FROM wt WHERE bucket = -1) AS margin
       |  FROM feat f JOIN wt w ON w.bucket = f.bucket
       |  GROUP BY f.doc_id
       |)
       |SELECT doc_id, margin,
       |       round(1.0 / (1.0 + exp(-margin)), 6) AS score,
       |       margin > 0 AS keep
       |FROM dot ORDER BY doc_id""".stripMargin

  /** Winnowing k-gram size / window (Schleimer et al. 2003). */
  val WinnowK = 8
  val WinnowW = 8

  /** Document fingerprinting via winnowing (rolling-hash k-gram minima):
    * per-document sketch summarized as (count, min, max, sum) of the
    * distinct fingerprints — order-insensitive exact integers, so the
    * compare validates the whole kernel (code-point iteration, rolling
    * polynomial hash, window minima, dedup) against a from-scratch
    * DuckDB re-derivation. Unlike whole-doc [[qDedupExact]] fingerprints
    * or bag-of-shingles Jaccard, winnowing sketches support CONTAINMENT
    * detection: any shared run ≥ k+w−1 chars guarantees a shared
    * fingerprint. */
  /** Shared DuckDB CTE chain ending in `fps(doc_id, fps)` — the winnow
    * sketch re-derived from scratch (code points → rolling-hash fold →
    * window minima → distinct). INT32 gotcha: DuckDB literals are INT32 —
    * the hash multiplier must be cast to BIGINT or the fold overflows at
    * the third character. */
  private val winnowCtes: String =
    s"""cps AS (
       |  SELECT doc_id,
       |         list_apply(string_split_regex(text, ''), c -> ascii(c)) AS cs
       |  FROM documents
       |), hs AS (
       |  SELECT doc_id,
       |         [list_reduce(list_prepend(CAST(0 AS BIGINT), cs[i:i+${WinnowK - 1}]),
       |                      (a, x) -> (a * CAST(${WinnowKernels.Base} AS BIGINT) + x)
       |                                % ${WinnowKernels.Mod})
       |          for i in generate_series(1, len(cs) - ${WinnowK - 1})] AS hs
       |  FROM cps
       |), fps AS (
       |  SELECT doc_id,
       |         list_distinct([list_min(hs[j:least(j + ${WinnowW - 1}, len(hs))])
       |           for j in generate_series(1, greatest(len(hs) - ${WinnowW - 1}, 1))]) AS fps
       |  FROM hs WHERE len(hs) > 0
       |)""".stripMargin

  val qDocFingerprints = QueryDef("q_doc_fingerprints",
    (spark, dir) => Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.expr.WinnowSketch(col("text"), WinnowK, WinnowW).as("fps"))
      .filter(size(col("fps")) > 0)
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fps"),
        array_min(col("fps")).as("fp_min"),
        array_max(col("fps")).as("fp_max"),
        aggregate(col("fps"), lit(0L), (a, x) => a + x).as("fp_sum"))
      .orderBy("doc_id"),
    Some(s"""WITH $winnowCtes
            |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
            |       CAST(list_min(fps) AS BIGINT) AS fp_min,
            |       CAST(list_max(fps) AS BIGINT) AS fp_max,
            |       CAST(list_sum(fps) AS BIGINT) AS fp_sum
            |FROM fps ORDER BY doc_id""".stripMargin))

  /** Containment evidence threshold / stop-fingerprint doc-freq cap.
    * Density 2/(w+1) ⇒ ≥ 8 shared fingerprints ≈ a shared run of ~40+
    * characters (or several shorter ones) — enough to clear the small-
    * vocabulary corpus's chance 8-gram collisions, which a threshold of
    * 2 does not. */
  val ContainMinShared = 8
  val ContainMaxDf = 20

  /** Partial-copy detection: document pairs sharing ≥ [[ContainMinShared]]
    * winnow fingerprints after dropping boilerplate fingerprints seen in
    * more than [[ContainMaxDf]] docs — the containment shape exact dedup
    * and whole-doc Jaccard both miss. The planted near-dup pairs surface
    * here too (they share nearly all fingerprints), so the result is
    * non-trivial at every sf. */
  val qDedupContainment = QueryDef("q_dedup_containment",
    (spark, dir) => Dedup.containmentPairs(
      Tables.documents(spark, dir), "doc_id", "text",
      WinnowK, WinnowW, ContainMinShared, ContainMaxDf)
      .orderBy("doc_a", "doc_b"),
    Some(s"""WITH $winnowCtes,
            |fp AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
            |kept AS (
            |  SELECT doc_id, fp FROM fp
            |  WHERE fp IN (SELECT fp FROM fp GROUP BY fp
            |               HAVING count(*) <= $ContainMaxDf)
            |)
            |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            |       CAST(count(*) AS BIGINT) AS n_shared
            |FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
            |GROUP BY 1, 2 HAVING count(*) >= $ContainMinShared
            |ORDER BY doc_a, doc_b""".stripMargin))

  /** Incremental (daily-ingest) exact dedup: the corpus is the 80% of
    * documents with `doc_id % 10 < 8`, the incoming batch is the other
    * 20%; [[Dedup.dedupAgainst]] keeps batch rows whose content is new
    * (anti-join on the 8-byte content fingerprint) and unique within the
    * batch (min doc id per content). The oracle anti-joins on the raw
    * text — agreement doubles as a fingerprint-faithfulness check, like
    * [[qDedupExact]]. */
  val qDedupIncremental = QueryDef("q_dedup_incremental",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val corpus = docs.filter(col("doc_id") % 10 < 8)
      val batch = docs.filter(col("doc_id") % 10 >= 8)
      Dedup.dedupAgainst(corpus, batch, "doc_id", "text")
        .select("doc_id")
        .orderBy("doc_id")
    },
    Some("""WITH corpus AS (
           |  SELECT text FROM documents WHERE doc_id % 10 < 8
           |), batch AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8
           |), keepers AS (
           |  SELECT min(doc_id) AS doc_id, text FROM batch
           |  WHERE text IS NOT NULL GROUP BY text
           |)
           |SELECT k.doc_id FROM keepers k
           |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = k.text)
           |ORDER BY doc_id""".stripMargin))

  /** Containment-aware dedup survivors: partial-copy pairs → connected
    * components → keep the min-id doc per cluster. The full decision
    * pipeline oracle-checked end to end (winnow re-derivation +
    * df-capped pair join + recursive-CTE closure + anti-join). */
  val qDedupContainmentKeep = QueryDef("q_dedup_containment_keep",
    (spark, dir) => Dedup.containmentDedup(
      Tables.documents(spark, dir), "doc_id", "text",
      WinnowK, WinnowW, ContainMinShared, ContainMaxDf)
      .select("doc_id")
      .orderBy("doc_id"),
    Some(s"""WITH RECURSIVE $winnowCtes,
            |fp AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
            |kept AS (
            |  SELECT doc_id, fp FROM fp
            |  WHERE fp IN (SELECT fp FROM fp GROUP BY fp
            |               HAVING count(*) <= $ContainMaxDf)
            |), pairs AS (
            |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2 HAVING count(*) >= $ContainMinShared
            |), edges AS (
            |  SELECT doc_a AS src, doc_b AS dst FROM pairs
            |  UNION SELECT doc_b, doc_a FROM pairs
            |), reach(src, dst) AS (
            |  SELECT src, dst FROM edges
            |  UNION
            |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            |), labels AS (
            |  SELECT src AS doc_id, LEAST(src, min(dst)) AS cluster
            |  FROM reach GROUP BY src
            |)
            |SELECT doc_id FROM documents
            |WHERE doc_id NOT IN (SELECT doc_id FROM labels WHERE doc_id <> cluster)
            |ORDER BY doc_id""".stripMargin))

  /** The DuckDB mirror of token-trigram Jaccard pairs ≥ [[MinJaccard]]:
    * a shared CTE chain ending in `dup_pairs(doc_a, doc_b, jaccard)` —
    * used by the exact entry, the LSH entry (verified candidates →
    * identical output up to band-miss probability ≈ 5e-8), and the
    * cluster entry's recursive closure. */
  private def jaccardCtesFrom(from: String): String =
    // text IS NOT NULL: Spark's ShinglesExpr is null-safe (NULL text →
    // no shingles), but DuckDB's string_split(NULL)+concat_ws chain
    // would fabricate an '' shingle and pair NULL-text docs together
    s"""toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM $from
       |  WHERE text IS NOT NULL
       |), sh AS (
       |  SELECT DISTINCT doc_id, unnest(${shinglesOverWsSql(ShingleN)}) AS shingle
       |  FROM toks
       |), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |pre_pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), dup_pairs AS (
       |  SELECT doc_a, doc_b,
       |         CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
       |  FROM pre_pairs
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= $MinJaccard
       |)""".stripMargin

  private val jaccardCtes: String = jaccardCtesFrom("documents")

  // private[graft]: the streaming near-dup entry verifies its drained
  // candidate set to EXACT jaccard pairs, landing on this same mirror
  private[graft] val jaccardOracle: String =
    s"""WITH $jaccardCtes
       |SELECT doc_a, doc_b, jaccard FROM dup_pairs
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Exact n-gram Jaccard near-dup pairs (inverted-index self-join). */
  val qDedupJaccard = QueryDef("q_dedup_jaccard",
    (spark, dir) => Dedup.jaccardPairs(
      Tables.documents(spark, dir), "doc_id", "text", ShingleN, MinJaccard)
      .orderBy("doc_a", "doc_b"),
    Some(jaccardOracle))

  /** MinHash+LSH near-dup pairs, exact-verified — the 100 TB scale path.
    * Same oracle as [[qDedupJaccard]]: banding (k=128, b=32) recalls every
    * pair ≥ 0.8 with probability 1 − 5e-8 and verification removes all
    * false positives, so outputs match exactly on this corpus. */
  val qDedupMinhash = QueryDef("q_dedup_minhash_lsh",
    // failOnOverflow: this path is oracle-checked and the DuckDB mirror
    // has no bucket cap — a silently engaged cap would surface as a hash
    // mismatch, so cap engagement fails the query loudly instead
    (spark, dir) => Dedup.minhashLshPairs(
      Tables.documents(spark, dir), "doc_id", "text", ShingleN, MinJaccard,
      failOnOverflow = true)
      .orderBy("doc_a", "doc_b"),
    Some(jaccardOracle))

  /** CHARACTER-LEVEL near-dup refinement — edit distance over the
    * near-dup candidate stream: the dedup family member the
    * shingle/sketch metrics can't express (OCR noise, typo-level
    * variants, and small in-place edits move Levenshtein far less than
    * token-set metrics). Blocking reuses the PROVEN minhash-LSH
    * candidates (k-bounded buckets, failOnOverflow certificate);
    * verification is `levenshtein(a, b) ≤ ceil(0.25 × max(len))` —
    * both engines implement the classic unit-cost DP, so the integer
    * distance is bit-identical. At 100 TB the O(L²) DP runs only on
    * the bucket-blocked candidate stream, never all pairs. Oracle:
    * the exact-Jaccard replay of the candidate set (banding recall
    * ≈ 1 on this corpus — the [[qDedupMinhash]] argument) with the
    * same Levenshtein filter. */
  val MaxEditFrac = 0.25
  val qDedupEditDist = QueryDef("q_dedup_editdist",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        ShingleN, MinJaccard, failOnOverflow = true)
      val t = docs.select(col("doc_id"), col("text"))
      // A broadcast HINT does not degrade when the corpus outgrows the
      // driver — Spark honors it up to the hard relation limit and then
      // the query dies (the very cliff the r13 sf5 probe measured in
      // lshThresholdPairs). So the text side broadcasts ONLY while its
      // Catalyst size estimate (file-size based for parquet scans) is
      // comfortably small; past that it degrades to SHUFFLE_HASH — an
      // id+text shuffle, linear in the corpus, no side ever built on
      // the driver.
      // compare in BigInt space: Catalyst size estimates can exceed
      // Long.MaxValue, and a .toLong wrap-to-negative would read as
      // "small" — the exact cliff this guard exists to avoid
      val textSmall = t.queryExecution.optimizedPlan.stats.sizeInBytes <=
        BigInt(1L << 30)
      def textSide(d: org.apache.spark.sql.DataFrame)
          : org.apache.spark.sql.DataFrame =
        if (textSmall) broadcast(d) else d.hint("shuffle_hash")
      pairs
        // the candidate stream is byte-tiny but each pair costs an
        // O(L²) DP. Two optimizer behaviors conspire to serialize it:
        // AQE coalesces the byte-small join exchanges to ONE partition,
        // and Catalyst sinks the levenshtein projection/filter BELOW a
        // post-join repartition to shuffle fewer bytes — both optimize
        // bytes, not CPU (the multimodal codec lesson, SCALE.md r13).
        // So: explicit-count repartition of the PAIRS (AQE-preserved),
        // then size-guarded broadcast text joins — no exchange above
        // the spread, and the DP's inputs don't exist below it, so it
        // cannot sink. (On the shuffle_hash fallback the join exchanges
        // are byte-big and AQE keeps them parallel anyway.)
        .repartition(spark.sparkContext.defaultParallelism,
          col("doc_a"), col("doc_b"))
        .join(textSide(t.select(col("doc_id").as("doc_a"),
          col("text").as("ta"))), "doc_a")
        .join(textSide(t.select(col("doc_id").as("doc_b"),
          col("text").as("tb"))), "doc_b")
        .withColumn("edit_dist", levenshtein(col("ta"), col("tb")))
        .filter(col("edit_dist") <=
          ceil(greatest(length(col("ta")), length(col("tb"))) * MaxEditFrac))
        .select("doc_a", "doc_b", "edit_dist")
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH $jaccardCtes
            |SELECT p.doc_a, p.doc_b,
            |       CAST(levenshtein(a.text, b.text) AS INT) AS edit_dist
            |FROM dup_pairs p
            |JOIN documents a ON a.doc_id = p.doc_a
            |JOIN documents b ON b.doc_id = p.doc_b
            |WHERE levenshtein(a.text, b.text)
            |      <= ceil(greatest(length(a.text), length(b.text)) * $MaxEditFrac)
            |ORDER BY doc_a, doc_b""".stripMargin))

  /** Near-dup clusters: connected components over the LSH pairs, one row
    * per cluster with the keeper (min id) and member count. Oracle:
    * transitive closure via recursive CTE over the same pair set. */
  val qDedupClusters = QueryDef("q_dedup_clusters",
    (spark, dir) => {
      val pairs = Dedup.minhashLshPairs(
        Tables.documents(spark, dir), "doc_id", "text", ShingleN, MinJaccard,
        failOnOverflow = true)
      Dedup.duplicateClusters(pairs)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_members"))
        .orderBy("cluster")
    },
    Some(s"""WITH RECURSIVE $jaccardCtes,
            |edges AS (
            |  SELECT doc_a AS src, doc_b AS dst FROM dup_pairs
            |  UNION SELECT doc_b, doc_a FROM dup_pairs
            |), reach(src, dst) AS (
            |  SELECT src, dst FROM edges
            |  UNION
            |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            |), labels AS (
            |  SELECT src AS doc_id, LEAST(src, min(dst)) AS cluster
            |  FROM reach GROUP BY src
            |)
            |SELECT cluster, CAST(count(*) AS BIGINT) AS n_members
            |FROM labels GROUP BY cluster ORDER BY cluster""".stripMargin))

  /** Quality gate for the end-to-end prep pipeline (corpus quality spans
    * ~0.55–0.75; 0.62 drops the low-value ~40%). */
  val MinQuality = 0.62

  /** The end-to-end training-data prep pipeline as ONE query:
    * quality-filter → exact dedup → near-dup cluster keepers → token-
    * budget sequence packing → per-sequence stats. Every stage is the
    * library operator; the oracle re-derives the whole chain in SQL
    * (quality mirror, GROUP BY text, recursive-CTE closure, window
    * cumsum) — the strongest single correctness statement the engine
    * makes. */
  val qTrainingPrep = QueryDef("q_training_data_prep",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val qualityPass = docs.filter(qualityScore(col("text")) >= MinQuality)
      // exactKeep feeds THREE full evaluations — the LSH signature pass
      // and the shingle-set verify pass inside minhashLshPairs, plus the
      // survivor anti-join — and each re-ran the scan + the qualityScore
      // kernel + the fingerprint dedup from scratch (r16 optimization
      // round, guide §1.2/§5). A LAZY localCheckpoint materializes it
      // once (during the cluster loop's first job) and the other two
      // consumers read blocks; lazy+fresh-RDD-per-invocation means no
      // CacheManager entry outlives the query (the duplicateClusters
      // persistence discipline). Projected to the two consumed columns
      // first so the blocks never carry the unused lang/source/n_chars.
      val exactKeep = Dedup.exactDedup(qualityPass, "doc_id", "text")
        .select(col("doc_id"), col("text"))
        .localCheckpoint(eager = false)
      val pairs = Dedup.minhashLshPairs(exactKeep, "doc_id", "text", ShingleN, MinJaccard,
        failOnOverflow = true)
      val dupDrops = Dedup.duplicateClusters(pairs)
        .filter(col("id") =!= col("cluster"))
        .select(col("id").as("doc_id"))
      val survivors = exactKeep.join(dupDrops, Seq("doc_id"), "left_anti")
      val toks = survivors
        .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
      // distributed prefix sum; bucket bounds come from the RAW table (a
      // superset of survivor ids — correctness-neutral, see PrefixSum),
      // so the bounds pass is a pruned parquet scan, not a re-run of the
      // whole dedup chain
      graft.operators.PrefixSum.runningTotal(toks, "doc_id", "n_tokens", "cum",
        boundsFrom = Some(docs.select("doc_id")))
        .withColumn("seq_id",
          floor((col("cum") - col("n_tokens")) / PipelineQueries.PackBudget))
        .groupBy("seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"))
        .orderBy("seq_id")
    },
    Some(s"""WITH RECURSIVE
            |q_docs AS (
            |  SELECT doc_id, text FROM documents
            |  -- CAST: a bare 0.62 literal is DECIMAL in DuckDB, and
            |  -- double>=decimal comparison semantics differ from Spark's
            |  -- double>=double exactly at boundary values (9 docs sit ON
            |  -- the threshold at sf0.1)
            |  WHERE ${qualityScoreSql("text")} >= CAST($MinQuality AS DOUBLE)
            |), exact_keep AS (
            |  -- null-text rows all survive (operator convention); min-id
            |  -- keeper per non-null content
            |  SELECT doc_id, text FROM q_docs
            |  WHERE text IS NULL OR doc_id IN
            |    (SELECT min(doc_id) FROM q_docs WHERE text IS NOT NULL GROUP BY text)
            |), ${jaccardCtesFrom("exact_keep")},
            |edges AS (
            |  SELECT doc_a AS src, doc_b AS dst FROM dup_pairs
            |  UNION SELECT doc_b, doc_a FROM dup_pairs
            |), reach(src, dst) AS (
            |  SELECT src, dst FROM edges
            |  UNION
            |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            |), labels AS (
            |  SELECT src AS doc_id, LEAST(src, min(dst)) AS cluster
            |  FROM reach GROUP BY src
            |), survivors AS (
            |  SELECT k.doc_id, len(string_split(k.text, ' ')) AS n_tokens
            |  FROM exact_keep k
            |  WHERE k.doc_id NOT IN (SELECT doc_id FROM labels WHERE doc_id <> cluster)
            |), packed AS (
            |  SELECT CAST(FLOOR((sum(n_tokens) OVER w - n_tokens)
            |           / ${PipelineQueries.PackBudget}) AS BIGINT) AS seq_id,
            |         n_tokens
            |  FROM survivors
            |  WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            |)
            |SELECT seq_id, CAST(count(*) AS BIGINT) AS n_docs,
            |       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
            |FROM packed GROUP BY seq_id ORDER BY seq_id""".stripMargin))

  /** SimHash near-dup pairs (hamming ≤ 3 on 64-bit token-multiset
    * SimHash). The oracle re-derives the WHOLE kernel from scratch in
    * DuckDB — per-token FNV-1a over UTF-8 bytes (code points expanded to
    * UTF-8 byte sequences; the 64-bit wraparound multiply runs in
    * HUGEINT mod 2^64, since DuckDB BIGINT overflow throws rather than
    * wraps), the per-bit ±1 majority vote, and the exact all-pairs
    * hamming filter. The Spark side's pigeonhole chunk blocking is an
    * exact optimization (any pair within radius h agrees on ≥1 of h+1
    * chunks), so the oracle skips the blocking and the results must
    * still match bit-for-bit. */
  val qDedupSimhash = QueryDef("q_dedup_simhash",
    (spark, dir) => Dedup.simhashPairs(
      Tables.documents(spark, dir), "doc_id", "text", maxHamming = 3)
      .orderBy("doc_a", "doc_b"),
    Some(s"""WITH toks AS (
            |  SELECT doc_id, string_split(text, ' ') AS ts
            |  FROM documents WHERE text IS NOT NULL
            |), hs AS (
            |  SELECT doc_id, [
            |    list_reduce(
            |      list_prepend(CAST('14695981039346656037' AS HUGEINT),
            |        flatten([
            |          CASE WHEN cp <= 127 THEN [cp]
            |               WHEN cp <= 2047 THEN [192 + cp // 64, 128 + cp % 64]
            |               WHEN cp <= 65535 THEN [224 + cp // 4096,
            |                 128 + (cp // 64) % 64, 128 + cp % 64]
            |               ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64,
            |                 128 + (cp // 64) % 64, 128 + cp % 64]
            |          END
            |          for cp in list_apply(
            |            list_filter(string_split_regex(t, ''), c -> c <> ''),
            |            c -> ascii(c))])),
            |      (a, x) -> ((a - a % 256 +
            |                  CAST(xor(CAST(a % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
            |                 * CAST('1099511628211' AS HUGEINT))
            |                % CAST('18446744073709551616' AS HUGEINT))
            |    for t in ts] AS hus
            |  FROM toks
            |), sims AS (
            |  SELECT doc_id,
            |    CAST(list_sum([
            |      CASE WHEN 2 * len(list_filter(hs2, h -> ((h >> j) & 1) = 1)) - len(hs2) > 0
            |           THEN CASE WHEN j = 63 THEN CAST(-9223372036854775807 - 1 AS BIGINT)
            |                     ELSE (CAST(1 AS BIGINT) << j) END
            |           ELSE CAST(0 AS BIGINT) END
            |      for j in generate_series(0, 63)]) AS BIGINT) AS simhash
            |  FROM (SELECT doc_id,
            |          [CASE WHEN hu >= CAST('9223372036854775808' AS HUGEINT)
            |                THEN CAST(hu - CAST('18446744073709551616' AS HUGEINT) AS BIGINT)
            |                ELSE CAST(hu AS BIGINT) END for hu in hus] AS hs2
            |        FROM hs)
            |)
            |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
            |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
            |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            |ORDER BY doc_a, doc_b""".stripMargin))

  /** KMV sketch size. Per-source distinct word-trigram counts are ~1k at
    * sf0.01 and ~10k at sf0.1 — above k at both scales, so the catalog
    * entry exercises the ESTIMATOR (k-th order statistic), not the
    * exact-count fallback. Relative error ≈ 1/√(k−2) ≈ 6%. */
  val KmvK = 256

  /** The FNV-1a 64-bit fold over a string SQL expression, as unsigned
    * HUGEINT in [0, 2⁶⁴) — the DuckDB mirror of
    * [[graft.expr.TextHashKernels.fnv1a64]]: code points → UTF-8 bytes →
    * byte fold mod 2⁶⁴ (multiplier as HUGEINT — BIGINT would overflow;
    * see the simhash oracle, which inlines the same fold). */
  private[graft] def fnvFoldSql(s: String): String =
    s"""list_reduce(
       |  list_prepend(CAST('14695981039346656037' AS HUGEINT),
       |    flatten([
       |      CASE WHEN cp <= 127 THEN [cp]
       |           WHEN cp <= 2047 THEN [192 + cp // 64, 128 + cp % 64]
       |           WHEN cp <= 65535 THEN [224 + cp // 4096,
       |             128 + (cp // 64) % 64, 128 + cp % 64]
       |           ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64,
       |             128 + (cp // 64) % 64, 128 + cp % 64]
       |      END
       |      for cp in list_apply(
       |        list_filter(string_split_regex($s, ''), c -> c <> ''),
       |        c -> ascii(c))])),
       |  (a, x) -> ((a - a % 256 +
       |              CAST(xor(CAST(a % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
       |             * CAST('1099511628211' AS HUGEINT))
       |            % CAST('18446744073709551616' AS HUGEINT))""".stripMargin

  private[graft] def P64: String = "CAST('18446744073709551616' AS HUGEINT)"

  /** Unsigned HUGEINT → signed BIGINT bit pattern (two's-complement wrap). */
  private[graft] def toSignedSql(u: String): String =
    s"""CASE WHEN $u >= CAST('9223372036854775808' AS HUGEINT)
       |     THEN CAST($u - $P64 AS BIGINT) ELSE CAST($u AS BIGINT) END""".stripMargin

  /** xor of two unsigned-HUGEINT COLUMN references in [0,2⁶⁴), result
    * back as unsigned HUGEINT. `v` must be < 2⁶³ (true for every shifted
    * operand here). Operands are repeated textually — pass column names,
    * not expressions. */
  private[graft] def xor64Sql(u: String, v: String): String = {
    val x = s"xor(${toSignedSql(u)}, CAST($v AS BIGINT))"
    s"""CASE WHEN $x < 0 THEN CAST($x AS HUGEINT) + $P64
       |     ELSE CAST($x AS HUGEINT) END""".stripMargin
  }

  /** (z · M) mod 2⁶⁴ with M split into 32-bit halves — a full 64×64
    * product overflows INT128 (DuckDB's HUGEINT), so fold the high half
    * mod 2³² before scaling: z·M ≡ z·lo + ((z mod 2³²)·hi mod 2³²)·2³². */
  private[graft] def mulModSql(z: String, hi: Long, lo: Long): String =
    s"""(($z * $lo) % $P64 +
       | ((($z % 4294967296) * $hi) % 4294967296) * 4294967296) % $P64""".stripMargin

  /** The SplitMix64 finalizer over a CTE column `z` (unsigned HUGEINT in
    * [0,2⁶⁴)), carried alongside `keys`: emits CTE stages `<p>0..<p>5`;
    * read the mixed value as `z` from `<p>5`. Mirrors
    * [[graft.expr.TextHashKernels.splitmix64]] stage for stage. */
  private[graft] def splitmixCtesSql(src: String, keys: String, p: String): String =
    s"""${p}0 AS (
       |  SELECT $keys, (z + CAST('11400714819323198485' AS HUGEINT)) % $P64 AS z FROM $src
       |), ${p}1 AS (SELECT $keys, ${xor64Sql("z", "z // 1073741824")} AS z FROM ${p}0
       |), ${p}2 AS (
       |  SELECT $keys, ${mulModSql("z", 3210233709L, 484763065L)} AS z FROM ${p}1
       |), ${p}3 AS (SELECT $keys, ${xor64Sql("z", "z // 134217728")} AS z FROM ${p}2
       |), ${p}4 AS (
       |  SELECT $keys, ${mulModSql("z", 2496678331L, 321982955L)} AS z FROM ${p}3
       |), ${p}5 AS (SELECT $keys, ${xor64Sql("z", "z // 2147483648")} AS z FROM ${p}4)""".stripMargin

  /** (z · M) mod 2⁶⁴ over a UBIGINT column `z` — the native-64-bit sibling
    * of [[mulModSql]]: only the z·lo product is promoted to HUGEINT; the
    * low-half cross term stays in UBIGINT (max (2³²−1)·hi < 2⁶⁴ for both
    * SplitMix multipliers). */
  private[graft] def mulModUbSql(z: String, hi: Long, lo: Long): String =
    s"""CAST((CAST($z AS HUGEINT) * $lo +
       | (($z % 4294967296) * $hi % 4294967296) * CAST(4294967296 AS HUGEINT))
       | % $P64 AS UBIGINT)""".stripMargin

  /** The SplitMix64 finalizer over a UBIGINT column `z` — semantically
    * identical to [[splitmixCtesSql]] but ~6× faster: xor and logical
    * shift run NATIVE on DuckDB's UBIGINT (the HUGEINT variant spells
    * every xor as a 6-op signed/unsigned CASE conversion), the golden-
    * ratio increment wraps via one comparison, and only the two
    * multiplies touch HUGEINT. Exists for the MinHash-union oracle,
    * which pushes |shingles|×k rows through the chain — 256× the volume
    * of the KMV/CMS oracles that use the HUGEINT form. Emits stages
    * `<p>a..<p>d`; read the mixed value from `<p>d`. */
  private[graft] def splitmixUbCtesSql(src: String, keys: String, p: String): String = {
    val gold = java.lang.Long.toUnsignedString(0x9e3779b97f4a7c15L)
    val goldC = java.lang.Long.toUnsignedString(-0x9e3779b97f4a7c15L) // 2⁶⁴ − gold
    s"""${p}a AS (
       |  SELECT $keys, CASE WHEN z < CAST('$goldC' AS UBIGINT)
       |                     THEN z + CAST('$gold' AS UBIGINT)
       |                     ELSE z - CAST('$goldC' AS UBIGINT) END AS z FROM $src
       |), ${p}b AS (SELECT $keys,
       |  ${mulModUbSql("xor(z, z >> 30)", 3210233709L, 484763065L)} AS z FROM ${p}a
       |), ${p}c AS (SELECT $keys,
       |  ${mulModUbSql("xor(z, z >> 27)", 2496678331L, 321982955L)} AS z FROM ${p}b
       |), ${p}d AS (SELECT $keys, xor(z, z >> 31) AS z FROM ${p}c)""".stripMargin
  }

  /** UBIGINT column → signed BIGINT bit pattern (two's-complement wrap) —
    * the [[toSignedSql]] sibling for the native-64-bit chain. */
  private[graft] def ubToSignedSql(u: String): String =
    s"""CASE WHEN $u >= CAST('9223372036854775808' AS UBIGINT)
       |     THEN CAST($u - CAST('9223372036854775808' AS UBIGINT) AS BIGINT)
       |          + (-9223372036854775807 - 1)
       |     ELSE CAST($u AS BIGINT) END""".stripMargin

  /** Per-source distinct-shingle cardinality: KMV sketch estimate beside
    * the exact count. The estimate is HASH-CHECKED, not "close": KMV
    * depends only on the set of FNV hashes, so DuckDB re-deriving the
    * same k-th order statistic from the same hashes reproduces the
    * estimate bit-for-bit (unsigned→double conversion spelled
    * signed-then-wrap on both sides — see [[graft.expr.KmvAgg]]). */
  val qDistinctKmv = QueryDef("q_distinct_kmv",
    (spark, dir) => {
      val sh = Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
        .select(col("source"),
          explode(graft.expr.ShinglesExpr(col("text"), ShingleN)).as("shingle"))
      sh.groupBy("source").agg(
        graft.expr.KmvAgg(
          graft.expr.Fingerprint64(col("shingle")), KmvK).as("est_distinct_shingles"),
        countDistinct(col("shingle")).as("exact_distinct_shingles"))
        .orderBy("source")
    },
    Some(s"""WITH toks AS (
            |  SELECT source, doc_id, string_split(text, ' ') AS ws
            |  FROM documents WHERE text IS NOT NULL
            |), sh AS (
            |  SELECT DISTINCT source, unnest(${shinglesOverWsSql(ShingleN)}) AS shingle
            |  FROM toks
            |), hs AS (
            |  SELECT source, ${fnvFoldSql("shingle")} AS z
            |  FROM sh
            |), ${splitmixCtesSql("hs", "source", "s")},
            |dh AS (
            |  SELECT DISTINCT source, z AS h FROM s5
            |), ranked AS (
            |  SELECT source, h,
            |         row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            |  FROM dh
            |), stats AS (
            |  SELECT source, count(*) AS ndh,
            |         max(CASE WHEN rn = $KmvK THEN h END) AS kth
            |  FROM ranked GROUP BY source
            |), ex AS (
            |  SELECT source, count(DISTINCT shingle) AS n FROM sh GROUP BY source
            |)
            |SELECT stats.source,
            |  CASE WHEN kth IS NULL THEN CAST(ndh AS DOUBLE)
            |       ELSE (CAST($KmvK AS DOUBLE) - 1.0) * 18446744073709551616.0 /
            |            (CASE WHEN kth < CAST('9223372036854775808' AS HUGEINT)
            |                  THEN CAST(CAST(kth AS BIGINT) AS DOUBLE)
            |                  ELSE CAST(CAST(kth - CAST('18446744073709551616' AS HUGEINT)
            |                                 AS BIGINT) AS DOUBLE)
            |                       + 18446744073709551616.0 END)
            |  END AS est_distinct_shingles,
            |  CAST(ex.n AS BIGINT) AS exact_distinct_shingles
            |FROM stats JOIN ex ON stats.source = ex.source
            |ORDER BY stats.source""".stripMargin))

  /** SKETCH-PARTIALS rollup for KMV — the order-statistics sibling of
    * [[qDistinctHllRollup]], closing the reaggregable-partials family
    * (HLL, CMS, DDSketch, now KMV): ONE corpus scan builds per-source
    * [[graft.expr.KmvSketchAgg]] sketches (≤ k sorted longs each in the
    * canonical wire form), and the corpus-wide cardinality is answered
    * by union-merging those 20 sketches ([[graft.expr.KmvMergeAgg]]) and
    * estimating ([[graft.expr.KmvEstimate]]) — no second data pass.
    * Merge is lossless (the k smallest of a union ≡ the k smallest of
    * the parts' k-minima, spec-asserted BYTE-for-byte), so the 'ALL'
    * estimate is bit-identical to sketching the union directly; DuckDB
    * re-derives both levels from the same hash chain and the whole
    * result stays hash-checked. The global exact is NOT the sum of
    * per-source exacts (shingles cross sources) — the merge the sketch
    * union gets right. */
  val qDistinctKmvRollup = QueryDef("q_distinct_kmv_rollup",
    (spark, dir) => {
      val sh = Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
        .select(col("source"),
          explode(graft.expr.ShinglesExpr(col("text"), ShingleN)).as("shingle"))
      val perSrc = sh.groupBy("source").agg(
        graft.expr.KmvAgg.sketch(
          graft.expr.Fingerprint64(col("shingle")), KmvK).as("sk"),
        countDistinct(col("shingle")).as("exact_distinct_shingles"))
      val globalRow = perSrc
        .agg(graft.expr.KmvAgg.mergeSketches(col("sk"), KmvK).as("sk"))
        .crossJoin(sh.agg(
          countDistinct(col("shingle")).as("exact_distinct_shingles")))
        .select(lit("ALL").as("source"),
          graft.expr.KmvAgg.estimate(col("sk"), KmvK).as("est_distinct_shingles"),
          col("exact_distinct_shingles"))
      perSrc.select(col("source"),
          graft.expr.KmvAgg.estimate(col("sk"), KmvK).as("est_distinct_shingles"),
          col("exact_distinct_shingles"))
        .unionByName(globalRow)
        .orderBy("source")
    },
    Some(s"""WITH toks AS (
            |  SELECT source, doc_id, string_split(text, ' ') AS ws
            |  FROM documents WHERE text IS NOT NULL
            |), sh AS (
            |  SELECT DISTINCT source, unnest(${shinglesOverWsSql(ShingleN)}) AS shingle
            |  FROM toks
            |), hs AS (
            |  SELECT source, ${fnvFoldSql("shingle")} AS z
            |  FROM sh
            |), ${splitmixCtesSql("hs", "source", "s")},
            |dh AS (
            |  SELECT DISTINCT source, z AS h FROM s5
            |), dhl AS (
            |  SELECT source, h FROM dh
            |  UNION ALL SELECT 'ALL' AS source, h FROM dh
            |), dhd AS (
            |  SELECT DISTINCT source, h FROM dhl
            |), ranked AS (
            |  SELECT source, h,
            |         row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            |  FROM dhd
            |), stats AS (
            |  SELECT source, count(*) AS ndh,
            |         max(CASE WHEN rn = $KmvK THEN h END) AS kth
            |  FROM ranked GROUP BY source
            |), ex AS (
            |  SELECT source, count(DISTINCT shingle) AS n FROM sh GROUP BY source
            |  UNION ALL SELECT 'ALL', count(DISTINCT shingle) FROM sh
            |)
            |SELECT stats.source,
            |  CASE WHEN kth IS NULL THEN CAST(ndh AS DOUBLE)
            |       ELSE (CAST($KmvK AS DOUBLE) - 1.0) * 18446744073709551616.0 /
            |            (CASE WHEN kth < CAST('9223372036854775808' AS HUGEINT)
            |                  THEN CAST(CAST(kth AS BIGINT) AS DOUBLE)
            |                  ELSE CAST(CAST(kth - CAST('18446744073709551616' AS HUGEINT)
            |                                 AS BIGINT) AS DOUBLE)
            |                       + 18446744073709551616.0 END)
            |  END AS est_distinct_shingles,
            |  CAST(ex.n AS BIGINT) AS exact_distinct_shingles
            |FROM stats JOIN ex ON stats.source = ex.source
            |ORDER BY stats.source""".stripMargin))

  /** KMV SET OPERATIONS — corpus-overlap estimation from per-source
    * sketches alone ([[graft.expr.KmvJaccard]], the theta-sketch-style
    * trick over bottom-k state): every source pair's shingle-set
    * Jaccard and intersection cardinality are estimated from the two
    * 256-hash sketches — no second corpus pass, no pairwise shingle
    * join — which is how cross-corpus contamination is screened at
    * 100 TB (the EXACT decontamination pass, `q_decontaminate`, then
    * runs only on the pairs the sketches flag). The union estimate is
    * lossless-merge + the pinned KMV estimator; Jaccard is an exact
    * small-integer ratio over the union's bottom-k; intersection is
    * their product (one pinned IEEE multiply) — all re-derived by the
    * oracle from the same hash chain, so all 190 pair rows
    * hash-match. */
  val qCorpusOverlapKmv = QueryDef("q_corpus_overlap_kmv",
    (spark, dir) => {
      val sh = Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
        .select(col("source"),
          explode(graft.expr.ShinglesExpr(col("text"), ShingleN)).as("shingle"))
      val sks = sh.groupBy("source").agg(
        graft.expr.KmvAgg.sketch(
          graft.expr.Fingerprint64(col("shingle")), KmvK).as("sk"))
      val a = sks.select(col("source").as("src_a"), col("sk").as("sk_a"))
      val b = sks.select(col("source").as("src_b"), col("sk").as("sk_b"))
      a.join(broadcast(b), col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"),
          graft.expr.KmvAgg.estimate(
            graft.expr.KmvAgg.union(col("sk_a"), col("sk_b"), KmvK),
            KmvK).as("union_est"),
          graft.expr.KmvAgg.jaccard(
            col("sk_a"), col("sk_b"), KmvK).as("jaccard_est"))
        .withColumn("inter_est", col("jaccard_est") * col("union_est"))
        .orderBy("src_a", "src_b")
    },
    Some(s"""WITH toks AS (
            |  SELECT source, doc_id, string_split(text, ' ') AS ws
            |  FROM documents WHERE text IS NOT NULL
            |), sh AS (
            |  SELECT DISTINCT source, unnest(${shinglesOverWsSql(ShingleN)}) AS shingle
            |  FROM toks
            |), hs AS (
            |  SELECT source, ${fnvFoldSql("shingle")} AS z
            |  FROM sh
            |), ${splitmixCtesSql("hs", "source", "s")},
            |dh AS (
            |  SELECT DISTINCT source, z AS h FROM s5
            |), sk AS (
            |  SELECT source, h FROM (
            |    SELECT source, h,
            |           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            |    FROM dh)
            |  WHERE rn <= $KmvK
            |), pairs AS (
            |  SELECT a.source AS src_a, b.source AS src_b
            |  FROM (SELECT DISTINCT source FROM sk) a
            |  JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source
            |), uh AS (
            |  SELECT p.src_a, p.src_b, s.h,
            |         max(CASE WHEN s.source = p.src_a THEN 1 ELSE 0 END) AS in_a,
            |         max(CASE WHEN s.source = p.src_b THEN 1 ELSE 0 END) AS in_b
            |  FROM pairs p JOIN sk s ON s.source IN (p.src_a, p.src_b)
            |  GROUP BY p.src_a, p.src_b, s.h
            |), ur AS (
            |  SELECT src_a, src_b, h, in_a, in_b,
            |         row_number() OVER (PARTITION BY src_a, src_b
            |           ORDER BY h) AS rn
            |  FROM uh
            |), stats AS (
            |  SELECT src_a, src_b,
            |         count(*) AS usz,
            |         max(CASE WHEN rn = $KmvK THEN h END) AS kth,
            |         sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
            |           AS n_both
            |  FROM ur WHERE rn <= $KmvK GROUP BY src_a, src_b
            |), est AS (
            |  SELECT src_a, src_b,
            |    CASE WHEN kth IS NULL THEN CAST(usz AS DOUBLE)
            |         ELSE (CAST($KmvK AS DOUBLE) - 1.0) * 18446744073709551616.0 /
            |              (CASE WHEN kth < CAST('9223372036854775808' AS HUGEINT)
            |                    THEN CAST(CAST(kth AS BIGINT) AS DOUBLE)
            |                    ELSE CAST(CAST(kth - CAST('18446744073709551616'
            |                                   AS HUGEINT) AS BIGINT) AS DOUBLE)
            |                         + 18446744073709551616.0 END)
            |    END AS union_est,
            |    CAST(n_both AS DOUBLE) / CAST(usz AS DOUBLE) AS jaccard_est
            |  FROM stats
            |)
            |SELECT src_a, src_b, union_est, jaccard_est,
            |       jaccard_est * union_est AS inter_est
            |FROM est ORDER BY src_a, src_b""".stripMargin))

  /** HLL register-count exponent: m = 2^10 = 1024 registers (~3.3%
    * relative error), small enough that the oracle's source×register
    * grid stays trivial and the linear-counting threshold 2.5m = 2560
    * splits this corpus's sources across BOTH estimator branches. */
  val HllP = 10

  /** Per-source distinct-shingle cardinality via HyperLogLog, beside the
    * exact count — the register-max sibling of [[qDistinctKmv]] (same
    * input, same hash chain, constant 2^[[HllP]]-byte state instead of
    * k longs). HASH-CHECKED, not "close": DuckDB rebuilds the register
    * array from the same SplitMix64-finalized FNV hashes (register = top
    * [[HllP]] bits, ρ via `length(ltrim(bin(w),'0'))`), re-derives the
    * integer 2⁶⁶-scaled harmonic sum in HUGEINT, and reproduces the
    * estimate bit-for-bit — see [[graft.expr.HllAgg]] for the pinned
    * arithmetic. */
  val qDistinctHll = QueryDef("q_distinct_hll",
    (spark, dir) => {
      val sh = Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
        .select(col("source"),
          explode(graft.expr.ShinglesExpr(col("text"), ShingleN)).as("shingle"))
      sh.groupBy("source").agg(
        graft.expr.HllAgg(
          graft.expr.Fingerprint64(col("shingle")), HllP).as("est_distinct_shingles"),
        countDistinct(col("shingle")).as("exact_distinct_shingles"))
        .orderBy("source")
    },
    Some {
      val m = 1 << HllP // 1024
      val wBits = 64 - HllP // 54
      val mask = (1L << wBits) - 1L
      val rhoMax = wBits + 1 // 55
      s"""WITH RECURSIVE pw(e, v) AS (
         |  SELECT 0, CAST(1 AS HUGEINT)
         |  UNION ALL SELECT e + 1, v * 2 FROM pw WHERE e < 66
         |), toks AS (
         |  SELECT source, doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL
         |), sh AS (
         |  SELECT DISTINCT source, unnest(${shinglesOverWsSql(ShingleN)}) AS shingle
         |  FROM toks
         |), hs AS (
         |  SELECT source, CAST(${fnvFoldSql("shingle")} AS UBIGINT) AS z
         |  FROM sh
         |), ${splitmixUbCtesSql("hs", "source", "s")},
         |rv AS (
         |  SELECT source, CAST(z >> $wBits AS BIGINT) AS j,
         |         $rhoMax - length(ltrim(bin(z & CAST('$mask' AS UBIGINT)), '0')) AS rho
         |  FROM sd
         |), regsx AS (
         |  SELECT source, j, max(rho) AS mj FROM rv GROUP BY source, j
         |), grid AS (
         |  SELECT g.source, r.range AS j
         |  FROM (SELECT DISTINCT source FROM sh) g CROSS JOIN range($m) r
         |), allr AS (
         |  SELECT grid.source, grid.j, coalesce(regsx.mj, 0) AS mj
         |  FROM grid LEFT JOIN regsx
         |    ON grid.source = regsx.source AND grid.j = regsx.j
         |), sums AS (
         |  SELECT allr.source, sum(pw.v) AS ssum,
         |         sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS vz
         |  FROM allr JOIN pw ON pw.e = 66 - allr.mj
         |  GROUP BY allr.source
         |), est AS (
         |  SELECT source,
         |    0.7213 / (1.0 + 1.079 / CAST($m AS DOUBLE)) * $m.0 * $m.0 /
         |    (CAST(ssum AS DOUBLE) / 73786976294838206464.0) AS e, vz
         |  FROM sums
         |), ex AS (
         |  SELECT source, count(DISTINCT shingle) AS n FROM sh GROUP BY source
         |)
         |SELECT est.source,
         |  CASE WHEN e <= 2.5 * $m.0 AND vz > 0
         |       THEN $m.0 * round(ln($m.0 / vz), 6) ELSE e END
         |    AS est_distinct_shingles,
         |  CAST(ex.n AS BIGINT) AS exact_distinct_shingles
         |FROM est JOIN ex ON est.source = ex.source
         |ORDER BY est.source""".stripMargin
    })

  /** SKETCH-PARTIALS rollup — the production distinct-count pattern at
    * 100 TB: the raw corpus is scanned ONCE into per-source
    * [[graft.expr.HllSketchAgg]] register arrays (one m-byte binary per
    * cell), and the corpus-wide cardinality is answered from those 20
    * sketches via [[graft.expr.HllMergeAgg]] + [[graft.expr.HllEstimate]]
    * — no second pass over the data. Register-wise max is lossless
    * (sketch of union ≡ merge of sketches), so the rolled-up 'ALL'
    * estimate is bit-identical to sketching the union directly; the
    * oracle re-derives BOTH levels from the same hash chain and the
    * whole result stays hash-checked. The exact columns come along for
    * honesty: note the global exact is NOT the sum of per-source exacts
    * (shingles cross sources) — precisely the merge the sketch gets
    * right. */
  val qDistinctHllRollup = QueryDef("q_distinct_hll_rollup",
    (spark, dir) => {
      val sh = Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
        .select(col("source"),
          explode(graft.expr.ShinglesExpr(col("text"), ShingleN)).as("shingle"))
      val perSrc = sh.groupBy("source").agg(
        graft.expr.HllAgg.sketch(
          graft.expr.Fingerprint64(col("shingle")), HllP).as("sk"),
        countDistinct(col("shingle")).as("exact_distinct_shingles"))
      val globalRow = perSrc
        .agg(graft.expr.HllAgg.mergeSketches(col("sk"), HllP).as("sk"))
        .crossJoin(sh.agg(
          countDistinct(col("shingle")).as("exact_distinct_shingles")))
        .select(lit("ALL").as("source"),
          graft.expr.HllAgg.estimate(col("sk")).as("est_distinct_shingles"),
          col("exact_distinct_shingles"))
      perSrc.select(col("source"),
          graft.expr.HllAgg.estimate(col("sk")).as("est_distinct_shingles"),
          col("exact_distinct_shingles"))
        .unionByName(globalRow)
        .orderBy("source")
    },
    Some {
      val m = 1 << HllP
      val wBits = 64 - HllP
      val mask = (1L << wBits) - 1L
      val rhoMax = wBits + 1
      s"""WITH RECURSIVE pw(e, v) AS (
         |  SELECT 0, CAST(1 AS HUGEINT)
         |  UNION ALL SELECT e + 1, v * 2 FROM pw WHERE e < 66
         |), toks AS (
         |  SELECT source, doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL
         |), sh AS (
         |  SELECT DISTINCT source, unnest(${shinglesOverWsSql(ShingleN)}) AS shingle
         |  FROM toks
         |), hs AS (
         |  SELECT source, CAST(${fnvFoldSql("shingle")} AS UBIGINT) AS z
         |  FROM sh
         |), ${splitmixUbCtesSql("hs", "source", "s")},
         |rv AS (
         |  SELECT source, CAST(z >> $wBits AS BIGINT) AS j,
         |         $rhoMax - length(ltrim(bin(z & CAST('$mask' AS UBIGINT)), '0')) AS rho
         |  FROM sd
         |), rvl AS (
         |  SELECT source, j, rho FROM rv
         |  UNION ALL SELECT 'ALL' AS source, j, rho FROM rv
         |), regsx AS (
         |  SELECT source, j, max(rho) AS mj FROM rvl GROUP BY source, j
         |), grid AS (
         |  SELECT g.source, r.range AS j
         |  FROM (SELECT DISTINCT source FROM sh
         |        UNION ALL SELECT 'ALL') g CROSS JOIN range($m) r
         |), allr AS (
         |  SELECT grid.source, grid.j, coalesce(regsx.mj, 0) AS mj
         |  FROM grid LEFT JOIN regsx
         |    ON grid.source = regsx.source AND grid.j = regsx.j
         |), sums AS (
         |  SELECT allr.source, sum(pw.v) AS ssum,
         |         sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS vz
         |  FROM allr JOIN pw ON pw.e = 66 - allr.mj
         |  GROUP BY allr.source
         |), est AS (
         |  SELECT source,
         |    0.7213 / (1.0 + 1.079 / CAST($m AS DOUBLE)) * $m.0 * $m.0 /
         |    (CAST(ssum AS DOUBLE) / 73786976294838206464.0) AS e, vz
         |  FROM sums
         |), ex AS (
         |  SELECT source, count(DISTINCT shingle) AS n FROM sh GROUP BY source
         |  UNION ALL SELECT 'ALL', count(DISTINCT shingle) FROM sh
         |)
         |SELECT est.source,
         |  CASE WHEN e <= 2.5 * $m.0 AND vz > 0
         |       THEN $m.0 * round(ln($m.0 / vz), 6) ELSE e END
         |    AS est_distinct_shingles,
         |  CAST(ex.n AS BIGINT) AS exact_distinct_shingles
         |FROM est JOIN ex ON est.source = ex.source
         |ORDER BY est.source""".stripMargin
    })

  /** CMS shape: d=4 rows × w=64 buckets, deliberately NARROW for this
    * corpus (~10² distinct tokens in 64 buckets guarantees collisions),
    * so the catalog entry exercises the interesting regime — estimates
    * strictly above exact counts for collided keys, min-over-rows doing
    * real work — rather than a sparse sketch that degenerates to exact
    * counting. */
  val CmsD = 4
  val CmsW = 64
  val CmsSeed = 42L
  val CmsTopN = 20

  /** Heavy-hitter estimation: the top-[[CmsTopN]] tokens by exact count,
    * with the count-min estimate next to the truth. The estimate is
    * HASH-CHECKED: counters are order-independent sums and the row
    * hashes are the seeded MinHash family, so DuckDB rebuilds the exact
    * d×w matrix from the same hash chain and reproduces every estimate
    * bit-for-bit. (est_count ≥ exact_count is a sketch guarantee —
    * spec-asserted too.) */
  /** Exact-count threshold for [[qHeavyHitters]] — ~30 tokens clear it
    * at both SFs (the vocabulary is shared, counts scale). */
  val HhThreshold = 300

  /** CMS-SCREEN → EXACT-VERIFY heavy hitters — the sketch-then-verify
    * composition as ONE query (the same shape every near-dup family
    * uses, here for frequency): the count-min matrix screens the
    * distinct vocabulary down to candidates whose ESTIMATE clears the
    * threshold, the candidate set broadcasts back into the token scan,
    * and exact counting runs at CANDIDATE cardinality only. CMS never
    * underestimates, so the screen has NO false negatives and the
    * verified result is provably identical to the plain exact
    * threshold — which is exactly why the oracle can be the simple
    * HAVING query while the Spark plan does the screen: the hash gate
    * checks the screen lost nothing and the verify added nothing. At
    * 100 TB the exact side counts a handful of candidate tokens
    * instead of the whole vocabulary; the sketch side's exchange is
    * bounded at d·w rows per map task. */
  val qHeavyHitters = QueryDef("q_heavy_hitters",
    (spark, dir) => {
      val toks = Tables.documents(spark, dir)
        .select(explode(tokens(col("text"))).as("tok"))
      val counters = Sketches.cmsCounters(toks, "tok", CmsD, CmsW, CmsSeed)
      val screened = Sketches.cmsEstimate(
          counters, toks.distinct(), "tok", CmsD, CmsW, CmsSeed)
        .filter(col("est_count") >= HhThreshold)
        .select("tok")
      toks.join(broadcast(screened), "tok")
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .filter(col("n") >= HhThreshold)
        .select(col("tok").as("token"), col("n"))
        .orderBy("token")
    },
    Some(s"""SELECT tok AS token, CAST(count(*) AS BIGINT) AS n
            |FROM (SELECT unnest(string_split(text, ' ')) AS tok
            |      FROM documents WHERE text IS NOT NULL)
            |GROUP BY tok HAVING count(*) >= $HhThreshold
            |ORDER BY token""".stripMargin))

  val qTokenCms = QueryDef("q_token_cms",
    (spark, dir) => {
      val toks = Tables.documents(spark, dir)
        .select(explode(tokens(col("text"))).as("tok"))
      val counters = Sketches.cmsCounters(toks, "tok", CmsD, CmsW, CmsSeed)
      val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_count"))
        .orderBy(desc("exact_count"), col("tok")).limit(CmsTopN)
      Sketches.cmsEstimate(counters, top, "tok", CmsD, CmsW, CmsSeed)
        .select(col("tok").as("token"), col("est_count"), col("exact_count"))
        .orderBy(desc("exact_count"), col("token"))
    },
    Some {
      // the d per-row seeds, as SIGNED 64-bit literals (DuckDB xor works
      // on BIGINT) — same derivation as the MinHash kernel's seeds(j)
      val seedRows = (0 until CmsD).map(j =>
        s"($j, CAST('${graft.expr.TextHashKernels.splitmix64(CmsSeed + j)}' AS BIGINT))")
        .mkString(", ")
      s"""WITH toks AS (
         |  SELECT unnest(string_split(text, ' ')) AS tok
         |  FROM documents WHERE text IS NOT NULL
         |), exact AS (
         |  SELECT tok, count(*) AS c FROM toks GROUP BY tok
         |), dt AS (
         |  SELECT DISTINCT tok FROM toks
         |), hs AS (
         |  SELECT tok, ${fnvFoldSql("tok")} AS h FROM dt
         |), sd AS (
         |  SELECT * FROM (VALUES $seedRows) AS t(j, sdv)
         |), hx AS (
         |  SELECT tok, j,
         |         CASE WHEN x < 0 THEN CAST(x AS HUGEINT) + $P64
         |              ELSE CAST(x AS HUGEINT) END AS z
         |  FROM (SELECT tok, j, xor(${toSignedSql("h")}, sdv) AS x
         |        FROM hs CROSS JOIN sd)
         |), ${splitmixCtesSql("hx", "tok, j", "m")},
         |map AS (
         |  SELECT tok, j, ((${toSignedSql("z")} % $CmsW) + $CmsW) % $CmsW AS bucket
         |  FROM m5
         |), occ AS (
         |  SELECT m.j, m.bucket FROM toks t JOIN map m ON t.tok = m.tok
         |), counters AS (
         |  SELECT j, bucket, count(*) AS cnt FROM occ GROUP BY j, bucket
         |), top AS (
         |  SELECT tok, c FROM exact ORDER BY c DESC, tok LIMIT $CmsTopN
         |), est AS (
         |  SELECT top.tok, top.c, min(coalesce(counters.cnt, 0)) AS e
         |  FROM top
         |  JOIN map ON map.tok = top.tok
         |  LEFT JOIN counters ON counters.j = map.j AND counters.bucket = map.bucket
         |  GROUP BY top.tok, top.c
         |)
         |SELECT tok AS token, CAST(e AS BIGINT) AS est_count,
         |       CAST(c AS BIGINT) AS exact_count
         |FROM est ORDER BY exact_count DESC, token""".stripMargin
    })

  /** How many (globally top) probe tokens the CMS rollup estimates per
    * level. */
  val CmsProbeN = 5

  /** SKETCH-PARTIALS rollup for CMS — the frequency member of the
    * pattern ([[qDistinctHllRollup]] is the distinct-count member,
    * `q_dd_quantiles_rollup` the quantile member): the corpus is
    * scanned ONCE into per-source (j, bucket, cnt) counter matrices,
    * and the corpus-wide 'ALL' matrix is derived from those PARTIALS by
    * counter addition — no second pass over the data. CMS merge is
    * trivially lossless (counters are sums), so the rolled-up estimates
    * are identical to sketching the union directly; the oracle rebuilds
    * BOTH levels from the same seeded hash chain and every estimate is
    * hash-checked. Probe keys are the global top-[[CmsProbeN]] tokens;
    * rows where a source never saw the token keep est ≥ exact = 0 —
    * the one-sided CMS guarantee, visible per level. */
  val qTokenCmsRollup = QueryDef("q_token_cms_rollup",
    (spark, dir) => {
      val toks = Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
      val mapped = toks
        .select(col("source"),
          posexplode(graft.expr.MinHashSig(array(col("tok")), CmsD, CmsSeed))
            .as(Seq("j", "h")))
        .select(col("source"), col("j"),
          pmod(col("h"), lit(CmsW.toLong)).as("bucket"))
      // ONE scan: per-source partial counter matrices…
      val perSrc = mapped.groupBy("source", "j", "bucket")
        .agg(count(lit(1)).as("cnt"))
      // …and the global matrix from the partials alone (counter adds)
      val levels = perSrc.unionByName(
        perSrc.groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
          .select(lit("ALL").as("source"), col("j"), col("bucket"), col("cnt")))
      val probes = toks.groupBy("tok").agg(count(lit(1)).as("gc"))
        .orderBy(desc("gc"), col("tok")).limit(CmsProbeN).select("tok")
      val probeMap = probes
        .select(col("tok"),
          posexplode(graft.expr.MinHashSig(array(col("tok")), CmsD, CmsSeed))
            .as(Seq("j", "h")))
        .select(col("tok"), col("j"),
          pmod(col("h"), lit(CmsW.toLong)).as("bucket"))
      val probed = toks.join(broadcast(probes), "tok")
      val exact = probed
        .groupBy("source", "tok").agg(count(lit(1)).as("exact_count"))
        .unionByName(probed.groupBy("tok")
          .agg(count(lit(1)).as("exact_count"))
          .select(lit("ALL").as("source"), col("tok"), col("exact_count")))
      val est = levels.select("source").distinct()
        .crossJoin(broadcast(probeMap)) // levels × probes grid (both tiny)
        .join(levels, Seq("source", "j", "bucket"), "left")
        .na.fill(0L, Seq("cnt"))
        .groupBy("source", "tok").agg(min("cnt").as("est_count"))
      est.join(exact, Seq("source", "tok"), "left")
        .na.fill(0L, Seq("exact_count"))
        .select(col("source"), col("tok").as("token"),
          col("est_count"), col("exact_count"))
        .orderBy("source", "token")
    },
    Some {
      val seedRows = (0 until CmsD).map(j =>
        s"($j, CAST('${graft.expr.TextHashKernels.splitmix64(CmsSeed + j)}' AS BIGINT))")
        .mkString(", ")
      s"""WITH toks AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS tok
         |  FROM documents WHERE text IS NOT NULL
         |), dt AS (
         |  SELECT DISTINCT tok FROM toks
         |), hs AS (
         |  SELECT tok, ${fnvFoldSql("tok")} AS h FROM dt
         |), sd AS (
         |  SELECT * FROM (VALUES $seedRows) AS t(j, sdv)
         |), hx AS (
         |  SELECT tok, j,
         |         CASE WHEN x < 0 THEN CAST(x AS HUGEINT) + $P64
         |              ELSE CAST(x AS HUGEINT) END AS z
         |  FROM (SELECT tok, j, xor(${toSignedSql("h")}, sdv) AS x
         |        FROM hs CROSS JOIN sd)
         |), ${splitmixCtesSql("hx", "tok, j", "m")},
         |map AS (
         |  SELECT tok, j, ((${toSignedSql("z")} % $CmsW) + $CmsW) % $CmsW AS bucket
         |  FROM m5
         |), occ AS (
         |  SELECT t.source, m.j, m.bucket FROM toks t JOIN map m ON t.tok = m.tok
         |), counters AS (
         |  SELECT source, j, bucket, count(*) AS cnt FROM occ
         |  GROUP BY source, j, bucket
         |), lvl AS (
         |  SELECT * FROM counters
         |  UNION ALL
         |  SELECT 'ALL' AS source, j, bucket, sum(cnt) AS cnt
         |  FROM counters GROUP BY j, bucket
         |), gex AS (
         |  SELECT tok, count(*) AS gc FROM toks GROUP BY tok
         |), probes AS (
         |  SELECT tok FROM gex ORDER BY gc DESC, tok LIMIT $CmsProbeN
         |), pm AS (
         |  SELECT map.* FROM map JOIN probes USING (tok)
         |), lvls AS (
         |  SELECT DISTINCT source FROM lvl
         |), grid AS (
         |  SELECT lvls.source, pm.tok, pm.j, pm.bucket FROM lvls CROSS JOIN pm
         |), est AS (
         |  SELECT g.source, g.tok, min(coalesce(lvl.cnt, 0)) AS e
         |  FROM grid g LEFT JOIN lvl
         |    ON lvl.source = g.source AND lvl.j = g.j AND lvl.bucket = g.bucket
         |  GROUP BY g.source, g.tok
         |), ex AS (
         |  SELECT source, tok, count(*) AS c
         |  FROM toks JOIN probes USING (tok) GROUP BY source, tok
         |  UNION ALL
         |  SELECT 'ALL' AS source, tok, count(*) AS c
         |  FROM toks JOIN probes USING (tok) GROUP BY tok
         |)
         |SELECT est.source, est.tok AS token, CAST(e AS BIGINT) AS est_count,
         |       CAST(coalesce(c, 0) AS BIGINT) AS exact_count
         |FROM est LEFT JOIN ex
         |  ON ex.source = est.source AND ex.tok = est.tok
         |ORDER BY est.source, token""".stripMargin
    })

  /** Normalization + redaction over a deterministically "dirtied" corpus:
    * both engines build the identical messy string (mixed case,
    * punctuation, a synthetic email / id / URL per doc) from the same
    * parquet, then [[graft.text.Normalize]] cleans and masks it — so the
    * hash check covers lower/strip/collapse AND the three redaction
    * regexes across every doc, in exactly the regex subset where Java
    * and RE2 agree. (The raw documents corpus is single-case,
    * single-spaced word soup — normalizing it directly would test
    * almost nothing.) */
  val qNormalizeRedact = QueryDef("q_normalize_redact",
    (spark, dir) => {
      val dirty = concat(
        upper(substring(col("text"), 1, 40)), lit("  Contact: user"),
        col("doc_id").cast("string"), lit("@example.com, ref #"),
        (col("doc_id") * 1234567 + 10000000).cast("string"),
        lit(" -- see https://example.com/d/"), col("doc_id").cast("string"),
        lit(" (END)."))
      Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          graft.text.Normalize.cleaned(dirty).as("norm_text"),
          graft.text.Normalize.redacted(dirty).as("redacted"))
        .orderBy("doc_id")
    },
    Some {
      val dirtySql = "upper(substr(text, 1, 40)) || '  Contact: user' || " +
        "CAST(doc_id AS VARCHAR) || '@example.com, ref #' || " +
        "CAST(doc_id * 1234567 + 10000000 AS VARCHAR) || " +
        "' -- see https://example.com/d/' || CAST(doc_id AS VARCHAR) || " +
        "' (END).'"
      s"""SELECT doc_id,
         |       ${graft.text.Normalize.cleanedSql(dirtySql)} AS norm_text,
         |       ${graft.text.Normalize.redactedSql(s"($dirtySql)")} AS redacted
         |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin
    })

  /** Decontamination sweep: split the corpus into a pseudo train set
    * (even doc ids) and probe/eval set (odd ids) and surface every
    * cross-corpus near-dup ≥ [[MinJaccard]] via
    * [[graft.operators.Dedup.crossCorpusNearDups]] (MinHash-LSH bucket
    * alignment between corpora, exact-Jaccard verify). The oracle
    * re-derives the full cross-corpus Jaccard from scratch — so the
    * hash check asserts the LSH path finds EVERY qualifying pair (band
    * miss probability ≈ 5e-8 at these parameters, same contract as the
    * self-join LSH entry). */
  val qDecontaminate = QueryDef("q_decontaminate",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      graft.operators.Dedup.crossCorpusNearDups(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", ShingleN, MinJaccard,
        // the oracle sweep is exhaustive — cap engagement must fail
        // loudly, not silently diverge (same contract as the LSH entry)
        failOnOverflow = true)
        .orderBy("train_id", "probe_id")
    },
    Some(s"""WITH t_toks AS (
            |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            |  WHERE text IS NOT NULL AND doc_id % 2 = 0
            |), t_sh AS (
            |  SELECT DISTINCT doc_id, unnest(${shinglesOverWsSql(ShingleN)}) AS shingle
            |  FROM t_toks
            |), p_toks AS (
            |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            |  WHERE text IS NOT NULL AND doc_id % 2 = 1
            |), p_sh AS (
            |  SELECT DISTINCT doc_id, unnest(${shinglesOverWsSql(ShingleN)}) AS shingle
            |  FROM p_toks
            |), t_sizes AS (SELECT doc_id, count(*) AS n FROM t_sh GROUP BY doc_id),
            |p_sizes AS (SELECT doc_id, count(*) AS n FROM p_sh GROUP BY doc_id),
            |pre AS (
            |  SELECT a.doc_id AS train_id, b.doc_id AS probe_id, count(*) AS inter
            |  FROM t_sh a JOIN p_sh b ON a.shingle = b.shingle
            |  GROUP BY 1, 2
            |), pairs AS (
            |  SELECT train_id, probe_id,
            |         CAST(inter AS DOUBLE) / CAST(st.n + sp.n - inter AS DOUBLE) AS jaccard
            |  FROM pre
            |  JOIN t_sizes st ON st.doc_id = train_id
            |  JOIN p_sizes sp ON sp.doc_id = probe_id
            |)
            |SELECT train_id, probe_id, jaccard FROM pairs
            |WHERE jaccard >= $MinJaccard
            |ORDER BY train_id, probe_id""".stripMargin))

  /** A kept line may appear in at most this many docs
    * ([[qBoilerplateLines]]). Planted headers repeat per source (25 docs
    * per source at sf0.01) and the footer repeats corpus-wide, so both
    * clear the threshold at every SF; 12-word content lines of word-soup
    * text are effectively unique. */
  val BoilerMaxDf = 10
  val BoilerWords = 12

  /** C4/RefinedWeb line-level boilerplate removal
    * ([[graft.text.Boilerplate.dropFrequentLines]]) over a corpus with
    * PLANTED page furniture: each doc is re-chunked into 12-word lines
    * and wrapped in a per-source subscribe header + a corpus-wide
    * copyright footer (the raw corpus is single-line word soup — a real
    * crawl arrives with lines). The high-df lines must vanish from every
    * doc, the content lines must survive in order, and the oracle
    * re-derives the whole sweep — line df, threshold cut, ordered
    * reassembly — from the same planted construction. */
  val qBoilerplateLines = QueryDef("q_boilerplate_lines",
    (spark, dir) => {
      val lined = Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), concat_ws("\n",
          concat(lit("subscribe to "), col("source"), lit(" newsletter today")),
          graft.text.Boilerplate.chunkIntoLines(col("text"), BoilerWords),
          lit("all rights reserved - corpus footer")).as("text"))
      graft.text.Boilerplate.dropFrequentLines(
        lined, "doc_id", "text", BoilerMaxDf)
        .orderBy("doc_id")
    },
    Some(s"""WITH ${boilerplateCtesSql("text")}
            |SELECT doc_id, clean_text, n_kept, n_dropped
            |FROM rebuilt ORDER BY doc_id""".stripMargin))

  /** Shared oracle CTEs for the planted-furniture line corpus (header +
    * 12-word chunks + footer → line df sweep → per-doc reassembly);
    * `rawText` is the pre-chunk text expression, so composites can fold
    * their own planting in. Ends with `rebuilt(doc_id, clean_text,
    * n_kept, n_dropped)`. */
  private def boilerplateCtesSql(rawText: String): String =
    s"""lined AS (
       |  SELECT doc_id,
       |         'subscribe to ' || source || ' newsletter today' || chr(10) ||
       |         array_to_string([array_to_string(ws[(i*$BoilerWords+1):(i*$BoilerWords+$BoilerWords)], ' ')
       |           for i in generate_series(0,
       |             CAST(floor((len(ws) - 1) / $BoilerWords.0) AS BIGINT))], chr(10)) ||
       |         chr(10) || 'all rights reserved - corpus footer' AS text
       |  FROM (SELECT doc_id, source, string_split($rawText, ' ') AS ws
       |        FROM documents WHERE text IS NOT NULL)
       |), lines AS (
       |  SELECT doc_id, unnest(generate_series(1, len(ls))) AS pos,
       |         unnest(ls) AS line
       |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM lined)
       |), bad AS (
       |  SELECT line FROM (
       |    SELECT line, count(*) AS df
       |    FROM (SELECT DISTINCT doc_id, line FROM lines) GROUP BY line)
       |  WHERE df > $BoilerMaxDf
       |), flagged AS (
       |  SELECT l.doc_id, l.pos, l.line, b.line IS NOT NULL AS is_bad
       |  FROM lines l LEFT JOIN bad b ON l.line = b.line
       |), rebuilt AS (
       |  SELECT doc_id,
       |         COALESCE(string_agg(CASE WHEN NOT is_bad THEN line END,
       |                             chr(10) ORDER BY pos), '') AS clean_text,
       |         CAST(count(*) FILTER (NOT is_bad) AS BIGINT) AS n_kept,
       |         CAST(count(*) FILTER (is_bad) AS BIGINT) AS n_dropped
       |  FROM flagged GROUP BY doc_id
       |)""".stripMargin

  /** Incremental boilerplate sweep
    * ([[graft.text.Boilerplate.dropFrequentLinesAgainst]]): the corpus is
    * the 80% of docs with `doc_id % 10 < 8` (planted furniture as in
    * [[qBoilerplateLines]] — per-source headers appear in ~20 corpus
    * docs per source at sf0.01, the footer corpus-wide, both clearing
    * the df threshold within the split), the incoming batch is the
    * other 20%; yesterday's [[graft.text.Boilerplate.frequentLineStats]]
    * table drops the corpus-established furniture from batch docs
    * without re-deriving corpus df. The oracle re-derives stats from the
    * corpus split and the reassembly over the batch split from scratch. */
  val qBoilerplateIncremental = QueryDef("q_boilerplate_incremental",
    (spark, dir) => {
      val lined = Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"), concat_ws("\n",
          concat(lit("subscribe to "), col("source"), lit(" newsletter today")),
          graft.text.Boilerplate.chunkIntoLines(col("text"), BoilerWords),
          lit("all rights reserved - corpus footer")).as("text"))
      val corpus = lined.filter(col("doc_id") % 10 < 8)
      val batch = lined.filter(col("doc_id") % 10 >= 8)
      val stats = graft.text.Boilerplate.frequentLineStats(
        corpus, "doc_id", "text", BoilerMaxDf)
      graft.text.Boilerplate.dropFrequentLinesAgainst(
        stats, batch, "doc_id", "text")
        .orderBy("doc_id")
    },
    Some(s"""WITH lined AS (
            |  SELECT doc_id,
            |         'subscribe to ' || source || ' newsletter today' || chr(10) ||
            |         array_to_string([array_to_string(ws[(i*$BoilerWords+1):(i*$BoilerWords+$BoilerWords)], ' ')
            |           for i in generate_series(0,
            |             CAST(floor((len(ws) - 1) / $BoilerWords.0) AS BIGINT))], chr(10)) ||
            |         chr(10) || 'all rights reserved - corpus footer' AS text
            |  FROM (SELECT doc_id, source, string_split(text, ' ') AS ws
            |        FROM documents WHERE text IS NOT NULL)
            |), lines AS (
            |  SELECT doc_id, unnest(generate_series(1, len(ls))) AS pos,
            |         unnest(ls) AS line
            |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM lined)
            |), bad AS (
            |  SELECT line FROM (
            |    SELECT line, count(*) AS df
            |    FROM (SELECT DISTINCT doc_id, line FROM lines
            |          WHERE doc_id % 10 < 8) GROUP BY line)
            |  WHERE df > $BoilerMaxDf
            |), flagged AS (
            |  SELECT l.doc_id, l.pos, l.line, b.line IS NOT NULL AS is_bad
            |  FROM lines l LEFT JOIN bad b ON l.line = b.line
            |  WHERE l.doc_id % 10 >= 8
            |)
            |SELECT doc_id,
            |       COALESCE(string_agg(CASE WHEN NOT is_bad THEN line END,
            |                           chr(10) ORDER BY pos), '') AS clean_text,
            |       CAST(count(*) FILTER (NOT is_bad) AS BIGINT) AS n_kept,
            |       CAST(count(*) FILTER (is_bad) AS BIGINT) AS n_dropped
            |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Duplicated-span run length for [[qDedupSpans]] (tokens). Long
    * enough that word-soup chance collisions are impossible, short
    * enough that the planted exact/near duplicates carry many flagged
    * runs at every SF. */
  val SpanTokens = 15

  /** Exact duplicated-span removal ([[Dedup.dropDuplicatedSpans]], the
    * Lee-et-al ExactSubstr member of the dedup family): every token
    * covered by a [[SpanTokens]]-gram occurring in more than one
    * distinct document is cut from every document; unique text
    * survives in order. Planted exact duplicates come back empty,
    * planted near-duplicates lose their shared runs, untouched docs
    * round-trip. The oracle re-derives the sweep from RAW gram strings
    * (the Spark side shuffles 8-byte fingerprints), so agreement also
    * proves fingerprint faithfulness, like `q_dedup_exact`. */
  val qDedupSpans = QueryDef("q_dedup_spans",
    (spark, dir) => Dedup.dropDuplicatedSpans(
      Tables.documents(spark, dir), "doc_id", "text", SpanTokens)
      .orderBy("doc_id"),
    Some(s"""WITH ws AS (
            |  SELECT doc_id, string_split(text, ' ') AS ws
            |  FROM documents WHERE text IS NOT NULL
            |), toks AS (
            |  SELECT doc_id, unnest(generate_series(0, len(ws) - 1)) AS pos,
            |         unnest(ws) AS tok
            |  FROM ws
            |), grams AS (
            |  SELECT doc_id,
            |         unnest(generate_series(1, GREATEST(len(ws) - ${SpanTokens - 1}, 0))) - 1 AS gpos,
            |         unnest([array_to_string(ws[i:i+${SpanTokens - 1}], ' ')
            |                 for i in generate_series(1, GREATEST(len(ws) - ${SpanTokens - 1}, 0))]) AS gram
            |  FROM ws
            |), dup AS (
            |  SELECT gram FROM (
            |    SELECT gram, count(*) AS df
            |    FROM (SELECT DISTINCT doc_id, gram FROM grams) GROUP BY gram)
            |  WHERE df > 1
            |), covered AS (
            |  SELECT DISTINCT doc_id,
            |         gpos + unnest(generate_series(0, ${SpanTokens - 1})) AS pos
            |  FROM grams WHERE gram IN (SELECT gram FROM dup)
            |), flagged AS (
            |  SELECT t.doc_id, t.pos, t.tok, c.pos IS NOT NULL AS cut
            |  FROM toks t LEFT JOIN covered c
            |    ON t.doc_id = c.doc_id AND t.pos = c.pos
            |), rebuilt AS (
            |  SELECT doc_id,
            |         COALESCE(string_agg(CASE WHEN NOT cut THEN tok END,
            |                             ' ' ORDER BY pos), '') AS clean_text,
            |         CAST(count(*) FILTER (NOT cut) AS BIGINT) AS n_kept,
            |         CAST(count(*) FILTER (cut) AS BIGINT) AS n_removed
            |  FROM flagged GROUP BY doc_id
            |)
            |-- every-doc contract: NULL-text docs get ('', 0, 0), like the operator
            |SELECT d.doc_id, COALESCE(r.clean_text, '') AS clean_text,
            |       COALESCE(r.n_kept, 0) AS n_kept,
            |       COALESCE(r.n_removed, 0) AS n_removed
            |FROM documents d LEFT JOIN rebuilt r USING (doc_id)
            |ORDER BY doc_id""".stripMargin))

  /** Merge budget for [[qBpeEncode]]. */
  val BpeMerges = 60

  /** REAL BPE tokenization ([[graft.text.Bpe]]): train merges on the
    * corpus's word-frequency table (distributed agg → driver merge loop
    * over model-scale vocab state, the k-means contract), broadcast the
    * ranks, encode map-side. The 60-step sequential merge derivation is
    * not SQL-expressible, but its LOSSLESSNESS is: per document we emit
    *   - `rt_fp` — [[graft.expr.Fingerprint64]] of the DECODED piece
    *     stream (pieces re-glued in pos order, end-of-word markers back
    *     to spaces), which the oracle recomputes as the same FNV-1a fold
    *     over the space-normalized source text — whatever merge table
    *     training produced, encode∘decode must be the identity;
    *   - `n_words` — pieces carrying the EOW marker (merges only ever
    *     append word-final symbols, so EOW stays piece-final and appears
    *     exactly once per source word), which the oracle recomputes as
    *     the non-empty whitespace token count — segmentation preserves
    *     word boundaries.
    * Merge ORDER, greedy application, and partitioning determinism stay
    * spec-asserted (BpeSpec, incl. the hand-derived classic fixture). */
  val qBpeEncode = QueryDef("q_bpe_encode",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val merges = graft.text.Bpe.train(docs, "text", BpeMerges)
      val eow = java.util.regex.Pattern.quote(graft.text.Bpe.Eow)
      graft.text.Bpe.encode(docs, "doc_id", "text", merges)
        .groupBy("doc_id")
        .agg(
          sum(when(col("piece").endsWith(graft.text.Bpe.Eow), 1L)
            .otherwise(0L)).as("n_words"),
          // deterministic re-glue: collect_list order is partition-
          // dependent, so sort by pos before joining
          array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("piece")))),
            e => e.getField("piece")), "").as("glued"))
        .select(col("doc_id"), col("n_words"),
          graft.expr.Fingerprint64(
            trim(regexp_replace(col("glued"), eow, " "))).as("rt_fp"))
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id,
            |  CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
            |    AS BIGINT) AS n_words,
            |  ${toSignedSql(fnvFoldSql(
               "trim(regexp_replace(text, ' +', ' ', 'g'))"))} AS rt_fp
            |FROM documents
            |WHERE text IS NOT NULL AND trim(text) <> ''
            |ORDER BY doc_id""".stripMargin))

  /** Blocklist for [[qBadWords]] / [[qWebCuration]] — planted tokens,
    * so the filters' selectivity is known by construction (the corpus's
    * own vocabulary is benign word soup). */
  val BadWords = Seq("xxxspam", "xxxbad")

  /** C4-style content filtering ([[TextAnalysis.badTokenCount]]): plant
    * blocklisted tokens into a deterministic subset of docs (every 7th
    * gets one, every 11th-but-not-7th two), count exact-token hits, and
    * emit the keep/drop decision. The count is the primitive — C4 drops
    * on any hit; gentler pipelines gate on the rate — and the oracle
    * re-derives plant + count + decision. */
  val qBadWords = QueryDef("q_badwords_filter",
    (spark, dir) => {
      val planted = Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" xxxbad")))
            .when(col("doc_id") % 11 === 0,
              concat(col("text"), lit(" xxxspam xxxbad")))
            .otherwise(col("text")).as("text"))
      planted.select(col("doc_id"),
        graft.text.TextAnalysis.badTokenCount(col("text"), BadWords).as("n_bad"))
        .withColumn("kept", col("n_bad") === 0)
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id,
            |       CAST(${graft.text.TextAnalysis.badTokenCountSql(
                      "text2", BadWords)} AS INT) AS n_bad,
            |       CAST(${graft.text.TextAnalysis.badTokenCountSql(
                      "text2", BadWords)} AS INT) = 0 AS kept
            |FROM (SELECT doc_id,
            |        CASE WHEN doc_id % 7 = 0 THEN text || ' xxxbad'
            |             WHEN doc_id % 11 = 0 THEN text || ' xxxspam xxxbad'
            |             ELSE text END AS text2
            |      FROM documents WHERE text IS NOT NULL)
            |ORDER BY doc_id""".stripMargin))

  /** Minimum surviving content lines for [[qWebCuration]] (C4 drops
    * pages with fewer than 3 sentences). */
  val CurationMinLines = 3

  /** End-to-end C4-style WEB CURATION composite — the curation-centric
    * sibling of `q_training_data_prep` (which is dedup-centric): planted
    * page furniture and a planted blocklist token ride through
    * boilerplate line removal ([[graft.text.Boilerplate]]) → content
    * filter ([[TextAnalysis.badTokenCount]] over the CLEANED text — the
    * order matters: furniture must not shield or trigger the filter) →
    * structure gate (≥ [[CurationMinLines]] surviving lines). The oracle
    * re-derives every stage through the shared boilerplate CTEs. */
  val qWebCuration = QueryDef("q_web_curation",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir).filter(col("text").isNotNull)
      val planted = when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" xxxbad"))).otherwise(col("text"))
      val lined = docs.select(col("doc_id"), concat_ws("\n",
        concat(lit("subscribe to "), col("source"), lit(" newsletter today")),
        graft.text.Boilerplate.chunkIntoLines(planted, BoilerWords),
        lit("all rights reserved - corpus footer")).as("text"))
      graft.text.Boilerplate.dropFrequentLines(
          lined, "doc_id", "text", BoilerMaxDf)
        .withColumn("n_bad", graft.text.TextAnalysis.badTokenCount(
          regexp_replace(col("clean_text"), "\n", " "), BadWords))
        .filter(col("n_bad") === 0 && col("n_kept") >= CurationMinLines)
        .select(col("doc_id"), col("n_kept"),
          length(col("clean_text")).as("n_chars_clean"))
        .orderBy("doc_id")
    },
    Some(s"""WITH ${boilerplateCtesSql(
              "CASE WHEN doc_id % 7 = 0 THEN text || ' xxxbad' ELSE text END")}
            |SELECT doc_id, n_kept,
            |       CAST(length(clean_text) AS INT) AS n_chars_clean
            |FROM rebuilt
            |WHERE CAST(${graft.text.TextAnalysis.badTokenCountSql(
              "replace(clean_text, chr(10), ' ')", BadWords)} AS INT) = 0
            |  AND n_kept >= $CurationMinLines
            |ORDER BY doc_id""".stripMargin))

  /** Unigram-LM quality scores ([[graft.text.LanguageModel]]): every doc
    * scored under the corpus's own unigram distribution. The oracle
    * re-trains the same model and re-scores from scratch — including the
    * empty-doc contract (left join back: n_toks = 0, NULL score). */
  val qUnigramLogProb = QueryDef("q_unigram_logprob",
    (spark, dir) => graft.text.LanguageModel.unigramLogProb(
      Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH toks AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |  FROM documents WHERE text IS NOT NULL
           |), tk AS (
           |  SELECT doc_id, tok FROM toks WHERE tok <> ''
           |), freqs AS (
           |  SELECT tok, count(*) AS cnt FROM tk GROUP BY tok
           |), total AS (SELECT count(*) AS n FROM tk),
           |scored AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
           |         round(avg(ln(CAST(cnt AS DOUBLE)) - ln(CAST(n AS DOUBLE))), 6)
           |           AS mean_logprob
           |  FROM tk JOIN freqs USING (tok), total
           |  GROUP BY doc_id
           |)
           |SELECT d.doc_id, CAST(coalesce(s.n_toks, 0) AS BIGINT) AS n_toks,
           |       s.mean_logprob
           |FROM documents d LEFT JOIN scored s USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin))

  /** Cross-corpus smoothed LM scoring
    * ([[graft.text.LanguageModel.unigramLogProbCross]]): train the
    * unigram model on even doc ids (the trusted slice), score odd ids
    * against it with add-1 smoothing over vocab + UNK — the deployed
    * shape of LM quality filtering, where out-of-vocabulary tokens are
    * the norm and the OOV rate itself is a drift signal. The oracle
    * retrains and rescores with the identical smoothing arithmetic
    * (same parenthesization; mean rounded to 6 dp per the libm
    * convention; counts exact). */
  val qUnigramCross = QueryDef("q_unigram_logprob_cross",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      graft.text.LanguageModel.unigramLogProbCross(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text")
        .orderBy("doc_id")
    },
    Some("""WITH ttk AS (
           |  SELECT unnest(string_split(text, ' ')) AS tok
           |  FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0
           |), tk0 AS (
           |  SELECT tok FROM ttk WHERE tok <> ''
           |), freqs AS (
           |  SELECT tok, count(*) AS cnt FROM tk0 GROUP BY tok
           |), stats AS (
           |  SELECT COALESCE(sum(cnt), 0) AS total, count(*) AS v FROM freqs
           |), stk AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |  FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 1
           |), stk0 AS (
           |  SELECT doc_id, tok FROM stk WHERE tok <> ''
           |), scored AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
           |         CAST(count(CASE WHEN cnt IS NULL THEN 1 END) AS BIGINT)
           |           AS n_oov,
           |         round(avg(
           |           ln(CAST(COALESCE(cnt, 0) AS DOUBLE) + 1.0) -
           |           ln(CAST(total AS DOUBLE) + 1.0 * CAST(v + 1 AS DOUBLE))), 6)
           |           AS mean_logprob
           |  FROM stk0 LEFT JOIN freqs USING (tok), stats
           |  GROUP BY doc_id
           |)
           |SELECT d.doc_id, CAST(COALESCE(s.n_toks, 0) AS BIGINT) AS n_toks,
           |       CAST(COALESCE(s.n_oov, 0) AS BIGINT) AS n_oov,
           |       s.mean_logprob
           |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
           |LEFT JOIN scored s USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin))

  /** Passage-level decontamination
    * ([[graft.operators.Dedup.crossCorpusContainment]]): train docs (even
    * ids) sharing ≥ [[ContainMinShared]] winnow fingerprints (≈ a 40+
    * char run) with a probe doc (odd ids), boilerplate-capped on the
    * train side. The whole-doc-Jaccard sweep ([[qDecontaminate]]) and
    * this one are the two halves of a real decontamination pass — this
    * half catches an eval passage EMBEDDED in a long train page, where
    * doc-level Jaccard stays tiny. `contained_frac` is an exact integer
    * ratio — hash-checked unrounded. */
  val qDecontaminateContainment = QueryDef("q_decontaminate_containment",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      graft.operators.Dedup.crossCorpusContainment(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", WinnowK, WinnowW, ContainMinShared,
        ContainMaxDf)
        .orderBy("train_id", "probe_id")
    },
    Some(s"""WITH $winnowCtes,
            |fp0 AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
            |tfp AS (SELECT doc_id, fp FROM fp0 WHERE doc_id % 2 = 0),
            |tkept AS (
            |  SELECT doc_id, fp FROM tfp
            |  WHERE fp IN (SELECT fp FROM tfp GROUP BY fp
            |               HAVING count(*) <= $ContainMaxDf)
            |),
            |pfp AS (SELECT doc_id, fp FROM fp0 WHERE doc_id % 2 = 1),
            |psize AS (SELECT doc_id, count(*) AS p_n FROM pfp GROUP BY doc_id),
            |shared AS (
            |  SELECT t.doc_id AS train_id, p.doc_id AS probe_id,
            |         count(*) AS n_shared
            |  FROM tkept t JOIN pfp p ON t.fp = p.fp
            |  GROUP BY 1, 2
            |  HAVING count(*) >= $ContainMinShared
            |)
            |SELECT train_id, probe_id, CAST(n_shared AS BIGINT) AS n_shared,
            |       CAST(n_shared AS DOUBLE) / CAST(p_n AS DOUBLE) AS contained_frac
            |FROM shared JOIN psize ON probe_id = psize.doc_id
            |ORDER BY train_id, probe_id""".stripMargin))

  /** The fixed curation "topic" query for [[qBm25Search]] — terms from
    * the synthetic vocabulary spanning high and mid document frequency,
    * so idf actually differentiates. */
  val Bm25Terms: Seq[String] = Seq("hash", "join", "spark", "vector")

  /** BM25 relevance scoring of every document against a fixed topic
    * term list — corpus-scale retrieval as a curation stage (see
    * [[graft.text.Bm25]]). Hash-checked: idf and the per-term
    * contribution round only their ln-dependent results, the per-doc
    * sum is DECIMAL-exact, and the oracle replays the identical
    * arithmetic tree. */
  val qBm25Search = QueryDef("q_bm25_search",
    (spark, dir) => graft.text.Bm25.score(
      Tables.documents(spark, dir), "doc_id", "text", Bm25Terms),
    Some {
      val inList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
         |tk AS (
         |  SELECT doc_id, tok FROM
         |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM d)
         |  WHERE tok <> ''
         |), dl AS (
         |  SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id
         |), stats AS (
         |  SELECT (SELECT count(*) FROM tk) AS tot_toks,
         |         (SELECT count(*) FROM d) AS n_docs
         |), qdf AS (
         |  SELECT tok, count(DISTINCT doc_id) AS df
         |  FROM tk WHERE tok IN ($inList) GROUP BY tok
         |), tf AS (
         |  SELECT doc_id, tok, count(*) AS tf
         |  FROM tk WHERE tok IN ($inList) GROUP BY doc_id, tok
         |), contribs AS (
         |  SELECT tf.doc_id,
         |    round(
         |      round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
         |                       / (CAST(df AS DOUBLE) + 0.5)), 6)
         |      * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
         |      / (CAST(tf AS DOUBLE)
         |         + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
         |                  / (CAST(tot_toks AS DOUBLE) / CAST(n_docs AS DOUBLE)))),
         |      6) AS contrib
         |  FROM tf JOIN qdf USING (tok) JOIN dl USING (doc_id), stats
         |)
         |SELECT doc_id,
         |  CAST(sum(CAST(contrib AS DECIMAL(28,10))) AS DOUBLE) AS score,
         |  CAST(count(*) AS BIGINT) AS n_terms
         |FROM contribs GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 100""".stripMargin
    })

  /** Bigram-LM quality scoring ([[graft.text.LanguageModel.bigramLogProb]]):
    * word-order plausibility under the corpus's own interpolated bigram
    * model. Hash-checked — the oracle retrains the same counts and
    * replays the identical λ=0.75 / 0.25 interpolation (both literals
    * binary-exact, see the operator scaladoc). */
  val qBigramLogProb = QueryDef("q_bigram_logprob",
    (spark, dir) => graft.text.LanguageModel.bigramLogProb(
      Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH toks0 AS (
           |  SELECT doc_id, string_split(text, ' ') AS ws
           |  FROM documents WHERE text IS NOT NULL
           |), toks AS (
           |  SELECT doc_id, i AS pos, ws[i + 1] AS tok
           |  FROM toks0, LATERAL (SELECT unnest(range(len(ws))) AS i) u
           |  WHERE ws[i + 1] <> ''
           |), uni AS (
           |  SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
           |), tot AS (SELECT count(*) AS n FROM toks),
           |seq AS (
           |  SELECT doc_id, pos, tok,
           |         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
           |  FROM toks
           |), bg AS (
           |  SELECT doc_id, prev AS w1, tok AS w2 FROM seq WHERE prev IS NOT NULL
           |), bcnt AS (
           |  SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2
           |), terms AS (
           |  SELECT bg.doc_id,
           |    ln(0.75 * (CAST(cb AS DOUBLE) / CAST(u1.cnt AS DOUBLE))
           |       + 0.25 * (CAST(u2.cnt AS DOUBLE) / CAST(n AS DOUBLE))) AS term
           |  FROM bg JOIN bcnt USING (w1, w2)
           |  JOIN uni u1 ON u1.tok = bg.w1
           |  JOIN uni u2 ON u2.tok = bg.w2, tot
           |), scored AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |         round(avg(term), 6) AS mean_logprob
           |  FROM terms GROUP BY doc_id
           |)
           |SELECT d.doc_id,
           |  CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           |  s.mean_logprob
           |FROM documents d LEFT JOIN scored s USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin))

  /** Sliding-window passage chunking ([[TextAnalysis.chunkPassages]]):
    * a deterministic sample of documents explodes into overlapping
    * 64-token windows at stride 32 — retrieval/pretraining passage
    * prep with provenance (doc id, chunk id, token offset). Direct
    * ROW-level compare (no aggregate summary): the oracle re-derives
    * every chunk's text, offset, and token count, so an off-by-one in
    * the start set, the slice bounds, or the tail-chunk handling
    * breaks the hash on the exact row. */
  val qChunkPassages = QueryDef("q_chunk_passages",
    (spark, dir) => graft.text.TextAnalysis.chunkPassages(
      Tables.documents(spark, dir).filter(col("doc_id") % 17 === 0),
      "doc_id", "text", window = 64, stride = 32)
      .orderBy("doc_id", "chunk_id"),
    Some(s"""${graft.text.TextAnalysis.chunkPassagesSql(
             "(SELECT * FROM documents WHERE doc_id % 17 = 0)",
             "doc_id", "text", 64, 32)}
            |ORDER BY doc_id, chunk_id""".stripMargin))

  def all: Seq[QueryDef] = Seq(
    qChunkPassages,
    qTextStats, qTokenBudget, qLangId, qTokenFreq, qRepetitionStats,
    qGopherQuality, qQualityClassifier, qCharEntropy,
    qDocFingerprints, qDistinctKmv, qDistinctKmvRollup, qCorpusOverlapKmv,
    qDistinctHll, qDistinctHllRollup,
    qTokenCms, qTokenCmsRollup, qHeavyHitters, qBigramLogProb,
    qDedupExact, qDedupIncremental, qDedupJaccard, qDedupMinhash,
    qDedupEditDist,
    qDedupClusters, qDedupSimhash, qDedupContainment, qDedupContainmentKeep,
    qTrainingPrep, qNormalizeRedact, qDecontaminate, qUnigramLogProb,
    qDecontaminateContainment, qBoilerplateLines, qBoilerplateIncremental,
    qDedupSpans, qUnigramCross, qBadWords,
    qBpeEncode, qWebCuration, qBm25Search)
}
