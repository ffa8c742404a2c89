package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.expr.{MinHashAgg, MinHashSig, TopKAgg}
import graft.text.TextAnalysis

/** Training-data pipeline catalog entries: deterministic sampling /
  * train-test split, token-budget sequence packing, bounded top-k as a
  * true aggregate, and corpus-level similarity via aggregated MinHash. */
object PipelineQueries {

  /** Knuth's multiplicative hash constant (2^32 / φ) — both engines
    * compute the bucket with exact BIGINT arithmetic, so the "random"
    * split is reproducible anywhere, forever (the property a training
    * pipeline needs: re-runs must select the same split). */
  val KnuthMul = 2654435761L
  val SplitBuckets = 100

  /** Deterministic train/valid/test split (80/10/10 by hashed id) with
    * per-split stats. */
  val qSampleSplit = QueryDef("q_sample_split",
    (spark, dir) => {
      val bucket = pmod(col("doc_id") * KnuthMul, lit(4294967296L)) % SplitBuckets
      Tables.documents(spark, dir)
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .orderBy("split")
    },
    Some(s"""SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
            |       CAST(sum(n_chars) AS BIGINT) AS total_chars
            |FROM (
            |  SELECT n_chars,
            |         CASE WHEN ((doc_id * $KnuthMul) % 4294967296) % $SplitBuckets < 80 THEN 'train'
            |              WHEN ((doc_id * $KnuthMul) % 4294967296) % $SplitBuckets < 90 THEN 'valid'
            |              ELSE 'test' END AS split
            |  FROM documents)
            |GROUP BY split ORDER BY split""".stripMargin))

  /** Token budget per packed sequence. */
  val PackBudget = 4096

  /** Token-budget sequence packing (contiguous, id-ordered): assign docs
    * to sequences by running token count — the deterministic chunking a
    * pretraining tokenizer shard step performs. The running total is the
    * DISTRIBUTED two-pass prefix sum ([[graft.operators.PrefixSum]]), not
    * a global window — no single-partition stage at any scale. Output:
    * per-sequence doc count and token totals. */
  val qPackSequences = QueryDef("q_pack_sequences",
    (spark, dir) => {
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      graft.operators.PrefixSum.runningTotal(toks, "doc_id", "n_tokens", "cum")
        .withColumn("seq_id", floor((col("cum") - col("n_tokens")) / PackBudget))
        .groupBy("seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"))
        .orderBy("seq_id")
    },
    Some(s"""SELECT seq_id, CAST(count(*) AS BIGINT) AS n_docs,
            |       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
            |FROM (
            |  SELECT CAST(FLOOR((sum(n_tokens) OVER w - n_tokens) / $PackBudget) AS BIGINT) AS seq_id,
            |         n_tokens
            |  FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents)
            |  WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
            |GROUP BY seq_id ORDER BY seq_id""".stripMargin))

  /** Top-3 events per type via the bounded-heap AGGREGATE (TopKAgg) —
    * same ranking (IEEE total order, payload tie-break) and oracle as
    * the window form (`q_events_top3_per_type`), but with partial
    * aggregation: the shuffle carries ≤ k rows per (group × map task)
    * instead of every row, and nothing is globally sorted. (Only
    * divergence: null-valued rows — see TopKAgg scaladoc; none exist in
    * this table.) */
  val qTop3Agg = QueryDef("q_events_top3_agg",
    (spark, dir) => {
      Tables.eventsMicros(spark, dir)
        .groupBy("event_type")
        .agg(TopKAgg(col("value"), col("event_id"), 3).as("top"))
        .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "entry")))
        .select(col("event_type"),
          (col("pos") + 1).cast("int").as("rank"),
          col("entry.payload").as("event_id"),
          col("entry.sort_key").as("value"))
        .orderBy("event_type", "rank")
    },
    // the window form's oracle — the two implementations must agree.
    // value IS NOT NULL mirrors TopKAgg's documented null-drop (the bare
    // window form would rank null-valued rows last and emit them when a
    // group has fewer than 3 non-null rows)
    Some("""SELECT event_type, CAST(rank AS INT) AS rank, event_id, value
           |FROM (
           |  SELECT event_type, event_id, value,
           |         row_number() OVER (PARTITION BY event_type
           |           ORDER BY value DESC, event_id) AS rank
           |  FROM events WHERE value IS NOT NULL
           |) WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin))

  /** Per-class cap for balanced sampling. */
  val BalanceCap = 150

  /** Class-balanced downsampling: cap every language at [[BalanceCap]]
    * docs, selecting by multiplicative-hash rank — deterministic (re-runs
    * pick the same docs), unbiased by doc_id order, and expressible as
    * one window pass. The standard fix for a source-skewed corpus before
    * training. */
  val qBalanceLangs = QueryDef("q_balance_langs",
    (spark, dir) => {
      val h = pmod(col("doc_id") * KnuthMul, lit(4294967296L))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("h"), col("doc_id"))
      Tables.documents(spark, dir)
        .withColumn("h", h)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= BalanceCap)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("kept_chars"))
        .orderBy("lang")
    },
    Some(s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
            |       CAST(sum(n_chars) AS BIGINT) AS kept_chars
            |FROM (
            |  SELECT lang, n_chars,
            |         row_number() OVER (PARTITION BY lang
            |           ORDER BY (doc_id * $KnuthMul) % 4294967296, doc_id) AS rk
            |  FROM documents)
            |WHERE rk <= $BalanceCap
            |GROUP BY lang ORDER BY lang""".stripMargin))

  /** MinHash signature length / seed for [[qLangSimilarity]]. */
  val LangSimK = 256
  val LangSimSeed = 42L

  /** Cross-language corpus similarity from aggregated MinHash signatures:
    * one k-long signature per language (elementwise-min merge — partial
    * agg friendly), then a tiny 5×5 cross join of signatures. Estimates
    * Jaccard of the langs' shingle-set UNIONS without materializing any
    * document pair.
    *
    * HASH-CHECKED (round-5 upgrade from rows-only): the elementwise-min
    * union means sig(lang)ⱼ = min over the lang's DISTINCT shingle union
    * of splitmix64(fnv(shingle) ⊕ seedⱼ) — so DuckDB re-derives every
    * signature from the same FNV-1a fold and the UBIGINT-native SplitMix
    * chain ([[TextQueries.splitmixUbCtesSql]]; the per-j seeds are
    * engine-computed literals, the CMS-oracle pattern), mins in SIGNED
    * 64-bit exactly like the Spark kernel, and reproduces each agreement
    * fraction bit-for-bit. */
  val qLangSimilarity = QueryDef("q_lang_minhash_similarity",
    (spark, dir) => {
      val sigs = Tables.documents(spark, dir)
        .select(col("lang"),
          MinHashSig(TextAnalysis.shingles(col("text"), 3), LangSimK, LangSimSeed)
            .as("sig"))
        .groupBy("lang")
        .agg(MinHashAgg(col("sig")).as("sig"))
      val a = sigs.select(col("lang").as("lang_a"), col("sig").as("sig_a"))
      val b = sigs.select(col("lang").as("lang_b"), col("sig").as("sig_b"))
      a.join(broadcast(b), col("lang_a") < col("lang_b"))
        .select(col("lang_a"), col("lang_b"),
          MinHashAgg.estimateJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
        .orderBy("lang_a", "lang_b")
    },
    Some {
      val seedRows = (0 until LangSimK).map(j =>
        s"($j, CAST('${java.lang.Long.toUnsignedString(
          graft.expr.TextHashKernels.splitmix64(LangSimSeed + j))}' AS UBIGINT))")
        .mkString(", ")
      s"""WITH toks AS (
         |  SELECT lang, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL
         |), sh AS (
         |  SELECT DISTINCT lang,
         |         unnest(${TextAnalysis.shinglesOverWsSql(3)}) AS shingle
         |  FROM toks
         |), hs AS MATERIALIZED (
         |  SELECT lang, CAST(${TextQueries.fnvFoldSql("shingle")} AS UBIGINT) AS h
         |  FROM sh
         |), sd AS (
         |  SELECT * FROM (VALUES $seedRows) AS t(j, sdv)
         |), hx AS (
         |  SELECT lang, j, xor(h, sdv) AS z FROM hs CROSS JOIN sd
         |), ${TextQueries.splitmixUbCtesSql("hx", "lang, j", "m")},
         |sig AS (
         |  SELECT lang, j, min(${TextQueries.ubToSignedSql("z")}) AS sj
         |  FROM md GROUP BY lang, j
         |)
         |SELECT a.lang AS lang_a, b.lang AS lang_b,
         |       CAST(sum(CASE WHEN a.sj = b.sj THEN 1 ELSE 0 END) AS DOUBLE)
         |         / $LangSimK.0 AS est_jaccard
         |FROM sig a JOIN sig b ON a.lang < b.lang AND a.j = b.j
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    })

  /** Domain-mixture sampling weights: give every source an equal share
    * of the total token budget and emit the per-source sampling rate
    * that achieves it (capped at 1.0 — a source can't be upsampled by
    * subsampling). The arithmetic every training run does when turning
    * "mix these domains equally" into per-domain rates; the division
    * chain is parenthesized identically on both engines. */
  val qMixWeights = QueryDef("q_mix_weights",
    (spark, dir) => {
      val per = graft.core.Tables.documents(spark, dir)
        .groupBy("source")
        .agg(sum(graft.text.TextAnalysis.tokenCount(col("text")).cast("long"))
          .as("toks"))
      val tot = per.agg(sum("toks").as("tot"), count(lit(1)).as("ns"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("toks"),
          (col("tot").cast("double") / col("ns").cast("double"))
            .as("target_tokens"),
          least(lit(1.0),
            (col("tot").cast("double") / col("ns").cast("double"))
              / col("toks").cast("double")).as("sample_rate"))
        .orderBy("source")
    },
    Some(s"""WITH per AS (
            |  SELECT source,
            |         CAST(sum(${graft.text.TextAnalysis.tokenCountSql("text")}) AS BIGINT) AS toks
            |  FROM documents GROUP BY source
            |), tot AS (
            |  SELECT CAST(sum(toks) AS BIGINT) AS tot,
            |         CAST(count(*) AS BIGINT) AS ns
            |  FROM per
            |)
            |SELECT source, toks,
            |       CAST(tot AS DOUBLE) / CAST(ns AS DOUBLE) AS target_tokens,
            |       least(CAST(1.0 AS DOUBLE),
            |             (CAST(tot AS DOUBLE) / CAST(ns AS DOUBLE))
            |             / CAST(toks AS DOUBLE)) AS sample_rate
            |FROM per, tot ORDER BY source""".stripMargin))

  /** PPS sample size for [[qWeightedSample]] — small enough that the
    * boundary key gap dwarfs cross-engine ln() ulp jitter, large enough
    * to exercise the heap merge across partitions. */
  val SampleK = 50

  /** Weighted (probability-proportional-to-size) sample of 50 documents,
    * weight = n_chars, via deterministic A-ES
    * ([[graft.operators.Sampling.weightedSample]]). The DuckDB oracle
    * re-derives the IDENTICAL sample from the same finalized
    * fingerprints — the reproducibility property a training pipeline
    * needs from its subsampling step. The ranking key is float (ln), so
    * it is not emitted; the selected id SET is what's hash-checked. */
  val qWeightedSample = QueryDef("q_weighted_sample",
    (spark, dir) => graft.operators.Sampling.weightedSample(
      Tables.documents(spark, dir).select("doc_id", "source", "n_chars"),
      "doc_id", "n_chars", SampleK)
      .orderBy("doc_id"),
    Some {
      val u = """(CASE WHEN z < CAST('9223372036854775808' AS HUGEINT)
                |      THEN CAST(CAST(z AS BIGINT) AS DOUBLE)
                |      ELSE CAST(CAST(z - CAST('18446744073709551616' AS HUGEINT)
                |                     AS BIGINT) AS DOUBLE) + 1.8446744073709552e19
                | END + 0.5) / 1.8446744073709552e19""".stripMargin
      s"""WITH h AS (
         |  SELECT doc_id, source, n_chars,
         |         ${TextQueries.fnvFoldSql("CAST(doc_id AS VARCHAR)")} AS z
         |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
         |), ${TextQueries.splitmixCtesSql("h", "doc_id, source, n_chars", "w")},
         |keyed AS (
         |  SELECT doc_id, source, n_chars,
         |         ln($u) / CAST(n_chars AS DOUBLE) AS k
         |  FROM w5
         |), top AS (
         |  SELECT doc_id, source, n_chars FROM keyed
         |  ORDER BY k DESC, doc_id LIMIT $SampleK
         |)
         |SELECT doc_id, source, n_chars FROM top ORDER BY doc_id""".stripMargin
    })

  /** Frequency-ranked vocabulary build + corpus token-id encoding — the
    * tokenize-and-encode step of a training pipeline, as one query:
    * token_id = rank of the token by (corpus frequency DESC, token ASC),
    * output = every (doc_id, position, token_id) triple.
    *
    * Scale shape: the corpus side is map-only — split + posexplode in
    * the scan's codegen, then a BROADCAST join against the vocabulary
    * (a real tokenizer's vocab is bounded model-scale state, ≤ ~100k
    * entries). The one ranking window runs over the AGGREGATED
    * distinct-token table — bounded by construction, not corpus-sized —
    * which is the documented exception to the no-unpartitioned-windows
    * rule (ranking a vocabulary is inherently global; the input is
    * already collapsed to one row per token). */
  val qTokenIds = QueryDef("q_token_ids",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .filter(col("tok") =!= "")
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .withColumn("token_id",
          row_number().over(Window.orderBy(desc("cnt"), col("tok"))).cast("long"))
        .select("tok", "token_id")
      toks.join(broadcast(vocab), "tok")
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("token_id"))
        .orderBy("doc_id", "pos")
    },
    Some("""WITH toks0 AS (
           |  SELECT doc_id, string_split(text, ' ') AS ws
           |  FROM documents WHERE text IS NOT NULL
           |), toks AS (
           |  SELECT doc_id, i AS pos, ws[i + 1] AS tok
           |  FROM toks0, LATERAL (SELECT unnest(range(len(ws))) AS i) u
           |  WHERE ws[i + 1] <> ''
           |), vocab AS (
           |  SELECT tok,
           |         row_number() OVER (ORDER BY count(*) DESC, tok) AS token_id
           |  FROM toks GROUP BY tok
           |)
           |SELECT t.doc_id, t.pos, v.token_id
           |FROM toks t JOIN vocab v USING (tok)
           |ORDER BY doc_id, pos""".stripMargin))

  /** Per-stratum sample size for [[qWeightedSampleBySource]]. */
  val PerSourceK = 10

  /** Stratified PPS sampling: an independent A-ES weighted sample of
    * [[PerSourceK]] docs per source — the per-domain subsampling step of
    * mixture construction. The ranking runs through [[graft.expr.TopKAgg]]
    * (bounded per-group heaps, partial-aggregated), NOT a window: at
    * 100 TB the exchange carries ≤ k rows per (source × map task)
    * instead of every row sorting under a window. The A-ES key is the
    * same deterministic ln(u)/w as [[qWeightedSample]]; ties (never, in
    * practice — u is an injective hash) break by doc_id, matching the
    * oracle's `ORDER BY k DESC, doc_id` exactly. The float key is not
    * emitted; rank and ids are what's hash-checked. */
  val qWeightedSampleBySource = QueryDef("q_weighted_sample_by_source",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
        .filter(col("n_chars").isNotNull && col("n_chars") > 0)
      val key = graft.operators.Sampling.aesKey(
        col("doc_id").cast("string"), col("n_chars"))
      docs.groupBy("source")
        .agg(TopKAgg(key, col("doc_id"), PerSourceK).as("top"))
        .select(col("source"), posexplode(col("top")).as(Seq("rank", "e")))
        .select(col("source"), col("rank").cast("long").as("rank"),
          col("e.payload").as("doc_id"))
        .orderBy("source", "rank")
    },
    Some {
      val u = """(CASE WHEN z < CAST('9223372036854775808' AS HUGEINT)
                |      THEN CAST(CAST(z AS BIGINT) AS DOUBLE)
                |      ELSE CAST(CAST(z - CAST('18446744073709551616' AS HUGEINT)
                |                     AS BIGINT) AS DOUBLE) + 1.8446744073709552e19
                | END + 0.5) / 1.8446744073709552e19""".stripMargin
      s"""WITH h AS (
         |  SELECT doc_id, source, n_chars,
         |         ${TextQueries.fnvFoldSql("CAST(doc_id AS VARCHAR)")} AS z
         |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
         |), ${TextQueries.splitmixCtesSql("h", "doc_id, source, n_chars", "w")},
         |keyed AS (
         |  SELECT doc_id, source,
         |         ln($u) / CAST(n_chars AS DOUBLE) AS k
         |  FROM w5
         |), ranked AS (
         |  SELECT source, doc_id,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY k DESC, doc_id) - 1 AS rank
         |  FROM keyed
         |)
         |SELECT source, rank, doc_id FROM ranked
         |WHERE rank < $PerSourceK ORDER BY source, rank""".stripMargin
    })

  /** Snapshot CDC diff ([[graft.operators.Upsert.snapshotDiff]]) between
    * two planted corpus versions: every 13th doc removed, every
    * surviving 17th edited, the first 20 re-added under shifted ids.
    * The Spark side compares 8-byte content fingerprints (the scale
    * mechanism — payloads never shuffle); the oracle compares the raw
    * text (the semantics) — identical verdicts absent an FNV collision,
    * which the hash check would expose. Unchanged keys are omitted by
    * contract: the diff of two barely-different snapshots is small, and
    * that asymmetry is what makes incremental reprocessing cheap. */
  val qSnapshotDiff = QueryDef("q_snapshot_diff",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir).filter(col("text").isNotNull)
      val oldSnap = docs.select(col("doc_id"), col("text"))
      val newSnap = docs
        .filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 17 === 0, concat(col("text"), lit(" [edited]")))
            .otherwise(col("text")).as("text"))
        .unionByName(docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      graft.operators.Upsert.snapshotDiff(oldSnap, newSnap, "doc_id",
        graft.expr.Fingerprint64(col("text")))
        .orderBy("doc_id")
    },
    Some("""WITH oldd AS (
           |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
           |), newd AS (
           |  SELECT doc_id,
           |         CASE WHEN doc_id % 17 = 0 THEN text || ' [edited]'
           |              ELSE text END AS text
           |  FROM documents WHERE text IS NOT NULL AND doc_id % 13 <> 0
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
           |  WHERE text IS NOT NULL AND doc_id < 20
           |), diff AS (
           |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           |         CASE WHEN o.doc_id IS NULL THEN 'added'
           |              WHEN n.doc_id IS NULL THEN 'removed'
           |              WHEN o.text <> n.text THEN 'changed' END AS change
           |  FROM oldd o FULL OUTER JOIN newd n ON o.doc_id = n.doc_id
           |)
           |SELECT doc_id, change FROM diff
           |WHERE change IS NOT NULL ORDER BY doc_id""".stripMargin))

  /** Per-domain page cap for [[qDomainCap]]. */
  val DomainCap = 30

  /** Per-domain diversity capping over parsed URLs — the web-curation
    * twin of [[qBalanceLangs]] (no crawl should be dominated by one
    * site). Each doc gets a deterministic synthetic URL (the corpus has
    * none), the domain is extracted with a regex both engines run
    * identically (RE2-safe subset, like the redaction rules), and every
    * domain keeps at most [[DomainCap]] docs by multiplicative-hash rank. */
  val qDomainCap = QueryDef("q_domain_cap",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          concat(lit("https://site"), pmod(col("doc_id"), lit(7)).cast("string"),
            lit(".example.com/page/"), col("doc_id").cast("string")).as("url"))
      val h = pmod(col("doc_id") * KnuthMul, lit(4294967296L))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("domain").orderBy(col("h"), col("doc_id"))
      docs
        .withColumn("domain",
          regexp_extract(col("url"), "https?://([^/]+)/", 1))
        .withColumn("h", h)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= DomainCap)
        .groupBy("domain")
        .agg(count(lit(1)).as("n_kept"), min("doc_id").as("first_doc"))
        .orderBy("domain")
    },
    Some(s"""SELECT domain, CAST(count(*) AS BIGINT) AS n_kept,
            |       min(doc_id) AS first_doc
            |FROM (
            |  SELECT doc_id,
            |         regexp_extract(url, 'https?://([^/]+)/', 1) AS domain,
            |         row_number() OVER (
            |           PARTITION BY regexp_extract(url, 'https?://([^/]+)/', 1)
            |           ORDER BY (doc_id * $KnuthMul) % 4294967296, doc_id) AS rk
            |  FROM (SELECT doc_id,
            |          'https://site' || CAST(doc_id % 7 AS VARCHAR) ||
            |          '.example.com/page/' || CAST(doc_id AS VARCHAR) AS url
            |        FROM documents WHERE text IS NOT NULL)
            |)
            |WHERE rk <= $DomainCap
            |GROUP BY domain ORDER BY domain""".stripMargin))

  /** Sample size / probe points for [[qSampleQuantiles]]. */
  val QuantK = 400
  val QuantProbs = Seq(0.25, 0.5, 0.75, 0.95)

  /** Per-status order-value quantile ESTIMATES from the deterministic
    * k-sample ([[graft.operators.Sketches.sampleQuantiles]]) — the
    * quantile member of the sketch family. Runs over `orders` because
    * the sketch contract needs a UNIQUE row id to seed the draw and
    * o_orderkey is a real primary key (the synthetic lineitem repeats
    * (orderkey, linenumber) pairs). HASH-CHECKED with no rounding at
    * all: the sample is a pure function of the row ids (A-ES uniform
    * race, same hash chain as the weighted samples) and the quantile is
    * closed-form linear interpolation on the sorted sample — plain IEEE
    * arithmetic both engines execute identically. */
  val qSampleQuantiles = QueryDef("q_sample_quantiles",
    (spark, dir) => graft.operators.Sketches.sampleQuantiles(
      Tables.orders(spark, dir), "o_orderstatus",
      col("o_orderkey"), "o_totalprice", QuantK, QuantProbs)
      .orderBy("o_orderstatus", "prob"),
    Some {
      val u = """(CASE WHEN z < CAST('9223372036854775808' AS HUGEINT)
                |      THEN CAST(CAST(z AS BIGINT) AS DOUBLE)
                |      ELSE CAST(CAST(z - CAST('18446744073709551616' AS HUGEINT)
                |                     AS BIGINT) AS DOUBLE) + 1.8446744073709552e19
                | END + 0.5) / 1.8446744073709552e19""".stripMargin
      val probsList = QuantProbs.mkString("[", ", ", "]")
      val pos = "CAST(len(vs) - 1 AS DOUBLE) * prob"
      s"""WITH h AS (
         |  SELECT o_orderstatus, o_orderkey, o_totalprice,
         |         ${TextQueries.fnvFoldSql("CAST(o_orderkey AS VARCHAR)")} AS z
         |  FROM orders WHERE o_totalprice IS NOT NULL
         |), ${TextQueries.splitmixCtesSql(
                "h", "o_orderstatus, o_orderkey, o_totalprice", "w")},
         |keyed AS (
         |  SELECT o_orderstatus, o_orderkey, o_totalprice, ln($u) / 1.0 AS kk
         |  FROM w5
         |), ranked AS (
         |  SELECT o_orderstatus, o_totalprice,
         |         row_number() OVER (PARTITION BY o_orderstatus
         |           ORDER BY kk DESC, o_orderkey) AS rn
         |  FROM keyed
         |), grp AS (
         |  SELECT o_orderstatus,
         |         list_sort(list(CAST(o_totalprice AS DOUBLE))) AS vs
         |  FROM ranked WHERE rn <= $QuantK GROUP BY o_orderstatus
         |), pr AS (
         |  SELECT o_orderstatus, vs, unnest($probsList) AS prob FROM grp
         |)
         |SELECT o_orderstatus, prob,
         |       vs[CAST(floor($pos) AS INT) + 1]
         |       + (vs[CAST(ceil($pos) AS INT) + 1]
         |          - vs[CAST(floor($pos) AS INT) + 1])
         |         * ($pos - floor($pos)) AS quantile
         |FROM pr ORDER BY o_orderstatus, prob""".stripMargin
    })

  /** Relative accuracy for [[qDdQuantiles]] (γ ≈ 1.0202). */
  val DdAlpha = 0.01

  /** Per-status order-value quantiles from the DDSketch-style mergeable
    * log-bucket sketch ([[graft.expr.DdQuantileAgg]]) — the
    * deterministic-worst-case sibling of [[qSampleQuantiles]] (whose
    * error is random ±O(1/√k)): every estimate is within α relative
    * error of a true quantile element, for any data and any quantile.
    * Bucket counts are a pure function of the input multiset, so the
    * oracle RE-DERIVES the sketch exactly in SQL: same 6-dp-rounded
    * log buckets, same cumulative-rank walk, same representative-value
    * formula — the estimate itself is hash-checked, not just bounded. */
  val qDdQuantiles = QueryDef("q_dd_quantiles",
    (spark, dir) => {
      val probsArr = array(QuantProbs.map(lit): _*)
      Tables.orders(spark, dir)
        .groupBy("o_orderstatus")
        .agg(graft.expr.DdQuantileAgg(
          col("o_totalprice").cast("double"), DdAlpha, QuantProbs).as("ests"))
        .select(col("o_orderstatus"),
          posexplode(col("ests")).as(Seq("pos", "quantile")))
        .select(col("o_orderstatus"),
          element_at(probsArr, col("pos") + 1).as("prob"), col("quantile"))
        .orderBy("o_orderstatus", "prob")
    },
    Some {
      val g = s"((1.0 + $DdAlpha) / (1.0 - $DdAlpha))"
      val probsList = QuantProbs.mkString("[", ", ", "]")
      s"""WITH v AS (
         |  SELECT o_orderstatus AS grp, CAST(o_totalprice AS DOUBLE) AS v
         |  FROM orders WHERE o_totalprice IS NOT NULL
         |), b AS (
         |  SELECT grp, CAST(ceil(round(ln(v) / ln($g), 6)) AS BIGINT) AS b,
         |         count(*) AS c
         |  FROM v GROUP BY grp, b
         |), cum AS (
         |  SELECT grp, b,
         |         sum(c) OVER (PARTITION BY grp ORDER BY b) AS cum,
         |         sum(c) OVER (PARTITION BY grp) AS n
         |  FROM b
         |), pr AS (
         |  SELECT grp, b, cum, n, unnest($probsList) AS prob FROM cum
         |), sel AS (
         |  SELECT grp, prob, min(b) AS bsel
         |  FROM pr
         |  WHERE cum >= CAST(floor(prob * (n - 1)) AS BIGINT) + 1
         |  GROUP BY grp, prob
         |)
         |SELECT grp AS o_orderstatus, prob,
         |       round(2.0 * exp(CAST(bsel AS DOUBLE) * ln($g)) / ($g + 1.0), 6)
         |         AS quantile
         |FROM sel ORDER BY o_orderstatus, prob""".stripMargin
    })

  /** SKETCH-PARTIALS rollup for DDSketch — the quantile member of the
    * pattern ([[graft.TextQueries.qDistinctHllRollup]] = distinct
    * counts, `q_token_cms_rollup` = frequencies): one scan builds a
    * per-status serialized bucket-map sketch
    * ([[graft.expr.DdSketchAgg]]), and the corpus-wide 'ALL' quantiles
    * are answered from those PARTIALS via [[graft.expr.DdMergeAgg]]
    * (count addition — sketch-of-union ≡ merge-of-sketches exactly) +
    * [[graft.expr.DdSketchQuantiles]] (the SAME estimate walk as the
    * one-shot aggregate, one implementation). The oracle re-derives
    * both levels relationally from the 6-dp log-bucket formula, so the
    * merged estimates are hash-checked, not just bounded. */
  val qDdQuantilesRollup = QueryDef("q_dd_quantiles_rollup",
    (spark, dir) => {
      val probsArr = array(QuantProbs.map(lit): _*)
      val perStatus = Tables.orders(spark, dir)
        .groupBy("o_orderstatus")
        .agg(graft.expr.DdSketch.sketch(
          col("o_totalprice").cast("double"), DdAlpha).as("sk"))
      val global = perStatus
        .agg(graft.expr.DdSketch.mergeSketches(col("sk")).as("sk"))
        .select(lit("ALL").as("o_orderstatus"), col("sk"))
      perStatus.unionByName(global)
        .select(col("o_orderstatus"),
          posexplode(graft.expr.DdSketch.quantiles(
            col("sk"), DdAlpha, QuantProbs)).as(Seq("pos", "quantile")))
        .select(col("o_orderstatus"),
          element_at(probsArr, col("pos") + 1).as("prob"), col("quantile"))
        .orderBy("o_orderstatus", "prob")
    },
    Some {
      val g = s"((1.0 + $DdAlpha) / (1.0 - $DdAlpha))"
      val probsList = QuantProbs.mkString("[", ", ", "]")
      s"""WITH v0 AS (
         |  SELECT o_orderstatus AS grp, CAST(o_totalprice AS DOUBLE) AS v
         |  FROM orders WHERE o_totalprice IS NOT NULL
         |), v AS (
         |  SELECT grp, v FROM v0
         |  UNION ALL SELECT 'ALL' AS grp, v FROM v0
         |), b AS (
         |  SELECT grp, CAST(ceil(round(ln(v) / ln($g), 6)) AS BIGINT) AS b,
         |         count(*) AS c
         |  FROM v GROUP BY grp, b
         |), cum AS (
         |  SELECT grp, b,
         |         sum(c) OVER (PARTITION BY grp ORDER BY b) AS cum,
         |         sum(c) OVER (PARTITION BY grp) AS n
         |  FROM b
         |), pr AS (
         |  SELECT grp, b, cum, n, unnest($probsList) AS prob FROM cum
         |), sel AS (
         |  SELECT grp, prob, min(b) AS bsel
         |  FROM pr
         |  WHERE cum >= CAST(floor(prob * (n - 1)) AS BIGINT) + 1
         |  GROUP BY grp, prob
         |)
         |SELECT grp AS o_orderstatus, prob,
         |       round(2.0 * exp(CAST(bsel AS DOUBLE) * ln($g)) / ($g + 1.0), 6)
         |         AS quantile
         |FROM sel ORDER BY o_orderstatus, prob""".stripMargin
    })

  /** SKETCH-PARTIALS rollup for the uniform sample — the last member of
    * the reaggregable family (HLL = distinct, CMS = frequencies,
    * DDSketch + this = distribution shape, KMV = order statistics): one
    * scan builds a per-status serialized k-sample
    * ([[graft.expr.SampleSketchAgg]] — the A-ES race at weight 1,
    * reduced to pure unsigned-hash order so the sketch is libm-free),
    * and the corpus-wide 'ALL' quantiles are answered from those
    * PARTIALS via [[graft.expr.SampleMergeAgg]] (keep the k largest race
    * keys of the union — lossless: merge-of-sketches ≡
    * sketch-of-union, spec-asserted BYTE-for-byte) +
    * [[graft.expr.SampleSketchQuantiles]] (the same closed-form
    * interpolation as the one-shot [[qSampleQuantiles]]). The oracle
    * re-derives both levels from the same hash chain and rank
    * selection, so the merged estimates are hash-checked, not just
    * bounded. */
  val qSampleQuantilesRollup = QueryDef("q_sample_quantiles_rollup",
    (spark, dir) => {
      val probsArr = array(QuantProbs.map(lit): _*)
      val perStatus = Tables.orders(spark, dir)
        .filter(col("o_totalprice").isNotNull)
        .groupBy("o_orderstatus")
        .agg(graft.expr.SampleSketchAgg.sketch(
          graft.expr.Fingerprint64(col("o_orderkey").cast("string")),
          col("o_totalprice").cast("double"), QuantK).as("sk"))
      val global = perStatus
        .agg(graft.expr.SampleSketchAgg.mergeSketches(col("sk"), QuantK).as("sk"))
        .select(lit("ALL").as("o_orderstatus"), col("sk"))
      perStatus.unionByName(global)
        .select(col("o_orderstatus"),
          posexplode(graft.expr.SampleSketchAgg.quantiles(
            col("sk"), QuantK, QuantProbs)).as(Seq("pos", "quantile")))
        .select(col("o_orderstatus"),
          element_at(probsArr, col("pos") + 1).as("prob"), col("quantile"))
        .orderBy("o_orderstatus", "prob")
    },
    Some {
      val probsList = QuantProbs.mkString("[", ", ", "]")
      val pos = "CAST(len(vs) - 1 AS DOUBLE) * prob"
      s"""WITH h AS (
         |  SELECT o_orderstatus, o_orderkey, o_totalprice,
         |         ${TextQueries.fnvFoldSql("CAST(o_orderkey AS VARCHAR)")} AS z
         |  FROM orders WHERE o_totalprice IS NOT NULL
         |), ${TextQueries.splitmixCtesSql(
                "h", "o_orderstatus, o_totalprice", "w")},
         |u AS (
         |  SELECT DISTINCT o_orderstatus, o_totalprice, z FROM w5
         |  UNION ALL
         |  SELECT DISTINCT 'ALL' AS o_orderstatus, o_totalprice, z FROM w5
         |), ranked AS (
         |  SELECT o_orderstatus, o_totalprice,
         |         row_number() OVER (PARTITION BY o_orderstatus
         |           ORDER BY z DESC) AS rn
         |  FROM u
         |), grp AS (
         |  SELECT o_orderstatus,
         |         list_sort(list(CAST(o_totalprice AS DOUBLE))) AS vs
         |  FROM ranked WHERE rn <= $QuantK GROUP BY o_orderstatus
         |), pr AS (
         |  SELECT o_orderstatus, vs, unnest($probsList) AS prob FROM grp
         |)
         |SELECT o_orderstatus, prob,
         |       vs[CAST(floor($pos) AS INT) + 1]
         |       + (vs[CAST(ceil($pos) AS INT) + 1]
         |          - vs[CAST(floor($pos) AS INT) + 1])
         |         * ($pos - floor($pos)) AS quantile
         |FROM pr ORDER BY o_orderstatus, prob""".stripMargin
    })

  def all: Seq[QueryDef] = Seq(
    qSampleSplit, qBalanceLangs, qPackSequences, qTop3Agg, qLangSimilarity,
    qMixWeights, qWeightedSample, qTokenIds, qWeightedSampleBySource,
    qSampleQuantiles, qSampleQuantilesRollup, qDdQuantiles,
    qDdQuantilesRollup, qDomainCap, qSnapshotDiff)
}
