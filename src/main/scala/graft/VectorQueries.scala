package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** Similarity-search catalog entries over the `embeddings` table
  * (`vec_id`, `embedding: array<float>`, `label`). Oracles use DuckDB's
  * `list_cosine_similarity` over the embedding cast to DOUBLE[] — the same
  * index-order double accumulation as [[graft.expr.CosineSim]]; both sides
  * round to 1e-6 before ranking so rank ties are cross-engine stable. */
object VectorQueries {

  /** Number of query vectors (the `vec_id < N` prefix — a stand-in for a
    * user-supplied query set). */
  val NQueries = 10
  val TopK = 10
  val TopPairs = 50

  /** Cosine mirror with the zero-vector convention pinned: the Spark
    * kernel returns 0.0 when either norm is zero (an all-zero embedding
    * is "similar to nothing"), while DuckDB's list_cosine_similarity
    * returns −1.0 — guard the mirror so a padding/failed-encode row
    * cannot silently diverge the ranking. */
  private def cosSql(a: String, b: String): String =
    s"""CASE WHEN list_sum(list_apply($a, x -> x * x)) = 0
       |          OR list_sum(list_apply($b, x -> x * x)) = 0
       |     THEN CAST(0.0 AS DOUBLE)
       |     ELSE ROUND(list_cosine_similarity($a, $b), 6) END""".stripMargin

  /** DuckDB mirror of exact per-query cosine top-k — shared by the
    * brute-force entry and the full-probe IVF entry (probing every
    * trained bucket must reproduce brute force bit-for-bit). */
  private val exactTopKOracle: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         ${cosSql("q.v", "c.v")} AS cosine
       |  FROM e q JOIN e c ON q.vec_id < $NQueries AND c.vec_id <> q.vec_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, cosine FROM ranked
       |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin

  /** Brute-force exact cosine top-k per query vector — the ANN
    * baseline, and ORACLE-TWIN for the PQ scale path: the exhaustive
    * query×corpus scoring is what PQ's codes-only shortlist replaces
    * at memory scale, and [[graft.PqSpec]] measures PQ recall against
    * exactly this output. Plan shape: corpus scan → broadcast
    * nested-loop with the tiny query side → codegen'd cosine →
    * per-query TopK (one shuffle keyed by query_id for the window). */
  val qAnnTopK = QueryDef("q_ann_topk_bruteforce",
    (spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
      Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < NQueries), "vec_id", "embedding", TopK)
        .orderBy("query_id", "rank")
    },
    Some(exactTopKOracle),
    role = OracleTwin(Seq("q_ann_pq_topk", "q_ann_ivfpq_topk")))

  /** Product-quantization ANN ([[graft.operators.Pq]]): codes-only ADC
    * shortlist (32× vector compression at dim 64 / m 8 / 5-bit codes)
    * exact-rescored at candidate cardinality.
    *
    * FULLY ORACLE-CHECKED (r10): the trained codebooks are exported as
    * a parquet table ([[PqCodebookPath]]) and the oracle REPLAYS the
    * whole approximate pipeline from them in SQL — per-block argmin
    * encode (strict-<, code-ascending ties), the query LUT, the
    * b-ordered ADC fold, 1e-6-rounded shortlist ranking, exact-cosine
    * rescore — all with the kernels' index-order double accumulation
    * (ordered list_reduce, the SQ8 oracle's discipline). Deterministic
    * training ([[graft.operators.Pq.train]]: smallest-id sample,
    * first-wins Lloyd) makes the exported codebook bit-stable, so the
    * oracle sees exactly the floats the kernels baked in. */
  val PqM = 8
  val PqKsub = 32
  val PqShortlist = 8 * TopK
  val PqCodebookPath = "/tmp/graft_pq_codebook.parquet"

  /** Export trained codebooks as (b, c, cv float[]) parquet — the
    * oracle's view of the model. Fixed absolute path: the oracle SQL
    * text must name it literally. */
  private def exportCodebook(spark: org.apache.spark.sql.SparkSession,
      cb: graft.operators.Pq.Codebooks, path: String): Unit = {
    import spark.implicits._
    (for (b <- 0 until cb.m; c <- 0 until cb.ksub)
      yield (b, c, cb.books(b)(c).toSeq))
      .toDF("b", "c", "cv").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** The shared SQL replay of a PQ ADC search given a codebook table:
    * encode corpus → LUT queries → ordered ADC fold → rounded
    * shortlist → exact rescore. `vecExpr` selects the encoded vector
    * (raw embedding for PQ; residual against an assigned centroid for
    * IVF-PQ callers building on the same CTE names). */
  private def fold(body: String, n: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  [$body for i in generate_series(1, len($n))]),
       |  (acc, x) -> acc + x)""".stripMargin

  val qAnnPq = QueryDef("q_ann_pq_topk",
    (spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
      val cb = graft.operators.Pq.train(
        emb, "vec_id", "embedding", PqM, PqKsub)
      exportCodebook(spark, cb, PqCodebookPath)
      graft.operators.Pq.pqTopK(
        emb, emb.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", cb, TopK, PqShortlist)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH book AS (
            |  SELECT b, c, cv::DOUBLE[] AS cv
            |  FROM read_parquet('$PqCodebookPath/*.parquet')
            |), e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            |), blocks AS (SELECT DISTINCT b FROM book
            |), sub AS (  -- per (vector, block) subvector, 1-based slice
            |  SELECT e.vec_id, blocks.b,
            |         e.v[blocks.b * 8 + 1 : blocks.b * 8 + 8] AS s
            |  FROM e, blocks
            |), d2 AS (   -- squared L2 to every block centroid
            |  SELECT sub.vec_id, sub.b, book.c,
            |         ${fold("(sub.s[i] - book.cv[i]) * (sub.s[i] - book.cv[i])", "sub.s")} AS d
            |  FROM sub JOIN book ON book.b = sub.b
            |), enc AS (  -- argmin: strict-<, code-ascending first-wins
            |  SELECT vec_id, b, c AS code FROM (
            |    SELECT vec_id, b, c, row_number() OVER (
            |      PARTITION BY vec_id, b ORDER BY d, c) AS rn
            |    FROM d2) WHERE rn = 1
            |), nrm AS (
            |  SELECT vec_id, sqrt(${fold("v[i] * v[i]", "v")}) AS nrm FROM e
            |), lut AS (  -- query ADC table: dot(q_block, centroid)
            |  SELECT s.vec_id AS query_id, s.b, book.c,
            |         ${fold("s.s[i] * book.cv[i]", "s.s")} AS val
            |  FROM sub s JOIN book ON book.b = s.b
            |  WHERE s.vec_id < $NQueries
            |), adc AS (  -- sum lut[b][codes[b]] in ascending-b order
            |  SELECT l.query_id, enc.vec_id AS neighbor_id,
            |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
            |           list(l.val ORDER BY enc.b)),
            |           (acc, x) -> acc + x) AS adc
            |  FROM enc JOIN lut l ON l.b = enc.b AND l.c = enc.code
            |  WHERE enc.vec_id <> l.query_id
            |  GROUP BY l.query_id, enc.vec_id
            |), scored AS (
            |  SELECT adc.query_id, adc.neighbor_id,
            |         CASE WHEN nq.nrm * nc.nrm = 0 THEN CAST(0.0 AS DOUBLE)
            |              ELSE round(adc.adc / (nq.nrm * nc.nrm), 6)
            |         END AS approx
            |  FROM adc
            |  JOIN nrm nq ON nq.vec_id = adc.query_id
            |  JOIN nrm nc ON nc.vec_id = adc.neighbor_id
            |), short AS (
            |  SELECT query_id, neighbor_id, row_number() OVER (
            |    PARTITION BY query_id ORDER BY approx DESC, neighbor_id) AS srn
            |  FROM scored
            |), rescored AS (
            |  SELECT s.query_id, s.neighbor_id,
            |         ${cosSql("eq.v", "ec.v")} AS cosine
            |  FROM short s
            |  JOIN e eq ON eq.vec_id = s.query_id
            |  JOIN e ec ON ec.vec_id = s.neighbor_id
            |  WHERE s.srn <= $PqShortlist
            |), ranked AS (
            |  SELECT query_id, neighbor_id, cosine,
            |         CAST(row_number() OVER (PARTITION BY query_id
            |           ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
            |  FROM rescored
            |)
            |SELECT query_id, rank, neighbor_id, cosine FROM ranked
            |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin))

  /** IVF-PQ — the COMPOSED production ANN architecture
    * ([[graft.operators.Pq.ivfPqTopK]], FAISS's IndexIVFPQ shape): the
    * k-means coarse quantizer prunes the corpus to [[IvfPqNprobe]] of
    * [[IvfClusters]] cells, residual-trained PQ codes
    * ([[graft.operators.Pq.trainResidual]]) score the survivors at m
    * bytes per vector, and the shortlist is exact-rescored — per-query
    * scan cost is the PRODUCT of the probe fraction and the code
    * compression, which is what a 100 TB index actually runs.
    *
    * FULLY ORACLE-CHECKED (r10), like `q_ann_pq_topk`: the trained
    * coarse centroids AND residual codebooks export as parquet, and
    * the oracle replays everything downstream of training — the
    * (d2, cid)-argmin cell assignment, float residuals, per-block
    * encode, per-query nprobe cell ranking ((l2, cid) — TopKAgg's
    * order), the cell-independent LUT + exact dot(q, c) decomposition,
    * the b-ordered ADC fold, 1e-6-rounded shortlist, and the exact
    * rescore. Recall vs the brute-force twin stays spec-measured. */
  val IvfPqNprobe = 4
  val IvfPqCentsPath = "/tmp/graft_ivfpq_cents.parquet"
  val IvfPqCodebookPath = "/tmp/graft_ivfpq_codebook.parquet"
  val qAnnIvfPq = QueryDef("q_ann_ivfpq_topk",
    (spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
      val (cents, assigned) = graft.operators.KMeans.fit(
        emb, "vec_id", "embedding", IvfClusters, IvfIters)
      val cb = graft.operators.Pq.trainResidual(
        emb, "vec_id", "embedding", cents, PqM, PqKsub)
      cents.coalesce(1).write.mode("overwrite").parquet(IvfPqCentsPath)
      exportCodebook(spark, cb, IvfPqCodebookPath)
      val q = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      graft.operators.Pq.ivfPqTopK(
        assigned, cents, q, cb, TopK, IvfPqNprobe, PqShortlist)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH book AS (
            |  SELECT b, c, cv::DOUBLE[] AS cv
            |  FROM read_parquet('$IvfPqCodebookPath/*.parquet')
            |), cent AS (
            |  SELECT cid, cv::DOUBLE[] AS cv
            |  FROM read_parquet('$IvfPqCentsPath/*.parquet')
            |), e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            |), blocks AS (SELECT DISTINCT b FROM book
            |), assigned AS ( -- (d2, cid)-argmin cell per corpus vector
            |  SELECT vec_id, cid FROM (
            |    SELECT e.vec_id, cent.cid, row_number() OVER (
            |      PARTITION BY e.vec_id ORDER BY
            |        ${fold("(e.v[i] - cent.cv[i]) * (e.v[i] - cent.cv[i])", "e.v")},
            |        cent.cid) AS rn
            |    FROM e, cent) WHERE rn = 1
            |), resid AS (  -- float residual v - c(v), widened back
            |  SELECT e.vec_id, a.cid,
            |         [CAST(CAST(e.v[i] - cent.cv[i] AS FLOAT) AS DOUBLE)
            |          for i in generate_series(1, len(e.v))] AS r
            |  FROM e JOIN assigned a ON a.vec_id = e.vec_id
            |  JOIN cent ON cent.cid = a.cid
            |), rsub AS (   -- per (vector, block) residual subvector
            |  SELECT resid.vec_id, resid.cid, blocks.b,
            |         resid.r[blocks.b * 8 + 1 : blocks.b * 8 + 8] AS s
            |  FROM resid, blocks
            |), d2 AS (
            |  SELECT rsub.vec_id, rsub.cid, rsub.b, book.c,
            |         ${fold("(rsub.s[i] - book.cv[i]) * (rsub.s[i] - book.cv[i])", "rsub.s")} AS d
            |  FROM rsub JOIN book ON book.b = rsub.b
            |), enc AS (    -- residual codes: strict-<, code-ascending
            |  SELECT vec_id, cid, b, c AS code FROM (
            |    SELECT vec_id, cid, b, c, row_number() OVER (
            |      PARTITION BY vec_id, b ORDER BY d, c) AS rn
            |    FROM d2) WHERE rn = 1
            |), nrm AS (
            |  SELECT vec_id, sqrt(${fold("v[i] * v[i]", "v")}) AS nrm FROM e
            |), probes AS ( -- nprobe nearest cells per query: (l2, cid)
            |  SELECT query_id, cid FROM (
            |    SELECT e.vec_id AS query_id, cent.cid, row_number() OVER (
            |      PARTITION BY e.vec_id ORDER BY
            |        sqrt(${fold("(e.v[i] - cent.cv[i]) * (e.v[i] - cent.cv[i])", "e.v")}),
            |        cent.cid) AS rn
            |    FROM e, cent WHERE e.vec_id < $NQueries)
            |  WHERE rn <= $IvfPqNprobe
            |), qsub AS (   -- per (query, block) RAW-query subvector
            |  SELECT e.vec_id AS query_id, blocks.b,
            |         e.v[blocks.b * 8 + 1 : blocks.b * 8 + 8] AS s
            |  FROM e, blocks WHERE e.vec_id < $NQueries
            |), lut AS (    -- one cell-independent ADC table per query
            |  SELECT q.query_id, q.b, book.c,
            |         ${fold("q.s[i] * book.cv[i]", "q.s")} AS val
            |  FROM qsub q JOIN book ON book.b = q.b
            |), qdotc AS (  -- exact dot(q, c) per probed cell
            |  SELECT p.query_id, p.cid,
            |         ${fold("e.v[i] * cent.cv[i]", "e.v")} AS qc
            |  FROM probes p
            |  JOIN e ON e.vec_id = p.query_id
            |  JOIN cent ON cent.cid = p.cid
            |), adc AS (    -- sum lut[b][codes[b]] in ascending-b order
            |  SELECT l.query_id, enc.vec_id AS neighbor_id, enc.cid,
            |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
            |           list(l.val ORDER BY enc.b)),
            |           (acc, x) -> acc + x) AS adc
            |  FROM enc
            |  JOIN probes p ON p.cid = enc.cid
            |  JOIN lut l ON l.query_id = p.query_id
            |    AND l.b = enc.b AND l.c = enc.code
            |  WHERE enc.vec_id <> l.query_id
            |  GROUP BY l.query_id, enc.vec_id, enc.cid
            |), scored AS (
            |  SELECT adc.query_id, adc.neighbor_id,
            |         CASE WHEN nq.nrm * nc.nrm = 0 THEN CAST(0.0 AS DOUBLE)
            |              ELSE round((qd.qc + adc.adc) / (nq.nrm * nc.nrm), 6)
            |         END AS approx
            |  FROM adc
            |  JOIN qdotc qd ON qd.query_id = adc.query_id AND qd.cid = adc.cid
            |  JOIN nrm nq ON nq.vec_id = adc.query_id
            |  JOIN nrm nc ON nc.vec_id = adc.neighbor_id
            |), short AS (
            |  SELECT query_id, neighbor_id, row_number() OVER (
            |    PARTITION BY query_id ORDER BY approx DESC, neighbor_id) AS srn
            |  FROM scored
            |), rescored AS (
            |  SELECT s.query_id, s.neighbor_id,
            |         ${cosSql("eq.v", "ec.v")} AS cosine
            |  FROM short s
            |  JOIN e eq ON eq.vec_id = s.query_id
            |  JOIN e ec ON ec.vec_id = s.neighbor_id
            |  WHERE s.srn <= $PqShortlist
            |), ranked AS (
            |  SELECT query_id, neighbor_id, cosine,
            |         CAST(row_number() OVER (PARTITION BY query_id
            |           ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
            |  FROM rescored
            |)
            |SELECT query_id, rank, neighbor_id, cosine FROM ranked
            |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin))

  /** SQ8 scalar-quantization ANN ([[graft.operators.Sq]]) — the
    * HASH-CHECKED member of the approximate family: per-dimension
    * linear quantization's fit (two float aggregates), encode, and
    * asymmetric scoring are all plain IEEE arithmetic, so the oracle
    * replays the ENTIRE approximate search in SQL — grid, codes,
    * reconstruction dot, norms, 1e-6-rounded shortlist ranking,
    * exact-cosine rescore — and the result hash-compares. PQ and LSH
    * are rows-only because trained floats bake into their kernels;
    * SQ8 is the approximation the oracle can follow all the way
    * through, which pins the shortlist/rescore machinery those
    * siblings share. */
  val SqShortlist = 3 * TopK
  val qAnnSq8 = QueryDef("q_ann_sq8_topk",
    (spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
      val g = graft.operators.Sq.fitGrid(emb, "embedding")
      graft.operators.Sq.sq8TopK(
        emb, emb.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", g, TopK, SqShortlist)
        .orderBy("query_id", "rank")
    },
    Some {
      val fold = (body: String, n: String) =>
        s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |  [$body for i in generate_series(1, len($n))]),
           |  (acc, x) -> acc + x)""".stripMargin
      val dequant = "(mm.mn[i] + (CAST(c.codes[i] AS DOUBLE) * " +
        "(mm.mx[i] - mm.mn[i])) / 255.0)"
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |), mmd AS (
         |  SELECT dim, min(x) AS mn, max(x) AS mx FROM (
         |    SELECT unnest(embedding) AS x,
         |           unnest(generate_series(1, len(embedding))) AS dim
         |    FROM embeddings)
         |  GROUP BY dim
         |), mm AS (
         |  SELECT list(CAST(mn AS DOUBLE) ORDER BY dim) AS mn,
         |         list(CAST(mx AS DOUBLE) ORDER BY dim) AS mx
         |  FROM mmd
         |), enc AS (
         |  SELECT e.vec_id,
         |         [CASE WHEN mm.mx[i] = mm.mn[i] THEN 0
         |               ELSE CAST(round((e.v[i] - mm.mn[i]) * 255.0 /
         |                                (mm.mx[i] - mm.mn[i])) AS BIGINT) END
         |          for i in generate_series(1, len(e.v))] AS codes,
         |         sqrt(${fold("e.v[i] * e.v[i]", "e.v")}) AS nrm
         |  FROM e, mm
         |), scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         CASE WHEN q.nrm * c.nrm = 0 THEN CAST(0.0 AS DOUBLE)
         |              ELSE round(
         |                ${fold(s"eq.v[i] * $dequant", "c.codes")}
         |                / (q.nrm * c.nrm), 6) END AS approx
         |  FROM enc c
         |  JOIN enc q ON q.vec_id < $NQueries AND c.vec_id <> q.vec_id
         |  JOIN e eq ON eq.vec_id = q.vec_id
         |  CROSS JOIN mm
         |), short AS (
         |  SELECT query_id, neighbor_id,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY approx DESC, neighbor_id) AS srn
         |  FROM scored
         |), rescored AS (
         |  SELECT s.query_id, s.neighbor_id,
         |         ${cosSql("eq.v", "ec.v")} AS cosine
         |  FROM short s
         |  JOIN e eq ON eq.vec_id = s.query_id
         |  JOIN e ec ON ec.vec_id = s.neighbor_id
         |  WHERE s.srn <= $SqShortlist
         |), ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |           ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
         |  FROM rescored
         |)
         |SELECT query_id, rank, neighbor_id, cosine FROM ranked
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin
    })

  /** Trained-quantizer IVF: Lloyd's k-means fits the coarse index, then
    * multi-probe search scores only the probed buckets. This catalog
    * entry probes ALL buckets (nprobe = k), which must reproduce brute
    * force EXACTLY — so the whole pipeline (seeding, Lloyd updates,
    * argmin assignment, probe ranking, bucket-join scoring) is oracle-
    * checked against the same SQL as the baseline. The production
    * nprobe < k configuration is spec-measured for recall instead. */
  val IvfClusters = 8
  val IvfIters = 3
  val qAnnIvfKmeans = QueryDef("q_ann_ivf_kmeans",
    (spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
      val (cents, assigned) = graft.operators.KMeans.fit(
        emb, "vec_id", "embedding", IvfClusters, IvfIters)
      val q = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      graft.operators.KMeans.ivfTopK(assigned, cents, q, TopK, nprobe = IvfClusters)
        .orderBy("query_id", "rank")
    },
    Some(exactTopKOracle))

  /** The PERSISTED-index entries' nprobe — strictly less than
    * [[IvfClusters]], so (unlike the full-probe entry above) the probe
    * selection, the argmin bucket assignment, and the bucket-join all
    * MATTER to the result and are each under the hash gate. */
  val IvfNprobe = 2
  val IvfIndexPath = "/tmp/graft_ivf_index.parquet"
  val IvfIngestPath = "/tmp/graft_ivf_ingest.parquet"

  /** The DuckDB replay of a persisted multi-probe IVF search, given
    * the on-disk index at `indexPath` (the codebook convention — the
    * trained centroids ARE the model, exported as parquet):
    * assignment = argmin over the same dim-ordered double fold the
    * [[graft.expr.NearestCentroidId]] kernel runs (squared L2, ties →
    * smallest cid); probe ranking replays [[graft.expr.L2Distance]]'s
    * `sqrt` before ordering (sqrt is IEEE-correctly-rounded, so both
    * engines see the same double — and ordering by d2 instead could
    * break a tie the kernel's sqrt collapses); scoring and ranking
    * reuse the exact-cosine conventions. `corpus` chooses which
    * vectors the assignment CTE covers — for the incremental entry the
    * union base ∪ delta equals one uniform re-derivation because
    * frozen-centroid assignment IS the same argmin the fit's final
    * pass ran. */
  private def ivfProbeOracle(indexPath: String): String =
    s"""WITH cents AS (
       |  SELECT cid, cv::DOUBLE[] AS cv
       |  FROM read_parquet('$indexPath/centroids/*.parquet')
       |), e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), dist AS (
       |  SELECT e.vec_id, c.cid,
       |         ${fold("(e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])", "e.v")}
       |           AS d2
       |  FROM e, cents c
       |), assigned AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY d2, cid) AS rn FROM dist) WHERE rn = 1
       |), probes AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY sqrt(d2), cid) AS rn
       |    FROM dist WHERE vec_id < $NQueries) WHERE rn <= $IvfNprobe
       |), scored AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |         ${cosSql("q.v", "c.v")} AS cosine
       |  FROM probes p
       |  JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.query_id
       |  JOIN e q ON q.vec_id = p.query_id
       |  JOIN e c ON c.vec_id = a.vec_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, cosine FROM ranked
       |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin

  /** PERSISTED IVF index, probed from disk under the hash gate — the
    * production amortization shape: train once ([[graft.operators
    * .KMeans.fit]]), [[graft.operators.KMeans.saveIndex]] the
    * centroids + cid-PARTITIONED inverted lists, then every later
    * search loads and probes WITHOUT retraining, scanning only the
    * nprobe probed directories (partition pruning — the query cost
    * scales with the probed corpus fraction, not corpus size). First
    * hash-gated nprobe < k configuration: probe selection, bucket
    * assignment, and the bucket join each affect the result and the
    * oracle replays all three from the exported index. */
  val qAnnIndexProbe = QueryDef("q_ann_index_probe",
    (spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
      val (cents, assigned) = graft.operators.KMeans.fit(
        emb, "vec_id", "embedding", IvfClusters, IvfIters)
      graft.operators.KMeans.saveIndex(cents, assigned, IvfIndexPath)
      // search side: everything below reads ONLY the persisted index
      val (lc, la) = graft.operators.KMeans.loadIndex(spark, IvfIndexPath)
      val q = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      graft.operators.KMeans.ivfTopK(la, lc, q, TopK, nprobe = IvfNprobe)
        .orderBy("query_id", "rank")
    },
    Some(ivfProbeOracle(IvfIndexPath)))

  /** INCREMENTAL index maintenance under the hash gate: the index is
    * trained on the BASE corpus only, then the delta (¼ of the
    * vectors) is assigned with the FROZEN centroids ([[graft.operators
    * .KMeans.assign]] — shuffle-free scan → project) and APPENDED as
    * new cid-partitioned files — ingest work scales with the delta,
    * not the corpus (the change-feed-ingest discipline applied to the
    * vector index). The probe then searches base ∪ delta from disk;
    * the oracle re-derives every assignment from the exported
    * base-trained centroids — one uniform argmin covers both halves
    * precisely because frozen-centroid ingest runs the same kernel as
    * the fit's final assignment pass. */
  val qAnnIndexIngest = QueryDef("q_ann_index_ingest",
    (spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
      val base = emb.filter(pmod(col("vec_id"), lit(4)) =!= 3)
      val delta = emb.filter(pmod(col("vec_id"), lit(4)) === 3)
      val (cents, assigned) = graft.operators.KMeans.fit(
        base, "vec_id", "embedding", IvfClusters, IvfIters)
      graft.operators.KMeans.saveIndex(cents, assigned, IvfIngestPath)
      val deltaAssigned = graft.operators.KMeans.assign(
        delta.select(col("vec_id").cast("long").as("id"),
          col("embedding").as("v")), cents)
      deltaAssigned.write.mode("append").partitionBy("cid")
        .parquet(s"$IvfIngestPath/assignments")
      val (lc, la) = graft.operators.KMeans.loadIndex(spark, IvfIngestPath)
      val total = Tables.embeddings(spark, dir).count()
      require(la.count() == total,
        s"ingested index must hold the whole corpus ($total vectors)")
      val q = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      graft.operators.KMeans.ivfTopK(la, lc, q, TopK, nprobe = IvfNprobe)
        .orderBy("query_id", "rank")
    },
    Some(ivfProbeOracle(IvfIngestPath)))

  val IvfSqlIndexPath = "/tmp/graft_ivf_index_sql.parquet"
  val IvfSqlQueriesPath = "/tmp/graft_ivf_queries_sql.parquet"

  /** SQL-ADDRESSABLE ANN under the hash gate ([[graft.sources
    * .GraftCatalog]]'s `ann_probe` procedure): the persisted IVF index
    * is trained and exported exactly like [[qAnnIndexProbe]], but the
    * SEARCH runs as one SQL statement —
    * `CALL graft_lake.system.ann_probe(index_path, queries_path, k,
    * nprobe)` — so the train-once/probe-from-disk shape is reachable
    * without a Scala shell (the compact/vacuum/history convention
    * extended to the vector surface). Same probe kernel underneath
    * (partition-pruned inverted lists, bounded-heap top-k), same
    * oracle: the exported-codebook replay must hash-match the
    * procedure's output exactly. */
  val qAnnIndexSql = QueryDef("q_ann_index_sql",
    (spark, dir) => {
      val cat = "graft_lake"
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
        s"${sys.props("java.io.tmpdir")}/graft_warehouse")
      val emb = Tables.embeddings(spark, dir)
      val (cents, assigned) = graft.operators.KMeans.fit(
        emb, "vec_id", "embedding", IvfClusters, IvfIters)
      graft.operators.KMeans.saveIndex(cents, assigned, IvfSqlIndexPath)
      emb.filter(col("vec_id") < NQueries).select("vec_id", "embedding")
        .write.mode("overwrite").parquet(IvfSqlQueriesPath)
      spark.sql(s"CALL $cat.system.ann_probe(" +
        s"index_path => '$IvfSqlIndexPath', " +
        s"queries_path => '$IvfSqlQueriesPath', " +
        s"k => $TopK, nprobe => $IvfNprobe)")
    },
    Some(ivfProbeOracle(IvfSqlIndexPath)))

  /** Global top-50 most-similar embedding pairs — exact all-pairs,
    * ORACLE-TWIN role: quadratic by design and guarded
    * (`topPairs.maxExactRows`); the deployable path is the LSH pair
    * search whose recall is measured against this twin. */
  val qEmbedTopPairs = QueryDef("q_embed_top_pairs",
    (spark, dir) => Similarity.topPairs(
      Tables.embeddings(spark, dir), "vec_id", "embedding", TopPairs),
    Some(s"""WITH e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            |)
            |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
            |       ${cosSql("a.v", "b.v")} AS cosine
            |FROM e a JOIN e b ON a.vec_id < b.vec_id
            |ORDER BY cosine DESC, vec_a, vec_b LIMIT $TopPairs""".stripMargin),
    role = OracleTwin(Seq("q_ann_lsh_pairs")))

  /** Approximate top pairs via random-hyperplane LSH, exact-cosine
    * verified.
    *
    * FULLY ORACLE-CHECKED (r10): the hyperplanes are DERIVED — every
    * component comes from SplitMix64 of (seed, table, bit, dim)
    * ([[graft.expr.TextHashKernels.planeComponent]]) — so the query
    * exports them as a parquet table and the oracle replays the WHOLE
    * search: per-(vector, table, bit) dim-ordered dot-product folds,
    * sign bits packed into the signature, the (table, sig) bucket
    * self-join, distinct candidates, exact-cosine verification, and
    * the deterministic global top-N.
    *
    * GATED SHAPE = THE CAPPED ONE (r16): the configuration under the
    * hash gate carries the k-bounded bucket cap
    * ([[GateMaxBucket]] smallest ids per (table, sig) bucket — the
    * production defense against self-similar corpora, where uncapped
    * candidate volume grew 275× on 50× data at sf5), and the oracle
    * replays the SAME cap via a per-bucket id-ordered row_number. At
    * the gated SFs no bucket reaches the cap, so the certified output
    * equals the exhaustive one; at replica-heavy scale the cap bounds
    * work per bucket at C(cap,2) pairs instead of melting. The
    * exhaustive form (failOnOverflow) stays spec-pinned
    * (DedupSpec "gated capped LSH configs"); recall vs the exact twin
    * stays spec-measured. */
  val RpBits = 8
  val RpTables = 16
  val RpSeed = 7L
  /** The gated entries' production bucket cap: small enough that a
    * replica-heavy megabucket's pair work saturates at C(512,2) ≈ 131k
    * candidates, large enough that the honest gated corpora (≤ sf0.1)
    * never reach it — certified by the spec's cap-is-no-op check. */
  val GateMaxBucket = 512
  val RpPlanesPath = "/tmp/graft_rp_planes.parquet"

  /** DuckDB replay of the K-BOUNDED hyperplane-LSH candidate stream
    * over corpus CTE/table `src` (columns vec_id, embedding), planes at
    * `planesPath`: dim-ordered dot folds → packed sign signatures →
    * id-ordered bucket membership capped at [[GateMaxBucket]] (the
    * TopKAgg smallest-ids rule, mirrored as a row_number) → distinct
    * within-bucket pairs. Ends in `cand(vec_a, vec_b)`; defines
    * ev/pl/dots/sigs/members on the way (names chosen not to collide
    * with the closure CTEs). */
  private def lshCandCtes(src: String, planesPath: String): String =
    s"""pl AS (
       |  SELECT tbl, bit, comp
       |  FROM read_parquet('$planesPath/*.parquet')
       |), ev AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM $src
       |), dots AS (  -- dim-ordered double fold, the kernel's order
       |  SELECT ev.vec_id, pl.tbl, pl.bit,
       |         ${fold("ev.v[i] * pl.comp[i]", "ev.v")} AS dot
       |  FROM ev, pl
       |), sigs AS (  -- bit i set iff dot > 0, packed into a BIGINT
       |  SELECT vec_id, tbl,
       |         COALESCE(SUM(CASE WHEN dot > 0
       |           THEN CAST(1 AS BIGINT) << bit END), 0) AS sig
       |  FROM dots GROUP BY vec_id, tbl
       |), members AS (  -- k-bounded membership: cap smallest ids kept
       |  SELECT vec_id, tbl, sig,
       |         row_number() OVER (PARTITION BY tbl, sig
       |           ORDER BY vec_id) AS rn
       |  FROM sigs
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM members a JOIN members b
       |    ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id
       |  WHERE a.rn <= $GateMaxBucket AND b.rn <= $GateMaxBucket
       |)""".stripMargin

  /** Export the derived hyperplanes for `dim` to `path` — the constants
    * of (seed, table, bit, dim) the oracle scores with. */
  private def exportPlanes(spark: org.apache.spark.sql.SparkSession,
      dim: Int, path: String): Unit = {
    import spark.implicits._
    (for (t <- 0 until RpTables; b <- 0 until RpBits) yield
      (t, b, (0 until dim).map(d => graft.expr.TextHashKernels
        .planeComponent(RpSeed + t * 1000003L, b, d))))
      .toDF("tbl", "bit", "comp").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  val qAnnLsh = QueryDef("q_ann_lsh_pairs",
    (spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
      val dim = emb.select(size(col("embedding"))).head.getInt(0)
      exportPlanes(spark, dim, RpPlanesPath)
      Similarity.lshTopKPairs(emb, "vec_id", "embedding", TopPairs,
        RpBits, RpTables, RpSeed, maxBucket = GateMaxBucket)
    },
    Some(s"""WITH ${lshCandCtes("embeddings", RpPlanesPath)}
            |SELECT c.vec_a, c.vec_b, ${cosSql("ea.v", "eb.v")} AS cosine
            |FROM cand c
            |JOIN ev ea ON ea.vec_id = c.vec_a
            |JOIN ev eb ON eb.vec_id = c.vec_b
            |ORDER BY cosine DESC, vec_a, vec_b LIMIT $TopPairs""".stripMargin))

  /** IVF-style search: the `label` column plays the role of the coarse
    * quantizer's cluster assignment (in production: argmin centroid,
    * computed once at ingest). Each query probes ONLY its own cluster —
    * the corpus scan shrinks by the cluster count, the plan is an
    * equi-join on (label) instead of a cross join. Ranking via the
    * bounded-heap [[graft.expr.TopKAgg]] (map-side partial agg — the
    * shuffle carries ≤ k rows per query per task, no window sort). Exact
    * within the probed bucket → fully SQL-mirrorable. */
  val qAnnIvf = QueryDef("q_ann_ivf_topk",
    (spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
      val q = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("label"), col("embedding").as("qv"))
      val c = emb.select(col("vec_id").as("neighbor_id"), col("label"),
        col("embedding").as("cv"))
      val scored = c.join(broadcast(q), "label")
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(graft.expr.CosineSim(col("qv"), col("cv")), 6).as("cosine"))
      Similarity.topKPerQuery(scored, TopK)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
            |), scored AS (
            |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            |         ${cosSql("q.v", "c.v")} AS cosine
            |  FROM e q JOIN e c ON q.label = c.label
            |   AND q.vec_id < $NQueries AND c.vec_id <> q.vec_id
            |), ranked AS (
            |  SELECT query_id, neighbor_id, cosine,
            |         CAST(row_number() OVER (PARTITION BY query_id
            |           ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
            |  FROM scored
            |)
            |SELECT query_id, rank, neighbor_id, cosine FROM ranked
            |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin))

  /** Embedding near-dup threshold. This synthetic corpus has no planted
    * high-cosine duplicates (max pair ≈ .5–.6), so the catalog entries
    * exercise the cluster machinery in the corpus's own similarity range;
    * the production near-dup regime (θ ≥ .9, LSH candidates) is spec'd
    * with planted jittered duplicates instead. Chosen off any rounded
    * pair value at sf0.01/sf0.1 so the ≥ test has no boundary tie. */
  val MinDupCosine = 0.42

  /** Shared dup-pair + connected-component closure CTEs (recursive) for
    * the embedding-dedup oracles — the embedding-space mirror of the
    * text queries' jaccard/closure CTEs. `source` is the corpus CTE/table
    * the pairs are derived over (exact O(n²) re-derivation — the oracle
    * twin of whichever pair generator the Spark side used). */
  private def cosineClosureCtes(source: String, minCos: Double): String =
    s"""e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM $source
       |), dup_pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id
       |  WHERE ${cosSql("a.v", "b.v")} >= $minCos
       |), edges AS (
       |  SELECT vec_a AS src, vec_b AS dst FROM dup_pairs
       |  UNION SELECT vec_b, vec_a FROM dup_pairs
       |), reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src
       |), labels AS (
       |  SELECT src AS vec_id, LEAST(src, min(dst)) AS cluster
       |  FROM reach GROUP BY src
       |)""".stripMargin

  /** Embedding-cosine near-dup clusters: connected components over the
    * exact threshold pairs, one row per cluster with keeper + size —
    * the semantic-dedup sibling of `q_dedup_clusters` (which clusters
    * on n-gram evidence; this clusters on embedding-space evidence).
    *
    * ORACLE-TWIN ROLE ONLY: exact all-pairs is quadratic by design and
    * guarded off real corpora (`thresholdPairs.maxExactRows`); it
    * exists in the catalog to pin the SEMANTICS that the two scale
    * paths must reproduce — `q_dedup_embedding_lsh` (hyperplane
    * buckets, linear, for the near-dup regime) and `q_semantic_dedup`
    * (k-means cells, ~n²/k, for the moderate-cosine regime). Deploy
    * those; verify against this. */
  val qDedupEmbedding = QueryDef("q_dedup_embedding",
    (spark, dir) => {
      val pairs = Similarity.thresholdPairs(
        Tables.embeddings(spark, dir), "vec_id", "embedding", MinDupCosine)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      graft.operators.Dedup.duplicateClusters(pairs)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_members"))
        .orderBy("cluster")
    },
    Some(s"""WITH RECURSIVE ${cosineClosureCtes("embeddings", MinDupCosine)}
            |SELECT cluster, CAST(count(*) AS BIGINT) AS n_members
            |FROM labels GROUP BY cluster ORDER BY cluster""".stripMargin),
    role = OracleTwin(Seq("q_dedup_embedding_lsh", "q_semantic_dedup")))

  /** The keeper composition: every vector surviving embedding-cosine
    * dedup (cluster minima stay, other members drop). Same oracle-twin
    * role as [[qDedupEmbedding]] — the deployable forms are
    * `cosineDedup(useLsh = true)` and `semanticDedup`. */
  val qDedupEmbeddingKeep = QueryDef("q_dedup_embedding_keep",
    (spark, dir) => Similarity.cosineDedup(
      Tables.embeddings(spark, dir), "vec_id", "embedding", MinDupCosine)
      .select(col("vec_id"), col("label"))
      .orderBy("vec_id"),
    Some(s"""WITH RECURSIVE ${cosineClosureCtes("embeddings", MinDupCosine)}
            |SELECT vec_id, label FROM embeddings
            |WHERE vec_id NOT IN
            |  (SELECT vec_id FROM labels WHERE cluster <> vec_id)
            |ORDER BY vec_id""".stripMargin),
    role = OracleTwin(Seq("q_dedup_embedding_lsh", "q_semantic_dedup")))

  /** Planted-near-dup contract for the LSH SCALE path. The corpus's own
    * max pair cosine is ≈ .51 (sf0.01) / .60 (sf0.1) — far below the
    * near-dup regime LSH is built for — so this entry PLANTS the regime:
    * the first [[PlantN]] vectors get a deterministic jittered copy
    * (element i scaled by 1 + ((i mod 7) − 3)/100, i.e. ±3% — cosine vs
    * the original ≈ .9995) at vec_id + [[PlantOffset]]. Dedup at
    * θ ≥ [[NearDupCosine]] over the augmented corpus must then drop
    * exactly the planted copies. Jitter arithmetic is pinned to IEEE
    * double ops with a final float cast, bit-reproducible in DuckDB's
    * indexed `list_transform` mirror.
    *
    * GATED SHAPE = THE CAPPED ONE (r16, same move as
    * [[qAnnLsh]]): the configuration under the hash gate carries the
    * k-bounded bucket cap ([[GateMaxBucket]]), and the oracle replays
    * the WHOLE capped pipeline — exported hyperplanes, packed
    * signatures, id-ordered capped bucket membership, candidate pairs,
    * exact-cosine verification at θ, recursive closure, keepers — so a
    * missed bucket, a wrong cap rule, a false merge, or a wrong keeper
    * all hash-mismatch. At the gated SFs no bucket reaches the cap
    * (spec-certified), so the planted-copy contract is unchanged; at
    * replica-heavy scale the cap bounds candidate work instead of
    * growing 67× on 50× data (the r15 sf5 finding). The exhaustive
    * form stays spec-pinned. */
  val NearDupCosine = 0.9
  val PlantN = 40
  val PlantOffset = 1000000L
  val DedupPlanesPath = "/tmp/graft_rp_planes_dedup.parquet"

  val qDedupEmbeddingLsh = QueryDef("q_dedup_embedding_lsh",
    (spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
        .select("vec_id", "embedding", "label")
      val plants = emb.filter(col("vec_id") < PlantN)
        .select((col("vec_id") + PlantOffset).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x.cast("double") *
              (lit(1.0) + ((i % 7) - 3).cast("double") / 100.0))
              .cast("float")).as("embedding"),
          col("label"))
      val dim = emb.select(size(col("embedding"))).head.getInt(0)
      exportPlanes(spark, dim, DedupPlanesPath)
      Similarity.cosineDedup(emb.unionByName(plants),
          "vec_id", "embedding", NearDupCosine, useLsh = true,
          nBits = RpBits, tables = RpTables, seed = RpSeed,
          maxBucket = GateMaxBucket)
        .select("vec_id", "label")
        .orderBy("vec_id")
    },
    Some(s"""WITH RECURSIVE corpus AS (
            |  SELECT vec_id, embedding, label FROM embeddings
            |  UNION ALL
            |  SELECT vec_id + $PlantOffset AS vec_id,
            |         list_transform(embedding, (x, i) ->
            |           CAST(CAST(x AS DOUBLE) *
            |                (1.0 + CAST(((i - 1) % 7) - 3 AS DOUBLE) / 100.0)
            |                AS FLOAT)) AS embedding,
            |         label
            |  FROM embeddings WHERE vec_id < $PlantN
            |), ${lshCandCtes("corpus", DedupPlanesPath)},
            |dup_pairs AS (  -- capped candidates, exact-cosine verified
            |  SELECT c.vec_a, c.vec_b
            |  FROM cand c
            |  JOIN ev ea ON ea.vec_id = c.vec_a
            |  JOIN ev eb ON eb.vec_id = c.vec_b
            |  WHERE ${cosSql("ea.v", "eb.v")} >= $NearDupCosine
            |), edges AS (
            |  SELECT vec_a AS src, vec_b AS dst FROM dup_pairs
            |  UNION SELECT vec_b, vec_a FROM dup_pairs
            |), reach(src, dst) AS (
            |  SELECT src, dst FROM edges
            |  UNION
            |  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src
            |), labels AS (
            |  SELECT src AS vec_id, LEAST(src, min(dst)) AS cluster
            |  FROM reach GROUP BY src
            |)
            |SELECT vec_id, label FROM corpus
            |WHERE vec_id NOT IN
            |  (SELECT vec_id FROM labels WHERE cluster <> vec_id)
            |ORDER BY vec_id""".stripMargin))

  /** SemDeDup configuration: k-means cells + within-cell pruning at the
    * corpus's own similarity range ([[MinDupCosine]] — same threshold as
    * the global-dedup entries, so the two results differ exactly by the
    * pairs k-means separates). 2 Lloyd iterations keep the unrolled
    * oracle mirror readable; the operator takes any maxIter. */
  val SemK = 8
  val SemIters = 2

  /** Squared-L2 between a DOUBLE[] vector and a FLOAT[] centroid, as the
    * same index-order double left-fold as
    * [[graft.expr.CentroidKernels]].d2 — bit-identical accumulation. */
  private def d2Sql(v: String, cv: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  [($v[i] - CAST($cv[i] AS DOUBLE)) * ($v[i] - CAST($cv[i] AS DOUBLE))
       |   for i in generate_series(1, len($v))]),
       |  (acc, x) -> acc + x)""".stripMargin

  /** Assignment CTE: nearest centroid in `centsCte` per vector of `e`,
    * (d2, cid) lexicographic tie-break — the kernel's first-wins rule
    * over an ascending matrix. */
  private def assignCte(name: String, centsCte: String): String =
    s"""$name AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT s.vec_id, s.cid,
       |           row_number() OVER (PARTITION BY s.vec_id
       |             ORDER BY s.d2, s.cid) AS rn
       |    FROM (SELECT e.vec_id, c.cid, ${d2Sql("e.v", "c.cv")} AS d2
       |          FROM e, $centsCte c) s)
       |  WHERE rn = 1
       |)""".stripMargin

  /** Lloyd update CTE: per-(cid, dim) exact DECIMAL(38,15) sum → one
    * IEEE double division → float32 centroid element — the mirror of
    * [[graft.operators.KMeans.meansByDim]] + the driver's toFloat. An
    * emptied cluster keeps its previous centroid (COALESCE). */
  private def updateCte(assignName: String, prevCents: String,
      outName: String): String =
    s"""${outName}_m AS (
       |  SELECT cid, dim,
       |         CAST(CAST(sum(CAST(x AS DECIMAL(38,15))) AS DOUBLE)
       |              / CAST(count(*) AS DOUBLE) AS FLOAT) AS cx
       |  FROM (SELECT a.cid, unnest(e.v) AS x,
       |               unnest(generate_series(1, len(e.v))) AS dim
       |        FROM e JOIN $assignName a USING (vec_id))
       |  GROUP BY cid, dim
       |), $outName AS (
       |  SELECT p.cid, COALESCE(n.cv, p.cv) AS cv
       |  FROM $prevCents p LEFT JOIN
       |    (SELECT cid, list(cx ORDER BY dim) AS cv
       |     FROM ${outName}_m GROUP BY cid) n USING (cid)
       |)""".stripMargin

  /** SemDeDup as a catalog query ([[Similarity.semanticDedup]]): the
    * oracle replays the ENTIRE pipeline from scratch — deterministic
    * seeding (k smallest ids), two unrolled Lloyd updates with
    * decimal-exact means and float32 centroid rounding, final argmin
    * assignment, within-cluster cosine pairs, recursive-CTE closure,
    * keeper selection — so a drift anywhere in fit or pruning
    * hash-mismatches. The strongest statement the engine makes about
    * its clustering: not "k-means converged" but "k-means computed
    * exactly THESE cells". */
  val qSemanticDedup = QueryDef("q_semantic_dedup",
    (spark, dir) => Similarity.semanticDedup(
      Tables.embeddings(spark, dir), "vec_id", "embedding",
      SemK, SemIters, MinDupCosine)
      .orderBy("vec_id"),
    Some(s"""WITH RECURSIVE
            |e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            |), c0 AS (
            |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
            |  ORDER BY vec_id LIMIT $SemK
            |), ${assignCte("a1", "c0")},
            |${updateCte("a1", "c0", "c1")},
            |${assignCte("a2", "c1")},
            |${updateCte("a2", "c1", "c2")},
            |${assignCte("a3", "c2")},
            |dup_pairs AS (
            |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
            |  FROM (SELECT e.vec_id, e.v, a3.cid
            |        FROM e JOIN a3 USING (vec_id)) x
            |  JOIN (SELECT e.vec_id, e.v, a3.cid
            |        FROM e JOIN a3 USING (vec_id)) y
            |    ON x.cid = y.cid AND x.vec_id < y.vec_id
            |  WHERE ${cosSql("x.v", "y.v")} >= $MinDupCosine
            |), ed AS (
            |  SELECT vec_a AS src, vec_b AS dst FROM dup_pairs
            |  UNION SELECT vec_b, vec_a FROM dup_pairs
            |), reach(src, dst) AS (
            |  SELECT src, dst FROM ed
            |  UNION
            |  SELECT r.src, ed.dst FROM reach r JOIN ed ON r.dst = ed.src
            |), labels AS (
            |  SELECT src AS vec_id, LEAST(src, min(dst)) AS cluster
            |  FROM reach GROUP BY src
            |)
            |SELECT a3.vec_id, a3.cid FROM a3
            |WHERE a3.vec_id NOT IN
            |  (SELECT vec_id FROM labels WHERE cluster <> vec_id)
            |ORDER BY vec_id""".stripMargin))

  def all: Seq[QueryDef] = Seq(qAnnTopK, qAnnPq, qAnnIvfPq, qAnnSq8,
    qEmbedTopPairs, qAnnLsh, qAnnIvf, qAnnIvfKmeans, qAnnIndexProbe,
    qAnnIndexIngest, qAnnIndexSql, qDedupEmbedding,
    qDedupEmbeddingKeep, qDedupEmbeddingLsh, qSemanticDedup)
}
