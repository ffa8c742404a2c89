package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.{CosineSim, RandomProjectionSig, TopKAgg}

/** Similarity search over embedding columns (`array<float>`): brute-force
  * cosine top-k as the exact baseline, random-hyperplane LSH bucketing as
  * the scale path.
  *
  * Scale design (100 TB): brute force is a query×corpus nested-loop join —
  * correct at any scale ONLY when the query side is broadcastable; the
  * corpus side streams through whole-stage codegen'd [[CosineSim]], and
  * ranking is the engine's bounded-heap AGGREGATE ([[TopKAgg]]) — partial
  * aggregation keeps ≤ k rows per (query × map task), so the only shuffle
  * moves k·|queries| rows per partition instead of the full scored
  * corpus×queries set a `row_number` window would sort. The LSH path
  * buckets the corpus by a 16-bit signature derived from deterministic
  * pseudo-random hyperplanes (nothing broadcast, planes re-derived from the
  * seed in the kernel), so candidate generation is an equi-join keyed on
  * (signature), and recall is tunable via multi-probe (hamming-1 probes).
  *
  * No counterpart in the reference; part of graft's LLM-pipeline surface.
  */
object Similarity {

  /** Rank a scored frame (query_id, neighbor_id, cosine) down to the
    * per-query top-k via [[TopKAgg]] — drop-in for `row_number() OVER
    * (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)` but with
    * map-side partial aggregation instead of a full window sort-shuffle.
    * Output: (query_id, rank, neighbor_id, cosine), rank 1-based INT. */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy("query_id")
      .agg(TopKAgg(col("cosine"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("e.payload").as("neighbor_id"),
        col("e.sort_key").as("cosine"))

  /** Exact top-k nearest neighbors by cosine for each query vector.
    * Ranking key is (cosine rounded to 1e-6, neighbor id) — the rounding
    * makes cross-engine rank ties deterministic.
    *
    * @param corpus  (idCol, vecCol) — the searched collection
    * @param queries (idCol, vecCol) — small, broadcast side
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(CosineSim(col("qv"), col("cv")), 6).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Global top-N most-similar pairs (a < b) by cosine — the embedding
    * near-dup surface. Exact; O(n²) pair generation, so appropriate for
    * corpora that fit a broadcast (dimension-table scale). For larger
    * corpora use [[lshTopKPairs]]. */
  def topPairs(vectors: DataFrame, idCol: String, vecCol: String,
      topN: Int): DataFrame = {
    val a = vectors.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
    val b = vectors.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(CosineSim(col("va"), col("vb")), 6).as("cosine"))
      .orderBy(desc("cosine"), col("vec_a"), col("vec_b"))
      .limit(topN)
  }

  /** All pairs (a < b) with cosine ≥ `minCosine` — the evidence edges for
    * embedding-cosine near-duplicate detection. Exact all-pairs: the
    * oracle/verify twin of [[lshThresholdPairs]], same relationship
    * [[graft.operators.Dedup.jaccardPairs]] has to the MinHash path.
    * Cosine is rounded to 1e-6 BEFORE the threshold test so the
    * keep/drop decision is cross-engine stable.
    *
    * LOUD SCALE GUARD: this plan broadcasts the ENTIRE vector corpus and
    * generates O(n²) candidate pairs — correct, but only deployable at
    * dimension-table scale. Corpora larger than `maxExactRows` throw
    * (pointing at [[lshThresholdPairs]]) rather than melt an executor:
    * the check scans at most maxExactRows+1 ids (LIMIT-bounded), so the
    * guard itself stays cheap at any corpus size. */
  def thresholdPairs(vectors: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, maxExactRows: Long = 50000L): DataFrame = {
    // Clamp before toInt: a deliberately huge maxExactRows (>= Int.MaxValue)
    // means "guard off", not an overflowed negative LIMIT.
    val probe =
      if (maxExactRows >= Int.MaxValue.toLong - 1) Int.MaxValue
      else (maxExactRows + 1).toInt
    val n = vectors.select(col(idCol)).limit(probe).count()
    require(n <= maxExactRows,
      s"thresholdPairs: corpus has > $maxExactRows rows — exact all-pairs " +
        "broadcasts every vector and generates O(n^2) pairs. Use " +
        "lshThresholdPairs / cosineDedup(useLsh = true) past broadcast scale " +
        "(or raise maxExactRows deliberately).")
    val a = vectors.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
    val b = vectors.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(CosineSim(col("va"), col("vb")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** [[thresholdPairs]] at scale: candidates from random-hyperplane LSH
    * buckets, verified with exact cosine. Appropriate for the high-
    * threshold regime (near-dup, minCosine ≳ 0.9) where bucket collision
    * probability for true pairs is high and buckets stay small; recall
    * for cosine ≥ .9 at the defaults is ≈ 99.6% (see [[lshCandidates]]).
    * Candidate generation shuffles 8-byte ids, never vectors. */
  def lshThresholdPairs(vectors: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, nBits: Int = 8, tables: Int = 16,
      seed: Long = 7L): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
    lshCandidates(vectors, idCol, vecCol, nBits, tables, seed)
      .join(v.select(col("id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(v.select(col("id").as("vec_b"), col("v").as("vb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(CosineSim(col("va"), col("vb")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** Embedding-cosine near-duplicate dedup: rows surviving semantic-copy
    * resolution — cosine-threshold evidence pairs → connected components
    * ([[graft.operators.Dedup.duplicateClusters]]) → keep the min-id
    * vector of every cluster. The embedding-space sibling of
    * [[graft.operators.Dedup.containmentDedup]]: catches paraphrases and
    * re-encodings that share no n-grams, which every text-hash dedup
    * misses. `useLsh=true` swaps exact pair generation for the LSH path —
    * the 100 TB configuration when the threshold is in the near-dup
    * regime; exact is the verify/oracle twin. */
  def cosineDedup(vectors: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, useLsh: Boolean = false, nBits: Int = 8,
      tables: Int = 16, seed: Long = 7L, maxIter: Int = 20,
      reliableCheckpoint: Boolean = false): DataFrame = {
    val pairs =
      (if (useLsh) lshThresholdPairs(vectors, idCol, vecCol, minCosine, nBits, tables, seed)
       else thresholdPairs(vectors, idCol, vecCol, minCosine))
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val drops = Dedup.duplicateClusters(pairs, maxIter, reliableCheckpoint)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    vectors.join(drops, Seq(idCol), "left_anti")
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", 2023): k-means cluster
    * the embedding space, then resolve near-duplicates WITHIN each
    * cluster only — cluster-then-prune. The third member of the
    * embedding-dedup family:
    *   - [[cosineDedup]] exact: all-pairs, quadratic, oracle twin;
    *   - [[cosineDedup]] useLsh: linear, but recall comes from LEXICAL-
    *     grade hyperplane buckets — tuned for the θ ≳ .9 regime;
    *   - semanticDedup: pair generation is O(Σ cᵢ²) ≈ n²/k instead of
    *     n², and the candidate structure follows the SEMANTIC geometry
    *     (k-means cells), so moderate-cosine paraphrase pairs that LSH
    *     recalls poorly still meet inside their cluster. Missed pairs
    *     are exactly the ones k-means separates — the documented
    *     SemDeDup recall trade.
    *
    * Scale story: training is [[KMeans.fit]] (zero-corpus-shuffle
    * assignment, persisted input); the within-cluster self-join
    * shuffles each vector ONCE keyed by cid (at production k the cells
    * are balanced by construction — Lloyd minimizes within-cell
    * variance, and a hot cell splits by raising k); evidence pairs
    * carry 8-byte ids into the same large-star/small-star closure every
    * other dedup family uses. Deterministic end-to-end (deterministic
    * fit + (cosine, id) thresholding), hence DuckDB-mirrorable — the
    * catalog oracle replays seeding, both Lloyd updates, final
    * assignment, within-cluster pairs, and the closure bit-for-bit.
    *
    * @return survivors as (idCol, cid) — cluster minima stay, other
    *         members of every within-cluster dup component drop */
  def semanticDedup(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, maxIter: Int, minCosine: Double,
      clusterMaxIter: Int = 20, reliableCheckpoint: Boolean = false): DataFrame = {
    // materialize the assignment ONCE: it is consumed three times below
    // (both self-join sides + the final keeper anti-join), and fit's
    // lazy return would re-run the corpus scan + k·dim assignment
    // kernel per consumer — the same checkpoint-once discipline
    // duplicateClusters applies to its edge set (and the same
    // durability rule: reliable checkpoints must cover THIS frame too,
    // or an executor loss mid-closure still kills the job)
    val lazyAssigned = KMeans.fit(vectors, idCol, vecCol, k, maxIter)._2
    val assigned =
      if (reliableCheckpoint) lazyAssigned.checkpoint()
      else lazyAssigned.localCheckpoint()
    val a = assigned.select(col("cid"), col("id").as("vec_a"), col("v").as("va"))
    val b = assigned.select(col("cid"), col("id").as("vec_b"), col("v").as("vb"))
    val pairs = a.join(b, "cid")
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"),
        round(CosineSim(col("va"), col("vb")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .select("doc_a", "doc_b")
    val drops = Dedup.duplicateClusters(pairs, clusterMaxIter, reliableCheckpoint)
      .filter(col("id") =!= col("cluster"))
      .select(col("id"))
    assigned.select(col("id"), col("cid"))
      .join(drops, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("cid"))
  }

  /** LSH-bucketed candidate pairs: vectors sharing a `nBits`-bit
    * random-hyperplane signature. P[same bucket] = (1 − θ/π)^nBits for
    * angle θ; union over `tables` independent signatures raises recall to
    * 1−(1−p)^tables. Defaults 8 bits × 16 tables: cosine ≥ .9 (θ≤26°) →
    * recall ≈ 99.6%; the moderate-similarity tail (cos ≈ .6) still ≈ 60%.
    * Signatures are plain longs: candidate generation is an equi-self-join
    * keyed on (table, sig) — an 8-byte shuffle key, never the vectors. */
  def lshCandidates(vectors: DataFrame, idCol: String, vecCol: String,
      nBits: Int = 8, tables: Int = 16, seed: Long = 7L): DataFrame = {
    val sigs = vectors.select(col(idCol).as("id"),
      array((0 until tables).map(t =>
        RandomProjectionSig(col(vecCol), nBits, seed + t * 1000003L)): _*)
        .as("sigs"))
    val buckets = sigs.select(col("id"),
      posexplode(col("sigs")).as(Seq("table", "sig")))
    // candidates carry ONLY the 8-byte ids through join + distinct; the
    // vectors are re-joined by the verifier — at scale this keeps the
    // bucket shuffle and dedup shuffle payload-free
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.table") === col("b.table") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"))
      .distinct()
  }

  /** Approximate global top-N pairs: LSH candidates verified with exact
    * cosine. Same output shape as [[topPairs]]; recall measured in specs. */
  def lshTopKPairs(vectors: DataFrame, idCol: String, vecCol: String,
      topN: Int, nBits: Int = 8, tables: Int = 16, seed: Long = 7L): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
    lshCandidates(vectors, idCol, vecCol, nBits, tables, seed)
      .join(v.select(col("id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(v.select(col("id").as("vec_b"), col("v").as("vb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(CosineSim(col("va"), col("vb")), 6).as("cosine"))
      .orderBy(desc("cosine"), col("vec_a"), col("vec_b"))
      .limit(topN)
  }
}
