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

  // ——— blocked exact all-pairs kernel ———
  //
  // The join form of exact all-pairs (`a.join(broadcast(b), a < b)` with
  // a codegen'd CosineSim) pays ~1.2 µs/pair of nested-loop-join row
  // materialization around a 64-dim dot product that costs nanoseconds —
  // the r13 sf1 sweep measured the BNLJ at 244 s for 2×10⁸ pairs. These
  // kernels broadcast the corpus ONCE as primitive arrays (ids
  // ascending, row-major floats, per-vector squared norms) and sweep it
  // with tight double-accumulation loops in mapPartitions; only the ids
  // shuffle. Arithmetic is IDENTICAL to [[graft.expr.CosineSim]]'s
  // kernel — same float→double widening, same ascending-i accumulation;
  // the squared-norm accumulator never interacts with the dot
  // accumulator, so hoisting it per-vector is bit-exact. All rounding /
  // thresholding / ordering stays in DataFrame land (the kernels
  // pre-filter with a raw margin strictly wider than round-to-6dp can
  // move a value), so oracle semantics are unchanged.

  /** (ids ascending, row-major floats, squared norms, dim). */
  private type CorpusMat = (Array[Long], Array[Float], Array[Double], Int)

  private def integralId(vectors: DataFrame, idCol: String): Boolean =
    vectors.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }

  private def corpusMatrix(vectors: DataFrame, idCol: String,
      vecCol: String): CorpusMat = {
    val rows = vectors
      .select(col(idCol).cast(org.apache.spark.sql.types.LongType),
        col(vecCol))
      .collect().sortBy(_.getLong(0))
    val n = rows.length
    val dim = if (n == 0) 0 else {
      require(!rows(0).isNullAt(1),
        s"exact pairs: null $vecCol row — corrupt embedding corpus")
      rows(0).getSeq[Any](1).length
    }
    val ids = new Array[Long](n)
    val flat = new Array[Float](n * dim)
    val norms = new Array[Double](n)
    var k = 0
    while (k < n) {
      val r = rows(k)
      require(!r.isNullAt(1),
        s"exact pairs: null $vecCol row — corrupt embedding corpus")
      val s = r.getSeq[Any](1)
      require(s.length == dim,
        s"vector dimension mismatch: $dim vs ${s.length}")
      ids(k) = r.getLong(0)
      require(k == 0 || ids(k) > ids(k - 1),
        s"exact pairs: duplicate $idCol ${ids(k)} — ids must be unique")
      var i = 0; var na = 0.0
      val it = s.iterator
      while (it.hasNext) {
        val e = it.next()
        require(e != null,
          s"null vector element at index $i — corrupt embedding row")
        val x = e.asInstanceOf[Float]
        flat(k * dim + i) = x
        val xd = x.toDouble
        na += xd * xd
        i += 1
      }
      norms(k) = na
      k += 1
    }
    (ids, flat, norms, dim)
  }

  /** cosine(a, b) over the flat matrix — [[graft.expr.CosineSim]]'s
    * arithmetic exactly. */
  private def cosineAt(flat: Array[Float], norms: Array[Double],
      dim: Int, a: Int, b: Int): Double = {
    val oa = a * dim; val ob = b * dim
    var dot = 0.0; var i = 0
    while (i < dim) {
      dot += flat(oa + i).toDouble * flat(ob + i).toDouble
      i += 1
    }
    if (norms(a) == 0.0 || norms(b) == 0.0) 0.0
    else dot / (math.sqrt(norms(a)) * math.sqrt(norms(b)))
  }

  /** All pairs (a < b) with RAW cosine ≥ `rawCutoff`, as
    * (vec_a, vec_b, cosine) with UNROUNDED cosine — callers round and
    * threshold in DataFrame land. Distribution: ids spread across
    * `defaultParallelism` tasks; each task sweeps its ids against the
    * broadcast matrix (j strictly after a's rank, so each unordered
    * pair is produced exactly once, matching `vec_a < vec_b`). */
  private def sweepPairs(vectors: DataFrame, idCol: String,
      vecCol: String, rawCutoff: Double): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      corpusMatrix(vectors, idCol, vecCol))
    vectors.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val (ids, flat, norms, dim) = bc.value
        it.flatMap { idA =>
          val a = java.util.Arrays.binarySearch(ids, idA)
          (a + 1 until ids.length).iterator.flatMap { b =>
            val c = cosineAt(flat, norms, dim, a, b)
            if (c >= rawCutoff) Iterator.single((idA, ids(b), c))
            else Iterator.empty
          }
        }
      }
      .toDF("vec_a", "vec_b", "cosine")
  }

  /** Per-partition top candidates under the FINAL (rounded desc, ids)
    * order: pass 1 finds the partition's N-th largest raw cosine, pass
    * 2 emits everything within the rounding margin of it — a provable
    * superset of the partition's rounded top-N (round-to-6dp moves a
    * value by ≤ 5e-7, so a raw gap > 1e-6 forces a strict rounded
    * order), and any global top-N pair is in its own partition's
    * top-N. Compute doubles; the sweep is the cheap part now. */
  private def sweepTopPairs(vectors: DataFrame, idCol: String,
      vecCol: String, topN: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      corpusMatrix(vectors, idCol, vecCol))
    vectors.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val (ids, flat, norms, dim) = bc.value
        val mine = it.toArray
    // pass 1: the partition's N-th largest raw cosine (min-heap of N)
        val heap = new java.util.PriorityQueue[java.lang.Double](
          math.max(topN, 1))
        var count = 0L
        mine.foreach { idA =>
          val a = java.util.Arrays.binarySearch(ids, idA)
          var b = a + 1
          while (b < ids.length) {
            val c = cosineAt(flat, norms, dim, a, b)
            count += 1
            if (heap.size < topN) heap.add(c)
            else if (c > heap.peek()) { heap.poll(); heap.add(c) }
            b += 1
          }
        }
        val cutoff =
          if (count <= topN) Double.NegativeInfinity
          else heap.peek().doubleValue() - 2e-6
        // pass 2: emit the margin superset
        mine.iterator.flatMap { idA =>
          val a = java.util.Arrays.binarySearch(ids, idA)
          (a + 1 until ids.length).iterator.flatMap { b =>
            val c = cosineAt(flat, norms, dim, a, b)
            if (c >= cutoff) Iterator.single((idA, ids(b), c))
            else Iterator.empty
          }
        }
      }
      .toDF("vec_a", "vec_b", "cosine")
  }

  /** Global top-N most-similar pairs (a < b) by cosine — the embedding
    * near-dup surface. Exact; O(n²) pair generation, so appropriate for
    * corpora that fit a broadcast (dimension-table scale) — guarded
    * like [[thresholdPairs]]. For larger corpora use [[lshTopKPairs]]. */
  def topPairs(vectors: DataFrame, idCol: String, vecCol: String,
      topN: Int, maxExactRows: Long = 50000L): DataFrame = {
    val probe =
      if (maxExactRows >= Int.MaxValue.toLong - 1) Int.MaxValue
      else (maxExactRows + 1).toInt
    val n = vectors.select(col(idCol)).limit(probe).count()
    require(n <= maxExactRows,
      s"topPairs: corpus has > $maxExactRows rows — exact all-pairs is " +
        "O(n^2). Use lshTopKPairs past broadcast scale (or raise " +
        "maxExactRows deliberately).")
    val t = vectors.schema(idCol).dataType
    if (n > 0 && integralId(vectors, idCol))
      sweepTopPairs(vectors, idCol, vecCol, topN)
        .select(col("vec_a").cast(t).as("vec_a"),
          col("vec_b").cast(t).as("vec_b"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(desc("cosine"), col("vec_a"), col("vec_b"))
        .limit(topN)
    else { // non-integral ids (or empty): the generic join form
      val a = vectors.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
      val b = vectors.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
      a.join(broadcast(b), col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          round(CosineSim(col("va"), col("vb")), 6).as("cosine"))
        .orderBy(desc("cosine"), col("vec_a"), col("vec_b"))
        .limit(topN)
    }
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
    if (n > 0 && integralId(vectors, idCol)) {
      // blocked kernel; raw pre-filter 1e-6 below the threshold (wider
      // than round-to-6dp can move a value), exact round+filter here
      val t = vectors.schema(idCol).dataType
      sweepPairs(vectors, idCol, vecCol, minCosine - 1e-6)
        .select(col("vec_a").cast(t).as("vec_a"),
          col("vec_b").cast(t).as("vec_b"),
          round(col("cosine"), 6).as("cosine"))
        .filter(col("cosine") >= minCosine)
    } else {
      val a = vectors.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
      val b = vectors.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
      a.join(broadcast(b), col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          round(CosineSim(col("va"), col("vb")), 6).as("cosine"))
        .filter(col("cosine") >= minCosine)
    }
  }

  /** [[thresholdPairs]] at scale: candidates from random-hyperplane LSH
    * buckets, verified with exact cosine. Appropriate for the high-
    * threshold regime (near-dup, minCosine ≳ 0.9) where bucket collision
    * probability for true pairs is high and buckets stay small; recall
    * for cosine ≥ .9 at the defaults is ≈ 99.6% (see [[lshCandidates]]).
    * Candidate generation shuffles 8-byte ids, never vectors. Inherits
    * [[lshCandidates]]' BUCKET CAP: buckets beyond `maxBucket` drop
    * candidates silently unless `failOnOverflow` — see the note there. */
  def lshThresholdPairs(vectors: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, nBits: Int = 8, tables: Int = 16,
      seed: Long = 7L, maxBucket: Int = Dedup.DefaultMaxBucket,
      failOnOverflow: Boolean = false): DataFrame = {
    // shuffle_hash with the VECTOR side as build: the candidate stream
    // is the provably-bigger side (pairs ≥ rows) and its size estimate
    // after the aggregate/explode chain undersells reality — at 50x the
    // planner broadcast an 8.6 GB candidate hash relation off that
    // estimate (SCALE.md round 13). Pinning SHJ shuffles ids only and
    // builds per-partition maps from the corpus side, which a cluster
    // can always hold once partitioned.
    val v = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
      .hint("shuffle_hash")
    lshCandidates(vectors, idCol, vecCol, nBits, tables, seed,
        maxBucket, failOnOverflow = failOnOverflow)
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
      reliableCheckpoint: Boolean = false,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      failOnOverflow: Boolean = false): DataFrame = {
    val pairs =
      (if (useLsh) lshThresholdPairs(vectors, idCol, vecCol, minCosine,
          nBits, tables, seed, maxBucket, failOnOverflow)
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
    // BLOCKED self-join (round 14): joining on cid alone gives the
    // pair kernel at most k distinct shuffle keys — at k=8 on a
    // 16-thread host half the cores idle and the biggest cluster
    // serializes the O(|C|²) cosine work (measured 22.6 s of the 40 s
    // sf1 wall). Blocking by (cid, vec_a mod B) spreads the SAME pair
    // set over k·B keys: side a keeps one row per vector in its own
    // block, side b replicates B ways (vector-rows × B — trivial next
    // to the quadratic kernel), every (a, b) pair meets exactly once
    // in a's block, and the arithmetic is untouched so the oracle
    // hash is bit-identical. Explicit-count repartition pins the
    // spread against AQE's byte-based coalescing (the multimodal
    // lesson — these exchanges are byte-small, CPU-huge).
    val blocks = math.max(1, math.min(64,
      vectors.sparkSession.sparkContext.defaultParallelism * 2))
    val parts = math.max(blocks, k * 2)
    val a = assigned
      .select(col("cid"), col("id").as("vec_a"), col("v").as("va"),
        pmod(col("id"), lit(blocks.toLong)).as("_blk"))
      .repartition(parts, col("cid"), col("_blk"))
    val b = assigned
      .select(col("cid"), col("id").as("vec_b"), col("v").as("vb"),
        explode(array((0 until blocks).map(i => lit(i.toLong)): _*))
          .as("_blk"))
      .repartition(parts, col("cid"), col("_blk"))
    val pairs = a.join(b, Seq("cid", "_blk"))
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
    * keyed on (table, sig) — an 8-byte shuffle key, never the vectors.
    *
    * BUCKET CAP (round 13 — a contract change from the earlier
    * exhaustive behavior): each (table, sig) bucket's membership is
    * capped at `maxBucket` (default [[Dedup.DefaultMaxBucket]] = 4096,
    * smallest ids kept, deterministic). On a self-similar corpus a
    * mega-bucket's pairs beyond the cap are SILENTLY DROPPED — recall
    * loss is visible only through the `metricName` observe metric
    * (`overflowed_buckets`) unless `failOnOverflow = true`, which turns
    * cap engagement into a loud failure. Callers of this and the
    * derived [[lshThresholdPairs]]/[[lshTopKPairs]] that need the old
    * exhaustive semantics must raise `maxBucket` or set
    * `failOnOverflow`; the default favors bounded work at 100 TB over
    * silent OOM on corpora where every vector shares a bucket. */
  def lshCandidates(vectors: DataFrame, idCol: String, vecCol: String,
      nBits: Int = 8, tables: Int = 16, seed: Long = 7L,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      metricName: String = "graft_emb_lsh",
      failOnOverflow: Boolean = false): DataFrame = {
    val sigs = vectors.select(col(idCol).as("id"),
      array((0 until tables).map(t =>
        RandomProjectionSig(col(vecCol), nBits, seed + t * 1000003L)): _*)
        .as("sigs"))
    val buckets = sigs.select(col("id"),
      posexplode(col("sigs")).as(Seq("table", "sig")))
    // group each (table, sig) bucket and emit its member pairs — the
    // same K-BOUNDED bucket-membership shape as the MinHash path
    // ([[Dedup.minhashCandidates]]): signatures are computed once, the
    // only shuffle moves (table, sig, id) triples, and membership per
    // bucket is capped at `maxBucket` (smallest ids, deterministic)
    // with overflow COUNTED (observe metric) or LOUD (failOnOverflow).
    // The bound is the 100 TB defense against self-similar corpora:
    // the round-13 sf1 probe measured candidates growing 100.7x on 10x
    // vectors because every vector's jittered replicas share buckets —
    // work that is honest for the data but must saturate at a cap, not
    // at executor memory (SCALE.md round 13).
    val aggregated = buckets.groupBy("table", "sig")
      .agg(TopKAgg(negate(col("id").cast("double")), col("id"), maxBucket)
          .as("top"),
        count(lit(1)).as("n_members"))
      .filter(col("n_members") > 1)
      .withColumn("ids", expr("transform(top, e -> e.payload)"))
      .observe(metricName,
        sum(when(col("n_members") > maxBucket, 1L).otherwise(0L))
          .as("overflowed_buckets"))
    val grouped =
      if (failOnOverflow)
        aggregated.filter(assert_true(col("n_members") <= lit(maxBucket),
          concat(lit(s"graft: embedding-LSH bucket exceeded maxBucket=" +
            s"$maxBucket (n_members="), col("n_members"),
            lit("); raise maxBucket, add tables/bits, or dedup exact " +
              "first"))).isNull)
      else aggregated
    grouped
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a")))
      .select(col("i"), col("a"), posexplode(col("ids")).as(Seq("j", "b")))
      .filter(col("i") < col("j"))
      .select(least(col("a"), col("b")).as("vec_a"),
        greatest(col("a"), col("b")).as("vec_b"))
      .distinct()
  }

  /** Approximate global top-N pairs: LSH candidates verified with exact
    * cosine. Same output shape as [[topPairs]]; recall measured in specs.
    * Inherits [[lshCandidates]]' BUCKET CAP: buckets beyond `maxBucket`
    * drop candidates silently unless `failOnOverflow` — see the note
    * there. */
  def lshTopKPairs(vectors: DataFrame, idCol: String, vecCol: String,
      topN: Int, nBits: Int = 8, tables: Int = 16, seed: Long = 7L,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      failOnOverflow: Boolean = false): DataFrame = {
    // same SHJ pinning as [[lshThresholdPairs]] — see the note there
    val v = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
      .hint("shuffle_hash")
    lshCandidates(vectors, idCol, vecCol, nBits, tables, seed,
        maxBucket, failOnOverflow = failOnOverflow)
      .join(v.select(col("id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(v.select(col("id").as("vec_b"), col("v").as("vb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(CosineSim(col("va"), col("vb")), 6).as("cosine"))
      .orderBy(desc("cosine"), col("vec_a"), col("vec_b"))
      .limit(topN)
  }
}
