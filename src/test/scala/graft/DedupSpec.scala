package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.{Dedup, Similarity}
import graft.sources.Sources

/** Dedup + similarity operator specs: micro-fixtures with known answers,
  * plus cross-validation of the approximate paths (MinHash-LSH, SimHash,
  * vector LSH) against their exact counterparts on the sf0.001 corpus. */
class DedupSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private def docs(rows: (Long, String)*) =
    Sources.inMemory(spark, rows.map(r => Row(r._1, r._2)), docSchema)

  test("exactGroups: duplicate texts collapse to keeper with copy count") {
    val d = docs(
      (1L, "aa bb cc"), (2L, "dd ee ff"), (3L, "aa bb cc"),
      (4L, "aa bb cc"), (5L, "gg hh"))
    val out = rows(Dedup.exactGroups(d, "doc_id", "text"))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 5L -> 1L))
  }

  test("exactDedup keeps exactly the keeper rows") {
    val d = docs((1L, "x"), (2L, "x"), (3L, "y"))
    val kept = rows(Dedup.exactDedup(d, "doc_id", "text")).map(_.getLong(0)).sorted
    assert(kept == Seq(1L, 3L))
  }

  test("exactDedup: null-text rows all survive (no content = no duplicate)") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    val d = Sources.inMemory(spark, Seq(
      Row(1L, "same"), Row(2L, "same"), Row(3L, null), Row(4L, null)), schema)
    val kept = rows(Dedup.exactDedup(d, "doc_id", "text")).map(_.getLong(0)).sorted
    assert(kept == Seq(1L, 3L, 4L), "both null-text rows must survive")
    val groups = rows(Dedup.exactGroups(d, "doc_id", "text"))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(1L -> 2L), "null texts must not form a group")
  }

  test("dedupAgainst: batch rows drop if seen in corpus or duplicated in batch") {
    val corpus = docs((1L, "old text"), (2L, "other old"))
    val batch = docs(
      (10L, "old text"),   // already in corpus -> dropped
      (11L, "brand new"),  // kept
      (12L, "brand new"),  // batch-internal dup -> dropped
      (13L, "also new"))   // kept
    val kept = rows(Dedup.dedupAgainst(corpus, batch, "doc_id", "text"))
      .map(_.getLong(0)).sorted
    assert(kept == Seq(11L, 13L))
  }

  test("dedupAgainst: null text dropped; caller fp column untouched") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("fp", StringType, nullable = true))) // caller-owned name
    def mk(rows: (Long, String, String)*) = Sources.inMemory(spark,
      rows.map(r => Row(r._1, r._2, r._3)), schema)
    val corpus = mk((1L, "seen", "c1"))
    val batch = mk((10L, null, "keepme"), (11L, "fresh", "keepme2"),
      (12L, "seen", "x"))
    val out = rows(Dedup.dedupAgainst(corpus, batch, "doc_id", "text"))
    assert(out.map(_.getLong(0)) == Seq(11L))
    // caller's own fp column survives intact
    assert(out.head.getAs[String]("fp") == "keepme2")
  }

  test("jaccardPairs: hand-computable trigram overlap") {
    // a: tokens 1..5 -> shingles {1 2 3, 2 3 4, 3 4 5} (3)
    // b: tokens 2..6 -> shingles {2 3 4, 3 4 5, 4 5 6} (3); inter=2, union=4
    val d = docs((1L, "t1 t2 t3 t4 t5"), (2L, "t2 t3 t4 t5 t6"))
    val out = rows(Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.4))
    assert(out.size == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-12)
  }

  test("minhashLshPairs reproduces exact jaccardPairs on the sf0.001 corpus") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = rows(Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.5))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = rows(Dedup.minhashLshPairs(d, "doc_id", "text", 3, 0.5))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty) // the corpus plants near-dup pairs
    assert(lsh == exact)
  }

  test("minhashCandidates: flood bucket is capped, bounded, and observable") {
    // 500 docs with IDENTICAL text — every band bucket holds all 500 ids.
    // With maxBucket=8 the bounded heap keeps the 8 smallest ids per
    // bucket: candidate pairs are C(8,2)=28, not C(500,2)=124750, and no
    // stage ever materializes a 500-element list.
    val flood = docs((0L until 500L).map(i => i -> "same text every time"): _*)
    val cands = Dedup.minhashCandidates(flood, "doc_id", "text",
      n = 3, k = 128, bands = 32, seed = 42L, maxBucket = 8)
    val got = rows(cands).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (for (a <- 0L until 8L; b <- a + 1 until 8L) yield (a, b)).toSet)
    // the overflow is loud: the observe metric counts capped buckets
    val metric = cands.queryExecution.observedMetrics("graft_minhash_lsh")
    assert(metric.getAs[Long]("overflowed_buckets") == 32L) // one per band
  }

  test("minhashLshPairs with a tight cap still verifies planted pairs") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = rows(Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.5))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // real dup clusters are tiny — a cap of 16 must not drop any pair
    val capped = rows(Dedup.minhashLshPairs(d, "doc_id", "text", 3, 0.5,
      maxBucket = 16))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == exact)
  }

  private val pairSchema = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false)))

  private def pairDf(ps: (Long, Long)*) =
    Sources.inMemory(spark, ps.map(p => Row(p._1, p._2)), pairSchema)

  test("duplicateClusters: 50-deep chain converges in ≤7 rounds (star contraction)") {
    // chain 1-2-…-50: plain neighbor propagation needs diameter (49)
    // rounds; large-star/small-star halves chain depth per round
    // (49→24→12→6→3→1), so fixpoint lands by round ~6 and one more
    // round confirms it
    val chain = pairDf((1L until 50L).map(i => (i, i + 1)): _*)
    val (labels, rounds, converged) =
      Dedup.duplicateClustersDetail(chain, maxIter = 10)
    assert(converged, "deep chain did not converge in 10 rounds")
    assert(rounds <= 7, s"took $rounds rounds for depth 50; halving should need ≤7")
    val out = rows(labels).map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == (1L to 50L).toSet)
    assert(out.values.forall(_ == 1L), "every chain vertex must label to 1")
  }

  test("duplicateClusters: adversarial id order (keeper at the FAR end of an " +
    "ascending chain) converges just as fast") {
    // path 2-3-…-50-1: every interior vertex's ids ascend AWAY from the
    // keeper, which hangs off the far end — the ordering that degenerated
    // min-label pointer jumping to O(diameter) rounds (labels collapsed
    // to the local min 2, and 1 crept in one hop per round). Star
    // contraction is id-order independent: same halving as the friendly
    // chain, at most one extra round for the keeper to fold in from the
    // far end (measured: 8 vs the friendly chain's ≤7 — vs ~50 for
    // pointer jumping).
    val chain = pairDf(((2L until 50L).map(i => (i, i + 1)) :+ (50L, 1L)): _*)
    val (labels, rounds, converged) =
      Dedup.duplicateClustersDetail(chain, maxIter = 10)
    assert(converged, "adversarial chain did not converge in 10 rounds")
    assert(rounds <= 8, s"took $rounds rounds; id order must not matter")
    val out = rows(labels).map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == (1L to 50L).toSet)
    assert(out.values.forall(_ == 1L), "every chain vertex must label to 1")
  }

  test("duplicateClusters: self-pairs keep their vertex with a self label") {
    val g = pairDf((7L, 7L), (1L, 2L))
    val out = rows(Dedup.duplicateClusters(g))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(7L -> 7L, 1L -> 1L, 2L -> 1L))
  }

  test("duplicateClusters: non-convergence throws instead of truncating") {
    val chain = pairDf((1L until 50L).map(i => (i, i + 1)): _*)
    val (_, _, converged) = Dedup.duplicateClustersDetail(chain, maxIter = 2)
    assert(!converged)
    val e = intercept[IllegalStateException] {
      Dedup.duplicateClusters(chain, maxIter = 2).collect()
    }
    assert(e.getMessage.contains("maxIter"))
  }

  test("duplicateClusters: disjoint components label to their own minima") {
    val g = pairDf((1L, 2L), (2L, 3L), (1L, 3L), // triangle
      (10L, 11L),                                // pair
      (20L, 21L), (21L, 22L))                    // path
    val out = rows(Dedup.duplicateClusters(g))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("containmentDedup: reliableCheckpoint materializes the index durably " +
    "and preserves the default-path result") {
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_cont")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    val base = "The quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (1L, base + " with extra unique trailing content one"),
      (2L, "Completely different text " + base),   // shares the passage
      (3L, "Unrelated document about entirely other things and topics")
    ).toDF("doc_id", "text")
    val durable = rows(Dedup.containmentDedup(docs, "doc_id", "text",
      k = 8, w = 4, minShared = 2, reliableCheckpoint = true))
      .map(_.getLong(0)).toSet
    val default = rows(Dedup.containmentDedup(docs, "doc_id", "text",
      k = 8, w = 4, minShared = 2))
      .map(_.getLong(0)).toSet
    assert(durable == default, "checkpoint mode changed the result")
    assert(durable == Set(1L, 3L), s"expected partial-copy 2 dropped, got $durable")
    val files = java.nio.file.Files.walk(ckpt).count()
    assert(files > 1, "expected checkpoint data under the configured dir")
  }

  test("duplicateClusters: reliableCheckpoint writes to the configured dir") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    val g = pairDf((1L, 2L), (2L, 3L), (10L, 11L))
    val out = rows(Dedup.duplicateClusters(g, reliableCheckpoint = true))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // the durable path actually materialized checkpoints
    val files = java.nio.file.Files.walk(ckpt).count()
    assert(files > 1, "expected checkpoint data under the configured dir")
  }

  test("minhashCandidates: failOnOverflow makes cap engagement a loud failure") {
    val flood = docs((0L until 100L).map(i => i -> "same text every time"): _*)
    val cands = Dedup.minhashCandidates(flood, "doc_id", "text",
      n = 3, k = 128, bands = 32, seed = 42L, maxBucket = 8,
      failOnOverflow = true)
    val e = intercept[Throwable] { rows(cands) }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("maxBucket")),
      s"expected the in-plan overflow assert, got: ${messages(e)}")
  }

  test("minhashCandidates: integer ids are cast to long (no runtime CCE)") {
    val intSchema = StructType(Seq(
      StructField("doc_id", IntegerType, nullable = false),
      StructField("text", StringType, nullable = false)))
    val d = Sources.inMemory(spark,
      Seq(Row(1, "aa bb cc dd"), Row(2, "aa bb cc dd")), intSchema)
    val out = rows(Dedup.minhashCandidates(d, "doc_id", "text",
      n = 3, k = 128, bands = 32, seed = 42L))
    assert(out.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 2L)))
  }

  test("containmentPairs: catches a copied passage exact dedup and Jaccard miss") {
    val passage = "the quick brown fox jumps over the lazy dog while seven " +
      "wizards brew acid to empower the vexed djinn beyond measure"
    val d = docs(
      (1L, "completely original leading content here " + passage),
      (2L, passage + " trailed by an unrelated essay on spark shuffles and " +
        "partitioning strategy at terabyte scale with many extra words"),
      (3L, "no shared material whatsoever in this third document text"))
    val pairs = rows(Dedup.containmentPairs(d, "doc_id", "text",
      k = 8, w = 8, minShared = 2))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    // whole-doc Jaccard at the near-dup threshold does NOT flag the pair —
    // containment is a different detection surface
    val jac = rows(Dedup.jaccardPairs(d, "doc_id", "text", 3, TextQueries.MinJaccard))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)))
  }

  test("containmentDedup keeps one doc per partial-copy cluster") {
    val passage = "the quick brown fox jumps over the lazy dog while seven " +
      "wizards brew acid to empower the vexed djinn beyond measure"
    val d = docs(
      (1L, "original article leading in with " + passage),
      (2L, passage + " quoted inside an otherwise different piece of text"),
      (3L, "standalone writing sharing no passage with anything else here"),
      (4L, "fourth doc likewise entirely its own words and phrasing"))
    val kept = rows(Dedup.containmentDedup(d, "doc_id", "text",
      k = 8, w = 8, minShared = 2)).map(_.getLong(0)).sorted
    assert(kept == Seq(1L, 3L, 4L)) // 2 drops: it contains 1's passage
  }

  test("containmentPairs: maxDocFreq drops boilerplate fingerprints") {
    // every doc shares the same boilerplate header; only 1-2 share real text
    val header = "standard corporate boilerplate disclaimer header text block"
    val body = "genuinely duplicated body paragraph content that matters here"
    val d = docs(
      (1L, header + " " + body),
      (2L, header + " " + body),
      (3L, header + " first unique content entirely its own words"),
      (4L, header + " second unique content also completely distinct"),
      (5L, header + " third unique content nothing shared otherwise"))
    // df cap 2: header fps (df=5) dropped, body fps (df=2) kept
    val capped = rows(Dedup.containmentPairs(d, "doc_id", "text",
      k = 8, w = 8, minShared = 2, maxDocFreq = 2))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)), s"got $capped")
    // uncapped: the header makes every pair look like a partial copy
    val uncapped = rows(Dedup.containmentPairs(d, "doc_id", "text",
      k = 8, w = 8, minShared = 2))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == 10, "all C(5,2) pairs share the boilerplate")
  }

  test("simhashPairs finds the planted near-dups (recall vs jaccard truth)") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val truth = rows(Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.8))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = rows(Dedup.simhashPairs(d, "doc_id", "text", 3))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    // SimHash(hamming≤3) is a different similarity surface than Jaccard —
    // demand substantial-but-not-total agreement on ~99%-similar pairs.
    val recall = (truth & sim).size.toDouble / truth.size
    assert(recall >= 0.5, s"simhash recall $recall over ${truth.size} truth pairs")
  }

  test("vector LSH candidates recall the exact top pairs") {
    // This corpus's top pairs sit at moderate cosine (~0.5, θ≈60°) — far
    // below the near-dup regime the 8-bit defaults target — so probe with
    // wider buckets (6 bits) and more tables (24): per-pair collision
    // ≈ 1−(1−(1/3)^6·…)^24 ≈ 0.7 at cos 0.5, ~1.0 in the ≥0.9 regime.
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val exact = rows(Similarity.topPairs(e, "vec_id", "embedding", 20))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = rows(Similarity.lshTopKPairs(
      e, "vec_id", "embedding", 20, nBits = 6, tables = 24))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.55, s"lsh recall $recall")
  }

  test("bruteForceTopK: ranks are 1..k, ordered by cosine desc") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val out = rows(Similarity.bruteForceTopK(
      e, e.filter(org.apache.spark.sql.functions.col("vec_id") < 3),
      "vec_id", "embedding", 5))
    assert(out.size == 15)
    out.groupBy(_.getLong(0)).foreach { case (_, gs) =>
      val byRank = gs.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)) == Seq(1, 2, 3, 4, 5))
      val cosines = byRank.map(_.getDouble(3))
      assert(cosines == cosines.sorted.reverse)
    }
  }

  test("bruteForceTopK matches the window form and plans no WindowExec") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
    val viaAgg = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
    // plan: the ranking must be an aggregate, not a window sort-shuffle
    assert(!viaAgg.queryExecution.executedPlan.toString.contains("Window"),
      "TopKAgg path must not plan a WindowExec")
    val scored = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(q.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.expr.CosineSim(col("qv"), col("cv")), 6).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cosine")
    val a = rows(viaAgg).map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val b = rows(viaWindow).map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a == b)
  }

  /** Deterministic fixture with PLANTED embedding near-dups: 40 base
    * vectors (hash-derived pseudo-random, 16-dim) plus a jittered copy of
    * every 4th one (cosine vs its base ≳ .99) — the high-threshold regime
    * [[Similarity.cosineDedup]]'s LSH path is built for, which the
    * synthetic embeddings table lacks. */
  private def plantedVectors = {
    import spark.implicits._
    def vec(seed: Long): Array[Float] = Array.tabulate(16) { d =>
      // SplitMix64-ish mix — stable across runs, no RNG state
      var z = seed * 31L + d + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)).toDouble / Long.MaxValue.toDouble).toFloat
    }
    val base = (0L until 40L).map(i => (i, vec(i)))
    val dups = (0L until 40L by 4).map(i =>
      (100L + i, vec(i).zipWithIndex.map { case (x, d) =>
        x + (if (d % 2 == 0) 0.01f else -0.01f) }))
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("cosineDedup drops exactly the planted jittered copies, keeps minima") {
    val v = plantedVectors
    val kept = rows(Similarity.cosineDedup(v, "vec_id", "embedding", 0.98))
      .map(_.getLong(0)).toSet
    // every base survives (it is its cluster's min id); every 100+ dup drops
    assert(kept == (0L until 40L).toSet, s"kept $kept")
  }

  test("LSH threshold pairs match exact threshold pairs in the near-dup regime") {
    val v = plantedVectors
    val exact = rows(Similarity.thresholdPairs(v, "vec_id", "embedding", 0.98))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == 10, s"planted pairs: $exact")
    val lsh = rows(Similarity.lshThresholdPairs(v, "vec_id", "embedding", 0.98))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // cos ≥ .98 → collision per 8-bit table ≈ .74, miss over 16 tables
    // ≈ 4e-10 — exact equality is the expected outcome, deterministically
    assert(lsh == exact, s"lsh $lsh vs exact $exact")
    val viaLsh = rows(Similarity.cosineDedup(
      v, "vec_id", "embedding", 0.98, useLsh = true)).map(_.getLong(0)).toSet
    assert(viaLsh == (0L until 40L).toSet)
  }

  test("embedding-LSH bucket bound: cap keeps smallest ids, " +
      "overflow observed silently by default, loud under failOnOverflow") {
    import spark.implicits._
    // ten IDENTICAL vectors: one bucket per table, membership 10 — the
    // degenerate self-similar shape the round-13 sf1 probe measured
    // (jittered replicas sharing every signature)
    val same = (0L until 10L).map(i => (i, Array.fill(16)(1.0f)))
      .toDF("vec_id", "embedding")
    // unbounded (default 4096): all 45 pairs
    assert(Similarity.lshCandidates(same, "vec_id", "embedding").count()
      == 45L)
    // capped at 4: the smallest 4 ids per bucket -> exactly C(4,2)
    // pairs among ids {0,1,2,3}, deterministically, in every table
    val capped = rows(Similarity.lshCandidates(same, "vec_id", "embedding",
        maxBucket = 4))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == (for (a <- 0L until 4L; b <- (a + 1) until 4L)
      yield (a, b)).toSet, s"capped candidates: $capped")
    // loud mode: the same overflow must throw, naming the knob
    val e = intercept[Exception] {
      Similarity.lshCandidates(same, "vec_id", "embedding",
        maxBucket = 4, failOnOverflow = true).count()
    }
    assert(e.getMessage.contains("maxBucket"),
      s"overflow must name the bound: ${e.getMessage}")
    // the exhaustive configuration still completes on the planted
    // corpus (completion IS the zero-overflow certificate) — kept as
    // the SPEC-pinned form now that the catalog gates the capped shape
    assert(Similarity.lshTopKPairs(plantedVectors, "vec_id", "embedding",
      10, failOnOverflow = true).count() == 10L)
  }

  test("gated capped LSH shapes: the cap is a no-op at gated SFs — " +
      "capped output equals the exhaustive form exactly") {
    // r16: q_ann_lsh_pairs / q_dedup_embedding_lsh gate the CAPPED
    // configuration (GateMaxBucket smallest ids per bucket — the
    // production defense against replica-heavy corpora). This is the
    // certificate that at spec/gate scale no bucket reaches the cap,
    // so the capped entry certifies the same answer the exhaustive
    // (spec-only) form produces.
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def pairs(mb: Int, loud: Boolean) = rows(Similarity.lshTopKPairs(
      e, "vec_id", "embedding", 50, maxBucket = mb, failOnOverflow = loud))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs(VectorQueries.GateMaxBucket, loud = false) ==
      pairs(graft.operators.Dedup.DefaultMaxBucket, loud = true))
  }

  test("q_dedup_editdist: every pair is a blocked candidate with a " +
      "true unit-cost distance under the length-scaled bound") {
    import org.apache.spark.sql.functions.{ceil, col, greatest, length => len}
    val out = TextQueries.qDedupEditDist.run(spark, sfDir).cache()
    val cands = Dedup.minhashLshPairs(
      graft.core.Tables.documents(spark, sfDir), "doc_id", "text",
      TextQueries.ShingleN, TextQueries.MinJaccard,
      // distinct observe name: this plan joins the entry's plan, and
      // Spark rejects two CollectMetrics with the same name per query
      metricName = "graft_minhash_lsh_editdist_spec",
      failOnOverflow = true)
      .select("doc_a", "doc_b")
    // blocked: output ⊆ candidate stream (left_anti must be empty)
    assert(out.join(cands, Seq("doc_a", "doc_b"), "left_anti").count() == 0L)
    // bound holds row-wise against re-derived lengths
    val t = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val checked = out
      .join(t.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(t.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
    assert(checked.filter(col("edit_dist") >
      ceil(greatest(len(col("ta")), len(col("tb"))) *
        TextQueries.MaxEditFrac)).count() == 0L)
    // the distance column IS Levenshtein (recompute and compare)
    assert(checked.filter(col("edit_dist") =!=
      org.apache.spark.sql.functions.levenshtein(col("ta"), col("tb")))
      .count() == 0L)
    assert(out.count() > 0L, "planted near-dups must survive the bound")
  }

  test("cosineDedup on a corpus with no pairs above threshold keeps everything") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    assert(Similarity.cosineDedup(e, "vec_id", "embedding", 0.95).count() ==
      e.count())
  }

  test("thresholdPairs refuses corpora past broadcast scale (loud guard)") {
    val v = plantedVectors // 50 rows
    val e = intercept[IllegalArgumentException] {
      Similarity.thresholdPairs(v, "vec_id", "embedding", 0.98,
        maxExactRows = 10L)
    }
    assert(e.getMessage.contains("lshThresholdPairs"),
      s"guard must point at the scale path: ${e.getMessage}")
    // at-or-under the cap still works (boundary is inclusive)
    assert(Similarity.thresholdPairs(v, "vec_id", "embedding", 0.98,
      maxExactRows = 50L).count() == 10)
    // a deliberately huge cap means "guard off" — it must not overflow
    // toInt into a negative LIMIT and break the guard itself
    assert(Similarity.thresholdPairs(v, "vec_id", "embedding", 0.98,
      maxExactRows = Long.MaxValue).count() == 10)
  }

  test("dropDuplicatedSpans: cross-doc runs cut surgically, unique text " +
    "and within-doc repeats survive, full duplicates empty out") {
    import spark.implicits._
    val shared = (1 to 6).map(i => s"s$i").mkString(" ") // a 6-token run
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),    // shares the run with 2
      (2L, s"$shared epsilon zeta eta theta"),    // shares the run with 1
      (3L, "iota kappa lambda mu nu xi omicron"), // unique — untouched
      (4L, "rep one two rep one two rep seven eight nine ten"), // self-repeat only
      (5L, "twin a b c d e f"), (6L, "twin a b c d e f")        // exact copies
    ).toDF("doc_id", "text")
    val out = rows(Dedup.dropDuplicatedSpans(docs, "doc_id", "text",
      spanTokens = 6).orderBy("doc_id"))
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("alpha beta gamma delta", 4L, 6L)), out(1L).toString)
    assert(out(2L) == (("epsilon zeta eta theta", 4L, 6L)), out(2L).toString)
    assert(out(3L)._3 == 0L && out(3L)._1 == "iota kappa lambda mu nu xi omicron")
    assert(out(4L)._3 == 0L,
      s"within-doc repetition is not corpus duplication: ${out(4L)}")
    assert(out(5L) == (("", 0L, 7L)) && out(6L) == (("", 0L, 7L)),
      "exact copies must empty out on both sides")
    assert(out.size == 6)
  }

  test("semanticDedup: drops within-cluster near-dups, is a superset of " +
    "exact cosineDedup survivors, covers every vector exactly once") {
    val v = plantedVectors // 40 bases + 10 jittered copies (cos ≈ .9998)
    val sem = rows(Similarity.semanticDedup(
      v, "vec_id", "embedding", k = 4, maxIter = 2, minCosine = 0.98))
      .map(r => r.getLong(0)).toSet
    // a jittered copy is ~identical to its base, so k-means cannot
    // separate the pair: every planted dup lands in its base's cell and
    // is pruned there — min-id keeps the bases
    assert((0L until 40L).forall(sem.contains), s"dropped a base: $sem")
    assert((0L until 40L by 4).forall(i => !sem.contains(100L + i)),
      s"kept a planted dup: $sem")
    // cluster-then-prune can only MISS pairs (the cross-cluster ones):
    // global exact dedup's drops are a superset of semantic drops
    val globalKeep = rows(Similarity.cosineDedup(
      v, "vec_id", "embedding", 0.98)).map(_.getLong(0)).toSet
    assert(globalKeep.subsetOf(sem),
      "semanticDedup must never drop a vector exact global dedup keeps")
    // and the output partitions the corpus: every id exactly once
    assert(sem.size == Similarity.semanticDedup(
      v, "vec_id", "embedding", 4, 2, 0.98).count())
  }

  test("crossCorpusNearDups: finds exact and near contamination, not clean docs") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val train = Seq(
      (1L, base),                                     // exact copy in probe
      (2L, base.replace("dog", "cat")),               // near-dup of probe 12
      (3L, "completely unrelated text about spark engines and shuffles here"),
      (4L, null.asInstanceOf[String])                 // null-safe
    ).toDF("doc_id", "text")
    val probe = Seq(
      (11L, base),                                    // contaminated: exact
      (12L, base.replace("dog", "cat") + " extra"),   // contaminated: near
      (13L, "eval question with no training overlap whatsoever in words")
    ).toDF("doc_id", "text")
    val out = rows(graft.operators.Dedup.crossCorpusNearDups(
      train, probe, "doc_id", "text", n = 3, minJaccard = 0.5))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = out.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 11L)), s"exact copy missed: $out")
    assert(pairs.contains((2L, 12L)), s"near dup missed: $out")
    assert(out.find(p => p._1 == 1L && p._2 == 11L).get._3 == 1.0,
      "exact copy must score jaccard 1.0")
    // clean docs stay clean; ids from different corpora never self-pair
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 13L), s"false positive: $out")

    // the keeper composition removes exactly the contaminated train docs
    // (null-text doc 4 survives: no shingles, no evidence)
    val cleaned = rows(graft.operators.Dedup.decontaminate(
      train, probe, "doc_id", "text", n = 3, minJaccard = 0.5))
      .map(_.getLong(0)).toSet
    assert(cleaned == Set(3L, 4L), s"cleaned: $cleaned")
  }

  test("crossCorpusContainment: finds an eval passage embedded in a long train page") {
    import spark.implicits._
    val passage = "which planet has the most moons in the solar system answer saturn"
    val filler = (1 to 40).map(i => s"filler$i sentence$i").mkString(" ")
    val train = Seq(
      (1L, s"$filler $passage $filler"), // passage buried in a long page
      (2L, filler)                       // clean page
    ).toDF("doc_id", "text")
    val probe = Seq(
      (11L, passage),                    // the eval question itself
      (12L, "unrelated evaluation prompt about rivers and mountains today")
    ).toDF("doc_id", "text")
    val out = rows(graft.operators.Dedup.crossCorpusContainment(
      train, probe, "doc_id", "text", k = 8, w = 8, minShared = 8))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.exists(p => p._1 == 1L && p._2 == 11L && p._3 >= 0.8),
      s"embedded passage not detected: $out")
    // whole-doc Jaccard misses exactly this case (tiny doc-level overlap)
    val jaccard = rows(graft.operators.Dedup.crossCorpusNearDups(
      train, probe, "doc_id", "text", n = 3, minJaccard = 0.5))
    assert(!jaccard.exists(r => r.getLong(0) == 1L && r.getLong(1) == 11L),
      "doc-level Jaccard should NOT flag the buried passage (that's the point)")
    assert(!out.exists(p => p._1 == 2L || p._2 == 12L), s"false positive: $out")
  }
}
