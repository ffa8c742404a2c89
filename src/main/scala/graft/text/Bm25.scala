package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.expr.{TermCounts, TokenCount}

/** BM25 document ranking (Robertson & Zaragoza, "The Probabilistic
  * Relevance Framework: BM25 and Beyond", 2009) — the classic sparse
  * retrieval scorer, here as a fully relational Spark plan so it runs
  * AT CORPUS SCALE as a data-pipeline stage (e.g. scoring a 100 TB
  * crawl against a query/topic term list for targeted curation), not as
  * a per-query search service.
  *
  * score(D, Q) = Σ_{t∈Q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl))
  * with the +1-smoothed idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)),
  * which is non-negative for every df ≤ N.
  *
  * Scale shape (round 7 — TWO corpus scans, down from five): per-row
  * codegen kernels ([[graft.expr.TokenCount]] for |D|,
  * [[graft.expr.TermCounts]] for per-term occurrence slots) replace the
  * explode+groupBy tokenization entirely. Scan 1 is ONE corpus-scalar
  * aggregation producing N, total tokens, AND every per-term document
  * frequency (`sum(mt[i] > 0)` over the fixed slots) — a single
  * broadcast row, in-plan, no driver round-trip. Scan 2 emits only the
  * matching (doc, term) hits (posexplode of the slot array, filtered
  * `tf > 0` BEFORE any shuffle) with |D| already attached — so the old
  * document-length join and df join are GONE; the only data shuffle
  * left is the final per-document score aggregation over matching hits.
  * Everything that crosses a stage boundary is ids + 8-byte counts;
  * nothing is quadratic, and no shuffle keys on a term (no skew when a
  * query term is corpus-common).
  *
  * Determinism/mirror contract: idf and the per-(doc,term) contribution
  * are rounded to 6 dp (the engine-wide libm convention — both depend
  * on `ln`), and the per-document sum accumulates in DECIMAL(28,10) so
  * it is exact and order-independent; the oracle replays the identical
  * parenthesization. No counterpart in the reference (closest:
  * Count.PerElement token counting,
  * `/root/reference/pipelines/cycle_rides.py:48-57`); part of graft's
  * text-curation surface.
  */
object Bm25 {

  /** Rank documents by BM25 against `queryTerms`. Documents matching no
    * term are omitted (their score is 0 by definition). Returns
    * (idCol, score, n_terms) — top `topK` by (score desc, id).
    *
    * Σ_{t∈Q} sums over the SET of query terms: duplicates in
    * `queryTerms` are collapsed (explicitly, via `.distinct` — the
    * previous isin/groupBy plumbing collapsed them silently, same
    * result). A caller wanting qtf-weighted repeats must weight
    * externally. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 100): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: queryTerms must be non-empty")
    require(k1 > 0 && b >= 0 && b <= 1, s"bm25: bad parameters k1=$k1 b=$b")
    val terms = queryTerms.distinct
    val d = docs.filter(col(textCol).isNotNull)
    // one projection both passes share: |D| (all non-empty tokens) and
    // the per-term occurrence slots. Zero-token docs keep dl=0, so the
    // corpus scalars below have exactly the explode+count semantics.
    val base = d.select(col(idCol),
      TokenCount(col(textCol)).as("dl"),
      TermCounts(col(textCol), terms).as("mt"))
    // scan 1: every corpus scalar in ONE single-row aggregate — N,
    // total tokens, and df for each query term (docs where slot i > 0)
    val dfCols = terms.indices.map(i =>
      sum(when(col("mt").getItem(i) > 0L, 1L).otherwise(0L)).as(s"df_$i"))
    val aggCols =
      sum(col("dl")).as("tot_toks") +: count(lit(1)).as("n_docs") +: dfCols
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    // scan 2: matching (doc, term) hits only — tf comes off the slot
    // array (no groupBy), dl rides along (no join)
    val hits = base
      .select(col(idCol), col("dl"), posexplode(col("mt")).as(Seq("ti", "tf")))
      .filter(col("tf") > 0L)
      .crossJoin(broadcast(stats))
    // df for this hit's term, read out of the broadcast stats row
    val dfOfTerm = element_at(
      array(terms.indices.map(i => col(s"df_$i")): _*), col("ti") + 1)

    // every float step mirrors the oracle SQL with IDENTICAL
    // parenthesization; only the ln results are rounded
    val avgdl = col("tot_toks").cast("double") / col("n_docs").cast("double")
    val idf = round(log(lit(1.0) +
      (col("n_docs").cast("double") - dfOfTerm.cast("double") + lit(0.5)) /
        (dfOfTerm.cast("double") + lit(0.5))), 6)
    val denom = col("tf").cast("double") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl)
    val contrib =
      round(idf * (col("tf").cast("double") * (lit(k1) + lit(1.0))) / denom, 6)

    hits
      .select(col(idCol), contrib.as("contrib"))
      .groupBy(idCol)
      .agg(
        sum(col("contrib").cast(DecimalType(28, 10))).cast("double")
          .as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(desc("score"), col(idCol))
      .limit(topK)
  }
}
