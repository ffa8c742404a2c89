package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
  * Scale shape: one shuffle of (doc, count) partials for document
  * lengths (map-side combined), the query-term postings are filtered
  * BEFORE any shuffle (tf/df see only matching tokens), the per-term df
  * table is broadcast (|Q| rows), and the corpus-wide scalars (N,
  * total tokens) ride a broadcast single-row frame — in-plan, no
  * driver round-trip. Everything that crosses a stage boundary is ids
  * + 8-byte counts; nothing is quadratic.
  *
  * Determinism/mirror contract: idf and the final per-(doc,term)
  * contribution are rounded to 6 dp (the engine-wide libm convention —
  * both depend on `ln`), and the per-document sum accumulates in
  * DECIMAL(28,10) so it is exact and order-independent; the oracle
  * replays the identical parenthesization. No counterpart in the
  * reference (closest: Count.PerElement token counting,
  * `/root/reference/pipelines/cycle_rides.py:48-57`); part of graft's
  * text-curation surface.
  */
object Bm25 {

  /** Rank documents by BM25 against `queryTerms`. Documents matching no
    * term are omitted (their score is 0 by definition). Returns
    * (idCol, score, n_terms) — top `topK` by (score desc, id). */
  def score(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 100): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: queryTerms must be non-empty")
    require(k1 > 0 && b >= 0 && b <= 1, s"bm25: bad parameters k1=$k1 b=$b")
    val d = docs.filter(col(textCol).isNotNull)
    val tk = d
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val dl = tk.groupBy(idCol).agg(count(lit(1)).as("dl"))
    // corpus scalars as a broadcast 1-row frame — stays in-plan
    val stats = tk.agg(count(lit(1)).as("tot_toks"))
      .crossJoin(d.agg(count(lit(1)).as("n_docs")))
    val matching = tk.filter(col("tok").isin(queryTerms: _*))
    val dfT = matching.groupBy("tok")
      .agg(countDistinct(col(idCol)).as("df"))
    val tf = matching.groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"))

    // every float step mirrors the oracle SQL with IDENTICAL
    // parenthesization; only the ln results are rounded
    val avgdl = col("tot_toks").cast("double") / col("n_docs").cast("double")
    val idf = round(log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))), 6)
    val denom = col("tf").cast("double") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl)
    val contrib =
      round(idf * (col("tf").cast("double") * (lit(k1) + lit(1.0))) / denom, 6)

    tf.join(broadcast(dfT), "tok")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
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
