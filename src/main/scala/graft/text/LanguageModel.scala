package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model scoring — the cheap end of
  * perplexity-based quality filtering (score each document by the mean
  * log-probability of its tokens under the corpus's own unigram
  * distribution; gibberish and boilerplate score far from the bulk and
  * get gated). The expensive end of the same pipeline swaps in a real
  * LM; the relational shape — train token stats, broadcast them, score
  * map-side — is identical.
  *
  * Scale: the "model" is the unigram frequency table (vocabulary-sized,
  * bounded model-scale state) joined BROADCAST; the corpus side is
  * tokenize + join + per-doc aggregate, no corpus-keyed shuffle beyond
  * the per-doc groupBy. MLE probabilities need no smoothing here: every
  * scored token exists in the training corpus by construction (the
  * corpus scores itself; for cross-corpus scoring add-one smoothing
  * would slot into the probability expression).
  *
  * Determinism: ln is libm (±1 ulp cross-engine) and avg accumulates in
  * partition order, so the mean is rounded to 6 dp — drift is ~1e-15,
  * nine orders below the rounding grain (same convention as the
  * haversine columns).
  *
  * No counterpart in the reference (no text surface); part of graft's
  * LLM-pipeline quality-filter family beside [[TextAnalysis.qualityScore]]
  * and the Gopher repetition rules.
  */
object LanguageModel {

  /** (doc_id, n_toks, mean_logprob): mean over the doc's tokens of
    * ln(count(tok) / total_tokens), trained on `docs` itself.
    *
    * EVERY input doc gets an output row: null / whitespace-only docs
    * (which contribute no tokens to the model) come back with n_toks = 0
    * and mean_logprob = NULL — an explicit sentinel a quality-filter
    * caller can gate on, instead of the doc silently vanishing from the
    * scored set (and thereby slipping past a "keep if score ≥ θ" filter
    * composed as a join). */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val freqs = tk.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = tk.agg(count(lit(1)).as("n"))
    val scored = tk.join(broadcast(freqs), "tok")
      .crossJoin(broadcast(total))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_toks"),
        round(avg(log(col("cnt").cast("double")) - log(col("n").cast("double"))), 6)
          .as("mean_logprob"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        col("mean_logprob"))
  }

  /** BIGRAM scoring with unigram interpolation — one rung up the
    * n-gram ladder from [[unigramLogProb]]: each adjacent token pair
    * contributes ln(λ·P(w₂|w₁) + (1−λ)·P(w₂)), so word-ORDER
    * plausibility enters the quality score (shuffled-token gibberish
    * that fools a unigram model scores low here). The unigram
    * interpolation term keeps every in-vocabulary bigram finite —
    * P(w₂) > 0 whenever w₂ occurs — the classic Jelinek–Mercer shape.
    *
    * λ defaults to 0.75 deliberately: 1−λ = 0.25 is binary-exact, so
    * the Spark and oracle literal arithmetic agree bit-for-bit (0.7
    * would make `1.0 − λ` differ between decimal-literal and
    * double-literal engines).
    *
    * Scale: the bigram count table is corpus-derived state like the
    * unigram table one rung larger — joins are left unhinted so AQE
    * broadcasts them while they fit and shuffles when they don't; the
    * per-doc window (lag over positions) is PARTITIONED by document,
    * never global. Determinism: ln is libm and avg partition-ordered →
    * mean rounds to 6 dp, per engine convention.
    *
    * Output: (idCol, n_bigrams, mean_logprob) for EVERY doc — docs
    * with fewer than two tokens get the (0, NULL) sentinel. */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.75): DataFrame = {
    require(lambda > 0 && lambda < 1,
      s"bigramLogProb: lambda must be in (0, 1), got $lambda")
    import org.apache.spark.sql.expressions.Window
    val tk = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), posexplode(split(col(textCol), " "))
        .as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val uni = tk.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = tk.agg(count(lit(1)).as("n"))
    val bg = tk
      .withColumn("prev",
        lag("tok", 1).over(Window.partitionBy(idCol).orderBy("pos")))
      .filter(col("prev").isNotNull)
      .select(col(idCol), col("prev").as("w1"), col("tok").as("w2"))
    val bcnt = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val scored = bg
      .join(bcnt, Seq("w1", "w2"))
      .join(uni.select(col("tok").as("w1"), col("cnt").as("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("cnt").as("c2u")), "w2")
      .crossJoin(broadcast(total))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(
          lit(lambda) * (col("cb").cast("double") / col("c1").cast("double")) +
            lit(1.0 - lambda) *
              (col("c2u").cast("double") / col("n").cast("double")))), 6)
          .as("mean_logprob"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("mean_logprob"))
  }

  /** CROSS-corpus scoring — the deployed shape of LM quality filtering:
    * train the unigram model on a reference corpus (e.g. a trusted
    * high-quality slice), score a CANDIDATE corpus against it, and gate
    * on the score. Unlike [[unigramLogProb]] (corpus scores itself, MLE
    * suffices), unseen tokens are the norm here, so probabilities are
    * add-α smoothed over the train vocabulary plus one UNK bucket:
    * p(tok) = (cnt(tok) + α) / (total + α·(V + 1)). Every OOV token
    * shares the UNK mass; `n_oov` rides along because the OOV RATE is
    * itself a standard quality/language-drift signal.
    *
    * Scale: identical to [[unigramLogProb]] — the model (freqs + the
    * 1-row total/vocab stats) is broadcast, the candidate side is
    * tokenize + map-side join + per-doc aggregate.
    *
    * Determinism: ln is libm and avg is partition-order-dependent → the
    * mean rounds to 6 dp (engine convention); counts are exact.
    *
    * Output: (idCol, n_toks, n_oov, mean_logprob) for EVERY doc in
    * `score` — empty docs get the (0, 0, NULL) sentinel. */
  def unigramLogProbCross(train: DataFrame, score: DataFrame,
      idCol: String, textCol: String, alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"unigramLogProbCross: alpha must be > 0, got $alpha")
    def toks(df: DataFrame) = df.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val ttk = toks(train)
    val freqs = ttk.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val stats = freqs.agg(coalesce(sum("cnt"), lit(0L)).as("total"),
      count(lit(1)).as("v"))
    val scored = toks(score)
      .join(broadcast(freqs), Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("cnt").isNull, 1L).otherwise(0L)).as("n_oov"),
        round(avg(
          log(coalesce(col("cnt"), lit(0L)).cast("double") + alpha) -
            log(col("total").cast("double") +
              lit(alpha) * (col("v") + lit(1L)).cast("double"))), 6)
          .as("mean_logprob"))
    score.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        col("mean_logprob"))
  }
}
