package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.{Fingerprint64, KmvAgg, SplitMix64Expr}

/** Weighted sampling without replacement (Efraimidis & Spirakis,
  * "Weighted random sampling with a reservoir", Inf. Proc. Letters 2006
  * — algorithm A-ES): every row draws u ∈ (0,1) and is ranked by
  * key = ln(u) / w; the k LARGEST keys are a probability-proportional-
  * to-size sample without replacement. (Equivalently −ln(u)/w is an
  * Exponential(w) race; the k smallest arrivals win.)
  *
  * The draw is DETERMINISTIC: u comes from the SplitMix64-finalized
  * FNV-1a fingerprint of a caller-named id column, so the sample is a
  * pure function of (id set, weights, k) — re-runs, retries, different
  * partitionings, and even different engines reproduce the identical
  * sample (the DuckDB oracle re-derives it hash-for-hash). Finalization
  * matters: raw FNV high bits are biased (measured in [[graft.expr.KmvAgg]]),
  * which would silently distort inclusion probabilities.
  *
  * Scale: one map-side projection (two hash kernels + one log) and a
  * global top-k — Spark plans `orderBy(...).limit(k)` as
  * TakeOrderedAndProject, a per-partition bounded heap merged on the
  * driver, so the exchange carries k rows per partition regardless of
  * input size. No window, no full sort, no shuffle of the corpus.
  *
  * Float caveat: ln is libm — Java and DuckDB may differ in the last
  * ulp. Selection flips only if two keys sit within that ulp of each
  * other (≪ 1e-10 probability at catalog scale), so the key itself is
  * NOT emitted in oracle-checked output; ties in the ranking are broken
  * by id for a deterministic boundary.
  *
  * No counterpart in the reference (no sampling surface at all); part
  * of graft's training-data pipeline extensions (mixture construction /
  * corpus subsampling by quality or length weights).
  */
object Sampling {

  /** 2⁶⁴ as an exact double (see [[graft.expr.KmvAgg.TwoPow64]]). */
  private val TwoPow64 = KmvAgg.TwoPow64

  /** The A-ES ranking key ln(u)/w for a STRING id column and a positive
    * numeric weight. Exposed for specs; see [[weightedSample]]. */
  def aesKey(id: Column, weight: Column): Column = {
    val h = SplitMix64Expr(Fingerprint64(id))
    // unsigned-long → double, spelled signed-then-wrap exactly like the
    // KMV estimator so the DuckDB mirror rounds identically
    val hd = when(h >= 0, h.cast("double"))
      .otherwise(h.cast("double") + lit(TwoPow64))
    // +0.5 keeps u strictly positive for h = 0 (and is absorbed by
    // rounding elsewhere — identically in both engines)
    log((hd + lit(0.5)) / lit(TwoPow64)) / weight.cast("double")
  }

  /** The k-row PPS sample: rows with nonpositive or null weights are
    * excluded (they have zero inclusion probability in A-ES; ln(u)/w
    * would flip sign for w < 0). Output = input columns, ordered by the
    * ranking for a deterministic result set; ties break by `idCol`. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"weightedSample: k must be positive, got $k")
    val key = aesKey(col(idCol).cast("string"), col(weightCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("_aes_key", key)
      .orderBy(desc("_aes_key"), col(idCol))
      .limit(k)
      .drop("_aes_key")
  }
}
