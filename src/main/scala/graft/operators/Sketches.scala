package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.MinHashSig

/** Count-min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005) as RELATIONAL state: the d×w counter matrix is a (row, bucket,
  * cnt) DataFrame built by one hash-partitioned aggregation, and point
  * estimates are a join against it.
  *
  * Why relational rather than a byte-blob UDAF: the counter build is a
  * `groupBy(j, bucket).count()` — Spark's partial aggregation sums
  * per-map-task counters before the shuffle, so at 100 TB the exchange
  * carries at most d·w rows PER MAP TASK regardless of input size, and
  * counter addition is associative/commutative so the result is
  * partitioning- and order-independent (bit-deterministic — the DuckDB
  * oracle reproduces estimates exactly). The sketch guarantees carry
  * over unchanged: estimate ≥ true count always; estimate ≤ true +
  * εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * Row hashes come from the same seeded family as MinHash: hash_j(x) =
  * splitmix64(fnv1a64(x) ^ splitmix64(seed + j)) — i.e. a d-length
  * [[MinHashSig]] of the singleton set {x}, one codegen'd kernel for
  * both sketches (and one SQL mirror).
  *
  * No counterpart in the reference (its counting is exact
  * Count.PerElement, `/root/reference/pipelines/cycle_rides.py:52`);
  * part of graft's LLM-pipeline profiling surface.
  */
object Sketches {

  /** The CMS counter matrix for a key column: (j, bucket, cnt) with
    * j < d, bucket < w. Buckets never seen stay absent (count 0). */
  def cmsCounters(df: DataFrame, keyCol: String, d: Int, w: Int,
      seed: Long): DataFrame = {
    require(d >= 1 && w >= 2, s"cms: need d >= 1, w >= 2, got d=$d w=$w")
    df.select(posexplode(MinHashSig(array(col(keyCol)), d, seed)).as(Seq("j", "h")))
      .select(col("j"), pmod(col("h"), lit(w.toLong)).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for every row of `keys` (all its columns are
    * carried through): min over the d row-counters the key hashes to,
    * 0 for buckets absent from `counters`. (d, w, seed) must match the
    * `cmsCounters` call that built the matrix. */
  def cmsEstimate(counters: DataFrame, keys: DataFrame, keyCol: String,
      d: Int, w: Int, seed: Long): DataFrame = {
    val keyCols = keys.columns.toSeq
    keys
      .select(col("*"), posexplode(MinHashSig(array(col(keyCol)), d, seed)).as(Seq("j", "h")))
      .withColumn("bucket", pmod(col("h"), lit(w.toLong)))
      // left join: an absent (j, bucket) row means no occurrence ever
      // hashed there — counter 0 (the broadcast side is the d×w matrix,
      // bounded by construction)
      .join(broadcast(counters), Seq("j", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(keyCols.map(col): _*)
      .agg(min("cnt").as("est_count"))
  }

  /** Per-group quantile ESTIMATES from a deterministic bounded sample —
    * the quantile member of the sketch family (KMV = distinct counts,
    * CMS = frequencies, this = distribution shape). Each group keeps the
    * k rows winning the A-ES uniform race ([[Sampling.aesKey]] with
    * weight 1 — a pure function of the row ids, so re-runs and engines
    * agree on the SAMPLE exactly), then quantiles are computed
    * closed-form on the sorted sample: pos = (n−1)·p, linear
    * interpolation between the two bracketing order statistics — plain
    * IEEE arithmetic, NO libm, so estimates are bit-identical across
    * engines with no rounding. Rank error is the sampling error of a
    * k-uniform sample: ±O(1/√k) in quantile space with high probability
    * (k = 400 → ~±2.5 percentile points), independent of group size.
    *
    * Scale: the sample selection is [[graft.expr.TopKAgg]] bounded
    * per-group heaps (≤ k rows per group × map task through the
    * exchange — no window, no per-group sort of the corpus); the value
    * join-back happens at sample cardinality; the final sort touches
    * k·|groups| doubles.
    *
    * @param rowId unique LONG per row (its string form seeds the draw)
    * @return (groupCol, prob, quantile) — one row per group × prob
    */
  def sampleQuantiles(df: DataFrame, groupCol: String,
      rowId: org.apache.spark.sql.Column, valueCol: String, k: Int,
      probs: Seq[Double]): DataFrame = {
    require(k >= 2, s"sampleQuantiles: k must be >= 2, got $k")
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"sampleQuantiles: probs must be within [0, 1], got $probs")
    val key = Sampling.aesKey(rowId.cast("string"), lit(1.0))
    val ids = df.filter(col(valueCol).isNotNull)
      .groupBy(groupCol)
      .agg(graft.expr.TopKAgg(key, rowId, k).as("top"))
      .select(col(groupCol), explode(col("top.payload")).as("__rid"))
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), rowId.as("__rid"), col(valueCol))
    val sorted = ids.join(vals, Seq(groupCol, "__rid"))
      .groupBy(groupCol)
      .agg(sort_array(collect_list(col(valueCol).cast("double"))).as("vs"))
    val pos = (size(col("vs")) - 1).cast("double") * col("prob")
    val vLo = element_at(col("vs"), floor(pos).cast("int") + 1)
    val vHi = element_at(col("vs"), ceil(pos).cast("int") + 1)
    sorted
      .select(col(groupCol), col("vs"),
        explode(array(probs.map(lit): _*)).as("prob"))
      .select(col(groupCol), col("prob"),
        (vLo + (vHi - vLo) * (pos - floor(pos))).as("quantile"))
  }
}
