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
}
