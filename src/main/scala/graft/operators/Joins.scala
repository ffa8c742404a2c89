package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for the two big-data failure modes Spark doesn't fully
  * solve by itself: key skew beyond what AQE's skew-join splitting
  * handles, and repeated big-big joins that should be co-partitioned on
  * disk (bucketing — see [[graft.sources.Sinks.parquetBucketed]]).
  */
object Joins {

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * uniform random-ish salt in [0, salts) derived DETERMINISTICALLY from
    * a row fingerprint (re-runs and retries salt identically — a
    * `rand()`-based salt breaks task retry idempotence); the small side is
    * replicated `salts` times. The shuffle key becomes (key, salt), so one
    * hot key spreads over `salts` reducers.
    *
    * Use when ONE side is skewed and the other is modest (replication
    * multiplies it). For skew on both sides, prefer AQE skew-join
    * splitting (enabled in [[graft.core.GraftSession]]).
    *
    * @param saltSource column of the skewed side whose fingerprint
    *                   spreads its hot keys (e.g. a unique id)
    */
  def saltedJoin(skewed: DataFrame, modest: DataFrame, keys: Seq[String],
      salts: Int, saltSource: Column, joinType: String = "inner"): DataFrame = {
    // coalesce: a NULL saltSource must land in bucket 0, not produce a
    // NULL _salt that silently drops the row from the inner join —
    // salting has to be invisible relative to the plain join
    val salted = skewed.withColumn("_salt",
      pmod(coalesce(graft.expr.Fingerprint64(saltSource.cast("string")),
        lit(0L)), lit(salts)).cast("int"))
    val replicated = modest.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Bloom-filter semi-join pruning: build a [[graft.expr.BloomAgg]]
    * filter over `dim`'s key set, broadcast the one-row blob, and drop
    * `fact` rows whose key cannot be in `dim` BEFORE any join shuffle.
    * False positives pass through (rate ≈ (1−e^{−kn/m})^k), so the
    * caller's subsequent exact join sees a superset of the matching rows
    * and produces a result bit-identical to the unpruned plan — false
    * negatives cannot occur ([[graft.expr.BloomKernels]]).
    *
    * Scale: the filter build exchanges `numBits/8` bytes per map task
    * (TypedImperativeAggregate partial merge), the blob rides one
    * broadcast, and the prune runs inside the fact scan's codegen loop —
    * at 100 TB this cuts the fact side's shuffle volume by roughly the
    * join selectivity for the cost of one tiny aggregate. This is
    * Spark's own runtime bloom-join rewrite surfaced as an explicit
    * operator (the built-in rewrite only fires on its own heuristics;
    * a pipeline author often knows better).
    *
    * Keys must be BIGINT; hash other types through
    * [[graft.expr.Fingerprint64]] on BOTH sides first.
    */
  def bloomPrefilter(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, numBits: Long = 1L << 22, numHashes: Int = 5): DataFrame = {
    // The blob is materialized HERE (one distributed aggregate, then
    // numBits/8 bytes to the driver) and inlined as a Literal, for the
    // same reason the k-means Lloyd step collects its centroid matrix:
    // it is bounded model-scale state, and a literal rides into
    // generated code as a codegen reference object — zero per-row cost.
    // The first cut instead broadcast the blob as a one-row DataFrame
    // and probed it through a nested-loop join condition; extracting the
    // 512 KB binary FIELD from the broadcast row copies it per probe
    // row (~300 GB of memcpy per 600k rows) — 30x slower end to end.
    val blob = dim.agg(graft.expr.BloomAgg(dimKey, numBits, numHashes))
      .head().getAs[Array[Byte]](0)
    fact.filter(graft.expr.BloomMightContain(lit(blob), factKey))
  }
}
