package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.{CosineSim, L2Distance, TopKAgg}

/** Distributed k-means (Lloyd's algorithm) over an `array<float>` column,
  * and the multi-probe IVF search built on it — the trained counterpart
  * of [[graft.VectorQueries]]'s label-as-quantizer IVF entry.
  *
  * Scale design (100 TB): centroids are a k-row frame BROADCAST to the
  * corpus side each iteration — the corpus is never shuffled during
  * assignment; the update step shuffles (cid, dim, component) triples,
  * i.e. k·dim running means, not vectors. The driver only coordinates
  * iterations (like [[Dedup.duplicateClusters]]); `localCheckpoint`
  * truncates the per-iteration lineage.
  *
  * Determinism: seeds are the k smallest-id vectors; the argmin
  * tie-break is (distance, cid) lexicographic — re-runs and executor
  * retries assign identically, so the trained index is reproducible
  * (the same property every other graft kernel keeps).
  */
object KMeans {

  /** Lloyd iterations. Returns (centroids, assignments):
    * centroids = (cid, cv: array<float>) — cid is the SEED VECTOR's id
    * (stable across iterations; no global ordering pass needed);
    * assignments = (id, v, cid).
    *
    * @param maxIter fixed iteration count (k-means converges
    *        monotonically in SSE; specs assert the decrease) */
  def fit(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, maxIter: Int): (DataFrame, DataFrame) = {
    val v = vectors.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    // deterministic seeding: the k smallest ids (TakeOrderedAndProject —
    // no shuffle of the full corpus, no unpartitioned window)
    var cents = v.orderBy("id").limit(k)
      .select(col("id").as("cid"), col("v").as("cv"))
      .localCheckpoint()
    var assigned: DataFrame = assign(v, cents)
    var iter = 0
    while (iter < maxIter) {
      // update: per-(cid, dim) mean, rebuilt into float arrays — the
      // shuffle carries scalar components keyed by (cid, dim). A cluster
      // that lost every point has no mean rows; it KEEPS its previous
      // position (the standard empty-cluster rule) rather than silently
      // shrinking k — the left join + coalesce below restores it.
      // decimal accumulation: double addition is order-sensitive and a
      // shuffled aggregate merges in nondeterministic order — decimal
      // sums are associative, so the trained centroids really are
      // identical across reruns/retries (same convention as the
      // engine's other double-summing aggregates)
      val means = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cid", "dim")
        .agg(avg(col("x").cast("decimal(38,15)")).cast("double").as("m"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(dim, m)))," +
          " e -> cast(e.m as float))").as("new_cv"))
      cents = cents.join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("new_cv"), col("cv")).as("cv"))
        .localCheckpoint()
      assigned = assign(v, cents)
      iter += 1
    }
    (cents, assigned)
  }

  /** Nearest-centroid assignment: argmin squared-L2, tie-broken by cid —
    * `min(struct(dist, cid))` is a plain aggregate, so partial (map-side)
    * aggregation applies and nothing but (id, v) rows reach the shuffle. */
  def assign(v: DataFrame, cents: DataFrame): DataFrame =
    v.crossJoin(broadcast(cents))
      .select(col("id"), col("v"),
        struct(L2Distance(col("v"), col("cv")).as("d"), col("cid")).as("dc"))
      .groupBy("id")
      .agg(min(col("dc")).as("m"), first(col("v")).as("v"))
      .select(col("id"), col("v"), col("m.cid").as("cid"))

  /** Within-cluster sum of squared distances — the Lloyd objective;
    * exposed so convergence is observable (specs assert monotone
    * decrease over iterations). */
  def sse(assigned: DataFrame, cents: DataFrame): Double =
    assigned.join(broadcast(cents), "cid")
      .select(pow(L2Distance(col("v"), col("cv")), 2).as("d2"))
      .agg(coalesce(sum("d2"), lit(0.0))).collect()(0).getDouble(0)

  /** Multi-probe IVF top-k: each query scores ONLY the vectors assigned
    * to its `nprobe` nearest centroids. nprobe = k ⇒ every bucket is
    * probed and the result is EXACTLY brute force (the oracle-checked
    * configuration); nprobe < k trades recall for a corpus-scan
    * reduction of ~nprobe/k (the production configuration — recall
    * measured in specs).
    *
    * @param corpusAssigned (id, v, cid) from [[fit]]
    * @param queries        (query_id, qv) — small, broadcast side
    */
  def ivfTopK(corpusAssigned: DataFrame, cents: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    // per-query nprobe nearest centroids via the bounded-heap aggregate
    // (k-row side; the TopKAgg keeps the plan window-free)
    val probes = queries.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"),
        negate(L2Distance(col("qv"), col("cv"))).as("negd"), col("cid"))
      .groupBy("query_id")
      .agg(TopKAgg(col("negd"), col("cid"), nprobe).as("top"),
        first(col("qv")).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(expr("transform(top, e -> e.payload)")).as("cid"))
    corpusAssigned.join(broadcast(probes), "cid")
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(CosineSim(col("qv"), col("v")), 6).as("cosine"))
      .transform(Similarity.topKPerQuery(_, k))
  }
}
