package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.{CosineSim, DotProduct, L2Distance, NearestCentroidId, PqAdc, PqLut, TopKAgg}

/** Product quantization for ANN at memory scale (Jégou et al., TPAMI
  * 2011) — the compression leg of the similarity-search family: a
  * `dim`-float vector (dim·4 bytes) becomes `m` sub-codes (m bytes at
  * ksub ≤ 256), a 32× shrink at the catalog's dim=64/m=8
  * configuration, so the searchable index of a 100 TB embedding corpus
  * fits a cluster's memory where raw vectors would not.
  *
  * Design, stage by stage:
  *  - TRAIN ([[train]]): per-subspace k-means codebooks fitted
  *    DRIVER-LOCALLY on a deterministic sample (the `sampleN` smallest
  *    ids — FAISS trains codebooks on samples for the same reason:
  *    codebook quality saturates long before corpus scale, and the
  *    model is m·ksub·dsub floats). Lloyd here is the same
  *    deterministic recipe as [[KMeans.fit]]: smallest-id seeds,
  *    first-wins ties, empty cluster keeps its position, fixed
  *    iteration count — retrains are bit-identical.
  *  - ENCODE ([[encodeCol]]): in-plan, codegen — one
  *    [[graft.expr.NearestCentroidId]] per subspace over `slice`d
  *    subvectors; no shuffle, no UDF.
  *  - SEARCH ([[pqTopK]]): queries gain an in-plan ADC lookup table
  *    ([[graft.expr.PqLut]]); the broadcast query×corpus scoring pass
  *    reads ONLY codes + one stored norm per vector ([[graft.expr
  *    .PqAdc]] ≈ dot(q, v)), a bounded [[graft.expr.TopKAgg]] heap
  *    keeps a per-query shortlist, and the shortlist is EXACT-rescored
  *    (true cosine) by joining the raw vectors back at CANDIDATE
  *    cardinality — the only stage that touches a full vector after
  *    encode. Approximation error can only cost recall (spec-measured
  *    against the exact twin), never a wrong score: every emitted
  *    cosine is exact.
  */
object Pq {

  /** Trained per-subspace codebooks: `books(b)(c)` is the `dsub`-float
    * centroid `c` of block `b`. */
  final case class Codebooks(m: Int, dsub: Int, ksub: Int,
      books: Array[Array[Array[Float]]])

  /** Fit codebooks on the `sampleN` smallest-id vectors (deterministic
    * sample; TakeOrderedAndProject — no corpus shuffle). */
  def train(vectors: DataFrame, idCol: String, vecCol: String, m: Int,
      ksub: Int, sampleN: Int = 2048, iters: Int = 8): Codebooks = {
    require(m > 0 && ksub > 1, s"Pq.train: bad m=$m ksub=$ksub")
    val rows = vectors
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .orderBy("id").limit(sampleN).collect()
    require(rows.nonEmpty, "Pq.train: empty corpus")
    val sample = rows.map(_.getSeq[Float](1).toArray)
    val dim = sample.head.length
    require(dim % m == 0, s"Pq.train: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val books = Array.tabulate(m) { b =>
      val subs = sample.map(v =>
        java.util.Arrays.copyOfRange(v, b * dsub, (b + 1) * dsub))
      lloydLocal(subs, math.min(ksub, subs.length), iters)
    }
    Codebooks(m, dsub, books(0).length, books)
  }

  /** Driver-local Lloyd over a sampled subspace — deterministic by the
    * same rules as [[KMeans.fit]] (order-stable seeds and ties). */
  private def lloydLocal(xs: Array[Array[Float]], k: Int,
      iters: Int): Array[Array[Float]] = {
    val d = xs.head.length
    var cents = xs.take(k).map(_.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Long](k)
      xs.foreach { x =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var s = 0.0; var i = 0
          while (i < d) {
            val df = x(i).toDouble - cents(c)(i); s += df * df; i += 1
          }
          if (s < bestD) { bestD = s; best = c } // first-wins ties
          c += 1
        }
        var i = 0
        while (i < d) { sums(best)(i) += x(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c) // empty cluster keeps its position
        else Array.tabulate(d)(i => (sums(c)(i) / counts(c)).toFloat)
      }
      it += 1
    }
    cents
  }

  /** In-plan PQ encode: `array<bigint>` of `m` sub-codes — one codegen
    * nearest-centroid kernel per subspace over `slice`d subvectors. */
  def encodeCol(vec: Column, cb: Codebooks): Column =
    array((0 until cb.m).map { b =>
      NearestCentroidId(slice(vec, b * cb.dsub + 1, cb.dsub),
        (0L until cb.ksub.toLong).toArray, cb.books(b))
    }: _*)

  /** ADC-shortlisted, exact-rescored cosine top-k.
    *
    * @param shortlist per-query ADC candidates carried to the exact
    *        rescore (recall grows with it; `8·k` is the spec'd
    *        operating point on the synthetic corpus) */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, cb: Codebooks, k: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, s"Pq.pqTopK: shortlist $shortlist < k $k")
    def norm(c: Column): Column = sqrt(DotProduct(c, c))
    val enc = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      encodeCol(col(vecCol), cb).as("codes"),
      norm(col(vecCol)).as("vnorm"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      PqLut(col(vecCol), cb.books).as("lut"),
      norm(col(vecCol)).as("qnorm"))
    // codes-only scoring pass: the broadcast carries luts, the corpus
    // side carries m codes + one norm — no full vector in flight
    // the approx cosine rounds to 1e-6 BEFORE shortlist ranking — the
    // same cross-engine tie discipline as the exact rescore (and SQ8):
    // shortlist membership then never hinges on a final-ulp ordering
    // a SQL mirror could disagree on
    val approx = enc.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        when(col("qnorm") * col("vnorm") === 0d, 0d)
          .otherwise(round(PqAdc(col("codes"), col("lut"), cb.ksub) /
            (col("qnorm") * col("vnorm")), 6)).as("cosine"))
    val cands = Similarity.topKPerQuery(approx, shortlist)
      .select("query_id", "neighbor_id")
    // exact rescore at candidate cardinality — emitted cosines are
    // EXACT; PQ error affects recall only
    val scored = cands
      .join(corpus.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("cv")), "neighbor_id")
      .join(broadcast(queries.select(
        col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(CosineSim(col("qv"), col("cv")), 6).as("cosine"))
    Similarity.topKPerQuery(scored, k)
  }

  /** Fit codebooks on RESIDUALS against a trained coarse quantizer —
    * the IVF-PQ training leg (Jégou et al. §V: quantizing v − c(v)
    * instead of v concentrates the sub-distributions, so the same m·ksub
    * budget spends its resolution inside a cell instead of across the
    * whole space). The sample rule ([[train]]'s smallest-id rows), the
    * driver-local argmin (strict-<, cid-ascending first-wins — the same
    * tie rule as [[graft.expr.NearestCentroidId]]), and Lloyd are all
    * deterministic, so retrains are bit-identical.
    *
    * @param cents (cid, cv) from [[KMeans.fit]] */
  def trainResidual(vectors: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, m: Int, ksub: Int, sampleN: Int = 2048,
      iters: Int = 8): Codebooks = {
    require(m > 0 && ksub > 1, s"Pq.trainResidual: bad m=$m ksub=$ksub")
    val matrix = cents.select(col("cid").cast("long"), col("cv"))
      .collect().sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).toArray)
    require(matrix.nonEmpty, "Pq.trainResidual: empty centroid frame")
    val rows = vectors
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .orderBy("id").limit(sampleN).collect()
    require(rows.nonEmpty, "Pq.trainResidual: empty corpus")
    val sample = rows.map(_.getSeq[Float](1).toArray)
    val dim = sample.head.length
    require(dim % m == 0, s"Pq.trainResidual: dim $dim not divisible by m=$m")
    require(matrix.forall(_.length == dim),
      s"Pq.trainResidual: centroid dim != corpus dim $dim")
    val dsub = dim / m
    val residuals = sample.map { x =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < matrix.length) {
        var s = 0.0; var i = 0
        while (i < dim) {
          val d = x(i).toDouble - matrix(c)(i).toDouble; s += d * d; i += 1
        }
        if (s < bestD) { bestD = s; best = c } // first-wins ties
        c += 1
      }
      Array.tabulate(dim)(i => x(i) - matrix(best)(i))
    }
    val books = Array.tabulate(m) { b =>
      val subs = residuals.map(v =>
        java.util.Arrays.copyOfRange(v, b * dsub, (b + 1) * dsub))
      lloydLocal(subs, math.min(ksub, subs.length), iters)
    }
    Codebooks(m, dsub, books(0).length, books)
  }

  /** IVF-PQ multi-probe search — the composed 100 TB ANN architecture
    * (FAISS's IndexIVFPQ shape, rebuilt Spark-first): the coarse
    * quantizer prunes the corpus to `nprobe` cells, PQ codes score the
    * survivors without touching a full vector, and the shortlist is
    * exact-rescored. Per query the scan cost is ~(nprobe/k_cells)·m
    * bytes per corpus vector — the multiplicative combination of IVF's
    * probe pruning and PQ's 32× compression, which is why this (not
    * either alone) is what a production-scale index runs.
    *
    * Inner-product decomposition keeps the LUT cell-independent:
    * dot(q, v) = dot(q, c(v)) + dot(q, r(v)), so ONE [[graft.expr
    * .PqLut]] per query covers every probed cell, the exact
    * dot(q, c) term comes from the k-row broadcast centroid frame, and
    * only the residual term is approximated (by [[graft.expr.PqAdc]]
    * over residual-trained codebooks — [[trainResidual]]). The
    * cosine's norms are stored exactly at encode time; as in
    * [[pqTopK]], approximation can only cost recall (spec-measured),
    * never a wrong score — every emitted cosine is exact-rescored.
    *
    * Plan shape: the probe side (queries × nprobe rows, each with one
    * LUT + one dot + one norm) broadcasts; the corpus side reads
    * (cid, codes, vnorm) only — the join is an equi-join on cid, so
    * with a cid-partitioned persisted index ([[KMeans.saveIndex]])
    * partition pruning drops the unprobed cells at planning time.
    *
    * @param corpusAssigned (id, v, cid) from [[KMeans.fit]]/`assign`
    * @param queries        (query_id, qv) — small, broadcast side
    * @param cb             residual codebooks ([[trainResidual]])
    */
  def ivfPqTopK(corpusAssigned: DataFrame, cents: DataFrame,
      queries: DataFrame, cb: Codebooks, k: Int, nprobe: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, s"Pq.ivfPqTopK: shortlist $shortlist < k $k")
    require(nprobe >= 1, s"Pq.ivfPqTopK: nprobe must be >= 1, got $nprobe")
    def norm(c: Column): Column = sqrt(DotProduct(c, c))
    // corpus index: m residual codes + one stored norm per vector — the
    // last full-vector read before the rescore. float−float stays
    // single-precision on both the driver (trainResidual) and in-plan.
    val resid = zip_with(col("v"), col("cv"),
      (a: Column, b: Column) => (a - b).cast("float"))
    val enc = corpusAssigned.join(broadcast(cents), "cid")
      .select(col("cid"), col("id").as("neighbor_id"),
        encodeCol(resid, cb).as("codes"), norm(col("v")).as("vnorm"))
    // per-query nprobe nearest cells (bounded heap — window-free), then
    // one LUT + exact dot(q, c) + norm per (query, cell) probe row
    val probes = queries.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"),
        negate(L2Distance(col("qv"), col("cv"))).as("negd"), col("cid"))
      .groupBy("query_id")
      .agg(TopKAgg(col("negd"), col("cid"), nprobe).as("top"),
        first(col("qv")).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(expr("transform(top, e -> e.payload)")).as("cid"))
      .join(broadcast(cents), "cid")
      .select(col("cid"), col("query_id"),
        PqLut(col("qv"), cb.books).as("lut"),
        DotProduct(col("qv"), col("cv")).as("qdotc"),
        norm(col("qv")).as("qnorm"))
    // 1e-6-rounded approx before shortlist ranking (see [[pqTopK]])
    val approx = enc.join(broadcast(probes), "cid")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        when(col("qnorm") * col("vnorm") === 0d, 0d)
          .otherwise(round(
            (col("qdotc") + PqAdc(col("codes"), col("lut"), cb.ksub)) /
              (col("qnorm") * col("vnorm")), 6)).as("cosine"))
    val cands = Similarity.topKPerQuery(approx, shortlist)
      .select("query_id", "neighbor_id")
    // exact rescore at candidate cardinality — emitted cosines are EXACT
    val scored = cands
      .join(corpusAssigned.select(col("id").as("neighbor_id"),
        col("v").as("cv2")), "neighbor_id")
      .join(broadcast(queries.select(col("query_id"), col("qv"))),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(CosineSim(col("qv"), col("cv2")), 6).as("cosine"))
    Similarity.topKPerQuery(scored, k)
  }
}
