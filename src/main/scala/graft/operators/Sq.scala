package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.{CosineSim, DotProduct, Sq8Dot, Sq8Encode}

/** SQ8 scalar-quantization ANN — the 4×-compression leg of the
  * similarity-search family, between brute force (exact, 1×) and PQ
  * (32×, trained): each float32 dimension quantizes independently onto
  * a 256-step linear grid between the corpus's per-dimension min and
  * max. FAISS ships this shape as `IndexScalarQuantizer(QT_8bit)`;
  * rebuilt Spark-first here.
  *
  * What makes SQ8 special in this catalog: the "training" is just two
  * exact float aggregates (per-dim min/max), and encode / reconstruct /
  * score are plain IEEE arithmetic — so the ENTIRE approximate search,
  * approximation included, is replayable in SQL and the catalog entry
  * `q_ann_sq8_topk` is hash-checked end to end. PQ and LSH carry
  * rows-only status because their kernels bake trained floats; SQ8 is
  * the approximate-ANN path where the oracle can follow all the way.
  *
  * Search = the [[Pq.pqTopK]] shape: codes-only approximate scoring
  * (asymmetric — exact query floats against dequantized corpus codes),
  * a bounded-heap shortlist, then an exact-cosine rescore at candidate
  * cardinality. Emitted cosines are EXACT; quantization can only cost
  * recall (spec-measured; ≈1 at dim 64 because SQ8's per-dim error is
  * tiny — recall is the operating appeal over PQ's 32× at a 4× budget).
  *
  * Scale: the min/max fit is one posexplode aggregate whose map-side
  * combine carries ≤ dim rows per task; encode is a codegen projection
  * inside the corpus scan (no shuffle); the scoring join reads
  * (id, codes, norm) only — dim·8-byte code arrays in this LongType
  * layout, dim bytes once packed — and the full vectors are touched
  * again only for the shortlist rescore.
  */
object Sq {

  /** The per-dimension quantization grid: corpus min/max, floats,
    * exact. Model-scale (dim entries) like [[KMeans]]' centroid
    * matrix. */
  final case class Grid(mn: Array[Float], mx: Array[Float])

  /** Fit the grid: one exploded (dim, min, max) aggregate. */
  def fitGrid(corpus: DataFrame, vecCol: String): Grid = {
    val rows = corpus
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy("dim").agg(min("x").as("mn"), max("x").as("mx"))
      .collect().sortBy(_.getInt(0))
    require(rows.nonEmpty, "Sq.fitGrid: empty corpus")
    Grid(rows.map(_.getFloat(1)), rows.map(_.getFloat(2)))
  }

  /** In-plan encode against a fitted grid. */
  def encodeCol(vec: Column, g: Grid): Column = Sq8Encode(vec, g.mn, g.mx)

  /** SQ8 approximate top-k with exact rescore.
    *
    * @param shortlist approximate candidates carried to the exact
    *        rescore; SQ8's shortlist ranking is near-exact, so modest
    *        multiples of k suffice (spec-measured) */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, g: Grid, k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"Sq.sq8TopK: shortlist $shortlist < k $k")
    def norm(c: Column): Column = sqrt(DotProduct(c, c))
    val enc = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      encodeCol(col(vecCol), g).as("codes"),
      norm(col(vecCol)).as("vnorm"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("qnorm"))
    // codes-only scoring pass; rounded to the catalog's 1e-6 ranking
    // grain so shortlist rank ties are cross-engine stable
    val approx = enc.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        when(col("qnorm") * col("vnorm") === 0d, 0d)
          .otherwise(round(Sq8Dot(col("codes"), col("qv"), g.mn, g.mx) /
            (col("qnorm") * col("vnorm")), 6)).as("cosine"))
    val cands = Similarity.topKPerQuery(approx, shortlist)
      .select("query_id", "neighbor_id")
    // exact rescore at candidate cardinality — emitted cosines are EXACT
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
}
