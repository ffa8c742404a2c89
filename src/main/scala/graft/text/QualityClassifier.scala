package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.Fingerprint64

/** Trained DOCUMENT-QUALITY CLASSIFIER — the curation stage every
  * production pre-training pipeline runs after the rule-based filters
  * (CCNet's wiki-reference classifier, LLaMA's "looks like a
  * reference" filter, GPT-3's WebText classifier — all public): a
  * linear model over HASHED bag-of-tokens features, trained in the
  * engine and applied in-plan.
  *
  * Model: logistic regression on `dim` feature buckets,
  * `bucket(tok) = fnv1a64(tok) mod dim` (the engine's token hash —
  * SQL-mirrorable), `x_b = count_b / n_tokens` (term frequency).
  * Training is full-batch gradient descent with DECIMAL-EXACT gradient
  * aggregation (the moments-family discipline: each per-row
  * contribution casts to DECIMAL(38,15) before the sum, so the
  * gradient — and therefore the trained weights — are bit-identical
  * at ANY partitioning; spec-asserted across repartitionings).
  * Per-iteration cost: two shuffles at (doc, bucket) sparse-feature
  * cardinality — never a dense matrix, never a vector collect; the
  * model itself is `dim` doubles on the driver (model-scale, like the
  * k-means centroids).
  *
  * Scoring emits the exact margin (decimal-summed dot product — the
  * value the DuckDB oracle reproduces bit-for-bit from the exported
  * weights), the sigmoid score rounded to 1e-6 (the one
  * libm-dependent output, per the engine's determinism note), and
  * `keep = margin > 0` — classification decisions come from the EXACT
  * margin, never the rounded libm value. */
object QualityClassifier {

  final case class Model(dim: Int, bias: Double, w: Array[Double])

  /** Sparse hashed features: one row per (doc, bucket) with the
    * tf value `x = count / n_tokens`. */
  private def features(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), size(toks).as("n"),
        explode(toks).as("tok"))
      .select(col("id"), col("n"),
        pmod(Fingerprint64(col("tok")), lit(dim.toLong)).as("bucket"))
      .groupBy("id", "bucket")
      .agg(first(col("n")).as("n"), count(lit(1)).as("cnt"))
      .select(col("id"), col("bucket"),
        (col("cnt").cast("double") / col("n")).as("x"))
  }

  private def weightsDf(spark: SparkSession, w: Array[Double]): DataFrame = {
    import spark.implicits._
    w.zipWithIndex.map { case (v, b) => (b.toLong, v) }
      .toSeq.toDF("bucket", "wv")
  }

  /** Decimal-exact partition-order-independent sum of a double term
    * (the moments discipline). The per-row cast targets DECIMAL(18,15)
    * — scale 15 rounds each term identically to the oracle's
    * DECIMAL(38,15) mirror, but precision 18 keeps every row in
    * Spark's COMPACT long-backed Decimal representation (no BigDecimal
    * allocation per row; the sum's fast add path engages while partial
    * sums stay under ~9.2e3, which classifier-scale terms do).
    *
    * SAFETY: a term with |value| ≥ 1000 NULLs under the narrow
    * precision and Spark's sum() silently SKIPS nulls — a PARTIAL
    * overflow would drop terms and produce wrong weights with no
    * error. So the sum rides with an overflow counter and an in-plan
    * assert_true that fires on the FIRST overflowed term, whether or
    * not the whole group overflowed. */
  private def exactSum(term: Column): Column = {
    val dec = term.cast("decimal(18,15)")
    val ovf = sum(when(term.isNotNull && dec.isNull, 1L).otherwise(0L))
    when(assert_true(ovf === 0, lit(
      "QualityClassifier exact sum: a |term| >= 1000 overflowed " +
        "DECIMAL(18,15) — the model diverged; lower lr")).isNull,
      sum(dec).cast("double"))
  }

  /** Full-batch gradient descent. `labelCol` must be 0.0/1.0 doubles;
    * null-text rows are excluded from training (they carry no
    * features). */
  def train(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int = 256, iters: Int = 8,
      lr: Double = 4.0): Model = {
    val spark = docs.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val labels0 = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(labelCol).cast("double").as("y"))
    // The bias RIDES AS BUCKET −1 with x = 1.0 (every labeled doc has
    // one): the per-bucket gradient aggregation then delivers the bias
    // gradient in the SAME job — exactSum(r · 1.0) ≡ exactSum(r)
    // bit-for-bit — halving the per-iteration action count. Weights
    // never carry bucket −1, so the margin's inner join drops the
    // bias rows and the dot product is unchanged.
    //
    // Both cached frames are HASH-PARTITIONED BY id up front: the
    // per-iteration groupBy("id") and both id-joins reuse the cached
    // partitioning, so an iteration's only exchange is the 256-row
    // bucket-gradient rollup — at corpus scale the training loop
    // re-shuffles the sparse features ZERO times after the first
    // materialization.
    // PINNED partition count (r16 optimization round): with the
    // session's cached-plan AQE flag on, an unpinned repartition(col)
    // lets AQE coalesce this cache by bytes — but the training loop's
    // per-iteration cost is CPU over the sparse features, not bytes,
    // and the coalesce serialized the gradient work (cold lane
    // 6.3 -> 7.5 s at sf0.1). An explicit count is never resized, so
    // the cache keeps both its id-clustering AND its core-wide
    // parallelism — the same work-count-not-byte-count rule as the
    // r13 codec kernels.
    val trainParts = docs.sparkSession.sparkContext.defaultParallelism
    val feats = features(docs, idCol, textCol, dim)
      .unionByName(labels0.select(col("id"), lit(-1L).as("bucket"),
        lit(1.0).as("x")))
      .repartition(trainParts, col("id"))
      .persist(lvl)
    val labels = labels0.repartition(trainParts, col("id")).persist(lvl)
    try {
      val nDocs = labels.count().toDouble
      require(nDocs > 0, "QualityClassifier.train: empty corpus")
      var w = new Array[Double](dim)
      var bias = 0.0
      var it = 0
      while (it < iters) {
        val wdf = weightsDf(spark, w)
        // margin per doc: decimal-exact sparse dot product + bias
        val margins = feats.join(broadcast(wdf), "bucket")
          .groupBy("id")
          .agg(exactSum(col("x") * col("wv")).as("dot"))
          .select(col("id"), (col("dot") + lit(bias)).as("m"))
        // residual p − y per doc (sigmoid is per-row deterministic);
        // docs whose every bucket has weight 0 still join (dense w)
        val resid = labels.join(margins, Seq("id"), "left")
          .select(col("id"),
            (lit(1.0) / (lit(1.0) + exp(-coalesce(col("m"), lit(bias))))
              - col("y")).as("r"))
        // gradient per bucket — slot −1 IS the bias gradient — in one
        // decimal-exact job
        val grad = feats.join(resid, "id")
          .groupBy("bucket").agg(exactSum(col("r") * col("x")).as("g"))
          .collect().map { r =>
            require(!r.isNullAt(1),
              s"QualityClassifier.train: gradient overflowed the exact " +
                s"sum's DECIMAL(18,15) term range at bucket " +
                s"${r.getLong(0)} — a |r·x| ≥ 1000 term means the model " +
                "diverged; lower lr")
            r.getLong(0).toInt -> r.getDouble(1)
          }.toMap
        w = Array.tabulate(dim)(b =>
          w(b) - lr * grad.getOrElse(b, 0.0) / nDocs)
        bias = bias - lr * grad.getOrElse(-1, 0.0) / nDocs
        it += 1
      }
      Model(dim, bias, w)
    } finally {
      feats.unpersist(blocking = false)
      labels.unpersist(blocking = false)
    }
  }

  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, Model]()

  /** Drop every cached model. The bench's COLD-TRAIN lane calls this
    * before each timed run so first-train cost is a tracked, era-gated
    * metric of its own — without it, min-of-N reports only the warm
    * serve path and a training-kernel regression cannot flag (the
    * round-14 verdict's protocol hole). */
  def clearModelCache(): Unit = modelCache.clear()

  /** TRAIN-ONCE MODEL REGISTRY (round 14): returns the process-cached
    * model when the same corpus and hyperparameters were already
    * trained — training is deterministic (bit-identical weights at any
    * partitioning, spec-asserted), so a cache hit IS the retrain minus
    * the cost. This is the production shape the streaming entry
    * already documents ("train batch-side, freeze, score arrivals"):
    * one pipeline trains, every downstream consumer serves the frozen
    * weights. The key covers the label/feature DERIVATION (the
    * canonicalized logical plan — two callers with different label
    * logic never collide) plus the scanned files' identity (path,
    * size, mtime — a regenerated corpus retrains). */
  def trainCached(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int = 256, iters: Int = 8,
      lr: Double = 4.0): Model = {
    val conf = docs.sparkSession.sessionState.newHadoopConf()
    val files = docs.inputFiles.sorted.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }
    // the verbatim strings ARE the key (no hash — a collision would
    // silently serve a wrong model); entry count stays tiny. Parts are
    // LENGTH-PREFIXED and joined on an ESCAPED control char — a raw
    // separator byte in source made grep treat this file as binary and
    // silently drop it from every text sweep (r15 hygiene finding);
    // the length prefix keeps the key collision-proof even if a part
    // ever contained the separator itself.
    val key = Seq(docs.queryExecution.logical.canonicalized.toString,
      files.mkString("|"), idCol, textCol, labelCol,
      dim.toString, iters.toString, lr.toString)
      .map(part => s"${part.length}:$part").mkString("\u0001")
    modelCache.computeIfAbsent(key,
      _ => train(docs, idCol, textCol, labelCol, dim, iters, lr))
  }

  /** In-plan scoring: (id, margin, score, keep). The margin is the
    * decimal-exact sparse dot + bias (oracle-reproducible); `keep`
    * decides on the exact margin. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = docs.sparkSession
    val feats = features(docs, idCol, textCol, model.dim)
    val wdf = weightsDf(spark, model.w)
    feats.join(broadcast(wdf), "bucket")
      .groupBy("id")
      .agg(exactSum(col("x") * col("wv")).as("dot"))
      .select(col("id").as(idCol),
        (col("dot") + lit(model.bias)).as("margin"))
      .withColumn("score",
        round(lit(1.0) / (lit(1.0) + exp(-col("margin"))), 6))
      .withColumn("keep", col("margin") > 0)
  }

  /** Export the trained model as (bucket, wv) parquet — bias rides as
    * bucket −1 — the oracle's view of the model (the PQ-codebook
    * convention). */
  def exportModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    ((-1L, model.bias) +: model.w.zipWithIndex.toSeq
      .map { case (v, b) => (b.toLong, v) })
      .toDF("bucket", "wv").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }
}
