import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 persisted-IVF-index scale dry run: index build cost, probe
  * cost from disk at the catalog operating point (nprobe=2 of k=8),
  * and the same probe at nprobe=k (full scan through the index) —
  * across sf0.01, sf0.1, and a 10×-replicated sf0.1 (50k vectors;
  * same distribution, ids shifted per replica so bucket sizes scale
  * 10× honestly).
  *
  * Expectations (the probed-fraction claim, measured):
  *   - BUILD wall grows ~linearly with corpus size (Lloyd is
  *     zero-corpus-shuffle: the per-iteration exchange carries only
  *     (cid, dim) partial sums);
  *   - PROBE wall is governed by the probed fraction: nprobe=2 scans
  *     ~2/8 of the inverted lists (reported as probed_frac — rows in
  *     probed buckets / (queries × corpus)), and stays well under the
  *     nprobe=k cost at every scale;
  *   - probe cost from DISK tracks the probed fraction as the corpus
  *     grows 10× — the partition-pruned directories are what make the
  *     persisted index pay at 100 TB.
  * Prints one IVFROW per case for SCALE.md. */
object IvfScaleDryRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (k, iters, topK, nq) =
      (graft.VectorQueries.IvfClusters, graft.VectorQueries.IvfIters,
        graft.VectorQueries.TopK, graft.VectorQueries.NQueries)
    def emb(sf: String) =
      spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
    def rep(times: Int) = (0 until times).map(i => emb("sf0.1")
        .withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
      .reduce(_ union _)
    val cases = Seq(
      "sf0.01" -> emb("sf0.01"),
      "sf0.1" -> emb("sf0.1"),
      "sf0.1x10" -> rep(10),
      "sf0.1x100" -> rep(100))
    for ((label, vectors) <- cases) {
      val n = vectors.count()
      val path = s"/tmp/graft_ivf_dry_$label"
      val t0 = System.nanoTime()
      val (cents, assigned) = graft.operators.KMeans.fit(
        vectors, "vec_id", "embedding", k, iters)
      graft.operators.KMeans.saveIndex(cents, assigned, path)
      val buildS = (System.nanoTime() - t0) / 1e9
      val (lc, la) = graft.operators.KMeans.loadIndex(spark, path)
      val q = vectors.filter(col("vec_id") < nq)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      def probe(np: Int): Double = {
        val t = System.nanoTime()
        graft.operators.KMeans.ivfTopK(la, lc, q, topK, nprobe = np).count()
        (System.nanoTime() - t) / 1e9
      }
      probe(2) // warm the load path once so both timed probes are equal-footing
      val probe2S = probe(2)
      val probeFullS = probe(k)
      // probed fraction: rows in the nprobe=2 buckets over queries×corpus
      val bucketRows = la.groupBy("cid").count()
      val probes = q.crossJoin(broadcast(lc))
        .select(col("query_id"),
          negate(graft.expr.L2Distance(col("qv"), col("cv"))).as("negd"),
          col("cid"))
        .groupBy("query_id")
        .agg(graft.expr.TopKAgg(col("negd"), col("cid"), 2).as("top"))
        .select(col("query_id"),
          explode(expr("transform(top, e -> e.payload)")).as("cid"))
      val probedRows = probes.join(bucketRows, "cid")
        .agg(sum("count")).head.getLong(0)
      val frac = probedRows.toDouble / (q.count() * n)
      println(f"IVFROW case=$label vectors=$n build_s=$buildS%.2f " +
        f"probe2_s=$probe2S%.2f probefull_s=$probeFullS%.2f " +
        f"probed_frac=$frac%.3f")
    }
    spark.stop()
  }
}
