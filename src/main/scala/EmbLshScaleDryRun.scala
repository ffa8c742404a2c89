import org.apache.spark.sql.SparkSession

/** Round-13 embedding-LSH scale probe: is q_ann_lsh_pairs' sf1 wall
  * (26x on 10x vectors in the full-catalog sweep) a plan pathology or
  * candidate-volume growth inherent to the replicated corpus?
  *
  * The sf1 embeddings are 10 jittered replicas per original vector
  * (±0.005 per component — SCALE.md round-5 recipe). A jitter that
  * small rarely flips a hyperplane sign bit, so all 10 replicas of a
  * vector share most of their 16 table signatures BY CONSTRUCTION:
  * within-bucket membership grows ~10x where the corpus is
  * self-similar, and bucket pairs grow ~quadratically in that factor.
  * This probe counts the candidate stream at each scale so the wall
  * ratio can be judged against the work ratio, not the row ratio.
  *
  * Usage: runMain EmbLshScaleDryRun <dir> [dir2 ...]
  */
object EmbLshScaleDryRun {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val explain = sys.env.contains("EMBLSH_EXPLAIN")
    import graft.VectorQueries.{RpBits, RpTables, RpSeed, TopPairs}
    for (dir <- dirs) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val t0 = System.nanoTime()
      val candsDf = graft.operators.Similarity.lshCandidates(
        emb, "vec_id", "embedding", RpBits, RpTables, RpSeed)
      if (explain) candsDf.explain("formatted")
      val cands = candsDf.count()
      val tCand = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      graft.operators.Similarity.lshTopKPairs(
        emb, "vec_id", "embedding", TopPairs, RpBits, RpTables, RpSeed)
        .queryExecution.toRdd.count()
      val tPairs = (System.nanoTime() - t1) / 1e9
      println(f"EMBLSHROW dir=$dir vectors=$n candidates=$cands " +
        f"cand_per_vec=${cands.toDouble / n}%.1f " +
        f"cand_s=$tCand%.2f pairs_s=$tPairs%.2f")
    }
    spark.stop()
  }
}
