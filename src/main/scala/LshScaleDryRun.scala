import org.apache.spark.sql.SparkSession

/** Round-10 LSH-dedup scale dry run: candidate-pair count, verified
  * near-dup pair count, bucket-overflow status, and wall time across
  * sf0.001 → sf0.01 → sf0.1 (each 10× the previous, same generator
  * distribution — so the duplicate-rate profile scales naturally,
  * unlike a copy-blowup corpus whose every doc gains 10 artificial
  * near-dups).
  *
  * Expectations (the bucketed-not-all-pairs claim, measured):
  *   - candidate pairs grow NEAR-LINEARLY with corpus size (bucket
  *     membership tracks duplicate density, not corpus²);
  *   - zero overflowed buckets at every SF — proven by running the
  *     exact catalog configuration `failOnOverflow=true`
  *     ([[graft.operators.Dedup.minhashCandidates]]'s in-plan assert):
  *     completion IS the zero-overflow certificate, and the cap
  *     engaging would fail loudly here rather than skew the curve;
  *   - wall time tracks corpus size (the only shuffle is
  *     (band, key, id) triples), not pairs².
  * Prints one LSHROW per SF for SCALE.md. */
object LshScaleDryRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (n, k, bands, seed) = (graft.TextQueries.ShingleN, 128, 32, 42L)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val nDocs = docs.count()
      // candidates: banding only (the pair stream the verifier scans)
      val t0 = System.nanoTime()
      val cands = graft.operators.Dedup.minhashCandidates(
        docs, "doc_id", "text", n, k, bands, seed,
        metricName = s"lsh_dry_$sf", failOnOverflow = true).count()
      val tCand = (System.nanoTime() - t0) / 1e9
      // full verified pairs at the catalog operating point (jaccard>=0.5)
      val t1 = System.nanoTime()
      val pairs = graft.operators.Dedup.minhashLshPairs(
        docs, "doc_id", "text", n, graft.TextQueries.MinJaccard, k, bands,
        seed, metricName = s"lsh_dry_v_$sf", failOnOverflow = true).count()
      val tPairs = (System.nanoTime() - t1) / 1e9
      println(f"LSHROW sf=$sf docs=$nDocs candidates=$cands " +
        f"verified_pairs=$pairs overflowed=0(proven) " +
        f"cand_s=$tCand%.2f pairs_s=$tPairs%.2f")
    }
    spark.stop()
  }
}
