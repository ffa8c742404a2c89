import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 probe: where do the two biggest sf1 line items spend their
  * wall — `q_semantic_dedup` (30.2 s r13) and `q_quality_classifier`
  * (30.4 s r13)? Stage-sliced timings at sf0.1 and sf1 so the fix (or
  * the arithmetic-floor proof) rests on measurements, not guesses.
  *
  * Usage: runMain SemQcDryRun <dir> [dir2 ...]
  */
object SemQcDryRun {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"    $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    for (dir <- dirs) {
      println(s"== $dir ==")
      // ---- semantic dedup, stage by stage (mirrors Similarity
      // .semanticDedup's structure) ----
      locally {
        import graft.VectorQueries.{SemK, SemIters, MinDupCosine}
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        println(s"  semantic_dedup over ${emb.count()} vectors")
        val lazyAssigned = t("kmeans fit (lazy)") {
          graft.operators.KMeans.fit(emb.select(
            col("vec_id"), col("embedding")), "vec_id", "embedding",
            SemK, SemIters)._2
        }
        val assigned = t("assign + localCheckpoint") {
          lazyAssigned.localCheckpoint()
        }
        val a = assigned.select(col("cid"), col("id").as("vec_a"),
          col("v").as("va"))
        val b = assigned.select(col("cid"), col("id").as("vec_b"),
          col("v").as("vb"))
        val pairs = a.join(b, "cid")
          .filter(col("vec_a") < col("vec_b"))
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"),
            round(graft.expr.CosineSim(col("va"), col("vb")), 6)
              .as("cosine"))
          .filter(col("cosine") >= MinDupCosine)
          .select("doc_a", "doc_b")
        val nPairs = t("within-cluster pairs count") { pairs.count() }
        println(s"    pairs=$nPairs")
        val drops = t("closure + drops") {
          graft.operators.Dedup.duplicateClusters(pairs)
            .filter(col("id") =!= col("cluster"))
            .select(col("id")).count()
        }
        println(s"    drops=$drops")
        t("FULL q_semantic_dedup") {
          graft.operators.Similarity.semanticDedup(
            graft.core.Tables.embeddings(spark, dir), "vec_id",
            "embedding", SemK, SemIters, MinDupCosine).count()
        }
      }
      // ---- quality classifier, train vs score ----
      locally {
        val docs = graft.core.Tables.documents(spark, dir)
        println(s"  quality_classifier over ${docs.count()} docs")
        val labeled = docs.withColumn("y",
          (col("lang") === "en").cast("double"))
        val model = t("train (8 iters)") {
          graft.text.QualityClassifier.train(labeled, "doc_id", "text",
            "y", dim = graft.TextQueries.QcDim, iters = 8, lr = 4.0)
        }
        t("score pass") {
          graft.text.QualityClassifier.score(docs, "doc_id", "text",
            model).count()
        }
      }
    }
    spark.stop()
  }
}
