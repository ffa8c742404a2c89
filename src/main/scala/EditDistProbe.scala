import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object EditDistProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label rows=$n secs=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val pairs = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
      graft.TextQueries.ShingleN, graft.TextQueries.MinJaccard,
      failOnOverflow = true)
    timed("blocking_only")(pairs.count())
    val t = docs.select(col("doc_id"), col("text"))
    val joined = pairs
      .join(t.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(t.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
    timed("join_only")(joined.count())
    timed("dp_once")(joined
      .repartition(32, col("doc_a"), col("doc_b"))
      .select(levenshtein(col("ta"), col("tb")).as("d"))
      .agg(sum("d")).queryExecution.toRdd.count())
    timed("full_entry")(graft.TextQueries.qDedupEditDist.run(spark, dir)
      .queryExecution.toRdd.count())
    spark.stop()
  }
}
