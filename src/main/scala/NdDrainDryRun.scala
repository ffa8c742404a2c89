import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 probe: where did q_stream_neardup_pairs' +15 s at sf1 go
  * after the table-sink drain migration — candidate volume through the
  * sink, or the readback/verify shape? */
object NdDrainDryRun {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftSession.adopt(spark)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import org.apache.spark.sql.streaming.Trigger
    val batchSchema = spark.read.parquet(s"$dir/documents.parquet").schema
    val run = java.util.UUID.randomUUID().toString
    val ckpt = s"/tmp/graft_nddry_ck_$run"
    val table = s"/tmp/graft_nddry_tbl_$run"
    val src = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val cands = graft.streaming.StreamingNearDup.candidatePairs(
      src, "doc_id", "text", graft.TextQueries.ShingleN,
      minEstJaccard = 0.03, maxBucket = 1 << 20)
    t("stream drain -> graft sink") {
      val q = cands.writeStream
        .format("graft.sources.GraftParquetTableProvider")
        .option("path", table)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val nRaw = t("readback count") {
      graft.streaming.TableDrain.read(spark, table).count()
    }
    println(s"  raw candidates in table: $nRaw")
    val pairs = graft.streaming.TableDrain.read(spark, table)
      .select("doc_a", "doc_b").distinct()
    val nDistinct = t("distinct count") { pairs.count() }
    println(s"  distinct candidate pairs: $nDistinct")
    t("verify join") {
      val sets = graft.core.Tables.documents(spark, dir)
        .select(col("doc_id").cast("long").as("id"),
          graft.text.TextAnalysis.shingles(col("text"),
            graft.TextQueries.ShingleN).as("sh"))
      pairs
        .join(sets.withColumnRenamed("id", "doc_a")
          .withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sets.withColumnRenamed("id", "doc_b")
          .withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn("inter",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
        .withColumn("jaccard", col("inter") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter"))
            .cast("double"))
        .filter(col("jaccard") >= graft.TextQueries.MinJaccard)
        .count()
    }
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(table), true)
    fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
    spark.stop()
  }
}
