import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{GraftBloom, GraftParquetV2, GraftScanTelemetry}

/** Round-11 bloom-sidecar scale dry run: point-lookup wall time and
  * files-read over a HASH-BUCKETED table (every file's key range spans
  * the domain — zone maps provably blind) before vs after
  * `build_bloom`, at sf0.01 and sf0.1. Expectation: without sidecars
  * every lookup reads every file; with them it reads ~1 file + the
  * sketch's false positives (fpp ≈ 1%), and the advantage GROWS with
  * file count — the property that matters at 100 TB, where a point
  * lookup without a membership index is a full-table scan. */
object BloomScaleDryRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fmt = "graft.sources.GraftParquetTableProvider"
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val nFiles = 16
      val table = s"/tmp/bloom_scale_${sf}_${java.util.UUID.randomUUID()}"
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice")
      // one append per hash bucket → nFiles single-split files, each
      // key range spanning the whole domain (the zone-map-blind shape)
      (0 until nFiles).foreach { b =>
        li.filter(pmod(hash(col("l_orderkey")), lit(nFiles)) === b)
          .coalesce(1).write.format(fmt).option("path", table)
          .mode("append").save()
      }
      // 20 interior probe keys, deterministic spread
      val keys = li.select("l_orderkey").distinct().orderBy("l_orderkey")
        .collect().map(_.getLong(0))
      val probes = (1 to 20).map(i => keys(i * keys.length / 22))
      def sweep(): (Double, Long, Long) = {
        GraftScanTelemetry.reset()
        val t0 = System.nanoTime()
        var rows = 0L
        probes.foreach { k =>
          rows += spark.read.format(fmt).option("path", table).load()
            .filter(col("l_orderkey") === k).count()
        }
        ((System.nanoTime() - t0) / 1e9, rows,
          GraftScanTelemetry.bloomSkippedFiles.sum())
      }
      val (coldS, rowsCold, _) = sweep() // no sidecars yet: full reads
      val tb = System.nanoTime()
      val built = GraftBloom.build(spark, table, Seq("l_orderkey"))
      val buildS = (System.nanoTime() - tb) / 1e9
      val (bloomS, rowsBloom, skipped) = sweep()
      require(rowsCold == rowsBloom,
        s"bloom sweep changed results: $rowsCold vs $rowsBloom")
      val bytes = built.map(_._3).sum
      println(f"SCALEROW sf=$sf files=$nFiles probes=${probes.length} " +
        f"rows=$rowsBloom no_bloom_s=$coldS%.2f bloom_s=$bloomS%.2f " +
        f"build_s=$buildS%.2f files_bloom_skipped=$skipped " +
        f"sidecar_bytes=$bytes")
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    spark.stop()
  }
}
