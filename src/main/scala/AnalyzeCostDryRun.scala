import org.apache.spark.sql.SparkSession
import graft.sources.GraftAnalyze

/** Round-11 ANALYZE cost dry run: the one-pass NDV/null/length sweep
  * over a connector table at sf0.01 vs sf0.1. Expectation: wall time
  * tracks the single scan (HLL sketches merge tree-wise inside one
  * constant-width aggregate row), and the persisted sidecar stays
  * O(columns) bytes — the "ANALYZE TABLE is one cheap pass" contract
  * a 100 TB table needs before CBO can be trusted. */
object AnalyzeCostDryRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fmt = "graft.sources.GraftParquetTableProvider"
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val t = s"/tmp/an_cost_${java.util.UUID.randomUUID()}"
      spark.read.parquet(s"/root/testdata/$sf/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_returnflag", "l_linestatus")
        .repartition(8)
        .write.format(fmt).option("path", t).mode("append").save()
      val timings = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        GraftAnalyze.analyze(spark, t)
        (System.nanoTime() - t0) / 1e9
      }
      val ts = GraftAnalyze.read(t).get
      val sidecarBytes = new java.io.File(t, GraftAnalyze.StatsFile).length()
      println(f"SCALEROW sf=$sf rows=${ts.rows} cols=${ts.cols.size} " +
        f"analyze_s=${timings.min}%.2f sidecar_bytes=$sidecarBytes " +
        s"ndv_orderkey=${ts.cols("l_orderkey").ndv} " +
        s"ndv_linestatus=${ts.cols("l_linestatus").ndv}")
      // round-13: histogram mode — prices the opt-in second pass (bin
      // bounds piggyback pass 1; pass 2 is one conditional-NDV agg)
      val hTimings = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        GraftAnalyze.analyze(spark, t,
          Seq("l_orderkey", "l_partkey", "l_quantity"), 32)
        (System.nanoTime() - t0) / 1e9
      }
      val hts = GraftAnalyze.read(t).get
      val hBytes = new java.io.File(t, GraftAnalyze.StatsFile).length()
      println(f"SCALEROW sf=$sf HIST cols=3 bins=32 " +
        f"analyze_s=${hTimings.min}%.2f sidecar_bytes=$hBytes " +
        s"orderkey_range_bins=${
          hts.hists("l_orderkey").bins.count(b => b.hi > b.lo)} " +
        s"quantity_point_bins=${
          hts.hists("l_quantity").bins.count(b => b.hi == b.lo)}")
      val p = new org.apache.hadoop.fs.Path(t)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    spark.stop()
  }
}
