import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{GraftMaintenance, GraftMv, MvAgg}

/** Round-16 MV maintenance scale dry run: incremental refresh cost vs
  * from-scratch recompute as the source grows 10× (sf0.1 → /tmp/sf1).
  *
  * Shape: documents + a 4096-ary shard column as the group key (so a
  * narrow delete touches FEW groups and the min/max rebuild's semi-join
  * prune is visible — a 3-group key would force every group through the
  * rebuild and measure nothing). Three measured laps per SF:
  *   - refresh after a 1% APPEND (insert-only arithmetic fold),
  *   - refresh after a narrow DELETE (delete images → affected-group
  *     rebuild from the head),
  *   - a full from-scratch recompute of the same aggregate (what a
  *     deployment without the MV pays per poll).
  * Expectation: both refresh laps track the DELTA (≈flat or data-growth-
  * sublinear across 10×), the recompute tracks the TABLE. */
object MvScaleDryRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fmt = "graft.sources.GraftParquetTableProvider"
    val dirs = Seq("sf0.1" -> "/root/testdata/sf0.1", "sf1" -> "/tmp/sf1")
      .filter { case (_, d) => new java.io.File(d).exists() }
    for ((sf, dir) <- dirs) {
      val rows = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          pmod(col("l_orderkey"), lit(4096)).as("grp"))
      val nAll = rows.count()
      val table = s"/tmp/mv_scale_src_${sf}_${java.util.UUID.randomUUID()}"
      val mv = s"/tmp/mv_scale_mv_${sf}_${java.util.UUID.randomUUID()}"
      // hold out ~1% of rows as the append delta
      val holdout = rows.filter(pmod(col("l_orderkey"), lit(97)) === 0)
      val seed = rows.filter(pmod(col("l_orderkey"), lit(97)) =!= 0)
      seed.write.format(fmt).option("path", table).mode("append").save()
      // the 100 TB layout discipline: cluster on the mutation key so a
      // keyed delete touches FEW files (zone-map candidate selection)
      // and the change feed's cost ∝ changed files is actually small —
      // an unclustered scattered delete makes every file a candidate
      // and the feed diff degenerates to two table scans
      GraftMaintenance.compact(spark, table,
        targetFileBytes =
          graft.sources.GraftParquetV2.totalFileBytes(table) / 24,
        clusterBy = Seq("grp"))
      val t0 = System.nanoTime()
      GraftMv.create(spark, mv, table, Seq("grp"), Seq(
        MvAgg("count", "*", "n"),
        MvAgg("sum", "l_extendedprice", "revenue"),
        MvAgg("avg", "l_quantity", "avg_qty"),
        MvAgg("min", "l_orderkey", "lo"),
        MvAgg("max", "l_orderkey", "hi")))
      val tCreate = (System.nanoTime() - t0) / 1e9
      // lap 1: 1% append → insert-only fold
      holdout.write.format(fmt).option("path", table).mode("append").save()
      val t1 = System.nanoTime()
      GraftMv.refresh(spark, mv)
      val tIns = (System.nanoTime() - t1) / 1e9
      // lap 2: narrow delete (a 41-wide shard band → 41 of 4096
      // groups, zone-map-selectable on the clustered grp column) →
      // delete images, affected-group rebuild
      GraftMaintenance.delete(spark, table, col("grp") < lit(41))
      val t2 = System.nanoTime()
      GraftMv.refresh(spark, mv)
      val tDel = (System.nanoTime() - t2) / 1e9
      // lap 3: what a poll WITHOUT the MV pays — full recompute
      val t3 = System.nanoTime()
      val full = spark.read.format(fmt).option("path", table).load()
        .groupBy("grp")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(38,6)")).as("revenue"),
          min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      full.queryExecution.toRdd.count()
      val tFull = (System.nanoTime() - t3) / 1e9
      val mvRows = GraftMv.read(spark, mv).count()
      println(f"MVROW sf=$sf src_rows=$nAll mv_groups=$mvRows " +
        f"create_s=$tCreate%.2f refresh_insert_s=$tIns%.2f " +
        f"refresh_delete_s=$tDel%.2f full_recompute_s=$tFull%.2f")
      for (p <- Seq(table, mv)) {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(hp, true)
      }
    }
    spark.stop()
  }
}
