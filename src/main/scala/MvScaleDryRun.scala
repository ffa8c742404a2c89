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

    // ----- phase 2: HIGH-CARDINALITY state, overwrite vs merge mode -----
    // Group by l_orderkey itself (~n/4 groups — the state table is
    // 25% of the source). The delta is the workload merge-mode exists
    // for: NEW KEYS ARRIVING AT THE TOP of the key range (time-ordered
    // ingest) and an OLD LOW BAND RETIRING — touched groups cluster in
    // keyspace, so the range-clustered state's zone maps prune the
    // upsert to the hot band. Overwrite mode rewrites the whole
    // |groups|-sized state per refresh regardless.
    // pin the merge-mode state to 24 range files: at these SFs the
    // whole state fits one AQE-sized file, which would hide the
    // pruning the measurement exists to show — a real 100M-group
    // state spans many files naturally
    sys.props("graft.mv.statePartitions") = "24"
    for ((sf, dir) <- dirs) {
      val rows = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      val maxKey = rows.agg(max("l_orderkey")).head().getLong(0)
      val top = (maxKey * 0.99).toLong    // top-1%: the arriving keys
      // retiring band sized INSIDE graft.mv.mergeDeleteCap (10k): a
      // bigger retire correctly falls back to the recompute heal (the
      // cap exists to bound the keyed-delete literal list) — that
      // path is spec-covered, this measures the keyed regime
      val low = 8000L
      for (mode <- Seq(false, true)) {
        val table = s"/tmp/mv_hc_src_${sf}_${java.util.UUID.randomUUID()}"
        val mv = s"/tmp/mv_hc_mv_${sf}_${java.util.UUID.randomUUID()}"
        val seed = rows.filter(col("l_orderkey") <= top)
        seed.write.format(fmt).option("path", table).mode("append").save()
        GraftMaintenance.compact(spark, table,
          targetFileBytes =
            graft.sources.GraftParquetV2.totalFileBytes(table) / 24,
          clusterBy = Seq("l_orderkey"))
        GraftMv.create(spark, mv, table, Seq("l_orderkey"), Seq(
          MvAgg("count", "*", "n"),
          MvAgg("sum", "l_extendedprice", "revenue"),
          MvAgg("avg", "l_quantity", "avg_qty")), stateMerge = mode)
        val grp = GraftMv.read(spark, mv).count()
        // state bytes WRITTEN by a lap = new files in the head vs the
        // pre-lap file set — the write-amplification metric (the
        // cluster-resource cost a wall-clock number hides at small SF)
        def stateFiles(): Map[String, Long] = {
          val fs = new org.apache.hadoop.fs.Path(mv)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          graft.sources.GraftParquetV2.listFiles(mv).map(f =>
            f -> fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen)
            .toMap
        }
        def lap(body: => Unit): (Double, Long) = {
          val before = stateFiles().keySet
          val t = System.nanoTime()
          body
          val sec = (System.nanoTime() - t) / 1e9
          val wrote = stateFiles().filterNot(kv => before(kv._1))
            .values.sum
          (sec, wrote)
        }
        // lap 1: the top-band append (new keys)
        rows.filter(col("l_orderkey") > top)
          .write.format(fmt).option("path", table).mode("append").save()
        val (tIns, bIns) = lap(GraftMv.refresh(spark, mv))
        // lap 2: the low band retires (groups vanish entirely)
        GraftMaintenance.delete(spark, table, col("l_orderkey") < lit(low))
        val (tDel, bDel) = lap(GraftMv.refresh(spark, mv))
        println(f"MVHC sf=$sf mode=${if (mode) "merge" else "overwrite"} " +
          f"mv_groups=$grp refresh_topband_s=$tIns%.2f " +
          f"topband_state_mb=${bIns / 1e6}%.1f " +
          f"refresh_retire_s=$tDel%.2f retire_state_mb=${bDel / 1e6}%.1f")
        for (p <- Seq(table, mv)) {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(hp, true)
        }
      }
    }
    spark.stop()
  }
}
