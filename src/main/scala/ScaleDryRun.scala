import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Structural scale dry run (SCALE.md): runs the three ITERATIVE/heavy
  * paths — near-dup cluster resolution, the end-to-end training prep,
  * and k-means IVF training — and reports, per run:
  *   - wall seconds (secondary signal on this noisy host),
  *   - contraction ROUND count (the superlinear risk for the cluster
  *     paths is iteration growth, invisible to single-scale timing),
  *   - total shuffle bytes read+written (the 100 TB cost driver: if
  *     bytes scale superlinearly with the corpus, the plan is wrong no
  *     matter what local wall-clock says).
  *
  * Usage: `runMain ScaleDryRun <dir>` where dir holds documents.parquet
  * and embeddings.parquet (e.g. /root/testdata/sf0.1, or the replicated
  * /tmp corpora generated per SCALE.md).
  */
object ScaleDryRun {

  private class ShuffleAcc extends SparkListener {
    @volatile var read = 0L
    @volatile var written = 0L
    @volatile var stages = 0
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        read += m.shuffleReadMetrics.totalBytesRead
        written += m.shuffleWriteMetrics.bytesWritten
        stages += 1
      }
    }
  }

  private def measured[A](spark: SparkSession, label: String)(work: => A): A = {
    val acc = new ShuffleAcc
    spark.sparkContext.addSparkListener(acc)
    val t0 = System.nanoTime()
    val out = work
    val secs = (System.nanoTime() - t0) / 1e9
    // listener bus is async (and its drain API is private[spark]) — give
    // queued stage-completion events time to land before reading counters
    Thread.sleep(3000)
    spark.sparkContext.removeSparkListener(acc)
    println(f"DRYRUN $label%s secs=$secs%.1f shuffle_read_mb=${acc.read / 1e6}%.1f " +
      f"shuffle_write_mb=${acc.written / 1e6}%.1f stages=${acc.stages}%d extra=$out%s")
    out
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // normalize plan shape across scales: small corpora broadcast joins
    // that big corpora shuffle, which makes raw byte ratios incomparable —
    // disabling broadcast at BOTH scales isolates data-volume scaling
    if (sys.env.contains("SPARK_GRAFT_DRYRUN_NOBROADCAST"))
      builder.config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftSession.adopt(spark)
    // SPARK_GRAFT_DRYRUN_ONLY=substr[,substr...] runs the sections whose
    // label matches — re-measuring one family shouldn't pay for all
    val only: Seq[String] = sys.env.get("SPARK_GRAFT_DRYRUN_ONLY")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
    def wanted(label: String): Boolean =
      only.isEmpty || only.exists(label.contains)
    def section(label: String)(work: => String): Unit =
      if (wanted(label)) measured(spark, label)(work)
    lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
    lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // warm page cache / footers — but only for the tables a WANTED
    // section reads, or a filtered run (e.g. ONLY=dsv2_prune) still
    // pays full corpus scans it never uses
    if (Seq("dedup_clusters", "training_prep", "bm25").exists(wanted))
      docs.count()
    if (Seq("kmeans_fit", "semantic_dedup").exists(wanted)) emb.count()

    section(s"dedup_clusters dir=$dir") {
      val pairs = graft.operators.Dedup.minhashLshPairs(
        docs, "doc_id", "text",
        graft.TextQueries.ShingleN, graft.TextQueries.MinJaccard,
        failOnOverflow = true)
      val (labels, rounds, converged) =
        graft.operators.Dedup.duplicateClustersDetail(pairs)
      val n = labels.count()
      s"rounds=$rounds converged=$converged labels=$n"
    }

    section(s"training_prep dir=$dir") {
      val rows = graft.SparkEntry.queries("q_training_data_prep")(spark, dir)
        .queryExecution.toRdd.count()
      s"rows=$rows"
    }

    // BM25 over the replica corpus: the sf1 corpus suffixes every token
    // with _r<k> (disjoint replicas), so the catalog's fixed terms match
    // nothing there — expand the term list with all replica suffixes so
    // each replica matches its own four terms and the matching postings
    // volume scales with the corpus (the unmatched variants cost one
    // broadcast row each). topK is corpus-sized so the limit hides no work.
    section(s"bm25 dir=$dir") {
      // replica count follows the corpus (SPARK_GRAFT_DRYRUN_REPLICAS;
      // 10 matches the documented /tmp/sf1 recipe) — a 50x corpus run
      // must widen the suffix range or only a fifth of it would match
      val replicas =
        sys.env.get("SPARK_GRAFT_DRYRUN_REPLICAS").map(_.toInt).getOrElse(10)
      val terms = graft.TextQueries.Bm25Terms ++
        (for (t <- graft.TextQueries.Bm25Terms; r <- 0 until replicas)
          yield s"${t}_r$r")
      val n = graft.text.Bm25.score(docs, "doc_id", "text", terms,
        topK = 10000000).count()
      s"scored_docs=$n"
    }

    section(s"kmeans_fit dir=$dir") {
      val (cents, assigned) = graft.operators.KMeans.fit(
        emb, "vec_id", "embedding",
        graft.VectorQueries.IvfClusters, graft.VectorQueries.IvfIters)
      s"centroids=${cents.count()} assigned=${assigned.count()}"
    }

    // ---- SemDeDup (round-6 addition): within-cell pair generation is
    // ~n²/k by design, so the production contract is CELL-SIZE-CONSTANT
    // k (k grows with the corpus). Run both configurations: fixed k
    // (exposes the quadratic if k is mis-provisioned) and k scaled to
    // ~250 vectors/cell (the recipe that must stay linear).
    // (gated: the k-sizing count is itself a full corpus scan)
    if (wanted("semantic_dedup")) locally {
      val n = emb.count()
      val kFixed = graft.VectorQueries.SemK
      val kScaled = math.max(kFixed, math.ceil(n / 250.0).toInt)
      for (k <- Seq(kFixed, kScaled).distinct) {
        section(s"semantic_dedup dir=$dir k=$k") {
          val kept = graft.operators.Similarity.semanticDedup(
            emb, "vec_id", "embedding", k, graft.VectorQueries.SemIters,
            graft.VectorQueries.MinDupCosine).count()
          s"n=$n kept=$kept"
        }
      }
    }

    // ---- graph family (round-5 addition): the rides station graph,
    // replicated k× as DISJOINT subgraphs (station ids shifted per
    // replica) — nodes AND edges grow k×, so rounds/bytes/wedges ratios
    // between k=1 and k=10 expose any superlinear component. The
    // replication is in-plan (cross join with a range), no extra corpus.
    import org.apache.spark.sql.functions._
    def stationEdges(k: Int) = {
      val base = graft.core.Tables.rides(spark, dir)
        .select(col("start_station_id").as("src"),
          col("end_station_id").as("dst"))
      if (k == 1) base
      else base.crossJoin(broadcast(
          spark.range(k.toLong).select(col("id").as("rep"))))
        .select((col("src") + col("rep") * 1000000L).as("src"),
          (col("dst") + col("rep") * 1000000L).as("dst"))
    }
    for (k <- Seq(1, 10)) {
      section(s"pagerank dir=$dir replicas=$k") {
        val pr = graft.operators.Graphs.pageRank(
          stationEdges(k), "src", "dst", graft.RelationalQueries.PrIters)
        s"nodes=${pr.count()} iters=${graft.RelationalQueries.PrIters}"
      }
      section(s"triangles dir=$dir replicas=$k") {
        val e = stationEdges(k)
        val (m, wedges) = graft.operators.Graphs.orientedWedgeStats(
          e, "src", "dst")
        val tri = graft.operators.Graphs.trianglesPerNode(e, "src", "dst")
          .queryExecution.toRdd.count()
        // the m^1.5 bound the wedge fanout must stay under at any scale
        f"m=$m wedges=$wedges m15=${math.pow(m.toDouble, 1.5)}%.0f tri_nodes=$tri"
      }
      section(s"bfs dir=$dir replicas=$k") {
        // disjoint replicas: BFS settles only the source's replica, so
        // settled counts stay FLAT at k× edges while the per-hop joins
        // run against the k×-bigger adjacency — the signal is hop count
        // (diameter-bound, must not grow) and bytes staying near-flat
        val d = graft.operators.Graphs.bfsDistances(
          stationEdges(k), "src", "dst", 1L,
          graft.RelationalQueries.BfsMaxHops)
        val settled = d.count()
        val hops = d.agg(max(col("dist"))).head().getInt(0)
        s"settled=$settled max_hop=$hops"
      }
      section(s"sssp dir=$dir replicas=$k") {
        // the weighted sibling: the superlinear risk is ROUND growth
        // (label correction can revisit settled nodes via cheaper
        // paths); with weights bounded in [1, 9] rounds stay within a
        // small factor of the hop diameter at any k
        val we = stationEdges(k).withColumn("w",
          pmod(col("src") * 7 + col("dst") * 13, lit(9L)) + 1L)
        val (d, rounds) = graft.operators.Graphs.ssspDistancesDetail(
          we, "src", "dst", "w", 1L)
        val settled = d.count()
        val maxD = d.agg(max(col("dist"))).head().getLong(0)
        s"settled=$settled rounds=$rounds max_dist=$maxD"
      }
    }

    // ---- DSv2 row-group zone-map pruning (round-6 addition): on a
    // SORTED fact table a selective range must skip most row groups
    // from footer stats alone. Small block size stands in for the many
    // row groups a 100 TB table has; the signal is the decoded/skipped
    // split (wall-clock is secondary — the group-example decoder is the
    // correctness-first path, not the vectorized one).
    if (wanted("dsv2_prune")) {
      import graft.sources.GraftScanTelemetry
      val sorted = "/tmp/graft_prune_lineitem.parquet"
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_returnflag")
        .repartition(1).sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .option("parquet.block.size", (256 * 1024).toString)
        .parquet(sorted)
      val v2 = spark.read
        .format("graft.sources.GraftParquetTableProvider")
        .option("path", sorted).load()
      val maxKey = v2.agg(max("l_orderkey")).head.getLong(0)
      def scan(label: String, f: org.apache.spark.sql.Column): Unit =
        section(s"dsv2_prune dir=$dir case=$label") {
          GraftScanTelemetry.reset()
          val n = v2.filter(f).queryExecution.toRdd.count()
          s"rows=$n decoded=${GraftScanTelemetry.decodedGroups.sum()} " +
            s"skipped=${GraftScanTelemetry.skippedGroups.sum()}"
        }
      scan("full", col("l_orderkey") >= 0L) // unrefutable: decodes all
      scan("range_1pct", col("l_orderkey") >= (maxKey - maxKey / 100) &&
        col("l_orderkey") <= maxKey)
      scan("point_miss", col("l_orderkey") === (maxKey + 1))

      // file-level layer (round-6 manifest): same sorted data split into
      // MANY files via range partitioning + a write-time stats sidecar —
      // the selective range now refutes whole files at PLANNING, before
      // any task exists; row-group pruning handles the survivors
      val manifested = "/tmp/graft_prune_manifest.parquet"
      graft.sources.Sinks.parquetWithStats(
        spark.read.parquet(s"$dir/lineitem.parquet")
          .select("l_orderkey", "l_quantity", "l_returnflag")
          .repartitionByRange(32, col("l_orderkey")), manifested)
      val v2m = spark.read
        .format("graft.sources.GraftParquetTableProvider")
        .option("path", manifested).load()
      def scanM(label: String, f: org.apache.spark.sql.Column): Unit =
        section(s"dsv2_prune dir=$dir case=$label") {
          GraftScanTelemetry.reset()
          val n = v2m.filter(f).queryExecution.toRdd.count()
          s"rows=$n files_skipped=${GraftScanTelemetry.skippedFiles.sum()} " +
            s"decoded=${GraftScanTelemetry.decodedGroups.sum()} " +
            s"skipped=${GraftScanTelemetry.skippedGroups.sum()}"
        }
      scanM("manifest_range_1pct",
        col("l_orderkey") >= (maxKey - maxKey / 100) &&
          col("l_orderkey") <= maxKey)
      scanM("manifest_point_miss", col("l_orderkey") === (maxKey + 1))
    }

    // MERGE-ON-READ read-overhead evidence (round 11): the DV ordinal
    // merge must cost ~nothing on a row scan (it is a monotone cursor
    // against sorted positions), while the documented demotion of the
    // footer-only COUNT fast path is the real, bounded price. Build a
    // graft table, MOR-delete ~1% via SQL, time row scans clean / DV'd
    // / folded, plus count(*) on both sides of the demotion.
    if (wanted("dv_overhead")) {
      import org.apache.spark.sql.functions.{col, length, sum}
      val fmt = "graft.sources.GraftParquetTableProvider"
      val wh = java.nio.file.Files.createTempDirectory("graft_dvdry_")
        .toFile.getAbsolutePath
      val table = s"$wh/ns/t"
      spark.conf.set("spark.sql.catalog.graft_dry",
        "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft_dry.warehouse", wh)
      docs.select("doc_id", "lang", "n_chars", "text").repartition(8)
        .write.format(fmt).option("path", table).mode("append").save()
      def rowScanSecs(): Double = {
        val t0 = System.nanoTime()
        spark.read.format(fmt).option("path", table).load()
          .agg(sum(length(col("text")))).head.getLong(0)
        (System.nanoTime() - t0) / 1e9
      }
      def countSecs(): Double = {
        val t0 = System.nanoTime()
        spark.read.format(fmt).option("path", table).load().count()
        (System.nanoTime() - t0) / 1e9
      }
      section(s"dv_overhead dir=$dir phase=clean") {
        val warm = rowScanSecs() // page-cache fill rides the first pass
        val scan = (1 to 3).map(_ => rowScanSecs()).min
        val cnt = (1 to 3).map(_ => countSecs()).min
        f"row_scan_s=$scan%.3f count_footer_s=$cnt%.3f warm_s=$warm%.3f"
      }
      section(s"dv_overhead dir=$dir phase=mor_delete_1pct") {
        spark.conf.set(graft.sources.GraftParquetTable.ModeConf,
          "merge-on-read")
        try spark.sql("DELETE FROM graft_dry.ns.t WHERE doc_id % 100 = 0")
        finally spark.conf.set(graft.sources.GraftParquetTable.ModeConf,
          "copy-on-write")
        val dv = graft.sources.GraftDeletes.livePositions(table)
        s"dv_files=${graft.sources.GraftDeletes.liveDvFiles(table).size} " +
          s"positions=${dv.valuesIterator.map(_.cardinality).sum}"
      }
      section(s"dv_overhead dir=$dir phase=dv_scan") {
        val scan = (1 to 3).map(_ => rowScanSecs()).min
        val cnt = (1 to 3).map(_ => countSecs()).min
        f"row_scan_s=$scan%.3f count_demoted_s=$cnt%.3f"
      }
      section(s"dv_overhead dir=$dir phase=folded") {
        graft.sources.GraftMaintenance.rewriteDeletes(spark, table)
        val scan = (1 to 3).map(_ => rowScanSecs()).min
        val cnt = (1 to 3).map(_ => countSecs()).min
        f"row_scan_s=$scan%.3f count_footer_s=$cnt%.3f " +
          s"dv_left=${graft.sources.GraftDeletes.liveDvFiles(table).size}"
      }
    }

    // INCREMENTAL RE-CLUSTERING cost ∝ tail: cluster the corpus once,
    // append a ~5% tail, and price recluster (tail-only) against a full
    // clustered re-compaction of the same table — the claim is that the
    // ratio tracks the tail fraction, not the table.
    if (wanted("recluster_cost")) {
      val fmt = "graft.sources.GraftParquetTableProvider"
      val table = s"${sys.props("java.io.tmpdir")}/graft_dry_recluster_" +
        java.util.UUID.randomUUID().toString
      val hp = new org.apache.hadoop.fs.Path(table)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .deleteOnExit(hp)
      val base = docs.select("doc_id", "lang", "n_chars", "text")
      base.write.format(fmt).option("path", table)
        .mode("append").save()
      graft.sources.GraftMaintenance.compact(spark, table,
        targetFileBytes = graft.sources.GraftParquetV2
          .totalFileBytes(table) / 8, clusterBy = Seq("doc_id"))
      import org.apache.spark.sql.functions.col
      val nRows = base.count()
      base.limit((nRows / 20).toInt.max(1)) // ~5% tail
        .withColumn("doc_id", col("doc_id") + 10000000L)
        .coalesce(1).write.format(fmt).option("path", table)
        .mode("append").save()
      section(s"recluster_cost dir=$dir phase=tail_only") {
        val (v, n) = graft.sources.GraftMaintenance.recluster(spark, table)
        s"version=$v tail_files=$n"
      }
      section(s"recluster_cost dir=$dir phase=full_recompact") {
        val v = graft.sources.GraftMaintenance.compact(spark, table,
          targetFileBytes = graft.sources.GraftParquetV2
            .totalFileBytes(table) / 8, clusterBy = Seq("doc_id"))
        s"version=$v"
      }
    }

    spark.stop()
  }
}
