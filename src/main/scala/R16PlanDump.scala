import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 optimization-round plan artifacts: dumps
  * `explain("formatted")` for every catalog query this round touched,
  * plus the two mechanism plans the round's claims rest on — the
  * change-feed span read (one-sided spans skip the exceptAll multiset
  * diff) and one pagerank iteration (rank side broadcast below the
  * measured-row cap). Run from BOTH the round-open commit and HEAD:
  *   sbt "runMain R16PlanDump before plans/r16"   # on c93b3a6
  *   sbt "runMain R16PlanDump after plans/r16"    # on HEAD
  * The iteration plan is replicated inline from the Graphs.pageRank
  * loop body (same expressions, same broadcast gating as the shipped
  * operator) because the loop's intermediate frames are not part of
  * any public API; the change-feed plan comes straight from the
  * library call. */
object R16PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("after")
    val outDir = args.drop(1).headOption.getOrElse("plans/r16")
    // optional 3rd arg: comma-separated filter so a later change set can
    // re-dump ONLY its touched plans without overwriting earlier ones
    val onlyF: Option[Set[String]] =
      args.drop(2).headOption.map(_.split(',').toSet)
    def wanted(name: String): Boolean = onlyF.forall(_.contains(name))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftSession.adopt(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def write(name: String, body: String): Unit = {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"), body + "\n")
      println(s"wrote $outDir/${name}_$tag.txt")
    }
    def fmt(df: DataFrame): String = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).trim

    // ——— touched catalog queries: the returned (readback) plans ———
    for (n <- Seq("q_mv_incremental", "q_mv_merge_state",
        "q_mv_hll_distinct", "q_mv_stream_refresh", "q_sql_mv_refresh",
        "q_stream_cdc_feed", "q_pagerank_stations", "q_bfs_stations",
        "q_sssp_weighted", "q_training_data_prep", "q_change_feed_cdc")
        if wanted(n)) {
      try write(n, fmt(graft.SparkEntry.queries(n)(spark, dir)))
      catch { case e: Exception =>
        write(n, s"DUMP FAILED: ${e.getMessage}") }
    }

    if (wanted("changefeed_append_span") ||
        wanted("changefeed_rewrite_span")) {
    // ——— mechanism: change-feed span plans ———
    val fmtSrc = "graft.sources.GraftParquetTableProvider"
    val t = s"${sys.props("java.io.tmpdir")}/r16plan_${java.util.UUID.randomUUID()}"
    val orders = graft.core.Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderpriority")
    orders.filter(pmod(col("o_orderkey"), lit(4)) === 0)
      .write.format(fmtSrc).option("path", t).mode("append").save() // v1
    orders.filter(pmod(col("o_orderkey"), lit(4)) === 1)
      .write.format(fmtSrc).option("path", t).mode("append").save() // v2
    if (wanted("changefeed_append_span"))
      write("changefeed_append_span",
        "// feed over an append-only span (v1 -> v2): files were only ADDED\n" +
          fmt(graft.sources.GraftMaintenance.changeFeedRows(spark, t, 1, 2)))
    graft.sources.GraftMaintenance.delete(spark, t,
      col("o_totalprice") < lit(50000.0))                          // v3
    if (wanted("changefeed_rewrite_span"))
      write("changefeed_rewrite_span",
        "// feed over a rewrite span (v2 -> v3): files added AND removed,\n" +
          "// the two-sided multiset diff is required\n" +
          fmt(graft.sources.GraftMaintenance.changeFeedRows(spark, t, 2, 3)))
    org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(t), true)
    }

    if (wanted("pagerank_iteration")) {
    // ——— mechanism: one pagerank iteration (replicated loop body) ———
    val rides = graft.core.Tables.rides(spark, dir)
    val e0 = rides
      .select(col("start_station_id").cast("long").as("src"),
        col("end_station_id").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull).distinct()
    val e = e0.join(e0.groupBy("src").agg(count(lit(1)).as("od")), "src")
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    val pr = nodes.withColumn("pr", lit(1.0 / n))
    // the shipped operator broadcasts the rank side below the measured
    // cap (graft.graph.broadcastRows, default 2M); before the round it
    // never hinted, so the planner sort-merge-joined both sides
    val bRows = sys.props.get("graft.graph.broadcastRows").map(_.toLong)
      .getOrElse(2000000L)
    val useB = tag != "before" && n <= bRows
    def maybeB(df: DataFrame) = if (useB) broadcast(df) else df
    val contrib = e.join(maybeB(pr), col("src") === col("node"))
      .select(col("dst").as("node"),
        (col("pr") / col("od").cast("double")).cast("decimal(28,12)").as("q"))
      .groupBy("node").agg(sum("q").cast("double").as("s"))
    val base = nodes.join(maybeB(contrib), Seq("node"), "left")
      .select(col("node"), (lit(0.15 / n) +
        lit(0.85) * coalesce(col("s"), lit(0.0))).as("pr"))
    write("pagerank_iteration",
      s"// one power iteration over the checkpointed edge/rank frames\n" +
        s"// (n=$n nodes; broadcast gate ${if (useB) "ON" else "OFF"})\n" +
        fmt(base))
    }
    spark.stop()
  }
}
