import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-plan dump for PLANS.md: prints `explain("formatted")` of the
  * headline queries plus the table-format surfaces worth auditing
  * (pushdown scans, merge-on-read plans, renamed-column resolution) as
  * ready-to-paste markdown sections. PLANS.md is append-curated per
  * round — run `sbt "runMain PlanDump /root/testdata/sf0.01"` and graft
  * the sections that changed. (The round-9 PlanDump dumped everything;
  * this one is the curated successor the PLANS.md header points at.) */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftSession.adopt(spark)

    def dump(name: String, note: String, df: DataFrame): Unit = {
      println(s"\n## $name\n\n$note\n\n```")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).trim)
      println("```")
    }

    for (n <- Seq("q_hard_top_routes", "q1_pricing_summary",
        "q_easy_top_routes_sql", "q_total_distance"))
      dump(n, "headline reference workload",
        graft.SparkEntry.queries(n)(spark, dir))

    // ——— table-format surfaces (scratch table) ———
    val fmt = "graft.sources.GraftParquetTableProvider"
    val wh = java.nio.file.Files.createTempDirectory("graft_plandump_")
      .toFile.getAbsolutePath
    val table = s"$wh/ns/t"
    spark.conf.set("spark.sql.catalog.graft_pd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_pd.warehouse", wh)
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "n_chars").repartition(4)
      .write.format(fmt).option("path", table).mode("append").save()

    dump("dsv2 pushdown scan",
      "PushedFilters + pruned ReadSchema reach the connector scan",
      spark.read.format(fmt).option("path", table).load()
        .filter(col("n_chars") > 100).select("doc_id"))

    spark.conf.set(graft.sources.GraftParquetTable.ModeConf, "merge-on-read")
    try {
      println("\n## merge-on-read SQL UPDATE (WriteDelta plan)\n\n" +
        "row identity (_graft_file,_graft_pos) flows to the delta " +
        "writer; no ReplaceData rewrite\n\n```")
      println(spark.sql("EXPLAIN UPDATE graft_pd.ns.t SET n_chars = 0 " +
        "WHERE doc_id = 42").head.getString(0).trim)
      println("```")
      spark.sql("DELETE FROM graft_pd.ns.t WHERE doc_id % 97 = 0")
    } finally spark.conf.set(
      graft.sources.GraftParquetTable.ModeConf, "copy-on-write")

    dump("scan over a DV'd table",
      "DeleteFiles/DeletePositions reported; footer-only agg demoted",
      spark.read.format(fmt).option("path", table).load())

    spark.sql("ALTER TABLE graft_pd.ns.t RENAME COLUMN n_chars TO cc")
    dump("filter on a RENAMED column",
      "pushed filter translates per file through the alias chain " +
        "(logical name in the plan; physical resolution in the reader)",
      spark.read.format(fmt).option("path", table).load()
        .filter(col("cc") > 100))

    graft.sources.GraftBloom.build(spark, table, Seq("doc_id"))
    dump("point lookup on a BLOOMED column",
      "BloomProbes in the scan node: planning probes the per-file " +
        "sidecars for every equality value on files the zone maps " +
        "could not refute — refuted files are never scheduled",
      spark.read.format(fmt).option("path", table).load()
        .filter(col("doc_id") === 251))

    // partitioned + clustered: distribution AND order from storage
    val t2 = s"$wh/ns/t2"
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "n_chars")
      .write.format(fmt).option("path", t2)
      .option("partitionBy", "lang").mode("append").save()
    graft.sources.GraftMaintenance.compact(spark, t2,
      clusterBy = Seq("doc_id"))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    dump("window over a PARTITIONED + CLUSTERED table",
      "KeyGroupedPartitioning satisfies the window's distribution and " +
        "the version-pinned sort claim (SupportsReportOrdering) its " +
        "order — ZERO Exchange, ZERO Sort in the whole plan",
      spark.read.format(fmt).option("path", t2).load()
        .withColumn("rn", org.apache.spark.sql.functions.row_number()
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy("lang").orderBy("doc_id"))))

    // co-partitioned fact × dim: the storage-partitioned join
    val t3 = s"$wh/ns/t3"
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "n_chars")
      .groupBy("lang").agg(org.apache.spark.sql.functions
        .max(col("n_chars")).as("max_chars"))
      .write.format(fmt).option("path", t3)
      .option("partitionBy", "lang").mode("append").save()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    dump("co-partitioned fact JOIN dim (storage-partitioned join)",
      "both sides report KeyGroupedPartitioning on the join key, so " +
        "the join plans with ZERO Exchange on either side (broadcast " +
        "disabled to prove the zero comes from the LAYOUT) — the " +
        "co-located fact×dim shape that re-hashes nothing at 100 TB",
      spark.read.format(fmt).option("path", t2).load()
        .join(spark.read.format(fmt).option("path", t3).load(), "lang")
        .select("doc_id", "max_chars"))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    spark.stop()
  }
}
