package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SortExec
import graft.sources.{GraftMaintenance, GraftParquetV2, GraftTableLog}

/** Incremental re-clustering
  * ([[graft.sources.GraftMaintenance.recluster]]): only the files
  * appended since the clustered version are rewritten (cost ∝ tail),
  * the ordering claim re-pins at the new head and is PHYSICALLY true
  * (zero Sort plans return genuinely sorted partitions), the
  * clustered generation's files survive untouched, the no-tail case
  * is a metadata-only repair, and a spec-less table refuses. */
class ReclusterSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"

  private def events = spark.read.parquet(s"$sfDir/events.parquet")
    .select(col("event_id"), col("user_id"), col("value"))

  private def tmp(name: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_recluster_${name}_" +
      java.util.UUID.randomUUID().toString
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).deleteOnExit(hp)
    p
  }

  private def read(p: String): DataFrame =
    spark.read.format(fmt).option("path", p).load()

  private def sortNodes(df: DataFrame): Int = {
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case _: SortExec => 1
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => count(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => count(q.plan)
      }.sum
    count(df.queryExecution.executedPlan)
  }

  test("tail-only rewrite: claim re-pins, old files untouched, order physically true") {
    val p = tmp("t1")
    events.limit(200).repartition(3).write.format(fmt)
      .option("path", p).mode("append").save()
    GraftMaintenance.compact(spark, p, clusterBy = Seq("event_id"))
    val clustered = GraftParquetV2.listFiles(p)
      .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    // two appends lapse the claim
    events.filter(col("event_id") >= 500).limit(50).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    events.filter(col("event_id") >= 900).limit(50).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    val sorted0 = read(p).sortWithinPartitions("event_id")
    assert(sortNodes(sorted0) > 0, "lapsed claim must plan a real Sort")
    val before = read(p).collect().map(_.getLong(0)).sorted
    val (v, nTail) = GraftMaintenance.recluster(spark, p)
    assert(nTail == 2, s"exactly the 2 appended files rewrite, got $nTail")
    assert(GraftTableLog.latestVersion(p).contains(v))
    assert(GraftMaintenance.readSortSpec(p).contains((v, Seq("event_id"))))
    val after = GraftParquetV2.listFiles(p)
      .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    assert(clustered.subsetOf(after),
      "the clustered generation's files must survive untouched")
    // the re-pinned claim elides the Sort AND the rows really are
    // sorted within every partition
    val claimed = read(p).sortWithinPartitions("event_id")
    assert(sortNodes(claimed) == 0,
      s"re-pinned claim must elide the Sort:\n${claimed.queryExecution}")
    import org.apache.spark.sql.functions.spark_partition_id
    val perPart = claimed.select(col("event_id"),
      spark_partition_id().as("pid")).collect()
      .groupBy(_.getInt(1)).values
    perPart.foreach { rs =>
      val ids = rs.map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, "claimed order must be physically true")
    }
    assert(read(p).collect().map(_.getLong(0)).sorted.toSeq ==
      before.toSeq, "recluster must not change a single row")
  }

  test("no tail: metadata-only repair re-pins at the head") {
    val p = tmp("t2")
    events.limit(100).coalesce(1).write.format(fmt)
      .option("path", p).mode("append").save()
    val v0 = GraftMaintenance.compact(spark, p, clusterBy = Seq("event_id"))
    val (v, n) = GraftMaintenance.recluster(spark, p)
    assert(n == 0 && v == v0, "clustered head is a free no-op")
  }

  test("spec-less table refuses with a pointer at compact") {
    val p = tmp("t3")
    events.limit(20).coalesce(1).write.format(fmt)
      .option("path", p).mode("append").save()
    val e = intercept[IllegalArgumentException](
      GraftMaintenance.recluster(spark, p))
    assert(e.getMessage.contains("compact"))
  }

  test("MOR deletes survive: tail folds its DVs, clustered files keep theirs") {
    val cat = "graft_rc_spec"
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft_rc_warehouse_").toFile.getAbsolutePath
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    val p = s"$warehouse/corp/t4"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    docs.limit(100).coalesce(1).write.format(fmt)
      .option("path", p).mode("append").save()
    GraftMaintenance.compact(spark, p, clusterBy = Seq("doc_id"))
    docs.filter(col("doc_id") >= 100).limit(50).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    // one MOR delete in the clustered file, one in the tail
    spark.conf.set(graft.sources.GraftParquetTable.ModeConf,
      "merge-on-read")
    try spark.sql(s"DELETE FROM $cat.corp.t4 WHERE doc_id IN (5, 120)")
    finally spark.conf.set(graft.sources.GraftParquetTable.ModeConf,
      "copy-on-write")
    val before = read(p).collect().map(_.getLong(0)).toSet
    assert(!before.contains(5L) && !before.contains(120L))
    val (_, n) = GraftMaintenance.recluster(spark, p)
    assert(n >= 1)
    val after = read(p).collect().map(_.getLong(0)).toSet
    assert(after == before,
      "recluster must neither resurrect nor lose MOR-deleted rows")
  }
}
