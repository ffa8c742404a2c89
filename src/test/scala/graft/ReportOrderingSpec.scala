package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SortExec
import graft.sources.GraftMaintenance

/** Reported per-split ordering after clustered compaction
  * ([[org.apache.spark.sql.connector.read.SupportsReportOrdering]] on
  * the scan, pinned to the compacted version by
  * [[GraftMaintenance.SortSpecFile]]): consumers' Sort nodes vanish,
  * any later write lapses the claim, and results never change. */
class ReportOrderingSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"

  private def events = spark.read.parquet(s"$sfDir/events.parquet")
    .select(col("event_id"), col("user_id"), col("value"))

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

  private def mkClustered(name: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_ord_${name}_" +
      java.util.UUID.randomUUID().toString
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).deleteOnExit(hp)
    events.repartition(4).write.format(fmt).option("path", p)
      .mode("append").save()
    GraftMaintenance.compact(spark, p,
      targetFileBytes = graft.sources.GraftParquetV2.totalFileBytes(p) / 4,
      clusterBy = Seq("event_id"))
    p
  }

  test("sortWithinPartitions on the cluster key plans NO SortExec") {
    val p = mkClustered("s1")
    val sorted = read(p).sortWithinPartitions("event_id")
    // execute first (AQE finalizes stages), then audit the plan
    val n = sorted.count()
    assert(n == events.count())
    assert(sortNodes(sorted) == 0,
      "reported ordering must eliminate the redundant per-partition " +
        s"sort:\n${sorted.queryExecution.executedPlan}")
    // negative control: a DIFFERENT key still sorts
    val other = read(p).sortWithinPartitions("value")
    other.count()
    assert(sortNodes(other) > 0, "unclaimed key must keep its Sort")
  }

  test("any write lapses the claim; re-compaction re-claims") {
    val p = mkClustered("s2")
    assert(GraftMaintenance.readSortSpec(p).isDefined)
    events.limit(7).coalesce(1).write.format(fmt).option("path", p)
      .mode("append").save()
    val sorted = read(p).sortWithinPartitions("event_id")
    sorted.count()
    assert(sortNodes(sorted) > 0,
      "an appended (unsorted) file must void the ordering claim")
    GraftMaintenance.compact(spark, p, clusterBy = Seq("event_id"))
    val again = read(p).sortWithinPartitions("event_id")
    again.count()
    assert(sortNodes(again) == 0, "re-compaction must re-claim")
  }

  test("time travel straight to the clustered version keeps the claim") {
    val p = mkClustered("s3")
    val v = graft.sources.GraftTableLog.latestVersion(p).get
    events.limit(7).coalesce(1).write.format(fmt).option("path", p)
      .mode("append").save()
    val pinned = spark.read.format(fmt).option("path", p)
      .option("versionAsOf", v.toString).load()
      .sortWithinPartitions("event_id")
    pinned.count()
    assert(sortNodes(pinned) == 0,
      "the pinned clustered version is still provably sorted")
    // and the PRE-compaction version claims nothing
    val pre = spark.read.format(fmt).option("path", p)
      .option("versionAsOf", (v - 1).toString).load()
      .sortWithinPartitions("event_id")
    pre.count()
    assert(sortNodes(pre) > 0)
  }

  test("partitioned + clustered: a window runs with ZERO exchange and ZERO sort") {
    // the full layout story: col=value dirs give KeyGroupedPartitioning
    // (distribution from storage), clustered compaction gives per-file
    // ordering (sort from storage) — a windowed consumer then needs NO
    // exchange and NO sort, the plan a 100 TB session-analytics query
    // wants
    val p = s"${sys.props("java.io.tmpdir")}/graft_ord_pc_" +
      java.util.UUID.randomUUID().toString
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).deleteOnExit(hp)
    events.withColumn("bucket", pmod(col("user_id"), lit(4)))
      .write.format(fmt).option("path", p).option("partitionBy", "bucket")
      .mode("append").save()
    GraftMaintenance.compact(spark, p, clusterBy = Seq("event_id"))
    def exchanges(df: DataFrame): Int = {
      def walk(x: org.apache.spark.sql.execution.SparkPlan): Int =
        x.collect {
          case _: org.apache.spark.sql.execution.exchange
              .ShuffleExchangeLike => 1
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => walk(q.plan)
        }.sum
      walk(df.queryExecution.executedPlan)
    }
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      import org.apache.spark.sql.expressions.Window
      val w = read(p).withColumn("rn", row_number().over(
        Window.partitionBy("bucket").orderBy("event_id")))
      val got = w.collect()
      assert(got.length == events.count())
      assert(exchanges(w) == 0,
        s"layout must satisfy the window's distribution:\n${w.queryExecution}")
      assert(sortNodes(w) == 0,
        s"claimed ordering must satisfy the window's sort:\n${w.queryExecution}")
      // the numbers are right: rn restarts per bucket in event order
      val byBucket = got.groupBy(_.getAs[Long]("bucket"))
      byBucket.values.foreach { rs =>
        val sorted = rs.sortBy(_.getAs[Long]("event_id"))
        assert(sorted.zipWithIndex.forall { case (r, i) =>
          r.getAs[Int]("rn") == i + 1 })
      }
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None =>
        spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  /** A pushed TopN drains its per-file heap WORST-FIRST (sound only
    * because Spark's retained global Sort re-orders) — so the scan must
    * NEVER simultaneously claim per-partition ordering: the claim would
    * let RemoveRedundantSorts elide exactly the Sort that restores
    * order. The plain scan on the same clustered table keeps the claim
    * (guarding the other direction — the fix must not lapse it). */
  test("pushed TopN drops the ordering claim; plain scans keep it") {
    val p = mkClustered("s5")
    def scanOf(df: DataFrame) = {
      val plans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec => b.scan
      }
      assert(plans.nonEmpty, "expected a BatchScanExec in the plan")
      plans.head.asInstanceOf[
        org.apache.spark.sql.connector.read.SupportsReportOrdering]
    }
    val topN = read(p).orderBy("event_id").limit(5)
    assert(topN.queryExecution.toString.contains("event_id"),
      "sanity: the query references the sort key")
    assert(scanOf(topN).outputOrdering().isEmpty,
      "a scan with a pushed TopN must not claim sorted output")
    val plain = read(p).select("event_id")
    assert(scanOf(plain).outputOrdering().nonEmpty,
      "the clustered table's plain scan keeps its ordering claim")
    // end-to-end: the TopN result equals the true ascending head
    val expected = read(p).select("event_id").collect()
      .map(_.getLong(0)).sorted.take(5).toSeq
    assert(topN.select("event_id").collect().map(_.getLong(0)).toSeq
      == expected)
  }

  test("ordered results are identical with and without the claim") {
    val p = mkClustered("s4")
    val claimed = read(p).sortWithinPartitions("event_id")
      .select("event_id").collect().map(_.getLong(0))
    // voiding the spec forces a real sort; per-partition content is
    // identical (same files, same split order), so so are the rows
    val f = new org.apache.hadoop.fs.Path(p,
      GraftMaintenance.SortSpecFile)
    f.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(f, false)
    // fresh path string defeats the in-JVM spec cache
    val p2 = new java.io.File(p).getAbsolutePath + "/."
    val forced = spark.read.format(fmt).option("path", p2).load()
      .sortWithinPartitions("event_id")
      .select("event_id").collect().map(_.getLong(0))
    assert(claimed.toSeq == forced.toSeq,
      "claimed ordering must equal a physically executed sort")
  }
}
