package graft

import org.apache.spark.sql.functions._
import graft.sources.{GraftBloom, GraftScanTelemetry}

/** File pruning × the broadcast-free join paths — the 100 TB star
  * shapes where the fact table must never re-read dead files:
  *
  *   - broadcast OFF, sort-merge join: the dim's selective key set
  *     reaches the fact scan as an `In(joinKey, …)` (static propagation
  *     / DPP with broadcast reuse disabled) and the `_graft_bloom`
  *     sidecars drop whole hash-scattered fact files the zone maps are
  *     blind to;
  *   - the STORAGE-PARTITIONED join: a runtime `In(partition key, …)`
  *     re-plans a KEY-GROUPED scan — whole groups drop, and Spark's SPJ
  *     regrouping (pushPartValues) must still execute shuffle-free on
  *     the surviving groups. A group-dropping re-plan that broke the
  *     key-grouped contract would throw or re-shuffle; this pins both.
  */
class SpjBloomSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"
  private lazy val warehouse = java.nio.file.Files
    .createTempDirectory("graft_spjbloom_").toFile.getAbsolutePath

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
    p.collect {
      case _: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeLike => 1
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive
          .QueryStageExec => shuffles(q.plan)
    }.sum

  private def read(p: String) =
    spark.read.format(fmt).option("path", p).load()

  test("broadcast-off SMJ: dim In-keys bloom-skip zone-blind fact files") {
    // status-partitioned fact, 4 hash-bucketed files per status on id:
    // every file's id min/max spans the domain, so inside a surviving
    // status dir only the id sidecars can prune
    val fact = s"$warehouse/smj/fact"
    val rows = spark.range(8000L).select(
      col("id"),
      (pmod(col("id"), lit(2)) === 0).cast("string").as("status"),
      (col("id") * 3).as("v"))
    (0 until 4).foreach { b =>
      rows.filter(pmod(hash(col("id")), lit(4)) === b).coalesce(1)
        .write.format(fmt).option("path", fact)
        .option("partitionBy", "status").mode("append").save()
    }
    GraftBloom.build(spark, fact, Seq("id"))
    val bucket0 = rows
      .filter(pmod(hash(col("id")), lit(4)) === 0 &&
        col("status") === "true")
      .select("id").orderBy("id").collect().map(_.getLong(0))
    val keys = bucket0.slice(bucket0.length / 2, bucket0.length / 2 + 5)
    val dim = s"$warehouse/smj/dim"
    rows.select(col("id"), col("status"),
        concat(lit("d"), col("id")).as("name"))
      .coalesce(1).write.format(fmt).option("path", dim)
      .option("partitionBy", "status").mode("append").save()
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly"
        -> "false") {
      val dimSel = read(dim)
        .filter(col("id").isin(keys.map(Long.box): _*))
      GraftScanTelemetry.reset()
      val j = read(fact).join(dimSel, Seq("status", "id"))
        .select("id", "v", "name")
      val got = j.collect().map(_.getLong(0)).toSet
      assert(got == keys.toSet, s"join rows wrong: $got vs ${keys.toSet}")
      // interior keys: invisible to zone maps, fatal to keyless files —
      // at minimum the 3 other hash buckets of the surviving status
      assert(GraftScanTelemetry.bloomSkippedFiles.sum() >= 3,
        s"expected >=3 bloom-skipped fact files, got " +
          s"${GraftScanTelemetry.bloomSkippedFiles.sum()}")
    }
  }

  test("SPJ survives a group-dropping runtime filter, shuffle-free") {
    // fact and dim co-located on status; the dim holds rows for ONE of
    // the two statuses, discoverable only at runtime (its filter is on
    // id — catalyst cannot infer the status set statically)
    val fact = s"$warehouse/spj/fact"
    val dim = s"$warehouse/spj/dim"
    // fact fat enough that DPP's benefit estimate beats the dim
    // subquery's overhead at spec scale (md5 pad)
    val rows = spark.range(100000L).select(
      col("id"),
      (pmod(col("id"), lit(2)) === 0).cast("string").as("status"),
      (col("id") * 3).as("v"),
      md5(col("id").cast("string")).as("pad"))
    (0 until 2).foreach { half => // 2 files per status dir
      rows.filter(pmod(col("id"), lit(4)) < 2 === (half == 0))
        .coalesce(1).write.format(fmt).option("path", fact)
        .option("partitionBy", "status").mode("append").save()
    }
    // dim: even ids only -> every dim row is status=true
    rows.filter(pmod(col("id"), lit(2)) === 0).limit(1000)
      .select(col("id").as("did"), col("status"),
        concat(lit("d"), col("id")).as("name"))
      .coalesce(1).write.format(fmt).option("path", dim)
      .option("partitionBy", "status").mode("append").save()
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly"
        -> "false",
      // tiny test tables: decide benefit by the fallback ratio, not
      // size estimates that round to "not worth it" at spec scale
      "spark.sql.optimizer.dynamicPartitionPruning.useStats"
        -> "false",
      // DPP only sees a dim whose selective filter survives as a
      // logical Filter node — the star-join opt-in
      "spark.graft.dpp.selectiveResiduals" -> "true") {
      // the filter is on a NON-join column, so catalyst cannot
      // propagate it statically — only runtime pruning can reach the
      // fact side
      val dimSel = read(dim).filter(col("name").startsWith("d1"))
      GraftScanTelemetry.reset()
      val j = read(fact).join(dimSel, Seq("status"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val out = j.collect()
      // only status=true joins; every (fact true-row × dim sel-row)
      val factTrue = 50000L
      val dimSelRows = dimSel.count()
      assert(out.length == 1 && out(0).getString(0) == "true")
      assert(out(0).getLong(1) == factTrue * dimSelRows,
        s"group-dropped join cardinality wrong: ${out(0)}")
      // the SPJ held: no exchange anywhere in the final plan
      assert(shuffles(j.queryExecution.executedPlan) == 0,
        s"co-partitioned join must stay shuffle-free under a " +
          s"group-dropping runtime filter:\n" +
          j.queryExecution.executedPlan)
      // and the dead group's files were PRUNED at the re-plan (the
      // partition-value zone maps refute the runtime In) — not read
      // and discarded by the join
      assert(GraftScanTelemetry.skippedFiles.sum() >= 2,
        s"the status=false group's files must be skipped by the " +
          s"runtime filter, skipped=" +
          s"${GraftScanTelemetry.skippedFiles.sum()}")
    }
  }
}
