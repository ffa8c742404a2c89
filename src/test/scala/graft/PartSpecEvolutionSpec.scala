package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.{GraftCatalog, GraftParquetV2, GraftScanTelemetry}

/** Partition-spec EVOLUTION (`CALL system.set_partition_spec`): the
  * persisted spec changes for FUTURE writes; existing files keep — and
  * stay prunable under — their own directory layout (per-file spec,
  * directory-encoded); rewrites route by the DECLARED spec
  * ([[GraftCatalog.effectivePartCols]]); compact migrates the whole
  * table to the new layout; empty spec unpartitions future writes. */
class PartSpecEvolutionSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"
  private val cat = "graft_pse_spec"
  private lazy val warehouse = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_pse_warehouse_").toFile.getAbsolutePath
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "n_chars")

  private def read(p: String) =
    spark.read.format(fmt).option("path", p).load()

  test("evolve flat → partitioned: future writes route, old files stay, both prune") {
    warehouse
    val p = s"$warehouse/corp/e1"
    docs.limit(40).coalesce(1).write.format(fmt).option("path", p)
      .mode("append").save() // flat generation
    val out = spark.sql(s"CALL $cat.system.set_partition_spec(" +
      "table => 'corp.e1', partition_by => 'lang')").head()
    assert(out.getString(0) == "" && out.getString(1) == "lang")
    // new writes land under lang=…; the flat file is untouched
    docs.filter(col("doc_id") >= 40).limit(40).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    val files = GraftParquetV2.listFiles(p)
    val specs = files.map(f => GraftParquetV2.partitionSpec(p, f))
    assert(specs.exists(_.isEmpty), "the old flat file survives")
    assert(specs.exists(_.map(_._1) == Seq("lang")),
      "new files route under lang=…")
    assert(read(p).count() == 80)
    // partition pruning on the NEW files still works (per-file spec):
    // a lang filter must skip every new file of another lang, while
    // the flat file is conservatively read
    val langs = docs.limit(40).select("lang").distinct()
      .collect().map(_.getString(0))
    if (langs.length >= 2) {
      GraftScanTelemetry.reset()
      val one = read(p).filter(col("lang") === langs.head)
      assert(one.count() ==
        read(p).collect().count(_.getString(1) == langs.head))
    }
    // detail reports the evolved spec
    val detail = spark.sql(
      s"CALL $cat.system.detail(table => 'corp.e1')").head()
    assert(detail.getString(detail.fieldIndex("partition_spec")) == "lang")
  }

  test("compact migrates the mixed table to the declared layout") {
    warehouse
    val p = s"$warehouse/corp/e2"
    docs.limit(30).coalesce(1).write.format(fmt).option("path", p)
      .mode("append").save()
    spark.sql(s"CALL $cat.system.set_partition_spec(" +
      "table => 'corp.e2', partition_by => 'lang')")
    docs.filter(col("doc_id") >= 30).limit(30).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    // mixed layout: keyedLayout (the uniform-layout claim) must lapse
    assert(GraftParquetV2.keyedLayout(p, read(p).schema).isEmpty)
    val before = read(p).collect().map(_.getLong(0)).sorted
    spark.sql(s"CALL $cat.system.compact(table => 'corp.e2')")
    // every file now sits under the declared lang=… layout
    val specs = GraftParquetV2.listFiles(p)
      .map(f => GraftParquetV2.partitionSpec(p, f))
    assert(specs.nonEmpty && specs.forall(_.map(_._1) == Seq("lang")),
      s"compact must migrate to the declared spec, got $specs")
    assert(GraftParquetV2.keyedLayout(p, read(p).schema).isDefined,
      "the uniform-layout claim returns after migration")
    assert(read(p).collect().map(_.getLong(0)).sorted.toSeq ==
      before.toSeq, "migration must not change a single row")
  }

  test("UPDATE and DELETE on a mixed-layout table route by the declared spec") {
    warehouse
    val p = s"$warehouse/corp/e3"
    docs.limit(20).coalesce(1).write.format(fmt).option("path", p)
      .mode("append").save()
    spark.sql(s"CALL $cat.system.set_partition_spec(" +
      "table => 'corp.e3', partition_by => 'lang')")
    docs.filter(col("doc_id") >= 20).limit(20).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    // a COW update touching the FLAT file rewrites it under lang=…
    spark.sql(s"UPDATE $cat.corp.e3 SET n_chars = 0 WHERE doc_id = 1")
    assert(read(p).filter(col("doc_id") === 1).head().getLong(2) == 0L)
    assert(read(p).count() == 40)
    spark.sql(s"DELETE FROM $cat.corp.e3 WHERE doc_id = 2")
    assert(read(p).count() == 39)
  }

  test("unpartition: empty spec makes future writes flat again") {
    warehouse
    val p = s"$warehouse/corp/e4"
    spark.sql(s"CREATE TABLE $cat.corp.e4 " +
      "(doc_id BIGINT, lang STRING, n_chars BIGINT) " +
      s"USING graft PARTITIONED BY (lang)")
    docs.limit(10).write.insertInto(s"$cat.corp.e4")
    val out = spark.sql(s"CALL $cat.system.set_partition_spec(" +
      "table => 'corp.e4', partition_by => '')").head()
    assert(out.getString(0) == "lang" && out.getString(1) == "")
    docs.filter(col("doc_id") >= 10).limit(10).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    val specs = GraftParquetV2.listFiles(p)
      .filterNot(_.contains("-schema.parquet"))
      .map(f => GraftParquetV2.partitionSpec(p, f))
    assert(specs.exists(_.isEmpty), "post-evolution writes land flat")
    assert(specs.exists(_.nonEmpty), "pre-evolution files keep lang=…")
    assert(read(p).count() == 20)
  }

  /** DDL-declared tables carry a flat zero-row SCHEMA CARRIER at the
    * root; a carrier must not make the table "mixed" — it holds no
    * rows, so the keyed-layout claim (KeyGroupedPartitioning → zero
    * exchange for partition-key grouping) stays up from the FIRST
    * insert, not only after a compaction. */
  test("schema carriers do not lapse the keyed-layout claim") {
    warehouse
    val p = s"$warehouse/corp/e6"
    spark.sql(s"CREATE TABLE $cat.corp.e6 " +
      "(doc_id BIGINT, lang STRING, n_chars BIGINT) " +
      "USING graft PARTITIONED BY (lang)")
    docs.limit(30).write.insertInto(s"$cat.corp.e6")
    // the carrier is there AND the claim holds
    val files = GraftParquetV2.listFiles(p)
    assert(files.exists(_.endsWith("-schema.parquet")),
      "precondition: the zero-row carrier is part of the live listing")
    val layout = GraftParquetV2.keyedLayout(p, read(p).schema)
    assert(layout.isDefined, "the carrier must not void the layout")
    assert(layout.get._1 == Seq("lang"))
    // a partition-key aggregation plans with ZERO exchange
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
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
      // a WINDOW keyed on the partition column needs ClusteredDistribution
      // on lang — satisfied straight from storage when the claim holds
      // (a groupBy would not show it: aggregate PUSHDOWN rewrites the
      // scan output and deliberately drops the claim)
      import org.apache.spark.sql.expressions.Window
      val w = read(p).withColumn("rn",
        row_number().over(Window.partitionBy("lang").orderBy("doc_id")))
      val got = w.collect()
      assert(got.length == 30)
      val byLang = got.groupBy(_.getString(1))
      byLang.values.foreach { rs =>
        val sorted = rs.sortBy(_.getLong(0))
        assert(sorted.zipWithIndex.forall { case (r, i) =>
          r.getAs[Int]("rn") == i + 1 }, "window numbering must be exact")
      }
      assert(exchanges(w) == 0,
        s"keyed layout must satisfy the window:\n${w.queryExecution}")
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None =>
        spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("refusals: unknown column, non-roundtrip type, every column") {
    warehouse
    val p = s"$warehouse/corp/e5"
    docs.limit(5).coalesce(1).write.format(fmt).option("path", p)
      .mode("append").save()
    def call(cols: String) = spark.sql(
      s"CALL $cat.system.set_partition_spec(" +
        s"table => 'corp.e5', partition_by => '$cols')")
    intercept[Exception](call("nope"))
    intercept[Exception](call("doc_id,lang,n_chars"))
    // spec change is a versioned commit (auditable in history)
    val before = spark.sql(
      s"SELECT count(*) FROM $cat.corp.e5.history").head().getLong(0)
    call("lang")
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.corp.e5.history").head().getLong(0)
      == before + 1, "set_partition_spec must commit a version")
  }
}
