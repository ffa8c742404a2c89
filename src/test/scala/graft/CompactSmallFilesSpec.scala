package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{GraftMaintenance, GraftParquetV2, GraftTableLog}

/** Incremental compaction ([[graft.sources.GraftMaintenance
  * .compactSmallFiles]]): only the small-file tail is read and
  * rewritten — right-sized files survive by BASENAME — candidates
  * fold their deletion vectors in, packing never crosses partition
  * directories, and below `minInputFiles` the call is a provable
  * no-op. End-to-end SQL gate: `q_sql_compact_small`. */
class CompactSmallFilesSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_csf_$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "n_chars")

  private def append(t: String, df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format(fmt).option("path", t).mode("append").save()

  private def contents(t: String) =
    spark.read.format(fmt).option("path", t).load()
      .orderBy("doc_id").collect().toSeq

  test("packs the small tail; right-sized files survive untouched") {
    val t = tmp("pack")
    // one "big" file (the bulk), then a tail of small appends
    append(t, docs.filter(col("doc_id") % 4 =!= 0).coalesce(1))
    (0 until 4).foreach(k =>
      append(t, docs.filter(col("doc_id") % 16 === k * 4).coalesce(1)))
    val before = GraftParquetV2.listFiles(t)
    val sizes = before.map(f => f ->
      new java.io.File(f.stripPrefix("file:")).length).toMap
    val big = sizes.maxBy(_._2)._1
    val expect = contents(t)
    // target sized so the bulk file is "right-sized" and the tail isn't
    val v = GraftMaintenance.compactSmallFiles(spark, t,
      targetFileBytes = sizes(big) + 1)
    val after = GraftParquetV2.listFiles(t)
    assert(after.contains(big),
      "the right-sized file must survive the rewrite BY NAME")
    assert(after.size < before.size, "the tail must pack")
    assert(contents(t) == expect, "rows untouched")
    assert(GraftTableLog.latestVersion(t).contains(v))
    // idempotent: the packed tail is now one right-sized-enough file
    val v2 = GraftMaintenance.compactSmallFiles(spark, t,
      targetFileBytes = sizes(big) + 1)
    assert(v2 == v, "nothing left to pack: provable no-op, same version")
  }

  test("below minInputFiles is a no-op; DVs fold into the packed file") {
    val cat = "graft_csf_spec"
    val warehouse = tmp("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    val t = s"$warehouse/corp/dv"
    append(t, docs.filter(col("doc_id") % 4 === 0).coalesce(1))
    append(t, docs.filter(col("doc_id") % 4 === 1).coalesce(1))
    val v0 = GraftTableLog.latestVersion(t).get
    assert(GraftMaintenance.compactSmallFiles(spark, t,
      targetFileBytes = 1L << 30, minInputFiles = 3) == v0,
      "two candidates under minInputFiles=3 must not rewrite")
    // MOR delete → DV sidecar on a small file; packing must fold it in
    spark.conf.set(graft.sources.GraftParquetTable.ModeConf, "merge-on-read")
    try spark.sql(s"DELETE FROM $cat.corp.dv WHERE doc_id % 8 = 0")
    finally spark.conf.set(
      graft.sources.GraftParquetTable.ModeConf, "copy-on-write")
    assert(graft.sources.GraftDeletes.liveDvFiles(t).nonEmpty,
      "fixture: the MOR delete must land as a DV sidecar")
    val expect = contents(t)
    GraftMaintenance.compactSmallFiles(spark, t, targetFileBytes = 1L << 30)
    assert(contents(t) == expect,
      "deletion vectors must not resurrect through the packed rewrite")
    assert(GraftParquetV2.listFiles(t).size == 1)
  }

  test("packing never merges across partition directories") {
    val t = tmp("part")
    def part(k: Int) = docs.filter(col("doc_id") % 4 === k)
      .withColumn("bucket", (col("doc_id") % 2).cast("int"))
    (0 until 4).foreach(k =>
      part(k).coalesce(1).write.format(fmt).option("path", t)
        .option("partitionBy", "bucket").mode("append").save())
    val expect = spark.read.format(fmt).option("path", t).load()
      .orderBy("doc_id").collect().toSeq
    GraftMaintenance.compactSmallFiles(spark, t, targetFileBytes = 1L << 30)
    val after = GraftParquetV2.listFiles(t)
    assert(after.size == 2, s"one packed file per partition dir: $after")
    assert(after.forall(f => f.contains("bucket=0") || f.contains("bucket=1")),
      "packed files must stay inside their partition directories")
    assert(spark.read.format(fmt).option("path", t).load()
      .orderBy("doc_id").collect().toSeq == expect)
  }
}
