package graft

import org.apache.spark.sql.functions._
import graft.sources.{GraftMaintenance, GraftParquetV2, GraftTableLog}

/** Schema evolution beyond ADD COLUMN: MERGE `mergeSchema=true`
  * auto-evolution ([[graft.sources.GraftMaintenance.merge]]), the
  * refuse-by-default contract for extra source columns, and the
  * newest-file schema inference that makes evolved columns visible on
  * the raw path route. */
class SchemaEvolutionSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "n_chars")

  private def scratch(): String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_evo_").toFile.getAbsolutePath
    s"$d/t"
  }

  test("merge refuses extra source columns by default - no silent drop") {
    val p = scratch()
    docs.write.format(fmt).option("path", p).mode("append").save()
    val src = docs.limit(5).withColumn("extra", lit(1L))
    val e = intercept[IllegalArgumentException](
      GraftMaintenance.merge(spark, p, src, "doc_id"))
    assert(e.getMessage.contains("mergeSchema"))
    // nothing committed: still one version
    assert(GraftTableLog.versions(p) == Seq(1L))
  }

  test("mergeSchema=true evolves the table through the carrier path") {
    val p = scratch()
    docs.filter(col("doc_id") % 2 === 0)
      .write.format(fmt).option("path", p).mode("append").save()
    val src = docs.filter(col("doc_id") % 2 === 1)
      .withColumn("batch", col("doc_id") * 100)
    GraftMaintenance.merge(spark, p, src, "doc_id", mergeSchema = true)
    val head = spark.read.format(fmt).option("path", p).load()
    // the raw-path provider inference picks the newest file, so the
    // evolved column is visible without an explicit schema
    assert(head.schema.fieldNames.contains("batch"))
    val n = docs.count()
    assert(head.count() == n)
    // inserted rows carry their batch value; pre-existing rows read NULL
    assert(head.filter(col("batch").isNotNull).count() == n / 2)
    assert(head.filter(col("doc_id") % 2 === 1)
      .filter(col("batch") =!= col("doc_id") * 100).count() == 0)
    // the widening was its own committed version (carrier), then the
    // merge's rewrite/append: pre-merge time travel presents narrow data
    val widenedAt = GraftTableLog.versions(p).find(_ > 1L).get
    val pre = spark.read.format(fmt).option("path", p)
      .option("versionAsOf", "1").load()
    assert(pre.count() == n / 2 + (if (n % 2 == 1) 1 else 0))
    assert(widenedAt > 1L)
  }

  test("provider schema inference tracks the newest generation") {
    val p = scratch()
    docs.write.format(fmt).option("path", p).mode("append").save()
    // a later append with a widened schema (explicit) — inference must
    // present the wide view afterwards
    docs.limit(3).withColumn("w", lit(7L))
      .write.format(fmt).option("path", p).mode("append").save()
    val inferred = spark.read.format(fmt).option("path", p).load().schema
    assert(inferred.fieldNames.contains("w"))
    assert(GraftParquetV2.schemaSourceFile(p).nonEmpty)
  }
}
