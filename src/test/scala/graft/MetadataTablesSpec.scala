package graft

import org.apache.spark.sql.functions._
import graft.sources.GraftParquetTable

/** SQL metadata tables ([[graft.sources.GraftMetadataTables]]):
  * `.history` / `.files` / `.tags` as ordinary relations — content
  * parity with the log/manifest, composability (joins, filters), and
  * the no-shadowing rule. */
class MetadataTablesSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"
  private val cat = "graft_meta_spec"
  private lazy val warehouse = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_meta_warehouse_").toFile.getAbsolutePath
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "n_chars")

  test("history/files/tags read as ordinary SQL relations") {
    val p = s"$warehouse/corp/m1"
    docs.filter(col("doc_id") < 100).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    docs.filter(col("doc_id") >= 100).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    spark.sql(s"CALL $cat.system.tag(table => 'corp.m1', " +
      "name => 'train', version => 1)")

    val hist = spark.sql(s"SELECT version, files, row_count " +
      s"FROM $cat.corp.m1.history ORDER BY version").collect()
    assert(hist.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq((1L, 1, 100L), (2L, 2, docs.count())))

    val files = spark.sql(s"SELECT file, bytes, row_count, dv_positions " +
      s"FROM $cat.corp.m1.files ORDER BY file").collect()
    assert(files.length == 2)
    assert(files.forall(_.getLong(1) > 0))
    assert(files.map(_.getLong(2)).sum == docs.count())
    assert(files.forall(_.getLong(3) == 0L))

    val tags = spark.sql(
      s"SELECT name, version FROM $cat.corp.m1.tags").collect()
    assert(tags.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("train", 1L)))

    spark.sql(s"CALL $cat.system.add_constraint(table => 'corp.m1', " +
      "name => 'chars_pos', expression => 'n_chars >= 0')")
    val cks = spark.sql(
      s"SELECT name, expression FROM $cat.corp.m1.constraints").collect()
    assert(cks.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("chars_pos", "n_chars >= 0")))

    // composable: join files against history in one statement
    val joined = spark.sql(
      s"""SELECT h.version, count(f.file) AS n
         |FROM $cat.corp.m1.history h
         |CROSS JOIN $cat.corp.m1.files f
         |GROUP BY h.version ORDER BY h.version""".stripMargin).collect()
    assert(joined.map(_.getLong(1)).forall(_ == 2L))
  }

  test("files surfaces DV volumes; history row_count tracks deletes") {
    val p = s"$warehouse/corp/m2"
    docs.coalesce(1).write.format(fmt).option("path", p)
      .mode("append").save()
    spark.conf.set(GraftParquetTable.ModeConf, "merge-on-read")
    try spark.sql(s"DELETE FROM $cat.corp.m2 WHERE doc_id IN (1, 2, 3)")
    finally spark.conf.set(GraftParquetTable.ModeConf, "copy-on-write")
    val f = spark.sql(s"SELECT dv_positions FROM $cat.corp.m2.files")
      .collect()
    assert(f.map(_.getLong(0)).sum == 3L)
    val head = spark.sql(s"SELECT row_count FROM $cat.corp.m2.history " +
      "ORDER BY version DESC LIMIT 1").head()
    assert(head.getLong(0) == docs.count() - 3)
  }

  test("t.partitions: per-value rollup; DVs shrink row_count; flat files group under ''") {
    val p = s"$warehouse/corp/m4"
    // one flat file + a partitioned generation
    docs.limit(10).coalesce(1).write.format(fmt).option("path", p)
      .mode("append").save()
    docs.filter(org.apache.spark.sql.functions.col("doc_id") >= 10)
      .limit(30).coalesce(1).write.format(fmt).option("path", p)
      .option("partitionBy", "lang").mode("append").save()
    val rows = spark.sql(s"SELECT partition, files, bytes, row_count, " +
      s"dv_positions FROM $cat.corp.m4.partitions ORDER BY partition")
      .collect()
    val byPart = rows.map(r => r.getString(0) ->
      (r.getInt(1), r.getLong(3), r.getLong(4))).toMap
    assert(byPart.contains(""), "flat files group under ''")
    assert(byPart("")._2 == 10L)
    val langs = docs.filter(
      org.apache.spark.sql.functions.col("doc_id") >= 10).limit(30)
      .groupBy("lang").count().collect()
      .map(r => s"lang=${r.getString(0)}" -> r.getLong(1)).toMap
    langs.foreach { case (part, n) =>
      assert(byPart.get(part).exists(_._2 == n),
        s"$part expected $n rows, got ${byPart.get(part)}")
    }
    assert(rows.forall(_.getLong(2) > 0L), "bytes reported")
    // a MOR delete in the flat file shrinks ITS partition's row_count
    spark.conf.set(GraftParquetTable.ModeConf, "merge-on-read")
    try spark.sql(s"DELETE FROM $cat.corp.m4 WHERE doc_id = 1")
    finally spark.conf.set(GraftParquetTable.ModeConf, "copy-on-write")
    val after = spark.sql(s"SELECT row_count, dv_positions FROM " +
      s"$cat.corp.m4.partitions WHERE partition = ''").head()
    assert(after.getLong(0) == 9L && after.getLong(1) == 1L)
  }

  test("a REAL table named 'history' wins over the metadata table") {
    val p = s"$warehouse/corp/m3"
    docs.limit(5).coalesce(1).write.format(fmt).option("path", p)
      .mode("append").save()
    // a genuine table AT ns [corp, m3] named history
    docs.limit(2).coalesce(1).write.format(fmt)
      .option("path", s"$warehouse/corp/m3/history")
      .mode("append").save()
    val got = spark.sql(s"SELECT * FROM $cat.corp.m3.history").collect()
    assert(got.length == 2,
      "the real table must shadow the metadata relation")
    // and an unknown metadata name still refuses loudly
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.corp.m3.nope").collect())
    assert(e.getMessage.toLowerCase.contains("table"))
  }
}
