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

  // ——— RENAME / DROP COLUMN (field identity = physical-name chain) ———

  private val cat = "graft_evo_cat"
  private lazy val warehouse = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_evo_wh_").toFile.getAbsolutePath
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  private def mkCatTable(name: String): String = {
    val p = s"$warehouse/corp/$name"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    p
  }

  test("RENAME COLUMN preserves values from pre-rename files; pushdown works") {
    val p = mkCatTable("r1")
    val vPre = GraftTableLog.versions(p).max
    spark.sql(s"ALTER TABLE $cat.corp.r1 RENAME COLUMN n_chars TO char_count")
    val head = spark.sql(s"SELECT doc_id, char_count FROM $cat.corp.r1")
    assert(head.schema.fieldNames.toSeq == Seq("doc_id", "char_count"))
    // values carried from files written under the OLD physical name
    val expect = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = head.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // filter PUSHDOWN on the renamed column translates per file
    val cut = expect.values.toSeq.sorted.apply(expect.size / 2)
    val n = spark.sql(s"SELECT count(*) AS n FROM $cat.corp.r1 " +
      s"WHERE char_count >= $cut").head.getLong(0)
    assert(n == expect.values.count(_ >= cut))
    // VERSION AS OF the pre-rename era presents the OLD name
    val pre = spark.sql(
      s"SELECT * FROM $cat.corp.r1 VERSION AS OF $vPre")
    assert(pre.schema.fieldNames.contains("n_chars"))
    assert(!pre.schema.fieldNames.contains("char_count"))
    assert(pre.count() == expect.size)
    // appends after the rename write the NEW physical name; both
    // generations read under one logical column
    docs.limit(4).withColumnRenamed("n_chars", "char_count")
      .write.format(fmt).option("path", p).mode("append").save()
    assert(spark.sql(s"SELECT count(char_count) FROM $cat.corp.r1")
      .head.getLong(0) == expect.size + 4)
  }

  test("chained renames resolve through the whole alias chain") {
    val p = mkCatTable("r2")
    spark.sql(s"ALTER TABLE $cat.corp.r2 RENAME COLUMN n_chars TO a1")
    spark.sql(s"ALTER TABLE $cat.corp.r2 RENAME COLUMN a1 TO a2")
    val got = spark.sql(s"SELECT sum(a2) AS s FROM $cat.corp.r2")
      .head.getLong(0)
    val expect = docs.agg(sum("n_chars")).head.getLong(0)
    assert(got == expect)
    assert(p.nonEmpty)
  }

  test("DROP COLUMN narrows the schema; re-ADD refused until compaction frees the name") {
    val p = mkCatTable("d1")
    spark.sql(s"ALTER TABLE $cat.corp.d1 DROP COLUMN n_chars")
    val head = spark.sql(s"SELECT * FROM $cat.corp.d1")
    assert(!head.schema.fieldNames.contains("n_chars"))
    assert(head.count() == docs.count())
    // re-adding the name would resurrect old files' values — refused
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.corp.d1 ADD COLUMN n_chars BIGINT"))
    assert(e.getMessage.contains("compact"))
    // compaction rewrites files under the current (narrow) schema,
    // freeing the physical name — the ADD then succeeds, all-null
    GraftMaintenance.compact(spark, p)
    spark.sql(s"ALTER TABLE $cat.corp.d1 ADD COLUMN n_chars BIGINT")
    val re = spark.sql(
      s"SELECT count(*) AS n, count(n_chars) AS k FROM $cat.corp.d1").head
    assert(re.getLong(0) == docs.count() && re.getLong(1) == 0L)
  }

  test("rename refusals: partition columns, live physical collisions, metadata names") {
    val p = s"$warehouse/corp/r3"
    spark.sql(s"""CREATE TABLE $cat.corp.r3
      (doc_id BIGINT, lang STRING, n_chars BIGINT)
      PARTITIONED BY (lang)""")
    docs.limit(10).createOrReplaceTempView("evo_src")
    spark.sql(s"INSERT INTO $cat.corp.r3 SELECT * FROM evo_src")
    val e1 = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.corp.r3 RENAME COLUMN lang TO language"))
    assert(e1.getMessage.contains("partition"))
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.corp.r3 RENAME COLUMN n_chars TO doc_id"))
    assert(e2.getMessage.contains("already exists"))
    val e3 = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.corp.r3 RENAME COLUMN n_chars TO _graft_pos"))
    assert(e3.getMessage.contains("reserved"))
    assert(p.nonEmpty)
  }

  test("COW update and MOR delete stay correct across a rename") {
    val p = mkCatTable("r4")
    spark.sql(s"ALTER TABLE $cat.corp.r4 RENAME COLUMN n_chars TO cc")
    // COW update keyed on the RENAMED column: candidates are old-named
    // files; the grouped logical read must carry their values through
    GraftMaintenance.update(spark, p,
      col("doc_id") % 7 === 0, Map("cc" -> (col("cc") + 1000000L)))
    val expect = docs.collect().map { r =>
      val id = r.getLong(0)
      id -> (r.getLong(2) + (if (id % 7 == 0) 1000000L else 0L))
    }.toMap
    val got = spark.sql(s"SELECT doc_id, cc FROM $cat.corp.r4")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // MOR delete predicated on the renamed column
    spark.conf.set(
      graft.sources.GraftParquetTable.ModeConf, "merge-on-read")
    try {
      val cut = expect.values.min
      spark.sql(s"DELETE FROM $cat.corp.r4 WHERE cc = $cut")
      val left = spark.sql(s"SELECT count(*) AS n FROM $cat.corp.r4")
        .head.getLong(0)
      assert(left == expect.values.count(_ != cut))
    } finally spark.conf.set(
      graft.sources.GraftParquetTable.ModeConf, "copy-on-write")
  }

  test("a refused merge leaves NO schema change behind; evolution obeys ADD COLUMN guards") {
    val p = mkCatTable("m1")
    spark.sql(s"ALTER TABLE $cat.corp.m1 RENAME COLUMN n_chars TO cc")
    val versionsBefore = GraftTableLog.versions(p)
    val schemaBefore = spark.sql(s"SELECT * FROM $cat.corp.m1")
      .schema.fieldNames.toSeq
    // (1) duplicate source keys + a new column: the key refusal must
    // fire BEFORE the widening carrier commits — a failed merge must
    // not mutate the table (the Delta-atomicity contract)
    val dup = docs.limit(2).withColumnRenamed("n_chars", "cc")
      .withColumn("doc_id", lit(1L)).withColumn("fresh", lit(9L))
    val e1 = intercept[IllegalArgumentException](
      GraftMaintenance.merge(spark, p, dup, "doc_id", mergeSchema = true))
    assert(e1.getMessage.contains("duplicate"))
    assert(GraftTableLog.versions(p) == versionsBefore,
      "a refused merge must commit nothing")
    assert(spark.sql(s"SELECT * FROM $cat.corp.m1")
      .schema.fieldNames.toSeq == schemaBefore)
    // (2) an evolved column named like a LIVE PHYSICAL column (the
    // pre-rename n_chars) would leak old values into a new field —
    // the same guard as ALTER TABLE ADD COLUMN refuses it
    val leak = docs.limit(2).withColumnRenamed("n_chars", "cc")
      .withColumn("n_chars", lit(0L))
    val e2 = intercept[IllegalArgumentException](
      GraftMaintenance.merge(spark, p, leak, "doc_id", mergeSchema = true))
    assert(e2.getMessage.contains("compact"))
    // (3) reserved metadata names refuse too
    val meta = docs.limit(2).withColumnRenamed("n_chars", "cc")
      .withColumn("_graft_pos", lit(0L))
    val e3 = intercept[IllegalArgumentException](
      GraftMaintenance.merge(spark, p, meta, "doc_id", mergeSchema = true))
    assert(e3.getMessage.contains("reserved"))
  }

  test("rename ledger entries are atomic claims - chained renames survive") {
    val p = mkCatTable("m2")
    spark.sql(s"ALTER TABLE $cat.corp.m2 RENAME COLUMN n_chars TO a1")
    spark.sql(s"ALTER TABLE $cat.corp.m2 RENAME COLUMN lang TO l1")
    // ledger = one exclusively-created file per rename, name-ordered
    val dir = new org.apache.hadoop.fs.Path(p,
      graft.sources.GraftCatalog.RenamesFile)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(dir).map(_.getPath.getName).sorted.toSeq
    assert(entries == Seq("r000000.rename", "r000001.rename"))
    val got = spark.sql(s"SELECT sum(a1) FROM $cat.corp.m2").head.getLong(0)
    assert(got == docs.agg(sum("n_chars")).head.getLong(0))
    assert(spark.sql(s"SELECT count(l1) FROM $cat.corp.m2")
      .head.getLong(0) == docs.count())
  }

  test("streaming reads resolve renamed columns like batch") {
    val p = mkCatTable("st1")
    spark.sql(s"ALTER TABLE $cat.corp.st1 RENAME COLUMN n_chars TO cc")
    val expect = docs.agg(sum("n_chars")).head.getLong(0)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_evo_ck_").toFile.getAbsolutePath
    val acc = new java.util.concurrent.atomic.AtomicLong(0)
    val rows = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.table(s"$cat.corp.st1")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val r = b.agg(sum("cc"), count(lit(1))).head
        acc.addAndGet(if (r.isNullAt(0)) 0L else r.getLong(0))
        rows.addAndGet(r.getLong(1))
        ()
      }.start()
    q.awaitTermination()
    assert(rows.get() == docs.count())
    // pre-rename files carry physical n_chars: without per-file alias
    // resolution in the STREAM readers these all null-fill and the sum
    // collapses — the round-11 review finding, pinned
    assert(acc.get() == expect,
      s"stream must resolve cc through the alias chain: ${acc.get()} vs $expect")
    assert(p.nonEmpty)
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION widens via the guarded ADD COLUMN path") {
    val p = mkCatTable("q1")
    docs.filter(col("doc_id") % 5 === 0)
      .withColumn("batch", col("doc_id") * 100)
      .createOrReplaceTempView("sql_mse_src")
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.corp.q1 t
      USING sql_mse_src s ON t.doc_id = s.doc_id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val head = spark.sql(s"SELECT * FROM $cat.corp.q1")
    assert(head.schema.fieldNames.contains("batch"))
    assert(head.count() == docs.count())
    assert(head.filter(col("batch").isNotNull).count() ==
      docs.filter(col("doc_id") % 5 === 0).count())
    // the evolution goes through checkAddableColumn: evolving onto a
    // name a live file still carries physically (post-rename) refuses
    // loudly instead of leaking old values
    spark.sql(s"ALTER TABLE $cat.corp.q1 RENAME COLUMN n_chars TO cc")
    docs.limit(3).withColumnRenamed("n_chars", "cc")
      .withColumn("batch", lit(0L)).withColumn("n_chars", lit(1L))
      .createOrReplaceTempView("sql_mse_leak")
    val e = intercept[Exception](spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.corp.q1 t
        USING sql_mse_leak s ON t.doc_id = s.doc_id
        WHEN MATCHED THEN UPDATE SET *"""))
    assert(e.getMessage.contains("compact"),
      s"expected the field-identity refusal, got: ${e.getMessage.take(200)}")
    assert(p.nonEmpty)
  }

  test("CALL system.detail reports the table's format state") {
    val p = mkCatTable("dt1")
    // pre-DDL: full stats coverage → exact row count
    val r0 = spark.sql(
      s"CALL $cat.system.detail(table => 'corp.dt1')").head
    assert(r0.getLong(0) == GraftTableLog.versions(p).max)
    assert(r0.getInt(1) == GraftParquetV2.listFiles(p).size)
    assert(r0.getLong(2) == docs.count())
    assert(r0.getInt(3) == 0 && r0.getLong(4) == 0L && r0.getInt(5) == 0)
    spark.sql(s"ALTER TABLE $cat.corp.dt1 RENAME COLUMN n_chars TO cc")
    spark.sql(s"ALTER TABLE $cat.corp.dt1 RENAME COLUMN cc TO cc2")
    spark.conf.set(
      graft.sources.GraftParquetTable.ModeConf, "merge-on-read")
    try spark.sql(
      s"DELETE FROM $cat.corp.dt1 WHERE doc_id IN (0, 2)")
    finally spark.conf.set(
      graft.sources.GraftParquetTable.ModeConf, "copy-on-write")
    val r = spark.sql(
      s"CALL $cat.system.detail(table => 'corp.dt1')").head
    assert(r.getLong(0) == GraftTableLog.versions(p).max) // version
    assert(r.getInt(1) == GraftParquetV2.listFiles(p).size) // files
    // the rename carriers are zero-row files with no manifest stats, so
    // the exact row count honestly degrades to NULL (history's rule)
    assert(r.isNullAt(2))
    assert(r.getInt(3) >= 1) // dv files
    assert(r.getLong(4) == 2L) // dv positions
    assert(r.getInt(5) == 2) // renames (chained: still 2 ledger entries)
    assert(r.getString(6) == "") // no partition spec
  }

  test("three-era rename chain: head reads all eras; mid-chain travel resolves backwards only") {
    val p = s"$warehouse/corp/era1"
    def gen(k: Int, colName: String) =
      docs.filter(col("doc_id") % 3 === k)
        .withColumnRenamed("n_chars", colName).coalesce(1)
    gen(0, "n_chars").write.format(fmt).option("path", p)
      .mode("append").save()                                  // era a
    spark.sql(s"ALTER TABLE $cat.corp.era1 RENAME COLUMN n_chars TO b")
    gen(1, "b").write.format(fmt).option("path", p)
      .mode("append").save()                                  // era b
    val vEraB = GraftTableLog.versions(p).max
    spark.sql(s"ALTER TABLE $cat.corp.era1 RENAME COLUMN b TO c")
    gen(2, "c").write.format(fmt).option("path", p)
      .mode("append").save()                                  // era c
    // HEAD: one logical column c over three physical generations
    val expectAll = docs.agg(sum("n_chars")).head.getLong(0)
    assert(spark.sql(s"SELECT sum(c) FROM $cat.corp.era1")
      .head.getLong(0) == expectAll)
    assert(spark.sql(s"SELECT count(c) FROM $cat.corp.era1")
      .head.getLong(0) == docs.count(), "no era may null-fill")
    // MID-CHAIN travel: era-b version presents b, resolves b AND a
    // (the suffix chain b→[b,a]), and never sees era-c files
    val eraB = spark.sql(s"SELECT * FROM $cat.corp.era1 VERSION AS OF $vEraB")
    assert(eraB.schema.fieldNames.contains("b") &&
      !eraB.schema.fieldNames.contains("c"))
    val expectAB = docs.filter(col("doc_id") % 3 < 2)
      .agg(sum("n_chars")).head.getLong(0)
    assert(spark.sql(
      s"SELECT sum(b) FROM $cat.corp.era1 VERSION AS OF $vEraB")
      .head.getLong(0) == expectAB)
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
