package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.{GraftBloom, GraftMaintenance, GraftParquetV2, GraftTableLog}

/** Orphaned write-debris reclamation
  * ([[graft.sources.GraftMaintenance.removeOrphans]] /
  * `CALL system.remove_orphan_files`): crashed writers' staging trees
  * and tmp sidecar drafts are reclaimed past an age horizon; live
  * data, sidecars, the log, and the archive are never touched; fresh
  * debris (a potentially in-flight writer) survives the default
  * horizon. */
class OrphanFilesSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"
  private val cat = "graft_orphan_spec"
  private lazy val warehouse = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_orphan_warehouse_").toFile.getAbsolutePath
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "n_chars")

  private def mkTable(name: String): String = {
    val p = s"$warehouse/corp/$name"
    docs.coalesce(1).write.format(fmt).option("path", p)
      .mode("append").save()
    p
  }

  /** Plant the debris shapes a crashed JVM leaves. */
  private def plantDebris(p: String): Unit = {
    val fs = new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def touch(rel: String): Unit = {
      val f = new Path(p, rel)
      fs.mkdirs(f.getParent)
      val out = fs.create(f, true)
      try out.write("debris".getBytes("UTF-8")) finally out.close()
    }
    touch("_staging-dead-write/part-00000-dead.parquet")
    touch(s"${GraftParquetV2.StatsSidecar}.tmp-dead/part-00000.parquet")
    touch("_tmp_bloom_spec-dead")
    touch("_tmp_constraints-dead")
    touch(s"${GraftBloom.BloomDir}/_tmp-dead.bloom")
    touch("_rewrite-dead/part-00000-dead.parquet") // crashed rewriteCommit
  }

  test("aged debris reclaims; data, sidecars, log, archive untouched") {
    val p = mkTable("o1")
    // an overwrite creates an archived generation + a log history
    docs.limit(10).coalesce(1).write.format(fmt).option("path", p)
      .mode("overwrite").save()
    val before = spark.read.format(fmt).option("path", p).load().count()
    val versionsBefore = GraftTableLog.versions(p)
    val archBefore = GraftTableLog.archivedStatuses(p).size
    plantDebris(p)
    Thread.sleep(20) // mtimes strictly before the zero-hour horizon
    val reclaimed = GraftMaintenance.removeOrphans(p, olderThanHours = 0.0)
    assert(reclaimed.map(_._1).sorted ==
      Seq("bloom_tmp", "manifest_tmp", "rewrite_tmp", "sidecar_tmp",
        "sidecar_tmp", "staging"),
      s"got $reclaimed")
    assert(reclaimed.forall(_._3 > 0L), "reclaimed bytes reported")
    val fs = new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(p, "_staging-dead-write")))
    assert(!fs.exists(new Path(p, "_tmp_bloom_spec-dead")))
    // nothing live was touched
    assert(spark.read.format(fmt).option("path", p).load().count() == before)
    assert(GraftTableLog.versions(p) == versionsBefore)
    assert(GraftTableLog.archivedStatuses(p).size == archBefore)
    assert(fs.exists(new Path(p, GraftParquetV2.StatsSidecar)),
      "the LIVE stats manifest must survive")
    // time travel through the archive still answers
    val v1 = versionsBefore.head
    assert(spark.read.format(fmt).option("path", p)
      .option("versionAsOf", v1.toString).load().count() == docs.count())
    // idempotent: a second pass finds nothing
    assert(GraftMaintenance.removeOrphans(p, 0.0).isEmpty)
  }

  test("fresh debris survives a non-zero horizon (in-flight writer safety)") {
    val p = mkTable("o2")
    plantDebris(p)
    assert(GraftMaintenance.removeOrphans(p, olderThanHours = 24.0).isEmpty,
      "debris younger than the horizon must not be reclaimed")
    val fs = new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(p, "_staging-dead-write")))
    // and a later aged pass reclaims it
    Thread.sleep(20)
    assert(GraftMaintenance.removeOrphans(p, 0.0).size == 6)
  }

  test("CALL system.remove_orphan_files end to end") {
    warehouse
    mkTable("o3")
    plantDebris(s"$warehouse/corp/o3")
    Thread.sleep(20)
    // dry_run reports the same rows and deletes NOTHING
    val dry = spark.sql(s"CALL $cat.system.remove_orphan_files(" +
      "table => 'corp.o3', older_than_hours => 0.0D, " +
      "dry_run => true)").collect()
    assert(dry.length == 6)
    assert(new java.io.File(s"$warehouse/corp/o3/_staging-dead-write")
      .exists(), "dry_run must not delete")
    val rows = spark.sql(s"CALL $cat.system.remove_orphan_files(" +
      "table => 'corp.o3', older_than_hours => 0.0D)").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getString(0)).toSet ==
      Set("staging", "manifest_tmp", "sidecar_tmp", "bloom_tmp",
        "rewrite_tmp"))
    assert(rows.forall(_.getLong(2) > 0L))
    // a clean table returns zero rows
    assert(spark.sql(s"CALL $cat.system.remove_orphan_files(" +
      "table => 'corp.o3', older_than_hours => 0.0D)").count() == 0)
  }

  test("refusals: negative horizon") {
    val p = mkTable("o4")
    intercept[IllegalArgumentException](
      GraftMaintenance.removeOrphans(p, -1.0))
  }
}
