package graft

import org.apache.spark.sql.functions._
import graft.sources.{GraftDeletes, GraftMaintenance, GraftParquetV2,
  GraftTableLog}

/** ROLLBACK and NAMED TAGS over the table format
  * ([[graft.sources.GraftMaintenance.rollback]],
  * [[graft.sources.GraftTableLog]] refs): a rollback restores an old
  * version's file set, deletion-vector set, and zone-map manifest as a
  * NEW head commit — pure metadata + renames, no data rewrite, history
  * preserved; a tag pins a human name to a version, resolves anywhere
  * a version number does, and roots vacuum retention. */
class RollbackTagSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"
  private val cat = "graft_lake_rb"
  private lazy val warehouse = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_warehouse_rb_").toFile.getAbsolutePath
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "n_chars")

  private def slice(k: Int) =
    docs.filter(pmod(col("doc_id"), lit(3)) === k)

  private def writeTo(path: String, k: Int, mode: String): Unit =
    slice(k).coalesce(1).write.format(fmt).option("path", path)
      .mode(mode).save()

  private def liveIds(path: String): Seq[Long] =
    spark.read.format(fmt).option("path", path).load()
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  private def idsOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  private def tmp(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_rb_$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("rollback restores the file set and manifest as a new version; " +
    "history survives; no data file is rewritten") {
    val dir = tmp("basic")
    writeTo(dir, 0, "append")   // v1
    writeTo(dir, 1, "append")   // v2
    writeTo(dir, 2, "overwrite") // v3 — archives both earlier files
    val (v2Rels, _) = GraftTableLog.readSnapshot(dir, 2)
    val v2Entries = GraftTableLog.readSnapshotEntries(dir, 2)
    assert(v2Entries.nonEmpty, "v2 snapshot must carry zone-map rows")

    val newHead = GraftMaintenance.rollback(dir, 2)
    assert(newHead == 4L)
    // live content = v2's rows, via the SAME basenames (renames only)
    assert(liveIds(dir) == idsOf(docs.filter(pmod(col("doc_id"),
      lit(3)) < 2)))
    val liveNow = GraftParquetV2.listFiles(dir)
      .map(GraftTableLog.relativize(dir, _)).toSet
    assert(liveNow == v2Rels.toSet,
      "rollback must restore exactly v2's rel paths — no rewrite")
    // the rolled-back v3 stays time-travel-readable (history preserved)
    assert(idsOf(spark.read.format(fmt).option("path", dir)
      .option("versionAsOf", "3").load()) == idsOf(slice(2)))
    // the restored head's manifest carries v2's zone maps verbatim
    val headEntries = graft.sources.GraftParquetWrite
      .rawManifestEntries(dir)
    assert(headEntries.toSet == v2Entries.toSet,
      "restored manifest must equal the restored version's snapshot rows")
    assert(GraftTableLog.versions(dir) == Seq(1L, 2L, 3L, 4L))
  }

  test("rollback across a merge-on-read delete restores the DV set " +
    "in both directions") {
    warehouse // force catalog registration
    val tbl = "t_rb_dv"
    val path = s"$warehouse/corp/$tbl"
    slice(0).unionByName(slice(1)).coalesce(2).write.format(fmt)
      .option("path", path).mode("append").save() // v1
    val allIds = idsOf(docs.filter(pmod(col("doc_id"), lit(3)) < 2))
    val cut = docs.agg(max("doc_id")).head.getLong(0) / 2
    spark.conf.set(graft.sources.GraftParquetTable.ModeConf,
      "merge-on-read")
    try spark.sql(s"DELETE FROM $cat.corp.$tbl WHERE doc_id < $cut")
    finally spark.conf.set(graft.sources.GraftParquetTable.ModeConf,
      "copy-on-write")
    val vDv = GraftTableLog.latestVersion(path).get
    assert(GraftDeletes.liveDvFiles(path).nonEmpty,
      "merge-on-read DELETE must land as a DV sidecar")
    val afterDelete = liveIds(path)
    assert(afterDelete == allIds.filter(_ >= cut))

    // roll back BEFORE the delete: DV must leave the live set
    GraftMaintenance.rollback(path, 1)
    assert(GraftDeletes.liveDvFiles(path).isEmpty,
      "rollback to the pre-delete version must retire the DV sidecar")
    assert(liveIds(path) == allIds)

    // roll FORWARD to the delete version: DV must come back
    GraftMaintenance.rollback(path, vDv)
    assert(GraftDeletes.liveDvFiles(path).nonEmpty,
      "rollback to the DV version must restore the sidecar")
    assert(liveIds(path) == afterDelete)
  }

  test("rollback to a vacuumed version refuses with zero side effects") {
    val dir = tmp("vac")
    writeTo(dir, 0, "append")    // v1
    writeTo(dir, 1, "overwrite") // v2 — archives v1's file
    writeTo(dir, 2, "overwrite") // v3
    GraftMaintenance.vacuum(dir, retainLast = 1)
    val filesBefore = GraftParquetV2.listFiles(dir).toSet
    // the dropped version refuses at the log lookup itself (its
    // snapshot entry is gone — "may have been vacuumed"); a version
    // whose log survived but whose files were reclaimed would refuse
    // in resolveAll instead. Either way: loud, and nothing moved.
    val e = intercept[Exception] { GraftMaintenance.rollback(dir, 1) }
    assert(e.getMessage.contains("vacuumed"))
    assert(GraftParquetV2.listFiles(dir).toSet == filesBefore,
      "a refused rollback must not have moved anything")
    assert(GraftTableLog.latestVersion(dir).contains(3L),
      "a refused rollback must not commit")
  }

  test("CALL system.rollback through SQL") {
    warehouse
    val tbl = "t_rb_sql"
    val path = s"$warehouse/corp/$tbl"
    writeTo(path, 0, "append")
    writeTo(path, 1, "overwrite")
    val row = spark.sql(
      s"CALL $cat.system.rollback(table => 'corp.$tbl', version => 1)")
      .head()
    assert(row.getLong(0) == 1L && row.getLong(1) == 3L)
    assert(liveIds(path) == idsOf(slice(0)))
  }

  test("tags: set, list, resolve in VERSION AS OF and versionAsOf, drop") {
    warehouse
    val tbl = "t_tags"
    val path = s"$warehouse/corp/$tbl"
    writeTo(path, 0, "append")  // v1
    writeTo(path, 1, "append")  // v2
    spark.sql(s"CALL $cat.system.tag(table => 'corp.$tbl', " +
      "name => 'train-v1', version => 1)")
    // default version = head
    val tagged = spark.sql(
      s"CALL $cat.system.tag(table => 'corp.$tbl', name => 'head-tag')")
      .head()
    assert(tagged.getLong(1) == 2L)
    assert(GraftTableLog.tags(path) ==
      Seq("head-tag" -> 2L, "train-v1" -> 1L))
    // SQL VERSION AS OF '<tag>'
    assert(idsOf(spark.sql(
      s"SELECT doc_id FROM $cat.corp.$tbl VERSION AS OF 'train-v1'")) ==
      idsOf(slice(0)))
    // path-read option versionAsOf=<tag>
    assert(idsOf(spark.read.format(fmt).option("path", path)
      .option("versionAsOf", "train-v1").load()) == idsOf(slice(0)))
    // listing procedure
    assert(spark.sql(s"CALL $cat.system.tags(table => 'corp.$tbl')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq ==
      Seq("head-tag" -> 2L, "train-v1" -> 1L))
    // duplicate refused — drop first, then re-point
    val dup = intercept[IllegalArgumentException] {
      GraftTableLog.setTag(path, "train-v1", 2L)
    }
    assert(dup.getMessage.contains("already exists"))
    assert(spark.sql(s"CALL $cat.system.drop_tag(" +
      s"table => 'corp.$tbl', name => 'train-v1')").head().getBoolean(0))
    GraftTableLog.setTag(path, "train-v1", 2L)
    assert(GraftTableLog.resolveVersionRef(path, "train-v1") == 2L)
    // unknown ref refuses with the tag inventory
    val unknown = intercept[IllegalArgumentException] {
      GraftTableLog.resolveVersionRef(path, "nope")
    }
    assert(unknown.getMessage.contains(
      "neither a version number, a tag, nor a branch"))
    // invalid names refused up front
    intercept[IllegalArgumentException] {
      GraftTableLog.setTag(path, "9starts-with-digit", 1L)
    }
    // tagging an uncommitted version refused
    intercept[IllegalArgumentException] {
      GraftTableLog.setTag(path, "future", 99L)
    }
  }

  test("a tag is a vacuum retention root; dropping it releases the files") {
    val dir = tmp("tagvac")
    writeTo(dir, 0, "append")    // v1
    writeTo(dir, 1, "overwrite") // v2 — v1's file goes to the archive
    writeTo(dir, 2, "overwrite") // v3
    GraftTableLog.setTag(dir, "pinned", 1L)
    val deleted = GraftMaintenance.vacuum(dir, retainLast = 1)
    // v1 is tagged: its archived file AND its log entry must survive
    assert(GraftTableLog.versions(dir).contains(1L),
      "vacuum must retain a tagged version's snapshot")
    assert(idsOf(spark.read.format(fmt).option("path", dir)
      .option("versionAsOf", "pinned").load()) == idsOf(slice(0)),
      "the tagged version must stay readable after vacuum")
    // v2 is neither tagged nor head — reclaimed
    assert(!GraftTableLog.versions(dir).contains(2L))
    assert(deleted >= 1, "the untagged generation must be reclaimed")
    // drop the tag: the next vacuum reclaims v1
    GraftTableLog.dropTag(dir, "pinned")
    GraftMaintenance.vacuum(dir, retainLast = 1)
    assert(GraftTableLog.versions(dir) == Seq(3L))
    intercept[Exception] {
      spark.read.format(fmt).option("path", dir)
        .option("versionAsOf", "1").load().count()
    }
  }
}
