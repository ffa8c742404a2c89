package graft

import org.apache.spark.sql.functions._
import graft.sources.{GraftDeletes, GraftMaintenance, GraftParquetTable, GraftParquetV2, GraftTableLog}

/** Merge-on-read deletion vectors ([[graft.sources.GraftDeltaOperation]]
  * + [[graft.sources.GraftDeletes]]): SQL UPDATE/DELETE under
  * `spark.graft.rowLevelMode = merge-on-read` write positional-delete
  * sidecars instead of rewriting data files; every read path applies
  * them; rewrites fold them away; time travel and the CDC feed stay
  * correct across DV versions. */
class DeletionVectorSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"
  private val cat = "graft_dv_spec"
  private lazy val warehouse = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_dv_warehouse_").toFile.getAbsolutePath
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "n_chars")

  /** Fresh two-file table under the catalog; returns its path. */
  private def mkTable(name: String): String = {
    val p = s"$warehouse/corp/$name"
    docs.filter(pmod(col("doc_id"), lit(2)) === 0).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    docs.filter(pmod(col("doc_id"), lit(2)) === 1).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    p
  }

  private def withMor[T](body: => T): T = {
    spark.conf.set(GraftParquetTable.ModeConf, "merge-on-read")
    try body finally spark.conf.set(GraftParquetTable.ModeConf, "copy-on-write")
  }

  private def liveIds(p: String): Seq[Long] =
    spark.read.format(fmt).option("path", p).load()
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  private def allIds: Seq[Long] =
    docs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  test("MOR SQL DELETE writes ONLY a DV sidecar - no data file is touched") {
    val p = mkTable("d1")
    val filesBefore = GraftParquetV2.listFiles(p)
    val archBefore = GraftTableLog.archivedStatuses(p).size
    val victim = allIds.head
    withMor {
      spark.sql(s"DELETE FROM $cat.corp.d1 WHERE doc_id = $victim")
    }
    // the data generation is untouched: same live files, nothing archived
    assert(GraftParquetV2.listFiles(p) == filesBefore,
      "a 1-row MOR delete must not add/remove/rewrite any data file")
    assert(GraftTableLog.archivedStatuses(p).size == archBefore,
      "a 1-row MOR delete must not archive any data file")
    // exactly one DV sidecar, carrying exactly one position
    val dvs = GraftDeletes.liveDvFiles(p)
    assert(dvs.size == 1, s"expected one DV sidecar, got $dvs")
    val positions = GraftDeletes.readPositions(dvs)
    assert(positions.values.map(_.cardinality).sum == 1L)
    // the committed version pins the DV set
    val head = GraftTableLog.latestVersion(p).get
    assert(GraftTableLog.readSnapshotDvRels(p, head).size == 1)
    // reads exclude the row
    assert(liveIds(p) == allIds.filterNot(_ == victim))
    // time travel to the pre-delete version still shows it
    val pre = spark.read.format(fmt).option("path", p)
      .option("versionAsOf", (head - 1).toString).load()
    assert(pre.filter(col("doc_id") === victim).count() == 1)
  }

  test("MOR SQL UPDATE = DV + appended image; COW stays default") {
    val p = mkTable("u1")
    val filesBefore = GraftParquetV2.listFiles(p).toSet
    val archBefore = GraftTableLog.archivedStatuses(p).size
    val victim = allIds.head
    withMor {
      spark.sql(s"UPDATE $cat.corp.u1 SET n_chars = 777, lang = 'xx' " +
        s"WHERE doc_id = $victim")
    }
    val filesAfter = GraftParquetV2.listFiles(p).toSet
    // old files all carried by reference; only image files were added
    assert(filesBefore.subsetOf(filesAfter),
      "MOR update must not remove or rewrite existing data files")
    assert(GraftTableLog.archivedStatuses(p).size == archBefore)
    assert(filesAfter.size > filesBefore.size, "updated image must append")
    assert(GraftDeletes.liveDvFiles(p).size == 1)
    // semantics: the row carries the new values, everything else intact
    val head = spark.read.format(fmt).option("path", p).load()
    val updated = head.filter(col("doc_id") === victim).collect()
    assert(updated.length == 1)
    assert(updated.head.getAs[String]("lang") == "xx")
    assert(updated.head.getAs[Long]("n_chars") == 777L)
    assert(liveIds(p) == allIds)
    // the default mode is still copy-on-write: same statement shape
    // rewrites (archives) candidate files instead of writing DVs
    val p2 = mkTable("u1cow")
    spark.sql(s"UPDATE $cat.corp.u1cow SET n_chars = 1 WHERE doc_id = $victim")
    assert(GraftDeletes.liveDvFiles(p2).isEmpty,
      "copy-on-write mode must not write deletion vectors")
    assert(GraftTableLog.archivedStatuses(p2).nonEmpty,
      "copy-on-write update archives the rewritten candidates")
  }

  test("metadata columns _graft_file/_graft_pos are selectable and exact") {
    val p = mkTable("m1")
    val r = spark.read.format(fmt).option("path", p).load()
      .select(col("doc_id"), col("_graft_file"), col("_graft_pos"))
      .collect()
    assert(r.nonEmpty)
    // every row names a live file and positions are dense per file
    val live = GraftParquetV2.listFiles(p).toSet
    assert(r.forall(row => live.contains(row.getString(1))))
    val byFile = r.groupBy(_.getString(1))
    byFile.foreach { case (_, rws) =>
      val ps = rws.map(_.getLong(2)).sorted
      assert(ps.toSeq == (0L until ps.length).toSeq,
        "per-file ordinals must be dense from 0")
    }
  }

  test("aggregate pushdown demotes the footer fast path under DVs") {
    val p = mkTable("a1")
    val n0 = spark.read.format(fmt).option("path", p).load().count()
    val victim = allIds.head
    withMor {
      spark.sql(s"DELETE FROM $cat.corp.a1 WHERE doc_id = $victim")
    }
    // count(*) pushes into the scan; footer counts include the deleted
    // row, so the DV'd file must row-scan — the answer proves it did
    val n1 = spark.read.format(fmt).option("path", p).load().count()
    assert(n1 == n0 - 1, s"count after MOR delete: $n1 vs ${n0 - 1}")
    // grouped pushdown too
    val g = spark.read.format(fmt).option("path", p).load()
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(g == n0 - 1)
  }

  test("changesSince refuses across a DV change; CDC feed tails through it") {
    val p = mkTable("c1")
    val vBefore = GraftTableLog.latestVersion(p).get
    val victim = allIds.head
    withMor {
      spark.sql(s"DELETE FROM $cat.corp.c1 WHERE doc_id = $victim")
    }
    val vAfter = GraftTableLog.latestVersion(p).get
    val e = intercept[IllegalArgumentException](
      GraftTableLog.changedFiles(p, vBefore, vAfter))
    assert(e.getMessage.contains("deletion-vector"))
    // the row-level CDC feed is the sound answer: exactly one delete image
    val feed = GraftMaintenance.changeFeedRows(spark, p, vBefore, vAfter)
      .collect()
    assert(feed.length == 1)
    assert(feed.head.getAs[String]("_change_type") == "delete")
    assert(feed.head.getAs[Long]("doc_id") == victim)
  }

  test("rewrites fold DVs away: compaction materializes deletes and GC archives the sidecar") {
    val p = mkTable("f1")
    val victims = allIds.take(3)
    withMor {
      spark.sql(s"DELETE FROM $cat.corp.f1 WHERE doc_id IN " +
        victims.mkString("(", ",", ")"))
    }
    val vWithDv = GraftTableLog.latestVersion(p).get
    assert(GraftDeletes.liveDvFiles(p).nonEmpty)
    GraftMaintenance.compact(spark, p)
    // the packed generation read THROUGH the DVs, so they are
    // materialized and the sidecar is archived (fully stale)
    assert(GraftDeletes.liveDvFiles(p).isEmpty,
      "compaction must fold deletion vectors into the new generation")
    assert(liveIds(p) == allIds.filterNot(victims.contains))
    // time travel to the DV'd version still applies the archived DV
    val pinned = spark.read.format(fmt).option("path", p)
      .option("versionAsOf", vWithDv.toString).load()
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(pinned == allIds.filterNot(victims.contains))
  }

  test("COW rewrite after a MOR delete does not resurrect deleted rows") {
    val p = mkTable("r1")
    val victim = allIds.head
    withMor {
      spark.sql(s"DELETE FROM $cat.corp.r1 WHERE doc_id = $victim")
    }
    // a COW update touching every file (condition unprunable) rewrites
    // the candidates — reading them WITH the DV applied
    GraftMaintenance.update(spark, p,
      col("n_chars") >= 0L, Map("lang" -> lit("yy")))
    val after = spark.read.format(fmt).option("path", p).load()
    assert(after.filter(col("doc_id") === victim).count() == 0,
      "COW rewrite resurrected a MOR-deleted row")
    assert(after.count() == allIds.length - 1)
  }

  test("MOR MERGE INTO: matched rows update via DV, unmatched insert") {
    val p = mkTable("g1")
    val k = allIds.head
    docs.filter(col("doc_id") === k)
      .withColumn("n_chars", lit(999L))
      .unionByName(spark.range(1).select(
        lit(-1L).as("doc_id"), lit("zz").as("lang"), lit(5L).as("n_chars")))
      .createOrReplaceTempView("dv_merge_src")
    val filesBefore = GraftParquetV2.listFiles(p).toSet
    withMor {
      spark.sql(s"""MERGE INTO $cat.corp.g1 t USING dv_merge_src s
        ON t.doc_id = s.doc_id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(filesBefore.subsetOf(GraftParquetV2.listFiles(p).toSet))
    assert(GraftDeletes.liveDvFiles(p).size == 1)
    val head = spark.read.format(fmt).option("path", p).load()
    assert(head.filter(col("doc_id") === k).head.getAs[Long]("n_chars") == 999L)
    assert(head.filter(col("doc_id") === -1L).count() == 1)
    assert(head.count() == allIds.length + 1)
  }

  test("vacuum keeps archived DVs for retained versions, reclaims them after") {
    val p = mkTable("v1")
    val victim = allIds.head
    withMor {
      spark.sql(s"DELETE FROM $cat.corp.v1 WHERE doc_id = $victim")
    }
    val vWithDv = GraftTableLog.latestVersion(p).get
    GraftMaintenance.compact(spark, p) // archives the DV (fully stale)
    // retain both versions: the archived DV must survive vacuum
    GraftMaintenance.vacuum(p, retainLast = 2)
    val pinned = spark.read.format(fmt).option("path", p)
      .option("versionAsOf", vWithDv.toString).load().count()
    assert(pinned == allIds.length - 1)
    // retain only the head: the DV'd version drops; its DV is reclaimed
    GraftMaintenance.vacuum(p, retainLast = 1)
    val gone = intercept[Exception](
      spark.read.format(fmt).option("path", p)
        .option("versionAsOf", vWithDv.toString).load().count())
    assert(gone.getMessage.contains("vacuumed") ||
      gone.getMessage.contains("not found"))
  }

  test("rewrite_deletes folds DVs selectively - clean files untouched") {
    val p = mkTable("w1")
    // target rows of ONE file only: delete ids from the even half
    // (file 1 holds doc_id % 2 == 0 — written first, coalesced)
    val evenIds = allIds.filter(_ % 2 == 0).take(2)
    withMor {
      spark.sql(s"DELETE FROM $cat.corp.w1 WHERE doc_id IN " +
        evenIds.mkString("(", ",", ")"))
    }
    val dv = GraftDeletes.livePositions(p)
    assert(dv.size == 1, s"expected deletes on one file, got ${dv.keys}")
    val filesBefore = GraftParquetV2.listFiles(p)
    val untouched = filesBefore.filterNot(f =>
      dv.contains(new org.apache.hadoop.fs.Path(f).getName))
    val out = spark.sql(
      s"CALL $cat.system.rewrite_deletes(table => 'corp.w1')").head
    assert(out.getInt(1) == 1, "exactly the one DV'd file rewrites")
    assert(out.getInt(2) == 1, "one sidecar folds")
    // clean files carried by reference; sidecar archived; rows correct
    val filesAfter = GraftParquetV2.listFiles(p)
    assert(untouched.forall(filesAfter.contains))
    assert(!filesAfter.map(f => new org.apache.hadoop.fs.Path(f).getName)
      .exists(dv.keySet.contains), "the DV'd file must be replaced")
    assert(GraftDeletes.liveDvFiles(p).isEmpty)
    assert(liveIds(p) == allIds.filterNot(evenIds.contains))
    // a second call is a free no-op (no new version)
    val vNow = GraftTableLog.latestVersion(p).get
    spark.sql(s"CALL $cat.system.rewrite_deletes(table => 'corp.w1')")
    assert(GraftTableLog.latestVersion(p).get == vNow)
  }

  test("MOR delete on a partitioned (col=value) table") {
    val p = s"$warehouse/corp/p1"
    docs.write.format(fmt).option("path", p)
      .option("partitionBy", "lang").mode("append").save()
    val victim = allIds.head
    withMor {
      spark.sql(s"DELETE FROM $cat.corp.p1 WHERE doc_id = $victim")
    }
    assert(GraftDeletes.liveDvFiles(p).size == 1)
    val head = spark.read.format(fmt).option("path", p).load()
    assert(head.count() == allIds.length - 1)
    assert(head.filter(col("doc_id") === victim).count() == 0)
    // partition pruning still composes with the DV merge
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    val one = langs.head
    val expect = docs.filter(col("lang") === one)
      .filter(col("doc_id") =!= victim).count()
    assert(head.filter(col("lang") === one).count() == expect)
  }

  test("MOR UPDATE on a partitioned table routes images into col=value dirs") {
    val p = s"$warehouse/corp/p2"
    docs.write.format(fmt).option("path", p)
      .option("partitionBy", "lang").mode("append").save()
    val victim = allIds.head
    withMor {
      spark.sql(s"UPDATE $cat.corp.p2 SET n_chars = 555 " +
        s"WHERE doc_id = $victim")
    }
    // the appended image file must sit under a lang= directory — a
    // flat image would break the declared layout (and its partition
    // value would vanish from directory pruning)
    val flat = GraftParquetV2.listFiles(p).filterNot(_.contains("/lang="))
    assert(flat.isEmpty, s"MOR image landed flat: $flat")
    val head = spark.read.format(fmt).option("path", p).load()
    assert(head.filter(col("doc_id") === victim)
      .head.getAs[Long]("n_chars") == 555L)
    assert(head.count() == allIds.length)
  }

  test("changesSince ALLOWS appends after a MOR delete (DV set pinned equal)") {
    val p = mkTable("c2")
    withMor {
      spark.sql(s"DELETE FROM $cat.corp.c2 WHERE doc_id = ${allIds.head}")
    }
    val vDv = GraftTableLog.latestVersion(p).get
    docs.limit(0) // no-op guard
    docs.filter(col("doc_id") < 0).count() // force nothing
    // an APPEND after the delete: dv sets of (vDv, vDv+1) are equal,
    // so the file-level feed is sound and carries exactly the new file
    spark.range(1).select(lit(-7L).as("doc_id"), lit("zz").as("lang"),
      lit(1L).as("n_chars"))
      .write.format(fmt).option("path", p).mode("append").save()
    val vAfter = GraftTableLog.latestVersion(p).get
    val delta = spark.read.format(fmt).option("path", p)
      .option("changesSince", vDv.toString)
      .option("changesUntil", vAfter.toString).load().collect()
    assert(delta.length == 1 && delta.head.getLong(0) == -7L)
  }

  test("TRUNCATE folds DVs; pre-truncate time travel still applies them") {
    val p = mkTable("t1")
    val victim = allIds.head
    withMor {
      spark.sql(s"DELETE FROM $cat.corp.t1 WHERE doc_id = $victim")
    }
    val vDv = GraftTableLog.latestVersion(p).get
    spark.sql(s"TRUNCATE TABLE $cat.corp.t1")
    // every data file archived -> the sidecar is fully stale and the
    // truncate commit's GC archives it
    assert(GraftDeletes.liveDvFiles(p).isEmpty,
      "truncate must strand-collect the sidecar")
    assert(spark.read.format(fmt).option("path", p).load().count() == 0)
    // the DV'd version still reads correctly from the archive,
    // archived DV applied
    val pinned = spark.read.format(fmt).option("path", p)
      .option("versionAsOf", vDv.toString).load()
    assert(pinned.count() == allIds.length - 1)
    assert(pinned.filter(col("doc_id") === victim).count() == 0)
  }

  test("successive MOR deletes accumulate sidecars; overlapping positions dedupe") {
    val p = mkTable("acc1")
    val v1 = allIds(0)
    val v2 = allIds(1)
    withMor {
      spark.sql(s"DELETE FROM $cat.corp.acc1 WHERE doc_id = $v1")
      spark.sql(s"DELETE FROM $cat.corp.acc1 WHERE doc_id = $v2")
      // re-deleting an already-deleted row: the scan excludes it, so
      // the second statement matches nothing — no third sidecar
      spark.sql(s"DELETE FROM $cat.corp.acc1 WHERE doc_id = $v1")
    }
    assert(GraftDeletes.liveDvFiles(p).size == 2,
      "a no-match MOR delete must commit no sidecar")
    assert(liveIds(p) == allIds.filterNot(Set(v1, v2)))
    // even a HAND-WRITTEN duplicate position across sidecars dedupes
    // at load (the defensive contract readPositions documents)
    val dv = GraftDeletes.livePositions(p)
    val (base, ps) = dv.head
    GraftDeletes.writeDvFile(
      new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(p, GraftDeletes.DeletesDir),
        "dv-dup-test.parquet"),
      Iterator(base -> ps.iterator.next()))
    val merged = GraftDeletes.livePositions(p)
    val mergedSeq = merged(base).iterator.toSeq
    assert(mergedSeq == mergedSeq.sorted.distinct)
    assert(spark.read.format(fmt).option("path", p).load().count() ==
      allIds.length - 2, "duplicate positions must not over-delete")
  }

  test("snapshot DV pinning: each version applies exactly ITS delete set") {
    val p = mkTable("pin1")
    val victims = allIds.take(3)
    val vBase = GraftTableLog.latestVersion(p).get
    withMor {
      victims.foreach(v =>
        spark.sql(s"DELETE FROM $cat.corp.pin1 WHERE doc_id = $v"))
    }
    val head = GraftTableLog.latestVersion(p).get
    assert(head == vBase + 3)
    // version k after the base has exactly k deletes applied
    (0 to 3).foreach { k =>
      val n = spark.read.format(fmt).option("path", p)
        .option("versionAsOf", (vBase + k).toString).load().count()
      assert(n == allIds.length - k,
        s"version ${vBase + k} must carry exactly $k deletes, saw " +
          s"${allIds.length - n}")
    }
  }

  test("streaming read refuses a table with live deletion vectors") {
    val p = mkTable("s1")
    withMor {
      spark.sql(s"DELETE FROM $cat.corp.s1 WHERE doc_id = ${allIds.head}")
    }
    val e = intercept[Exception] {
      val q = spark.readStream.format(fmt).option("path", p)
        .schema(docs.schema).load()
        .writeStream.format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("deletion vectors")),
      s"expected the DV refusal, got: ${messages(e).mkString(" | ")}")
  }
}
