package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{GraftMaintenance, GraftParquetV2, GraftTableLog}

/** Branches ([[graft.sources.GraftTableLog]] refs + the `branch` write
  * option + [[graft.sources.GraftMaintenance.fastForward]]): the
  * refusal surface and lifecycle invariants the gated `q_sql_branch`
  * entry doesn't exercise — diverged-main fast-forward, drop_branch
  * archival, rollback-to-branch-version refusal, interleaved main and
  * branch commits, and the refs namespace guard. */
class GraftBranchSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"

  private def freshTable(): String =
    s"${sys.props("java.io.tmpdir")}/graft_branchspec_" +
      java.util.UUID.randomUUID().toString

  private def rows(n: Long, tag: Long): DataFrame = {
    import spark.implicits._
    (0L until n).map(i => (i, tag)).toDF("k", "v")
  }

  private def seeded(): String = {
    val t = freshTable()
    rows(10, 0).write.format(fmt).option("path", t).mode("append").save()
    t
  }

  test("create_branch refuses bad versions, duplicates, and tag collisions") {
    val t = seeded()
    intercept[IllegalArgumentException] {
      GraftTableLog.createBranch(t, "b1", 99L) // uncommitted version
    }
    GraftTableLog.createBranch(t, "b1", 1L)
    intercept[IllegalArgumentException] {
      GraftTableLog.createBranch(t, "b1", 1L) // duplicate
    }
    GraftTableLog.setTag(t, "rel", 1L)
    intercept[IllegalArgumentException] {
      GraftTableLog.createBranch(t, "rel", 1L) // collides with a tag
    }
    intercept[IllegalArgumentException] {
      GraftTableLog.setTag(t, "b1", 1L) // tag colliding with a branch
    }
    assert(GraftTableLog.branches(t).map(_._1) == Seq("b1"))
  }

  test("branch writes refuse: missing branch, overwrite, partitionBy") {
    val t = seeded()
    intercept[Exception] { // no such branch
      rows(1, 1).write.format(fmt).option("path", t)
        .option("branch", "ghost").mode("append").save()
    }
    GraftTableLog.createBranch(t, "b", 1L)
    intercept[Exception] { // branch overwrite
      rows(1, 1).write.format(fmt).option("path", t)
        .option("branch", "b").mode("overwrite").save()
    }
    intercept[Exception] { // branch + partition layout
      rows(1, 1).write.format(fmt).option("path", t)
        .option("branch", "b").option("partitionBy", "v")
        .mode("append").save()
    }
  }

  test("interleaved main and branch appends: disjoint lineages, " +
      "global version numbers, correct ref motion") {
    val t = seeded()
    GraftTableLog.createBranch(t, "b", 1L)
    rows(5, 1).write.format(fmt).option("path", t)
      .option("branch", "b").mode("append").save()  // v2 (branch)
    rows(3, 2).write.format(fmt).option("path", t)
      .mode("append").save()                         // v3 (main)
    rows(4, 3).write.format(fmt).option("path", t)
      .option("branch", "b").mode("append").save()  // v4 (branch)
    assert(GraftTableLog.versions(t) == Seq(1L, 2L, 3L, 4L))
    val (head, base) = GraftTableLog.readBranch(t, "b").get
    assert(head == 4L && base == 1L)
    // main sees its own lineage only: 10 seed + 3 main rows
    assert(spark.read.format(fmt).option("path", t).load().count() == 13)
    // the branch sees seed + both branch appends, NOT main's v3
    assert(spark.read.format(fmt).option("path", t)
      .option("versionAsOf", "b").load().count() == 19)
    // no branch file leaks into the live listing
    assert(GraftParquetV2.listFiles(t)
      .forall(!_.contains("_branch_")))
  }

  test("fast_forward refuses once main diverged; a fresh branch adopts") {
    val t = seeded()
    GraftTableLog.createBranch(t, "b", 1L)
    rows(5, 1).write.format(fmt).option("path", t)
      .option("branch", "b").mode("append").save()
    rows(3, 2).write.format(fmt).option("path", t)
      .mode("append").save() // main advances → FF illegal
    val e = intercept[IllegalArgumentException] {
      GraftMaintenance.fastForward(t, "b")
    }
    assert(e.getMessage.contains("main advanced"))
    // fork at the NEW head: this one fast-forwards
    val mainHead = GraftTableLog.latestVersion(t).get
    GraftTableLog.createBranch(t, "b2", mainHead)
    rows(2, 3).write.format(fmt).option("path", t)
      .option("branch", "b2").mode("append").save()
    val (v, adopted) = GraftMaintenance.fastForward(t, "b2")
    assert(adopted >= 1 && v == GraftTableLog.latestVersion(t).get)
    assert(spark.read.format(fmt).option("path", t).load().count() == 15)
    assert(GraftTableLog.branches(t).map(_._1) == Seq("b"))
  }

  test("drop_branch archives the lineage; branch-era versions stay " +
      "time-travelable; rollback to a branch version refuses") {
    val t = seeded()
    GraftTableLog.createBranch(t, "b", 1L)
    rows(5, 1).write.format(fmt).option("path", t)
      .option("branch", "b").mode("append").save() // v2, branch-owned
    intercept[IllegalArgumentException] {
      GraftMaintenance.rollback(t, 2L)
    }
    val archived = GraftMaintenance.dropBranch(t, "b")
    assert(archived >= 1)
    assert(GraftTableLog.branches(t).isEmpty)
    assert(GraftMaintenance.dropBranch(t, "b") == -1) // already gone
    // the dropped lineage's version resolves through the archive
    assert(spark.read.format(fmt).option("path", t)
      .option("versionAsOf", "2").load().count() == 15)
    // main untouched throughout
    assert(spark.read.format(fmt).option("path", t).load().count() == 10)
  }

  test("spark.graft.branch routes SQL INSERT INTO onto the branch " +
      "(the WAP session knob); main stays untouched") {
    val (cat, warehouse) = graft.streaming.TableDrain.ensureCatalog(spark)
    val tbl = "t_wap_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val path = s"$warehouse/sf/$tbl"
    spark.sql(s"CREATE TABLE $cat.sf.$tbl (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.sf.$tbl VALUES (1, 10), (2, 20)")
    GraftTableLog.createBranch(path, "wap",
      GraftTableLog.latestVersion(path).get)
    spark.conf.set("spark.graft.branch", "wap")
    try spark.sql(s"INSERT INTO $cat.sf.$tbl VALUES (3, 30)")
    finally spark.conf.unset("spark.graft.branch")
    // main: only the pre-branch rows; the branch: all three
    assert(spark.sql(s"SELECT count(*) FROM $cat.sf.$tbl")
      .head().getLong(0) == 2L)
    assert(spark.read.format(fmt).option("path", path)
      .option("versionAsOf", "wap").load().count() == 3L)
    val (_, n) = GraftMaintenance.fastForward(path, "wap")
    assert(n >= 1)
    assert(spark.sql(s"SELECT count(*) FROM $cat.sf.$tbl")
      .head().getLong(0) == 3L)
  }

  test("row-level ops refuse while spark.graft.branch is set — a WAP " +
      "session must not silently mutate main") {
    val (cat, warehouse) = graft.streaming.TableDrain.ensureCatalog(spark)
    val tbl = "t_wapg_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val path = s"$warehouse/sf/$tbl"
    spark.sql(s"CREATE TABLE $cat.sf.$tbl (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.sf.$tbl VALUES (1, 10), (2, 20)")
    GraftTableLog.createBranch(path, "wap",
      GraftTableLog.latestVersion(path).get)
    spark.conf.set("spark.graft.branch", "wap")
    try {
      val del = intercept[Exception] {
        spark.sql(s"DELETE FROM $cat.sf.$tbl WHERE k = 1")
      }
      assert(del.getMessage.contains("spark.graft.branch"))
      val upd = intercept[Exception] {
        spark.sql(s"UPDATE $cat.sf.$tbl SET v = 0 WHERE k = 1")
      }
      assert(upd.getMessage.contains("spark.graft.branch"))
    } finally spark.conf.unset("spark.graft.branch")
    // main untouched by the refusals; ops work again once unset
    assert(spark.sql(s"SELECT count(*) FROM $cat.sf.$tbl")
      .head().getLong(0) == 2L)
    spark.sql(s"DELETE FROM $cat.sf.$tbl WHERE k = 1")
    assert(spark.sql(s"SELECT count(*) FROM $cat.sf.$tbl")
      .head().getLong(0) == 1L)
  }

  test("the .refs metadata table lists tags and branches as one relation") {
    val (cat, warehouse) = graft.streaming.TableDrain.ensureCatalog(spark)
    val tbl = "t_refs_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val path = s"$warehouse/sf/$tbl"
    spark.sql(s"CREATE TABLE $cat.sf.$tbl (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.sf.$tbl VALUES (1)")
    GraftTableLog.setTag(path, "pin", 1L)
    GraftTableLog.createBranch(path, "exp", 2L)
    rows(1, 9).write.format(fmt).option("path", path)
      .option("branch", "exp").mode("append").save() // head -> 3
    val got = spark.sql(
      s"SELECT name, type, version, base FROM $cat.sf.$tbl.refs")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == Seq(("exp", "branch", 3L, 2L), ("pin", "tag", 1L, -1L)))
  }

  test("empty-branch fast_forward drops the ref without a commit") {
    val t = seeded()
    GraftTableLog.createBranch(t, "noop", 1L)
    val before = GraftTableLog.versions(t)
    val (v, adopted) = GraftMaintenance.fastForward(t, "noop")
    assert(adopted == 0 && GraftTableLog.versions(t) == before)
    assert(v == before.last)
    assert(GraftTableLog.branches(t).isEmpty)
  }
}
