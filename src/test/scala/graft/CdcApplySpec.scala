package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.CdcApply
import graft.sources.GraftTableLog

/** [[graft.streaming.CdcApply]] — streaming keyed-update MERGE into a
  * graft table: last-writer-wins batch compaction, per-epoch marker
  * idempotence, and checkpoint-resumed continuity across a REAL query
  * restart. */
class CdcApplySpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"

  private def freshTable(): (String, String, String) = {
    val cat = "graft_lake"
    val warehouse = s"${sys.props("java.io.tmpdir")}/graft_warehouse"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    val tbl = "t_cdcspec_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    (s"$cat.sf.$tbl", s"$warehouse/sf/$tbl", tbl)
  }

  private def cdcRows(rows: Seq[(Long, String, Double, String, Long)])
      : DataFrame = {
    import spark.implicits._
    rows.toDF("k", "status", "price", "op", "seq")
  }

  test("lastWriterWins picks the highest seq; delete wins a seq tie") {
    val batch = cdcRows(Seq(
      (1L, "A", 10.0, "U", 1L), (1L, "B", 20.0, "U", 3L),
      (1L, "C", 15.0, "U", 2L), // key 1: seq 3 wins
      (2L, "X", 5.0, "U", 7L), (2L, "X", 5.0, "D", 7L), // tie: D wins
      (3L, "Y", 1.0, "I", 1L)))
    val out = CdcApply.lastWriterWins(batch, "k", "seq", "op")
      .orderBy("k").collect()
    assert(out.length == 3)
    assert(out(0).getAs[String]("status") == "B" &&
      out(0).getAs[String]("op") == "U")
    assert(out(1).getAs[String]("op") == "D")
    assert(out(2).getAs[String]("op") == "I")
  }

  test("applyBatch merges I/U/D and the epoch marker dedupes a replay") {
    val (target, path, _) = freshTable()
    import spark.implicits._
    Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
      .toDF("k", "status", "price")
      .write.format(fmt).option("path", path).mode("append").save()
    val batch = cdcRows(Seq(
      (2L, "B2", 25.0, "U", 1L), // update
      (3L, "C", 30.0, "D", 2L),  // delete
      (4L, "D", 40.0, "I", 3L))) // insert
    val applied = CdcApply.applyBatch(spark, target, path, batch,
      "spec", 0L, "k", "op", "seq", Seq("status", "price"))
    assert(applied)
    val head = spark.read.format(fmt).option("path", path).load()
      .orderBy("k").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(head.toSeq == Seq((1L, "A", 10.0), (2L, "B2", 25.0),
      (4L, "D", 40.0)))
    // replay: marker makes it a no-op — no new table version, same head
    val versions = GraftTableLog.versions(path).size
    assert(!CdcApply.applyBatch(spark, target, path, batch,
      "spec", 0L, "k", "op", "seq", Seq("status", "price")))
    assert(GraftTableLog.versions(path).size == versions)
    // and even WITHOUT the marker the merge is value-idempotent:
    // re-applying under a new epoch id changes nothing but the version
    assert(CdcApply.applyBatch(spark, target, path, batch,
      "spec", 99L, "k", "op", "seq", Seq("status", "price")))
    val again = spark.read.format(fmt).option("path", path).load()
      .orderBy("k").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(again.toSeq == head.toSeq)
  }

  test("checkpoint restart resumes batch ids; no epoch applies twice") {
    val (target, path, _) = freshTable()
    import spark.implicits._
    Seq((1L, "A", 10.0), (2L, "B", 20.0))
      .toDF("k", "status", "price")
      .write.format(fmt).option("path", path).mode("append").save()
    val run = java.util.UUID.randomUUID().toString.replace("-", "")
    val tmp = sys.props("java.io.tmpdir")
    val inDir = s"$tmp/graft_cdcspec_in_$run"
    val ckpt = s"$tmp/graft_cdcspec_ckpt_$run"
    val fs = new org.apache.hadoop.fs.Path(inDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stage(name: String, df: DataFrame, mtime: Long): Unit = {
      val scratch = new org.apache.hadoop.fs.Path(s"$inDir/_st_$name")
      df.coalesce(1).write.parquet(scratch.toString)
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$scratch/part-*.parquet"))(0).getPath
      require(fs.rename(part,
        new org.apache.hadoop.fs.Path(s"$inDir/$name.parquet")))
      fs.delete(scratch, true)
      fs.setTimes(new org.apache.hadoop.fs.Path(s"$inDir/$name.parquet"),
        mtime, -1)
    }
    val schema = cdcRows(Nil).schema
    def drain(): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val q = CdcApply.sink(spark, src, target, path, s"spec_$run",
          "k", "op", "seq", Seq("status", "price"))
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    try {
      stage("b1", cdcRows(Seq((1L, "A1", 11.0, "U", 1L))), 1000000L)
      stage("b2", cdcRows(Seq((3L, "C", 30.0, "I", 2L))), 2000000L)
      drain() // first life: epochs 0, 1
      stage("b3", cdcRows(Seq((2L, "B", 20.0, "D", 3L))), 3000000L)
      drain() // second life, SAME checkpoint: resumes at epoch 2
      val head = spark.read.format(fmt).option("path", path).load()
        .orderBy("k").collect().map(r =>
          (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(head.toSeq == Seq((1L, "A1", 11.0), (3L, "C", 30.0)))
      // exactly three epoch markers, ids 0..2 — continuity across the
      // restart, nothing replayed, nothing skipped
      val markers = fs.listStatus(new org.apache.hadoop.fs.Path(
          path, CdcApply.EpochDir)).map(_.getPath.getName).sorted
      assert(markers.toSeq ==
        Seq(s"spec_$run-0", s"spec_$run-1", s"spec_$run-2"))
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(inDir), true)
      fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
    }
  }
}
