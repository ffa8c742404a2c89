package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.TableDrain
import graft.sources.GraftTableLog

/** [[graft.streaming.TableDrain]] — the round-14 migration target for
  * every former driver-map streaming drain: composite-key MERGE
  * upserts per epoch, marker-deduped replays (a metadata no-op, zero
  * version churn), and the complete-mode overwrite drain whose final
  * table is the final state. */
class TableDrainSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"

  private def freshTable(): (String, String) = {
    val (cat, warehouse) = TableDrain.ensureCatalog(spark)
    val tbl = "t_drainspec_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    (s"$cat.sf.$tbl", s"$warehouse/sf/$tbl")
  }

  private def emissions(rows: Seq[(Long, String, Long, Double)])
      : DataFrame = {
    import spark.implicits._
    rows.toDF("w", "t", "n", "v")
  }

  test("upsertBatch inserts new composite keys and updates matched ones") {
    val (target, path) = freshTable()
    TableDrain.create(spark, target,
      emissions(Nil).schema)
    // epoch 0: two keys born
    assert(TableDrain.upsertBatch(spark, target, path,
      emissions(Seq((1L, "a", 1L, 1.0), (1L, "b", 2L, 2.0))),
      "spec", 0L, Seq("w", "t"), Seq("n", "v")))
    // epoch 1: one key updated (latest aggregate), one new
    assert(TableDrain.upsertBatch(spark, target, path,
      emissions(Seq((1L, "a", 5L, 9.0), (2L, "a", 1L, 3.0))),
      "spec", 1L, Seq("w", "t"), Seq("n", "v")))
    val out = TableDrain.read(spark, path)
      .orderBy("w", "t").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getDouble(3))).toSeq ==
      Seq((1L, "a", 5L, 9.0), (1L, "b", 2L, 2.0), (2L, "a", 1L, 3.0)))
  }

  test("a replayed epoch is marker-skipped with zero version churn") {
    val (target, path) = freshTable()
    TableDrain.create(spark, target, emissions(Nil).schema)
    val b = emissions(Seq((1L, "a", 1L, 1.0)))
    assert(TableDrain.upsertBatch(spark, target, path, b, "spec", 0L,
      Seq("w", "t"), Seq("n", "v")))
    val versions = GraftTableLog.versions(path).size
    // restart-replay: same (query, batchId) redelivered verbatim
    assert(!TableDrain.upsertBatch(spark, target, path, b, "spec", 0L,
      Seq("w", "t"), Seq("n", "v")))
    assert(GraftTableLog.versions(path).size == versions,
      "a replayed epoch must not churn a table version")
    assert(TableDrain.read(spark, path).count() == 1L)
  }

  test("upsertSink drains an update-mode aggregation; readback equals " +
      "the batch aggregate") {
    import spark.implicits._
    val (target, path) = freshTable()
    val run = java.util.UUID.randomUUID().toString
    val tmp = sys.props("java.io.tmpdir")
    val ingest = s"$tmp/graft_drainspec_in_$run"
    val ckpt = s"$tmp/graft_drainspec_ck_$run"
    val data = (0L until 100L).map(i => (i % 7, s"t${i % 3}", i.toDouble))
    val df = data.toDF("k", "t", "v")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(ingest).getFileSystem(conf)
    try {
      df.coalesce(1).write.parquet(ingest)
      val src = spark.readStream.schema(df.schema).parquet(ingest)
      val agg = src.groupBy("k", "t")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(28,10)")).cast("double").as("sv"))
      TableDrain.create(spark, target, agg.schema)
      val q = TableDrain.upsertSink(spark, agg, target, path,
          s"spec_$run", Seq("k", "t"), Seq("n", "sv"))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = TableDrain.read(spark, path).orderBy("k", "t").collect()
      val want = df.groupBy("k", "t")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(28,10)")).cast("double").as("sv"))
        .orderBy("k", "t").collect()
      assert(got.toSeq == want.toSeq)
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(ingest), true)
      fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
    }
  }

  test("overwriteSink: each complete-mode epoch overwrites; the last " +
      "one is the final state") {
    import spark.implicits._
    val run = java.util.UUID.randomUUID().toString
    val tmp = sys.props("java.io.tmpdir")
    val ingest = s"$tmp/graft_drainspec_ow_in_$run"
    val ckpt = s"$tmp/graft_drainspec_ow_ck_$run"
    val table = s"$tmp/graft_drainspec_ow_tbl_$run"
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(ingest).getFileSystem(conf)
    try {
      // two files, pinned mtimes, one per micro-batch: complete mode
      // re-emits ALL state each epoch, so epoch 2's overwrite must
      // reflect both files' rows
      val d1 = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
      val d2 = Seq((1L, 10.0), (3L, 3.0)).toDF("k", "v")
      def stage(name: String, d: DataFrame, mtime: Long): Unit = {
        val scratch = new org.apache.hadoop.fs.Path(s"$ingest/_s_$name")
        d.coalesce(1).write.parquet(scratch.toString)
        val part = fs.globStatus(new org.apache.hadoop.fs.Path(
          s"$scratch/part-*.parquet"))(0).getPath
        val dest = new org.apache.hadoop.fs.Path(s"$ingest/$name.parquet")
        require(fs.rename(part, dest))
        fs.delete(scratch, true)
        fs.setTimes(dest, mtime, -1)
      }
      stage("b1", d1, 1000000L)
      stage("b2", d2, 2000000L)
      val src = spark.readStream.schema(d1.schema)
        .option("maxFilesPerTrigger", 1).parquet(ingest)
      val agg = src.groupBy("k")
        .agg(sum(col("v").cast("decimal(28,10)")).cast("double").as("sv"))
      val q = TableDrain.overwriteSink(table)(agg)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = TableDrain.read(spark, table).orderBy("k").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == Seq((1L, 11.0), (2L, 2.0), (3L, 3.0)))
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(ingest), true)
      fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
      fs.delete(new org.apache.hadoop.fs.Path(table), true)
    }
  }
}
