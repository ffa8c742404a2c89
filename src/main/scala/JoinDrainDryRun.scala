package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-15 attribution for `q_stream_join_error_purchase` — the
  * catalog's biggest sf0.1 line item (12.4 s r14), which took the
  * round-14 table-sink drain tax (+2.2 s vs r13) WITHOUT a stage
  * slice. This tool splits the entry into its three stages and prints
  * one line per configuration:
  *
  *   - STAGE: the three pinned-order ingest files (3 coalesce(1)
  *     writes scanning events.parquet each — fixed cost, no streaming
  *     involved);
  *   - STREAM: the two-source symmetric-join query itself, with the
  *     per-batch breakdown from StreamingQueryProgress (addBatch /
  *     getBatch / walCommit / stateOperators' update+commit times) —
  *     the state work vs epoch-commit split the verdict asked for;
  *   - READBACK: TableDrain.read + orderBy + full materialization.
  *
  * Run twice with different shuffle-partition counts: a symmetric
  * stream-stream join shuffles BOTH sides to `spark.sql.shuffle
  * .partitions` state partitions per micro-batch, and each state
  * partition pays four HDFSBackedStateStore instances (keyToNumValues
  * + keyWithIndexToValue per side) × batches × snapshot/delta files —
  * pure per-instance fixed cost when per-batch rows are thousands.
  * Real deployments size this per streaming JOB (the conf is pinned
  * into the checkpoint at first run); the A/B quantifies what the
  * bench's CPU-count default (32) costs against a state-sized 8.
  *
  * `runMain graft.JoinDrainDryRun [sfDir]` — one STAGE/STREAM/READBACK
  * line per config for SCALE.md. */
object JoinDrainDryRun {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftSession.adopt(spark)
    spark.read.parquet(s"$sfDir/events.parquet").count() // warm
    Seq(32, 8).foreach { parts =>
      val r = run(spark, sfDir, parts)
      println(r)
    }
    spark.stop()
  }

  /** One full entry execution at `parts` state partitions; returns the
    * attribution line. */
  def run(spark: SparkSession, sfDir: String, parts: Int): String = {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try runInner(spark, sfDir, parts)
    finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  private def runInner(spark: SparkSession, sfDir: String,
      parts: Int): String = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val run = java.util.UUID.randomUUID().toString
    val tmp = sys.props("java.io.tmpdir")
    val ingest = s"$tmp/graft_jdr_in_$run"
    val ckpt = s"$tmp/graft_jdr_ckpt_$run"
    val table = s"$tmp/graft_jdr_tbl_$run"
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(ingest).getFileSystem(conf)
    def stage(name: String, parity: Int, mtimeMs: Long): Unit = {
      val scratch = new org.apache.hadoop.fs.Path(s"$ingest/_st_$name")
      ev.filter(pmod(col("event_id"), lit(3)) === parity)
        .coalesce(1).write.parquet(scratch.toString)
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$scratch/part-*.parquet"))(0).getPath
      val dest = new org.apache.hadoop.fs.Path(s"$ingest/$name.parquet")
      require(fs.rename(part, dest), s"stage rename failed: $name")
      fs.delete(scratch, true)
      fs.setTimes(dest, mtimeMs, -1)
    }
    val t0 = System.nanoTime()
    stage("b1", 0, 1000000L)
    stage("b2", 1, 2000000L)
    stage("b3", 2, 3000000L)
    val tStage = (System.nanoTime() - t0) / 1e9

    def side(tag: String): DataFrame = {
      val s = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ingest)
      s.withColumn("ts", StreamingQueries.tsAsTimestamp(s))
        .withWatermark("ts", "3650 days")
        .filter(col("event_type") === tag)
    }
    val errors = side("error")
      .select(col("event_id").as("error_id"),
        col("user_id"), col("ts").as("e_ts"))
    val purchases = side("purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
    val joined = errors.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("e_ts") &&
        col("p_ts") <= col("e_ts") + expr("interval 24 hours"))
      .select(col("error_id"), col("purchase_id"), col("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("e_ts")))
          .as("gap_us"))
    val t1 = System.nanoTime()
    val q = joined.writeStream
      .format("graft.sources.GraftParquetTableProvider")
      .option("path", table)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val tStream = (System.nanoTime() - t1) / 1e9
    // per-batch breakdown from the progress log: durationMs buckets
    // plus the state operator's update/commit split
    val prog = q.recentProgress.toSeq
    def sumMs(key: String): Long = prog.map { p =>
      Option(p.durationMs.get(key)).map(_.longValue()).getOrElse(0L)
    }.sum
    val addBatch = sumMs("addBatch")
    val getBatch = sumMs("getBatch") + sumMs("latestOffset")
    val walCommit = sumMs("walCommit") + sumMs("commitOffsets")
    val stateUpdate = prog.flatMap(_.stateOperators.toSeq)
      .map(_.allUpdatesTimeMs).sum
    val stateCommit = prog.flatMap(_.stateOperators.toSeq)
      .map(_.commitTimeMs).sum
    val rowsOut = prog.flatMap(_.stateOperators.toSeq)
      .map(_.numRowsUpdated).sum

    val t2 = System.nanoTime()
    val n = graft.streaming.TableDrain.read(spark, table)
      .orderBy("error_id", "purchase_id")
      .queryExecution.toRdd.count()
    val tRead = (System.nanoTime() - t2) / 1e9
    fs.delete(new org.apache.hadoop.fs.Path(ingest), true)
    fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
    fs.delete(new org.apache.hadoop.fs.Path(table), true)
    f"JOINDRAIN parts=$parts batches=${prog.size} matches=$n " +
      f"stage_s=$tStage%.2f stream_s=$tStream%.2f readback_s=$tRead%.2f " +
      f"addBatch_ms=$addBatch getBatch_ms=$getBatch " +
      f"walCommit_ms=$walCommit stateUpdate_ms=$stateUpdate " +
      f"stateCommit_ms=$stateCommit stateRowsUpdated=$rowsOut"
  }
}
