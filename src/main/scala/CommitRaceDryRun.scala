package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 CROSS-PROCESS commit-race check: two separate JVMs append
  * concurrently to one graft table. The optimistic version claim
  * (exclusive snapshot create + re-list-and-retry,
  * [[graft.sources.GraftTableLog.writeSnapshot]] /
  * [[graft.sources.GraftParquetWrite.commitMetadata]]) is serialized
  * in-JVM by a per-table lock; cross-JVM it rests entirely on the
  * filesystem's atomic no-overwrite create. GraftTableLogSpec pins the
  * 4-thread in-JVM linearization; this tool is the cross-JVM version
  * the spec cannot reach.
  *
  * `runMain graft.CommitRaceDryRun` — spawns two child JVMs (same classpath)
  * that each run N appends against one table, then validates:
  *   - versions are DENSE 1..2N (every commit claimed a unique number,
  *     no number skipped, no torn snapshot left behind);
  *   - every (writer, seq) batch's rows are all present exactly once —
  *     no lost update, no duplicated generation;
  *   - every version snapshot is readable (versionAsOf resolves).
  * Prints one RACE line for SCALE.md. */
object CommitRaceDryRun {

  private val RowsPerAppend = 1000L

  def main(args: Array[String]): Unit = args.toList match {
    case "child" :: table :: tag :: n :: Nil => child(table, tag, n.toInt)
    case _ => drive()
  }

  /** One writer process: N sequential appends, rows tagged
    * (writer, seq) so the validator can account for every batch. */
  private def child(table: String, tag: String, n: Int): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (0 until n).foreach { seq =>
      spark.range(RowsPerAppend)
        .select(col("id"), lit(tag).as("writer"), lit(seq).as("seq"))
        .coalesce(1)
        .write.format("graft.sources.GraftParquetTableProvider")
        .option("path", table).mode("append").save()
    }
    spark.stop()
  }

  private def drive(): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(race(spark, 6))
    spark.stop()
  }

  /** Spawn two child JVMs doing `n` transactional appends each against
    * one fresh table, then validate linearization; returns the RACE
    * summary line. Shared by the dry-run main and CommitRaceSpec (the
    * per-round `sbt test` form of this evidence — `Test / fork` gives
    * the spec a real java.class.path to hand the children). */
  def race(spark: SparkSession, n: Int): String = {
    val table = s"/tmp/commit_race_${java.util.UUID.randomUUID()}"
    // children run with the parent's module options and their output
    // captured per-child (RaceHarness) — a dead child's stack lands in
    // the failure message, not scattered into sbt stdout
    def spawn(tag: String): Process = RaceHarness.spawn(
      "graft.CommitRaceDryRun", table, tag, Seq(n.toString))
    val t0 = System.nanoTime()
    val a = spawn("a")
    val b = spawn("b")
    val ea = a.waitFor()
    val eb = b.waitFor()
    val wall = (System.nanoTime() - t0) / 1e9
    require(ea == 0 && eb == 0,
      s"child writers must exit clean, got a=$ea b=$eb\n" +
        s"${RaceHarness.tail(table, "a")}\n${RaceHarness.tail(table, "b")}")
    // 1. dense version numbers: every commit claimed a unique number
    val versions = graft.sources.GraftTableLog.versions(table)
    require(versions == (1L to (2 * n).toLong),
      s"versions must be dense 1..${2 * n}, got $versions")
    // 2. no lost or duplicated batch: every (writer, seq) counts full
    val head = spark.read
      .format("graft.sources.GraftParquetTableProvider")
      .option("path", table).load()
    val batches = head.groupBy("writer", "seq").count().collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    val want = (for (w <- Seq("a", "b"); s <- 0 until n)
      yield (w, s) -> RowsPerAppend).toMap
    require(batches == want,
      s"every batch must land exactly once; diff: " +
        s"${(want.toSet diff batches.toSet) ++ (batches.toSet diff want.toSet)}")
    // 3. every snapshot resolves (no torn version squatting a number)
    //    and history is MONOTONE: each snapshot is built from a listing
    //    at least as fresh as its claimed number, so version v holds AT
    //    LEAST v committed appends (a racer's already-renamed files may
    //    legitimately ride an earlier claim's snapshot as `present`
    //    rows — the documented contract), never fewer, and the row set
    //    never goes backwards
    var prev = 0L
    versions.foreach { v =>
      val c = spark.read
        .format("graft.sources.GraftParquetTableProvider")
        .option("path", table).option("versionAsOf", v.toString)
        .load().count()
      require(c >= v * RowsPerAppend,
        s"versionAsOf $v must hold >= $v appends, got $c rows")
      require(c >= prev, s"history went backwards at v$v: $prev -> $c")
      prev = c
    }
    require(prev == 2 * n * RowsPerAppend,
      s"final version must hold every append, got $prev")
    val line = f"RACE ok=true writers=2 appends_each=$n " +
      f"versions=${versions.size} rows=${head.count()} wall_s=$wall%.1f"
    val p = new org.apache.hadoop.fs.Path(table)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    Seq("a", "b").foreach(t => // kept on failure
      RaceHarness.childLog(table, t).delete())
    line
  }
}
