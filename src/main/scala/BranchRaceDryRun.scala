package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 CROSS-PROCESS branch-commit race: two separate JVMs append
  * concurrently to ONE branch while the driver appends to MAIN of the
  * same table. The round-14 ref was delete+rename last-writer-wins
  * under a "one writer per branch" contract — exactly the lost-update
  * class the main log's CommitRaceSpec exists to prevent, and the WAP
  * session knob invites concurrent audit jobs onto branches. The ref
  * is now SEQUENCED ([[graft.sources.GraftTableLog.casBranchHead]]):
  * a head update is the exclusive create of the next seq file, so a
  * loser's commit REBUILDS on the moved head
  * ([[graft.sources.GraftParquetWrite.commitBranchMetadata]]) instead
  * of silently overwriting the winner.
  *
  * `runMain graft.BranchRaceDryRun` — validates:
  *   - the branch head holds EVERY (writer, seq) branch batch exactly
  *     once (no lost branch commit under the race) plus exactly the
  *     fork-time main rows;
  *   - main holds ONLY main batches (no branch leak into main, no main
  *     leak into the race);
  *   - global versions stay DENSE (every claim — including any
  *     CAS-orphaned ones — landed a readable number);
  *   - the branch base never moved;
  *   - fast_forward REFUSES (main advanced since the fork).
  * Prints one BRANCHRACE line for SCALE.md. */
object BranchRaceDryRun {

  private val RowsPerAppend = 1000L
  private val Fmt = "graft.sources.GraftParquetTableProvider"

  def main(args: Array[String]): Unit = args.toList match {
    case "child" :: table :: tag :: n :: Nil => child(table, tag, n.toInt)
    case _ => drive()
  }

  /** One BRANCH writer process: N sequential appends to branch "exp",
    * rows tagged (writer, seq). */
  private def child(table: String, tag: String, n: Int): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (0 until n).foreach { seq =>
      spark.range(RowsPerAppend)
        .select(col("id"), lit(tag).as("writer"), lit(seq).as("seq"))
        .coalesce(1)
        .write.format(Fmt)
        .option("path", table).option("branch", "exp")
        .mode("append").save()
    }
    spark.stop()
  }

  private def drive(): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(race(spark, 4))
    spark.stop()
  }

  /** Two child JVMs × `n` branch appends racing each other on branch
    * "exp" plus `n` concurrent MAIN appends from this JVM; validate,
    * return the BRANCHRACE summary line. Shared by the dry-run main and
    * BranchRaceSpec. */
  def race(spark: SparkSession, n: Int): String = {
    import graft.sources.GraftTableLog
    val table = s"/tmp/branch_race_${java.util.UUID.randomUUID()}"
    def mainAppend(seq: Int): Unit =
      spark.range(RowsPerAppend)
        .select(col("id"), lit("m").as("writer"), lit(seq).as("seq"))
        .coalesce(1)
        .write.format(Fmt).option("path", table)
        .mode("append").save()
    mainAppend(0) // v1 — the fork point
    GraftTableLog.createBranch(table, "exp", 1L)
    val t0 = System.nanoTime()
    val a = RaceHarness.spawn("graft.BranchRaceDryRun", table, "a",
      Seq(n.toString))
    val b = RaceHarness.spawn("graft.BranchRaceDryRun", table, "b",
      Seq(n.toString))
    (1 to n).foreach(mainAppend) // main advances WHILE the branch races
    val ea = a.waitFor()
    val eb = b.waitFor()
    val wall = (System.nanoTime() - t0) / 1e9
    require(ea == 0 && eb == 0,
      s"branch writers must exit clean, got a=$ea b=$eb\n" +
        s"${RaceHarness.tail(table, "a")}\n${RaceHarness.tail(table, "b")}")
    // 1. no lost branch commit: the branch head holds every (writer,
    //    seq) branch batch exactly once, plus exactly the fork-time
    //    main batch
    val (head, base) = GraftTableLog.readBranch(table, "exp").getOrElse(
      throw new IllegalStateException("branch 'exp' vanished"))
    require(base == 1L, s"branch base must stay at the fork, got $base")
    val branchView = spark.read.format(Fmt).option("path", table)
      .option("versionAsOf", head.toString).load()
    val got = branchView.groupBy("writer", "seq").count().collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    val want = ((("m", 0) -> RowsPerAppend) +:
      (for (w <- Seq("a", "b"); s <- 0 until n)
        yield (w, s) -> RowsPerAppend)).toMap
    require(got == want,
      s"branch head must hold every branch batch exactly once + the " +
        s"fork-time main rows; diff: " +
        s"${(want.toSet diff got.toSet) ++ (got.toSet diff want.toSet)}")
    // 2. no branch leak into main
    val mainView = spark.read.format(Fmt).option("path", table).load()
    val mainGot = mainView.groupBy("writer", "seq").count().collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    val mainWant =
      (for (s <- 0 to n) yield ("m", s) -> RowsPerAppend).toMap
    require(mainGot == mainWant,
      s"main must hold only main batches; diff: " +
        s"${(mainWant.toSet diff mainGot.toSet) ++
          (mainGot.toSet diff mainWant.toSet)}")
    // 3. dense global versions — every claim (including CAS-orphaned
    //    ones) landed a readable number
    val versions = GraftTableLog.versions(table)
    require(versions == (1L to versions.size.toLong),
      s"versions must be dense, got $versions")
    require(versions.size >= 1 + n + 2 * n,
      s"expected at least ${1 + 3 * n} versions, got ${versions.size}")
    versions.foreach { v =>
      spark.read.format(Fmt).option("path", table)
        .option("versionAsOf", v.toString).load().count()
    }
    // 4. fast-forward must refuse: main advanced since the fork
    val ffRefused =
      try { graft.sources.GraftMaintenance.fastForward(table, "exp"); false }
      catch { case _: IllegalArgumentException |
        _: IllegalStateException => true }
    require(ffRefused,
      "fast_forward must refuse a branch whose main advanced")
    val casLosses = versions.size - (1 + n + 2 * n)
    val line = f"BRANCHRACE ok=true branch_writers=2 appends_each=$n " +
      f"main_appends=${n + 1} versions=${versions.size} " +
      f"cas_orphans=$casLosses wall_s=$wall%.1f"
    val p = new org.apache.hadoop.fs.Path(table)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    Seq("a", "b").foreach(t => RaceHarness.childLog(table, t).delete())
    line
  }
}
