package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.sources.{GraftParquetScan, GraftParquetV2, Sinks}

/** The DSv2 WRITE path ([[graft.sources.GraftParquetWrite]]): append and
  * truncate-overwrite through the connector own the stats-manifest
  * sidecar transactionally — appended files gain manifest rows (and so
  * participate in file-level pruning), overwrite replaces data AND
  * manifest, and the round trip through the connector's own reader is
  * exact across every supported type. This closes the r6 verdict's
  * append-staleness hole: before, only Sinks.parquetWithStats wrote the
  * manifest, and any later append left files unmanifested. */
class GraftParquetWriteSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"

  private def viaV2(path: String): DataFrame =
    spark.read.format(fmt).option("path", path).load()

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_w_$name").toFile
    d.delete() // parquetWithStats wants to create it fresh
    d.getAbsolutePath
  }

  private def graftScan(df: DataFrame): GraftParquetScan = {
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[GraftParquetScan] = p.collect {
      case b: BatchScanExec => b.scan match {
        case s: GraftParquetScan => Seq(s)
        case _ => Nil
      }
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
    }.flatten
    scans(df.queryExecution.executedPlan).headOption
      .getOrElse(fail("no GraftParquetScan in the plan"))
  }

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "source", "lang", "n_chars", "text")

  test("append adds data AND manifest rows; both halves prune by file") {
    val dir = tmp("append")
    val lo = docs.filter(col("doc_id") < 20L)
    val hi = docs.filter(col("doc_id") >= 400L)
    Sinks.parquetWithStats(lo.coalesce(1), dir)
    hi.coalesce(1).write.format(fmt).option("path", dir)
      .mode("append").save()

    // content: connector read-back == built-in union, exactly
    val got = viaV2(dir).orderBy("doc_id").collect().toSeq
    val want = lo.unionByName(hi).orderBy("doc_id").collect().toSeq
    assert(got == want)

    // the manifest now covers EVERY data file — including the appended
    // one (the pre-write split brain this path exists to close)
    val files = GraftParquetV2.listFiles(dir)
      .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    val manifest = GraftParquetV2.loadStatsManifest(dir)
    assert(manifest.keySet == files,
      s"manifest keys ${manifest.keySet} != data files $files")
    assert(files.size == 2)

    // file-level pruning works against BOTH generations of manifest
    // rows: a doc_id range inside only one file's bounds plans exactly
    // one partition; an impossible range plans ZERO
    def planned(df: DataFrame): Int =
      graftScan(df).planInputPartitions().length
    assert(planned(viaV2(dir).filter(col("doc_id") < 10L)) == 1)
    assert(planned(viaV2(dir).filter(col("doc_id") >= 450L)) == 1)
    assert(planned(viaV2(dir).filter(col("doc_id") === 200L)) == 0)
  }

  test("append to a manifest-less table bootstraps a manifest for its " +
      "own files; old files stay conservatively scanned") {
    val dir = tmp("bootstrap")
    docs.filter(col("doc_id") < 20L).coalesce(1)
      .write.parquet(dir) // plain write: NO sidecar
    docs.filter(col("doc_id") >= 400L).coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    val manifest = GraftParquetV2.loadStatsManifest(dir)
    assert(manifest.keySet.size == 1,
      s"bootstrap manifest should cover only the appended file: $manifest")
    // unknown (unmanifested) file is always read: the refuting filter
    // can drop the appended file but never the legacy one
    val scan = graftScan(viaV2(dir).filter(col("doc_id") === 200L))
    assert(scan.planInputPartitions().length == 1)
    // and results are still exact
    assert(viaV2(dir).count() ==
      docs.filter(col("doc_id") < 20L || col("doc_id") >= 400L).count())
  }

  test("overwrite truncates: data replaced, manifest replaced atomically") {
    val dir = tmp("truncate")
    Sinks.parquetWithStats(docs.filter(col("doc_id") < 20L).coalesce(1), dir)
    val oldFiles = GraftParquetV2.listFiles(dir).toSet
    docs.filter(col("doc_id").between(100L, 150L)).coalesce(1)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val newFiles = GraftParquetV2.listFiles(dir).toSet
    assert(newFiles.intersect(oldFiles).isEmpty, "old data files survive")
    assert(viaV2(dir).orderBy("doc_id").collect().toSeq ==
      docs.filter(col("doc_id").between(100L, 150L))
        .orderBy("doc_id").collect().toSeq)
    val manifest = GraftParquetV2.loadStatsManifest(dir)
    assert(manifest.keySet ==
      newFiles.map(f => new org.apache.hadoop.fs.Path(f).getName),
      s"manifest must cover exactly the new files: ${manifest.keySet}")
  }

  test("typed round trip: every supported type survives the connector " +
      "write → connector read, nulls included") {
    import spark.implicits._
    val dir = tmp("types")
    // the seed file goes through Spark's own writer, whose DEFAULT
    // timestamp encoding is INT96 — a legacy type the connector reader
    // declines by design; pin the modern encoding for the seed write
    // (restored in the finally: the session is suite-shared)
    val prevTsType = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
    val df = Seq(
      (1, 10L, 1.5, 2.5f, true, "añño", Array[Byte](1, 2),
        java.sql.Date.valueOf("2024-02-29"),
        java.sql.Timestamp.valueOf("2024-02-29 12:34:56.789")),
      (2, 20L, -0.5, 0f, false, "", Array[Byte](),
        java.sql.Date.valueOf("1970-01-01"),
        java.sql.Timestamp.valueOf("1999-12-31 23:59:59.999"))
    ).toDF("i", "l", "d", "f", "b", "s", "bin", "dt", "ts")
      .unionByName(Seq((3, 30L)).toDF("i", "l")
        .withColumn("d", lit(null).cast("double"))
        .withColumn("f", lit(null).cast("float"))
        .withColumn("b", lit(null).cast("boolean"))
        .withColumn("s", lit(null).cast("string"))
        .withColumn("bin", lit(null).cast("binary"))
        .withColumn("dt", lit(null).cast("date"))
        .withColumn("ts", lit(null).cast("timestamp")))
    Sinks.parquetWithStats(df.filter(col("i") === 1), dir)
    df.filter(col("i") =!= 1).write.format(fmt).option("path", dir)
      .mode("append").save()
    def canon(r: org.apache.spark.sql.Row): Seq[Any] =
      r.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case v => v
      }
    val got = viaV2(dir).orderBy("i").collect().toSeq.map(canon)
    val want = df.orderBy("i").collect().toSeq.map(canon)
    assert(got == want)
    // the built-in reader agrees on the connector-written files too
    assert(spark.read.parquet(dir).orderBy("i").collect().toSeq
      .map(canon) == want)
    } finally spark.conf.set(
      "spark.sql.parquet.outputTimestampType", prevTsType)
  }

  test("inferred table schema is nullable even when the first file's " +
      "footer says REQUIRED — appended nulls survive the read") {
    // Root cause of the r7 full-suite flake: inferSchema reads ONE
    // footer (the lexically first file); a seed file whose rows happened
    // to be all non-null declares its columns REQUIRED, and trusting
    // that for the whole table made Spark's codegen skip null checks —
    // appended nulls silently unboxed to 0.0/false. Whether the bug
    // fired depended on whether the seed's random UUID sorted before
    // the appended files' task ids: a filename lottery, not
    // concurrency. This test removes the lottery by FORCING the
    // REQUIRED-schema seed to sort first.
    import spark.implicits._
    val dir = tmp("nullable")
    val seed = Seq((1, 1.5, true)).toDF("i", "d", "b") // all non-nullable
    Sinks.parquetWithStats(seed.coalesce(1), dir)
    // rename the seed so it sorts before ANY connector part file
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val seedFile = GraftParquetV2.listFiles(dir).head
    fs.rename(new org.apache.hadoop.fs.Path(seedFile),
      new org.apache.hadoop.fs.Path(dir, "part-00000-0000000000-seed.parquet"))
    // the seed footer really does declare REQUIRED (else this test
    // guards nothing)
    val m = GraftParquetV2.footerSchema(s"$dir/part-00000-0000000000-seed.parquet")
    assert(m.getType(m.getFieldIndex("d")).getRepetition ==
      org.apache.parquet.schema.Type.Repetition.REQUIRED)
    // append rows WITH nulls through the connector
    val app = Seq((2, Some(2.5), Some(false)), (3, None, None))
      .toDF("i", "d", "b")
    app.write.format(fmt).option("path", dir).mode("append").save()
    val got = viaV2(dir).orderBy("i").collect().toSeq
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getBoolean(2)))
    assert(got == Seq((1, 1.5, true), (2, 2.5, false), (3, null, null)))
    // and the inferred schema itself must say nullable
    assert(viaV2(dir).schema.fields.forall(_.nullable))
  }

  test("unsupported (nested) schema is declined loudly at plan time") {
    import spark.implicits._
    val dir = tmp("nested")
    Sinks.parquetWithStats(docs.limit(1).coalesce(1), dir)
    val bad = Seq((1L, Seq(1.0, 2.0))).toDF("doc_id", "emb")
    val e = intercept[Exception] {
      bad.write.format(fmt).option("path", dir).mode("overwrite").save()
    }
    assert(e.getMessage != null)
  }

  test("empty input partitions write no files") {
    val dir = tmp("empty")
    Sinks.parquetWithStats(docs.filter(col("doc_id") < 5L).coalesce(1), dir)
    val before = GraftParquetV2.listFiles(dir).size
    // 8 partitions, 3 rows — at least 5 partitions are empty
    docs.filter(col("doc_id").between(400L, 402L)).repartition(8)
      .write.format(fmt).option("path", dir).mode("append").save()
    val after = GraftParquetV2.listFiles(dir).size
    assert(after - before <= 3,
      s"empty partitions must not create files: $before -> $after")
    assert(viaV2(dir).count() ==
      docs.filter(col("doc_id") < 5L || col("doc_id").between(400L, 402L))
        .count())
    // no staging/tmp litter once the write committed
    val stray = new java.io.File(dir).listFiles()
      .map(_.getName).filter(n => n.contains("_staging") || n.contains(".tmp-"))
    assert(stray.isEmpty, s"leftover staging dirs: ${stray.toSeq}")
  }

  test("partitioned write: col=value layout, exact read-back, and " +
      "partition pruning from the LISTING alone (manifest removed)") {
    val dir = tmp("part")
    val src = docs.filter(col("doc_id") < 200L)
    src.write.format(fmt).option("path", dir)
      .option("partitionBy", "lang").mode("append").save()
    // layout: exactly one lang=<value> dir per distinct value, nothing
    // at the top level but partition dirs and the sidecar
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val top = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .map(_.getPath.getName).filterNot(_.startsWith("_"))
    val langs = src.select("lang").distinct().collect()
      .map(_.getString(0)).toSet
    assert(top.toSet == langs.map(l => s"lang=$l"), s"layout: $top")
    // exact roundtrip through the connector (values come from files)
    assert(viaV2(dir).orderBy("doc_id").collect().toSeq ==
      src.orderBy("doc_id").collect().toSeq)
    // manifest covers every partitioned file, keyed by basename
    assert(GraftParquetV2.loadStatsManifest(dir).keySet ==
      GraftParquetV2.listFiles(dir)
        .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet)
    // partition pruning with the manifest REMOVED: the `col=value`
    // directory names alone must prune the listing
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$dir/${GraftParquetV2.StatsSidecar}"), true)
    val one = langs.head
    val scan = graftScan(viaV2(dir).filter(col("lang") === one))
    val planned = scan.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.GraftFilePartition].file)
    assert(planned.nonEmpty && planned.forall(_.contains(s"lang=$one")),
      s"partition pruning failed: $planned")
    assert(planned.length < GraftParquetV2.listFiles(dir).length,
      "some partition directories must have been pruned")
    // and the filtered read is still exact
    assert(viaV2(dir).filter(col("lang") === one).count() ==
      src.filter(col("lang") === one).count())
    // truncate-overwrite replaces the partitioned generation too
    val repl = docs.filter(col("doc_id").between(300L, 320L))
    repl.write.format(fmt).option("path", dir)
      .option("partitionBy", "lang").mode("overwrite").save()
    assert(viaV2(dir).orderBy("doc_id").collect().toSeq ==
      repl.orderBy("doc_id").collect().toSeq)
  }

  test("partitioned write: null and URL-hostile partition values " +
      "round-trip; null-dir pruning follows Is[Not]Null") {
    import spark.implicits._
    val dir = tmp("partnull")
    val rows = Seq((1L, "a b/c"), (2L, null), (3L, "x=y"), (4L, "plain"))
    rows.toDF("id", "k").write.format(fmt).option("path", dir)
      .option("partitionBy", "k").mode("append").save()
    // the slash MUST be escaped or it would nest a bogus directory
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val top = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .map(_.getPath.getName).filterNot(_.startsWith("_")).toSet
    assert(top.contains(s"k=${GraftParquetV2.HiveDefaultPartition}"))
    assert(top.exists(_.contains("%2F")), s"unescaped slash in $top")
    val back = viaV2(dir).orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toSeq
    assert(back == rows)
    def plannedFiles(df: DataFrame): Seq[String] =
      graftScan(df).planInputPartitions()
        .map(_.asInstanceOf[graft.sources.GraftFilePartition].file).toSeq
    // IsNotNull prunes the null dir; IsNull prunes every value dir
    val notNull = plannedFiles(viaV2(dir).filter(col("k").isNotNull))
    assert(notNull.length == 3 &&
      notNull.forall(!_.contains(GraftParquetV2.HiveDefaultPartition)))
    val isNull = plannedFiles(viaV2(dir).filter(col("k").isNull))
    assert(isNull.length == 1 &&
      isNull.head.contains(GraftParquetV2.HiveDefaultPartition))
    // the escaped value prunes exactly by equality
    val eq = plannedFiles(viaV2(dir).filter(col("k") === "a b/c"))
    assert(eq.length == 1 && eq.head.contains("k=a+b%2Fc"), s"got $eq")
  }

  test("partitioned write: partitionOverwriteMode=dynamic replaces only " +
      "the touched partitions — files, rows, and manifest entries") {
    val dir = tmp("partdyn")
    val src = docs.filter(col("doc_id") < 200L)
    src.write.format(fmt).option("path", dir)
      .option("partitionBy", "lang").mode("append").save()
    val langs = src.select("lang").distinct().collect()
      .map(_.getString(0)).toSet
    assert(langs.size >= 2, s"fixture needs >=2 langs, got $langs")
    val target = langs.head
    // new generation for ONE partition only
    val repl = docs.filter(col("doc_id").between(300L, 340L) &&
      col("lang") === target)
    assert(repl.count() > 0, "fixture must repopulate the target lang")
    repl.write.format(fmt).option("path", dir)
      .option("partitionBy", "lang")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").save()
    // untouched partitions keep the OLD rows; the target has ONLY new
    val want = src.filter(col("lang") =!= target).unionByName(repl)
    assert(viaV2(dir).orderBy("doc_id").collect().toSeq ==
      want.orderBy("doc_id").collect().toSeq)
    // manifest exactly covers the current files — no stale rows for
    // the replaced generation, no lost rows for the survivors
    assert(GraftParquetV2.loadStatsManifest(dir).keySet ==
      GraftParquetV2.listFiles(dir)
        .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet)
    // STATIC overwrite on the same table still truncates everything
    repl.write.format(fmt).option("path", dir)
      .option("partitionBy", "lang").mode("overwrite").save()
    assert(viaV2(dir).orderBy("doc_id").collect().toSeq ==
      repl.orderBy("doc_id").collect().toSeq)
    // dynamic without partition columns is refused at plan time
    val e = intercept[Exception] {
      docs.limit(1).write.format(fmt).option("path", dir)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").save()
    }
    assert(e.getMessage.contains("dynamic"), s"got: ${e.getMessage}")
  }

  test("storage-partitioned execution: groupBy on the partition column " +
      "and a co-partitioned join both run with ZERO shuffles") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val t1 = tmp("spj1"); val t2 = tmp("spj2")
    val src = docs.filter(col("doc_id") < 300L)
    src.write.format(fmt).option("path", t1)
      .option("partitionBy", "lang").mode("append").save()
    // dim side: one row per lang, same partition-value set
    src.groupBy("lang").agg(max("n_chars").as("max_chars"))
      .write.format(fmt).option("path", t2)
      .option("partitionBy", "lang").mode("append").save()
    def shuffles(df: DataFrame): Int = {
      def walk(p: SparkPlan): Int = (p.collect {
        case e: ShuffleExchangeLike => 1
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
      }).sum
      walk(df.queryExecution.executedPlan)
    }
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // avg rewrites to sum+count and PUSHES into the scan — that
      // path keeps its one exchange, but at per-file PARTIAL-row
      // cardinality (groups × files), not row cardinality; correctness
      // only is asserted here (see outputPartitioning's scaladoc)
      val agg = viaV2(t1).groupBy("lang").agg(avg("n_chars").as("m"))
      val got = agg.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val want = src.groupBy("lang").agg(avg("n_chars").as("m"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(got == want)
      // percentile_approx is NOT pushable — a genuine row-scan
      // aggregation where the LAYOUT alone satisfies the distribution
      val rowAgg = viaV2(t1).groupBy("lang")
        .agg(expr("percentile_approx(n_chars, 0.5)").as("p50"))
      val pGot = rowAgg.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val pWant = src.groupBy("lang")
        .agg(expr("percentile_approx(n_chars, 0.5)").as("p50"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(pGot == pWant)
      assert(shuffles(rowAgg) == 0,
        s"row-scan groupBy must not shuffle:\n${rowAgg.queryExecution}")
      // co-partitioned join: both sides keyed on lang, and the join
      // key IS exactly the partition key — no exchange on EITHER side
      // (the storage-partitioned join)
      val joined = viaV2(t1).join(viaV2(t2), "lang")
        .select(col("lang"), col("doc_id"),
          (col("n_chars") === col("max_chars")).as("is_max"))
      val jGot = joined.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
      val jWant = src.join(
        src.groupBy("lang").agg(max("n_chars").as("max_chars")), "lang")
        .select(col("lang"), col("doc_id"),
          (col("n_chars") === col("max_chars")).as("is_max"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(jGot == jWant)
      assert(shuffles(joined) == 0,
        s"co-partitioned join must not shuffle:\n${joined.queryExecution}")
      // sanity: same join WITHOUT v2 bucketing does shuffle — the
      // zero above is the layout's doing, not a planner accident
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      assert(shuffles(viaV2(t1).join(viaV2(t2), "lang")
        .select("lang", "doc_id")) > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("streaming sink: per-epoch transactional appends, replay " +
      "markers, manifest coverage — partitioned layout included") {
    import org.apache.spark.sql.streaming.Trigger
    val ingest = tmp("sink_in"); val table = tmp("sink_out")
    val ckpt = tmp("sink_ckpt")
    val src = docs.filter(col("doc_id") < 200L)
    val fs = new org.apache.hadoop.fs.Path(ingest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // three staged files = three micro-batches = three epoch commits
    for ((p, i) <- Seq(0, 1, 2).zipWithIndex) {
      val scratch = new org.apache.hadoop.fs.Path(s"$ingest/_st_$p")
      src.filter(pmod(col("doc_id"), lit(3)) === p)
        .coalesce(1).write.parquet(scratch.toString)
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$scratch/part-*.parquet"))(0).getPath
      val dest = new org.apache.hadoop.fs.Path(s"$ingest/b$p.parquet")
      assert(fs.rename(part, dest))
      fs.delete(scratch, true)
      fs.setTimes(dest, 1000000L * (i + 1), -1)
    }
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 1).parquet(ingest)
    val q = stream.writeStream.format(fmt)
      .option("path", table)
      .option("partitionBy", "lang")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // content: the streamed table equals the batch source exactly
    assert(viaV2(table).orderBy("doc_id").collect().toSeq ==
      src.orderBy("doc_id").collect().toSeq)
    // layout: partition dirs, no staging litter
    val top = fs.listStatus(new org.apache.hadoop.fs.Path(table)).toSeq
      .map(_.getPath.getName)
    assert(top.exists(_.startsWith("lang=")))
    assert(!top.exists(_.contains("_staging")), s"staging litter: $top")
    // manifest covers every epoch's files
    assert(GraftParquetV2.loadStatsManifest(table).keySet ==
      GraftParquetV2.listFiles(table)
        .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet)
    // replay ledger: one marker per committed epoch (>= 3 — AvailableNow
    // may add a trailing empty epoch, which also commits a marker)
    val markers = fs.listStatus(new org.apache.hadoop.fs.Path(
      s"$table/${graft.sources.GraftParquetWrite.EpochDir}")).length
    assert(markers >= 3, s"expected >=3 epoch markers, got $markers")
    // complete mode (truncate-per-epoch) is declined loudly
    val agg = stream.groupBy("lang").count()
    val e = intercept[Exception] {
      agg.writeStream.format(fmt)
        .option("path", tmp("sink_bad"))
        .option("checkpointLocation", tmp("sink_bad_ckpt"))
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
    assert(e.getMessage != null)
  }

  test("partitioned write: plan-time validation refuses unknown and " +
      "inexact partition columns") {
    import spark.implicits._
    val dir = tmp("partbad")
    val df = Seq((1L, 1.5)).toDF("id", "v")
    val unknown = intercept[Exception] {
      df.write.format(fmt).option("path", dir)
        .option("partitionBy", "nope").mode("append").save()
    }
    assert(unknown.getMessage.contains("not in schema"),
      s"got: ${unknown.getMessage}")
    val floaty = intercept[Exception] {
      df.write.format(fmt).option("path", dir)
        .option("partitionBy", "v").mode("append").save()
    }
    assert(floaty.getMessage.contains("round-trip"),
      s"got: ${floaty.getMessage}")
  }
}
