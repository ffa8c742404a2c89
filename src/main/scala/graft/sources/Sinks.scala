package graft.sources

import org.apache.spark.sql.DataFrame

/** Sink surface (SURVEY §2.2, K1–K3).
  *
  * The reference writes str()-formatted text shards via `WriteToText`
  * (`/root/reference/pipelines/cycle_rides.py:61-70`), optionally forcing a
  * single shard (`total_distance.py:130-133`, num_shards=0). Spark-native:
  * the csv writer subsumes the manual `format_csv` join
  * (`total_distance.py:50-52`), and `coalesce(1)` reproduces single-file
  * output without a full shuffle (vs `repartition(1)`).
  */
object Sinks {

  /** K1: sharded CSV with header. */
  def csvWithHeader(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** K2: plain sharded CSV, no header. */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").csv(path)

  /** K3: single-file CSV (reference num_shards=0). `coalesce(1)` narrows
    * the final stage to one task without inserting an exchange; only use
    * on small (post-agg / post-limit) results — by design, same as the
    * reference's single-shard sink. */
  def csvSingleFile(df: DataFrame, path: String, header: Boolean = false): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", header.toString).csv(path)

  /** Parquet sink — the engine-native interchange format. */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Parquet sink + a WRITE-TIME per-file zone-map manifest
    * (`_graft_stats.parquet` sidecar; the leading underscore keeps it
    * out of every scan's file listing). For each data file and column
    * the sidecar records min/max (order-safe kinds only: integrals as
    * long, strings byte-exact, booleans as 0/1 — float/double bounds
    * are distrusted for the same NaN/−0.0 reasons as row-group
    * pruning), null count, and value count, folded across the file's
    * row groups from its footer.
    *
    * This is the file-granular skipping level ABOVE row groups — the
    * Delta/Iceberg data-skipping pattern: [[GraftParquetScan]] consults
    * the manifest at PLANNING time and never even schedules a task for
    * a file the pushed (or runtime — DPP keys drop whole files)
    * conjunction provably refutes. Footers are read once here, where
    * the write already paid for the I/O — planning stays
    * manifest-read-only at any file count. */
  def parquetWithStats(df: DataFrame, path: String): Unit = {
    parquet(df, path)
    val spark = df.sparkSession
    val files = GraftParquetV2.listFiles(path)
    // footer reads run as a Spark job (the write produced the files in
    // parallel; reading them back serially on the driver would be the
    // one O(files) stall in an otherwise distributed write) — the
    // collected manifest is files × columns rows, model-scale. The
    // stats rules AND the sidecar writer are the connector write path's
    // ([[GraftParquetWrite]]): one implementation of each, so
    // sink-written and connector-written manifests can never drift.
    val shipped = GraftSerConf.session() // tasks keep spark.hadoop.*
    val entries = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 64)))
      .flatMap(f => GraftParquetWrite.fileStatsEntries(f, shipped.value))
      .collect().toSeq
    GraftParquetWrite.replaceManifest(path, entries,
      java.util.UUID.randomUUID().toString)
  }

  /** ORC sink — see [[Sources.orc]]. */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Hive-style partitioned parquet: one directory per partition value.
    * Filters on the partition column prune entire directories from the
    * scan (`PartitionFilters` in the plan, zero data files touched for
    * excluded values) — the first-line data-skipping mechanism for a
    * 100 TB lake (partition by date/source, NOT by high-cardinality
    * keys — small-file explosion). Asserted in PartitioningSpec. */
  def parquetPartitioned(df: DataFrame, path: String,
      partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed parquet table (requires a table name — bucketing metadata
    * lives in the catalog). Two tables bucketed on their join key with the
    * same bucket count join WITHOUT any Exchange: at 100 TB this turns the
    * repeated fact⋈fact shuffle into a co-located merge, paid once at
    * write time. Asserted in BucketingSpec (plan shows no Exchange). */
  def parquetBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Small-files compaction: rewrite a parquet directory into files of
    * ~`targetFileMB` (estimated from the current on-disk bytes), via an
    * atomic-ish tmp-write + directory swap. The small-files problem is
    * the classic failure mode of streaming/partitioned ingest at scale —
    * thousands of KB-sized files turn every scan into a file-listing and
    * task-scheduling exercise; compaction restores scan efficiency
    * without changing content (spec asserts byte-identical rows and the
    * expected file count). Content is only reorganized, so replaying a
    * compaction is idempotent.
    *
    * All filesystem access goes through the Hadoop FileSystem resolved
    * from the path (so file:/, hdfs:/, s3a:/ URIs all work — the same
    * resolution the parquet writer uses). Hive-PARTITIONED datasets are
    * REFUSED loudly: reading nested partition directories and rewriting
    * flat would silently turn partition columns into data columns and
    * lose directory pruning — compact each leaf partition instead. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFileMB: Int = 128): Unit = {
    require(targetFileMB > 0, "compact: targetFileMB must be positive")
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.getFileStatus(dir).isDirectory, s"compact: $path is not a directory")
    val entries = fs.listStatus(dir) // throws IOException on listing failure
    require(!entries.exists(e => e.isDirectory &&
        !e.getPath.getName.startsWith("_") && !e.getPath.getName.startsWith(".")),
      s"compact: $path contains nested data directories (Hive-partitioned " +
        "layout) — a flat rewrite would fold partition columns into the data " +
        "files and lose directory pruning. Compact each leaf partition " +
        "directory instead.")
    val bytes = entries
      .filter(e => e.isFile && e.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val files = math.max(1, math.ceil(
      bytes.toDouble / (targetFileMB.toLong << 20)).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "_compact_tmp")
    spark.read.parquet(path).repartition(files)
      .write.mode("overwrite").parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(path + "_compact_old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(dir, old)) sys.error(s"compact: could not retire $path")
    if (!fs.rename(tmp, dir)) sys.error(s"compact: could not publish $tmp")
    fs.delete(old, true)
    ()
  }

  /** Sharded JSONL export + manifest — the delivery format training
    * jobs actually consume (one JSON object per line, fixed shard
    * count, a manifest the loader can fingerprint). Rows are routed to
    * shards by HASH OF `shardKey`, so the file a row lands in is a pure
    * function of the data (reproducible export — a re-run from the same
    * frame produces the same shard membership; round-robin
    * `repartition(n)` would not). `_manifest.json` records per-shard
    * file names and byte sizes plus the total row count, written
    * through the same Hadoop FileSystem as the data (DFS-safe). */
  def jsonlSharded(df: DataFrame, path: String, shards: Int,
      shardKey: org.apache.spark.sql.Column): Unit = {
    require(shards >= 1, s"jsonlSharded: shards must be >= 1, got $shards")
    val spark = df.sparkSession
    df.repartition(shards, shardKey)
      .write.mode("overwrite").json(path)
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(dir)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    val rows = spark.read.json(path).count()
    val manifest = parts.map(p =>
        s"""{"file": "${p.getPath.getName}", "bytes": ${p.getLen}}""")
      .mkString(
        s"""{"format": "jsonl", "n_shards": ${parts.length}, """ +
          s""""n_rows": $rows, "files": [""",
        ", ", "]}\n")
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_manifest.json"), true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
  }

  /** Z-ordered parquet: cluster rows by the Morton code of two bounded
    * numeric columns so every output file covers a tight 2-D rectangle —
    * then BOTH columns' min/max row-group stats are selective, and a
    * 2-D range predicate prunes to the files whose rectangles intersect
    * it (sorting by one column alone leaves the other unconstrained per
    * file). The quantization to 16-bit grid cells happens here from the
    * caller-declared [lo, hi) bounds; rows outside the bounds clamp to
    * the edge cells (they cluster at the border rather than failing —
    * bounds are a layout hint, not a filter).
    *
    * `repartitionByRange` on z gives files = contiguous Morton ranges
    * (the clustering property); `sortWithinPartitions` tightens row
    * groups within each file. One range exchange total — same shuffle
    * count as any repartitioned write. See [[graft.expr.ZOrderKernels]]
    * for why this matters at 100 TB.
    */
  def parquetZOrdered(df: DataFrame, xCol: String, xLo: Double, xHi: Double,
      yCol: String, yLo: Double, yHi: Double, path: String,
      files: Int = 32): Unit = {
    import org.apache.spark.sql.functions._
    require(xHi > xLo && yHi > yLo, "parquetZOrdered: need hi > lo bounds")
    def cell(c: String, lo: Double, hi: Double) =
      least(lit(65535L), greatest(lit(0L),
        floor((col(c) - lit(lo)) / lit(hi - lo) * 65536).cast("long")))
    df.withColumn("_z", graft.expr.InterleaveBits16(
        cell(xCol, xLo, xHi), cell(yCol, yLo, yHi)))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Hilbert-ordered parquet — [[parquetZOrdered]] with the
    * locality-preserving curve ([[graft.expr.HilbertKernels]]):
    * consecutive indices are grid neighbors, so each file's contiguous
    * index range covers one CONNECTED region where Morton ranges can
    * fragment across quadrant seams — tighter per-file bounding boxes,
    * fewer files touched per 2-D range query. Same single range
    * exchange; same clamp-to-edge bounds contract. */
  def parquetHilbertOrdered(df: DataFrame, xCol: String, xLo: Double,
      xHi: Double, yCol: String, yLo: Double, yHi: Double, path: String,
      files: Int = 32): Unit = {
    import org.apache.spark.sql.functions._
    require(xHi > xLo && yHi > yLo, "parquetHilbertOrdered: need hi > lo bounds")
    def cell(c: String, lo: Double, hi: Double) =
      least(lit(65535L), greatest(lit(0L),
        floor((col(c) - lit(lo)) / lit(hi - lo) * 65536).cast("long")))
    df.withColumn("_h", graft.expr.HilbertIndex16(
        cell(xCol, xLo, xHi), cell(yCol, yLo, yHi)))
      .repartitionByRange(files, col("_h"))
      .sortWithinPartitions("_h")
      .drop("_h")
      .write.mode("overwrite").parquet(path)
  }
}
