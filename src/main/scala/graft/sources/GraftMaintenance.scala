package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Maintenance operations over a graft table's version log
  * ([[GraftTableLog]]): COMPACT (bin-pack small files into a new
  * version), VACUUM (reclaim archived generations past a retention
  * horizon), and HISTORY (the version ledger).
  *
  * Scale posture: compaction is one distributed read→write job whose
  * commit is the connector's own transactional overwrite — the small-
  * file problem an append-heavy 100 TB table accumulates (a streaming
  * sink's per-epoch files, incremental ingest batches) is repaired
  * without blocking readers: live scans see the old generation until
  * the metadata swap, the old generation stays time-travel-readable
  * after it. Vacuum is pure filesystem metadata work — O(archived
  * files) deletes, no data reads. */
object GraftMaintenance {

  private def conf = new Configuration()

  /** One ledger row: a committed version, its file count, and its
    * total row count when every file carried footer stats (None when
    * any file is a bare `present` entry). */
  final case class GraftVersionInfo(version: Long, files: Int,
      rows: Option[Long])

  /** The table's version ledger, ascending. Row counts come from each
    * snapshot's own entries (max per-column value_count per file — the
    * row count of the file), no data reads. */
  def history(table: String): Seq[GraftVersionInfo] =
    GraftTableLog.versions(table).map { v =>
      val (rels, stats) = GraftTableLog.readSnapshot(table, v)
      val counts = rels.map { rel =>
        stats.get(new Path(rel).getName)
          .flatMap(_.values.map(_.valueCount).maxOption)
      }
      GraftVersionInfo(v, rels.size,
        if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None)
    }

  /** Bin-pack the live table into ~`targetFileBytes` files as a NEW
    * VERSION: read through the connector, repartition to the packed
    * file count, write back as a transactional truncate-overwrite —
    * the replaced generation is archived, so `versionAsOf` the
    * pre-compaction version still answers (until vacuumed). Rows are
    * untouched: same bytes in, same rows out, hash-provable (the
    * catalog query does exactly that). Partitioned (`col=value`)
    * tables re-write under the same partition columns — partition
    * values ride IN the data files (the write path's Iceberg
    * convention), so the layout round-trips without schema surgery;
    * rows are repartitioned BY the partition columns so each task
    * holds one open writer. Returns the new head version. */
  def compact(spark: SparkSession, table: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      clusterBy: Seq[String] = Nil): Long = {
    require(targetFileBytes > 0, "graft compact: targetFileBytes must be > 0")
    val totalBytes = GraftParquetV2.totalFileBytes(table)
    val n = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes)
      .min(Int.MaxValue).toInt
    val df = spark.read.format("graft.sources.GraftParquetTableProvider")
      .option("path", table).load()
    val partCols = GraftParquetV2
      .keyedLayout(table, df.schema).map(_._1).getOrElse(Nil)
    require(clusterBy.forall(df.schema.fieldNames.contains),
      s"graft compact: clusterBy ${clusterBy.mkString(",")} not all in " +
        s"schema ${df.schema.fieldNames.mkString(",")}")
    import org.apache.spark.sql.functions.col
    val packed =
      // CLUSTERED compaction: range-partition + sort on the cluster
      // keys, so the packed files carry DISJOINT zone-map ranges —
      // point/range filters on those keys then prune to ~one file
      // instead of all of them (the OPTIMIZE…ZORDER shape, with range
      // clustering; the Z-order/Hilbert writers in Sinks remain the
      // multi-column interleave option). One range exchange, exactly
      // what the packing rewrite was paying anyway.
      if (clusterBy.nonEmpty)
        df.repartitionByRange(n, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      else if (partCols.nonEmpty)
        df.repartition(n, partCols.map(col): _*)
      else df.repartition(n)
    val writer = packed.write
      .format("graft.sources.GraftParquetTableProvider")
      .option("path", table)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
    (if (partCols.nonEmpty)
      writer.option("partitionBy", partCols.mkString(","))
    else writer).save()
    GraftTableLog.latestVersion(table).getOrElse(
      throw new IllegalStateException(
        s"graft compact: overwrite committed but no log version under $table"))
  }

  /** Reclaim history: keep the newest `retainLast` versions, delete
    * every ARCHIVED file no retained version references, and drop the
    * older versions' log entries. Live files are never touched — only
    * the archive shrinks. Returns the number of data files deleted.
    * Time travel to a dropped version refuses loudly afterwards (the
    * version is gone from the log); `retainLast >= 1` always holds the
    * head version. */
  def vacuum(table: String, retainLast: Int = 1): Int = {
    require(retainLast >= 1, "graft vacuum: retainLast must be >= 1")
    val all = GraftTableLog.versions(table)
    if (all.isEmpty) return 0
    val retained = all.takeRight(retainLast)
    val dropped = all.dropRight(retainLast)
    val keepRels: Set[String] = retained.flatMap(v =>
      GraftTableLog.readSnapshot(table, v)._1).toSet
    val root = new Path(table)
    val fs = root.getFileSystem(conf)
    val archRoot = new Path(root, GraftTableLog.ArchiveDir)
    var deleted = 0
    if (fs.exists(archRoot)) {
      def walk(d: Path): Unit = fs.listStatus(d).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) {
          val rel = GraftTableLog.relativize(
            archRoot.toString, st.getPath.toString)
          if (!keepRels.contains(rel)) {
            require(fs.delete(st.getPath, false),
              s"graft vacuum: delete failed for archived $rel")
            deleted += 1
          }
        }
      }
      walk(archRoot)
      // prune now-empty archive partition directories (metadata tidiness;
      // resolution never depends on it)
      def prune(d: Path): Unit = {
        fs.listStatus(d).foreach(st => if (st.isDirectory) prune(st.getPath))
        if (d != archRoot && fs.listStatus(d).isEmpty) fs.delete(d, false)
      }
      prune(archRoot)
    }
    // drop the dead versions' log files LAST — if a delete above fails,
    // the log still names every version whose files exist
    dropped.foreach { v =>
      val p = GraftTableLog.snapshotPath(table, v)
      if (fs.exists(p)) fs.delete(p, false)
    }
    deleted
  }
}
