package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** VERSION-FEED STREAMING SOURCE — the table's COMMIT LOG as a live
  * stream: one row per committed version, `(version, n_files, n_rows)`,
  * metadata-only (manifest row counts minus deletion-vector
  * cardinality — no data file is ever opened).
  *
  * `spark.readStream.format(graft).option("path", t)
  * .option("versionFeed", "true").load()`
  *
  * Why it exists: the table stream ([[GraftMicroBatchStream]]) tails
  * ROWS and therefore carries an append-only contract — a row-level
  * rewrite (DELETE/MERGE/compact) under a running stream is a loud
  * refusal, because emitted rows cannot be retracted. But a whole class
  * of consumers needs COMMIT SIGNALS, not rows: incremental MV refresh
  * ([[GraftMv.refreshStream]]), CDC tailing (fire
  * [[GraftMaintenance.changeFeedRows]] per signal), cache invalidation,
  * downstream-job scheduling. The version feed serves those over the
  * FULL writer alphabet: every commit — append, COW delete, MERGE, MOR
  * delta, compaction, recluster — is one immutable log entry, and log
  * entries are never retracted, so the append-only streaming contract
  * holds BY CONSTRUCTION at the version grain.
  *
  * Offsets are plain version numbers — restart-stable, human-readable
  * in the checkpoint. Admission control via `maxVersionsPerTrigger`;
  * `versionFeedFrom` starts the feed after a given version (default 0 =
  * full history). Feed rows are computed DRIVER-SIDE at plan time
  * (manifest-scale work, the same class as batch planning) and shipped
  * as the partition's values — executors never touch the filesystem.
  *
  * Scale: a trigger's work is O(new versions × manifest size),
  * independent of table data volume — the 100 TB table and the 100 MB
  * table cost the same per commit. */
object GraftVersionFeed {
  val OptionKey = "versionFeed"
  val FromKey = "versionFeedFrom"
  val MaxPerTriggerKey = "maxVersionsPerTrigger"

  val schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("n_files", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = true)))

  def requested(options: CaseInsensitiveStringMap): Boolean =
    options.getBoolean(OptionKey, false)

  def requested(properties: util.Map[String, String]): Boolean =
    Option(properties.get(OptionKey)).exists(_.toBoolean)
}

/** Offset = the highest version already emitted. */
case class GraftVersionOffset(v: Long) extends Offset {
  override def json: String = v.toString
}

class GraftVersionFeedTable(path: String, from: Long,
    maxPerTrigger: Option[Int]) extends Table with SupportsRead {
  require(path != null, "graft version feed: 'path' option is required")
  override def name(): String = s"graft_version_feed($path)"
  override def schema(): StructType = GraftVersionFeed.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = GraftVersionFeed.schema
      override def toMicroBatchStream(checkpoint: String): MicroBatchStream =
        new GraftVersionFeedStream(path, from, maxPerTrigger)
      override def description(): String = s"graft version feed of $path"
    }
}

class GraftVersionFeedStream(path: String, from: Long,
    maxPerTrigger: Option[Int])
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  // AvailableNow contract: the head when the trigger fired is the drain
  // target; later commits belong to the next run
  @volatile private var availableNowTarget: Option[Long] = None

  private def head: Long = GraftTableLog.latestVersion(path).getOrElse(0L)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(head)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): Offset = GraftVersionOffset(from)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftVersionOffset].v
    val h = availableNowTarget.getOrElse(head)
    // a head below the stream's offset means the log was rolled back or
    // vacuumed past the checkpoint — emitted signals cannot be unsaid
    require(h >= s || h == 0,
      s"graft version feed: table at $path is at version $h, below the " +
        s"stream's committed offset $s — the log moved backwards under " +
        "a running feed (rollback past the checkpoint?)")
    GraftVersionOffset(
      maxPerTrigger.map(k => math.min(s + k.toLong, h)).getOrElse(h).max(s))
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVersionOffset].v
    val e = end.asInstanceOf[GraftVersionOffset].v
    if (e <= s) Array.empty
    else {
      // driver-side metadata read: one row per version in (s, e]
      val rows = GraftMaintenance.history(path)
        .filter(h => h.version > s && h.version <= e)
        .map(h => (h.version, h.files, h.rows))
      Array(GraftVersionFeedPartition(rows.toArray))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftVersionFeedReaderFactory

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** The feed rows themselves, computed at plan time. */
case class GraftVersionFeedPartition(
    rows: Array[(Long, Int, Option[Long])]) extends InputPartition

class GraftVersionFeedReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[GraftVersionFeedPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val (v, files, n) = rows(i)
        new GenericInternalRow(Array[Any](v, files, n.orNull))
      }
      override def close(): Unit = ()
    }
  }
}
