package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** ICEBERG-STYLE METADATA TABLES — the table format's operational
  * state as ORDINARY SQL relations, composable with joins/filters/
  * aggregation (the `CALL system.…` procedures return the same data,
  * but a procedure result can't sit in a FROM clause):
  *
  * {{{
  *   SELECT version, files, row_count FROM cat.ns.t.history
  *   SELECT file, bytes, row_count, dv_positions FROM cat.ns.t.files
  *   SELECT name, version FROM cat.ns.t.tags
  *   SELECT name, type, version, base FROM cat.ns.t.refs
  *   SELECT name, expression FROM cat.ns.t.constraints
  *   SELECT dv_file, referenced_files, positions FROM cat.ns.t.deletes
  *   SELECT partition, files, row_count FROM cat.ns.t.partitions
  * }}}
  *
  * Resolution: `cat.ns.t.history` parses as namespace [ns, t] + name
  * `history`; the catalog serves a metadata table ONLY when that full
  * path does NOT exist as a real table while the parent `ns.t` does —
  * a real table named `history` always wins (no shadowing).
  *
  * Scale posture: every row here is metadata the log/manifest already
  * holds (versions, per-file stats, DV volumes, tags) — computed
  * driver-side at metadata cardinality, one single-partition batch;
  * no data file is opened. */
object GraftMetadataTables {

  val names: Set[String] =
    Set("history", "files", "tags", "refs", "constraints", "deletes",
      "partitions")

  def table(parentPath: String, kind: String): Table =
    new GraftMetaTable(parentPath, kind)
}

private final class GraftMetaTable(path: String, kind: String)
    extends Table with SupportsRead {

  override def name(): String = s"$path#$kind"

  override def schema(): StructType = kind match {
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("files", IntegerType, nullable = false),
      StructField("row_count", LongType, nullable = true)))
    case "files" => StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("row_count", LongType, nullable = true),
      StructField("dv_positions", LongType, nullable = false)))
    case "tags" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    // the full refs view (round 14): tags AND branches in one
    // relation — `version` is a tag's pin or a branch's HEAD, `base`
    // is the branch fork point (null for tags)
    case "refs" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("version", LongType, nullable = false),
      StructField("base", LongType, nullable = true)))
    case "constraints" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("expression", StringType, nullable = false)))
    // merge-on-read DV volume per SIDECAR — the standing-maintenance
    // telemetry: positions climbing here is the signal to CALL
    // system.rewrite_deletes (fold cost ∝ the referenced files)
    case "deletes" => StructType(Seq(
      StructField("dv_file", StringType, nullable = false),
      StructField("referenced_files", IntegerType, nullable = false),
      StructField("positions", LongType, nullable = false)))
    // per PARTITION VALUE rollup (the Iceberg partitions table):
    // `partition` is the file's col=value/... relative directory ("" for
    // flat files); row_count nulls when any file lacks manifest stats
    case "partitions" => StructType(Seq(
      StructField("partition", StringType, nullable = false),
      StructField("files", IntegerType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("row_count", LongType, nullable = true),
      StructField("dv_positions", LongType, nullable = false)))
    case other => throw new IllegalStateException(
      s"unreachable metadata table kind $other")
  }

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = () => new GraftMetaScan(path, kind, schema())
}

/** Driver-computed rows at metadata cardinality. LocalScan would be
  * the natural shape, but Spark plans it through LocalTableScanExec
  * whose rows must be UnsafeRows — a plain Batch keeps the conversion
  * machinery in charge and stays executor-shippable. */
private final class GraftMetaScan(path: String, kind: String,
    outSchema: StructType) extends Scan with Batch with Serializable {

  override def readSchema(): StructType = outSchema
  override def toBatch: Batch = this

  // computed ONCE at planning, driver-side, from the log/manifest
  private val computed: Array[Array[Any]] = kind match {
    case "history" =>
      GraftMaintenance.history(path).map(v => Array[Any](
        v.version, v.files, v.rows.map(Long.box).orNull)).toArray
    case "files" =>
      val rowCounts: Map[String, Long] = GraftParquetWrite
        .rawManifestEntries(path)
        .groupBy(_.file).map { case (f, es) =>
          f -> es.map(_.valueCount).max
        }
      val dv = GraftDeletes.livePositions(path)
      val sizes = (try GraftParquetV2.listFileStatuses(path) catch {
        case _: java.io.FileNotFoundException => Nil
      }).map(st => st.getPath.getName -> st.getLen).toMap
      sizes.toSeq.sortBy(_._1).map { case (base, bytes) =>
        Array[Any](UTF8String.fromString(base), bytes,
          rowCounts.get(base).map(Long.box).orNull,
          dv.get(base).map(_.cardinality).getOrElse(0L))
      }.toArray
    case "tags" =>
      GraftTableLog.tags(path).toSeq.sortBy(_._1).map { case (n, v) =>
        Array[Any](UTF8String.fromString(n), v)
      }.toArray
    case "refs" =>
      (GraftTableLog.tags(path).map { case (n, v) =>
        (n, "tag", v, null: Any)
      } ++ GraftTableLog.branches(path).map { case (n, h, b) =>
        (n, "branch", h, Long.box(b): Any)
      }).sortBy(r => (r._1, r._2)).map { case (n, t, v, b) =>
        Array[Any](UTF8String.fromString(n), UTF8String.fromString(t),
          v, b)
      }.toArray
    case "constraints" =>
      GraftConstraints.read(path).sortBy(_._1).map { case (n, e) =>
        Array[Any](UTF8String.fromString(n), UTF8String.fromString(e))
      }.toArray
    case "partitions" =>
      val rowCounts: Map[String, Long] = GraftParquetWrite
        .rawManifestEntries(path)
        .groupBy(_.file).map { case (f, es) =>
          f -> es.map(_.valueCount).max
        }
      val dv = GraftDeletes.livePositions(path)
      val stats = try GraftParquetV2.listFileStatuses(path) catch {
        case _: java.io.FileNotFoundException => Nil
      }
      stats
        // zero-row schema carriers are DDL metadata, not a partition
        .filterNot(st =>
          st.getPath.getName.endsWith("-schema.parquet") &&
            GraftParquetV2.verifiedZeroRows(st.getPath.toString))
        .map { st =>
          val dirSpec = GraftParquetV2
            .partitionSpec(path, st.getPath.toString)
            .map { case (c, v) => s"$c=$v" }.mkString("/")
          (dirSpec, st)
        }
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (part, sts) =>
          val bases = sts.map(_._2.getPath.getName)
          val counts = bases.map(rowCounts.get)
          val rows =
            if (counts.forall(_.isDefined)) {
              val deleted = bases
                .flatMap(b => dv.get(b).map(_.cardinality)).sum
              Long.box(counts.flatten.sum - deleted)
            } else null
          Array[Any](UTF8String.fromString(part), sts.size,
            sts.map(_._2.getLen).sum, rows,
            bases.flatMap(b => dv.get(b).map(_.cardinality)).sum)
        }.toArray
    case "deletes" =>
      GraftDeletes.liveDvFiles(path).map { f =>
        val refs = collection.mutable.Set.empty[String]
        var n = 0L
        val r = new GraftPartitionReader(f, GraftDeletes.dvSchema,
          Array.empty)
        try while (r.next()) { refs += r.get().getString(0); n += 1 }
        finally r.close()
        Array[Any](
          UTF8String.fromString(
            new org.apache.hadoop.fs.Path(f).getName),
          refs.size, n)
      }.toArray
    case other => throw new IllegalStateException(
      s"unreachable metadata table kind $other")
  }

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftMetaPartition(computed))

  override def createReaderFactory(): PartitionReaderFactory =
    GraftMetaReaderFactory()

  override def description(): String =
    s"GraftMetadataTable $kind for $path (metadata-only)"
}

private final case class GraftMetaPartition(rows: Array[Array[Any]])
  extends InputPartition

private final case class GraftMetaReaderFactory()
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val rows = p.asInstanceOf[GraftMetaPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = new GenericInternalRow(rows(i))
      override def close(): Unit = ()
    }
  }
}
