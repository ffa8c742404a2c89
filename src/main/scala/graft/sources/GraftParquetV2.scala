package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal DataSource V2 connector with REAL pushdown — the engine-surface
  * version of the reference's defining source, query-pushdown into an
  * external engine (`/root/reference/pipelines/sql_cycle_rides.py:43-46`:
  * BigQuery executes the query; Beam consumes rows). Here the "external
  * engine" is this connector's own parquet reader: Catalyst hands it the
  * required columns and the translatable predicates, and the connector
  * honors both AT THE SOURCE —
  *   - projection: the requested parquet `MessageType` contains only the
  *     required columns plus filter references, so the parquet layer never
  *     decodes the other columns' pages (true I/O pruning, not post-hoc
  *     dropping);
  *   - filters: pushed predicates are evaluated row-by-row inside the
  *     reader under SQL three-valued logic, and only survivors cross the
  *     connector boundary. Predicates the connector cannot evaluate
  *     (unsupported types/shapes) are returned to Spark as residuals, so
  *     semantics never depend on the pushdown split.
  *
  * Scale design: one `InputPartition` per parquet file (a directory of
  * part files fans out across executors; the per-file reader streams —
  * no whole-file materialization), and WITHIN a file the reader prunes
  * at row-group granularity: footer min/max/null-count statistics that
  * provably refute the pushed conjunction skip the group's pages
  * entirely ([[GraftStatsPrune]] — in-task zone maps, so the pruning
  * scales out with the scan instead of bottlenecking a driver-side
  * planner). This is deliberately the simple partitioning story: the
  * built-in vectorized parquet source remains the scan of choice for raw
  * throughput (row-group splitting, vectorization, nested types); this
  * connector exists to demonstrate the V2 pushdown contract end-to-end
  * and is correctness-first.
  *
  * Usage: `spark.read.format("graft.sources.GraftParquetTableProvider")
  * .option("path", "/data/t.parquet").load()`.
  */
class GraftParquetTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (GraftVersionFeed.requested(options)) GraftVersionFeed.schema
    else GraftParquetV2.sparkSchema(
      GraftParquetV2.footerSchema(
        GraftParquetV2.schemaSourceFile(GraftParquetV2.path(options))))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    if (GraftVersionFeed.requested(properties))
      new GraftVersionFeedTable(properties.get("path"),
        Option(properties.get(GraftVersionFeed.FromKey))
          .map(_.toLong).getOrElse(0L),
        Option(properties.get(GraftVersionFeed.MaxPerTriggerKey))
          .map(_.toInt))
    else new GraftParquetTable(properties.get("path"), schema,
      // streaming reader options arrive HERE (the batch path hands them
      // to newScanBuilder instead) — capture the read-rate cap
      Option(properties.get("maxFilesPerTrigger")).map(_.toInt),
      // the rename ledger rides with the TABLE, so the raw path route
      // resolves renamed columns exactly like the catalog route
      aliases = GraftCatalog.readAliases(properties.get("path"),
        GraftParquetWrite.sessionConf()))

  override def supportsExternalMetadata(): Boolean = true
}

/** The connector's METADATA COLUMNS ([[org.apache.spark.sql.connector
  * .catalog.SupportsMetadataColumns]]): the reading file's full path
  * and the row's 0-based ordinal WITHIN that file (all rows counted, in
  * parquet order — the same ordinal the built-in source's
  * `_metadata.row_index` exposes). Selectable like any column, and the
  * ROW IDENTITY the merge-on-read row-level operations delete by
  * ([[GraftDeltaOperation.rowId]] → positional delete sidecars,
  * [[GraftDeletes]]). */
object GraftMeta {
  val FileCol = "_graft_file"
  val PosCol = "_graft_pos"
  val names: Set[String] = Set(FileCol, PosCol)

  private final class Col(n: String, dt: DataType)
      extends org.apache.spark.sql.connector.catalog.MetadataColumn {
    override def name(): String = n
    override def dataType(): DataType = dt
    override def isNullable: Boolean = false // row identity: never null
    override def comment(): String = n match {
      case FileCol => "full path of the file this row was read from"
      case _ => "0-based row ordinal within the file (all rows, parquet order)"
    }
  }

  val columns: Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new Col(FileCol, StringType), new Col(PosCol, LongType))
}

class GraftParquetTable(path: String, tableSchema: StructType,
    streamMaxFiles: Option[Int] = None,
    // a catalog-level pin (VERSION/TIMESTAMP AS OF through
    // [[GraftCatalog.loadTable]]); per-scan read options override it
    pinnedTravel: Option[GraftTimeTravel] = None,
    // the catalog's persisted CREATE TABLE … PARTITIONED BY spec:
    // reported via partitioning() and applied to every write (a
    // contradicting partitionBy option refuses in the write builder)
    tablePartCols: Seq[String] = Nil,
    // RENAME COLUMN alias chains ([[GraftCatalog.readAliases]]):
    // logical name → physical candidates newest-first; empty (the
    // overwhelmingly common case) keeps every fast path untouched
    aliases: Map[String, Seq[String]] = Map.empty)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {
  require(path != null, "graft parquet v2: 'path' option is required")
  /** Table root — read by [[graft.plans.CompositeKeyJoinRule]] to look
    * up this table's persisted ANALYZE stats at planning time. */
  def tablePath: String = path
  override def name(): String = s"graft_parquet($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE, TableCapability.MICRO_BATCH_READ,
      // SQL `MERGE … WITH SCHEMA EVOLUTION`: Spark's analyzer then
      // routes the source's extra columns through the catalog's
      // alterTable ADD COLUMN — the same guarded path as the Scala
      // API's mergeSchema=true ([[GraftCatalog.checkAddableColumn]])
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // time-travel read options, resolved against the table's version
    // log ([[GraftTableLog]]): `versionAsOf` pins a snapshot;
    // `changesSince` (+ optional `changesUntil`, default latest) reads
    // the append delta between two snapshots
    def optLong(k: String): Option[Long] =
      Option(options.get(k)).map { v =>
        try v.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"graft parquet v2: option '$k' must be a version number, got '$v'")
        }
      }
    // `versionAsOf` additionally accepts a TAG name (a named ref from
    // `CALL system.tag`) — the same resolver `VERSION AS OF` uses
    val versionRef = Option(options.get("versionAsOf"))
      .map(GraftTableLog.resolveVersionRef(path, _))
    val travel = GraftTimeTravel.from(versionRef,
      optLong("changesSince"), optLong("changesUntil"))
      .orElse(pinnedTravel)
    new GraftScanBuilder(path, tableSchema,
      Option(options.get("maxFilesPerTrigger")).map(_.toInt)
        .orElse(streamMaxFiles), travel,
      // streaming-only: start the stream AFTER snapshot N — its files
      // are pre-seen in the initial offset, so the first micro-batch
      // carries only what landed since (the change feed, live)
      optLong("startingVersion"), aliases)
  }
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    GraftMeta.columns

  /** The catalog-declared identity partitioning, if any — DESCRIBE
    * and the planner see it; writes apply it via the write builder. */
  override def partitioning(): Array[Transform] =
    tablePartCols.map(c =>
      org.apache.spark.sql.connector.expressions.Expressions.identity(c))
      .toArray

  // the write half: append/truncate with transactional ownership of the
  // stats-manifest sidecar — see [[GraftParquetWrite]] for the protocol
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(path, info, tablePartCols)

  /** SQL `DELETE FROM … WHERE …` ([[org.apache.spark.sql.connector
    * .catalog.SupportsDelete]]): delegates to the zone-map-selective
    * rewrite ([[GraftMaintenance.delete]] — only files the predicate
    * could touch are read and rewritten; commits a new log version).
    * Accepted only when every filter converts faithfully to a Column
    * — Spark then errors on the rest instead of us guessing. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    pinnedTravel.isEmpty && !GraftParquetTable.mergeOnRead &&
      filters.forall(GraftFilterToColumn.convert(_).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(pinnedTravel.isEmpty,
      "graft parquet v2: DELETE on a time-travel-pinned table")
    // WAP guard — same contract as newRowLevelOperationBuilder: a
    // metadata-only DELETE (or TRUNCATE, which routes here) mutates
    // MAIN; refuse while the session's branch knob is set
    require(org.apache.spark.sql.SparkSession.getActiveSession
        .flatMap(_.conf.getOption("spark.graft.branch"))
        .forall(_.trim.isEmpty),
      "graft parquet v2: DELETE/TRUNCATE while spark.graft.branch is " +
        "set would mutate MAIN, not the branch — branches are " +
        "append-only; unset the conf first")
    val spark = org.apache.spark.sql.SparkSession.active
    val converted = filters.map(f => GraftFilterToColumn.convert(f)
      .getOrElse(throw new UnsupportedOperationException(
        // canDeleteWhere refuses these — reaching here means a caller
        // bypassed it; dropping the conjunct would WIDEN the delete
        s"graft parquet v2 delete: unconvertible filter $f")))
    val cond = converted.reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    GraftMaintenance.delete(spark, path, cond)
  }

  /** SQL `TRUNCATE TABLE`: delete-all as one rewrite commit — the old
    * generation archives, the empty head is a new version (time travel
    * to the pre-truncate version still answers until vacuum). */
  override def truncateTable(): Boolean = {
    deleteWhere(Array[Filter](org.apache.spark.sql.sources.AlwaysTrue))
    true
  }

  /** SQL `UPDATE` / `MERGE INTO` (and `DELETE` whose predicate the
    * metadata path can't take): group-based COPY-ON-WRITE row-level
    * operations ([[org.apache.spark.sql.connector.catalog
    * .SupportsRowLevelOperations]] — the Iceberg shape). Spark's
    * `RewriteUpdateTable`/`RewriteMergeIntoTable` plan a ReplaceData
    * job over the operation's scan; the scan prunes to the files whose
    * zone maps could not refute the command's condition (GROUP
    * granularity — candidate files' non-matching rows are read and
    * written back untouched), and the write's commit swaps exactly
    * those files for the rewritten ones as a new log version
    * ([[GraftRowLevelOperation]]). Simple DELETEs stay on the
    * metadata-only [[deleteWhere]] path via Spark's
    * OptimizeMetadataOnlyDeleteFromTable. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(pinnedTravel.isEmpty,
      "graft parquet v2: row-level " + info.command() +
        " on a time-travel-pinned table")
    // WAP guard: row-level operations mutate MAIN (they bypass the
    // branch-routing append builder), so running one while the WAP
    // session knob points at a branch would silently mutate the wrong
    // lineage — refuse loudly instead (branches are append-only)
    require(org.apache.spark.sql.SparkSession.getActiveSession
        .flatMap(_.conf.getOption("spark.graft.branch"))
        .forall(_.trim.isEmpty),
      "graft parquet v2: row-level " + info.command() + " while " +
        "spark.graft.branch is set would mutate MAIN, not the branch " +
        "— branches are append-only; unset the conf first")
    if (GraftParquetTable.mergeOnRead)
      () => new GraftDeltaOperation(path, tableSchema, info.command(),
        aliases)
    else
      () => new GraftRowLevelOperation(path, tableSchema, info.command(),
        aliases)
  }
}

object GraftParquetTable {
  /** Row-level operation mode for SQL UPDATE / DELETE / MERGE INTO —
    * `copy-on-write` (default: candidate files rewrite wholesale, the
    * right shape for WIDE mutations) or `merge-on-read` (positional
    * delete sidecars + appended images, [[GraftDeltaOperation]] — the
    * right shape for NARROW mutations, where COW's write amplification
    * is the first thing a 100 TB user hits). Session-scoped, the
    * Iceberg `write.update.mode` knob re-expressed as a conf:
    * {{{ SET spark.graft.rowLevelMode = merge-on-read }}} */
  val ModeConf = "spark.graft.rowLevelMode"

  private[sources] def mergeOnRead: Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.conf.get(ModeConf, "copy-on-write")) match {
      case Some("merge-on-read") => true
      case Some("copy-on-write") | None => false
      case Some(other) => throw new IllegalArgumentException(
        s"graft parquet v2: $ModeConf must be copy-on-write or " +
          s"merge-on-read, got '$other'")
    }
}

/** Faithful v1-Filter → Column bridge for the SQL DELETE path — only
  * shapes with exact Column equivalents convert; anything else makes
  * [[GraftParquetTable.canDeleteWhere]] refuse, and Spark reports the
  * unsupported DELETE instead of a silent semantic drift. */
private[sources] object GraftFilterToColumn {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit}

  def convert(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case And(l, r) => for (lc <- convert(l); rc <- convert(r)) yield lc && rc
    case Or(l, r) => for (lc <- convert(l); rc <- convert(r)) yield lc || rc
    case Not(c) => convert(c).map(!_)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case _: AlwaysTrue => Some(lit(true))
    case _: AlwaysFalse => Some(lit(false))
    case _ => None
  }
}

/** A versioned read target ([[GraftTableLog]]): either a pinned
  * snapshot (`versionAsOf`) or the append delta between two snapshots
  * (`changesSince` → `changesUntil`/latest). */
final case class GraftTimeTravel(versionAsOf: Option[Long],
    changesSince: Option[Long], changesUntil: Option[Long])

object GraftTimeTravel {
  def from(versionAsOf: Option[Long], changesSince: Option[Long],
      changesUntil: Option[Long]): Option[GraftTimeTravel] = {
    require(versionAsOf.isEmpty || changesSince.isEmpty,
      "graft parquet v2: versionAsOf and changesSince are mutually " +
        "exclusive read modes")
    require(changesUntil.isEmpty || changesSince.isDefined,
      "graft parquet v2: changesUntil needs changesSince")
    if (versionAsOf.isEmpty && changesSince.isEmpty) None
    else Some(GraftTimeTravel(versionAsOf, changesSince, changesUntil))
  }
}

class GraftScanBuilder(path: String, tableSchema: StructType,
    streamMaxFiles: Option[Int] = None,
    travel: Option[GraftTimeTravel] = None,
    streamStartVersion: Option[Long] = None,
    aliases: Map[String, Seq[String]] = Map.empty)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownTopN
    with SupportsPushDownAggregates {
  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var topN: Option[(Seq[GraftSortKey], Int)] = None
  private var aggs: Option[Seq[GraftAggSpec]] = None
  private var groupCols: Seq[StructField] = Nil

  /** TopN (ORDER BY + LIMIT) pushdown — PARTIAL by contract, completing
    * the reference-S1 story at the ORDERING layer
    * (`sql_cycle_rides.py:35-41`: BigQuery runs GROUP BY + ORDER BY +
    * LIMIT): each input partition emits only ITS top `limit` rows under
    * the pushed sort (a bounded heap during the scan — per-file I/O and
    * memory drop from file-rows to `limit`), and Spark keeps the global
    * Sort+Limit above for the final merge. Scope: flat exactly-ordered
    * key types (int/long/string/bool/date — float/double declined: the
    * NaN/−0.0 total order stays Spark's problem); declined when an
    * aggregation is already pushed (the sort then refers to aggregate
    * output, not scan columns). Boundary ties may keep either row —
    * sound, because the global limit above picks arbitrarily among
    * equal-key rows anyway. */
  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean = {
    if (aggs.isDefined || n <= 0) return false
    val sortableTypes: Set[DataType] =
      Set(IntegerType, LongType, StringType, BooleanType, DateType)
    val keys: Seq[Option[GraftSortKey]] = orders.toSeq.map { o =>
      o.expression() match {
        case r: NamedReference if r.fieldNames().length == 1 =>
          tableSchema.fields.find(_.name == r.fieldNames()(0)).collect {
            case f if sortableTypes(f.dataType) => GraftSortKey(f.name,
              o.direction() == SortDirection.ASCENDING,
              o.nullOrdering() == NullOrdering.NULLS_FIRST, f.dataType)
          }
        case _ => None
      }
    }
    if (keys.isEmpty || keys.exists(_.isEmpty)) false
    else { topN = Some((keys.flatten, n)); true }
  }

  /** LIMIT pushdown — PARTIAL by contract: each input partition stops
    * after `limit` surviving rows (I/O saved at the source), but the
    * scan as a whole may emit up to limit × partitions, so Spark keeps
    * its global Limit above (isPartiallyPushed). Claiming a full push
    * would silently over-return with >1 file. */
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed(): Boolean = true

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept what the reader can faithfully evaluate; everything else
    * comes back to Spark as a residual. A pushed filter is a PROMISE —
    * Spark will not re-check it — so acceptance is driven by
    * [[GraftFilterEval.supports]], never optimism.
    *
    * `spark.graft.dpp.selectiveResiduals` (default off): ALSO return
    * equality-shaped filters as residuals, still pushed. Spark's
    * dynamic partition pruning detects a prunable join side ONLY by a
    * logical `Filter` node with a likely-selective condition — full
    * consumption makes a selectively-filtered graft DIM invisible to
    * DPP, so the FACT side never receives runtime join keys in
    * broadcast-free (storage-partitioned) plans. The residual costs a
    * re-check of already-filtered rows AND blocks filter+aggregate
    * full pushdown on the same scan (Spark only pushes aggregates
    * under empty post-scan filters) — which is why it is opt-in for
    * star-join workloads rather than the default. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) =
      filters.partition(GraftFilterEval.supports(_, tableSchema))
    pushed = ok
    val dppResiduals =
      if (!org.apache.spark.sql.internal.SQLConf.get
          .getConfString("spark.graft.dpp.selectiveResiduals", "false")
          .toBoolean) Array.empty[Filter]
      else ok.filter {
        case _: org.apache.spark.sql.sources.EqualTo |
             _: org.apache.spark.sql.sources.EqualNullSafe |
             _: org.apache.spark.sql.sources.In |
             _: org.apache.spark.sql.sources.StringStartsWith |
             _: org.apache.spark.sql.sources.StringEndsWith |
             _: org.apache.spark.sql.sources.StringContains => true
        case _ => false
      }
    residual ++ dppResiduals
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Aggregate pushdown (the reference-S1 story completed at the
    * connector layer: "the engine runs the whole query",
    * `sql_cycle_rides.py:43-46`). PARTIAL by contract
    * (supportCompletePushDown stays false): each input partition emits
    * per-file partial aggregate rows — one row globally, or one row PER
    * GROUP when a GROUP BY is pushed — and Spark does the final merge
    * (COUNT partials re-sum, MIN/MAX re-extremize, grouped rows
    * re-group), so correctness never depends on the file fan-out. Scope
    * is COUNT(*) / COUNT(col) / MIN / MAX / integral SUM on flat
    * comparable types, grouped by exactly-comparable flat columns
    * (int/long/string/bool/date — float keys are declined: NaN/−0.0
    * group equality is engine-lore the connector refuses to re-own);
    * anything else is declined wholesale and Spark aggregates scan rows
    * as before. When NO filters are pushed and NO grouping, the reader
    * answers from footer metadata alone — row counts and row-group
    * min/max stats — reading zero data pages (grouped aggregates always
    * row-scan: footers carry no per-group structure). */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: NamedReference if r.fieldNames().length == 1 =>
          // a RENAMED column resolves per-file through the alias chain;
          // the footer fast paths and per-file partial readers key on
          // one physical name — decline and let Spark aggregate scan
          // rows (correct, marginally less pushed; renames are rare)
          Some(r.fieldNames()(0))
            .filterNot(n => aliases.get(n).exists(_.length > 1))
        case _ => None
      }
    def typed(n: String): Option[DataType] =
      tableSchema.fields.find(_.name == n).map(_.dataType)
    val minMaxTypes: Set[DataType] =
      Set(IntegerType, LongType, FloatType, DoubleType, DateType)
    val translated: Seq[Option[GraftAggSpec]] =
      aggregation.aggregateExpressions().toSeq.map {
        case _: CountStar => Some(GraftAggSpec.CountStar)
        case c: Count if !c.isDistinct =>
          colOf(c.column).filter(n => typed(n).isDefined)
            .map(GraftAggSpec.CountCol(_))
        case m: Min =>
          colOf(m.column).flatMap(n => typed(n)
            .filter(minMaxTypes).map(GraftAggSpec.MinCol(n, _)))
        case m: Max =>
          colOf(m.column).flatMap(n => typed(n)
            .filter(minMaxTypes).map(GraftAggSpec.MaxCol(n, _)))
        // SUM only for integral columns: exact at any merge grouping
        // (and overflow THROWS, matching ANSI — never silently wrong).
        // Floating sums are declined: per-file partial grouping would
        // round differently than the built-in path.
        case s: Sum if !s.isDistinct =>
          colOf(s.column).flatMap(n => typed(n).collect {
            case IntegerType | LongType => GraftAggSpec.SumCol(n)
          })
        case _ => None
      }
    val groupableTypes: Set[DataType] =
      Set(IntegerType, LongType, StringType, BooleanType, DateType)
    val groups: Seq[Option[StructField]] =
      aggregation.groupByExpressions().toSeq.map { e =>
        colOf(e).flatMap(n => tableSchema.fields.find(_.name == n))
          .filter(f => groupableTypes(f.dataType))
      }
    if (translated.exists(_.isEmpty) || groups.exists(_.isEmpty)) false
    else {
      aggs = Some(translated.flatten)
      groupCols = groups.flatten
      true
    }
  }

  override def build(): Scan =
    GraftParquetScan(path,
      aggs.map(a => StructType(groupCols ++ GraftAggSpec.schema(a)))
        .getOrElse(required),
      pushed, limit, aggs, groupCols, topN, tableSchema, streamMaxFiles,
      travel, streamStartVersion, aliases = aliases)
}

/** One pushed sort key (serialized to executors with the reader
  * factory). `asc`/`nullsFirst` mirror Spark's SortOrder exactly. */
final case class GraftSortKey(name: String, asc: Boolean,
    nullsFirst: Boolean, dt: DataType)

/** One pushed aggregate column. */
sealed trait GraftAggSpec
object GraftAggSpec {
  case object CountStar extends GraftAggSpec
  final case class CountCol(name: String) extends GraftAggSpec
  final case class MinCol(name: String, dt: DataType) extends GraftAggSpec
  final case class MaxCol(name: String, dt: DataType) extends GraftAggSpec
  final case class SumCol(name: String) extends GraftAggSpec // integral only

  /** Scan output schema for a pushed aggregation: one field per
    * aggregate, positional (Spark matches by position, then merges). */
  def schema(specs: Seq[GraftAggSpec]): StructType = StructType(specs.map {
    case CountStar => StructField("count(*)", LongType, nullable = false)
    case CountCol(n) => StructField(s"count($n)", LongType, nullable = false)
    case MinCol(n, dt) => StructField(s"min($n)", dt, nullable = true)
    case MaxCol(n, dt) => StructField(s"max($n)", dt, nullable = true)
    case SumCol(n) => StructField(s"sum($n)", LongType, nullable = true)
  })

  /** Columns the row-scan fallback must read. */
  def referenced(specs: Seq[GraftAggSpec]): Seq[String] = specs.collect {
    case CountCol(n) => n
    case MinCol(n, _) => n
    case MaxCol(n, _) => n
    case SumCol(n) => n
  }.distinct

  /** Min/max fold over comparable candidates — shared by the footer fast
    * path, the global row scan, and the grouped row scan. */
  def reduceExtreme(cand: Seq[Any], dt: DataType, isMin: Boolean): Any = {
    def red[T](ord: Ordering[T]): Any = {
      val xs = cand.map(_.asInstanceOf[T])
      if (isMin) xs.min(ord) else xs.max(ord)
    }
    dt match {
      case IntegerType | DateType => red(Ordering[Int].on[Any](_.asInstanceOf[Number].intValue()))
      case LongType => red(Ordering[Long].on[Any](_.asInstanceOf[Number].longValue()))
      case FloatType => red(Ordering[Float].on[Any](_.asInstanceOf[Number].floatValue()))
      case DoubleType => red(Ordering[Double].on[Any](_.asInstanceOf[Number].doubleValue()))
      case other => throw new IllegalStateException(s"unreachable min/max type $other")
    }
  }

  /** Lossless up-cast of a file-era NARROW value to the table's widened
    * type — TYPE-WIDENING schema evolution (`ALTER COLUMN … TYPE`,
    * int→long / float→double): files written before the widening keep
    * their narrow physical type forever; every reader that emits raw
    * values into a Spark row must pass them through here so the row
    * carries exactly the type the table schema declares. Identity for
    * everything already at the declared width. */
  def widenValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (i: java.lang.Integer, LongType) =>
      java.lang.Long.valueOf(i.longValue())
    case (f: java.lang.Float, DoubleType) =>
      java.lang.Double.valueOf(f.doubleValue())
    case _ => v
  }
}

case class GraftParquetScan(path: String, required: StructType,
    pushed: Array[Filter], limit: Int = -1,
    aggs: Option[Seq[GraftAggSpec]] = None,
    groupBy: Seq[StructField] = Nil,
    topN: Option[(Seq[GraftSortKey], Int)] = None,
    // full table schema — types the `col=value` directory values for
    // partition pruning; empty (direct constructions in specs) just
    // disables that pruning, never affects correctness
    tableSchema: StructType = new StructType(),
    // streaming read's per-micro-batch file cap (maxFilesPerTrigger)
    streamMaxFiles: Option[Int] = None,
    // versioned read target (versionAsOf / changesSince), resolved
    // against the table's _graft_log — None = the live table
    travel: Option[GraftTimeTravel] = None,
    // streaming-only: snapshot whose files the stream starts AFTER
    streamStartVersion: Option[Long] = None,
    // GROUP-granularity filters (the row-level copy-on-write path,
    // [[GraftRowLevelScan]]): used to prune FILES in planInputPartitions
    // exactly like pushed filters, but NEVER handed to the readers — a
    // candidate file's non-matching rows must survive into the rewrite,
    // so row filtering here would be data loss, not optimization
    fileOnlyFilters: Array[Filter] = Array.empty,
    // RENAME COLUMN alias chains: logical → physical candidates,
    // newest-first ([[GraftCatalog.readAliases]])
    aliases: Map[String, Seq[String]] = Map.empty)
  extends Scan with Batch with SupportsRuntimeFiltering
  with SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning
  with org.apache.spark.sql.connector.read.SupportsReportOrdering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** PER-PARTITION ORDERING ([[SupportsReportOrdering]]): after a
    * CLUSTERED compaction every file — and a split IS one file here —
    * is internally sorted on the cluster keys, and the sort spec pins
    * that claim to the exact committed version
    * ([[GraftMaintenance.SortSpecFile]]). When the read target IS that
    * version (live head unchanged, or time travel straight to it),
    * the scan declares the ordering and Spark's RemoveRedundantSorts /
    * EnsureRequirements drop the consumer's Sort nodes — a window or
    * sort-within-partitions over a clustered 100 TB table does ZERO
    * sorting, and combined with the keyed layout's
    * KeyGroupedPartitioning, zero exchange either. Partition columns
    * are CONSTANT within a split, so they prepend to the claim
    * (trivially sorted first keys) — exactly the (partition, cluster)
    * prefix a windowed consumer requires. Any later write bumps the
    * version and the claim silently lapses: ordering is a correctness
    * contract, so the conservative answer is always "unordered". */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions,
      NullOrdering, SortDirection}
    val claim: Option[Seq[String]] = try {
      GraftMaintenance.readSortSpec(path).flatMap { case (v, cols) =>
        // materialize the read target BEFORE the version check: if a
        // concurrent write commits after it, this scan still reads the
        // files listed here (the clustered generation — sorted), and
        // if it commits before, the version mismatch drops the claim
        readTarget
        val target: Option[Long] = travel match {
          case None => GraftTableLog.latestVersion(path)
          case Some(GraftTimeTravel(Some(tv), _, _)) => Some(tv)
          case _ => None // a change-feed delta claims nothing
        }
        if (target.contains(v)) Some(cols) else None
      }
    } catch { case _: Exception => None }
    claim match {
      // topN.isEmpty is load-bearing: a pushed TopN drains its heap
      // WORST-FIRST (explicitly unsorted — sound only because Spark's
      // retained global Sort re-orders), so claiming per-partition
      // ordering alongside it would let RemoveRedundantSorts elide
      // exactly the Sort that restores order. A pushed plain LIMIT
      // preserves scan order and may keep the claim.
      case Some(cols) if aggs.isEmpty && topN.isEmpty && cols.nonEmpty &&
          cols.forall(required.fieldNames.contains) =>
        val partPrefix = keyedLayout.map(_._1).getOrElse(Nil)
        val lead =
          if (partPrefix.nonEmpty &&
            partPrefix.forall(required.fieldNames.contains)) partPrefix
          else Nil
        (lead ++ cols).map(c => Expressions.sort(Expressions.column(c),
          SortDirection.ASCENDING, NullOrdering.NULLS_FIRST)).toArray
      case _ => Array.empty
    }
  }

  /** MICRO-BATCH STREAMING READ — the source half of the connector's
    * streaming story (the sink half is [[GraftStreamingWrite]]): the
    * table's files replay in sorted order and every file that appears
    * AFTER the stream starts becomes part of a later micro-batch, so a
    * graft table works as a live feed between pipelines. Pushed
    * filters and the pruned schema apply per file exactly as in batch
    * (same reader factory); offsets are the sorted seen-file list —
    * manifest-scale metadata, the append-only contract made explicit
    * (a table whose file set SHRINKS under a running stream refuses
    * loudly: truncate/overwrite mid-stream is a pipeline bug, not a
    * restart point). */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    require(travel.isEmpty,
      "graft streaming read: versionAsOf/changesSince are batch read " +
        "modes — a stream tails the LIVE table (its offsets already " +
        "pin exactly which files each micro-batch saw)")
    // live deletion vectors mean rows were REMOVED without a file-set
    // change — an append-only stream cannot retract rows it may already
    // have emitted; refuse loudly (compact the table to fold the
    // deletes in, then stream). The admission path re-checks per batch.
    require(GraftDeletes.liveDvFiles(path).isEmpty,
      s"graft streaming read: table at $path carries merge-on-read " +
        "deletion vectors — an append-only stream cannot represent row " +
        "deletes; compact the table to fold them in first")
    // PARTITIONED tables stream too (round 12): the connector writes
    // partition values INTO the data files (the Iceberg convention),
    // so the stream's flat splits emit them correctly. The guard moves
    // from "refuse any col=value layout" to a PER-FILE FOOTER PROOF at
    // admission ([[GraftMicroBatchStream.latestOffset]]): a foreign
    // Hive-style drop-in whose values live ONLY in the directory name
    // would null-fill — each admitted file must physically carry every
    // partition column, or the stream refuses naming the file.
    val streamPartCols = GraftCatalog.effectivePartCols(path, tableSchema)
    new GraftMicroBatchStream(path, required, pushed, streamMaxFiles,
      streamStartVersion, aliases, streamPartCols)
  }

  /** Planner-visible size: without this, a V2 relation defaults to
    * `spark.sql.defaultSizeInBytes` = Long.MaxValue — a connector-
    * scanned dimension table could NEVER be auto-broadcast and every
    * join above it degraded to sort-merge. On-disk (compressed) bytes
    * from the file listing are the same conservative estimate the
    * built-in FileScan starts from; no footer reads, so planning cost
    * stays O(files). Row count is left unknown — nothing in the
    * planner needs it badly enough to justify opening footers. */
  /** The resolved (files, zone maps, deletion vectors) this scan reads:
    * the live listing + live manifest + live `_graft_deletes/` set
    * normally; a log snapshot's file AND DV sets (each resolved
    * live-first, then archive) for `versionAsOf`; the append delta
    * between two snapshots for `changesSince` (whose soundness check
    * pins the DV set unchanged, so the delta files are DV-free). Stats
    * and deletes always travel WITH the file set — pruning an archived
    * file with the live manifest's entries for a same-named successor,
    * or applying TODAY's deletes to YESTERDAY's snapshot, would both be
    * wrong. The DV map is keyed by data-file BASENAME (unique
    * table-wide) and loaded once per planning — cost ∝ deleted rows. */
  @transient private lazy val readTarget
      : (Seq[String], Map[String, Map[String, GraftStatsPrune.ColStats]],
        Map[String, GraftDvBitmap]) =
    travel match {
      case None =>
        (GraftParquetV2.listFiles(path), GraftParquetV2.loadStatsManifest(path),
          GraftDeletes.livePositions(path))
      case Some(GraftTimeTravel(Some(v), _, _)) =>
        val (rels, dvRels, stats) = GraftTableLog.readSnapshotFull(path, v)
        (GraftTableLog.resolveAll(path, rels), stats,
          GraftDeletes.readPositions(GraftDeletes.resolveDvRels(path, dvRels)))
      case Some(GraftTimeTravel(_, Some(since), until)) =>
        val to = until.orElse(GraftTableLog.latestVersion(path)).getOrElse(
          throw new IllegalArgumentException(
            s"graft parquet v2: $path has no version log — changesSince " +
              "needs a connector-written table"))
        val (rels, stats) = GraftTableLog.changedFiles(path, since, to)
        (GraftTableLog.resolveAll(path, rels), stats, Map.empty)
      case Some(other) => throw new IllegalStateException(
        s"unreachable travel spec $other") // GraftTimeTravel.from validated
    }

  // cached: Spark consults statistics repeatedly while planning one
  // query, and each listing is O(files) of filesystem RPCs
  @transient private lazy val onDiskBytes =
    if (travel.isEmpty) GraftParquetV2.totalFileBytes(path)
    else {
      // a versioned target's size is ITS files' bytes (live listing
      // could be arbitrarily off for an archived generation or a
      // small delta) — two directory LISTINGS (live + archive), not
      // one getFileStatus RPC per file: planning cost stays
      // O(directories) on an object store
      val sizes = GraftTableLog.fileSizes(path)
      readTarget._1.map(f => sizes.getOrElse(f, 0L)).sum
    }
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(onDiskBytes)
    /** Pushed `IsNotNull`s on columns ANALYZE proved null-free have
      * selectivity EXACTLY 1 — a scan filtered only by those is
      * unfiltered for statistics purposes. This matters because every
      * equi-join pushes IsNotNull on its keys; without this, joining
      * is precisely what turns the stats off. */
    private def effectivelyUnfiltered: Boolean =
      pushed.isEmpty || {
        lazy val ts = GraftAnalyze.read(path)
        travel.isEmpty && pushed.forall {
          case org.apache.spark.sql.sources.IsNotNull(c) =>
            ts.exists(_.cols.get(c).exists(_.nullCount == 0L))
          case _ => false
        }
      }
    /** EXACT row count from metadata alone — per-file valueCounts out
      * of the (version-correct) stats manifest minus the target's DV
      * positions — reported only for UNFILTERED scans (a pushed
      * conjunction's selectivity is the planner's to estimate, and an
      * unmanifested file makes the count unknowable). Join sizing and
      * CBO estimates then start from truth instead of bytes/row
      * guesses. */
    override def numRows(): java.util.OptionalLong =
      // a pushed conjunction's selectivity is unknowable here (except
      // proven-no-op IsNotNulls, see effectivelyUnfiltered), and a
      // pushed AGGREGATE emits group rows, not table rows — both opt
      // out rather than overstate
      if (!effectivelyUnfiltered || aggs.isDefined)
        java.util.OptionalLong.empty()
      else try {
        val (files, stats, dv) = readTarget
        val perFile = files.map(f =>
          stats.get(new Path(f).getName)
            .flatMap(_.valuesIterator.map(_.valueCount).maxOption))
        if (files.isEmpty || perFile.exists(_.isEmpty))
          java.util.OptionalLong.empty()
        else {
          val exact = perFile.flatten.sum -
            dv.valuesIterator.map(_.cardinality).sum
          // a pushed LIMIT is PARTIAL by contract — each of the
          // target's files may emit up to `limit` rows (the retained
          // global limit trims the rest ABOVE this scan), so the
          // honest bound here is limit × fileCount, not limit: the
          // tighter number would understate the scan's output by the
          // file count and could mislead CBO into an oversized
          // broadcast
          java.util.OptionalLong.of(
            if (limit >= 0)
              math.min(exact, limit.toLong * math.max(files.length, 1))
            else exact)
        }
      } catch { case _: Exception => java.util.OptionalLong.empty() }
    /** ANALYZE output ([[GraftAnalyze]]): per-column NDV / null count /
      * length moments for the LIVE table, keyed to the scan's required
      * columns. Live unfiltered scans only — the persisted stats
      * describe the head, not a snapshot or a filtered subset. These
      * are planner estimates by contract; staleness costs plan quality,
      * never correctness. */
    override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      val out = new java.util.HashMap[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      if (travel.isEmpty && effectivelyUnfiltered && aggs.isEmpty) try {
        GraftAnalyze.read(path).foreach { ts =>
          required.fieldNames.foreach { n =>
            ts.cols.get(n).foreach { s =>
              out.put(
                org.apache.spark.sql.connector.expressions.Expressions
                  .column(n),
                new org.apache.spark.sql.connector.read.colstats
                    .ColumnStatistics {
                  /** ANALYZE min/max live in double space; box back to
                    * the column's JVM type (estimation re-derives the
                    * double via toString) — non-integral/floating
                    * types opt out rather than misrepresent. */
                  private def boxed(v: Double)
                      : java.util.Optional[Object] =
                    required.fields.find(_.name == n)
                      .map(_.dataType) match {
                      case Some(ByteType) => java.util.Optional.of(
                        java.lang.Byte.valueOf(v.toByte))
                      case Some(ShortType) => java.util.Optional.of(
                        java.lang.Short.valueOf(v.toShort))
                      case Some(IntegerType) => java.util.Optional.of(
                        java.lang.Integer.valueOf(v.toInt))
                      case Some(LongType) => java.util.Optional.of(
                        java.lang.Long.valueOf(v.toLong))
                      case Some(FloatType) => java.util.Optional.of(
                        java.lang.Float.valueOf(v.toFloat))
                      case Some(DoubleType) => java.util.Optional.of(
                        java.lang.Double.valueOf(v))
                      case _ => java.util.Optional.empty()
                    }
                  override def min(): java.util.Optional[Object] =
                    s.min.map(boxed)
                      .getOrElse(java.util.Optional.empty())
                  override def max(): java.util.Optional[Object] =
                    s.max.map(boxed)
                      .getOrElse(java.util.Optional.empty())
                  override def distinctCount(): java.util.OptionalLong =
                    java.util.OptionalLong.of(s.ndv)
                  override def nullCount(): java.util.OptionalLong =
                    java.util.OptionalLong.of(s.nullCount)
                  override def avgLen(): java.util.OptionalLong =
                    s.avgLen.map(java.util.OptionalLong.of)
                      .getOrElse(java.util.OptionalLong.empty())
                  override def maxLen(): java.util.OptionalLong =
                    s.maxLen.map(java.util.OptionalLong.of)
                      .getOrElse(java.util.OptionalLong.empty())
                  /** Equi-height histogram when ANALYZE computed one
                    * (`histogram_columns`) — `transformV2Stats` folds
                    * it into the catalyst ColumnStat, so join
                    * estimation prices skewed keys by their own bins
                    * instead of rows/NDV averaging. */
                  override def histogram(): java.util.Optional[
                      org.apache.spark.sql.connector.read.colstats
                        .Histogram] =
                    ts.hists.get(n) match {
                      case None => java.util.Optional.empty()
                      case Some(h) => java.util.Optional.of(
                        new org.apache.spark.sql.connector.read.colstats
                            .Histogram {
                          override def height(): Double = h.height
                          override def bins(): Array[
                              org.apache.spark.sql.connector.read
                                .colstats.HistogramBin] =
                            h.bins.map { b =>
                              new org.apache.spark.sql.connector.read
                                  .colstats.HistogramBin {
                                override def lo(): Double = b.lo
                                override def hi(): Double = b.hi
                                override def ndv(): Long = b.ndv
                              }
                            }.toArray
                        })
                    }
                })
            }
          }
        }
      } catch { case _: Exception => () }
      out
    }
  }

  /** Runtime filters (Spark's dynamic-pruning machinery): when this scan
    * probes a join whose build side has materialized as a broadcast,
    * Spark derives an `In(joinKey, buildKeys)` filter and hands it here
    * AFTER planning — mutable by API design, and deliberately outside
    * case-class equality so scan-reuse matching is unaffected. The
    * filters simply join the static pushed conjunction in the reader:
    * the same footer zone-map refutation skips row groups whose bounds
    * exclude every build-side key, and the same three-valued row
    * evaluation drops the rest — so a selective dimension predicate
    * prunes the FACT scan's pages inside each task, with no driver-side
    * footer reads and no new code path. At 100 TB this is the star-join
    * pattern: a clustered fact table only decodes the groups whose key
    * ranges overlap the surviving dimension keys. */
  // The holder indirection is load-bearing: Spark forces the exec's
  // lazy readerFactory at PLANNING time (supportsColumnar), before
  // filter() delivers anything — so the factory cannot bake the filters
  // in at construction. It instead carries this holder, whose contents
  // are captured at TASK-SERIALIZATION time — which happens at job
  // submission, after filter() has run.
  private val runtimeHolder = new GraftRuntimeFilterHolder
  /** Observability (spec-asserted): what the dynamic-pruning machinery
    * delivered after planning. */
  def runtimeFilters: Array[Filter] = runtimeHolder.filters

  override def filterAttributes(): Array[NamedReference] =
    // with a pushed aggregation, `required` holds SYNTHETIC output
    // columns ("sum(v)", group keys) — advertising those would invite a
    // runtime filter the raw-file readers cannot resolve. Aggregated
    // scans opt out of runtime filtering entirely.
    if (aggs.isDefined) Array.empty
    else required.fields.collect {
      // metadata columns (_graft_file/_graft_pos) are synthesized by
      // the reader, not readable from row values — advertising them
      // would invite a runtime filter the evaluator cannot resolve
      case f if GraftFilterEval.comparable(f.dataType) &&
          !GraftMeta.names(f.name) =>
        org.apache.spark.sql.connector.expressions.Expressions.column(f.name)
    }

  override def filter(filters: Array[Filter]): Unit =
    // a dropped runtime filter is always sound (the join re-applies it);
    // keep only what the evaluator can prove semantics for — and none
    // at all on aggregated scans (mirror of filterAttributes)
    runtimeHolder.filters =
      if (aggs.isDefined) Array.empty
      else filters.filter(GraftFilterEval.supports(_, required))
  // surfaced in .explain — the same observability contract the built-in
  // sources keep (PushedFilters / ReadSchema), spec-asserted
  override def description(): String =
    s"GraftParquetScan path=$path, " +
      travel.fold("") {
        case GraftTimeTravel(Some(v), _, _) => s"VersionAsOf: $v, "
        case GraftTimeTravel(_, Some(s), u) =>
          s"ChangesSince: $s${u.fold("")(x => s" Until: $x")}, "
        case _ => ""
      } +
      s"ReadSchema: ${required.catalogString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]" +
      (if (pushed.nonEmpty) ", RowGroupStatsPruning: on" else "") +
      (if (limit >= 0) s", PushedLimit: $limit" else "") +
      topN.fold("") { case (keys, n) =>
        s", PushedTopN: ORDER BY [${keys.map(k =>
          s"${k.name} ${if (k.asc) "ASC" else "DESC"} NULLS ${
            if (k.nullsFirst) "FIRST" else "LAST"}").mkString(", ")}] LIMIT $n"
      } +
      aggs.fold("")(a => s", PushedAggregation: [${a.mkString(", ")}]") +
      (if (groupBy.nonEmpty)
        s", PushedGroupBy: [${groupBy.map(_.name).mkString(", ")}]" else "") +
      (if (runtimeFilters.nonEmpty)
        s", RuntimeFilters: [${runtimeFilters.mkString(", ")}]" else "") +
      // merge-on-read observability: how many files carry deletion
      // vectors and how many positions apply (computed from the same
      // planning-time load the splits consume — no extra I/O; guarded
      // so a torn-down table can still explain itself)
      (try {
        if (readTarget._3.nonEmpty)
          s", DeleteFiles: ${readTarget._3.size}" +
            s", DeletePositions: ${
              readTarget._3.valuesIterator.map(_.cardinality).sum}"
        else ""
      } catch { case _: Exception => "" }) +
      // bloom-sidecar observability: which equality predicates the
      // planner will probe against per-file membership sketches (only
      // when the table actually carries a `_graft_bloom/` dir — same
      // guarded shape as the DV line)
      (try {
        GraftBloom.plannerProbes(path,
            pushed ++ runtimeFilters ++ fileOnlyFilters) match {
          case Some(ps) =>
            s", BloomProbes: [${ps.map(_._1).distinct.mkString(", ")}]"
          case None => ""
        }
      } catch { case _: Exception => "" })

  // write-time per-file zone maps (when the table was written by
  // Sinks.parquetWithStats): loaded once per scan, consulted on every
  // partition planning — including the RE-planning after runtime
  // filters arrive, so a broadcast join's dim keys can drop whole
  // FILES, not just row groups, before any task is scheduled
  @transient private lazy val statsManifest = readTarget._2

  // the table's keyed layout, when EVERY file sits under the same
  // `col=value` directory structure: partition column sequence, per-
  // file key rows, and the distinct-key count. Versioned reads opt out:
  // the layout claim is about the LIVE directory, and a snapshot's file
  // set (part archived, part a delta) need not satisfy it
  @transient private lazy val keyedLayout =
    if (travel.isDefined) None
    else GraftParquetV2.keyedLayout(path, tableSchema)

  /** STORAGE-PARTITIONED execution
    * ([[org.apache.spark.sql.connector.read.SupportsReportPartitioning]]):
    * a fully `col=value`-partitioned table reports
    * `KeyGroupedPartitioning` over its partition columns, and every
    * split carries its key row ([[GraftKeyedInputPartition]]) — with
    * `spark.sql.sources.v2.bucketing.enabled` Spark then groups
    * equal-key splits into one task and satisfies clustered
    * distributions from the LAYOUT: `GROUP BY` on the partition
    * columns aggregates with NO exchange, and two tables partitioned
    * on the same key sort-merge-join with NO shuffle on either side
    * (the storage-partitioned join). Reported only when the partition
    * columns survive projection (the keys must resolve against the
    * scan output) and no aggregate is pushed — a pushed grouped
    * aggregate is clustered too, but Spark renames its group keys
    * through an alias Project (`lang AS group_col_0`) that defeats
    * the partitioning's propagation, and the exchange it keeps is at
    * per-file PARTIAL-ROW cardinality anyway (measured: groups × few
    * files — negligible next to the row shuffle this report
    * eliminates). Everything else stays UnknownPartitioning — Spark
    * then plans exchanges exactly as before. */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    keyedLayout match {
      case Some((cols, _, nKeys)) if aggs.isEmpty &&
          cols.forall(required.fieldNames.contains) =>
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(
            cols.map(c => org.apache.spark.sql.connector.expressions
              .Expressions.identity(c)).toArray, nKeys)
      case _ =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(0)
    }

  override def planInputPartitions(): Array[InputPartition] = {
    require(streamStartVersion.isEmpty,
      "graft parquet v2: startingVersion is a STREAMING read option — " +
        "for a batch delta use changesSince")
    val files = readTarget._1
    val conj = pushed ++ runtimeFilters ++ fileOnlyFilters
    val kept =
      if (conj.isEmpty) files
      else {
        // huge In lists (DPP keys) sort ONCE and range-probe per file in
        // O(log keys); everything else goes through the generic engine —
        // without the split, planning is O(files × keys) on the driver
        val (sortedIns, residue) = GraftFilterEval.compileSortedIns(conj)
        files.filter { f =>
          // partition-directory values join the file's manifest entries
          // as degenerate zone maps (min = max = value) — one proof
          // engine prunes on both; partition values win a key clash
          // (they are exact where a zone map is only a range)
          val cols = statsManifest
            .getOrElse(new Path(f).getName,
              Map.empty[String, GraftStatsPrune.ColStats]) ++
            GraftParquetV2.partitionColStats(path, f, tableSchema)
          if (cols.isEmpty) true // unknown file: always read
          else {
            // RENAMED columns: this file's manifest rows carry the
            // physical name of its era — resolve through the alias
            // chain (identity when no renames; a file carries at most
            // one chain generation, so headOption is exact)
            def lookup(n: String): Option[GraftStatsPrune.ColStats] =
              aliases.getOrElse(n, Seq(n)).flatMap(cols.get).headOption
            def inRefutes(si: GraftFilterEval.SortedIn): Boolean =
              lookup(si.attribute).exists { s =>
                (s.nullsSet && s.numNulls == s.valueCount) ||
                  (s.min != null && s.max != null &&
                    si.noneInRange(s.min, s.max))
              }
            val refuted = sortedIns.exists(inRefutes) ||
              GraftStatsPrune.provablyEmptyStats(residue, lookup)
            if (refuted) GraftScanTelemetry.skippedFiles.increment()
            !refuted
          }
        }
      }
    // BLOOM SIDECARS second: files the zone maps could not kill get
    // their equality-shaped predicates probed against the per-file
    // membership sketches ([[GraftBloom]]) — point lookups on a high-
    // cardinality UNSORTED column, where every file's min/max spans the
    // domain, prune here or nowhere. No false negatives, so a skip is a
    // proof; a missing sidecar (post-build append, rewrite, rename) is
    // conservatively read. Probe cost is O(zone-map survivors), under
    // an in-JVM sidecar cache; tables without a `_graft_bloom/` dir pay
    // one existence check.
    val bloomKept = GraftBloom.plannerProbes(path, conj) match {
      case None => kept
      case Some(probeSet) => kept.filter { f =>
        val refuted = GraftBloom.refutes(path, new Path(f).getName, probeSet)
        if (refuted) GraftScanTelemetry.bloomSkippedFiles.increment()
        !refuted
      }
    }
    // each split carries ITS file's sorted delete positions (usually
    // empty) — tasks apply them as an ordinal-merge during the row
    // scan, and a split with deletes demotes the footer-only aggregate
    // fast path (footer counts include deleted rows)
    val dv = readTarget._3
    def deletesOf(f: String): GraftDvBitmap =
      if (dv.isEmpty) GraftDvBitmap.empty
      else dv.getOrElse(new Path(f).getName, GraftDvBitmap.empty)
    keyedLayout match {
      case Some((_, byFile, _)) =>
        bloomKept.map(f =>
          GraftKeyedInputPartition(f, byFile(f), deletesOf(f))).toArray
      case None =>
        bloomKept.map(f => GraftInputPartition(f, deletesOf(f))).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftPartitionReaderFactory(required, pushed, limit, aggs, groupBy,
      runtimeHolder, topN, aliases)
}

/** Mutable carrier for post-planning runtime filters (see
  * [[GraftParquetScan.filter]]). Serialized with the reader factory at
  * task launch, so executors see whatever the dynamic-pruning machinery
  * delivered by then — an empty array when no join pruned this scan. */
final class GraftRuntimeFilterHolder extends Serializable {
  @volatile var filters: Array[Filter] = Array.empty
}

/** Streaming offset: the SORTED full paths of every file this stream
  * has admitted. A pure function of the admitted SET, so offsets
  * compare and resume deterministically; JSON-escaped like the verify
  * dump (paths are operator-controlled, but a quote in one must not
  * corrupt the checkpoint). */
case class GraftFileSetOffset(files: Seq[String]) extends Offset {
  override def json(): String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    files.map(q).mkString("[", ",", "]")
  }
}

object GraftFileSetOffset {
  /** Parse the JSON array form (the exact inverse of [[json]]). */
  def fromJson(s: String): GraftFileSetOffset = {
    val t = s.trim
    require(t.startsWith("[") && t.endsWith("]"),
      s"graft stream offset: not a JSON array: $t")
    val body = t.substring(1, t.length - 1)
    if (body.trim.isEmpty) return GraftFileSetOffset(Nil)
    val out = collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    while (i < body.length) {
      val c = body.charAt(i)
      if (!inStr) {
        if (c == '"') { inStr = true; sb.clear() }
        // commas/whitespace between strings skipped
      } else c match {
        case '"' => inStr = false; out += sb.toString
        case '\\' =>
          i += 1
          require(i < body.length,
            s"graft stream offset: dangling escape in $t")
          body.charAt(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case 'u' =>
              require(i + 5 <= body.length,
                s"graft stream offset: truncated \\u escape in $t")
              sb += Integer.parseInt(body.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => throw new IllegalArgumentException(
              s"graft stream offset: bad escape \\$other")
          }
        case other => sb += other
      }
      i += 1
    }
    require(!inStr, s"graft stream offset: unterminated string in $t")
    GraftFileSetOffset(out.toSeq)
  }
}

/** The micro-batch stream behind [[GraftParquetScan.toMicroBatchStream]].
  * [[SupportsTriggerAvailableNow]] pins the drain target at start;
  * admission control honors `maxFilesPerTrigger`. */
class GraftMicroBatchStream(path: String, required: StructType,
    pushed: Array[Filter], maxFilesPerTrigger: Option[Int],
    startingVersion: Option[Long] = None,
    // RENAME COLUMN alias chains — the stream's readers resolve per
    // file exactly like batch, or pre-rename files would null-fill
    aliases: Map[String, Seq[String]] = Map.empty,
    // declared partition columns: every admitted file must PROVE it
    // carries them in its footer (values ride in the data files on
    // every connector write; a directory-only foreign file refuses)
    partCols: Seq[String] = Nil)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def snapshot(): Seq[String] = GraftParquetV2.listFiles(path).sorted

  // AvailableNow contract: everything present when the trigger fired is
  // the drain target; files landing later belong to the NEXT run
  @volatile private var availableNowTarget: Option[Seq[String]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(snapshot())

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  /** Fresh-checkpoint start: nothing seen — or, with `startingVersion`,
    * snapshot N's files PRE-SEEN, so the stream tails exactly what
    * landed after that version (the change feed, live). Only consulted
    * for a new checkpoint; restarts resume from the stored offset. */
  override def initialOffset(): Offset = startingVersion match {
    case None => GraftFileSetOffset(Nil)
    case Some(v) =>
      val (rels, _) = GraftTableLog.readSnapshot(path, v)
      // resolve against the LIVE table only: a snapshot file that is
      // no longer live means an overwrite/compaction rewrote history —
      // the append-only contract check below would refuse anyway, so
      // refuse here with the better message
      val live = snapshot()
      val liveByRel = live.map(f =>
        GraftTableLog.relativize(path, f) -> f).toMap
      val missing = rels.filterNot(liveByRel.contains)
      require(missing.isEmpty,
        s"graft streaming read: startingVersion $v references " +
          s"${missing.size} file(s) no longer live under $path — an " +
          "overwrite or compaction rewrote history; start from a newer " +
          "version or re-read versionAsOf")
      GraftFileSetOffset(rels.map(liveByRel).sorted)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val all = availableNowTarget.getOrElse(snapshot())
    val seen = start.asInstanceOf[GraftFileSetOffset].files.toSet
    require(seen.subsetOf(all.toSet),
      s"graft streaming read: table at $path lost files the stream already " +
        "admitted — the append-only contract is violated (truncate/" +
        "overwrite under a running stream)")
    // merge-on-read deletes landing under a running stream are the
    // same contract violation with no file-set signature — one cheap
    // exists() check per micro-batch catches it
    require(GraftDeletes.liveDvFiles(path).isEmpty,
      s"graft streaming read: merge-on-read deletion vectors landed " +
        s"under a running stream on $path — the append-only contract " +
        "is violated (rows cannot be retracted)")
    val fresh = all.filterNot(seen)
    val admitted = limit match {
      case m: ReadMaxFiles => fresh.take(m.maxFiles())
      case _ => fresh
    }
    // partitioned-table admission: one footer read per NEW file, once
    // per file over the stream's lifetime (offsets are monotone) —
    // the flat splits below emit partition values from the file
    // itself, so a file that does not carry them must refuse HERE,
    // loudly, not null-fill downstream
    if (partCols.nonEmpty) admitted.foreach { f =>
      val fileSchema = GraftParquetV2.footerSchema(f)
      val missing = partCols.filterNot(fileSchema.containsField)
      require(missing.isEmpty,
        s"graft streaming read: file $f does not carry partition " +
          s"column(s) ${missing.mkString(", ")} in its data (a foreign " +
          "directory-only layout?) — the stream would null-fill them; " +
          "rewrite the file with the connector (compact) first")
    }
    GraftFileSetOffset((seen.toSeq ++ admitted).sorted)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftFileSetOffset].files.toSet
    val e = end.asInstanceOf[GraftFileSetOffset].files
    require(s.subsetOf(e.toSet),
      s"graft streaming read: end offset lost files of the start offset")
    e.filterNot(s).sorted.map(GraftInputPartition(_)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftPartitionReaderFactory(required, pushed, -1, None, Nil,
      new GraftRuntimeFilterHolder, None, aliases)

  override def deserializeOffset(json: String): Offset =
    GraftFileSetOffset.fromJson(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One parquet file = one input split, keyed or not. `deletes` is the
  * file's SORTED deleted-row ordinals (merge-on-read deletion vectors,
  * [[GraftDeletes]]) — empty for the overwhelmingly common no-DV case. */
sealed trait GraftFilePartition extends InputPartition {
  def file: String
  def deletes: GraftDvBitmap
}

case class GraftInputPartition(file: String,
    deletes: GraftDvBitmap = GraftDvBitmap.empty) extends GraftFilePartition

/** A split that KNOWS its partition-key values (from its `col=value`
  * directory) — [[org.apache.spark.sql.connector.read.HasPartitionKey]]
  * lets Spark group equal-key splits into one task and satisfy
  * clustered distributions without an exchange
  * (`spark.sql.sources.v2.bucketing.enabled`). */
case class GraftKeyedInputPartition(file: String,
    key: InternalRow,
    deletes: GraftDvBitmap = GraftDvBitmap.empty) extends GraftFilePartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

case class GraftPartitionReaderFactory(required: StructType,
    pushed: Array[Filter], limit: Int = -1,
    aggs: Option[Seq[GraftAggSpec]] = None,
    groupBy: Seq[StructField] = Nil,
    runtimeHolder: GraftRuntimeFilterHolder = new GraftRuntimeFilterHolder,
    topN: Option[(Seq[GraftSortKey], Int)] = None,
    aliases: Map[String, Seq[String]] = Map.empty,
    // the DRIVER session's Hadoop conf (factories are built at plan
    // time), shipped so task-side file I/O keeps spark.hadoop.*
    serConf: GraftSerConf = GraftSerConf.session())
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val fp = partition.asInstanceOf[GraftFilePartition]
    val file = fp.file
    // runtime filters join the static conjunction here, so they get the
    // same zone-map refutation and row evaluation for free (and their
    // presence correctly demotes an agg reader's footer-only fast path)
    val conj = pushed ++ runtimeHolder.filters
    val hc = serConf.value
    aggs match {
      case Some(specs) if groupBy.nonEmpty =>
        new GraftGroupedAggPartitionReader(file, groupBy, specs, conj,
          fp.deletes, aliases, hc)
      case Some(specs) =>
        new GraftAggPartitionReader(file, specs, conj, fp.deletes, aliases,
          hc)
      case None => topN match {
        case Some((keys, n)) =>
          new GraftTopNPartitionReader(file, required, conj, keys, n,
            fp.deletes, aliases, hc)
        case None =>
          new GraftPartitionReader(file, required, conj, limit, fp.deletes,
            aliases, hc)
      }
    }
  }
}

/** Per-file PARTIAL top-N: drain the filtered row scan through a
  * bounded heap ordered by the pushed sort, then replay the survivors.
  * Memory is O(limit × row), not O(file) — the point of pushing: a
  * `ORDER BY k LIMIT 100` over a thousand-file table ships 100 rows per
  * file to the exchange instead of every row. The heap's comparator
  * mirrors Spark's SortOrder semantics exactly (direction + null
  * ordering per key, [[GraftFilterEval.cmp]]'s exact type orders);
  * boundary ties keep either row — sound under the global Sort+Limit
  * Spark retains (partial contract). */
class GraftTopNPartitionReader(file: String, required: StructType,
    pushed: Array[Filter], keys: Seq[GraftSortKey], n: Int,
    deletes: GraftDvBitmap = GraftDvBitmap.empty,
    aliases: Map[String, Seq[String]] = Map.empty,
    hadoopConf: Configuration = GraftParquetWrite.sessionConf())
    extends PartitionReader[InternalRow] {
  private var iter: Iterator[InternalRow] = _
  private var current: InternalRow = _
  private val idx = required.fieldNames.zipWithIndex.toMap

  /** Spark-order comparator: negative when `a` sorts BEFORE `b`. */
  private def compareRows(a: InternalRow, b: InternalRow): Int = {
    var i = 0
    while (i < keys.length) {
      val k = keys(i)
      val at = idx(k.name)
      val av = if (a.isNullAt(at)) null else a.get(at, k.dt)
      val bv = if (b.isNullAt(at)) null else b.get(at, k.dt)
      val c = (av, bv) match {
        case (null, null) => 0
        case (null, _) => if (k.nullsFirst) -1 else 1
        case (_, null) => if (k.nullsFirst) 1 else -1
        case (x, y) =>
          val base = GraftFilterEval.cmp(x, y).getOrElse(
            throw new IllegalStateException(
              s"graft parquet v2 topN: incomparable values for ${k.name}"))
          if (k.asc) base else -base
      }
      if (c != 0) return c
      i += 1
    }
    0
  }

  private def compute(): Iterator[InternalRow] = {
    // worst-first heap of size ≤ n: head is the row that leaves first
    // small initial capacity — PQ grows dynamically, so a pushed
    // LIMIT 10M doesn't eagerly allocate 10M slots per partition reader
    val heap = new java.util.PriorityQueue[InternalRow](
      math.max(1, math.min(n, 1024)),
      new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          -compareRows(a, b)
      })
    val inner = new GraftPartitionReader(file, required, pushed, -1,
      deletes, aliases, hadoopConf)
    try {
      while (inner.next()) {
        val row = inner.get() // fresh GenericInternalRow per row — safe to keep
        if (heap.size < n) heap.offer(row)
        else if (compareRows(row, heap.peek()) < 0) {
          heap.poll(); heap.offer(row)
        }
      }
    } finally inner.close()
    // drain order is heap order (worst-first) — irrelevant: Spark's
    // retained global Sort re-orders
    val out = new Array[InternalRow](heap.size)
    var i = 0
    while (!heap.isEmpty) { out(i) = heap.poll(); i += 1 }
    out.iterator
  }

  override def next(): Boolean = {
    if (iter == null) iter = compute()
    if (iter.hasNext) { current = iter.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Per-file PARTIAL grouped aggregates: one output row per group
  * observed in this file, group-key columns first (the V2 partial-agg
  * contract — Spark re-groups the per-file rows and merges). Always a
  * row scan (footers carry no per-group structure), projecting group
  * keys ∪ aggregate inputs ∪ filter references. Accumulator state is
  * one entry per DISTINCT GROUP IN THIS FILE — aggregation-state scale,
  * the same boundedness contract as Spark's own partial hash aggregate
  * (a grouping column with file-cardinality keys degrades to the
  * built-in path's behavior too: decline happens at type level, not
  * cardinality level, and Spark's final merge is always correct). */
class GraftGroupedAggPartitionReader(file: String, groupBy: Seq[StructField],
    specs: Seq[GraftAggSpec], pushed: Array[Filter],
    deletes: GraftDvBitmap = GraftDvBitmap.empty,
    aliases: Map[String, Seq[String]] = Map.empty,
    hadoopConf: Configuration = GraftParquetWrite.sessionConf())
    extends PartitionReader[InternalRow] {
  private var iter: Iterator[InternalRow] = _
  private var current: InternalRow = _

  private final class Acc {
    var count = 0L
    val colCount = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val mins = collection.mutable.Map.empty[String, Any]
    val maxs = collection.mutable.Map.empty[String, Any]
    val sums = collection.mutable.Map.empty[String, Long]
  }

  private def compute(): Iterator[InternalRow] = {
    val cols = (groupBy.map(_.name) ++ GraftAggSpec.referenced(specs)).distinct
    val schema = GraftParquetV2.sparkSchema(
      GraftParquetV2.footerSchema(file, hadoopConf))
    val scanSchema = StructType(schema.fields.filter(f => cols.contains(f.name)))
    // aliases matter only for pushed FILTERS here — aggregate/group
    // columns over renamed fields were declined at pushdown
    val inner = new GraftPartitionReader(file, scanSchema, pushed, -1,
      deletes, aliases, hadoopConf)
    val idx = scanSchema.fieldNames.zipWithIndex.toMap
    // columns this file predates read as null (schema evolution) —
    // group keys become null keys, aggregate inputs contribute nothing
    def valueOf(row: InternalRow, n: String): Any =
      idx.get(n).map(i => row.get(i, schema(n).dataType)).orNull
    // insertion-ordered so output is deterministic per file (not load-
    // bearing — Spark re-groups — but it keeps re-runs byte-stable)
    val groups = collection.mutable.LinkedHashMap.empty[List[Any], Acc]
    try {
      while (inner.next()) {
        val row = inner.get()
        val key = groupBy.map(f => valueOf(row, f.name)).toList
        val acc = groups.getOrElseUpdate(key, new Acc)
        acc.count += 1
        specs.foreach {
          case GraftAggSpec.CountCol(n) =>
            if (valueOf(row, n) != null) acc.colCount(n) += 1
          case GraftAggSpec.MinCol(n, dt) => valueOf(row, n) match {
            case null => ()
            case v => acc.mins(n) = acc.mins.get(n)
              .map(cur => GraftAggSpec.reduceExtreme(Seq(cur, v), dt, isMin = true))
              .getOrElse(v)
          }
          case GraftAggSpec.MaxCol(n, dt) => valueOf(row, n) match {
            case null => ()
            case v => acc.maxs(n) = acc.maxs.get(n)
              .map(cur => GraftAggSpec.reduceExtreme(Seq(cur, v), dt, isMin = false))
              .getOrElse(v)
          }
          case GraftAggSpec.SumCol(n) => valueOf(row, n) match {
            case null => ()
            case v: java.lang.Number =>
              // addExact: overflow throws (ANSI posture), never wraps
              acc.sums(n) = Math.addExact(acc.sums.getOrElse(n, 0L), v.longValue())
          }
          case GraftAggSpec.CountStar => ()
        }
      }
    } finally inner.close()
    groups.iterator.map { case (key, acc) =>
      val aggVals = specs.map {
        case GraftAggSpec.CountStar => acc.count: Any
        case GraftAggSpec.CountCol(n) => acc.colCount(n): Any
        // min/max keep the file-era object — widen to the spec's
        // declared type (type-widening evolution: an INT32-era extreme
        // under a now-LongType column must emit as Long)
        case GraftAggSpec.MinCol(n, dt) =>
          GraftAggSpec.widenValue(acc.mins.getOrElse(n, null), dt)
        case GraftAggSpec.MaxCol(n, dt) =>
          GraftAggSpec.widenValue(acc.maxs.getOrElse(n, null), dt)
        case GraftAggSpec.SumCol(n) => acc.sums.get(n).map(Long.box).orNull
      }
      // group keys read at the FILE's width — emit at the table's
      val keyVals = key.zip(groupBy).map { case (v, f) =>
        GraftAggSpec.widenValue(v, f.dataType)
      }
      new GenericInternalRow((keyVals ++ aggVals).toArray)
    }
  }

  override def next(): Boolean = {
    if (iter == null) iter = compute()
    if (iter.hasNext) { current = iter.next(); true } else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Per-file PARTIAL aggregates, one output row. Two paths:
  *   - metadata-only (no pushed filters): COUNT(*) from footer row
  *     counts, COUNT(col) from row-group null counts, MIN/MAX from
  *     row-group statistics — zero data pages decoded, the connector
  *     literally answers the query from the index. Falls back whenever
  *     any row group lacks the needed exact stats (missing stats,
  *     unset null counts — e.g. NaN-bearing doubles drop min/max);
  *   - row scan (filters pushed, or stats unusable): stream the file
  *     through the same three-valued filter evaluation as the row
  *     reader, projecting only aggregate inputs ∪ filter references,
  *     and fold counts/mins/maxes as rows pass. */
class GraftAggPartitionReader(file: String, specs: Seq[GraftAggSpec],
    pushed: Array[Filter],
    deletes: GraftDvBitmap = GraftDvBitmap.empty,
    aliases: Map[String, Seq[String]] = Map.empty,
    hadoopConf: Configuration = GraftParquetWrite.sessionConf())
    extends PartitionReader[InternalRow] {
  private var done = false
  private var result: InternalRow = _

  private def computeFromFooter(): Option[Array[Any]] = {
    val in = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), hadoopConf))
    try {
      val blocks = in.getFooter.getBlocks.asScala.toSeq
      val rowCount = blocks.map(_.getRowCount).sum
      // per-row-group column chunk metadata, None when absent
      def chunks(col: String) = blocks.map(
        _.getColumns.asScala.find(_.getPath.toDotString == col))
      def statExtreme(n: String, dt: DataType, isMin: Boolean): Option[Any] = {
        val cs = chunks(n)
        if (cs.exists(_.isEmpty)) return None
        // every chunk must either carry exact min/max, or be provably
        // all-null (numNulls set and equal to its value count) — a
        // chunk with values but dropped stats (e.g. NaN-bearing
        // doubles) forfeits the fast path for this file
        val usable = cs.flatten.forall { c =>
          val s: org.apache.parquet.column.statistics.Statistics[_] =
            c.getStatistics
          s != null && (s.hasNonNullValue ||
            (s.isNumNullsSet && s.getNumNulls == c.getValueCount))
        }
        if (!usable) return None
        val withVals = cs.flatten.map(_.getStatistics).filter(_.hasNonNullValue)
        if (withVals.isEmpty) Some(null)
        else Some(reduceExtreme(
          withVals.map(s => if (isMin) s.genericGetMin else s.genericGetMax),
          dt, isMin))
      }
      val vals: Seq[Option[Any]] = specs.map {
        case GraftAggSpec.CountStar => Some(rowCount: Any)
        case GraftAggSpec.CountCol(n) =>
          val cs = chunks(n)
          if (cs.exists(c => c.isEmpty || c.get.getStatistics == null ||
              !c.get.getStatistics.isNumNullsSet)) None
          else Some(rowCount - cs.flatten.map(_.getStatistics.getNumNulls).sum: Any)
        // footer stats carry the FILE-era width — widen to the spec's
        case GraftAggSpec.MinCol(n, dt) =>
          statExtreme(n, dt, isMin = true)
            .map(GraftAggSpec.widenValue(_, dt))
        case GraftAggSpec.MaxCol(n, dt) =>
          statExtreme(n, dt, isMin = false)
            .map(GraftAggSpec.widenValue(_, dt))
        case _: GraftAggSpec.SumCol => None // no footer answer for sums
      }
      if (vals.exists(_.isEmpty)) None else Some(vals.map(_.get).toArray)
    } finally in.close()
  }

  private def reduceExtreme(cand: Seq[Any], dt: DataType, isMin: Boolean): Any =
    GraftAggSpec.reduceExtreme(cand, dt, isMin)

  private def computeByScan(): Array[Any] = {
    val cols = GraftAggSpec.referenced(specs)
    val schema = GraftParquetV2.sparkSchema(
      GraftParquetV2.footerSchema(file, hadoopConf))
    val scanSchema = StructType(schema.fields.filter(f => cols.contains(f.name)))
    val inner = new GraftPartitionReader(file, scanSchema, pushed, -1,
      deletes, aliases, hadoopConf)
    val idx = scanSchema.fieldNames.zipWithIndex.toMap
    // columns this file predates read as null (schema evolution):
    // count(col) sees 0, min/max/sum skip — the aggregate semantics of
    // an all-null column
    def valueOf(row: InternalRow, n: String): Any =
      idx.get(n).map(i => row.get(i, schema(n).dataType)).orNull
    var count = 0L
    val colCount = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val mins = collection.mutable.Map.empty[String, Any]
    val maxs = collection.mutable.Map.empty[String, Any]
    val sums = collection.mutable.Map.empty[String, Long]
    def fold(m: collection.mutable.Map[String, Any], n: String, v: Any,
        dt: DataType, isMin: Boolean): Unit =
      if (v != null) m(n) = m.get(n)
        .map(cur => reduceExtreme(Seq(cur, v), dt, isMin)).getOrElse(v)
    try {
      while (inner.next()) {
        val row = inner.get()
        count += 1
        specs.foreach {
          case GraftAggSpec.CountCol(n) =>
            if (valueOf(row, n) != null) colCount(n) += 1
          case GraftAggSpec.MinCol(n, dt) =>
            fold(mins, n, valueOf(row, n), dt, isMin = true)
          case GraftAggSpec.MaxCol(n, dt) =>
            fold(maxs, n, valueOf(row, n), dt, isMin = false)
          case GraftAggSpec.SumCol(n) =>
            valueOf(row, n) match {
              case null => ()
              case v: java.lang.Number =>
                // addExact: overflow throws (ANSI posture) rather than
                // silently wrapping a partial sum
                sums(n) = Math.addExact(sums.getOrElse(n, 0L), v.longValue())
            }
          case GraftAggSpec.CountStar => ()
        }
      }
    } finally inner.close()
    specs.map {
      case GraftAggSpec.CountStar => count: Any
      case GraftAggSpec.CountCol(n) => colCount(n): Any
      // scan values carry the FILE-era width — widen to the spec's
      case GraftAggSpec.MinCol(n, dt) =>
        GraftAggSpec.widenValue(mins.getOrElse(n, null), dt)
      case GraftAggSpec.MaxCol(n, dt) =>
        GraftAggSpec.widenValue(maxs.getOrElse(n, null), dt)
      case GraftAggSpec.SumCol(n) => sums.get(n).map(Long.box).orNull
    }.toArray
  }

  override def next(): Boolean = {
    if (done) return false
    val vals =
      // footer stats count DELETED rows too: any deletion vector on
      // this file demotes the metadata-only fast path to a row scan
      if (pushed.isEmpty && deletes.isEmpty)
        computeFromFooter().getOrElse(computeByScan())
      else computeByScan()
    result = new GenericInternalRow(vals)
    done = true
    true
  }

  override def get(): InternalRow = result
  override def close(): Unit = ()
}

/** Streams one parquet file ROW GROUP BY ROW GROUP: requested schema =
  * required ∪ filter references (so a fully-pushed filter on a
  * pruned-away column still sees its operand), footer-statistics
  * refutation of the pushed conjunction per row group — a group whose
  * min/max/null-count stats PROVE no row can match is skipped without
  * decoding a page ([[GraftStatsPrune]], the zone-map half of filter
  * pushdown) — then three-valued filter evaluation on the surviving
  * rows. The emitted `InternalRow` carries only the required columns. */
class GraftPartitionReader(file: String, required: StructType,
    pushed: Array[Filter], limit: Int = -1,
    deletes: GraftDvBitmap = GraftDvBitmap.empty,
    aliases: Map[String, Seq[String]] = Map.empty,
    hadoopConf: Configuration = GraftParquetWrite.sessionConf())
    extends PartitionReader[InternalRow] {
  private var emitted = 0L
  private val conf = hadoopConf
  private val in = ParquetFileReader.open(
    HadoopInputFile.fromPath(new Path(file), conf))
  private val fileSchema = in.getFooter.getFileMetaData.getSchema

  /** RENAME COLUMN resolution: the requested (logical) name → the
    * first alias-chain name THIS file's footer carries — files keep
    * the physical name of their era, the chain maps it back. Identity
    * when the table has no rename history (empty map). */
  private def resolve(n: String): String =
    if (aliases.isEmpty) n
    else aliases.getOrElse(n, Seq(n)).find(fileSchema.containsField)
      .getOrElse(n)

  /** The pushed conjunction in THIS FILE's physical namespace — all
    * downstream machinery (zone-map refutation, three-valued eval,
    * projection references) then operates on names the footer knows. */
  private val filters: Array[Filter] =
    if (aliases.isEmpty) pushed
    else pushed.map(GraftFilterEval.mapAttributes(_, resolve))
  // Everything between open() and a fully-constructed reader runs under
  // a close-on-throw guard — an unclosed ParquetFileReader per failed
  // task attempt is a file-descriptor leak on a long-running executor.
  //
  // SCHEMA EVOLUTION (add-column): a wanted column absent from THIS
  // file's footer is read as all-null — the lakehouse contract for
  // files written before the column existed, and exactly what the
  // built-in source does under an explicit schema. Pushed filters over
  // the missing column evaluate against null under the same
  // three-valued rules as any null cell (IsNull keeps, comparisons
  // drop), so the pushdown split stays behavior-preserving. Directory
  // scans supply the evolved schema externally
  // (`supportsExternalMetadata`; inference reads one footer).
  private val (physCols, projection, columnIO, blocks) =
    try {
      // metadata columns (_graft_file/_graft_pos) are SYNTHESIZED, not
      // read — they must never reach the parquet projection
      val wanted: Array[String] =
        (required.fieldNames.filterNot(GraftMeta.names).map(resolve) ++
          filters.flatMap(_.references)).distinct
      val present = wanted.filter(fileSchema.containsField)
      // a scan needing no physical column from this file (COUNT-shaped,
      // or every wanted column missing) still needs one column to drive
      // record iteration
      val cols: Array[String] =
        if (present.nonEmpty) present
        else Array(fileSchema.getFields.get(0).getName)
      val proj = new MessageType(fileSchema.getName,
        cols.map(n => fileSchema.getType(fileSchema.getFieldIndex(n))).toSeq: _*)
      in.setRequestedSchema(proj)
      (cols, proj,
        new org.apache.parquet.io.ColumnIOFactory().getColumnIO(proj),
        in.getFooter.getBlocks.asScala.toSeq)
    } catch { case e: Throwable => in.close(); throw e }
  private var blockIdx = 0
  private var recordReader: org.apache.parquet.io.RecordReader[Group] = _
  private var recordsLeft = 0L

  // -1 = column absent from this file → null-filled (schema evolution);
  // -2/-3 = synthesized metadata column (file path / row ordinal)
  private val outIdx: Array[Int] =
    required.fieldNames.map {
      case GraftMeta.FileCol => -2
      case GraftMeta.PosCol => -3
      case n => physCols.indexOf(resolve(n))
    }

  // TYPE-WIDENING evolution: per-required-field up-cast when THIS file
  // stores the column at a narrower physical width than the table now
  // declares (INT32 under a LongType column, FLOAT under DoubleType) —
  // files keep the physical type of their era; the emitted row must
  // carry the declared one or downstream getLong/getDouble class-casts
  // die. Identity when widths already match; filter evaluation stays on
  // the narrow values (GraftFilterEval.cmp and the In-set keys widen
  // integrals/floats internally, so mixed-width compares are exact).
  // null = no conversion for this field (the overwhelmingly common
  // case) — the hot loop pays ONE null check per cell, never a
  // megamorphic Function1 dispatch (the r15 sf1 re-times caught a
  // measurable scan tax from an unconditional per-cell widen(j)(v))
  private val widen: Array[Any => Any] =
    required.fields.zipWithIndex.map { case (f, j) =>
      if (outIdx(j) < 0) null
      else {
        import PrimitiveType.PrimitiveTypeName._
        val pt = projection.getType(outIdx(j)).asPrimitiveType()
        (pt.getPrimitiveTypeName, f.dataType) match {
          case (INT32, LongType) => (v: Any) =>
            if (v == null) null
            else java.lang.Long.valueOf(
              v.asInstanceOf[java.lang.Integer].longValue())
          case (FLOAT, DoubleType) => (v: Any) =>
            if (v == null) null
            else java.lang.Double.valueOf(
              v.asInstanceOf[java.lang.Float].doubleValue())
          case _ => null
        }
      }
    }
  private val filePathUtf8 = UTF8String.fromString(file)
  private var row: Array[Any] = _

  // the row's 0-based ordinal within the FILE (all rows, parquet
  // order) — advanced per record read AND by the row count of every
  // pruned group, so it stays the file-absolute position the deletion
  // vectors and the _graft_pos metadata column are defined on
  private var ordinal = 0L

  /** Position at the next row group the stats cannot refute; false =
    * file exhausted. Skip/read calls stay 1:1 with the footer's block
    * list — `skipNextRowGroup` advances the reader without touching the
    * group's pages. */
  private def advanceBlock(): Boolean = {
    while (blockIdx < blocks.length) {
      val b = blocks(blockIdx); blockIdx += 1
      if (filters.nonEmpty && GraftStatsPrune.provablyEmpty(filters, b)) {
        in.skipNextRowGroup()
        ordinal += b.getRowCount // pruned rows still occupy ordinals
        GraftScanTelemetry.skippedGroups.increment()
      } else {
        val pages = in.readNextRowGroup()
        GraftScanTelemetry.decodedGroups.increment()
        recordReader = columnIO.getRecordReader(pages,
          new org.apache.parquet.example.data.simple.convert.GroupRecordConverter(projection))
        recordsLeft = pages.getRowCount
        if (recordsLeft > 0) return true
      }
    }
    false
  }

  // large top-level In lists (runtime filters deliver the build side's
  // keys) become O(1) hash-set membership; everything else evaluates
  // through the general three-valued path. Zone-map refutation
  // (advanceBlock) still sees the FULL conjunction — its per-group
  // vs.forall is bounded by group count, not row count.
  private val (fastIns, slowFilters) = GraftFilterEval.compileIns(filters)

  override def next(): Boolean = {
    // pushed limit: stop reading this partition once satisfied — the
    // remaining pages of the file are never decoded
    if (limit >= 0 && emitted >= limit) return false
    while (recordsLeft > 0 || advanceBlock()) {
      while (recordsLeft > 0) {
        val g = recordReader.read()
        recordsLeft -= 1
        val ord = ordinal
        ordinal += 1
        // deletion-vector membership: one O(1) container probe per
        // ordinal against the compressed bitmap (GraftDvBitmap)
        val deleted = !deletes.isEmpty && deletes.contains(ord)
        if (!deleted) {
          val vals = Array.tabulate[Any](physCols.length)(i =>
            GraftParquetV2.readValue(g, i,
              projection.getType(i).asPrimitiveType()))
          def byName(n: String): Any = physCols.indexOf(n) match {
            case -1 => null // absent from this file: evolved column
            case i => vals(i)
          }
          if (fastIns.forall(ci => ci.keep(byName(ci.attribute))) &&
              slowFilters.forall(f =>
                GraftFilterEval.eval(f, byName).contains(true))) {
            row = Array.tabulate[Any](outIdx.length)(j => outIdx(j) match {
              case -2 => filePathUtf8
              case -3 => Long.box(ord)
              case -1 => null
              case i =>
                val w = widen(j)
                if (w == null) vals(i) else w(vals(i))
            })
            emitted += 1
            return true
          }
        }
      }
    }
    false
  }

  override def get(): InternalRow = new GenericInternalRow(row)
  override def close(): Unit = in.close()
}

/** Process-wide scan telemetry: row groups decoded vs skipped by stats
  * refutation. Local-mode specs assert on it (executors share the JVM);
  * in cluster mode it is per-executor diagnostics only. */
object GraftScanTelemetry {
  val decodedGroups = new java.util.concurrent.atomic.LongAdder
  val skippedGroups = new java.util.concurrent.atomic.LongAdder
  /** Whole files dropped at planning by the stats-manifest zone maps. */
  val skippedFiles = new java.util.concurrent.atomic.LongAdder
  /** Whole files dropped at planning by bloom-sidecar refutation —
    * files the zone maps could NOT kill ([[GraftBloom]]). */
  val bloomSkippedFiles = new java.util.concurrent.atomic.LongAdder
  def reset(): Unit = {
    decodedGroups.reset(); skippedGroups.reset(); skippedFiles.reset()
    bloomSkippedFiles.reset()
  }
}

/** Footer-statistics row-group refutation for pushed source filters —
  * the zone-map half of predicate pushdown. [[provablyEmpty]] returns
  * true ONLY when the group's min/max/null-count statistics PROVE the
  * pushed conjunction matches no row, so skipping is always
  * behavior-preserving; every uncertainty degrades to "read the group":
  *   - missing/partial stats → read;
  *   - Float/Double → null-count refutation only (NaN is excluded from
  *     parquet min/max by spec and −0.0/0.0 normalization is writer
  *     lore, so bounds cannot be trusted against Spark's NaN-greatest
  *     order — in which, per SQLOrderingUtil, −0.0 EQUALS 0.0);
  *   - strings → bounds ARE trusted: parquet's unsigned-UTF-8-byte
  *     stats order, Spark's UTF8_BINARY collation, and
  *     [[GraftFilterEval.cmp]] are all the SAME order (cmp compares
  *     UTF8String, not Java UTF-16 — the two disagree for
  *     [U+E000,U+FFFF] vs supplementary code points), and truncated
  *     stats stay valid bounds by construction (min truncates down,
  *     max up).
  *
  * At 100 TB this is the difference between decoding every page of a
  * sorted/clustered fact table and touching the one row group a range
  * predicate selects — the same file-skipping story lakehouse formats
  * build on exactly these footer stats. */
object GraftStatsPrune {
  import org.apache.parquet.hadoop.metadata.BlockMetaData

  /** Per-column zone-map entry — built from a row group's footer stats
    * or (file-level pruning) from a write-time stats manifest. */
  final case class ColStats(min: Any, max: Any, numNulls: Long,
      nullsSet: Boolean, valueCount: Long)

  /** The pushed filters are a conjunction: one refuted conjunct refutes
    * the whole group. */
  def provablyEmpty(pushed: Array[Filter], block: BlockMetaData): Boolean = {
    val lookup: String => Option[ColStats] = statsOf(block, _)
    pushed.exists(refuted(_, lookup))
  }

  /** Same refutation over any zone-map source (e.g. the per-FILE stats
    * manifest a graft sink records) — one proof engine, two
    * granularities. */
  def provablyEmptyStats(pushed: Array[Filter],
      lookup: String => Option[ColStats]): Boolean =
    pushed.exists(refuted(_, lookup))

  private def statsOf(block: BlockMetaData, name: String): Option[ColStats] =
    block.getColumns.asScala.find(_.getPath.toDotString == name).flatMap { c =>
      Option(c.getStatistics).map { s =>
        ColStats(
          if (s.hasNonNullValue) normalize(s.genericGetMin) else null,
          if (s.hasNonNullValue) normalize(s.genericGetMax) else null,
          if (s.isNumNullsSet) s.getNumNulls else -1L,
          s.isNumNullsSet, c.getValueCount)
      }
    }

  private def normalize(v: Any): Any = v match {
    // exact stats bytes, no transcode — UTF8String order IS parquet's
    // unsigned stats order, and (after the cmp fix) the evaluator's
    case b: org.apache.parquet.io.api.Binary => UTF8String.fromBytes(b.getBytes)
    case o => o
  }

  private def allNull(s: ColStats): Boolean =
    s.nullsSet && s.numNulls == s.valueCount

  /** Literals whose compare order provably matches parquet's stats
    * order: integrals, booleans, and strings (all three orders — eval,
    * stats, literal — are the same unsigned-byte order now).
    * Float/Double are excluded wholesale (scaladoc above). */
  private def orderSafe(lit: Any): Boolean = lit match {
    case _: java.lang.Integer | _: java.lang.Long | _: java.lang.Boolean => true
    case _: String | _: UTF8String => true
    case _ => false
  }

  /** cmp(bound, lit), None on anything unexpected — refutation then
    * simply doesn't fire. */
  private def safeCmp(bound: Any, lit: Any): Option[Int] =
    try GraftFilterEval.cmp(bound, lit)
    catch { case _: IllegalStateException => None }

  /** Refuted when the column is provably all-null (no comparison yields
    * TRUE), or when `p(cmp(min,lit), cmp(max,lit))` proves emptiness. */
  private def boundsRefute(lookup: String => Option[ColStats], a: String,
      lit: Any)(p: (Int, Int) => Boolean): Boolean =
    lookup(a).exists { s =>
      allNull(s) ||
        (orderSafe(lit) && s.min != null && s.max != null &&
          (for (cn <- safeCmp(s.min, lit); cx <- safeCmp(s.max, lit))
            yield p(cn, cx)).getOrElse(false))
    }

  private def refuted(f: Filter, lookup: String => Option[ColStats]): Boolean = f match {
    case And(l, r) => refuted(l, lookup) || refuted(r, lookup)
    case Or(l, r) => refuted(l, lookup) && refuted(r, lookup)
    case Not(_) => false // dual proof obligations; out of scope
    case IsNull(a) =>
      lookup(a).exists(s => s.nullsSet && s.numNulls == 0L)
    case IsNotNull(a) => lookup(a).exists(allNull)
    case EqualTo(a, v) =>
      boundsRefute(lookup, a, v)((cn, cx) => cn > 0 || cx < 0)
    case EqualNullSafe(a, v) => // supports() guarantees v != null
      boundsRefute(lookup, a, v)((cn, cx) => cn > 0 || cx < 0)
    case In(a, vs) =>
      vs.isEmpty || lookup(a).exists(allNull) ||
        vs.forall(v => boundsRefute(lookup, a, v)((cn, cx) => cn > 0 || cx < 0))
    case GreaterThan(a, v) =>
      boundsRefute(lookup, a, v)((_, cx) => cx <= 0)
    case GreaterThanOrEqual(a, v) =>
      boundsRefute(lookup, a, v)((_, cx) => cx < 0)
    case LessThan(a, v) =>
      boundsRefute(lookup, a, v)((cn, _) => cn >= 0)
    case LessThanOrEqual(a, v) =>
      boundsRefute(lookup, a, v)((cn, _) => cn > 0)
    case StringStartsWith(a, p) =>
      lookup(a).exists(allNull) || {
        // matches satisfy p <= v < succ(p) in byte order, succ(p) =
        // p with its last byte incremented (last byte 0xff: no upper
        // bound, only the lower check applies)
        val pb = UTF8String.fromString(p).getBytes
        (pb.nonEmpty &&
          boundsRefute(lookup, a, UTF8String.fromBytes(pb))((_, cx) => cx < 0)) ||
        (pb.nonEmpty && (pb(pb.length - 1) & 0xff) < 0xff && {
          val succ = pb.clone()
          succ(succ.length - 1) = (succ(succ.length - 1) + 1).toByte
          boundsRefute(lookup, a, UTF8String.fromBytes(succ))((cn, _) => cn >= 0)
        })
      }
    case StringEndsWith(a, _) => lookup(a).exists(allNull)
    case StringContains(a, _) => lookup(a).exists(allNull)
    case _ => false
  }
}

/** Schema/value plumbing shared by driver- and executor-side code. */
object GraftParquetV2 {
  def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft parquet v2: 'path' option is required")
    p
  }

  /** A path is one parquet file, a directory of them, or a directory
    * of Hive-style `col=value` partition directories (any nesting
    * depth — one level per partition column). Underscore/dot names are
    * invisible (staging trees, sidecars), and recursion is LIMITED to
    * `col=value` directories so an unrelated nested dir never leaks
    * rows into the table. */
  def listFiles(path: String): Seq[String] =
    listFileStatuses(path).map(_.getPath.toString).sorted

  private[sources] def listFileStatuses(path: String)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(GraftParquetWrite.sessionConf())
    val root = fs.getFileStatus(p)
    if (!root.isDirectory) return Seq(root)
    val out = collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    def walk(d: Path): Unit = fs.listStatus(d).foreach { st =>
      val n = st.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) {
        if (st.isDirectory) { if (n.contains("=")) walk(st.getPath) }
        else if (n.endsWith(".parquet")) out += st
      }
    }
    walk(p)
    out.toSeq
  }

  /** Hive's spelling for a null partition value in a directory name. */
  val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** `col=value` pairs from a file's directory path relative to the
    * table root — Nil for a flat table. Values are URL-decoded (the
    * writer's escaping); order is outermost directory first. */
  def partitionSpec(root: String, file: String): Seq[(String, String)] = {
    val rootPath = new Path(root).toUri.getPath
    val filePath = new Path(file).toUri.getPath
    if (!filePath.startsWith(rootPath)) return Nil
    filePath.stripPrefix(rootPath).stripPrefix("/")
      .split('/').dropRight(1).toSeq.flatMap { d =>
        val i = d.indexOf('=')
        if (i <= 0) None
        else Some(d.substring(0, i) ->
          java.net.URLDecoder.decode(d.substring(i + 1), "UTF-8"))
      }
  }

  /** Partition values as degenerate zone maps (min = max = the value;
    * null partition = provably all-null) — so the one refutation
    * engine does PARTITION pruning and zone-map pruning in the same
    * pass, manifest or no manifest. Unparseable or out-of-scope values
    * yield no entry: the file is then simply read (degrade to correct,
    * never wrongly pruned). */
  def partitionColStats(root: String, file: String, schema: StructType)
      : Map[String, GraftStatsPrune.ColStats] =
    partitionSpec(root, file).flatMap { case (c, raw) =>
      schema.fields.find(_.name == c).flatMap { f =>
        if (raw == HiveDefaultPartition)
          Some(c -> GraftStatsPrune.ColStats(null, null, 1L, true, 1L))
        else typedPartValue(f.dataType, raw)
          .map(v => c -> GraftStatsPrune.ColStats(v, v, 0L, true, 1L))
      }
    }.toMap

  /** Integrals box as Long — the manifest's "long" kind convention, so
    * [[GraftFilterEval.cmp]] sees the same shapes either way. */
  private def typedPartValue(dt: DataType, raw: String): Option[Any] =
    try dt match {
      case IntegerType | LongType => Some(Long.box(raw.toLong))
      case StringType => Some(UTF8String.fromString(raw))
      case BooleanType => Some(Boolean.box(raw.toBoolean))
      case _ => None
    } catch { case _: IllegalArgumentException => None }

  /** EXACT Catalyst-internal value for a partition-key row — unlike
    * [[typedPartValue]]'s zone-map boxing, the key row must carry the
    * column's own internal type (Int stays Int) or grouped-key
    * comparisons upstream would mis-type. */
  private def catalystPartValue(dt: DataType, raw: String): Option[Any] =
    try dt match {
      case IntegerType => Some(Int.box(raw.toInt))
      case LongType => Some(Long.box(raw.toLong))
      case StringType => Some(UTF8String.fromString(raw))
      case BooleanType => Some(Boolean.box(raw.toBoolean))
      case _ => None
    } catch { case _: IllegalArgumentException => None }

  /** The table's keyed layout, if it has one: every file under the
    * SAME `col=value` column sequence, every column in the schema with
    * an exactly-typed value. Returns (partition columns, file → key
    * row, distinct key count); None for flat or mixed tables — the
    * scan then reports UnknownPartitioning and nothing changes. */
  def keyedLayout(root: String, schema: StructType)
      : Option[(Seq[String], Map[String, InternalRow], Int)] = {
    val files = try listFiles(root) catch {
      case _: java.io.FileNotFoundException => Nil
    }
    if (files.isEmpty) return None
    val specs = files.map(f => f -> partitionSpec(root, f))
    // ZERO-ROW SCHEMA CARRIERS (DDL commits: CREATE TABLE, ALTER,
    // partition-spec evolution) sit FLAT at the table root. They hold
    // no rows, so ANY key claim over them is vacuously true — exclude
    // them from the uniformity check and key them under the all-null
    // group, or every catalog-declared partitioned table would stay
    // "mixed" (losing its KeyGroupedPartitioning and ordering claims)
    // until its first compaction. Both conditions are required: the
    // name suffix is the connector's own carrier convention, and the
    // footer row count PROVES emptiness for a foreign same-named
    // drop-in (one cached footer read per carrier per JVM).
    val (carriers, dataSpecs) = specs.partition { case (f, sp) =>
      sp.isEmpty && new Path(f).getName.endsWith("-schema.parquet") &&
        verifiedZeroRows(f)
    }
    if (dataSpecs.isEmpty) return None
    val cols = dataSpecs.head._2.map(_._1)
    if (cols.isEmpty) return None
    if (!dataSpecs.forall(_._2.map(_._1) == cols)) return None
    if (!cols.forall(c => schema.fieldNames.contains(c))) return None
    val rows = dataSpecs.map { case (f, sp) =>
      val vals = sp.map { case (c, raw) =>
        if (raw == HiveDefaultPartition) null
        else catalystPartValue(
          schema.fields(schema.fieldIndex(c)).dataType, raw)
          .getOrElse(return None)
      }
      f -> InternalRow.fromSeq(vals)
    } ++ carriers.map { case (f, _) =>
      f -> InternalRow.fromSeq(cols.map(_ => null))
    }
    // key count over RAW spec strings — InternalRow has no structural
    // equality to count on; a carrier's all-null key canonicalizes to
    // the all-default spec so it only counts when genuinely new
    val dataKeys = dataSpecs.map(_._2).distinct
    val nullKey = cols.map(c => c -> HiveDefaultPartition)
    val nKeys = (dataKeys ++
      (if (carriers.nonEmpty) Seq(nullKey) else Nil)).distinct.size
    Some((cols, rows.toMap, nKeys))
  }

  // carrier-emptiness proofs, cached per JVM (files are immutable and
  // UUID-named — a basename never changes its row count)
  private val zeroRowCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private[sources] def verifiedZeroRows(file: String): Boolean = {
    val cached = zeroRowCache.get(file)
    if (cached != null) cached.booleanValue()
    else {
      // cache only SUCCESSFUL footer reads: a transient IO error must
      // not permanently demote the table to 'mixed' layout (losing
      // KeyGroupedPartitioning/ordering claims for the JVM lifetime) —
      // answer false for THIS planning pass, loudly, and re-probe next
      try {
        val in = ParquetFileReader.open(HadoopInputFile.fromPath(
          new Path(file), GraftParquetWrite.sessionConf()))
        val zero = try in.getRecordCount == 0L finally in.close()
        zeroRowCache.put(file, java.lang.Boolean.valueOf(zero))
        zero
      } catch {
        case e: Exception =>
          System.err.println(
            s"[graft] schema-carrier probe failed for $file " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}) - " +
              "treating as non-empty for this plan only (not cached)")
          false
      }
    }
  }

  /** Sidecar directory name for the write-time per-file zone-map
    * manifest ([[Sinks.parquetWithStats]]); the leading underscore
    * keeps it out of [[listFiles]]. */
  val StatsSidecar = "_graft_stats.parquet"

  /** One schema for manifest writer AND reader — positional decode in
    * [[loadStatsManifest]] must never drift from what
    * [[Sinks.parquetWithStats]] writes. */
  val manifestSchema: StructType = StructType(Seq(
    StructField("file", StringType), StructField("column", StringType),
    StructField("kind", StringType),
    StructField("min_long", LongType), StructField("max_long", LongType),
    StructField("min_str", StringType), StructField("max_str", StringType),
    StructField("null_count", LongType), StructField("value_count", LongType)))

  /** file basename → (column → zone-map entry), from the sink's stats
    * sidecar; empty when the table has none. Read through the
    * connector's own per-file reader — no SparkSession needed at
    * planning time, and the sidecar is manifest-scale (files × columns
    * rows). */
  def loadStatsManifest(path: String)
      : Map[String, Map[String, GraftStatsPrune.ColStats]] = {
    // read-race tolerance, same contract as
    // [[GraftParquetWrite.rawManifestEntries]]: a concurrent writer's
    // sidecar swap between our listing and our open must degrade this
    // ADVISORY pruning input to "no stats" (conservative scan), never
    // fail planning. One retry sees a settled swap in the common case.
    // Only race-shaped failures degrade (vanished part / truncated
    // stream / torn footer — [[GraftParquetWrite
    // .raceShapedManifestFailure]]); a decode bug or persistent
    // corruption throws so the defect surfaces instead of pruning
    // silently turning off forever.
    var attempt = 0
    while (attempt < 3) {
      try return loadStatsManifestOnce(path)
      catch { case e: Exception
          if GraftParquetWrite.raceShapedManifestFailure(e) =>
        attempt += 1
        System.err.println(s"[graft] stats-manifest read raced a swap " +
          s"under $path (attempt $attempt): ${e.getMessage}")
        Thread.sleep(50L * attempt)
      }
    }
    Map.empty
  }

  private def loadStatsManifestOnce(path: String)
      : Map[String, Map[String, GraftStatsPrune.ColStats]] = {
    val sidecar = new Path(s"$path/$StatsSidecar")
    val fs = sidecar.getFileSystem(GraftParquetWrite.sessionConf())
    if (!fs.exists(sidecar)) return Map.empty
    val parts = fs.listStatus(sidecar).toSeq.map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      .map(_.toString)
    val rows = collection.mutable.ArrayBuffer.empty[InternalRow]
    parts.foreach { f =>
      val r = new GraftPartitionReader(f, manifestSchema, Array.empty)
      try { while (r.next()) rows += r.get() } finally r.close()
    }
    rows.toSeq.groupBy(_.getString(0)).map { case (file, rs) =>
      file -> rs.map { r =>
        def optLong(i: Int): Option[Long] =
          if (r.isNullAt(i)) None else Some(r.getLong(i))
        def optStr(i: Int): Option[UTF8String] =
          if (r.isNullAt(i)) None else Some(r.getUTF8String(i))
        // NOTE: no `val (mn: Any, mx: Any) = …` destructuring — a typed
        // pattern does not match null, and absent bounds are null
        val bounds: (Any, Any) = r.getString(2) match {
          case "long" => (optLong(3).map(Long.box).orNull,
            optLong(4).map(Long.box).orNull)
          case "bool" => (optLong(3).map(_ == 1L).map(Boolean.box).orNull,
            optLong(4).map(_ == 1L).map(Boolean.box).orNull)
          case "string" => (optStr(5).orNull, optStr(6).orNull)
          case _ => (null, null)
        }
        val mn = bounds._1
        val mx = bounds._2
        val nulls = optLong(7)
        r.getString(1) -> GraftStatsPrune.ColStats(
          mn, mx, nulls.getOrElse(-1L), nulls.isDefined, r.getLong(8))
      }.toMap
    }
  }

  /** Total on-disk bytes of the table's files — from filesystem
    * metadata only (the same listing planInputPartitions already pays;
    * NO footer reads, so planning stays O(files) cheap at any scale). */
  def totalFileBytes(path: String): Long =
    listFileStatuses(path).map(_.getLen).sum

  /** Schema-inference source: the NEWEST-mtime live file (name
    * tie-break) — add-column evolution (ALTER, MERGE mergeSchema)
    * writes the WIDENED schema into the newest generation, so the
    * newest footer carries the widest view. The lexically-first file
    * could be an old narrow one and would hide evolved columns from
    * raw path-based reads (the catalog's schemaFile already picked
    * newest; this aligns the provider). An EMPTY head (post-TRUNCATE)
    * falls back to the newest ARCHIVED file — the table had a schema
    * once and the archive still holds it, exactly the catalog's rule;
    * a raw-path read of a truncated table then yields its zero rows
    * under the schema as truncated instead of refusing. */
  def schemaSourceFile(path: String): String = {
    val live = try listFileStatuses(path) catch {
      case _: java.io.FileNotFoundException => Nil
    }
    (live ++ (if (live.isEmpty) archivedDataStatuses(path) else Nil))
      .sortBy(st => (st.getModificationTime, st.getPath.getName))
      .lastOption.map(_.getPath.toString)
      .getOrElse(throw new IllegalArgumentException(
        s"graft parquet v2: no parquet files under $path"))
  }

  /** Archived DATA files only — the archive also holds folded
    * deletion-vector sidecars under `_graft_deletes/`, whose (file,
    * pos) schema must never be mistaken for the table's (the
    * post-truncate schema fallback reads the newest archived file). */
  private[sources] def archivedDataStatuses(path: String)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    val dvPrefix = GraftDeletes.DeletesDir + "/"
    GraftTableLog.archivedStatuses(path).filterNot { st =>
      val archRoot = new Path(new Path(path), GraftTableLog.ArchiveDir)
      GraftTableLog.relativize(archRoot.toString, st.getPath.toString)
        .startsWith(dvPrefix)
    }
  }

  def footerSchema(file: String,
      hadoopConf: Configuration = GraftParquetWrite.sessionConf())
      : MessageType = {
    val in = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), hadoopConf))
    try in.getFooter.getFileMetaData.getSchema finally in.close()
  }

  /** Flat schemas of the common primitive shapes; anything nested or
    * exotic fails LOUDLY with a pointer at the built-in source rather
    * than decoding wrongly.
    *
    * Inferred columns are ALWAYS nullable — the same convention as
    * Spark's built-in parquet source, and load-bearing for a multi-file
    * table: this schema is read from ONE footer
    * ([[GraftParquetTableProvider.inferSchema]] uses the lexically first
    * file), and a column REQUIRED in that file can be OPTIONAL — with
    * real nulls — in a sibling file (e.g. a seed write whose rows
    * happened to be non-null, then an append that carries nulls).
    * Declaring it non-nullable would make Spark's codegen skip the null
    * check and silently unbox those nulls to 0.0/false — wrong DATA,
    * not an error. Root cause of the r7 GraftParquetWriteSpec flake:
    * which file sorts first decided whether the table lied about
    * nullability. */
  def sparkSchema(m: MessageType): StructType =
    StructType(m.getFields.asScala.toSeq.map { f =>
      require(f.isPrimitive,
        s"graft parquet v2 supports flat primitive schemas; column " +
          s"'${f.getName}' is nested — use spark.read.parquet for it")
      StructField(f.getName, toCatalyst(f.asPrimitiveType()),
        nullable = true)
    })

  private def toCatalyst(p: PrimitiveType): DataType = {
    import PrimitiveType.PrimitiveTypeName._
    import LogicalTypeAnnotation._
    def unsupported(): Nothing = throw new IllegalArgumentException(
      s"graft parquet v2: unsupported column type ${p} — use spark.read.parquet")
    p.getPrimitiveTypeName match {
      case INT32 => p.getLogicalTypeAnnotation match {
        case _: DateLogicalTypeAnnotation => DateType
        case _ => IntegerType
      }
      case INT64 => p.getLogicalTypeAnnotation match {
        case ts: TimestampLogicalTypeAnnotation => ts.getUnit match {
          case TimeUnit.MILLIS | TimeUnit.MICROS => TimestampType
          case _ => unsupported() // NANOS: see Tables.eventsMicros
        }
        case d: DecimalLogicalTypeAnnotation =>
          DecimalType(d.getPrecision, d.getScale)
        case _ => LongType
      }
      case DOUBLE => DoubleType
      case FLOAT => FloatType
      case BOOLEAN => BooleanType
      case BINARY => p.getLogicalTypeAnnotation match {
        case _: StringLogicalTypeAnnotation => StringType
        case d: DecimalLogicalTypeAnnotation =>
          DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
      case _ => unsupported()
    }
  }

  /** Catalyst value of field `idx` of a Group under the projection —
    * null when absent. Timestamps normalize to micros (Catalyst's unit);
    * dates stay epoch-day ints (same encoding both sides). */
  def readValue(g: Group, idx: Int, p: PrimitiveType): Any = {
    import PrimitiveType.PrimitiveTypeName._
    if (g.getFieldRepetitionCount(idx) == 0) return null
    p.getPrimitiveTypeName match {
      case INT32 => g.getInteger(idx, 0)
      case INT64 =>
        val v = g.getLong(idx, 0)
        p.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
              if ts.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS => v * 1000L
          case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            // v IS the unscaled value (the write side's toUnscaledLong)
            org.apache.spark.sql.types.Decimal
              .createUnsafe(v, d.getPrecision, d.getScale)
          case _ => v
        }
      case DOUBLE => g.getDouble(idx, 0)
      case FLOAT => g.getFloat(idx, 0)
      case BOOLEAN => g.getBoolean(idx, 0)
      case BINARY => p.getLogicalTypeAnnotation match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation =>
          UTF8String.fromString(g.getString(idx, 0))
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          // big-endian unscaled bytes (two's complement), parquet spec
          org.apache.spark.sql.types.Decimal(
            BigDecimal(new java.math.BigDecimal(
              new java.math.BigInteger(g.getBinary(idx, 0).getBytes),
              d.getScale)),
            d.getPrecision, d.getScale)
        case _ => g.getBinary(idx, 0).getBytes
      }
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }
}

/** Three-valued (Kleene) evaluation of Spark source filters against raw
  * row values — the semantics Spark itself would apply, so pushing a
  * filter here is behavior-preserving. NULL comparisons are UNKNOWN, not
  * false: `Not(EqualTo(c, v))` on a null `c` must drop the row, which a
  * naive boolean evaluator would keep. */
object GraftFilterEval {
  private val comparableTypes: Set[DataType] =
    Set(IntegerType, LongType, DoubleType, FloatType, StringType, BooleanType)

  /** Types [[cmp]] can order — the eligibility gate for runtime-filter
    * attributes as well as static pushdown. */
  def comparable(dt: DataType): Boolean = comparableTypes(dt)

  /** Hash-set key with [[cmp]]'s equality semantics: integrals widen to
    * Long, floats to Double with −0.0 canonicalized to 0.0 (NaN keys
    * self-match via java.lang.Double.equals, exactly like cmp's
    * Double.compare fallback), strings to UTF8String. */
  private def setKey(v: Any): Any = v match {
    case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue())
    case l: java.lang.Long => l
    case s: java.lang.Short => java.lang.Long.valueOf(s.longValue())
    case b: java.lang.Byte => java.lang.Long.valueOf(b.longValue())
    case f: java.lang.Float => canonDouble(f.doubleValue())
    case d: java.lang.Double => canonDouble(d.doubleValue())
    case s: String => UTF8String.fromString(s)
    case other => other // UTF8String, Boolean
  }

  private def canonDouble(d: Double): java.lang.Double =
    if (d == 0.0) java.lang.Double.valueOf(0.0) else java.lang.Double.valueOf(d)

  private def keyClass(v: Any): Int = v match {
    case _: java.lang.Integer | _: java.lang.Long |
         _: java.lang.Short | _: java.lang.Byte => 0
    case _: java.lang.Float | _: java.lang.Double => 1
    case _: String | _: UTF8String => 2
    case _: java.lang.Boolean => 3
    case _ => -1
  }

  /** Minimum In-list size for the hash-set fast path — below this the
    * linear scan is at least as fast and carries zero behavior risk. */
  private val InSetThreshold = 8

  /** A pre-normalized membership test for one top-level `In` conjunct. */
  final case class CompiledIn(attribute: String, set: java.util.HashSet[Any]) {
    def keep(x: Any): Boolean = x != null && set.contains(setKey(x))
  }

  /** Sorted-key range probe for PLANNING-time refutation of huge In
    * lists against per-file [min, max] zone maps: O(log keys) per file
    * instead of the generic path's O(keys) — the driver-side sibling of
    * [[compileIns]]' per-row hash set (same DPP shape, different axis).
    * Conservative on any comparison surprise (None → not refuted). */
  final case class SortedIn(attribute: String, keys: Array[Any]) {
    /** True iff NO key lies in [mn, mx] under [[cmp]]'s order. */
    def noneInRange(mn: Any, mx: Any): Boolean = {
      var lo = 0
      var hi = keys.length
      while (lo < hi) { // first key >= mn
        val mid = (lo + hi) >>> 1
        if (cmp(keys(mid), mn).exists(_ < 0)) lo = mid + 1 else hi = mid
      }
      lo >= keys.length || cmp(keys(lo), mx).exists(_ > 0)
    }
  }

  /** Minimum In-list size for the sorted planning probe — the generic
    * per-value refutation is fine below it. */
  private val SortedInThreshold = 64

  /** Split a conjunction into sorted-key In probes (huge homogeneous
    * lists) and the generic refutation residue, for file-level zone-map
    * pruning. Sorting happens ONCE per planning pass, not per file. */
  def compileSortedIns(conj: Array[Filter])
      : (Array[SortedIn], Array[Filter]) = {
    val fast = collection.mutable.ArrayBuffer.empty[SortedIn]
    val rest = collection.mutable.ArrayBuffer.empty[Filter]
    conj.foreach {
      case In(a, vs) if vs.length >= SortedInThreshold &&
          vs.forall(_ != null) &&
          vs.map(keyClass).distinct.length == 1 && keyClass(vs.head) >= 0 =>
        fast += SortedIn(a,
          vs.map(norm).sortWith((x, y) => cmp(x, y).exists(_ < 0)))
      case f => rest += f
    }
    (fast.toArray, rest.toArray)
  }

  private def norm(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case o => o
  }

  /** Split a pushed conjunction into hash-set-backed top-level In tests
    * and the general evaluator's residue. Runtime filters (DPP) arrive
    * as top-level `In(joinKey, buildKeys)` with potentially 10⁵⁺ keys —
    * evaluated linearly per row that is O(rows × keys) in the scan hot
    * path; the set makes it O(1) per row. Only homogeneous value lists
    * compile (mixed numeric classes keep cmp's cross-type semantics on
    * the slow path), and the row-keep decision is IDENTICAL: x null →
    * dropped either way, membership equality is [[setKey]] ≡ cmp = 0. */
  def compileIns(pushed: Array[Filter])
      : (Array[CompiledIn], Array[Filter]) = {
    val fast = collection.mutable.ArrayBuffer.empty[CompiledIn]
    val slow = collection.mutable.ArrayBuffer.empty[Filter]
    pushed.foreach {
      case In(a, vs) if vs.length >= InSetThreshold && vs.forall(_ != null) &&
          vs.map(keyClass).distinct.length == 1 && keyClass(vs.head) >= 0 =>
        val set = new java.util.HashSet[Any](vs.length * 2)
        vs.foreach(v => set.add(setKey(v)))
        fast += CompiledIn(a, set)
      case f => slow += f
    }
    (fast.toArray, slow.toArray)
  }

  /** Rewrite every attribute reference through `m` — the RENAME COLUMN
    * translation into a file's physical namespace. Shape-preserving;
    * unknown shapes pass through untouched (supports() gated them). */
  def mapAttributes(f: Filter, m: String => String): Filter = f match {
    case EqualTo(a, v) => EqualTo(m(a), v)
    case EqualNullSafe(a, v) => EqualNullSafe(m(a), v)
    case GreaterThan(a, v) => GreaterThan(m(a), v)
    case GreaterThanOrEqual(a, v) => GreaterThanOrEqual(m(a), v)
    case LessThan(a, v) => LessThan(m(a), v)
    case LessThanOrEqual(a, v) => LessThanOrEqual(m(a), v)
    case In(a, vs) => In(m(a), vs)
    case IsNull(a) => IsNull(m(a))
    case IsNotNull(a) => IsNotNull(m(a))
    case And(l, r) => And(mapAttributes(l, m), mapAttributes(r, m))
    case Or(l, r) => Or(mapAttributes(l, m), mapAttributes(r, m))
    case Not(c) => Not(mapAttributes(c, m))
    case StringStartsWith(a, v) => StringStartsWith(m(a), v)
    case StringEndsWith(a, v) => StringEndsWith(m(a), v)
    case StringContains(a, v) => StringContains(m(a), v)
    case other => other
  }

  /** Only filters whose every referenced column exists with a supported
    * type, whose shape is implemented, and whose literals are non-null
    * (Spark expresses SQL NULL tests as IsNull/IsNotNull). */
  def supports(f: Filter, schema: StructType): Boolean = {
    def colOk(name: String): Boolean =
      schema.fields.exists(s => s.name == name && comparableTypes(s.dataType))
    f match {
      case EqualTo(a, v) => colOk(a) && v != null
      case EqualNullSafe(a, v) => colOk(a) && v != null
      case GreaterThan(a, v) => colOk(a) && v != null
      case GreaterThanOrEqual(a, v) => colOk(a) && v != null
      case LessThan(a, v) => colOk(a) && v != null
      case LessThanOrEqual(a, v) => colOk(a) && v != null
      case In(a, vs) => colOk(a) && vs != null && vs.forall(_ != null)
      case IsNull(a) => schema.fieldNames.contains(a)
      case IsNotNull(a) => schema.fieldNames.contains(a)
      case And(l, r) => supports(l, schema) && supports(r, schema)
      case Or(l, r) => supports(l, schema) && supports(r, schema)
      case Not(c) => supports(c, schema)
      case StringStartsWith(a, v) => colOk(a) && v != null
      case StringEndsWith(a, v) => colOk(a) && v != null
      case StringContains(a, v) => colOk(a) && v != null
      case _ => false
    }
  }

  /** None = UNKNOWN. The reader keeps a row iff every pushed filter
    * evaluates to Some(true) — exactly SQL WHERE. */
  def eval(f: Filter, get: String => Any): Option[Boolean] = f match {
    case EqualTo(a, v) => cmp(get(a), v).map(_ == 0)
    case EqualNullSafe(a, v) =>
      Some(get(a) != null && cmp(get(a), v).contains(0))
    case GreaterThan(a, v) => cmp(get(a), v).map(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(get(a), v).map(_ >= 0)
    case LessThan(a, v) => cmp(get(a), v).map(_ < 0)
    case LessThanOrEqual(a, v) => cmp(get(a), v).map(_ <= 0)
    case In(a, vs) => get(a) match {
      case null => None
      case x => Some(vs.exists(v => cmp(x, v).contains(0)))
    }
    case IsNull(a) => Some(get(a) == null)
    case IsNotNull(a) => Some(get(a) != null)
    case And(l, r) => (eval(l, get), eval(r, get)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (eval(l, get), eval(r, get)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(c) => eval(c, get).map(!_)
    case StringStartsWith(a, v) => strTest(get(a), v, _.startsWith(_))
    case StringEndsWith(a, v) => strTest(get(a), v, _.endsWith(_))
    case StringContains(a, v) => strTest(get(a), v, _.contains(_))
    case other => throw new IllegalStateException(
      s"graft parquet v2: unsupported pushed filter $other — supports() must gate this")
  }

  /** String predicates run in UTF8String space — Spark's own engine
    * type — so prefix/suffix/substring semantics are exactly the
    * built-in source's, byte for byte. */
  private def strTest(x: Any, lit: String,
      p: (UTF8String, UTF8String) => Boolean): Option[Boolean] = x match {
    case null => None
    case u: UTF8String => Some(p(u, UTF8String.fromString(lit)))
    case s: String => Some(p(UTF8String.fromString(s), UTF8String.fromString(lit)))
    case other => throw new IllegalStateException(s"string filter on $other")
  }

  /** Spark aligns pushed literal types with the column type, but be
    * robust to Int-vs-Long and Float-vs-Double drift. Strings compare
    * as UTF8String — unsigned UTF-8 byte order, Spark's UTF8_BINARY
    * collation — NOT Java String.compareTo: the two orders disagree for
    * [U+E000,U+FFFF] vs supplementary code points, and Spark's is the
    * contract a pushed filter must honor. (Package-visible:
    * [[GraftStatsPrune]] compares stats bounds with the SAME ordering
    * the row-level evaluator uses — one semantics source, which is also
    * exactly parquet's unsigned stats order.) */
  private[sources] def cmp(x: Any, lit: Any): Option[Int] = {
    if (x == null || lit == null) return None
    def norm(v: Any): Any = v match {
      case s: String => UTF8String.fromString(s)
      case o => o
    }
    Some((norm(x), norm(lit)) match {
      case (a: Int, b: Int) => java.lang.Integer.compare(a, b)
      case (a: Int, b: Long) => java.lang.Long.compare(a.toLong, b)
      case (a: Long, b: Int) => java.lang.Long.compare(a, b.toLong)
      case (a: Long, b: Long) => java.lang.Long.compare(a, b)
      case (a: Number, b: Number) =>
        // Spark's SQLOrderingUtil.compareDoubles: the primitive == makes
        // -0.0 equal 0.0 (Double.compare alone would order them, silently
        // dropping -0.0 rows from an EqualTo(0.0) pushdown); NaN still
        // sorts greatest via the Double.compare fallback.
        val (x, y) = (a.doubleValue(), b.doubleValue())
        if (x == y) 0 else java.lang.Double.compare(x, y)
      case (a: UTF8String, b: UTF8String) => a.compareTo(b)
      case (a: Boolean, b: Boolean) => java.lang.Boolean.compare(a, b)
      case (a, b) => throw new IllegalStateException(
        s"graft parquet v2: incomparable filter operands $a (${a.getClass}) vs $b")
    })
  }
}
