package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TABLE-LEVEL COLUMN STATISTICS — the connector's `ANALYZE TABLE`.
  * One distributed pass over the LIVE table (read through the
  * connector, so deletion vectors and rename aliases apply) computes
  * per-column NDV (HLL++, `approx_count_distinct`), null counts, and
  * string/binary length moments, persisted as a `_graft_colstats` root
  * sidecar together with the exact row count and the table version the
  * pass observed. Every later scan surfaces them through DSv2
  * `SupportsReportStatistics.columnStats()` — Spark's
  * `transformV2Stats` folds them into catalyst statistics, so
  * cost-based join estimation (`spark.sql.cbo.enabled`) sees real NDVs
  * instead of guessing from byte sizes.
  *
  * Staleness model: standard ANALYZE semantics — the stats describe
  * the table as of the recorded version and drift with later writes
  * (they are planner ESTIMATES; correctness never depends on them).
  * Re-run `CALL system.analyze` after bulk changes; `detail` shows the
  * analyzed version next to the head version.
  *
  * Scale posture: the pass is one scan + a constant-width aggregate
  * row (HLL sketches merge tree-wise inside the agg); the sidecar is
  * O(columns) bytes; readers pay one cached tiny read per JVM. */
object GraftAnalyze {

  val StatsFile = "_graft_colstats"

  private def conf = GraftParquetWrite.sessionConf()

  /** One column's persisted stats; avg/max length only for
    * string/binary (other types have fixed widths the planner already
    * knows). */
  final case class ColStat(ndv: Long, nullCount: Long,
      avgLen: Option[Long], maxLen: Option[Long])

  final case class TableStats(rows: Long, version: Long,
      cols: Map[String, ColStat])

  // per-table cache (the readPartSpec convention): invalidated by
  // analyze() in this JVM; cross-JVM refresh at the next miss — stale
  // stats are estimates, never a correctness input
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, Option[TableStats]]()

  /** Types `approx_count_distinct` + the CBO make good use of; others
    * (binary payloads aside) are skipped rather than guessed. */
  private def analyzable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | _: DecimalType | StringType | BinaryType |
         BooleanType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Run the pass, persist the sidecar, return the stats. */
  def analyze(spark: SparkSession, table: String): TableStats = {
    val df = spark.read.format("graft.sources.GraftParquetTableProvider")
      .option("path", table).load()
    val cols = df.schema.fields.filter(f => analyzable(f.dataType)).toSeq
    require(cols.nonEmpty,
      s"graft analyze: no analyzable columns in ${df.schema.simpleString}")
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(approx_count_distinct(c).as(s"ndv__${f.name}"),
        count(c).as(s"nn__${f.name}")) ++
        (f.dataType match {
          case StringType | BinaryType =>
            Seq(avg(length(c)).as(s"al__${f.name}"),
              max(length(c)).as(s"ml__${f.name}"))
          case _ => Nil
        })
    }
    val row = df.agg(count(lit(1)).as("rows__"), aggs: _*).head()
    val rows = row.getLong(row.fieldIndex("rows__"))
    val stats = cols.map { f =>
      val lens = f.dataType match {
        case StringType | BinaryType if rows > 0 =>
          val al = row.fieldIndex(s"al__${f.name}")
          val ml = row.fieldIndex(s"ml__${f.name}")
          (if (row.isNullAt(al)) None
           else Some(math.ceil(row.getDouble(al)).toLong),
            if (row.isNullAt(ml)) None else Some(row.getInt(ml).toLong))
        case _ => (None, None)
      }
      f.name -> ColStat(
        row.getLong(row.fieldIndex(s"ndv__${f.name}")),
        rows - row.getLong(row.fieldIndex(s"nn__${f.name}")),
        lens._1, lens._2)
    }
    val version = GraftTableLog.latestVersion(table).getOrElse(-1L)
    val out = TableStats(rows, version, stats.toMap)
    val f = new Path(table, StatsFile)
    val fs = f.getFileSystem(conf)
    val tmp = new Path(table,
      s"_tmp_colstats-${java.util.UUID.randomUUID()}")
    val o = fs.create(tmp, true)
    try {
      val body = (s"rows\t$rows\tversion\t$version" +:
        stats.map { case (n, s) =>
          s"$n\t${s.ndv}\t${s.nullCount}\t${s.avgLen.getOrElse(-1L)}" +
            s"\t${s.maxLen.getOrElse(-1L)}"
        }).mkString("\n")
      o.write(body.getBytes("UTF-8"))
    } finally o.close()
    fs.delete(f, false)
    require(fs.rename(tmp, f),
      s"graft analyze: could not persist stats at $f")
    cache.put(table, Some(out))
    out
  }

  def read(table: String): Option[TableStats] =
    cache.computeIfAbsent(table, t => {
      val f = new Path(t, StatsFile)
      val fs = f.getFileSystem(conf)
      if (!fs.exists(f)) None
      else {
        val in = fs.open(f)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.split('\n').toSeq finally in.close()
        val head = lines.head.split('\t')
        val cols = lines.tail.filter(_.nonEmpty).map { l =>
          val p = l.split('\t')
          p(0) -> ColStat(p(1).toLong, p(2).toLong,
            Some(p(3).toLong).filter(_ >= 0),
            Some(p(4).toLong).filter(_ >= 0))
        }
        Some(TableStats(head(1).toLong, head(3).toLong, cols.toMap))
      }
    })
}
