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
    * knows); min/max (double space) only for numeric columns — they
    * feed catalyst's value-interval checks, without which join
    * estimation can't even prove two key ranges intersect. */
  final case class ColStat(ndv: Long, nullCount: Long,
      avgLen: Option[Long], maxLen: Option[Long],
      min: Option[Double] = None, max: Option[Double] = None)

  /** One equi-height histogram bin: value range + its distinct count.
    * A skewed key produces runs of POINT bins (lo == hi == the hot
    * value, ndv 1) — exactly what join estimation needs to price the
    * hot key honestly. */
  final case class HistBin(lo: Double, hi: Double, ndv: Long)

  /** Equi-height histogram: every bin holds ~`height` rows. */
  final case class ColHist(height: Double, bins: Seq[HistBin])

  final case class TableStats(rows: Long, version: Long,
      cols: Map[String, ColStat],
      hists: Map[String, ColHist] = Map.empty,
      // COMPOSITE-KEY NDVs (round 14): per declared key set (column
      // names, order-normalized), the approx distinct count of the
      // TUPLE — what join estimation needs for correlated composite
      // keys, where the per-column NDV product (Spark's independence
      // assumption) overprices distinctness and underprices the join
      // output. Served to the planner by
      // [[graft.plans.CompositeKeyJoinRule]].
      keyNdv: Map[Seq[String], Long] = Map.empty)

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

  /** Numeric types an equi-height histogram is computable over (bounds
    * live in double space, Spark's own ANALYZE convention). */
  private def histogramable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | _: DecimalType => true
    case _ => false
  }

  /** Run the pass, persist the sidecar, return the stats.
    *
    * `histogramCols` (opt-in, the Spark ANALYZE convention — histograms
    * cost a second aggregate pass) adds per-column EQUI-HEIGHT
    * histograms: pass 1 piggybacks `percentile_approx` (mergeable
    * QuantileSummaries — one shuffle-free partial per task) for the
    * `histogramBins + 1` bin bounds; pass 2 computes per-bin NDV with
    * one conditional `approx_count_distinct` per RANGE bin in a single
    * aggregate (POINT bins — lo == hi, the skewed-key shape — are ndv 1
    * by construction and cost nothing). Join estimation then prices a
    * hot key by its own bins instead of averaging it away into
    * rows/NDV. */
  def analyze(spark: SparkSession, table: String,
      histogramCols: Seq[String] = Nil,
      histogramBins: Int = 32,
      keySets: Seq[Seq[String]] = Nil): TableStats = {
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
          case dt if histogramable(dt) =>
            Seq(min(c).cast(DoubleType).as(s"mn__${f.name}"),
              max(c).cast(DoubleType).as(s"mx__${f.name}"))
          case _ => Nil
        })
    }
    require(histogramBins >= 2 && histogramBins <= 1024,
      s"graft analyze: histogram_bins must be in [2, 1024], got " +
        histogramBins)
    val histCols = histogramCols.map { n =>
      val f = df.schema.fields.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"graft analyze: histogram column '$n' not in " +
            df.schema.fieldNames.mkString("[", ", ", "]")))
      require(histogramable(f.dataType),
        s"graft analyze: histogram column '$n' has non-numeric type " +
          s"${f.dataType.simpleString}")
      f
    }
    val normKeySets = keySets.map { ks =>
      require(ks.size >= 2,
        s"graft analyze: a key set needs >= 2 columns, got $ks " +
          "(single-column NDV is already collected)")
      ks.foreach { n => require(df.schema.fieldNames.contains(n),
        s"graft analyze: key-set column '$n' not in " +
          df.schema.fieldNames.mkString("[", ", ", "]")) }
      ks.sorted
    }.distinct
    // tuple NDV piggybacks pass 1: one HLL++ sketch over the struct
    val keyAggs = normKeySets.zipWithIndex.map { case (ks, i) =>
      approx_count_distinct(struct(ks.map(col): _*)).as(s"kndv__$i")
    }
    val probs = (0 to histogramBins)
      .map(_.toDouble / histogramBins).toArray
    val histAggs = histCols.map { f =>
      percentile_approx(col(f.name).cast(DoubleType),
        lit(probs), lit(10000)).as(s"hb__${f.name}")
    }
    val row = df.agg(count(lit(1)).as("rows__"),
        aggs ++ histAggs ++ keyAggs: _*)
      .head()
    val rows = row.getLong(row.fieldIndex("rows__"))
    // pass 2 (histogram columns only): per-RANGE-bin NDV, one
    // conditional sketch per bin, all in a single aggregate row
    val hists: Map[String, ColHist] = if (histCols.isEmpty) Map.empty
    else {
      val bounds: Map[String, Array[Double]] = histCols.flatMap { f =>
        val at = row.fieldIndex(s"hb__${f.name}")
        if (row.isNullAt(at)) None // all-null column: no histogram
        else Some(f.name -> row.getSeq[Double](at).toArray)
      }.toMap
      val ndvAggs = bounds.toSeq.sortBy(_._1).flatMap { case (n, bs) =>
        val c = col(n).cast(DoubleType)
        (0 until histogramBins).flatMap { i =>
          val (lo, hi) = (bs(i), bs(i + 1))
          if (lo >= hi) None // point bin: ndv 1 by construction
          else Some(approx_count_distinct(
            // bin 0 is closed [lo, hi]; every later bin (lo, hi] — lo
            // is always covered by the bin (point or range) before it
            when(if (i == 0) c >= lo && c <= hi
                 else c > lo && c <= hi, c)).as(s"nv__${n}__$i"))
        }
      }
      val ndvRow =
        if (ndvAggs.isEmpty) null
        else df.agg(ndvAggs.head, ndvAggs.tail: _*).head()
      bounds.map { case (n, bs) =>
        val nulls = rows -
          row.getLong(row.fieldIndex(s"nn__$n"))
        val height = (rows - nulls).toDouble / histogramBins
        val bins = (0 until histogramBins).map { i =>
          val (lo, hi) = (bs(i), bs(i + 1))
          if (lo >= hi) HistBin(lo, lo.max(hi), 1L)
          else HistBin(lo, hi, math.max(1L,
            ndvRow.getLong(ndvRow.fieldIndex(s"nv__${n}__$i"))))
        }
        n -> ColHist(height, bins)
      }
    }
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
      val (mn, mx) = f.dataType match {
        case dt if histogramable(dt) && rows > 0 =>
          val a = row.fieldIndex(s"mn__${f.name}")
          val b = row.fieldIndex(s"mx__${f.name}")
          (if (row.isNullAt(a)) None else Some(row.getDouble(a)),
            if (row.isNullAt(b)) None else Some(row.getDouble(b)))
        case _ => (None, None)
      }
      f.name -> ColStat(
        row.getLong(row.fieldIndex(s"ndv__${f.name}")),
        rows - row.getLong(row.fieldIndex(s"nn__${f.name}")),
        lens._1, lens._2, mn, mx)
    }
    val keyNdv: Map[Seq[String], Long] = normKeySets.zipWithIndex.map {
      case (ks, i) => ks -> row.getLong(row.fieldIndex(s"kndv__$i"))
    }.toMap
    val version = GraftTableLog.latestVersion(table).getOrElse(-1L)
    val out = TableStats(rows, version, stats.toMap, hists, keyNdv)
    val f = new Path(table, StatsFile)
    val fs = f.getFileSystem(conf)
    val tmp = new Path(table,
      s"_tmp_colstats-${java.util.UUID.randomUUID()}")
    val o = fs.create(tmp, true)
    try {
      // header carries ncols since histograms joined the format: the
      // next `ncols` lines are column stats (5 fields), the rest are
      // histogram lines (3 fields: name, height, lo:hi:ndv|…); a
      // legacy 4-field header means every tail line is a column
      // nkeys rides the header so the reader can split hist lines
      // from key-set lines (legacy headers imply nkeys 0)
      val body = ((s"rows\t$rows\tversion\t$version" +
          s"\tncols\t${stats.size}\tnkeys\t${keyNdv.size}") +:
        (stats.map { case (n, s) =>
          s"$n\t${s.ndv}\t${s.nullCount}\t${s.avgLen.getOrElse(-1L)}" +
            s"\t${s.maxLen.getOrElse(-1L)}" +
            s"\t${s.min.map(_.toString).getOrElse("-")}" +
            s"\t${s.max.map(_.toString).getOrElse("-")}"
        } ++ hists.toSeq.sortBy(_._1).map { case (n, h) =>
          s"$n\t${h.height}\t" + h.bins.map(b =>
            s"${b.lo}:${b.hi}:${b.ndv}").mkString("|")
        } ++ keyNdv.toSeq.sortBy(_._1.mkString(",")).map { case (ks, v) =>
          s"${ks.mkString(",")}\t$v"
        })).mkString("\n")
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
        val tail = lines.tail.filter(_.nonEmpty)
        val ncols = // legacy 4-field header: every tail line is a column
          if (head.length >= 6) head(5).toInt else tail.size
        val nkeys = if (head.length >= 8) head(7).toInt else 0
        val cols = tail.take(ncols).map { l =>
          val p = l.split('\t')
          p(0) -> ColStat(p(1).toLong, p(2).toLong,
            Some(p(3).toLong).filter(_ >= 0),
            Some(p(4).toLong).filter(_ >= 0),
            if (p.length > 6 && p(5) != "-") Some(p(5).toDouble) else None,
            if (p.length > 6 && p(6) != "-") Some(p(6).toDouble) else None)
        }
        val hists = tail.slice(ncols, tail.size - nkeys).map { l =>
          val p = l.split('\t')
          p(0) -> ColHist(p(1).toDouble, p(2).split('|').toSeq.map { b =>
            val q = b.split(':')
            HistBin(q(0).toDouble, q(1).toDouble, q(2).toLong)
          })
        }
        val keyNdv = tail.takeRight(nkeys).map { l =>
          val p = l.split('\t')
          p(0).split(',').toSeq -> p(1).toLong
        }
        Some(TableStats(head(1).toLong, head(3).toLong, cols.toMap,
          hists.toMap, keyNdv.toMap))
      }
    })
}
