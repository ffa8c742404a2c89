package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ORDER-INDEPENDENT statistical moments: correlation, variance/stddev,
  * skewness, kurtosis, and closed-form simple linear regression —
  * derived from DECIMAL-EXACT power sums instead of Spark's built-in
  * float aggregates.
  *
  * Why not `corr()`/`stddev()`/`skewness()`: the built-ins merge
  * per-partition float states (Welford-style) in PARTITION ORDER —
  * re-running the same query over the same data with a different task
  * fan-out can change the last ulps of the answer. At 100 TB that
  * makes statistical QA non-reproducible run to run. Here every
  * power sum (Σx, Σx², Σx³, Σx⁴, Σy, Σy², Σxy) accumulates in exact
  * DECIMAL arithmetic — a pure multiset function of the rows, same
  * bits at ANY partitioning — and the closed-form moment formulas run
  * once on the tiny per-group sum rows. The final arithmetic is
  * IEEE-exact double ops (+,−,×,÷,sqrt are all correctly rounded), so
  * the whole result is bit-deterministic end to end and needs NO
  * rounding for the oracle hash (the Catalog determinism convention:
  * round only libm, emit rational arithmetic unrounded).
  *
  * The formulas live here as SQL TEXT evaluated via `expr(...)` on the
  * Spark side and inlined verbatim into the DuckDB mirror — one
  * parse-identical arithmetic tree on both engines.
  *
  * Scale: one partial-aggregated exchange of 8 decimal sums per
  * (group × task); the moment math touches group-cardinality rows.
  * Reference context: the reference computes no statistics at all
  * (`/root/reference/pipelines/`, all four mains) — this family is
  * part of the
  * LLM-pipeline extension surface (feature QA / probe fitting over
  * corpus statistics). */
object Moments {

  // n·variance numerators — the degenerate-group guards key on these
  // (ANSI double division by zero THROWS in Spark 4; a constant column
  // must yield NULL, deterministically on both engines, not an error)
  private val nVarX = "(n*sxx - sx*sx)"
  private val nVarY = "(n*syy - sy*sy)"

  /** Population variance from power sums. */
  val varPopF = s"$nVarX / (n*n)"
  val stddevPopF = s"sqrt($varPopF)"

  /** Population skewness: m3 / m2^1.5 (the ^1.5 written as m2*sqrt(m2)
    * — pow() is not correctly rounded; sqrt and × are). NULL when the
    * column is constant (zero variance). */
  val skewPopF = s"CASE WHEN $nVarX = 0 THEN NULL ELSE " +
    "((n*n*sxxx - 3*n*sx*sxx + 2*sx*sx*sx) / (n*n*n)) / " +
    s"(($varPopF) * sqrt($varPopF)) END"

  /** Population excess kurtosis: m4 / m2² − 3; NULL on zero variance. */
  val kurtPopF = s"CASE WHEN $nVarX = 0 THEN NULL ELSE " +
    "((n*n*n*sxxxx - 4*n*n*sx*sxxx + 6*n*sx*sx*sxx - 3*sx*sx*sx*sx) " +
    s"/ (n*n*n*n)) / (($varPopF) * ($varPopF)) - 3.0 END"

  /** Pearson correlation; NULL when either side is constant. */
  val corrF = s"CASE WHEN $nVarX = 0 OR $nVarY = 0 THEN NULL ELSE " +
    s"(n*sxy - sx*sy) / (sqrt($nVarX) * sqrt($nVarY)) END"

  /** Ordinary-least-squares y = slope·x + intercept; NULL slope (and
    * so NULL intercept/r²) when x is constant. */
  val slopeF = s"CASE WHEN $nVarX = 0 THEN NULL ELSE " +
    s"(n*sxy - sx*sy) / $nVarX END"
  val interceptF = s"(sy - ($slopeF)*sx) / n"
  val r2F = s"($corrF) * ($corrF)"

  /** The REAGGREGABLE wire form: decimal-exact power sums per group at
    * FIXED decimal grains — the moments analogue of the sketch-partials
    * surface (hll_merge, dd_merge, …), except the merge is literal
    * decimal ADDITION, so reaggregation is not merely lossless but
    * exact algebra: sums-of-sums ≡ sums-over-union, bit for bit. Store
    * these rows once; answer any rollup level without re-scanning.
    * `x`/`y` must already be DECIMAL columns whose powers stay inside
    * the fixed grains (see [[powerSumsSql]] for the mirrored text). */
  def powerSumsExact(df: DataFrame, groupCols: Seq[String], x: Column,
      y: Column): DataFrame = {
    val x2 = (x * x).cast("decimal(15,4)")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        sum(x).cast("decimal(28,2)").as("dsx"),
        sum(x2).cast("decimal(32,4)").as("dsxx"),
        sum((x2 * x).cast("decimal(25,6)")).cast("decimal(34,6)").as("dsxxx"),
        sum(x2 * x2).cast("decimal(36,8)").as("dsxxxx"),
        sum(y).cast("decimal(30,2)").as("dsy"),
        sum(y * y).cast("decimal(34,4)").as("dsyy"),
        sum(x * y).cast("decimal(32,4)").as("dsxy"))
  }

  /** Merge stored sum rows up a rollup level: exact decimal addition. */
  def mergeSums(sums: DataFrame, groupCols: Seq[String]): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) sums.groupBy()
      else sums.groupBy(groupCols.map(col): _*)
    grouped.agg(
      sum("cnt").cast("long").as("cnt"),
      sum("dsx").cast("decimal(28,2)").as("dsx"),
      sum("dsxx").cast("decimal(32,4)").as("dsxx"),
      sum("dsxxx").cast("decimal(34,6)").as("dsxxx"),
      sum("dsxxxx").cast("decimal(36,8)").as("dsxxxx"),
      sum("dsy").cast("decimal(30,2)").as("dsy"),
      sum("dsyy").cast("decimal(34,4)").as("dsyy"),
      sum("dsxy").cast("decimal(32,4)").as("dsxy"))
  }

  /** Double-cast view of a sum row (the formulas' working frame). */
  private def doubleFrame(sums: DataFrame, groupCols: Seq[String]): DataFrame =
    sums.select(groupCols.map(col) ++ Seq(
      col("cnt").cast("double").as("n"),
      col("dsx").cast("double").as("sx"),
      col("dsxx").cast("double").as("sxx"),
      col("dsxxx").cast("double").as("sxxx"),
      col("dsxxxx").cast("double").as("sxxxx"),
      col("dsy").cast("double").as("sy"),
      col("dsyy").cast("double").as("syy"),
      col("dsxy").cast("double").as("sxy")): _*)

  /** Decimal-exact power sums per group, cast to double LAST. */
  def powerSums(df: DataFrame, groupCols: Seq[String], x: Column,
      y: Column): DataFrame =
    doubleFrame(powerSumsExact(df, groupCols, x, y), groupCols)

  /** Moment statistics FROM stored sum rows (any rollup level). */
  def statsFromSums(sums: DataFrame, groupCols: Seq[String]): DataFrame =
    doubleFrame(sums, groupCols).select(
      groupCols.map(col) ++ Seq(
        col("n").cast("long").as("n_rows"),
        expr(stddevPopF).as("stddev_x"),
        expr(skewPopF).as("skew_x"),
        expr(kurtPopF).as("kurt_x"),
        expr(corrF).as("corr_xy")): _*)

  /** DuckDB mirror of [[powerSumsExact]] — decimal partials at the
    * same fixed grains (group column first). */
  def powerSumsExactSql(table: String, xRaw: String, yRaw: String,
      groupCol: String): String =
    s"""SELECT $groupCol,
       |       count(*) AS cnt,
       |       CAST(sum(x) AS DECIMAL(28,2)) AS dsx,
       |       CAST(sum(x2) AS DECIMAL(32,4)) AS dsxx,
       |       CAST(sum(CAST(x2*x AS DECIMAL(25,6))) AS DECIMAL(34,6)) AS dsxxx,
       |       CAST(sum(x2*x2) AS DECIMAL(36,8)) AS dsxxxx,
       |       CAST(sum(y) AS DECIMAL(30,2)) AS dsy,
       |       CAST(sum(y*y) AS DECIMAL(34,4)) AS dsyy,
       |       CAST(sum(x*y) AS DECIMAL(32,4)) AS dsxy
       |FROM (SELECT $groupCol,
       |             CAST($xRaw AS DECIMAL(9,2)) AS x,
       |             CAST(CAST($xRaw AS DECIMAL(9,2)) *
       |                  CAST($xRaw AS DECIMAL(9,2)) AS DECIMAL(15,4)) AS x2,
       |             CAST($yRaw AS DECIMAL(12,2)) AS y
       |      FROM $table)
       |GROUP BY $groupCol""".stripMargin

  /** Mirror of [[mergeSums]] over a named sums relation (grand total —
    * no group column). */
  def mergeSumsSql(sumsRel: String): String =
    s"""SELECT CAST(sum(cnt) AS BIGINT) AS cnt,
       |       CAST(sum(dsx) AS DECIMAL(28,2)) AS dsx,
       |       CAST(sum(dsxx) AS DECIMAL(32,4)) AS dsxx,
       |       CAST(sum(dsxxx) AS DECIMAL(34,6)) AS dsxxx,
       |       CAST(sum(dsxxxx) AS DECIMAL(36,8)) AS dsxxxx,
       |       CAST(sum(dsy) AS DECIMAL(30,2)) AS dsy,
       |       CAST(sum(dsyy) AS DECIMAL(34,4)) AS dsyy,
       |       CAST(sum(dsxy) AS DECIMAL(32,4)) AS dsxy
       |FROM $sumsRel""".stripMargin

  /** Mirror of the double-cast working frame over a sums relation. */
  def doubleFrameSqlCols: String =
    """CAST(cnt AS DOUBLE) AS n,
      |CAST(dsx AS DOUBLE) AS sx, CAST(dsxx AS DOUBLE) AS sxx,
      |CAST(dsxxx AS DOUBLE) AS sxxx, CAST(dsxxxx AS DOUBLE) AS sxxxx,
      |CAST(dsy AS DOUBLE) AS sy, CAST(dsyy AS DOUBLE) AS syy,
      |CAST(dsxy AS DOUBLE) AS sxy""".stripMargin

  /** The DuckDB mirror of [[powerSums]] — same casts, same grains. */
  def powerSumsSql(table: String, xRaw: String, yRaw: String,
      groupCol: String): String =
    s"""SELECT $groupCol,
       |       CAST(count(*) AS DOUBLE) AS n,
       |       CAST(sum(x) AS DOUBLE) AS sx,
       |       CAST(sum(x2) AS DOUBLE) AS sxx,
       |       CAST(sum(CAST(x2*x AS DECIMAL(25,6))) AS DOUBLE) AS sxxx,
       |       CAST(sum(x2*x2) AS DOUBLE) AS sxxxx,
       |       CAST(sum(y) AS DOUBLE) AS sy,
       |       CAST(sum(y*y) AS DOUBLE) AS syy,
       |       CAST(sum(x*y) AS DOUBLE) AS sxy
       |FROM (SELECT $groupCol,
       |             CAST($xRaw AS DECIMAL(9,2)) AS x,
       |             CAST(CAST($xRaw AS DECIMAL(9,2)) *
       |                  CAST($xRaw AS DECIMAL(9,2)) AS DECIMAL(15,4)) AS x2,
       |             CAST($yRaw AS DECIMAL(12,2)) AS y
       |      FROM $table)
       |GROUP BY $groupCol""".stripMargin

  /** Pearson chi-squared test of independence between two categorical
    * columns, plus Cramér's V — the categorical sibling of [[corrF]]
    * (is the language mix independent of the source? — a drift check
    * a corpus pipeline runs per ingest). The full r×c grid is summed,
    * zero-observed cells included ((0−E)²/E = E). Determinism: each
    * cell's term is IEEE-deterministic ((O−E)²/E over exact counts),
    * but their SUM order would not be — so terms round to 6dp decimals
    * (libm-free, HALF_UP on non-negative values — identical in both
    * engines) and sum EXACTLY; the total is a pure multiset function.
    * Scale: one count aggregation per axis + one over pairs; the grid
    * itself is category-cardinality (tiny) rows. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(aCol, bCol).agg(count(lit(1)).as("o"))
    val aTot = df.groupBy(aCol).agg(count(lit(1)).as("ra"))
    val bTot = df.groupBy(bCol).agg(count(lit(1)).as("cb"))
    val n = df.agg(count(lit(1)).as("nn"))
    val grid = aTot.crossJoin(bTot).crossJoin(broadcast(n))
      .join(obs, Seq(aCol, bCol), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val e = col("ra").cast("double") * col("cb").cast("double") /
      col("nn").cast("double")
    val term = (col("o").cast("double") - e) * (col("o").cast("double") - e) / e
    val cells = grid.select(
      round(term, 6).cast("decimal(28,6)").as("t6"),
      col("nn"))
    val r = aTot.agg(count(lit(1)).as("r"))
    val c = bTot.agg(count(lit(1)).as("c"))
    cells.groupBy()
      .agg(sum(col("t6")).cast("double").as("chi2"),
        max(col("nn")).as("n_rows"))
      .crossJoin(broadcast(r)).crossJoin(broadcast(c))
      .select(
        col("chi2"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        col("n_rows"),
        sqrt(col("chi2") / (col("n_rows").cast("double") *
          least(col("r") - 1, col("c") - 1).cast("double")))
          .as("cramers_v"))
  }

  /** DuckDB mirror of [[chiSquare]]. */
  def chiSquareSql(table: String, aCol: String, bCol: String): String =
    s"""WITH obs AS (
       |  SELECT $aCol, $bCol, count(*) AS o FROM $table GROUP BY 1, 2
       |), atot AS (SELECT $aCol, count(*) AS ra FROM $table GROUP BY 1),
       |btot AS (SELECT $bCol, count(*) AS cb FROM $table GROUP BY 1),
       |tot AS (SELECT count(*) AS nn FROM $table),
       |grid AS (
       |  SELECT a.$aCol, b.$bCol, a.ra, b.cb, t.nn,
       |         COALESCE(o.o, 0) AS o
       |  FROM atot a CROSS JOIN btot b CROSS JOIN tot t
       |  LEFT JOIN obs o ON o.$aCol = a.$aCol AND o.$bCol = b.$bCol
       |), cells AS (
       |  SELECT nn,
       |         CAST(round(
       |           (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE)*CAST(cb AS DOUBLE)/CAST(nn AS DOUBLE))
       |           * (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE)*CAST(cb AS DOUBLE)/CAST(nn AS DOUBLE))
       |           / (CAST(ra AS DOUBLE)*CAST(cb AS DOUBLE)/CAST(nn AS DOUBLE)),
       |           6) AS DECIMAL(28,6)) AS t6
       |  FROM grid
       |), dims AS (
       |  SELECT (SELECT count(*) FROM atot) AS r,
       |         (SELECT count(*) FROM btot) AS c
       |)
       |SELECT CAST(sum(t6) AS DOUBLE) AS chi2,
       |       CAST((d.r - 1) * (d.c - 1) AS BIGINT) AS dof,
       |       max(nn) AS n_rows,
       |       sqrt(CAST(sum(t6) AS DOUBLE) /
       |            (CAST(max(nn) AS DOUBLE) *
       |             CAST(LEAST(d.r - 1, d.c - 1) AS DOUBLE))) AS cramers_v
       |FROM cells, dims d
       |GROUP BY d.r, d.c""".stripMargin

  /** Moment statistics per group: stddev/skewness/kurtosis of `x`,
    * correlation of (x, y) — unrounded doubles, bit-deterministic. */
  def momentStats(df: DataFrame, groupCols: Seq[String], x: Column,
      y: Column): DataFrame =
    powerSums(df, groupCols, x, y).select(
      groupCols.map(col) ++ Seq(
        col("n").cast("long").as("n_rows"),
        expr(stddevPopF).as("stddev_x"),
        expr(skewPopF).as("skew_x"),
        expr(kurtPopF).as("kurt_x"),
        expr(corrF).as("corr_xy")): _*)

  /** Closed-form OLS fit per group: slope, intercept, r². */
  def linearFit(df: DataFrame, groupCols: Seq[String], x: Column,
      y: Column): DataFrame =
    powerSums(df, groupCols, x, y).select(
      groupCols.map(col) ++ Seq(
        col("n").cast("long").as("n_rows"),
        expr(slopeF).as("slope"),
        expr(interceptF).as("intercept"),
        expr(r2F).as("r2")): _*)
}
