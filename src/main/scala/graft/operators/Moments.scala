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

  // n·variance numerators. Degenerate-group guarding is TWO-layered
  // (ANSI double division by zero THROWS in Spark 4):
  //   1. mnx = mxx — the EXACT constant-column witness (decimal min ==
  //      max). The double-rounded numerator of a constant column is
  //      float DUST (± ~1e-18, not exactly 0), so a numeric zero test
  //      alone would miss it and skew/kurt would divide by dust;
  //   2. numerator <= 0 — catastrophic cancellation on a genuinely
  //      near-constant column can round the numerator to zero or
  //      slightly negative; sqrt/division on that would NaN or throw.
  // Both conditions are bit-deterministic on both engines.
  private val nVarX = "(n*sxx - sx*sx)"
  private val nVarY = "(n*syy - sy*sy)"
  private val degX = s"mnx = mxx OR $nVarX <= 0"
  private val degY = s"mny = mxy OR $nVarY <= 0"

  /** Population variance from power sums: exactly 0 for a constant
    * column (witnessed), floored at 0 against cancellation dust. */
  val varPopF =
    s"(CASE WHEN $degX THEN 0.0 ELSE $nVarX END) / (n*n)"
  val stddevPopF = s"sqrt($varPopF)"

  /** Population skewness: m3 / m2^1.5 (the ^1.5 written as m2*sqrt(m2)
    * — pow() is not correctly rounded; sqrt and × are). NULL when the
    * variance degenerates. */
  val skewPopF = s"CASE WHEN $degX THEN NULL ELSE " +
    "((n*n*sxxx - 3*n*sx*sxx + 2*sx*sx*sx) / (n*n*n)) / " +
    s"((($nVarX) / (n*n)) * sqrt(($nVarX) / (n*n))) END"

  /** Population excess kurtosis: m4 / m2² − 3; NULL on degeneracy. */
  val kurtPopF = s"CASE WHEN $degX THEN NULL ELSE " +
    "((n*n*n*sxxxx - 4*n*n*sx*sxxx + 6*n*sx*sx*sxx - 3*sx*sx*sx*sx) " +
    s"/ (n*n*n*n)) / ((($nVarX) / (n*n)) * (($nVarX) / (n*n))) - 3.0 END"

  /** Pearson correlation; NULL when either side degenerates. */
  val corrF = s"CASE WHEN $degX OR $degY THEN NULL ELSE " +
    s"(n*sxy - sx*sy) / (sqrt($nVarX) * sqrt($nVarY)) END"

  /** Ordinary-least-squares y = slope·x + intercept; NULL slope (and
    * so NULL intercept/r²) when x degenerates. */
  val slopeF = s"CASE WHEN $degX THEN NULL ELSE " +
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
    * the fixed grains (see [[powerSumsExactSql]] for the mirrored text). */
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
        sum(x * y).cast("decimal(32,4)").as("dsxy"),
        // exact constant-column witnesses (see the guard note above)
        min(x).cast("decimal(9,2)").as("dmnx"),
        max(x).cast("decimal(9,2)").as("dmxx"),
        min(y).cast("decimal(12,2)").as("dmny"),
        max(y).cast("decimal(12,2)").as("dmxy"))
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
      sum("dsxy").cast("decimal(32,4)").as("dsxy"),
      min("dmnx").cast("decimal(9,2)").as("dmnx"),
      max("dmxx").cast("decimal(9,2)").as("dmxx"),
      min("dmny").cast("decimal(12,2)").as("dmny"),
      max("dmxy").cast("decimal(12,2)").as("dmxy"))
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
      col("dsxy").cast("double").as("sxy"),
      // witnesses compared as DECIMALS (exact) — carried through
      col("dmnx").as("mnx"), col("dmxx").as("mxx"),
      col("dmny").as("mny"), col("dmxy").as("mxy")): _*)

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
       |       CAST(sum(x*y) AS DECIMAL(32,4)) AS dsxy,
       |       CAST(min(x) AS DECIMAL(9,2)) AS dmnx,
       |       CAST(max(x) AS DECIMAL(9,2)) AS dmxx,
       |       CAST(min(y) AS DECIMAL(12,2)) AS dmny,
       |       CAST(max(y) AS DECIMAL(12,2)) AS dmxy
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
       |       CAST(sum(dsxy) AS DECIMAL(32,4)) AS dsxy,
       |       CAST(min(dmnx) AS DECIMAL(9,2)) AS dmnx,
       |       CAST(max(dmxx) AS DECIMAL(9,2)) AS dmxx,
       |       CAST(min(dmny) AS DECIMAL(12,2)) AS dmny,
       |       CAST(max(dmxy) AS DECIMAL(12,2)) AS dmxy
       |FROM $sumsRel""".stripMargin

  /** Mirror of the double-cast working frame over a sums relation. */
  def doubleFrameSqlCols: String =
    """CAST(cnt AS DOUBLE) AS n,
      |CAST(dsx AS DOUBLE) AS sx, CAST(dsxx AS DOUBLE) AS sxx,
      |CAST(dsxxx AS DOUBLE) AS sxxx, CAST(dsxxxx AS DOUBLE) AS sxxxx,
      |CAST(dsy AS DOUBLE) AS sy, CAST(dsyy AS DOUBLE) AS syy,
      |CAST(dsxy AS DOUBLE) AS sxy,
      |dmnx AS mnx, dmxx AS mxx, dmny AS mny, dmxy AS mxy""".stripMargin

  /** Pearson chi-squared test of independence between two categorical
    * columns, plus Cramér's V — the categorical sibling of [[corrF]]
    * (is the language mix independent of the source? — a drift check
    * a corpus pipeline runs per ingest). The full r×c grid is summed,
    * zero-observed cells included ((0−E)²/E = E). Determinism: each
    * cell's term is IEEE-deterministic ((O−E)²/E over exact counts),
    * but their SUM order would not be — so terms FLOOR-quantize to 1e-6
    * (floor of the same double is the same long on every engine; no
    * rounding-tie semantics to align) and sum EXACTLY as longs; the
    * total is a pure multiset function. Rows with a NULL in either
    * category drop from the whole test.
    * Scale: one count aggregation per axis + one over pairs; the grid
    * itself is category-cardinality (tiny) rows. */
  /** Shared contingency scaffold for [[chiSquare]] and [[mutualInfo]]:
    * rows with a NULL in EITHER category drop from the whole test —
    * keeping them only in the axis totals (a naive groupBy) would
    * inflate expectations against an unmatched observed cell (the
    * NULL-key equi-join never matches), silently skewing the
    * statistic. Returns (observed cells, a-totals, b-totals, n). */
  private def contingency(df: DataFrame, aCol: String, bCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val base = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
    (base.groupBy(aCol, bCol).agg(count(lit(1)).as("o")),
      base.groupBy(aCol).agg(count(lit(1)).as("ra")),
      base.groupBy(bCol).agg(count(lit(1)).as("cb")),
      base.agg(count(lit(1)).as("nn")))
  }

  /** The SQL twin of [[contingency]]: the CTE prefix both mirrors
    * share (`base`/`obs`/`atot`/`btot`/`tot`). */
  private def contingencySql(table: String, aCol: String,
      bCol: String): String =
    s"""base AS (
       |  SELECT $aCol, $bCol FROM $table
       |  WHERE $aCol IS NOT NULL AND $bCol IS NOT NULL
       |), obs AS (
       |  SELECT $aCol, $bCol, count(*) AS o FROM base GROUP BY 1, 2
       |), atot AS (SELECT $aCol, count(*) AS ra FROM base GROUP BY 1),
       |btot AS (SELECT $bCol, count(*) AS cb FROM base GROUP BY 1),
       |tot AS (SELECT count(*) AS nn FROM base)""".stripMargin

  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val (obs, aTot, bTot, n) = contingency(df, aCol, bCol)
    val grid = aTot.crossJoin(bTot).crossJoin(broadcast(n))
      .join(obs, Seq(aCol, bCol), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val e = col("ra").cast("double") * col("cb").cast("double") /
      col("nn").cast("double")
    val term = (col("o").cast("double") - e) * (col("o").cast("double") - e) / e
    // FLOOR-quantized to 1e-6 (not round(): Spark rounds the shortest
    // decimal rendering, DuckDB the true binary value — near-tie terms
    // could disagree; floor of the same double is the same long
    // everywhere), then summed EXACTLY as longs — order-independent
    val cells = grid.select(
      floor(term * lit(1000000.0)).as("t6"),
      col("nn"))
    val r = aTot.agg(count(lit(1)).as("r"))
    val c = bTot.agg(count(lit(1)).as("c"))
    cells.groupBy()
      .agg((sum(col("t6")).cast("double") / lit(1000000.0)).as("chi2"),
        max(col("nn")).as("n_rows"))
      .crossJoin(broadcast(r)).crossJoin(broadcast(c))
      .select(
        col("chi2"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        col("n_rows"),
        // single-category axes make the test vacuous (dof 0) — NULL,
        // per the module's degenerate convention, not a zero division
        when(least(col("r") - 1, col("c") - 1) === 0, lit(null))
          .otherwise(sqrt(col("chi2") / (col("n_rows").cast("double") *
            least(col("r") - 1, col("c") - 1).cast("double"))))
          .as("cramers_v"))
  }

  /** DuckDB mirror of [[chiSquare]] — same null-drop, same floor
    * quantization, same vacuous-test guard. */
  def chiSquareSql(table: String, aCol: String, bCol: String): String =
    s"""WITH ${contingencySql(table, aCol, bCol)},
       |grid AS (
       |  SELECT a.$aCol, b.$bCol, a.ra, b.cb, t.nn,
       |         COALESCE(o.o, 0) AS o
       |  FROM atot a CROSS JOIN btot b CROSS JOIN tot t
       |  LEFT JOIN obs o ON o.$aCol = a.$aCol AND o.$bCol = b.$bCol
       |), cells AS (
       |  SELECT nn,
       |         CAST(floor(
       |           (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE)*CAST(cb AS DOUBLE)/CAST(nn AS DOUBLE))
       |           * (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE)*CAST(cb AS DOUBLE)/CAST(nn AS DOUBLE))
       |           / (CAST(ra AS DOUBLE)*CAST(cb AS DOUBLE)/CAST(nn AS DOUBLE))
       |           * 1000000.0) AS BIGINT) AS t6
       |  FROM grid
       |), dims AS (
       |  SELECT (SELECT count(*) FROM atot) AS r,
       |         (SELECT count(*) FROM btot) AS c
       |)
       |SELECT CAST(sum(t6) AS DOUBLE) / 1000000.0 AS chi2,
       |       CAST((d.r - 1) * (d.c - 1) AS BIGINT) AS dof,
       |       max(nn) AS n_rows,
       |       CASE WHEN LEAST(d.r - 1, d.c - 1) = 0 THEN NULL
       |            ELSE sqrt((CAST(sum(t6) AS DOUBLE) / 1000000.0) /
       |                      (CAST(max(nn) AS DOUBLE) *
       |                       CAST(LEAST(d.r - 1, d.c - 1) AS DOUBLE)))
       |       END AS cramers_v
       |FROM cells, dims d
       |GROUP BY d.r, d.c""".stripMargin

  /** MUTUAL INFORMATION between two categorical columns (nats) — the
    * information-theoretic sibling of [[chiSquare]]: how many nats
    * does knowing the source tell you about the language? Only
    * observed cells contribute (0·ln0 = 0 by continuity), NULL-
    * category rows drop like chiSquare's. Determinism: each term
    * carries one `ln` (libm — typically 1-ulp-exact, not guaranteed),
    * so terms FLOOR-quantize at 1e-9 and sum exactly as longs; a
    * 1-ulp ln drift moves a term across a quantization boundary with
    * probability ~1e-8 — the same accepted grain as the repo's other
    * libm mirrors. */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val (obs, aTot, bTot, n) = contingency(df, aCol, bCol)
    val cells = obs.join(aTot, Seq(aCol)).join(bTot, Seq(bCol))
      .crossJoin(broadcast(n))
    val o = col("o").cast("double")
    val term = (o / col("nn").cast("double")) *
      log(o * col("nn").cast("double") /
        (col("ra").cast("double") * col("cb").cast("double")))
    cells.select(floor(term * lit(1000000000.0)).as("t9"),
        col("nn"))
      .groupBy()
      .agg((sum(col("t9")).cast("double") / lit(1000000000.0))
          .as("mi_nats"),
        max(col("nn")).as("n_rows"),
        count(lit(1)).as("n_cells"))
  }

  /** DuckDB mirror of [[mutualInfo]]. */
  def mutualInfoSql(table: String, aCol: String, bCol: String): String =
    s"""WITH ${contingencySql(table, aCol, bCol)},
       |cells AS (
       |  SELECT CAST(floor(
       |           (CAST(o.o AS DOUBLE) / CAST(t.nn AS DOUBLE)) *
       |           ln(CAST(o.o AS DOUBLE) * CAST(t.nn AS DOUBLE) /
       |              (CAST(a.ra AS DOUBLE) * CAST(b.cb AS DOUBLE)))
       |           * 1000000000.0) AS BIGINT) AS t9,
       |         t.nn
       |  FROM obs o
       |  JOIN atot a ON o.$aCol = a.$aCol
       |  JOIN btot b ON o.$bCol = b.$bCol
       |  CROSS JOIN tot t
       |)
       |SELECT CAST(sum(t9) AS DOUBLE) / 1000000000.0 AS mi_nats,
       |       max(nn) AS n_rows,
       |       count(*) AS n_cells
       |FROM cells""".stripMargin

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
