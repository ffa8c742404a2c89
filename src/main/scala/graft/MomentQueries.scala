package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Moments

/** Order-independent statistical moments under the hash gate
  * ([[graft.operators.Moments]]): stddev/skewness/kurtosis/correlation
  * and closed-form OLS from decimal-exact power sums — UNROUNDED
  * doubles, because every op after the exact sums is IEEE-correctly-
  * rounded (+,−,×,÷,sqrt), so both engines produce identical bits from
  * the identical formula text. Spark's built-in corr/stddev/skewness
  * are deliberately NOT used: their float merge order follows the task
  * fan-out, which makes them non-reproducible at scale. */
object MomentQueries {

  private val x = col("l_quantity").cast("decimal(9,2)")
  private val y = col("l_extendedprice").cast("decimal(12,2)")

  /** Shared oracle scaffold: exact decimal partials, then the
    * double-cast working frame — the same two stages the Spark side
    * runs ([[Moments.powerSumsExact]] → doubleFrame). */
  private val sumsCte = Moments.powerSumsExactSql(
    "lineitem", "l_quantity", "l_extendedprice", "l_returnflag") match {
    case exact =>
      s"""exact_sums AS ($exact),
         |sums AS (SELECT l_returnflag, ${Moments.doubleFrameSqlCols}
         |         FROM exact_sums)""".stripMargin
  }

  /** Per-flag distribution shape of quantity + its correlation with
    * extended price. A merge-order drift anywhere in the sums, or a
    * formula-tree mismatch, breaks the unrounded hash. */
  val qMomentStats = QueryDef("q_moment_stats",
    (spark, dir) => Moments.momentStats(
      Tables.lineitem(spark, dir), Seq("l_returnflag"), x, y)
      .orderBy("l_returnflag"),
    Some(s"""WITH $sumsCte
            |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
            |       ${Moments.stddevPopF} AS stddev_x,
            |       ${Moments.skewPopF} AS skew_x,
            |       ${Moments.kurtPopF} AS kurt_x,
            |       ${Moments.corrF} AS corr_xy
            |FROM sums ORDER BY l_returnflag""".stripMargin))

  /** Closed-form OLS probe: extendedprice ~ quantity per return flag
    * (slope ≈ mean unit price, r² = linearity of the pricing model) —
    * the in-engine "fit a linear probe over corpus features" shape,
    * exactly re-derived by the oracle. */
  val qLinearProbe = QueryDef("q_linear_probe",
    (spark, dir) => Moments.linearFit(
      Tables.lineitem(spark, dir), Seq("l_returnflag"), x, y)
      .orderBy("l_returnflag"),
    Some(s"""WITH $sumsCte
            |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
            |       ${Moments.slopeF} AS slope,
            |       ${Moments.interceptF} AS intercept,
            |       ${Moments.r2F} AS r2
            |FROM sums ORDER BY l_returnflag""".stripMargin))

  /** Reaggregable moment partials — the sketch-partials pattern with
    * EXACT algebra: per-flag decimal power sums are stored once; the
    * ALL level re-aggregates the SUM ROWS by decimal addition (sums of
    * sums ≡ sums over the union, bit for bit — no loss to prove, it is
    * arithmetic). One corpus scan answers both levels; the per-flag
    * exchange must be reused by the ALL branch at runtime. */
  val qMomentRollup = QueryDef("q_moment_rollup",
    (spark, dir) => {
      val sums = Moments.powerSumsExact(
        Tables.lineitem(spark, dir), Seq("l_returnflag"), x, y)
      val perFlag = Moments.statsFromSums(sums, Seq("l_returnflag"))
      val allLevel = Moments.statsFromSums(
        Moments.mergeSums(sums, Nil), Nil)
        .select(lit("ALL").as("l_returnflag"), col("n_rows"),
          col("stddev_x"), col("skew_x"), col("kurt_x"), col("corr_xy"))
      perFlag.unionByName(allLevel).orderBy("l_returnflag")
    },
    Some {
      val exactCte = Moments.powerSumsExactSql(
        "lineitem", "l_quantity", "l_extendedprice", "l_returnflag")
      s"""WITH sums AS ($exactCte),
         |all_sums AS (${Moments.mergeSumsSql("sums")}),
         |lv1 AS (SELECT l_returnflag, ${Moments.doubleFrameSqlCols}
         |        FROM sums),
         |lv0 AS (SELECT 'ALL' AS l_returnflag, ${Moments.doubleFrameSqlCols}
         |        FROM all_sums),
         |both_levels AS (SELECT * FROM lv1 UNION ALL SELECT * FROM lv0)
         |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
         |       ${Moments.stddevPopF} AS stddev_x,
         |       ${Moments.skewPopF} AS skew_x,
         |       ${Moments.kurtPopF} AS kurt_x,
         |       ${Moments.corrF} AS corr_xy
         |FROM both_levels ORDER BY l_returnflag""".stripMargin
    })

  /** Chi-squared independence of language × source over the documents
    * corpus + Cramér's V — the per-ingest drift check (did the source
    * mix shift the language distribution?). Full r×c grid including
    * zero-observed cells; per-cell terms floor-quantized to 1e-6 then
    * EXACTLY summed, so the statistic is order-independent. */
  val qChi2 = QueryDef("q_chi2_lang_source",
    (spark, dir) => graft.operators.Moments.chiSquare(
      Tables.documents(spark, dir), "lang", "source"),
    Some(graft.operators.Moments.chiSquareSql("documents", "lang", "source")))

  /** Mutual information of language × source (nats) — the information-
    * theoretic companion of [[qChi2]]: the same grid, measured as
    * information gained instead of deviation from independence.
    * Observed cells only (0·ln0 = 0); terms floor-quantized at 1e-9
    * and exactly summed. */
  val qMutualInfo = QueryDef("q_mutual_info_lang_source",
    (spark, dir) => graft.operators.Moments.mutualInfo(
      Tables.documents(spark, dir), "lang", "source"),
    Some(graft.operators.Moments.mutualInfoSql(
      "documents", "lang", "source")))

  def all: Seq[QueryDef] =
    Seq(qMomentStats, qLinearProbe, qMomentRollup, qChi2, qMutualInfo)
}
