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

  private val sumsCte = Moments.powerSumsSql(
    "lineitem", "l_quantity", "l_extendedprice", "l_returnflag")

  /** Per-flag distribution shape of quantity + its correlation with
    * extended price. A merge-order drift anywhere in the sums, or a
    * formula-tree mismatch, breaks the unrounded hash. */
  val qMomentStats = QueryDef("q_moment_stats",
    (spark, dir) => Moments.momentStats(
      Tables.lineitem(spark, dir), Seq("l_returnflag"), x, y)
      .orderBy("l_returnflag"),
    Some(s"""WITH sums AS ($sumsCte)
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
    Some(s"""WITH sums AS ($sumsCte)
            |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
            |       ${Moments.slopeF} AS slope,
            |       ${Moments.interceptF} AS intercept,
            |       ${Moments.r2F} AS r2
            |FROM sums ORDER BY l_returnflag""".stripMargin))

  def all: Seq[QueryDef] = Seq(qMomentStats, qLinearProbe)
}
