package graft

import org.apache.spark.sql.functions._
import graft.operators.StationDistances
import graft.core.Tables

/** GeodesicRadiusRule: the optimizer rewrite must (a) actually fire —
  * the cheap latitude bound appears in the optimized plan — and
  * (b) preserve results exactly vs the unoptimized filter. */
class RadiusRuleSpec extends SparkSpec {

  test("rule injects the latitude pre-filter into the optimized plan") {
    graft.core.GraftExtensions.registerFunctions(spark)
    val q = StationDistances.pairsWithinKm(
      Tables.stationsById(spark, sfDir), "id", 15.0)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("* 109.0"),
      s"latitude bound not injected:\n$optimized")
  }

  test("rule preserves results exactly (vs post-hoc filter on all pairs)") {
    graft.core.GraftExtensions.registerFunctions(spark)
    val viaRule = rows(StationDistances.pairsWithinKm(
      Tables.stationsById(spark, sfDir), "id", 15.0))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // ground truth: collect ALL pairs first (no radius predicate for the
    // rule to match), filter driver-side
    val all = rows(StationDistances.pairwise(
      Tables.stationsById(spark, sfDir), "id"))
      .filter(r => r.getDouble(2) <= 15.0 && r.getLong(0) != r.getLong(1))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaRule == all)
    assert(all.nonEmpty) // the synthetic grid has close neighbors
  }

  test("rule skips nondeterministic predicates (no double evaluation)") {
    graft.core.GraftExtensions.registerFunctions(spark)
    // jittered latitude: duplicating it into a pre-filter conjunct would
    // draw rand() twice and let the bound and the true predicate disagree
    val q = Tables.stationsById(spark, sfDir)
      .filter(expr("geodesic_km(latitude + rand() * 0.001, longitude, " +
        "CAST(51.0 AS DOUBLE), CAST(0.0 AS DOUBLE)) <= CAST(15.0 AS DOUBLE)"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("* 109.0"),
      s"bound must not be injected for a nondeterministic predicate:\n$optimized")
  }

  test("rule is idempotent (no duplicate bounds on re-optimization)") {
    graft.core.GraftExtensions.registerFunctions(spark)
    val q = StationDistances.pairsWithinKm(
      Tables.stationsById(spark, sfDir), "id", 15.0)
    val optimized = q.queryExecution.optimizedPlan.toString
    val firstIdx = optimized.indexOf("* 109.0")
    assert(firstIdx >= 0)
    assert(optimized.indexOf("* 109.0", firstIdx + 1) < 0,
      s"bound injected more than once:\n$optimized")
  }
}
