package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.expr.GeodesicKm

/** Optimizer rule: radius pre-filtering for geodesic distance predicates.
  *
  * `WHERE geodesic_km(lat1, lon1, lat2, lon2) <= r` forces the iterative
  * Vincenty kernel (~50–200ns) on EVERY candidate row — on a station×
  * station cross join that is n² evaluations. This rule conjoins a cheap,
  * SOUND bound first: the geodesic between two points is at least the
  * meridian arc of their latitude difference, and one degree of meridian
  * arc on WGS-84 is ≥ 110.57 km — so `|lat1−lat2| * 109.0 <= r` (margin
  * below the true minimum) keeps every true match while letting codegen
  * skip the Vincenty call for the overwhelming majority of distant pairs.
  * With a selective radius the surviving fraction is ~r/Δlat_span, e.g.
  * ~2% for a 2 km radius over a half-degree city — a 50× cut in kernel
  * work with two arithmetic ops per row.
  *
  * The added conjunct references both join sides, so predicate pushdown
  * turns it into the join condition of the BroadcastNestedLoopJoin —
  * evaluated before the expensive distance, same rows out. (This is the
  * ladder-step (c) extension point — `injectOptimizerRule` via
  * [[graft.core.GraftExtensions]] — used where composition can't help:
  * the optimization must see the PREDICATE, not the operator.)
  */
object GeodesicRadiusRule extends Rule[LogicalPlan] {

  /** Sound km-per-degree lower bound for meridian arc (true min 110.57). */
  val KmPerDegLatLowerBound = 109.0

  /** Marker to keep the rule idempotent across optimizer batches. */
  private def boundFor(g: GeodesicKm, r: Expression): Expression =
    LessThanOrEqual(
      Multiply(Abs(Subtract(g.lat1, g.lat2)), Literal(KmPerDegLatLowerBound)),
      r)

  private def alreadyBounded(cond: Expression, g: GeodesicKm): Boolean = {
    val marker = boundFor(g, Literal(0.0)) match {
      case LessThanOrEqual(m, _) => m
    }
    cond.exists {
      case LessThanOrEqual(m, _) => m.semanticEquals(marker)
      case _ => false
    }
  }

  // transformUp: a pre-order transform would re-descend into the freshly
  // built And(bound, orig) and wrap `orig` again, forever.
  // `orig.deterministic` guard: the bound DUPLICATES lat1/lat2 into a new
  // conjunct — evaluating a nondeterministic input (rand-jittered
  // coordinates, say) twice could pass the bound with one draw and the
  // true predicate with another, changing results; skip those.
  private def rewriteCond(cond: Expression): Expression = cond.transformUp {
    case orig @ LessThanOrEqual(g: GeodesicKm, r) if r.foldable &&
        orig.deterministic && !alreadyBounded(cond, g) =>
      And(boundFor(g, r), orig)
    case orig @ LessThan(g: GeodesicKm, r) if r.foldable &&
        orig.deterministic && !alreadyBounded(cond, g) =>
      And(boundFor(g, r), orig)
  }

  // By the time user rules run, predicate pushdown may have moved the
  // radius predicate from a Filter into a Join condition (it references
  // both sides of the cross join) — handle both shapes.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val rewritten = rewriteCond(cond)
      if (rewritten.fastEquals(cond)) f else Filter(rewritten, child)
    case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.isDefined =>
      val rewritten = rewriteCond(j.condition.get)
      if (rewritten.fastEquals(j.condition.get)) j
      else j.copy(condition = Some(rewritten))
  }
}
