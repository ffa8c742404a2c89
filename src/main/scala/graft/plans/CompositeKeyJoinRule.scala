package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter,
  HintInfo, Join, JoinHint, LogicalPlan, NO_BROADCAST_HASH, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{
  DataSourceV2Relation, DataSourceV2ScanRelation}

import graft.sources.{GraftAnalyze, GraftParquetTable}

/** COMPOSITE-KEY join sizing (round 14) — the estimation hole
  * per-column statistics cannot close: Spark's join estimation prices
  * a multi-key equi-join by its MOST SELECTIVE single key (the
  * conservative anti-underestimation rule), so two INDEPENDENT keys
  * like (start_station, end_station) — whose true tuple NDV is near
  * ndv(start)·ndv(end), far above either column's — make the join
  * output look |single-key| big where it is actually tuple-NDV small:
  * a broadcastable intermediate prices at megabytes and the parent
  * join needlessly shuffles. (A correlated pair is the safe direction
  * under min-card estimation, but an approximate tuple NDV still
  * catches a too-small estimate when column stats have drifted.)
  *
  * `CALL system.analyze(table, key_sets => 'a,b')` persists the TRUE
  * tuple NDV ([[GraftAnalyze]] `keyNdv`). This rule serves it where
  * Spark has no native channel: for every inner join side that
  * CONTAINS a composite-key equi-join over declared key sets, it
  * re-prices that join honestly — rows = |L|·|R| / max(tupleNdv) —
  * and pins the side's strategy where the honest price disagrees with
  * the planner's: `BROADCAST` when the honest size clears HALF the
  * broadcast threshold (the 2x margin covers HLL error) while the
  * planner's estimate would shuffle, `NO_BROADCAST_HASH` when the
  * honest size exceeds the threshold. The honest price uses FULL-table
  * row counts, so it is an upper bound under any filters — the
  * broadcast pin can only under-trigger, never OOM. It never
  * overrides a user's explicit strategy hint and touches only joins
  * whose keys resolve un-renamed to graft scans with declared stats —
  * surgical by construction.
  */
object CompositeKeyJoinRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return plan // broadcasts disabled: nothing to pin
    plan transformUp {
      case j @ Join(l, r, Inner, _, hint)
          if hint.leftHint.forall(_.strategy.isEmpty) ||
             hint.rightHint.forall(_.strategy.isEmpty) =>
        val newLeft =
          if (hint.leftHint.exists(_.strategy.isDefined)) hint.leftHint
          else pin(l, hint.leftHint, threshold)
        val newRight =
          if (hint.rightHint.exists(_.strategy.isDefined)) hint.rightHint
          else pin(r, hint.rightHint, threshold)
        if ((newLeft eq hint.leftHint) && (newRight eq hint.rightHint)) j
        else j.copy(hint = JoinHint(newLeft, newRight))
    }
  }

  /** Strategy pin for `side` iff it contains a declared composite-key
    * join whose honest output size disagrees with the planner's
    * estimate of the side.
    *
    * The BROADCAST pin additionally requires the priced join to BOUND
    * the side: it must be the side root, or reachable from it through
    * row-preserving/reducing nodes only (Project/Filter). Any
    * row-multiplying operator in between (Generate/explode, Expand,
    * Union, grouping sets) makes the side arbitrarily larger than the
    * priced join, and a forced broadcast there could OOM the driver —
    * exactly the "can only under-trigger, never OOM" guarantee this
    * guard preserves. NO_BROADCAST_HASH carries no such risk (it only
    * forbids a broadcast), so it keeps the anywhere-in-subtree match. */
  private def pin(side: LogicalPlan, existing: Option[HintInfo],
      threshold: Long): Option[HintInfo] = {
    val honest = side.collectFirst {
      case inner @ Join(il, ir, Inner, Some(cond), _)
          if honestBytes(inner, il, ir, cond).isDefined =>
        honestBytes(inner, il, ir, cond).get
    }
    honest match {
      case Some(hb) if hb > BigInt(threshold) =>
        Some(existing.getOrElse(HintInfo())
          .copy(strategy = Some(NO_BROADCAST_HASH)))
      case Some(hb) if hb * 2 <= BigInt(threshold) &&
          side.stats.sizeInBytes > BigInt(threshold) &&
          pricedJoinBoundsSide(side) =>
        // the planner would shuffle a side the tuple NDV proves tiny
        Some(existing.getOrElse(HintInfo())
          .copy(strategy = Some(BROADCAST)))
      case _ => existing
    }
  }

  /** True iff the first honest-priceable composite-key join sits at
    * the side root below only Project/Filter nodes — the condition
    * under which its honest output size upper-bounds the side's. */
  private def pricedJoinBoundsSide(side: LogicalPlan): Boolean = {
    @scala.annotation.tailrec
    def descend(p: LogicalPlan): Boolean = p match {
      case j @ Join(il, ir, Inner, Some(cond), _)
          if honestBytes(j, il, ir, cond).isDefined => true
      case prj: Project => descend(prj.child)
      case f: Filter => descend(f.child)
      case _ => false
    }
    descend(side)
  }

  /** Honest output size of a composite-key equi-join, from declared
    * tuple NDVs; None when the shape doesn't match (not ≥2 equi-keys,
    * keys renamed, no graft scan, no declared key set). */
  private def honestBytes(j: Join, l: LogicalPlan, r: LogicalPlan,
      cond: Expression): Option[BigInt] = {
    val eqs = splitConjuncts(cond).collect {
      case EqualTo(a: Attribute, b: Attribute) => (a, b)
    }
    if (eqs.size < 2) return None
    val lOut = l.outputSet
    val (lKeys, rKeys) = eqs.map { case (a, b) =>
      if (lOut.contains(a)) (a, b) else (b, a)
    }.unzip
    if (!lKeys.forall(lOut.contains) ||
        !rKeys.forall(r.outputSet.contains)) return None
    val lStat = declaredNdv(l, lKeys)
    val rStat = declaredNdv(r, rKeys)
    if (lStat.isEmpty && rStat.isEmpty) return None
    // each side's row count: its own ANALYZE row count when declared,
    // else the plan's CBO estimate — both must exist to price the join
    def rowsOf(p: LogicalPlan, s: Option[(Long, Long)]): Option[BigInt] =
      s.map { case (rows, _) => BigInt(rows) }
        .orElse(p.stats.rowCount)
    for {
      lRows <- rowsOf(l, lStat)
      rRows <- rowsOf(r, rStat)
    } yield {
      val ndv = BigInt(math.max(
        lStat.map(_._2).getOrElse(1L), rStat.map(_._2).getOrElse(1L)))
        .max(BigInt(1))
      val rows = lRows * rRows / ndv
      val width = j.output.map(_.dataType.defaultSize).sum + 8
      rows * width
    }
  }

  /** (tableRows, tupleNdv) when `keys` pass through Project/Filter
    * UN-RENAMED to one graft scan whose persisted stats declare the
    * key set. */
  private def declaredNdv(p: LogicalPlan, keys: Seq[Attribute])
      : Option[(Long, Long)] = {
    val ids = keys.map(_.exprId).toSet
    val scan = p.collectFirst {
      case s: DataSourceV2ScanRelation
          if ids.subsetOf(s.outputSet.map(_.exprId).toSet) => s
      case s: DataSourceV2Relation
          if ids.subsetOf(s.outputSet.map(_.exprId).toSet) => s
    }
    // reject if any node between p and the scan re-ALIASES a key: the
    // name we look up in the stats would no longer be the scan column
    val renamed = p.collectFirst {
      case prj: Project if prj.projectList.exists {
        case a: Alias => ids.contains(a.exprId)
        case _ => false
      } => prj
    }.isDefined
    if (renamed) return None
    val table = scan.flatMap {
      case s: DataSourceV2ScanRelation => s.relation.table match {
        case t: GraftParquetTable => Some(t.tablePath)
        case _ => None
      }
      case s: DataSourceV2Relation => s.table match {
        case t: GraftParquetTable => Some(t.tablePath)
        case _ => None
      }
      case _ => None
    }
    for {
      path <- table
      stats <- GraftAnalyze.read(path)
      ndv <- stats.keyNdv.get(keys.map(_.name).sorted)
    } yield (stats.rows, ndv)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}
