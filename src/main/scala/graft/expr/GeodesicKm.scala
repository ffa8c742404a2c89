package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

/** Native Catalyst expression: `geodesic_km(lat1, lon1, lat2, lon2)`.
  *
  * Whole-stage-codegen'd (the generated code is a single static call into
  * [[Geodesic.inverseKm]]), so the distance column stays inside the same
  * codegen stage as the surrounding cross join / projection — no UDF
  * serialization, no codegen fence. This matters at 100 TB: the distance is
  * evaluated once per joined row in the hot loop.
  *
  * Semantics match the reference's geopy geodesic call
  * (`/root/reference/pipelines/stations.py:18-22`): WGS-84 ellipsoidal
  * inverse distance in kilometers, null if any input is null.
  */
case class GeodesicKm(lat1: Expression, lon1: Expression, lat2: Expression, lon2: Expression)
    extends QuaternaryExpression {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2

  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    lat1.nullable || lon1.nullable || lat2.nullable || lon2.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.zipWithIndex.collectFirst {
      case (c, i) if c.dataType != DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"geodesic_km argument ${i + 1} must be DOUBLE, got ${c.dataType.sql}")
    }
    bad.getOrElse(org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess)
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    Geodesic.inverseKm(
      a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.expr.Geodesic.inverseKm($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(lat1 = newFirst, lon1 = newSecond, lat2 = newThird, lon2 = newFourth)

  override def prettyName: String = "geodesic_km"
}

object GeodesicKm {
  def apply(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    toCol(GeodesicKm(toExpr(lat1), toExpr(lon1), toExpr(lat2), toExpr(lon2)))
}
