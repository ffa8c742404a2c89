package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static kernels for nearest-centroid search against a DRIVER-SIDE
  * centroid matrix (`float[][]`). The matrix rides into generated code as
  * a codegen reference object — on a cluster it is serialized once per
  * task with the expression tree (k·dim floats, model-scale), so
  * assignment is a pure map-side scan: no join, no exchange, no corpus
  * row ever leaves its partition. This is the shuffle-free Lloyd
  * assignment step MLlib's KMeans uses, expressed as a Catalyst kernel so
  * it stays inside whole-stage codegen.
  *
  * Accumulation is double, in index order (same convention as
  * [[VectorKernels]]); ties broken by ARRAY ORDER (strict `<`), so
  * callers who keep the matrix sorted by centroid id get the engine-wide
  * (distance, cid) lexicographic tie-break.
  */
object CentroidKernels {
  private def nullElement(i: Int): Nothing =
    throw new IllegalArgumentException(
      s"null vector element at index $i — corrupt embedding row")

  /** Squared L2 between an ArrayData vector and one centroid row. */
  private def d2(v: ArrayData, cv: Array[Float]): Double = {
    val n = v.numElements()
    require(n == cv.length,
      s"vector dimension mismatch: $n vs centroid ${cv.length}")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) nullElement(i)
      val d = v.getFloat(i).toDouble - cv(i)
      s += d * d; i += 1
    }
    s
  }

  /** Index of the nearest centroid (squared L2, first-wins on ties). */
  def nearestIdx(v: ArrayData, cents: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = d2(v, cents(0))
    var c = 1
    while (c < cents.length) {
      val s = d2(v, cents(c))
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  /** Squared L2 to the nearest centroid (the per-point Lloyd objective
    * contribution). */
  def nearestD2(v: ArrayData, cents: Array[Array[Float]]): Double = {
    var bestD = d2(v, cents(0))
    var c = 1
    while (c < cents.length) {
      val s = d2(v, cents(c))
      if (s < bestD) bestD = s
      c += 1
    }
    bestD
  }
}

/** Base for unary expressions over `array<float>` scoring against a baked-in
  * centroid matrix. `cents` is part of case-class equality (Seq, structural),
  * so Catalyst canonicalization/dedup behave; the `float[][]` working copy
  * is a transient lazy val. */
abstract class CentroidScan extends UnaryExpression {
  /** Centroid matrix in tie-break order (see [[CentroidKernels]]).
    * Validated in [[checkInputDataTypes]], NOT the constructor — Java
    * deserialization re-runs superclass constructors with null fields. */
  def cents: Seq[Seq[Float]]

  @transient protected lazy val centsArr: Array[Array[Float]] =
    cents.iterator.map(_.toArray).toArray

  protected def checkMatrix(): Option[String] =
    if (cents.isEmpty) Some("centroid matrix must be non-empty") else None

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) =>
      checkMatrix().map(TypeCheckResult.TypeCheckFailure)
        .getOrElse(TypeCheckResult.TypeCheckSuccess)
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<FLOAT> argument, got ${other.sql}")
  }
}

/** `nearest_centroid_id(array<float>) -> bigint` — the id of the nearest
  * centroid under squared L2, tie-broken by the matrix order (callers keep
  * `cids` ascending so the tie-break is (distance, cid) lexicographic —
  * the same rule the previous aggregate-based assignment used). */
case class NearestCentroidId(child: Expression, cids: Seq[Long],
    cents: Seq[Seq[Float]]) extends CentroidScan {
  override protected def checkMatrix(): Option[String] =
    super.checkMatrix().orElse {
      if (cids.length != cents.length)
        Some(s"${cids.length} ids vs ${cents.length} centroids")
      else if (!cids.sliding(2).forall(w => w.length < 2 || w(0) < w(1)))
        Some("centroid ids must be strictly ascending (tie-break order)")
      else None
    }

  @transient private lazy val cidsArr: Array[Long] = cids.toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid_id"

  override protected def nullSafeEval(v: Any): Any =
    cidsArr(CentroidKernels.nearestIdx(v.asInstanceOf[ArrayData], centsArr))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centsArr, "float[][]")
    val cidsRef = ctx.addReferenceObj("cids", cidsArr, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $cidsRef[graft.expr.CentroidKernels.nearestIdx($v, $centsRef)];")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `nearest_centroid_d2(array<float>) -> double` — squared L2 to the
  * nearest centroid; `sum` of it over an assigned corpus is the Lloyd SSE
  * objective, computed without joining the centroids back. */
case class NearestCentroidD2(child: Expression,
    cents: Seq[Seq[Float]]) extends CentroidScan {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "nearest_centroid_d2"

  override protected def nullSafeEval(v: Any): Any =
    CentroidKernels.nearestD2(v.asInstanceOf[ArrayData], centsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centsArr, "float[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expr.CentroidKernels.nearestD2($v, $centsRef);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object NearestCentroidId {
  def apply(v: Column, cids: Array[Long], cents: Array[Array[Float]]): Column =
    toCol(NearestCentroidId(toExpr(v), cids.toSeq,
      cents.iterator.map(_.toSeq).toSeq))
}
object NearestCentroidD2 {
  def apply(v: Column, cents: Array[Array[Float]]): Column =
    toCol(NearestCentroidD2(toExpr(v), cents.iterator.map(_.toSeq).toSeq))
}
