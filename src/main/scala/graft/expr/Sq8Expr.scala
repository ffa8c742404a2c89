package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static kernels for SQ8 scalar quantization (the `IndexScalarQuantizer`
  * leg of the ANN family — per-dimension linear quantization to 8-bit
  * codes, 4× compression at float32). Every operation is plain IEEE
  * double arithmetic in index order — NO libm beyond correctly-rounded
  * sqrt/divide — so unlike PQ's trained-float ADC the whole scoring
  * chain is bit-reproducible by a SQL oracle replaying the same
  * formulas ([[graft.VectorQueries]]'s `q_ann_sq8_topk` is
  * hash-checked, not rows-only).
  *
  * Quantization grid: code_i = round((x_i − mn_i)·255 / (mx_i − mn_i))
  * with mn/mx the per-dimension corpus min/max (floats, exact);
  * a constant dimension (mx = mn) encodes to 0 and reconstructs to mn.
  * Reconstruction: x̂_i = mn_i + (code_i · (mx_i − mn_i)) / 255. */
object Sq8Kernels {

  private def nullElement(i: Int): Nothing =
    throw new IllegalArgumentException(
      s"null vector element at index $i — corrupt embedding row")

  def encode(v: ArrayData, mn: Array[Float], mx: Array[Float]): ArrayData = {
    val n = v.numElements()
    require(n == mn.length,
      s"sq8_encode: vector dim $n != trained dim ${mn.length}")
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) nullElement(i)
      val mnD = mn(i).toDouble
      val mxD = mx(i).toDouble
      out(i) =
        if (mxD == mnD) 0L
        // round = HALF_UP on the nonnegative range (x ≥ mn) — the same
        // result DuckDB's round() produces, so the oracle re-encodes
        // identically
        else math.round((v.getFloat(i).toDouble - mnD) * 255.0 / (mxD - mnD))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric dot: EXACT query floats against the dequantized corpus
    * codes — Σ q_i · (mn_i + (c_i · (mx_i − mn_i)) / 255), double
    * accumulation in index order. */
  def dot(codes: ArrayData, q: ArrayData, mn: Array[Float],
      mx: Array[Float]): Double = {
    val n = codes.numElements()
    require(n == mn.length,
      s"sq8_dot: code dim $n != trained dim ${mn.length}")
    require(n == q.numElements(),
      s"sq8_dot: code dim $n != query dim ${q.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i) || q.isNullAt(i)) nullElement(i)
      val mnD = mn(i).toDouble
      val mxD = mx(i).toDouble
      val d = mnD + (codes.getLong(i).toDouble * (mxD - mnD)) / 255.0
      s += q.getFloat(i).toDouble * d
      i += 1
    }
    s
  }
}

/** `sq8_encode(array<float>) -> array<bigint>` — per-dimension linear
  * quantization against the baked-in corpus min/max grid. Codegen'd:
  * encode runs once per corpus row inside the scan projection. */
case class Sq8Encode(child: Expression, mn: Seq[Float], mx: Seq[Float])
    extends UnaryExpression {
  require(mn.nonEmpty && mn.length == mx.length,
    s"sq8_encode: bad grid dims ${mn.length}/${mx.length}")
  @transient private lazy val mnArr: Array[Float] = mn.toArray
  @transient private lazy val mxArr: Array[Float] = mx.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq8_encode requires ARRAY<FLOAT>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sq8_encode"

  override protected def nullSafeEval(v: Any): Any =
    Sq8Kernels.encode(v.asInstanceOf[ArrayData], mnArr, mxArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("mn", mnArr, "float[]")
    val mxRef = ctx.addReferenceObj("mx", mxArr, "float[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expr.Sq8Kernels.encode($v, $mnRef, $mxRef);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object Sq8Encode {
  def apply(v: Column, mn: Array[Float], mx: Array[Float]): Column =
    toCol(Sq8Encode(toExpr(v), mn.toSeq, mx.toSeq))
}

/** `sq8_dot(codes array<bigint>, q array<float>) -> double` — the
  * asymmetric reconstruction dot for one (corpus row, query) pair;
  * stays inside whole-stage codegen like [[DotProduct]]. */
case class Sq8Dot(left: Expression, right: Expression, mn: Seq[Float],
    mx: Seq[Float]) extends BinaryExpression {
  require(mn.nonEmpty && mn.length == mx.length,
    s"sq8_dot: bad grid dims ${mn.length}/${mx.length}")
  @transient private lazy val mnArr: Array[Float] = mn.toArray
  @transient private lazy val mxArr: Array[Float] = mx.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq8_dot requires (ARRAY<BIGINT>, ARRAY<FLOAT>), got " +
          s"(${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_dot"

  override protected def nullSafeEval(codes: Any, q: Any): Any =
    Sq8Kernels.dot(codes.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData],
      mnArr, mxArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("mn", mnArr, "float[]")
    val mxRef = ctx.addReferenceObj("mx", mxArr, "float[]")
    nullSafeCodeGen(ctx, ev, (c, q) =>
      s"${ev.value} = graft.expr.Sq8Kernels.dot($c, $q, $mnRef, $mxRef);")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object Sq8Dot {
  def apply(codes: Column, q: Column, mn: Array[Float],
      mx: Array[Float]): Column =
    toCol(Sq8Dot(toExpr(codes), toExpr(q), mn.toSeq, mx.toSeq))
}
