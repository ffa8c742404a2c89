package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static kernels for vector math over Spark `ArrayData`, shared by the
  * interpreted and codegen paths. Accumulation is in double, in index
  * order — deterministic, and exactly reproducible by an oracle engine
  * summing the same list in order. */
object VectorKernels {
  /** Mismatched dimensions are a data bug (corrupt row, model
    * migration) — fail loudly rather than silently comparing a prefix
    * and returning a plausible-but-wrong similarity. */
  private def checkDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"vector dimension mismatch: $n vs ${b.numElements()}")
    n
  }

  /** Null ELEMENTS are a data bug too: `UnsafeArrayData.getFloat` would
    * silently read a null slot as 0.0 and yield a plausible-but-wrong
    * similarity — same fail-loudly doctrine as the dimension check. The
    * bit-test rides inside the main loop (never taken on clean data, so
    * branch prediction makes it ~free; a separate validation pass would
    * double the kernel's memory traffic). */
  private def nullElement(i: Int): Nothing =
    throw new IllegalArgumentException(
      s"null vector element at index $i — corrupt embedding row")

  def cosineFF(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElement(i)
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElement(i)
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1
    }
    dot
  }

  def l2FF(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElement(i)
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    math.sqrt(s)
  }
}

/** Base for binary float-vector expressions: both children must be
  * `array<float>`; null-in → null-out; codegen is a single static call, so
  * the similarity stays inside whole-stage codegen (critical for the
  * brute-force top-k join at scale — it runs once per candidate pair). */
abstract class FloatVecBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  /** Fully-qualified static method implementing the kernel. */
  protected def kernel: String

  override protected def nullSafeEval(a: Any, b: Any): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $kernel($a, $b);")
}

/** `cosine_sim(array<float>, array<float>) -> double` */
case class CosineSim(left: Expression, right: Expression) extends FloatVecBinary {
  override protected def kernel: String = "graft.expr.VectorKernels.cosineFF"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** `dot_product(array<float>, array<float>) -> double` */
case class DotProduct(left: Expression, right: Expression) extends FloatVecBinary {
  override protected def kernel: String = "graft.expr.VectorKernels.dotFF"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** `l2_distance(array<float>, array<float>) -> double` */
case class L2Distance(left: Expression, right: Expression) extends FloatVecBinary {
  override protected def kernel: String = "graft.expr.VectorKernels.l2FF"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.l2FF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "l2_distance"
}

object CosineSim {
  def apply(a: Column, b: Column): Column = toCol(CosineSim(toExpr(a), toExpr(b)))
}
object DotProduct {
  def apply(a: Column, b: Column): Column = toCol(DotProduct(toExpr(a), toExpr(b)))
}
object L2Distance {
  def apply(a: Column, b: Column): Column = toCol(L2Distance(toExpr(a), toExpr(b)))
}
