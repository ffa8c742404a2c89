package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011):
  *
  *  - [[PqLut]] builds a query's asymmetric-distance lookup table
  *    against the trained codebooks — lut[b·ksub + c] = dot(q_b,
  *    codebook_b[c]) — INSIDE the plan, so query batches of any size
  *    stay distributed (no driver-side per-query work);
  *  - [[PqAdc]] sums the table entries the corpus row's codes select:
  *    Σ_b lut[b·ksub + codes_b] ≈ dot(q, reconstruction(v)).
  *
  * Both are codegen'd through static kernels ([[PqKernels]]), the
  * [[CentroidKernels]] convention: the codebook matrix rides into
  * generated code as a reference object (m·ksub·dsub floats,
  * model-scale), accumulation is double in index order. */
object PqKernels {

  /** lut[b*ksub + c] = <q restricted to block b, books(b)(c)>. */
  def lut(q: ArrayData, books: Array[Array[Array[Float]]]): ArrayData = {
    val m = books.length
    val ksub = books(0).length
    val dsub = books(0)(0).length
    require(q.numElements() == m * dsub,
      s"pq_lut: query dim ${q.numElements()} != m*dsub = ${m * dsub}")
    val out = new Array[Double](m * ksub)
    var b = 0
    while (b < m) {
      var c = 0
      while (c < ksub) {
        val cv = books(b)(c)
        var s = 0.0
        var i = 0
        while (i < dsub) {
          s += q.getFloat(b * dsub + i).toDouble * cv(i)
          i += 1
        }
        out(b * ksub + c) = s
        c += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Σ_b lut[b*ksub + codes(b)] — the ADC inner-product estimate. */
  def adc(codes: ArrayData, lut: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    require(lut.numElements() == m * ksub,
      s"pq_adc: lut length ${lut.numElements()} != m*ksub = ${m * ksub}")
    var s = 0.0
    var b = 0
    while (b < m) {
      val c = codes.getLong(b).toInt
      require(c >= 0 && c < ksub, s"pq_adc: code $c out of [0, $ksub)")
      s += lut.getDouble(b * ksub + c)
      b += 1
    }
    s
  }
}

/** `pq_lut(array<float>) -> array<double>` — the query's ADC lookup
  * table against the baked-in codebooks. */
case class PqLut(child: Expression, books: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {
  @transient private lazy val booksArr: Array[Array[Array[Float]]] =
    books.iterator.map(_.iterator.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) =>
      if (books.isEmpty || books.exists(_.isEmpty))
        TypeCheckResult.TypeCheckFailure("pq_lut: empty codebooks")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut requires ARRAY<FLOAT>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(v: Any): Any =
    PqKernels.lut(v.asInstanceOf[ArrayData], booksArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", booksArr, "float[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expr.PqKernels.lut($v, $ref);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object PqLut {
  def apply(v: Column, books: Array[Array[Array[Float]]]): Column =
    toCol(PqLut(toExpr(v), books.map(_.map(_.toSeq).toSeq).toSeq))
}

/** `pq_adc(codes array<bigint>, lut array<double>) -> double` — the
  * asymmetric inner-product estimate for one (query, corpus row)
  * pair. */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) if ksub > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (ARRAY<BIGINT>, ARRAY<DOUBLE>), got " +
          s"(${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    PqKernels.adc(codes.asInstanceOf[ArrayData],
      lut.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) =>
      s"${ev.value} = graft.expr.PqKernels.adc($c, $l, $ksub);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object PqAdc {
  def apply(codes: Column, lut: Column, ksub: Int): Column =
    toCol(PqAdc(toExpr(codes), toExpr(lut), ksub))
}
