package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Hilbert curve kernels (D. Hilbert 1891; the iterative bit algorithm
  * is the public xy2d/d2xy form) — the locality-preserving sibling of
  * [[ZOrderKernels]]: map two bounded grid coordinates onto the
  * space-filling Hilbert index so that sorting by it clusters
  * 2-D-adjacent rows, like Morton order, but WITHOUT Morton's long
  * jumps — consecutive Hilbert indices are always grid NEIGHBORS
  * (|Δx| + |Δy| = 1, spec-asserted), so a file of consecutive indices
  * covers one connected rectangle-ish region rather than up to four
  * disconnected quadrant fragments. For min/max-pruned layouts that
  * means tighter per-file bounding boxes and fewer files touched per
  * range query — the reason Delta Lake added Hilbert beside ZORDER.
  *
  * The index is built by 16 quadrant steps: at each scale the quadrant
  * pair (rx, ry) contributes s²·((3·rx) XOR ry) and the remaining
  * coordinates are rotated/reflected into the sub-square's frame (the
  * Gray-code reflection). Every step is integer CASE arithmetic, so
  * the DuckDB oracle re-derives indices bit-for-bit through 16 chained
  * CTEs ([[HilbertIndex16.iterationSql]] emits them — ONE
  * implementation of the step, two engines). Coordinates are 16-bit;
  * the index fits 32 bits — no sign edge in either engine. */
object HilbertKernels {

  val N = 65536 // 2^16 grid

  /** (x, y) → Hilbert index d ∈ [0, 2³²). */
  def xy2d(x0: Long, y0: Long): Long = {
    require(x0 >= 0 && x0 < N && y0 >= 0 && y0 < N,
      s"hilbert16: coordinates must be in [0, $N), got ($x0, $y0)")
    var x = x0
    var y = y0
    var d = 0L
    var s = N / 2L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the REMAINING square into the child frame (reflection
      // across the full grid keeps x, y non-negative — the canonical
      // xy2d uses N here, d2xy uses the growing s)
      if (ry == 0L) {
        if (rx == 1L) {
          x = N - 1L - x
          y = N - 1L - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse: Hilbert index → (x, y). The spec uses it for bijectivity
    * and the neighbor-step property; a layout writer never needs it. */
  def d2xy(d: Long): (Long, Long) = {
    require(d >= 0 && d < N.toLong * N, s"hilbert16: index out of range: $d")
    var x = 0L
    var y = 0L
    var t = d
    var s = 1L
    while (s < N) {
      val rx = 1L & (t / 2L)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val tt = x; x = y; y = tt
      }
      x += s * rx
      y += s * ry
      t /= 4L
      s <<= 1
    }
    (x, y)
  }
}

/** `hilbert16(x bigint, y bigint) -> bigint` — the Hilbert index as a
  * codegen expression ([[InterleaveBits16]]'s sibling). Throws on
  * out-of-range coordinates: a silently masked coordinate would
  * scatter the cell and quietly destroy the pruning property. */
case class HilbertIndex16(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert16 requires (BIGINT, BIGINT), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertKernels.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.expr.HilbertKernels.xy2d($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hilbert16"
}

object HilbertIndex16 {
  def apply(x: Column, y: Column): Column =
    toCol(HilbertIndex16(toExpr(x), toExpr(y)))

  /** The 16 quadrant steps as chained DuckDB CTEs: `from`(id, x, y) →
    * `prefix`16(id, d) — the SQL mirror of [[HilbertKernels.xy2d]],
    * generated so both engines share one definition of the step. */
  def iterationSql(from: String, prefix: String): String = {
    val n1 = HilbertKernels.N - 1 // 65535
    val steps = (15 to 0 by -1).zipWithIndex.map { case (k, i) =>
      val s = 1L << k
      val src = if (i == 0) from else s"$prefix$i"
      // rx/ry from the bit at level s; rotation by CASE
      s"""$prefix${i + 1} AS (
         |  SELECT id,
         |    d + ${s * s} * xor(3 * ((x // $s) % 2), (y // $s) % 2) AS d,
         |    CASE WHEN (y // $s) % 2 = 1 THEN x
         |         WHEN (x // $s) % 2 = 1 THEN $n1 - y
         |         ELSE y END AS x,
         |    CASE WHEN (y // $s) % 2 = 1 THEN y
         |         WHEN (x // $s) % 2 = 1 THEN $n1 - x
         |         ELSE x END AS y
         |  FROM $src
         |)""".stripMargin
    }
    val init = s"""${prefix}1pre AS (
                  |  SELECT id, CAST(0 AS BIGINT) AS d, x, y FROM $from
                  |)""".stripMargin
    // splice the zero-d seed in front of step 1 by rewriting its source
    val first = steps.head.replace(s"FROM $from", s"FROM ${prefix}1pre")
    (init +: first +: steps.tail).mkString(",\n")
  }
}
