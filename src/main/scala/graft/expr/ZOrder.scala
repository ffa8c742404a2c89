package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Morton / Z-order curve kernels (G.M. Morton, "A computer oriented
  * geodetic data base and a new technique in file sequencing", IBM 1966)
  * — interleave the bits of two bounded integer grid coordinates so that
  * sorting by the result clusters 2-D-adjacent rows into the same
  * neighborhoods of the sort order.
  *
  * Why this is a 100 TB feature: parquet prunes row groups by min/max
  * column statistics, but sorting by (x) alone leaves (y) unconstrained
  * per file — a 2-D range predicate still touches every file. Writing
  * Z-sorted bounds BOTH coordinates per file (each file covers a small
  * Morton range ≈ a few grid rectangles), so a lat/lon box query prunes
  * to the files whose rectangles intersect the box — the same layout
  * trick Delta/Iceberg expose as `OPTIMIZE ZORDER BY`, built here from
  * first principles. See [[graft.sources.Sinks.parquetZOrdered]].
  *
  * Bit spreading uses the binary-magic-number technique (public, e.g.
  * Stanford "Bit Twiddling Hacks"): 5 mask-and-shift rounds spread 16
  * bits to even positions; the DuckDB oracle mirrors the identical
  * constant arithmetic, so z-values are hash-checked bit-for-bit.
  * Coordinates are 16-bit (the z fits in 32 bits — no BIGINT sign edge
  * anywhere, in either engine).
  */
object ZOrderKernels {

  /** Spread the low 16 bits of x to the even bit positions of a 32-bit
    * result: abcd → 0a0b0c0d. */
  def spread16(x0: Long): Long = {
    var x = x0 & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Morton code of two 16-bit coordinates: x on even bits, y on odd. */
  def interleave16(x: Long, y: Long): Long = {
    require(x >= 0 && x < 65536 && y >= 0 && y < 65536,
      s"interleave16: coordinates must be in [0, 65536), got ($x, $y)")
    spread16(x) | (spread16(y) << 1)
  }

  /** Inverse of [[spread16]]: gather the even bits back into 16 bits. */
  def compact16(z0: Long): Long = {
    var z = z0 & 0x55555555L
    z = (z | (z >> 1)) & 0x33333333L
    z = (z | (z >> 2)) & 0x0f0f0f0fL
    z = (z | (z >> 4)) & 0x00ff00ffL
    z = (z | (z >> 8)) & 0x0000ffffL
    z
  }
}

/** `interleave16(x bigint, y bigint) -> bigint` — the Morton code, as a
  * codegen expression so z-sorting adds two kernel calls to the scan
  * project, nothing more. Throws on out-of-range coordinates (a silently
  * masked coordinate would scatter the cell, quietly destroying the
  * pruning property). */
case class InterleaveBits16(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"interleave16 requires (BIGINT, BIGINT), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKernels.interleave16(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.expr.ZOrderKernels.interleave16($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "interleave16"
}

object InterleaveBits16 {
  def apply(x: Column, y: Column): Column =
    toCol(InterleaveBits16(toExpr(x), toExpr(y)))
}
