package graft.expr

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Shannon-entropy kernel behind
  * [[graft.text.Entropy.entropyStats]].
  *
  * Replays the composed higher-order-function form
  * ([[graft.text.Entropy.entropyStatsComposed]]) — character- and
  * token-level entropy with the 1e-9 term-rounding / exact-decimal-sum
  * determinism convention — in ONE codegen call per document instead
  * of two interpreted `array_sort` + decimal `aggregate` folds. Each
  * arithmetic step is kept literally identical so the outputs are
  * bit-for-bit equal (spec-asserted):
  *   - `p = run / n` with n the double symbol count;
  *   - raw term = `p * (ln p / ln 2)` — the exact op order of Spark's
  *     `log(2.0, p)` followed by the multiply;
  *   - rounded via `BigDecimal.valueOf(raw).setScale(9, HALF_UP)
  *     .doubleValue` — Spark `round(_, 9)`'s double path;
  *   - each rounded term enters the sum through `Double.toString`
  *     (Spark's double→decimal cast), summed exactly, and the total
  *     ships as `-(sum.doubleValue)` UNROUNDED — including the `-0.0`
  *     a zero-entropy document produces.
  *
  * Symbols match the composed form's `split` semantics: characters
  * are CODE POINTS (`split(text, '')` — surrogate pairs stay
  * together, no empties for non-empty text; empty text yields the
  * single empty symbol Java's split produces), tokens are
  * `split(text, ' ')` KEEPING empties. */
object EntropyKernels {
  /** −Σ round(p·log₂p, 9) summed exactly; matches the fold's output
    * for a non-empty symbol multiset given as (count per distinct). */
  private def entropyBits(counts: java.util.Collection[java.lang.Long],
      n: Long): Double = {
    val nD = n.toDouble
    var sum = JBigDecimal.ZERO
    val it = counts.iterator()
    while (it.hasNext) {
      val c = it.next().longValue
      val p = c.toDouble / nD
      val raw = p * (math.log(p) / math.log(2.0))
      val rounded =
        JBigDecimal.valueOf(raw).setScale(9, RoundingMode.HALF_UP)
          .doubleValue
      sum = sum.add(new JBigDecimal(java.lang.Double.toString(rounded)))
    }
    -(sum.doubleValue)
  }

  /** struct<char_entropy double, token_entropy double>. */
  def entropyStats(text: UTF8String): InternalRow = {
    val s = text.toString
    // characters: code points (split(text, '') semantics; empty text
    // degenerates to the one empty symbol Java's split emits)
    val charEnt = if (s.isEmpty) {
      entropyBits(java.util.Collections.singletonList(1L), 1L)
    } else {
      val m = new java.util.HashMap[Integer, java.lang.Long]()
      var i = 0
      var n = 0L
      while (i < s.length) {
        val cp = s.codePointAt(i)
        m.merge(cp, 1L, (a, b) => a + b)
        i += Character.charCount(cp)
        n += 1L
      }
      entropyBits(m.values, n)
    }
    // tokens: split(' ') keeping empties — never an empty list
    val toks = s.split(" ", -1)
    val tm = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < toks.length) {
      tm.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    val tokEnt = entropyBits(tm.values, toks.length.toLong)
    new GenericInternalRow(Array[Any](charEnt, tokEnt))
  }
}

/** `entropy_stats(string) -> struct<char_entropy, token_entropy>` —
  * both in bits, under the engine's 1e-9-grain determinism
  * convention. */
case class EntropyStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("char_entropy", DoubleType, nullable = true),
    StructField("token_entropy", DoubleType, nullable = true)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"entropy_stats requires STRING, got ${dt.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    EntropyKernels.entropyStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.EntropyKernels.entropyStats($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "entropy_stats"
}

object EntropyStats {
  def apply(c: Column): Column = toCol(EntropyStats(toExpr(c)))
}
