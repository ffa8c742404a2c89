package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object ShingleKernels {
  /** Distinct word n-gram shingles of a whitespace-tokenized string, in one
    * pass: tokenize on single spaces, slide an n-window, dedup via hash set.
    * Shorter-than-n documents yield the whole document as one shingle.
    *
    * Semantics match [[graft.text.TextAnalysis.shingles]] (split on ' ',
    * n-grams joined by ' ', distinct, first-occurrence order — the same
    * order array_distinct preserves). The kernel exists because the
    * composed form (`transform(sequence(...))` + `array_distinct`) runs as
    * interpreted higher-order functions OUTSIDE whole-stage codegen —
    * measured 25× slower — and shingling is the hot inner loop of every
    * near-dup query. */
  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    // tokenize on single spaces (preserving empty tokens, like split(' '))
    val toks = s.split(" ", -1)
    val out = new java.util.LinkedHashSet[String]()
    if (toks.length <= n) {
      out.add(s)
    } else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }
}

object PositionalShingleKernels {
  /** ALL word n-grams in token order — NO dedup, NO short-doc fallback
    * (documents with fewer than n tokens yield an empty array): the
    * positional variant [[graft.operators.Dedup.dropDuplicatedSpans]]
    * needs, where the array index IS the starting token offset of the
    * gram. Same tokenization contract as [[ShingleKernels.shingles]]
    * (split on single spaces, empty tokens preserved, grams joined by
    * one space); a codegen kernel for the same reason — the composed
    * transform/sequence/element_at form runs interpreted and measured
    * ~10× slower on the span-dedup hot loop. */
  def positionalShingles(text: UTF8String, n: Int): GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    val arr = new Array[Any](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      arr(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(arr)
  }
}

/** `positional_shingles(string, n) -> array<string>` — every word n-gram
  * in order, index = starting token offset (see
  * [[PositionalShingleKernels.positionalShingles]]). */
case class PositionalShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"positional_shingles requires STRING, got ${dt.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    PositionalShingleKernels.positionalShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.PositionalShingleKernels.positionalShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "positional_shingles"
}

object PositionalShinglesExpr {
  def apply(c: Column, n: Int): Column = toCol(PositionalShinglesExpr(toExpr(c), n))
}

/** `shingles(string, n) -> array<string>` — native one-pass distinct
  * word-n-gram shingling (see [[ShingleKernels.shingles]]). */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"shingles requires STRING, got ${dt.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.shingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleKernels.shingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "shingles"
}

object ShinglesExpr {
  def apply(c: Column, n: Int): Column = toCol(ShinglesExpr(toExpr(c), n))
}
