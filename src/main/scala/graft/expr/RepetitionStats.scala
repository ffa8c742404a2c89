package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Gopher-repetition kernel behind
  * [[graft.text.Repetition.repetitionStats]].
  *
  * Computes, in a single tokenization of the document, the integer
  * n-gram statistics the composed higher-order-function form
  * ([[graft.text.Repetition.repetitionStatsComposed]]) derives with
  * one interpreted `array_sort` + `aggregate` fold PER signal — per
  * n-gram order: the top n-gram's occurrence count and its
  * count×chars weight under the (count DESC, gram ASC) tie-break,
  * and for the duplication order the duplicated / total n-gram
  * character weights. Every output is an exact integer, so kernel ≡
  * composed form bit-for-bit (spec-asserted on the test corpus); the
  * fractions stay one IEEE division in the caller, unchanged.
  *
  * Numbers at sf0.1 motivated this: the composed form prices at
  * ~22 s for 5000 small documents — interpreted lambda folds
  * allocating a struct per n-gram, times four orders, times the
  * duplicate evaluation a multi-field struct reference costs outside
  * whole-stage codegen. The kernel is one codegen-participating call
  * per row (hash-count, no sort), restoring the scan → project plan
  * to actual map-job cost — at 100 TB this sweep is the first pass
  * over every document, so per-row constant factors are the whole
  * bill.
  *
  * Pinned semantics (identical to the composed form and the DuckDB
  * oracle):
  *   - tokens = `split(text, ' ')` keeping empties; n-grams join
  *     with a single space (`concat_ws`), so runs of spaces still
  *     produce well-defined grams;
  *   - gram character weight counts CODE POINTS (Spark `length()`),
  *     not UTF-16 units;
  *   - tie-break is binary-UTF-8 smallest (what `array_sort` pins) —
  *     compared via [[UTF8String]], not `String.compareTo`, which
  *     disagrees on supplementary-plane text;
  *   - orders with fewer than n tokens report zeros (the caller
  *     NULL-gates on `ntoks`).
  */
object RepetitionKernels {
  /** Number of code points in s (what Spark's `length()` counts). */
  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong

  /** UTF-8 binary "a < b" — array_sort's string order. */
  private def utf8Less(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  /** gram counts for one order n over the token array. */
  private def grams(toks: Array[String], n: Int):
      java.util.HashMap[String, Long] = {
    val m = new java.util.HashMap[String, Long]()
    var i = 0
    val last = toks.length - n
    val sb = new java.lang.StringBuilder()
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      m.merge(sb.toString, 1L, (a, b) => a + b)
      i += 1
    }
    m
  }

  /** struct<ntoks, bestw: array (aligned to topNs), bestcnt: array,
    * dupw, totw> — see the caller for the fraction derivations. */
  def repStats(text: UTF8String, topNs: Array[Int], dupN: Int): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val nToks = toks.length
    val bestw = new Array[Long](topNs.length)
    val bestcnt = new Array[Long](topNs.length)
    var k = 0
    while (k < topNs.length) {
      val n = topNs(k)
      if (nToks >= n) {
        val m = grams(toks, n)
        var bc = 0L
        var bg: String = null
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = e.getValue.longValue
          if (c > bc || (c == bc && utf8Less(e.getKey, bg))) {
            bc = c; bg = e.getKey
          }
        }
        bestcnt(k) = bc
        bestw(k) = bc * cp(bg)
      }
      k += 1
    }
    var dupw = 0L
    var totw = 0L
    if (nToks >= dupN) {
      val it = grams(toks, dupN).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.longValue
        val w = c * cp(e.getKey)
        totw += w
        if (c > 1) dupw += w
      }
    }
    new GenericInternalRow(Array[Any](nToks.toLong,
      new GenericArrayData(bestw), new GenericArrayData(bestcnt),
      dupw, totw))
  }
}

/** `repetition_stats(string) -> struct<ntoks, bestw array<bigint>,
  * bestcnt array<bigint>, dupw, totw>` — integer Gopher-repetition
  * statistics, one call per document. `topNs`/`dupN` are plan-time
  * constants (the Gopher orders by default). */
case class RepetitionStats(child: Expression, topNs: Seq[Int], dupN: Int)
    extends UnaryExpression {
  require(topNs.nonEmpty, "repetition_stats: topNs must be non-empty")
  override def dataType: DataType = StructType(Seq(
    StructField("ntoks", LongType, nullable = false),
    StructField("bestw", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("bestcnt", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("dupw", LongType, nullable = false),
    StructField("totw", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires STRING, got ${dt.sql}")
  }
  @transient private lazy val ns = topNs.toArray
  override protected def nullSafeEval(input: Any): Any =
    RepetitionKernels.repStats(input.asInstanceOf[UTF8String], ns, dupN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("repTopNs", topNs.toArray,
      "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.RepetitionKernels.repStats($c, $nsRef, $dupN)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  def apply(c: Column, topNs: Seq[Int], dupN: Int): Column =
    toCol(RepetitionStats(toExpr(c), topNs, dupN))
}
