package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics kernel.
  *
  * Computes in a single tokenization pass exactly what the composed column
  * functions in [[graft.text.TextAnalysis]] compute in ~15 interpreted
  * higher-order-function evaluations: token count, mean token length,
  * stopword ratio, distinct ratio, quality score. The arithmetic is the
  * SAME IEEE operations in the SAME order as the composed form (and its
  * DuckDB SQL mirror), so results are bit-identical — asserted in
  * TextAnalysisSpec, and the oracle hash-compare would catch any drift.
  *
  * At 100 TB this is the hot loop of corpus quality filtering: one fused
  * codegen call per document, no intermediate arrays except the token
  * slice views. */
object TextStatsKernels {
  /** CANONICAL stopword list — the single source of truth.
    * [[graft.text.TextAnalysis.stopwords]] (and through it every SQL
    * mirror) derives from this Seq, so the fused kernel, the composed
    * column form, and the DuckDB oracle can never drift apart. */
  val StopwordList: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  val Stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    StopwordList.foreach(s.add)
    s
  }

  /** Non-empty token count under single-space splitting — see
    * [[TokenCount]]. Counts maximal runs of non-0x20 bytes (safe for
    * UTF-8: continuation/lead bytes are never 0x20). */
  def countTokens(text: UTF8String): Long = {
    val n = text.numBytes
    var i = 0
    var cnt = 0L
    var inTok = false
    while (i < n) {
      if (text.getByte(i) == 0x20) inTok = false
      else { if (!inTok) cnt += 1L; inTok = true }
      i += 1
    }
    cnt
  }

  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    val toks = s.split(" ", -1)
    val nTok = toks.length
    var nStop = 0
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < nTok) {
      val t = toks(i)
      if (Stopwords.contains(t)) nStop += 1
      distinct.add(t)
      i += 1
    }
    val nTokD = nTok.toDouble
    // identical op order to TextAnalysis.avgTokenLen / stopwordRatio /
    // distinctRatio / qualityScore — do not reassociate. Character count
    // is CODE POINTS (what Spark's length() counts), not UTF-16 units —
    // they differ on supplementary-plane characters.
    val avgLen = (s.codePointCount(0, s.length) - (nTok - 1)).toDouble / nTokD
    val stopRatio = nStop.toDouble / nTokD
    val distinctRatio = distinct.size.toDouble / nTokD
    val quality =
      0.3 * math.min(1.0, nTokD / 100.0) +
        0.3 * (1.0 - stopRatio) +
        0.2 * math.min(1.0, avgLen / 8.0) +
        0.2 * distinctRatio
    new GenericInternalRow(Array[Any](
      nTok.toLong, avgLen, stopRatio, distinctRatio, quality))
  }
}

/** `text_stats(string) -> struct<n_tokens, avg_token_len, stopword_ratio,
  * distinct_ratio, quality>` */
case class TextStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextStats.schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"text_stats requires STRING, got ${dt.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernels.stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextStatsKernels.stats($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "text_stats"
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("avg_token_len", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("distinct_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))

  def apply(c: Column): Column = toCol(TextStats(toExpr(c)))
}

/** `token_count(string) -> bigint`: the number of NON-EMPTY tokens under
  * single-space splitting — exactly `len(list_filter(string_split(s, ' '),
  * t -> t <> ''))` in DuckDB terms, i.e. the number of maximal runs of
  * non-space characters. Byte-level kernel (a 0x20 byte never occurs
  * inside a multi-byte UTF-8 sequence), zero allocation. This is the
  * BM25 document-length pass: one codegen call per document, no explode,
  * no shuffle. */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"token_count requires STRING, got ${dt.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernels.countTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextStatsKernels.countTokens($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "token_count"
}

object TokenCount {
  def apply(c: Column): Column = toCol(TokenCount(toExpr(c)))
}

/** Per-row query-term occurrence counter for [[graft.text.Bm25]]: maps a
  * document to a FIXED-LENGTH `array<bigint>` where slot i holds the
  * number of occurrences of `terms(i)` among the document's non-empty
  * single-space tokens (0 if absent). Fixed slots (rather than a sparse
  * struct list) let ONE corpus-scalar aggregation derive every per-term
  * document frequency (`sum(mt[i] > 0)`) alongside N and total tokens —
  * so BM25 needs no separate df pass and no df join at all. The term
  * index is a reference object shared by the generated code (built once
  * per task, O(|Q|)). Empty tokens are skipped, so a caller-supplied ""
  * term can never match (same semantics as the explode+filter form). */
case class TermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "term_counts: terms must be non-empty")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"term_counts requires STRING, got ${dt.sql}")
  }
  @transient private lazy val counter = new TermCounter(terms.toArray)
  override protected def nullSafeEval(input: Any): Any =
    counter.counts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termCounter", new TermCounter(terms.toArray),
      classOf[TermCounter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.counts($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "term_counts"
}

object TermCounts {
  def apply(c: Column, terms: Seq[String]): Column =
    toCol(TermCounts(toExpr(c), terms))
}

/** The shared per-task state behind [[TermCounts]]: an interned term →
  * slot map. Duplicate terms keep their FIRST slot (callers should pass
  * a distinct list; [[graft.text.Bm25]] does). */
class TermCounter(terms: Array[String]) extends Serializable {
  @transient private lazy val idx: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](terms.length * 2)
    var i = 0
    while (i < terms.length) { m.putIfAbsent(terms(i), i); i += 1 }
    m
  }
  def counts(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = text.toString.split(" ", -1)
    val c = new Array[Long](terms.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (!t.isEmpty) {
        val j = idx.get(t)
        if (j ne null) c(j.intValue) += 1L
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(c)
  }
}
