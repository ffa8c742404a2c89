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
