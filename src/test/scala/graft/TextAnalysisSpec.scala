package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Kernel-vs-composed equivalence on the real corpus: the native codegen
  * kernels (ShinglesExpr, TextStats) must be BIT-identical to the
  * built-in-function compositions whose SQL mirrors the oracle runs. */
class TextAnalysisSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("ShinglesExpr equals the composed transform/array_distinct form") {
    val diff = docs.select(
      TextAnalysis.shingles(col("text"), 3).as("fast"),
      TextAnalysis.shinglesComposed(col("text"), 3).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
  }

  test("ShinglesExpr edge cases: short docs, exact-n, double spaces") {
    import spark.implicits._
    val edge = Seq("one", "a b", "a b c", "a b c d", "a  b c", "").toDF("text")
    val diff = edge.select(
      TextAnalysis.shingles(col("text"), 3).as("fast"),
      TextAnalysis.shinglesComposed(col("text"), 3).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
  }

  test("TextStats kernel is bit-identical to the composed column functions") {
    val kernel = docs.select(col("doc_id"), graft.expr.TextStats(col("text")).as("s"))
      .select(col("doc_id"), col("s.n_tokens"), col("s.avg_token_len"),
        col("s.stopword_ratio"), col("s.distinct_ratio"), col("s.quality"))
    val composed = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextAnalysis.avgTokenLen(col("text")).as("avg_token_len"),
      TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
      TextAnalysis.distinctRatio(col("text")).as("distinct_ratio"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    // exceptAll is exact (no tolerance): bit-identical doubles required
    assert(kernel.exceptAll(composed).count() == 0)
    assert(composed.exceptAll(kernel).count() == 0)
  }
}
