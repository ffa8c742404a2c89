package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Kernel-vs-composed equivalence on the real corpus: the native codegen
  * kernels (ShinglesExpr, TextStats) must be BIT-identical to the
  * built-in-function compositions whose SQL mirrors the oracle runs. */
class TextAnalysisSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("unigramLogProb emits a (0, NULL) sentinel row for empty docs") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta alpha"),
      (2L, null.asInstanceOf[String]), // null text
      (3L, "   "),                     // whitespace-only: tokens all empty
      (4L, "beta")
    ).toDF("doc_id", "text")
    val out = rows(graft.text.LanguageModel.unigramLogProb(d, "doc_id", "text")
      .orderBy("doc_id"))
    assert(out.map(_.getLong(0)) == Seq(1L, 2L, 3L, 4L),
      "every input doc must appear exactly once")
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), Option(r.get(2)))).toMap
    assert(byId(2L) == (0L, None) && byId(3L) == (0L, None),
      s"empty docs must score (0, NULL): $byId")
    assert(byId(1L)._1 == 3L && byId(4L)._1 == 1L)
    assert(byId(1L)._2.isDefined && byId(4L)._2.isDefined)
  }

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

  test("Normalize.cleaned: lowercase, de-punctuate, collapse, trim — idempotent") {
    import spark.implicits._
    val in = Seq(
      "  Hello,   WORLD!!  " -> "hello world",
      "a\tb\nc\r d" -> "a b c d",
      "Keep 123 digits-and words_ok" -> "keep 123 digits and words ok",
      "" -> "").toDF("raw", "want")
    val out = in.select(col("want"),
      graft.text.Normalize.cleaned(col("raw")).as("got"))
    out.collect().foreach(r =>
      assert(r.getString(1) == r.getString(0), s"cleaned mismatch: $r"))
    // idempotence: cleaning a cleaned string is the identity
    val twice = in.select(
      graft.text.Normalize.cleaned(col("raw")).as("once"))
      .select(col("once"),
        graft.text.Normalize.cleaned(col("once")).as("twice"))
    twice.collect().foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("Normalize.redacted masks emails, URLs, and long digit runs — in that order") {
    import spark.implicits._
    val in = Seq(
      ("mail me: jane.doe+x@sub.example.org now",
        "mail me: <EMAIL> now"),
      ("go to https://ex.com/a?b=12345678 please",
        "go to <URL> please"),
      ("id 123456789 but keep 123456",
        "id <NUM> but keep 123456"),
      // digits inside an email/URL are swallowed by the earlier mask,
      // not double-redacted
      ("user12345678@example.com / http://h.io/12345678",
        "<EMAIL> / <URL>")).toDF("raw", "want")
    in.select(col("want"), graft.text.Normalize.redacted(col("raw")).as("got"))
      .collect().foreach(r =>
        assert(r.getString(1) == r.getString(0), s"redacted mismatch: $r"))
  }
}
