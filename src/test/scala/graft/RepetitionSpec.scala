package graft

import org.apache.spark.sql.functions._
import graft.text.Repetition

/** Gopher repetition signals ([[graft.text.Repetition]]): hand-derived
  * fractions, NULL semantics below the n-gram floor, the keep flag's
  * NULL-passes rule, and the operator's shuffle-free plan claim. */
class RepetitionSpec extends SparkSpec {

  private def stats(texts: (Long, String)*) = {
    import spark.implicits._
    Repetition.repetitionStats(
      texts.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
  }

  test("hand-derived fractions on a phrase-dominated doc") {
    // "x y x y x y": 11 chars; bigrams "x y"x3, "y x"x2 -> top2 = 3*3/11
    // trigrams "x y x"x2, "y x y"x2 -> tie, lex-smallest "x y x" wins,
    // top3 = 2*5/11; 4-grams "x y x y"x2, "y x y x"x1 -> top4 = 2*7/11
    // 5-grams "x y x y x"x1, "y x y x y"x1 -> no dup -> dup5 = 0
    val r = stats(1L -> "x y x y x y").head
    assert(r.getDouble(1) == 9.0 / 11)
    assert(r.getDouble(2) == 10.0 / 11)
    assert(r.getDouble(3) == 14.0 / 11)
    assert(r.getDouble(4) == 0.0)
    assert(!r.getBoolean(5), "phrase-dominated doc must be dropped")
  }

  test("distinct-token doc keeps; short docs get NULL signals and pass") {
    val rows = stats(1L -> "a b c d e f g h", 2L -> "solo", 3L -> null)
    assert(rows.length == 2, "null text is absent from the output")
    val diverse = rows(0)
    // every n-gram occurs once: no repetition, all top fracs 0.0
    assert(diverse.getDouble(1) == 0.0)
    assert(diverse.getDouble(2) == 0.0)
    assert(diverse.getDouble(3) == 0.0)
    assert(diverse.getDouble(4) == 0.0)
    assert(diverse.getBoolean(5))
    val short = rows(1)
    assert(short.isNullAt(1) && short.isNullAt(2) && short.isNullAt(3) &&
      short.isNullAt(4), "sub-n docs have no n-gram signal")
    assert(short.getBoolean(5), "NULL signal passes the filter (n/a)")
  }

  test("duplicated 5-grams raise dup5gram_frac; threshold drops the doc") {
    // "p q r s t p q r s t u": 5-grams include "p q r s t" twice of 7
    // total; dupw = 2*9, totw = 2*9 + 5*9 (the five distinct singles
    // are 9 chars each: check) -> computed against the oracle formula
    val r = stats(1L -> "p q r s t p q r s t u").head
    val toks = "p q r s t p q r s t u".split(" ")
    val grams = toks.sliding(5).map(_.mkString(" ")).toSeq
    val byG = grams.groupBy(identity).view.mapValues(_.size)
    val dupw = byG.collect { case (g, c) if c > 1 => c.toLong * g.length }.sum
    val totw = byG.map { case (g, c) => c.toLong * g.length }.sum
    assert(r.getDouble(4) == dupw.toDouble / totw)
  }

  test("kernel == composed HOF form bit-for-bit on the corpus + edges") {
    import spark.implicits._
    val edges = Seq(
      1L -> "x y x y x y", 2L -> "a b c d e f g h", 3L -> "solo",
      4L -> "p q r s t p q r s t u",
      5L -> "a  b   a  b", // runs of spaces -> empty tokens in grams
      6L -> "", 7L -> "tie a tie b tie a tie b tie")
      .toDF("doc_id", "text")
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (df <- Seq(edges, corpus)) {
      val fast = Repetition.repetitionStats(df, "doc_id", "text")
        .orderBy("doc_id").collect()
      val slow = Repetition.repetitionStatsComposed(df, "doc_id", "text")
        .orderBy("doc_id").collect()
      assert(fast.length == slow.length)
      fast.zip(slow).foreach { case (f, s) =>
        assert(f == s, s"kernel/composed divergence:\n  $f\n  $s")
      }
    }
  }

  test("the plan is shuffle-free: scan -> project, no Exchange") {
    val df = Repetition.repetitionStats(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-row repetition stats must not shuffle:\n$plan")
  }
}
