package graft

import graft.text.Entropy

/** Shannon entropy signals ([[graft.text.Entropy]]): hand-derived
  * values, degenerate inputs, and the shuffle-free plan claim. */
class EntropySpec extends SparkSpec {

  private def stats(texts: (Long, String)*) = {
    import spark.implicits._
    Entropy.entropyStats(
      texts.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
  }

  test("hand-derived entropies") {
    val rows = stats(
      1L -> "aabb",      // chars a,a,b,b -> 1 bit; tokens: one token
      2L -> "aaaa",      // zero char entropy
      3L -> "x y x y",   // tokens x,y,x,y -> 1 bit
      4L -> "abcd")      // 4 distinct chars -> 2 bits
    assert(rows(0).getDouble(1) == 1.0)
    assert(rows(0).getDouble(2) == 0.0, "single distinct token -> 0 bits")
    assert(rows(1).getDouble(1) == 0.0)
    assert(rows(2).getDouble(2) == 1.0)
    // chars of "x y x y": x:2, y:2, ' ':3 of 7
    val p = Seq(3.0 / 7, 2.0 / 7, 2.0 / 7)
    val want = -p.map(q =>
      math.rint(q * (math.log(q) / math.log(2.0)) * 1e9) / 1e9).sum
    assert(rows(2).getDouble(1) == want)
    assert(rows(3).getDouble(1) == 2.0)
  }

  test("null text absent; counts ride along") {
    val rows = stats(1L -> "ab cd", 2L -> null)
    assert(rows.length == 1)
    assert(rows(0).getLong(3) == 5L && rows(0).getLong(4) == 2L)
  }

  test("kernel == composed HOF form bit-for-bit on the corpus + edges") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val edges = Seq(
      1L -> "aabb", 2L -> "aaaa", 3L -> "x y x y", 4L -> "abcd",
      5L -> "a  b   a", // empty tokens are symbols
      6L -> "", 7L -> "éé café") // multi-byte chars
      .toDF("doc_id", "text")
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (df <- Seq(edges, corpus)) {
      val fast = Entropy.entropyStats(df, "doc_id", "text")
        .orderBy("doc_id").collect()
      val slow = Entropy.entropyStatsComposed(df, "doc_id", "text")
        .orderBy("doc_id").collect()
      assert(fast.length == slow.length)
      fast.zip(slow).foreach { case (f, s) =>
        assert(f == s, s"kernel/composed divergence:\n  $f\n  $s")
      }
    }
  }

  test("the plan is shuffle-free: scan -> project, no Exchange") {
    val df = Entropy.entropyStats(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-row entropy must not shuffle:\n$plan")
  }
}
