package graft

import org.apache.spark.sql.functions._
import graft.text.Bpe
import graft.text.Bpe.Merge

/** BPE tokenizer: classic-fixture merge order (hand-derived), greedy
  * application, roundtrip, and partitioning determinism. */
class BpeSpec extends SparkSpec {

  // Sennrich et al.'s running example vocabulary
  private val freqs = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("training learns the classic merge sequence with deterministic ties") {
    val merges = Bpe.trainFromFreqs(freqs, 4)
    // hand-derived: (e,s)=9 beats (s,t</w>)=9 lexicographically; then
    // (es,t</w>)=9; then (l,o)=7; then the 6-count tie resolves to (e,w)
    assert(merges == Seq(
      Merge("e", "s"), Merge("es", "t</w>"),
      Merge("l", "o"), Merge("e", "w")), merges.toString)
  }

  test("greedy application merges lowest-rank pairs first") {
    val ranks = Bpe.trainFromFreqs(freqs, 4)
      .zipWithIndex.map { case (m, i) => (m.a, m.b) -> i }.toMap
    // "lowest" was never seen in training, but its pieces compose
    assert(Bpe.applyTo("lowest", ranks).toSeq ==
      Seq("lo", "w", "est</w>"))
    assert(Bpe.applyTo("newest", ranks).toSeq ==
      Seq("n", "ew", "est</w>"))
    assert(Bpe.applyTo("", ranks).isEmpty)
  }

  test("training stops early when no pair repeats") {
    val merges = Bpe.trainFromFreqs(Seq("ab" -> 1L, "cd" -> 1L), 100)
    assert(merges.isEmpty, s"singleton pairs must not merge: $merges")
  }

  test("trainFromFreqs skips empty words instead of indexing syms(-1)") {
    val merges = Bpe.trainFromFreqs(Seq("" -> 3L) ++ freqs, 4)
    assert(merges == Bpe.trainFromFreqs(freqs, 4),
      "an empty word must not change (or crash) training")
  }

  test("train bounds its driver vocabulary: minCount floor + loud maxVocab guard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa aa aa bb"), (2L, "aa bb zz_singleton"), (3L, "aa bb")
    ).toDF("doc_id", "text")
    // minCount = 2 drops the singleton; merges learned from aa/bb alone
    val merges = Bpe.train(docs, "text", 3)
    assert(merges.nonEmpty)
    assert(!merges.exists(m => (m.a + m.b).contains("z")),
      s"singleton word leaked into training: $merges")
    // the backstop throws rather than collecting past the cap
    val e = intercept[IllegalArgumentException] {
      Bpe.train(docs, "text", 3, minCount = 1L, maxVocab = 2L)
    }
    assert(e.getMessage.contains("maxVocab") ||
      e.getMessage.contains("vocabulary-scale"), e.getMessage)
    // a huge maxVocab means "guard off" — no toInt overflow
    assert(Bpe.train(docs, "text", 3, minCount = 1L,
      maxVocab = Long.MaxValue).nonEmpty)
  }

  test("encode: roundtrip, document order, cache correctness, determinism") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 60)
    val merges = Bpe.train(docs, "text", 50)
    assert(merges.nonEmpty)
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
    // roundtrip: pieces of each doc, joined in pos order with </w>
    // restored to spaces, reproduce the original text exactly
    val rebuilt = enc.orderBy("doc_id", "pos")
      .groupBy("doc_id")
      .agg(concat_ws("", collect_list(col("piece"))).as("glued"))
      .select(col("doc_id"),
        regexp_replace(col("glued"), java.util.regex.Pattern.quote(Bpe.Eow), " ")
          .as("rt"))
    val diff = rebuilt.join(docs, "doc_id")
      // normalize repeated spaces: empty tokens are dropped by encode
      .select(col("doc_id"), trim(col("rt")).as("rt"),
        trim(regexp_replace(col("text"), " +", " ")).as("orig"))
      .filter(col("rt") =!= col("orig"))
    assert(diff.count() == 0, "BPE roundtrip must reproduce the text")
    // determinism across partitionings
    val a = rows(enc.orderBy("doc_id", "pos"))
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val b = rows(Bpe.encode(docs.repartition(7), "doc_id", "text", merges)
      .orderBy("doc_id", "pos"))
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(a == b)
  }
}
