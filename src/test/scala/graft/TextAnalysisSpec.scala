package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Kernel-vs-composed equivalence on the real corpus: the native codegen
  * kernels (ShinglesExpr, TextStats) must be BIT-identical to the
  * built-in-function compositions whose SQL mirrors the oracle runs. */
class TextAnalysisSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("dropFrequentLines: boilerplate vanishes, content survives in order") {
    import spark.implicits._
    // 5 docs share a header+footer (df=5 > maxDf=3); each has unique
    // content lines; doc 40 repeats its own rare line (kept twice —
    // WITHIN-doc repetition is not corpus boilerplate); doc 50 is ALL
    // boilerplate (must come back empty, not vanish)
    val docs = ((0 until 5).map { i =>
      (10L + i, s"HEADER\ncontent a$i\ncontent b$i\nFOOTER")
    } ++ Seq((40L, "HEADER\ndup line\ndup line\nFOOTER"),
      (50L, "HEADER\nFOOTER"))).toDF("doc_id", "text")
    val out = rows(graft.text.Boilerplate.dropFrequentLines(
      docs, "doc_id", "text", maxLineDf = 3).orderBy("doc_id"))
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(10L) == (("content a0\ncontent b0", 2L, 2L)))
    assert(out(14L) == (("content a4\ncontent b4", 2L, 2L)))
    assert(out(40L) == (("dup line\ndup line", 2L, 2L)),
      "within-doc repeats of a rare line must both survive")
    assert(out(50L) == (("", 0L, 2L)),
      "an all-boilerplate doc must come back empty, not vanish")
    assert(out.size == 7)
  }

  test("incremental boilerplate: corpus stats drop corpus furniture from " +
    "a batch; batch-internal furniture waits for the full sweep") {
    import spark.implicits._
    // corpus: 5 docs establish HEADER/FOOTER as boilerplate (df=5 > 3)
    val corpus = (0 until 5).map { i =>
      (10L + i, s"HEADER\ncontent a$i\nFOOTER")
    }.toDF("doc_id", "text")
    // batch: fresh docs carrying the corpus furniture + a NEW repeated
    // line ("BATCHAD") that no corpus stats row knows about
    val batch = (0 until 4).map { i =>
      (90L + i, s"HEADER\nBATCHAD\nfresh $i\nFOOTER")
    }.toDF("doc_id", "text")
    val stats = graft.text.Boilerplate.frequentLineStats(
      corpus, "doc_id", "text", maxLineDf = 3)
    assert(rows(stats).map(_.getString(0)).toSet == Set("HEADER", "FOOTER"),
      "stats must hold exactly the corpus boilerplate lines")
    val out = rows(graft.text.Boilerplate.dropFrequentLinesAgainst(
      stats, batch, "doc_id", "text").orderBy("doc_id"))
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.size == 4)
    for (i <- 0 until 4)
      assert(out(90L + i) == ((s"BATCHAD\nfresh $i", 2L, 2L)),
        s"doc ${90 + i}: ${out(90L + i)} — corpus furniture must drop, " +
          "batch-internal furniture must survive until the full sweep")
    // consistency: against == full sweep when stats come from the same
    // corpus and the batch introduces nothing new
    val cleanBatch = Seq((99L, "HEADER\nonly fresh\nFOOTER"))
      .toDF("doc_id", "text")
    val viaAgainst = rows(graft.text.Boilerplate.dropFrequentLinesAgainst(
      stats, cleanBatch, "doc_id", "text")).map(_.toSeq).toSet
    val viaFull = rows(graft.text.Boilerplate.dropFrequentLines(
      corpus.unionByName(cleanBatch), "doc_id", "text", 3)
      .filter(col("doc_id") === 99L)).map(_.toSeq).toSet
    assert(viaAgainst == viaFull)
  }

  test("chunkIntoLines: 12-word chunks, short tails, sub-chunk docs") {
    import spark.implicits._
    val d = Seq((1L, (1 to 25).map(i => s"w$i").mkString(" ")), // 12+12+1
      (2L, "a b c"), (3L, "solo")).toDF("id", "t")
    val got = rows(d.select(col("id"),
      graft.text.Boilerplate.chunkIntoLines(col("t"), 12).as("l")).orderBy("id"))
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L).split("\n").toSeq == Seq(
      (1 to 12).map("w" + _).mkString(" "),
      (13 to 24).map("w" + _).mkString(" "), "w25"))
    assert(got(2L) == "a b c" && got(3L) == "solo")
  }

  test("unigramLogProbCross: add-1 smoothing, OOV counting, empty sentinel") {
    import spark.implicits._
    val train = Seq((1L, "a a b")).toDF("doc_id", "text")
    val score = Seq((2L, "a c"), (3L, "   "), (4L, "b b")).toDF("doc_id", "text")
    val out = rows(graft.text.LanguageModel.unigramLogProbCross(
      train, score, "doc_id", "text").orderBy("doc_id"))
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    // V=2 (a,b), total=3, denom = 3 + 1*(2+1) = 6
    val expect2 = math.rint((math.log(3.0 / 6) + math.log(1.0 / 6)) / 2 * 1e6) / 1e6
    assert(out(2L)._1 == 2L && out(2L)._2 == 1L, s"${out(2L)}")
    assert(out(2L)._3.contains(expect2), s"${out(2L)._3} vs $expect2")
    assert(out(3L) == ((0L, 0L, None)), "whitespace doc must get the sentinel")
    assert(out(4L)._2 == 0L, "in-vocab doc has zero OOV")
  }

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

  test("Bm25: hand-derived score on a tiny corpus; tf saturation and " +
    "length normalization behave; non-matching docs are omitted") {
    import spark.implicits._
    import graft.text.Bm25
    val docs = Seq(
      (1L, "cat dog"),                      // dl=2, tf(cat)=1
      (2L, "cat cat cat dog mouse horse"),  // dl=6, tf(cat)=3
      (3L, "dog dog dog"),                  // no query term
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Bm25.score(docs, "doc_id", "text", Seq("cat"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(out.keySet == Set(1L, 2L),
      s"docs without a query term (or null text) must be omitted: $out")
    // hand derivation (k1=1.2, b=0.75): N=3 non-null docs, df(cat)=2,
    // avgdl = 11/3; idf = round6(ln(1 + 1.5/2.5))
    val idf = BigDecimal(math.log(1.0 + 1.5 / 2.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def bm(tf: Double, dl: Double): Double = {
      val avgdl = 11.0 / 3.0
      val raw = idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(1L) == (bm(1, 2), 1L), s"doc 1: ${out(1L)} vs ${bm(1, 2)}")
    assert(out(2L) == (bm(3, 6), 1L), s"doc 2: ${out(2L)} vs ${bm(3, 6)}")
    // tf saturation: tripling tf at 3x length still scores higher, but
    // far below 3x (the k1 saturation + b length penalty)
    assert(out(2L)._1 > out(1L)._1 && out(2L)._1 < 3 * out(1L)._1)
    // multi-term: a second term adds its contribution for doc 1 only
    val multi = Bm25.score(docs, "doc_id", "text", Seq("cat", "mouse"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(multi(2L) == 2L && multi(1L) == 1L)
    intercept[IllegalArgumentException] {
      Bm25.score(docs, "doc_id", "text", Nil)
    }
  }

  test("Bm25: duplicate query terms collapse to the set (documented " +
    "Σ_{t∈Q} semantics)") {
    import spark.implicits._
    val corpus = Seq((1L, "cat dog"), (2L, "cat cat mouse"))
      .toDF("doc_id", "text")
    val once = rows(graft.text.Bm25.score(corpus, "doc_id", "text",
      Seq("cat", "mouse")))
    val duped = rows(graft.text.Bm25.score(corpus, "doc_id", "text",
      Seq("cat", "mouse", "cat", "cat")))
    assert(once.map(_.toSeq) == duped.map(_.toSeq),
      "repeated terms must not change scores (set semantics)")
  }

  test("Bm25: the executed plan reads the corpus exactly TWICE (one " +
    "scalar-stats scan, one hits scan — no explode/groupBy re-tokenization)") {
    // the 100 TB contract for the round-7 rewrite: document lengths,
    // corpus scalars, per-term dfs, and tfs all come off TWO passes over
    // the parquet source (previously five — dl, tot_toks, n_docs, df, tf
    // were each a separate subtree over the same explode).
    def parquetScans(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          parquetScans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          parquetScans(q.plan)
        case s if s.nodeName.toLowerCase.contains("scan parquet") => 1
      }.sum
    val out = graft.text.Bm25.score(docs, "doc_id", "text",
      TextQueries.Bm25Terms)
    out.collect() // materialize so AQE finalizes every stage
    val n = parquetScans(out.queryExecution.executedPlan)
    assert(n == 2, s"BM25 must read the corpus exactly twice, saw $n scans")
  }

  test("chunkPassages: overlap, short tail, single-token and null docs, coverage") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "only"),                                   // 1 token
      (3L, null.asInstanceOf[String]))                // dropped
      .toDF("doc_id", "text")
    val out = graft.text.TextAnalysis
      .chunkPassages(docs, "doc_id", "text", window = 4, stride = 2)
      .orderBy("doc_id", "chunk_id").collect()
    // doc 1: starts 0,2,4,6,8 → 5 chunks; doc 2: one chunk; doc 3: none
    assert(out.length == 6)
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getLong(2)).toSeq == Seq(0L, 2L, 4L, 6L, 8L))
    assert(d1.head.getString(3) == "t1 t2 t3 t4")
    assert(d1(1).getString(3) == "t3 t4 t5 t6") // overlap of 2 tokens
    assert(d1.last.getString(3) == "t9 t10")    // short tail kept
    assert(d1.last.getLong(4) == 2L)
    // every token position is covered by at least one chunk
    val covered = d1.flatMap(r =>
      r.getLong(2) until (r.getLong(2) + r.getLong(4))).toSet
    assert(covered == (0L until 10L).toSet)
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getString(3) == "only" &&
      d2.head.getLong(4) == 1L)
    // chunking is pure map-side fan-out: no exchange in the plan
    val plan = graft.text.TextAnalysis
      .chunkPassages(docs, "doc_id", "text", 4, 2)
      .queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, "chunking must not shuffle")
  }
}
