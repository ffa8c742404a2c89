package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization (Sennrich, Haddow & Birch, "Neural
  * machine translation of rare words with subword units", ACL 2016) —
  * the tokenizer family every training-data pipeline ends in. Two
  * halves, each with the right distribution story:
  *
  *   - TRAIN ([[train]]): merges are learned from the WORD-FREQUENCY
  *     table, not the corpus — so the distributed work is one
  *     tokenize+groupBy aggregation (corpus-sized, shuffle carries
  *     (word, count) pairs), and the sequential merge loop runs on the
  *     driver over vocabulary-scale state (the same model-scale
  *     contract as the k-means centroids and the vocab build: a 100 TB
  *     corpus has a bounded distinct-word table, and BPE's loop is
  *     inherently sequential — merge i+1 depends on merge i).
  *   - ENCODE ([[encode]]): the learned merge ranks ship to executors
  *     (model-scale broadcast) and every document is encoded map-side —
  *     no shuffle at all; a per-partition word→pieces cache collapses
  *     the Zipf head so each distinct word is encoded once per task.
  *
  * Both halves are deterministic: tie-breaks in training are (count
  * DESC, pair lexicographic ASC), and greedy encoding always merges the
  * lowest-rank adjacent pair, leftmost first — re-runs, retries, and
  * partitionings produce identical merges and identical encodings
  * (spec-asserted; the catalog entry is rows-checked since a 50-step
  * sequential merge derivation is not SQL-expressible).
  *
  * Word boundary: tokens are whitespace-split and encoded
  * independently, with an end-of-word marker appended so "low" the word
  * and "low" the prefix of "lower" learn distinct merges (the classic
  * formulation). No counterpart in the reference (no text surface).
  */
object Bpe {

  /** End-of-word marker appended to each word's final symbol. */
  val Eow = "</w>"

  /** One learned merge: adjacent symbols `a`,`b` become `a+b`. */
  final case class Merge(a: String, b: String)

  /** Learn up to `nMerges` merges from `docs`. Returns merges in rank
    * order (rank 0 = first learned = highest priority at encode time).
    * Stops early when no adjacent pair occurs twice.
    *
    * The driver-side vocabulary is BOUNDED, not asserted-bounded: words
    * with count < `minCount` are dropped BEFORE the collect. The
    * default `minCount = 2` prunes exactly the pair mass that count-1
    * words supply — which CAN be trainable mass in two regimes: a pair
    * repeated within one singleton word ("banana" alone makes (a,n)
    * count 2) and a pair shared across several distinct singleton
    * words. Dropping that tail is the standard BPE-at-scale trade
    * (singleton tokens of a web crawl are overwhelmingly typo/numeric/
    * URL noise whose merges are worthless), but it is a TRADE, not a
    * free lunch: merges may differ from minCount = 1 training. Lower
    * minCount only with a matching `maxVocab`. `maxVocab` is the loud
    * backstop: if the filtered table still exceeds it, training throws
    * instead of melting the driver — the same refuse-don't-degrade
    * contract as [[graft.operators.Similarity.thresholdPairs]]'s scale
    * guard. */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L, maxVocab: Long = 10000000L): Seq[Merge] = {
    require(nMerges >= 1, s"Bpe.train: nMerges must be >= 1, got $nMerges")
    require(minCount >= 1, s"Bpe.train: minCount must be >= 1, got $minCount")
    val freqTable = docs
      .filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount) // prune the unbounded noise tail
    // LIMIT-bounded probe: the guard itself never collects past the cap.
    val probe =
      if (maxVocab >= Int.MaxValue.toLong - 1) Int.MaxValue
      else (maxVocab + 1).toInt
    val wordFreq: Array[(String, Long)] = freqTable
      .limit(probe)
      .collect() // vocabulary-scale AFTER the minCount floor
      .map(r => r.getString(0) -> r.getLong(1))
    require(wordFreq.length <= maxVocab,
      s"Bpe.train: > $maxVocab distinct words with count >= $minCount — " +
        "the driver-side merge loop is vocabulary-scale only. Raise " +
        "minCount (typo/numeric/URL noise dominates a raw crawl's " +
        "distinct-token table) or raise maxVocab deliberately.")
    trainFromFreqs(wordFreq, nMerges)
  }

  /** The driver-side merge loop, exposed for specs. Empty words are
    * skipped (matching [[applyTo]]'s empty-word guard) rather than
    * indexing syms(-1). */
  def trainFromFreqs(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    // each word as a mutable symbol sequence; char-level start + EOW
    val words: Array[(Array[String], Long)] = wordFreq.collect {
      case (w, c) if w.nonEmpty =>
        val syms = w.map(_.toString).toArray
        syms(syms.length - 1) += Eow
        (syms, c)
    }.toArray
    val merges = Seq.newBuilder[Merge]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val pairCounts = collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(o => Some(o.getOrElse(0L) + c))
      // a pair seen once can never reduce the encoded length of a future
      // corpus scan — the classic stopping rule
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) done = true
      else {
        val ((a, b), _) = candidates.minBy { case ((x, y), c) =>
          (-c, x, y) // count DESC, then lexicographic — deterministic
        }
        merges += Merge(a, b)
        var wi = 0
        while (wi < words.length) {
          words(wi) = (mergeOnce(words(wi)._1, a, b), words(wi)._2)
          wi += 1
        }
        step += 1
      }
    }
    merges.result()
  }

  /** Replace every adjacent (a, b) with a+b, leftmost first ("aaa" with
    * merge (a,a) → ("aa", "a")). */
  private def mergeOnce(syms: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Greedy BPE application: repeatedly merge the LOWEST-rank adjacent
    * pair (leftmost occurrence set first) until no learned pair remains. */
  def applyTo(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = {
      val s = word.map(_.toString).toArray
      s(s.length - 1) += Eow
      s
    }
    var continue = true
    while (continue && syms.length > 1) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) continue = false
      else {
        val (a, b) = (syms(bi), syms(bi + 1))
        syms = mergeOnce(syms, a, b)
      }
    }
    syms
  }

  /** Encode every doc: (idCol, pos, piece) — one row per BPE piece, in
    * document order. Map-side only; merges ride in the task closure
    * (model-scale), and a per-partition cache encodes each distinct
    * word once per task. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (m, i) => (m.a, m.b) -> i }.toMap
    val src: Dataset[(Long, String)] = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
    src.mapPartitions { iter =>
      val cache = collection.mutable.HashMap.empty[String, Array[String]]
      iter.flatMap { case (id, text) =>
        var pos = -1L
        text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
          cache.getOrElseUpdate(w, applyTo(w, ranks)).iterator.map { piece =>
            pos += 1
            (id, pos, piece)
          }
        }
      }
    }.toDF(idCol, "pos", "piece")
  }
}
