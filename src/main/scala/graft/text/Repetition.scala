package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style REPETITION quality signals (Rae et al., "Scaling
  * Language Models: Methods, Analysis & Insights from Training
  * Gopher", 2021, App. A1.1 — the repetition family of its quality
  * filter, the industry-standard pre-training sweep): per document,
  * the character fraction covered by the single most frequent word
  * n-gram (n = 2, 3, 4) and the character fraction sitting in
  * DUPLICATED longer n-grams (n = 5). A document dominated by a
  * repeated phrase ("click here to subscribe click here to …") scores
  * high and is dropped before training.
  *
  * Pinned semantics (token-based, mirrored exactly by the DuckDB
  * oracle):
  *   - tokens = `split(text, ' ')` (the engine-wide convention);
  *     word n-grams are `concat_ws(" ", tok_i..tok_{i+n-1})`;
  *   - `top{n}gram_frac` = count(top) × chars(top) / chars(text),
  *     top = the most frequent n-gram, ties → lexicographically
  *     SMALLEST (deterministic cross-engine); a top n-gram occurring
  *     only ONCE is not repetition — the fraction is then 0.0 (else a
  *     short diverse document would trip the threshold on its single
  *     occurrence of itself). Overlapping occurrences count their
  *     characters repeatedly, so the value can exceed 1.0 under
  *     pathological repetition — it is MONOTONE in repetition, which
  *     is all a threshold filter needs (the exact-position-coverage
  *     variant costs a per-position bitmap for no extra filter
  *     power);
  *   - `dup{n}gram_frac` = Σ_{g: count>1} count·chars(g) /
  *     Σ_g count·chars(g) — duplicated n-gram weight over all n-gram
  *     weight;
  *   - a document with fewer than n tokens has no n-gram: fracs NULL,
  *     and the threshold filter treats NULL as PASS (signal n/a);
  *   - every emitted fraction is integer×integer / integer in ONE
  *     IEEE division — bit-identical in any engine, shipped unrounded.
  *
  * 100 TB posture: computed ENTIRELY per row with higher-order
  * functions (sort the document's own n-gram list, run-length fold) —
  * NO shuffle, no explode, no per-ngram rows in flight; the plan is
  * scan → project, embarrassingly parallel, and a skewed 1 GB
  * document costs only its own task time. The relational alternative
  * (explode n-grams → groupBy(doc, gram)) shuffles ~n_tokens rows per
  * document — at corpus scale that is the difference between a map
  * job and the largest shuffle in the pipeline. */
object Repetition {

  /** The word n-gram list (one string per position; empty below n
    * tokens). */
  private def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array())

  /** (top count × top chars, dup weight, total weight) over one
    * document's n-gram multiset, via run-length fold over the SORTED
    * list. Scanning in sorted order makes the tie-break free: the
    * first run reaching the max count IS the lexicographically
    * smallest of its count class, so `>` alone implements
    * (count DESC, gram ASC). */
  private def runStats(ngs: Column): Column = {
    val sorted = array_sort(ngs)
    val init = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("dupw"), lit(0L).as("totw"),
      lit(0L).as("bestw"), lit(0L).as("bestcnt"))
    // close the open run: fold its weight into the totals and contend
    // for the top slot
    def close(acc: Column): Column = {
      val w = acc("run") * length(acc("prev"))
      struct(acc("prev").as("prev"), acc("run").as("run"),
        (acc("dupw") + when(acc("run") > 1, w).otherwise(0L)).as("dupw"),
        (acc("totw") + w).as("totw"),
        when(acc("run") > acc("bestcnt"), w).otherwise(acc("bestw"))
          .as("bestw"),
        when(acc("run") > acc("bestcnt"), acc("run"))
          .otherwise(acc("bestcnt")).as("bestcnt"))
    }
    aggregate(sorted, init,
      (acc, x) => when(x === acc("prev"),
        struct(acc("prev").as("prev"), (acc("run") + 1).as("run"),
          acc("dupw").as("dupw"), acc("totw").as("totw"),
          acc("bestw").as("bestw"), acc("bestcnt").as("bestcnt")))
        .otherwise {
          val c = close(acc)
          struct(x.as("prev"), lit(1L).as("run"), c("dupw").as("dupw"),
            c("totw").as("totw"), c("bestw").as("bestw"),
            c("bestcnt").as("bestcnt"))
        },
      acc => close(acc))
  }

  /** Per-document repetition signals + the keep flag. Output columns:
    * `doc_id`-keyed stats, every fraction an exact one-division
    * double (see the semantics note above).
    *
    * Driven by the one-pass [[graft.expr.RepetitionStats]] kernel —
    * one codegen call per document instead of an interpreted
    * sort+fold per signal (~20× at sf0.1; the kernel's integer
    * outputs are bit-identical to the composed form's, spec-asserted,
    * and the fraction divisions below are unchanged). */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
      topThresholds: Map[Int, Double] =
        Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
      dupN: Int = 5, dupThreshold: Double = 0.15): DataFrame = {
    val topNs = topThresholds.keys.toSeq.sorted
    val base = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), length(col(textCol)).as("_nchars"),
        graft.expr.RepetitionStats(col(textCol), topNs, dupN).as("_st"))
    // same expressions as the composed form, fed from the kernel's
    // exact integers: double / int(chars) and double / long(totw)
    // coerce identically
    def topFrac(k: Int, n: Int): Column =
      when(col("_st.ntoks") >= n,
        when(col("_st.bestcnt").getItem(k) >= 2,
          col("_st.bestw").getItem(k).cast("double") / col("_nchars"))
          .otherwise(lit(0.0)))
        .otherwise(lit(null))
    val dupFrac: Column =
      when(col("_st.ntoks") >= dupN && col("_st.totw") > 0,
        col("_st.dupw").cast("double") / col("_st.totw"))
        .otherwise(lit(null))
    val withStats = base.select(
      col(idCol) +:
        topNs.zipWithIndex.map { case (n, k) =>
          topFrac(k, n).cast("double").as(s"top${n}gram_frac")
        } :+ dupFrac.as(s"dup${dupN}gram_frac"): _*)
    val keep = topThresholds.toSeq.sortBy(_._1).map { case (n, t) =>
      coalesce(col(s"top${n}gram_frac") <= t, lit(true))
    }.reduce(_ && _) &&
      coalesce(col(s"dup${dupN}gram_frac") <= dupThreshold, lit(true))
    withStats.withColumn("keep", keep)
  }

  /** The composed higher-order-function form — the kernel's reference
    * twin (array_sort + run-length fold per signal; the docstring's
    * original shuffle-free construction). Kept for the differential
    * spec: [[repetitionStats]] must equal this bit-for-bit. */
  def repetitionStatsComposed(docs: DataFrame, idCol: String, textCol: String,
      topThresholds: Map[Int, Double] =
        Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
      dupN: Int = 5, dupThreshold: Double = 0.15): DataFrame = {
    val toks = split(col(textCol), " ")
    // bestw is already count×chars of the winning run — one IEEE
    // division by the document's char count and nothing else; a
    // once-only top n-gram is no repetition (0.0, see semantics note)
    def topFrac(n: Int): Column = {
      val st = runStats(ngrams(toks, n))
      when(size(toks) >= n,
        when(st("bestcnt") >= 2,
          st("bestw").cast("double") / length(col(textCol)))
          .otherwise(lit(0.0)))
        .otherwise(lit(null))
    }
    def dupFrac(n: Int): Column = {
      val st = runStats(ngrams(toks, n))
      when(size(toks) >= n && st("totw") > 0,
        st("dupw").cast("double") / st("totw"))
        .otherwise(lit(null))
    }
    val withStats = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        (topFrac(2).cast("double")).as("top2gram_frac"),
        (topFrac(3).cast("double")).as("top3gram_frac"),
        (topFrac(4).cast("double")).as("top4gram_frac"),
        dupFrac(dupN).as(s"dup${dupN}gram_frac"))
    val keep = topThresholds.toSeq.sortBy(_._1).map { case (n, t) =>
      coalesce(col(s"top${n}gram_frac") <= t, lit(true))
    }.reduce(_ && _) &&
      coalesce(col(s"dup${dupN}gram_frac") <= dupThreshold, lit(true))
    withStats.withColumn("keep", keep)
  }
}
