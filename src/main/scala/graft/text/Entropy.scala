package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-document SHANNON ENTROPY quality signals: character-level and
  * token-level entropy in bits. Anomalously LOW char entropy flags
  * repeated-character junk ("aaaa…", padded boilerplate); anomalously
  * HIGH flags random/garbled bytes (encoding failures, minified
  * blobs, base64 spills) — the classic cheap detector both CCNet-style
  * pipelines and web-scale curation sweeps run alongside the
  * stopword/repetition filters.
  *
  * Determinism: entropy is −Σ p·log₂p — a float sum whose order
  * matters in the last ulps, and log₂ is libm. The chi-squared
  * convention applies: each term is rounded to 1e-9 then summed
  * EXACTLY as decimals (order-independent by construction), and the
  * total rounds to 1e-6 — the oracle replays the identical
  * term-rounding, so the hash compares despite two engines' libm.
  *
  * 100 TB posture: computed per row from the document's own sorted
  * symbol list (run-length fold, the [[Repetition]] machinery's
  * shape) — scan → project, NO shuffle, no per-symbol rows in
  * flight. */
object Entropy {

  /** −Σ round(p·log₂p, 9) over the run-lengths of the SORTED symbol
    * list, summed as exact decimals; NULL for an empty list. */
  private def entropyBits(symbols: Column): Column = {
    val sorted = array_sort(symbols)
    val n = size(symbols).cast("double")
    val init = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(BigDecimal(0)).cast("decimal(38,12)").as("acc"))
    def term(run: Column): Column = {
      val p = run.cast("double") / n
      round(p * log(2.0, p), 9).cast("decimal(38,12)")
    }
    // Spark's decimal + narrows scale at p=38 (the result would be
    // (38,11)); every addend here is ≪ 10^26 so the cast back to
    // (38,12) is exact — and keeps the accumulator type stable
    def close(acc: Column): Column = struct(
      acc("prev").as("prev"), acc("run").as("run"),
      (acc("acc") + when(acc("run") > 0, term(acc("run")))
        .otherwise(lit(BigDecimal(0)).cast("decimal(38,12)")))
        .cast("decimal(38,12)").as("acc"))
    val folded = aggregate(sorted, init,
      (acc, x) => when(x === acc("prev"),
        struct(acc("prev").as("prev"), (acc("run") + 1).as("run"),
          acc("acc").as("acc")))
        .otherwise {
          val c = close(acc)
          struct(x.as("prev"), lit(1L).as("run"), c("acc").as("acc"))
        },
      acc => close(acc)("acc"))
    // the folded decimal is EXACT — ship its double unrounded. A final
    // round(…, 6) is not just unnecessary but WRONG here: the 1e-9
    // term grain makes sums landing exactly on a .5e-6 boundary
    // likely, and two engines' double-rounding break that tie
    // differently (measured: 1e-6 flips at sf0.1)
    when(size(symbols) > 0,
      -folded.cast("double")).otherwise(lit(null))
  }

  /** (idCol, char_entropy, token_entropy, n_chars, n_tokens) per
    * non-null-text document.
    *
    * Driven by the one-pass [[graft.expr.EntropyStats]] kernel — one
    * codegen call per document instead of two interpreted sort+fold
    * evaluations (~15× at sf0.1); bit-identical to
    * [[entropyStatsComposed]], spec-asserted. */
  def entropyStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        graft.expr.EntropyStats(col(textCol)).as("_ent"),
        length(col(textCol)).cast("long").as("n_chars"),
        size(toks).cast("long").as("n_tokens"))
      .select(col(idCol),
        col("_ent.char_entropy").as("char_entropy"),
        col("_ent.token_entropy").as("token_entropy"),
        col("n_chars"), col("n_tokens"))
  }

  /** The composed higher-order-function form — the kernel's reference
    * twin; kept for the differential spec ([[entropyStats]] must
    * equal this bit-for-bit). */
  def entropyStatsComposed(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val chars = split(col(textCol), "")
    val toks = split(col(textCol), " ")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        entropyBits(chars).as("char_entropy"),
        entropyBits(toks).as("token_entropy"),
        length(col(textCol)).cast("long").as("n_chars"),
        size(toks).cast("long").as("n_tokens"))
  }
}
