package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4 / RefinedWeb-style LINE-level boilerplate removal: drop every line
  * that occurs in more than `maxLineDf` distinct documents (navigation
  * chrome, cookie banners, subscribe prompts, copyright footers — the
  * text that survives document-level dedup because each page is unique
  * while its furniture is identical). Raffel et al. 2020 (C4) discard
  * repeated three-sentence spans; Penedo et al. 2023 (RefinedWeb) drop
  * high-document-frequency lines — this is the relational form of that
  * sweep.
  *
  * Scale design (100 TB): the corpus-wide document-frequency pass
  * shuffles ONLY (8-byte line fingerprint, doc id) pairs — never line
  * text. Exactness is restored in a second, candidate-bounded pass:
  * fingerprints whose df exceeds the threshold are recounted by the raw
  * line string at candidate cardinality (boilerplate lines by
  * definition number ≤ |lines| / maxLineDf), so an FNV collision can
  * inflate a candidate's fingerprint-df but can never condemn an
  * innocent line — the same shuffle-hashes-verify-exact shape as the
  * MinHash pipeline. Document reassembly is one per-doc aggregate over
  * position-tagged lines (collect_list skips the nulled-out boilerplate
  * entries; sort_array restores order deterministically).
  *
  * EVERY input doc gets an output row (the engine-wide empty-doc
  * contract, like unigramLogProb): a doc whose lines are all boilerplate
  * comes back with clean_text = '' and n_kept = 0 rather than vanishing.
  *
  * No counterpart in the reference (no text surface); part of graft's
  * LLM-pipeline curation family.
  */
object Boilerplate {

  /** (idCol, clean_text, n_kept, n_dropped) for every input doc.
    *
    * @param maxLineDf a line kept in the corpus may appear in at most
    *        this many distinct documents; above it the line is
    *        boilerplate and is removed everywhere
    */
  def dropFrequentLines(docs: DataFrame, idCol: String, textCol: String,
      maxLineDf: Int): DataFrame = {
    require(maxLineDf >= 1, s"dropFrequentLines: maxLineDf must be >= 1, got $maxLineDf")
    val lines = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("fp", graft.expr.Fingerprint64(col("line")))
    // pass 1: corpus-wide df on the 8-byte fingerprint only
    val fpDf = lines.select(col("fp"), col(idCol)).distinct()
      .groupBy("fp").agg(count(lit(1)).as("fp_df"))
      .filter(col("fp_df") > maxLineDf)
      .select("fp")
    // pass 2: exact recount by raw line, candidate-bounded — immune to
    // fingerprint collisions
    val badLines = lines.join(fpDf, Seq("fp"), "left_semi")
      .select(col("line"), col(idCol)).distinct()
      .groupBy("line").agg(count(lit(1)).as("line_df"))
      .filter(col("line_df") > maxLineDf)
      .select(col("line"), lit(true).as("is_bad"))
    val tagged = lines.join(badLines.withColumnRenamed("is_bad", "__cut"),
      Seq("line"), "left")
    reassemble(docs.select(col(idCol)), tagged, idCol, "line", "\n", "n_dropped")
  }

  /** The shared per-doc reassembly + every-doc sentinel: from tagged
    * units (idCol, pos, `tokCol`, `__cut` — null means KEEP), rebuild
    * each document in position order from its kept units and give EVERY
    * id in `universe` an output row (an all-cut or unit-less doc comes
    * back as ('', 0, n) rather than vanishing — the engine-wide
    * empty-doc contract). One enforcement point for the three
    * furniture/span sweeps that share this tail. */
  private[graft] def reassemble(universe: DataFrame, tagged: DataFrame,
      idCol: String, tokCol: String, sep: String,
      droppedName: String): DataFrame = {
    val rebuilt = tagged.groupBy(col(idCol)).agg(
      array_join(transform(
        sort_array(collect_list( // collect_list drops the nulls = cut units
          when(col("__cut").isNull, struct(col("pos"), col(tokCol))))),
        s => s.getField(tokCol)), sep).as("clean_text"),
      sum(when(col("__cut").isNull, 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("__cut").isNotNull, 1L).otherwise(0L)).as(droppedName))
    universe
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col(droppedName), lit(0L)).as(droppedName))
  }

  /** The maintainable corpus artifact for INCREMENTAL sweeps: the exact
    * (line, line_df) table of boilerplate candidates — every line seen
    * in more than `maxLineDf` distinct documents. Built with the same
    * two-pass shape as [[dropFrequentLines]] (fingerprint df corpus-wide,
    * exact raw-line recount at candidate cardinality, so FNV collisions
    * can never condemn an innocent line) and bounded by construction at
    * ≤ |corpus lines| / maxLineDf rows — small enough to persist daily
    * and broadcast at apply time. */
  def frequentLineStats(docs: DataFrame, idCol: String, textCol: String,
      maxLineDf: Int): DataFrame = {
    require(maxLineDf >= 1, s"frequentLineStats: maxLineDf must be >= 1, got $maxLineDf")
    val lines = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), "\n")).as("line"))
      .withColumn("fp", graft.expr.Fingerprint64(col("line")))
    val fpDf = lines.select(col("fp"), col(idCol)).distinct()
      .groupBy("fp").agg(count(lit(1)).as("fp_df"))
      .filter(col("fp_df") > maxLineDf)
      .select("fp")
    lines.join(fpDf, Seq("fp"), "left_semi")
      .select(col("line"), col(idCol)).distinct()
      .groupBy("line").agg(count(lit(1)).as("line_df"))
      .filter(col("line_df") > maxLineDf)
  }

  /** Incremental (daily-ingest) boilerplate sweep — the
    * [[graft.operators.Dedup.dedupAgainst]] shape for line furniture:
    * drop from `batch` every line the CORPUS already established as
    * boilerplate (`corpusStats` from [[frequentLineStats]], typically
    * yesterday's persisted table), without re-deriving corpus df from
    * scratch. The batch-side plan is one join against the candidate-
    * bounded stats table (broadcast at real scale) + the same per-doc
    * ordered reassembly as [[dropFrequentLines]]; batch-INTERNAL new
    * furniture is out of scope by design (it cannot clear a corpus-df
    * threshold until the periodic full sweep folds the batch in — the
    * standard incremental-curation contract). Output shape and the
    * every-doc/empty-doc contract match [[dropFrequentLines]]. */
  def dropFrequentLinesAgainst(corpusStats: DataFrame, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val bad = corpusStats.select(col("line"), lit(true).as("__cut"))
    val lines = batch
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val tagged = lines.join(bad, Seq("line"), "left")
    reassemble(batch.select(col(idCol)), tagged, idCol, "line", "\n", "n_dropped")
  }

  /** Re-chunk a one-line text column into `wordsPerLine`-word lines —
    * the deterministic "page structure" synthesizer the catalog query
    * uses (the test corpus is single-line word soup; a real crawl
    * arrives with lines). Pure builtin expressions, mirrored 1:1 in the
    * DuckDB oracle. */
  def chunkIntoLines(text: Column, wordsPerLine: Int): Column = {
    val ws = split(text, " ")
    array_join(transform(
      sequence(lit(0), floor((size(ws) - 1).cast("double") / wordsPerLine)
        .cast("long")),
      i => concat_ws(" ", slice(ws, (i * wordsPerLine + 1).cast("int"),
        lit(wordsPerLine)))), "\n")
  }
}
