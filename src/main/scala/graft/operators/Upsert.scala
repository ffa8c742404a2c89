package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-wins key compaction — the batch core of a lakehouse MERGE/upsert:
  * given a changelog of keyed rows with a version column, keep exactly the
  * newest row per key. This is the primitive behind CDC snapshotting,
  * dedup-on-ingest, and Structured Streaming's foreachBatch upsert sink
  * ([[graft.streaming.StatefulOps]] composes it there).
  *
  * Implementation is ONE argmax aggregate ([[graft.expr.ArgMaxAgg]])
  * ordered by struct(version, tieBreak) — NOT the textbook
  * row_number()-over-window form. The
  * difference is the 100 TB story:
  *   - window form: full shuffle of every changelog row to its key's
  *     partition, then a per-partition SORT of everything, then discard
  *     all but one row per key;
  *   - aggregate form: map-side partial aggregation keeps ONE candidate
  *     row per key per task, so the exchange carries ≤ (keys ×
  *     map tasks) rows and nothing is ever sorted (ObjectHashAggregate,
  *     plan-asserted — max over a struct would silently degrade to
  *     SortAggregate, struct buffers not being hash-aggregable).
  * The ordering key is (version, tieBreak) lexicographic; with a unique
  * tieBreak (an event id) the result is a deterministic pure function of
  * the row SET — partitioning, order, and retries cannot move it. (A
  * non-unique (version, tieBreak) leaves the winner engine-chosen among
  * the tied rows — supply a genuinely unique tie-break.)
  *
  * No counterpart in the reference (append-only pipelines); part of
  * graft's pipeline surface — an LLM corpus refreshed from crawl deltas
  * compacts exactly like this.
  */
object Upsert {

  /** Newest row per key set. `versionCol` orders versions (timestamp or
    * monotonic long); `tieBreakCol` must be unique per (keys, version)
    * for full determinism (equal versions resolve to the greatest
    * tieBreak). Output columns = input columns, in input order. */
  def latestByKey(df: DataFrame, keys: Seq[String], versionCol: String,
      tieBreakCol: String): DataFrame = {
    require(keys.nonEmpty, "latestByKey: need at least one key column")
    val nonKeys = df.columns.filterNot(keys.contains).toSeq
    val out = df
      .groupBy(keys.map(col): _*)
      .agg(graft.expr.ArgMaxAgg(
        struct(col(versionCol), col(tieBreakCol)),
        struct(nonKeys.map(col): _*)).as("_latest"))
    df.columns.foldLeft(out) { (acc, c) =>
      if (keys.contains(c)) acc
      else acc.withColumn(c, col(s"_latest.$c"))
    }.drop("_latest").select(df.columns.map(col): _*)
  }

  /** Snapshot DIFF — the change-data-capture view between two corpus
    * versions: which keys were added, removed, or changed (content
    * compared by a caller-supplied hash/version expression — an 8-byte
    * fingerprint for text corpora, so the comparison join shuffles
    * (key, 8 bytes) per side, never payloads). Unchanged keys are
    * omitted: the diff of two 100 TB snapshots that barely differ is
    * small, and that asymmetry is the whole point (feed the `added` ∪
    * `changed` slice to incremental dedup via `Dedup.dedupAgainst`
    * instead of reprocessing the world).
    *
    * @param hashOf content hash/version expression, evaluated against
    *        each side's rows (e.g. `Fingerprint64(col("text"))`)
    * @return (keyCol, change ∈ 'added' | 'removed' | 'changed')
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      hashOf: org.apache.spark.sql.Column): DataFrame = {
    // Presence is carried by explicit lit(true) markers, NOT hash nullness:
    // hashOf may legitimately evaluate to NULL (e.g. Fingerprint64 over a
    // null text), and a null hash must not make a present key look absent.
    val o = oldDf.select(col(keyCol), hashOf.as("__old_h"), lit(true).as("__in_old"))
    val n = newDf.select(col(keyCol), hashOf.as("__new_h"), lit(true).as("__in_new"))
    o.join(n, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          // null-safe inequality: NULL vs non-NULL counts as changed,
          // NULL vs NULL as unchanged.
          .when(!(col("__old_h") <=> col("__new_h")), lit("changed"))
          .as("change"))
      .filter(col("change").isNotNull) // unchanged keys drop out
  }
}
