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
}
