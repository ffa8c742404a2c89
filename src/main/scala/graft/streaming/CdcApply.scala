package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming CDC apply — the canonical lakehouse ingestion pattern: a
  * keyed update stream (op ∈ I/U/D rows carrying absolute values) is
  * MERGE'd into a graft catalog table once per micro-batch, guarded by
  * a per-(query, batch) EPOCH MARKER so a restart-replayed batch is
  * skipped instead of re-applied.
  *
  * Reference surface: the reference pipelines are batch-only (cf.
  * `pipelines/total_distance.py:85-133` — CoGBK then write); this is
  * the streaming-ingestion capability a Spark-native engine adds, and
  * the scale-safe replacement for draining results into driver-side
  * maps: per batch, state lives in the TABLE (merge-on-read deletes +
  * appends via Spark's own MERGE planning), never on the driver.
  *
  * Exactly-once shape, in layers:
  *   - WITHIN a batch: multiple CDC rows per key are compacted
  *     last-writer-wins by `seqCol` BEFORE the merge (`max_by` over a
  *     key group — MERGE requires unique source keys; ties broken by
  *     op so a delete at the same seq wins, deterministically).
  *   - ACROSS batches: Structured Streaming replays an epoch whose
  *     commit wasn't checkpointed. The MERGE itself is idempotent for
  *     absolute-value CDC (re-UPDATE sets the same values; a replayed
  *     INSERT now MATCHES and updates; re-DELETE matches nothing), so
  *     correctness never depends on the marker — but the marker makes
  *     replay a metadata no-op (no table version churn, no file
  *     rewrite) and is the audit trail: `_graft_cdc_epochs/<query>-<n>`
  *     under the table root, exclusive-create AFTER the merge commits,
  *     the same claim discipline as the connector's own streaming-sink
  *     markers (`_graft_epochs/`).
  *
  * 100 TB shape: the per-batch cost is one MERGE — candidate-file
  * pruning scopes the rewrite to files containing touched keys (zone
  * maps / blooms), the update-stream side is batch-sized. Driver holds
  * only the marker check; nothing accumulates across epochs.
  */
object CdcApply {

  /** Marker directory under the table root (underscore-prefixed: the
    * connector's file listing ignores it, like `_graft_epochs`). */
  val EpochDir = "_graft_cdc_epochs"

  /** Compact a CDC micro-batch to one row per key, last-writer-wins by
    * (seq, op) — op desc breaks seq ties so 'U'@5 loses to 'D'@5
    * (a delete emitted for the same seq is the later intent in every
    * CDC encoding that collapses transactions). Deterministic: the
    * (seq, op) pair is unique per key after this, whatever the
    * partition layout. */
  def lastWriterWins(batch: DataFrame, keyCol: String, seqCol: String,
      opCol: String): DataFrame = {
    val dataCols = batch.columns.filter(_ != keyCol)
    batch.groupBy(col(keyCol))
      .agg(max_by(struct(dataCols.map(col).toIndexedSeq: _*),
        struct(col(seqCol),
          when(col(opCol) === "D", 1).otherwise(0))).as("_lww"))
      .select(col(keyCol) +: dataCols.map(c => col(s"_lww.$c")).toIndexedSeq: _*)
  }

  /** Apply ONE micro-batch to `target` (a catalog-qualified graft
    * table at `path`). Returns true if the merge ran, false if the
    * epoch marker showed the batch already applied (restart replay).
    *
    * `dataCols` are the table's non-key columns, set verbatim from the
    * source on UPDATE/INSERT; `opCol`/`seqCol` exist only on the
    * stream side and never land in the table. */
  def applyBatch(spark: SparkSession, target: String, path: String,
      batch: DataFrame, queryName: String, batchId: Long, keyCol: String,
      opCol: String, seqCol: String, dataCols: Seq[String]): Boolean = {
    val markers = new Path(path, EpochDir)
    val marker = new Path(markers, s"$queryName-$batchId")
    val fs = marker.getFileSystem(
      spark.sessionState.newHadoopConf())
    if (fs.exists(marker)) return false // replayed epoch: already applied
    // everything runs on the BATCH's session: under foreachBatch that
    // is the micro-batch's cloned session, whose temp-view catalog the
    // outer session cannot see (and vice versa)
    val ss = batch.sparkSession
    val view = s"_graft_cdc_src_${queryName}_$batchId"
    lastWriterWins(batch, keyCol, seqCol, opCol)
      .createOrReplaceTempView(view)
    val sets = dataCols.map(c => s"t.$c = s.$c").mkString(", ")
    val insCols = (keyCol +: dataCols).mkString(", ")
    val insVals = (keyCol +: dataCols).map(c => s"s.$c").mkString(", ")
    ss.sql(
      s"""MERGE INTO $target t USING $view s
         |ON t.$keyCol = s.$keyCol
         |WHEN MATCHED AND s.$opCol = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET $sets
         |WHEN NOT MATCHED AND s.$opCol <> 'D' THEN
         |  INSERT ($insCols) VALUES ($insVals)""".stripMargin)
    ss.catalog.dropTempView(view)
    // claim AFTER the merge commits: a crash in between replays the
    // batch (idempotent, see scaladoc); a marker without a merge would
    // silently drop the epoch — this ordering can only over-apply,
    // never lose
    fs.mkdirs(markers)
    try fs.create(marker, false).close()
    catch { case _: java.io.IOException => () } // concurrent claim: applied
    true
  }

  /** Wire a streaming CDC source into `target` via foreachBatch: each
    * micro-batch goes through [[applyBatch]] under the stream's own
    * batch ids, so checkpoint-resumed queries keep marker continuity. */
  def sink(spark: SparkSession, source: DataFrame, target: String,
      path: String, queryName: String, keyCol: String, opCol: String,
      seqCol: String, dataCols: Seq[String])
      : org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row] =
    source.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyBatch(spark, target, path, batch, queryName, batchId,
        keyCol, opCol, seqCol, dataCols)
      ()
    }
}
