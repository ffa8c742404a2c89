package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Table-sink drains for streaming results — the scale-safe
  * replacement for collecting micro-batch emissions into driver-side
  * maps: per batch, state lives in a graft TABLE (one transactional
  * MERGE or overwrite per epoch), and the query's result is a
  * relational READBACK of that table. Nothing result-sized ever
  * crosses the driver; what the driver holds is the epoch-marker
  * check, exactly as in [[CdcApply]] (whose marker discipline and
  * idempotency argument this generalizes from keyed I/U/D CDC to the
  * two remaining drain shapes):
  *
  *  - [[upsertSink]]/[[upsertBatch]] — UPDATE-mode drains. Each
  *    micro-batch of an update-mode aggregation emits the keys it
  *    changed, each exactly once, carrying the key's latest aggregate
  *    (absolute values, never deltas) — precisely a CDC update stream
  *    without ops or seqs. One MERGE per batch upserts the emissions
  *    on a COMPOSITE key; a replayed epoch re-sets the same values
  *    (idempotent), and the post-merge marker makes the replay a
  *    metadata no-op. The same entry point drains per-row transform
  *    results (scored documents) and per-batch partial aggregates
  *    (keyed by (group, epoch)) — anything whose batches are
  *    key-unique upserts.
  *
  *  - [[overwriteSink]] — COMPLETE-mode drains. Complete mode re-emits
  *    the ENTIRE state per batch, so each epoch truncate-overwrites
  *    the table in one rewrite commit; the final table IS the final
  *    state, and a replayed epoch overwrites with identical content
  *    (idempotent by construction, no marker needed).
  *
  * 100 TB shape: the MERGE's rewrite is scoped by candidate-file
  * pruning to files containing touched keys; the update-stream side is
  * batch-sized; the readback is an ordinary pruned scan. Aggregate
  * state (windows × keys) lives distributed in the state store during
  * the run and in the table after it — the driver never materializes
  * either. */
object TableDrain {

  /** Marker directory under the table root (underscore-prefixed —
    * invisible to the connector's file listing, like
    * [[CdcApply.EpochDir]]). */
  val EpochDir = "_graft_upsert_epochs"

  /** The warehouse-backed `graft_lake` catalog MERGE needs (MERGE INTO
    * plans against catalog tables, not paths). Registration is
    * idempotent; returns (catalogName, warehousePath). */
  def ensureCatalog(spark: SparkSession): (String, String) = {
    val cat = "graft_lake"
    val warehouse = s"${sys.props("java.io.tmpdir")}/graft_warehouse"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    (cat, warehouse)
  }

  /** Birth the drain target as an empty table (a zero-row schema
    * carrier, v1) so the first micro-batch can MERGE into it. */
  def create(spark: SparkSession, target: String, schema: StructType): Unit =
    spark.sql(s"CREATE TABLE $target (${schema.toDDL})")

  /** MERGE one micro-batch of key-unique upsert rows into `target` (a
    * catalog-qualified graft table rooted at `path`). Returns false if
    * the epoch marker showed the batch already applied. Column order:
    * `keyCols ++ dataCols` must cover every batch column that lands in
    * the table. */
  def upsertBatch(spark: SparkSession, target: String, path: String,
      batch: DataFrame, queryName: String, batchId: Long,
      keyCols: Seq[String], dataCols: Seq[String]): Boolean = {
    val markers = new Path(path, EpochDir)
    val marker = new Path(markers, s"$queryName-$batchId")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(marker)) return false // replayed epoch: already applied
    // run on the BATCH's session — under foreachBatch that is the
    // micro-batch's cloned session with its own temp-view catalog
    val ss = batch.sparkSession
    // sanitize: temp-view names reject hyphens etc. (queryName may
    // carry a raw UUID); the marker file keeps the caller's exact name
    val view = s"_graft_upsert_src_${queryName}_$batchId"
      .replaceAll("[^A-Za-z0-9_]", "_")
    batch.createOrReplaceTempView(view)
    val on = keyCols.map(k => s"t.$k = s.$k").mkString(" AND ")
    val sets = dataCols.map(c => s"t.$c = s.$c").mkString(", ")
    val insCols = (keyCols ++ dataCols).mkString(", ")
    val insVals = (keyCols ++ dataCols).map(c => s"s.$c").mkString(", ")
    ss.sql(
      s"""MERGE INTO $target t USING $view s
         |ON $on
         |WHEN MATCHED THEN UPDATE SET $sets
         |WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)"""
        .stripMargin)
    ss.catalog.dropTempView(view)
    // claim AFTER the merge commits — a crash in between replays the
    // batch, which re-sets the same absolute values (idempotent); a
    // marker without a merge would silently drop the epoch
    fs.mkdirs(markers)
    try fs.create(marker, false).close()
    catch { case _: java.io.IOException => () } // concurrent claim
    true
  }

  /** foreachBatch wiring for [[upsertBatch]], preserving the stream's
    * own batch ids for marker continuity across checkpoint resumes.
    * `transform` runs per batch BEFORE the merge (batch semantics —
    * e.g. model scoring or partial aggregation that update-mode plans
    * can't express); identity by default. */
  def upsertSink(spark: SparkSession, source: DataFrame, target: String,
      path: String, queryName: String, keyCols: Seq[String],
      dataCols: Seq[String],
      transform: (DataFrame, Long) => DataFrame = (b, _) => b)
      : org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row] =
    source.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      upsertBatch(spark, target, path, transform(batch, batchId),
        queryName, batchId, keyCols, dataCols)
      ()
    }

  /** foreachBatch wiring for COMPLETE-mode drains: each epoch
    * truncate-overwrites the table with the full re-emitted state (one
    * rewrite commit via the connector's TRUNCATE capability); the last
    * epoch leaves the final state. Replay-idempotent without markers —
    * overwriting with identical content is a no-op result-wise. */
  def overwriteSink(path: String,
      transform: (DataFrame, Long) => DataFrame = (b, _) => b)
      : (DataFrame => org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row]) =
    (source: DataFrame) =>
      source.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        transform(batch, batchId).write
          .format("graft.sources.GraftParquetTableProvider")
          .option("path", path).mode("overwrite").save()
        ()
      }

  /** Readback of a drained target through the connector. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graft.sources.GraftParquetTableProvider")
      .option("path", path).load()
}
