package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** CONTINUOUS CDC TAILING — the change feed as a live pipeline: a
  * Structured Streaming query over the source's version feed
  * ([[GraftVersionFeed]]) that, per committed version, materializes
  * that commit's row-level images ([[GraftMaintenance.changeFeedRows]]
  * — insert/delete pairs for updates, the full writer alphabet) and
  * appends them to a sink graft table, stamped `_commit_version`.
  *
  * Exactly-once to the sink: each micro-batch's append carries a
  * `txnId` of `<appId>-<batchId>`, so a replayed batch (foreachBatch
  * is at-least-once under failure recovery) re-arrives with the same
  * id and the commit drops it — the idempotent-append marker
  * discipline, composed with the version feed's restart-stable
  * version-number offsets. Per-trigger cost: O(changed files of the
  * new versions), never the table; `maxVersionsPerTrigger` bounds a
  * catch-up burst.
  *
  * This is the rewrite-tolerant sibling of streaming the table
  * directly: DELETE/MERGE/compact commits flow as per-commit image
  * sets where the row stream's append-only contract must refuse.
  * Reference context: the reference re-reads whole tables per run
  * (`/root/reference/pipelines/total_distance.py:92-95`); this ships
  * only what each commit changed. */
object GraftCdc {

  private val fmt = "graft.sources.GraftParquetTableProvider"

  /** Start the tail. `appId` namespaces the sink's idempotence markers
    * — two different queries feeding ONE sink need distinct appIds (a
    * shared id would drop the second query's batches as replays). */
  def stream(spark: SparkSession, table: String, sink: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxVersionsPerTrigger: Option[Int] = None,
      appId: String = "graft-cdc"): StreamingQuery = {
    require(appId.matches("[A-Za-z0-9._-]{1,150}"),
      s"graft cdc: appId '$appId' must match [A-Za-z0-9._-]{1,150}")
    var r = spark.readStream.format(fmt).option("path", table)
      .option(GraftVersionFeed.OptionKey, "true")
    maxVersionsPerTrigger.foreach(k =>
      r = r.option(GraftVersionFeed.MaxPerTriggerKey, k.toString))
    r.load().writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val versions = b.select("version").collect()
          .map(_.getLong(0)).sorted
        if (versions.nonEmpty) {
          // per-COMMIT images (not one span diff — a span would net
          // out a row inserted then deleted inside the batch)
          versions.map { v =>
            GraftMaintenance.changeFeedRows(spark, table, v - 1, v)
              .withColumn("_commit_version", lit(v))
          }.reduce(_ unionByName _)
            .write.format(fmt).option("path", sink)
            .option("txnId", s"$appId-$batchId")
            .mode("append").save()
        }
        ()
      }.start()
  }
}
