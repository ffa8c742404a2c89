package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming faces of the engine's transforms.
  *
  * The reference flips `streaming = True` on its pipeline options but never
  * consumes an unbounded source (SURVEY §2.10 — the flag is vestigial,
  * `notebooks/development.ipynb` cell 2). The capability the reference
  * *gestures at* is the Beam unified model: the same transform graph on
  * bounded and unbounded data. Structured Streaming gives graft exactly
  * that — these builders take any DataFrame (batch or `readStream`-backed)
  * and return the same logical plan, so each is spec-tested for
  * batch/stream parity.
  *
  * Scale notes: state stores are keyed by the same columns the batch
  * aggregation shuffles on — watermarks bound state size (late data beyond
  * the watermark is dropped, documented per-operator); sliding windows
  * multiply state by (window/slide), so default to tumbling.
  */
object StreamingRoutes {

  /** Windowed route counts — the streaming face of
    * [[graft.operators.RideCounts.countPerPair]]: COUNT(*) per
    * (time window, start, end). Tumbling when `slide` == `windowDur`.
    *
    * @param tsCol      event-time column (TimestampType)
    * @param watermark  max event-time lateness before state is finalized
    */
  def windowedRouteCounts(rides: DataFrame, tsCol: String,
      startCol: String, endCol: String,
      windowDur: String, watermark: String): DataFrame =
    rides
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(startCol), col(endCol))
      .agg(count(lit(1)).as("amount_of_rides"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(startCol), col(endCol), col("amount_of_rides"))

  /** Per-user session aggregation — the streaming face of
    * [[graft.EventQueries.qSessions]]'s gap sessionization, via the native
    * `session_window` (state closes `gap` after the last event). */
  def sessionStats(events: DataFrame, tsCol: String, userCol: String,
      gap: String, watermark: String, valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(28,10)")).cast("double").as("total_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(userCol), col("n_events"), col("total_value"))

  /** Stream-static enrichment: left-join dimension attributes onto a
    * stream — the canonical "events ⋈ dimension table" shape. Stateless
    * (no watermark or state store): Spark re-resolves the static side
    * every micro-batch, and the broadcast hint keeps the join map-side,
    * so the stream never shuffles for the enrichment. Composes freely
    * with the windowed aggregations above (enrich → window → agg in one
    * streaming query). */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), keys, "left")

  /** Stream-STREAM inner join within a time bound: pair each left row
    * with the right rows of the same key whose event time falls in
    * [left.ts, left.ts + within] — the funnel/attribution shape
    * ("purchase within an hour of the view"). Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * Spark can expire buffered state: left rows age out once the right
    * watermark passes their ts + within, right rows symmetrically —
    * WITHOUT the time-range condition state would grow forever, which is
    * why `within` is a required parameter, not an option. Column names
    * of the two sides must be disjoint apart from `keyCol` (output
    * carries both ts columns as `tsCol` and `${tsCol}_right`).
    *
    * @param within SQL interval literal body, e.g. "1 hour"
    */
  def joinWithin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, within: String, watermark: String): DataFrame = {
    val l = left.withWatermark(tsCol, watermark).alias("l")
    val r = right.withWatermark(tsCol, watermark)
      .withColumnRenamed(tsCol, s"${tsCol}_right").alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.${tsCol}_right") >= col(s"l.$tsCol") &&
        col(s"r.${tsCol}_right") <= col(s"l.$tsCol") + expr(s"INTERVAL $within"))
      .drop(col(s"r.$keyCol"))
  }

  /** Streaming exact dedup: drop any row whose content fingerprint was
    * already seen within the watermark horizon — `dropDuplicates` backed
    * by a keyed state store holding only the 8-byte fingerprint. */
  def streamingDedup(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String): DataFrame =
    docs
      .withColumn("__graft_fp", graft.expr.Fingerprint64(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__graft_fp")
      .drop("__graft_fp") // output schema == input schema

  /** Streaming upsert sink: maintain a latest-wins parquet snapshot of a
    * keyed changelog via foreachBatch — each micro-batch is compacted
    * with [[graft.operators.Upsert.latestByKey]] against the current
    * snapshot (read, union, re-compact, atomically swap directories).
    * This is the MERGE-into-table pattern without a table format:
    * exactly-once per batch because the swap is the only visible effect
    * and replaying a batch recomputes the identical snapshot
    * (latestByKey is idempotent over re-delivered rows).
    *
    * Scale note: each batch re-compacts snapshot ∪ delta — the honest
    * cost of upsert on a format without row-level merge (Delta/Iceberg
    * pay it in deferred form as merge-on-read + compaction). The
    * aggregate form keeps the exchange at ≤ keys × tasks rows, and a
    * production deployment would partition the snapshot by key range so
    * a batch rewrites only the partitions its delta touches. */
  def upsertSink(changelog: DataFrame, keys: Seq[String], versionCol: String,
      tieBreakCol: String, snapshotDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    changelog.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // Hadoop FileSystem resolved from the path — the same resolution
        // the parquet writer uses, so file:/, hdfs:/, s3a:/ snapshot
        // locations all behave identically (java.io.File would silently
        // see "absent" for any non-local URI and abort the stream on the
        // final rename)
        val snap = new org.apache.hadoop.fs.Path(snapshotDir)
        val fs = snap.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val cur =
          if (fs.exists(snap)) spark.read.parquet(snapshotDir)
          else batch.limit(0)
        val next = graft.operators.Upsert.latestByKey(
          cur.unionByName(batch), keys, versionCol, tieBreakCol)
        val tmp = new org.apache.hadoop.fs.Path(snapshotDir + "_tmp")
        next.write.mode("overwrite").parquet(tmp.toString)
        // two-rename swap: a concurrent reader can observe a brief
        // absence between retire and publish — acceptable for a derived
        // snapshot (readers retry); a table format (Delta/Iceberg) is
        // the answer when readers need a seamless cutover
        val old = new org.apache.hadoop.fs.Path(snapshotDir + "_old")
        if (fs.exists(old)) fs.delete(old, true)
        if (fs.exists(snap) && !fs.rename(snap, old))
          sys.error(s"upsertSink: could not retire $snapshotDir")
        if (!fs.rename(tmp, snap))
          sys.error(s"upsertSink: could not publish $tmp")
        ()
      }
      .start()
  }
}
