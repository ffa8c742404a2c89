package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Streaming catalog entries — REAL Structured Streaming queries under
  * the DuckDB oracle gate. SURVEY §2.10's streaming surface was
  * previously spec-only (batch/stream MemoryStream parity); these
  * entries drain an actual `readStream` → stateful-aggregation →
  * `foreachBatch` pipeline to a final state and hash-check that state
  * against the oracle computing the same result relationally over the
  * same parquet — so the streaming runtime (file source, watermarked
  * window state store, update-mode incremental emission, AvailableNow
  * termination) is on the correctness hook, not just the logical plan.
  */
object StreamingQueries {

  /** `events.ts`, whatever the parquet encodes, as a proper
    * TimestampType column for the streaming window machinery — the
    * TIMESTAMP twin of [[graft.core.Tables.eventsMicros]] (same three
    * encodings, same UTC-pinned session contract). */
  private def tsAsTimestamp(df: DataFrame): org.apache.spark.sql.Column =
    df.schema("ts").dataType match {
      case LongType         => timestamp_micros(expr("ts div 1000L"))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other")
    }

  /** Tumbling 1-hour event counts + decimal-exact value sums, computed
    * BY THE STREAMING ENGINE: file-source readStream over the same
    * events parquet, watermark + `window()` aggregation (a real keyed
    * state store), update-mode foreachBatch upserting each emitted
    * (window, event_type) aggregate into a driver-side map, AvailableNow
    * trigger to drain the source, then the final map as the result.
    * Upsert-latest makes the result independent of how the source splits
    * micro-batches: each batch re-emits the groups it changed, and the last
    * emission per key IS that key's final aggregate (decimal partial
    * sums in state are order-exact). The oracle is the SAME SQL as the
    * batch twin `q_events_tumbling_1h` minus nothing — if the streaming
    * state store dropped, duplicated, or mis-windowed one event, the
    * hash breaks.
    *
    * Scale note: what crosses to the driver is the AGGREGATE state
    * (windows × event types), model-scale by construction — the same
    * cardinality any streaming sink would publish; rows never collect. */
  val qStreamTumbling = QueryDef("q_stream_tumbling_1h",
    (spark, dir) => {
      import spark.implicits._
      val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
      val ckpt = s"${sys.props("java.io.tmpdir")}/graft_stream_ckpt_" +
        java.util.UUID.randomUUID().toString
      // the file stream source wants a DIRECTORY; glob-filter it down to
      // the events table (the other tables in the sf dir stay invisible)
      val src = spark.readStream.schema(batchSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
      // Watermark WIDER than the dataset's time span, deliberately: the
      // oracle gate needs the final state to be micro-batch-split
      // INVARIANT, and a tight watermark makes the result depend on file
      // arrival order (an event behind max-seen-ts − delay is dropped as
      // late — correct streaming semantics, wrong property for a
      // deterministic oracle row). The state-store machinery is still
      // fully exercised (EventTimeWatermark + keyed window state);
      // lateness DROPPING is covered by spec, not by this entry.
      val agg = src
        .withColumn("ts", tsAsTimestamp(src))
        .withWatermark("ts", "3650 days")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(28,10)")).as("total_value_dec"))
        .select(unix_micros(col("window.start")).as("window_start"),
          col("event_type"), col("n"),
          col("total_value_dec").cast("double").as("total_value"))
      val acc = new java.util.concurrent.ConcurrentHashMap[
        (Long, String), (Long, Double)]()
      val q = agg.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.collect().foreach { r =>
            acc.put((r.getLong(0), r.getString(1)),
              (r.getLong(2), r.getDouble(3)))
          }
        }
        .start()
      try q.awaitTermination() finally {
        // checkpoint state is per-run scratch — the query result is the
        // drained map, not a resumable stream
        val p = new org.apache.hadoop.fs.Path(ckpt)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
      import scala.jdk.CollectionConverters._
      acc.asScala.toSeq
        .map { case ((w, t), (n, v)) => (w, t, n, v) }
        .toDF("window_start", "event_type", "n", "total_value")
        .orderBy("window_start", "event_type")
    },
    // identical mirror to the batch twin q_events_tumbling_1h: the
    // streaming engine must land on the very same result set
    Some("""SELECT epoch_us(ts)
           |         - (((epoch_us(ts) % 3600000000) + 3600000000) % 3600000000)
           |         AS window_start,
           |       event_type, CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
           |FROM events
           |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin))

  def all: Seq[QueryDef] = Seq(qStreamTumbling)
}
