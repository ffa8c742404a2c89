package graft.streaming

import org.apache.spark.sql.functions._
import graft.core.GraftSession

/** Runnable streaming demo: rate source → synthetic (start, end) route
  * events → tumbling-window counts → in-memory sink, printed after a few
  * batches. Proves the unified model end to end on an actually-unbounded
  * source (the reference only ever SET the streaming flag — SURVEY §2.10).
  *
  * Honesty note on modes: this demo uses `complete` output so the final
  * table shows every window of the short run — in complete mode Spark
  * RETAINS all aggregation state and the watermark does not evict
  * (that's fine for a bounded demo run, wrong for production). The
  * watermark-actually-evicts path is exercised by the append-mode
  * `dropDuplicatesWithinWatermark` spec and the keyed-state timeout in
  * [[StatefulOps]].
  *
  * `runMain graft.streaming.StreamDemo [seconds]`
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val runSeconds = args.headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.getOrCreate("graft-stream-demo")
    import spark.implicits._

    val rides = spark.readStream
      .format("rate")
      .option("rowsPerSecond", 500)
      .load()
      .select(
        col("timestamp"),
        pmod(col("value"), lit(20)).as("start_station_id"),
        pmod(col("value") * 7 + 3, lit(20)).as("end_station_id"))

    val counts = StreamingRoutes.windowedRouteCounts(
      rides, "timestamp", "start_station_id", "end_station_id",
      windowDur = "5 seconds", watermark = "2 seconds")

    val q = counts.writeStream
      .format("memory").queryName("route_counts")
      .outputMode("complete")
      .start()
    try {
      Thread.sleep(runSeconds * 1000L)
      q.processAllAvailable()
      val out = spark.table("route_counts")
        .orderBy(desc("amount_of_rides"), col("window_start"))
      println(s"=== windowed route counts after ${runSeconds}s ===")
      out.show(10, truncate = false)
      println(s"total windows+routes: ${out.count()}")
    } finally q.stop()
    spark.stop()
  }
}
