package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingRoutes

/** Batch/stream parity specs: the same StreamingRoutes plan over a
  * MemoryStream must reproduce the batch answer on the same data —
  * the unified-model capability SURVEY §2.10 calls for. */
// Top-level so Spark can synthesize encoders without an outer scope.
case class Ride(ts: Timestamp, start: String, end: String)
case class Ev(ts: Timestamp, user_id: Long, value: Double)
case class Doc(ts: Timestamp, text: String)
case class View(ts: Timestamp, user_id: Long, page: String)
case class Buy(ts: Timestamp, user_id: Long, amount: Double)

class StreamingSpec extends SparkSpec {

  private def t(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val rides = Seq(
    Ride(t(1), "A", "B"), Ride(t(2), "A", "B"), Ride(t(3), "C", "D"),
    Ride(t(11), "A", "B"), Ride(t(12), "C", "D"), Ride(t(13), "C", "D"))

  test("windowedRouteCounts: stream result equals batch result") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val stream = MemoryStream[Ride]
    stream.addData(rides: _*)
    val q = StreamingRoutes
      .windowedRouteCounts(stream.toDF(), "ts", "start", "end",
        windowDur = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("routes")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("routes")
      .select("window_start", "start", "end", "amount_of_rides")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet

    val batch = StreamingRoutes
      .windowedRouteCounts(rides.toDF(), "ts", "start", "end",
        windowDur = "10 minutes", watermark = "5 minutes")
      .select("window_start", "start", "end", "amount_of_rides")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet

    assert(streamed == batch)
    assert(batch == Set(
      (t(0), "A", "B", 2L), (t(0), "C", "D", 1L),
      (t(10), "A", "B", 1L), (t(10), "C", "D", 2L)))
  }

  test("enrichWithStatic: stream-dim join + windowed agg equals batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val dim = Seq(("A", "north"), ("C", "south")).toDF("start", "zone")
    def plan(rides: org.apache.spark.sql.DataFrame) =
      StreamingRoutes.windowedRouteCounts(
        StreamingRoutes.enrichWithStatic(rides, dim, Seq("start")),
        "ts", "zone", "end", windowDur = "10 minutes", watermark = "5 minutes")

    val stream = MemoryStream[Ride]
    stream.addData(rides: _*)
    val q = plan(stream.toDF())
      .writeStream.format("memory").queryName("enriched_routes")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    def collect(df: org.apache.spark.sql.DataFrame) = df
      .select("window_start", "zone", "end", "amount_of_rides")
      .collect().map(r =>
        (r.getTimestamp(0), r.getString(1), r.getString(2), r.getLong(3))).toSet

    val streamed = collect(spark.table("enriched_routes"))
    val batch = collect(plan(rides.toDF()))
    assert(streamed == batch)
    assert(batch == Set(
      (t(0), "north", "B", 2L), (t(0), "south", "D", 1L),
      (t(10), "north", "B", 1L), (t(10), "south", "D", 2L)))
  }

  test("sessionStats: session_window closes after the gap") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val stream = MemoryStream[Ev]
    // user 1: events at 10:01, 10:03 (one session), 10:30 (a second)
    stream.addData(Ev(t(1), 1L, 1.0), Ev(t(3), 1L, 2.0), Ev(t(30), 1L, 4.0))
    val q = StreamingRoutes
      .sessionStats(stream.toDF(), "ts", "user_id",
        gap = "10 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("sessions")
      .select("user_id", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((1L, 2L, 3.0), (1L, 1L, 4.0)))
  }

  test("streamingDedup drops repeated content within the watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val stream = MemoryStream[Doc]
    stream.addData(Doc(t(1), "same text"), Doc(t(2), "same text"),
      Doc(t(3), "other text"))
    val q = StreamingRoutes
      .streamingDedup(stream.toDF(), "ts", "text", watermark = "10 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val texts = spark.table("deduped").select("text")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(texts == Seq("other text", "same text"))
  }

  test("streamingDedup: cross-batch state drops redeliveries; " +
      "eviction re-admits past the horizon (state stays bounded)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def at(s: String) = Timestamp.valueOf(s)

    val stream = MemoryStream[Doc]
    val q = StreamingRoutes
      .streamingDedup(stream.toDF(), "ts", "text", watermark = "10 minutes")
      .writeStream.format("memory").queryName("deduped_x")
      .outputMode("append").start()
    def drain(docs: Doc*): Unit = { stream.addData(docs: _*); q.processAllAvailable() }
    try {
      // batch 1 seeds the state; batch 2's verbatim redelivery (5 min
      // later, inside the 10 min horizon) can only drop against state
      // REMEMBERED from batch 1 — within-batch distinct can't see it
      drain(Doc(at("2024-01-01 10:00:00"), "dup"))
      drain(Doc(at("2024-01-01 10:05:00"), "dup"),
        Doc(at("2024-01-01 10:05:00"), "fresh"))
      // batch 3 advances the watermark to 10:50 — "dup"'s entry
      // (event time 10:00 + 10 min horizon) is now evictable, which is
      // the 100 TB property: state is horizon-bounded, not corpus-bounded
      drain(Doc(at("2024-01-01 11:00:00"), "advance"))
      // batch 4: the SAME content re-arrives past the horizon — it must
      // be re-admitted (dedup-within-watermark, not global dedup)
      drain(Doc(at("2024-01-01 11:01:00"), "dup"))
    } finally q.stop()

    val texts = spark.table("deduped_x").select("text")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(texts == Seq("advance", "dup", "dup", "fresh"),
      s"got $texts — expected one in-horizon drop and one post-eviction re-admit")
  }

  test("joinWithin: stream-stream time-bounded join equals the batch join") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val views = Seq(
      View(t(0), 1L, "p1"), View(t(5), 1L, "p2"),
      View(t(0), 2L, "p3"), View(t(40), 1L, "p4"))
    val buys = Seq(
      Buy(t(8), 1L, 9.99),   // within 10m of p1 AND p2
      Buy(t(30), 2L, 5.0),   // too late for p3
      Buy(t(45), 1L, 1.0))   // within 10m of p4 only

    val vs = MemoryStream[View]; vs.addData(views: _*)
    val bs = MemoryStream[Buy]; bs.addData(buys: _*)
    val q = StreamingRoutes
      .joinWithin(vs.toDF(), bs.toDF(), "user_id", "ts",
        within = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), r.getAs[String]("page"), r.getAs[Double]("amount"))
    val streamed = spark.table("attributed").collect().map(key).toSet
    val batch = StreamingRoutes
      .joinWithin(views.toDF(), buys.toDF(), "user_id", "ts",
        within = "10 minutes", watermark = "5 minutes")
      .collect().map(key).toSet
    assert(streamed == batch)
    assert(batch == Set(
      (1L, "p1", 9.99), (1L, "p2", 9.99), (1L, "p4", 1.0)))
    // the join buffers state but the range condition lets it expire:
    // the running query made progress and terminated cleanly (above),
    // which with unbounded state on this watermark setup it would not
  }

  test("TopKAgg composes with streaming windowed aggregation (stream == batch)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // per 10-min window: top-2 users by event value, via the custom
    // typed aggregate INSIDE a watermarked streaming groupBy — proving
    // graft's TypedImperativeAggregates ride Structured Streaming's
    // partial/merge machinery like any built-in
    val evs = Seq(
      Ev(t(1), 1L, 5.0), Ev(t(2), 2L, 9.0), Ev(t(3), 3L, 7.0),
      Ev(t(4), 1L, 1.0), Ev(t(12), 1L, 2.0), Ev(t(13), 2L, 8.0))
    def topk(df: org.apache.spark.sql.DataFrame) = df
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(graft.expr.TopKAgg(col("value"), col("user_id"), 2).as("top"))
      .select(col("window.start").as("ws"),
        expr("transform(top, e -> e.payload)").as("users"))
    val stream = MemoryStream[Ev]
    stream.addData(evs: _*)
    val q = topk(stream.toDF()).writeStream.format("memory")
      .queryName("stream_topk").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getSeq[Long](1).toList)
    val streamed = spark.table("stream_topk").collect().map(key).toSet
    val batch = topk(evs.toDF()).collect().map(key).toSet
    assert(streamed == batch)
    assert(batch == Set(
      (t(0), List(2L, 3L)),   // 9.0 (u2), 7.0 (u3)
      (t(10), List(2L, 1L)))) // 8.0 (u2), 2.0 (u1)
  }

  test("DdQuantileAgg composes with streaming aggregation (stream == batch)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // the mergeable-sketch payoff: bucket counts ride the streaming
    // partial/merge machinery; the final estimates equal the batch run
    val evs = (1 to 200).map(i => Ev(t(i % 8), (i % 3).toLong, i.toDouble))
    def sk(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("user_id")
      .agg(graft.expr.DdQuantileAgg(col("value"), 0.01, Seq(0.5, 0.9)).as("e"))
    val stream = MemoryStream[Ev]
    // two batches so merge() really runs across micro-batch state
    stream.addData(evs.take(100): _*)
    val q = sk(stream.toDF()).writeStream.format("memory")
      .queryName("stream_ddq").outputMode("complete").start()
    try {
      q.processAllAvailable()
      stream.addData(evs.drop(100): _*)
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getSeq[Double](1).toList)
    assert(spark.table("stream_ddq").collect().map(key).toSet ==
      sk(evs.toDF()).collect().map(key).toSet)
  }

  test("HllAgg + sketch partials compose with streaming aggregation " +
    "(stream == batch, merge across micro-batch state)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // streaming distinct-count: constant m-byte state per group however
    // many events arrive — the streaming payoff of a mergeable sketch
    val evs = (1 to 300).map(i => Ev(t(i % 8), (i % 3).toLong, (i % 90).toDouble))
    // both faces in the same streaming agg: the estimate aggregate AND
    // the sketch partial (serialized/merged as micro-batch state) read
    // through hll_estimate — they must agree row for row
    def est(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("user_id")
      .agg(
        graft.expr.HllAgg(
          graft.expr.Fingerprint64(col("value").cast("string")), 10).as("e"),
        graft.expr.HllAgg.estimate(graft.expr.HllAgg.sketch(
          graft.expr.Fingerprint64(col("value").cast("string")), 10))
          .as("e_sketch"))
    val stream = MemoryStream[Ev]
    stream.addData(evs.take(150): _*)
    val q = est(stream.toDF()).writeStream.format("memory")
      .queryName("stream_hll").outputMode("complete").start()
    try {
      q.processAllAvailable()
      stream.addData(evs.drop(150): _*) // second batch: merge() runs on state
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val streamed = spark.table("stream_hll").collect().map(key).toSet
    assert(streamed == est(evs.toDF()).collect().map(key).toSet)
    streamed.foreach { case (_, e, eSk) =>
      assert(e == eSk, s"sketch face diverged from estimate face: $e vs $eSk")
      // and the values are sane: 30 distinct per user_id residue class
      assert(math.abs(e - 30.0) < 8.0, e)
    }
  }

  test("upsertSink: snapshot converges to batch latestByKey across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val snap = "/tmp/graft_upsert_snapshot"
    val ckpt = "/tmp/graft_upsert_ckpt"
    for (d <- Seq(snap, snap + "_tmp", snap + "_old", ckpt))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))

    // two deliveries for user 1 in DIFFERENT batches (later wins), an
    // in-batch duplicate version for user 2 (tie-break on event id), and
    // an out-of-order late row for user 1 (must NOT win)
    val b1 = Seq(Ev(t(1), 1L, 10.0), Ev(t(2), 2L, 20.0))
    val b2 = Seq(Ev(t(5), 1L, 11.0), Ev(t(2), 2L, 21.0), Ev(t(0), 1L, 9.0))

    val stream = MemoryStream[Ev]
    val q = StreamingRoutes.upsertSink(stream.toDF(), Seq("user_id"), "ts",
      "value", snap, ckpt)
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      val afterB1 = spark.read.parquet(snap)
        .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
      assert(afterB1 == Map(1L -> 10.0, 2L -> 20.0))
      stream.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val snapshot = spark.read.parquet(snap)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    val batch = graft.operators.Upsert.latestByKey(
      (b1 ++ b2).toDF(), Seq("user_id"), "ts", "value")
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    assert(snapshot == batch)
    assert(snapshot == Map(1L -> 11.0, 2L -> 21.0))
  }

  test("streamingNearDup: incremental candidates equal the batch band join, " +
    "across micro-batch boundaries") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val minEst = 0.5
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 120 && col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq

    // stream in three micro-batches so planted near-dup pairs straddle
    // batch boundaries (incrementality, not just batch-in-one-go)
    val stream = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingNearDup.candidatePairs(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      shingleN = graft.TextQueries.ShingleN, minEstJaccard = minEst)
    val q = out.writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      docs.grouped(math.max(1, docs.size / 3 + 1)).foreach { chunk =>
        stream.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("neardup")
      .select("doc_a", "doc_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch twin: the same signature/band expressions as a relational
    // band self-join + estimate filter
    val banded = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.expr.MinHashSig(graft.text.TextAnalysis.shingles(
          col("text"), graft.TextQueries.ShingleN), 128, 1L).as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(graft.expr.LshBands(col("sig"), 32)).as(Seq("band", "bh")))
    val est = {
      val eq = size(filter(zip_with(col("a.sig"), col("b.sig"),
        (x, y) => (x === y).cast("int")), v => v === 1))
      eq.cast("double") / size(col("a.sig")).cast("double")
    }
    val batchPairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(est >= minEst)
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed == batchPairs,
      s"stream-only: ${streamed -- batchPairs}; batch-only: ${batchPairs -- streamed}")
    assert(streamed.nonEmpty, "fixture must contain planted near-dups")
    // the bounded-bucket configuration still runs (recall may drop)
    val bounded = graft.streaming.StreamingNearDup.candidatePairs(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      graft.TextQueries.ShingleN, minEst, maxBucket = 2)
      .select("doc_a", "doc_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bounded.subsetOf(batchPairs))
  }

  test("stream-neardup file-source wiring (the CLI path): ingest-dir " +
    "parquet stream drains candidates to the sink") {
    // the exact staging shape graft.cli.Main stream-neardup uses: stage
    // parquet into an ingest dir, stream it as a file source, run the
    // stateful candidate detector, read back the drained table
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 120 && col("text").isNotNull)
      .select("doc_id", "text")
    val ingest = java.nio.file.Files.createTempDirectory("graft_ndsmoke")
    src.coalesce(1).write.mode("overwrite").parquet(ingest.toString)
    val docs = spark.readStream.schema(src.schema).parquet(ingest.toString)
    val cands = graft.streaming.StreamingNearDup.candidatePairs(
      docs.toDF(), "doc_id", "text", graft.TextQueries.ShingleN, 0.5)
    val q = cands.toDF().writeStream.format("memory")
      .queryName("ndsmoke").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ndsmoke")
      .select("doc_a", "doc_b").distinct().count()
    assert(got > 0, "file-source stream must surface the planted near-dups")
  }

  test("q_stream_tumbling_1h's drain pattern is batch-split invariant: " +
    "3 micro-batches upsert to the same final state as 1") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.DataFrame
    // stage events as THREE files so maxFilesPerTrigger=1 forces three
    // micro-batches — the incremental state-store path the single-file
    // catalog run doesn't exercise
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val staged = java.nio.file.Files.createTempDirectory("graft_stream3")
    ev.repartition(3).write.mode("overwrite").parquet(staged.toString)
    def drain(maxFiles: Option[Int]): Map[(Long, String), (Long, Double)] = {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt3")
      val rd = spark.readStream.schema(ev.schema)
      val src = maxFiles.fold(rd)(n => rd.option("maxFilesPerTrigger", n))
        .parquet(staged.toString)
      val ts = src.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          timestamp_micros(expr("ts div 1000L"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          col("ts").cast("timestamp")
        case _ => col("ts")
      }
      val agg = src.withColumn("ts", ts)
        // span-wide watermark = split-invariant final state (the catalog
        // entry's contract); tight-watermark lateness drops are covered
        // by the dedicated watermark specs
        .withWatermark("ts", "3650 days")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(28,10)")).cast("double").as("tv"))
        .select(unix_micros(col("window.start")).as("w"),
          col("event_type"), col("n"), col("tv"))
      val acc = new java.util.concurrent.ConcurrentHashMap[
        (Long, String), (Long, Double)]()
      val q = agg.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.collect().foreach { r =>
            acc.put((r.getLong(0), r.getString(1)),
              (r.getLong(2), r.getDouble(3)))
          }
        }.start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      acc.asScala.toMap
    }
    val oneBatch = drain(None)
    val threeBatches = drain(Some(1))
    assert(oneBatch.nonEmpty)
    assert(threeBatches == oneBatch,
      "multi-batch incremental aggregation must upsert to the same final state")
    // and both equal the plain batch aggregation
    val batch = graft.core.Tables.eventsMicros(spark, sfDir)
      .withColumn("w", col("ts") - pmod(col("ts"), lit(3600L * 1000 * 1000)))
      .groupBy("w", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,10)")).cast("double").as("tv"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(oneBatch == batch, "streaming final state must equal the batch twin")
  }

  test("q_stream_late_1h: the tight watermark is load-bearing — late " +
      "rows drop, and a span-wide delay disagrees exactly on them") {
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val tight = toMap(StreamingQueries.lateDrain(spark, sfDir, "360 hours"))
    val wide = toMap(StreamingQueries.lateDrain(spark, sfDir, "3650 days"))
    // removing the watermark MUST change the result — this is what the
    // hash gate would catch if the drop semantics silently vanished
    assert(tight != wide, "span-wide delay must differ from the tight one")
    // the wide drain equals the full batch aggregate (nothing dropped)
    val ev = graft.core.Tables.eventsMicros(spark, sfDir)
      .withColumn("w", col("ts") - pmod(col("ts"), lit(3600L * 1000 * 1000)))
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("w", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,10)")).cast("double").as("tv"))
    assert(wide == toMap(agg(ev)))
    // the tight drain equals the batch mirror WITH the drop rule: the
    // same predicate the DuckDB oracle states, computed here in Spark
    val maxUs = ev.agg(max(col("ts"))).head.getLong(0)
    val cutoff = (maxUs / 1000L - 360L * 3600 * 1000) * 1000
    val kept = ev.filter(
      pmod(col("event_id"), lit(2)) === 0 ||
        col("ts") >= maxUs - 864000000000L ||
        col("w") + 3600000000L > cutoff)
    assert(tight == toMap(agg(kept)),
      "tight drain must equal the explicit drop-rule mirror")
    // and rows really were dropped (not just re-grouped)
    assert(tight.values.map(_._1).sum < wide.values.map(_._1).sum,
      "the tight watermark must drop a nonzero number of late rows")
  }
}
