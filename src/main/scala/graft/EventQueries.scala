package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Event-stream analytics catalog entries over the `events` table
  * (`event_id, ts, user_id, event_type, value, props`): sessionization,
  * windowed ranking, pivot, and JSON extraction — the batch faces of the
  * streaming surface in [[graft.streaming.StreamingRoutes]].
  *
  * Event time rides as epoch-MICROSECOND BIGINT end to end (see
  * [[graft.core.Tables.eventsMicros]] for why; the DuckDB oracle mirrors
  * with `epoch_us(ts)`). */
object EventQueries {

  /** Session gap: 30 minutes, in microseconds. */
  val SessionGapUs: Long = 30L * 60 * 1000 * 1000

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsMicros(spark, dir)

  /** Gap-based sessionization per user (classic lag → flag → running-sum
    * pattern; the streaming equivalent is `session_window`). One shuffle:
    * everything runs in a single window partition pass over user_id. */
  val qSessions = QueryDef("q_events_sessions",
    (spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(spark, dir)
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("ts") - col("prev_ts") > SessionGapUs, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum("new_sess").as("n_sessions"),
          // decimal-summed -> order-independent exact, then one cast:
          // identical bits in both engines without rounding
          sum(col("value").cast("decimal(28,10)")).cast("double").as("total_value"))
        .orderBy("user_id")
    },
    Some(s"""WITH flagged AS (
            |  SELECT user_id, value,
            |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
            |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $SessionGapUs
            |              THEN 1 ELSE 0 END AS new_sess
            |  FROM events
            |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
            |)
            |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
            |       CAST(sum(new_sess) AS BIGINT) AS n_sessions,
            |       CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
            |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** Top-3 events by value within each event type — per-group top-N via
    * row_number (T1's grouped generalization). */
  val qTop3PerType = QueryDef("q_events_top3_per_type",
    (spark, dir) => {
      val w = Window.partitionBy("event_type").orderBy(desc("value"), col("event_id"))
      events(spark, dir)
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 3)
        .select(col("event_type"), col("rank"), col("event_id"), col("value"))
        .orderBy("event_type", "rank")
    },
    Some("""SELECT event_type, CAST(rank AS INT) AS rank, event_id, value
           |FROM (
           |  SELECT event_type, event_id, value,
           |         row_number() OVER (PARTITION BY event_type
           |           ORDER BY value DESC, event_id) AS rank
           |  FROM events
           |) WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin))

  /** Event-type counts pivoted to columns per user (explicit value list —
    * the scalable form: no second pass to discover distinct values). */
  val qUserPivot = QueryDef("q_events_user_pivot",
    (spark, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      events(spark, dir)
        .groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .select(col("user_id") +: types.map(t =>
          coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
        .orderBy("user_id")
    },
    Some("""SELECT user_id,
           |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** Semi-structured extraction: pull `k` out of the JSON `props` column
    * and aggregate — scan-side projection keeps only the parsed value. */
  val qJsonExtract = QueryDef("q_events_json_extract",
    // via DOUBLE with explicit truncation on both sides: a fractional k
    // ('3.5') would round to 4 under DuckDB's direct string→BIGINT cast
    // but throw (ANSI) on Spark's — truncation toward zero is the one
    // coercion both engines express identically
    (spark, dir) => events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("double").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        avg("k").as("avg_k"))
      .orderBy("event_type"),
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(k) AS BIGINT) AS sum_k, avg(k) AS avg_k
           |FROM (SELECT event_type,
           |             CAST(TRUNC(CAST(json_extract_string(props, '$.k') AS DOUBLE))
           |                  AS BIGINT) AS k
           |      FROM events)
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Per-user inter-arrival gaps via lag(): the LAG/LEAD window surface,
    * summarized with exact long-micros aggregates (no float drift).
    * Ordering inside a user is (ts, event_id) — (user, ts) is unique in
    * the testdata, but the event_id tie-break keeps the query
    * deterministic on any data. */
  val qInterarrival = QueryDef("q_events_interarrival",
    (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      Tables.eventsMicros(spark, dir)
        .withColumn("gap", col("ts") - lag(col("ts"), 1).over(w))
        .filter(col("gap").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          sum("gap").as("total_gap_us"),
          min("gap").as("min_gap_us"),
          max("gap").as("max_gap_us"))
        .orderBy("user_id")
    },
    Some("""WITH g AS (
           |  SELECT user_id,
           |         epoch_us(ts) - lag(epoch_us(ts))
           |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
           |  FROM events
           |)
           |SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
           |       CAST(sum(gap) AS BIGINT) AS total_gap_us,
           |       CAST(min(gap) AS BIGINT) AS min_gap_us,
           |       CAST(max(gap) AS BIGINT) AS max_gap_us
           |FROM g WHERE gap IS NOT NULL
           |GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** Trailing 1-hour window, in micros (the table's native resolution). */
  val MovingAvgWindowUs = 3600000000L

  /** Per-user trailing-hour rolling aggregate via a RANGE frame — the
    * time-based window family (moving averages, rolling rates) that ROWS
    * frames can't express when event spacing is irregular: the frame is
    * "everything within the last hour", however many rows that is.
    * Decimal-summed (order-independent bits), count alongside so the
    * consumer derives the average without a cross-engine division.
    * Plan: one Exchange on user_id, then a single sort+window pass —
    * partitioned, never a global window. */
  val qMovingAvg = QueryDef("q_events_moving_avg",
    (spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts")
        .rangeBetween(-MovingAvgWindowUs, Window.currentRow)
      events(spark, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          sum(col("value").cast("decimal(28,10)")).over(w)
            .cast("double").as("rolling_value"),
          count(lit(1)).over(w).as("n_in_window"))
        .orderBy("user_id", "ts", "event_id")
    },
    Some(s"""SELECT user_id, event_id, epoch_us(ts) AS ts,
            |  CAST(sum(CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE) AS rolling_value,
            |  CAST(count(*) OVER w AS BIGINT) AS n_in_window
            |FROM events
            |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
            |  RANGE BETWEEN $MovingAvgWindowUs PRECEDING AND CURRENT ROW)
            |ORDER BY user_id, ts, event_id""".stripMargin))

  /** Latest-wins compaction: each user's newest event row, via the
    * aggregate form ([[graft.operators.Upsert.latestByKey]] — one
    * partial-aggregated exchange, no window sort). The oracle is the
    * textbook row_number()-window form — the two must agree exactly,
    * which is the compaction-correctness claim. */
  val qUpsertLatest = QueryDef("q_upsert_latest",
    (spark, dir) => graft.operators.Upsert.latestByKey(
      Tables.eventsMicros(spark, dir),
      keys = Seq("user_id"), versionCol = "ts", tieBreakCol = "event_id")
      .orderBy("user_id"),
    Some("""SELECT event_id, epoch_us(ts) AS ts, user_id, event_type, value, props
           |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
           |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
           |      FROM events)
           |WHERE rn = 1 ORDER BY user_id""".stripMargin))

  /** Resample period: 4 h in micros. */
  val ResamplePeriodUs = 4L * 3600L * 1000000L

  /** Time-series resample + forward fill: a 4-hour grid per user spanning
    * that user's own [min ts, max ts], carrying the value of the user's
    * most recent event at-or-before each grid point (NULL before the
    * first event — the leading edge cell starts at floor(t0/period)).
    * Composition: per-user bounds agg → `sequence`+`explode` grid (pure
    * map-side fan-out, no cross join) → [[graft.operators.AsOfJoin]].
    * Scale: grid cardinality is users × span/period — controlled by the
    * period parameter, never corpus-sized; the as-of runs partitioned by
    * user. Oracle: DuckDB's native ASOF LEFT JOIN over the identical
    * integer-micros grid. */
  val qResampleFfill = QueryDef("q_events_resample_ffill",
    (spark, dir) => {
      val ev = Tables.eventsMicros(spark, dir)
      val bounds = ev.groupBy("user_id").agg(min("ts").as("t0"), max("ts").as("t1"))
      val grid = bounds.select(col("user_id"),
        explode(sequence(
          expr(s"t0 div ${ResamplePeriodUs}L"),
          expr(s"t1 div ${ResamplePeriodUs}L"))).as("cell"))
        .select(col("user_id"), (col("cell") * ResamplePeriodUs).as("ts"))
      graft.operators.AsOfJoin.asOf(grid,
          ev.select(col("user_id"), col("ts"), col("value")),
          keyCols = Seq("user_id"), timeCol = "ts", valueCols = Seq("value"))
        .select(col("user_id"), col("ts").as("grid_ts"), col("asof_value"))
        .orderBy("user_id", "grid_ts")
    },
    Some(s"""WITH ev AS (
            |  SELECT user_id, epoch_us(ts) AS ts, value FROM events
            |), bounds AS (
            |  SELECT user_id, min(ts) AS t0, max(ts) AS t1 FROM ev GROUP BY user_id
            |), grid AS (
            |  SELECT user_id,
            |         unnest(range(t0 // $ResamplePeriodUs,
            |                      t1 // $ResamplePeriodUs + 1)) * $ResamplePeriodUs AS ts
            |  FROM bounds
            |)
            |SELECT g.user_id AS user_id, g.ts AS grid_ts, e.value AS asof_value
            |FROM grid g ASOF LEFT JOIN ev e
            |  ON g.user_id = e.user_id AND g.ts >= e.ts
            |ORDER BY g.user_id, grid_ts""".stripMargin))

  /** Slowly-changing-dimension TYPE 2 build from a change log (the
    * warehouse-ingestion sibling of [[qUpsertLatest]]'s SCD1): each
    * user's event stream is compacted to its CHANGE POINTS of
    * `event_type`, and every change point becomes one versioned history
    * row with a `[valid_from_us, valid_to_us)` validity interval —
    * `valid_to_us` NULL on the open (current) version. Two window
    * passes, both partitioned by user: lag to flag changes, then
    * lead/row_number over the surviving change rows — no self-join, so
    * the cost is two shuffles on user_id regardless of history depth.
    * Scale: per-user state is window-local (sort within partition);
    * output is change-point-sized, not event-sized. */
  val qScd2 = QueryDef("q_scd2_history",
    (spark, dir) => {
      val wAll = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val changes = events(spark, dir)
        .withColumn("prev_type", lag("event_type", 1).over(wAll))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
      val wChg = Window.partitionBy("user_id").orderBy("ts", "event_id")
      changes
        .withColumn("version_no", row_number().over(wChg))
        .withColumn("valid_from_us", col("ts"))
        .withColumn("valid_to_us", lead("ts", 1).over(wChg))
        .withColumn("is_current", col("valid_to_us").isNull)
        .select("user_id", "version_no", "event_type",
          "valid_from_us", "valid_to_us", "is_current")
        .orderBy("user_id", "version_no")
    },
    Some("""WITH ordered AS (
           |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
           |         lag(event_type) OVER (PARTITION BY user_id
           |                               ORDER BY epoch_us(ts), event_id) AS prev_type
           |  FROM events
           |), changes AS (
           |  SELECT user_id, event_id, event_type, ts_us FROM ordered
           |  WHERE prev_type IS NULL OR prev_type <> event_type
           |)
           |SELECT user_id,
           |       CAST(row_number() OVER w AS INT) AS version_no,
           |       event_type,
           |       ts_us AS valid_from_us,
           |       lead(ts_us) OVER w AS valid_to_us,
           |       lead(ts_us) OVER w IS NULL AS is_current
           |FROM changes
           |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
           |ORDER BY user_id, version_no""".stripMargin))

  def all: Seq[QueryDef] = Seq(qSessions, qTop3PerType, qUserPivot, qJsonExtract,
    qInterarrival, qMovingAvg, qUpsertLatest, qResampleFfill, qScd2)
}
