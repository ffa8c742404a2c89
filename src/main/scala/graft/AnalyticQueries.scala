package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Analytic breadth: rollup/grouping sets, exact percentiles, tumbling
  * time windows, and a binned range join — the non-equi join made
  * shuffle-joinable. */
object AnalyticQueries {

  /** Revenue rollup over (orderstatus, year): GROUPING SETS machinery.
    * Subtotal rows carry NULL group keys (standard SQL rollup), revenue
    * decimal-summed → order-independent exact. */
  val qRollup = QueryDef("q_rollup_revenue",
    (spark, dir) => Tables.orders(spark, dir)
      .select(col("o_orderstatus"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        col("o_totalprice").cast("decimal(28,4)").as("price"))
      .rollup(col("o_orderstatus"), col("o_year"))
      .agg(count(lit(1)).as("n"), sum("price").cast("double").as("revenue"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_year").asc_nulls_first),
    Some("""SELECT o_orderstatus, o_year, CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(price) AS DOUBLE) AS revenue
           |FROM (SELECT o_orderstatus,
           |             CAST(year(o_orderdate) AS BIGINT) AS o_year,
           |             CAST(o_totalprice AS DECIMAL(28,4)) AS price
           |      FROM orders)
           |GROUP BY ROLLUP(o_orderstatus, o_year)
           |ORDER BY o_orderstatus NULLS FIRST, o_year NULLS FIRST""".stripMargin))

  /** Full CUBE over the same dimensions as [[qRollup]] — all four
    * grouping sets including the (NULL, year) slice rollup omits. */
  val qCube = QueryDef("q_cube_revenue",
    (spark, dir) => Tables.orders(spark, dir)
      .select(col("o_orderstatus"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        col("o_totalprice").cast("decimal(28,4)").as("price"))
      .cube(col("o_orderstatus"), col("o_year"))
      .agg(count(lit(1)).as("n"), sum("price").cast("double").as("revenue"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_year").asc_nulls_first),
    Some("""SELECT o_orderstatus, o_year, CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(price) AS DOUBLE) AS revenue
           |FROM (SELECT o_orderstatus,
           |             CAST(year(o_orderdate) AS BIGINT) AS o_year,
           |             CAST(o_totalprice AS DECIMAL(28,4)) AS price
           |      FROM orders)
           |GROUP BY CUBE(o_orderstatus, o_year)
           |ORDER BY o_orderstatus NULLS FIRST, o_year NULLS FIRST""".stripMargin))

  /** Explicit GROUPING SETS — the third member of the multi-level
    * aggregation family, covering the set selection neither sibling can
    * express: {(status, year), (status), (year)} — the two 1-D slices
    * WITHOUT the grand total ([[qRollup]] can't produce the (year)
    * slice; [[qCube]] can't omit the total). `grouping_id` is part of
    * the hash-checked output because it is what distinguishes a
    * grouped-away NULL from a data NULL — the correctness subtlety
    * GROUPING SETS queries live on. One aggregation pass: Catalyst
    * expands the sets and keeps the map-side partial aggregation, so
    * the shuffle carries one row per (set × group × task), not one
    * corpus pass per set. */
  val qGroupingSets = QueryDef("q_grouping_sets_revenue",
    (spark, dir) => {
      Tables.orders(spark, dir)
        .select(col("o_orderstatus"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          col("o_totalprice").cast("decimal(28,4)").as("price"))
        .createOrReplaceTempView("orders_gs")
      spark.sql(
        """SELECT o_orderstatus, o_year,
          |       CAST(grouping_id(o_orderstatus, o_year) AS BIGINT) AS gid,
          |       count(*) AS n, CAST(sum(price) AS DOUBLE) AS revenue
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus, o_year),
          |                        (o_orderstatus), (o_year))
          |ORDER BY gid, o_orderstatus NULLS FIRST, o_year NULLS FIRST
          |""".stripMargin)
    },
    Some("""SELECT o_orderstatus, o_year,
           |       CAST(grouping(o_orderstatus, o_year) AS BIGINT) AS gid,
           |       CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(price) AS DOUBLE) AS revenue
           |FROM (SELECT o_orderstatus,
           |             CAST(year(o_orderdate) AS BIGINT) AS o_year,
           |             CAST(o_totalprice AS DECIMAL(28,4)) AS price
           |      FROM orders)
           |GROUP BY GROUPING SETS ((o_orderstatus, o_year),
           |                        (o_orderstatus), (o_year))
           |ORDER BY gid, o_orderstatus NULLS FIRST, o_year NULLS FIRST""".stripMargin))

  /** Exact quantity percentiles per return flag. Spark's exact
    * `percentile` and DuckDB's `quantile_cont` share the same linear
    * interpolation definition. */
  val qPercentiles = QueryDef("q_quantity_percentiles",
    (spark, dir) => Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.9)).as("p90"),
        percentile(col("l_quantity"), lit(0.99)).as("p99"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |       quantile_cont(l_quantity, 0.5) AS p50,
           |       quantile_cont(l_quantity, 0.9) AS p90,
           |       quantile_cont(l_quantity, 0.99) AS p99
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Tumbling 1-hour event windows: counts + decimal-exact value sums per
    * (window, event_type) — the batch face of
    * [[graft.streaming.StreamingRoutes.windowedRouteCounts]]. */
  val qTumbling = QueryDef("q_events_tumbling_1h",
    (spark, dir) => {
      val hourUs = 3600L * 1000 * 1000
      Tables.eventsMicros(spark, dir)
        // ts - pmod(ts, w): pure LONG arithmetic. (ts / w).cast("long")
        // would divide in DOUBLE and misplace boundary timestamps
        .withColumn("window_start", col("ts") - pmod(col("ts"), lit(hourUs)))
        .groupBy("window_start", "event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(28,10)")).cast("double").as("total_value"))
        .orderBy("window_start", "event_type")
    },
    // floor-mod form: DuckDB's // truncates toward zero, Spark's pmod
    // floors — they agree only for non-negative epochs; the double-%
    // form is floor-correct for pre-1970 timestamps too
    Some("""SELECT epoch_us(ts)
           |         - (((epoch_us(ts) % 3600000000) + 3600000000) % 3600000000)
           |         AS window_start,
           |       event_type, CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
           |FROM events
           |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin))

  /** Sliding 1-hour windows every 15 minutes: each event belongs to 4
    * overlapping windows — generated by exploding the 4 slide offsets
    * (exactly how Spark's `window(col, "1 hour", "15 minutes")` plans it:
    * a generator over window instances, then a plain groupBy). Long
    * arithmetic throughout. */
  val qSliding = QueryDef("q_events_sliding_1h_15m",
    (spark, dir) => {
      val slideUs = 900L * 1000 * 1000
      // window = 4 slides exactly, so every one of the 4 generated window
      // instances contains the event — no residual trim filter needed
      Tables.eventsMicros(spark, dir)
        .withColumn("slide0", col("ts") - pmod(col("ts"), lit(slideUs)))
        .withColumn("window_start", explode(array((0 until 4).map(i =>
          col("slide0") - lit(i.toLong * slideUs)): _*)))
        .groupBy("window_start", "event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("window_start", "event_type")
    },
    Some("""SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n
           |FROM (
           |  -- floor-mod: agrees with Spark's pmod for pre-1970 epochs too
           |  SELECT epoch_us(ts) - (((epoch_us(ts) % 900000000) + 900000000) % 900000000)
           |           - CAST(s.i AS BIGINT) * 900000000 AS window_start,
           |         event_type
           |  FROM events, (SELECT unnest([0,1,2,3]) AS i) s
           |)
           |GROUP BY window_start, event_type
           |ORDER BY window_start, event_type""".stripMargin))

  /** Range join, binned: count error events within ±5 minutes of each
    * purchase, per user. The naive form is a per-user time-interval theta
    * join (quadratic per user); binning quantizes time into gap-width
    * bins so each purchase equi-joins at most 3 bins — a plain shuffle
    * join — and the residual |Δt| ≤ gap predicate filters exactly. */
  val qRangeJoin = QueryDef("q_range_join_error_near_purchase",
    (spark, dir) => {
      val gapUs = 5L * 60 * 1000 * 1000
      val events = Tables.eventsMicros(spark, dir)
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("pts"))
      // bins via exact integer division (SQL `div`) — double division
      // misplaces values near bin boundaries at epoch-nano magnitudes
      val errors = events.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("ets"),
          expr(s"ts div ${gapUs}L").as("bin"))
      // each purchase probes its own bin ± 1
      val probes = purchases.withColumn("bin",
        explode(array((-1 to 1).map(d =>
          expr(s"pts div ${gapUs}L") + d): _*)))
      probes.join(errors, Seq("user_id", "bin"))
        .filter(abs(col("ets") - col("pts")) <= gapUs)
        .groupBy("purchase_id")
        .agg(countDistinct(col("ets")).as("n_errors_near"))
        .orderBy("purchase_id")
    },
    Some("""SELECT p.event_id AS purchase_id,
           |       CAST(count(DISTINCT epoch_us(e.ts)) AS BIGINT) AS n_errors_near
           |FROM events p JOIN events e
           |  ON p.user_id = e.user_id
           | AND p.event_type = 'purchase' AND e.event_type = 'error'
           | AND abs(epoch_us(e.ts) - epoch_us(p.ts)) <= 300000000
           |GROUP BY p.event_id ORDER BY purchase_id""".stripMargin))

  /** Distribution-rank window functions — ntile / percent_rank /
    * cume_dist — per-customer revenue ranked WITHIN the customer's
    * nation. The window is partitioned (scale: each nation sorts
    * independently after one hash exchange — no global single-partition
    * sort), and its ordering is total (revenue DESC, then custkey), so
    * every row is its own peer group and both engines compute the
    * identical exact rationals rn/n and (rn−1)/(n−1). Revenue is
    * decimal-summed → order-independent. */
  val qRevenueQuartiles = QueryDef("q_revenue_quartiles",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rev = Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
        .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "c_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(28,4)")).cast("double")
          .as("revenue"))
      val w = Window.partitionBy("n_name")
        .orderBy(desc("revenue"), col("c_custkey"))
      rev.select(col("n_name"), col("c_custkey"), col("revenue"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("n_name", "c_custkey")
    },
    Some("""WITH rev AS (
           |  SELECT n_name, c_custkey,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS revenue
           |  FROM customer
           |  JOIN orders ON c_custkey = o_custkey
           |  JOIN nation ON c_nationkey = n_nationkey
           |  GROUP BY n_name, c_custkey
           |)
           |SELECT n_name, c_custkey, revenue,
           |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           |       percent_rank() OVER w AS pct_rank,
           |       cume_dist() OVER w AS cume
           |FROM rev
           |WINDOW w AS (PARTITION BY n_name ORDER BY revenue DESC, c_custkey)
           |ORDER BY n_name, c_custkey""".stripMargin))

  /** Fixed-width histogram of event values — the distribution-profiling
    * aggregate: one groupBy over a computed bucket, partial-aggregated
    * map-side, so the exchange carries ≤ nBuckets rows per task at any
    * scale. Bucket arithmetic is the explicit floor((v−lo)/w) form —
    * IEEE-identical in both engines (no width_bucket, whose edge
    * conventions differ across engines). Values outside [lo, hi) clamp
    * to the edge buckets, so the histogram always accounts for every
    * non-null row (an out-of-range spike is visible at the edges, not
    * silently dropped). */
  val qValueHistogram = QueryDef("q_value_histogram",
    (spark, dir) => {
      val lo = 0.0; val w = 25.0; val n = 20
      val bucket = least(lit(n - 1L), greatest(lit(0L),
        floor((col("value") - lit(lo)) / lit(w)).cast("long")))
      Tables.eventsMicros(spark, dir)
        .filter(col("value").isNotNull)
        .groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n_events"),
          min("value").as("lo_val"), max("value").as("hi_val"))
        .orderBy("bucket")
    },
    Some("""SELECT least(19, greatest(0,
           |         CAST(floor((value - 0.0) / 25.0) AS BIGINT))) AS bucket,
           |       CAST(count(*) AS BIGINT) AS n_events,
           |       min(value) AS lo_val, max(value) AS hi_val
           |FROM events WHERE value IS NOT NULL
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  def all: Seq[QueryDef] = Seq(qRollup, qCube, qGroupingSets, qPercentiles,
    qTumbling, qSliding, qRangeJoin, qRevenueQuartiles, qValueHistogram)
}
