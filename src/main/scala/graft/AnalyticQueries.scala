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
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val hourNs = 3600L * 1000 * 1000 * 1000
      Tables.events(spark, dir)
        // ts - pmod(ts, w): pure LONG arithmetic. (ts / w).cast("long")
        // would divide in DOUBLE — 53-bit mantissa vs 61-bit epoch-nanos
        // misplaces boundary timestamps
        .withColumn("window_start", col("ts") - pmod(col("ts"), lit(hourNs)))
        .groupBy("window_start", "event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(28,10)")).cast("double").as("total_value"))
        .orderBy("window_start", "event_type")
    },
    Some("""SELECT (epoch_ns(ts) // 3600000000000) * 3600000000000 AS window_start,
           |       event_type, CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
           |FROM events
           |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin))

  /** Range join, binned: count error events within ±5 minutes of each
    * purchase, per user. The naive form is a per-user time-interval theta
    * join (quadratic per user); binning quantizes time into gap-width
    * bins so each purchase equi-joins at most 3 bins — a plain shuffle
    * join — and the residual |Δt| ≤ gap predicate filters exactly. */
  val qRangeJoin = QueryDef("q_range_join_error_near_purchase",
    (spark, dir) => {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val gapNs = 5L * 60 * 1000 * 1000 * 1000
      val events = Tables.events(spark, dir)
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("pts"))
      // bins via exact integer division (SQL `div`) — double division
      // misplaces values near bin boundaries at epoch-nano magnitudes
      val errors = events.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("ets"),
          expr(s"ts div ${gapNs}L").as("bin"))
      // each purchase probes its own bin ± 1
      val probes = purchases.withColumn("bin",
        explode(array((-1 to 1).map(d =>
          expr(s"pts div ${gapNs}L") + d): _*)))
      probes.join(errors, Seq("user_id", "bin"))
        .filter(abs(col("ets") - col("pts")) <= gapNs)
        .groupBy("purchase_id")
        .agg(countDistinct(col("ets")).as("n_errors_near"))
        .orderBy("purchase_id")
    },
    Some("""SELECT p.event_id AS purchase_id,
           |       CAST(count(DISTINCT epoch_ns(e.ts)) AS BIGINT) AS n_errors_near
           |FROM events p JOIN events e
           |  ON p.user_id = e.user_id
           | AND p.event_type = 'purchase' AND e.event_type = 'error'
           | AND abs(epoch_ns(e.ts) - epoch_ns(p.ts)) <= 300000000000
           |GROUP BY p.event_id ORDER BY purchase_id""".stripMargin))

  def all: Seq[QueryDef] = Seq(qRollup, qPercentiles, qTumbling, qRangeJoin)
}
