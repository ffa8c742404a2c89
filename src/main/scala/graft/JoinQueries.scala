package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.AsOfJoin

/** Join-operator breadth beyond the reference: as-of join and
  * distinct-count aggregates over the events table. */
object JoinQueries {

  /** As-of enrichment: each error event gets the value of the user's most
    * recent purchase at-or-before it. Oracle: DuckDB's native ASOF LEFT
    * JOIN — our union+window composition must match it exactly. */
  // Known latent oracle limit: two purchases tied on (user, micro-ts)
  // resolve deterministically on the Spark side (struct-greatest value,
  // AsOfJoin scaladoc) but DuckDB's native ASOF leaves the tied pick
  // unspecified — the testdata has no such ties (verified), and a future
  // corpus with ties would need the window-form mirror instead.
  val qAsOf = QueryDef("q_asof_error_purchase",
    (spark, dir) => {
      val events = Tables.eventsMicros(spark, dir)
      val errors = events.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      AsOfJoin.asOf(errors, purchases,
        keyCols = Seq("user_id"), timeCol = "ts", valueCols = Seq("value"))
        .select(col("event_id"), col("user_id"), col("asof_value"))
        .orderBy("event_id")
    },
    Some("""SELECT e.event_id, e.user_id, p.value AS asof_value
           |FROM (SELECT * FROM events WHERE event_type = 'error') e
           |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
           |  ON e.user_id = p.user_id AND epoch_us(e.ts) >= epoch_us(p.ts)
           |ORDER BY e.event_id""".stripMargin))

  /** Distinct users per event type — the exact form (oracle-hashed).
    * The scale form is `approx_count_distinct` (HLL++): not cross-engine
    * reproducible, so it lives in the spec, asserted within 5% of exact. */
  val qDistinctUsers = QueryDef("q_events_distinct_users",
    (spark, dir) => {
      Tables.eventsMicros(spark, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
           |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           |       CAST(count(*) AS BIGINT) AS n_events
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Bloom-pruned join: yearly revenue of line items belonging to URGENT
    * orders. The Spark plan builds a bloom filter over the urgent
    * orderkeys, prunes lineitem map-side, THEN joins exactly — so the
    * result is bit-identical to the plain join the DuckDB oracle runs
    * (false positives are removed by the join; false negatives cannot
    * occur). The oracle therefore checks the END-TO-END claim that bloom
    * pruning is semantics-free, the property that makes it safe at
    * 100 TB ([[graft.operators.Joins.bloomPrefilter]]). */
  val qBloomPrune = QueryDef("q_bloom_join_prune",
    (spark, dir) => {
      val urgent = Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      val fact = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val pruned = graft.operators.Joins.bloomPrefilter(
        fact, col("l_orderkey"), urgent, col("o_orderkey"))
      pruned.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(28,6)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_year")
    },
    Some("""SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           |       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
           |                     AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           |       CAST(count(*) AS BIGINT) AS n_items
           |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           |WHERE o.o_orderpriority = '1-URGENT'
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Salted skewed join, oracle-gated for semantics: rides (the skewed
    * fact — a hot station concentrates one shuffle key) joined to the
    * station registry through [[graft.operators.Joins.saltedJoin]], so
    * the shuffle key becomes (station, salt) and one hot station spreads
    * over `salts` reducers. The oracle runs the PLAIN join — the gate is
    * exactly the property that makes salting deployable at 100 TB: it
    * must be invisible in the result. (SaltedJoinSpec pins the plan
    * shape — replicated small side, composite shuffle key — under
    * broadcast disabled; here with broadcast on, Catalyst may broadcast
    * the replicated registry, which is equally correct.) */
  val qSaltedJoin = QueryDef("q_skew_salted_join",
    (spark, dir) => {
      val rides = Tables.rides(spark, dir)
      val stations = Tables.stationsById(spark, dir)
        .withColumnRenamed("id", "start_station_id")
      graft.operators.Joins.saltedJoin(rides, stations,
          keys = Seq("start_station_id"), salts = 8,
          saltSource = col("end_station_id"))
        .groupBy("start_station_id")
        .agg(count(lit(1)).as("n_rides"),
          // raw double: both engines derive latitude with the same IEEE
          // expression tree (stationsSql lockstep), proven bit-identical
          // by q_stream_enrich_stations — rounding would only add a
          // rounding-mode divergence surface
          max(col("latitude")).as("station_lat"))
        .orderBy("start_station_id")
    },
    Some(s"""WITH ${Catalog.ridesSql},
            |${Catalog.stationsSql}
            |SELECT r.start_station_id,
            |       CAST(count(*) AS BIGINT) AS n_rides,
            |       MAX(s.latitude) AS station_lat
            |FROM rides r JOIN stations s ON s.id = r.start_station_id
            |GROUP BY r.start_station_id
            |ORDER BY r.start_station_id""".stripMargin))

  def all: Seq[QueryDef] = Seq(qAsOf, qDistinctUsers, qBloomPrune, qSaltedJoin)
}
