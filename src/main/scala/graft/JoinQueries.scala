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

  def all: Seq[QueryDef] = Seq(qAsOf, qDistinctUsers)
}
