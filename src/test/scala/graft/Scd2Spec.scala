package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structural invariants of the SCD TYPE-2 history build
  * (`q_scd2_history`, [[EventQueries.qScd2]]): the oracle hash pins the
  * exact rows; these specs pin the PROPERTIES a consumer of a type-2
  * dimension relies on, stated so they'd catch any regression the hash
  * would only report opaquely.
  */
class Scd2Spec extends SparkSpec {

  private lazy val hist =
    EventQueries.qScd2.run(spark, sfDir).cache()
  private lazy val events =
    graft.core.Tables.eventsMicros(spark, sfDir)

  test("version numbers are contiguous 1..n per user") {
    val bad = hist.groupBy("user_id")
      .agg(min("version_no").as("lo"), max("version_no").as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
      .count()
    assert(bad == 0L)
  }

  test("exactly one open version per user, and it is the newest") {
    val perUser = hist.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("n_open"),
        max(when(col("is_current"), col("version_no"))).as("open_v"),
        max("version_no").as("max_v"),
        sum(when(col("is_current") =!= col("valid_to_us").isNull, 1L)
          .otherwise(0L)).as("flag_drift"))
    assert(perUser.filter(col("n_open") =!= 1).count() == 0L,
      "every user must have exactly one open (is_current) version")
    assert(perUser.filter(col("open_v") =!= col("max_v")).count() == 0L,
      "the open version must be the highest-numbered one")
    assert(perUser.filter(col("flag_drift") =!= 0).count() == 0L,
      "is_current must equal valid_to_us IS NULL on every row")
  }

  test("validity intervals chain half-open: valid_to(k) == valid_from(k+1)") {
    val w = Window.partitionBy("user_id").orderBy("version_no")
    val broken = hist
      .withColumn("next_from", lead("valid_from_us", 1).over(w))
      .filter(col("next_from").isNotNull &&
        col("valid_to_us") =!= col("next_from"))
      .count()
    assert(broken == 0L)
  }

  test("consecutive versions always change the tracked attribute") {
    val w = Window.partitionBy("user_id").orderBy("version_no")
    val same = hist
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull &&
        col("prev_type") === col("event_type"))
      .count()
    assert(same == 0L, "a no-op 'change' row means the compaction leaked")
  }

  test("history covers every user from their first event") {
    val users = events.select(col("user_id"),
        col("ts").as("t0"))
      .groupBy("user_id").agg(min("t0").as("t0"))
    val firsts = hist.filter(col("version_no") === 1)
      .select(col("user_id"), col("valid_from_us"))
    assert(firsts.count() == users.count(),
      "one v1 row per event-emitting user")
    val drift = firsts.join(users, "user_id")
      .filter(col("valid_from_us") =!= col("t0")).count()
    assert(drift == 0L, "v1 must open at the user's first event time")
  }

  test("point-in-time reconstruction equals the raw log's latest change") {
    // For every (user, event) probe time, the SCD2 row whose interval
    // covers it must carry the type of the user's latest CHANGE at or
    // before that time — the query a type-2 dimension exists to answer.
    // Probe at a sample of raw event times (every 17th event).
    val probes = events.filter(pmod(col("event_id"), lit(17)) === 0)
      .select(col("user_id"), col("ts").as("probe_us"))
    val covered = probes.join(hist, Seq("user_id"))
      .filter(col("valid_from_us") <= col("probe_us") &&
        (col("valid_to_us").isNull || col("probe_us") < col("valid_to_us")))
    // exactly one covering version per probe
    assert(covered.groupBy("user_id", "probe_us").count()
      .filter(col("count") =!= 1).count() == 0L,
      "intervals must partition each user's timeline past v1")
    // and it matches the event log's as-of state
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val stateAt = events
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
      .select(col("user_id"), col("ts"), col("event_type").as("log_type"))
    val mismatches = covered
      .join(stateAt, Seq("user_id"))
      .filter(col("ts") <= col("probe_us"))
      .groupBy(col("user_id"), col("probe_us"), col("event_type"))
      .agg(max_by(col("log_type"), col("ts")).as("log_type"))
      .filter(col("event_type") =!= col("log_type"))
      .count()
    assert(mismatches == 0L)
  }
}
