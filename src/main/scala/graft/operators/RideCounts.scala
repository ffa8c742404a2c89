package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-per-key + top-N over ride-shaped data — the reference's Q-hard-1
  * (`/root/reference/pipelines/cycle_rides.py:42-57`: ReadFromBigQuery →
  * Map(project) → Count.PerElement → Top.Of → sink).
  *
  * Spark shape: `select → na.drop → groupBy(start,end).count →
  * orderBy(count desc, tie-breaks) → limit(n)`.
  *
  * Scale notes:
  *   - `groupBy.count` plans HashAggregate(partial) → Exchange →
  *     HashAggregate(final): one shuffle, map-side combine — the lifted
  *     combiner Beam's Count.PerElement promises, but vectorized and
  *     codegen'd.
  *   - the top-N plans `TakeOrderedAndProject`: per-partition bounded heaps
  *     merged on the driver — no second shuffle of the aggregate (the
  *     reference pays a global combine shuffle for Top.Of,
  *     `pipelines/cycle_rides.py:53`).
  *   - tie-break columns make output deterministic under ties (SURVEY §7.4).
  */
object RideCounts {

  /** GROUP BY (start, end) + COUNT(*), null keys dropped first (the
    * reference's `remove_none`, `pipelines/total_distance.py:55-57`). */
  def countPerPair(rides: DataFrame, startCol: String, endCol: String,
      countName: String = "amount_of_rides"): DataFrame =
    rides
      .select(col(startCol), col(endCol))
      .na.drop("any")
      .groupBy(col(startCol), col(endCol))
      .agg(count(lit(1)).as(countName))

  /** Global top-N by count, totally ordered (count desc, then keys asc). */
  def topRoutes(rides: DataFrame, startCol: String, endCol: String, n: Int,
      countName: String = "amount_of_rides"): DataFrame = {
    val counted = countPerPair(rides, startCol, endCol, countName)
    counted
      .orderBy(desc(countName), col(startCol), col(endCol))
      .limit(n)
  }
}
