package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Total km ridden per (start, end) pair — the reference's Q-total
  * (`/root/reference/pipelines/total_distance.py:85-133`): ride counts per
  * pair ⋈ pairwise station distances, then count × km.
  *
  * ⚠ Join semantics (SURVEY §2 J2): the reference joins with CoGroupByKey —
  * a FULL OUTER co-group — and its combiner DoFn zero-fills whichever side
  * is missing (`total_distance.py:14-29`). Keys present on only one side
  * therefore still appear, with 0 count / 0.0 km / 0.0 total. An inner join
  * is the natural-but-wrong Spark translation; we use `full_outer` +
  * `coalesce`.
  *
  * Scale notes: the distances side is a station-pair dimension (n² of a
  * small n) — broadcast it so the big aggregated-rides side never
  * shuffles for the join. Ride counting itself is the one unavoidable
  * shuffle (hash by pair key).
  */
object TotalDistance {

  /** @param rideCounts  (start, end, count) — from [[RideCounts.countPerPair]]
    * @param pairDistances (station_1, station_2, distance_km) — from
    *                      [[StationDistances.pairwise]]
    */
  def totalKm(rideCounts: DataFrame, pairDistances: DataFrame,
      startCol: String, endCol: String, countName: String): DataFrame = {
    val counts = rideCounts.select(
      col(startCol).as("start"), col(endCol).as("end"), col(countName).as("cnt"))
    val dists = pairDistances.select(
      col("station_1").as("start"), col("station_2").as("end"), col("distance_km"))
    // full_outer cannot build a broadcast side in Spark; hint SHUFFLE_HASH
    // so the join hashes instead of sorting both sides (saves two sorts —
    // the pair-distance side is n² rows at scale)
    counts
      .join(dists.hint("shuffle_hash"), Seq("start", "end"), "full_outer")
      .select(
        col("start"), col("end"),
        coalesce(col("cnt"), lit(0L)).as("amount_of_rides"),
        coalesce(col("distance_km"), lit(0.0)).as("distance_km"),
        (coalesce(col("cnt"), lit(0L)) * coalesce(col("distance_km"), lit(0.0)))
          .as("total_distance_km"))
  }
}
