package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.GeodesicKm

/** Pairwise station distances — the reference's Q-dist
  * (`/root/reference/pipelines/stations.py:62-77`).
  *
  * The reference builds the self cross join by keying EVERY row with the
  * constant `'key'`, CoGroupByKey, and a nested loop in one DoFn
  * (`pipelines/stations.py:24-33,68-71`) — all pairs generated on a single
  * reducer. We do NOT copy that: `broadcast(right)` + `crossJoin` plans a
  * BroadcastNestedLoopJoin — zero shuffles, pair generation distributed
  * across all partitions of the left side. At 100 TB the station dimension
  * stays small (thousands of rows), so the broadcast always holds; if the
  * right side ever grows past broadcast size the similarity-join path
  * (graft.dedup / graft.similarity LSH) is the scale-out alternative.
  *
  * Live reference semantics: self-pairs ARE kept (no `a != b` filter — that
  * exists only commented out, notebook cell 5); distance is WGS-84 geodesic
  * km (geopy parity, see [[graft.expr.Geodesic]]).
  */
object StationDistances {

  /** The (station_1, lat1, lon1) × broadcast(station_2, lat2, lon2)
    * pair frame with a caller-chosen distance metric — the shared core
    * of every pairwise-distance query. Null filtering covers ONLY the
    * columns used (the reference's remove_none guards the projected
    * fields — an unrelated null column must not drop the station). */
  def pairwiseWith(stations: DataFrame, keyCol: String,
      distance: (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column, org.apache.spark.sql.Column)
        => org.apache.spark.sql.Column): DataFrame = {
    val clean = stations.na.drop("any", Seq(keyCol, "latitude", "longitude"))
    val a = clean.select(col(keyCol).as("station_1"),
      col("latitude").as("lat1"), col("longitude").as("lon1"))
    val b = clean.select(col(keyCol).as("station_2"),
      col("latitude").as("lat2"), col("longitude").as("lon2"))
    a.crossJoin(broadcast(b))
      .select(col("station_1"), col("station_2"),
        distance(col("lat1"), col("lon1"), col("lat2"), col("lon2"))
          .as("distance_km"))
  }

  /** All station pairs (including self-pairs) with geodesic km. */
  def pairwise(stations: DataFrame, keyCol: String): DataFrame =
    pairwiseWith(stations, keyCol, GeodesicKm(_, _, _, _))

  /** The notebook's commented-out theta variant (`a.name != b.name`). */
  def pairwiseDistinct(stations: DataFrame, keyCol: String): DataFrame =
    pairwise(stations, keyCol).filter(col("station_1") =!= col("station_2"))

  /** Station pairs within `radiusKm` geodesic km. The radius predicate is
    * rewritten by [[graft.plans.GeodesicRadiusRule]] to pre-filter on a
    * cheap latitude bound before the iterative Vincenty kernel runs. */
  def pairsWithinKm(stations: DataFrame, keyCol: String,
      radiusKm: Double): DataFrame =
    pairwise(stations, keyCol)
      .filter(col("distance_km") <= radiusKm)
      .filter(col("station_1") =!= col("station_2"))
}
