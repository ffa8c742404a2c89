package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import graft.operators.{RideCounts, StationDistances, TotalDistance}
import graft.sources.Sources

/** Per-operator specs against the notebook-derived micro-fixtures
  * (FIXTURES.md §2-§4; reference `notebooks/development.ipynb` cells 3, 6). */
class OperatorsSpec extends SparkSpec {

  private val rideSchema = StructType(Seq(
    StructField("start_station_name", StringType, nullable = true),
    StructField("end_station_name", StringType, nullable = true)))

  private val harper = "Harper Road, The Borough"
  private val wellington = "Wellington Arch, Hyde Park"
  private val golden = "Golden Square, Soho"
  private val albert = "Albert Gate, Hyde Park"
  private val embankment = "Embankment (Savoy), Strand"
  private val green = "Green Park Station, Mayfair"
  private val chepstow = "Chepstow Villas, Notting Hill"

  private def ridesFixture = Sources.inMemory(spark, Seq(
    Row(harper, harper), Row(harper, wellington),
    Row(golden, albert), Row(golden, albert),
    Row(embankment, albert),
    Row(green, chepstow), Row(green, chepstow), Row(green, chepstow)),
    rideSchema)

  test("A1 count-per-pair on the 8-ride fixture yields counts {3,2,1,1,1}") {
    val counts = RideCounts.countPerPair(
      ridesFixture, "start_station_name", "end_station_name")
    val byPair = rows(counts).map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byPair.size == 5)
    assert(byPair((green, chepstow)) == 3L)
    assert(byPair((golden, albert)) == 2L)
    assert(byPair((harper, harper)) == 1L) // self-loop kept
    assert(byPair.values.toSeq.sorted == Seq(1L, 1L, 1L, 2L, 3L))
  }

  test("T1 top-2 routes are (Green->Chepstow,3), (Golden->Albert,2)") {
    val top = rows(RideCounts.topRoutes(
      ridesFixture, "start_station_name", "end_station_name", 2))
    assert(top.map(r => (r.getString(0), r.getString(1), r.getLong(2))) ==
      Seq((green, chepstow, 3L), (golden, albert, 2L)))
  }

  test("P3 null keys are dropped before counting (remove_none semantics)") {
    val withNulls = Sources.inMemory(spark, Seq(
      Row("a", "b"), Row(null, "b"), Row("a", null), Row(null, null)),
      rideSchema)
    val counts = rows(RideCounts.countPerPair(
      withNulls, "start_station_name", "end_station_name"))
    assert(counts.size == 1)
    assert(counts.head.getLong(2) == 1L)
  }

  private val stationSchema = StructType(Seq(
    StructField("name", StringType, nullable = true),
    StructField("latitude", DoubleType, nullable = true),
    StructField("longitude", DoubleType, nullable = true)))

  private def stationsFixture = Sources.inMemory(spark, Seq(
    Row(harper, 51.49859784, -0.096191134),
    Row(wellington, 51.50274025, -0.149569201)),
    stationSchema)

  test("J1 cross join yields 4 pairs including self-pairs at distance 0") {
    val pairs = rows(StationDistances.pairwise(stationsFixture, "name"))
    assert(pairs.size == 4)
    val d = pairs.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(d((harper, harper)) == 0.0)
    assert(d((wellington, wellington)) == 0.0)
    // WGS-84 geodesic for this pair is 3.735089 km (independently
    // cross-checked Vincenty; Karney agrees to <1e-6 km at city scale).
    assert(math.abs(d((harper, wellington)) - 3.735089) < 0.0005)
    // symmetric to iteration tolerance (lambda converges from opposite ends)
    assert(math.abs(d((harper, wellington)) - d((wellington, harper))) < 1e-9)
  }

  test("J1 property: pair count is exactly n² of the null-clean rows") {
    val st = spark.read.parquet(s"$sfDir/supplier.parquet")
      .selectExpr("s_suppkey AS id",
        "CAST(s_suppkey AS DOUBLE) AS latitude",
        "CAST(s_suppkey AS DOUBLE) / 10 AS longitude")
    val n = st.count()
    assert(StationDistances.pairwise(st, "id").count() == n * n)
    assert(StationDistances.pairwiseDistinct(st, "id").count() == n * (n - 1))
  }

  test("J1 distinct variant drops self-pairs only") {
    val pairs = rows(StationDistances.pairwiseDistinct(stationsFixture, "name"))
    assert(pairs.size == 2)
    assert(pairs.forall(r => r.getString(0) != r.getString(1)))
  }

  test("J2 full-outer zero-fill keeps keys present on only one side") {
    val countSchema = StructType(Seq(
      StructField("s", LongType, false), StructField("e", LongType, false),
      StructField("cnt", LongType, false)))
    val distSchema = StructType(Seq(
      StructField("station_1", LongType, false), StructField("station_2", LongType, false),
      StructField("distance_km", DoubleType, false)))
    val counts = Sources.inMemory(spark,
      Seq(Row(1L, 2L, 10L), Row(3L, 4L, 5L)), countSchema)
    val dists = Sources.inMemory(spark,
      Seq(Row(1L, 2L, 2.5), Row(7L, 8L, 1.0)), distSchema)
    val out = rows(TotalDistance.totalKm(counts, dists, "s", "e", "cnt"))
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.size == 3)
    assert(out((1L, 2L)) == ((10L, 2.5, 25.0))) // matched
    assert(out((3L, 4L)) == ((5L, 0.0, 0.0)))   // count only -> zero-filled km
    assert(out((7L, 8L)) == ((0L, 1.0, 0.0)))   // distance only -> zero count
  }

  test("snapshotDiff: added/removed/changed classified, unchanged omitted") {
    import spark.implicits._
    val oldSnap = Seq((1L, "same"), (2L, "before"), (3L, "gone"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "same"), (2L, "after"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val out = rows(graft.operators.Upsert.snapshotDiff(
      oldSnap, newSnap, "doc_id", graft.expr.Fingerprint64(col("text")))
      .orderBy("doc_id"))
      .map(r => r.getLong(0) -> r.getString(1))
    assert(out == Seq(2L -> "changed", 3L -> "removed", 4L -> "added"),
      out.toString)
    // identical snapshots diff to nothing
    assert(graft.operators.Upsert.snapshotDiff(
      oldSnap, oldSnap, "doc_id",
      graft.expr.Fingerprint64(col("text"))).count() == 0)
    // an empty old side reports everything as added
    assert(rows(graft.operators.Upsert.snapshotDiff(
      oldSnap.limit(0), newSnap, "doc_id",
      graft.expr.Fingerprint64(col("text"))))
      .map(_.getString(1)).forall(_ == "added"))
  }

  test("snapshotDiff: a NULL content hash is a value, not absence") {
    import spark.implicits._
    // presence must come from the join sides, not hash nullness: key 1 is
    // present in both with null text (unchanged), key 2 goes null → text
    // (changed), key 3 text → null (changed), key 4 had null text and is
    // gone (removed — the old classifier reported it 'added')
    val oldSnap = Seq((1L, null: String), (2L, null: String),
      (3L, "text"), (4L, null: String)).toDF("doc_id", "text")
    val newSnap = Seq((1L, null: String), (2L, "text"),
      (3L, null: String)).toDF("doc_id", "text")
    val out = rows(graft.operators.Upsert.snapshotDiff(
      oldSnap, newSnap, "doc_id", graft.expr.Fingerprint64(col("text")))
      .orderBy("doc_id"))
      .map(r => r.getLong(0) -> r.getString(1))
    assert(out == Seq(2L -> "changed", 3L -> "changed", 4L -> "removed"),
      out.toString)
  }
}
