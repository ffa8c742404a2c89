package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md) plus the
  * reference-shaped "rides"/"stations" analog views.
  *
  * The reference (`/root/reference/pipelines/total_distance.py:87-90,103-106`)
  * reads two BigQuery tables: `cycle_hire` (rides keyed by start/end station)
  * and `cycle_stations` (station id/name/lat/lon). The driver testdata is a
  * TPC-H-ish star schema, so we derive the same shapes deterministically:
  *   - rides   := lineitem with (start, end) station ids derived from
  *                l_suppkey / l_partkey (modulo the station count, so every
  *                scale factor stays self-consistent);
  *   - stations:= supplier (id-keyed, `--input_col` id variant) or nation
  *                (name-keyed variant), with synthetic-but-deterministic
  *                WGS-84 coordinates derived from the key.
  * Both derivations are pure column arithmetic, so DuckDB can reproduce them
  * verbatim for the oracle compare.
  */
object Tables {

  /** Read one testdata table. Parquet → schema travels with the file and
    * Catalyst pushes projections/filters into the scan. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "events")

  /** Events with `ts` as epoch-MICROSECOND BIGINT — the single reader all
    * event-time queries share. Two things live here so no query can get
    * them wrong: (a) the parquet carries TIMESTAMP(NANOS), which Spark
    * admits only as INT64 via the nanosAsLong flag; (b) time arithmetic
    * is truncated to MICROsecond resolution because the DuckDB oracle's
    * TIMESTAMP is microsecond-resolved — comparing at nano grain would
    * make every boundary predicate latently engine-divergent (mirror
    * with epoch_us(ts) in oracle SQL).
    *
    * The nanosAsLong conf itself is set ONCE at session construction
    * ([[GraftSession]]) — a loader must not mutate session state on
    * every call; a session built elsewhere without the flag fails here
    * loudly with Spark's illegal-parquet-type AnalysisException. */
  def eventsMicros(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).withColumn("ts",
      org.apache.spark.sql.functions.expr("ts div 1000L"))
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Deterministic synthetic latitude from an integer key: London-ish band.
    * Pure integer arithmetic + one division → bit-identical across engines. */
  def synthLat(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lit(51.0) + pmod(key * 7, lit(100)).cast("double") / lit(200.0)

  /** Deterministic synthetic longitude from an integer key. */
  def synthLon(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lit(-0.5) + pmod(key * 13, lit(100)).cast("double") / lit(100.0)

  /** Station table, id-keyed (supplier analog of `cycle_stations`;
    * cf. reference `pipelines/total_distance.py:103-106`). */
  def stationsById(spark: SparkSession, sfDir: String): DataFrame =
    supplier(spark, sfDir).select(
      col("s_suppkey").as("id"),
      col("s_name").as("name"),
      synthLat(col("s_suppkey")).as("latitude"),
      synthLon(col("s_suppkey")).as("longitude"))

  /** Station table, name-keyed (nation analog;
    * cf. reference `pipelines/stations.py:57-59`). */
  def stationsByName(spark: SparkSession, sfDir: String): DataFrame =
    nation(spark, sfDir).select(
      col("n_name").as("name"),
      synthLat(col("n_nationkey")).as("latitude"),
      synthLon(col("n_nationkey")).as("longitude"))

  /** Rides analog: one row per lineitem, (start, end) station ids in
    * [0, stationCount). End derives from l_partkey so pairs repeat with a
    * skewed-but-covering distribution, like real ride data. */
  def rides(spark: SparkSession, sfDir: String): DataFrame = {
    val nStations = supplier(spark, sfDir)
      .agg(count(lit(1)).as("n"))
    lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_partkey"))
      .crossJoin(broadcast(nStations))
      .select(
        col("l_suppkey").as("start_station_id"),
        pmod(col("l_partkey"), col("n")).cast("long").as("end_station_id"))
  }
}
