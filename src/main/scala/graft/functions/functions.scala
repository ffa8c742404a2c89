package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** graft's user-facing column-function surface, mirroring
  * `org.apache.spark.sql.functions`. Everything here is either a native
  * Catalyst expression (codegen'd — see [[graft.expr]]) or a composition of
  * built-in functions (already codegen'd) — no Scala UDF closures in hot
  * paths.
  */
object functions {

  /** WGS-84 ellipsoidal geodesic distance in km (geopy-geodesic parity;
    * reference `/root/reference/pipelines/stations.py:18-22`). Native
    * expression with codegen. */
  def geodesic_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    graft.expr.GeodesicKm(lat1, lon1, lat2, lon2)

  /** Great-circle haversine km on the IUGG mean radius, composed purely of
    * built-in math functions — whole-stage codegen'd AND reproducible
    * verbatim in ANSI SQL (see [[haversineSql]]) for oracle checks. */
  def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val pi = lit(math.Pi)
    val dlatS = sin((lat2 - lat1) * pi / lit(180.0) / lit(2.0))
    val dlonS = sin((lon2 - lon1) * pi / lit(180.0) / lit(2.0))
    val h = dlatS * dlatS +
      cos(lat1 * pi / lit(180.0)) * cos(lat2 * pi / lit(180.0)) * dlonS * dlonS
    lit(2.0) * lit(6371.0088) * asin(least(lit(1.0), sqrt(h)))
  }

  /** The exact SQL rendering of [[haversine_km]] — same operation order, so
    * an oracle engine (DuckDB) computes bit-compatible doubles modulo ≤1ulp
    * libm differences (callers round to ≥1e-3 grain before hashing). */
  def haversineSql(lat1: String, lon1: String, lat2: String, lon2: String): String = {
    val dlatS = s"SIN(($lat2 - $lat1) * PI() / 180.0 / 2.0)"
    val dlonS = s"SIN(($lon2 - $lon1) * PI() / 180.0 / 2.0)"
    s"2.0 * 6371.0088 * ASIN(LEAST(1.0, SQRT($dlatS * $dlatS + " +
      s"COS($lat1 * PI() / 180.0) * COS($lat2 * PI() / 180.0) * $dlonS * $dlonS)))"
  }

  /** Cosine similarity between two `array<float>` embedding columns.
    * Native codegen expression. */
  def cosine_sim(a: Column, b: Column): Column = graft.expr.CosineSim(a, b)

  /** Dot product of two `array<float>` columns. Native codegen expression. */
  def dot_product(a: Column, b: Column): Column = graft.expr.DotProduct(a, b)

  /** Euclidean distance between two `array<float>` columns. */
  def l2_distance(a: Column, b: Column): Column = graft.expr.L2Distance(a, b)
}
