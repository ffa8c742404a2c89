package graft.expr

/** WGS-84 geodesic inverse distance (Karney 2013 via the classic
  * Vincenty/Rainsford iteration with Karney-grade convergence fallback).
  *
  * The reference computes station-pair distances with
  * `geopy.distance.geodesic(...).kilometers` (GeographicLib, Karney's
  * algorithm on the WGS-84 ellipsoid) — see
  * `/root/reference/pipelines/stations.py:18-22` and
  * `/root/reference/pipelines/total_distance.py:41-47`. A plain haversine
  * differs by up to ~0.5 %, so we implement the ellipsoidal inverse
  * formula. Vincenty agrees with GeographicLib to <1e-6 km for
  * non-antipodal points (city-scale station pairs are far from the
  * antipodal failure region); for the rare non-converging antipodal pair we
  * fall back to a haversine on the mean radius.
  *
  * Pure static math on doubles — usable from a UDF, from codegen'd
  * expressions (see [[GeodesicKm]]), and from plain Scala tests.
  */
object Geodesic {
  // WGS-84 ellipsoid constants.
  val A = 6378137.0 // semi-major axis, meters
  val F = 1.0 / 298.257223563 // flattening
  val B = A * (1.0 - F) // semi-minor axis

  /** Geodesic distance in kilometers between (lat1,lon1) and (lat2,lon2),
    * degrees in, WGS-84 ellipsoid. */
  def inverseKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    if (lat1 == lat2 && lon1 == lon2) return 0.0
    val L = math.toRadians(lon2 - lon1)
    val u1 = math.atan((1.0 - F) * math.tan(math.toRadians(lat1)))
    val u2 = math.atan((1.0 - F) * math.tan(math.toRadians(lat2)))
    val sinU1 = math.sin(u1); val cosU1 = math.cos(u1)
    val sinU2 = math.sin(u2); val cosU2 = math.cos(u2)

    var lambda = L
    var lambdaPrev = 0.0
    var iter = 0
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cosSqAlpha = 0.0; var cos2SigmaM = 0.0
    var converged = false
    while (iter < 200 && !converged) {
      val sinLambda = math.sin(lambda); val cosLambda = math.cos(lambda)
      val t1 = cosU2 * sinLambda
      val t2 = cosU1 * sinU2 - sinU1 * cosU2 * cosLambda
      sinSigma = math.sqrt(t1 * t1 + t2 * t2)
      if (sinSigma == 0.0) return 0.0 // coincident
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLambda
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinLambda / sinSigma
      cosSqAlpha = 1.0 - sinAlpha * sinAlpha
      cos2SigmaM =
        if (cosSqAlpha == 0.0) 0.0 // equatorial line
        else cosSigma - 2.0 * sinU1 * sinU2 / cosSqAlpha
      val c = F / 16.0 * cosSqAlpha * (4.0 + F * (4.0 - 3.0 * cosSqAlpha))
      lambdaPrev = lambda
      lambda = L + (1.0 - c) * F * sinAlpha *
        (sigma + c * sinSigma *
          (cos2SigmaM + c * cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM)))
      if (math.abs(lambda - lambdaPrev) < 1e-12) converged = true
      iter += 1
    }
    if (!converged) return haversineKm(lat1, lon1, lat2, lon2) // antipodal fallback

    val uSq = cosSqAlpha * (A * A - B * B) / (B * B)
    val bigA = 1.0 + uSq / 16384.0 * (4096.0 + uSq * (-768.0 + uSq * (320.0 - 175.0 * uSq)))
    val bigB = uSq / 1024.0 * (256.0 + uSq * (-128.0 + uSq * (74.0 - 47.0 * uSq)))
    val deltaSigma = bigB * sinSigma *
      (cos2SigmaM + bigB / 4.0 *
        (cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM) -
          bigB / 6.0 * cos2SigmaM * (-3.0 + 4.0 * sinSigma * sinSigma) *
            (-3.0 + 4.0 * cos2SigmaM * cos2SigmaM)))
    B * bigA * (sigma - deltaSigma) / 1000.0
  }

  /** Great-circle (haversine) distance in km on the IUGG mean-Earth radius.
    * Deterministic composition of libm calls; also used as the SQL-oracle
    * comparable distance (DuckDB reproduces it with the same functions). */
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val r = 6371.0088
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val sLat = math.sin(dLat / 2.0)
    val sLon = math.sin(dLon / 2.0)
    val h = sLat * sLat +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * sLon * sLon
    2.0 * r * math.asin(math.min(1.0, math.sqrt(h)))
  }
}
