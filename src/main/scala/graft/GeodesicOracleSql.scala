package graft

/** DuckDB ORACLE for the WGS-84 ellipsoidal geodesic queries — a
  * recursive-CTE replay of the EXACT Vincenty iteration the engine
  * executes ([[graft.expr.Geodesic.inverseKm]]): same formulas, same
  * 1e-12 lambda convergence, same 200-iteration cap, same
  * coincident-point short-circuit, same antipodal haversine fallback.
  *
  * Measured cross-engine agreement
  * (`tools/geodesic_oracle_experiment.py`, recorded in PLANS.md round
  * 11): max |JVM − DuckDB| = 2.0e-12 km over all sf0.01 station pairs
  * (mean 3.9e-14 km) — pure libm trig ulps through the iteration.
  * Outputs round to 1e-3 km on BOTH sides, so a boundary straddle
  * needs a value within ~2e-12 of a 0.5e-3 grain line: expected
  * straddle probability ≈ 2·mean·N/grain < 1e-4 even at sf0.1's 10⁶
  * pairs. A 1e-6 grain (the first idea) measures UNSAFE — ~8%
  * straddle odds at sf0.1 — which is why the grain matches the
  * haversine siblings' 3 dp instead. This retires the catalog's last
  * two `no_oracle` rows. */
object GeodesicOracleSql {

  /** The iteration over all station pairs, yielding
    * (station_1, station_2, dd) with dd = RAW geodesic km. Starts with
    * WITH RECURSIVE — callers append their SELECT over `gdist`. */
  private val F = "(1.0/298.257223563)"
  private val A = "6378137.0"
  private val B = s"($A * (1.0 - $F))"

  val pairsCte: String =
    s"""WITH RECURSIVE stations AS (
       |  SELECT s_suppkey AS id,
       |         51.0 + CAST((s_suppkey * 7) % 100 AS DOUBLE) / 200.0 AS latitude,
       |         -0.5 + CAST((s_suppkey * 13) % 100 AS DOUBLE) / 100.0 AS longitude
       |  FROM supplier
       |),
       |pairs AS (
       |  SELECT a.id AS station_1, b.id AS station_2,
       |         a.latitude AS lat1, a.longitude AS lon1,
       |         b.latitude AS lat2, b.longitude AS lon2
       |  FROM stations a CROSS JOIN stations b
       |),
       |base AS (
       |  SELECT station_1, station_2, lat1, lon1, lat2, lon2,
       |         radians(lon2 - lon1) AS L,
       |         sin(atan((1.0 - $F) * tan(radians(lat1)))) AS sinU1,
       |         cos(atan((1.0 - $F) * tan(radians(lat1)))) AS cosU1,
       |         sin(atan((1.0 - $F) * tan(radians(lat2)))) AS sinU2,
       |         cos(atan((1.0 - $F) * tan(radians(lat2)))) AS cosU2,
       |         (lat1 = lat2 AND lon1 = lon2) AS ident
       |  FROM pairs
       |),
       |it AS (
       |  SELECT station_1, station_2, lat1, lon1, lat2, lon2,
       |         L, sinU1, cosU1, sinU2, cosU2, ident,
       |         L AS lambda, 0 AS i, false AS conv, false AS coincident,
       |         CAST(0.0 AS DOUBLE) AS sinSigma,
       |         CAST(0.0 AS DOUBLE) AS cosSigma,
       |         CAST(0.0 AS DOUBLE) AS sigma,
       |         CAST(0.0 AS DOUBLE) AS cosSqAlpha,
       |         CAST(0.0 AS DOUBLE) AS cos2SigmaM
       |  FROM base
       |  UNION ALL
       |  SELECT station_1, station_2, lat1, lon1, lat2, lon2,
       |         L, sinU1, cosU1, sinU2, cosU2, ident,
       |         s.newLambda AS lambda,
       |         i + 1 AS i,
       |         (s.ss <> 0.0 AND abs(s.newLambda - it.lambda) < 1e-12) AS conv,
       |         (s.ss = 0.0) AS coincident,
       |         s.ss AS sinSigma, s.cs AS cosSigma, s.sg AS sigma,
       |         s.csa AS cosSqAlpha, s.c2m AS cos2SigmaM
       |  FROM it,
       |  LATERAL (
       |    SELECT ss, cs, sg, csa, c2m,
       |           CASE WHEN ss = 0.0 THEN it.lambda ELSE
       |             L + (1.0 - c) * $F * sinAlpha *
       |               (sg + c * ss * (c2m + c * cs *
       |                 (-1.0 + 2.0 * c2m * c2m)))
       |           END AS newLambda
       |    FROM (
       |      SELECT ss, cs, sg, sinAlpha, csa, c2m,
       |             $F / 16.0 * csa * (4.0 + $F * (4.0 - 3.0 * csa)) AS c
       |      FROM (
       |        SELECT ss, cs, atan2(ss, cs) AS sg, sinAlpha,
       |               1.0 - sinAlpha * sinAlpha AS csa,
       |               CASE WHEN (1.0 - sinAlpha * sinAlpha) = 0.0 THEN 0.0
       |                    ELSE cs - 2.0 * sinU1 * sinU2 /
       |                         (1.0 - sinAlpha * sinAlpha) END AS c2m
       |        FROM (
       |          SELECT ss,
       |                 sinU1 * sinU2 + cosU1 * cosU2 * cos(it.lambda) AS cs,
       |                 CASE WHEN ss = 0.0 THEN 0.0
       |                      ELSE cosU1 * cosU2 * sin(it.lambda) / ss
       |                 END AS sinAlpha
       |          FROM (
       |            SELECT sqrt(
       |              (cosU2 * sin(it.lambda)) * (cosU2 * sin(it.lambda)) +
       |              (cosU1 * sinU2 - sinU1 * cosU2 * cos(it.lambda)) *
       |              (cosU1 * sinU2 - sinU1 * cosU2 * cos(it.lambda))) AS ss
       |          ) l0
       |        ) l1
       |      ) l2
       |    ) l3
       |  ) s
       |  WHERE NOT it.conv AND NOT it.coincident AND NOT it.ident AND it.i < 200
       |),
       |final AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY station_1, station_2
       |                                 ORDER BY i DESC) AS rn
       |    FROM it
       |  ) WHERE rn = 1
       |),
       |fin2 AS (
       |  SELECT *, cosSqAlpha * ($A * $A - $B * $B) / ($B * $B) AS uSq
       |  FROM final
       |),
       |fin3 AS (
       |  SELECT *,
       |    1.0 + uSq / 16384.0 *
       |      (4096.0 + uSq * (-768.0 + uSq * (320.0 - 175.0 * uSq))) AS bigA,
       |    uSq / 1024.0 *
       |      (256.0 + uSq * (-128.0 + uSq * (74.0 - 47.0 * uSq))) AS bigB
       |  FROM fin2
       |),
       |fin4 AS (
       |  SELECT *,
       |    bigB * sinSigma *
       |      (cos2SigmaM + bigB / 4.0 *
       |        (cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM) -
       |          bigB / 6.0 * cos2SigmaM *
       |            (-3.0 + 4.0 * sinSigma * sinSigma) *
       |            (-3.0 + 4.0 * cos2SigmaM * cos2SigmaM))) AS deltaSigma
       |  FROM fin3
       |),
       |gdist AS (
       |  SELECT station_1, station_2,
       |    CASE
       |      WHEN ident OR coincident THEN 0.0
       |      WHEN NOT conv THEN
       |        2.0 * 6371.0088 * asin(least(1.0, sqrt(
       |          sin(radians(lat2 - lat1) / 2.0) *
       |          sin(radians(lat2 - lat1) / 2.0)
       |          + cos(radians(lat1)) * cos(radians(lat2)) *
       |            sin(radians(lon2 - lon1) / 2.0) *
       |            sin(radians(lon2 - lon1) / 2.0))))
       |      ELSE $B * bigA * (sigma - deltaSigma) / 1000.0
       |    END AS dd
       |  FROM fin4
       |)""".stripMargin

  /** Oracle for q_dist_pairs_geodesic: every pair, 3 dp. */
  val pairsSql: String =
    s"""$pairsCte
       |SELECT station_1, station_2, ROUND(dd, 3) AS distance_km
       |FROM gdist
       |ORDER BY station_1, station_2""".stripMargin

  /** Oracle for q_dist_within_radius: the RAW distance gates the
    * radius (exactly like the engine's filter-then-round plan; the
    * nearest pair distances to 15.0 are 13.399 / 15.776 at every SF,
    * so the 2e-12 km cross-engine jitter can never flip it). */
  val withinRadiusSql: String =
    s"""$pairsCte
       |SELECT station_1, station_2, ROUND(dd, 3) AS distance_km
       |FROM gdist
       |WHERE dd <= 15.0 AND station_1 <> station_2
       |ORDER BY station_1, station_2""".stripMargin
}
