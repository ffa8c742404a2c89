#!/usr/bin/env python3
"""Geodesic oracle experiment (round-11 VERDICT item 8).

Question: can the two `no_oracle` queries (q_dist_pairs_geodesic,
q_dist_within_radius) get a DuckDB oracle by replaying the WGS-84
Vincenty iteration (graft.expr.Geodesic.inverseKm) in a recursive CTE
and rounding both sides to 1e-6 km?

This script replays the EXACT Scala iteration (same formulas, same
1e-12 lambda convergence, same 200-iteration cap, same antipodal
haversine fallback, same coincident-point short-circuit) in DuckDB SQL
over the same supplier-derived stations, joins against the engine's
verify dump, and measures:
  - max / mean |spark - duckdb| in km  (pure JVM-vs-C libm divergence)
  - the closest approach of any value to a 0.5e-6 rounding boundary
    (how much headroom a ROUND(.,6) oracle would have)

Usage: python3 tools/geodesic_oracle_experiment.py <sfDir> <sparkParquet>
"""
import sys
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
SPARK = (sys.argv[2] if len(sys.argv) > 2
         else "/tmp/verify_out/q_dist_pairs_geodesic.parquet")

F = "(1.0/298.257223563)"          # flattening
A = "6378137.0"                    # semi-major, meters
B = f"({A} * (1.0 - {F}))"         # semi-minor — same expression as Scala

VINCENTY_SQL = f"""
WITH RECURSIVE stations AS (
  SELECT s_suppkey AS id,
         51.0 + CAST((s_suppkey * 7) % 100 AS DOUBLE) / 200.0 AS latitude,
         -0.5 + CAST((s_suppkey * 13) % 100 AS DOUBLE) / 100.0 AS longitude
  FROM '{SF_DIR}/supplier.parquet'
),
pairs AS (
  SELECT a.id AS station_1, b.id AS station_2,
         a.latitude AS lat1, a.longitude AS lon1,
         b.latitude AS lat2, b.longitude AS lon2
  FROM stations a CROSS JOIN stations b
),
base AS (
  SELECT station_1, station_2, lat1, lon1, lat2, lon2,
         radians(lon2 - lon1) AS L,
         sin(atan((1.0 - {F}) * tan(radians(lat1)))) AS sinU1,
         cos(atan((1.0 - {F}) * tan(radians(lat1)))) AS cosU1,
         sin(atan((1.0 - {F}) * tan(radians(lat2)))) AS sinU2,
         cos(atan((1.0 - {F}) * tan(radians(lat2)))) AS cosU2,
         (lat1 = lat2 AND lon1 = lon2) AS ident
  FROM pairs
),
it AS (
  SELECT station_1, station_2, lat1, lon1, lat2, lon2,
         L, sinU1, cosU1, sinU2, cosU2, ident,
         L AS lambda, 0 AS i, false AS conv, false AS coincident,
         CAST(0.0 AS DOUBLE) AS sinSigma, CAST(0.0 AS DOUBLE) AS cosSigma,
         CAST(0.0 AS DOUBLE) AS sigma,
         CAST(0.0 AS DOUBLE) AS cosSqAlpha,
         CAST(0.0 AS DOUBLE) AS cos2SigmaM
  FROM base
  UNION ALL
  SELECT station_1, station_2, lat1, lon1, lat2, lon2,
         L, sinU1, cosU1, sinU2, cosU2, ident,
         s.newLambda AS lambda,
         i + 1 AS i,
         (s.ss <> 0.0 AND abs(s.newLambda - it.lambda) < 1e-12) AS conv,
         (s.ss = 0.0) AS coincident,
         s.ss AS sinSigma, s.cs AS cosSigma, s.sg AS sigma,
         s.csa AS cosSqAlpha, s.c2m AS cos2SigmaM
  FROM it,
  LATERAL (
    SELECT ss, cs, sg, csa, c2m,
           CASE WHEN ss = 0.0 THEN it.lambda ELSE
             L + (1.0 - c) * {F} * sinAlpha *
               (sg + c * ss * (c2m + c * cs *
                 (-1.0 + 2.0 * c2m * c2m)))
           END AS newLambda
    FROM (
      SELECT ss, cs, sg, sinAlpha, csa, c2m,
             {F} / 16.0 * csa * (4.0 + {F} * (4.0 - 3.0 * csa)) AS c
      FROM (
        SELECT ss, cs, atan2(ss, cs) AS sg, sinAlpha,
               1.0 - sinAlpha * sinAlpha AS csa,
               CASE WHEN (1.0 - sinAlpha * sinAlpha) = 0.0 THEN 0.0
                    ELSE cs - 2.0 * sinU1 * sinU2 /
                         (1.0 - sinAlpha * sinAlpha) END AS c2m
        FROM (
          SELECT ss,
                 sinU1 * sinU2 + cosU1 * cosU2 * cos(it.lambda) AS cs,
                 CASE WHEN ss = 0.0 THEN 0.0
                      ELSE cosU1 * cosU2 * sin(it.lambda) / ss
                 END AS sinAlpha
          FROM (
            SELECT sqrt(
              (cosU2 * sin(it.lambda)) * (cosU2 * sin(it.lambda)) +
              (cosU1 * sinU2 - sinU1 * cosU2 * cos(it.lambda)) *
              (cosU1 * sinU2 - sinU1 * cosU2 * cos(it.lambda))) AS ss
          ) l0
        ) l1
      ) l2
    ) l3
  ) s
  WHERE NOT it.conv AND NOT it.coincident AND NOT it.ident AND it.i < 200
),
final AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY station_1, station_2
                                 ORDER BY i DESC) AS rn
    FROM it
  ) WHERE rn = 1
),
fin2 AS (
  SELECT *, cosSqAlpha * ({A} * {A} - {B} * {B}) / ({B} * {B}) AS uSq
  FROM final
),
fin3 AS (
  SELECT *,
    1.0 + uSq / 16384.0 *
      (4096.0 + uSq * (-768.0 + uSq * (320.0 - 175.0 * uSq))) AS bigA,
    uSq / 1024.0 *
      (256.0 + uSq * (-128.0 + uSq * (74.0 - 47.0 * uSq))) AS bigB
  FROM fin2
),
fin4 AS (
  SELECT *,
    bigB * sinSigma *
      (cos2SigmaM + bigB / 4.0 *
        (cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM) -
          bigB / 6.0 * cos2SigmaM *
            (-3.0 + 4.0 * sinSigma * sinSigma) *
            (-3.0 + 4.0 * cos2SigmaM * cos2SigmaM))) AS deltaSigma
  FROM fin3
)
SELECT station_1, station_2,
  CASE
    WHEN ident OR coincident THEN 0.0
    WHEN NOT conv THEN  -- antipodal fallback: haversine, mean radius
      2.0 * 6371.0088 * asin(least(1.0, sqrt(
        sin(radians(lat2 - lat1) / 2.0) * sin(radians(lat2 - lat1) / 2.0)
        + cos(radians(lat1)) * cos(radians(lat2)) *
          sin(radians(lon2 - lon1) / 2.0) *
          sin(radians(lon2 - lon1) / 2.0))))
    ELSE {B} * bigA * (sigma - deltaSigma) / 1000.0
  END AS dd
FROM fin4
"""

print("running DuckDB Vincenty replay ...", flush=True)
con = duckdb.connect()
duck = con.sql(VINCENTY_SQL).df()
spark = con.sql(f"SELECT * FROM '{SPARK}'").df()
print(f"duck rows={len(duck)} spark rows={len(spark)}")
m = spark.merge(duck, on=["station_1", "station_2"], how="inner")
assert len(m) == len(spark), "join mismatch"
diff = (m["distance_km"] - m["dd"]).abs()
print(f"max |spark-duck|  = {diff.max():.3e} km")
print(f"mean |spark-duck| = {diff.mean():.3e} km")
frac = (m["distance_km"] * 1e6) % 1.0
bnd = (frac - 0.5).abs().min()
print(f"closest approach to a .5e-6 boundary = {bnd:.3e} (x1e-6 km units)")
print("verdict:",
      "1e-6 oracle SAFE at this SF"
      if diff.max() * 1e6 < 0.01 and bnd > 0.01
      else "1e-6 oracle UNSAFE - keep the twin tag")
