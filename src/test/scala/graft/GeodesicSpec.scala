package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.Geodesic

/** Numeric pinning + property tests for the WGS-84 geodesic
  * (reference parity target: geopy `geodesic(...).kilometers`,
  * `/root/reference/pipelines/stations.py:18-22`). */
class GeodesicSpec extends AnyFunSuite {

  /** Seeded property loop: 300 deterministic random coordinate draws. */
  private def forAllCoords(n: Int = 300)(body: (Double, Double, Double, Double, Double, Double) => Unit): Unit = {
    val rng = new scala.util.Random(42)
    def lat() = -85.0 + rng.nextDouble() * 170.0
    def lon() = -180.0 + rng.nextDouble() * 360.0
    (0 until n).foreach(_ => body(lat(), lon(), lat(), lon(), lat(), lon()))
  }

  test("pinned: Vincenty's own test line Flinders Peak -> Buninyong") {
    // Classic geodetic test vector (Vincenty 1975 / Geoscience Australia):
    // 54972.271 m on GRS80/WGS84 (difference is sub-mm at this scale).
    val km = Geodesic.inverseKm(
      -37.0 - 57.0 / 60 - 3.72030 / 3600, 144.0 + 25.0 / 60 + 29.52440 / 3600,
      -37.0 - 39.0 / 60 - 10.15610 / 3600, 143.0 + 55.0 / 60 + 35.38390 / 3600)
    assert(math.abs(km - 54.972271) < 1e-6)
  }

  test("pinned: London station pair, WGS-84 ellipsoidal distance") {
    // Harper Road <-> Wellington Arch (notebook cell 6 coordinates).
    // 3.735089 km cross-checked against an independent Vincenty
    // implementation; geopy (Karney) agrees to <1e-6 km at city scale.
    val km = Geodesic.inverseKm(51.49859784, -0.096191134, 51.50274025, -0.149569201)
    assert(math.abs(km - 3.735089) < 0.0005)
  }

  test("pinned: equator quarter-circumference along the equator") {
    // Along-equator geodesic = a * radians (pure ellipse arc):
    // 90 deg -> pi/2 * 6378.137 km = 10018.754 km (to meter precision).
    val km = Geodesic.inverseKm(0.0, 0.0, 0.0, 90.0)
    assert(math.abs(km - 10018.754) < 0.001)
  }

  test("pinned: pole-to-equator meridian arc") {
    // WGS-84 meridian quadrant = 10001.9657 km.
    val km = Geodesic.inverseKm(0.0, 0.0, 90.0, 0.0)
    assert(math.abs(km - 10001.9657) < 0.001)
  }

  test("property: symmetry, identity, non-negativity") {
    forAllCoords() { (a1, o1, a2, o2, _, _) =>
      val d12 = Geodesic.inverseKm(a1, o1, a2, o2)
      val d21 = Geodesic.inverseKm(a2, o2, a1, o1)
      assert(d12 >= 0.0)
      assert(math.abs(d12 - d21) < 1e-9)
      assert(Geodesic.inverseKm(a1, o1, a1, o1) == 0.0)
    }
  }

  test("property: triangle inequality (with iteration tolerance)") {
    forAllCoords() { (a1, o1, a2, o2, a3, o3) =>
        val ab = Geodesic.inverseKm(a1, o1, a2, o2)
        val bc = Geodesic.inverseKm(a2, o2, a3, o3)
        val ac = Geodesic.inverseKm(a1, o1, a3, o3)
        assert(ac <= ab + bc + 1e-6)
    }
  }

  test("property: geodesic within 0.6% of haversine (sanity envelope)") {
    forAllCoords() { (a1, o1, a2, o2, _, _) =>
      val g = Geodesic.inverseKm(a1, o1, a2, o2)
      val h = Geodesic.haversineKm(a1, o1, a2, o2)
      if (h > 1.0) assert(math.abs(g - h) / h < 0.006)
    }
  }
}
