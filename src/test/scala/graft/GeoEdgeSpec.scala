package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Geo
import graft.functions.Geo.{LambertConformal, RotatedPole, Sinusoidal,
  TransverseMercator}

/** Degenerate-input behavior of the projection library: poles, cone
  * apexes, and the points where a formula's limit matters more than its
  * generic branch.
  */
class GeoEdgeSpec extends AnyFunSuite {

  test("LCC: the near pole maps to the cone apex and inverts back; the " +
    "far pole diverges to infinity (not to a silently-wrong finite point)") {
    val lcc = Geo.LccCrs("EPSG:2154") // n > 0 (northern cone)
    val (ax, ay) = lcc.apex
    val (px, py) = lcc.forward(3.0, 90.0)
    assert(math.abs(px - ax) < 1e-6 && math.abs(py - ay) < 1e-6)
    val (lon, lat) = lcc.inverse(ax, ay)
    assert(math.abs(lat - 90.0) < 1e-9 && math.abs(lon - 3.0) < 1e-9)
    // the far pole is at infinity; in doubles tan(π/2) is finite, so
    // it lands beyond 10^15 m — unmistakably not a real coordinate
    val (_, sy) = lcc.forward(3.0, -90.0)
    assert(sy.isInfinite || sy.isNaN || math.abs(sy) > 1e15, s"sy=$sy")
  }

  test("TM: every longitude collapses to the central point at the pole") {
    val tm = TransverseMercator(6378137.0, 6.69437999014e-3, 0.0, -75.0)
    val (x1, y1) = tm.forward(-75.0, 90.0)
    val (x2, y2) = tm.forward(60.0, 90.0)
    assert(math.abs(x1 - x2) < 1e-6 && math.abs(y1 - y2) < 1e-6)
    assert(math.abs(x1) < 1e-6) // on the central meridian
  }

  test("UTM zone extremes: zone 1 CM is 177°W, zone 60 CM is 177°E, " +
    "both anchor 500 km false easting") {
    val (x1, _) = Geo.utm(1, north = true).forward(-177.0, 10.0)
    val (x60, _) = Geo.utm(60, north = true).forward(177.0, 10.0)
    assert(math.abs(x1 - 500000.0) < 1e-6)
    assert(math.abs(x60 - 500000.0) < 1e-6)
  }

  test("rotated pole: fromGeo at the pole's own geographic location " +
    "returns rlat=90; toGeo/fromGeo handle the antipode row") {
    val rp = RotatedPole(39.25, -162.0)
    // asin(1-ε) amplifies double rounding to ~1e-6 deg at the pole
    val (_, rlat) = rp.fromGeo(-162.0, 39.25)
    assert(math.abs(rlat - 90.0) < 1e-5)
    // the rotated south pole sits antipodal to the rotated north pole
    val (slon, slat) = rp.toGeo(0.0, -90.0)
    assert(math.abs(slat - -39.25) < 1e-9)
    assert(math.abs(math.abs(slon - 18.0)) < 1e-9) // -162 + 180
  }

  test("sinusoidal: the poles pin longitude to 0 instead of dividing " +
    "by cos(90°) noise") {
    val s = Sinusoidal()
    val (x, y) = s.forward(123.0, 90.0)
    val (lon, lat) = s.inverse(x, y)
    assert(math.abs(lat - 90.0) < 1e-9)
    assert(lon === 0.0) // indeterminate at the pole; pinned
  }

  test("geostationary: the grazing point itself is classified " +
    "not-visible (strict horizon), one step inside is visible") {
    val g = Geo.Geostationary(lon0 = 0.0)
    val horizon = math.toDegrees(math.acos(6378137.0 / 42164160.0))
    assert(g.forward(horizon - 1e-9, 0.0).isDefined)
    assert(g.forward(horizon + 1e-9, 0.0).isEmpty)
  }

  test("single-parallel LCC (tangent cone) equals the two-parallel " +
    "form in the lat1 → lat2 limit") {
    val tangent = LambertConformal(6378137.0, 6.69437999014e-3,
      45.0, 45.0, 40.0, -100.0)
    val nearTangent = LambertConformal(6378137.0, 6.69437999014e-3,
      44.9999999, 45.0000001, 40.0, -100.0)
    for ((lon, lat) <- Seq((-100.0, 45.0), (-95.0, 42.0), (-108.0, 50.0))) {
      val (x1, y1) = tangent.forward(lon, lat)
      val (x2, y2) = nearTangent.forward(lon, lat)
      assert(math.abs(x1 - x2) < 0.1 && math.abs(y1 - y2) < 0.1,
        s"($lon,$lat): ($x1,$y1) vs ($x2,$y2)")
    }
  }
}
