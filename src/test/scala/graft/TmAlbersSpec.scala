package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Geo
import graft.functions.Geo.{AlbersEqualArea, TransverseMercator}

/** Transverse Mercator / UTM and Albers Equal-Area against Snyder's
  * published worked examples plus formula-independent properties:
  * TM scale along the central meridian is exactly k0 (measured against
  * the independent meridian-radius element), TM is conformal, Albers
  * preserves area exactly (unit Jacobian against the independent
  * ellipsoid area element), Albers has unit scale on both standard
  * parallels, and both round-trip at 1e-9 degrees.
  */
class TmAlbersSpec extends AnyFunSuite {

  private val ClarkeA = 6378206.4
  private val ClarkeE2 = 0.00676866

  // ---------------------------------------------------------- helpers

  private def parallelScale(fwd: (Double, Double) => (Double, Double),
                            a: Double, e2: Double,
                            lon: Double, lat: Double): Double = {
    val d = 1e-6
    val (x1, y1) = fwd(lon, lat); val (x2, y2) = fwd(lon + d, lat)
    val phi = math.toRadians(lat)
    val nu = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    math.hypot(x2 - x1, y2 - y1) / (nu * math.cos(phi) * math.toRadians(d))
  }

  private def meridianScale(fwd: (Double, Double) => (Double, Double),
                            a: Double, e2: Double,
                            lon: Double, lat: Double): Double = {
    val d = 1e-6
    val (x1, y1) = fwd(lon, lat); val (x2, y2) = fwd(lon, lat + d)
    val phi = math.toRadians(lat)
    val m = a * (1 - e2) /
      math.pow(1 - e2 * math.sin(phi) * math.sin(phi), 1.5)
    math.hypot(x2 - x1, y2 - y1) / (m * math.toRadians(d))
  }

  /** |det J| of the projection against the TRUE ellipsoid area element
    * M(φ)·ν(φ)·cos φ — the projection-independent equal-area measure.
    */
  private def areaScale(fwd: (Double, Double) => (Double, Double),
                        a: Double, e2: Double,
                        lon: Double, lat: Double): Double = {
    val d = 1e-6
    val (x0, y0) = fwd(lon, lat)
    val (xl, yl) = fwd(lon + d, lat)
    val (xp, yp) = fwd(lon, lat + d)
    val det = math.abs((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0))
    val phi = math.toRadians(lat)
    val s2 = math.sin(phi) * math.sin(phi)
    val nu = a / math.sqrt(1 - e2 * s2)
    val m = a * (1 - e2) / math.pow(1 - e2 * s2, 1.5)
    det / (m * nu * math.cos(phi) *
      math.toRadians(d) * math.toRadians(d))
  }

  // ------------------------------------------------ Transverse Mercator

  test("Snyder PP1395 TM worked example (pp. 269-270): Clarke 1866, " +
    "λ0=-75°, k0=0.9996; 40°30'N 73°30'W → (127106.5, 4484124.4)") {
    val tm = TransverseMercator(ClarkeA, ClarkeE2, lat0 = 0.0,
      lon0 = -75.0, k0 = 0.9996)
    val (x, y) = tm.forward(-73.5, 40.5)
    assert(math.abs(x - 127106.5) < 0.5, s"x=$x")
    assert(math.abs(y - 4484124.4) < 0.5, s"y=$y")
    val (lon, lat) = tm.inverse(127106.5, 4484124.4)
    assert(math.abs(lon - -73.5) < 1e-5 && math.abs(lat - 40.5) < 1e-5)
  }

  test("TM scale on the central meridian is exactly k0; conformal off " +
    "it (meridian scale = parallel scale)") {
    val z18 = Geo.utm(18, north = true) // WGS84
    val (a, e2) = (6378137.0, 6.69437999014e-3)
    for (lat <- Seq(0.5, 35.0, 60.0))
      assert(math.abs(
        meridianScale(z18.forward, a, e2, -75.0, lat) - 0.9996) < 1e-7)
    for ((lon, lat) <- Seq((-77.5, 38.9), (-73.0, 44.0), (-76.2, 18.5))) {
      val ps = parallelScale(z18.forward, a, e2, lon, lat)
      val ms = meridianScale(z18.forward, a, e2, lon, lat)
      assert(math.abs(ps / ms - 1.0) < 1e-7, s"($lon,$lat): $ps vs $ms")
      assert(ps > 0.9996 - 1e-9) // scale grows away from the CM
    }
  }

  test("UTM zone parameterization: zone 31N covers 0°-6°E with CM 3°E; " +
    "equator origin maps to (500000, 0) north / (500000, 1e7) south") {
    val z31n = Geo.utm(31, north = true)
    val (x, y) = z31n.forward(3.0, 0.0)
    assert(math.abs(x - 500000.0) < 1e-6 && math.abs(y) < 1e-6)
    val z31s = Geo.utm(31, north = false)
    val (_, ys) = z31s.forward(3.0, 0.0)
    assert(math.abs(ys - 10000000.0) < 1e-6)
    intercept[IllegalArgumentException] { Geo.utm(61, north = true) }
  }

  test("UTM round-trips across a zone at 1e-8 degrees — the Snyder " +
    "series' own ~mm truncation at the zone edge (incl. southern " +
    "hemisphere)") {
    val z33n = Geo.utm(33, north = true) // CM 15°E
    for (lon <- Seq(12.1, 15.0, 17.9); lat <- Seq(0.01, 38.3, 69.8)) {
      val (x, y) = z33n.forward(lon, lat)
      val (lon2, lat2) = z33n.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8,
        s"($lon,$lat)")
    }
    val z19s = Geo.utm(19, north = false) // CM -69°: the Andes
    for ((lon, lat) <- Seq((-70.6, -33.4), (-67.5, -54.8), (-69.0, -0.5))) {
      val (x, y) = z19s.forward(lon, lat)
      val (lon2, lat2) = z19s.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8)
      assert(y > 0) // false northing keeps the south aspect positive
    }
  }

  // ---------------------------------------------------------- Albers

  test("Snyder PP1395 ellipsoidal Albers worked example (p. 294): " +
    "Clarke 1866, 29.5°/45.5°, origin 23°N 96°W; 35°N 75°W → " +
    "(1885472.7, 1535925.0)") {
    val ab = AlbersEqualArea(ClarkeA, ClarkeE2, 29.5, 45.5, 23.0, -96.0)
    val (x, y) = ab.forward(-75.0, 35.0)
    assert(math.abs(x - 1885472.7) < 0.5, s"x=$x")
    assert(math.abs(y - 1535925.0) < 0.5, s"y=$y")
    val (lon, lat) = ab.inverse(1885472.7, 1535925.0)
    assert(math.abs(lon - -75.0) < 1e-5 && math.abs(lat - 35.0) < 1e-5)
  }

  test("Albers preserves area exactly (unit Jacobian vs the independent " +
    "ellipsoid area element) across CONUS") {
    val ab = Geo.conusAlbers
    val (a, e2) = (6378137.0, 0.00669438002290)
    for ((lon, lat) <- Seq((-96.0, 23.0), (-120.3, 47.8), (-75.2, 40.0),
        (-96.0, 37.5), (-105.0, 31.0))) {
      val s = areaScale(ab.forward, a, e2, lon, lat)
      assert(math.abs(s - 1.0) < 1e-5, s"($lon,$lat): area scale $s")
    }
  }

  test("CRS dispatch: EPSG:326xx/327xx resolve to the right UTM zone, " +
    "EPSG:5070 to CONUS Albers, and projToGeo densifies both") {
    val (x, y) = Geo.forward("EPSG:32633", 15.0, 0.0)
    assert(math.abs(x - 500000.0) < 1e-6 && math.abs(y) < 1e-6)
    val (_, ys) = Geo.forward("EPSG:32719", -69.0, -10.0)
    assert(ys > 8000000.0 && ys < 10000000.0)
    intercept[IllegalArgumentException] { Geo.forward("EPSG:32661", 0, 80) }
    val (ax, ay) = Geo.forward("EPSG:5070", -96.0, 23.0)
    assert(math.abs(ax) < 1e-6 && math.abs(ay) < 1e-6)
    // a 200 km box in zone 33N around the CM maps to a ~2° lon box
    val bb = Geo.projToGeo(
      Seq(400000.0, 4000000.0, 600000.0, 4200000.0), "EPSG:32633")
    assert(bb(0) < 15.0 && 15.0 < bb(2) && bb(2) - bb(0) < 3.0)
    assert(bb(1) > 35.0 && bb(3) < 39.0)
    val cb = Geo.projToGeo(
      Seq(-100000.0, 1400000.0, 100000.0, 1600000.0), "EPSG:5070")
    assert(cb(0) < -96.0 && -96.0 < cb(2))
  }

  test("Albers has unit linear scale along both standard parallels and " +
    "round-trips at 1e-9 degrees") {
    val ab = Geo.conusAlbers
    val (a, e2) = (6378137.0, 0.00669438002290)
    for (lon <- Seq(-118.0, -96.0, -78.0)) {
      assert(math.abs(parallelScale(ab.forward, a, e2, lon, 29.5) - 1.0) < 1e-6)
      assert(math.abs(parallelScale(ab.forward, a, e2, lon, 45.5) - 1.0) < 1e-6)
    }
    for (lon <- Seq(-124.0, -96.0, -67.0); lat <- Seq(24.0, 37.0, 49.0)) {
      val (x, y) = ab.forward(lon, lat)
      val (lon2, lat2) = ab.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"($lon,$lat)")
    }
  }
}
