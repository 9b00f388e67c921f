package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Geo
import graft.functions.Geo.LambertConformal

/** Lambert Conformal Conic against Snyder's published numerical
  * examples (PP 1395 appendix) plus checks that are INDEPENDENT of the
  * projection formulas: grid scale along the standard parallels must be
  * exactly 1 (measured against the ellipsoid's parallel radius
  * ν·cos φ), the map must be conformal (meridian scale = parallel scale
  * everywhere), and forward∘inverse must be the identity.
  */
class LccSpec extends AnyFunSuite {

  // Clarke 1866 (the ellipsoid of Snyder's examples)
  private val ClarkeA = 6378206.4
  private val ClarkeE2 = 0.00676866

  test("Snyder PP1395 ellipsoidal LCC worked example (pp. 296-297)") {
    // φ1=33°, φ2=45°, φ0=23°, λ0=−96°; φ=35°, λ=−75° →
    // x = 1,894,410.9 m, y = 1,564,649.5 m (published to 0.1 m)
    val lcc = LambertConformal(ClarkeA, ClarkeE2, 33.0, 45.0, 23.0, -96.0)
    val (x, y) = lcc.forward(-75.0, 35.0)
    assert(math.abs(x - 1894410.9) < 1.0, s"x=$x")
    assert(math.abs(y - 1564649.5) < 1.0, s"y=$y")
    val (lon, lat) = lcc.inverse(1894410.9, 1564649.5)
    assert(math.abs(lon - -75.0) < 1e-5, s"lon=$lon")
    assert(math.abs(lat - 35.0) < 1e-5, s"lat=$lat")
  }

  test("Snyder PP1395 spherical LCC worked example (p. 290, R=1)") {
    // Same parallels on the unit sphere: φ=35°, λ=−75° →
    // x = 0.2966785, y = 0.2462112
    val lcc = LambertConformal(1.0, 0.0, 33.0, 45.0, 23.0, -96.0)
    val (x, y) = lcc.forward(-75.0, 35.0)
    assert(math.abs(x - 0.2966785) < 1e-6, s"x=$x")
    assert(math.abs(y - 0.2462112) < 1e-6, s"y=$y")
  }

  /** Local scale along a parallel, measured numerically against the
    * TRUE ellipsoidal parallel circumference element ν(φ)·cos φ·dλ —
    * shares no code with the projection.
    */
  private def parallelScale(p: LambertConformal, a: Double, e2: Double,
                            lonDeg: Double, latDeg: Double): Double = {
    val d = 1e-6 // degrees
    val (x1, y1) = p.forward(lonDeg, latDeg)
    val (x2, y2) = p.forward(lonDeg + d, latDeg)
    val phi = math.toRadians(latDeg)
    val nu = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    math.hypot(x2 - x1, y2 - y1) / (nu * math.cos(phi) * math.toRadians(d))
  }

  /** Local scale along a meridian, against the meridian radius
    * M(φ) = a(1−e²)/(1−e² sin²φ)^{3/2}.
    */
  private def meridianScale(p: LambertConformal, a: Double, e2: Double,
                            lonDeg: Double, latDeg: Double): Double = {
    val d = 1e-6
    val (x1, y1) = p.forward(lonDeg, latDeg)
    val (x2, y2) = p.forward(lonDeg, latDeg + d)
    val phi = math.toRadians(latDeg)
    val m = a * (1 - e2) /
      math.pow(1 - e2 * math.sin(phi) * math.sin(phi), 1.5)
    math.hypot(x2 - x1, y2 - y1) / (m * math.toRadians(d))
  }

  test("grid scale is 1 on both standard parallels, <1 between, >1 " +
    "outside (secant-cone geometry, independent of the formulas)") {
    val lcc = Geo.LccCrs("EPSG:2154") // 49°/44°, GRS80
    val (a, e2) = (6378137.0, 0.00669438002290)
    for (lon <- Seq(-4.0, 3.0, 8.0)) {
      assert(math.abs(parallelScale(lcc, a, e2, lon, 49.0) - 1.0) < 1e-6)
      assert(math.abs(parallelScale(lcc, a, e2, lon, 44.0) - 1.0) < 1e-6)
    }
    assert(parallelScale(lcc, a, e2, 3.0, 46.5) < 1.0)
    assert(parallelScale(lcc, a, e2, 3.0, 51.5) > 1.0)
    assert(parallelScale(lcc, a, e2, 3.0, 41.5) > 1.0)
  }

  test("conformality: meridian scale equals parallel scale at arbitrary " +
    "points") {
    val lcc = Geo.LccCrs("EPSG:2154")
    val (a, e2) = (6378137.0, 0.00669438002290)
    for ((lon, lat) <- Seq((3.0, 46.5), (-1.5, 43.2), (7.8, 49.9),
        (2.35, 48.86))) {
      val ps = parallelScale(lcc, a, e2, lon, lat)
      val ms = meridianScale(lcc, a, e2, lon, lat)
      assert(math.abs(ps / ms - 1.0) < 1e-5, s"($lon,$lat): $ps vs $ms")
    }
  }

  test("Lambert-93 grid origin anchors at the false easting/northing; " +
    "Paris lands where the national grid puts it") {
    val lcc = Geo.LccCrs("EPSG:2154")
    val (x0, y0) = lcc.forward(3.0, 46.5)
    assert(math.abs(x0 - 700000.0) < 1e-3 && math.abs(y0 - 6600000.0) < 1e-3)
    // Notre-Dame sits near X=652.5 km, Y=6862 km in RGF93/Lambert-93
    val (px, py) = lcc.forward(2.3522, 48.8566)
    assert(math.abs(px - 652500.0) < 5000.0, s"px=$px")
    assert(math.abs(py - 6862000.0) < 5000.0, s"py=$py")
  }

  test("HRRR spherical tangent-cone: unit scale at 38.5°N, round-trips " +
    "across the CONUS domain") {
    val hrrr = Geo.LccCrs("HRRR")
    assert(math.abs(hrrr.n - math.sin(math.toRadians(38.5))) < 1e-12)
    for (lon <- Seq(-120.0, -97.5, -75.0))
      assert(math.abs(
        parallelScale(hrrr, 6371229.0, 0.0, lon, 38.5) - 1.0) < 1e-6)
    for ((lon, lat) <- Seq((-122.7, 45.5), (-97.5, 38.5), (-71.06, 42.36),
        (-106.6, 35.08))) {
      val (x, y) = hrrr.forward(lon, lat)
      val (lon2, lat2) = hrrr.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
  }

  test("round-trip across the EPSG:2154 domain at 1e-9 degrees") {
    val lcc = Geo.LccCrs("EPSG:2154")
    for (lon <- Seq(-5.0, -3.0, -1.0, 1.0, 3.0, 5.0, 7.0, 9.0);
         lat <- Seq(41.0, 43.0, 45.0, 47.0, 49.0, 51.0)) {
      val (x, y) = lcc.forward(lon, lat)
      val (lon2, lat2) = lcc.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
    }
  }

  test("projToGeo densifies LCC bbox edges and dispatches by CRS name") {
    // a 100 km box around the Lambert-93 origin
    val got = Geo.projToGeo(
      Seq(650000.0, 6550000.0, 750000.0, 6650000.0), "EPSG:2154")
    assert(got(0) < 3.0 && got(2) > 3.0) // origin lon inside
    assert(got(1) < 46.5 && got(3) > 46.5)
    assert(got(2) - got(0) < 2.0 && got(3) - got(1) < 2.0) // ~1° box
    // forward dispatch
    val (fx, fy) = Geo.forward("EPSG:2154", 3.0, 46.5)
    assert(math.abs(fx - 700000.0) < 1e-3 && math.abs(fy - 6600000.0) < 1e-3)
  }
}
