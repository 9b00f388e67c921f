package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Geo
import graft.functions.Geo.{RotatedPole, Sinusoidal}

/** Rotated-pole (CF rotated_latitude_longitude, the CORDEX mapping)
  * against an INDEPENDENT rotation-matrix implementation built here in
  * the test, plus the convention's fixed points; sinusoidal against the
  * published MODIS grid constants.
  */
class RotatedPoleSpec extends AnyFunSuite {

  /** Independent check implementation: rotate the unit vector through
    * R = Rz(λp)·Ry(π/2−θp)·Rz(π) with explicit 3×3 matrices — no code
    * shared with Geo.RotatedPole's closed-form trig.
    */
  private def matrixToGeo(rlon: Double, rlat: Double,
                          poleLat: Double, poleLon: Double): (Double, Double) = {
    def rz(b: Double): Array[Array[Double]] = Array(
      Array(math.cos(b), -math.sin(b), 0),
      Array(math.sin(b), math.cos(b), 0),
      Array(0, 0, 1.0))
    def ry(a: Double): Array[Array[Double]] = Array(
      Array(math.cos(a), 0, math.sin(a)),
      Array(0, 1.0, 0),
      Array(-math.sin(a), 0, math.cos(a)))
    def mul(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
      m.map(row => row(0) * v(0) + row(1) * v(1) + row(2) * v(2))
    val lr = math.toRadians(rlon); val pr = math.toRadians(rlat)
    val v = Array(math.cos(pr) * math.cos(lr),
      math.cos(pr) * math.sin(lr), math.sin(pr))
    val g = mul(rz(math.toRadians(poleLon)),
      mul(ry(math.Pi / 2 - math.toRadians(poleLat)), mul(rz(math.Pi), v)))
    val lat = math.toDegrees(math.asin(math.max(-1, math.min(1.0, g(2)))))
    val lon = math.toDegrees(math.atan2(g(1), g(0)))
    (lon, lat)
  }

  private val EurPole = RotatedPole(poleLat = 39.25, poleLon = -162.0)

  test("closed-form matches the explicit rotation-matrix composition " +
    "across the EUR-11 domain (1e-9 deg)") {
    for (rlon <- Seq(-28.0, -10.5, 0.0, 3.25, 17.0);
         rlat <- Seq(-23.0, -5.5, 0.0, 12.75, 21.0)) {
      val (lon1, lat1) = EurPole.toGeo(rlon, rlat)
      val (lon2, lat2) = matrixToGeo(rlon, rlat, 39.25, -162.0)
      assert(math.abs(lon1 - lon2) < 1e-9 && math.abs(lat1 - lat2) < 1e-9,
        s"($rlon,$rlat): closed ($lon1,$lat1) vs matrix ($lon2,$lat2)")
    }
  }

  test("convention fixed points: rotated pole lands at (poleLon, " +
    "poleLat); rotated origin lands antipodal at (poleLon+180, 90-poleLat)") {
    val (plon, plat) = EurPole.toGeo(0.0, 90.0)
    assert(math.abs(plat - 39.25) < 1e-9)
    // longitude at the pole is degenerate but the latitude pins it;
    // the origin pins both axes:
    val (olon, olat) = EurPole.toGeo(0.0, 0.0)
    assert(math.abs(olon - 18.0) < 1e-9, s"olon=$olon") // -162+180
    assert(math.abs(olat - 50.75) < 1e-9, s"olat=$olat") // 90-39.25
    assert(plat > 0) // north-pole-side rotation
  }

  test("fromGeo inverts toGeo across the domain (1e-9 deg)") {
    for (rlon <- Seq(-25.0, -7.0, 0.0, 9.5, 18.0);
         rlat <- Seq(-20.0, -3.0, 0.0, 8.25, 19.0)) {
      val (lon, lat) = EurPole.toGeo(rlon, rlat)
      val (rlon2, rlat2) = EurPole.fromGeo(lon, lat)
      assert(math.abs(rlon2 - rlon) < 1e-9 && math.abs(rlat2 - rlat) < 1e-9,
        s"($rlon,$rlat) -> ($lon,$lat) -> ($rlon2,$rlat2)")
    }
  }

  test("distances are preserved (rigid rotation): great-circle length " +
    "between rotated points equals length between their geo images") {
    def gc(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
      val (l1, p1) = (math.toRadians(lon1), math.toRadians(lat1))
      val (l2, p2) = (math.toRadians(lon2), math.toRadians(lat2))
      math.acos(math.max(-1, math.min(1.0,
        math.sin(p1) * math.sin(p2) +
          math.cos(p1) * math.cos(p2) * math.cos(l1 - l2))))
    }
    val pts = Seq((-10.0, -5.0), (0.0, 0.0), (12.0, 15.0), (20.0, -18.0))
    for (Seq((a1, b1), (a2, b2)) <- pts.combinations(2)) {
      val d0 = gc(a1, b1, a2, b2)
      val (x1, y1) = EurPole.toGeo(a1, b1)
      val (x2, y2) = EurPole.toGeo(a2, b2)
      assert(math.abs(gc(x1, y1, x2, y2) - d0) < 1e-12)
    }
  }

  test("sinusoidal: MODIS grid constants — x-extent is ±πR " +
    "(20,015,109.354 m), 36-column tile width 1,111,950.52 m") {
    val sin = Sinusoidal()
    val (xMax, _) = sin.forward(180.0, 0.0)
    assert(math.abs(xMax - 20015109.354) < 0.01, s"xMax=$xMax")
    assert(math.abs(2 * xMax / 36 - 1111950.5197) < 0.01)
    // equal-area property: the Jacobian determinant is R² cos φ · ... = 1
    // per unit sphere area — check numerically at assorted points
    for ((lon, lat) <- Seq((0.0, 0.0), (45.0, 30.0), (-120.0, -55.0))) {
      val d = 1e-6
      val (x0, y0) = sin.forward(lon, lat)
      val (x1, _) = sin.forward(lon + d, lat)
      val (xh, y2) = sin.forward(lon, lat + d)
      val area = math.abs((x1 - x0) * (y2 - y0)) // parallelogram (xh shear ⊥)
      val trueArea = Geo.ModisSphereR * Geo.ModisSphereR *
        math.cos(math.toRadians(lat)) *
        math.toRadians(d) * math.toRadians(d)
      assert(math.abs(area / trueArea - 1.0) < 1e-4, s"($lon,$lat)")
    }
  }

  test("sinusoidal round-trips; projToGeo handles the MODIS CRS " +
    "including a pole-touching bbox") {
    val sin = Sinusoidal()
    for ((lon, lat) <- Seq((0.0, 0.0), (103.5, 44.0), (-77.0, -12.0))) {
      val (x, y) = sin.forward(lon, lat)
      val (lon2, lat2) = sin.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
    // MODIS tile h18v03 (northern Europe): h=18 → x ∈ [0, T],
    // v=3 → y ∈ [5T, 6T] (lat 50..60°N) with T the 10° tile size
    val t = 1111950.5196666666
    val bbox = Geo.projToGeo(Seq(0.0, 5 * t, t, 6 * t), "MODIS:SIN")
    assert(math.abs(bbox(1) - 50.0) < 1e-6) // v=4 bottom row = 60-10 = 50°N
    assert(math.abs(bbox(3) - 60.0) < 1e-6)
    assert(math.abs(bbox(0) - 0.0) < 1e-6) // west edge touches lon 0
    // the east edge widens toward the bottom of the tile (smaller cos φ)
    assert(bbox(2) > 19.0 && bbox(2) < 21.0)
    // a bbox reaching the north-pole row spans all longitudes
    val polar = Geo.projToGeo(Seq(-t, 8 * t, t, 9 * t), "MODIS:SIN")
    assert(polar(0) === -180.0 && polar(2) === 180.0)
    assert(math.abs(polar(3) - 90.0) < 1e-6)
  }
}
