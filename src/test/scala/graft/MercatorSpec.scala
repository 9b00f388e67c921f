package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Geo

/** Geo.Mercator pinned against math it does NOT use: the closed-form
  * northing vs Simpson quadrature of the isometric-latitude integrand,
  * and conformality (h = k) via numeric differentiation of forward().
  */
class MercatorSpec extends AnyFunSuite {

  private val A = 6378137.0
  private val E2 = 6.69437999014e-3

  /** ∫₀^φ (1−e²) / ((1−e²·sin²t)·cos t) dt by composite Simpson —
    * the isometric latitude, straight from its differential definition.
    */
  private def isometricNumeric(phi: Double, e2: Double): Double = {
    val n = 20000
    val h = phi / n
    def f(t: Double): Double = {
      val s = math.sin(t)
      (1 - e2) / ((1 - e2 * s * s) * math.cos(t))
    }
    var acc = f(0) + f(phi)
    var i = 1
    while (i < n) {
      acc += (if (i % 2 == 1) 4.0 else 2.0) * f(i * h)
      i += 1
    }
    acc * h / 3
  }

  test("ellipsoidal northing equals k times the NUMERIC isometric " +
    "latitude across the mid-latitudes") {
    val m = Geo.Mercator(A, E2, latTs = 0.0)
    for (latDeg <- Seq(-70.0, -35.0, -5.0, 10.0, 33.0, 52.0, 78.0)) {
      val (_, y) = m.forward(0.0, latDeg)
      val psi = isometricNumeric(math.toRadians(latDeg), E2)
      assert(math.abs(y - m.k * psi) < 1e-4,
        f"lat $latDeg%.1f: y=$y%.6f vs k·ψ=${m.k * psi}%.6f")
    }
  }

  test("sphere reduces to R·ln(tan(π/4 + φ/2)) and the classic " +
    "inverse") {
    val r = 6371229.0
    val m = Geo.Mercator(r, 0.0)
    val phi = math.toRadians(43.0)
    val (x, y) = m.forward(-120.0, 43.0)
    assert(math.abs(y - r * math.log(math.tan(math.Pi / 4 + phi / 2))) < 1e-6)
    assert(math.abs(x - r * math.toRadians(-120.0)) < 1e-6)
    val (lon, lat) = m.inverse(x, y)
    assert(math.abs(lon - -120.0) < 1e-12 && math.abs(lat - 43.0) < 1e-12)
  }

  test("conformality: numeric h (meridian scale) equals numeric k " +
    "(parallel scale) on the ellipsoid, and both are 1 at the " +
    "true-scale parallel") {
    val latTs = 20.0
    val m = Geo.Mercator(A, E2, latTs)
    val d = 1e-7 // degrees, for the central differences
    for (latDeg <- Seq(-40.0, 0.0, latTs, 45.0, 65.0)) {
      val phi = math.toRadians(latDeg)
      val s = math.sin(phi)
      val mRad = A * (1 - E2) / math.pow(1 - E2 * s * s, 1.5)
      val pRad = A * math.cos(phi) / math.sqrt(1 - E2 * s * s)
      val dy = m.forward(0.0, latDeg + d)._2 - m.forward(0.0, latDeg - d)._2
      val dx = m.forward(d, latDeg)._1 - m.forward(-d, latDeg)._1
      val h = dy / (mRad * math.toRadians(2 * d))
      val k = dx / (pRad * math.toRadians(2 * d))
      assert(math.abs(h - k) < 1e-5, f"lat $latDeg%.1f: h=$h%.8f k=$k%.8f")
      if (latDeg == latTs) assert(math.abs(k - 1.0) < 1e-6)
    }
  }

  test("round-trips at 1e-11 degrees across the domain; lon0 offsets " +
    "normalize across the dateline") {
    val m = Geo.Mercator(A, E2, latTs = 10.0, lon0 = 150.0)
    for (lat <- Seq(-75.0, -30.0, 0.0, 15.0, 60.0, 80.0);
         lon <- Seq(-170.0, -60.0, 0.0, 90.0, 179.5)) {
      val (x, y) = m.forward(lon, lat)
      val (lon2, lat2) = m.inverse(x, y)
      assert(math.abs(lat2 - lat) < 1e-11, s"lat $lat,$lon")
      assert(math.abs(lon2 - lon) < 1e-11 ||
        math.abs(math.abs(lon2 - lon) - 360.0) < 1e-11, s"lon $lat,$lon")
    }
  }
}
