package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Geo.Geostationary

/** Geostationary view geometry against the GOES-R PUG worked example
  * and checks independent of the projection formulas: the nadir fixed
  * point, the exact equatorial horizon (cos Δλ = r_eq/h — pure circle
  * geometry), the exact limb scan angle (asin(r_eq/h), the tangent to
  * the equatorial circle), mirror symmetries, and round trips.
  */
class GeostationarySpec extends AnyFunSuite {

  private val goesEast = Geostationary(lon0 = -75.0)

  test("GOES-R PUG §5.1.2.8.1 worked example: scan angles " +
    "(-0.024052, 0.095340) rad → (33.846162°N, 84.690932°W)") {
    val Some((lon, lat)) = goesEast.inverse(-0.024052, 0.095340)
    assert(math.abs(lat - 33.846162) < 1e-4, s"lat=$lat")
    assert(math.abs(lon - -84.690932) < 1e-4, s"lon=$lon")
    // and the forward direction reproduces the published scan angles
    val Some((x, y)) = goesEast.forward(-84.690932, 33.846162)
    assert(math.abs(x - -0.024052) < 1e-6, s"x=$x")
    assert(math.abs(y - 0.095340) < 1e-6, s"y=$y")
  }

  test("nadir: the sub-satellite point maps to scan angle (0,0) and back") {
    val Some((x, y)) = goesEast.forward(-75.0, 0.0)
    assert(math.abs(x) < 1e-15 && math.abs(y) < 1e-15)
    val Some((lon, lat)) = goesEast.inverse(0.0, 0.0)
    assert(math.abs(lon - -75.0) < 1e-12 && math.abs(lat) < 1e-12)
  }

  test("equatorial horizon is exactly acos(r_eq/h) away in longitude " +
    "(independent circle geometry)") {
    val horizon = math.toDegrees(math.acos(6378137.0 / 42164160.0))
    assert(goesEast.forward(-75.0 + horizon - 0.05, 0.0).isDefined)
    assert(goesEast.forward(-75.0 + horizon + 0.05, 0.0).isEmpty)
    assert(goesEast.forward(-75.0 - horizon + 0.05, 0.0).isDefined)
    assert(goesEast.forward(-75.0 - horizon - 0.05, 0.0).isEmpty)
  }

  test("limb scan angle is exactly asin(r_eq/h) in the equatorial plane " +
    "(tangent to the equatorial circle)") {
    val limb = math.asin(6378137.0 / 42164160.0)
    assert(goesEast.inverse(limb - 1e-5, 0.0).isDefined)
    assert(goesEast.inverse(limb + 1e-5, 0.0).isEmpty)
  }

  test("mirror symmetries: east-west negates x, north-south negates y") {
    val Some((xe, ye)) = goesEast.forward(-60.0, 25.0)
    val Some((xw, yw)) = goesEast.forward(-90.0, 25.0)
    assert(math.abs(xe + xw) < 1e-12 && math.abs(ye - yw) < 1e-12)
    val Some((xs, ys)) = goesEast.forward(-60.0, -25.0)
    assert(math.abs(xs - xe) < 1e-12 && math.abs(ys + ye) < 1e-12)
  }

  test("round-trips across the visible disk at 1e-9 degrees") {
    for (dlon <- Seq(-70.0, -35.0, 0.0, 35.0, 70.0);
         lat <- Seq(-65.0, -30.0, 0.0, 30.0, 65.0)) {
      goesEast.forward(-75.0 + dlon, lat) match {
        case Some((x, y)) =>
          val Some((lon2, lat2)) = goesEast.inverse(x, y)
          assert(math.abs(lon2 - (-75.0 + dlon)) < 1e-9 &&
            math.abs(lat2 - lat) < 1e-9, s"($dlon,$lat)")
        case None =>
          // only the far corners of the grid are off-disk
          assert(math.abs(dlon) >= 70.0 && math.abs(lat) >= 65.0,
            s"unexpectedly off-disk: ($dlon,$lat)")
      }
    }
  }

  test("Meteosat-style 0° subpoint works with the same geometry") {
    val seviri = Geostationary(lon0 = 0.0)
    val Some((x, y)) = seviri.forward(10.0, 48.0) // central Europe
    val Some((lon, lat)) = seviri.inverse(x, y)
    assert(math.abs(lon - 10.0) < 1e-9 && math.abs(lat - 48.0) < 1e-9)
  }
}
