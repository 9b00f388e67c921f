package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Geo
import graft.functions.Geo.PolarStereo

/** Polar stereographic (NSIDC grid family) against Snyder's published
  * numerical example and self-consistent round trips.
  */
class GeoSpec2 extends AnyFunSuite {

  test("Snyder PP1395 polar stereographic worked example (p. 315)") {
    // International ellipsoid a=6378388, e²=0.00672267; φc=−71°, λ0=−100°;
    // φ=−75°, λ=150° → x=−1,540,033.6  y=−560,526.4 (published to 0.1 m)
    val ps = PolarStereo(6378388.0, 0.00672267, -71.0, -100.0, north = false)
    val (x, y) = ps.forward(150.0, -75.0)
    assert(math.abs(x - -1540033.6) < 1.0, s"x=$x")
    assert(math.abs(y - -560526.4) < 1.0, s"y=$y")
    val (lon, lat) = ps.inverse(-1540033.6, -560526.4)
    assert(math.abs(lon - 150.0) < 1e-5, s"lon=$lon")
    assert(math.abs(lat - -75.0) < 1e-5, s"lat=$lat")
  }

  test("EPSG:3413 and EPSG:3412 round-trip") {
    for ((crs, pts) <- Seq(
      "EPSG:3413" -> Seq((10.0, 75.0), (-45.0, 88.0), (170.0, 60.5)),
      "EPSG:3412" -> Seq((10.0, -75.0), (0.0, -88.0), (-170.0, -60.5)))) {
      val ps = Geo.PolarStereoCrs(crs)
      for ((lon, lat) <- pts) {
        val (x, y) = ps.forward(lon, lat)
        val (lon2, lat2) = ps.inverse(x, y)
        assert(math.abs(lon2 - lon) < 1e-9, s"$crs $lon -> $lon2")
        assert(math.abs(lat2 - lat) < 1e-9, s"$crs $lat -> $lat2")
      }
    }
  }

  test("pole at the projection origin") {
    val (lon, lat) = Geo.PolarStereoCrs("EPSG:3413").inverse(0.0, 0.0)
    assert(lat === 90.0)
    val (_, latS) = Geo.PolarStereoCrs("EPSG:3976").inverse(0.0, 0.0)
    assert(latS === -90.0)
  }

  test("projToGeo with a pole-containing EPSG:3413 bbox saturates") {
    val got = Geo.projToGeo(
      Seq(-3850000.0, -5350000.0, 3750000.0, 5850000.0), "EPSG:3413")
    assert(got(0) === -180.0 && got(2) === 180.0 && got(3) === 90.0)
    assert(got(1) > 30.0 && got(1) < 60.0) // south edge stays mid-latitude
  }
}
