package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Geo

/** F11 — proj_to_geo parity with the reference's expected values
  * (reference tests/stac/test_generator.py:163-242).
  */
class GeoSpec extends AnyFunSuite {

  test("EPSG:4326 passthrough (reference test_get_bbox_and_geometry_epsg4326)") {
    assert(Geo.projToGeo(Seq(10.0, 40.0, 30.0, 60.0), "EPSG:4326")
      === Seq(10.0, 40.0, 30.0, 60.0))
  }

  test("EPSG:6931 full extent matches rasterio transform_bounds (test_generator.py:232)") {
    // expected_bbox = (-180.0, -78.49911570449875, 180.0, 90.0), atol 1e-5
    val got = Geo.projToGeo(
      Seq(-8918256.31, -9009964.76, 8918256.31, 9009964.76), "EPSG:6931")
    val expected = Seq(-180.0, -78.49911570449875, 180.0, 90.0)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-5, s"got $got expected $expected")
    }
  }

  test("EPSG:6932 (south aspect) mirrors the north result") {
    val got = Geo.projToGeo(
      Seq(-8918256.31, -9009964.76, 8918256.31, 9009964.76), "EPSG:6932")
    assert(got(0) === -180.0 && got(1) === -90.0 && got(2) === 180.0)
    assert(math.abs(got(3) - 78.49911570449875) < 1e-5)
  }

  test("pole round-trip: projected origin maps to the pole") {
    assert(Geo.laeaInverse(0, 0, north = true) === ((0.0, 90.0)))
    assert(Geo.laeaInverse(0, 0, north = false) === ((0.0, -90.0)))
  }

  test("equator ring: rho = a*sqrt(qp) lands on latitude 0") {
    // forward ρ at φ=0 is a·sqrt(q_p) ≈ 9009964.76 — the EPSG:6931 y-extent
    val (_, lat) = Geo.laeaInverse(0, -9009964.76, north = true)
    assert(math.abs(lat) < 1e-3, s"expected equator, got $lat")
  }

  test("unsupported CRS raises") {
    intercept[IllegalArgumentException] {
      Geo.projToGeo(Seq(0.0, 0.0, 1.0, 1.0), "EPSG:3857")
    }
  }
}
