package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Geo, Reproject}

/** K2 completion — optional EPSG:4326 reproject-on-write (ref
  * generator.py:826, 1006-1007, default off): forward projections
  * pinned against their inverses (Snyder), and the nearest-neighbor
  * warp's value-preservation + georeferencing contract.
  */
class ReprojectSpec extends AnyFunSuite {

  test("LAEA forward is the exact inverse of laeaInverse (both aspects)") {
    for {
      north <- Seq(true, false)
      x <- Seq(-2000000.0, -250000.0, 100000.0, 1500000.0)
      y <- Seq(-1800000.0, -100000.0, 300000.0, 2100000.0)
    } {
      val (lon, lat) = Geo.laeaInverse(x, y, north)
      val (x2, y2) = Geo.laeaForward(lon, lat, north)
      assert(math.abs(x2 - x) < 1e-3 && math.abs(y2 - y) < 1e-3,
        s"round-trip ($x,$y) north=$north → ($lon,$lat) → ($x2,$y2)")
    }
  }

  test("forward dispatch covers the CRS family incl. polar stereo") {
    val (x, y) = Geo.forward("EPSG:3413", -45.0, 75.0)
    val (lon, lat) = Geo.PolarStereoCrs("EPSG:3413").inverse(x, y)
    assert(math.abs(lon - -45.0) < 1e-9 && math.abs(lat - 75.0) < 1e-9)
    assert(Geo.forward("EPSG:4326", 10.0, 20.0) === ((10.0, 20.0)))
  }

  test("warp to 4326: values preserved, grid georeferenced north-down") {
    // 20×20 EASE-north grid around the pole, value = encodes (row, col)
    val n = 20
    val xs = Array.tabulate(n)(i => -500000.0 + i * 50000.0)
    val ys = Array.tabulate(n)(j => 500000.0 - j * 50000.0) // north-down
    val grid = Array.tabulate(n, n)((j, i) => j * 100.0 + i)
    val w = Reproject.toGeographic(Seq("v" -> grid), xs, ys, "EPSG:6931")
    val out = w.bands.head._2
    assert(out.length === n && out.head.length === n)
    // pole inside → longitude spans the full circle
    assert(w.lons.head > -180.0 && w.lons.last < 180.0)
    assert(w.lons.head < -170.0 && w.lons.last > 170.0)
    assert(w.lats.head > w.lats.last, "latitude axis is north-down")
    // every non-NaN output value exists in the source (pure nearest)
    val src = grid.flatten.toSet
    val vals = out.flatten.filterNot(_.isNaN)
    assert(vals.nonEmpty && vals.forall(src.contains))
    // spot geolocation: the destination cell is the source cell its
    // center projects into (independent index math)
    val (j, i) = (n / 3, n / 2)
    val (px, py) = Geo.forward("EPSG:6931", w.lons(i), w.lats(j))
    val si = math.round((px - xs(0)) / 50000.0).toInt
    val sj = math.round((py - ys(0)) / -50000.0).toInt
    if (si >= 0 && si < n && sj >= 0 && sj < n)
      assert(out(j)(i) === grid(sj)(si))
  }
}
