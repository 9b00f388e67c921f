package graft.functions

/** Optional EPSG:4326 reproject-on-write (K2 completion — ref
  * generator.py:826, 1006-1007: `da.rio.reproject("EPSG:4326")` before
  * the COG write, default OFF).
  *
  * The warp is rioxarray-shaped: destination is a regular lon/lat grid
  * covering the source's geographic bbox at the source's pixel count,
  * sampled by NEAREST neighbor — each destination cell center maps back
  * through the forward projection ([[Geo.forward]]) to a source cell;
  * uncovered destination cells are NaN. GDAL grid-parity (its suggested
  * transform picks slightly different dims) is out of contract, same
  * stance as CogWriter byte-exactness: the correctness surface is
  * value-preservation and correct georeferencing of the output grid.
  *
  * Runs inside the per-COG write task (the slice already fits in task
  * memory by the K2 contract), so the warp adds no shuffle.
  */
object Reproject {

  final case class Warped(
      bands: Seq[(String, Array[Array[Double]])],
      lons: Array[Double],  // cell centers, ascending (west → east)
      lats: Array[Double])  // cell centers, descending (north → south)

  /** Warp multiband grids from `crs` to EPSG:4326.
    *
    * @param bands per-band (name, grid(y)(x)) — row y=0 is ys.head
    * @param xs    source x cell centers, meters, ascending
    * @param ys    source y cell centers, meters (any order; matched to rows)
    */
  def toGeographic(bands: Seq[(String, Array[Array[Double]])],
                   xs: Array[Double], ys: Array[Double],
                   crs: String): Warped = {
    require(xs.length > 1 && ys.length > 1, "warp needs a 2-D grid")
    val (w, h) = (xs.length, ys.length)
    val dx = xs(1) - xs(0)
    val dy = ys(1) - ys(0)
    // geographic bbox of the source's cell-edge envelope
    val bbox = Geo.projToGeo(Seq(
      math.min(xs.head, xs.last) - math.abs(dx) / 2,
      math.min(ys.head, ys.last) - math.abs(dy) / 2,
      math.max(xs.head, xs.last) + math.abs(dx) / 2,
      math.max(ys.head, ys.last) + math.abs(dy) / 2), crs)
    val Seq(lonW, latS, lonE, latN) = bbox
    val dLon = (lonE - lonW) / w
    val dLat = (latN - latS) / h
    val lons = Array.tabulate(w)(i => lonW + dLon * (i + 0.5))
    val lats = Array.tabulate(h)(j => latN - dLat * (j + 0.5)) // north-down
    val warped = bands.map { case (name, g) =>
      val out = Array.fill(h, w)(Double.NaN)
      var j = 0
      while (j < h) {
        var i = 0
        while (i < w) {
          val (x, y) = Geo.forward(crs, lons(i), lats(j))
          val si = math.round((x - xs(0)) / dx).toInt
          val sj = math.round((y - ys(0)) / dy).toInt
          if (si >= 0 && si < w && sj >= 0 && sj < h)
            out(j)(i) = g(sj)(si)
          i += 1
        }
        j += 1
      }
      name -> out
    }
    Warped(warped, lons, lats)
  }
}
