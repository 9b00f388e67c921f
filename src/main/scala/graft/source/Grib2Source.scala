package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed GRIB2 scan: one task per file, one tidy row per
  * (field, j scanline) — the same shape the netCDF tidy scan emits, so
  * downstream band-stats/regrid queries run unchanged on GRIB inputs.
  *
  * Scale note: a production archive pairs each GRIB with a `.idx`
  * sidecar (byte offsets per message); the upgrade path is planning-
  * time sub-file splits on those offsets — each message is already
  * independently decodable, exactly like the netCDF DSv2 source's
  * (variable × leadtime) splits. At fixture scale whole-file tasks
  * are the right plan.
  */
object Grib2Source {

  def tidy(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    val paths = Discovery.resolve(Seq(glob), extension = "grib2")
      .map(_.toString)
    val par = math.max(1, math.min(paths.size,
      spark.sparkContext.defaultParallelism))
    spark.createDataset(spark.sparkContext.parallelize(paths, par))
      .flatMap { p =>
        val bytes = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p))
        Grib2.read(bytes).zipWithIndex.flatMap { case (f, fi) =>
          // per-row latitude: regular grids step in degrees; Lambert
          // grids step in projected METERS, so the row anchor (cell
          // i=0) georeferences through the cone. Normalized row 0 is
          // northernmost; the file's first point maps to stored row 0,
          // which scan bit 0x40 puts at the SOUTH edge.
          val rowLat: Int => Double = f.gridType match {
            case "lambert" =>
              val lg = f.lambert.get
              val lcc = graft.functions.Geo.LambertConformal(
                lg.earthRadius, 0.0, lg.latin1, lg.latin2, lg.laD, lg.lov)
              val (x1, y1) = lcc.forward(f.lon1, f.lat1)
              val up = (f.scanMode & 0x40) != 0 // stored south→north
              j => {
                val srcRow = if (up) f.nj - 1 - j else j
                val y = if (up) y1 + srcRow * f.dLat else y1 - srcRow * f.dLat
                lcc.inverse(x1, y)._2
              }
            case "polar" =>
              val pg = f.polar.get
              val ps = graft.functions.Geo.PolarStereo(
                pg.earthRadius, 0.0, pg.laD, pg.lov, pg.north)
              val (x1, y1) = ps.forward(f.lon1, f.lat1)
              val up = (f.scanMode & 0x40) != 0
              j => {
                val srcRow = if (up) f.nj - 1 - j else j
                val y = if (up) y1 + srcRow * f.dLat else y1 - srcRow * f.dLat
                ps.inverse(x1, y)._2
              }
            case "gaussian" =>
              // the resolved Gaussian parallels are already in
              // normalized row order (north→south)
              val lats = f.gaussLats.get
              j => lats(j)
            case _ =>
              // lat1 anchors the file's FIRST stored point: the north
              // edge under −j scan, the south edge under +j (0x40)
              val up = (f.scanMode & 0x40) != 0
              j => if (up) f.lat1 + (f.nj - 1 - j) * f.dLat
                   else f.lat1 - j * f.dLat
          }
          (0 until f.nj).map { j =>
            (p, fi, f.discipline, f.category, f.parameter, f.refTime,
              f.forecastHours.getOrElse(-1), j, rowLat(j),
              f.values.slice(j * f.ni, (j + 1) * f.ni))
          }
        }
      }
      .toDF("path", "field_idx", "discipline", "category", "parameter",
        "ref_time", "forecast_hours", "j", "lat", "values")
  }
}
