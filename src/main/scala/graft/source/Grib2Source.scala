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
          (0 until f.nj).map { j =>
            (p, fi, f.discipline, f.category, f.parameter, f.refTime,
              f.forecastHours.getOrElse(-1), j, f.lat1 - j * f.dLat,
              f.values.slice(j * f.ni, (j + 1) * f.ni))
          }
        }
      }
      .toDF("path", "field_idx", "discipline", "category", "parameter",
        "ref_time", "forecast_hours", "j", "lat", "values")
  }
}
