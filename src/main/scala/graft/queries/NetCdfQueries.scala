package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.Scalars.floor2dp
import graft.source.{NetCdfFixture, NetCdfSource}

/** S1/P1/P2/P3 + A2 through the NetCDF source (rows-only: inputs are
  * generated .nc fixtures, not the shared parquet tables, so DuckDB has
  * no oracle path — exact values are pinned by NetCdfSpec instead).
  */
object NetCdfQueries {

  private def fixtureGlob(): String =
    NetCdfFixture.writeFiles(Files.createTempDirectory("graft-ncq"), n = 2)

  /** Metadata-only first pass: per-(file, variable) manifest with coord
    * resolution + 4-D band flag (ref get_forecast_info).
    */
  val manifest = QueryDef.rowsOnly("q45_netcdf_manifest") { (s, _) =>
    NetCdfSource.manifest(s, fixtureGlob())
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
        col("variable"), col("ndim"), col("dims"), col("dtype"),
        col("n_values"), col("units"), col("crs"), col("is_band"))
  }

  /** The flagship A2 shape over the real source: per (file, variable,
    * leadtime) band statistics — min/max/mean/stddev_pop, NaN-skipped,
    * valid_percent floored to 2dp (ref utils.py:213-259).
    */
  val bandStats = QueryDef.rowsOnly("q46_netcdf_band_stats") { (s, _) =>
    val tidy = NetCdfSource.tidy(s, fixtureGlob())
    val cell = tidy.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
      col("variable"), col("time_idx"), col("leadtime_idx"),
      explode(col("values")).as("v"))
    val valid = when(!isnan(col("v")) && !col("v").isNull, col("v"))
    cell.groupBy(col("file"), col("variable"), col("time_idx"), col("leadtime_idx"))
      .agg(
        min(valid).as("stat_min"),
        max(valid).as("stat_max"),
        avg(valid).as("stat_mean"),
        stddev_pop(valid).as("stat_stddev"), // numpy std is ddof=0
        floor2dp(sum(when(valid.isNotNull, 1).otherwise(0)) * 100.0 / count(lit(1)))
          .as("valid_percent"))
  }

  val all: Seq[QueryDef] = Seq(manifest, bandStats)
}
