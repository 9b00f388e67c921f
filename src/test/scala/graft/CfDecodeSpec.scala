package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.source.{GridFile, Hdf5Write, NetCdf, NetCdfSource}

/** CF mask-and-scale parity with the reference's xarray decode
  * (`xr.open_dataset` defaults, ref generator.py:485): `_FillValue` /
  * `missing_value` cells surface as NaN and packed payloads unpack via
  * `scale_factor` / `add_offset` — in BOTH the classic and netCDF-4
  * renderings, through the same tidy scan.
  */
class CfDecodeSpec extends SparkSpec {

  // 1×2×2×1 grid: raw values [2, 4, -999 (fill), 8]
  private def spec() = {
    val dims = Seq("time" -> 1, "yc" -> 2, "xc" -> 2, "leadtime" -> 1)
    val vars = Seq(
      NetCdf.VarSpec("time", Seq("time"), Seq(), Array(0.0)),
      NetCdf.VarSpec("yc", Seq("yc"), Seq("units" -> "m"), Array(0.0, 1.0)),
      NetCdf.VarSpec("xc", Seq("xc"), Seq("units" -> "m"), Array(0.0, 1.0)),
      NetCdf.VarSpec("leadtime", Seq("leadtime"), Seq(), Array(0.0)),
      NetCdf.VarSpec("sic", Seq("time", "yc", "xc", "leadtime"),
        Seq("units" -> "1"), Array(2.0, 4.0, -999.0, 8.0),
        numAttrs = Seq("_FillValue" -> -999.0, "scale_factor" -> 0.5,
          "add_offset" -> 10.0)))
    (dims, Seq("geospatial_bounds_crs" -> "EPSG:6931"), vars)
  }

  private def expectDecoded(bytes: Array[Byte], label: String): Unit = {
    // facade exposes the numeric attrs…
    val g = GridFile.open(bytes)
    assert(g.varAttrNum("sic", "_FillValue") === Some(-999.0), label)
    assert(g.varAttrNum("sic", "scale_factor") === Some(0.5), label)
    // …and the tidy scan applies mask-then-scale (CF order)
    val dir = Files.createTempDirectory(s"graft-cf-$label")
    Files.write(dir.resolve("f.nc"), bytes)
    val rows = NetCdfSource.tidy(spark, s"$dir/*.nc")
      .orderBy("y_idx")
      .select(col("values")).collect()
      .map(_.getSeq[Double](0))
    assert(rows.length === 2, label)
    assert(rows(0) === Seq(11.0, 12.0), label)          // 2*0.5+10, 4*0.5+10
    assert(rows(1)(0).isNaN, s"$label: fill cell → NaN")
    assert(rows(1)(1) === 14.0, label)                  // 8*0.5+10
  }

  test("classic CDF-1: numeric attrs round-trip and tidy applies CF decode") {
    val (dims, gatts, vars) = spec()
    expectDecoded(NetCdf.write(dims, gatts, vars), "classic")
  }

  test("netCDF-4/HDF5: numeric attrs round-trip and tidy applies CF decode") {
    val (dims, gatts, vars) = spec()
    expectDecoded(Hdf5Write.write(dims, gatts, vars), "hdf5")
  }

  test("no CF attrs → identity (no copy, values untouched)") {
    val dims = Seq("a" -> 2)
    val v = NetCdf.VarSpec("plain", Seq("a"), Seq(), Array(1.5, 2.5))
    val bytes = Hdf5Write.write(dims, Seq(), Seq(
      NetCdf.VarSpec("a", Seq("a"), Seq(), Array(0.0, 1.0)), v))
    val g = GridFile.open(bytes)
    assert(g.varAttrNum("plain", "_FillValue").isEmpty)
    assert(g.readDoubles("plain").toSeq === Seq(1.5, 2.5))
  }
}
