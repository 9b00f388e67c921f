package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.source.{NetCdfFixture, ZarrFixture, ZarrSource}

/** Format-agnostic pipeline: a zarr store holding the same synthetic
  * forecast as the .nc fixture must produce an identical tidy relation
  * and an equivalent STAC catalog through the UNCHANGED Preprocess
  * stages.
  */
class ZarrPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("zarr tidy equals netcdf tidy value-for-value") {
    val zdir = Files.createTempDirectory("graft-zarr-fc")
    ZarrFixture.writeForecast(zdir.resolve("store.zarr"))
    val ncGlob = NetCdfFixture.writeFiles(
      Files.createTempDirectory("graft-nc-fc"), n = 1)

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("variable", "time_idx", "time", "leadtime_idx", "leadtime",
        "y_idx", "y", "xs", "values")
      .as[(String, Int, Double, Int, Double, Int, Double,
        Seq[Double], Seq[Double])]
      .collect().sortBy(r => (r._1, r._2, r._4, r._6))

    val z = canon(ZarrSource.tidy(spark, zdir.resolve("store.zarr").toString))
    val n = canon(spark.emptyDataFrame.sparkSession.read.format("netcdf")
      .load(ncGlob))
    assert(z.length === n.length && z.length === 48) // 2 bands × 3 lt × 8 y
    z.zip(n).foreach { case (zr, nr) =>
      assert(zr._1 === nr._1 && zr._2 === nr._2 && zr._6 === nr._6)
      assert(zr._8 === nr._8, "xs (km→m normalized)")
      zr._9.zip(nr._9).foreach { case (a, b) =>
        assert(a === b || (a.isNaN && b.isNaN))
      }
    }
  }

  test("preprocess runs unchanged on a zarr store input") {
    val work = Files.createTempDirectory("graft-zarr-pipe")
    val store = work.resolve("input.zarr")
    ZarrFixture.writeForecast(store)
    val res = graft.pipeline.Preprocess.run(spark, store.toString,
      graft.pipeline.Preprocess.Options(
        name = "sic_zarr", dataPath = work.resolve("data").toString))
    assert(res.nItems === 1 && res.nSlices === 1)
    val items = graft.sink.StacJsonSink.readItems(spark, res.catalogRoot)
      .collect()
    assert(items.length === 1)
    val it = items.head
    assert(it.collection === "sic_zarr")
    assert(it.properties("custom:hemisphere") === "north")
    assert(it.properties("forecast:leadtime_length") === "3")
    assert(it.assets.length === 5) // netcdf + thumbnail + 3 leadtime COGs
    val cog = it.assets.find(_.key == "cog_lead_0").get
    assert(cog.extra("forecast:bands").contains("sic_mean"))
    assert(cog.size > 0 && cog.checksum != null)
  }

  test("preprocess over a zarr V3 store produces the same catalog as v2") {
    def run(tag: String, writeStore: java.nio.file.Path => Unit) = {
      val work = Files.createTempDirectory(s"graft-zarr-pipe-$tag")
      val store = work.resolve("input.zarr")
      writeStore(store)
      graft.pipeline.Preprocess.run(spark, store.toString,
        graft.pipeline.Preprocess.Options(
          name = "sic_zarr", dataPath = work.resolve("data").toString))
    }
    val r2 = run("v2", ZarrFixture.writeForecast(_))
    val r3 = run("v3", ZarrFixture.writeForecastV3(_))
    assert(r3.nItems === r2.nItems && r3.nSlices === r2.nSlices)
    def stats(root: String) = graft.sink.StacJsonSink.readItems(spark, root)
      .collect().map(it => (it.id, it.properties.toSeq.sorted,
        it.assets.filter(_.key.startsWith("cog_lead_")).sortBy(_.key)
          .map(_.extra.get("forecast:bands")))).sortBy(_._1).toSeq
    assert(stats(r3.catalogRoot) === stats(r2.catalogRoot))
  }
}
