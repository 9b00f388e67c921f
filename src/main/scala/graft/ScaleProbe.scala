package graft

import org.apache.spark.sql.functions._

/** Scale-curve probe for the fixture-bound query families (dev
  * harness, not part of the gated surface): the regrid queries
  * (q103/q104/q118) read generated netCDF fixtures whose size is
  * independent of the SF directory, so the per-round bench cannot
  * produce a data-scaling measurement for them. This main generates
  * fixtures at a requested size, runs the q103-shaped scan + block-mean
  * aggregation (the family's heaviest data-proportional plan: full cell
  * explode → map-side partial agg), and prints one timing line — run it
  * at two sizes and compare.
  *
  * Usage: graft.ScaleProbe <nFiles> <ny> <nx> [hdf5]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val ny = args(1).toInt
    val nx = args(2).toInt
    val hdf5 = args.length > 3 && args(3) == "hdf5"
    val spark = GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = java.nio.file.Files.createTempDirectory("graft-scaleprobe")
    val glob = graft.source.NetCdfFixture.writeFiles(
      dir.resolve("nc"), n = n, hdf5 = hdf5, ny = ny, nx = nx)
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val tidy = spark.read.format("netcdf").load(glob)
      val cells = tidy.select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
        col("variable"), col("leadtime_idx"), col("y_idx"),
        posexplode(col("values")).as(Seq("x_idx", "v")))
      val out = cells.filter(!isnan(col("v")))
        .groupBy(col("file"), col("variable"), col("leadtime_idx"),
          (col("y_idx") / 2).cast("int").as("ty"),
          (col("x_idx") / 2).cast("int").as("tx"))
        .agg(count(lit(1)).as("n_valid"),
          sum(floor(col("v") * 1e9).cast("long")).as("sum_u"))
        .agg(count(lit(1)), sum("n_valid")).head()
      ((System.nanoTime() - t0) / 1e9, out.getLong(1))
    }
    once() // warmup
    val (sec, cellsN) = once()
    println(s"""{"probe":"regrid_blockmean","files":$n,"ny":$ny,"nx":$nx,""" +
      s""""hdf5":$hdf5,"cells":$cellsN,"sec":${f"$sec%.3f"}}""")
    spark.stop()
  }
}
