package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.source.NetCdfFixture

/** DataSource V2 "netcdf" format: short-name registration, parity with
  * the mapPartitions decode, and the header-only pruning fast path.
  */
class NetCdfV2Spec extends SparkSpec {

  private lazy val glob: String =
    NetCdfFixture.writeFiles(Files.createTempDirectory("graft-v2"), n = 2)

  test("format(\"netcdf\") scans by short name with the tidy schema") {
    val df = spark.read.format("netcdf").load(glob)
    assert(df.columns.toSeq === Seq("path", "variable", "time_idx", "time",
      "leadtime_idx", "leadtime", "y_idx", "y", "xs", "values"))
    // vars(2) × time(1) × leadtime(3) × y(8) per file × 2 files
    assert(df.count() === 2 * 2 * 1 * 3 * 8)
  }

  test("full-decode parity with the mapPartitions source") {
    val v2 = spark.read.format("netcdf").load(glob)
      .select(col("variable"), col("time_idx"), col("leadtime_idx"),
        col("y_idx"), col("y"), explode(col("values")).as("v"))
      .agg(count(lit(1)), sum(when(!isnan(col("v")), col("v"))), sum(col("y")))
      .head()
    val v1 = graft.source.NetCdfSource.tidy(spark, glob)
      .select(col("variable"), col("time_idx"), col("leadtime_idx"),
        col("y_idx"), col("y"), explode(col("values")).as("v"))
      .agg(count(lit(1)), sum(when(!isnan(col("v")), col("v"))), sum(col("y")))
      .head()
    assert(v2 === v1)
  }

  test("column pruning reaches the reader: metadata query plans a payload-free scan") {
    val meta = spark.read.format("netcdf").load(glob)
      .select("path", "variable", "leadtime")
    val scanDesc = meta.queryExecution.executedPlan.toString
    assert(scanDesc.contains("columns=[path,variable,leadtime]"),
      s"pruned columns not pushed into the scan:\n$scanDesc")
    // and the header-only path yields the same grain as the full decode
    assert(meta.distinct().count() === 2 * 2 * 3)
    // y values from the header path are unit-normalized like the full path
    val ys = spark.read.format("netcdf").load(glob)
      .select("y").distinct().collect().map(_.getDouble(0)).sorted
    assert(ys.head === 100000.0)
  }
}
