package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.functions._
import graft.source.{FsByteSource, Hdf5, Hdf5Write, NetCdfFixture}

/** The >2 GiB netCDF-4 contract: HDF5 inputs of any size decode through
  * positioned byte-range reads — metadata as small ranges, chunk
  * payloads as exact ranges — never a whole-file buffer. The fixture is
  * a structurally-valid archive whose data region starts past
  * Int.MaxValue (written sparse: the hole costs no disk or I/O), so
  * every chunk address, B-tree pointer and heap offset in it exceeds
  * what any `.toInt` position math could survive.
  */
class LargeHdf5Spec extends SparkSpec {

  private lazy val bigFile: java.nio.file.Path = {
    val p = Work.stableDir("bignc").resolve("big_forecast.nc")
    if (!Files.exists(p) || Files.size(p) <= Int.MaxValue.toLong) {
      val (dims, gatts, vars) = NetCdfFixture.spec(nt = 1, ny = 8, nx = 8, nl = 3)
      Hdf5Write.writeFile(p, dims, gatts, vars,
        dataBase = Int.MaxValue.toLong + 4096L)
    }
    p
  }

  private def openSource(): FsByteSource = {
    val hp = new HPath(bigFile.toString)
    new FsByteSource(FileSystem.get(hp.toUri, new Configuration()), hp)
  }

  test("the fixture really is past the 2 GiB line") {
    assert(Files.size(bigFile) > Int.MaxValue.toLong,
      s"fixture is ${Files.size(bigFile)} bytes")
  }

  test(">2 GiB archive: metadata + sliced decode via positioned reads, " +
    "bit-identical to the in-memory rendering") {
    val src = openSource()
    try {
      val r = new Hdf5.Reader(src)
      assert(r.file.datasets.map(_.name).toSet ===
        Set("time", "yc", "xc", "leadtime", "sic_mean", "sic_stddev"))
      // same logical content rendered small + in-memory = the oracle
      val want = new Hdf5.Reader(NetCdfFixture.bytesHdf5(nt = 1, ny = 8,
        nx = 8, nl = 3))
      val keep: Array[Option[Long]] = Array(None, None, None, Some(1L))
      val got = r.readDoublesSliced("sic_mean", keep)
      val ref = want.readDoubles("sic_mean")
      for (t <- 0 until 1; y <- 0 until 8; x <- 0 until 8) {
        val i = ((t * 8 + y) * 8 + x) * 3 + 1 // leadtime index 1
        assert(java.lang.Double.doubleToLongBits(got(i)) ===
          java.lang.Double.doubleToLongBits(ref(i)),
          s"cell (t=$t,y=$y,x=$x,l=1): ${got(i)} != ${ref(i)}")
      }
      // coordinate variables (contiguous layout past 2 GiB) decode too
      assert(r.readDoubles("yc").toSeq === (0 until 8).map(100.0 + _))
    } finally src.close()
  }

  test("DSv2 netcdf format scans the >2 GiB archive (pushdown intact)") {
    val df = spark.read.format("netcdf").load(bigFile.toString)
      .filter(col("variable") === "sic_mean" && col("leadtime_idx") === 1)
      .select(col("y_idx"), col("values"))
    val rows = df.collect()
    assert(rows.length === 8) // 1 time x 8 y scanlines
    assert(rows.forall(_.getSeq[Double](1).length == 8))
  }

  test("truncated file fails loudly instead of parsing as zeros") {
    // ADVICE r7: ArraySource used to zero-pad past EOF
    val whole = NetCdfFixture.bytesHdf5()
    val truncated = java.util.Arrays.copyOfRange(whole, 0, whole.length / 2)
    intercept[IllegalArgumentException] {
      val r = new Hdf5.Reader(truncated)
      r.file.datasets.foreach(d => r.readDoubles(d))
    }
  }
}
