package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.source.{NetCdf, NetCdfFixture, NetCdfSource}

/** S1/P1/P2/K1 — classic-format codec round-trip and the Spark scan,
  * mirroring the reference's get_forecast_info test
  * (test_generator.py:245-288: CRS attr, band detection) and
  * test_convert_units_km at the source level.
  */
class NetCdfSpec extends SparkSpec {

  test("codec round-trip: header, dims, attrs, variables survive write->read") {
    val bytes = NetCdfFixture.bytes(nt = 1, ny = 4, nx = 5, nl = 3)
    val h = NetCdf.readHeader(bytes)
    assert(h.dims.map(d => d.name -> d.length) ===
      Seq("time" -> 1, "yc" -> 4, "xc" -> 5, "leadtime" -> 3))
    assert(h.gatt("geospatial_bounds_crs").map(_.text) === Some("EPSG:6931"))
    assert(h.vars.map(_.name) ===
      Seq("time", "yc", "xc", "leadtime", "sic_mean", "sic_stddev"))
    val yc = NetCdf.readVariable(bytes, h, h.vars.find(_.name == "yc").get)
    assert(yc.toSeq === Seq(100.0, 101.0, 102.0, 103.0))
    val mean = NetCdf.readVariable(bytes, h, h.vars.find(_.name == "sic_mean").get)
    assert(mean.length === 1 * 4 * 5 * 3)
    // spot value at (t=0, y=1, x=2, l=1): row-major index ((0*4+1)*5+2)*3+1
    assert(mean(((0 * 4 + 1) * 5 + 2) * 3 + 1) === 0.1 + 0.01 + 0.002 + 0.0001)
  }

  test("P2 band detection: exactly the 4-D vars flagged (test_get_forecast_info)") {
    val dir = Files.createTempDirectory("graft-nc")
    val glob = NetCdfFixture.writeFiles(dir, n = 2)
    val m = NetCdfSource.manifest(spark, glob)
    val bands = m.filter(col("is_band")).select("variable").distinct()
      .collect().map(_.getString(0)).sorted
    assert(bands === Array("sic_mean", "sic_stddev"))
    val crs = m.select("crs").distinct().collect().map(_.getString(0))
    assert(crs === Array("EPSG:6931"))
    val coords = m.select("x_coord", "y_coord").distinct().collect().head
    assert((coords.getString(0), coords.getString(1)) === (("xc", "yc")))
  }

  test("P1/P3 tidy scan: coords resolved and km-normalized to meters") {
    val dir = Files.createTempDirectory("graft-nc2")
    val glob = NetCdfFixture.writeFiles(dir, n = 1)
    val t = NetCdfSource.tidy(spark, glob).cache()
    // yc was [100..107] km → 100000..107000 m
    val ys = t.select("y").distinct().collect().map(_.getDouble(0)).sorted
    assert(ys.head === 100000.0 && ys.last === 107000.0)
    val xs = t.select(explode(col("xs")).as("x")).distinct()
      .collect().map(_.getDouble(0)).sorted
    assert(xs.head === 200000.0 && xs.last === 207000.0)
    // row count: vars(2) × time(1) × leadtime(3) × y(8)
    assert(t.count() === 2 * 1 * 3 * 8)
    t.unpersist()
  }

  test("A2 band stats over the tidy scan match direct computation") {
    val dir = Files.createTempDirectory("graft-nc3")
    val glob = NetCdfFixture.writeFiles(dir, n = 1)
    val tidy = NetCdfSource.tidy(spark, glob)
    val cell = tidy.select(col("variable"), col("leadtime_idx"),
      explode(col("values")).as("v"))
    val stats = cell.filter(col("variable") === "sic_mean")
      .groupBy(col("leadtime_idx"))
      .agg(
        min(when(!isnan(col("v")), col("v"))).as("mn"),
        max(when(!isnan(col("v")), col("v"))).as("mx"),
        avg(when(!isnan(col("v")), col("v"))).as("mean"),
        (sum(when(!isnan(col("v")), 1).otherwise(0)) * 100.0 / count(lit(1)))
          .as("valid_pct_raw"))
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // direct recomputation from the fixture formula
    for (l <- 0 until 3) {
      val vals = for { y <- 0 until 8; x <- 0 until 8
        if (y * 8 + x + l) % 17 != 0 }
        yield 0.1 + y * 0.01 + x * 0.001 + l * 0.0001
      val (mn, mx, mean, vp) = stats(l)
      assert(mn === vals.min && mx === vals.max)
      assert(math.abs(mean - vals.sum / vals.size) < 1e-12)
      assert(math.abs(vp - vals.size * 100.0 / 64) < 1e-12)
    }
  }

  test("K1 slice writer: per-slice file read back by the same scan") {
    // take leadtime slice l=1 of the fixture and write it as its own file
    val src = NetCdfFixture.bytes(nt = 1, ny = 4, nx = 4, nl = 3)
    val h = NetCdf.readHeader(src)
    val mean = NetCdf.readVariable(src, h, h.vars.find(_.name == "sic_mean").get)
    val slice = Array.tabulate(1 * 4 * 4 * 1) { i =>
      val (t, y, x) = (i / 16, (i / 4) % 4, i % 4)
      mean(((t * 4 + y) * 4 + x) * 3 + 1)
    }
    val out = NetCdf.write(
      dims = Seq("time" -> 1, "yc" -> 4, "xc" -> 4, "leadtime" -> 1),
      gatts = Seq("geospatial_bounds_crs" -> "EPSG:6931"),
      vars = Seq(
        NetCdf.VarSpec("time", Seq("time"), Seq(), Array(0.0)),
        NetCdf.VarSpec("yc", Seq("yc"), Seq("units" -> "km"),
          Array(100, 101, 102, 103).map(_.toDouble)),
        NetCdf.VarSpec("xc", Seq("xc"), Seq("units" -> "km"),
          Array(200, 201, 202, 203).map(_.toDouble)),
        NetCdf.VarSpec("leadtime", Seq("leadtime"), Seq(), Array(1.0)),
        NetCdf.VarSpec("sic_mean", Seq("time", "yc", "xc", "leadtime"),
          Seq(), slice)))
    val h2 = NetCdf.readHeader(out)
    val back = NetCdf.readVariable(out, h2, h2.vars.find(_.name == "sic_mean").get)
    assert(back.toSeq === slice.toSeq)
  }

  test("CDF-5 counts past Int.MaxValue are rejected loudly, not wrapped") {
    import java.io.{ByteArrayOutputStream, DataOutputStream}
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeBytes("CDF"); o.writeByte(5)
    o.writeLong(0L) // numrecs
    o.writeInt(0x0A); o.writeLong(1L) // one dim
    o.writeLong(1L); o.writeBytes("x"); (0 until 3).foreach(_ => o.writeByte(0))
    o.writeLong(0x100000000L) // dim length 2^32 — would wrap to 0 via toInt
    o.flush()
    val e = intercept[IllegalArgumentException] {
      NetCdf.readHeader(bos.toByteArray)
    }
    assert(e.getMessage.contains("exceeds"), e.getMessage)
  }

  test("CDF-5 (64-bit data): widened counts, new types, attrs all decode") {
    // hand-built PnetCDF-style file: one dim, a char global attr, an
    // int64 variable and a scale_factor'd uint16 variable
    import java.io.{ByteArrayOutputStream, DataOutputStream}
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    def name5(n: String): Unit = {
      o.writeLong(n.length.toLong); o.writeBytes(n)
      (0 until (4 - n.length % 4) % 4).foreach(_ => o.writeByte(0))
    }
    o.writeBytes("CDF"); o.writeByte(5)
    o.writeLong(0L) // numrecs
    o.writeInt(0x0A); o.writeLong(1L)
    name5("x"); o.writeLong(4L)
    o.writeInt(0x0C); o.writeLong(1L)
    name5("title"); o.writeInt(NetCdf.NcChar); o.writeLong(5L)
    o.writeBytes("hello"); (0 until 3).foreach(_ => o.writeByte(0))
    o.writeInt(0x0B); o.writeLong(2L)
    name5("a"); o.writeLong(1L); o.writeLong(0L) // 1 dim, dimid 0
    o.writeInt(0); o.writeLong(0L)               // absent attr list
    o.writeInt(NetCdf.NcInt64); o.writeLong(32L)
    val beginAPos = bos.size(); o.writeLong(0L)
    name5("bb"); o.writeLong(1L); o.writeLong(0L)
    o.writeInt(0x0C); o.writeLong(1L)
    name5("scale_factor"); o.writeInt(NetCdf.NcDouble); o.writeLong(1L)
    o.writeDouble(0.5)
    o.writeInt(NetCdf.NcUShort); o.writeLong(8L)
    val beginBPos = bos.size(); o.writeLong(0L)
    val beginA = bos.size().toLong // header ends here; data follows
    Seq(1L, -2L, 3000000000L, 5L).foreach(o.writeLong)
    val beginB = bos.size().toLong
    Seq(0xFFFF, 7, 8, 9).foreach(v => o.writeShort(v))
    o.flush()
    val bytes = bos.toByteArray
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putLong(beginAPos, beginA); bb.putLong(beginBPos, beginB)

    val h = NetCdf.readHeader(bytes)
    assert(h.version === 5)
    assert(h.dims === Seq(NetCdf.Dim("x", 4)))
    assert(h.gatt("title").map(_.text) === Some("hello"))
    val a = h.vars.find(_.name == "a").get
    assert(NetCdf.readVariable(bytes, h, a).toSeq ===
      Seq(1.0, -2.0, 3000000000.0, 5.0)) // int64 exceeds int32 range
    val b = h.vars.find(_.name == "bb").get
    assert(b.attr("scale_factor").map(_.nums.head) === Some(0.5))
    assert(NetCdf.readVariable(bytes, h, b).toSeq ===
      Seq(65535.0, 7.0, 8.0, 9.0)) // uint16 reads unsigned
    // the format facade maps the CDF-5 types
    val g = graft.source.GridFile.open(bytes)
    assert(g.dtypeName("a") === "int64" && g.dtypeName("bb") === "uint16")
  }

  test("writer emits CDF-2 and CDF-5 envelopes that the reader decodes " +
    "identically to CDF-1 (64-bit offsets / widened counts)") {
    val dims = Seq("y" -> 3, "x" -> 4)
    val gatts = Seq("title" -> "slice", "crs" -> "EPSG:6931")
    val data = Array.tabulate(12)(i => i * 0.5 - 1.25)
    val vars = Seq(NetCdf.VarSpec("v", Seq("y", "x"),
      Seq("units" -> "K"), data, numAttrs = Seq("scale_factor" -> 0.01)))
    val byVersion = Seq(1, 2, 5).map { ver =>
      val bytes = NetCdf.write(dims, gatts, vars, version = ver)
      assert(bytes(3) === ver.toByte)
      val h = NetCdf.readHeader(bytes)
      assert(h.version === ver)
      assert(h.dims.map(d => d.name -> d.length) === dims)
      assert(h.gatt("title").map(_.text) === Some("slice"))
      val v = h.vars.find(_.name == "v").get
      assert(v.attrs.exists(a => a.name == "units" && a.text == "K"))
      assert(v.attrs.exists(a => a.name == "scale_factor" &&
        a.nums == Seq(0.01)))
      NetCdf.readVariable(bytes, h, v).toSeq
    }
    assert(byVersion.distinct.size === 1) // same values whatever the envelope
    assert(byVersion.head === data.toSeq)
    // CDF-2/5 headers are strictly larger (wider offsets/counts)
    val sizes = Seq(1, 2, 5).map(v =>
      NetCdf.write(dims, gatts, vars, version = v).length)
    assert(sizes(0) < sizes(1) && sizes(1) < sizes(2))
  }

  test("CDF-1 write REJECTS a layout whose data would pass the 32-bit " +
    "offset horizon instead of wrapping the begin offset") {
    // 32 variables sharing one 80 MB buffer lay out 2.56 GiB of data —
    // the guard fires while sizing the header, before anything that
    // big is ever materialized
    val big = new Array[Double](10 << 20)
    val vars = (0 until 32).map(i =>
      NetCdf.VarSpec(s"v$i", Seq("x"), Seq.empty, big))
    val e = intercept[IllegalArgumentException] {
      NetCdf.write(Seq("x" -> big.length), Seq.empty, vars, version = 1)
    }
    assert(e.getMessage.contains("32-bit offset horizon"))
    // unknown envelope versions are rejected up front
    intercept[IllegalArgumentException] {
      NetCdf.write(Seq("x" -> 1), Seq.empty,
        Seq(NetCdf.VarSpec("v", Seq("x"), Seq.empty, Array(1.0))),
        version = 3)
    }
  }
}

