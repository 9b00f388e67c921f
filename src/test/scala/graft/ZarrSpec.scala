package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.source.{ZarrCodec, ZarrFixture, ZarrSource}

/** Zarr v2 reader: assembled values must equal the generating function
  * over every in-bounds coordinate (edge-chunk padding trimmed), across
  * compression and dtype variants; the manifest reports numpy-dtype
  * facts the way the reference's file-info probe does.
  */
class ZarrSpec extends SparkSpec {
  import spark.implicits._

  private lazy val store = {
    val d = Files.createTempDirectory("graft-zarr")
    // 7×5 with 4×3 chunks: right/bottom edge chunks are padded
    ZarrFixture.write(d, "sic", Seq(7, 5), Seq(4, 3),
      value = c => c(0) * 100.0 + c(1))
    ZarrFixture.write(d, "counts", Seq(6), Seq(4), dtype = "<i4",
      compress = false, value = _.sum * 3.0)
    ZarrFixture.write(d, "mask", Seq(5), Seq(2), dtype = "|u1",
      compress = true, value = c => (c.sum % 250).toDouble)
    ZarrFixture.write(d, "big", Seq(3, 3), Seq(2, 2), dtype = ">f4",
      compress = false, value = c => c(0) - c(1) * 0.5)
    d
  }

  test("manifest lists every array with dtype facts") {
    val m = ZarrSource.manifest(spark, store.toString)
      .select("array", "dtype", "bit_depth", "byte_order", "compressor",
        "n_values", "n_chunks")
      .as[(String, String, Int, String, String, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(m.keySet === Set("sic", "counts", "mask", "big"))
    assert(m("sic") === ("sic", "float64", 64, "little-endian", "zlib", 35L, 4L))
    assert(m("counts") === ("counts", "int32", 32, "little-endian", "null", 6L, 2L))
    assert(m("mask") === ("mask", "uint8", 8, "little-endian", "zlib", 5L, 3L))
    assert(m("big") === ("big", "float32", 32, "big-endian", "null", 9L, 4L))
  }

  test("chunk-parallel read reassembles exactly, edge padding trimmed") {
    val rows = ZarrSource.read(spark, store.toString, "sic")
      .select("origin", "shape", "values")
      .as[(Seq[Int], Seq[Int], Seq[Double])].collect()
    assert(rows.length === 4)
    val cells = rows.flatMap { case (origin, shape, values) =>
      for (i <- shape.head * shape(1) - 1 to 0 by -1) yield {
        val (r, c) = (i / shape(1), i % shape(1))
        ((origin.head + r, origin(1) + c), values(i))
      }
    }.toMap
    assert(cells.size === 35, "each in-bounds cell exactly once")
    for (r <- 0 until 7; c <- 0 until 5)
      assert(cells((r, c)) === r * 100.0 + c, s"($r,$c)")
  }

  test("dtype variants decode to the generating values") {
    for ((name, n, f) <- Seq(
        ("counts", 6, (i: Int) => i * 3.0),
        ("mask", 5, (i: Int) => (i % 250).toDouble))) {
      val cells = ZarrSource.read(spark, store.toString, name)
        .select("origin", "values").as[(Seq[Int], Seq[Double])].collect()
        .flatMap { case (o, v) => v.indices.map(i => (o.head + i) -> v(i)) }
        .toMap
      (0 until n).foreach(i => assert(cells(i) === f(i), s"$name[$i]"))
    }
    val big = ZarrSource.read(spark, store.toString, "big")
      .select("origin", "shape", "values")
      .as[(Seq[Int], Seq[Int], Seq[Double])].collect()
      .flatMap { case (o, s, v) =>
        v.indices.map(i => (o.head + i / s(1), o(1) + i % s(1)) -> v(i)) }
      .toMap
    for (r <- 0 until 3; c <- 0 until 3)
      assert(big((r, c)) === (r - c * 0.5).toFloat.toDouble, s"big($r,$c)")
    // float16 — the dtype ML embedding arrays ship ('<f2'); values are
    // chosen binary16-representable so the round-trip is exact
    val d = Files.createTempDirectory("graft-zarr-f2")
    ZarrFixture.write(d, "emb", Seq(9), Seq(4), dtype = "<f2",
      value = c => c.head * 0.25 - 1.0)
    val meta = ZarrCodec.readMeta(d).find(_.name == "emb").get
    val got = ZarrCodec.readArray(d, meta)
    (0 until 9).foreach(i => assert(got(i) === i * 0.25 - 1.0, s"emb($i)"))
    val m = ZarrSource.manifest(spark, d.toString)
      .select("array", "dtype", "bit_depth").as[(String, String, Int)]
      .collect().head
    assert(m === (("emb", "float16", 16)))
  }

  test("v2 filters (delta, shuffle, chained) decode to the generating " +
    "values — the numcodecs options zarr-python configs commonly carry") {
    val d = Files.createTempDirectory("graft-zarr-filt")
    ZarrFixture.write(d, "dlt", Seq(7, 5), Seq(4, 3),
      filters = Seq("delta"), value = c => c(0) * 100.0 + c(1))
    ZarrFixture.write(d, "shf", Seq(7, 5), Seq(4, 3),
      filters = Seq("shuffle"), value = c => c(0) * 100.0 + c(1))
    ZarrFixture.write(d, "both", Seq(7, 5), Seq(4, 3),
      filters = Seq("delta", "shuffle"), value = c => c(0) * 100.0 + c(1))
    ZarrFixture.write(d, "idelta", Seq(9), Seq(4), dtype = "<i4",
      compress = false, filters = Seq("delta"), value = _.sum * 7.0)
    for (name <- Seq("dlt", "shf", "both")) {
      val meta = ZarrCodec.readMeta(d).find(_.name == name).get
      val got = ZarrCodec.readArray(d, meta)
      for (r <- 0 until 7; c <- 0 until 5)
        assert(got(r * 5 + c) === r * 100.0 + c, s"$name($r,$c)")
      // the executor path decodes identically
      val cells = ZarrSource.read(spark, d.toString, name)
        .select("values").as[Seq[Double]].collect().flatten.sorted
      assert(cells.length === 35, name)
    }
    val im = ZarrCodec.readMeta(d).find(_.name == "idelta").get
    val ig = ZarrCodec.readArray(d, im)
    (0 until 9).foreach(i => assert(ig(i) === i * 7.0, s"idelta($i)"))
  }

  test("consolidated metadata (.zmetadata) is preferred over walking — " +
    "one read instead of LIST + N at cloud scale") {
    val d = Files.createTempDirectory("graft-zarr-consol")
    ZarrFixture.write(d, "a", Seq(7, 5), Seq(4, 3),
      value = c => c(0) * 100.0 + c(1), dims = Seq("y", "x"))
    ZarrFixture.write(d, "b", Seq(6), Seq(4), dtype = "<i4",
      compress = false, value = _.sum * 3.0)
    // NaN fill values break structural equality (NaN != NaN)
    def canon(ms: Seq[ZarrCodec.ArrayMeta]) = ms.map(m =>
      if (m.fillValue.isNaN) m.copy(fillValue = -999.0) else m)
    val walked = canon(ZarrCodec.readMeta(d))
    ZarrFixture.consolidate(d)
    assert(canon(ZarrCodec.readMeta(d)) === walked)
    // prove the consolidated path is the one actually read: corrupt the
    // individual .zarray files — metadata must still come back intact
    Files.writeString(d.resolve("a").resolve(".zarray"), "{corrupt")
    Files.writeString(d.resolve("b").resolve(".zarray"), "{corrupt")
    assert(canon(ZarrCodec.readMeta(d)) === walked)
    // and the data itself still decodes through the consolidated metas
    val m = ZarrCodec.readMeta(d).find(_.name == "a").get
    val g = ZarrCodec.readArray(d, m)
    for (r <- 0 until 7; c <- 0 until 5)
      assert(g(r * 5 + c) === r * 100.0 + c, s"a($r,$c)")
  }

  test("v2 Fortran-order arrays decode to the logical C-order values — " +
    "the numpy-asfortranarray store layout") {
    val d = Files.createTempDirectory("graft-zarr-forder")
    ZarrFixture.write(d, "f2", Seq(7, 5), Seq(4, 3), fortranOrder = true,
      value = c => c(0) * 100.0 + c(1))
    ZarrFixture.write(d, "f3", Seq(4, 3, 5), Seq(2, 3, 4),
      fortranOrder = true, compress = false,
      value = c => c(0) * 100.0 + c(1) * 10.0 + c(2))
    val m2 = ZarrCodec.readMeta(d).find(_.name == "f2").get
    assert(m2.transpose === Some(Seq(1, 0)))
    val g2 = ZarrCodec.readArray(d, m2)
    for (r <- 0 until 7; c <- 0 until 5)
      assert(g2(r * 5 + c) === r * 100.0 + c, s"f2($r,$c)")
    val m3 = ZarrCodec.readMeta(d).find(_.name == "f3").get
    val g3 = ZarrCodec.readArray(d, m3)
    for (a <- 0 until 4; b <- 0 until 3; c <- 0 until 5)
      assert(g3((a * 3 + b) * 5 + c) === a * 100.0 + b * 10.0 + c,
        s"f3($a,$b,$c)")
  }

  test("v2 numcodecs fixedscaleoffset and quantize filters decode to " +
    "the generating values (integer-exact at the fixture's params)") {
    val d = Files.createTempDirectory("graft-zarr-fso")
    // fso packs round((x-1000)*1) as <i4; decode x = i/1 + 1000 — exact
    // for integer values
    ZarrFixture.write(d, "fso", Seq(7, 5), Seq(4, 3),
      filters = Seq("fixedscaleoffset"), value = c => c(0) * 100.0 + c(1))
    // quantize keeps the dtype; digits=3 is exact for integers
    ZarrFixture.write(d, "qnt", Seq(7, 5), Seq(4, 3),
      filters = Seq("quantize"), value = c => c(0) * 100.0 + c(1))
    // chained: quantize, then delta, then zlib — a realistic
    // climate-store config (precision clamp + decorrelation)
    ZarrFixture.write(d, "qd", Seq(7, 5), Seq(4, 3),
      filters = Seq("quantize", "delta"), value = c => c(0) * 100.0 + c(1))
    for (name <- Seq("fso", "qnt", "qd")) {
      val meta = ZarrCodec.readMeta(d).find(_.name == name).get
      val got = ZarrCodec.readArray(d, meta)
      for (r <- 0 until 7; c <- 0 until 5)
        assert(got(r * 5 + c) === r * 100.0 + c, s"$name($r,$c)")
    }
  }

  test("v2 numcodecs zstd and lz4 compressors decode to the generating " +
    "values, alone and chained after filters") {
    val d = Files.createTempDirectory("graft-zarr-numcodec")
    ZarrFixture.write(d, "z", Seq(7, 5), Seq(4, 3),
      numCodec = Some("zstd"), value = c => c(0) * 100.0 + c(1))
    ZarrFixture.write(d, "l", Seq(7, 5), Seq(4, 3),
      numCodec = Some("lz4"), value = c => c(0) * 100.0 + c(1))
    // filters apply before the compressor — the chained form a
    // numcodecs config like {filters: [delta], compressor: lz4} produces
    ZarrFixture.write(d, "lf", Seq(7, 5), Seq(4, 3),
      numCodec = Some("lz4"), filters = Seq("delta", "shuffle"),
      value = c => c(0) * 100.0 + c(1))
    ZarrFixture.write(d, "zi", Seq(9), Seq(4), dtype = "<i4",
      numCodec = Some("zstd"), value = _.sum * 7.0)
    for (name <- Seq("z", "l", "lf")) {
      val meta = ZarrCodec.readMeta(d).find(_.name == name).get
      val got = ZarrCodec.readArray(d, meta)
      for (r <- 0 until 7; c <- 0 until 5)
        assert(got(r * 5 + c) === r * 100.0 + c, s"$name($r,$c)")
      val cells = ZarrSource.read(spark, d.toString, name)
        .select("values").as[Seq[Double]].collect().flatten
      assert(cells.length === 35, name)
    }
    val im = ZarrCodec.readMeta(d).find(_.name == "zi").get
    val ig = ZarrCodec.readArray(d, im)
    (0 until 9).foreach(i => assert(ig(i) === i * 7.0, s"zi($i)"))
  }

  test("NESTED v2 store (dimension_separator '/') reassembles exactly — " +
    "the cloud-store chunk layout") {
    val d = Files.createTempDirectory("graft-zarr-nested")
    ZarrFixture.write(d, "sic", Seq(7, 5), Seq(4, 3), sep = "/",
      value = c => c(0) * 100.0 + c(1))
    val meta = ZarrCodec.readMeta(d).find(_.name == "sic").get
    assert(meta.sep === "/")
    // driver assembly
    val got = ZarrCodec.readArray(d, meta)
    for (r <- 0 until 7; c <- 0 until 5)
      assert(got(r * 5 + c) === r * 100.0 + c, s"($r,$c)")
    // executor chunk-parallel path
    val rows = ZarrSource.read(spark, d.toString, "sic")
      .select("origin", "shape", "values")
      .as[(Seq[Int], Seq[Int], Seq[Double])].collect()
    assert(rows.length === 4)
    val cells = rows.flatMap { case (origin, shape, values) =>
      for (i <- values.indices) yield
        ((origin.head + i / shape(1), origin(1) + i % shape(1)), values(i))
    }.toMap
    for (r <- 0 until 7; c <- 0 until 5)
      assert(cells((r, c)) === r * 100.0 + c, s"parallel ($r,$c)")
  }

  test("unsupported layouts fail loudly") {
    val d = Files.createTempDirectory("graft-zarr-bad")
    Files.createDirectories(d.resolve("a"))
    Files.writeString(d.resolve("a").resolve(".zarray"),
      """{"zarr_format": 2, "shape": [4], "chunks": [2], "dtype": "<f8",
        | "compressor": {"id": "lzma"}, "fill_value": null,
        | "order": "C", "filters": null}""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      ZarrCodec.readMeta(d)
    }
    assert(e.getMessage.contains("lzma"))
  }

  test("vlen-utf8 object-dtype string array (label axis) decodes; the " +
    "numeric path rejects it pointedly") {
    val store = java.nio.file.Files.createTempDirectory("graft-zarr-vlen")
    val labels = Seq("ocean", "ice", "land", "\u00fcmlaut-\u98a8", "x", "y", "z")
    graft.source.ZarrFixture.writeVlenUtf8(store, "member", labels,
      chunk = 3, attrs = Map("long_name" -> "member id"))
    val m = graft.source.ZarrCodec.readMeta(store)
      .find(_.name == "member").get
    assert(m.dtype === "|O")
    assert(m.filters.map(_.id) === Seq("vlen-utf8"))
    assert(graft.source.ZarrCodec.readStringArray(store, m).toSeq === labels)
    val e = intercept[IllegalArgumentException] {
      graft.source.ZarrCodec.decodeChunk(m, "0",
        java.nio.file.Files.readAllBytes(store.resolve("member/0")))
    }
    assert(e.getMessage.contains("readStringArray"))
  }

  test("datetime64 axes (raw M8 ticks): exact int64 assembly, NaT " +
    "passthrough, shuffle + big-endian variants, probe naming") {
    val store = java.nio.file.Files.createTempDirectory("graft-zarr-m8")
    // hourly stamps around 2025-01-01T00Z in ns, one NaT hole,
    // chunk 3 over 7 values → padded edge chunk
    val base = 1735689600000000000L
    val ticks = (0 until 7).map(i =>
      if (i == 4) Long.MinValue else base + i * 3600L * 1000000000L)
    graft.source.ZarrFixture.writeInt64(store, "time", ticks, chunk = 3,
      dtype = "<M8[ns]", dims = Seq("time"))
    graft.source.ZarrFixture.writeInt64(store, "t_shuf", ticks, chunk = 4,
      dtype = "<M8[ns]", shuffle = true)
    graft.source.ZarrFixture.writeInt64(store, "t_be_us",
      ticks.map(v => if (v == Long.MinValue) v else v / 1000), chunk = 7,
      dtype = ">M8[us]")
    val metas = graft.source.ZarrCodec.readMeta(store)
    val mt = metas.find(_.name == "time").get
    assert(graft.source.ZarrCodec.readLongArray(store, mt).toSeq ===
      ticks)
    assert(graft.source.ZarrCodec.readLongArray(store,
      metas.find(_.name == "t_shuf").get).toSeq === ticks)
    assert(graft.source.ZarrCodec.readLongArray(store,
      metas.find(_.name == "t_be_us").get).toSeq ===
      ticks.map(v => if (v == Long.MinValue) v else v / 1000))
    // the double path carries ticks with NaT → NaN
    val d = graft.source.ZarrCodec.readArray(store, mt)
    assert(d(4).isNaN && d(0) === base.toDouble)
    // unit table + probe naming
    assert(graft.source.ZarrCodec.timeUnitSeconds("<M8[ns]") === 1e-9)
    assert(graft.source.ZarrCodec.timeUnitSeconds(">m8[h]") === 3600.0)
    assert(graft.source.ZarrProbe.parseDtype("<M8[ns]") ===
      (("datetime64[ns]", 64, "little-endian")))
    assert(graft.source.ZarrProbe.parseDtype(">m8[s]") ===
      (("timedelta64[s]", 64, "big-endian")))
  }

  test("tidy scan consumes a RAW datetime64 time axis as epoch seconds") {
    val store = java.nio.file.Files.createTempDirectory("graft-zarr-m8t")
    graft.source.ZarrFixture.writeForecast(store, nt = 2)
    // replace the CF-numeric time axis with raw datetime64[ns]
    graft.Work.walkAll(store.resolve("time"))
      .filter(java.nio.file.Files.isRegularFile(_))
      .foreach(java.nio.file.Files.delete)
    val stamps = Seq(1735689600000000000L, 1735776000000000000L)
    graft.source.ZarrFixture.writeInt64(store, "time", stamps, chunk = 2,
      dtype = "<M8[ns]", dims = Seq("time"))
    val t = graft.source.ZarrSource.tidy(spark, store.toString)
      .select("time_idx", "time").distinct().collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(t(0) === 1735689600.0 && t(1) === 1735776000.0)
  }
}
