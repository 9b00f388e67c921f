package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.source.{ZarrCodec, ZarrFixture, ZarrSource}

/** Zarr v3 stores (zarr-python's current default format): per-node
  * zarr.json, c/-prefixed nested chunk keys, bytes+gzip/zstd codec
  * chains, dimension_names — all normalized into the same ArrayMeta the
  * v2 paths use, so manifest/tidy/read are format-agnostic.
  */
class ZarrV3Spec extends SparkSpec {

  test("v3 metadata normalizes: shape, chunks, dtype, codec, key layout") {
    val store = Files.createTempDirectory("graft-zarr3")
    ZarrFixture.writeV3(store, "var", Seq(8, 6), Seq(4, 6), codec = "zstd",
      value = c => c.head * 10.0 + c(1))
    val metas = ZarrCodec.readMeta(store)
    assert(metas.map(_.name) === Seq("var"))
    val m = metas.head
    assert(m.zarrFormat === 3 && m.sep === "/")
    assert(m.shape === Seq(8, 6) && m.chunks === Seq(4, 6))
    assert(m.dtype === "<f8" && m.compressor === "zstd")
    assert(m.nChunks === Seq(2, 1))
    // chunk files live nested under c/
    assert(Files.exists(store.resolve("var/c/0/0")))
    assert(ZarrCodec.keyFromPath(m, "var/c/1/0") === "1.0")
  }

  test("v3 chunks decode through every codec: null, gzip, zstd; LE and BE") {
    val variants = Seq(("a_null", "null", "<f8"), ("b_gzip", "gzip", "<f8"),
      ("c_zstd", "zstd", "<f8"), ("d_be", "zstd", ">i4"))
    val store = Files.createTempDirectory("graft-zarr3c")
    variants.foreach { case (name, codec, dt) =>
      ZarrFixture.writeV3(store, name, Seq(5, 4), Seq(3, 4), dtype = dt,
        codec = codec, value = c => (c.head * 4 + c(1)).toDouble)
    }
    variants.foreach { case (name, _, _) =>
      val m = ZarrCodec.readMeta(store).find(_.name == name).get
      val full = ZarrCodec.readArray(store, m)
      assert(full.toSeq === (0 until 20).map(_.toDouble), name)
    }
  }

  test("chunk-parallel executor read: v3 equals the v2 rendering") {
    val v2 = Files.createTempDirectory("graft-zarr3v2")
    val v3 = Files.createTempDirectory("graft-zarr3v3")
    val value = (c: Seq[Int]) => c.head * 0.5 + c(1) * 0.01
    ZarrFixture.write(v2, "sic", Seq(10, 8), Seq(4, 8), value = value)
    ZarrFixture.writeV3(v3, "sic", Seq(10, 8), Seq(4, 8), codec = "zstd",
      value = value)
    def rows(store: String) = ZarrSource.read(spark, store, "sic")
      .select(col("chunk_key"), explode(col("values")).as("v"))
      .collect().map(_.toString).sorted.toSeq
    assert(rows(v3.toString) === rows(v2.toString))
  }

  test("forecast-shaped v3 store: tidy scan equals the v2 store's") {
    val v2 = Files.createTempDirectory("graft-zarr3f2")
    val v3 = Files.createTempDirectory("graft-zarr3f3")
    ZarrFixture.writeForecast(v2)
    ZarrFixture.writeForecastV3(v3)
    def tidyRows(store: String) = ZarrSource.tidy(spark, store.toString)
      .drop("path") // store paths differ by construction
      .collect().map(_.toString).sorted.toSeq
    assert(tidyRows(v3.toString) === tidyRows(v2.toString))
    assert(tidyRows(v3.toString).nonEmpty)
    // the forecast manifest sees dimension_names and group attrs
    val man = ZarrSource.forecastManifest(spark, v3.toString)
    val band = man.filter(col("variable") === "sic_mean").head()
    assert(band.getAs[String]("dims") === "time,yc,xc,leadtime")
    assert(band.getAs[String]("crs") === "EPSG:6931")
    assert(band.getAs[Boolean]("is_band"))
  }

  test("sharding_indexed: shards decode to the unsharded array, absent " +
    "inner chunks and the crc32c index included") {
    val plain = Files.createTempDirectory("graft-zarr3pl")
    val sharded = Files.createTempDirectory("graft-zarr3sh")
    val value = (c: Seq[Int]) => c.head * 1.5 + c(1) * 0.25
    // 10×6 array; 8×4 shards of 2×4 inner chunks — the last shard
    // overhangs both edges, so it carries absent inner-chunk entries
    ZarrFixture.writeV3(plain, "arr", Seq(10, 6), Seq(2, 4), codec = "zstd",
      value = value)
    ZarrFixture.writeV3(sharded, "arr", Seq(10, 6), Seq(8, 4),
      codec = "zstd", value = value, shardInner = Some(Seq(2, 4)))
    val mS = ZarrCodec.readMeta(sharded).head
    assert(mS.shard.isDefined)
    assert(mS.shard.get.inner === Seq(2, 4) && mS.shard.get.indexCrc)
    val a = ZarrCodec.readArray(plain, ZarrCodec.readMeta(plain).head)
    val b = ZarrCodec.readArray(sharded, mS)
    assert(b.toSeq === a.toSeq)
    // the executor path sees one row per INNER chunk, scale-parallel
    val rows = ZarrSource.read(spark, sharded.toString, "arr")
    assert(rows.count() > 2) // more chunks than shard files
    val total = rows.select(explode(col("values")).as("v"))
      .agg(sum(col("v"))).head.getDouble(0)
    val expect = (for (r <- 0 until 10; c <- 0 until 6) yield value(Seq(r, c))).sum
    assert(math.abs(total - expect) < 1e-9)
  }

  test("sharded forecast store: the tidy scan equals the unsharded one") {
    val plain = Files.createTempDirectory("graft-zarr3tf")
    val sharded = Files.createTempDirectory("graft-zarr3ts")
    ZarrFixture.writeForecastV3(plain)
    // same content, bands stored as one shard of scanline inner chunks
    ZarrFixture.writeGroupAttrsV3(sharded, Map(
      "geospatial_bounds_crs" -> "EPSG:6931",
      "geospatial_lat_min" -> "45.0"))
    ZarrFixture.writeV3(sharded, "time", Seq(1), Seq(1), codec = "null",
      attrs = Map("units" -> "days since 2025-01-01"), dims = Seq("time"),
      value = c => c.head.toDouble)
    ZarrFixture.writeV3(sharded, "yc", Seq(8), Seq(8), codec = "null",
      attrs = Map("units" -> "km"), dims = Seq("yc"), value = c => 100.0 + c.head)
    ZarrFixture.writeV3(sharded, "xc", Seq(8), Seq(8), codec = "null",
      attrs = Map("units" -> "km"), dims = Seq("xc"), value = c => 200.0 + c.head)
    ZarrFixture.writeV3(sharded, "leadtime", Seq(3), Seq(3), codec = "null",
      dims = Seq("leadtime"), value = c => c.head.toDouble)
    val dims4 = Seq("time", "yc", "xc", "leadtime")
    def band(name: String, f: Seq[Int] => Double): Unit =
      ZarrFixture.writeV3(sharded, name, Seq(1, 8, 8, 3), Seq(1, 8, 8, 3),
        codec = "zstd", dims = dims4, attrs = Map("units" -> "1"),
        value = f, shardInner = Some(Seq(1, 4, 8, 3)))
    band("sic_mean", { c =>
      val Seq(t, y, x, l) = c
      if ((y * 8 + x + l) % 17 == 0) Double.NaN
      else (t + 1) * 0.1 + y * 0.01 + x * 0.001 + l * 0.0001
    })
    band("sic_stddev", { c => val Seq(t, y, x, l) = c; (y + x + l + t) * 0.005 })
    def tidyRows(store: String) = ZarrSource.tidy(spark, store)
      .drop("path").collect().map(_.toString).sorted.toSeq
    assert(tidyRows(sharded.toString) === tidyRows(plain.toString))
  }

  test("unsupported v3 codecs fail loudly (vlen-utf8)") {
    val store = Files.createTempDirectory("graft-zarr3bad")
    Files.writeString(store.resolve("zarr.json"),
      """{"zarr_format": 3, "node_type": "group"}""")
    val dir = store.resolve("bad")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("zarr.json"),
      """{"zarr_format": 3, "node_type": "array", "shape": [4],
        | "data_type": "float64",
        | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [4]}},
        | "chunk_key_encoding": {"name": "default"},
        | "fill_value": 0,
        | "codecs": [{"name": "vlen-utf8"}, {"name": "bytes"}]}""".stripMargin)
    val e = intercept[IllegalArgumentException] { ZarrCodec.readMeta(store) }
    assert(e.getMessage.contains("vlen-utf8"))
  }

  test("transpose codec: permuted storage order decodes to the logical " +
    "C-order array, alone and inside a shard's inner chain") {
    val store = Files.createTempDirectory("graft-zarr3t")
    // 2-D swap, edge chunks included (7x5 array, 4x3 chunks)
    ZarrFixture.writeV3(store, "t2", Seq(7, 5), Seq(4, 3),
      transposeOrder = Some(Seq(1, 0)), value = c => c.head * 100.0 + c(1))
    // 3-D rotation order (2,0,1)
    ZarrFixture.writeV3(store, "t3", Seq(4, 3, 5), Seq(2, 3, 4),
      transposeOrder = Some(Seq(2, 0, 1)),
      value = c => c.head * 100.0 + c(1) * 10.0 + c(2))
    // transpose inside the sharding_indexed inner codec chain
    ZarrFixture.writeV3(store, "ts", Seq(8, 6), Seq(4, 6),
      shardInner = Some(Seq(2, 3)), transposeOrder = Some(Seq(1, 0)),
      value = c => c.head * 100.0 + c(1))
    val metas = ZarrCodec.readMeta(store)
    val t2 = metas.find(_.name == "t2").get
    assert(t2.transpose === Some(Seq(1, 0)))
    val g2 = ZarrCodec.readArray(store, t2)
    for (r <- 0 until 7; c <- 0 until 5)
      assert(g2(r * 5 + c) === r * 100.0 + c, s"t2($r,$c)")
    val t3 = metas.find(_.name == "t3").get
    val g3 = ZarrCodec.readArray(store, t3)
    for (a <- 0 until 4; b <- 0 until 3; c <- 0 until 5)
      assert(g3((a * 3 + b) * 5 + c) === a * 100.0 + b * 10.0 + c,
        s"t3($a,$b,$c)")
    val ts = metas.find(_.name == "ts").get
    assert(ts.shard.exists(_.innerTranspose === Some(Seq(1, 0))))
    val gs = ZarrCodec.readArray(store, ts)
    for (r <- 0 until 8; c <- 0 until 6)
      assert(gs(r * 6 + c) === r * 100.0 + c, s"ts($r,$c)")
  }

  test("v3 blosc codec chains decode (zarr-python v2-default compressor " +
    "carried into v3)") {
    val store = Files.createTempDirectory("graft-zarr3blosc")
    ZarrFixture.writeV3(store, "b", Seq(6, 4), Seq(3, 4), codec = "null",
      value = c => c.head * 2.0 + c(1))
    // hand-swap the codec chain to bytes+blosc and re-encode the chunks
    val dir = store.resolve("b")
    val zj = Files.readString(dir.resolve("zarr.json"))
    Files.writeString(dir.resolve("zarr.json"), zj.replace(
      """[{"name": "bytes", "configuration": {"endian": "little"}}]""",
      """[{"name": "bytes", "configuration": {"endian": "little"}}, """ +
        """{"name": "blosc", "configuration": {"cname": "lz4", "clevel": 5}}]"""))
    import scala.jdk.CollectionConverters._
    Files.walk(dir.resolve("c")).iterator().asScala
      .filter(Files.isRegularFile(_)).foreach { f =>
        Files.write(f, graft.source.Blosc.compress(Files.readAllBytes(f), 8))
      }
    val m = ZarrCodec.readMeta(store).head
    assert(m.compressor === "blosc")
    assert(ZarrCodec.readArray(store, m).toSeq ===
      (for (r <- 0 until 6; c <- 0 until 4) yield r * 2.0 + c))
  }

  test("standalone crc32c codec: trailing checksum verifies and strips; " +
    "corruption fails loudly") {
    val store = Files.createTempDirectory("graft-zarr3crc")
    ZarrFixture.writeV3(store, "a", Seq(6, 4), Seq(3, 4), codec = "gzip",
      withCrc32c = true, value = c => c.head * 10.0 + c(1))
    val m = ZarrCodec.readMeta(store).head
    assert(m.crc32c)
    assert(ZarrCodec.readArray(store, m).toSeq ===
      (for (r <- 0 until 6; c <- 0 until 4) yield r * 10.0 + c))
    // flip one payload byte: the checksum must catch it
    val chunk = store.resolve("a/c/0/0")
    val bytes = Files.readAllBytes(chunk)
    bytes(2) = (bytes(2) ^ 0x40).toByte
    Files.write(chunk, bytes)
    val e = intercept[IllegalArgumentException] {
      ZarrCodec.readArray(store, m)
    }
    assert(e.getMessage.contains("crc32c mismatch"))
  }

  test("crc32c inside a shard's inner chain checksums each inner chunk") {
    val plain = Files.createTempDirectory("graft-zarr3crcp")
    val sharded = Files.createTempDirectory("graft-zarr3crcs")
    def v(c: Seq[Int]) = c.head * 7.0 + c(1) * 0.5
    ZarrFixture.writeV3(plain, "arr", Seq(10, 6), Seq(2, 4), codec = "zstd",
      value = v)
    ZarrFixture.writeV3(sharded, "arr", Seq(10, 6), Seq(8, 4),
      shardInner = Some(Seq(2, 4)), codec = "zstd", withCrc32c = true,
      value = v)
    val mp = ZarrCodec.readMeta(plain).head
    val ms = ZarrCodec.readMeta(sharded).head
    assert(ms.shard.exists(_.innerCrc))
    assert(ZarrCodec.readArray(sharded, ms).toSeq ===
      ZarrCodec.readArray(plain, mp).toSeq)
  }

  test("codecs after crc32c and transpose around sharding are rejected") {
    def badStore(codecs: String): java.nio.file.Path = {
      val store = Files.createTempDirectory("graft-zarr3rej")
      Files.writeString(store.resolve("zarr.json"),
        """{"zarr_format": 3, "node_type": "group"}""")
      val dir = store.resolve("bad")
      Files.createDirectories(dir)
      Files.writeString(dir.resolve("zarr.json"),
        s"""{"zarr_format": 3, "node_type": "array", "shape": [4],
           | "data_type": "float64",
           | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [4]}},
           | "chunk_key_encoding": {"name": "default"},
           | "fill_value": 0,
           | "codecs": $codecs}""".stripMargin)
      store
    }
    val afterCrc = badStore(
      """[{"name": "bytes"}, {"name": "crc32c"}, {"name": "gzip"}]""")
    val e1 = intercept[IllegalArgumentException] { ZarrCodec.readMeta(afterCrc) }
    assert(e1.getMessage.contains("after crc32c"))
    // outer transpose around sharding_indexed would permute the shard
    // grid itself - must fail loudly, not decode wrongly ordered
    val transShard = badStore(
      """[{"name": "transpose", "configuration": {"order": [1, 0]}},
        | {"name": "sharding_indexed", "configuration": {
        |   "chunk_shape": [2, 2],
        |   "codecs": [{"name": "bytes"}],
        |   "index_codecs": [{"name": "bytes"}, {"name": "crc32c"}],
        |   "index_location": "end"}}]""".stripMargin)
    val e2 = intercept[IllegalArgumentException] { ZarrCodec.readMeta(transShard) }
    assert(e2.getMessage.contains("transpose combined with sharding"))
  }

  test("v3 integer dtype long tail: int64, uint32, uint16 decode exactly") {
    val store = Files.createTempDirectory("graft-zarr3ints")
    ZarrFixture.writeV3(store, "t64", Seq(6), Seq(4), dtype = "<i8",
      codec = "zstd", value = c => 1.7e15 + c.head * 3600.0) // ns timestamps
    ZarrFixture.writeV3(store, "u32", Seq(6), Seq(4), dtype = "<u4",
      codec = "gzip", value = c => 4.0e9 + c.head) // above Int.MaxValue
    ZarrFixture.writeV3(store, "u16", Seq(6), Seq(4), dtype = "<u2",
      codec = "null", value = c => 60000.0 + c.head)
    val metas = ZarrCodec.readMeta(store)
    def arr(n: String) = ZarrCodec.readArray(store,
      metas.find(_.name == n).get).toSeq
    assert(arr("t64") === (0 until 6).map(i => 1.7e15 + i * 3600.0))
    assert(arr("u32") === (0 until 6).map(i => 4.0e9 + i))
    assert(arr("u16") === (0 until 6).map(i => 60000.0 + i))
    assert(metas.find(_.name == "t64").get.dtype === "<i8")
    assert(metas.find(_.name == "u32").get.dtype === "<u4")
  }

  test("v3 string arrays (data_type string + vlen-utf8): label axes " +
    "decode through the shared object-dtype paths, crc32c verified") {
    val store = Files.createTempDirectory("graft-zarr-v3-str")
    val labels = Seq("alpha", "βeta", "", "tile-3", "tile-4")
    ZarrFixture.writeStringV3(store, "labels", labels, chunk = 3)
    ZarrFixture.writeStringV3(store, "labels_crc", labels, chunk = 2,
      withCrc32c = true)
    ZarrFixture.writeStringV3(store, "labels_raw", labels, chunk = 5,
      gzip = false)
    val metas = ZarrCodec.readMeta(store)
    val m = metas.find(_.name == "labels").get
    assert(m.dtype === "|O" && m.zarrFormat === 3)
    assert(ZarrCodec.readStringArray(store, m).toSeq === labels)
    assert(ZarrCodec.readStringArray(store,
      metas.find(_.name == "labels_crc").get).toSeq === labels)
    assert(ZarrCodec.readStringArray(store,
      metas.find(_.name == "labels_raw").get).toSeq === labels)
    // a corrupted crc32c chunk fails loudly, not silently
    val crcDir = store.resolve("labels_crc").resolve("c")
    val f = crcDir.resolve("0")
    val bytes = Files.readAllBytes(f)
    bytes(0) = (bytes(0) ^ 0x01).toByte
    Files.write(f, bytes)
    val ex = intercept[IllegalArgumentException] {
      ZarrCodec.readStringArray(store,
        ZarrCodec.readMeta(store).find(_.name == "labels_crc").get)
    }
    assert(ex.getMessage.contains("crc32c"))
    // the numeric scan still refuses object dtypes pointedly
    intercept[IllegalArgumentException] {
      ZarrCodec.readArray(store, m)
    }
  }
}
