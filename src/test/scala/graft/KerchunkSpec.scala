package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.source.{Hdf5, Hdf5Write, Kerchunk, NetCdfFixture}

/** Kerchunk reference stores: the index built from our own HDF5 chunk
  * walk must describe a zarr store whose decode (through the SHARED
  * zarr chunk codec, zero HDF5 code) reproduces the direct HDF5 read
  * bit-for-bit — chunked (multi-chunk, shuffle+deflate), contiguous,
  * and inline/base64 refs, v0 and v1 JSON shapes.
  */
class KerchunkSpec extends AnyFunSuite {

  private def fixture(maxChunkElems: Int): java.nio.file.Path = {
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 2, ny = 9, nx = 7,
      nl = 3)
    val f = Files.createTempFile("graft-kerchunk", ".nc")
    Files.write(f, Hdf5Write.write(dims, gatts, vars,
      maxChunkElems = maxChunkElems))
    f
  }

  test("build→parse→read round-trips every numeric dataset exactly " +
    "(multi-chunk shuffle+deflate)") {
    val f = fixture(maxChunkElems = 64) // forces several chunks per var
    val refs = Kerchunk.build(f)
    val st = Kerchunk.parse(refs)
    val direct = new Hdf5.Reader(Files.readAllBytes(f))
    assert(st.metas.nonEmpty)
    st.metas.foreach { m =>
      val viaRefs = Kerchunk.readArray(st, m)
      val viaH5 = direct.readDoubles(m.name)
      assert(viaRefs.length === viaH5.length, m.name)
      viaRefs.zip(viaH5).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b || (a.isNaN && b.isNaN), s"${m.name}[$i]: $a vs $b")
      }
    }
    // the band variable genuinely fans out across >1 chunk ref
    val band = st.metas.maxBy(_.nValues)
    assert(Kerchunk.chunkRefs(st, band).size > 1)
    // and the metadata is genuine zarr v2 (compressor zlib + shuffle)
    assert(band.compressor === "zlib")
    assert(band.filters.exists(_.id == "shuffle"))
  }

  test("version-0 flat JSON and inline base64 refs parse and decode") {
    // hand-built v0 refs: one 1-D float64 array, chunk inline
    val vals = Array(1.5, -2.25, 3.0)
    val raw = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(raw.putDouble)
    val b64 = java.util.Base64.getEncoder.encodeToString(raw.array())
    val json =
      s"""{".zgroup": "{\\"zarr_format\\":2}",
         | "a/.zarray": "{\\"zarr_format\\":2,\\"shape\\":[3],
         |   \\"chunks\\":[3],\\"dtype\\":\\"<f8\\",\\"compressor\\":null,
         |   \\"filters\\":null,\\"fill_value\\":null,\\"order\\":\\"C\\"}",
         | "a/0": "base64:$b64"}""".stripMargin.replace("\n", "")
    val st = Kerchunk.parse(json)
    val m = st.metas.find(_.name == "a").get
    assert(Kerchunk.readArray(st, m).toSeq === vals.toSeq)
  }

  test("MultiZarr combine: two per-file stores concatenate along t; " +
    "every array reads as the concatenation of the direct reads") {
    def part(tStart: Double): java.nio.file.Path = {
      val (dims, gatts, vars) = NetCdfFixture.spec(nt = 2, ny = 5, nx = 4,
        nl = 2, tStart = tStart)
      val f = Files.createTempFile("graft-kerchunk-part", ".nc")
      Files.write(f, Hdf5Write.write(dims, gatts, vars, maxChunkElems = 40))
      f
    }
    val (f1, f2) = (part(0.0), part(2.0))
    val combined = Kerchunk.combine(
      Seq(Kerchunk.parse(Kerchunk.build(f1)),
        Kerchunk.parse(Kerchunk.build(f2))), concatDim = "time")
    val (r1, r2) = (new Hdf5.Reader(Files.readAllBytes(f1)),
      new Hdf5.Reader(Files.readAllBytes(f2)))
    // the t axis itself concatenates (its only dim IS the concat dim)
    val tMeta = combined.metas.find(_.name == "time").get
    assert(tMeta.shape === Seq(4))
    assert(Kerchunk.readArray(combined, tMeta).toSeq ===
      (r1.readDoubles("time") ++ r2.readDoubles("time")).toSeq)
    // 4-D payloads concatenate along t; static coords come from file 1
    combined.metas.foreach { m =>
      val got = Kerchunk.readArray(combined, m)
      val want =
        if (combined.dims.get(m.name).exists(_.headOption.contains("time")))
          r1.readDoubles(m.name) ++ r2.readDoubles(m.name)
        else r1.readDoubles(m.name)
      assert(got.length === want.length, m.name)
      got.zip(want).foreach { case (a, b) =>
        assert(a == b || (a.isNaN && b.isNaN), m.name) }
    }
    // chunk misalignment along t is rejected, not silently straddled
    val odd = {
      val (dims, gatts, vars) = NetCdfFixture.spec(nt = 3, ny = 5, nx = 4,
        nl = 2, tStart = 4.0)
      val f = Files.createTempFile("graft-kerchunk-odd", ".nc")
      // chunk of 2 along t against nt=3 -> extent not chunk-aligned
      Files.write(f, Hdf5Write.write(dims, gatts, vars, maxChunkElems = 80))
      f
    }
    val stOdd = Kerchunk.parse(Kerchunk.build(odd))
    val band = stOdd.metas.maxBy(_.nValues)
    if (band.shape.head % band.chunks.head != 0) {
      val ex = intercept[IllegalArgumentException] {
        Kerchunk.combine(Seq(stOdd, stOdd), concatDim = "time")
      }
      assert(ex.getMessage.contains("straddle"))
    }
  }

  test("parquet reference store: write/read round-trips refs by chunk " +
    "POSITION, inline raw and missing chunks included") {
    val f = fixture(maxChunkElems = 64)
    val st = Kerchunk.parse(Kerchunk.build(f))
    val dir = Files.createTempDirectory("graft-kerchunk-pq")
    // recordSize 3 forces multiple refs.{i}.parq files per array
    Kerchunk.writeParquetRefs(st, dir, recordSize = 3)
    assert(Files.exists(dir.resolve(".zmetadata")))
    val band = st.metas.maxBy(_.nValues)
    assert(Files.exists(dir.resolve(band.name).resolve("refs.0.parq")))
    assert(Files.exists(dir.resolve(band.name).resolve("refs.1.parq")))
    val back = Kerchunk.readParquetRefs(dir)
    assert(back.metas.map(_.name).sorted === st.metas.map(_.name).sorted)
    assert(back.dims === st.dims)
    assert(back.refs.keySet === st.refs.keySet)
    st.refs.foreach { case (k, r) =>
      (r, back.refs(k)) match {
        case (Kerchunk.InlineRef(a), Kerchunk.InlineRef(b)) =>
          assert(a.toSeq === b.toSeq, k)
        case (a, b) => assert(a === b, k)
      }
    }
    // every array decodes identically through either store form
    st.metas.foreach { m =>
      val m2 = back.metas.find(_.name == m.name).get
      val a = Kerchunk.readArray(st, m)
      val b = Kerchunk.readArray(back, m2)
      a.zip(b).foreach { case (x, y) =>
        assert(x == y || (x.isNaN && y.isNaN), m.name) }
    }

    // inline chunks survive as raw rows, and a MISSING chunk row (all
    // null) reads back as no ref — not a phantom chunk
    val vals = Array(4.5, -1.0)
    val raw = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(raw.putDouble)
    val b64 = java.util.Base64.getEncoder.encodeToString(raw.array())
    val json =
      s"""{".zgroup": "{\\"zarr_format\\":2}",
         | "a/.zarray": "{\\"zarr_format\\":2,\\"shape\\":[4],
         |   \\"chunks\\":[2],\\"dtype\\":\\"<f8\\",\\"compressor\\":null,
         |   \\"filters\\":null,\\"fill_value\\":0,\\"order\\":\\"C\\"}",
         | "a/0": "base64:$b64"}""".stripMargin.replace("\n", "")
    val sparse = Kerchunk.parse(json) // chunk "a/1" absent = fill
    val dir2 = Files.createTempDirectory("graft-kerchunk-pq2")
    Kerchunk.writeParquetRefs(sparse, dir2)
    val back2 = Kerchunk.readParquetRefs(dir2)
    assert(back2.refs.keySet === Set("a/0"))
    assert(back2.refs("a/0").isInstanceOf[Kerchunk.InlineRef])
    val m2 = back2.metas.find(_.name == "a").get
    assert(Kerchunk.readArray(back2, m2).toSeq === Seq(4.5, -1.0, 0.0, 0.0))
  }

  test("parquet reference store rewrite clears stale higher-index blocks") {
    val f = fixture(maxChunkElems = 64)
    val st = Kerchunk.parse(Kerchunk.build(f))
    val dir = Files.createTempDirectory("graft-kerchunk-rewrite")
    // first write: recordSize 1 -> one refs.{i}.parq per chunk
    Kerchunk.writeParquetRefs(st, dir, recordSize = 1)
    val band = st.metas.maxBy(_.nValues)
    assert(Files.exists(dir.resolve(band.name).resolve("refs.1.parq")))
    // rewrite with a coarser layout: fewer blocks; the old refs.1.parq
    // (and up) must be gone or readParquetRefs would ingest stale rows
    Kerchunk.writeParquetRefs(st, dir, recordSize = 10000)
    assert(!Files.exists(dir.resolve(band.name).resolve("refs.1.parq")))
    val back = Kerchunk.readParquetRefs(dir)
    assert(back.refs.keySet === st.refs.keySet)
    st.metas.foreach { m =>
      val m2 = back.metas.find(_.name == m.name).get
      val a = Kerchunk.readArray(st, m)
      val b = Kerchunk.readArray(back, m2)
      a.zip(b).foreach { case (x, y) =>
        assert(x == y || (x.isNaN && y.isNaN), m.name) }
    }
  }

  test("unsupported filter pipelines are rejected with the workaround " +
    "named, not mis-indexed") {
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 1, ny = 6, nx = 6,
      nl = 2)
    val f = Files.createTempFile("graft-kerchunk-nb", ".nc")
    Files.write(f, Hdf5Write.write(dims, gatts, vars,
      regFilter = Some("zstd"))) // registered filter: no numcodecs twin
    val ex = intercept[IllegalArgumentException] { Kerchunk.build(f) }
    assert(ex.getMessage.contains("h5repack"))
  }
}
