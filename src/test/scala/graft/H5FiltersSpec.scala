package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.source.{H5Filters, Hdf5, Hdf5Write, NetCdfFixture}

/** Registered HDF5 filters (hdf5plugin): lz4 32004, bitshuffle 32008,
  * zstd 32015 — stream-format unit pins plus write→read round trips
  * through the full pipeline-message path (a named, registered-id v1
  * pipeline entry, exercising the reader's name skip).
  */
class H5FiltersSpec extends AnyFunSuite {

  private def doubles(n: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(n * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => b.putDouble(math.sin(i * 0.1) * 100))
    b.array()
  }

  test("lz4 filter stream: header fields, block framing, raw blocks") {
    val data = doubles(3000) // 24 000 bytes -> blocks of 4 096
    val enc = H5Filters.lz4Encode(data, blockSize = 4096)
    val hb = java.nio.ByteBuffer.wrap(enc)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    assert(hb.getLong() === 24000L, "total size big-endian")
    assert(hb.getInt() === 4096, "block size big-endian")
    assert(H5Filters.lz4Decode(enc).toSeq === data.toSeq)
    // incompressible input exercises the stored-raw (cb == block) path
    val rnd = new scala.util.Random(3)
    val noise = Array.fill[Byte](10000)(rnd.nextInt().toByte)
    val encN = H5Filters.lz4Encode(noise, blockSize = 4096)
    assert(H5Filters.lz4Decode(encN).toSeq === noise.toSeq)
  }

  test("bitshuffle filter: lz4 mode with short-block and raw tail") {
    // 1003 elements, block 64: 15 full blocks, short block of 40,
    // raw tail of 3 elements
    val data = doubles(1003)
    val enc = H5Filters.bitshuffleEncode(data, elem = 8, blockElems0 = 64)
    val hb = java.nio.ByteBuffer.wrap(enc)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    assert(hb.getLong() === 1003L * 8, "total size")
    assert(hb.getInt() === 64 * 8, "block size in BYTES")
    // raw tail: the last 24 bytes of the stream are the last 3 elements
    assert(enc.takeRight(24).toSeq === data.takeRight(24).toSeq)
    val cd = Seq(0, 0, 8, 64, 2)
    assert(H5Filters.bitshuffleDecode(enc, cd, 8).toSeq === data.toSeq)
  }

  test("bitshuffle filter: plain mode, cd block size and library default") {
    val data = doubles(500)
    val enc = H5Filters.bitshuffleEncode(data, elem = 8, blockElems0 = 128,
      withLz4 = false)
    assert(enc.length === data.length)
    assert(H5Filters.bitshuffleDecode(enc, Seq(0, 0, 8, 128, 0), 8).toSeq
      === data.toSeq)
    // cd block 0 -> default 8192/8 = 1024 elems; 500 < 1024 so the
    // whole payload is one short block (496) + 4-element tail
    val encD = H5Filters.bitshuffleEncode(data, elem = 8,
      blockElems0 = H5Filters.bshufDefaultBlockElems(8), withLz4 = false)
    assert(H5Filters.bitshuffleDecode(encD, Seq(0, 0, 8, 0, 0), 8).toSeq
      === data.toSeq)
  }

  test("zstd filter round-trips, including frames sans content size") {
    val data = doubles(2000)
    assert(H5Filters.zstdDecode(H5Filters.zstdEncode(data)).toSeq
      === data.toSeq)
    // streaming-written frame: no content size in the header
    val bos = new java.io.ByteArrayOutputStream()
    val zs = new com.github.luben.zstd.ZstdOutputStream(bos)
    zs.write(data); zs.close()
    assert(H5Filters.zstdDecode(bos.toByteArray).toSeq === data.toSeq)
  }

  test("write->read round trip through each registered filter") {
    // ny=7 with chunking keeps edge chunks in play; values incl. NaN
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 2, ny = 7, nx = 5, nl = 3)
    for (rf <- Seq("lz4", "bitshuffle-lz4", "zstd")) {
      val bytes = Hdf5Write.write(dims, gatts, vars, maxChunkElems = 48,
        regFilter = Some(rf))
      val r = new Hdf5.Reader(bytes)
      val f = Hdf5.read(bytes)
      val wantId = rf match {
        case "lz4" => 32004
        case "bitshuffle-lz4" => 32008
        case "zstd" => 32015
      }
      assert(f.dataset("sic_mean").get.filters.map(_.id) === Seq(wantId), rf)
      vars.foreach { v =>
        val back = r.readDoubles(v.name)
        assert(back.length === v.data.length, s"$rf/${v.name}")
        v.data.indices.foreach { i =>
          val (a, b) = (v.data(i), back(i))
          assert(a.isNaN && b.isNaN || a === b, s"$rf/${v.name}[$i]")
        }
      }
    }
  }

  // ---- scale-offset (filter 6): packed-integer climate data

  test("scale-offset: int32 round trip, minbits not a byte multiple") {
    val b = java.nio.ByteBuffer.allocate(7 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(1007, 1003, 1012, 1005, 1009, 1003, 1023).foreach(b.putInt)
    val (enc, cd) = H5Filters.scaleOffsetEncode(b.array(), 4)
    // span 20 -> 5 bits/value, 13-byte header + ceil(35/8)+1 bytes
    assert(enc.length === 13 + 5)
    assert(H5Filters.scaleOffsetDecode(enc, cd).toSeq === b.array().toSeq)
  }

  test("scale-offset: constant array (minbits 0) and full-width span " +
    "(raw copy) round trip") {
    val const = java.nio.ByteBuffer.allocate(5 * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 5).foreach(_ => const.putShort(-42))
    val (e1, cd1) = H5Filters.scaleOffsetEncode(const.array(), 2)
    assert(e1.length === 13) // no payload at all
    assert(H5Filters.scaleOffsetDecode(e1, cd1).toSeq === const.array().toSeq)
    val wide = java.nio.ByteBuffer.allocate(3 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(Int.MinValue, 0, Int.MaxValue).foreach(wide.putInt)
    val (e2, cd2) = H5Filters.scaleOffsetEncode(wide.array(), 4)
    assert(e2.length === 13 + 12) // raw copy
    assert(H5Filters.scaleOffsetDecode(e2, cd2).toSeq === wide.array().toSeq)
  }

  test("scale-offset: defined fill value maps through the reserved " +
    "all-ones code") {
    val b = java.nio.ByteBuffer.allocate(6 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val fill = -9999
    Seq(100, fill, 104, 101, fill, 107).foreach(b.putInt)
    val (enc, cd) = H5Filters.scaleOffsetEncode(b.array(), 4,
      fill = Some(fill.toLong))
    assert(cd(7) === 1) // fill-defined flag
    assert(H5Filters.scaleOffsetDecode(enc, cd).toSeq === b.array().toSeq)
  }

  test("scale-offset: float D-scale class rejected with a pointed message") {
    val e = intercept[IllegalArgumentException] {
      H5Filters.scaleOffsetDecode(new Array[Byte](13),
        Seq(0, 2, 4, 1 /* H5T_FLOAT */, 8, 0, 0, 0, 0))
    }
    assert(e.getMessage.contains("float D/E-scale"))
  }


  /** Crafted single-chunk int32 dataset wrapped in a v2 filter-pipeline
    * message — the e2e harness for filter decode through the normal
    * chunk-walk path. Returns the file bytes.
    */
  private def craftFilteredInt32(enc: Array[Byte], filterId: Int,
                                 cd: Seq[Int], n: Int,
                                 precision: Int = 32,
                                 elemSize: Int = 4): Array[Byte] = {
    val chunkAddr = 48
    val btreeAddr = chunkAddr + enc.length
    val dsAddr = btreeAddr + 80
    val filtBody = 2 + 6 + 4 * cd.length
    val chunk0 = (4 + 12) + (4 + 12) + (4 + 19) + (4 + filtBody)
    val dsSize = 4 + 2 + 1 + chunk0 + 4
    val rootAddr = dsAddr + dsSize
    val total = rootAddr + 27
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def at(pos: Int): java.nio.ByteBuffer = { buf.position(pos); buf }

    at(0)
    buf.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n'))
    buf.put(2.toByte); buf.put(8.toByte); buf.put(8.toByte); buf.put(0.toByte)
    buf.putLong(0L); buf.putLong(-1L)
    buf.putLong(total.toLong); buf.putLong(rootAddr.toLong)
    buf.putInt(0)

    at(chunkAddr); buf.put(enc)

    at(btreeAddr)
    buf.put("TREE".getBytes); buf.put(1.toByte); buf.put(0.toByte)
    buf.putShort(1)
    buf.putLong(-1L); buf.putLong(-1L)
    buf.putInt(enc.length); buf.putInt(0)
    buf.putLong(0L); buf.putLong(0L)
    buf.putLong(chunkAddr.toLong)
    buf.putInt(0); buf.putInt(0)
    buf.putLong(n.toLong); buf.putLong(0L)

    at(dsAddr)
    buf.put("OHDR".getBytes)
    buf.put(2.toByte); buf.put(0.toByte)
    buf.put(chunk0.toByte)
    buf.put(1.toByte); buf.putShort(12); buf.put(0.toByte)
    buf.put(2.toByte); buf.put(1.toByte); buf.put(0.toByte); buf.put(1.toByte)
    buf.putLong(n.toLong)
    buf.put(3.toByte); buf.putShort(12); buf.put(0.toByte)
    buf.put(0x10.toByte)
    buf.put(0x08.toByte); buf.put(0.toByte); buf.put(0.toByte)
    buf.putInt(elemSize)
    buf.putShort(0); buf.putShort(precision.toShort)
    buf.put(8.toByte); buf.putShort(19); buf.put(0.toByte)
    buf.put(3.toByte); buf.put(2.toByte); buf.put(2.toByte)
    buf.putLong(btreeAddr.toLong)
    buf.putInt(n); buf.putInt(elemSize)
    buf.put(11.toByte); buf.putShort(filtBody.toShort); buf.put(0.toByte)
    buf.put(2.toByte); buf.put(1.toByte)
    buf.putShort(filterId.toShort); buf.putShort(0)
    buf.putShort(cd.length.toShort)
    cd.foreach(buf.putInt)

    at(rootAddr)
    buf.put("OHDR".getBytes)
    buf.put(2.toByte); buf.put(0.toByte)
    buf.put(16.toByte)
    buf.put(6.toByte); buf.putShort(12); buf.put(0.toByte)
    buf.put(1.toByte); buf.put(0.toByte); buf.put(1.toByte)
    buf.put('v'.toByte)
    buf.putLong(dsAddr.toLong)
    buf.putInt(0)
    buf.array()
  }

  test("scale-offset end to end: crafted chunked int32 dataset with a " +
    "v2 pipeline message decodes through the scan path") {
    val raw = java.nio.ByteBuffer.allocate(5 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(7, 3, 12, 5, 9).foreach(raw.putInt)
    val (enc, cd) = H5Filters.scaleOffsetEncode(raw.array(), 4)
    assert(cd.length === 9)
    val r = new Hdf5.Reader(craftFilteredInt32(enc, 6, cd, 5))
    assert(r.file.dataset("v").get.filters.map(_.id) === Seq(6))
    assert(r.readDoubles("v").toSeq === Seq(7.0, 3.0, 12.0, 5.0, 9.0))
  }

  // ---- szip (filter 4): the CCSDS coder under H5Zszip's framing

  test("szip: 16-bit NN payload round-trips, LE header carries the size") {
    val mask = 128 | 32 | 8 | 1 // raw + NN + LSB + allow-k13
    val cd = Seq(mask, 16, 16, 64)
    val raw = java.nio.ByteBuffer.allocate(200 * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 200).foreach(i => raw.putShort((1000 + 37 * (i % 23) +
      (if (i % 41 == 0) 7000 else 0)).toShort))
    val enc = H5Filters.szipEncode(raw.array(), cd)
    // 4-byte little-endian uncompressed size leads the stream
    assert((enc(0) & 0xFF) === 400 % 256 && (enc(1) & 0xFF) === 400 / 256)
    assert(H5Filters.szipDecode(enc, cd).toSeq === raw.array().toSeq)
    // EC (no preprocessing) and MSB byte order variants
    for (m2 <- Seq(128 | 4 | 8, 128 | 32 | 16, 128 | 4 | 16)) {
      val cd2 = Seq(m2, 16, 8, 32)
      val e2 = H5Filters.szipEncode(raw.array(), cd2)
      assert(H5Filters.szipDecode(e2, cd2).toSeq === raw.array().toSeq,
        s"mask $m2")
    }
  }

  test("szip: 8-bit payload across multiple scanlines") {
    val cd = Seq(128 | 32 | 8, 8, 8, 16) // 2-block scanlines
    val raw = Array.tabulate(150)(i => ((i * 11) % 251).toByte)
    assert(H5Filters.szipDecode(H5Filters.szipEncode(raw, cd), cd)
      .toSeq === raw.toSeq)
  }

  test("szip end to end: crafted chunked int16 dataset with a v2 " +
    "pipeline message decodes through the scan path") {
    val vals = Seq(7, 3, 12, 5, 9, 300, 301, 299, 1, 0)
    val raw = java.nio.ByteBuffer.allocate(vals.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(v => raw.putShort(v.toShort))
    val cd = Seq(128 | 32 | 8 | 1, 16, 8, 8)
    val enc = H5Filters.szipEncode(raw.array(), cd)
    val r = new Hdf5.Reader(craftFilteredInt32(enc, 4, cd, vals.length,
      precision = 16, elemSize = 2))
    assert(r.file.dataset("v").get.filters.map(_.id) === Seq(4))
    assert(r.readDoubles("v").toSeq === vals.map(_.toDouble))
  }

  test("szip: 32/64-bit byte-stream mode round-trips (libaec sz_compat " +
    "byte-plane interleave over 8-bit Rice coding)") {
    // int32 payload: slowly-varying values so the NN preprocessor and
    // the byte-plane split both have structure to exploit
    val raw32 = java.nio.ByteBuffer.allocate(96 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 96).foreach(i => raw32.putInt(1000000 + i * 3 +
      (if (i % 17 == 0) 50000 else 0)))
    for (mask <- Seq(128 | 32 | 8 | 1, 128 | 4 | 8)) {
      val cd = Seq(mask, 32, 16, 64)
      val enc = H5Filters.szipEncode(raw32.array(), cd)
      assert(H5Filters.szipDecode(enc, cd).toSeq === raw32.array().toSeq,
        s"mask $mask")
    }
    // float64 payload (the NASA EOS case: double geophysical fields)
    val raw64 = java.nio.ByteBuffer.allocate(48 * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 48).foreach(i => raw64.putDouble(273.15 + i * 0.01))
    val cd64 = Seq(128 | 32 | 8 | 1, 64, 8, 16)
    val enc64 = H5Filters.szipEncode(raw64.array(), cd64)
    assert(H5Filters.szipDecode(enc64, cd64).toSeq === raw64.array().toSeq)
    // the byte count still leads the stream
    assert((enc64(0) & 0xFF) === (48 * 8) % 256)
    assert((enc64(1) & 0xFF) === (48 * 8) / 256)
  }

  test("szip end to end: crafted chunked int32 dataset in byte-stream " +
    "mode decodes through the scan path") {
    val vals = Seq(100000, 100007, 99991, 100123, 100122, 100125, 7, 8)
    val raw = java.nio.ByteBuffer.allocate(vals.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(raw.putInt)
    val cd = Seq(128 | 32 | 8 | 1, 32, 8, 8)
    val enc = H5Filters.szipEncode(raw.array(), cd)
    val r = new Hdf5.Reader(craftFilteredInt32(enc, 4, cd, vals.length))
    assert(r.file.dataset("v").get.filters.map(_.id) === Seq(4))
    assert(r.readDoubles("v").toSeq === vals.map(_.toDouble))
  }

  test("szip: partial-block scanlines still rejected with the h5repack " +
    "workaround named") {
    val e2 = intercept[IllegalArgumentException] {
      H5Filters.szipDecode(new Array[Byte](8), Seq(168, 16, 16, 40))
    }
    assert(e2.getMessage.contains("h5repack"))
    // mis-aligned byte-stream payload fails loudly, not silently
    val e3 = intercept[IllegalArgumentException] {
      H5Filters.szipEncode(new Array[Byte](10), Seq(168, 32, 16, 64))
    }
    assert(e3.getMessage.toLowerCase.contains("word"))
  }

  // ---- nbit (filter 5): H5Tset_precision packed integers

  test("nbit: 12-bit-precision int32 round trip, full-precision " +
    "passthrough flag") {
    val b = java.nio.ByteBuffer.allocate(5 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // 12-bit two's complement values (sign bit at bit 11), stored
    // zero-padded above the precision, exactly what the filter sees
    Seq(0x7FF, 0x800, 0xFFF, 0x001, 0x234).foreach(b.putInt)
    val (enc, cd) = H5Filters.nbitEncode(b.array(), 4, 12)
    assert(enc.length === (5 * 12 + 7) / 8)
    assert(H5Filters.nbitDecode(enc, cd).toSeq === b.array().toSeq)
    val (raw, cdRaw) = H5Filters.nbitEncode(b.array(), 4, 32)
    assert(cdRaw(1) === 0) // needs-compression flag off
    assert(H5Filters.nbitDecode(raw, cdRaw).toSeq === b.array().toSeq)
  }

  test("nbit: compound/array parms trees are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      H5Filters.nbitDecode(new Array[Byte](4),
        Seq(10, 1, 2, 3 /* compound */, 8, 0, 16, 0))
    }
    assert(e.getMessage.contains("atomic only"))
  }

  test("nbit end to end: crafted chunked int32 dataset (precision 12, " +
    "signed) decodes with sign extension through the scan path") {
    val vals = Seq(-1, 5, -2048, 2047, 0) // 12-bit two's complement range
    val raw = java.nio.ByteBuffer.allocate(vals.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(v => raw.putInt(v & 0xFFF)) // filter input: padded to 0
    val (enc, cd) = H5Filters.nbitEncode(raw.array(), 4, 12)
    assert(cd.length === 8)
    val r = new Hdf5.Reader(craftFilteredInt32(enc, 5, cd, 5, precision = 12))
    val ds = r.file.dataset("v").get
    assert(ds.filters.map(_.id) === Seq(5))
    assert(ds.dtype.bitPrecision === 12)
    assert(r.readDoubles("v").toSeq === vals.map(_.toDouble))
  }

  test("fletcher32 end to end: trailing checksum verifies through the " +
    "chunk path; corruption fails loudly") {
    val raw = java.nio.ByteBuffer.allocate(5 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(17, -3, 1200, 5, 90017).foreach(raw.putInt)
    val sum = H5Filters.fletcher32(raw.array(), raw.array().length)
    val enc = java.util.Arrays.copyOf(raw.array(), raw.array().length + 4)
    java.nio.ByteBuffer.wrap(enc, raw.array().length, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(sum)
    val good = craftFilteredInt32(enc, 3, Seq.empty, 5)
    assert(new Hdf5.Reader(good).readDoubles("v").toSeq ===
      Seq(17.0, -3.0, 1200.0, 5.0, 90017.0))
    val bad = good.clone()
    bad(50) = (bad(50) ^ 0x08).toByte // flip a payload bit
    val e = intercept[IllegalArgumentException] {
      new Hdf5.Reader(bad).readDoubles("v")
    }
    assert(e.getMessage.contains("fletcher32 mismatch"))
  }

  test("bitshuffle filter: zstd mode (compression 3) round trips with " +
    "short block and raw tail") {
    val data = doubles(1003) // 15 full blocks of 64, short 40, tail 3
    val enc = H5Filters.bitshuffleEncode(data, elem = 8, blockElems0 = 64,
      zstd = true)
    val cd = Seq(0, 0, 8, 64, 3)
    assert(H5Filters.bitshuffleDecode(enc, cd, 8).toSeq === data.toSeq)
    // the tail rides raw, exactly as in lz4 mode
    assert(enc.takeRight(24).toSeq === data.takeRight(24).toSeq)
  }
}
