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
}
