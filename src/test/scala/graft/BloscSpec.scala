package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.source.{Blosc, BloscLz, ZarrCodec, ZarrFixture}

/** Blosc chunk codec (c-blosc 1.x format) — zarr-python v2's DEFAULT
  * compressor. Round-trips cover the format's branch points: split vs
  * unsplit blocks, leftover (short) final blocks, shuffle on/off,
  * every supported inner codec, incompressible (raw) streams, and the
  * memcpy fallback shape.
  */
class BloscSpec extends AnyFunSuite {

  private def doubles(n: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(n * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => b.putDouble(i * 0.25))
    b.array()
  }

  test("round-trip across codecs, shuffle, split and leftover blocks") {
    val rnd = new scala.util.Random(7)
    val payloads = Seq(
      "smooth-multi-block" -> doubles(40000),          // > one 64k block
      "smooth-leftover" -> doubles(40000 + 13),        // short final block
      "small-single" -> doubles(100),                  // below split gate
      "incompressible" -> Array.fill[Byte](8192)(rnd.nextInt().toByte),
      "tiny" -> Array[Byte](1, 2, 3))                  // < one typesize
    for {
      (tag, data) <- payloads
      cname <- Seq("lz4", "zlib", "zstd")
      shuffle <- Seq(true, false)
      typesize <- Seq(8, 4, 1)
    } {
      val packed = Blosc.compress(data, typesize, cname, shuffle = shuffle)
      val back = Blosc.decompress(packed)
      assert(back.toSeq === data.toSeq, s"$tag/$cname/shuffle=$shuffle/ts=$typesize")
    }
  }

  test("memcpy-flagged chunks pass the original bytes through") {
    val data = Array.tabulate[Byte](64)(_.toByte)
    val b = java.nio.ByteBuffer.allocate(16 + 64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(2.toByte); b.put(1.toByte)
    b.put(0x2.toByte) // flags: memcpy
    b.put(8.toByte)
    b.putInt(64); b.putInt(64); b.putInt(16 + 64)
    b.put(data)
    assert(Blosc.decompress(b.array()).toSeq === data.toSeq)
  }

  test("truncated chunks are rejected loudly") {
    val ok = Blosc.compress(doubles(64), 8, "lz4")
    intercept[IllegalArgumentException] {
      Blosc.decompress(java.util.Arrays.copyOf(ok, ok.length - 1))
    }
  }

  test("bit-shuffle round-trips across codecs, typesizes and leftovers") {
    val rnd = new scala.util.Random(11)
    val payloads = Seq(
      "smooth-multi-block" -> doubles(40000),
      "leftover-elems" -> doubles(1003),            // 1003 % 8 != 0
      "trailing-bytes" -> (doubles(128) :+ 0x5A.toByte), // len % 8 != 0
      "incompressible" -> Array.fill[Byte](4096)(rnd.nextInt().toByte),
      "tiny" -> Array[Byte](1, 2, 3))
    for {
      (tag, data) <- payloads
      cname <- Seq("lz4", "zlib", "zstd", "snappy")
      typesize <- Seq(8, 4, 2, 1)
    } {
      val packed = Blosc.compress(data, typesize, cname,
        shuffle = false, bitShuffle = true)
      assert((packed(2) & 0x4) != 0, "bit-shuffle flag set")
      val back = Blosc.decompress(packed)
      assert(back.toSeq === data.toSeq, s"$tag/$cname/ts=$typesize")
    }
  }

  test("snappy inner codec round-trips with and without byte-shuffle") {
    for (shuffle <- Seq(true, false)) {
      val data = doubles(5000)
      val packed = Blosc.compress(data, 8, "snappy", shuffle = shuffle)
      assert(Blosc.decompress(packed).toSeq === data.toSeq)
    }
  }

  /** Hand-builds a chunk whose single stream is STORED RAW (cb == len,
    * no compressor in the way) holding externally-derived bit-plane
    * bytes, so decompress pins the decoder's plane->element mapping
    * absolutely — a round-trip alone could not distinguish a
    * self-consistent wrong layout from bitshuffle's published one.
    */
  private def rawBitShuffledChunk(planes: Array[Byte],
                                  typesize: Int): Array[Byte] = {
    val n = planes.length
    val b = java.nio.ByteBuffer.allocate(16 + 4 + 4 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(2.toByte); b.put(1.toByte)
    b.put(((3 << 5) | 0x4).toByte) // zlib codec bits + bit-shuffle flag
    b.put(typesize.toByte)
    b.putInt(n)          // nbytes
    b.putInt(n)          // blocksize: one block
    b.putInt(16 + 4 + 4 + n) // cbytes
    b.putInt(20)         // bstart of block 0
    b.putInt(n)          // stream length == raw size -> stored raw
    b.put(planes)
    b.array()
  }

  test("bit-shuffle bit layout matches the published bitshuffle transform") {
    // element 0 = 0xFF, elements 1..7 = 0 (typesize 1, n=8): bit kk of
    // element r lands in plane kk, byte r/8, bit r%8 -> every plane's
    // single byte has exactly bit 0 set
    val planes1 = Array.fill[Byte](8)(0x01)
    assert(Blosc.decompress(rawBitShuffledChunk(planes1, 1)).toSeq ===
      Seq[Byte](0xFF.toByte, 0, 0, 0, 0, 0, 0, 0))
    // typesize 2, 8 elements (16 bytes): plane index is j*8+kk (byte j
    // of the element major) — a bit in the LAST plane (j=1, kk=7), byte
    // 0, bit 3 must come back as bit 7 of byte 1 of element 3
    val planes2 = new Array[Byte](16)
    planes2(15) = 0x08
    val back2 = Blosc.decompress(rawBitShuffledChunk(planes2, 2))
    val want2 = new Array[Byte](16)
    want2(3 * 2 + 1) = 0x80.toByte
    assert(back2.toSeq === want2.toSeq)
  }

  test("zarr v2 store with blosc-lz4 chunks reads equal to the zlib store") {
    val zlibStore = Files.createTempDirectory("graft-blosc-zlib")
    val bloscStore = Files.createTempDirectory("graft-blosc-lz4")
    val value = (c: Seq[Int]) => c.head * 0.5 + c(1) * 0.01
    ZarrFixture.write(zlibStore, "sic", Seq(20, 16), Seq(8, 16), value = value)
    ZarrFixture.write(bloscStore, "sic", Seq(20, 16), Seq(8, 16),
      value = value, bloscCname = Some("lz4"))
    val mB = ZarrCodec.readMeta(bloscStore).head
    assert(mB.compressor === "blosc")
    val a = ZarrCodec.readArray(zlibStore, ZarrCodec.readMeta(zlibStore).head)
    val b = ZarrCodec.readArray(bloscStore, mB)
    assert(b.toSeq === a.toSeq)
    // and the numcodecs Blosc(cname='snappy', shuffle=BITSHUFFLE) shape
    val bitStore = Files.createTempDirectory("graft-blosc-bitsnappy")
    ZarrFixture.write(bitStore, "sic", Seq(20, 16), Seq(8, 16),
      value = value, bloscCname = Some("snappy"), bloscBitShuffle = true)
    val mBit = ZarrCodec.readMeta(bitStore).head
    val c = ZarrCodec.readArray(bitStore, mBit)
    assert(c.toSeq === a.toSeq)
  }

  // ---- blosclz: hand-assembled token streams (decoded by hand from the
  // FastLZ-style grammar in BloscLz's doc) pin the decoder independently
  // of the compressor.

  private def lzDecode(stream: Array[Byte], outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    BloscLz.decompress(stream, 0, stream.length, out, 0, outLen)
    out
  }

  test("blosclz: literal run + overlapped short match, by hand") {
    // literal "abc" (token 0x02), then copy 6 bytes from distance 2
    // (ref = pos 0): lenField = (6-3)+1 = 4 -> token 0x80, code 0x02
    val s = Array[Byte](0x02, 'a', 'b', 'c', 0x80.toByte, 0x02)
    assert(new String(lzDecode(s, 9)) === "abcabcabc")
  }

  test("blosclz: 255-chained length extension, by hand") {
    // literal "x", then a 300-byte self-overlapping run at distance 0:
    // lenField 7 (token 0xE0), ext 255 + 36 (6+255+36 = 297 = 300-3),
    // distance code 0
    val s = Array[Byte](0x00, 'x', 0xE0.toByte, 0xFF.toByte, 36, 0x00)
    assert(lzDecode(s, 301).toSeq === Seq.fill(301)('x'.toByte))
  }

  test("blosclz: far match past 8191, by hand") {
    // 8300 pseudo-random literals, then 10 bytes copied from offset 0 =
    // distance 8299 >= 8191: token (7<<5)|31 = 0xFF, ext 1 (len 10),
    // code 255, far = 8299-8191 = 108 big-endian
    val lit = Array.tabulate[Byte](8300)(i => ((i * 37 + 11) & 0xFF).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    var p = 0
    while (p < lit.length) {
      val run = math.min(32, lit.length - p)
      bos.write(run - 1); bos.write(lit, p, run); p += run
    }
    bos.write(0xFF); bos.write(1); bos.write(0xFF); bos.write(0); bos.write(108)
    val out = lzDecode(bos.toByteArray, 8310)
    assert(out.take(8300).toSeq === lit.toSeq)
    assert(out.drop(8300).toSeq === lit.take(10).toSeq)
  }

  test("blosclz: malformed streams fail loudly") {
    // match before any output underruns the buffer
    intercept[IllegalArgumentException] {
      lzDecode(Array[Byte](0x80.toByte, 0x00), 3)
    }
    // declared output longer than the stream produces
    intercept[IllegalArgumentException] {
      lzDecode(Array[Byte](0x00, 'x'), 5)
    }
  }

  test("blosclz: compressor round-trips every instruction form") {
    val rnd = new scala.util.Random(41)
    val payloads = Seq(
      "periodic" -> Array.tabulate[Byte](20000)(i => (i % 23).toByte),
      "text" -> ("the quick brown fox " * 700).getBytes,
      "random" -> Array.fill[Byte](9000)(rnd.nextInt().toByte),
      "runs" -> Array.tabulate[Byte](70000)(i => (i / 9000).toByte),
      "tiny" -> Array[Byte](7),
      "far-reuse" -> {
        // unique prefix past the 8191 short-match horizon, then repeats
        val u = Array.tabulate[Byte](9000)(i => ((i * 131 + 7) & 0xFF).toByte)
        u ++ u.take(512)
      })
    for ((tag, data) <- payloads) {
      val c = BloscLz.compress(data, 0, data.length)
      assert(lzDecode(c, data.length).toSeq === data.toSeq, tag)
    }
  }

  test("blosclz inside blosc chunks: split, shuffle and leftover blocks") {
    val payloads = Seq(doubles(40000), doubles(40000 + 13), doubles(100))
    for {
      data <- payloads
      shuffle <- Seq(true, false)
      typesize <- Seq(8, 4, 1)
    } {
      val packed = Blosc.compress(data, typesize, "blosclz", shuffle = shuffle)
      assert(Blosc.decompress(packed).toSeq === data.toSeq)
    }
  }

  test("zarr v2 store with blosc-blosclz chunks reads equal to zlib") {
    val zlibStore = Files.createTempDirectory("graft-blosclz-zlib")
    val lzStore = Files.createTempDirectory("graft-blosclz")
    val value = (c: Seq[Int]) => c.head * 0.5 + c(1) * 0.01
    ZarrFixture.write(zlibStore, "sic", Seq(20, 16), Seq(8, 16), value = value)
    ZarrFixture.write(lzStore, "sic", Seq(20, 16), Seq(8, 16),
      value = value, bloscCname = Some("blosclz"))
    val a = ZarrCodec.readArray(zlibStore, ZarrCodec.readMeta(zlibStore).head)
    val b = ZarrCodec.readArray(lzStore, ZarrCodec.readMeta(lzStore).head)
    assert(b.toSeq === a.toSeq)
  }
}
