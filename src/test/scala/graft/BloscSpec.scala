package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.source.{Blosc, ZarrCodec, ZarrFixture}

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

  test("bit-shuffle and truncated chunks are rejected loudly") {
    val ok = Blosc.compress(doubles(64), 8, "lz4")
    val bitShuffled = ok.clone()
    bitShuffled(2) = (bitShuffled(2) | 0x4).toByte
    intercept[IllegalArgumentException] { Blosc.decompress(bitShuffled) }
    intercept[IllegalArgumentException] {
      Blosc.decompress(java.util.Arrays.copyOf(ok, ok.length - 1))
    }
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
  }
}
