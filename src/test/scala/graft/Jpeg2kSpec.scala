package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.source.Jpeg2k

/** JPEG 2000 subset codec. Lossless is the whole contract, so the spec
  * is built on exact round-trips across the geometry/depth/level space,
  * with the DWT pinned by hand-computed lifting vectors (the one piece
  * whose "round-trips but wrong" failure mode exists: a transform pair
  * that inverts itself but isn't the spec's 5/3 would still round-trip).
  */
class Jpeg2kSpec extends AnyFunSuite {

  test("5/3 forward lifting matches hand-computed coefficients") {
    // x = [3, 7, 1, 8, 4, 2]  (parity 0, whole-sample symmetric ext)
    // d(k) = x(2k+1) - floor((x(2k)+x(2k+2))/2):
    //   d0 = 7 - floor((3+1)/2) = 7 - 2 = 5
    //   d1 = 8 - floor((1+4)/2) = 8 - 2 = 6
    //   d2 = 2 - floor((4+4)/2) = 2 - 4 = -2   (x(6) mirrors to x(4))
    // s(k) = x(2k) + floor((d(k-1)+d(k)+2)/4), d(-1)=d(0):
    //   s0 = 3 + floor((5+5+2)/4) = 3 + 3 = 6
    //   s1 = 1 + floor((5+6+2)/4) = 1 + 3 = 4
    //   s2 = 4 + floor((6-2+2)/4) = 4 + 1 = 5
    val out = Jpeg2k.fwd53(Array(3, 7, 1, 8, 4, 2))
    assert(out.toSeq === Seq(6, 5, 4, 6, 5, -2)) // interleaved s/d
    assert(Jpeg2k.inv53(out).toSeq === Seq(3, 7, 1, 8, 4, 2))

    // odd length: x = [10, -3, 6, 2, -5]
    //   d0 = -3 - floor((10+6)/2) = -11
    //   d1 = 2 - floor((6-5)/2) = 2 - 0 = 2
    // (floor((6 + -5)/2) = floor(0.5) = 0)
    //   s0 = 10 + floor((-11-11+2)/4) = 10 + floor(-5) = 10 - 5 = 5
    //   s1 = 6 + floor((-11+2+2)/4) = 6 + floor(-1.75) = 6 - 2 = 4
    //   s2 = -5 + floor((2+2+2)/4) = -5 + 1 = -4   (d(2) mirrors to d(1))
    val odd = Jpeg2k.fwd53(Array(10, -3, 6, 2, -5))
    assert(odd.toSeq === Seq(5, -11, 4, 2, -4))
    assert(Jpeg2k.inv53(odd).toSeq === Seq(10, -3, 6, 2, -5))
  }

  test("5/3 round-trips every length 1..40 on random signals") {
    val rnd = new scala.util.Random(7)
    for (n <- 1 to 40; _ <- 0 until 20) {
      val x = Array.fill(n)(rnd.nextInt(2001) - 1000)
      val y = Jpeg2k.fwd53(x)
      assert(Jpeg2k.inv53(y).toSeq === x.toSeq, s"n=$n")
    }
  }

  private def roundTrip(w: Int, h: Int, depth: Int, levels: Int,
                        gen: (Int, Int) => Long): Unit = {
    val samples = Array.tabulate(w * h)(i => gen(i % w, i / w))
    val enc = Jpeg2k.encode(samples, w, h, depth, levels)
    val (dw, dh, dd, dec) = Jpeg2k.decode(enc)
    assert((dw, dh, dd) === ((w, h, depth)), s"${w}x$h d$depth l$levels")
    assert(dec.toSeq === samples.toSeq, s"${w}x$h d$depth l$levels")
  }

  test("codestream round-trip: smooth field, several geometries/levels") {
    for ((w, h) <- Seq((1, 1), (3, 1), (1, 5), (8, 8), (17, 13), (64, 48),
        (65, 67), (130, 3));
        levels <- Seq(0, 1, 3, 5))
      roundTrip(w, h, depth = 12, levels,
        (x, y) => ((x * 13 + y * 7) % 4096).toLong)
  }

  test("codestream round-trip: random fields at depths 1..24") {
    val rnd = new scala.util.Random(42)
    for (depth <- Seq(1, 2, 8, 16, 24); trial <- 0 until 3) {
      val w = 5 + rnd.nextInt(90)
      val h = 5 + rnd.nextInt(90)
      roundTrip(w, h, depth, levels = -1,
        (_, _) => (rnd.nextLong().abs % (1L << depth)))
    }
  }

  test("codestream round-trip: constant and near-constant fields " +
    "(empty code-blocks and not-included paths)") {
    roundTrip(32, 32, 10, 2, (_, _) => 0L)
    roundTrip(32, 32, 10, 2, (_, _) => 1023L)
    // one hot pixel: most code-blocks of most subbands stay empty
    roundTrip(200, 120, 16, 5, (x, y) => if (x == 77 && y == 33) 65535L else 0L)
  }

  test("multiple code-blocks per subband (dims > 64) round-trip") {
    val rnd = new scala.util.Random(3)
    roundTrip(200, 150, 14, 2,
      (x, y) => ((x * 31 + y * 17 + rnd.nextInt(512)) % 16384).toLong)
  }

  test("worst-case noise expands but stays lossless (the GRIB regime: " +
    "packed integer residuals)") {
    val rnd = new scala.util.Random(11)
    val w = 97; val h = 61
    val samples = Array.fill(w * h)(rnd.nextLong().abs % (1L << 20))
    val enc = Jpeg2k.encode(samples, w, h, 20)
    val (_, _, _, dec) = Jpeg2k.decode(enc)
    assert(dec.toSeq === samples.toSeq)
  }

  test("tag tree matches the hand-traced B.10.2 vector") {
    // 2x2 leaf grid, leaves (row-major) 1,3,2,2; root = min = 1.
    // Hand trace of B.10.2 (bit 0 = "node value exceeds current lower
    // bound, raise it"; bit 1 = "node value reached, known"):
    //  leaf(0,0) v=1: t=1 root 0 | t=2 root 1, leaf 1      -> 0 1 1
    //  leaf(1,0) v=3: t=2 leaf 0 | t=3 leaf 0 | t=4 leaf 1 -> 0 0 1
    //  leaf(0,1) v=2: t=2 leaf 0 | t=3 leaf 1              -> 0 1
    //  leaf(1,1) v=2: same                                 -> 0 1
    // bits 0110 0101 01 -> bytes 0x65, 0x40 (zero-padded)
    val leaves = Array(1, 3, 2, 2)
    val enc = Jpeg2k.tagTreeEncodeAll(2, 2, leaves)
    assert(enc.map(b => f"${b & 0xFF}%02X").mkString(" ") === "65 40")
    assert(Jpeg2k.tagTreeDecodeAll(2, 2, enc).toSeq === leaves.toSeq)
  }

  test("tag tree encode/decode round-trips random grids") {
    val rnd = new scala.util.Random(19)
    for (_ <- 0 until 40) {
      val w = 1 + rnd.nextInt(7); val h = 1 + rnd.nextInt(7)
      val leaves = Array.fill(w * h)(rnd.nextInt(12))
      val enc = Jpeg2k.tagTreeEncodeAll(w, h, leaves)
      assert(Jpeg2k.tagTreeDecodeAll(w, h, enc).toSeq === leaves.toSeq,
        s"${w}x$h ${leaves.mkString(",")}")
    }
  }

  test("MQ coder matches the published ITU-T T.88 Annex H.2 vector") {
    // ITU-T T.88 Annex H.2 test input (256 decisions, MSB-first), the
    // published conformance sequence for the shared JBIG2/JPEG2000 MQ
    // coder, driven through one context starting at (index 0, MPS 0).
    // This is the externally-produced vector that rules out a mutually-
    // inverse-but-non-conformant coder: the expected bytes come from the
    // standard, not from this implementation.
    val input = Array(
      0x00, 0x02, 0x00, 0x51, 0x00, 0x00, 0x00, 0xC0,
      0x03, 0x52, 0x87, 0x2A, 0xAA, 0xAA, 0xAA, 0xAA,
      0x82, 0xC0, 0x20, 0x00, 0xFC, 0xD7, 0x9E, 0xF6,
      0xBF, 0x7F, 0xED, 0x90, 0x4F, 0x46, 0xA3, 0xBF)
    // Published encoder output (30 bytes). Our flush drops the trailing
    // 0xFF per the Annex C optional-truncation note ("a trailing 0xFF is
    // dropped; the decoder synthesizes 1-bits"), so the encoder emits
    // the first 28 bytes and the decoder must accept both forms.
    val published = Array(
      0x84, 0xC7, 0x3B, 0xFC, 0xE1, 0xA1, 0x43, 0x04,
      0x02, 0x20, 0x00, 0x00, 0x41, 0x0D, 0xBB, 0x86,
      0xF4, 0x31, 0x7F, 0xFF, 0x88, 0xFF, 0x37, 0x47,
      0x1A, 0xDB, 0x6A, 0xDF, 0xFF, 0xAC).map(_.toByte)
    val bits = input.flatMap(b => (7 to 0 by -1).map(k => (b >> k) & 1))
    val enc = Jpeg2k.mqEncodeRaw(bits)
    assert(enc.toSeq === published.take(28).toSeq,
      "encoder bytes diverge from T.88 H.2")
    // decoder side: both the elided form and the full published bytes
    assert(Jpeg2k.mqDecodeRaw(enc, bits.length).toSeq === bits.toSeq)
    assert(Jpeg2k.mqDecodeRaw(published, bits.length).toSeq === bits.toSeq)
  }

  test("subset walls reject loudly with the workaround named") {
    val good = Jpeg2k.encode(Array.tabulate(64)(_.toLong), 8, 8, 6)
    // flip the transform byte (5/3 -> 9/7) inside COD: SOC(2) SIZ(2+41)
    // COD starts at 45: marker(2) Lcod(2) Scod(1) prog(1) layers(2)
    // MCT(1) NL(1) cbw(1) cbh(1) style(1) transform at offset 45+13
    val bad97 = good.clone()
    assert((bad97(45 + 13) & 0xFF) === 1)
    bad97(45 + 13) = 0
    val e1 = intercept[IllegalArgumentException] { Jpeg2k.decode(bad97) }
    assert(e1.getMessage.contains("wgrib2"))
    // not a codestream at all
    val e2 = intercept[IllegalArgumentException] {
      Jpeg2k.decode("plainly not jpeg2000".getBytes)
    }
    assert(e2.getMessage.contains("SOC"))
    // multi-layer declared
    val badLayers = good.clone()
    // layers field: COD at 45, SGcod layers = bytes 45+6..45+7 (BE u16)
    assert((badLayers(45 + 7) & 0xFF) === 1)
    badLayers(45 + 7) = 2
    val e3 = intercept[IllegalArgumentException] { Jpeg2k.decode(badLayers) }
    assert(e3.getMessage.contains("layer"))
    // encoder range guard
    intercept[IllegalArgumentException] {
      Jpeg2k.encode(Array(4L), 1, 1, depth = 2) // 4 outside 2-bit range
    }
  }
}
