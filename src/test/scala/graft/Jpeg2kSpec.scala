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
