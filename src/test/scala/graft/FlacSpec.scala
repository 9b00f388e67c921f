package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Flac, Wav}

/** FLAC codec (RFC 9639 subset): lossless round-trips through our own
  * encoder, plus hand-assembled frames exercising the decode paths the
  * encoder never emits (LPC subframes, stereo decorrelation, escape
  * partitions) — the same craft-the-edge-case strategy as Hdf5EdgeSpec.
  */
class FlacSpec extends AnyFunSuite {

  /** 16-bit quantized expectation for a [-1,1] double input. */
  private def q(samples: Array[Double]): Array[Double] =
    samples.map(s =>
      math.round(math.max(-1.0, math.min(1.0, s)) * 32767) / 32768.0)

  test("round-trip is EXACT at 16 bits: sine, ramp, constant, random") {
    val signals = Seq(
      Array.tabulate(1000)(i => math.sin(i * 0.03) * 0.8),
      Array.tabulate(500)(i => i / 500.0 - 0.5),             // ramp: order-2 wins
      Array.fill(300)(0.25),                                 // constant residuals
      { val rnd = new scala.util.Random(42)                  // incompressible
        Array.fill(777)(rnd.nextDouble() * 2 - 1) })
    for (sig <- signals) {
      val bytes = Flac.write(sig, 22050)
      assert(Flac.isFlac(bytes))
      val pcm = Flac.decode(bytes).get
      assert(pcm.sampleRate === 22050 && pcm.channels === 1)
      assert(pcm.samples.toSeq === q(sig).toSeq) // LOSSLESS, not approx
    }
  }

  test("multi-frame streams (beyond one 4096 block) decode seamlessly") {
    val sig = Array.tabulate(10000)(i => math.sin(i * 0.01) * 0.5)
    val pcm = Flac.decode(Flac.write(sig, 44100)).get
    assert(pcm.samples.length === 10000)
    assert(pcm.samples.toSeq === q(sig).toSeq)
    assert(pcm.durationMs === 10000L * 1000 / 44100)
  }

  test("non-FLAC bytes fall back (None); truncated FLAC fails loudly") {
    assert(Flac.decode("not a flac".getBytes).isEmpty)
    val good = Flac.write(Array.tabulate(100)(_ * 0.001), 8000)
    intercept[Exception] {
      Flac.decode(java.util.Arrays.copyOf(good, good.length - 3))
    }
    // corrupt one payload byte: the frame CRC-16 must catch it
    val bad = good.clone()
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x40).toByte
    intercept[Exception] { Flac.decode(bad) }
  }

  // ---- hand-assembled streams for decoder paths our encoder never emits

  /** STREAMINFO header for hand-built frames. */
  private def streamInfo(blockSize: Int, rate: Int, channels: Int,
                         total: Long): Array[Byte] = {
    val w = new Flac.BitWriter
    w.write(0x80L, 8); w.write(34L, 24)
    w.write(blockSize.toLong, 16); w.write(blockSize.toLong, 16)
    w.write(0L, 24); w.write(0L, 24)
    w.write(rate.toLong, 20)
    w.write((channels - 1).toLong, 3)
    w.write(15L, 5) // 16 bps
    w.write(total, 36)
    (0 until 16).foreach(_ => w.write(0L, 8))
    w.toBytes
  }

  private def frameHeader(blockSize: Int, chAsn: Int): Flac.BitWriter = {
    val w = new Flac.BitWriter
    w.write(0x3FFE, 14); w.write(0, 1); w.write(0, 1)
    w.write(7, 4)          // blocksize: 16-bit at end
    w.write(0, 4)          // rate from STREAMINFO
    w.write(chAsn.toLong, 4)
    w.write(4, 3)          // 16-bit samples
    w.write(0, 1)
    w.write(0, 8)          // frame number 0 (utf8 1-byte)
    w.write((blockSize - 1).toLong, 16)
    w
  }

  private def sealFrame(w: Flac.BitWriter): Array[Byte] = {
    w.alignToByte()
    val body = w.toBytes
    val out = new Flac.BitWriter
    body.foreach(b => out.write(b & 0xFFL, 8))
    out.write(Flac.crc16(body, 0, body.length).toLong, 16)
    out.toBytes
  }

  private def withHeaderCrc(w: Flac.BitWriter): Flac.BitWriter = {
    val head = w.toBytes
    val out = new Flac.BitWriter
    head.foreach(b => out.write(b & 0xFFL, 8))
    out.write(Flac.crc8(head, 0, head.length).toLong, 8)
    out
  }

  private def writeVerbatim(w: Flac.BitWriter, samples: Seq[Long]): Unit = {
    w.write(0, 1); w.write(1, 6); w.write(0, 1) // VERBATIM, no wasted bits
    samples.foreach(s => w.write(s & 0xFFFFL, 16))
  }

  test("LPC subframe: order-2 predictor with shift reconstructs exactly") {
    // samples follow s(i) = (3*s(i-1) - 1*s(i-2)) >> 1 + residual; pick
    // residuals, derive samples, hand-encode, decode must return samples
    val n = 16
    val res = Array.tabulate(n - 2)(i => (i % 5 - 2).toLong)
    val s = new Array[Long](n)
    s(0) = 100; s(1) = 103
    for (i <- 2 until n)
      s(i) = ((3 * s(i - 1) - s(i - 2)) >> 1) + res(i - 2)
    val w = frameHeader(n, chAsn = 0)
    val w2 = withHeaderCrc(w)
    w2.write(0, 1)
    w2.write(0x20L | (2 - 1).toLong, 6) // LPC, order 2
    w2.write(0, 1)
    w2.write(s(0) & 0xFFFFL, 16); w2.write(s(1) & 0xFFFFL, 16) // warmup
    w2.write((4 - 1).toLong, 4)   // 4-bit coefficient precision
    w2.write(1L, 5)               // shift 1
    w2.write(3L & 0xFL, 4); w2.write(-1L & 0xFL, 4) // coefs [3, -1]
    w2.write(0, 2); w2.write(0, 4); w2.write(2L, 4) // rice: po=0, param=2
    res.foreach { v =>
      val z = (v << 1) ^ (v >> 63)
      var i = 0; while (i < (z >>> 2)) { w2.write(0, 1); i += 1 }; w2.write(1, 1)
      w2.write(z & 3, 2)
    }
    val stream = Array[Byte]('f', 'L', 'a', 'C') ++
      streamInfo(n, 8000, 1, n.toLong) ++ sealFrame(w2)
    val pcm = Flac.decode(stream).get
    assert(pcm.samples.toSeq === s.map(_.toDouble / 32768.0).toSeq)
  }

  test("stereo decorrelation: left/side, right/side and mid/side all " +
    "reconstruct the channel pair (RFC 9639 §9.2.1)") {
    val n = 8
    val left = Array.tabulate(n)(i => (i * 7 - 20).toLong)
    val right = Array.tabulate(n)(i => (i * 3 + 5).toLong)
    val side = Array.tabulate(n)(i => left(i) - right(i))
    val mid = Array.tabulate(n)(i => (left(i) + right(i)) >> 1)
    def verbatimSide(w: Flac.BitWriter, samples: Seq[Long]): Unit = {
      w.write(0, 1); w.write(1, 6); w.write(0, 1)
      samples.foreach(s => w.write(s & 0x1FFFFL, 17)) // side: bps + 1
    }
    val expect = Array.tabulate(n)(i => (left(i) + right(i)).toDouble / 2 / 32768.0)
    // chAsn 8 = left/side; 9 = side/right; 10 = mid/side
    val variants = Seq(
      (8, (w: Flac.BitWriter) => { writeVerbatim(w, left); verbatimSide(w, side) }),
      (9, (w: Flac.BitWriter) => { verbatimSide(w, side); writeVerbatim(w, right) }),
      (10, (w: Flac.BitWriter) => { writeVerbatim(w, mid); verbatimSide(w, side) }))
    for ((chAsn, writeChans) <- variants) {
      val w2 = withHeaderCrc(frameHeader(n, chAsn))
      writeChans(w2)
      val stream = Array[Byte]('f', 'L', 'a', 'C') ++
        streamInfo(n, 8000, 2, n.toLong) ++ sealFrame(w2)
      val pcm = Flac.decode(stream).get
      assert(pcm.channels === 2)
      assert(pcm.samples.toSeq === expect.toSeq, s"chAsn $chAsn")
    }
  }

  test("escape partition: raw-bit residuals decode (param 0b1111 → 5-bit " +
    "raw width)") {
    val n = 8
    val s = Array.tabulate(n)(i => (i * 11 - 40).toLong)
    val w2 = withHeaderCrc(frameHeader(n, chAsn = 0))
    w2.write(0, 1); w2.write(0x08L | 1L, 6); w2.write(0, 1) // FIXED order 1
    w2.write(s(0) & 0xFFFFL, 16)
    w2.write(0, 2); w2.write(0, 4)
    w2.write(0xFL, 4)  // escape
    w2.write(7L, 5)    // 7-bit raw residuals
    (1 until n).foreach(i => w2.write((s(i) - s(i - 1)) & 0x7FL, 7))
    val stream = Array[Byte]('f', 'L', 'a', 'C') ++
      streamInfo(n, 8000, 1, n.toLong) ++ sealFrame(w2)
    assert(Flac.decode(stream).get.samples.toSeq ===
      s.map(_.toDouble / 32768.0).toSeq)
  }

  test("audioFeatures: FLAC payloads produce the same features as the " +
    "identical WAV payload (shared Pcm contract)") {
    val sig = Array.tabulate(2000)(i => math.sin(i * 0.05) * 0.6)
    val wavPcm = Wav.decode(Wav.write(sig, 16000)).get
    val flacPcm = Flac.decode(Flac.write(sig, 16000)).get
    assert(flacPcm.samples.toSeq === wavPcm.samples.toSeq)
    assert(flacPcm.durationMs === wavPcm.durationMs)
  }
}
