package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.source.Ccsds

/** CCSDS 121.0-B extended-Rice coder. The decoder is pinned against
  * HAND-BUILT bitstreams (independent of the encoder: bits assembled
  * from the standard's codeword definitions with hand-computed FS /
  * split / pairing values), then the encoder/decoder pair is fuzzed
  * across the parameter space, option mix asserted.
  */
class CcsdsSpec extends AnyFunSuite {

  /** "0100 1110..." → bytes, zero-padded to a byte boundary. */
  private def bits(s: String): Array[Byte] = {
    val b = s.filter(c => c == '0' || c == '1')
    val padded = b + "0" * ((8 - b.length % 8) % 8)
    padded.grouped(8).map(x => Integer.parseInt(x, 2).toByte).toArray
  }

  test("hand-built k-split block (n=8, J=8, k=1): FS parts then LSBs") {
    // samples 3,1,0,2,7,4,1,5; k=1: FS of v>>1 = 1,0,0,1,3,2,0,2 then
    // the 8 LSBs. ID '010' (k+1).
    val stream = bits("010" + "01 1 1 01 0001 001 1 001" + "11001011")
    assert(stream.toSeq === Seq(0x4E, 0x89, 0x9C, 0xB0).map(_.toByte))
    val p = Ccsds.Params(8, 8, 64, preprocess = false)
    assert(Ccsds.decode(stream, 8, p).toSeq ===
      Seq[Long](3, 1, 0, 2, 7, 4, 1, 5))
  }

  test("hand-built zero-block run then uncompressed block") {
    // 3 zero blocks (ID 000, ext 0, FS(2)) then ID 111 + 8 raw bytes
    val rawBits = (1 to 8).map(i =>
      String.format("%8s", Integer.toBinaryString(i)).replace(' ', '0'))
      .mkString
    val stream = bits("000 0 001" + "111" + rawBits)
    val p = Ccsds.Params(8, 8, 64, preprocess = false)
    val got = Ccsds.decode(stream, 32, p)
    assert(got.take(24).forall(_ == 0L))
    assert(got.drop(24).toSeq === (1L to 8L))
  }

  test("hand-built ROS zero run bounded by the RSI") {
    // rsi=4 blocks of J=4: block 0 uncompressed (7,7,7,7), then ROS
    // (FS value 4) zeroing the remaining 3 blocks of the interval,
    // then the NEXT interval opens with an uncompressed block
    val p = Ccsds.Params(8, 4, 4, preprocess = false)
    val stream = bits(
      "111" + "00000111" * 4 + // block 0
      "000 0 00001" +          // ROS
      "111" + "00000001" * 4)  // next RSI block 0
    val got = Ccsds.decode(stream, 20, p)
    assert(got.take(4).forall(_ == 7L))
    assert(got.slice(4, 16).forall(_ == 0L))
    assert(got.drop(16).forall(_ == 1L))
  }

  test("hand-built second extension (n=8, J=4)") {
    // samples 1,0,2,1 → pairs m = 1 and 7; ID 000 + ext 1
    val stream = bits("000 1" + "01" + "00000001")
    val p = Ccsds.Params(8, 4, 64, preprocess = false)
    assert(Ccsds.decode(stream, 4, p).toSeq === Seq[Long](1, 0, 2, 1))
  }

  test("hand-built preprocessed RSI: reference + mapped deltas") {
    // samples 100,101,99,99 | 103,103,103,103 in ONE rsi of 2 blocks:
    // deltas e=+1,−2,0 map to 2,3,0 (block 1 after the raw reference)
    // and e=+4,0,0,0 to 8,0,0,0 (block 2). k=0 split both: FS codes
    // are the mapped values.
    val stream = bits(
      "001" + "01100100" + "001 0001 1" + // ID k=0, ref=100, FS 2,3,0
      "001" + "000000001 1 1 1")          // ID k=0, FS 8,0,0,0
    val p = Ccsds.Params(8, 4, 2, preprocess = true)
    assert(Ccsds.decode(stream, 8, p).toSeq ===
      Seq[Long](100, 101, 99, 99, 103, 103, 103, 103))
  }

  test("prediction-error mapping at the range clamps") {
    val p = Ccsds.Params(8, 4, 64, preprocess = true)
    for (samples <- Seq(
        Array[Long](0, 200, 255, 55, 0, 255, 128, 127),
        Array[Long](255, 0, 255, 0, 1, 254, 2, 253),
        Array[Long](128, 128, 128, 128, 0, 0, 255, 255))) {
      val enc = Ccsds.encode(samples, p)
      assert(Ccsds.decode(enc, samples.length, p).toSeq === samples.toSeq)
    }
  }

  test("round-trip fuzz across the parameter space") {
    val rnd = new scala.util.Random(1213)
    for (trial <- 0 until 300) {
      val n = Seq(4, 8, 11, 12, 16, 20, 24, 32)(rnd.nextInt(8))
      val j = Seq(8, 16, 32, 64)(rnd.nextInt(4))
      val rsi = 1 + rnd.nextInt(16)
      val pre = rnd.nextBoolean()
      val signed = rnd.nextBoolean()
      val pad = rnd.nextBoolean()
      val p = Ccsds.Params(n, j, rsi, pre, signed, pad)
      val count = 1 + rnd.nextInt(400)
      val span = p.xMax - p.xMin
      // mixed regimes: smooth ramps (small deltas), flat stretches
      // (zero blocks), and noise (splits/uncompressed)
      var cur = p.xMin + math.abs(rnd.nextLong()) % (span + 1)
      val samples = Array.fill(count) {
        rnd.nextInt(4) match {
          case 0 => cur = p.xMin + math.abs(rnd.nextLong()) % (span + 1)
          case 1 => () // hold: flat run
          case _ =>
            val step = rnd.nextInt(7) - 3
            cur = math.max(p.xMin, math.min(p.xMax, cur + step))
        }
        cur
      }
      val enc = Ccsds.encode(samples, p)
      val dec = Ccsds.decode(enc, count, p)
      assert(dec.toSeq === samples.toSeq,
        s"trial $trial n=$n J=$j rsi=$rsi pre=$pre signed=$signed pad=$pad")
    }
  }

  test("all-constant and all-zero inputs compress to zero blocks") {
    val p = Ccsds.Params(16, 16, 8, preprocess = true, padRsi = true)
    val flat = Array.fill(1024)(7777L)
    val enc = Ccsds.encode(flat, p)
    // 8 RSIs: ref sample + a couple of FS bits each, byte-aligned —
    // massively below raw size
    assert(enc.length < 64, s"flat run compressed to ${enc.length} B")
    assert(Ccsds.decode(enc, 1024, p).toSeq === flat.toSeq)
  }

  test("truncated and mis-parameterized streams fail loudly") {
    val p = Ccsds.Params(8, 8, 64, preprocess = false)
    val enc = Ccsds.encode(Array.tabulate(64)(i => (i * 37 % 251).toLong), p)
    val e = intercept[IllegalArgumentException] {
      Ccsds.decode(enc.take(enc.length / 2), 64, p)
    }
    assert(e.getMessage.contains("exhausted"))
    intercept[IllegalArgumentException] {
      Ccsds.decode(Array[Byte](-1, -1), 8, Ccsds.Params(8, 8, 64, true))
    }
  }
}
