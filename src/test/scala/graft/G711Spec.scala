package graft

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Wav

/** G.711 µ-law / A-law expansion against an INDEPENDENT compressor
  * written here from the segmented-companding definition (sign + 3-bit
  * segment + 4-bit mantissa over 14-/13-bit linear domains): a correct
  * expander must return every code's quantization-cell midpoint, so
  * compress(expand(code)) == code for all 256 codes of both laws.
  * Plus the decoder's new WAV format branches (float PCM, G.711,
  * WAVE_FORMAT_EXTENSIBLE headers).
  */
class G711Spec extends AnyFunSuite {

  /** Independent µ-law compressor (16-bit linear in, inverted code out). */
  private def mulawEncode(x16: Int): Int = {
    val sign = if (x16 < 0) 0x80 else 0
    var mag = math.min(math.abs(x16) >> 2, 8158) + 33 // 14-bit domain + bias
    var exp = 0
    while (mag >= (64 << exp) && exp < 7) exp += 1 // segment search
    val mant = (mag >> (exp + 1)) & 0xF
    ~(sign | (exp << 4) | mant) & 0xFF
  }

  /** Independent A-law compressor (16-bit linear in; sign bit SET =
    * positive; even bits inverted by the 0x55 mask).
    */
  private def alawEncode(x16: Int): Int = {
    val sign = if (x16 >= 0) 0x80 else 0
    var mag = math.min(math.abs(x16) >> 3, 4095) // 13-bit domain
    val (exp, mant) =
      if (mag < 32) (0, mag >> 1)
      else {
        var e = 1
        while (mag >= (32 << e) && e < 7) e += 1
        (e, (mag >> e) & 0xF)
      }
    (sign | (exp << 4) | mant) ^ 0x55
  }

  test("µ-law: expand hits every quantization-cell midpoint — " +
    "compress(expand(c)) == c for all 256 codes; expansion is odd and " +
    "monotone per sign") {
    for (c <- 0 until 256) {
      val lin = Wav.mulawToLinear(c.toByte)
      // µ-law has a ±0 pair: the −0 code (0x7F) expands to 0, which a
      // compressor canonically emits as +0 (0xFF)
      val expected = if (c == 0x7F) 0xFF else c
      assert(mulawEncode(lin) === expected, s"code $c -> $lin")
    }
    // magnitude range: ±(8031<<2); code 0xFF (all-inverted 0) is +0
    assert(Wav.mulawToLinear(0xFF.toByte) === 0)
    assert(Wav.mulawToLinear(0x80.toByte) === 8031 << 2) // max positive
    assert(Wav.mulawToLinear(0x00.toByte) === -(8031 << 2))
    // positive codes carry the transmitted 0x80 bit; 0x80 is the max
    // cell and 0xFF is +0, so expansion descends strictly over them
    val pos = (0 until 128).map(c => Wav.mulawToLinear((0x80 | c).toByte))
    assert(pos === pos.sorted.reverse, "positive half must be monotone")
    assert(pos.distinct.size === 128)
  }

  test("A-law: compress(expand(c)) == c for all 256 codes; extremes " +
    "and zero cell land where G.711 puts them") {
    for (c <- 0 until 256) {
      val lin = Wav.alawToLinear(c.toByte)
      assert(alawEncode(lin) === c, s"code $c -> $lin")
    }
    // smallest cells are ±8 (13-bit ±1, ×8); largest ±(4032<<3).
    // A-law sign bit SET (after the 0x55 unmask) means POSITIVE.
    assert(Wav.alawToLinear(0x55.toByte) === -8) // code 0x55 = raw 0x00
    assert(Wav.alawToLinear(0xD5.toByte) === 8)  // raw 0x80 = +0 cell
    assert(Wav.alawToLinear(0xAA.toByte) === (4032 << 3)) // raw 0xFF
    assert(Wav.alawToLinear(0x2A.toByte) === -(4032 << 3)) // raw 0x7F
  }

  test("expansion error is bounded by half the segment step across a " +
    "linear sweep (both laws)") {
    for (x <- -32000 to 32000 by 97) {
      val mu = Wav.mulawToLinear(mulawEncode(x).toByte)
      // µ-law segment step at |x|: 8·2^exp in the 16-bit domain
      val magB = math.min(math.abs(x) >> 2, 8158) + 33
      var e = 0; while (magB >= (64 << e) && e < 7) e += 1
      assert(math.abs(mu - x) <= (4 << e) + 4, s"mu x=$x -> $mu")
      val al = Wav.alawToLinear(alawEncode(x).toByte)
      val mag13 = math.min(math.abs(x) >> 3, 4095)
      var ea = 0; while (mag13 >= (32 << math.max(ea, 1)) && ea < 7) ea += 1
      assert(math.abs(al - x) <= (8 << math.max(ea, 1)) + 8, s"al x=$x -> $al")
    }
  }

  private def wavFile(format: Int, bits: Int, rate: Int,
                      payload: Array[Byte],
                      extensible: Boolean = false): Array[Byte] = {
    val fmtSize = if (extensible) 40 else 16
    val total = 12 + 8 + fmtSize + 8 + payload.length
    val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(total - 8); b.put("WAVE".getBytes)
    b.put("fmt ".getBytes); b.putInt(fmtSize)
    b.putShort((if (extensible) 0xFFFE else format).toShort)
    b.putShort(1); b.putInt(rate)
    b.putInt(rate * bits / 8); b.putShort((bits / 8).toShort)
    b.putShort(bits.toShort)
    if (extensible) {
      b.putShort(22); b.putShort(bits.toShort); b.putInt(0x4) // front-center
      b.putShort(format.toShort); b.putShort(0)
      // the fixed GUID tail 00-00-10-00-80-00-00-AA-00-38-9B-71
      b.put(Array[Byte](0x00, 0x00, 0x10, 0x00, 0x80.toByte, 0x00, 0x00,
        0xAA.toByte, 0x00, 0x38, 0x9B.toByte, 0x71))
    }
    b.put("data".getBytes); b.putInt(payload.length); b.put(payload)
    b.array()
  }

  test("WAV format 7 (µ-law) and 6 (A-law) decode through Wav.decode " +
    "with 16-bit-scale normalization") {
    val codes = Array[Byte](0xFF.toByte, 0x80.toByte, 0x00, 0x7F)
    val Some(pcm) = Wav.decode(wavFile(7, 8, 8000, codes))
    assert(pcm.sampleRate === 8000 && pcm.samples.length === 4)
    assert(pcm.samples(0) === 0.0)
    assert(math.abs(pcm.samples(1) - (8031 << 2) / 32768.0) < 1e-12)
    assert(pcm.samples(2) < 0 && math.abs(pcm.samples(3)) < 1e-3)
    val acodes = Array[Byte](0xD5.toByte, 0xAA.toByte, 0x2A, 0x55)
    val Some(ap) = Wav.decode(wavFile(6, 8, 8000, acodes))
    assert(math.abs(ap.samples(0) - 8 / 32768.0) < 1e-12)
    assert(math.abs(ap.samples(1) - (4032 << 3) / 32768.0) < 1e-12)
    assert(ap.samples(2) < 0 && ap.samples(3) < 0)
  }

  test("WAV format 3 (IEEE float) and WAVE_FORMAT_EXTENSIBLE headers " +
    "decode; unknown codecs still return None") {
    val f = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    Seq(0.25f, -0.5f, 1.0f).foreach(f.putFloat)
    val Some(fp) = Wav.decode(wavFile(3, 32, 44100, f.array()))
    assert(fp.samples.toSeq === Seq(0.25, -0.5, 1.0))
    // extensible wrapper resolving to µ-law
    val Some(xp) = Wav.decode(wavFile(7, 8, 8000,
      Array[Byte](0xFF.toByte, 0x80.toByte), extensible = true))
    assert(xp.samples(0) === 0.0 && xp.samples(1) > 0.9)
    // ADPCM (format 2) stays undecoded rather than mis-decoded
    assert(Wav.decode(wavFile(2, 4, 8000, Array[Byte](1, 2, 3, 4))).isEmpty)
  }
}
