package graft.multimodal

/** Pure-JVM MPEG audio frame-header walk (ISO/IEC 11172-3): no sample
  * synthesis, but REAL stream facts — frame count, sample rate,
  * channel mode and exact duration from the frame sequence, plus the
  * FULL Layer III side-info walk per (granule, channel): global_gain
  * (energy proxy), scalefac_compress (scalefactor bit budget), the
  * window-switching branch with block_type (short blocks mark
  * transients — an audio-content signal) and subblock_gain, all
  * readable without Huffman decoding. This shrinks the audio stand-in
  * for lossy formats: duration, energy and transient density come
  * from the actual bitstream; only waveform-level features (zero
  * crossings) remain stubbed.
  *
  * Why PCM synthesis stays out (deliberately, not as debt): full Layer
  * III decode needs the Annex B.7 Huffman code tables — ~600 entries of
  * ARBITRARY optimized code data, not derivable from structure. The
  * from-spec codecs this engine does ship (CCSDS Rice, FLAC, JPEG 2000)
  * are algorithmic: a mis-implementation breaks their own round-trip or
  * hand-computed pins. A mis-transcribed Huffman table has NO such
  * self-check — our encoder and decoder would agree with each other and
  * silently emit wrong PCM for every real-world stream, the exact
  * failure mode the video stub gate exists to prevent. CLOSED as
  * formally out-of-scope (r13, SURVEY §2.14): the only sound closure
  * would be an externally-produced PCM oracle (an independent
  * decoder's dumped samples for a fixture stream, the FLAC pattern),
  * and this environment ships no independent MPEG audio decoder and
  * has zero egress to obtain a dump — so the self-check cannot exist
  * here. The header/side-info walk below plus the loud byte-stand-in
  * path IS the complete supported mp3 contract; re-entry condition is
  * a trusted PCM dump fixture.
  *
  * Accepts an optional leading ID3v2 tag and trailing junk (ID3v1);
  * requires at least two consecutive consistent frames so arbitrary
  * binary payloads don't probe as mp3.
  */
object Mp3 {

  final case class Mp3Info(sampleRate: Int, channels: Int, nFrames: Int,
                           durationMs: Long, bitrateKbps: Int,
                           meanGlobalGain: Double,
                           meanScalefacCompress: Double,
                           shortBlockFrac: Double)

  // Layer III bitrates (kbps) by version; index 0 = free, 15 = bad
  private val BitrateV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320, -1)
  private val BitrateV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 144, 160, -1)
  private val RateV1 = Array(44100, 48000, 32000, -1)
  private val RateV2 = Array(22050, 24000, 16000, -1)
  private val RateV25 = Array(11025, 12000, 8000, -1)

  def probe(bytes: Array[Byte]): Option[Mp3Info] = {
    var pos = 0
    // ID3v2: "ID3" + version(2) + flags(1) + syncsafe size(4); the
    // size excludes the header and — flags bit 4 — the v2.4 footer
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      pos = 10 + size + (if ((bytes(5) & 0x10) != 0) 10 else 0)
    }
    var nFrames = 0
    var totalSamples = 0L
    var rate = -1
    var channels = -1
    var bitrateSum = 0L
    var gainSum = 0L
    var gainCount = 0L
    var sfcSum = 0L
    var shortCount = 0L
    var ok = true
    while (ok && pos + 4 <= bytes.length) {
      val b1 = bytes(pos) & 0xFF
      val b2 = bytes(pos + 1) & 0xFF
      if (b1 != 0xFF || (b2 & 0xE0) != 0xE0) ok = false
      else {
        val version = (b2 >> 3) & 0x3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        val layer = (b2 >> 1) & 0x3   // 1=III, 2=II, 3=I
        val crcAbsent = (b2 & 0x1) == 1
        val b3 = bytes(pos + 2) & 0xFF
        val brIdx = (b3 >> 4) & 0xF
        val rIdx = (b3 >> 2) & 0x3
        val padding = (b3 >> 1) & 0x1
        val b4 = bytes(pos + 3) & 0xFF
        val mode = (b4 >> 6) & 0x3 // 3 = mono
        if (version == 1 || layer != 1 || brIdx == 0 || brIdx == 15 ||
            rIdx == 3) ok = false // free-form / reserved / non-L3: stop
        else {
          val mpeg1 = version == 3
          val br = (if (mpeg1) BitrateV1 else BitrateV2)(brIdx)
          val sr = (version match {
            case 3 => RateV1
            case 2 => RateV2
            case _ => RateV25
          })(rIdx)
          if (rate == -1) { rate = sr; channels = if (mode == 3) 1 else 2 }
          // a stream switching rate/version mid-way is not one we trust
          if (sr != rate) ok = false
          else {
            val frameLen =
              (if (mpeg1) 144 else 72) * br * 1000 / sr + padding
            if (pos + frameLen > bytes.length) ok = false
            else {
              // Layer III side info (MPEG1 only): fixed 59-bit blocks
              // per (granule, channel) after main_data_begin(9) +
              // private bits + scfsi — walked field by field:
              // part2_3_length(12) big_values(9) global_gain(8)
              // scalefac_compress(4) windows_switching(1), then either
              // block_type(2) mixed(1) table_select(2x5)
              // subblock_gain(3x3) or table_select(3x5) region0(4)
              // region1(3); preflag/scalefac_scale/count1table(3)
              if (mpeg1) {
                val si = pos + 4 + (if (crcAbsent) 0 else 2)
                val nch = if (mode == 3) 1 else 2
                val br2 = new BitReader(bytes, si)
                br2.skip(9 + (if (nch == 1) 5 else 3) + 4 * nch)
                var g = 0
                while (g < 2 * nch) {
                  br2.skip(12 + 9)       // part2_3_length + big_values
                  gainSum += br2.read(8) // global_gain
                  sfcSum += br2.read(4)  // scalefac_compress
                  if (br2.read(1) == 1) { // windows_switching_flag
                    if (br2.read(2) == 2) shortCount += 1 // block_type
                    br2.skip(1 + 10 + 9) // mixed + tables + subblock_gain
                  } else br2.skip(15 + 4 + 3) // tables + region counts
                  br2.skip(3) // preflag + scalefac_scale + count1table
                  gainCount += 1
                  g += 1
                }
              }
              nFrames += 1
              totalSamples += (if (mpeg1) 1152 else 576)
              bitrateSum += br
              pos += frameLen
            }
          }
        }
      }
    }
    if (nFrames < 2 || rate <= 0) None
    else Some(Mp3Info(rate, channels, nFrames,
      totalSamples * 1000 / rate,
      (bitrateSum / nFrames).toInt,
      if (gainCount == 0) 0.0 else gainSum.toDouble / gainCount,
      if (gainCount == 0) 0.0 else sfcSum.toDouble / gainCount,
      if (gainCount == 0) 0.0 else shortCount.toDouble / gainCount))
  }

  /** MSB-first bit cursor over the side-info bytes (reads past EOF as
    * zeros — the frame-length check already bounds real streams).
    */
  private final class BitReader(bytes: Array[Byte], base: Int) {
    private var bit = 0
    def skip(n: Int): Unit = bit += n
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = bit + i
        val at = base + b / 8
        val x = if (at < bytes.length) bytes(at) & 0xFF else 0
        v = (v << 1) | ((x >> (7 - b % 8)) & 1)
        i += 1
      }
      bit += n
      v
    }
  }

  /** Fixture: an MPEG-2 Layer III 22.05 kHz / 64 kbps mono stream —
    * the low-rate voice-archive shape (576 samples per frame, the V2
    * bitrate table, no MPEG1 side-info walk).
    */
  def fixtureV2(nFrames: Int): Array[Byte] = {
    val frameLen = 72 * 64000 / 22050 // 208, no padding
    val out = new java.io.ByteArrayOutputStream()
    (0 until nFrames).foreach { _ =>
      val f = new Array[Byte](frameLen)
      f(0) = 0xFF.toByte; f(1) = 0xF3.toByte // MPEG2 (version 10), L3, no CRC
      f(2) = 0x80.toByte                     // 64 kbps (V2 idx 8), 22050
      f(3) = 0xC0.toByte                     // mono
      out.write(f)
    }
    out.toByteArray
  }

  /** Fixture: a stereo MPEG1 Layer III 44.1 kHz / 128 kbps frame
    * stream with the given side-info fields — structurally valid
    * headers + side info, zeroed main data (silence). Granules with
    * index < `shortGranules` (of the 4 per frame) carry the
    * window-switching branch with block_type 2 (short blocks), the
    * rest the long-block branch, so the probe's branch walk and the
    * short-block fraction are pinned by construction.
    */
  def fixture(nFrames: Int, globalGain: Int, id3: Boolean = false,
              scalefacCompress: Int = 0,
              shortGranules: Int = 0): Array[Byte] = {
    require(shortGranules >= 0 && shortGranules <= 4, "4 granule slots")
    val frameLen = 144 * 128000 / 44100 // 417, no padding
    val out = new java.io.ByteArrayOutputStream()
    if (id3) {
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10))
      out.write(new Array[Byte](10))
    }
    (0 until nFrames).foreach { _ =>
      val f = new Array[Byte](frameLen)
      f(0) = 0xFF.toByte; f(1) = 0xFB.toByte // MPEG1 L3, no CRC
      f(2) = 0x90.toByte                     // 128 kbps, 44100, no pad
      f(3) = 0x00                            // stereo
      def set(bit: Int, width: Int, value: Int): Unit =
        (0 until width).foreach { i =>
          val b = (value >> (width - 1 - i)) & 1
          val at = 4 + (bit + i) / 8
          f(at) = (f(at) | (b << (7 - (bit + i) % 8))).toByte
        }
      val head = 9 + 3 + 8 // main_data_begin + private + scfsi (stereo)
      (0 until 4).foreach { g =>
        val base = head + g * 59
        set(base + 21, 8, globalGain)       // global_gain
        set(base + 29, 4, scalefacCompress) // scalefac_compress
        if (g < shortGranules) {
          set(base + 33, 1, 1)              // windows_switching_flag
          set(base + 34, 2, 2)              // block_type: short
        }
      }
      out.write(f)
    }
    out.toByteArray
  }
}
