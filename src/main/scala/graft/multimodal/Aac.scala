package graft.multimodal

/** Pure-JVM ADTS (AAC transport) frame-header walk (ISO/IEC 14496-3):
  * no sample synthesis, but REAL stream facts — frame count, sample
  * rate, channel configuration and exact duration from the frame
  * sequence (1024 samples per raw data block). Mirrors [[Mp3]]: the
  * remaining audio stand-in shrinks to waveform-level features only
  * (rms / zero crossings need filterbank synthesis, which stays a
  * documented byte-derived stand-in).
  *
  * Accepts an optional leading ID3v2 tag; requires at least two
  * consecutive consistent frames so arbitrary binary payloads don't
  * probe as ADTS.
  */
object Aac {

  final case class AacInfo(sampleRate: Int, channels: Int, nFrames: Int,
                           durationMs: Long, meanFrameBytes: Double)

  // sampling_frequency_index → Hz (index 13/14 reserved, 15 escape)
  private val Rates = Array(96000, 88200, 64000, 48000, 44100, 32000, 24000,
    22050, 16000, 12000, 11025, 8000, 7350, -1, -1, -1)

  def probe(bytes: Array[Byte]): Option[AacInfo] = {
    var pos = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      pos = 10 + size + (if ((bytes(5) & 0x10) != 0) 10 else 0)
    }
    var nFrames = 0
    var totalSamples = 0L
    var totalBytes = 0L
    var rate = -1
    var channels = -1
    var ok = true
    while (ok && pos + 7 <= bytes.length) {
      val b1 = bytes(pos) & 0xFF
      val b2 = bytes(pos + 1) & 0xFF
      // syncword FFF + layer 00; protection_absent is bit 0 of byte 1
      if (b1 != 0xFF || (b2 & 0xF6) != 0xF0) ok = false
      else {
        val b3 = bytes(pos + 2) & 0xFF
        val rIdx = (b3 >> 2) & 0xF
        val sr = Rates(rIdx)
        val b4 = bytes(pos + 3) & 0xFF
        val chanCfg = ((b3 & 0x1) << 2) | ((b4 >> 6) & 0x3)
        val b5 = bytes(pos + 4) & 0xFF
        val b6 = bytes(pos + 5) & 0xFF
        val frameLen = ((b4 & 0x3) << 11) | (b5 << 3) | ((b6 >> 5) & 0x7)
        val b7 = bytes(pos + 6) & 0xFF
        val rawBlocks = (b7 & 0x3) + 1
        if (sr <= 0 || chanCfg == 0 || frameLen < 7 ||
            pos + frameLen > bytes.length) ok = false
        else {
          if (rate == -1) {
            rate = sr
            channels = if (chanCfg == 7) 8 else chanCfg
          }
          // a stream switching rate mid-way is not one we trust
          if (sr != rate) ok = false
          else {
            nFrames += 1
            totalSamples += 1024L * rawBlocks
            totalBytes += frameLen
            pos += frameLen
          }
        }
      }
    }
    // trailing junk (ID3v1 etc.) after the last frame is tolerated,
    // matching the Mp3/Flac readers
    if (nFrames < 2 || rate <= 0) None
    else Some(AacInfo(rate, channels, nFrames,
      totalSamples * 1000 / rate, totalBytes.toDouble / nFrames))
  }

  /** Fixture: a structurally valid ADTS stream with the given
    * parameters — correct headers, zeroed raw data blocks. `withCrc`
    * emits protection_absent = 0 frames (9-byte header including the
    * 16-bit CRC field); `rawBlocks` packs several 1024-sample raw data
    * blocks per frame (number_of_raw_data_blocks_in_frame).
    */
  def fixture(nFrames: Int, sampleRateIdx: Int = 4, channels: Int = 2,
              payloadLen: Int = 64, id3: Boolean = false,
              withCrc: Boolean = false, rawBlocks: Int = 1): Array[Byte] = {
    require(rawBlocks >= 1 && rawBlocks <= 4, "1..4 raw data blocks")
    val out = new java.io.ByteArrayOutputStream()
    if (id3) {
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10))
      out.write(new Array[Byte](10))
    }
    val frameLen = (if (withCrc) 9 else 7) + payloadLen
    (0 until nFrames).foreach { _ =>
      val f = new Array[Byte](frameLen)
      f(0) = 0xFF.toByte
      f(1) = (if (withCrc) 0xF0 else 0xF1).toByte // MPEG-4, layer 00
      f(2) = (0x40 | (sampleRateIdx << 2) | ((channels >> 2) & 1)).toByte // AAC-LC
      f(3) = (((channels & 0x3) << 6) | ((frameLen >> 11) & 0x3)).toByte
      f(4) = ((frameLen >> 3) & 0xFF).toByte
      f(5) = (((frameLen & 0x7) << 5) | 0x1F).toByte // buffer fullness hi
      f(6) = (0xFC | (rawBlocks - 1)).toByte // fullness lo + raw blocks − 1
      out.write(f)
    }
    out.toByteArray
  }
}
