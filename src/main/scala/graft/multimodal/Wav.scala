package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** RIFF/WAVE PCM codec, pure JVM — WAV needs no external codec, so the
  * audio leg of the multimodal pipeline decodes it for REAL (rms /
  * zero-crossings / duration from actual samples); only compressed
  * formats remain stubbed in this container.
  *
  * Supported: canonical RIFF little-endian layout; `fmt ` chunks of
  * integer PCM (format 1, 8/16-bit), IEEE-float PCM (format 3, 32/64),
  * G.711 µ-law (7) and A-law (6) via the ITU-T segmented expanders,
  * and WAVE_FORMAT_EXTENSIBLE (0xFFFE) headers resolved through the
  * SubFormat GUID; any channel count (mixed to mono by averaging),
  * arbitrary extra chunks skipped. Returns None for anything else
  * (ADPCM et al.) so callers can fall back.
  */
object Wav {

  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Double]) {
    def durationMs: Long =
      if (sampleRate <= 0) 0L else samples.length * 1000L / sampleRate
  }

  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  def decode(bytes: Array[Byte]): Option[Pcm] = {
    if (!isWav(bytes)) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    b.position(12)
    var fmt: Option[(Int, Int, Int, Int)] = None // format, channels, rate, bits
    var data: Option[(Int, Int)] = None          // offset, length
    while (b.remaining() >= 8) {
      val id = new Array[Byte](4); b.get(id)
      val size = b.getInt()
      val start = b.position()
      new String(id, java.nio.charset.StandardCharsets.US_ASCII) match {
        case "fmt " if size >= 16 =>
          var format = b.getShort() & 0xFFFF
          val channels = b.getShort() & 0xFFFF
          val rate = b.getInt()
          b.getInt(); b.getShort() // byte rate + block align
          val bits = b.getShort() & 0xFFFF
          // WAVE_FORMAT_EXTENSIBLE: the real codec is the first word of
          // the SubFormat GUID (cbSize(2) validBits(2) mask(4) GUID(16))
          if (format == 0xFFFE && size >= 40) {
            b.getShort(); b.getShort(); b.getInt()
            format = b.getShort() & 0xFFFF
          }
          fmt = Some((format, channels, rate, bits))
        case "data" =>
          data = Some((start, math.min(size, bytes.length - start)))
        case _ => ()
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      b.position(math.min(start + size + (size & 1), bytes.length))
    }
    for {
      (format, channels, rate, bits) <- fmt
      if channels > 0 && rate > 0 && (format match {
        case 1 => bits == 8 || bits == 16 // integer PCM
        case 3 => bits == 32 || bits == 64 // IEEE float
        case 6 | 7 => bits == 8 // G.711 A-law / µ-law
        case _ => false
      })
      (off, len) <- data
    } yield {
      val bytesPerSample = bits / 8
      val frames = len / (bytesPerSample * channels)
      val mono = new Array[Double](frames)
      val d = ByteBuffer.wrap(bytes, off, len).order(ByteOrder.LITTLE_ENDIAN)
      def sample(): Double = format match {
        case 1 if bits == 16 => d.getShort() / 32768.0
        case 1 => ((d.get() & 0xFF) - 128) / 128.0 // 8-bit WAV is unsigned
        case 3 if bits == 32 => d.getFloat().toDouble
        case 3 => d.getDouble()
        case 6 => alawToLinear(d.get()) / 32768.0
        case 7 => mulawToLinear(d.get()) / 32768.0
      }
      var i = 0
      while (i < frames) {
        var acc = 0.0
        var c = 0
        while (c < channels) { acc += sample(); c += 1 }
        mono(i) = acc / channels
        i += 1
      }
      Pcm(rate, channels, mono)
    }
  }

  /** ITU-T G.711 µ-law expansion: 8-bit code → 16-bit-scaled linear.
    * Codes transmit bit-inverted; the segmented expander recovers the
    * quantization-cell midpoint (((2·mant + 33) << exp) − 33) · 4.
    */
  def mulawToLinear(code: Byte): Int = {
    val u = ~code & 0xFF
    val exp = (u >> 4) & 0x7
    val mant = u & 0xF
    val mag = ((((mant << 1) + 33) << exp) - 33) << 2
    if ((u & 0x80) != 0) -mag else mag
  }

  /** ITU-T G.711 A-law expansion (codes transmit with even bits
    * inverted, the 0x55 mask); sign bit SET means positive.
    */
  def alawToLinear(code: Byte): Int = {
    val a = (code ^ 0x55) & 0xFF
    val exp = (a >> 4) & 0x7
    val mant = a & 0xF
    val mag =
      if (exp == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (exp - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  /** Canonical 16-bit mono PCM writer (fixture generation + the resize/
    * re-encode leg of the pipeline). Samples clipped to [-1, 1].
    */
  def write(samples: Array[Double], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(36 + dataLen); out.put("WAVE".getBytes)
    out.put("fmt ".getBytes); out.putInt(16)
    out.putShort(1); out.putShort(1) // PCM, mono
    out.putInt(sampleRate); out.putInt(sampleRate * 2)
    out.putShort(2); out.putShort(16) // block align, bits
    out.put("data".getBytes); out.putInt(dataLen)
    samples.foreach { s =>
      val clipped = math.max(-1.0, math.min(1.0, s))
      out.putShort(math.round(clipped * 32767).toShort)
    }
    out.array()
  }
}
