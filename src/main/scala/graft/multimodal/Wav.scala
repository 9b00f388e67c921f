package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** RIFF/WAVE PCM codec, pure JVM — WAV needs no external codec, so the
  * audio leg of the multimodal pipeline decodes it for REAL (rms /
  * zero-crossings / duration from actual samples); only compressed
  * formats remain stubbed in this container.
  *
  * Supported: canonical RIFF little-endian layout, `fmt ` chunks of
  * PCM (format 1) at 8 or 16 bits, any channel count (mixed to mono by
  * averaging), arbitrary extra chunks skipped. Returns None for
  * anything else so callers can fall back.
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
          val format = b.getShort() & 0xFFFF
          val channels = b.getShort() & 0xFFFF
          val rate = b.getInt()
          b.getInt(); b.getShort() // byte rate + block align
          val bits = b.getShort() & 0xFFFF
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
      if format == 1 && (bits == 8 || bits == 16) && channels > 0 && rate > 0
      (off, len) <- data
    } yield {
      val bytesPerSample = bits / 8
      val frames = len / (bytesPerSample * channels)
      val mono = new Array[Double](frames)
      val d = ByteBuffer.wrap(bytes, off, len).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < frames) {
        var acc = 0.0
        var c = 0
        while (c < channels) {
          acc += (if (bits == 16) d.getShort() / 32768.0
                  else ((d.get() & 0xFF) - 128) / 128.0) // 8-bit WAV is unsigned
          c += 1
        }
        mono(i) = acc / channels
        i += 1
      }
      Pcm(rate, channels, mono)
    }
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
