package graft.multimodal

/** FLAC codec subset, pure JVM — retires the compressed-audio stub in
  * the multimodal pipeline (the reference's data model treats media as
  * opaque binary + metadata; feature extraction needs real samples).
  * Implemented from the public spec (RFC 9639, "Free Lossless Audio
  * Codec"); no native libs, same approach as the HDF5 reader.
  *
  * Decoder supports: fLaC marker + metadata blocks (STREAMINFO parsed,
  * others skipped); fixed and variable blocking strategies; all
  * uncommon-blocksize/samplerate encodings; channel assignments
  * independent / left-side / right-side / mid-side; subframe types
  * CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC (any order), wasted
  * bits, rice partitions with both 4- and 5-bit parameters and escape
  * codes; CRC-8 header and CRC-16 frame verification. Not supported
  * (explicitly rejected, never silently mis-decoded): sample sizes
  * other than 8/12/16/20/24/32 bits from the reserved encodings.
  *
  * Encoder (the write path + test fixtures): mono or stereo 16-bit,
  * fixed 4096-sample blocks, per-block best-of fixed predictors 0-2
  * with single-partition rice residuals — a valid stream any FLAC
  * decoder accepts; compression ratio is secondary to correctness.
  */
object Flac {

  def isFlac(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C'

  // ---------------------------------------------------------------- bits

  private final class BitReader(bytes: Array[Byte], var bytePos: Int) {
    private var bitPos = 0 // 0..7, MSB first

    def read(nBits: Int): Long = {
      var out = 0L
      var n = nBits
      while (n > 0) {
        require(bytePos < bytes.length, s"FLAC: read past EOF at $bytePos")
        val avail = 8 - bitPos
        val take = math.min(avail, n)
        val b = bytes(bytePos) & 0xFF
        val chunk = (b >>> (avail - take)) & ((1 << take) - 1)
        out = (out << take) | chunk
        bitPos += take
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        n -= take
      }
      out
    }

    def readSigned(nBits: Int): Long = {
      val v = read(nBits)
      if (nBits > 0 && (v & (1L << (nBits - 1))) != 0) v - (1L << nBits) else v
    }

    /** FLAC unary: count of 0 bits before the terminating 1 (RFC 9639
      * §9.2.7.1).
      */
    def readUnary(): Int = {
      var q = 0
      while (read(1) == 0) q += 1
      q
    }

    def alignToByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def atByteBoundary: Boolean = bitPos == 0
  }

  private[graft] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0

    def write(value: Long, bits: Int): Unit = {
      var n = bits
      while (n > 0) {
        val take = math.min(8 - nBits, n)
        val chunk = ((value >>> (n - take)) & ((1L << take) - 1)).toInt
        cur = (cur << take) | chunk
        nBits += take
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        n -= take
      }
    }

    def writeUnary(q: Int): Unit = { var i = 0; while (i < q) { write(0, 1); i += 1 }; write(1, 1) }
    def alignToByte(): Unit = if (nBits > 0) write(0, 8 - nBits)
    def toBytes: Array[Byte] = { alignToByte(); out.toByteArray }
  }

  // ---------------------------------------------------------------- CRCs

  /** CRC-8, polynomial 0x07 (RFC 9639 §9.1.2). */
  private[graft] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xFF
      var b = 0
      while (b < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF; b += 1 }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial 0x8005 (RFC 9639 §9.3). */
  private[graft] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xFF) << 8
      var b = 0
      while (b < 8) { crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF else (crc << 1) & 0xFFFF; b += 1 }
      i += 1
    }
    crc
  }

  // -------------------------------------------------------------- decode

  final case class StreamInfo(minBlock: Int, maxBlock: Int, sampleRate: Int,
                              channels: Int, bitsPerSample: Int,
                              totalSamples: Long)

  /** Decode a whole stream to interleaved-to-mono doubles in [-1, 1] —
    * the same [[Wav.Pcm]] contract the WAV leg produces, so the feature
    * extractor is format-agnostic. None when the marker is absent
    * (caller falls back); malformed or unsupported content throws.
    */
  def decode(bytes: Array[Byte]): Option[Wav.Pcm] = {
    if (!isFlac(bytes)) return None
    var pos = 4
    var info: StreamInfo = null
    var last = false
    while (!last) {
      require(pos + 4 <= bytes.length, "FLAC: truncated metadata block")
      val h = bytes(pos) & 0xFF
      last = (h & 0x80) != 0
      val btype = h & 0x7F
      val len = ((bytes(pos + 1) & 0xFF) << 16) | ((bytes(pos + 2) & 0xFF) << 8) |
        (bytes(pos + 3) & 0xFF)
      pos += 4
      if (btype == 0) { // STREAMINFO
        val r = new BitReader(bytes, pos)
        val minB = r.read(16).toInt; val maxB = r.read(16).toInt
        r.read(24); r.read(24) // frame sizes (unused)
        val rate = r.read(20).toInt
        val ch = r.read(3).toInt + 1
        val bps = r.read(5).toInt + 1
        val total = r.read(36)
        info = StreamInfo(minB, maxB, rate, ch, bps, total)
      }
      pos += len
    }
    require(info != null, "FLAC: no STREAMINFO block")
    val mono = scala.collection.mutable.ArrayBuilder.make[Double]
    if (info.totalSamples > 0)
      mono.sizeHint(math.min(info.totalSamples, Int.MaxValue.toLong).toInt)
    // trailing bytes after the last audio frame (appended tags/padding)
    // are legal: once STREAMINFO's sample count is satisfied, stop
    // rather than demanding frame sync to EOF
    var decoded = 0L
    while (pos < bytes.length &&
        (info.totalSamples == 0 || decoded < info.totalSamples)) {
      val (frame, next) = decodeFrame(bytes, pos, info)
      val scale = 1L << (info.bitsPerSample - 1)
      val n = frame.head.length
      var i = 0
      while (i < n) {
        var acc = 0.0
        var c = 0
        while (c < frame.length) { acc += frame(c)(i).toDouble / scale; c += 1 }
        mono += acc / frame.length
        i += 1
      }
      decoded += n
      pos = next
    }
    Some(Wav.Pcm(info.sampleRate, info.channels, mono.result()))
  }

  /** One frame → per-channel sample arrays + position after the frame. */
  private def decodeFrame(bytes: Array[Byte], start: Int,
                          info: StreamInfo): (Array[Array[Long]], Int) = {
    val r = new BitReader(bytes, start)
    require(r.read(14) == 0x3FFE, s"FLAC: bad frame sync at $start")
    r.read(1) // reserved
    r.read(1) // blocking strategy (frame/sample number is opaque here)
    val bsCode = r.read(4).toInt
    val srCode = r.read(4).toInt
    val chAsn = r.read(4).toInt
    val ssCode = r.read(3).toInt
    r.read(1) // reserved
    // UTF-8-style coded frame/sample number: skip by shape
    val first = r.read(8).toInt
    var follow = 0
    var m = 0x80
    while ((first & m) != 0) { follow += 1; m >>= 1 }
    if (follow > 0) { follow -= 1; (0 until follow).foreach(_ => r.read(8)) }
    val blockSize = bsCode match {
      case 1 => 192
      case n if n >= 2 && n <= 5 => 576 << (n - 2)
      case 6 => r.read(8).toInt + 1
      case 7 => r.read(16).toInt + 1
      case n if n >= 8 => 256 << (n - 8)
      case other => throw new IllegalArgumentException(s"FLAC: reserved blocksize code $other")
    }
    srCode match { // value only needed when it overrides STREAMINFO; skip bits
      case 12 => r.read(8)
      case 13 | 14 => r.read(16)
      case 15 => throw new IllegalArgumentException("FLAC: invalid sample rate code")
      case _ => ()
    }
    val bps = ssCode match {
      case 0 => info.bitsPerSample
      case 1 => 8; case 2 => 12; case 4 => 16; case 5 => 20; case 6 => 24; case 7 => 32
      case other => throw new IllegalArgumentException(s"FLAC: reserved sample size code $other")
    }
    // CRC-8 covers the header bytes read so far
    r.alignToByte()
    val headerEnd = r.bytePos
    val expectedCrc8 = r.read(8).toInt
    require(crc8(bytes, start, headerEnd) == expectedCrc8, "FLAC: frame header CRC mismatch")

    val nCh = if (chAsn <= 7) chAsn + 1 else 2
    val chans = Array.tabulate(nCh) { c =>
      // side channels carry one extra bit (RFC 9639 §9.2.1)
      val extra = chAsn match {
        case 8 if c == 1 => 1  // left/side
        case 9 if c == 0 => 1  // side/right
        case 10 if c == 1 => 1 // mid/side
        case _ => 0
      }
      decodeSubframe(r, blockSize, bps + extra)
    }
    // un-decorrelate
    val out: Array[Array[Long]] = chAsn match {
      case a if a <= 7 => chans
      case 8 => // left/side: right = left - side
        Array(chans(0), Array.tabulate(blockSize)(i => chans(0)(i) - chans(1)(i)))
      case 9 => // side/right: left = right + side
        Array(Array.tabulate(blockSize)(i => chans(1)(i) + chans(0)(i)), chans(1))
      case 10 => // mid/side
        Array.tabulate(2) { c =>
          Array.tabulate(blockSize) { i =>
            val mid = (chans(0)(i) << 1) | (chans(1)(i) & 1)
            if (c == 0) (mid + chans(1)(i)) >> 1 else (mid - chans(1)(i)) >> 1
          }
        }
      case other => throw new IllegalArgumentException(s"FLAC: reserved channel assignment $other")
    }
    r.alignToByte()
    val frameEnd = r.bytePos
    val expectedCrc16 = r.read(16).toInt
    require(crc16(bytes, start, frameEnd) == expectedCrc16, "FLAC: frame CRC-16 mismatch")
    (out, r.bytePos)
  }

  private def decodeSubframe(r: BitReader, n: Int, bps: Int): Array[Long] = {
    require(r.read(1) == 0, "FLAC: subframe padding bit set")
    val tpe = r.read(6).toInt
    val wasted =
      if (r.read(1) == 1) r.readUnary() + 1 else 0
    val eff = bps - wasted
    val out: Array[Long] =
      if (tpe == 0) { // CONSTANT
        val v = r.readSigned(eff)
        Array.fill(n)(v)
      } else if (tpe == 1) { // VERBATIM
        Array.fill(n)(r.readSigned(eff))
      } else if ((tpe & 0x38) == 0x08 && (tpe & 0x07) <= 4) { // FIXED 001xxx
        val order = tpe & 0x07
        val warm = Array.fill(order)(r.readSigned(eff))
        val res = decodeResiduals(r, n, order)
        val s = new Array[Long](n)
        System.arraycopy(warm, 0, s, 0, order)
        var i = order
        while (i < n) {
          val p = order match {
            case 0 => 0L
            case 1 => s(i - 1)
            case 2 => 2 * s(i - 1) - s(i - 2)
            case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
            case 4 => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
          }
          s(i) = p + res(i - order)
          i += 1
        }
        s
      } else if ((tpe & 0x20) != 0) { // LPC 1xxxxx
        val order = (tpe & 0x1F) + 1
        val warm = Array.fill(order)(r.readSigned(eff))
        val precision = r.read(4).toInt + 1
        require(precision <= 15, "FLAC: invalid QLP precision")
        val shift = r.readSigned(5).toInt
        require(shift >= 0, "FLAC: negative QLP shift")
        val coefs = Array.fill(order)(r.readSigned(precision))
        val res = decodeResiduals(r, n, order)
        val s = new Array[Long](n)
        System.arraycopy(warm, 0, s, 0, order)
        var i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j) * s(i - 1 - j); j += 1 }
          s(i) = (acc >> shift) + res(i - order)
          i += 1
        }
        s
      } else throw new IllegalArgumentException(s"FLAC: reserved subframe type $tpe")
    if (wasted > 0) out.map(_ << wasted) else out
  }

  private def decodeResiduals(r: BitReader, blockSize: Int, order: Int): Array[Long] = {
    val method = r.read(2).toInt
    require(method <= 1, s"FLAC: reserved residual coding method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val po = r.read(4).toInt
    val nPart = 1 << po
    require(blockSize % nPart == 0, "FLAC: partition count does not divide blocksize")
    val out = new Array[Long](blockSize - order)
    var idx = 0
    var p = 0
    while (p < nPart) {
      val count = (blockSize >> po) - (if (p == 0) order else 0)
      val param = r.read(paramBits).toInt
      if (param == escape) {
        val raw = r.read(5).toInt
        var i = 0
        while (i < count) { out(idx) = if (raw == 0) 0L else r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary().toLong
          val v = (q << param) | r.read(param)
          out(idx) = (v >>> 1) ^ -(v & 1) // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
    out
  }

  // -------------------------------------------------------------- encode

  private val BlockSize = 4096

  /** Encode 16-bit mono samples (doubles in [-1, 1], clipped) as a FLAC
    * stream: STREAMINFO + fixed-blocking frames, per-block best fixed
    * predictor (order 0-2), single-partition rice residuals.
    */
  def write(samples: Array[Double], sampleRate: Int): Array[Byte] = {
    val pcm = samples.map { s =>
      math.round(math.max(-1.0, math.min(1.0, s)) * 32767).toLong
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('f', 'L', 'a', 'C'))
    val si = new BitWriter
    si.write(0x80L, 8)              // last-metadata-block flag + type 0
    si.write(34L, 24)               // STREAMINFO length
    val bs = math.min(BlockSize, math.max(samples.length, 16))
    si.write(bs.toLong, 16); si.write(bs.toLong, 16)
    si.write(0L, 24); si.write(0L, 24) // frame sizes unknown
    si.write(sampleRate.toLong, 20)
    si.write(0L, 3)                 // channels - 1 (mono)
    si.write(15L, 5)                // bits per sample - 1
    si.write(pcm.length.toLong, 36)
    (0 until 16).foreach(_ => si.write(0L, 8)) // MD5 unset (RFC 9639: 0 = unavailable)
    out.write(si.toBytes)
    var frameNo = 0L
    var off = 0
    while (off < pcm.length) {
      val n = math.min(bs, pcm.length - off)
      out.write(encodeFrame(pcm, off, n, frameNo, sampleRate))
      frameNo += 1
      off += n
    }
    out.toByteArray
  }

  private def encodeFrame(pcm: Array[Long], off: Int, n: Int, frameNo: Long,
                          sampleRate: Int): Array[Byte] = {
    val w = new BitWriter
    w.write(0x3FFE, 14); w.write(0, 1); w.write(0, 1) // sync, reserved, fixed blocking
    w.write(7, 4)  // blocksize: 16-bit value at end of header
    w.write(0, 4)  // sample rate: from STREAMINFO
    w.write(0, 4)  // channel assignment: 1 channel
    w.write(4, 3)  // sample size: 16 bits
    w.write(0, 1)  // reserved
    encodeUtf8Number(w, frameNo)
    w.write((n - 1).toLong, 16)
    val headBytes = w.toBytes // byte-aligned here by construction
    val w2 = new BitWriter
    headBytes.foreach(b => w2.write(b & 0xFFL, 8))
    w2.write(crc8(headBytes, 0, headBytes.length).toLong, 8)

    // pick the fixed order (0-2) minimizing total |residual|
    def residuals(order: Int): Array[Long] = {
      val res = new Array[Long](n - order)
      var i = order
      while (i < n) {
        val s = (j: Int) => pcm(off + i - j)
        res(i - order) = order match {
          case 0 => s(0)
          case 1 => s(0) - s(1)
          case 2 => s(0) - 2 * s(1) + s(2)
        }
        i += 1
      }
      res
    }
    val maxOrder = math.min(2, n - 1)
    val byOrder = (0 to maxOrder).map(o => o -> residuals(o))
    val (order, res) = byOrder.minBy { case (_, r) =>
      r.foldLeft(BigInt(0))((a, v) => a + BigInt(v).abs)
    }
    w2.write(0, 1)                       // subframe padding
    w2.write(0x08L | order.toLong, 6)    // FIXED, order
    w2.write(0, 1)                       // no wasted bits
    (0 until order).foreach(i => w2.write(pcm(off + i) & 0xFFFFL, 16))
    // rice param minimizing estimated size over one partition
    val zig = res.map(v => (v << 1) ^ (v >> 63))
    val param = (0 to 14).minBy { p =>
      zig.foldLeft(BigInt(0))((a, z) => a + BigInt(z >>> p) + p + 1)
    }
    w2.write(0, 2)              // 4-bit rice params
    w2.write(0, 4)              // partition order 0
    w2.write(param.toLong, 4)
    zig.foreach { z =>
      w2.writeUnary((z >>> param).toInt)
      w2.write(z & ((1L << param) - 1), param)
    }
    w2.alignToByte()
    val body = w2.toBytes
    val w3 = new BitWriter
    body.foreach(b => w3.write(b & 0xFFL, 8))
    w3.write(crc16(body, 0, body.length).toLong, 16)
    w3.toBytes
  }

  /** UTF-8-style coded number (RFC 9639 §9.1.5) for frame numbers. */
  private def encodeUtf8Number(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) w.write(v, 8)
    else {
      val nBytes =
        if (v < 0x800) 2 else if (v < 0x10000) 3 else if (v < 0x200000) 4
        else if (v < 0x4000000) 5 else if (v < 0x80000000L) 6 else 7
      val lead = (0xFF << (8 - nBytes)) & 0xFF
      val shift = 6 * (nBytes - 1)
      w.write((lead | (v >>> shift)) & 0xFFL, 8)
      var s = shift - 6
      while (s >= 0) { w.write(0x80L | ((v >>> s) & 0x3F), 8); s -= 6 }
    }
  }
}
