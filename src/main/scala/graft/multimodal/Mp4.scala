package graft.multimodal

import java.nio.ByteBuffer

/** ISO-BMFF (MP4 / QuickTime) container codec for Motion-JPEG video,
  * pure JVM — the second mainstream container (after [[Avi]]) whose
  * frames need no native codec: a `jpeg`/`mjpa` sample entry stores
  * each sample as a standalone JPEG. Implemented from the public
  * ISO/IEC 14496-12 box layout (moov/trak/mdia/minf/stbl with the
  * stsd/stts/stsc/stsz/stco-or-co64 sample tables).
  *
  * Reader: walks the box tree (32-bit and 64-bit `largesize` boxes),
  * picks the first video track whose sample-description fourcc is a
  * Motion-JPEG variant, resolves every sample's absolute byte span via
  * the chunk map (stsc × stco × stsz), and derives frame timing from
  * stts against the mdhd timescale. Codec-bound tracks (avc1/hev1/vp09)
  * and non-BMFF payloads return None so callers can fall back to the
  * documented stand-in. Writer emits a minimal valid single-track
  * MJPEG MP4 (ftyp + mdat + moov) for fixtures and the re-encode leg.
  *
  * Reference behavior anchor: the reference pipeline treats media as
  * opaque payloads with typed metadata (see
  * /root/reference/src/environmental_stac_generator/stac/generator.py) —
  * the container walk itself is original, from the public spec.
  */
object Mp4 {

  private val MjpegFourccs = Set("jpeg", "mjpa", "mjpb")

  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p'

  /** One track's sample tables, filled in while walking its boxes. */
  private final class Track {
    var handler: String = ""
    var codec: String = ""
    var width = 0
    var height = 0
    var timescale = 0L
    // stts runs: (sampleCount, sampleDelta)
    var stts: IndexedSeq[(Long, Long)] = IndexedSeq.empty
    // stsc runs: (firstChunk, samplesPerChunk)
    var stsc: IndexedSeq[(Long, Long)] = IndexedSeq.empty
    var sampleSizes: IndexedSeq[Int] = IndexedSeq.empty
    var uniformSize = 0
    var sampleCount = 0
    var chunkOffsets: IndexedSeq[Long] = IndexedSeq.empty
  }

  def decode(bytes: Array[Byte]): Option[VideoFrames] = {
    if (!isMp4(bytes)) return None
    val b = ByteBuffer.wrap(bytes) // ISO-BMFF is big-endian
    val tracks = scala.collection.mutable.ArrayBuffer[Track]()
    var cur: Track = null

    def fourcc(): String = {
      val f = new Array[Byte](4); b.get(f)
      new String(f, java.nio.charset.StandardCharsets.US_ASCII)
    }
    def u32(): Long = b.getInt().toLong & 0xFFFFFFFFL

    // containers we descend into; leaves are parsed, everything else skipped
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")

    def walk(end: Long): Unit =
      while (b.position() + 8 <= end) {
        val start = b.position().toLong
        var size = u32()
        val id = fourcc()
        var hdr = 8L
        if (size == 1) { size = b.getLong(); hdr = 16 } // largesize
        else if (size == 0) size = end - start          // extends to end
        if (size < hdr || start + size > end) return    // malformed: stop
        val next = start + size
        id match {
          case c if containers(c) =>
            if (c == "trak") { cur = new Track; tracks += cur }
            walk(next)
          case "mdhd" if cur != null =>
            val version = b.get() & 0xFF
            b.position(b.position() + 3) // flags
            if (version == 1) { b.position(b.position() + 16); cur.timescale = u32() }
            else { b.position(b.position() + 8); cur.timescale = u32() }
          case "hdlr" if cur != null =>
            b.position(b.position() + 8) // version/flags + pre_defined
            cur.handler = fourcc()
          case "stsd" if cur != null =>
            b.position(b.position() + 4) // version/flags
            val n = u32()
            if (n >= 1) {
              val entryStart = b.position()
              b.position(entryStart + 4) // entry size
              cur.codec = fourcc()
              // VisualSampleEntry: width/height 24 bytes past the format
              if (b.position() + 28 <= next) {
                b.position(entryStart + 8 + 24)
                cur.width = b.getShort() & 0xFFFF
                cur.height = b.getShort() & 0xFFFF
              }
            }
          case "stts" if cur != null =>
            b.position(b.position() + 4)
            val n = u32().toInt
            cur.stts = (0 until n).map(_ => (u32(), u32()))
          case "stsc" if cur != null =>
            b.position(b.position() + 4)
            val n = u32().toInt
            cur.stsc = (0 until n).map { _ =>
              val r = (u32(), u32()); u32() /* sample desc index */ ; r
            }
          case "stsz" if cur != null =>
            b.position(b.position() + 4)
            cur.uniformSize = u32().toInt
            cur.sampleCount = u32().toInt
            if (cur.uniformSize == 0)
              cur.sampleSizes = (0 until cur.sampleCount).map(_ => u32().toInt)
          case "stco" if cur != null =>
            b.position(b.position() + 4)
            val n = u32().toInt
            cur.chunkOffsets = (0 until n).map(_ => u32())
          case "co64" if cur != null =>
            b.position(b.position() + 4)
            val n = u32().toInt
            cur.chunkOffsets = (0 until n).map(_ => b.getLong())
          case _ => ()
        }
        b.position(math.min(next, bytes.length.toLong).toInt)
      }

    try walk(bytes.length.toLong)
    catch { case _: RuntimeException => return None } // truncated tables

    tracks.find(t => t.handler == "vide" &&
        MjpegFourccs(t.codec.toLowerCase) && t.sampleCount > 0 &&
        t.chunkOffsets.nonEmpty && t.timescale > 0)
      .flatMap { t =>
        val spans = sampleSpans(t, bytes.length)
        val totalTicks = t.stts.map { case (c, d) => c * d }.sum
        val totalSamples = math.max(t.stts.map(_._1).sum, 1L)
        val usPerFrame = totalTicks * 1000000L / (totalSamples * t.timescale)
        if (spans.length != t.sampleCount) None
        else Some(new VideoFrames(t.width, t.height, usPerFrame, bytes, spans))
      }
  }

  /** Absolute (offset, length) of each sample: expand the stsc runs
    * over the chunk list, laying consecutive samples head-to-tail
    * within each chunk.
    */
  private def sampleSpans(t: Track, fileLen: Int): IndexedSeq[(Int, Int)] = {
    def sizeOf(i: Int): Int =
      if (t.uniformSize != 0) t.uniformSize else t.sampleSizes(i)
    val spans = IndexedSeq.newBuilder[(Int, Int)]
    var sample = 0
    var run = 0
    var chunk = 1L // 1-based per spec
    while (sample < t.sampleCount && chunk <= t.chunkOffsets.length) {
      while (run + 1 < t.stsc.length && t.stsc(run + 1)._1 <= chunk) run += 1
      val perChunk = t.stsc(run)._2.toInt
      var off = t.chunkOffsets((chunk - 1).toInt)
      var i = 0
      while (i < perChunk && sample < t.sampleCount) {
        val len = sizeOf(sample)
        if (off + len > fileLen) return IndexedSeq.empty // out of bounds
        spans += ((off.toInt, len))
        off += len
        sample += 1
        i += 1
      }
      chunk += 1
    }
    spans.result()
  }

  /** Minimal valid single-track MJPEG MP4 from per-frame JPEG bytes:
    * ftyp + mdat + moov, one stts run. `samplesPerChunk` splits the
    * samples over several chunks (distinct stco entries + stsc runs) so
    * the reader's chunk-map expansion is exercisable; `codec` is
    * overridable so specs can pin the codec-bound fallback (an avc1
    * track must decode to None).
    */
  def write(frames: Seq[Array[Byte]], width: Int, height: Int,
            fps: Int = 10, codec: String = "jpeg",
            samplesPerChunk: Int = Int.MaxValue,
            use64: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    require(samplesPerChunk > 0, "samplesPerChunk must be positive")
    val n = frames.length
    val mdatPayload = frames.map(_.length).sum
    // layout: ftyp(24) | mdat hdr(8|16) + payload | moov. `use64` emits
    // the >4 GiB shapes (largesize mdat + co64 chunk offsets) writers
    // switch to once offsets may overflow 32 bits — readers must accept
    // them at any file size.
    val mdatStart = 24L
    val firstSample = mdatStart + (if (use64) 16 else 8)
    // chunks are contiguous in mdat; stco still addresses each one
    val chunkSizes = frames.grouped(math.min(samplesPerChunk, n))
      .map(_.map(_.length).sum).toIndexedSeq
    val chunkCounts = frames.grouped(math.min(samplesPerChunk, n))
      .map(_.length).toIndexedSeq
    val chunkOffsets = chunkSizes.scanLeft(firstSample)(_ + _).init

    def box(id: String, body: Array[Byte]): Array[Byte] = {
      val o = ByteBuffer.allocate(8 + body.length)
      o.putInt(8 + body.length)
      o.put(id.getBytes("US-ASCII"))
      o.put(body)
      o.array()
    }
    def full(id: String, version: Int, body: ByteBuffer => Unit,
             cap: Int): Array[Byte] = {
      val o = ByteBuffer.allocate(cap + 4)
      o.putInt(version << 24) // version + zero flags
      body(o)
      box(id, java.util.Arrays.copyOf(o.array(), o.position()))
    }

    val durTicks = n.toLong // mdhd timescale = fps, one tick per frame
    val mdhd = full("mdhd", 0, o => {
      o.putInt(0); o.putInt(0)           // creation/modification
      o.putInt(fps)                      // timescale
      o.putInt(durTicks.toInt)           // duration
      o.putShort(0x55C4.toShort)         // language 'und'
      o.putShort(0)
    }, 24)
    val hdlr = full("hdlr", 0, o => {
      o.putInt(0)                        // pre_defined
      o.put("vide".getBytes("US-ASCII"))
      o.putInt(0); o.putInt(0); o.putInt(0)
      o.put(0.toByte)                    // empty name
    }, 24)
    // VisualSampleEntry (86 bytes incl. its own box header)
    val entry = {
      val o = ByteBuffer.allocate(86)
      o.putInt(86); o.put(codec.getBytes("US-ASCII"))
      o.put(new Array[Byte](6)); o.putShort(1)   // reserved + data_ref_index
      o.put(new Array[Byte](16))                 // pre_defined/reserved
      o.putShort(width.toShort); o.putShort(height.toShort)
      o.putInt(0x00480000); o.putInt(0x00480000) // 72 dpi
      o.putInt(0); o.putShort(1)                 // reserved, frame_count
      o.put(new Array[Byte](32))                 // compressorname
      o.putShort(24); o.putShort(-1)             // depth, pre_defined
      o.array()
    }
    val stsd = full("stsd", 0, o => { o.putInt(1); o.put(entry) }, 8 + entry.length)
    val stts = full("stts", 0, o => { o.putInt(1); o.putInt(n); o.putInt(1) }, 16)
    // stsc runs: one per distinct samples-per-chunk value (at most two
    // here — the uniform run plus a smaller trailing chunk)
    val stscRuns = chunkCounts.zipWithIndex
      .filter { case (c, i) => i == 0 || c != chunkCounts(i - 1) }
      .map { case (c, i) => (i + 1, c) }
    val stsc = full("stsc", 0, o => {
      o.putInt(stscRuns.length)
      stscRuns.foreach { case (first, cnt) =>
        o.putInt(first); o.putInt(cnt); o.putInt(1)
      }
    }, 8 + 12 * stscRuns.length)
    val stsz = full("stsz", 0, o => {
      o.putInt(0); o.putInt(n)
      frames.foreach(f => o.putInt(f.length))
    }, 12 + 4 * n)
    val stco =
      if (use64) full("co64", 0, o => {
        o.putInt(chunkOffsets.length)
        chunkOffsets.foreach(o.putLong)
      }, 8 + 8 * chunkOffsets.length)
      else full("stco", 0, o => {
        o.putInt(chunkOffsets.length)
        chunkOffsets.foreach(off => o.putInt(off.toInt))
      }, 8 + 4 * chunkOffsets.length)
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val vmhd = full("vmhd", 0, o => {
      o.putShort(0); o.putShort(0); o.putShort(0); o.putShort(0)
    }, 12)
    val dref = full("dref", 0, o => {
      o.putInt(1)
      o.putInt(12); o.put("url ".getBytes("US-ASCII"))
      o.putInt(1) // self-contained flag
    }, 20)
    val dinf = box("dinf", dref)
    val minf = box("minf", vmhd ++ dinf ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val tkhd = full("tkhd", 0, o => {
      o.putInt(0); o.putInt(0)          // creation/modification
      o.putInt(1); o.putInt(0)          // track id, reserved
      o.putInt(durTicks.toInt)          // duration (movie timescale = fps)
      o.putInt(0); o.putInt(0)          // reserved
      o.putShort(0); o.putShort(0); o.putShort(0); o.putShort(0)
      // identity matrix
      o.putInt(0x00010000); o.putInt(0); o.putInt(0)
      o.putInt(0); o.putInt(0x00010000); o.putInt(0)
      o.putInt(0); o.putInt(0); o.putInt(0x40000000)
      o.putInt(width << 16); o.putInt(height << 16)
    }, 84)
    val trak = box("trak", tkhd ++ mdia)
    val mvhd = full("mvhd", 0, o => {
      o.putInt(0); o.putInt(0)
      o.putInt(fps); o.putInt(durTicks.toInt)
      o.putInt(0x00010000); o.putShort(0x0100.toShort); o.putShort(0)
      o.putInt(0); o.putInt(0)
      o.putInt(0x00010000); o.putInt(0); o.putInt(0)
      o.putInt(0); o.putInt(0x00010000); o.putInt(0)
      o.putInt(0); o.putInt(0); o.putInt(0x40000000)
      o.put(new Array[Byte](24)) // pre_defined
      o.putInt(2)                // next track id
    }, 96)
    val moov = box("moov", mvhd ++ trak)

    val mdatHdr = if (use64) 16 else 8
    val out = ByteBuffer.allocate(24 + mdatHdr + mdatPayload + moov.length)
    out.putInt(24); out.put("ftyp".getBytes("US-ASCII"))
    out.put("isom".getBytes("US-ASCII")); out.putInt(0x200)
    out.put("isom".getBytes("US-ASCII")); out.put("mp41".getBytes("US-ASCII"))
    if (use64) {
      out.putInt(1); out.put("mdat".getBytes("US-ASCII")) // size=1: largesize
      out.putLong(16L + mdatPayload)
    } else {
      out.putInt(8 + mdatPayload); out.put("mdat".getBytes("US-ASCII"))
    }
    frames.foreach(out.put)
    out.put(moov)
    out.array()
  }
}
