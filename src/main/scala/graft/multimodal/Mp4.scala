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
    // raw first sample entry (fourcc + fixed fields + extension boxes
    // like avcC) — codec-specific probes parse what they need from it
    var entryRaw: Array[Byte] = Array.emptyByteArray
    // stss sync-sample table (1-based sample numbers); empty = absent
    var stss: IndexedSeq[Long] = IndexedSeq.empty
  }

  /** Walk the box tree and fill one [[Track]] per trak. None on a
    * malformed/truncated tree. Shared by the MJPEG decoder and the
    * avc1 probe.
    */
  private def parseTracks(bytes: Array[Byte]): Option[Seq[Track]] = {
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
              val entrySize = u32()
              cur.codec = fourcc()
              // keep the whole entry (bounded by the stsd box) so
              // codec probes can walk its extension boxes (avcC)
              val entryEnd = math.min(entryStart + math.max(entrySize, 8L),
                next).toInt
              cur.entryRaw =
                java.util.Arrays.copyOfRange(bytes, entryStart, entryEnd)
              // VisualSampleEntry: width/height 24 bytes past the format
              if (b.position() + 28 <= next) {
                b.position(entryStart + 8 + 24)
                cur.width = b.getShort() & 0xFFFF
                cur.height = b.getShort() & 0xFFFF
              }
            }
          case "stss" if cur != null =>
            b.position(b.position() + 4)
            val n = u32().toInt
            cur.stss = (0 until n).map(_ => u32())
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
    Some(tracks.toSeq)
  }

  def decode(bytes: Array[Byte]): Option[VideoFrames] = {
    if (!isMp4(bytes)) return None
    val tracks = parseTracks(bytes).getOrElse(return None)
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

  private def box(id: String, body: Array[Byte]): Array[Byte] = {
    val o = ByteBuffer.allocate(8 + body.length)
    o.putInt(8 + body.length)
    o.put(id.getBytes("US-ASCII"))
    o.put(body)
    o.array()
  }

  private def full(id: String, version: Int, body: ByteBuffer => Unit,
                   cap: Int): Array[Byte] = {
    val o = ByteBuffer.allocate(cap + 4)
    o.putInt(version << 24) // version + zero flags
    body(o)
    box(id, java.util.Arrays.copyOf(o.array(), o.position()))
  }

  /** Minimal valid single-track MJPEG MP4 from per-frame JPEG bytes:
    * ftyp + mdat + moov, one stts run. `samplesPerChunk` splits the
    * samples over several chunks (distinct stco entries + stsc runs) so
    * the reader's chunk-map expansion is exercisable; `codec` is
    * overridable so specs can pin the codec-bound fallback (an avc1
    * track must decode to None). `entryExt` appends extension boxes to
    * the sample entry (avcC for [[writeAvc]]); non-empty `syncSamples`
    * (1-based) emits an stss box.
    */
  def write(frames: Seq[Array[Byte]], width: Int, height: Int,
            fps: Int = 10, codec: String = "jpeg",
            samplesPerChunk: Int = Int.MaxValue,
            use64: Boolean = false,
            entryExt: Array[Byte] = Array.emptyByteArray,
            syncSamples: Seq[Int] = Nil): Array[Byte] = {
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
    // VisualSampleEntry (86 fixed bytes incl. its own box header, plus
    // any extension boxes — avcC and friends)
    val entry = {
      val o = ByteBuffer.allocate(86 + entryExt.length)
      o.putInt(86 + entryExt.length); o.put(codec.getBytes("US-ASCII"))
      o.put(new Array[Byte](6)); o.putShort(1)   // reserved + data_ref_index
      o.put(new Array[Byte](16))                 // pre_defined/reserved
      o.putShort(width.toShort); o.putShort(height.toShort)
      o.putInt(0x00480000); o.putInt(0x00480000) // 72 dpi
      o.putInt(0); o.putShort(1)                 // reserved, frame_count
      o.put(new Array[Byte](32))                 // compressorname
      o.putShort(24); o.putShort(-1)             // depth, pre_defined
      o.put(entryExt)
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
    val stss =
      if (syncSamples.isEmpty) Array.emptyByteArray
      else full("stss", 0, o => {
        o.putInt(syncSamples.length)
        syncSamples.foreach(o.putInt)
      }, 8 + 4 * syncSamples.length)
    val stbl = box("stbl", stsd ++ stts ++ stss ++ stsc ++ stsz ++ stco)
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

  // ------------------------------------------------------- avc1 / avcC

  /** Mux an H.264 Annex B stream into a single-track avc1 MP4 (ISO/IEC
    * 14496-15): SPS/PPS move OUT-OF-BAND into the sample entry's avcC
    * box (AVCDecoderConfigurationRecord), slices become 4-byte
    * length-prefixed samples, and IDR slices are listed in stss. This
    * is the shape real-world H.264 actually ships in — Annex B start
    * codes exist on the wire and in .h264 dumps; files carry avcC.
    * One slice per picture (this engine's encoder emits exactly that);
    * a multi-slice-per-AU stream would need AUD-based grouping, out of
    * scope here.
    */
  def writeAvc(annexB: Array[Byte], fps: Int = 10,
               samplesPerChunk: Int = Int.MaxValue,
               use64: Boolean = false): Array[Byte] = {
    val nals = Avc.splitAnnexB(annexB).getOrElse(
      throw new IllegalArgumentException("not an H.264 Annex B stream"))
    def ofType(ts: Set[Int]) = nals.filter(n => ts((n(0) & 0x1F)))
    val sps = ofType(Set(7)); val pps = ofType(Set(8))
    val slices = ofType(Set(1, 5))
    require(sps.nonEmpty && pps.nonEmpty && slices.nonEmpty,
      "stream lacks SPS, PPS, or slices — nothing to mux")
    val parsed = Avc.parseSps(Avc.rbspFromEbsp(
      java.util.Arrays.copyOfRange(sps.head, 1, sps.head.length)))
    // AVCDecoderConfigurationRecord: profile/compat/level copied from
    // the SPS's own first three payload bytes, 4-byte NAL lengths
    val rec = {
      val cap = 7 + (sps ++ pps).map(_.length + 2).sum
      val o = ByteBuffer.allocate(cap)
      o.put(1.toByte)               // configurationVersion
      o.put(sps.head(1)); o.put(sps.head(2)); o.put(sps.head(3))
      o.put((0xFC | 3).toByte)      // lengthSizeMinusOne = 3
      o.put((0xE0 | sps.length).toByte)
      sps.foreach { n => o.putShort(n.length.toShort); o.put(n) }
      o.put(pps.length.toByte)
      pps.foreach { n => o.putShort(n.length.toShort); o.put(n) }
      o.array()
    }
    val samples = slices.map { n =>
      ByteBuffer.allocate(4 + n.length).putInt(n.length).put(n).array()
    }
    val sync = slices.zipWithIndex.collect {
      case (n, i) if (n(0) & 0x1F) == 5 => i + 1
    }
    write(samples, parsed.width, parsed.height, fps, codec = "avc1",
      samplesPerChunk = samplesPerChunk, use64 = use64,
      entryExt = box("avcC", rec), syncSamples = sync)
  }

  /** First child box with `id` among the sample entry's extension
    * boxes (after the 86 fixed VisualSampleEntry bytes).
    */
  private def entryExtBox(entryRaw: Array[Byte], id: String)
      : Option[Array[Byte]] = {
    var p = 86
    while (p + 8 <= entryRaw.length) {
      val size = ByteBuffer.wrap(entryRaw, p, 4).getInt
      if (size < 8 || p + size > entryRaw.length) return None
      val name = new String(entryRaw, p + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (name == id)
        return Some(java.util.Arrays.copyOfRange(entryRaw, p + 8, p + size))
      p += size
    }
    None
  }

  /** De-mux an avc1 track back to Annex B: avcC's out-of-band SPS/PPS
    * first, then every sample's length-prefixed NALs, all start-coded —
    * the exact inverse of [[writeAvc]], feeding [[Avc.probe]]/
    * [[Avc.decode]] unchanged. When an stss table is present it must
    * agree with the IDR NALs found in the samples (a muxer that lists a
    * non-IDR as a sync point breaks seeking — loud, never lenient).
    * None for non-MP4 payloads or MP4s without an avc1 video track.
    */
  def avcToAnnexB(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (!isMp4(bytes)) return None
    val t = parseTracks(bytes).getOrElse(return None)
      .find(t => t.handler == "vide" && t.codec.equalsIgnoreCase("avc1") &&
        t.sampleCount > 0 && t.chunkOffsets.nonEmpty)
      .getOrElse(return None)
    val rec = entryExtBox(t.entryRaw, "avcC").getOrElse(return None)
    val r = ByteBuffer.wrap(rec)
    require((r.get() & 0xFF) == 1, "avcC configurationVersion != 1")
    r.position(r.position() + 3) // profile/compat/level (SPS re-carries)
    val lengthSize = (r.get() & 3) + 1
    val out = new java.io.ByteArrayOutputStream()
    def copyParamSets(n: Int): Unit = (0 until n).foreach { _ =>
      val len = r.getShort() & 0xFFFF
      val nal = new Array[Byte](len); r.get(nal)
      out.write(Array[Byte](0, 0, 0, 1)); out.write(nal)
    }
    copyParamSets(r.get() & 0x1F)  // numOfSequenceParameterSets
    copyParamSets(r.get() & 0xFF)  // numOfPictureParameterSets
    val spans = sampleSpans(t, bytes.length)
    require(spans.length == t.sampleCount,
      s"sample table truncated: ${spans.length} of ${t.sampleCount}")
    val idrSamples = IndexedSeq.newBuilder[Long]
    spans.zipWithIndex.foreach { case ((off, len), i) =>
      var p = off; val end = off + len; var first = true
      while (p < end) {
        require(p + lengthSize <= end, s"sample $i: truncated NAL length")
        var nl = 0
        (0 until lengthSize).foreach { k => nl = (nl << 8) | (bytes(p + k) & 0xFF) }
        p += lengthSize
        require(nl > 0 && p + nl <= end, s"sample $i: NAL overruns sample")
        if (first) {
          if ((bytes(p) & 0x1F) == 5) idrSamples += (i + 1).toLong
          first = false
        }
        out.write(Array[Byte](0, 0, 0, 1)); out.write(bytes, p, nl)
        p += nl
      }
    }
    if (t.stss.nonEmpty)
      require(t.stss == idrSamples.result(),
        s"stss sync table ${t.stss} disagrees with IDR samples at " +
          s"${idrSamples.result()}")
    Some(out.toByteArray)
  }

  /** Codec facts of an avc1 MP4 plus container-level timing — the
    * scan-time video probe over the files an ingest actually sees:
    * resolution/profile/entropy/GOP from the out-of-band parameter
    * sets and the sample NAL walk (no pixel decode), duration from the
    * stts/mdhd tables, sync-point count from stss.
    */
  final case class AvcInfo(probe: Avc.Probe, durationMs: Long,
                           nSamples: Int, nSync: Int)

  def probeAvc(bytes: Array[Byte]): Option[AvcInfo] = {
    if (!isMp4(bytes)) return None
    val t = parseTracks(bytes).getOrElse(return None)
      .find(t => t.handler == "vide" && t.codec.equalsIgnoreCase("avc1") &&
        t.sampleCount > 0 && t.timescale > 0)
      .getOrElse(return None)
    avcToAnnexB(bytes).flatMap(Avc.probe).map { p =>
      val ticks = t.stts.map { case (c, d) => c * d }.sum
      AvcInfo(p, ticks * 1000L / t.timescale, t.sampleCount, t.stss.length)
    }
  }
}
