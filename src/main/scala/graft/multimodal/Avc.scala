package graft.multimodal

/** H.264/AVC bitstream layer, pure JVM, from the public ITU-T H.264
  * spec (syntax in clause 7.3, Annex B byte-stream framing) — the
  * metadata half of the video frontier the engine can close WITHOUT
  * arbitrary code tables, plus a lossless coded subset.
  *
  * Two capabilities, sharply separated:
  *
  * 1. PROBE (works on ANY H.264 Annex B stream, CAVLC or CABAC): the
  *    NAL walk, emulation-prevention unescape, and the SPS / PPS /
  *    slice-header syntax are pure Exp-Golomb + fixed-width fields —
  *    self-delimiting structure, no entropy tables — so resolution,
  *    profile/level, entropy mode, frame count and I/P/B mix parse
  *    from raw bytes. This is what a 100 TB video ingest runs at scan
  *    time: per-object codec facts without decoding a single pixel.
  *
  * 2. DECODE/ENCODE of the {I_PCM, P_Skip} macroblock subset, which is
  *    the exact boundary of what the spec defines WITHOUT its VLC
  *    tables: I_PCM macroblocks carry raw samples after a byte-align
  *    (7.3.5: pcm_sample_luma/chroma), and P_Skip carries no data at
  *    all (7.3.4: one mb_skip_run covering the slice ⇒ each MB copies
  *    the median-predicted motion which is zero when every neighbour
  *    skips ⇒ the frame is a reference copy). Everything here is
  *    Exp-Golomb or raw bytes — structurally self-checking, so the
  *    mutually-inverse-but-wrong failure mode that keeps CAVLC/CABAC
  *    residual decoding (and mp3's Annex B.7 tables) formally out of
  *    scope cannot arise; the golden-byte pins in AvcSpec (the SPS/PPS
  *    bit layout hand-assembled from clause 7.3.2) anchor the syntax
  *    to the spec, not to this implementation.
  *
  * Streams using coded (non-PCM, non-skip) macroblocks are rejected
  * loudly by `decode`, naming the wall — same discipline as the video
  * stub gate (`Multimodal.sampleFrames`).
  *
  * Reference behavior anchor: the reference pipeline treats media as
  * opaque payloads with typed metadata (generator.py); the bitstream
  * work is original, from the public spec.
  */
object Avc {

  // ---------------------------------------------------------------- bits

  private[graft] final class BitReader(b: Array[Byte]) {
    private var pos = 0
    def bitsLeft: Int = b.length * 8 - pos
    private def bitAt(p: Int): Int = (b(p >>> 3) >> (7 - (p & 7))) & 1
    def u(n: Int): Int = {
      require(n <= 31 && bitsLeft >= n, s"bitstream underrun reading u($n)")
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bitAt(pos); pos += 1; i += 1 }
      v
    }
    def ue(): Int = {
      var z = 0
      while ({ require(bitsLeft > 0, "bitstream underrun in ue()"); bitAt(pos) == 0 }) {
        z += 1; pos += 1
        // z == 31 would compute (1 << 31) = Int.MinValue and return a
        // negative value; no field parsed here is ever > 2^31 - 2, so a
        // 31-zero prefix is corruption, not a large code
        require(z <= 30, "ue() prefix longer than 30 bits — corrupt stream")
      }
      pos += 1 // the terminating 1
      if (z == 0) 0 else ((1 << z) | u(z)) - 1
    }
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
    def byteAligned: Boolean = (pos & 7) == 0
    def alignToByte(): Unit =
      while (!byteAligned) {
        require(u(1) == 0, "pcm_alignment_zero_bit was 1 — corrupt stream")
      }
    def bytes(n: Int): Array[Byte] = {
      require(byteAligned && bitsLeft >= n * 8, "unaligned/short byte read")
      val off = pos >>> 3
      pos += n * 8
      java.util.Arrays.copyOfRange(b, off, off + n)
    }
  }

  private[graft] final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nb = 0
    def putBit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); nb += 1
      if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
    }
    def putU(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { putBit((v >> i) & 1); i -= 1 }
    }
    def putUe(k: Int): Unit = {
      val v = k + 1
      val bits = 32 - Integer.numberOfLeadingZeros(v)
      putU(0, bits - 1); putU(v, bits)
    }
    def putSe(k: Int): Unit = putUe(if (k > 0) 2 * k - 1 else -2 * k)
    def alignZero(): Unit = while (nb != 0) putBit(0)
    def putBytes(bs: Array[Byte]): Unit = {
      require(nb == 0, "byte write while unaligned")
      buf ++= bs
    }
    /** rbsp_trailing_bits: stop bit + zero-pad to byte. */
    def stop(): Unit = { putBit(1); alignZero() }
    def result: Array[Byte] = { require(nb == 0); buf.toArray }
  }

  // -------------------------------------------------- NAL framing / EBSP

  /** Strip emulation-prevention bytes: 00 00 03 -> 00 00 (clause 7.4.1). */
  private[graft] def rbspFromEbsp(e: Array[Byte]): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte](e.length)
    var i = 0
    var zeros = 0
    while (i < e.length) {
      val b = e(i)
      if (zeros >= 2 && b == 3) zeros = 0 // skip the emulation byte
      else {
        out += b
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toArray
  }

  /** Insert emulation prevention: any 00 00 followed by 00..03 gets 03. */
  private[graft] def ebspFromRbsp(r: Array[Byte]): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte](r.length + 8)
    var zeros = 0
    for (b <- r) {
      if (zeros >= 2 && (b & 0xFF) <= 3) { out += 3; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toArray
  }

  /** Split an Annex B byte stream into NAL units (EBSP payloads,
    * leading NAL header byte included; start codes removed). Returns
    * None when the buffer carries no start code at all.
    */
  def splitAnnexB(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    val starts = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i + 3 <= bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
        starts += i + 3; i += 3
      } else i += 1
    }
    if (starts.isEmpty) return None
    val nals = starts.indices.map { k =>
      val s = starts(k)
      // a following start code begins 3 bytes before its recorded
      // payload offset; the final NAL runs to the stream end
      var end =
        if (k + 1 < starts.length) starts(k + 1) - 3 else bytes.length
      // trailing zeros before a start code are inter-NAL padding (the
      // 4-byte 00 00 00 01 form); RBSP trailing bits guarantee a real
      // NAL never ends in 0x00
      while (end > s && bytes(end - 1) == 0) end -= 1
      java.util.Arrays.copyOfRange(bytes, s, end)
    }
    Some(nals.filter(_.nonEmpty))
  }

  // ------------------------------------------------------------ SPS/PPS

  final case class Sps(profile: Int, level: Int, spsId: Int,
                       chromaFormat: Int, log2MaxFrameNum: Int, pocType: Int,
                       log2MaxPocLsb: Int, mbWidth: Int, mbHeight: Int,
                       frameMbsOnly: Boolean, width: Int, height: Int)

  final case class Pps(ppsId: Int, spsId: Int, entropyCabac: Boolean,
                       picInitQp: Int, deblockingControl: Boolean)

  private val HighProfiles =
    Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)

  /** Parse a seq_parameter_set_rbsp (clause 7.3.2.1.1), including the
    * high-profile chroma/bit-depth/scaling-list prologue — all of it
    * Exp-Golomb, so real encoder output (x264 high profile) probes
    * correctly. `rbsp` excludes the NAL header byte.
    */
  def parseSps(rbsp: Array[Byte]): Sps = {
    val r = new BitReader(rbsp)
    val profile = r.u(8)
    r.u(8) // constraint_set flags + reserved
    val level = r.u(8)
    val spsId = r.ue()
    var chroma = 1
    if (HighProfiles(profile)) {
      chroma = r.ue()
      if (chroma == 3) r.u(1) // separate_colour_plane_flag
      r.ue(); r.ue() // bit_depth_luma/chroma_minus8
      r.u(1) // qpprime_y_zero_transform_bypass_flag
      if (r.u(1) == 1) { // seq_scaling_matrix_present_flag
        val lists = if (chroma == 3) 12 else 8
        for (i <- 0 until lists) if (r.u(1) == 1) {
          val size = if (i < 6) 16 else 64
          var lastScale = 8; var nextScale = 8
          for (_ <- 0 until size) {
            if (nextScale != 0) {
              val delta = r.se()
              nextScale = (lastScale + delta + 256) % 256
            }
            if (nextScale != 0) lastScale = nextScale
          }
        }
      }
    }
    val log2MaxFrameNum = r.ue() + 4
    val pocType = r.ue()
    var log2MaxPocLsb = 0
    if (pocType == 0) log2MaxPocLsb = r.ue() + 4
    else if (pocType == 1) {
      r.u(1); r.se(); r.se()
      val n = r.ue()
      for (_ <- 0 until n) r.se()
    }
    r.ue() // max_num_ref_frames
    r.u(1) // gaps_in_frame_num_value_allowed_flag
    val mbW = r.ue() + 1
    val mapH = r.ue() + 1
    val frameMbsOnly = r.u(1) == 1
    if (!frameMbsOnly) r.u(1) // mb_adaptive_frame_field_flag
    r.u(1) // direct_8x8_inference_flag
    var cropL = 0; var cropR = 0; var cropT = 0; var cropB = 0
    if (r.u(1) == 1) { cropL = r.ue(); cropR = r.ue(); cropT = r.ue(); cropB = r.ue() }
    // SubWidthC/SubHeightC crop units (Table 6-1; clause 7.4.2.1.1)
    val (cw, chUnit) = chroma match {
      case 0 => (1, 1)
      case 1 => (2, 2)
      case 2 => (2, 1)
      case _ => (1, 1)
    }
    val mbH = mapH * (if (frameMbsOnly) 1 else 2)
    val width = mbW * 16 - (cropL + cropR) * cw
    val height = mbH * 16 - (cropT + cropB) * chUnit * (if (frameMbsOnly) 1 else 2)
    Sps(profile, level, spsId, chroma, log2MaxFrameNum, pocType,
      log2MaxPocLsb, mbW, mbH, frameMbsOnly, width, height)
  }

  /** Parse the prefix of pic_parameter_set_rbsp (clause 7.3.2.2) the
    * probe and the subset decoder need.
    */
  def parsePps(rbsp: Array[Byte]): Pps = {
    val r = new BitReader(rbsp)
    val ppsId = r.ue()
    val spsId = r.ue()
    val cabac = r.u(1) == 1
    r.u(1) // bottom_field_pic_order_in_frame_present_flag
    val groups = r.ue() + 1
    require(groups == 1,
      s"pic_parameter_set declares $groups slice groups (FMO) — beyond " +
        "the subset this engine parses")
    r.ue(); r.ue() // num_ref_idx_l{0,1}_default_active_minus1
    r.u(1) // weighted_pred_flag
    r.u(2) // weighted_bipred_idc
    val qp = r.se() + 26
    r.se() // pic_init_qs_minus26
    r.se() // chroma_qp_index_offset
    val deblock = r.u(1) == 1
    Pps(ppsId, spsId, cabac, qp, deblock)
  }

  // -------------------------------------------------------------- probe

  final case class Probe(width: Int, height: Int, profile: Int, level: Int,
                         entropyCabac: Boolean, nNals: Int, nIdr: Int,
                         nI: Int, nP: Int, nB: Int)

  /** Codec facts from any H.264 Annex B stream — no pixel decode.
    * Slice types come from the first two Exp-Golomb fields of each
    * slice header (clause 7.3.3: first_mb_in_slice, slice_type), which
    * parse identically under CAVLC and CABAC.
    */
  def probe(bytes: Array[Byte]): Option[Probe] = {
    val nals = splitAnnexB(bytes).getOrElse(return None)
    var sps: Option[Sps] = None
    var pps: Option[Pps] = None
    var nIdr = 0; var nI = 0; var nP = 0; var nB = 0
    for (nal <- nals) {
      val hdr = nal(0) & 0xFF
      if ((hdr & 0x80) != 0) return None // forbidden_zero_bit
      val t = hdr & 0x1F
      val rbsp = rbspFromEbsp(java.util.Arrays.copyOfRange(nal, 1, nal.length))
      t match {
        case 7 => if (sps.isEmpty) sps = Some(parseSps(rbsp))
        case 8 => if (pps.isEmpty) pps = Some(parsePps(rbsp))
        case 1 | 5 =>
          if (t == 5) nIdr += 1
          val r = new BitReader(rbsp)
          r.ue() // first_mb_in_slice
          r.ue() % 5 match {
            case 0 => nP += 1
            case 1 => nB += 1
            case 2 => nI += 1
            case _ => () // SP/SI: counted in nNals only
          }
        case _ => ()
      }
    }
    val s = sps.getOrElse(return None)
    Some(Probe(s.width, s.height, s.profile, s.level,
      pps.exists(_.entropyCabac), nals.length, nIdr, nI, nP, nB))
  }

  // ---------------------------------------------- {I_PCM, P_Skip} codec

  /** One decoded frame: 8-bit 4:2:0 planes. */
  final case class Frame(width: Int, height: Int, y: Array[Byte],
                         cb: Array[Byte], cr: Array[Byte]) {
    require(width % 16 == 0 && height % 16 == 0,
      "subset codec frames are whole-macroblock sized")
  }

  /** Decode an Annex B stream of the subset this engine encodes:
    * IDR slices whose macroblocks are all I_PCM, and P slices that
    * skip every macroblock (reference copy). Anything else — coded
    * residuals, CABAC slice data, B slices — fails loudly naming the
    * wall, never silently wrong pixels.
    */
  def decode(bytes: Array[Byte]): Seq[Frame] = {
    val nals = splitAnnexB(bytes).getOrElse(
      throw new IllegalArgumentException("not an H.264 Annex B stream"))
    var sps: Sps = null
    var pps: Pps = null
    val frames = scala.collection.mutable.ArrayBuffer[Frame]()
    for (nal <- nals) {
      val t = nal(0) & 0x1F
      val rbsp = rbspFromEbsp(java.util.Arrays.copyOfRange(nal, 1, nal.length))
      t match {
        case 7 => sps = parseSps(rbsp)
        case 8 =>
          pps = parsePps(rbsp)
          require(!pps.entropyCabac,
            "CABAC slice data is out of the decodable subset (its " +
              "context tables are exactly the no-self-check wall — see " +
              "the class doc); re-encode with entropy_coding_mode=0")
        case 1 | 5 =>
          require(sps != null && pps != null, "slice before SPS/PPS")
          frames += decodeSlice(rbsp, t == 5, sps, pps,
            if (frames.isEmpty) None else Some(frames.last))
        case _ => () // SEI / AUD / filler: ignored
      }
    }
    frames.toSeq
  }

  private def decodeSlice(rbsp: Array[Byte], idr: Boolean, sps: Sps,
                          pps: Pps, prev: Option[Frame]): Frame = {
    val r = new BitReader(rbsp)
    val firstMb = r.ue()
    require(firstMb == 0, "multi-slice frames are out of the subset")
    val sliceType = r.ue()
    r.ue() // pps_id
    r.u(sps.log2MaxFrameNum) // frame_num
    if (idr) r.ue() // idr_pic_id
    if (sps.pocType == 0) r.u(sps.log2MaxPocLsb) // pic_order_cnt_lsb
    val nMbs = sps.mbWidth * sps.mbHeight
    sliceType % 5 match {
      case 2 => // I slice: every MB must be I_PCM (mb_type 25, Table 7-11)
        require(sps.chromaFormat == 1,
          s"I_PCM decode implemented for 4:2:0 only (chroma_format_idc " +
            s"${sps.chromaFormat})")
        if (idr) { r.u(1); r.u(1) } // dec_ref_pic_marking: no_output, long_term
        else require(r.u(1) == 0,   // adaptive_ref_pic_marking_mode_flag
          "adaptive ref-pic marking is out of the decodable subset")
        r.se() // slice_qp_delta
        if (pps.deblockingControl) {
          val dfi = r.ue()
          if (dfi != 1) { r.se(); r.se() }
        }
        val w = sps.mbWidth * 16
        val h = sps.mbHeight * 16
        val y = new Array[Byte](w * h)
        val cb = new Array[Byte](w / 2 * h / 2)
        val cr = new Array[Byte](w / 2 * h / 2)
        var mb = 0
        while (mb < nMbs) {
          val mbType = r.ue()
          require(mbType == 25,
            s"I-slice macroblock $mb has coded mb_type $mbType — only " +
              "I_PCM (25) is in the decodable subset; residual VLC " +
              "decoding is the documented wall")
          r.alignToByte()
          val ySamples = r.bytes(256)
          val cbS = r.bytes(64)
          val crS = r.bytes(64)
          val mbX = (mb % sps.mbWidth) * 16
          val mbY = (mb / sps.mbWidth) * 16
          var i = 0
          while (i < 256) {
            y((mbY + i / 16) * w + mbX + i % 16) = ySamples(i); i += 1
          }
          i = 0
          while (i < 64) {
            val cx = mbX / 2 + i % 8; val cy = mbY / 2 + i / 8
            cb(cy * (w / 2) + cx) = cbS(i)
            cr(cy * (w / 2) + cx) = crS(i)
            i += 1
          }
          mb += 1
        }
        Frame(w, h, y, cb, cr)
      case 0 => // P slice: must skip every MB => reference copy
        require(!idr, "IDR P slice is not legal H.264")
        require(r.u(1) == 0, // num_ref_idx_active_override_flag
          "ref-idx override is out of the decodable subset")
        require(r.u(1) == 0, // ref_pic_list_modification_flag_l0
          "ref-pic-list modification is out of the decodable subset")
        require(r.u(1) == 0, // adaptive_ref_pic_marking_mode_flag (ref_idc != 0)
          "adaptive ref-pic marking is out of the decodable subset")
        r.se() // slice_qp_delta
        if (pps.deblockingControl) {
          val dfi = r.ue()
          if (dfi != 1) { r.se(); r.se() }
        }
        val run = r.ue()
        require(run == nMbs,
          s"P slice skips $run of $nMbs macroblocks — coded P " +
            "macroblocks are out of the decodable subset")
        val p = prev.getOrElse(throw new IllegalArgumentException(
          "P_Skip frame with no reference frame"))
        p
      case st => throw new IllegalArgumentException(
        s"slice_type $st is out of the decodable subset (I/P only)")
    }
  }

  /** Encode frames as one Annex B stream: SPS + PPS, then per frame an
    * IDR all-I_PCM slice, or — when the frame is byte-identical to its
    * predecessor — a P slice skipping every macroblock (zero payload
    * for static content; the common video-archive case of long still
    * runs). Lossless by construction; `decode` inverts it exactly.
    */
  def encode(frames: Seq[Frame]): Array[Byte] = {
    require(frames.nonEmpty)
    val w = frames.head.width; val h = frames.head.height
    require(frames.forall(f => f.width == w && f.height == h))
    val mbW = w / 16; val mbH = h / 16
    val out = new java.io.ByteArrayOutputStream()
    def nal(header: Int, rbsp: Array[Byte]): Unit = {
      out.write(Array[Byte](0, 0, 0, 1))
      out.write(header)
      out.write(ebspFromRbsp(rbsp))
    }
    // SPS: baseline (66), level 1.0-up by size; poc_type 2 (no POC bits)
    val sw = new BitWriter
    sw.putU(66, 8); sw.putU(0, 8); sw.putU(10, 8)
    sw.putUe(0)      // sps_id
    sw.putUe(0)      // log2_max_frame_num_minus4 -> 4-bit frame_num
    sw.putUe(2)      // pic_order_cnt_type
    sw.putUe(0)      // max_num_ref_frames... (decoder needs 1 for P; PCM-only
                     // conformance is not claimed, structure is)
    sw.putU(0, 1)    // gaps_in_frame_num_value_allowed
    sw.putUe(mbW - 1)
    sw.putUe(mbH - 1)
    sw.putU(1, 1)    // frame_mbs_only
    sw.putU(0, 1)    // direct_8x8_inference
    sw.putU(0, 1)    // frame_cropping
    sw.putU(0, 1)    // vui_parameters_present
    sw.stop()
    nal(0x67, sw.result)
    // PPS: CAVLC, 1 slice group, qp 26, no deblocking control
    val pw = new BitWriter
    pw.putUe(0); pw.putUe(0)
    pw.putU(0, 1)    // entropy_coding_mode: CAVLC
    pw.putU(0, 1)    // bottom_field_pic_order_in_frame_present
    pw.putUe(0)      // num_slice_groups_minus1
    pw.putUe(0); pw.putUe(0) // num_ref_idx defaults
    pw.putU(0, 1)    // weighted_pred
    pw.putU(0, 2)    // weighted_bipred_idc
    pw.putSe(0)      // pic_init_qp_minus26
    pw.putSe(0)      // pic_init_qs_minus26
    pw.putSe(0)      // chroma_qp_index_offset
    pw.putU(0, 1)    // deblocking_filter_control_present
    pw.putU(0, 1)    // constrained_intra_pred
    pw.putU(0, 1)    // redundant_pic_cnt_present
    pw.stop()
    nal(0x68, pw.result)
    var frameNum = 0
    frames.zipWithIndex.foreach { case (f, idx) =>
      val samePrev = idx > 0 && {
        val p = frames(idx - 1)
        java.util.Arrays.equals(f.y, p.y) &&
          java.util.Arrays.equals(f.cb, p.cb) &&
          java.util.Arrays.equals(f.cr, p.cr)
      }
      if (!samePrev) {
        val b = new BitWriter
        b.putUe(0)       // first_mb_in_slice
        b.putUe(7)       // slice_type: I (all slices of the picture are I)
        b.putUe(0)       // pps_id
        b.putU(0, 4)     // frame_num (IDR resets to 0)
        b.putUe(0)       // idr_pic_id
        b.putU(0, 1); b.putU(0, 1) // dec_ref_pic_marking
        b.putSe(0)       // slice_qp_delta
        for (mb <- 0 until mbW * mbH) {
          b.putUe(25)    // mb_type I_PCM
          b.alignZero()  // pcm_alignment_zero_bit*
          val mbX = (mb % mbW) * 16
          val mbY = (mb / mbW) * 16
          val ySamples = new Array[Byte](256)
          var i = 0
          while (i < 256) {
            ySamples(i) = f.y((mbY + i / 16) * w + mbX + i % 16); i += 1
          }
          b.putBytes(ySamples)
          val cbS = new Array[Byte](64); val crS = new Array[Byte](64)
          i = 0
          while (i < 64) {
            val cx = mbX / 2 + i % 8; val cy = mbY / 2 + i / 8
            cbS(i) = f.cb(cy * (w / 2) + cx)
            crS(i) = f.cr(cy * (w / 2) + cx)
            i += 1
          }
          b.putBytes(cbS); b.putBytes(crS)
        }
        b.stop()
        nal(0x65, b.result) // IDR, nal_ref_idc 3
        frameNum = 1
      } else {
        val b = new BitWriter
        b.putUe(0)       // first_mb_in_slice
        b.putUe(5)       // slice_type: P (all slices P)
        b.putUe(0)       // pps_id
        b.putU(frameNum & 15, 4)
        b.putU(0, 1)     // num_ref_idx_active_override
        b.putU(0, 1)     // ref_pic_list_modification_flag_l0
        b.putU(0, 1)     // adaptive_ref_pic_marking_mode
        b.putSe(0)       // slice_qp_delta
        b.putUe(mbW * mbH) // mb_skip_run: every macroblock
        b.stop()
        nal(0x41, b.result) // non-IDR, nal_ref_idc 2
        frameNum = (frameNum + 1) & 15
      }
    }
    out.toByteArray
  }
}
