package graft

import graft.multimodal.Avc

/** H.264 bitstream layer: golden SPS/PPS bytes hand-assembled bit by
  * bit from ITU-T H.264 clause 7.3.2 (anchoring the syntax to the SPEC,
  * not to this implementation — the discipline that re-admitted the MQ
  * coder via its T.88 test vector), Exp-Golomb inverses, emulation-
  * prevention round trips, probe on high-profile-shaped headers, exact
  * {I_PCM, P_Skip} codec round trips, and the loud walls.
  */
class AvcSpec extends SparkSpec {

  // ------------------------------------------------------- golden bytes

  test("encoder SPS matches the hand-assembled clause 7.3.2.1.1 bits " +
    "for 64x64 baseline") {
    // NAL 0x67 (ref_idc 3, type 7), profile 66, constraints 0x00,
    // level 10, then RBSP bits:
    //   sps_id ue(0)                      1
    //   log2_max_frame_num_minus4 ue(0)   1
    //   pic_order_cnt_type ue(2)          011
    //   max_num_ref_frames ue(0)          1
    //   gaps_allowed u(1)                 0
    //   pic_width_in_mbs_minus1 ue(3)     00100
    //   pic_height_in_map_units_minus1    00100
    //   frame_mbs_only u(1)               1
    //   direct_8x8 u(1)                   0
    //   cropping u(1)                     0
    //   vui u(1)                          0
    //   rbsp_stop_one_bit                 1   (+ 2 pad zeros)
    // = 11011100 01000010 01000100 = DC 42 44
    val f = Avc.Frame(64, 64, new Array[Byte](64 * 64),
      new Array[Byte](32 * 32), new Array[Byte](32 * 32))
    val stream = Avc.encode(Seq(f))
    val nals = Avc.splitAnnexB(stream).get
    assert(nals.head.toSeq === Seq(0x67, 66, 0x00, 10, 0xDC, 0x42, 0x44)
      .map(_.toByte))
  }

  test("encoder PPS matches the canonical CAVLC PPS bytes 68 CE 38 80") {
    // pps_id ue(0) 1 | sps_id ue(0) 1 | cavlc 0 | bottom_field 0 |
    // groups ue(0) 1 | ref_l0 ue(0) 1 | ref_l1 ue(0) 1 | wpred 0 |
    // wbipred 00 | qp se(0) 1 | qs se(0) 1 | cqpo se(0) 1 | deblock 0 |
    // constrained_intra 0 | redundant 0 | stop 1 -> CE 38 80
    val f = Avc.Frame(16, 16, new Array[Byte](256),
      new Array[Byte](64), new Array[Byte](64))
    val nals = Avc.splitAnnexB(Avc.encode(Seq(f))).get
    val pps = nals.find(n => (n(0) & 0x1F) == 8).get
    assert(pps.toSeq === Seq(0x68, 0xCE, 0x38, 0x80).map(_.toByte))
  }

  // ------------------------------------------------------- bit plumbing

  test("Exp-Golomb writer and reader invert over the int range edges") {
    val w = new Avc.BitWriter
    val vals = Seq(0, 1, 2, 3, 7, 25, 255, 65535)
    vals.foreach(w.putUe)
    val svals = Seq(0, 1, -1, 2, -2, 40, -300)
    svals.foreach(w.putSe)
    w.stop()
    val r = new Avc.BitReader(w.result)
    vals.foreach(v => assert(r.ue() === v))
    svals.foreach(v => assert(r.se() === v))
  }

  test("emulation prevention inserts and strips 00 00 03 exactly") {
    val hazards = Array[Byte](0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 9, 0, 0)
    val e = Avc.ebspFromRbsp(hazards)
    // no 00 00 0x with x<=3 may survive in EBSP
    assert(!e.sliding(3).exists(s =>
      s(0) == 0 && s(1) == 0 && (s(2) & 0xFF) <= 3 && s(2) != 3))
    assert(Avc.rbspFromEbsp(e).toSeq === hazards.toSeq)
  }

  // -------------------------------------------------------------- probe

  test("probe recovers resolution, profile, entropy mode and slice mix") {
    def frame(seed: Int) = Avc.Frame(48, 32,
      Array.tabulate(48 * 32)(i => (i + seed).toByte),
      Array.tabulate(24 * 16)(i => (i * 2 + seed).toByte),
      Array.tabulate(24 * 16)(i => (i * 3 - seed).toByte))
    val f0 = frame(1)
    val stream = Avc.encode(Seq(f0, f0, f0, frame(9)))
    val p = Avc.probe(stream).get
    assert(p.width === 48 && p.height === 32)
    assert(p.profile === 66 && !p.entropyCabac)
    assert(p.nIdr === 2 && p.nI === 2 && p.nP === 2 && p.nB === 0)
    assert(Avc.probe(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("probe parses a high-profile SPS with cropping (hand-built)") {
    // profile 100 prologue: chroma ue(1), bit depths ue(0) ue(0),
    // qpprime 0, no scaling matrix; 1920x1080 = 120x68 MBs with
    // bottom crop 8 -> crop_bottom ue(4) (SubHeightC*unit = 2)
    val w = new Avc.BitWriter
    w.putU(100, 8); w.putU(0, 8); w.putU(40, 8)
    w.putUe(0); w.putUe(1); w.putUe(0); w.putUe(0); w.putU(0, 1); w.putU(0, 1)
    w.putUe(0)          // log2_max_frame_num_minus4
    w.putUe(2)          // poc type
    w.putUe(4)          // max_num_ref_frames
    w.putU(0, 1)
    w.putUe(119); w.putUe(67)
    w.putU(1, 1); w.putU(1, 1)
    w.putU(1, 1)        // frame_cropping_flag
    w.putUe(0); w.putUe(0); w.putUe(0); w.putUe(4)
    w.putU(0, 1)        // vui
    w.stop()
    val sps = Avc.parseSps(w.result)
    assert(sps.profile === 100)
    assert(sps.width === 1920 && sps.height === 1080)
  }

  // -------------------------------------------------------- codec exact

  test("I_PCM + P_Skip round trip is bit-exact across mixed GOPs") {
    val rnd = new scala.util.Random(42)
    def frame() = Avc.Frame(32, 48,
      Array.fill(32 * 48)(rnd.nextInt(256).toByte),
      Array.fill(16 * 24)(rnd.nextInt(256).toByte),
      Array.fill(16 * 24)(rnd.nextInt(256).toByte))
    val a = frame(); val b = frame(); val c = frame()
    val seq = Seq(a, a, b, b, b, c, a)
    val decoded = Avc.decode(Avc.encode(seq))
    assert(decoded.length === seq.length)
    seq.zip(decoded).foreach { case (want, got) =>
      assert(got.width === want.width && got.height === want.height)
      assert(got.y.toSeq === want.y.toSeq)
      assert(got.cb.toSeq === want.cb.toSeq)
      assert(got.cr.toSeq === want.cr.toSeq)
    }
  }

  test("P_Skip frames cost ~zero bytes next to I_PCM frames") {
    val f = Avc.Frame(32, 32, new Array[Byte](32 * 32),
      new Array[Byte](16 * 16), new Array[Byte](16 * 16))
    val once = Avc.encode(Seq(f)).length
    val five = Avc.encode(Seq(f, f, f, f, f)).length
    assert(five - once < 5 * 16, "P_Skip frames should be a few bytes each")
  }

  test("coded macroblocks and CABAC reject loudly, naming the wall") {
    val f = Avc.Frame(16, 16, new Array[Byte](256),
      new Array[Byte](64), new Array[Byte](64))
    val stream = Avc.encode(Seq(f))
    val nals = Avc.splitAnnexB(stream).get
    // corrupt the slice: mb_type ue(25) '000011010' starts right after
    // the 17-bit header+marking+qp prefix; flipping the first slice-data
    // byte to 0xFF makes mb_type a small coded type
    val slice = nals.find(n => (n(0) & 0x1F) == 5).get.clone()
    slice(3) = 0xFF.toByte
    val hacked = Array[Byte](0, 0, 0, 1) ++ nals(0) ++
      Array[Byte](0, 0, 0, 1) ++ nals(1) ++
      Array[Byte](0, 0, 0, 1) ++ slice
    val e = intercept[Exception](Avc.decode(hacked))
    assert(e.getMessage != null)
  }
}
