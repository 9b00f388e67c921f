package graft

import org.apache.spark.sql.Row
import graft.multimodal.Multimodal
import graft.pipeline.Thumbnail

/** Multimodal plumbing: real JPEG decode/resize/features through the
  * binary-column mapPartitions path; deterministic stubs for video/audio
  * keep schema + batch shape honest.
  */
class MultimodalSpec extends SparkSpec {

  private def mediaDf = {
    // real JPEGs produced by the pipeline's own encoder
    def jpeg(seed: Int) = Thumbnail.jpeg(
      Array.tabulate(24, 24)((y, x) => (y * 24 + x + seed).toDouble))
    val rows = Seq(
      Row(1L, "image", "image/jpeg", jpeg(0), Map("source" -> "thumb")),
      Row(2L, "image", "image/jpeg", jpeg(100), Map("source" -> "thumb")),
      Row(3L, "video", "video/mp4", Array.fill[Byte](256)(7),
        Map("duration_ms" -> "4000")),
      Row(4L, "audio", "audio/wav", Array.tabulate[Byte](128)(i => (i - 64).toByte),
        Map("duration_ms" -> "2000")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("image features: real JPEG decode, dims + luminance histogram") {
    val f = Multimodal.imageFeatures(mediaDf).collect().sortBy(_.getLong(0))
    assert(f.length === 2)
    assert(f(0).getInt(1) === 24 && f(0).getInt(2) === 24)
    val hist = f(0).getSeq[Long](4)
    assert(hist.length === 16 && hist.sum === 24 * 24)
    assert(f(0).getDouble(3) > 0 && f(0).getDouble(3) < 255)
  }

  test("image resize: binary->binary, output decodes at the target size") {
    val resized = Multimodal.resizeImages(mediaDf, 8, 8).collect()
    assert(resized.length === 2)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized.head.getAs[Array[Byte]](1)))
    assert(img.getWidth === 8 && img.getHeight === 8)
  }

  test("video frame sampling: unknown codec FAILS LOUDLY by default, " +
    "names the supported path") {
    // mediaDf's video row is not MJPEG/AVI/MP4 — with the stub gate at
    // its default (off), the sample must error, not hand back fake bytes
    spark.conf.unset("spark.graft.video.allowStub")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.sampleFrames(mediaDf, 5).collect()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg.contains("MJPEG") && msg.contains("allowStub"))
  }

  test("video frame sampling: n frames, timestamps spread over duration, deterministic") {
    spark.conf.set("spark.graft.video.allowStub", "true")
    try {
      val frames = Multimodal.sampleFrames(mediaDf, 5).collect()
        .sortBy(r => (r.getLong(0), r.getInt(1)))
      assert(frames.length === 5)
      assert(frames.map(_.getLong(2)).toSeq === Seq(0L, 1000L, 2000L, 3000L, 4000L))
      val again = Multimodal.sampleFrames(mediaDf, 5).collect()
        .sortBy(r => (r.getLong(0), r.getInt(1)))
      assert(frames.zip(again).forall { case (a, b) =>
        a.getAs[Array[Byte]](3).sameElements(b.getAs[Array[Byte]](3)) })
    } finally spark.conf.unset("spark.graft.video.allowStub")
  }

  test("video: a second stream's frame chunks ('01dc') never interleave " +
    "into the MJPEG frame list") {
    import graft.multimodal.Avi
    def jpeg(seed: Int) = Thumbnail.jpeg(
      Array.tabulate(16, 16)((y, x) => (y * 16 + x + seed).toDouble))
    val srcFrames = (0 until 5).map(jpeg)
    val avi = Avi.write(srcFrames, 16, 16, fps = 5).clone()
    // relabel the second movi chunk as stream 01: same container
    // geometry, different stream — the MJPEG ('00') list must skip it
    val pat = "00dc".getBytes("US-ASCII")
    var at = avi.toSeq.indexOfSlice(pat) // first frame chunk
    at = avi.toSeq.indexOfSlice(pat, at + 1) // second
    assert(at > 0, "second 00dc chunk not found")
    avi(at) = '0'; avi(at + 1) = '1'
    val v = Avi.decode(avi).get
    assert(v.nFrames === 4)
    v.frames.zip(srcFrames.patch(1, Nil, 1)).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }
  }

  test("video: MJPEG/AVI round-trips and sampleFrames emits REAL frames") {
    import graft.multimodal.Avi
    def jpeg(seed: Int) = Thumbnail.jpeg(
      Array.tabulate(16, 16)((y, x) => (y * 16 + x + seed).toDouble))
    val srcFrames = (0 until 9).map(jpeg)
    val avi = Avi.write(srcFrames, 16, 16, fps = 5)
    assert(Avi.isAvi(avi) && !Avi.isAvi("not avi bytes!".getBytes))
    val v = Avi.decode(avi).get
    assert(v.width === 16 && v.height === 16)
    assert(v.usPerFrame === 200000L && v.frames.length === 9)
    v.frames.zip(srcFrames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    assert(v.durationMs === 1800L)
    // every decoded frame is a standalone JPEG ImageIO accepts
    v.frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth === 16)
    }

    // through the Spark operator: AVI rows sample real frames with
    // container timestamps; non-AVI rows keep the 16-byte digest stub
    val rows = Seq(
      Row(7L, "video", "video/x-msvideo", avi, Map.empty[String, String]),
      Row(8L, "video", "video/mp4", Array.fill[Byte](64)(3),
        Map("duration_ms" -> "1000")))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    spark.conf.set("spark.graft.video.allowStub", "true")
    val sampled =
      try Multimodal.sampleFrames(media, 3).collect().groupBy(_.getLong(0))
      finally spark.conf.unset("spark.graft.video.allowStub")
    val real = sampled(7L).sortBy(_.getInt(1))
    assert(real.map(_.getLong(2)).toSeq === Seq(0L, 800L, 1600L))
    assert(real.map(_.getAs[Array[Byte]](3).toSeq).toSeq ===
      Seq(srcFrames(0).toSeq, srcFrames(4).toSeq, srcFrames(8).toSeq))
    val stub = sampled(8L)
    assert(stub.forall(_.getAs[Array[Byte]](3).length === 16)) // md5 stand-in
  }

  test("audio features: schema + deterministic stand-in values") {
    val f = Multimodal.audioFeatures(mediaDf).collect()
    assert(f.length === 1)
    assert(f.head.getLong(1) === 2000L)
    assert(f.head.getDouble(2) > 0)
  }

  test("audio features: REAL PCM decode for WAV (rms, zero-crossings, " +
    "duration from samples)") {
    import graft.multimodal.Wav
    // 100 Hz sine, amp 0.5, 8 kHz, 0.5 s
    val sr = 8000
    val samples = Array.tabulate(4000)(n =>
      0.5 * math.sin(2 * math.Pi * 100 * n / sr))
    val wav = Wav.write(samples, sr)
    assert(Wav.isWav(wav))
    val rows = Seq(Row(9L, "audio", "audio/wav", wav,
      // metadata LIES about the duration — the decode must not use it
      Map("duration_ms" -> "99999")))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.mediaSchema)
    val f = Multimodal.audioFeatures(media).collect().head
    assert(f.getLong(1) === 500L) // 4000 samples @ 8 kHz
    // rms of a sine = amp/sqrt(2); 16-bit quantization error stays tiny
    assert(math.abs(f.getDouble(2) - 0.5 / math.sqrt(2)) < 1e-4)
    // independent expected crossing count from the closed-form signal
    val zcExpected = (1 until samples.length)
      .count(i => (samples(i) < 0) != (samples(i - 1) < 0))
    assert(f.getLong(3) === zcExpected.toLong)
    // round-trip sanity on the codec itself, incl. stereo mixing
    val pcm = Wav.decode(wav).get
    assert(pcm.sampleRate === sr && pcm.channels === 1)
    assert(math.abs(pcm.samples(20) - samples(20)) < 1e-4)
  }

  test("audio features: REAL mp3 frame-header walk — exact duration " +
    "and side-info energy, no metadata trust") {
    import graft.multimodal.Mp3
    // 86 frames of MPEG1 Layer III @ 44.1 kHz ≈ 2.246 s
    val mp3 = Mp3.fixture(nFrames = 86, globalGain = 180, id3 = true)
    val info = Mp3.probe(mp3).get
    assert(info.nFrames === 86 && info.sampleRate === 44100 &&
      info.channels === 2 && info.bitrateKbps === 128)
    assert(info.durationMs === 86L * 1152 * 1000 / 44100)
    assert(info.meanGlobalGain === 180.0)
    assert(info.meanScalefacCompress === 0.0 && info.shortBlockFrac === 0.0)
    // the full side-info walk recovers scalefac_compress and the
    // short-block (transient) fraction written per granule
    val transient = Mp3.probe(Mp3.fixture(nFrames = 10, globalGain = 90,
      scalefacCompress = 11, shortGranules = 3)).get
    assert(transient.meanGlobalGain === 90.0)
    assert(transient.meanScalefacCompress === 11.0)
    assert(transient.shortBlockFrac === 0.75)
    val rows = Seq(Row(11L, "audio", "audio/mpeg", mp3,
      // metadata LIES about the duration — the header walk must win
      Map("duration_ms" -> "99999")))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.mediaSchema)
    val f = Multimodal.audioFeatures(media).collect().head
    assert(f.getLong(1) === 86L * 1152 * 1000 / 44100)
    assert(math.abs(f.getDouble(2) - 180.0 / 255.0) < 1e-9)
    // MPEG-2 streams: 576 samples/frame, V2 bitrate table, mono — the
    // version branch of the walk (side-info gain is MPEG1-only)
    val v2 = Mp3.probe(Mp3.fixtureV2(40)).get
    assert(v2.sampleRate === 22050 && v2.channels === 1 &&
      v2.nFrames === 40 && v2.bitrateKbps === 64)
    assert(v2.durationMs === 40L * 576 * 1000 / 22050)
    assert(v2.meanGlobalGain === 0.0)
    // arbitrary binary payloads must NOT probe as mp3 (two-frame rule)
    assert(Mp3.probe(Array.tabulate[Byte](600)(i => (i * 37).toByte)).isEmpty)
    assert(Mp3.probe(Array.fill[Byte](600)(0xFF.toByte)).isEmpty)
    // ID3v2.4 footer flag (bit 4): frames start 10 bytes later than the
    // syncsafe size says — the walk must skip the footer too
    val plain = Mp3.fixture(nFrames = 4, globalGain = 90)
    val id3 = java.nio.ByteBuffer.allocate(30 + plain.length)
    id3.put(Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 0, 10))
    id3.put(new Array[Byte](10)) // tag body (syncsafe size 10)
    id3.put(Array[Byte]('3', 'D', 'I', 4, 0, 0x10, 0, 0, 0, 10)) // footer
    id3.put(plain)
    val withFooter = Mp3.probe(id3.array()).get
    assert(withFooter.nFrames === 4 && withFooter.meanGlobalGain === 90.0)
  }
}
