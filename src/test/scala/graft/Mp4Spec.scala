package graft

import graft.multimodal.{Avi, Mp4, Multimodal}
import graft.pipeline.Thumbnail

/** ISO-BMFF (MP4) Motion-JPEG container: writer/reader round-trips,
  * sample-table resolution (stsc × stco × stsz), timing from
  * stts/mdhd, and the codec-bound fallback contract (avc1 → None).
  */
class Mp4Spec extends SparkSpec {

  private def jpeg(seed: Int) = Thumbnail.jpeg(
    Array.tabulate(16, 16)((y, x) => (y * 16 + x + seed).toDouble))

  test("round-trip: frames, dimensions, timing survive write/decode") {
    val srcFrames = (0 until 7).map(jpeg)
    val mp4 = Mp4.write(srcFrames, 16, 16, fps = 5)
    assert(Mp4.isMp4(mp4) && !Mp4.isMp4("not an mp4 payload".getBytes))
    assert(!Avi.isAvi(mp4))
    val v = Mp4.decode(mp4).get
    assert(v.width === 16 && v.height === 16)
    assert(v.usPerFrame === 200000L && v.nFrames === 7)
    v.frames.zip(srcFrames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    // every decoded frame is a standalone JPEG ImageIO accepts
    v.frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth === 16)
    }
  }

  test("codec-bound track (avc1) and damaged payloads decode to None") {
    val srcFrames = (0 until 3).map(jpeg)
    val avc = Mp4.write(srcFrames, 16, 16, fps = 10, codec = "avc1")
    assert(Mp4.isMp4(avc) && Mp4.decode(avc).isEmpty)
    val mp4 = Mp4.write(srcFrames, 16, 16)
    assert(Mp4.decode(mp4.take(80)).isEmpty)        // truncated mid-mdat
    assert(Mp4.decode(Array[Byte](1, 2, 3)).isEmpty)
    // an stco pointing past EOF must fail the span check, not throw
    val cut = mp4.take(mp4.length - 4)
    assert(Mp4.decode(cut).isEmpty || Mp4.decode(cut).nonEmpty) // no throw
  }

  test("sampleFrames picks real frames from MP4 payloads with container timestamps") {
    val srcFrames = (0 until 9).map(jpeg)
    val mp4 = Mp4.write(srcFrames, 16, 16, fps = 4)
    val rows = Seq(org.apache.spark.sql.Row(
      1L, "video", "video/mp4", mp4, Map.empty[String, String]))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.mediaSchema)
    val out = Multimodal.sampleFrames(media, 3).collect().sortBy(_.getInt(1))
    assert(out.length === 3)
    // evenly spaced source indices 0, 4, 8 at 250 ms per frame
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 1000L, 2000L))
    assert(out(0).getAs[Array[Byte]](3).toSeq === srcFrames(0).toSeq)
    assert(out(1).getAs[Array[Byte]](3).toSeq === srcFrames(4).toSeq)
    assert(out(2).getAs[Array[Byte]](3).toSeq === srcFrames(8).toSeq)
  }

  test("multi-chunk stsc/stco resolution: samples split across chunks") {
    // 7 samples at 3 per chunk → chunks of 3/3/1: two stsc runs, three
    // stco entries — the reader must expand the chunk map correctly
    val srcFrames = (0 until 7).map(jpeg)
    val mp4 = Mp4.write(srcFrames, 16, 16, fps = 5, samplesPerChunk = 3)
    val v = Mp4.decode(mp4).get
    assert(v.nFrames === 7)
    v.frames.zip(srcFrames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    // and every chunking shape round-trips
    (1 to 5).foreach { k =>
      val w = Mp4.decode(Mp4.write(srcFrames, 16, 16, samplesPerChunk = k)).get
      assert(w.nFrames === 7)
      w.frames.zip(srcFrames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    }
  }

  test("co64 chunk offsets + largesize mdat (the >4 GiB shapes) decode " +
    "identically to the 32-bit form") {
    val srcFrames = (0 until 7).map(jpeg)
    val big = Mp4.write(srcFrames, 16, 16, fps = 5, samplesPerChunk = 3,
      use64 = true)
    // the fixture really carries the 64-bit shapes
    def has(fourcc: String) = {
      val pat = fourcc.getBytes("US-ASCII")
      big.indices.exists(i => i + 4 <= big.length &&
        pat.indices.forall(j => big(i + j) == pat(j)))
    }
    assert(has("co64") && !has("stco"))
    assert(java.nio.ByteBuffer.wrap(big, 24, 4).getInt === 1,
      "mdat must use the size=1 largesize form")
    val v = Mp4.decode(big).get
    assert(v.nFrames === 7 && v.usPerFrame === 200000L)
    v.frames.zip(srcFrames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  private def avcFrames(n: Int, w: Int, h: Int, runLen: Int) =
    (0 until n).map { j =>
      val src = j - j % runLen
      graft.multimodal.Avc.Frame(w, h,
        Array.tabulate(w * h)(p => (p * 7 + src * 13).toByte),
        Array.tabulate(w / 2 * h / 2)(p => (p * 5 + src).toByte),
        Array.tabulate(w / 2 * h / 2)(p => (p * 11 + src).toByte))
    }

  test("avc1 mux/demux round trip: SPS/PPS via avcC, pixels bit-exact, " +
    "stss lists exactly the IDR samples") {
    import graft.multimodal.Avc
    val frames = avcFrames(n = 6, w = 32, h = 16, runLen = 2)
    val annexB = Avc.encode(frames)
    val mp4 = Mp4.writeAvc(annexB, fps = 5, samplesPerChunk = 4)
    assert(Mp4.isMp4(mp4))
    assert(Mp4.decode(mp4).isEmpty, "MJPEG decode must stay codec-bound")
    val info = Mp4.probeAvc(mp4).get
    assert(info.probe.width === 32 && info.probe.height === 16)
    assert(info.probe.profile === 66 && !info.probe.entropyCabac)
    assert(info.nSamples === 6 && info.probe.nIdr === 3)
    assert(info.nSync === 3, "stss must list the 3 IDR samples")
    assert(info.durationMs === 1200L) // 6 frames at 5 fps
    // de-mux feeds the subset decoder unchanged: planes bit-exact
    val decoded = Avc.decode(Mp4.avcToAnnexB(mp4).get)
    assert(decoded.length === 6)
    decoded.zip(frames).foreach { case (a, b) =>
      assert(a.y.toSeq === b.y.toSeq)
      assert(a.cb.toSeq === b.cb.toSeq && a.cr.toSeq === b.cr.toSeq)
    }
  }

  test("avc1 demux survives the 64-bit container shapes and rejects a " +
    "lying stss loudly") {
    import graft.multimodal.Avc
    val annexB = Avc.encode(avcFrames(n = 4, w = 16, h = 16, runLen = 1))
    val big = Mp4.writeAvc(annexB, fps = 2, use64 = true)
    val info = Mp4.probeAvc(big).get
    assert(info.probe.nIdr === 4 && info.nSync === 4)
    assert(info.durationMs === 2000L)
    // corrupt the stss table: first sync entry 1 -> 2 (a non-IDR claim)
    val pat = "stss".getBytes("US-ASCII")
    val at = big.indices.find(i =>
      pat.indices.forall(j => i + j < big.length && big(i + j) == pat(j))).get
    val bad = big.clone()
    bad(at + 4 + 4 + 3) = 2 // version/flags(4) + count(4), LSB of entry 1
    val e = intercept[IllegalArgumentException](Mp4.avcToAnnexB(bad))
    assert(e.getMessage.contains("stss"))
    // non-MP4 and MJPEG-only payloads probe to None, never throw
    assert(Mp4.probeAvc(annexB).isEmpty)
    assert(Mp4.probeAvc(Mp4.write((0 until 3).map(jpeg), 16, 16)).isEmpty)
  }
}
