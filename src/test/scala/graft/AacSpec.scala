package graft

import org.apache.spark.sql.Row
import graft.multimodal.{Aac, Multimodal}

/** ADTS/AAC frame-header walk: parameter recovery from structurally
  * valid streams, rejection of non-ADTS payloads, and the audioFeatures
  * wiring (real duration, byte-derived waveform stand-ins).
  */
class AacSpec extends SparkSpec {

  test("probe recovers rate/channels/frames/duration from the headers") {
    val bytes = Aac.fixture(nFrames = 50, sampleRateIdx = 4, channels = 2)
    val info = Aac.probe(bytes).get
    assert(info.sampleRate === 44100 && info.channels === 2)
    assert(info.nFrames === 50)
    assert(info.durationMs === 50L * 1024 * 1000 / 44100) // 1160 ms
    assert(info.meanFrameBytes === 71.0)
  }

  test("rates and channel configs decode per the ADTS tables") {
    val hi = Aac.probe(Aac.fixture(10, sampleRateIdx = 3, channels = 6)).get
    assert(hi.sampleRate === 48000 && hi.channels === 6)
    val lo = Aac.probe(Aac.fixture(10, sampleRateIdx = 11, channels = 1)).get
    assert(lo.sampleRate === 8000 && lo.channels === 1)
  }

  test("CRC-protected frames (protection_absent 0) and multi-raw-block " +
    "frames walk correctly — 9-byte headers, 1024 samples per block") {
    val crc = Aac.probe(Aac.fixture(12, withCrc = true)).get
    assert(crc.nFrames === 12 && crc.sampleRate === 44100)
    assert(crc.durationMs === 12L * 1024 * 1000 / 44100)
    val multi = Aac.probe(Aac.fixture(10, rawBlocks = 4)).get
    assert(multi.nFrames === 10)
    assert(multi.durationMs === 10L * 4 * 1024 * 1000 / 44100,
      "4 raw data blocks = 4096 samples per frame")
    val both = Aac.probe(Aac.fixture(10, withCrc = true, rawBlocks = 2)).get
    assert(both.durationMs === 10L * 2 * 1024 * 1000 / 44100)
  }

  test("ID3v2 prefix is skipped; trailing junk tolerated; garbage rejected") {
    val tagged = Aac.fixture(8, id3 = true)
    assert(Aac.probe(tagged).get.nFrames === 8)
    val trailing = Aac.fixture(8) ++ Array.fill[Byte](30)(99)
    assert(Aac.probe(trailing).get.nFrames === 8)
    assert(Aac.probe(Array.fill[Byte](200)(0x55)).isEmpty)
    assert(Aac.probe(Aac.fixture(8).take(40)).isEmpty)     // < 2 frames
    // a rate switch mid-stream is not one consistent stream
    val mixed = Aac.fixture(4, sampleRateIdx = 4) ++
      Aac.fixture(4, sampleRateIdx = 3)
    assert(Aac.probe(mixed).get.nFrames === 4)
  }

  test("audioFeatures: ADTS rows get REAL duration, stand-in waveform stats") {
    val adts = Aac.fixture(nFrames = 43, sampleRateIdx = 4, channels = 2)
    val rows = Seq(Row(9L, "audio", "audio/aac", adts,
      Map("duration_ms" -> "12345"))) // metadata must NOT win over the walk
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.mediaSchema)
    val out = Multimodal.audioFeatures(media).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 43L * 1024 * 1000 / 44100)
  }
}
