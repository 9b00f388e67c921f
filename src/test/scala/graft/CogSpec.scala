package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sink.CogWriter
import graft.source.CogReader

/** K2/S6 — COG writer/reader structural contract: tiling, DEFLATE,
  * overview pyramid, band stats tags, GeoKeys, pixel round-trip.
  */
class CogSpec extends AnyFunSuite {

  private def grid(h: Int, w: Int, f: (Int, Int) => Double) =
    Array.tabulate(h, w)(f)

  private val bands = Seq(
    CogWriter.Band("sic_mean", Map(
      "STATISTICS_MINIMUM" -> 0.1, "STATISTICS_MAXIMUM" -> 0.9,
      "STATISTICS_MEAN" -> 0.5, "STATISTICS_STDDEV" -> 0.2,
      "STATISTICS_VALID_PERCENT" -> 98.43)) ->
      grid(300, 300, (y, x) => y * 0.01 + x * 0.001),
    CogWriter.Band("sic_stddev", Map("STATISTICS_MEAN" -> 0.05)) ->
      grid(300, 300, (y, x) => (y + x) * 0.005))

  test("round-trip: pixels, tiling, bands, overview pyramid, geokeys") {
    val bytes = CogWriter.write(bands,
      CogWriter.Options(epsg = 6931, pixelScale = (25000.0, 25000.0)))
    val t = CogReader.read(bytes)
    // full page + overviews 2/4/8/16 (300/16 = 18 > 0 → all four)
    assert(t.pages.length === 5)
    val full = t.pages.head
    assert(!full.isOverview && t.pages.tail.forall(_.isOverview))
    assert((full.width, full.height) === ((300, 300)))
    assert(full.tileW === 256 && full.tileH === 256)
    assert(full.nBands === 2 && full.compression === 8)
    assert(t.dtype === "float64")
    assert(full.epsg === Some(6931))
    // 300x300 → 2x2 tiles per band
    assert(full.tileOffsets.length === 2 * 2 * 2)
    // pixel fidelity on the full page
    val b0 = t.readBand(0, 0)
    assert(b0(17)(23) === 17 * 0.01 + 23 * 0.001)
    val b1 = t.readBand(0, 1)
    assert(b1(100)(200) === (100 + 200) * 0.005)
    // overview ×2 is the 2x2 average
    val ov = t.readBand(1, 0)
    assert(t.pages(1).width === 150)
    val expected = (b0(0)(0) + b0(0)(1) + b0(1)(0) + b0(1)(1)) / 4
    assert(math.abs(ov(0)(0) - expected) < 1e-12)
  }

  test("external .ovr sidecar: overview-only TIFF, all pages flagged, " +
    "no geo tags (ref cog.py:91-104)") {
    val ovr = CogWriter.writeOvr(bands,
      CogWriter.Options(epsg = 6931, pixelScale = (25000.0, 25000.0)))
    val t = CogReader.read(ovr)
    // gdaladdo levels 2/4/8/16 and nothing else
    assert(t.pages.length === 4)
    assert(t.pages.forall(_.isOverview))
    assert(t.pages.map(_.width) === Seq(150, 75, 37, 18))
    // georeferencing and GDAL metadata live on the main COG only
    assert(t.pages.forall(p => p.epsg.isEmpty && p.gdalMetadata.isEmpty))
    assert(t.pages.forall(_.nBands === 2))
    // ×2 page pixels are the same averages the internal pyramid carries
    val full = CogReader.read(CogWriter.write(bands))
    val (internal, external) = (full.readBand(1, 0), t.readBand(0, 0))
    assert(internal(10).toSeq === external(10).toSeq)
  }

  test("band statistics embedded in GDAL_METADATA (ref cog.py:80-87)") {
    val bytes = CogWriter.write(bands)
    val md = CogReader.read(bytes).pages.head.gdalMetadata.get
    assert(md.contains("""<Item name="STATISTICS_MINIMUM" sample="0">0.1</Item>"""))
    assert(md.contains("""<Item name="STATISTICS_VALID_PERCENT" sample="0">98.43</Item>"""))
    assert(md.contains("""<Item name="DESCRIPTION" sample="1" role="description">sic_stddev</Item>"""))
    // overview pages carry no metadata (forward_band_tags on full page)
    assert(CogReader.read(bytes).pages(1).gdalMetadata.isEmpty)
  }

  test("compression toggle: NONE produces raw 256x256x8 tiles (ref generator.py:620)") {
    val bytes = CogWriter.write(bands, CogWriter.Options(compress = false))
    val t = CogReader.read(bytes)
    assert(t.pages.head.compression === 1)
    assert(t.pages.head.tileByteCounts.forall(_ === 256 * 256 * 8))
    assert(t.readBand(0, 0)(5)(6) === 5 * 0.01 + 6 * 0.001)
    // DEFLATE must actually shrink this smooth data
    val z = CogWriter.write(bands)
    assert(z.length < bytes.length / 2)
  }

  test("small grid: single tile, overview chain truncated") {
    val small = Seq(CogWriter.Band("b", Map.empty) ->
      grid(8, 8, (y, x) => y + x * 0.1))
    val t = CogReader.read(CogWriter.write(small))
    // 8/2=4, 8/4=2, 8/8=1 valid; 8/16=0 dropped
    assert(t.pages.length === 4)
    assert(t.readBand(0, 0)(7)(7) === 7 + 0.7)
  }

  test("NaN cells survive DEFLATE round-trip and are skipped in overview averages") {
    val g = grid(16, 16, (y, x) => if (y == 0 && x == 0) Double.NaN else 1.0)
    val t = CogReader.read(CogWriter.write(Seq(CogWriter.Band("b", Map.empty) -> g)))
    assert(t.readBand(0, 0)(0)(0).isNaN)
    // overview 2x2 block containing the NaN averages the 3 valid cells
    assert(t.readBand(1, 0)(0)(0) === 1.0)
  }

  test("BigTIFF envelope: magic 43, LONG8 offsets, identical pixels " +
    "and pyramid through the same reader") {
    val bytes = CogWriter.write(bands,
      CogWriter.Options(epsg = 6931, pixelScale = (25000.0, 25000.0),
        bigTiff = true))
    // header: II + 43 + offset-size 8 + pad 0
    assert(bytes(0) === 'I'.toByte && bytes(1) === 'I'.toByte)
    assert(java.nio.ByteBuffer.wrap(bytes, 2, 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort === 43)
    val t = CogReader.read(bytes)
    assert(t.pages.length === 5)
    val full = t.pages.head
    assert((full.width, full.height) === ((300, 300)))
    assert(full.nBands === 2 && full.epsg === Some(6931))
    // pixels byte-identical with the classic envelope
    val classic = CogReader.read(CogWriter.write(bands,
      CogWriter.Options(epsg = 6931, pixelScale = (25000.0, 25000.0))))
    for (p <- 0 until 5; b <- 0 until 2) {
      val a = t.readBand(p, b); val c = classic.readBand(p, b)
      for (y <- a.indices; x <- a(y).indices)
        assert(a(y)(x) == c(y)(x) ||
          (a(y)(x).isNaN && c(y)(x).isNaN), s"p$p b$b ($y,$x)")
    }
    // the .ovr sidecar also renders as BigTIFF when asked
    val ovr = CogWriter.writeOvr(bands, CogWriter.Options(bigTiff = true))
    assert(java.nio.ByteBuffer.wrap(ovr, 2, 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort === 43)
    assert(CogReader.read(ovr).pages.forall(_.isOverview))
  }
}
