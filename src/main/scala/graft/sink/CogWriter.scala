package graft.sink

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Deflater

/** K2 — Cloud-Optimized GeoTIFF writer (ref cog.py:16-126), pure JVM.
  *
  * Produces the reference writer's structural contract: little-endian
  * TIFF, 256×256 tiles, DEFLATE (or none), multiband as separate planes,
  * float64 samples, average-resampled overview pages at ×2/×4/×8/×16
  * (cog.py:98-102), per-band STATISTICS_* embedded in the GDAL_METADATA
  * tag (cog.py:80-87), GeoTIFF georeferencing via ModelPixelScale +
  * ModelTiepoint and a minimal GeoKey directory carrying the EPSG code.
  * COG layout rule: all IFDs live at the head of the file, tile bytes
  * follow.
  *
  * Byte-exactness with GDAL is out of contract (SURVEY §7.4.1): the
  * correctness surface is the queryable metadata + decodable pixels,
  * which CogReader (S6) round-trips.
  */
object CogWriter {

  final case class Band(name: String, stats: Map[String, Double])

  final case class Options(
      tileSize: Int = 256,
      compress: Boolean = true,          // DEFLATE on (ref generator.py:620)
      overviewFactors: Seq[Int] = Seq(2, 4, 8, 16),
      epsg: Int = 6931,
      pixelScale: (Double, Double) = (1.0, 1.0),
      origin: (Double, Double) = (0.0, 0.0),
      // ALSO emit a gdaladdo-style external `.ovr` sidecar next to the
      // COG (ref cog.py:91-104, external_overviews default True — the
      // reference produces BOTH internal overview pages and the sidecar)
      externalOverviews: Boolean = true,
      /** Emit the BigTIFF envelope (magic 43, 8-byte offsets/counts,
        * 20-byte IFD entries) — the >4 GiB mosaic form; CogReader
        * round-trips both envelopes.
        */
      bigTiff: Boolean = false)

  // TIFF tag ids
  private val NewSubfileType = 254
  private val ImageWidth = 256; private val ImageLength = 257
  private val BitsPerSample = 258; private val Compression = 259
  private val Photometric = 262; private val SamplesPerPixel = 277
  private val PlanarConfig = 284
  private val TileWidth = 322; private val TileLength = 323
  private val TileOffsets = 324; private val TileByteCounts = 325
  private val SampleFormat = 339
  private val ModelPixelScale = 33550; private val ModelTiepoint = 33922
  private val GeoKeyDirectory = 34735
  private val GdalMetadata = 42112

  /** Write a multiband grid (bands(b)(y)(x)) as a COG byte array. */
  def write(bands: Seq[(Band, Array[Array[Double]])],
            opts: Options = Options()): Array[Byte] = {
    require(bands.nonEmpty, "no bands")
    val h = bands.head._2.length
    val w = bands.head._2.head.length
    // full-res page + overview pages (average resample, ref cog.py:112)
    assemble(bands, opts,
      1 +: opts.overviewFactors.filter(f => w / f > 0 && h / f > 0),
      geoOnFirst = true)
  }

  /** The gdaladdo-style external overview sidecar (`<cog>.ovr`, ref
    * cog.py:91-104): a plain TIFF holding ONLY the reduced-resolution
    * pages — every IFD flagged NewSubfileType=1, no georeferencing or
    * GDAL metadata (the main COG carries those).
    */
  def writeOvr(bands: Seq[(Band, Array[Array[Double]])],
               opts: Options = Options()): Array[Byte] = {
    require(bands.nonEmpty, "no bands")
    val h = bands.head._2.length
    val w = bands.head._2.head.length
    val factors = opts.overviewFactors.filter(f => w / f > 0 && h / f > 0)
    require(factors.nonEmpty, s"grid ${w}x$h too small for any overview")
    assemble(bands, opts, factors, geoOnFirst = false)
  }

  private def assemble(bands: Seq[(Band, Array[Array[Double]])],
                       opts: Options, factors: Seq[Int],
                       geoOnFirst: Boolean): Array[Byte] = {
    val h = bands.head._2.length
    val w = bands.head._2.head.length
    val pages = factors.map { f =>
      val grids = bands.map { case (_, g) => downsample(g, f) }
      (f, grids)
    }

    // Pass 1: encode all tiles per page
    val encodedPages = pages.map { case (f, grids) =>
      val (pw, ph) = (math.max(w / f, 1), math.max(h / f, 1))
      val tiles = grids.map(g => tileBytes(g, pw, ph, opts))
      (f, pw, ph, tiles)
    }

    // Pass 2: build IFD entry sets (size-stable), then lay out —
    // header, IFDs, then tile data (COG head rule). Tile offsets are
    // known only after IFD sizes, so entries are built with placeholder
    // offsets first to measure, then rebuilt with real values (layout is
    // value-independent).
    def buildAll(tileBase: Long): Seq[Ifd] = {
      var cursor = tileBase
      encodedPages.zipWithIndex.map { case ((_, pw, ph, tiles), pageIdx) =>
        val flatTiles = tiles.flatten
        val offsets = flatTiles.map { t => val o = cursor; cursor += t.length; o }
        buildIfd(pw, ph, tiles.length, offsets,
          flatTiles.map(_.length.toLong),
          isOverview = !geoOnFirst || pageIdx > 0,
          bands.map(_._1), opts)
      }
    }
    val measured = buildAll(0L)
    val headerLen = if (opts.bigTiff) 16L else 8L
    val tileBase = headerLen + measured.map(_.size).sum
    val ifds = buildAll(tileBase)

    val out = new ByteArrayOutputStream()
    if (opts.bigTiff) {
      // BigTIFF header: magic 43, offset size 8, pad, u64 first-IFD
      val header = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      header.put('I'.toByte).put('I'.toByte).putShort(43)
      header.putShort(8).putShort(0).putLong(16L)
      out.write(header.array())
    } else {
      val header = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      header.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
      out.write(header.array())
    }
    var ifdOffset = headerLen
    ifds.zipWithIndex.foreach { case (ifd, i) =>
      val next = if (i == ifds.size - 1) 0L else ifdOffset + ifd.size
      out.write(ifd.render(ifdOffset, next))
      ifdOffset += ifd.size
    }
    encodedPages.foreach { case (_, _, _, tiles) =>
      tiles.flatten.foreach(out.write)
    }
    out.toByteArray
  }

  private def downsample(g: Array[Array[Double]], f: Int): Array[Array[Double]] = {
    if (f == 1) return g
    val h = math.max(g.length / f, 1); val w = math.max(g.head.length / f, 1)
    Array.tabulate(h, w) { (y, x) =>
      var s = 0.0; var n = 0
      for (dy <- 0 until f; dx <- 0 until f) {
        val yy = y * f + dy; val xx = x * f + dx
        if (yy < g.length && xx < g.head.length && !g(yy)(xx).isNaN) {
          s += g(yy)(xx); n += 1
        }
      }
      if (n == 0) Double.NaN else s / n
    }
  }

  /** One band's tiles, row-major over the tile grid, float64 LE, DEFLATE'd. */
  private def tileBytes(g: Array[Array[Double]], w: Int, h: Int,
                        opts: Options): Seq[Array[Byte]] = {
    val ts = opts.tileSize
    val tilesX = (w + ts - 1) / ts; val tilesY = (h + ts - 1) / ts
    for (ty <- 0 until tilesY; tx <- 0 until tilesX) yield {
      val buf = ByteBuffer.allocate(ts * ts * 8).order(ByteOrder.LITTLE_ENDIAN)
      for (y <- 0 until ts; x <- 0 until ts) {
        val yy = ty * ts + y; val xx = tx * ts + x
        buf.putDouble(if (yy < h && xx < w) g(yy)(xx) else 0.0)
      }
      if (opts.compress) deflate(buf.array()) else buf.array()
    }
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 4)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  // ---- IFD encoding ----------------------------------------------------

  private def gdalMetadataXml(bands: Seq[Band]): Array[Byte] = {
    val sb = new StringBuilder("<GDALMetadata>\n")
    bands.zipWithIndex.foreach { case (b, i) =>
      sb.append(s"""  <Item name="DESCRIPTION" sample="$i" role="description">${b.name}</Item>\n""")
      b.stats.toSeq.sortBy(_._1).foreach { case (k, v) =>
        sb.append(s"""  <Item name="$k" sample="$i">$v</Item>\n""")
      }
    }
    sb.append("</GDALMetadata>\n\u0000")
    sb.toString.getBytes("UTF-8")
  }

  /** One IFD: entries carry their payload; values <= 4 bytes are stored
    * inline in the value field (TIFF spec), larger payloads go to the
    * out-of-line area after the entry table.
    */
  private final case class IfdEntry(tag: Int, typ: Int, count: Int,
                                    payload: Array[Byte])

  /** Classic layout: 12-byte entries, u16 count, u32 next/offsets,
    * 4-byte inline values. BigTIFF: 20-byte entries, u64 count,
    * u64 next/offsets, 8-byte inline values.
    */
  private final case class Ifd(entries: Seq[IfdEntry], big: Boolean) {
    private val inlineMax = if (big) 8 else 4
    private val entriesStart =
      if (big) 8 + entries.length * 20 + 8 else 2 + entries.length * 12 + 4
    private val extraSizes = entries.map(e =>
      if (e.payload.length <= inlineMax) 0 else e.payload.length)
    val size: Long = entriesStart + extraSizes.sum

    def render(base: Long, nextIfd: Long): Array[Byte] = {
      val buf = ByteBuffer.allocate(size.toInt).order(ByteOrder.LITTLE_ENDIAN)
      if (big) buf.putLong(entries.length.toLong)
      else buf.putShort(entries.length.toShort)
      var extraOff = entriesStart
      val extras = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      entries.foreach { e =>
        buf.putShort(e.tag.toShort).putShort(e.typ.toShort)
        if (big) buf.putLong(e.count.toLong) else buf.putInt(e.count)
        if (e.payload.length <= inlineMax) {
          buf.put(java.util.Arrays.copyOf(e.payload, inlineMax))
        } else {
          if (big) buf.putLong(base + extraOff)
          else buf.putInt((base + extraOff).toInt)
          extras += e.payload
          extraOff += e.payload.length
        }
      }
      if (big) buf.putLong(nextIfd) else buf.putInt(nextIfd.toInt)
      extras.foreach(buf.put)
      buf.array()
    }
  }

  private def shorts(vs: Seq[Int]): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(v => b.putShort(v.toShort)); b.array()
  }
  private def longs4(vs: Seq[Long]): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(v => b.putInt(v.toInt)); b.array()
  }
  private def longs8(vs: Seq[Long]): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putLong); b.array()
  }
  private def doubles(vs: Seq[Double]): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putDouble); b.array()
  }

  private def buildIfd(w: Int, h: Int, nBands: Int, offsets: Seq[Long],
                       counts: Seq[Long], isOverview: Boolean,
                       bands: Seq[Band], opts: Options): Ifd = {
    val es = scala.collection.mutable.ArrayBuffer[IfdEntry]()
    def short1(tag: Int, v: Int): Unit = es += IfdEntry(tag, 3, 1, shorts(Seq(v)))
    def long1(tag: Int, v: Long): Unit = es += IfdEntry(tag, 4, 1, longs4(Seq(v)))
    if (isOverview) long1(NewSubfileType, 1L)
    long1(ImageWidth, w.toLong)
    long1(ImageLength, h.toLong)
    es += IfdEntry(BitsPerSample, 3, nBands, shorts(Seq.fill(nBands)(64)))
    short1(Compression, if (opts.compress) 8 else 1)
    short1(Photometric, 1)
    short1(SamplesPerPixel, nBands)
    short1(PlanarConfig, 2) // separate planes per band
    short1(TileWidth, opts.tileSize)
    short1(TileLength, opts.tileSize)
    if (opts.bigTiff) {
      // LONG8 (type 16) offsets/counts — the fields that overflow u32
      // in a >4 GiB mosaic
      es += IfdEntry(TileOffsets, 16, offsets.length, longs8(offsets))
      es += IfdEntry(TileByteCounts, 16, counts.length, longs8(counts))
    } else {
      es += IfdEntry(TileOffsets, 4, offsets.length, longs4(offsets))
      es += IfdEntry(TileByteCounts, 4, counts.length, longs4(counts))
    }
    es += IfdEntry(SampleFormat, 3, nBands, shorts(Seq.fill(nBands)(3)))
    if (!isOverview) {
      es += IfdEntry(ModelPixelScale, 12, 3,
        doubles(Seq(opts.pixelScale._1, opts.pixelScale._2, 0.0)))
      es += IfdEntry(ModelTiepoint, 12, 6,
        doubles(Seq(0, 0, 0, opts.origin._1, opts.origin._2, 0)))
      // GeoKeys: version 1.1.0, 3 keys: model type projected, raster
      // PixelIsArea, projected CS = epsg
      es += IfdEntry(GeoKeyDirectory, 3, 16, shorts(Seq(
        1, 1, 0, 3,
        1024, 0, 1, 1,
        1025, 0, 1, 1,
        3072, 0, 1, opts.epsg)))
      val md = gdalMetadataXml(bands)
      es += IfdEntry(GdalMetadata, 2, md.length, md)
    }
    Ifd(es.sortBy(_.tag).toSeq, opts.bigTiff)
  }
}
