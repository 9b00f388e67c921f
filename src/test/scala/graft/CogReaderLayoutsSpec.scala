package graft

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite
import graft.source.CogReader

/** CogReader layout coverage beyond CogWriter's own output: strip
  * organization, big-endian, BigTIFF headers, horizontal predictor, and
  * chunky (interleaved) planar configuration — each as a minimal
  * hand-built TIFF.
  */
class CogReaderLayoutsSpec extends AnyFunSuite {

  /** Minimal single-IFD TIFF builder. Strip data lands right after the
    * header; external value arrays follow; the IFD comes last.
    */
  private def buildTiff(order: ByteOrder, big: Boolean,
                        entries: Seq[(Int, Int, Seq[Long])],
                        data: Array[Byte]): Array[Byte] = {
    val headerLen = if (big) 16 else 8
    val dataOff = headerLen
    val inlineCap = if (big) 8 else 4
    def typeSize(t: Int) = t match {
      case 1 | 7 => 1; case 3 => 2; case 4 => 4; case 16 => 8
    }
    // lay out external arrays after the data block
    var extOff = dataOff + data.length
    val ext = ByteBuffer.allocate(4096).order(order)
    val resolved = entries.map { case (tag, typ, vals) =>
      val total = typeSize(typ) * vals.length
      if (total <= inlineCap) (tag, typ, vals, None)
      else {
        val off = extOff
        vals.foreach { v =>
          typ match {
            case 1 | 7 => ext.put(v.toByte)
            case 3 => ext.putShort(v.toShort)
            case 4 => ext.putInt(v.toInt)
            case 16 => ext.putLong(v)
          }
        }
        extOff += total
        (tag, typ, vals, Some(off))
      }
    }
    val ifdOff = extOff
    val out = ByteBuffer.allocate(8192).order(order)
    // header
    out.put((if (order == ByteOrder.LITTLE_ENDIAN) "II" else "MM").getBytes)
    if (big) { out.putShort(43); out.putShort(8); out.putShort(0); out.putLong(ifdOff) }
    else { out.putShort(42); out.putInt(ifdOff) }
    while (out.position() < dataOff) out.put(0.toByte)
    out.put(data)
    out.put(java.util.Arrays.copyOf(ext.array(), extOff - (dataOff + data.length)))
    // IFD
    if (big) out.putLong(resolved.length) else out.putShort(resolved.length.toShort)
    resolved.sortBy(_._1).foreach { case (tag, typ, vals, extOpt) =>
      out.putShort(tag.toShort); out.putShort(typ.toShort)
      if (big) out.putLong(vals.length) else out.putInt(vals.length)
      val before = out.position()
      extOpt match {
        case Some(off) => if (big) out.putLong(off) else out.putInt(off)
        case None => vals.foreach { v =>
          typ match {
            case 1 | 7 => out.put(v.toByte)
            case 3 => out.putShort(v.toShort)
            case 4 => out.putInt(v.toInt)
            case 16 => out.putLong(v)
          }
        }
      }
      while (out.position() < before + inlineCap) out.put(0.toByte)
    }
    if (big) out.putLong(0L) else out.putInt(0)
    java.util.Arrays.copyOf(out.array(), out.position())
  }

  private def baseEntries(w: Int, h: Int, bits: Int, fmt: Int,
                          stripOffs: Seq[Long], stripCounts: Seq[Long],
                          rps: Int, bands: Int = 1): Seq[(Int, Int, Seq[Long])] = Seq(
    (256, 4, Seq(w.toLong)), (257, 4, Seq(h.toLong)),
    (258, 3, Seq.fill(bands)(bits.toLong)), (277, 3, Seq(bands.toLong)),
    (278, 4, Seq(rps.toLong)), (273, 4, stripOffs), (279, 4, stripCounts),
    (339, 3, Seq.fill(bands)(fmt.toLong)))

  test("classic little-endian two-strip uint8") {
    // 3x4 image, 2 rows per strip -> 2 strips of 6 bytes
    val data = Array.tabulate(12)(i => i.toByte)
    val bytes = buildTiff(ByteOrder.LITTLE_ENDIAN, big = false,
      baseEntries(3, 4, 8, 1, Seq(8L, 14L), Seq(6L, 6L), rps = 2), data)
    val t = CogReader.read(bytes)
    assert(t.dtype === "uint8")
    assert(!t.pages.head.tiled)
    val g = t.readBand(0, 0)
    assert(g(0).toSeq === Seq(0.0, 1.0, 2.0))
    assert(g(3).toSeq === Seq(9.0, 10.0, 11.0))
  }

  test("big-endian single-strip float32") {
    val bb = ByteBuffer.allocate(4 * 4).order(ByteOrder.BIG_ENDIAN)
    Seq(1.5f, -2.25f, 0f, 100f).foreach(bb.putFloat)
    val bytes = buildTiff(ByteOrder.BIG_ENDIAN, big = false,
      baseEntries(2, 2, 32, 3, Seq(8L), Seq(16L), rps = 2), bb.array())
    val t = CogReader.read(bytes)
    assert(t.dtype === "float32")
    val g = t.readBand(0, 0)
    assert(g(0)(0) === 1.5 && g(0)(1) === -2.25 && g(1)(1) === 100.0)
  }

  test("BigTIFF single-strip float64") {
    val bb = ByteBuffer.allocate(8 * 4).order(ByteOrder.LITTLE_ENDIAN)
    Seq(0.125, 7.5, -1.0, 42.0).foreach(bb.putDouble)
    val bytes = buildTiff(ByteOrder.LITTLE_ENDIAN, big = true,
      baseEntries(2, 2, 64, 3, Seq(16L), Seq(32L), rps = 2), bb.array())
    val t = CogReader.read(bytes)
    assert(t.dtype === "float64")
    val g = t.readBand(0, 0)
    assert(g(0)(0) === 0.125 && g(1)(1) === 42.0)
  }

  test("horizontal predictor 2 on int16 strips") {
    // row values 100, 103, 105 stored as deltas 100, +3, +2
    val bb = ByteBuffer.allocate(2 * 6).order(ByteOrder.LITTLE_ENDIAN)
    Seq(100, 3, 2, 50, -5, 1).foreach(v => bb.putShort(v.toShort))
    val bytes = buildTiff(ByteOrder.LITTLE_ENDIAN, big = false,
      baseEntries(3, 2, 16, 2, Seq(8L), Seq(12L), rps = 2) :+
        ((317, 3, Seq(2L))), bb.array())
    val g = CogReader.read(bytes).readBand(0, 0)
    assert(g(0).toSeq === Seq(100.0, 103.0, 105.0))
    assert(g(1).toSeq === Seq(50.0, 45.0, 46.0))
  }

  test("floating-point predictor 3 on float32 strips (TIFF TechNote 3)") {
    // encode reference: per row, split value bytes into MSB→LSB streams,
    // then byte-delta across the whole row
    val rows = Seq(Seq(1.5f, -2.25f, 100f), Seq(0.125f, 3f, -8f))
    def encodeRow(vals: Seq[Float]): Array[Byte] = {
      val be = ByteBuffer.allocate(vals.length * 4).order(ByteOrder.BIG_ENDIAN)
      vals.foreach(be.putFloat)
      val b = be.array()
      val split = new Array[Byte](b.length)
      for (v <- vals.indices; j <- 0 until 4)
        split(j * vals.length + v) = b(v * 4 + j)
      val out = split.clone()
      for (i <- (out.length - 1) to 1 by -1)
        out(i) = (split(i) - split(i - 1)).toByte
      out
    }
    val data = rows.flatMap(encodeRow(_)).toArray
    val bytes = buildTiff(ByteOrder.LITTLE_ENDIAN, big = false,
      baseEntries(3, 2, 32, 3, Seq(8L), Seq(data.length.toLong), rps = 2) :+
        ((317, 3, Seq(3L))), data)
    val g = CogReader.read(bytes).readBand(0, 0)
    assert(g(0).toSeq === Seq(1.5, -2.25, 100.0))
    assert(g(1).toSeq === Seq(0.125, 3.0, -8.0))
    // big-endian file, float64 variant
    val rows64 = Seq(Seq(0.5, -4.25), Seq(17.0, 0.0))
    def encodeRow64(vals: Seq[Double]): Array[Byte] = {
      val be = ByteBuffer.allocate(vals.length * 8).order(ByteOrder.BIG_ENDIAN)
      vals.foreach(be.putDouble)
      val b = be.array()
      val split = new Array[Byte](b.length)
      for (v <- vals.indices; j <- 0 until 8)
        split(j * vals.length + v) = b(v * 8 + j)
      val out = split.clone()
      for (i <- (out.length - 1) to 1 by -1)
        out(i) = (split(i) - split(i - 1)).toByte
      out
    }
    val data64 = rows64.flatMap(encodeRow64(_)).toArray
    val bytes64 = buildTiff(ByteOrder.BIG_ENDIAN, big = false,
      baseEntries(2, 2, 64, 3, Seq(8L), Seq(data64.length.toLong), rps = 2) :+
        ((317, 3, Seq(3L))), data64)
    val g64 = CogReader.read(bytes64).readBand(0, 0)
    assert(g64(0).toSeq === Seq(0.5, -4.25))
    assert(g64(1).toSeq === Seq(17.0, 0.0))
  }

  test("chunky (planar=1) interleaved two-band uint8") {
    // 2x2, bands interleaved per pixel: (b0,b1) pairs
    val data = Array[Byte](10, 110, 20, 120, 30, (130 & 0xFF).toByte, 40, (140 & 0xFF).toByte)
    val bytes = buildTiff(ByteOrder.LITTLE_ENDIAN, big = false,
      baseEntries(2, 2, 8, 1, Seq(8L), Seq(8L), rps = 2, bands = 2) :+
        ((284, 3, Seq(1L))), data)
    val t = CogReader.read(bytes)
    val b0 = t.readBand(0, 0)
    val b1 = t.readBand(0, 1)
    assert(b0(0).toSeq === Seq(10.0, 20.0) && b0(1).toSeq === Seq(30.0, 40.0))
    assert(b1(0).toSeq === Seq(110.0, 120.0) && b1(1).toSeq === Seq(130.0, 140.0))
  }

  // ---- JPEG compression (7): the visual-COG layout

  /** grayscale JPEG bytes for a deterministic 16×16 gradient */
  private def grayJpeg(seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      img.getRaster.setSample(x, y, 0, (x * 13 + y * 7 + seed) % 256)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** expected grid: ImageIO's own decode of the same JPEG bytes */
  private def decodeRef(jpeg: Array[Byte]): Array[Array[Double]] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpeg))
    Array.tabulate(img.getHeight, img.getWidth)((y, x) =>
      img.getRaster.getSampleDouble(x, y, 0))
  }

  /** split a JFIF stream into (tables: SOI+DQT/DHT+EOI, body: the
    * stream with DQT/DHT removed) — the JPEGTables/abbreviated pair
    */
  private def splitJpeg(jpeg: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val tables = new java.io.ByteArrayOutputStream()
    val body = new java.io.ByteArrayOutputStream()
    tables.write(0xFF); tables.write(0xD8)
    body.write(0xFF); body.write(0xD8)
    var i = 2
    var done = false
    while (!done && i + 4 <= jpeg.length) {
      assert((jpeg(i) & 0xFF) == 0xFF, s"marker expected at $i")
      val m = jpeg(i + 1) & 0xFF
      if (m == 0xDA) { // SOS: entropy data to EOI — all body
        body.write(jpeg, i, jpeg.length - i)
        done = true
      } else {
        val len = ((jpeg(i + 2) & 0xFF) << 8) | (jpeg(i + 3) & 0xFF)
        val seg = 2 + len
        if (m == 0xDB || m == 0xC4) tables.write(jpeg, i, seg) // DQT/DHT
        else body.write(jpeg, i, seg)
        i += seg
      }
    }
    tables.write(0xFF); tables.write(0xD9)
    (tables.toByteArray, body.toByteArray)
  }

  private def jpegTiffEntries(w: Int, h: Int, offs: Seq[Long],
                              counts: Seq[Long]): Seq[(Int, Int, Seq[Long])] =
    Seq((256, 4, Seq(w.toLong)), (257, 4, Seq(h.toLong)),
      (258, 3, Seq(8L)), (277, 3, Seq(1L)), (259, 3, Seq(7L)),
      (262, 3, Seq(1L)), (284, 3, Seq(1L)),
      (322, 4, Seq(16L)), (323, 4, Seq(16L)),
      (324, 4, offs), (325, 4, counts))

  test("JPEG-compressed tiles (compression 7) decode via ImageIO, " +
    "bit-equal to ImageIO on the standalone streams") {
    val tiles = Seq(grayJpeg(0), grayJpeg(50), grayJpeg(100), grayJpeg(150))
    val offs = tiles.map(_.length.toLong).scanLeft(8L)(_ + _).init
    val bytes = buildTiff(ByteOrder.LITTLE_ENDIAN, big = false,
      jpegTiffEntries(32, 32, offs, tiles.map(_.length.toLong)),
      tiles.flatten.toArray)
    val t = CogReader.read(bytes)
    assert(t.pages.head.compression === 7 && t.pages.head.tiled)
    val g = t.readBand(0, 0)
    val refs = tiles.map(decodeRef)
    for (ti <- 0 until 4; y <- 0 until 16; x <- 0 until 16)
      assert(g((ti / 2) * 16 + y)((ti % 2) * 16 + x) === refs(ti)(y)(x),
        s"tile $ti ($x,$y)")
  }

  test("3-band (YCbCr) JPEG strips decode per band, matching ImageIO " +
    "on the standalone stream") {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, ((x * 16) << 16) | ((y * 16) << 8) | ((x + y) * 7))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val jpeg = out.toByteArray
    val entries = Seq((256, 4, Seq(16L)), (257, 4, Seq(16L)),
      (258, 3, Seq(8L, 8L, 8L)), (277, 3, Seq(3L)), (259, 3, Seq(7L)),
      (262, 3, Seq(6L)), (284, 3, Seq(1L)), (278, 4, Seq(16L)),
      (273, 4, Seq(8L)), (279, 4, Seq(jpeg.length.toLong)))
    val bytes = buildTiff(ByteOrder.LITTLE_ENDIAN, big = false, entries, jpeg)
    val t = CogReader.read(bytes)
    assert(t.pages.head.nBands === 3 && !t.pages.head.tiled)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpeg))
    for (b <- 0 until 3) {
      val g = t.readBand(0, b)
      for (y <- 0 until 16; x <- 0 until 16)
        assert(g(y)(x) === ref.getRaster.getSampleDouble(x, y, b),
          s"band $b ($x,$y)")
    }
  }

  test("abbreviated JPEG tiles against a JPEGTables (347) stream " +
    "decode identically to their standalone forms") {
    val full = Seq(grayJpeg(0), grayJpeg(50), grayJpeg(100), grayJpeg(150))
    val (tables, _) = splitJpeg(full.head)
    // all tiles share the head tile's tables (same encoder settings),
    // exactly what JPEGTables exists for
    val abbrev = full.map(j => splitJpeg(j)._2)
    val offs = abbrev.map(_.length.toLong).scanLeft(8L)(_ + _).init
    val bytes = buildTiff(ByteOrder.LITTLE_ENDIAN, big = false,
      jpegTiffEntries(32, 32, offs, abbrev.map(_.length.toLong)) :+
        ((347, 7, tables.map(b => (b & 0xFF).toLong).toSeq)),
      abbrev.flatten.toArray)
    val t = CogReader.read(bytes)
    assert(t.pages.head.jpegTables.exists(_.sameElements(tables)))
    val g = t.readBand(0, 0)
    val refs = full.map(decodeRef)
    for (ti <- 0 until 4; y <- 0 until 16; x <- 0 until 16)
      assert(g((ti / 2) * 16 + y)((ti % 2) * 16 + x) === refs(ti)(y)(x),
        s"tile $ti ($x,$y)")
  }

  test("PackBits strips (compression 32773) decode; literal, repeat " +
    "and no-op runs") {
    // 4x3 uint8, one strip; rows hand-packed: a repeat run, a literal
    // run, a -128 no-op between runs
    val pixels = Array[Byte](
      9, 9, 9, 9,      // row 0: repeat run
      1, 2, 3, 4,      // row 1: literal run
      7, 7, 5, 6)      // row 2: short repeat + literal
    val packed = Array[Byte](
      (-3).toByte, 9,                    // 9 x4
      (-128).toByte,                     // no-op filler
      3, 1, 2, 3, 4,                     // literal x4
      (-1).toByte, 7,                    // 7 x2
      1, 5, 6)                           // literal x2
    val entries = baseEntries(4, 3, 8, 1,
      Seq(8L), Seq(packed.length.toLong), rps = 3) :+
      (259, 3, Seq(32773L))
    val t = CogReader.read(buildTiff(ByteOrder.LITTLE_ENDIAN,
      big = false, entries, packed))
    assert(t.pages.head.compression === 32773)
    val g = t.readBand(0, 0)
    assert(g.flatten.toSeq === pixels.map(_.toDouble).toSeq)
    // unknown compressions now fail loudly instead of raw-copying
    val bad = baseEntries(4, 3, 8, 1, Seq(8L),
      Seq(12L), rps = 3) :+ (259, 3, Seq(4L)) // CCITT T.6
    val tb = CogReader.read(buildTiff(ByteOrder.LITTLE_ENDIAN,
      big = false, bad, pixels))
    val e = intercept[IllegalArgumentException] { tb.readBand(0, 0) }
    assert(e.getMessage.contains("compression 4"))
  }

  test("ZSTD strips (compression 50000, GDAL extension) decode with " +
    "horizontal predictor 2") {
    // 3x2 int16 with predictor 2: rows 100,103,105 / 50,45,46 stored
    // as per-row deltas, then each strip zstd-compressed whole
    val deltas = ByteBuffer.allocate(2 * 6).order(ByteOrder.LITTLE_ENDIAN)
    Seq(100, 3, 2, 50, -5, 1).foreach(v => deltas.putShort(v.toShort))
    val packed = com.github.luben.zstd.Zstd.compress(deltas.array(), 3)
    val entries = baseEntries(3, 2, 16, 2,
      Seq(8L), Seq(packed.length.toLong), rps = 2) :+
      (259, 3, Seq(50000L)) :+ (317, 3, Seq(2L))
    val t = CogReader.read(buildTiff(ByteOrder.LITTLE_ENDIAN,
      big = false, entries, packed))
    assert(t.pages.head.compression === 50000)
    val g = t.readBand(0, 0)
    assert(g(0).toSeq === Seq(100.0, 103.0, 105.0))
    assert(g(1).toSeq === Seq(50.0, 45.0, 46.0))
    // a frame that inflates to the wrong size fails loudly
    val short = com.github.luben.zstd.Zstd.compress(Array[Byte](1, 2), 3)
    val bad = baseEntries(3, 2, 16, 2,
      Seq(8L), Seq(short.length.toLong), rps = 2) :+ (259, 3, Seq(50000L))
    val tb = CogReader.read(buildTiff(ByteOrder.LITTLE_ENDIAN,
      big = false, bad, short))
    intercept[Exception] { tb.readBand(0, 0) }
  }

  test("LZMA / WEBP / LERC compressions are rejected with pointed, " +
    "actionable messages") {
    for ((code, hint) <- Seq(34925L -> "LZMA", 50001L -> "WEBP",
        34887L -> "LERC")) {
      val entries = baseEntries(2, 2, 8, 1, Seq(8L), Seq(4L), rps = 2) :+
        (259, 3, Seq(code))
      val t = CogReader.read(buildTiff(ByteOrder.LITTLE_ENDIAN,
        big = false, entries, Array[Byte](1, 2, 3, 4)))
      val e = intercept[IllegalArgumentException] { t.readBand(0, 0) }
      assert(e.getMessage.contains(hint), s"message for $code: ${e.getMessage}")
    }
  }
}
