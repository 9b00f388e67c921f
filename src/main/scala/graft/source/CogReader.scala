package graft.source

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

/** S6/F16 — GeoTIFF/COG structural reader (ref cog.py:78-87 re-read +
  * stac/utils.py:96-104 dtype probe): parses the IFD chain, exposes
  * per-page metadata (size, tiling, compression, sample format, GDAL
  * band metadata, GeoKeys) and decodes raster data back to per-band
  * grids. Pure JVM.
  *
  * Layout coverage (all public TIFF 6.0 / BigTIFF spec):
  *   - classic (42) and BigTIFF (43) headers, little- and big-endian;
  *   - tiled pages (the COG layout CogWriter emits) in planar (2) or
  *     chunky (1) configuration;
  *   - strip pages (StripOffsets/RowsPerStrip/StripByteCounts), the
  *     common non-cloud-optimized GeoTIFF layout;
  *   - sample types float64/float32, signed/unsigned 8/16/32-bit ints;
  *   - DEFLATE (8 and the legacy 32946 code) and LZW (5, early-change
  *     variant) with horizontal predictor 2;
  *   - JPEG (7, TechNote 2) tiles/strips, standalone or abbreviated
  *     against a JPEGTables (347) stream — the visual-COG layout;
  *   - ZSTD (50000, the GDAL COMPRESS=ZSTD extension: one zstd frame
  *     per tile/strip) with the same predictor semantics as deflate;
  *   - PackBits (32773); LZMA/WEBP/LERC rejected with pointed errors.
  */
object CogReader {

  final case class Page(
      width: Int, height: Int, tileW: Int, tileH: Int, nBands: Int,
      compression: Int, bitsPerSample: Int, sampleFormat: Int,
      isOverview: Boolean, tileOffsets: Seq[Long], tileByteCounts: Seq[Long],
      gdalMetadata: Option[String], epsg: Option[Int],
      rowsPerStrip: Int = 0, planar: Int = 2, predictor: Int = 1,
      jpegTables: Option[Array[Byte]] = None) {
    def tiled: Boolean = tileW > 0
  }

  final case class Tiff(pages: Seq[Page], bytes: Array[Byte],
                        order: ByteOrder = ByteOrder.LITTLE_ENDIAN) {
    /** dtype string per the reference's probe (stac/utils.py:103). */
    def dtype: String = pages.head match {
      case p if p.sampleFormat == 3 && p.bitsPerSample == 64 => "float64"
      case p if p.sampleFormat == 3 && p.bitsPerSample == 32 => "float32"
      case p if p.sampleFormat == 2 => s"int${p.bitsPerSample}"
      case p => s"uint${p.bitsPerSample}"
    }

    /** Decode band `b` of page `pageIdx` to a row-major grid. */
    def readBand(pageIdx: Int, b: Int): Array[Array[Double]] = {
      val p = pages(pageIdx)
      if (p.compression == 7) return readBandJpeg(p, b)
      val grid = Array.ofDim[Double](p.height, p.width)
      val ss = p.bitsPerSample / 8
      def sample(buf: ByteBuffer): Double = (p.sampleFormat, p.bitsPerSample) match {
        case (3, 64) => buf.getDouble()
        case (3, 32) => buf.getFloat().toDouble
        case (2, 8)  => buf.get().toDouble
        case (2, 16) => buf.getShort().toDouble
        case (2, 32) => buf.getInt().toDouble
        case (_, 8)  => (buf.get() & 0xFF).toDouble
        case (_, 16) => (buf.getShort() & 0xFFFF).toDouble
        case (_, 32) => (buf.getInt().toLong & 0xFFFFFFFFL).toDouble
        case other => throw new IllegalArgumentException(s"unsupported sample $other")
      }
      val chunky = p.planar == 1 && p.nBands > 1
      val valsPerPixel = if (chunky) p.nBands else 1

      def chunk(idx: Int, nPixels: Int): ByteBuffer = {
        val expected = nPixels * valsPerPixel * ss
        val raw = p.compression match {
          case 8 | 32946 =>
            inflate(bytes, p.tileOffsets(idx).toInt, p.tileByteCounts(idx).toInt,
              expected)
          case 5 =>
            lzwDecode(bytes, p.tileOffsets(idx).toInt,
              p.tileByteCounts(idx).toInt, expected)
          case 32773 =>
            packBitsDecode(bytes, p.tileOffsets(idx).toInt,
              p.tileByteCounts(idx).toInt, expected)
          case 50000 =>
            // GDAL's ZSTD extension (COMPRESSION=ZSTD): each tile/strip
            // is one plain zstd frame; predictors apply as for deflate
            val out = new Array[Byte](expected)
            val n = com.github.luben.zstd.Zstd.decompressByteArray(
              out, 0, expected,
              bytes, p.tileOffsets(idx).toInt, p.tileByteCounts(idx).toInt)
            require(n == expected,
              s"zstd tile $idx decoded $n bytes, expected $expected")
            out
          case 1 =>
            java.util.Arrays.copyOfRange(bytes, p.tileOffsets(idx).toInt,
              (p.tileOffsets(idx) + p.tileByteCounts(idx)).toInt)
          case 34925 => throw new IllegalArgumentException(
            "TIFF compression 34925 (LZMA) unsupported — rewrite the " +
              "file with DEFLATE or ZSTD (gdal_translate -co COMPRESS=ZSTD)")
          case 50001 => throw new IllegalArgumentException(
            "TIFF compression 50001 (WEBP) unsupported — lossy visual " +
              "codec; rewrite with JPEG or DEFLATE for this reader")
          // LERC stays a loud wall DELIBERATELY (r13 decision, SURVEY
          // §2.14): the Lerc2 container's normative definition is the
          // Esri C++ source (block-header bit assignments, BitStuffer2
          // LUT variants, RLE mask bytes, the v3+ Huffman path), which
          // is not available in this environment, and no externally-
          // produced LERC fixture exists here either — so a from-memory
          // implementation could only be validated against itself, the
          // mutually-inverse-but-non-conformant failure mode this
          // reader rejects codecs over. Re-entry needs the normative
          // source or a trusted fixture blob.
          case 34887 => throw new IllegalArgumentException(
            "TIFF compression 34887 (LERC) unsupported — rewrite the " +
              "file with DEFLATE or ZSTD (gdal_translate -co COMPRESS=ZSTD)")
          case c => throw new IllegalArgumentException(
            s"TIFF compression $c unsupported " +
              "(none/LZW/PackBits/deflate/ZSTD/JPEG)")
        }
        ByteBuffer.wrap(raw).order(order)
      }

      if (p.tiled) {
        val tilesX = (p.width + p.tileW - 1) / p.tileW
        val tilesY = (p.height + p.tileH - 1) / p.tileH
        val perBand = tilesX * tilesY
        for (t <- 0 until perBand) {
          val ti = if (chunky) t else b * perBand + t
          val buf = chunk(ti, p.tileW * p.tileH)
          undoPredictor(p, buf, p.tileW)
          val (ty, tx) = (t / tilesX, t % tilesX)
          for (y <- 0 until p.tileH; x <- 0 until p.tileW;
               bb <- 0 until valsPerPixel) {
            val v = sample(buf)
            val yy = ty * p.tileH + y; val xx = tx * p.tileW + x
            if (yy < p.height && xx < p.width && (!chunky || bb == b))
              grid(yy)(xx) = v
          }
        }
      } else {
        val rps = if (p.rowsPerStrip > 0) p.rowsPerStrip else p.height
        val nStrips = (p.height + rps - 1) / rps
        for (s <- 0 until nStrips) {
          val rows = math.min(rps, p.height - s * rps)
          val si = if (chunky || p.nBands == 1) s else b * nStrips + s
          val buf = chunk(si, rows * p.width)
          undoPredictor(p, buf, p.width)
          for (y <- 0 until rows; x <- 0 until p.width;
               bb <- 0 until valsPerPixel) {
            val v = sample(buf)
            if (!chunky || bb == b) grid(s * rps + y)(x) = v
          }
        }
      }
      grid
    }

    /** JPEG-compressed page (compression 7, TIFF TechNote 2 — the
      * visual-COG layout): each tile/strip is an abbreviated or
      * standalone JPEG stream. When the IFD carries a JPEGTables tag
      * (347: an SOI + quantization/Huffman segments + EOI stream), a
      * tile starting with SOI is completed by splicing tables-without-
      * EOI ahead of tile-without-SOI; decode goes through the JVM's
      * ImageIO (exact per decoder — the fixture spec compares against
      * ImageIO on the same bytes). Grayscale decodes as the single
      * band; YCbCr 3-component tiles surface as the decoder's RGB.
      */
    private def readBandJpeg(p: Page, b: Int): Array[Array[Double]] = {
      val grid = Array.ofDim[Double](p.height, p.width)
      def raster(idx: Int): java.awt.image.Raster = {
        val o = p.tileOffsets(idx).toInt
        val raw = java.util.Arrays.copyOfRange(bytes, o,
          o + p.tileByteCounts(idx).toInt)
        val stream = p.jpegTables match {
          case Some(t) if t.length > 4 && raw.length > 2 &&
              (raw(0) & 0xFF) == 0xFF && (raw(1) & 0xFF) == 0xD8 =>
            java.util.Arrays.copyOf(t, t.length - 2) ++ raw.drop(2)
          case _ => raw
        }
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(stream))
        require(img != null, s"JPEG chunk $idx failed to decode")
        img.getRaster
      }
      val chunky = p.planar == 1 && p.nBands > 1
      if (p.tiled) {
        val tilesX = (p.width + p.tileW - 1) / p.tileW
        val tilesY = (p.height + p.tileH - 1) / p.tileH
        val perBand = tilesX * tilesY
        for (t <- 0 until perBand) {
          val r = raster(if (chunky) t else b * perBand + t)
          val band = if (r.getNumBands > 1) b else 0
          val (ty, tx) = (t / tilesX, t % tilesX)
          // in-bounds pixels must exist in the decoded raster — a
          // decoder returning a smaller image than the declared tile
          // means a malformed stream, and replicating edge pixels would
          // hide it
          val needW = math.min(p.tileW, p.width - tx * p.tileW)
          val needH = math.min(p.tileH, p.height - ty * p.tileH)
          require(r.getWidth >= needW && r.getHeight >= needH,
            s"JPEG chunk $t decoded ${r.getWidth}x${r.getHeight}, " +
              s"smaller than the ${needW}x$needH in-bounds tile region")
          for (y <- 0 until p.tileH; x <- 0 until p.tileW) {
            val yy = ty * p.tileH + y; val xx = tx * p.tileW + x
            if (yy < p.height && xx < p.width)
              grid(yy)(xx) = r.getSampleDouble(x, y, band)
          }
        }
      } else {
        val rps = if (p.rowsPerStrip > 0) p.rowsPerStrip else p.height
        val nStrips = (p.height + rps - 1) / rps
        for (s <- 0 until nStrips) {
          val rows = math.min(rps, p.height - s * rps)
          val r = raster(if (chunky || p.nBands == 1) s else b * nStrips + s)
          val band = if (r.getNumBands > 1) b else 0
          for (y <- 0 until rows; x <- 0 until p.width)
            grid(s * rps + y)(x) = r.getSampleDouble(x, y, band)
        }
      }
      grid
    }

    /** Horizontal differencing (predictor 2, integer samples: delta to
      * the left neighbor) and the floating-point predictor (3, TIFF
      * Technical Note 3: each row's value bytes split into MSB→LSB
      * streams, then byte-wise delta across the whole row — decode
      * accumulates the bytes and re-interleaves them into the file's
      * byte order).
      */
    private def undoPredictor(p: Page, buf: ByteBuffer, rowW: Int): Unit = {
      if (p.predictor == 1) return
      if (p.predictor == 3) {
        require(p.sampleFormat == 3,
          s"predictor 3 requires float samples (sampleFormat ${p.sampleFormat})")
        val ss = p.bitsPerSample / 8
        val vals = if (p.planar == 1) p.nBands else 1
        val n = rowW * vals
        val rowBytes = n * ss
        val arr = buf.array()
        val tmp = new Array[Byte](rowBytes)
        var rowStart = 0
        while (rowStart + rowBytes <= arr.length) {
          var i = rowStart + 1 // byte-wise accumulate, stride 1
          while (i < rowStart + rowBytes) {
            arr(i) = (arr(i) + arr(i - 1)).toByte; i += 1
          }
          var v = 0
          while (v < n) {
            var j = 0
            while (j < ss) { // stream j carries byte j (MSB first)
              val dst = if (order == ByteOrder.LITTLE_ENDIAN) ss - 1 - j else j
              tmp(v * ss + dst) = arr(rowStart + j * n + v)
              j += 1
            }
            v += 1
          }
          System.arraycopy(tmp, 0, arr, rowStart, rowBytes)
          rowStart += rowBytes
        }
        return
      }
      require(p.predictor == 2 && p.sampleFormat != 3,
        s"unsupported predictor ${p.predictor} for sampleFormat ${p.sampleFormat}")
      val ss = p.bitsPerSample / 8
      val vals = if (p.planar == 1) p.nBands else 1
      val rowBytes = rowW * vals * ss
      val arr = buf.array()
      var rowStart = 0
      while (rowStart + rowBytes <= arr.length) {
        var i = rowStart + vals * ss
        while (i < rowStart + rowBytes) {
          (p.bitsPerSample: @unchecked) match {
            case 8 => arr(i) = (arr(i) + arr(i - vals * ss)).toByte
            case 16 =>
              val b1 = ByteBuffer.wrap(arr, i, 2).order(order)
              val prev = ByteBuffer.wrap(arr, i - vals * ss, 2).order(order).getShort()
              val cur = ByteBuffer.wrap(arr, i, 2).order(order).getShort()
              b1.putShort((cur + prev).toShort)
            case 32 =>
              val b1 = ByteBuffer.wrap(arr, i, 4).order(order)
              val prev = ByteBuffer.wrap(arr, i - vals * ss, 4).order(order).getInt()
              val cur = ByteBuffer.wrap(arr, i, 4).order(order).getInt()
              b1.putInt(cur + prev)
          }
          i += ss
        }
        rowStart += rowBytes
      }
    }
  }

  def read(bytes: Array[Byte]): Tiff = {
    val b0 = ByteBuffer.wrap(bytes)
    val order = (b0.get(), b0.get()) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case other => throw new IllegalArgumentException(s"not a TIFF: $other")
    }
    val b = ByteBuffer.wrap(bytes).order(order)
    b.position(2)
    val version = b.getShort()
    val big = version match {
      case 42 => false
      case 43 =>
        require(b.getShort() == 8 && b.getShort() == 0, "malformed BigTIFF header")
        true
      case v => throw new IllegalArgumentException(s"not a TIFF (version $v)")
    }
    var ifdOff = if (big) b.getLong() else b.getInt().toLong & 0xFFFFFFFFL
    val pages = scala.collection.mutable.ArrayBuffer[Page]()
    while (ifdOff != 0) {
      val (page, next) = readIfd(bytes, ifdOff, order, big)
      pages += page
      ifdOff = next
    }
    Tiff(pages.toSeq, bytes, order)
  }

  private def readIfd(bytes: Array[Byte], off: Long, order: ByteOrder,
                      big: Boolean): (Page, Long) = {
    val b = ByteBuffer.wrap(bytes).order(order)
    b.position(off.toInt)
    val n = if (big) b.getLong().toInt else b.getShort() & 0xFFFF
    val inlineCap = if (big) 8 else 4
    // tag -> (typ, count, valueOrOffset, inline value position)
    var tags = Map.empty[Int, (Int, Int, Long, Int)]
    (0 until n).foreach { _ =>
      val tag = b.getShort() & 0xFFFF
      val typ = b.getShort() & 0xFFFF
      val count = (if (big) b.getLong() else b.getInt().toLong).toInt
      val valuePos = b.position()
      val v = if (big) b.getLong() else b.getInt().toLong & 0xFFFFFFFFL
      tags += tag -> ((typ, count, v, valuePos))
    }
    val nextIfd = if (big) b.getLong() else b.getInt().toLong & 0xFFFFFFFFL

    def typeSize(t: Int): Int = t match {
      case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 | 11 => 4
      case 5 | 10 | 12 | 16 | 17 => 8
    }
    def values(tag: Int): Seq[Long] = tags.get(tag) match {
      case None => Nil
      case Some((typ, count, v, valuePos)) =>
        val total = typeSize(typ) * count
        val src = ByteBuffer.wrap(bytes).order(order)
        src.position(if (total <= inlineCap) valuePos else v.toInt)
        (0 until count).map { _ =>
          typ match {
            case 1 => (src.get() & 0xFF).toLong
            case 3 => (src.getShort() & 0xFFFF).toLong
            case 4 => src.getInt().toLong & 0xFFFFFFFFL
            case _ => src.getLong()
          }
        }
    }
    def ascii(tag: Int): Option[String] = tags.get(tag).map {
      case (_, count, v, valuePos) =>
        val start = if (count <= inlineCap) valuePos else v.toInt
        new String(bytes, start, count, "UTF-8").takeWhile(_ != '\u0000')
    }
    def raw(tag: Int): Option[Array[Byte]] = tags.get(tag).map {
      case (_, count, v, valuePos) =>
        val start = if (count <= inlineCap) valuePos else v.toInt
        java.util.Arrays.copyOfRange(bytes, start, start + count)
    }

    def one(tag: Int, default: Long = 0): Long = values(tag).headOption.getOrElse(default)

    val geoKeys = values(34735)
    val epsg = geoKeys.grouped(4).collectFirst {
      case Seq(3072, _, _, code) => code.toInt
    }
    val tiled = tags.contains(322)
    val page = Page(
      width = one(256).toInt, height = one(257).toInt,
      tileW = one(322).toInt, tileH = one(323).toInt,
      nBands = one(277, 1).toInt,
      compression = one(259, 1).toInt,
      bitsPerSample = one(258, 1).toInt,
      sampleFormat = one(339, 1).toInt,
      isOverview = (one(254) & 1L) == 1L,
      tileOffsets = if (tiled) values(324) else values(273),
      tileByteCounts = if (tiled) values(325) else values(279),
      gdalMetadata = ascii(42112), epsg = epsg,
      rowsPerStrip = one(278).toInt,
      planar = one(284, if (tiled) 2 else 1).toInt,
      predictor = one(317, 1).toInt,
      jpegTables = raw(347))
    (page, nextIfd)
  }

  /** PackBits RLE (compression 32773, TIFF 6.0 §9): flag byte n in
    * 0..127 copies n+1 literal bytes; −1..−127 repeats the next byte
    * 1−n times; −128 is a no-op.
    */
  private[graft] def packBitsDecode(bytes: Array[Byte], off: Int, len: Int,
                                    expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var pos = off
    val end = off + len
    var o = 0
    while (o < expected && pos < end) {
      val n = bytes(pos); pos += 1
      if (n >= 0) {
        val cnt = n + 1
        require(pos + cnt <= end && o + cnt <= expected,
          s"PackBits literal run of $cnt overruns at $pos")
        System.arraycopy(bytes, pos, out, o, cnt)
        pos += cnt; o += cnt
      } else if (n != -128) {
        val cnt = 1 - n
        require(pos < end && o + cnt <= expected,
          s"PackBits repeat run of $cnt overruns at $pos")
        java.util.Arrays.fill(out, o, o + cnt, bytes(pos))
        pos += 1; o += cnt
      }
    }
    require(o == expected,
      s"PackBits stream produced $o of $expected bytes")
    out
  }

  /** TIFF-variant LZW (compression 5, TIFF 6.0 §13): MSB-first bit
    * packing, ClearCode 256 / EOI 257, code width 9→12 bits with the
    * "early change" (width bumps one code BEFORE the table index forces
    * it — at 510/1022/2046).
    */
  private[graft] def lzwDecode(bytes: Array[Byte], off: Int, len: Int,
                                expected: Int): Array[Byte] = {
    val Clear = 256; val Eoi = 257
    val out = new java.io.ByteArrayOutputStream(expected)
    val table = new Array[Array[Byte]](4096)
    var tableSize = 0
    def resetTable(): Unit = {
      var i = 0
      while (i < 256) { table(i) = Array(i.toByte); i += 1 }
      tableSize = 258
    }
    resetTable()
    var bitPos = 0L
    val bitEnd = len.toLong * 8
    def width = if (tableSize < 511) 9 else if (tableSize < 1023) 10
      else if (tableSize < 2047) 11 else 12
    def nextCode(w: Int): Int = {
      if (bitPos + w > bitEnd) return Eoi
      var v = 0; var i = 0
      while (i < w) {
        val byteIdx = off + (bitPos >> 3).toInt
        val bit = 7 - (bitPos & 7).toInt
        v = (v << 1) | ((bytes(byteIdx) >> bit) & 1)
        bitPos += 1; i += 1
      }
      v
    }
    var prev: Array[Byte] = null
    var code = nextCode(width)
    while (code != Eoi && out.size() < expected) {
      if (code == Clear) {
        resetTable()
        code = nextCode(width)
        if (code == Eoi) return java.util.Arrays.copyOf(out.toByteArray, expected)
        out.write(table(code))
        prev = table(code)
      } else {
        val entry =
          if (code < tableSize && table(code) != null) table(code)
          else prev :+ prev(0) // the KwKwK case
        out.write(entry)
        if (prev != null && tableSize < 4096) {
          table(tableSize) = prev :+ entry(0)
          tableSize += 1
        }
        prev = entry
      }
      code = nextCode(width)
    }
    java.util.Arrays.copyOf(out.toByteArray, expected)
  }

  private def inflate(bytes: Array[Byte], off: Int, len: Int,
                      expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(bytes, off, len)
    val out = new Array[Byte](expected)
    var pos = 0
    while (!inf.finished() && pos < expected)
      pos += inf.inflate(out, pos, expected - pos)
    inf.end()
    out
  }
}
