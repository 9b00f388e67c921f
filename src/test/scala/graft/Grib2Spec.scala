package graft

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite
import graft.source.{Grib2, Grib2Write}

/** GRIB2 decode pinned two ways: a HAND-BUILT message (every octet
  * placed from the WMO section layout here in the test, independent of
  * Grib2Write) with hand-computed expected values, and writer
  * round-trips over bitmaps, negative coordinates, scan modes and
  * scale factors.
  */
class Grib2Spec extends AnyFunSuite {

  /** Octet-by-octet message builder used by the hand fixtures.
    * `sec5Payload`, when set, replaces everything after section 5's
    * 5-byte header + point count + template number.
    */
  private def handMessage(scanMode: Int = 0, dataTemplate: Int = 0,
                          gridTemplate: Int = 0, edition: Int = 2,
                          packedBytes: Array[Byte] = Array(0x01, 0x23, 0x4F)
                            .map(_.toByte),
                          sec5Payload: Option[Array[Byte]] = None)
  : Array[Byte] = {
    val b = ByteBuffer.allocate(4096).order(ByteOrder.BIG_ENDIAN)
    b.put("GRIB".getBytes); b.putShort(0)
    b.put(0.toByte) // discipline 0 (meteorological)
    b.put(edition.toByte)
    val lenAt = b.position(); b.putLong(0L)
    def sec(num: Int)(fill: ByteBuffer => Unit): Unit = {
      val at = b.position(); b.putInt(0); b.put(num.toByte)
      fill(b)
      b.putInt(at, b.position() - at)
    }
    sec(1) { s =>
      s.putShort(7); s.putShort(0); s.put(2.toByte); s.put(0.toByte)
      s.put(1.toByte)
      s.putShort(2024); s.put(3.toByte); s.put(5.toByte)
      s.put(6.toByte); s.put(0.toByte); s.put(0.toByte)
      s.put(0.toByte); s.put(1.toByte)
    }
    sec(3) { s =>
      s.put(0.toByte); s.putInt(6); s.put(0.toByte); s.put(0.toByte)
      s.putShort(gridTemplate.toShort)
      s.put(6.toByte); s.put(0.toByte); s.putInt(0)
      s.put(0.toByte); s.putInt(0); s.put(0.toByte); s.putInt(0)
      s.putInt(3); s.putInt(2) // ni=3, nj=2
      if (gridTemplate == 20) {
        // polar stereographic (NSIDC-style north grid)
        s.putInt(30000000) // La1 = 30.0
        s.putInt(0x80000000 | 150000000) // Lo1 = -150.0
        s.put(0x08.toByte)
        s.putInt(60000000) // LaD = 60.0 (true-scale parallel)
        s.putInt(0x80000000 | 45000000) // LoV = -45.0
        s.putInt(25000000); s.putInt(25000000) // Dx = Dy = 25 km in mm
        s.put(0.toByte) // projection centre: north pole
        s.put(scanMode.toByte)
      } else if (gridTemplate == 30) {
        // Lambert 3.30 (HRRR-shaped): first point, LaD/LoV, mm
        // increments, cone parallels
        s.putInt(21138000) // La1 = 21.138
        s.putInt(0x80000000 | 122720000) // Lo1 = -122.72
        s.put(0x08.toByte)
        s.putInt(38500000) // LaD = 38.5
        s.putInt(0x80000000 | 97500000) // LoV = -97.5
        s.putInt(3000000); s.putInt(3000000) // Dx = Dy = 3000 m (in mm)
        s.put(0.toByte) // projection centre: north
        s.put(scanMode.toByte)
        s.putInt(38500000); s.putInt(38500000) // Latin1 = Latin2 = 38.5
        s.putInt(0x80000000 | 90000000); s.putInt(0) // southern pole
      } else if (gridTemplate == 10) {
        // Mercator 3.10 (tropical sector). NOTE the template's octet
        // order: scan mode + orientation sit BEFORE Di/Dj.
        s.putInt(20000000) // La1 = 20.0
        s.putInt(100000000) // Lo1 = 100.0
        s.put(0x30.toByte)
        s.putInt(20000000) // LaD = 20.0 (true-scale parallel)
        s.putInt(19000000); s.putInt(101000000) // La2/Lo2 (derivable)
        s.put(scanMode.toByte)
        s.putInt(0) // orientation: i east
        s.putInt(50000000) // Di = 50 km in mm
        s.putInt(50000000) // Dj
      } else if (gridTemplate == 90) {
        // space view 3.90 (GOES-East-shaped, on the hand sphere):
        // disk spans 16 grid lengths, sub-satellite pixel (8,8),
        // sector origin (3,4), camera at 6.6107 equatorial radii
        s.putInt(0) // Lap: geostationary
        s.putInt(0x80000000 | 75000000) // Lop = -75.0
        s.put(0.toByte)
        s.putInt(16); s.putInt(16) // dx, dy (apparent diameters)
        s.putInt(8000); s.putInt(8000) // Xp, Yp in 10⁻³ grid lengths
        s.put(scanMode.toByte)
        s.putInt(0) // orientation
        s.putInt(6610700) // Nr in 10⁻⁶ equatorial radii
        s.putInt(3); s.putInt(4) // Xo, Yo
      } else {
        s.putInt(0); s.putInt(0)
        s.putInt(50500000) // lat1 = 50.5
        s.putInt(0x80000000 | 10250000) // lon1 = -10.25 (sign-magnitude)
        s.put(0x30.toByte)
        s.putInt(49500000); s.putInt(0x80000000 | 9250000) // lat2/lon2
        s.putInt(500000) // dLon = 0.5
        s.putInt(1000000) // dLat = 1.0
        s.put(scanMode.toByte)
        if (gridTemplate == 1) {
          // rotated lat/lon (3.1): the CORDEX EUR pole stored as the
          // SOUTHERN pole of projection (-39.25, 18.0), rotation 0
          s.putInt(0x80000000 | 39250000)
          s.putInt(18000000)
          s.putInt(0)
        }
      }
    }
    sec(4) { s =>
      s.putShort(0); s.putShort(0)
      s.put(3.toByte); s.put(5.toByte) // category 3, parameter 5
      s.put(2.toByte); s.put(0.toByte); s.put(0.toByte)
      s.putShort(0); s.put(0.toByte)
      s.put(1.toByte); s.putInt(6) // 6 hours
    }
    sec(5) { s =>
      s.putInt(6); s.putShort(dataTemplate.toShort)
      sec5Payload match {
        case Some(p) => s.put(p)
        case None =>
          s.putFloat(1.5f)
          s.putShort(1) // E = 1 → ×2
          s.putShort(0) // D = 0
          s.put(4.toByte) // 4 bits per value
          s.put(0.toByte)
      }
    }
    sec(6) { s => s.put(255.toByte) }
    sec(7) { s => s.put(packedBytes) }
    b.put("7777".getBytes)
    val total = b.position()
    b.putLong(lenAt, total.toLong)
    java.util.Arrays.copyOf(b.array(), total)
  }

  test("hand-built message decodes: header fields, sign-magnitude " +
    "coordinates, and Y = R + X·2^E with hand-computed values") {
    val fields = Grib2.read(handMessage())
    assert(fields.length === 1)
    val f = fields.head
    assert(f.discipline === 0 && f.category === 3 && f.parameter === 5)
    assert(f.refTime === "2024-03-05T06:00:00Z")
    assert(f.forecastHours === Some(6))
    assert(f.ni === 3 && f.nj === 2)
    assert(f.lat1 === 50.5 && f.lon1 === -10.25)
    assert(f.dLat === 1.0 && f.dLon === 0.5)
    // packed nibbles 0,1,2,3,4,15 → 1.5 + X·2
    assert(f.values.toSeq === Seq(1.5, 3.5, 5.5, 7.5, 9.5, 31.5))
  }

  test("scan-mode normalization: −i reverses rows, +j reverses row " +
    "order, j-consecutive is rejected") {
    val base = Grib2.read(handMessage()).head.values.toSeq
    // 0x80: stored east→west per row → decoder un-reverses each row
    val negI = Grib2.read(handMessage(scanMode = 0x80)).head.values.toSeq
    assert(negI === Seq(5.5, 3.5, 1.5, 31.5, 9.5, 7.5))
    // 0x40: stored south→north → decoder swaps the two rows
    val posJ = Grib2.read(handMessage(scanMode = 0x40)).head.values.toSeq
    assert(posJ === Seq(7.5, 9.5, 31.5, 1.5, 3.5, 5.5))
    val e = intercept[IllegalArgumentException] {
      Grib2.read(handMessage(scanMode = 0x20))
    }
    assert(e.getMessage.contains("j-consecutive"))
    assert(base === Seq(1.5, 3.5, 5.5, 7.5, 9.5, 31.5))
  }

  test("pointed rejections: GRIB1, lossy JPEG2000, non-latlon grids") {
    val e1 = intercept[IllegalArgumentException] {
      Grib2.read(handMessage(edition = 1))
    }
    assert(e1.getMessage.contains("GRIB1"))
    // 5.40 with compression type 1 (lossy) must reject by name
    val lossyPayload = {
      val p = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
      p.putFloat(1.5f); p.putShort(1); p.putShort(0)
      p.put(4.toByte); p.put(0.toByte)
      p.put(1.toByte) // compression type: LOSSY
      p.put(20.toByte) // target ratio
      p.array()
    }
    val e3 = intercept[IllegalArgumentException] {
      Grib2.read(handMessage(dataTemplate = 40,
        sec5Payload = Some(lossyPayload)))
    }
    assert(e3.getMessage.contains("lossy"))
    val e4 = intercept[IllegalArgumentException] {
      Grib2.read(handMessage(gridTemplate = 50)) // spherical harmonics
    }
    assert(e4.getMessage.contains("3.50"))
  }

  test("JPEG2000 packing (template 5.40): hand-built section 5 octets, " +
    "codestream raster flattens through the simple-packing transform") {
    // section 5 after (nPoints, template): R=1.5f, E=1, D=0, nbits=16,
    // original type 0, compression type 0 (lossless), ratio 255
    val payload = {
      val p = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
      p.putFloat(1.5f); p.putShort(1); p.putShort(0)
      p.put(16.toByte); p.put(0.toByte)
      p.put(0.toByte); p.put(255.toByte)
      p.array()
    }
    val samples = Array(0L, 100L, 2000L, 30000L, 65535L, 7L)
    val stream = graft.source.Jpeg2k.encode(samples, 3, 2, 16)
    val msg = handMessage(dataTemplate = 40, sec5Payload = Some(payload),
      packedBytes = stream)
    val f = Grib2.read(msg).head
    // same hand-computed expectations as the PNG twin: 1.5 + X·2^1
    assert(f.values.toSeq === samples.map(x => 1.5 + x * 2.0).toSeq)
  }

  test("writer round-trips JPEG2000 packing (5.40) incl. bitmap holes " +
    "(nPoints×1 raster) and the constant-field nbits=0 path") {
    val rnd = new scala.util.Random(5040)
    for (trial <- 0 until 2) {
      val ni = 23; val nj = 17
      val vals = Array.tabulate(ni * nj)(i =>
        if (trial == 1 && i % 37 == 3) Double.NaN
        else 250.0 + 30.0 * math.cos(i / 19.0) + rnd.nextInt(7) * 0.01)
      val spec = Grib2Write.FieldSpec(0, 3, 1, forecastHours = 12,
        ni = ni, nj = nj, lat1 = 60.0, lon1 = -10.0,
        dLat = 0.5, dLon = 0.5, values = vals,
        decimalScale = 2, packing = 40)
      val f = Grib2.read(Grib2Write.write(Seq(spec))).head
      val tol = 1.0 / 100 / 2 + 1e-9
      vals.zip(f.values).zipWithIndex.foreach { case ((a, b), i) =>
        if (a.isNaN) assert(b.isNaN, s"trial $trial cell $i")
        else assert(math.abs(a - b) <= tol, s"trial $trial cell $i: $a vs $b")
      }
    }
    val c = Grib2Write.FieldSpec(0, 0, 0, 0, 4, 3, 60.0, 0.0, 1.0, 1.0,
      Array.fill(12)(1013.25), decimalScale = 2, packing = 40)
    assert(Grib2.read(Grib2Write.write(Seq(c))).head.values
      .forall(_ == 1013.25))
  }

  test("Lambert grid (template 3.30, the HRRR native projection): cone " +
    "parameters decode and cells georeference through Geo" +
    ".LambertConformal") {
    // +j scan (0x40), as HRRR stores it: first point = SW corner
    val f = Grib2.read(handMessage(gridTemplate = 30, scanMode = 0x40)).head
    assert(f.gridType === "lambert")
    assert(f.lat1 === 21.138 && f.lon1 === -122.72)
    assert(f.dLat === 3000.0 && f.dLon === 3000.0) // meters
    val lg = f.lambert.get
    assert(lg.earthRadius === 6371229.0)
    assert(lg.lov === -97.5 && lg.laD === 38.5)
    assert(lg.latin1 === 38.5 && lg.latin2 === 38.5)
    // values flow through scan normalization like any grid (rows swap)
    assert(f.values.toSeq === Seq(7.5, 9.5, 31.5, 1.5, 3.5, 5.5))
    // georeference: the declared first point projects into the cone and
    // steps of Dx land exactly one cell apart (round-trip consistent)
    val lcc = graft.functions.Geo.LambertConformal(
      lg.earthRadius, 0.0, lg.latin1, lg.latin2, lg.laD, lg.lov)
    val (x0, y0) = lcc.forward(f.lon1, f.lat1)
    val (lonN, latN) = lcc.inverse(x0 + f.dLon, y0)
    val (xN, yN) = lcc.forward(lonN, latN)
    assert(math.abs(xN - (x0 + f.dLon)) < 1e-6 && math.abs(yN - y0) < 1e-6)
    assert(latN > 20.0 && latN < 22.0 && lonN > f.lon1) // one cell east
  }

  test("rotated lat/lon grid (template 3.1, the CORDEX/COSMO grid): " +
    "southern pole converts to the CF north pole and rows " +
    "georeference through Geo.RotatedPole") {
    val f = Grib2.read(handMessage(gridTemplate = 1)).head
    assert(f.gridType === "rotated")
    // grid axes stay in ROTATED degrees
    assert(f.lat1 === 50.5 && f.lon1 === -10.25)
    assert(f.dLat === 1.0 && f.dLon === 0.5)
    // stored southern pole (-39.25, 18.0) = CF north pole (39.25, -162)
    val rg = f.rotated.get
    assert(rg.poleLat === 39.25 && rg.poleLon === -162.0)
    // values decode exactly like the 3.0 hand message (same sec 5/7)
    assert(f.values.toSeq ===
      Grib2.read(handMessage(gridTemplate = 0)).head.values.toSeq)
    // georeference: the rotated origin (0,0) maps to the pole's
    // antipodal complement — geographic (poleLon+180, 90-poleLat) —
    // and the mapping round-trips
    val rp = graft.functions.Geo.RotatedPole(rg.poleLat, rg.poleLon)
    val (lon0, lat0) = rp.toGeo(0.0, 0.0)
    assert(math.abs(lat0 - (90.0 - 39.25)) < 1e-9)
    assert(math.abs(lon0 - 18.0) < 1e-9)
    val (rlonB, rlatB) = rp.fromGeo(lon0, lat0)
    assert(math.abs(rlonB) < 1e-9 && math.abs(rlatB) < 1e-9)
    // nonzero rotation angles are rejected loudly, not mis-decoded
    val msg = handMessage(gridTemplate = 1)
    // angle of rotation = last 4 octets of section 3; find section 3
    // (starts after the 16-byte indicator + section 1) and poke it
    val s1len = ByteBuffer.wrap(msg, 16, 4).getInt
    val s3at = 16 + s1len
    val s3len = ByteBuffer.wrap(msg, s3at, 4).getInt
    ByteBuffer.wrap(msg, s3at + s3len - 4, 4).putInt(5000000)
    val ex = intercept[IllegalArgumentException] { Grib2.read(msg) }
    assert(ex.getMessage.contains("angle-of-rotation"))
  }

  test("writer emits rotated grids (3.1) the reader decodes; the " +
    "pole survives the southern-pole encoding both ways") {
    val vals = Array.tabulate(20)(i =>
      if (i == 7) Double.NaN else 262.0 + i * 0.25)
    val spec = Grib2Write.FieldSpec(0, 0, 17, forecastHours = 4,
      ni = 5, nj = 4, lat1 = 3.5, lon1 = -8.0, dLat = 0.44, dLon = 0.44,
      values = vals, decimalScale = 2,
      rotated = Some(Grib2.RotatedGrid(poleLat = 39.25, poleLon = -162.0)))
    val f = Grib2.read(Grib2Write.write(Seq(spec))).head
    assert(f.gridType === "rotated")
    assert(f.rotated.get.poleLat === 39.25)
    assert(f.rotated.get.poleLon === -162.0)
    assert(f.lat1 === 3.5 && f.lon1 === -8.0)
    vals.zip(f.values).foreach { case (a, b2) =>
      if (a.isNaN) assert(b2.isNaN) else assert(math.abs(a - b2) <= 0.005 + 1e-9)
    }
    // an eastern-hemisphere pole wraps the stored longitude back into
    // range and returns unchanged
    val spec2 = spec.copy(rotated =
      Some(Grib2.RotatedGrid(poleLat = 31.0, poleLon = 120.0)))
    val f2 = Grib2.read(Grib2Write.write(Seq(spec2))).head
    assert(f2.rotated.get.poleLat === 31.0)
    assert(f2.rotated.get.poleLon === 120.0)
  }

  test("writer round-trip: values within the declared quantization, " +
    "NaN cells through the bitmap, negative coordinates preserved") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 10) {
      val ni = 2 + rnd.nextInt(9); val nj = 2 + rnd.nextInt(7)
      val d = trial % 3; val e = trial % 2
      val vals = Array.tabulate(ni * nj)(i =>
        if (i % 11 == 3) Double.NaN else rnd.nextDouble() * 200 - 100)
      val spec = Grib2Write.FieldSpec(0, 2, 8, forecastHours = 12 * trial,
        ni = ni, nj = nj, lat1 = -12.5, lon1 = -170.0,
        dLat = 0.25, dLon = 0.25, values = vals,
        decimalScale = d, binaryScale = e)
      val f = Grib2.read(Grib2Write.write(Seq(spec))).head
      assert(f.ni === ni && f.nj === nj)
      assert(f.lat1 === -12.5 && f.lon1 === -170.0)
      assert(f.forecastHours === Some(12 * trial))
      val tol = math.pow(2, e) / math.pow(10, d) / 2 + 1e-9
      vals.zip(f.values).zipWithIndex.foreach { case ((a, b2), i) =>
        if (a.isNaN) assert(b2.isNaN, s"trial $trial cell $i")
        else assert(math.abs(a - b2) <= tol,
          s"trial $trial cell $i: $a vs $b2 (tol $tol)")
      }
    }
  }

  test("constant field packs to nbits=0 and decodes to R everywhere; " +
    "multiple fields concatenate as independent messages") {
    val c = Grib2Write.FieldSpec(0, 0, 0, 0, 4, 3, 60.0, 0.0, 1.0, 1.0,
      Array.fill(12)(273.15), decimalScale = 2)
    val v = Grib2Write.FieldSpec(2, 0, 5, 24, 2, 2, 10.0, 5.0, 0.5, 0.5,
      Array(1.0, 2.0, 3.0, 4.0))
    val fields = Grib2.read(Grib2Write.write(Seq(c, v)))
    assert(fields.length === 2)
    assert(fields(0).values.forall(x => math.abs(x - 273.15) < 1e-6))
    assert(fields(1).discipline === 2 && fields(1).forecastHours === Some(24))
    assert(fields(1).values.toSeq === Seq(1.0, 2.0, 3.0, 4.0))
  }

  /** 5.2/5.3 template payload (octets 12-47/49 after the common 11). */
  private def complexSec5(r: Float, e: Int, d: Int, nbits: Int,
                          ng: Int, widthRef: Int, widthBits: Int,
                          lenRef: Int, lenInc: Int, lastLen: Int,
                          lenBits: Int, order: Int = 0,
                          diffOctets: Int = 0): Array[Byte] = {
    val b = ByteBuffer.allocate(64).order(ByteOrder.BIG_ENDIAN)
    b.putFloat(r); b.putShort(e.toShort); b.putShort(d.toShort)
    b.put(nbits.toByte); b.put(0.toByte)
    b.put(1.toByte) // general group splitting
    b.put(0.toByte) // no missing-value management
    b.putInt(0); b.putInt(0) // missing substitutes
    b.putInt(ng)
    b.put(widthRef.toByte); b.put(widthBits.toByte)
    b.putInt(lenRef); b.put(lenInc.toByte); b.putInt(lastLen)
    b.put(lenBits.toByte)
    if (order > 0) { b.put(order.toByte); b.put(diffOctets.toByte) }
    java.util.Arrays.copyOf(b.array(), b.position())
  }

  test("complex packing (5.2): hand-packed groups — references, " +
    "widths, scaled lengths, per-group value streams, octet-aligned " +
    "blocks — decode to the hand-computed field") {
    // X = [5,6,7 | 100,102,101]: group refs 5/100 (7 bits each),
    // widths 2/2 (3-bit block), lens 2-bit scaled (ref 3, inc 1, last 3)
    val sec7 = Array(
      0x0B, 0x90, // refs: 0000101 1100100 + 2 pad bits
      0x48,       // widths: 010 010 + pad
      0x00,       // lens: 00 00 + pad (last group overridden anyway)
      0x18, 0x90  // values: 000110 001001 + pad
    ).map(_.toByte)
    val msg = handMessage(dataTemplate = 2, packedBytes = sec7,
      sec5Payload = Some(complexSec5(0.5f, 0, 0, nbits = 7,
        ng = 2, widthRef = 0, widthBits = 3,
        lenRef = 3, lenInc = 1, lastLen = 3, lenBits = 2)))
    val f = Grib2.read(msg).head
    assert(f.values.toSeq === Seq(5.5, 6.5, 7.5, 100.5, 102.5, 101.5))
  }

  test("complex packing with spatial differencing (5.3, order 1): " +
    "initial value + g_min prefix, biased differences reconstruct the " +
    "hand-computed series") {
    // true X = [10,12,11,15,14,18]; d = [2,-1,4,-1,4]; gmin = -1;
    // packed g = d - gmin = [3,0,5,0,5] with a placeholder first slot
    val sec7 = Array(
      0x00, 0x0A, // init1 = 10 (2-octet sign-magnitude)
      0x80, 0x01, // gmin = -1
      0x00,       // refs: ref0 = 0 (4 bits) + pad
      0x60,       // widths: 011 + pad (width = 3)
      // values, 3 bits each: 000 011 000 101 000 101 + pad
      0x0C, 0x51, 0x40
    ).map(_.toByte)
    val msg = handMessage(dataTemplate = 3, packedBytes = sec7,
      sec5Payload = Some(complexSec5(0f, 0, 0, nbits = 4,
        ng = 1, widthRef = 0, widthBits = 3,
        lenRef = 6, lenInc = 1, lastLen = 6, lenBits = 0,
        order = 1, diffOctets = 2)))
    val f = Grib2.read(msg).head
    assert(f.values.toSeq === Seq(10.0, 12.0, 11.0, 15.0, 14.0, 18.0))
  }

  test("complex packing 5.3 order 2 reconstructs through the " +
    "second-order recurrence") {
    // X = [3, 5, 8, 12, 17, 23]: second differences all 1 → d = [1,1,1,1],
    // gmin = 1 → packed g = 0 for every non-initial slot (width 0!)
    val sec7 = Array(
      0x00, 0x03, // init1 = 3
      0x00, 0x05, // init2 = 5
      0x00, 0x01, // gmin = 1
      0x00,       // refs: 4-bit ref0 = 0 + pad
      0x00        // widths: 3-bit width = 0 + pad; no value bits at all
    ).map(_.toByte)
    val msg = handMessage(dataTemplate = 3, packedBytes = sec7,
      sec5Payload = Some(complexSec5(0f, 0, 0, nbits = 4,
        ng = 1, widthRef = 0, widthBits = 3,
        lenRef = 6, lenInc = 1, lastLen = 6, lenBits = 0,
        order = 2, diffOctets = 2)))
    val f = Grib2.read(msg).head
    assert(f.values.toSeq === Seq(3.0, 5.0, 8.0, 12.0, 17.0, 23.0))
  }

  test("complex packing rejects missing-value management and other " +
    "group-splitting methods pointedly") {
    val p = complexSec5(0f, 0, 0, 7, 1, 0, 3, 6, 1, 6, 0)
    p(10) = 0 // group splitting method (octet 22, after the type octet)
    val e1 = intercept[IllegalArgumentException] {
      Grib2.read(handMessage(dataTemplate = 2, sec5Payload = Some(p),
        packedBytes = Array[Byte](0, 0, 0)))
    }
    assert(e1.getMessage.contains("group-splitting"))
    val q = complexSec5(0f, 0, 0, 7, 1, 0, 3, 6, 1, 6, 0)
    q(11) = 1 // missing-value management (octet 23) → primary
    val e2 = intercept[IllegalArgumentException] {
      Grib2.read(handMessage(dataTemplate = 2, sec5Payload = Some(q),
        packedBytes = Array[Byte](0, 0, 0)))
    }
    assert(e2.getMessage.contains("missing-value"))
  }

  test("writer round-trips COMPLEX packing (5.2) and spatial " +
    "differencing (5.3 orders 1/2), with bitmaps, through the decoder") {
    val rnd = new scala.util.Random(7)
    for ((packing, order) <- Seq((2, 0), (3, 1), (3, 2)); trial <- 0 until 4) {
      val ni = 5 + rnd.nextInt(20); val nj = 3 + rnd.nextInt(10)
      // smooth field + noise: the shape complex packing exists for
      val vals = Array.tabulate(ni * nj) { i =>
        val (y, x) = (i / ni, i % ni)
        if (packing == 2 && i % 29 == 7) Double.NaN
        else 500.0 + 3.0 * y + 1.5 * x + math.sin(x * 0.7) * 2 +
          rnd.nextInt(3) * 0.25
      }
      val spec = Grib2Write.FieldSpec(0, 1, 1, 6, ni, nj,
        lat1 = 45.0, lon1 = 5.0, dLat = 0.1, dLon = 0.1,
        values = vals, decimalScale = 2, packing = packing,
        diffOrder = math.max(order, 1), groupSize = 7 + trial * 5)
      val f = Grib2.read(Grib2Write.write(Seq(spec))).head
      val tol = 0.005 + 1e-9 // D=2, E=0 → half of 0.01
      vals.zip(f.values).zipWithIndex.foreach { case ((a, b2), i) =>
        if (a.isNaN) assert(b2.isNaN)
        else assert(math.abs(a - b2) <= tol,
          s"packing $packing order $order trial $trial cell $i: $a vs $b2")
      }
    }
  }

  test("polar stereographic grid (template 3.20): parameters decode " +
    "and the anchor georeferences through Geo.PolarStereo") {
    val f = Grib2.read(handMessage(gridTemplate = 20)).head
    assert(f.gridType === "polar")
    assert(f.lat1 === 30.0 && f.lon1 === -150.0)
    assert(f.dLat === 25000.0 && f.dLon === 25000.0)
    val pg = f.polar.get
    assert(pg.earthRadius === 6371229.0 && pg.north)
    assert(pg.laD === 60.0 && pg.lov === -45.0)
    assert(f.values.toSeq === Seq(1.5, 3.5, 5.5, 7.5, 9.5, 31.5))
    val ps = graft.functions.Geo.PolarStereo(
      pg.earthRadius, 0.0, pg.laD, pg.lov, pg.north)
    val (x1, y1) = ps.forward(f.lon1, f.lat1)
    val (lon2, lat2) = ps.inverse(x1, y1)
    assert(math.abs(lon2 - f.lon1) < 1e-9 && math.abs(lat2 - f.lat1) < 1e-9)
    // one Dy step toward the pole raises latitude
    assert(ps.inverse(x1, y1 + f.dLat)._2 > f.lat1 ||
      ps.inverse(x1, y1 - f.dLat)._2 > f.lat1)
  }

  test("Mercator grid (template 3.10): parameters decode — the " +
    "template puts scan mode BEFORE the increments — and the anchor " +
    "georeferences through Geo.Mercator") {
    val f = Grib2.read(handMessage(gridTemplate = 10)).head
    assert(f.gridType === "mercator")
    assert(f.lat1 === 20.0 && f.lon1 === 100.0)
    assert(f.dLat === 50000.0 && f.dLon === 50000.0)
    val mg = f.mercator.get
    assert(mg.earthRadius === 6371229.0 && mg.e2 === 0.0)
    assert(mg.laD === 20.0)
    assert(f.values.toSeq === Seq(1.5, 3.5, 5.5, 7.5, 9.5, 31.5))
    val m = graft.functions.Geo.Mercator(mg.earthRadius, mg.e2, mg.laD)
    val (x1, y1) = m.forward(f.lon1, f.lat1)
    val (lon2, lat2) = m.inverse(x1, y1)
    assert(math.abs(lon2 - f.lon1) < 1e-9 && math.abs(lat2 - f.lat1) < 1e-9)
    // one Dj step down the stored grid (−j scan) lowers latitude
    assert(m.inverse(x1, y1 - f.dLat)._2 < f.lat1)
  }

  test("space-view grid (template 3.90): scan-angle steps resolve " +
    "from the apparent diameters, the camera distance from Nr, and " +
    "rows georeference through Geo.Geostationary") {
    val f = Grib2.read(handMessage(gridTemplate = 90)).head
    assert(f.gridType === "spaceview")
    val sg = f.spaceview.get
    assert(sg.lop === -75.0)
    assert(math.abs(sg.height - 6.6107 * 6371229.0) < 10.0)
    assert(sg.req === 6371229.0 && sg.rpol === 6371229.0)
    val expRx = 2 * math.asin(6371229.0 / sg.height) / 16
    assert(math.abs(sg.rx - expRx) < 1e-12 && math.abs(sg.ry - expRx) < 1e-12)
    assert(sg.xp === 8.0 && sg.yp === 8.0 && sg.xo === 3.0 && sg.yo === 4.0)
    assert(f.values.toSeq === Seq(1.5, 3.5, 5.5, 7.5, 9.5, 31.5))
    // stored row 0 sits at full-image row Yo = 4, NORTH of the
    // sub-satellite row 8 → positive y scan angle, positive latitude
    // on the sub-satellite meridian
    val geos = graft.functions.Geo.Geostationary(
      sg.lop, sg.req, sg.rpol, sg.height)
    val y0 = (sg.yp - sg.yo) * sg.ry
    val (lonA, latA) = geos.inverse(0.0, y0).get
    assert(latA > 0 && math.abs(lonA - sg.lop) < 1e-9)
  }

  test("writer emits Mercator grids (3.10) the reader decodes; the " +
    "ellipsoidal axes survive shape code 7 and values round-trip") {
    val mg = Grib2.MercatorGrid(6378137.0, laD = 15.0,
      e2 = 6.69437999014e-3)
    val spec = Grib2Write.FieldSpec(0, 1, 7, 3, ni = 6, nj = 5,
      lat1 = 22.0, lon1 = 88.0, dLat = 40000.0, dLon = 40000.0,
      values = Array.tabulate(30)(i => 290.0 + (i % 7) * 0.25),
      decimalScale = 2, mercator = Some(mg))
    val f = Grib2.read(Grib2Write.write(Seq(spec))).head
    assert(f.gridType === "mercator")
    assert(f.lat1 === 22.0 && f.lon1 === 88.0)
    assert(f.dLat === 40000.0 && f.dLon === 40000.0)
    val got = f.mercator.get
    assert(got.laD === 15.0 && got.earthRadius === 6378137.0)
    // e2 reconstitutes from the meter-rounded axes of shape code 7
    assert(math.abs(got.e2 - mg.e2) < 1e-7)
    f.values.zipWithIndex.foreach { case (v, i) =>
      assert(math.abs(v - (290.0 + (i % 7) * 0.25)) <= 0.005 + 1e-9,
        s"cell $i")
    }
  }

  test("writer emits space-view grids (3.90); the GOES-R ABI " +
    "full-disk parameters resolve to the PUG's 56 µrad scan step") {
    // GOES-16 shape: 2 km full disk = 5424 cells, camera 42164.16 km
    // from the earth center = 6.610561 equatorial radii
    val sv = Grib2Write.SpaceViewSpec(req = 6378137.0, rpol = 6356752.0,
      lop = -75.0, nrMicroRadii = 6610561, dx = 5424, dy = 5424,
      xpMilli = 2712000, ypMilli = 2712000, xo = 2000, yo = 2400)
    val spec = Grib2Write.FieldSpec(3, 0, 0, 0, ni = 4, nj = 3,
      lat1 = 0, lon1 = 0, dLat = 0, dLon = 0,
      values = Array.tabulate(12)(i => 0.25 * i),
      decimalScale = 2, spaceview = Some(sv))
    val f = Grib2.read(Grib2Write.write(Seq(spec))).head
    assert(f.gridType === "spaceview")
    val sg = f.spaceview.get
    assert(math.abs(sg.rx - 56e-6) < 0.1e-6, s"rx ${sg.rx}") // PUG E/W
    assert(math.abs(sg.ry - 56e-6) < 0.3e-6, s"ry ${sg.ry}")
    assert(sg.lop === -75.0 && sg.xo === 2000.0 && sg.yo === 2400.0)
    assert(sg.xp === 2712.0 && sg.yp === 2712.0)
    f.values.zipWithIndex.foreach { case (v, i) =>
      assert(math.abs(v - 0.25 * i) <= 0.005 + 1e-9, s"cell $i")
    }
  }

  test("writer emits Lambert grids (3.30) the reader decodes; values " +
    "and cone parameters round-trip") {
    val lg = Grib2.LambertGrid(6371229.0, lov = -97.5, laD = 38.5,
      latin1 = 38.5, latin2 = 38.5)
    val spec = Grib2Write.FieldSpec(0, 0, 0, 6, ni = 5, nj = 4,
      lat1 = 40.0, lon1 = -100.0, dLat = 3000.0, dLon = 3000.0,
      values = Array.tabulate(20)(i => 250.0 + i * 0.25),
      decimalScale = 2, lambert = Some(lg))
    val f = Grib2.read(Grib2Write.write(Seq(spec))).head
    assert(f.gridType === "lambert")
    assert(f.lambert === Some(lg))
    assert(f.lat1 === 40.0 && f.lon1 === -100.0)
    assert(f.dLat === 3000.0 && f.dLon === 3000.0)
    f.values.zipWithIndex.foreach { case (v, i) =>
      assert(math.abs(v - (250.0 + i * 0.25)) <= 0.005 + 1e-9, s"cell $i")
    }
  }

  test("readMeta walks headers only: field identities, grid shapes, " +
    "packing and message byte ranges, for every grid/packing variant") {
    val multi = Grib2Write.write(Seq(
      Grib2Write.FieldSpec(0, 3, 5, 6, 4, 3, 50.0, 0.0, 1.0, 1.0,
        Array.tabulate(12)(_.toDouble)),
      Grib2Write.FieldSpec(2, 0, 2, 12, 5, 4, 40.0, -100.0, 3000.0, 3000.0,
        Array.tabulate(20)(i => i * 0.5), packing = 3,
        lambert = Some(Grib2.LambertGrid(6371229.0, -97.5, 38.5,
          38.5, 38.5)))))
    val metas = Grib2.readMeta(multi)
    assert(metas.length === 2)
    assert(metas(0).gridType === "latlon" && metas(0).packingTemplate === 0)
    assert(metas(1).gridType === "lambert" && metas(1).packingTemplate === 3)
    assert(metas(0).ni === 4 && metas(0).nj === 3)
    assert(metas(1).category === 0 && metas(1).parameter === 2)
    assert(metas(1).forecastHours === Some(12))
    // the byte ranges tile the file exactly (the .idx-style split plan)
    assert(metas(0).msgOffset === 0)
    assert(metas(1).msgOffset === metas(0).msgLength)
    assert(metas(1).msgOffset + metas(1).msgLength === multi.length)
    // and a meta walk never rejects packings it does not decode: a
    // JPEG2000-packed message still yields its manifest row
    val j2k = handMessage(dataTemplate = 40)
    assert(Grib2.readMeta(j2k).head.packingTemplate === 40)
    intercept[IllegalArgumentException] { Grib2.read(j2k) }
  }

  test("PNG packing (template 5.41): packed integers carried as a " +
    "16-bit grayscale PNG decode through the same transform") {
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val samples = Array(0, 100, 2000, 30000, 65535, 7)
    for (i <- samples.indices)
      img.getRaster.setSample(i % 3, i / 3, 0, samples(i))
    val png = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val msg = handMessage(dataTemplate = 41, packedBytes = png)
    val f = Grib2.read(msg).head
    assert(f.values.toSeq === samples.map(x => 1.5 + x * 2.0).toSeq)
  }

  test("CCSDS/AEC packing (template 5.42): writer round-trips across " +
    "multiple reference intervals, bitmap holes, RSI byte padding") {
    val rnd = new scala.util.Random(4242)
    for ((pad, trial) <- Seq(false, true, false, true).zipWithIndex) {
      val ni = 30; val nj = 20 // 600 points ≈ 10 RSIs at block 16 × 4
      val vals = Array.tabulate(ni * nj)(i =>
        if (trial % 2 == 1 && i % 53 == 7) Double.NaN
        else 500.0 + 40.0 * math.sin(i / 25.0) + rnd.nextInt(5) * 0.01)
      val spec = Grib2Write.FieldSpec(0, 3, 1, forecastHours = 6,
        ni = ni, nj = nj, lat1 = 75.0, lon1 = -20.0,
        dLat = 0.5, dLon = 0.5, values = vals,
        decimalScale = 2, packing = 42, ccsdsPadRsi = pad)
      val f = Grib2.read(Grib2Write.write(Seq(spec))).head
      val tol = 1.0 / 100 / 2 + 1e-9
      vals.zip(f.values).zipWithIndex.foreach { case ((a, b), i) =>
        if (a.isNaN) assert(b.isNaN, s"trial $trial cell $i")
        else assert(math.abs(a - b) <= tol,
          s"trial $trial pad=$pad cell $i: $a vs $b")
      }
    }
    // constant CCSDS field → nbits 0, no stream, R everywhere
    val c = Grib2Write.FieldSpec(0, 0, 0, 0, 4, 3, 60.0, 0.0, 1.0, 1.0,
      Array.fill(12)(101325.0), decimalScale = 0, packing = 42)
    assert(Grib2.read(Grib2Write.write(Seq(c))).head.values
      .forall(_ == 101325.0))
    // restricted coding rejected by name
    val msg = Grib2Write.write(Seq(c))
    // flip the flags octet inside section 5 (template parse reads it);
    // find section 5 by walking section lengths
    var pos = 16
    var flagsAt = -1
    while (flagsAt < 0) {
      val len = java.nio.ByteBuffer.wrap(msg, pos, 4).getInt
      // section 5 octet 22 (1-based) = the CCSDS flags mask
      if ((msg(pos + 4) & 0xFF) == 5) flagsAt = pos + 21
      else pos += len
    }
    msg(flagsAt) = (msg(flagsAt) | 16).toByte
    val e = intercept[IllegalArgumentException] { Grib2.read(msg) }
    assert(e.getMessage.contains("restricted"))
  }

  test("product templates 4.1/4.8/4.11: ensemble identity and " +
    "statistical processing surface; 4.0 stays bare") {
    def spec(ens: Option[(Int, Int, Int)], st: Option[(Int, Int)]) =
      Grib2Write.FieldSpec(0, 1, 8, forecastHours = 6, ni = 4, nj = 3,
        lat1 = 50.0, lon1 = 0.0, dLat = 1.0, dLon = 1.0,
        values = Array.tabulate(12)(_ * 0.5), decimalScale = 1,
        ensembleSpec = ens, statSpec = st)
    val plain = Grib2.read(Grib2Write.write(Seq(spec(None, None)))).head
    assert(plain.ensemble === None && plain.stat === None)
    val ens = Grib2.read(Grib2Write.write(Seq(
      spec(Some((3, 7, 31)), None)))).head
    assert(ens.ensemble === Some((3, 7, 31)) && ens.stat === None)
    assert(ens.forecastHours === Some(6))
    val acc = Grib2.read(Grib2Write.write(Seq(
      spec(None, Some((1, 24)))))).head
    assert(acc.stat === Some((1, Some(24))) && acc.ensemble === None)
    val both = Grib2.read(Grib2Write.write(Seq(
      spec(Some((2, 0, 11)), Some((0, 12)))))).head
    assert(both.ensemble === Some((2, 0, 11)))
    assert(both.stat === Some((0, Some(12))))
    // values survive the longer section-4 bodies unchanged
    assert(both.values.toSeq === plain.values.toSeq)
  }

  test("probability products (templates 4.5/4.9): the probability " +
    "block round-trips, thresholds resolve to exact micro-units, " +
    "missing bounds stay missing") {
    val vals = Array.tabulate(12)(i => i * 5.0)
    // 4.9: PoP shape — P(6h precip > 0.254 mm), scale 3 / value 254
    val pop = Grib2Write.FieldSpec(0, 1, 8, forecastHours = 12,
      ni = 4, nj = 3, lat1 = 45.0, lon1 = -90.0, dLat = 0.5, dLon = 0.5,
      values = vals, decimalScale = 0,
      probSpec = Some(Grib2Write.ProbSpec(0, 1, probType = 3,
        scale = 3, lo = Some(254), hi = None)),
      statSpec = Some((1, 6)))
    val f = Grib2.read(Grib2Write.write(Seq(pop))).head
    val p = f.prob.get
    assert(p.probType === 3 && p.number === 0 && p.total === 1)
    assert(p.loU === Some(254000L) && p.hiU === None)
    assert(p.threshU === Some(254000L)) // lower bound defines type 3
    assert(f.stat === Some((1, Some(6)))) // the 4.9 interval survives
    assert(f.values.toSeq === vals.toSeq)
    // 4.5 (no interval): between-bounds type carries BOTH thresholds,
    // negative scaled values survive sign-magnitude, and an
    // upper-defined type picks the upper bound
    val between = pop.copy(statSpec = None,
      probSpec = Some(Grib2Write.ProbSpec(2, 5, probType = 2,
        scale = 1, lo = Some(-50), hi = Some(120))))
    val f2 = Grib2.read(Grib2Write.write(Seq(between))).head
    val p2 = f2.prob.get
    assert(p2.loU === Some(-5000000L) && p2.hiU === Some(12000000L))
    assert(p2.threshU === Some(-5000000L))
    val above = pop.copy(statSpec = None,
      probSpec = Some(Grib2Write.ProbSpec(0, 1, probType = 1,
        scale = 0, lo = None, hi = Some(300))))
    val f3 = Grib2.read(Grib2Write.write(Seq(above))).head
    assert(f3.prob.get.threshU === Some(300000000L))
    // readMeta keeps its identity columns for 4.5/4.9 messages
    val meta = Grib2.readMeta(Grib2Write.write(Seq(pop))).head
    assert(meta.category === 1 && meta.parameter === 8 &&
      meta.forecastHours === Some(12))
  }

  test("derived forecasts (templates 4.2/4.12): derivation code and " +
    "ensemble size round-trip, with and without the interval block") {
    val vals = Array.tabulate(12)(i => 0.1 * i)
    // 4.2: GEFS ensemble-mean shape (code 0, 31 members)
    val mean = Grib2Write.FieldSpec(0, 0, 0, forecastHours = 6,
      ni = 4, nj = 3, lat1 = 50.0, lon1 = 0.0, dLat = 1.0, dLon = 1.0,
      values = vals, decimalScale = 2, derivedSpec = Some((0, 31)))
    val f = Grib2.read(Grib2Write.write(Seq(mean))).head
    assert(f.derived === Some((0, 31)))
    assert(f.ensemble === None && f.stat === None)
    vals.zip(f.values).foreach { case (a, b2) =>
      assert(math.abs(a - b2) <= 0.005 + 1e-9) }
    // 4.12: spread of a 6-hour accumulation (code 4 + interval block)
    val spread = mean.copy(derivedSpec = Some((4, 21)),
      statSpec = Some((1, 6)))
    val f2 = Grib2.read(Grib2Write.write(Seq(spread))).head
    assert(f2.derived === Some((4, 21)))
    assert(f2.stat === Some((1, Some(6))))
    // readMeta keeps identities for 4.2/4.12 messages
    val meta = Grib2.readMeta(Grib2Write.write(Seq(mean, spread)))
    assert(meta.length === 2)
    assert(meta.forall(m => m.category === 0 && m.forecastHours === Some(6)))
  }

  test("earth shapes (code table 3.2): ellipsoids resolve semi-major + " +
    "eccentricity² for projected grids; unknown codes rejected") {
    val spec = Grib2Write.FieldSpec(0, 0, 0, 1, 4, 3, 47.0, -110.0,
      3000.0, 3000.0, Array.tabulate(12)(_ * 1.0), decimalScale = 1,
      lambert = Some(Grib2.LambertGrid(6371229.0, -97.5, 38.5,
        38.5, 38.5)))
    val msg = Grib2Write.write(Seq(spec))
    var pos = 16
    var shapeAt = -1
    while (shapeAt < 0) {
      val len = java.nio.ByteBuffer.wrap(msg, pos, 4).getInt
      // section 3 octet 15 (1-based) = earth shape code
      if ((msg(pos + 4) & 0xFF) == 3) shapeAt = pos + 14
      else pos += len
    }
    def withShape(code: Int, patch: Array[Byte] => Unit = _ => ())
        : Grib2.LambertGrid = {
      val m = msg.clone()
      m(shapeAt) = code.toByte
      patch(m)
      Grib2.read(m).head.lambert.get
    }
    val wgs = withShape(5)
    assert(wgs.earthRadius === 6378137.0)
    assert(math.abs(wgs.e2 - 6.69437999014e-3) < 1e-12)
    val grs = withShape(4)
    assert(grs.earthRadius === 6378137.0)
    assert(math.abs(grs.e2 - 0.006694380022903416) < 1e-9)
    val iau = withShape(2)
    assert(iau.earthRadius === 6378160.0)
    assert(iau.e2 > 0.0066 && iau.e2 < 0.0068)
    // shape 7: explicit axes in meters (octets 21-30 after the shape)
    val custom = withShape(7, m => {
      val b = java.nio.ByteBuffer.wrap(m, shapeAt + 6, 10)
      b.put(0.toByte); b.putInt(6378388) // major (scale 0)
      b.put(0.toByte); b.putInt(6356912) // minor
    })
    assert(custom.earthRadius === 6378388.0)
    assert(math.abs(custom.e2 -
      (1.0 - math.pow(6356912.0 / 6378388.0, 2))) < 1e-12)
    val e = intercept[IllegalArgumentException] {
      val m = msg.clone(); m(shapeAt) = 9.toByte; Grib2.read(m)
    }
    assert(e.getMessage.contains("table 3.2"))
  }

  test("Gaussian parallels: pinned against an independent quadrature " +
    "(numpy leggauss) and the Legendre-root property") {
    // numpy.polynomial.legendre.leggauss(2N), arcsin, descending
    assert(Grib2.gaussianLatitudes(2).take(2).map(l => math.rint(l * 1e8))
      .toSeq === Seq(59.4444082892, 19.8757191474).map(l =>
      math.rint(l * 1e8)))
    val n32 = Grib2.gaussianLatitudes(32)
    for ((want, i) <- Seq(87.8637988392, 85.0965269883, 82.3129129479,
        79.5256065727).zipWithIndex)
      assert(math.abs(n32(i) - want) < 1e-9, s"N32 lat $i")
    // independent check: every parallel's sine is a root of P_64
    // (recurrence evaluated forward here, vs Newton inside)
    def legendre(m: Int, x: Double): Double = {
      var p0 = 1.0; var p1 = x
      for (k <- 2 to m) {
        val p2 = ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
        p0 = p1; p1 = p2
      }
      if (m == 0) 1.0 else p1
    }
    n32.foreach { lat =>
      assert(math.abs(legendre(64, math.sin(math.toRadians(lat)))) < 1e-12)
    }
    // symmetry and strict descending order
    assert(n32.toSeq === n32.reverse.map(-_).toSeq)
    assert(n32.sliding(2).forall(p => p(0) > p(1)))
  }

  test("Gaussian grid (template 3.40): global and regional-subset " +
    "grids decode with table latitudes; mismatched La1 rejected") {
    // full N=4 grid (8 rows)
    val lats = Grib2.gaussianLatitudes(4)
    val full = Grib2Write.FieldSpec(0, 3, 0, forecastHours = 6,
      ni = 6, nj = 8, lat1 = 0, lon1 = 0.0, dLat = 0, dLon = 60.0,
      values = Array.tabulate(48)(i => 220.0 + (i % 13) * 1.5),
      decimalScale = 1, gaussian = Some((4, 0)))
    val f = Grib2.read(Grib2Write.write(Seq(full))).head
    assert(f.gridType === "gaussian")
    val got = f.gaussLats.get
    assert(got.length === 8)
    got.zip(lats).foreach { case (a, b) => assert(math.abs(a - b) < 1e-5) }
    // regional subset: rows 2..5 of the same table
    val sub = full.copy(nj = 4, values = full.values.take(24),
      gaussian = Some((4, 2)))
    val fs = Grib2.read(Grib2Write.write(Seq(sub))).head
    assert(fs.gaussLats.get.toSeq.zip(lats.slice(2, 6))
      .forall(p => math.abs(p._1 - p._2) < 1e-5))
    // a La1 that is not a parallel of the table fails pointedly
    val msg = Grib2Write.write(Seq(full))
    var pos = 16
    var la1At = -1
    while (la1At < 0) {
      val len = java.nio.ByteBuffer.wrap(msg, pos, 4).getInt
      // section 3 octets 47-50 (1-based) = La1
      if ((msg(pos + 4) & 0xFF) == 3) la1At = pos + 46
      else pos += len
    }
    java.nio.ByteBuffer.wrap(msg, la1At, 4).putInt(45000000) // 45°N
    val e = intercept[IllegalArgumentException] { Grib2.read(msg) }
    assert(e.getMessage.contains("not a parallel"))
  }

  test("REDUCED Gaussian grid: ragged rows through the PL list, " +
    "missing Ni/Di, scan-mode flips over ragged rows") {
    // octahedral-style N4 (8 rows), deliberately asymmetric so the
    // +j flip below actually permutes the PL list
    val pl = Array(18, 22, 26, 32, 30, 28, 24, 20)
    val vals = Array.tabulate(pl.sum)(i => 100.0 + (i % 37) * 0.5)
    val spec = Grib2Write.FieldSpec(0, 1, 1, forecastHours = 12,
      ni = -1, nj = 8, lat1 = 0, lon1 = 0.0, dLat = 0, dLon = 0,
      values = vals, decimalScale = 1,
      gaussian = Some((4, 0)), gaussianPl = Some(pl))
    val msg = Grib2Write.write(Seq(spec))
    val f = Grib2.read(msg).head
    assert(f.ni === -1 && f.gridType === "gaussian")
    assert(f.rowNi.get.toSeq === pl.toSeq)
    assert(f.gaussLats.get.length === 8)
    val tol = 0.1 / 2 + 1e-9
    vals.zip(f.values).foreach { case (a, b) =>
      assert(math.abs(a - b) <= tol) }
    // flip the stored scan mode to −i (0x80): same bytes reinterpret
    // as east→west rows, so normalization must reverse WITHIN each
    // ragged row. Section 3 scan octet = 72 (1-based).
    val m2 = msg.clone()
    var pos = 16
    var scanAt = -1
    while (scanAt < 0) {
      val len = java.nio.ByteBuffer.wrap(m2, pos, 4).getInt
      if ((m2(pos + 4) & 0xFF) == 3) scanAt = pos + 71
      else pos += len
    }
    m2(scanAt) = 0x80.toByte
    val f2 = Grib2.read(m2).head
    val off = pl.scanLeft(0)(_ + _)
    val expect = (0 until 8).flatMap(j =>
      f.values.slice(off(j), off(j + 1)).reverse)
    assert(f2.values.toSeq === expect)
    // and +j (0x40): whole rows reverse, PL list follows
    val m3 = msg.clone()
    m3(scanAt) = 0x40.toByte
    val f3 = Grib2.read(m3).head
    assert(f3.rowNi.get.toSeq === pl.reverse.toSeq)
    val expect3 = (0 until 8).reverse.flatMap(j =>
      f.values.slice(off(j), off(j + 1)))
    assert(f3.values.toSeq === expect3)
  }
}
