package graft.source

import java.nio.{ByteBuffer, ByteOrder}

/** S-layer extension — GRIB2 reader (WMO FM 92 GRIB Edition 2, the
  * operational distribution format of GFS/HRRR/ECMWF open data; the
  * reference's archives are netCDF, but a forecast lake at scale
  * ingests GRIB2 upstream of everything else).
  *
  * Implemented from the public WMO/NCEP specification:
  *  - Section 0 indicator (`GRIB`, discipline, edition 2, 8-byte total
  *    length) and `7777` trailer; multiple messages per file.
  *  - Section 1 identification (reference time).
  *  - Section 3 grid definition template 3.0 (regular lat/lon in
  *    microdegrees, sign-magnitude signed fields, i/j scanning modes).
  *  - Section 4 product definition template 4.0 (parameter category /
  *    number, forecast hour), other templates carried opaquely.
  *  - Section 5 data representation template 5.0 (simple packing:
  *    value = (R + packed·2^E) / 10^D, R an IEEE float32, E/D
  *    sign-magnitude int16), templates 5.2/5.3 (complex packing with
  *    general group splitting and 1st/2nd-order spatial differencing —
  *    what operational NOAA GFS/HRRR files actually carry), and
  *    template 5.41 (PNG packing: same transform, packed values
  *    carried as a PNG image — decoded through the JVM's ImageIO).
  *  - Section 6 bitmaps (indicator 0 = inline, 254 = reuse previous,
  *    255 = none): masked-out points surface as NaN.
  *  - Section 7 packed data, MSB-first bit stream.
  *  - Sections 2 (local use) skipped; repeated section runs (3..7 or
  *    4..7) within one message fan out into one field each.
  *
  * Template 5.42 (CCSDS/AEC — the ECMWF/DWD operational packing since
  * libaec) decodes through [[Ccsds]], with the flags/block-size/RSI
  * read from octets 22-25 of section 5. Template 5.40 (JPEG2000 — the
  * NCEP dissemination packing) decodes through [[Jpeg2k]]: the
  * section-7 payload is a single-component lossless codestream whose
  * raster, flattened row-major, is the packed-value sequence (i-fastest
  * point order; with a bitmap the raster is nPoints×1).
  *
  * Rejected loudly (with the re-encode workaround named): JPEG2000
  * lossy streams and subset walls (multi-component/tile/layer, 9/7),
  * CCSDS restricted coding, complex-packing missing-value management
  * (bitmap-encoded missing only), non-lat/lon grid templates, GRIB
  * edition 1.
  */
object Grib2 {

  final case class Field(
      discipline: Int, category: Int, parameter: Int,
      refTime: String, forecastHours: Option[Int],
      ni: Int, nj: Int,
      lat1: Double, lon1: Double, dLat: Double, dLon: Double,
      scanMode: Int,
      /** Row-major j-major values, bitmap holes as NaN, scan order
        * normalized to +i (west→east), −j (north→south) when the scan
        * flags request the common alternatives.
        */
      values: Array[Double],
      /** "latlon" (template 3.0: lat1/lon1/dLat/dLon are degrees) or
        * "lambert" (template 3.30: lat1/lon1 are the FIRST GRID POINT
        * in degrees, dLat/dLon are Dy/Dx in METERS, and `lambert`
        * carries the cone parameters).
        */
      gridType: String = "latlon",
      lambert: Option[LambertGrid] = None,
      polar: Option[PolarGrid] = None,
      /** "mercator" (template 3.10): lat1/lon1 are the first grid
        * point in degrees, dLat/dLon are Dj/Di in METERS at LaD.
        */
      mercator: Option[MercatorGrid] = None,
      /** "rotated" (template 3.1): lat1/lon1/dLat/dLon are degrees in
        * the ROTATED system whose north pole `rotated` carries.
        */
      rotated: Option[RotatedGrid] = None,
      /** "spaceview" (template 3.90): lat1/lon1 are the SUB-SATELLITE
        * point in degrees, dLat/dLon are ry/rx in RADIANS of scan
        * angle per grid length.
        */
      spaceview: Option[SpaceViewGrid] = None,
      /** "gaussian" (template 3.40) only: the grid's latitudes in
        * normalized row order (north→south), resolved from the
        * Gaussian parallel table against La1/La2.
        */
      gaussLats: Option[Array[Double]] = None,
      /** REDUCED Gaussian grids (3.40 with Ni missing + a PL list)
        * only: points per row in normalized row order; `values` is
        * then ragged with these row lengths and `ni` is -1.
        */
      rowNi: Option[Array[Int]] = None,
      /** Product templates 4.1/4.11: (ensemble type, perturbation
        * number, forecast count) — the GEFS member identity.
        */
      ensemble: Option[(Int, Int, Int)] = None,
      /** Product templates 4.8/4.11: (statistical process code —
        * 0 avg / 1 accum / 2 max / 3 min — and the interval span in
        * hours when the unit converts).
        */
      stat: Option[(Int, Option[Int])] = None,
      /** Product templates 4.5/4.9 (probability forecasts — PoP-style
        * fields): the probability block.
        */
      prob: Option[ProbInfo] = None,
      /** Product templates 4.2/4.12 (derived forecasts): (derivation
        * code from table 4.7, ensemble size).
        */
      derived: Option[(Int, Int)] = None)

  /** Product templates 4.5/4.9: the probability block — member number
    * of the probability ensemble, total probabilities, probability
    * type (code table 4.9: 0 below lower, 1 above upper, 2 between,
    * 3 above lower, 4 below upper), and the threshold bounds in EXACT
    * micro-units (scaledValue·10^(6−scale); a missing bound — all-ones
    * octets — is None).
    */
  final case class ProbInfo(number: Int, total: Int, probType: Int,
      loU: Option[Long], hiU: Option[Long]) {
    /** The defining threshold: the upper bound for above-/below-upper
      * types (1/4), the lower bound otherwise.
      */
    def threshU: Option[Long] = if (probType == 1 || probType == 4) hiU else loU
  }

  /** Section-4 facts shared by the supported product templates. */
  final case class ProductInfo(category: Int, parameter: Int,
      forecastHours: Option[Int],
      ensemble: Option[(Int, Int, Int)] = None,
      stat: Option[(Int, Option[Int])] = None,
      prob: Option[ProbInfo] = None,
      /** Templates 4.2/4.12 (derived forecasts — the GEFS ensemble
        * mean/spread products): (code table 4.7 derivation — 0 mean,
        * 2/4 spread —, number of forecasts in the ensemble).
        */
      derived: Option[(Int, Int)] = None)

  /** Template 3.30 cone parameters + the earth radius the file
    * declares; [[graft.functions.Geo.LambertConformal]] georeferences
    * cells from these directly.
    */
  final case class LambertGrid(earthRadius: Double, lov: Double,
      laD: Double, latin1: Double, latin2: Double,
      /** First eccentricity² from code table 3.2 (0 for spheres). */
      e2: Double = 0.0)

  /** Template 3.20 parameters (polar stereographic, the polar NWP
    * grids); [[graft.functions.Geo.PolarStereo]] georeferences cells
    * from these (spherical earth → e² = 0, LaD as the true-scale
    * parallel, LoV as the orientation meridian).
    */
  final case class PolarGrid(earthRadius: Double, lov: Double,
      laD: Double, north: Boolean,
      /** First eccentricity² from code table 3.2 (0 for spheres). */
      e2: Double = 0.0)

  /** Template 3.10 parameters (Mercator, the tropical/regional
    * satellite product grid); [[graft.functions.Geo.Mercator]]
    * georeferences cells from these (LaD is the true-scale parallel
    * Di/Dj are measured at).
    */
  final case class MercatorGrid(earthRadius: Double, laD: Double,
      /** First eccentricity² from code table 3.2 (0 for spheres). */
      e2: Double = 0.0)

  /** Template 3.1 parameters (rotated lat/lon — the CORDEX/COSMO/ICON
    * regional-model grid): the grid axes are degrees in a ROTATED
    * spherical system. Stored as the CF `grid_north_pole` convention
    * (the template's southern pole of projection negated/flipped), so
    * [[graft.functions.Geo.RotatedPole]] georeferences cells directly.
    */
  final case class RotatedGrid(poleLat: Double, poleLon: Double)

  /** Template 3.90 parameters (space view — the geostationary
    * full-disk/sector grid of GOES GVAR / Meteosat products). `rx`/`ry`
    * are the scan-angle steps PER GRID LENGTH in radians, derived from
    * the template's apparent-diameter counts: the disk subtends
    * 2·asin(r_eq/height) over `dx` columns (2·asin(r_pol/height) over
    * `dy` rows). `xp`/`yp` locate the sub-satellite point and `xo`/`yo`
    * the sector origin, all in full-image grid lengths;
    * [[graft.functions.Geo.Geostationary]] georeferences the scan
    * angles from these.
    */
  final case class SpaceViewGrid(req: Double, rpol: Double, lop: Double,
      /** Satellite distance from the earth CENTER in meters (Nr·10⁻⁶
        * equatorial radii, resolved).
        */
      height: Double,
      rx: Double, ry: Double, xp: Double, yp: Double,
      xo: Double, yo: Double)

  private val gaussCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()

  /** Latitudes (degrees, north→south) of the 2n parallels of a regular
    * Gaussian grid (template 3.40, the ECMWF model-native grid): the
    * arcsines of the roots of the Legendre polynomial P_2n, found by
    * Newton iteration on the three-term recurrence from the classic
    * cos(π(i−¼)/(m+½)) starting guesses. Southern half by symmetry;
    * cached per n (an archive re-resolves one table per grid, and
    * O1280's 2560-degree polynomial is not free).
    */
  def gaussianLatitudes(n: Int): Array[Double] =
    gaussCache.computeIfAbsent(n, _ => {
      require(n >= 1 && n <= 4096, s"Gaussian grid N=$n unsupported")
      val m = 2 * n
      val lats = new Array[Double](m)
      var i = 0
      while (i < n) {
        var x = math.cos(math.Pi * (i + 0.75) / (m + 0.5))
        var delta = 1.0
        var iter = 0
        while (math.abs(delta) > 1e-15 && iter < 100) {
          var p0 = 1.0
          var p1 = x
          var k = 2
          while (k <= m) {
            val p2 = ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
            p0 = p1; p1 = p2
            k += 1
          }
          val dp = m * (x * p1 - p0) / (x * x - 1)
          delta = p1 / dp
          x -= delta
          iter += 1
        }
        val lat = math.toDegrees(math.asin(x))
        lats(i) = lat
        lats(m - 1 - i) = -lat
        i += 1
      }
      lats
    })

  /** Metadata for one field without touching its packed data. */
  final case class FieldMeta(
      discipline: Int, category: Int, parameter: Int,
      refTime: String, forecastHours: Option[Int],
      ni: Int, nj: Int, gridType: String, packingTemplate: Int,
      nBits: Int, msgOffset: Long, msgLength: Long)

  /** Header-only walk: every field's identity, grid shape and packing
    * WITHOUT decoding section 7 — the O(header) manifest pass a 100 TB
    * GRIB archive needs (each message's byte range comes back, so a
    * planner can split decode work per message exactly like a `.idx`
    * sidecar would).
    */
  def readMeta(bytes: Array[Byte]): Seq[FieldMeta] = {
    val out = Seq.newBuilder[FieldMeta]
    var pos = 0
    while (pos + 16 <= bytes.length) {
      require(bytes(pos) == 'G' && bytes(pos + 1) == 'R' &&
        bytes(pos + 2) == 'I' && bytes(pos + 3) == 'B',
        s"bad GRIB magic at byte $pos")
      val discipline = bytes(pos + 6) & 0xFF
      val total = ByteBuffer.wrap(bytes, pos + 8, 8)
        .order(ByteOrder.BIG_ENDIAN).getLong
      val end = (pos + total).toInt
      var sp = pos + 16
      var refTime = ""
      var gridShape = (0, 0, "latlon")
      var product: Option[(Int, Int, Option[Int])] = None
      var packTpl = -1
      var packBits = 0
      while (sp < end - 4) {
        val b = ByteBuffer.wrap(bytes, sp, end - sp)
          .order(ByteOrder.BIG_ENDIAN)
        val len = b.getInt
        val sec = b.get() & 0xFF
        sec match {
          case 1 =>
            b.position(b.position() + 7)
            val y = b.getShort & 0xFFFF
            val mo = b.get() & 0xFF; val d = b.get() & 0xFF
            val h = b.get() & 0xFF; val mi = b.get() & 0xFF
            val s = b.get() & 0xFF
            refTime = f"$y%04d-$mo%02d-$d%02dT$h%02d:$mi%02d:$s%02dZ"
          case 3 =>
            b.get(); b.getInt; b.get(); b.get()
            val tpl = b.getShort & 0xFFFF
            // ni/nj sit after the 16-octet earth block in every
            // supported template (3.0/3.20/3.30)
            b.position(b.position() + 16)
            val ni = b.getInt; val nj = b.getInt
            gridShape = (ni, nj, tpl match {
              case 0 => "latlon"; case 1 => "rotated"
              case 10 => "mercator"
              case 20 => "polar"; case 30 => "lambert"
              case 40 => "gaussian"; case 90 => "spaceview"
              case t => s"template-3.$t"
            })
          case 4 =>
            b.getShort
            val tpl = b.getShort & 0xFFFF
            // octets through forecast time are shared by 4.0/4.1/4.2/
            // 4.5/4.8/4.9/4.11/4.12; anything else is manifest-opaque,
            // not an error
            if (tpl == 0 || tpl == 1 || tpl == 2 || tpl == 5 ||
                tpl == 8 || tpl == 9 || tpl == 11 || tpl == 12) {
              val cat = b.get() & 0xFF
              val par = b.get() & 0xFF
              b.get(); b.get(); b.get(); b.getShort; b.get()
              val unit = b.get() & 0xFF
              val fcst = b.getInt
              val hours = unit match {
                case 0 => Some(fcst / 60); case 1 => Some(fcst)
                case 2 => Some(fcst * 24); case _ => None
              }
              product = Some((cat, par, hours))
            } else product = Some((-1, -1, None))
          case 5 =>
            b.getInt
            packTpl = b.getShort & 0xFFFF
            b.getFloat; b.getShort; b.getShort
            packBits = b.get() & 0xFF
          case 7 =>
            val (cat, par, hours) = product.getOrElse((-1, -1, None))
            val (ni, nj, gt) = gridShape
            out += FieldMeta(discipline, cat, par, refTime, hours,
              ni, nj, gt, packTpl, packBits, pos.toLong, total)
          case _ => ()
        }
        sp += len
      }
      pos = end
    }
    out.result()
  }

  def read(bytes: Array[Byte]): Seq[Field] = {
    val out = Seq.newBuilder[Field]
    var pos = 0
    while (pos + 16 <= bytes.length) {
      require(bytes(pos) == 'G' && bytes(pos + 1) == 'R' &&
        bytes(pos + 2) == 'I' && bytes(pos + 3) == 'B',
        s"bad GRIB magic at byte $pos")
      val edition = bytes(pos + 7) & 0xFF
      require(edition == 2,
        s"GRIB edition $edition unsupported (GRIB2 only — convert " +
          "GRIB1 with wgrib2/cnvgrib)")
      val discipline = bytes(pos + 6) & 0xFF
      val total = ByteBuffer.wrap(bytes, pos + 8, 8)
        .order(ByteOrder.BIG_ENDIAN).getLong
      require(total >= 16 && pos + total <= bytes.length,
        s"GRIB message length $total overruns the file")
      out ++= readMessage(bytes, pos, (pos + total).toInt, discipline)
      pos = (pos + total).toInt
    }
    out.result()
  }

  // sign-magnitude integers (GRIB convention: MSB is the sign BIT)
  private def sm2(b: ByteBuffer): Int = {
    val raw = b.getShort & 0xFFFF
    if ((raw & 0x8000) != 0) -(raw & 0x7FFF) else raw
  }
  private def sm4(b: ByteBuffer): Long = {
    val raw = b.getInt.toLong & 0xFFFFFFFFL
    if ((raw & 0x80000000L) != 0) -(raw & 0x7FFFFFFFL) else raw
  }

  private final case class Grid(ni: Int, nj: Int, lat1: Double,
      lon1: Double, dLat: Double, dLon: Double, scanMode: Int,
      gridType: String = "latlon", lambert: Option[LambertGrid] = None,
      polar: Option[PolarGrid] = None,
      mercator: Option[MercatorGrid] = None,
      rotated: Option[RotatedGrid] = None,
      spaceview: Option[SpaceViewGrid] = None,
      gaussLats: Option[Array[Double]] = None,
      rowNi: Option[Array[Int]] = None) {
    def nPoints: Int = rowNi.map(_.sum).getOrElse(ni * nj)
  }
  private final case class Packing(tpl: Int, r: Double, e: Int, d: Int,
      nbits: Int, nPoints: Int,
      complex: Option[ComplexParams] = None,
      ccsds: Option[CcsdsParams] = None)
  /** Template 5.42 octets 22-25: the libaec flags mask (1 signed,
    * 4 MSB, 8 preprocess, 16 restricted, 32 pad-RSI), block size in
    * samples, reference sample interval in blocks.
    */
  private final case class CcsdsParams(flags: Int, blockSize: Int, rsi: Int)
  private final case class ComplexParams(
      ng: Int, widthRef: Int, widthBits: Int,
      lenRef: Int, lenInc: Int, lastLen: Int, lenBits: Int,
      diffOrder: Int, diffOctets: Int)

  private def readMessage(bytes: Array[Byte], start: Int, end: Int,
                          discipline: Int): Seq[Field] = {
    val out = Seq.newBuilder[Field]
    var pos = start + 16
    var refTime = ""
    var grid: Option[Grid] = None
    var product: Option[ProductInfo] = None
    var packing: Option[Packing] = None
    var bitmap: Option[Array[Boolean]] = None
    var lastBitmap: Option[Array[Boolean]] = None
    while (pos < end - 4) {
      val b = ByteBuffer.wrap(bytes, pos, end - pos)
        .order(ByteOrder.BIG_ENDIAN)
      val len = b.getInt
      val sec = b.get() & 0xFF
      require(len >= 5 && pos + len <= end,
        s"GRIB section $sec length $len overruns the message")
      sec match {
        case 1 =>
          b.position(b.position() + 7) // center(2) subcenter(2) tables(2) sig(1)
          val y = b.getShort & 0xFFFF
          val mo = b.get() & 0xFF; val d = b.get() & 0xFF
          val h = b.get() & 0xFF; val mi = b.get() & 0xFF
          val s = b.get() & 0xFF
          refTime = f"$y%04d-$mo%02d-$d%02dT$h%02d:$mi%02d:$s%02dZ"
        case 2 => () // local use
        case 3 =>
          b.get() // grid definition source
          b.getInt // number of data points
          val plOctets = b.get() & 0xFF // optional-list entry width
          val plInterp = b.get() & 0xFF // 1 = points per row
          val tpl = b.getShort & 0xFFFF
          // code table 3.2: (semi-major axis, first eccentricity²) —
          // spheres carry e² = 0, ellipsoids feed the projections'
          // ellipsoidal forms directly
          def earthShape(): (Double, Double) = {
            val shape = b.get() & 0xFF
            val rScale = b.get() & 0xFF
            val rVal = b.getInt
            val aScale = b.get() & 0xFF
            val aVal = b.getInt
            val bScale = b.get() & 0xFF
            val bVal = b.getInt
            def e2Of(a: Double, bAx: Double): Double =
              1.0 - (bAx / a) * (bAx / a)
            shape match {
              case 0 => (6367470.0, 0.0)
              case 1 => (rVal / math.pow(10, rScale), 0.0)
              case 2 => (6378160.0, e2Of(6378160.0, 6356775.0)) // IAU 65
              case 3 | 7 => // stored major/minor axes (km / m)
                val unit = if (shape == 3) 1000.0 else 1.0
                val a = aVal / math.pow(10, aScale) * unit
                val bAx = bVal / math.pow(10, bScale) * unit
                require(a > 0 && bAx > 0 && bAx <= a,
                  s"GRIB2 earth axes $a/$bAx invalid")
                (a, e2Of(a, bAx))
              case 4 => (6378137.0, e2Of(6378137.0, 6356752.314)) // GRS80
              case 5 => (6378137.0, 6.69437999014e-3) // WGS84
              case 6 => (6371229.0, 0.0) // the NWP sphere (GFS/HRRR)
              case o => throw new IllegalArgumentException(
                s"GRIB2 earth shape $o unsupported (table 3.2 codes 0-7)")
            }
          }
          def earthRadius(): Double = earthShape()._1
          tpl match {
            case 0 =>
              earthRadius() // consumed; lat/lon grids don't need it
              val ni = b.getInt; val nj = b.getInt
              b.getInt; b.getInt // basic angle + subdivisions
              val lat1 = sm4(b) / 1e6
              val lon1 = sm4(b) / 1e6
              b.get() // resolution/component flags
              sm4(b); sm4(b) // lat2/lon2 (derivable)
              val dLon = b.getInt / 1e6
              val dLat = b.getInt / 1e6
              val scan = b.get() & 0xFF
              grid = Some(Grid(ni, nj, lat1, lon1, dLat, dLon, scan))
            case 1 =>
              // rotated lat/lon (CORDEX/COSMO/ICON regional grids):
              // identical octets to 3.0 — but La1/Lo1/Di/Dj are
              // degrees in the ROTATED system — plus the southern
              // pole of projection and a rotation angle
              earthRadius() // consumed; degrees grids don't need it
              val ni = b.getInt; val nj = b.getInt
              b.getInt; b.getInt // basic angle + subdivisions
              val lat1 = sm4(b) / 1e6
              val lon1 = sm4(b) / 1e6
              b.get() // resolution/component flags
              sm4(b); sm4(b) // lat2/lon2 (derivable)
              val dLon = b.getInt / 1e6
              val dLat = b.getInt / 1e6
              val scan = b.get() & 0xFF
              val southLat = sm4(b) / 1e6
              val southLon = sm4(b) / 1e6
              val rot = sm4(b) / 1e6
              require(math.abs(rot) < 1e-9,
                s"GRIB2 rotated grid angle-of-rotation $rot° " +
                  "unsupported (0 only — the CORDEX/COSMO convention)")
              // CF grid_north_pole = the stored southern pole negated
              // and flipped 180° (CF conventions §5.6)
              val poleLat = -southLat
              val poleLon0 = southLon + 180.0
              val poleLon = if (poleLon0 > 180.0) poleLon0 - 360.0
                            else poleLon0
              grid = Some(Grid(ni, nj, lat1, lon1, dLat, dLon, scan,
                gridType = "rotated",
                rotated = Some(RotatedGrid(poleLat, poleLon))))
            case 30 =>
              // Lambert conformal (the HRRR/NAM native grid): first
              // point in microdegrees, increments in MILLIMETERS,
              // cone parallels Latin1/Latin2, orientation LoV
              val (radius, e2) = earthShape()
              val ni = b.getInt; val nj = b.getInt
              val la1 = sm4(b) / 1e6
              val lo1 = sm4(b) / 1e6
              b.get() // resolution/component flags
              val laD = sm4(b) / 1e6
              val lov = sm4(b) / 1e6
              val dx = b.getInt / 1e3
              val dy = b.getInt / 1e3
              b.get() // projection centre flag
              val scan = b.get() & 0xFF
              val latin1 = sm4(b) / 1e6
              val latin2 = sm4(b) / 1e6
              sm4(b); sm4(b) // southern-pole lat/lon (bipolar form)
              grid = Some(Grid(ni, nj, la1, lo1, dy, dx, scan,
                gridType = "lambert",
                lambert = Some(LambertGrid(radius, lov, laD,
                  latin1, latin2, e2))))
            case 20 =>
              // polar stereographic: first point, LaD true-scale
              // parallel, LoV orientation, mm increments
              val (radius, e2) = earthShape()
              val ni = b.getInt; val nj = b.getInt
              val la1 = sm4(b) / 1e6
              val lo1 = sm4(b) / 1e6
              b.get() // resolution/component flags
              val laD = sm4(b) / 1e6
              val lov = sm4(b) / 1e6
              val dx = b.getInt / 1e3
              val dy = b.getInt / 1e3
              val centre = b.get() & 0xFF // bit 1 set = south pole
              val scan = b.get() & 0xFF
              grid = Some(Grid(ni, nj, la1, lo1, dy, dx, scan,
                gridType = "polar",
                polar = Some(PolarGrid(radius, lov, laD,
                  north = (centre & 0x80) == 0, e2 = e2))))
            case 10 =>
              // Mercator: first point in microdegrees, LaD the
              // true-scale parallel, increments in MILLIMETERS at LaD.
              // NOTE the template's octet order: scan mode and the
              // grid orientation sit BEFORE Di/Dj here, unlike 3.0.
              val (radius, e2) = earthShape()
              val ni = b.getInt; val nj = b.getInt
              val la1 = sm4(b) / 1e6
              val lo1 = sm4(b) / 1e6
              b.get() // resolution/component flags
              val laD = sm4(b) / 1e6
              sm4(b); sm4(b) // la2/lo2 (derivable)
              val scan = b.get() & 0xFF
              val orient = sm4(b)
              require(orient == 0,
                s"GRIB2 Mercator grid orientation $orient unsupported " +
                  "(i must point east)")
              val di = b.getInt / 1e3
              val dj = b.getInt / 1e3
              grid = Some(Grid(ni, nj, la1, lo1, dj, di, scan,
                gridType = "mercator",
                mercator = Some(MercatorGrid(radius, laD, e2))))
            case 90 =>
              // space view (the geostationary imager grid): apparent
              // earth diameters dx/dy in grid lengths, sub-satellite
              // pixel Xp/Yp in 10⁻³ grid lengths, camera distance Nr
              // in 10⁻⁶ equatorial radii FROM THE EARTH CENTER, sector
              // origin Xo/Yo in grid lengths
              val (req, e2) = earthShape()
              val rpol = req * math.sqrt(1 - e2)
              val nx = b.getInt; val ny = b.getInt
              val lap = sm4(b) / 1e6
              val lop = sm4(b) / 1e6
              require(math.abs(lap) < 1e-9,
                s"GRIB2 space-view sub-satellite latitude $lap " +
                  "unsupported (geostationary view only)")
              b.get() // resolution/component flags
              val dx = b.getInt; val dy = b.getInt
              require(dx > 0 && dy > 0,
                s"GRIB2 space-view apparent diameters $dx x $dy invalid")
              val xp = b.getInt / 1e3
              val yp = b.getInt / 1e3
              val scan = b.get() & 0xFF
              val orient = sm4(b)
              require(orient == 0,
                s"GRIB2 space-view grid orientation $orient unsupported")
              val nr = b.getInt.toLong & 0xFFFFFFFFL
              require(nr != 0xFFFFFFFFL,
                "GRIB2 space-view orthographic view (missing Nr) " +
                  "unsupported")
              val height = nr * 1e-6 * req
              require(height > req,
                s"GRIB2 space-view camera distance $height m is inside " +
                  "the earth")
              val xo = b.getInt; val yo = b.getInt
              val rx = 2 * math.asin(req / height) / dx
              val ry = 2 * math.asin(rpol / height) / dy
              grid = Some(Grid(nx, ny, lap, lop, ry, rx, scan,
                gridType = "spaceview",
                spaceview = Some(SpaceViewGrid(req, rpol, lop, height,
                  rx, ry, xp, yp, xo, yo))))
            case 40 =>
              // regular OR reduced Gaussian (the ECMWF native grids):
              // same octets as 3.0 except Dj is replaced by N, the
              // parallel count between pole and equator; latitudes
              // come from the Gaussian table, La1/La2 select the
              // (possibly regional) row subset. A REDUCED grid marks
              // Ni missing and appends the per-row point counts (the
              // PL list) after the template.
              earthRadius()
              val niRaw = b.getInt; val nj = b.getInt
              val reduced = niRaw == -1 // 0xFFFFFFFF = missing
              val ni = if (reduced) -1 else niRaw
              b.getInt; b.getInt // basic angle + subdivisions
              val lat1 = sm4(b) / 1e6
              val lon1 = sm4(b) / 1e6
              b.get() // resolution/component flags
              val lat2 = sm4(b) / 1e6
              sm4(b) // lon2 (derivable)
              val diRaw = b.getInt
              val dLon = if (reduced) 0.0 else diRaw / 1e6
              val nPar = b.getInt
              val scan = b.get() & 0xFF
              val pl: Option[Array[Int]] =
                if (!reduced) None
                else {
                  require(plOctets > 0 && plOctets <= 4 && plInterp == 1,
                    s"GRIB2 reduced Gaussian grid needs a points-per-row " +
                      s"list (octets $plOctets, interpretation $plInterp)")
                  Some(Array.fill(nj) {
                    var v = 0
                    var k = 0
                    while (k < plOctets) { v = (v << 8) | (b.get() & 0xFF)
                      k += 1 }
                    v
                  })
                }
              val all = gaussianLatitudes(nPar)
              def nearest(lat: Double): Int = {
                var best = 0; var bd = Double.MaxValue
                var i = 0
                while (i < all.length) {
                  val d = math.abs(all(i) - lat)
                  if (d < bd) { bd = d; best = i }
                  i += 1
                }
                require(bd < 1e-3,
                  f"GRIB2 Gaussian grid latitude $lat%.6f is not a " +
                    s"parallel of the N$nPar table (nearest off by " +
                    f"$bd%.6f°)")
                best
              }
              val i1 = nearest(lat1); val i2 = nearest(lat2)
              val lo = math.min(i1, i2); val hi = math.max(i1, i2)
              require(hi - lo + 1 == nj,
                s"GRIB2 Gaussian grid rows $nj != La1..La2 span " +
                  s"${hi - lo + 1} in the N$nPar table")
              grid = Some(Grid(ni, nj, lat1, lon1, 0.0, dLon, scan,
                gridType = "gaussian",
                gaussLats = Some(
                  java.util.Arrays.copyOfRange(all, lo, hi + 1)),
                rowNi = pl))
            case t => throw new IllegalArgumentException(
              s"GRIB2 grid template 3.$t unsupported (lat/lon 3.0, " +
                "rotated 3.1, Mercator 3.10, polar 3.20, Lambert " +
                "3.30, Gaussian 3.40, space view 3.90 — regrid with " +
                "wgrib2 -new_grid)")
          }
        case 4 =>
          b.getShort // coordinate values count
          val tpl = b.getShort & 0xFFFF
          if (tpl == 0 || tpl == 1 || tpl == 2 || tpl == 5 || tpl == 8 ||
              tpl == 9 || tpl == 11 || tpl == 12) {
            val cat = b.get() & 0xFF
            val par = b.get() & 0xFF
            b.get(); b.get(); b.get() // process type/id/background
            b.getShort; b.get() // cutoff hours + minutes... (template 4.0 octets 19-22)
            val unit = b.get() & 0xFF
            val fcst = b.getInt
            val hours = unit match {
              case 0 => Some(fcst / 60) // minutes
              case 1 => Some(fcst) // hours
              case 2 => Some(fcst * 24) // days
              case _ => None
            }
            // 4.1/4.11 append (type, member, count) after the two
            // fixed surfaces; 4.5/4.9 the probability block; 4.8/4.9/
            // 4.11 then carry the time-interval block (end time +
            // per-range statistical process)
            val ens =
              if (tpl == 1 || tpl == 11) {
                b.position(b.position() + 12) // two fixed surfaces
                Some((b.get() & 0xFF, b.get() & 0xFF, b.get() & 0xFF))
              } else None
            val derived =
              if (tpl == 2 || tpl == 12) {
                b.position(b.position() + 12) // two fixed surfaces
                Some((b.get() & 0xFF, b.get() & 0xFF))
              } else None
            val prob =
              if (tpl == 5 || tpl == 9) {
                b.position(b.position() + 12) // two fixed surfaces
                val number = b.get() & 0xFF
                val total = b.get() & 0xFF
                val ptype = b.get() & 0xFF
                // each bound: 1-octet sign-magnitude scale + 4-octet
                // sign-magnitude scaled value; ALL-ONES = missing.
                // micro-units = scaled·10^(6−scale), exact integers
                def bound(): Option[Long] = {
                  val rawScale = b.get() & 0xFF
                  val rawVal = b.getInt
                  if (rawScale == 0xFF && rawVal == -1) None
                  else {
                    val scale = if ((rawScale & 0x80) != 0)
                      -(rawScale & 0x7F) else rawScale
                    val v = if ((rawVal & 0x80000000) != 0)
                      -(rawVal & 0x7FFFFFFF).toLong else rawVal.toLong
                    require(scale >= -3 && scale <= 6,
                      s"GRIB2 probability threshold scale $scale " +
                        "unsupported (-3..6)")
                    var m = v
                    var k = 6 - scale
                    while (k > 0) { m *= 10; k -= 1 }
                    Some(m)
                  }
                }
                val lo = bound(); val hi = bound()
                Some(ProbInfo(number, total, ptype, lo, hi))
              } else None
            val stat =
              if (tpl == 8 || tpl == 9 || tpl == 11 || tpl == 12) {
                if (tpl == 8) b.position(b.position() + 12) // surfaces
                b.position(b.position() + 7) // interval end time
                val nRanges = b.get() & 0xFF
                b.getInt // missing-in-interval count
                require(nRanges >= 1, "4.8 with no time ranges")
                val proc = b.get() & 0xFF // 0 avg, 1 accum, 2 max, 3 min
                b.get() // type of time increment
                val spanUnit = b.get() & 0xFF
                val span = b.getInt
                val spanHours = spanUnit match {
                  case 0 => Some(span / 60); case 1 => Some(span)
                  case 2 => Some(span * 24); case _ => None
                }
                Some((proc, spanHours))
              } else None
            product = Some(ProductInfo(cat, par, hours, ens, stat, prob,
              derived))
          } else product = Some(ProductInfo(-1, -1, None)) // opaque
        case 5 =>
          val nPoints = b.getInt
          val tpl = b.getShort & 0xFFFF
          tpl match {
            case 0 | 41 =>
              val r = b.getFloat.toDouble
              val e = sm2(b)
              val d = sm2(b)
              val nbits = b.get() & 0xFF
              packing = Some(Packing(tpl, r, e, d, nbits, nPoints))
            case 42 => // CCSDS/AEC (libaec raw stream in section 7)
              val r = b.getFloat.toDouble
              val e = sm2(b)
              val d = sm2(b)
              val nbits = b.get() & 0xFF
              b.get() // original field type
              val flags = b.get() & 0xFF
              val blockSize = b.get() & 0xFF
              val rsi = b.getShort & 0xFFFF
              require((flags & 16) == 0,
                "GRIB2 CCSDS restricted coding (AEC_RESTRICTED) unsupported")
              packing = Some(Packing(tpl, r, e, d, nbits, nPoints,
                ccsds = Some(CcsdsParams(flags, blockSize, rsi))))
            case 2 | 3 =>
              val r = b.getFloat.toDouble
              val e = sm2(b)
              val d = sm2(b)
              val nbits = b.get() & 0xFF
              b.get() // original field type
              val split = b.get() & 0xFF
              require(split == 1,
                s"GRIB2 group-splitting method $split unsupported (1 only)")
              val mvm = b.get() & 0xFF
              require(mvm == 0,
                s"GRIB2 missing-value management $mvm unsupported " +
                  "(bitmap-encoded missing only)")
              b.getInt; b.getInt // primary/secondary missing substitutes
              val ng = b.getInt
              val widthRef = b.get() & 0xFF
              val widthBits = b.get() & 0xFF
              val lenRef = b.getInt
              val lenInc = b.get() & 0xFF
              val lastLen = b.getInt
              val lenBits = b.get() & 0xFF
              val (ord, octs) =
                if (tpl == 3) ((b.get() & 0xFF, b.get() & 0xFF)) else ((0, 0))
              require(tpl == 2 || ord == 1 || ord == 2,
                s"GRIB2 spatial differencing order $ord unsupported (1/2)")
              packing = Some(Packing(tpl, r, e, d, nbits, nPoints,
                Some(ComplexParams(ng, widthRef, widthBits, lenRef,
                  lenInc, lastLen, lenBits, ord, octs))))
            case 40 => // JPEG2000 codestream in section 7
              val r = b.getFloat.toDouble
              val e = sm2(b)
              val d = sm2(b)
              val nbits = b.get() & 0xFF
              b.get() // original field type
              val compType = b.get() & 0xFF
              require(compType == 0,
                s"GRIB2 JPEG2000 lossy compression (type $compType) " +
                  "unsupported — GRIB archives pack losslessly (type 0)")
              b.get() // target compression ratio (lossless: 255)
              packing = Some(Packing(tpl, r, e, d, nbits, nPoints))
            case t => throw new IllegalArgumentException(
              s"GRIB2 data template 5.$t unsupported")
          }
        case 6 =>
          val ind = b.get() & 0xFF
          ind match {
            case 0 =>
              val g = grid.getOrElse(
                throw new IllegalArgumentException("bitmap before grid"))
              val n = g.ni * g.nj
              val bm = new Array[Boolean](n)
              var i = 0
              while (i < n) {
                bm(i) = (bytes(pos + 6 + i / 8) & (0x80 >> (i % 8))) != 0
                i += 1
              }
              bitmap = Some(bm); lastBitmap = Some(bm)
            case 254 =>
              // reuse-previous across a sub-file split boundary would
              // silently drop the mask — fail loudly instead
              require(lastBitmap.isDefined,
                "GRIB2 bitmap indicator 254 (reuse previous) with no " +
                  "prior bitmap in this read — message split away from " +
                  "its bitmap carrier?")
              bitmap = lastBitmap
            case 255 => bitmap = None
            case o => throw new IllegalArgumentException(
              s"GRIB2 bitmap indicator $o unsupported (0/254/255)")
          }
        case 7 =>
          val g = grid.getOrElse(
            throw new IllegalArgumentException("data before grid section"))
          val p = packing.getOrElse(
            throw new IllegalArgumentException("data before representation"))
          val pi = product.getOrElse(ProductInfo(-1, -1, None))
          val packed: Array[Long] = p.tpl match {
            case 0 => unpackBits(bytes, pos + 5, len - 5, p.nbits, p.nPoints)
            case 40 =>
              if (p.nbits == 0) new Array[Long](p.nPoints)
              else {
                val (jw, jh, _, vals) = Jpeg2k.decode(
                  java.util.Arrays.copyOfRange(bytes, pos + 5, pos + len))
                require(jw * jh == p.nPoints,
                  s"JPEG2000 raster ${jw}x$jh != ${p.nPoints} packed points")
                vals
              }
            case 41 => unpackPng(bytes, pos + 5, len - 5, p.nbits, p.nPoints)
            case 2 | 3 =>
              unpackComplex(bytes, pos + 5, len - 5, p)
            case 42 =>
              val c = p.ccsds.get
              if (p.nbits == 0) new Array[Long](p.nPoints)
              else Ccsds.decode(
                java.util.Arrays.copyOfRange(bytes, pos + 5, pos + len),
                p.nPoints,
                Ccsds.Params(p.nbits, c.blockSize, c.rsi,
                  preprocess = (c.flags & 8) != 0,
                  signed = (c.flags & 1) != 0,
                  padRsi = (c.flags & 32) != 0))
          }
          val scale = math.pow(2, p.e) / math.pow(10, p.d)
          val rScaled = p.r / math.pow(10, p.d)
          val n = g.nPoints
          val vals = new Array[Double](n)
          bitmap match {
            case Some(bm) =>
              var vi = 0
              var i = 0
              while (i < n) {
                if (bm(i)) { vals(i) = rScaled + packed(vi) * scale; vi += 1 }
                else vals(i) = Double.NaN
                i += 1
              }
            case None =>
              require(p.nPoints == n,
                s"packed point count ${p.nPoints} != grid $n without bitmap")
              var i = 0
              while (i < n) { vals(i) = rScaled + packed(i) * scale; i += 1 }
          }
          val up = (g.scanMode & 0x40) != 0
          out += Field(discipline, pi.category, pi.parameter, refTime,
            pi.forecastHours,
            g.ni, g.nj, g.lat1, g.lon1, g.dLat, g.dLon, g.scanMode,
            normalizeScan(vals, g), g.gridType, g.lambert, g.polar,
            g.mercator, g.rotated, g.spaceview,
            g.gaussLats,
            g.rowNi.map(pl => if (up) pl.reverse else pl),
            pi.ensemble, pi.stat, pi.prob, pi.derived)
        case 0 | 8 => () // handled by the outer walk
        case o => throw new IllegalArgumentException(
          s"GRIB2 section $o unexpected")
      }
      pos += len
    }
    require(bytes(end - 4) == '7' && bytes(end - 3) == '7' &&
      bytes(end - 2) == '7' && bytes(end - 1) == '7',
      "GRIB message missing 7777 trailer")
    out.result()
  }

  /** Normalize storage to +i, −j (row 0 = northernmost, west→east):
    * scan-mode bit 7 (0x80) set = −i (east→west) → reverse each row;
    * bit 6 (0x40) set = +j (south→north) → reverse row order. Bit 5
    * (0x20, j-consecutive) is rejected.
    */
  private def normalizeScan(vals: Array[Double], g: Grid): Array[Double] = {
    require((g.scanMode & 0x20) == 0,
      s"GRIB2 j-consecutive scan mode ${g.scanMode} unsupported")
    if (g.rowNi.isDefined) {
      // ragged (reduced Gaussian) rows: reverse within rows / reorder
      // whole rows through per-row offsets
      val pl = g.rowNi.get
      val out = new Array[Double](vals.length)
      val off = pl.scanLeft(0)(_ + _)
      var dst = 0
      var j = 0
      while (j < g.nj) {
        val srcRow = if ((g.scanMode & 0x40) != 0) g.nj - 1 - j else j
        val w = pl(srcRow)
        var i = 0
        while (i < w) {
          val srcCol = if ((g.scanMode & 0x80) != 0) w - 1 - i else i
          out(dst) = vals(off(srcRow) + srcCol)
          dst += 1; i += 1
        }
        j += 1
      }
      return out
    }
    val out = new Array[Double](vals.length)
    var j = 0
    while (j < g.nj) {
      val srcRow = if ((g.scanMode & 0x40) != 0) g.nj - 1 - j else j
      var i = 0
      while (i < g.ni) {
        val srcCol = if ((g.scanMode & 0x80) != 0) g.ni - 1 - i else i
        out(j * g.ni + i) = vals(srcRow * g.ni + srcCol)
        i += 1
      }
      j += 1
    }
    out
  }

  /** MSB-first fixed-width unpack (section 7, template 5.0). */
  private def unpackBits(bytes: Array[Byte], off: Int, len: Int,
                         nbits: Int, n: Int): Array[Long] = {
    val out = new Array[Long](n)
    if (nbits == 0) return out // constant field: all values = R
    require(nbits <= 32, s"GRIB2 packing width $nbits unsupported")
    require(n.toLong * nbits <= len.toLong * 8,
      s"packed data too short: need ${n.toLong * nbits} bits, have ${len * 8}")
    var bit = 0L
    var i = 0
    while (i < n) {
      var v = 0L
      var k = 0
      while (k < nbits) {
        val byteAt = off + (bit >> 3).toInt
        val get = (bytes(byteAt) >> (7 - (bit & 7)).toInt) & 1
        v = (v << 1) | get
        bit += 1; k += 1
      }
      out(i) = v
      i += 1
    }
    out
  }

  /** Templates 5.2/5.3 (complex packing, general group splitting, no
    * missing-value management — bitmap-encoded missing only): section
    * 7 carries, each block zero-padded to an octet boundary, the NG
    * group references (nbits wide), group widths (widthBits wide, plus
    * widthRef), scaled group lengths (lenBits wide → ref + scaled·inc,
    * last group overridden by the header's true length), then each
    * group's values at its own width. 5.3 prefixes the section with
    * `order` initial field values and the overall minimum g_min of the
    * differences (sign-magnitude, diffOctets wide each); the packed
    * stream then holds the biased differences, reconstructed as
    * Y_i = d_i + g_min + Y_{i-1} (order 1) or + 2Y_{i-1} − Y_{i-2}
    * (order 2), with the first `order` values taken verbatim.
    */
  private def unpackComplex(bytes: Array[Byte], off: Int, len: Int,
                            p: Packing): Array[Long] = {
    val cp = p.complex.get
    var bit = 0L
    val limit = len.toLong * 8
    def readBits(n: Int): Long = {
      require(bit + n <= limit, s"complex-packed data overruns section 7")
      var v = 0L; var k = 0
      while (k < n) {
        v = (v << 1) |
          ((bytes(off + (bit >> 3).toInt) >> (7 - (bit & 7)).toInt) & 1)
        bit += 1; k += 1
      }
      v
    }
    def align(): Unit = { val r = bit % 8; if (r != 0) bit += 8 - r }
    def readSm(octets: Int): Long = {
      val raw = readBits(octets * 8)
      val signBit = 1L << (octets * 8 - 1)
      if ((raw & signBit) != 0) -(raw & (signBit - 1)) else raw
    }
    val init = new Array[Long](cp.diffOrder)
    var gmin = 0L
    if (p.tpl == 3) {
      var k = 0
      while (k < cp.diffOrder) { init(k) = readSm(cp.diffOctets); k += 1 }
      gmin = readSm(cp.diffOctets)
    }
    val refs = Array.fill(cp.ng)(
      if (p.nbits == 0) 0L else readBits(p.nbits))
    align()
    val widths = Array.fill(cp.ng)(cp.widthRef +
      (if (cp.widthBits == 0) 0L else readBits(cp.widthBits)))
    align()
    val lens = Array.fill(cp.ng)(cp.lenRef.toLong +
      (if (cp.lenBits == 0) 0L else readBits(cp.lenBits)) * cp.lenInc)
    if (cp.ng > 0) lens(cp.ng - 1) = cp.lastLen
    align()
    require(lens.sum == p.nPoints,
      s"group lengths sum ${lens.sum} != packed point count ${p.nPoints}")
    val out = new Array[Long](p.nPoints)
    var idx = 0
    var g = 0
    while (g < cp.ng) {
      val w = widths(g).toInt
      var i = 0L
      while (i < lens(g)) {
        out(idx) = refs(g) + (if (w == 0) 0L else readBits(w))
        idx += 1; i += 1
      }
      g += 1
    }
    if (p.tpl == 3) {
      var i = 0
      while (i < cp.diffOrder && i < out.length) { out(i) = init(i); i += 1 }
      if (cp.diffOrder == 1) {
        while (i < out.length) { out(i) = out(i) + gmin + out(i - 1); i += 1 }
      } else {
        while (i < out.length) {
          out(i) = out(i) + gmin + 2 * out(i - 1) - out(i - 2); i += 1
        }
      }
    }
    out
  }

  /** Template 5.41: the packed integers are the pixels of a PNG
    * (grayscale 8/16-bit per the declared width), decoded via ImageIO.
    */
  private def unpackPng(bytes: Array[Byte], off: Int, len: Int,
                        nbits: Int, n: Int): Array[Long] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes, off, len))
    require(img != null, "GRIB2 PNG payload did not decode")
    val w = img.getWidth; val h = img.getHeight
    require(w * h == n, s"PNG pixel count ${w * h} != packed count $n")
    val raster = img.getRaster
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = raster.getSample(i % w, i / w, 0).toLong & 0xFFFFFFFFL
      i += 1
    }
    out
  }
}
