package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** F11 — `proj_to_geo` (ref utils.py:161-166): reproject a projected
  * bbox to EPSG:4326 with densified-edge sampling, matching rasterio's
  * `transform_bounds`.
  *
  * The reference's inputs are the two IceNet grids: EPSG:6931 (WGS84
  * Lambert Azimuthal Equal-Area, north polar) and EPSG:6932 (south
  * polar). The inverse LAEA mapping is implemented from the public
  * Snyder formulas (Map Projections — A Working Manual, USGS PP 1395,
  * pp. 187-190): polar-aspect inverse to authalic latitude β, then the
  * series expansion back to geodetic latitude. EPSG:4326 input passes
  * through. Implemented as plain Scala + a UDF wrapper — the one scalar
  * in the reference that has no Catalyst-expressible form; upgrade path
  * is a codegen Expression if it ever lands in a hot loop.
  */
object Geo {

  private val A  = 6378137.0               // WGS84 semi-major
  private val E2 = 6.69437999014e-3        // WGS84 first eccentricity²
  private val E  = math.sqrt(E2)

  /** q_p — authalic function at the pole (Snyder 3-12 at φ=90°). */
  private val Qp = (1 - E2) *
    (1.0 / (1 - E2) - (1.0 / (2 * E)) * math.log((1 - E) / (1 + E)))

  // Authalic→geodetic series coefficients (Snyder 3-18).
  private val C2 = E2 / 3 + 31 * E2 * E2 / 180 + 517 * E2 * E2 * E2 / 5040
  private val C4 = 23 * E2 * E2 / 360 + 251 * E2 * E2 * E2 / 3780
  private val C6 = 761 * E2 * E2 * E2 / 45360

  /** Inverse polar-aspect LAEA: projected (x, y) in meters → (lon, lat)
    * degrees. `north` selects the EPSG:6931 (true) / 6932 (false) aspect.
    */
  def laeaInverse(x: Double, y: Double, north: Boolean): (Double, Double) = {
    val rho = math.hypot(x, y)
    if (rho < 1e-9) return (0.0, if (north) 90.0 else -90.0)
    // Forward polar: ρ = a·sqrt(q_p − q) (north) / a·sqrt(q_p + q) (south)
    val qAbs = Qp - (rho / A) * (rho / A)
    val q = if (north) qAbs else -qAbs
    val sinBeta = math.max(-1.0, math.min(1.0, q / Qp))
    val beta = math.asin(sinBeta)
    val phi = beta + C2 * math.sin(2 * beta) + C4 * math.sin(4 * beta) +
      C6 * math.sin(6 * beta)
    val lam =
      if (north) math.atan2(x, -y)   // λ measured from −y axis (Snyder 20-16)
      else math.atan2(x, y)          // south aspect (Snyder 20-17)
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  /** Forward polar-aspect LAEA: (lon, lat) degrees → projected (x, y)
    * meters (Snyder 24-23/24-24 polar forms with the authalic radius
    * construction 3-11/3-12; the exact inverse of [[laeaInverse]]).
    */
  def laeaForward(lonDeg: Double, latDeg: Double, north: Boolean): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg)
    val sinPhi = math.sin(phi)
    val q = (1 - E2) * (sinPhi / (1 - E2 * sinPhi * sinPhi) -
      (1.0 / (2 * E)) * math.log((1 - E * sinPhi) / (1 + E * sinPhi)))
    val rho = A * math.sqrt(math.max(0.0, if (north) Qp - q else Qp + q))
    if (north) (rho * math.sin(lam), -rho * math.cos(lam))
    else (rho * math.sin(lam), rho * math.cos(lam))
  }

  /** Geographic → projected forward dispatch over the supported CRS set
    * (the warp direction EPSG:4326 reproject-on-write needs: every
    * destination pixel maps BACK through this to sample the source).
    */
  def forward(crs: String, lonDeg: Double, latDeg: Double): (Double, Double) =
    crs.trim.toUpperCase match {
      case "EPSG:4326" => (lonDeg, latDeg)
      case "EPSG:6931" => laeaForward(lonDeg, latDeg, north = true)
      case "EPSG:6932" => laeaForward(lonDeg, latDeg, north = false)
      case ps if PolarStereoCrs.contains(ps) =>
        PolarStereoCrs(ps).forward(lonDeg, latDeg)
      case lcc if LccCrs.contains(lcc) =>
        LccCrs(lcc).forward(lonDeg, latDeg)
      case "MODIS:SIN" => Sinusoidal().forward(lonDeg, latDeg)
      case "EPSG:5070" => conusAlbers.forward(lonDeg, latDeg)
      case UtmEpsg(tm) => tm.forward(lonDeg, latDeg)
      case other =>
        throw new IllegalArgumentException(s"Unsupported CRS: $other")
    }

  /** Extractor for the WGS84 UTM EPSG range: 32601-32660 north,
    * 32701-32760 south.
    */
  private object UtmEpsg {
    def unapply(crs: String): Option[TransverseMercator] =
      if (!crs.startsWith("EPSG:32")) None
      else crs.drop(5).toIntOption.collect {
        case c if c >= 32601 && c <= 32660 => utm(c - 32600, north = true)
        case c if c >= 32701 && c <= 32760 => utm(c - 32700, north = false)
      }
  }

  /** Projected bbox [w, s, e, n] → geographic bbox, via rasterio-style
    * edge densification (`densify_pts` intermediate points per edge) plus
    * pole containment: a polar-aspect bbox holding the projection origin
    * contains the pole itself, so longitude spans the full ±180 and the
    * polar latitude saturates — exactly `transform_bounds` behavior.
    */
  def projToGeo(bbox: Seq[Double], srcCrs: String,
                densifyPts: Int = 21): Seq[Double] = {
    val Seq(w, s, e, n) = bbox
    srcCrs.trim.toUpperCase match {
      case "EPSG:4326" => bbox
      case "EPSG:6931" | "EPSG:6932" =>
        val north = srcCrs.trim.toUpperCase == "EPSG:6931"
        val pts = edgePoints(w, s, e, n, densifyPts).map { case (x, y) =>
          laeaInverse(x, y, north)
        }
        val lons = pts.map(_._1); val lats = pts.map(_._2)
        val poleInside = w <= 0 && 0 <= e && s <= 0 && 0 <= n
        if (poleInside && north)
          Seq(-180.0, lats.min, 180.0, 90.0)
        else if (poleInside)
          Seq(-180.0, -90.0, 180.0, lats.max)
        else
          Seq(lons.min, lats.min, lons.max, lats.max)
      case ps if PolarStereoCrs.contains(ps) =>
        val proj = PolarStereoCrs(ps)
        val pts = edgePoints(w, s, e, n, densifyPts).map { case (x, y) =>
          proj.inverse(x, y)
        }
        val lons = pts.map(_._1); val lats = pts.map(_._2)
        // the projection origin sits at the pole in both aspects
        val poleInside = w <= 0 && 0 <= e && s <= 0 && 0 <= n
        if (poleInside && proj.north)
          Seq(-180.0, lats.min, 180.0, 90.0)
        else if (poleInside)
          Seq(-180.0, -90.0, 180.0, lats.max)
        else
          Seq(lons.min, lats.min, lons.max, lats.max)
      case lcc if LccCrs.contains(lcc) =>
        val proj = LccCrs(lcc)
        val pts = edgePoints(w, s, e, n, densifyPts).map { case (x, y) =>
          proj.inverse(x, y)
        }
        val lons = pts.map(_._1); val lats = pts.map(_._2)
        // the cone apex is the pole on the concave side; a bbox holding
        // it contains that pole, so longitude wraps
        val (ax, ay) = proj.apex
        val apexInside = w <= ax && ax <= e && s <= ay && ay <= n
        if (apexInside && proj.n >= 0)
          Seq(-180.0, lats.min, 180.0, 90.0)
        else if (apexInside)
          Seq(-180.0, -90.0, 180.0, lats.max)
        else
          Seq(lons.min, lats.min, lons.max, lats.max)
      case "MODIS:SIN" =>
        val proj = Sinusoidal()
        val halfMeridian = proj.r * math.Pi / 2 // y at the poles
        val pts = edgePoints(w, s, e, n, densifyPts).map { case (x, y) =>
          proj.inverse(x, y)
        }
        val lons = pts.map(_._1); val lats = pts.map(_._2)
        // a bbox whose top/bottom edge reaches a pole row spans all
        // longitudes at that pole (1 cm slack absorbs the mm-rounded
        // published grid constants)
        val (loW, loE) =
          if (n >= halfMeridian - 1e-2 || s <= -halfMeridian + 1e-2)
            (-180.0, 180.0)
          else (lons.min, lons.max)
        Seq(loW, lats.min, loE, lats.max)
      case "EPSG:5070" =>
        val proj = conusAlbers
        val pts = edgePoints(w, s, e, n, densifyPts).map { case (x, y) =>
          proj.inverse(x, y)
        }
        Seq(pts.map(_._1).min, pts.map(_._2).min,
          pts.map(_._1).max, pts.map(_._2).max)
      case UtmEpsg(proj) =>
        // cylindrical aspect: no pole/apex inside any in-zone bbox
        val pts = edgePoints(w, s, e, n, densifyPts).map { case (x, y) =>
          proj.inverse(x, y)
        }
        Seq(pts.map(_._1).min, pts.map(_._2).min,
          pts.map(_._1).max, pts.map(_._2).max)
      case other =>
        throw new IllegalArgumentException(s"Unsupported CRS: $other")
    }
  }

  /** Ellipsoidal polar stereographic (Snyder PP 1395 §21, pp. 160-162):
    * the NSIDC sea-ice grid family. Parameterized on ellipsoid
    * (a, e²), standard parallel φ_c and central meridian λ0.
    */
  final case class PolarStereo(a: Double, e2: Double, latTs: Double,
                               lon0: Double, north: Boolean) {
    private val e = math.sqrt(e2)
    private def tOf(phi: Double): Double =
      math.tan(math.Pi / 4 - phi / 2) *
        math.pow((1 + e * math.sin(phi)) / (1 - e * math.sin(phi)), e / 2)
    private def mOf(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    private val phiC = math.toRadians(math.abs(latTs))
    private val tC = tOf(phiC)
    private val mC = mOf(phiC)

    /** Forward: (lon, lat) degrees → (x, y) meters (Snyder 21-17..21-19,
      * south aspect via the sign-flip substitution 21-10/21-11).
      */
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val (lon, lat) =
        if (north) (math.toRadians(lonDeg), math.toRadians(latDeg))
        else (-math.toRadians(lonDeg), -math.toRadians(latDeg))
      val lam0 = if (north) math.toRadians(lon0) else -math.toRadians(lon0)
      val rho = a * mC * tOf(lat) / tC
      val x = rho * math.sin(lon - lam0)
      val y = -rho * math.cos(lon - lam0)
      if (north) (x, y) else (-x, -y)
    }

    /** Inverse: (x, y) meters → (lon, lat) degrees (Snyder 21-39/21-40,
      * iterated 7-9).
      */
    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val (x, y) = if (north) (xIn, yIn) else (-xIn, -yIn)
      val lam0 = if (north) math.toRadians(lon0) else -math.toRadians(lon0)
      val rho = math.hypot(x, y)
      if (rho < 1e-9)
        return (lon0, if (north) 90.0 else -90.0)
      val t = rho * tC / (a * mC)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 10) {
        val next = math.Pi / 2 - 2 * math.atan(t *
          math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2))
        if (math.abs(next - phi) < 1e-12) { phi = next; i = 10 }
        else { phi = next; i += 1 }
      }
      val lam = lam0 + math.atan2(x, -y)
      val (lonR, latR) = if (north) (lam, phi) else (-lam, -phi)
      (normLon(math.toDegrees(lonR)), math.toDegrees(latR))
    }
  }

  /** Ellipsoidal Lambert Conformal Conic, 2 standard parallels (Snyder
    * PP 1395 §15, pp. 104-110; eqs 14-1/14-2, 15-8/15-9, 15-17..15-19):
    * the regional forecast-model grid family (NOAA HRRR/NAM, Lambert-93,
    * most CORDEX LCC domains). `lat1 == lat2` takes the single-parallel
    * limit n = sin φ1; a sphere is the e² = 0 degenerate of the same
    * equations. Carries false easting/northing (x0, y0).
    */
  final case class LambertConformal(a: Double, e2: Double,
                                    lat1: Double, lat2: Double,
                                    lat0: Double, lon0: Double,
                                    x0: Double = 0.0, y0: Double = 0.0) {
    private val e = math.sqrt(e2)
    private def tOf(phi: Double): Double =
      math.tan(math.Pi / 4 - phi / 2) *
        math.pow((1 + e * math.sin(phi)) / (1 - e * math.sin(phi)), e / 2)
    private def mOf(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    private val p1 = math.toRadians(lat1)
    private val p2 = math.toRadians(lat2)
    /** Cone constant (15-17; sin φ1 in the tangent-cone limit). */
    val n: Double =
      if (math.abs(lat1 - lat2) < 1e-9) math.sin(p1)
      else (math.log(mOf(p1)) - math.log(mOf(p2))) /
        (math.log(tOf(p1)) - math.log(tOf(p2)))
    private val bigF = mOf(p1) / (n * math.pow(tOf(p1), n))
    private val rho0 = a * bigF * math.pow(tOf(math.toRadians(lat0)), n)

    /** Forward: (lon, lat) degrees → (x, y) meters (14-1/14-2). */
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val rho = a * bigF * math.pow(tOf(math.toRadians(latDeg)), n)
      val theta = n * math.toRadians(normLon(lonDeg - lon0))
      (x0 + rho * math.sin(theta), y0 + rho0 - rho * math.cos(theta))
    }

    /** Inverse: (x, y) meters → (lon, lat) degrees (14-10/14-11,
      * 15-10/15-11; φ from t via the 7-9 fixed-point iteration).
      */
    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val x = xIn - x0
      val yc = rho0 - (yIn - y0)
      val sgn = if (n >= 0) 1.0 else -1.0
      val rho = sgn * math.hypot(x, yc)
      if (math.abs(rho) < 1e-9)
        return (lon0, if (n >= 0) 90.0 else -90.0) // cone apex = pole
      val theta = math.atan2(sgn * x, sgn * yc)
      val lam = theta / n + math.toRadians(lon0)
      val t = math.pow(rho / (a * bigF), 1 / n)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 10) {
        val next = math.Pi / 2 - 2 * math.atan(t *
          math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2))
        if (math.abs(next - phi) < 1e-12) { phi = next; i = 10 }
        else { phi = next; i += 1 }
      }
      (normLon(math.toDegrees(lam)), math.toDegrees(phi))
    }

    /** The cone apex (the pole on the concave side) in projected meters:
      * the point where ρ = 0 — a bbox containing it contains the pole.
      */
    def apex: (Double, Double) = (x0, y0 + rho0)
  }

  /** CF `rotated_latitude_longitude` (the CORDEX regional-climate grid
    * mapping): a spherical lat-lon system whose north pole sits at
    * geographic (poleLon, poleLat). Closed forms derived from the
    * rotation R = Rz(λp)·Ry(π/2−θp)·Rz(π) — the composition under
    * which the rotated pole maps to (λp, θp) and the rotated origin to
    * (λp+180°, 90°−θp), the CF/COSMO convention (ref: CF conventions
    * §5.6 grid_north_pole_latitude/longitude).
    */
  final case class RotatedPole(poleLat: Double, poleLon: Double) {
    private val tp = math.toRadians(poleLat)
    private val sinTp = math.sin(tp)
    private val cosTp = math.cos(tp)

    /** Rotated (rlon, rlat) degrees → geographic (lon, lat) degrees. */
    def toGeo(rlonDeg: Double, rlatDeg: Double): (Double, Double) = {
      val lr = math.toRadians(rlonDeg)
      val pr = math.toRadians(rlatDeg)
      val sinPhi = math.sin(pr) * sinTp + math.cos(pr) * cosTp * math.cos(lr)
      val lat = math.asin(math.max(-1.0, math.min(1.0, sinPhi)))
      val lon = math.toRadians(poleLon) + math.atan2(
        -math.cos(pr) * math.sin(lr),
        math.sin(pr) * cosTp - math.cos(pr) * sinTp * math.cos(lr))
      (normLon(math.toDegrees(lon)), math.toDegrees(lat))
    }

    /** Geographic (lon, lat) degrees → rotated (rlon, rlat) degrees —
      * the exact inverse (transpose rotation).
      */
    def fromGeo(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val dl = math.toRadians(lonDeg - poleLon)
      val ph = math.toRadians(latDeg)
      val sinPr = math.sin(ph) * sinTp + math.cos(ph) * cosTp * math.cos(dl)
      val rlat = math.asin(math.max(-1.0, math.min(1.0, sinPr)))
      val rlon = math.atan2(
        -math.cos(ph) * math.sin(dl),
        cosTp * math.sin(ph) - sinTp * math.cos(ph) * math.cos(dl))
      (normLon(math.toDegrees(rlon)), math.toDegrees(rlat))
    }
  }

  /** Sinusoidal (Sanson-Flamsteed) on the MODIS sphere: the MODIS land
    * tile grid. x = R·λ·cos φ, y = R·φ — equal-area by construction.
    */
  final case class Sinusoidal(r: Double = ModisSphereR) {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      (r * math.toRadians(lonDeg) * math.cos(phi), r * phi)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val phi = y / r
      // within a few nanoradians of a pole, longitude is indeterminate
      // (and x/(R·cos φ) blows up on rounded grid constants) — pin it
      val lon = if (math.Pi / 2 - math.abs(phi) < 1e-9) 0.0
        else math.toDegrees(x / (r * math.cos(phi)))
      (normLon(lon), math.toDegrees(phi))
    }
  }

  /** The MODIS authalic sphere radius (the SIN grid's earth model). */
  val ModisSphereR = 6371007.181

  /** Geostationary projection (the GOES-R ABI fixed grid / Meteosat
    * SEVIRI view geometry), from the public GOES-R Product User Guide
    * §5.1.2.8 / CGMS LRIT-HRIT 2.6 normalized geostationary projection:
    * geodetic (lon, lat) ↔ scan angles (x, y) in RADIANS as seen from a
    * satellite at `h` meters from the EARTH CENTER above `lon0`.
    * Points beyond the visible disk return None (forward) — the limb
    * test is the PUG's quadratic-visibility condition.
    */
  final case class Geostationary(lon0: Double,
                                 req: Double = 6378137.0,
                                 rpol: Double = 6356752.31414,
                                 h: Double = 42164160.0) {
    private val e2 = (req * req - rpol * rpol) / (req * req)
    private val invFlat2 = (req * req) / (rpol * rpol)

    /** Geodetic (lon, lat) degrees → scan angles (x, y) radians; None
      * when the point is on the far side of the planet.
      */
    def forward(lonDeg: Double, latDeg: Double): Option[(Double, Double)] = {
      val lam = math.toRadians(lonDeg - lon0)
      val phi = math.toRadians(latDeg)
      val phiC = math.atan(math.tan(phi) / invFlat2) // geocentric latitude
      val rc = rpol / math.sqrt(1 - e2 * math.cos(phiC) * math.cos(phiC))
      // earth-centered point P and satellite S = (h, 0, 0)
      val px = rc * math.cos(phiC) * math.cos(lam)
      val py = rc * math.cos(phiC) * math.sin(lam)
      val pz = rc * math.sin(phiC)
      val sx = h - px
      val sy = -py
      val sz = pz
      // visibility: the satellite must sit above the point's geodetic
      // horizon — (S − P)·n̂ > 0 with n̂ the geodetic surface normal
      // (cos φ cos λ, cos φ sin λ, sin φ). Exact at the limb, unlike
      // the PUG's quadratic screen, which accepts a ~0.2° band past
      // the true grazing circle.
      val aboveHorizon =
        (h - px) * math.cos(phi) * math.cos(lam) -
          py * math.cos(phi) * math.sin(lam) - pz * math.sin(phi) > 0
      if (!aboveHorizon) None
      else Some((
        math.asin(-sy / math.sqrt(sx * sx + sy * sy + sz * sz)),
        math.atan(sz / sx)))
    }

    /** Scan angles (x, y) radians → geodetic (lon, lat) degrees; None
      * when the ray misses the ellipsoid (off-disk pixel).
      */
    def inverse(x: Double, y: Double): Option[(Double, Double)] = {
      val cosX = math.cos(x); val sinX = math.sin(x)
      val cosY = math.cos(y); val sinY = math.sin(y)
      val a = sinX * sinX + cosX * cosX *
        (cosY * cosY + invFlat2 * sinY * sinY)
      val b = -2 * h * cosX * cosY
      val c = h * h - req * req
      val disc = b * b - 4 * a * c
      if (disc < 0) return None // ray misses the disk
      val rs = (-b - math.sqrt(disc)) / (2 * a)
      val sx = rs * cosX * cosY
      val sy = -rs * sinX
      val sz = rs * cosX * sinY
      val lat = math.atan(invFlat2 * sz / math.hypot(h - sx, sy))
      val lon = math.toRadians(lon0) - math.atan(sy / (h - sx))
      Some((normLon(math.toDegrees(lon)), math.toDegrees(lat)))
    }
  }

  /** Ellipsoidal Transverse Mercator (Snyder PP 1395 §8, eqs 8-9..8-25
    * — the USGS series form, sub-mm within a UTM zone): the Sentinel-2
    * / Landsat tile CRS family (EPSG:326xx/327xx via [[utm]]).
    */
  final case class TransverseMercator(a: Double, e2: Double,
                                      lat0: Double, lon0: Double,
                                      k0: Double = 0.9996,
                                      x0: Double = 0.0, y0: Double = 0.0) {
    private val ep2 = e2 / (1 - e2)
    private val e4 = e2 * e2
    private val e6 = e4 * e2
    /** Meridian arc from the equator (Snyder 3-21). */
    private def mOf(phi: Double): Double =
      a * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi -
        (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi) +
        (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi) -
        (35 * e6 / 3072) * math.sin(6 * phi))
    private val m0 = mOf(math.toRadians(lat0))

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val sinP = math.sin(phi); val cosP = math.cos(phi)
      val nu = a / math.sqrt(1 - e2 * sinP * sinP)
      val t = math.tan(phi) * math.tan(phi)
      val c = ep2 * cosP * cosP
      val bigA = math.toRadians(normLon(lonDeg - lon0)) * cosP
      val a2 = bigA * bigA; val a3 = a2 * bigA
      val x = k0 * nu * (bigA + (1 - t + c) * a3 / 6 +
        (5 - 18 * t + t * t + 72 * c - 58 * ep2) * a3 * a2 / 120) + x0
      val y = k0 * (mOf(phi) - m0 + nu * math.tan(phi) * (a2 / 2 +
        (5 - t + 9 * c + 4 * c * c) * a2 * a2 / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * ep2) * a3 * a3 / 720)) + y0
      (x, y)
    }

    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val m = (yIn - y0) / k0 + m0
      val mu = m / (a * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
      val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
      val phi1 = mu +
        (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
      val sinP1 = math.sin(phi1); val cosP1 = math.cos(phi1)
      val c1 = ep2 * cosP1 * cosP1
      val t1 = math.tan(phi1) * math.tan(phi1)
      val n1 = a / math.sqrt(1 - e2 * sinP1 * sinP1)
      val r1 = a * (1 - e2) / math.pow(1 - e2 * sinP1 * sinP1, 1.5)
      val d = (xIn - x0) / (n1 * k0)
      val d2 = d * d; val d3 = d2 * d
      val phi = phi1 - (n1 * math.tan(phi1) / r1) * (d2 / 2 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * d2 * d2 / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 -
          3 * c1 * c1) * d3 * d3 / 720)
      val lam = math.toRadians(lon0) + (d - (1 + 2 * t1 + c1) * d3 / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 +
          24 * t1 * t1) * d3 * d2 / 120) / cosP1
      (normLon(math.toDegrees(lam)), math.toDegrees(phi))
    }
  }

  /** WGS84 UTM zone (EPSG:326zz north / 327zz south): central meridian
    * 6·zone − 183, k0 = 0.9996, false easting 500 km (+10,000 km false
    * northing on the south aspect).
    */
  def utm(zone: Int, north: Boolean): TransverseMercator = {
    require(zone >= 1 && zone <= 60, s"UTM zone $zone out of range")
    TransverseMercator(A, E2, lat0 = 0.0, lon0 = 6.0 * zone - 183.0,
      k0 = 0.9996, x0 = 500000.0, y0 = if (north) 0.0 else 10000000.0)
  }

  /** Ellipsoidal Albers Equal-Area Conic (Snyder PP 1395 §14, eqs
    * 14-1..14-24 with the 3-16 latitude iteration): the CONUS analysis
    * grid (EPSG:5070) and the landcover archives on it.
    */
  final case class AlbersEqualArea(a: Double, e2: Double,
                                   lat1: Double, lat2: Double,
                                   lat0: Double, lon0: Double,
                                   x0: Double = 0.0, y0: Double = 0.0) {
    private val e = math.sqrt(e2)
    /** Snyder 3-12. */
    private def qOf(phi: Double): Double = {
      val s = math.sin(phi)
      if (e < 1e-12) 2 * s
      else (1 - e2) * (s / (1 - e2 * s * s) -
        (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    private def mOf(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    private val p1 = math.toRadians(lat1)
    private val p2 = math.toRadians(lat2)
    val n: Double =
      if (math.abs(lat1 - lat2) < 1e-9) math.sin(p1)
      else (mOf(p1) * mOf(p1) - mOf(p2) * mOf(p2)) / (qOf(p2) - qOf(p1))
    private val bigC = mOf(p1) * mOf(p1) + n * qOf(p1)
    private val rho0 = a * math.sqrt(bigC - n * qOf(math.toRadians(lat0))) / n

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val rho = a * math.sqrt(bigC - n * qOf(math.toRadians(latDeg))) / n
      val theta = n * math.toRadians(normLon(lonDeg - lon0))
      (x0 + rho * math.sin(theta), y0 + rho0 - rho * math.cos(theta))
    }

    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val x = xIn - x0
      val yc = rho0 - (yIn - y0)
      val sgn = if (n >= 0) 1.0 else -1.0
      val rho = sgn * math.hypot(x, yc)
      val theta = math.atan2(sgn * x, sgn * yc)
      val lam = theta / n + math.toRadians(lon0)
      val q = (bigC - (rho * n / a) * (rho * n / a)) / n
      // Snyder 3-16 iteration from the authalic start
      var phi = math.asin(math.max(-1.0, math.min(1.0, q / 2)))
      var i = 0
      while (i < 15) {
        val s = math.sin(phi)
        val om = 1 - e2 * s * s
        val next = phi + (om * om / (2 * math.cos(phi))) *
          (q / (1 - e2) - s / om +
            (if (e < 1e-12) 0.0
             else (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s))))
        if (math.abs(next - phi) < 1e-13) { phi = next; i = 15 }
        else { phi = next; i += 1 }
      }
      (normLon(math.toDegrees(lam)), math.toDegrees(phi))
    }
  }

  /** Ellipsoidal Mercator with true scale at `latTs` (Snyder PP 1395
    * §7, eqs 7-6..7-10 — the GRIB2 template 3.10 / tropical-satellite
    * grid projection): y is a·m(φts) times the ISOMETRIC latitude, so
    * MercatorSpec pins the closed form against numeric quadrature of
    * the isometric-latitude integrand. Spheres pass e2 = 0.
    */
  final case class Mercator(a: Double, e2: Double,
                            latTs: Double = 0.0, lon0: Double = 0.0) {
    private val e = math.sqrt(e2)
    private val sTs = math.sin(math.toRadians(latTs))
    /** a·m(φts): meters of easting per radian of longitude. */
    val k: Double = a * math.cos(math.toRadians(latTs)) /
      math.sqrt(1 - e2 * sTs * sTs)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val s = math.sin(phi)
      val conf =
        if (e < 1e-12) 1.0
        else math.pow((1 - e * s) / (1 + e * s), e / 2)
      val x = k * math.toRadians(normLon(lonDeg - lon0))
      val y = k * math.log(math.tan(math.Pi / 4 + phi / 2) * conf)
      (x, y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val t = math.exp(-y / k)
      // Snyder 7-9/7-10: fixed point from the spherical start
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 15 && e >= 1e-12) {
        val s = math.sin(phi)
        val next = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - e * s) / (1 + e * s), e / 2))
        if (math.abs(next - phi) < 1e-13) { phi = next; i = 15 }
        else { phi = next; i += 1 }
      }
      (normLon(math.toDegrees(x / k) + lon0), math.toDegrees(phi))
    }
  }

  /** CONUS Albers (EPSG:5070, NAD83/GRS80): 29.5°/45.5°, origin 23°N
    * 96°W.
    */
  def conusAlbers: AlbersEqualArea =
    AlbersEqualArea(A, Grs80E2, lat1 = 29.5, lat2 = 45.5,
      lat0 = 23.0, lon0 = -96.0)

  // GRS80 first eccentricity² (EPSG:2154's ellipsoid)
  private val Grs80E2 = 0.00669438002290
  // The spherical earth most LCC-gridded NWP models use (HRRR/NAM/WRF)
  private val NwpSphereR = 6371229.0

  /** Named LCC grids: Lambert-93 (the EPSG:2154 national grid) and the
    * NOAA HRRR model's native spherical LCC.
    */
  val LccCrs: Map[String, LambertConformal] = Map(
    "EPSG:2154" -> LambertConformal(A, Grs80E2, lat1 = 49.0, lat2 = 44.0,
      lat0 = 46.5, lon0 = 3.0, x0 = 700000.0, y0 = 6600000.0),
    "HRRR" -> LambertConformal(NwpSphereR, 0.0, lat1 = 38.5, lat2 = 38.5,
      lat0 = 38.5, lon0 = -97.5))

  private def normLon(l: Double): Double =
    if (l > 180) l - 360 else if (l < -180) l + 360 else l

  // Hughes 1980 ellipsoid (the legacy NSIDC grids) and WGS84
  private val HughesA = 6378273.0
  private val HughesE2 = 0.006693883

  /** The NSIDC polar stereographic family, keyed by EPSG code. */
  val PolarStereoCrs: Map[String, PolarStereo] = Map(
    "EPSG:3411" -> PolarStereo(HughesA, HughesE2, 70.0, -45.0, north = true),
    "EPSG:3412" -> PolarStereo(HughesA, HughesE2, -70.0, 0.0, north = false),
    "EPSG:3413" -> PolarStereo(A, E2, 70.0, -45.0, north = true),
    "EPSG:3976" -> PolarStereo(A, E2, -70.0, 0.0, north = false))

  private def edgePoints(w: Double, s: Double, e: Double, n: Double,
                         k: Int): Seq[(Double, Double)] = {
    val xs = (0 to k + 1).map(i => w + (e - w) * i / (k + 1.0))
    val ys = (0 to k + 1).map(i => s + (n - s) * i / (k + 1.0))
    xs.map((_, s)) ++ xs.map((_, n)) ++ ys.map((w, _)) ++ ys.map((e, _))
  }

  /** UDF form: projToGeo over (array<double> bbox, string crs) columns. */
  val projToGeoUdf: UserDefinedFunction =
    udf((bbox: Seq[Double], crs: String) => projToGeo(bbox, crs))

  /** UDF form of [[RotatedPole.toGeo]]: (rlon, rlat, poleLat, poleLon)
    * → [lon, lat]. Per-row so a CORDEX tidy scan (one row per rotated
    * grid cell) georeferences in a single narrow projection.
    */
  val rotatedToGeoUdf: UserDefinedFunction =
    udf((rlon: Double, rlat: Double, poleLat: Double, poleLon: Double) => {
      val (lon, lat) = RotatedPole(poleLat, poleLon).toGeo(rlon, rlat)
      Seq(lon, lat)
    })

  /** UDF form of [[RotatedPole.fromGeo]]. */
  val geoToRotatedUdf: UserDefinedFunction =
    udf((lon: Double, lat: Double, poleLat: Double, poleLon: Double) => {
      val (rlon, rlat) = RotatedPole(poleLat, poleLon).fromGeo(lon, lat)
      Seq(rlon, rlat)
    })

  def register(spark: SparkSession): Unit = {
    spark.udf.register("proj_to_geo", projToGeoUdf)
    spark.udf.register("rotated_to_geo", rotatedToGeoUdf)
    spark.udf.register("geo_to_rotated", geoToRotatedUdf)
  }
}
