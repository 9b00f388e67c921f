package graft.source

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal GRIB2 writer (simple packing, regular lat/lon, template
  * 4.0 products): the fixture/K-side twin of [[Grib2]], same spec.
  * One message per field; NaN cells emit through a section-6 bitmap.
  */
object Grib2Write {

  final case class FieldSpec(
      discipline: Int, category: Int, parameter: Int,
      forecastHours: Int,
      ni: Int, nj: Int,
      lat1: Double, lon1: Double, dLat: Double, dLon: Double,
      /** Row-major, row 0 northernmost (+i/−j scan, mode 0). */
      values: Array[Double],
      decimalScale: Int = 2,
      binaryScale: Int = 0,
      /** 0 = simple (5.0); 2 = complex (5.2); 3 = complex + spatial
        * differencing (5.3, `diffOrder` 1 or 2); 40 = JPEG2000 (5.40,
        * lossless single-component codestream via [[Jpeg2k]]); 42 =
        * CCSDS/AEC (5.42, preprocessed MSB stream, block 16, RSI 4
        * blocks).
        */
      packing: Int = 0,
      /** 5.42 only: byte-align the stream at each RSI (flag 32). */
      ccsdsPadRsi: Boolean = false,
      diffOrder: Int = 2,
      /** Fixed group size for the complex templates' group splitting. */
      groupSize: Int = 17,
      /** When set, emit grid template 3.30 (Lambert conformal):
        * lat1/lon1 become the first grid point and dLat/dLon are Dy/Dx
        * in meters; stored with scan mode 0 (first point = NW corner).
        */
      lambert: Option[Grib2.LambertGrid] = None,
      /** When set, emit grid template 3.10 (Mercator): lat1/lon1
        * become the first grid point and dLat/dLon are Dj/Di in meters
        * at the true-scale parallel laD; earth axes are written via
        * shape code 7 (explicit major/minor, meters), so spheres pass
        * e2 = 0. Stored with scan mode 0 (first point = NW corner).
        */
      mercator: Option[Grib2.MercatorGrid] = None,
      /** When set, emit grid template 3.1 (rotated lat/lon, the
        * CORDEX/COSMO grid): lat1/lon1/dLat/dLon are degrees in the
        * ROTATED system; the CF north pole given here is stored as
        * the template's southern pole of projection (negated, flipped
        * 180°), rotation angle 0. Scan mode 0 (first point = rotated
        * NW corner).
        */
      rotated: Option[Grib2.RotatedGrid] = None,
      /** When set, emit grid template 3.90 (space view / geostationary
        * sector): ni/nj are the sector's Nx/Ny and lat1/lon1/dLat/dLon
        * are ignored — the view geometry comes from the spec itself.
        */
      spaceview: Option[SpaceViewSpec] = None,
      /** When set to (N, row0), emit grid template 3.40 (regular
        * Gaussian, N parallels per hemisphere): rows are the nj
        * consecutive Gaussian parallels starting at index row0 of the
        * north→south table; lat1/dLat are ignored.
        */
      gaussian: Option[(Int, Int)] = None,
      /** With `gaussian`: REDUCED grid points-per-row (north→south);
        * Ni/Di are then written missing, `values` is ragged with
        * these row lengths, and the PL list trails the template.
        */
      gaussianPl: Option[Array[Int]] = None,
      /** (type, perturbation number, count) → product template 4.1
        * (4.11 when `statSpec` is also set) — the GEFS member identity.
        */
      ensembleSpec: Option[(Int, Int, Int)] = None,
      /** (statistical process code, span hours) → product template 4.8
        * (4.11 with `ensembleSpec`): accumulations/averages.
        */
      statSpec: Option[(Int, Int)] = None,
      /** Probability block → product template 4.5 (4.9 with
        * `statSpec` — the PoP shape). Mutually exclusive with
        * `ensembleSpec`.
        */
      probSpec: Option[ProbSpec] = None,
      /** (derivation code, ensemble size) → product template 4.2
        * (4.12 with `statSpec`) — the GEFS mean/spread products.
        * Mutually exclusive with `ensembleSpec`/`probSpec`.
        */
      derivedSpec: Option[(Int, Int)] = None)

  /** Writer-side probability block: bounds as (scale, scaledValue)
    * pairs so the stored octets are exact; a `None` bound writes the
    * all-ones MISSING encoding.
    */
  final case class ProbSpec(number: Int, total: Int, probType: Int,
      scale: Int, lo: Option[Int], hi: Option[Int])

  /** Template 3.90 writer parameters, in the template's own units:
    * `nrMicroRadii` = camera distance from the earth center in 10⁻⁶
    * equatorial radii, `dx`/`dy` = apparent earth diameters in grid
    * lengths, `xpMilli`/`ypMilli` = sub-satellite pixel in 10⁻³ grid
    * lengths, `xo`/`yo` = sector origin in grid lengths.
    */
  final case class SpaceViewSpec(req: Double, rpol: Double, lop: Double,
      nrMicroRadii: Long, dx: Int, dy: Int,
      xpMilli: Long, ypMilli: Long, xo: Int, yo: Int)

  def write(fields: Seq[FieldSpec],
            refTime: (Int, Int, Int, Int, Int, Int) = (2024, 1, 1, 0, 0, 0))
  : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    fields.foreach(f => out.write(message(f, refTime)))
    out.toByteArray
  }

  private def sm2(v: Int): Int =
    if (v < 0) 0x8000 | -v else v
  private def sm4(v: Long): Int =
    if (v < 0) (0x80000000L | -v).toInt else v.toInt

  private def message(f: FieldSpec,
                      rt: (Int, Int, Int, Int, Int, Int)): Array[Byte] = {
    require(f.gaussianPl.isDefined || f.values.length == f.ni * f.nj,
      "values != ni*nj")
    require(Seq(f.lambert, f.mercator, f.spaceview, f.gaussian,
      f.rotated).count(_.isDefined) <= 1,
      "at most one grid spec per field")
    val body = new ByteArrayOutputStream()
    def sec(num: Int)(fill: ByteBuffer => Unit): Unit = {
      val buf = ByteBuffer.allocate(1 << 20).order(ByteOrder.BIG_ENDIAN)
      buf.position(5)
      fill(buf)
      val len = buf.position()
      buf.putInt(0, len); buf.put(4, num.toByte)
      body.write(buf.array(), 0, len)
    }
    // section 1 — identification
    sec(1) { b =>
      b.putShort(0); b.putShort(0) // center/subcenter
      b.put(2.toByte); b.put(0.toByte) // table versions
      b.put(1.toByte) // significance: start of forecast
      b.putShort(rt._1.toShort); b.put(rt._2.toByte); b.put(rt._3.toByte)
      b.put(rt._4.toByte); b.put(rt._5.toByte); b.put(rt._6.toByte)
      b.put(0.toByte); b.put(1.toByte) // production status, data type
    }
    // section 3 — grid definition template 3.0 (lat/lon) or 3.30
    sec(3) { b =>
      b.put(0.toByte); b.putInt(f.values.length)
      if (f.gaussianPl.isDefined) { b.put(2.toByte); b.put(1.toByte) }
      else { b.put(0.toByte); b.put(0.toByte) }
      f.gaussian match {
        case Some((nPar, row0)) =>
          val lats = Grib2.gaussianLatitudes(nPar)
          require(row0 >= 0 && row0 + f.nj <= lats.length,
            s"Gaussian rows $row0+${f.nj} outside the N$nPar table")
          f.gaussianPl.foreach { pl =>
            require(pl.length == f.nj && pl.sum == f.values.length,
              "gaussianPl rows/points disagree with nj/values") }
          val reduced = f.gaussianPl.isDefined
          b.putShort(40) // template 3.40
          b.put(6.toByte); b.put(0.toByte); b.putInt(0) // shape + radius
          b.put(0.toByte); b.putInt(0); b.put(0.toByte); b.putInt(0)
          b.putInt(if (reduced) -1 else f.ni); b.putInt(f.nj)
          b.putInt(0); b.putInt(0) // basic angle + subdivisions
          b.putInt(sm4(math.round(lats(row0) * 1e6)))
          b.putInt(sm4(math.round(f.lon1 * 1e6)))
          b.put(0x30.toByte)
          b.putInt(sm4(math.round(lats(row0 + f.nj - 1) * 1e6)))
          b.putInt(sm4(math.round((f.lon1 + f.dLon * (f.ni - 1)) * 1e6)))
          b.putInt(if (reduced) -1 else math.round(f.dLon * 1e6).toInt)
          b.putInt(nPar)
          b.put(0.toByte) // scan mode: +i, −j
          f.gaussianPl.foreach(_.foreach(w => b.putShort(w.toShort)))
        case None =>
          // explicit major/minor axes (code table 3.2 shape 7, meters)
          def shape7(a: Double, bAx: Double): Unit = {
            b.put(7.toByte); b.put(0.toByte); b.putInt(0)
            b.put(0.toByte); b.putInt(math.round(a).toInt)
            b.put(0.toByte); b.putInt(math.round(bAx).toInt)
          }
          (f.mercator, f.spaceview) match {
          case (Some(mg), None) =>
            b.putShort(10) // template 3.10 (Mercator)
            shape7(mg.earthRadius,
              mg.earthRadius * math.sqrt(1 - mg.e2))
            b.putInt(f.ni); b.putInt(f.nj)
            b.putInt(sm4(math.round(f.lat1 * 1e6)))
            b.putInt(sm4(math.round(f.lon1 * 1e6)))
            b.put(0x30.toByte)
            b.putInt(sm4(math.round(mg.laD * 1e6)))
            // la2/lo2 (derivable): last grid point through the
            // projection, first point anchored at the NW corner
            val m = graft.functions.Geo.Mercator(
              mg.earthRadius, mg.e2, mg.laD)
            val (x1, y1) = m.forward(f.lon1, f.lat1)
            val la2 = m.inverse(x1, y1 - (f.nj - 1) * f.dLat)._2
            val lo2 = m.inverse(x1 + (f.ni - 1) * f.dLon, y1)._1
            b.putInt(sm4(math.round(la2 * 1e6)))
            b.putInt(sm4(math.round(lo2 * 1e6)))
            b.put(0.toByte) // scan mode: +i, −j (BEFORE Di/Dj in 3.10)
            b.putInt(0) // grid orientation
            b.putInt(math.round(f.dLon * 1e3).toInt) // Di in mm
            b.putInt(math.round(f.dLat * 1e3).toInt) // Dj in mm
          case (None, Some(sv)) =>
            b.putShort(90) // template 3.90 (space view)
            shape7(sv.req, sv.rpol)
            b.putInt(f.ni); b.putInt(f.nj)
            b.putInt(0) // Lap: geostationary
            b.putInt(sm4(math.round(sv.lop * 1e6)))
            b.put(0.toByte)
            b.putInt(sv.dx); b.putInt(sv.dy)
            b.putInt(sv.xpMilli.toInt); b.putInt(sv.ypMilli.toInt)
            b.put(0.toByte) // scan mode: +i, −j
            b.putInt(0) // grid orientation
            b.putInt(sv.nrMicroRadii.toInt)
            b.putInt(sv.xo); b.putInt(sv.yo)
          case (Some(_), Some(_)) => throw new IllegalArgumentException(
            "at most one projected-grid spec per field")
          case (None, None) => f.lambert match {
        case None =>
          b.putShort(if (f.rotated.isDefined) 1 else 0) // 3.0 / 3.1
          b.put(6.toByte); b.put(0.toByte); b.putInt(0) // shape + radius
          b.put(0.toByte); b.putInt(0); b.put(0.toByte); b.putInt(0) // axes
          b.putInt(f.ni); b.putInt(f.nj)
          b.putInt(0); b.putInt(0) // basic angle + subdivisions
          b.putInt(sm4(math.round(f.lat1 * 1e6)))
          b.putInt(sm4(math.round(f.lon1 * 1e6)))
          b.put(0x30.toByte) // resolution flags: increments given
          b.putInt(sm4(math.round((f.lat1 - f.dLat * (f.nj - 1)) * 1e6)))
          b.putInt(sm4(math.round((f.lon1 + f.dLon * (f.ni - 1)) * 1e6)))
          b.putInt(math.round(f.dLon * 1e6).toInt)
          b.putInt(math.round(f.dLat * 1e6).toInt)
          b.put(0.toByte) // scan mode: +i, −j
          f.rotated.foreach { rg =>
            // the CF north pole stored as the southern pole of
            // projection: negate the latitude, flip the longitude
            val southLat = -rg.poleLat
            val southLon0 = rg.poleLon - 180.0
            val southLon = if (southLon0 < -180.0) southLon0 + 360.0
                           else southLon0
            b.putInt(sm4(math.round(southLat * 1e6)))
            b.putInt(sm4(math.round(southLon * 1e6)))
            b.putInt(0) // angle of rotation
          }
        case Some(lg) =>
          b.putShort(30) // template 3.30
          b.put(1.toByte); b.put(0.toByte) // shape 1: given sphere radius
          b.putInt(math.round(lg.earthRadius).toInt)
          b.put(0.toByte); b.putInt(0); b.put(0.toByte); b.putInt(0)
          b.putInt(f.ni); b.putInt(f.nj)
          b.putInt(sm4(math.round(f.lat1 * 1e6)))
          b.putInt(sm4(math.round(f.lon1 * 1e6)))
          b.put(0x08.toByte)
          b.putInt(sm4(math.round(lg.laD * 1e6)))
          b.putInt(sm4(math.round(lg.lov * 1e6)))
          b.putInt(math.round(f.dLon * 1e3).toInt) // Dx in mm
          b.putInt(math.round(f.dLat * 1e3).toInt) // Dy in mm
          b.put(0.toByte) // projection centre: north
          b.put(0.toByte) // scan mode: +i, −j (first point NW)
          b.putInt(sm4(math.round(lg.latin1 * 1e6)))
          b.putInt(sm4(math.round(lg.latin2 * 1e6)))
          b.putInt(sm4(-90000000L)); b.putInt(0)
      } } }
    }
    // section 4 — product definition template 4.0/4.1/4.8/4.11
    sec(4) { b =>
      require(Seq(f.probSpec, f.ensembleSpec, f.derivedSpec)
        .count(_.isDefined) <= 1,
        "probSpec, ensembleSpec and derivedSpec are mutually exclusive")
      val tpl4 = (f.ensembleSpec, f.probSpec, f.derivedSpec,
          f.statSpec) match {
        case (Some(_), _, _, Some(_)) => 11
        case (Some(_), _, _, None) => 1
        case (None, Some(_), _, Some(_)) => 9
        case (None, Some(_), _, None) => 5
        case (None, None, Some(_), Some(_)) => 12
        case (None, None, Some(_), None) => 2
        case (None, None, None, Some(_)) => 8
        case _ => 0
      }
      b.putShort(0); b.putShort(tpl4.toShort)
      b.put(f.category.toByte); b.put(f.parameter.toByte)
      b.put(2.toByte); b.put(0.toByte); b.put(0.toByte) // process ids
      b.putShort(0); b.put(0.toByte) // cutoff
      b.put(1.toByte) // time unit: hours
      b.putInt(f.forecastHours)
      if (tpl4 != 0) { // fixed surfaces: ground + missing second
        b.put(1.toByte); b.put(0.toByte); b.putInt(0)
        b.put(255.toByte); b.put(0.toByte); b.putInt(0)
      }
      f.ensembleSpec.foreach { case (t, m, n) =>
        b.put(t.toByte); b.put(m.toByte); b.put(n.toByte) }
      f.derivedSpec.foreach { case (code, n) =>
        b.put(code.toByte); b.put(n.toByte) }
      f.probSpec.foreach { p =>
        b.put(p.number.toByte); b.put(p.total.toByte)
        b.put(p.probType.toByte)
        def bound(v: Option[Int]): Unit = v match {
          case Some(x) =>
            b.put((if (p.scale < 0) 0x80 | -p.scale else p.scale).toByte)
            b.putInt(if (x < 0) 0x80000000 | -x else x)
          case None => b.put(0xFF.toByte); b.putInt(-1) // missing
        }
        bound(p.lo); bound(p.hi)
      }
      f.statSpec.foreach { case (proc, spanHours) =>
        // end-of-interval time (reader skips), one range, no missing
        (0 until 7).foreach(_ => b.put(0.toByte))
        b.put(1.toByte); b.putInt(0)
        b.put(proc.toByte); b.put(2.toByte) // successive-times incr
        b.put(1.toByte); b.putInt(spanHours) // unit hours + span
        b.put(1.toByte); b.putInt(0) // increment unit + value
      }
    }
    // pack: X = round((Y·10^D − R)/2^E), R = min(Y·10^D) over valid
    val d10 = math.pow(10, f.decimalScale)
    val e2 = math.pow(2, f.binaryScale)
    val valid = f.values.filterNot(_.isNaN)
    val hasBitmap = valid.length != f.values.length
    // pack against R AS THE DECODER WILL SEE IT (float32-rounded), so
    // the only round-trip error is the X quantization itself; clamp at
    // 0 for the minimum element when the float rounding lands above it
    val r = (if (valid.isEmpty) 0.0
             else valid.map(_ * d10).min.toFloat).toDouble
    val packed = valid.map(v =>
      math.max(0L, math.round((v * d10 - r) / e2)))
    val maxX = if (packed.isEmpty) 0L else packed.max
    val nbits =
      if (maxX == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(maxX)
    // for complex templates the bit budget is recomputed per group
    // below; the differencing transform replaces `packed` first
    val (series, init, gmin) =
      if (f.packing != 3) (packed, Array.empty[Long], 0L)
      else {
        require(f.diffOrder == 1 || f.diffOrder == 2,
          s"diffOrder ${f.diffOrder} unsupported")
        val d = new Array[Long](packed.length)
        var i = f.diffOrder
        while (i < packed.length) {
          d(i) =
            if (f.diffOrder == 1) packed(i) - packed(i - 1)
            else packed(i) - 2 * packed(i - 1) + packed(i - 2)
          i += 1
        }
        val tail = d.drop(f.diffOrder)
        val mn = if (tail.isEmpty) 0L else tail.min
        val biased = d.clone()
        var j = f.diffOrder
        while (j < biased.length) { biased(j) -= mn; j += 1 }
        // the first `diffOrder` slots are placeholders (decoder
        // overwrites them with the initial values)
        (0 until f.diffOrder).foreach(k => biased(k) = 0L)
        (biased, packed.take(f.diffOrder), mn)
      }
    val groups: Seq[Array[Long]] =
      if (f.packing == 0 || f.packing == 40 || f.packing == 42) Nil
      else series.grouped(math.max(1, f.groupSize)).toSeq
    val gRefs = groups.map(g => g.min).toArray
    val gWidths = groups.zip(gRefs).map { case (g, ref) =>
      val mx = g.map(_ - ref).max
      if (mx == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(mx)
    }.toArray
    val refBits =
      if (gRefs.isEmpty || gRefs.max == 0) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(gRefs.max)
    val lenBits = 8 // group sizes ≤ 255 at the fixture scale
    require(f.packing == 0 || f.groupSize <= 255, "groupSize > 255")
    val diffOcts = 4
    // section 5 — representation template 5.0 / 5.2 / 5.3
    sec(5) { b =>
      b.putInt(valid.length)
      b.putShort((if (f.packing == 0) 0 else f.packing).toShort)
      b.putFloat(r.toFloat)
      b.putShort(sm2(f.binaryScale).toShort)
      b.putShort(sm2(f.decimalScale).toShort)
      b.put((if (f.packing == 0 || f.packing == 40 || f.packing == 42)
        nbits else refBits).toByte)
      b.put(0.toByte) // original field type: float
      if (f.packing == 40) {
        b.put(0.toByte) // compression type: lossless
        b.put(255.toByte) // target ratio: n/a for lossless
      }
      if (f.packing == 42) {
        b.put((12 | (if (f.ccsdsPadRsi) 32 else 0)).toByte) // MSB+preproc
        b.put(16.toByte) // block size
        b.putShort(4.toShort) // RSI in blocks
      }
      if (f.packing == 2 || f.packing == 3) {
        b.put(1.toByte) // general group splitting
        b.put(0.toByte) // no missing-value management
        b.putInt(0); b.putInt(0)
        b.putInt(groups.length)
        b.put(0.toByte) // group width reference
        b.put(6.toByte) // 6 bits per group width
        b.putInt(0); b.put(1.toByte) // length ref 0, increment 1
        b.putInt(groups.lastOption.map(_.length).getOrElse(0))
        b.put(lenBits.toByte)
        if (f.packing == 3) {
          b.put(f.diffOrder.toByte); b.put(diffOcts.toByte)
        }
      }
    }
    // section 6 — bitmap
    sec(6) { b =>
      if (!hasBitmap) b.put(255.toByte)
      else {
        b.put(0.toByte)
        var acc = 0; var nb = 0
        f.values.foreach { v =>
          acc = (acc << 1) | (if (v.isNaN) 0 else 1); nb += 1
          if (nb == 8) { b.put(acc.toByte); acc = 0; nb = 0 }
        }
        if (nb > 0) b.put((acc << (8 - nb)).toByte)
      }
    }
    // section 7 — MSB-first packed data
    sec(7) { b =>
      var acc = 0L; var nb = 0
      def bits(x: Long, n: Int): Unit = {
        var k = n - 1
        while (k >= 0) {
          acc = (acc << 1) | ((x >> k) & 1); nb += 1
          if (nb == 8) { b.put(acc.toByte); acc = 0; nb = 0 }
          k -= 1
        }
      }
      def alignByte(): Unit =
        if (nb > 0) { b.put((acc << (8 - nb)).toByte); acc = 0; nb = 0 }
      def smBits(v: Long, octets: Int): Unit = {
        val signBit = 1L << (octets * 8 - 1)
        bits(if (v < 0) signBit | -v else v, octets * 8)
      }
      if (f.packing == 0) {
        packed.foreach(bits(_, nbits))
      } else if (f.packing == 40) {
        if (nbits > 0) {
          // no bitmap: the raster is the grid; with one: nPoints×1
          val (jw, jh) =
            if (hasBitmap) (packed.length, 1) else (f.ni, f.nj)
          Jpeg2k.encode(packed.toArray, jw, jh, nbits)
            .foreach(x => bits(x & 0xFFL, 8))
        }
      } else if (f.packing == 42) {
        if (nbits > 0)
          Ccsds.encode(packed, Ccsds.Params(nbits, 16, 4,
            preprocess = true, padRsi = f.ccsdsPadRsi)).foreach(x =>
            bits(x & 0xFFL, 8))
      } else {
        require(gWidths.forall(_ <= 63), "group width exceeds 6 bits")
        if (f.packing == 3) {
          init.foreach(smBits(_, diffOcts))
          smBits(gmin, diffOcts)
        }
        gRefs.foreach(bits(_, refBits)); alignByte()
        gWidths.foreach(w => bits(w.toLong, 6)); alignByte()
        groups.foreach(g => bits(g.length.toLong, lenBits)); alignByte()
        groups.zipWithIndex.foreach { case (g, gi) =>
          if (gWidths(gi) > 0) g.foreach(x => bits(x - gRefs(gi), gWidths(gi)))
        }
      }
      alignByte()
    }
    val sections = body.toByteArray
    val total = 16 + sections.length + 4
    val msg = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)
    msg.put('G'.toByte); msg.put('R'.toByte); msg.put('I'.toByte)
    msg.put('B'.toByte)
    msg.putShort(0) // reserved
    msg.put(f.discipline.toByte); msg.put(2.toByte)
    msg.putLong(total.toLong)
    msg.put(sections)
    msg.put("7777".getBytes)
    msg.array()
  }
}
