package graft.source

/** IEEE 754 binary16 (half precision) ↔ double — the '<f2' dtype ML
  * embedding and feature arrays commonly ship in zarr/HDF5 stores.
  * Full bit-pattern coverage on the decode side (normals, subnormals,
  * ±0, ±inf, NaN); the encode side (fixtures) rounds to nearest.
  */
object Half {

  /** smallest positive subnormal, 2^-24 */
  private val MinSub = 5.9604644775390625e-8

  def toDouble(bits: Short): Double = {
    val b = bits & 0xFFFF
    val sign = if ((b & 0x8000) != 0) -1.0 else 1.0
    val exp = (b >> 10) & 0x1F
    val frac = b & 0x3FF
    exp match {
      case 0x00 => sign * frac * MinSub // subnormal (frac 0 → signed zero)
      case 0x1F =>
        if (frac == 0) sign * Double.PositiveInfinity else Double.NaN
      case _ => sign * (1.0 + frac / 1024.0) * math.pow(2.0, exp - 15)
    }
  }

  def fromDouble(v: Double): Short = {
    if (v.isNaN) return 0x7E00.toShort
    val neg = v < 0.0 || (v == 0.0 && 1.0 / v < 0.0)
    val sign = if (neg) 0x8000 else 0x0
    val a = math.abs(v)
    // IEEE overflow boundary is the 65504/65536 midpoint (65520), not
    // max-finite: values in (65504, 65520) round DOWN to 65504 — numpy
    // float16 semantics; ties go to even via rint throughout
    if (a >= 65520.0) return (sign | 0x7C00).toShort // ±inf / overflow
    if (a < MinSub / 2) return sign.toShort          // ±0 / underflow
    var exp = math.getExponent(a)
    if (exp < -14) { // subnormal half
      val frac = math.rint(a / MinSub).toInt
      return if (frac >= 1024) (sign | 0x0400).toShort // rounds to min normal
             else (sign | frac).toShort
    }
    var frac = math.rint((a / math.pow(2.0, exp) - 1.0) * 1024.0).toInt
    if (frac == 1024) { // mantissa rounding carried into the exponent
      exp += 1; frac = 0
      if (exp > 15) return (sign | 0x7C00).toShort
    }
    (sign | ((exp + 15) << 10) | frac).toShort
  }
}
