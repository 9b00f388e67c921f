package graft.ops

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Typed per-file min/max bounds for the manifest's multi-column file
  * statistics ([[SnapshotTable.ColStats]]) — the encoding, decoding,
  * and ordering rules in ONE place so writers, the pruner, and
  * aggregate pushdown can never disagree.
  *
  * Bounds are stored in the manifest as STRINGS whatever the dtype
  * (uniform JSON shape — heterogeneous arrays would fight schema
  * inference on read):
  *
  *   int / long    decimal value
  *   date          days since epoch, decimal (what parquet stores)
  *   timestamp     microseconds since epoch, decimal (Spark's
  *                 TimestampType precision — exact)
  *   double/float  `java.lang.Double.doubleToLongBits`, decimal —
  *                 bit-exact round-trip; a decimal rendering could
  *                 drift and a drifted bound silently mis-prunes
  *   boolean       "0" / "1"
  *   string        the value itself, TRUNCATED to ≤ [[StringCap]]
  *                 code points (Iceberg-style): a truncated MIN is the
  *                 prefix (a prefix is ≤ every string it prefixes in
  *                 binary order), a truncated MAX is the prefix with
  *                 its last code point incremented (≥ everything the
  *                 prefix prefixes). Truncated bounds are marked
  *                 `exact = false`: valid for pruning, NEVER for
  *                 aggregate pushdown.
  *
  * Ordering matches Spark's: integral/temporal types compare as
  * longs; double/float via `java.lang.Double.compare` (NaN largest —
  * the same total order Spark's sort and min/max aggregates use);
  * strings in UTF-8 BINARY order ([[UTF8String]] comparison — also
  * parquet's UNSIGNED byte order for string statistics, so the three
  * layers of pruning agree).
  */
private[graft] object TypedBounds {

  /** Max stored code points for string bounds. */
  val StringCap = 64

  /** DECIMAL plane (r20): dtype `decimal(p,s)` with p ≤ 18, so the
    * UNSCALED value fits a long — bounds, partition keys, and bloom
    * keys all encode the unscaled long in decimal-string form (same
    * manifest shape as the integral dtypes; scale is carried by the
    * dtype itself). Exact by construction — no float-hash dodge.
    * Wider precisions refuse at declaration (dtypeOf → None).
    */
  private val DecimalRe = """decimal\((\d+),(\d+)\)""".r

  /** (precision, scale) when `dtype` is a decimal dtype string. */
  def decimalOf(dtype: String): Option[(Int, Int)] = dtype match {
    case DecimalRe(p, s) => Some((p.toInt, s.toInt))
    case _ => None
  }

  def isDecimal(dtype: String): Boolean = dtype.startsWith("decimal(")

  /** 10^s as a long (s ≤ 18). */
  def pow10(s: Int): Long = {
    require(s >= 0 && s <= 18, s"decimal scale $s outside [0, 18]")
    var r = 1L; var i = 0
    while (i < s) { r *= 10L; i += 1 }
    r
  }

  /** Unscaled long of an external decimal value at the COLUMN's
    * scale. None when the value cannot be represented exactly at that
    * scale (no pruning — conservative) or overflows the long.
    */
  def unscaledOf(v: java.math.BigDecimal, scale: Int): Option[Long] =
    try Some(v.setScale(scale).unscaledValue().longValueExact())
    catch { case _: ArithmeticException => None }

  def dtypeOf(dt: DataType): Option[String] = dt match {
    case IntegerType => Some("int")
    case LongType => Some("long")
    case DateType => Some("date")
    case TimestampType => Some("timestamp")
    case DoubleType => Some("double")
    case FloatType => Some("float")
    case StringType => Some("string")
    case BooleanType => Some("boolean")
    case d: DecimalType if d.precision <= 18 =>
      Some(s"decimal(${d.precision},${d.scale})")
    case _ => None
  }

  /** The visible Spark type a dtype string round-trips to. */
  def sparkType(dtype: String): DataType = dtype match {
    case "int" => IntegerType
    case "long" => LongType
    case "date" => DateType
    case "timestamp" => TimestampType
    case "double" => DoubleType
    case "float" => FloatType
    case "string" => StringType
    case "boolean" => BooleanType
    case d if isDecimal(d) =>
      val (p, s) = decimalOf(d).get
      DecimalType(p, s)
    case other => throw new IllegalArgumentException(
      s"unknown stats dtype $other")
  }

  /** Comparable key of a FILTER value (the external objects Spark
    * puts in pushed `Filter`s): Long for integral/temporal/boolean
    * dtypes, java.lang.Double for double/float, String for string.
    * None = the value's runtime type does not fit the column (no
    * pruning — conservative).
    */
  def keyOfValue(dtype: String, v: Any): Option[Any] = dtype match {
    case "int" | "long" => v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }
    case "date" => v match {
      case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
      case d: java.time.LocalDate => Some(d.toEpochDay)
      case _ => None
    }
    case "timestamp" => v match {
      case t: java.sql.Timestamp => Some(
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .fromJavaTimestamp(t))
      case t: java.time.Instant => Some(
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .instantToMicros(t))
      case _ => None
    }
    case "double" | "float" => v match {
      case d: Double => Some(Double.box(d))
      case f: Float => Some(Double.box(f.toDouble))
      case _ => None
    }
    case "string" => v match {
      case s: String => Some(s)
      case _ => None
    }
    case "boolean" => v match {
      case b: Boolean => Some(if (b) 1L else 0L)
      case _ => None
    }
    case d if isDecimal(d) =>
      val scale = decimalOf(d).get._2
      v match {
        case bd: java.math.BigDecimal => unscaledOf(bd, scale)
        case bd: scala.math.BigDecimal =>
          unscaledOf(bd.underlying(), scale)
        case dec: org.apache.spark.sql.types.Decimal =>
          unscaledOf(dec.toJavaBigDecimal, scale)
        case _ => None
      }
    case _ => None
  }

  /** Comparable key of a stored (encoded) bound. */
  def keyOfEncoded(dtype: String, enc: String): Any = dtype match {
    case "int" | "long" | "date" | "timestamp" | "boolean" => enc.toLong
    case "double" | "float" =>
      Double.box(java.lang.Double.longBitsToDouble(enc.toLong))
    case "string" => enc
    case d if isDecimal(d) => enc.toLong // unscaled
    case other => throw new IllegalArgumentException(
      s"unknown stats dtype $other")
  }

  /** Total order over keys of one dtype (see class doc). Signed
    * zeros compare EQUAL (`x + 0.0` folds -0.0 into +0.0, NaN
    * untouched): SQL `=` treats -0.0 and 0.0 as the same value, so a
    * pruning order that ranks them would drop a file whose only
    * matching rows hold the other zero.
    */
  def compare(dtype: String, a: Any, b: Any): Int = dtype match {
    case "double" | "float" =>
      java.lang.Double.compare(a.asInstanceOf[Double] + 0.0,
        b.asInstanceOf[Double] + 0.0)
    case "string" =>
      UTF8String.fromString(a.asInstanceOf[String])
        .compareTo(UTF8String.fromString(b.asInstanceOf[String]))
    case _ =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
  }

  /** Encode one file's (min, max) as read back from a per-file
    * aggregate: → (minEnc, maxEnc, has, exact). `has = false` (all
    * rows NULL in this file, or a string max that cannot be bounded)
    * means "no usable bounds" — the file is never pruned and never
    * serves a pushed aggregate.
    */
  def encode(dtype: String, mn: Any, mx: Any)
      : (String, String, Boolean, Boolean) = {
    if (mn == null || mx == null) return ("", "", false, false)
    def longEnc(v: Any): String = (keyOfValue(dtype, v) match {
      case Some(l: Long) => l
      case _ => throw new IllegalArgumentException(
        s"stats value $v (${v.getClass.getName}) does not fit dtype " +
          s"$dtype")
    }).toString
    dtype match {
      case "int" | "long" | "date" | "timestamp" | "boolean" =>
        (longEnc(mn), longEnc(mx), true, true)
      case d if isDecimal(d) =>
        (longEnc(mn), longEnc(mx), true, true)
      case "double" | "float" =>
        // `+ 0.0` canonicalizes -0.0 to +0.0 (NaN untouched): SQL
        // treats the zeros as one value, so bounds store the
        // canonical form and a manifest-served MIN/MAX never surfaces
        // a sign Spark's own aggregate would not
        def bits(v: Any): String = v match {
          case d: Double =>
            java.lang.Double.doubleToLongBits(d + 0.0).toString
          case f: Float =>
            java.lang.Double.doubleToLongBits(f.toDouble + 0.0).toString
          case _ => throw new IllegalArgumentException(
            s"stats value $v does not fit dtype $dtype")
        }
        (bits(mn), bits(mx), true, true)
      case "string" =>
        val (lo, loExact) = truncateMin(mn.asInstanceOf[String])
        truncateMax(mx.asInstanceOf[String]) match {
          case Some((hi, hiExact)) => (lo, hi, true, loExact && hiExact)
          case None => ("", "", false, false)
        }
      case other => throw new IllegalArgumentException(
        s"unknown stats dtype $other")
    }
  }

  /** Encode one file's (min, max) tracked as PHYSICAL values by an
    * executor writer — Long for int/long/date/timestamp (days /
    * micros), Double for float/double (already widened, -0.0
    * canonicalized here), Boolean, UTF8String for string. `mn = null`
    * means the writer saw no non-NULL value (has = false).
    */
  def encodePhysical(dtype: String, mn: Any, mx: Any)
      : (String, String, Boolean, Boolean) = {
    if (mn == null || mx == null) return ("", "", false, false)
    dtype match {
      case "int" | "long" | "date" | "timestamp" =>
        (mn.asInstanceOf[Long].toString, mx.asInstanceOf[Long].toString,
          true, true)
      case d if isDecimal(d) =>
        // physical shapes: Decimal (InternalRow getter) or the
        // already-derived unscaled Long (the writer-task tracker)
        def u(v: Any): String = v match {
          case dec: org.apache.spark.sql.types.Decimal =>
            dec.toUnscaledLong.toString
          case l: Long => l.toString
          case other => throw new IllegalArgumentException(
            s"stats value $other does not fit dtype $d")
        }
        (u(mn), u(mx), true, true)
      case "double" | "float" =>
        def bits(v: Any): String = java.lang.Double
          .doubleToLongBits(v.asInstanceOf[Double] + 0.0).toString
        (bits(mn), bits(mx), true, true)
      case "boolean" =>
        def b(v: Any): String = if (v.asInstanceOf[Boolean]) "1" else "0"
        (b(mn), b(mx), true, true)
      case "string" =>
        val (lo, loExact) =
          truncateMin(mn.asInstanceOf[UTF8String].toString)
        truncateMax(mx.asInstanceOf[UTF8String].toString) match {
          case Some((hi, hiExact)) => (lo, hi, true, loExact && hiExact)
          case None => ("", "", false, false)
        }
      case other => throw new IllegalArgumentException(
        s"unknown stats dtype $other")
    }
  }

  /** A valid LOWER bound ≤ s: the ≤[[StringCap]]-code-point prefix. */
  def truncateMin(s: String): (String, Boolean) =
    if (s.codePointCount(0, s.length) <= StringCap) (s, true)
    else (s.substring(0, s.offsetByCodePoints(0, StringCap)), false)

  /** A valid UPPER bound ≥ s, ≤ StringCap code points: s itself when
    * short enough, else the prefix with its last incrementable code
    * point bumped (skipping the surrogate gap — lone surrogates are
    * not valid code points). None when every prefix code point is
    * already MAX_CODE_POINT (no bounded upper exists).
    */
  def truncateMax(s: String): Option[(String, Boolean)] = {
    if (s.codePointCount(0, s.length) <= StringCap) return Some((s, true))
    val cps = s.codePoints().limit(StringCap.toLong).toArray
    var i = cps.length - 1
    while (i >= 0 && cps(i) >= Character.MAX_CODE_POINT) i -= 1
    if (i < 0) return None
    val bumped = cps(i) + 1 match {
      // the surrogate block is not a code point a String can carry
      // alone; the next comparable value above 0xD7FF is 0xE000
      case c if c >= 0xD800 && c <= 0xDFFF => 0xE000
      case c => c
    }
    val sb = new java.lang.StringBuilder
    (0 until i).foreach(j => sb.appendCodePoint(cps(j)))
    sb.appendCodePoint(bumped)
    Some((sb.toString, false))
  }
}
