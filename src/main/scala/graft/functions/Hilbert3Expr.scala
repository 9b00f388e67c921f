package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Three-dimensional Hilbert index — [[ZOrder3Expr]]'s strict-locality
  * sibling, via Skilling's transpose construction ("Programming the
  * Hilbert curve", AIP Conf. Proc. 707, 2004 — the standard public
  * N-dimensional algorithm): rotate/reflect the coordinate bits into
  * the transposed Hilbert frame, then bit-interleave. Like the 2-D
  * form, the curve's defining properties are complete self-checks that
  * need no external vector: consecutive indices are ALWAYS one grid
  * step apart (adjacency), the map is a bijection on the cube, and
  * every aligned sub-cube is one contiguous index run (the property
  * [[graft.ops.CurveCover.cover3]] rests on) — Hilbert3Spec verifies
  * all three exhaustively at small orders.
  */
final case class Hilbert3Expr(first: Expression, second: Expression,
                              third: Expression, bits: Int)
    extends TernaryExpression {

  require(bits >= 1 && bits <= 21, s"graft_hilbert3 bits $bits (1..21)")

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (Seq(first, second, third).forall(c => ok(c.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert3 expects three integral args, got " +
        s"${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert3"

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    Hilbert3Expr.index(toLong(a), toLong(b), toLong(c), bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, t) => {
      val cls = Hilbert3Expr.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.index((long)$x, (long)$y, (long)$t, $bits);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Hilbert3Expr =
    copy(first = f, second = s, third = t)
}

object Hilbert3Expr {

  /** (x, y, t) → distance along the order-`bits` 3-D Hilbert curve. */
  def index(x0: Long, y0: Long, t0: Long, bits: Int): Long = {
    val lim = 1L << bits
    if (x0 < 0 || x0 >= lim || y0 < 0 || y0 >= lim || t0 < 0 || t0 >= lim)
      throw new IllegalArgumentException(
        s"graft_hilbert3 input ($x0, $y0, $t0) outside [0, $lim) — " +
          "quantize before indexing")
    val xs = Array(x0, y0, t0)
    axesToTranspose(xs, bits)
    // interleave the transposed coords, axis 0 most significant per group
    var d = 0L
    var j = bits - 1
    while (j >= 0) {
      var i = 0
      while (i < 3) {
        d = (d << 1) | ((xs(i) >> j) & 1L)
        i += 1
      }
      j -= 1
    }
    d
  }

  /** Inverse of [[index]] — test/round-trip surface. */
  def inverse(d: Long, bits: Int): (Long, Long, Long) = {
    // range check via shift, not `d < (1L << 3*bits)`: at bits = 21 the
    // literal bound is 1L << 63 = Long.MinValue and the compare would
    // reject every input at the documented maximum order
    require(d >= 0 && (3 * bits == 64 || (d >>> (3 * bits)) == 0),
      s"index $d out of range for bits=$bits")
    val xs = new Array[Long](3)
    var j = 3 * bits - 1
    var k = 0
    while (j >= 0) {
      xs(k % 3) = (xs(k % 3) << 1) | ((d >> j) & 1L)
      k += 1; j -= 1
    }
    transposeToAxes(xs, bits)
    (xs(0), xs(1), xs(2))
  }

  /** Skilling's AxestoTranspose (in-place), n = 3. */
  private def axesToTranspose(xs: Array[Long], bits: Int): Unit = {
    val m = 1L << (bits - 1)
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < 3) {
        if ((xs(i) & q) != 0) xs(0) ^= p
        else { val t = (xs(0) ^ xs(i)) & p; xs(0) ^= t; xs(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < 3) { xs(i) ^= xs(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) {
      if ((xs(2) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < 3) { xs(i) ^= t; i += 1 }
  }

  /** Skilling's TransposetoAxes (in-place), n = 3. */
  private def transposeToAxes(xs: Array[Long], bits: Int): Unit = {
    val m = 1L << (bits - 1)
    // Gray decode by H ^ (H/2)
    var t = xs(2) >> 1
    var i = 2
    while (i >= 1) { xs(i) ^= xs(i - 1); i -= 1 }
    xs(0) ^= t
    // undo excess work
    var q = 2L
    while (q != (m << 1)) {
      val p = q - 1
      i = 2
      while (i >= 0) {
        if ((xs(i) & q) != 0) xs(0) ^= p
        else { t = (xs(0) ^ xs(i)) & p; xs(0) ^= t; xs(i) ^= t }
        i -= 1
      }
      q <<= 1
    }
  }

  /** Column API: `hilbert3($"px", $"py", $"pt", 8)` → BIGINT key. */
  def hilbert3(x: Column, y: Column, t: Column, bits: Int): Column =
    Bridge.column(Hilbert3Expr(Bridge.expression(x), Bridge.expression(y),
      Bridge.expression(t), bits))
}
