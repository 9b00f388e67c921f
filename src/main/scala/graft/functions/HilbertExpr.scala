package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Hilbert-curve index of a quantized 2-D cell — [[ZOrderExpr]]'s
  * better-locality sibling (the curve Iceberg/Delta offer next to
  * Z-order): consecutive indices are ALWAYS grid-adjacent, so a
  * clustered file's key range maps to a tighter spatial region than
  * Morton's quadrant jumps. Classic bit-level construction (Hilbert
  * 1891; the standard iterative rotate-reflect walk): per bit plane s,
  * accumulate s²·((3·rx) ⊕ ry) and rotate the lower plane into
  * canonical orientation.
  *
  * The adjacency property — |cell(d+1) − cell(d)| is exactly one grid
  * step, for EVERY consecutive pair — is a complete self-verifying
  * correctness pin (HilbertSpec checks it exhaustively), which no
  * external reference is needed for.
  */
final case class HilbertExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"graft_hilbert bits $bits (1..31)")

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert expects two integral args, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertExpr.index(toLong(a), toLong(b), bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val cls = HilbertExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.index((long)$x, (long)$y, $bits);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertExpr =
    copy(left = newLeft, right = newRight)
}

object HilbertExpr {

  /** (x, y) → distance along the order-`bits` Hilbert curve. */
  def index(x0: Long, y0: Long, bits: Int): Long = {
    val lim = 1L << bits
    if (x0 < 0 || x0 >= lim || y0 < 0 || y0 >= lim)
      throw new IllegalArgumentException(
        s"graft_hilbert input ($x0, $y0) outside [0, $lim) — quantize " +
          "before indexing")
    var x = x0; var y = y0
    var d = 0L
    var s = lim >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the remaining coordinates into canonical orientation
      // (reflection over the FULL grid, the standard formulation)
      if (ry == 0) {
        if (rx == 1) { x = lim - 1 - x; y = lim - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse: distance → (x, y) — the round-trip pin for [[index]]. */
  def cell(d0: Long, bits: Int): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** Column API: `hilbert($"px", $"py", 10)` → BIGINT curve index. */
  def hilbert(x: Column, y: Column, bits: Int): Column =
    Bridge.column(
      HilbertExpr(Bridge.expression(x), Bridge.expression(y), bits))
}
