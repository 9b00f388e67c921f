package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Three-dimensional Morton (Z-order) interleave — [[ZOrderExpr]]'s
  * sibling for the layout real forecast archives cluster on: (time, y,
  * x). A 100 TB archive range-partitioned by `graft_zorder3(t, y, x,
  * bits)` gets per-file min/max stats that prune ALL THREE dimensions,
  * so both "this week, whole globe" and "all history, this tile"
  * queries skip most files — exactly the two archive access patterns.
  *
  * z = Σ_i ((x>>i)&1)·2^(3i) + ((y>>i)&1)·2^(3i+1) + ((t>>i)&1)·2^(3i+2),
  * i < bits. Evaluated with a 21-bit magic-mask spreading sequence (the
  * 3-D analogue of the classic 2-D masks) inside whole-stage codegen.
  * `bits` ≤ 21 so three dimensions fit a positive long. Out-of-range
  * inputs throw rather than silently folding into a wrong tile.
  */
final case class ZOrder3Expr(first: Expression, second: Expression,
                             third: Expression, bits: Int)
    extends TernaryExpression {

  require(bits >= 1 && bits <= 21, s"graft_zorder3 bits $bits (1..21)")

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (Seq(first, second, third).forall(c => ok(c.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder3 expects three integral args, got " +
        s"${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder3"

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ZOrder3Expr.interleave3(toLong(a), toLong(b), toLong(c), bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, t) => {
      val cls = ZOrder3Expr.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.interleave3((long)$x, (long)$y, (long)$t, $bits);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ZOrder3Expr =
    copy(first = f, second = s, third = t)
}

object ZOrder3Expr {

  /** Spread the low 21 bits of v to every third bit position (bit i →
    * bit 3i): the 3-D magic-mask sequence.
    */
  def spread3(v: Long): Long = {
    var x = v & 0x1FFFFFL                        // 21 bits
    x = (x | (x << 32)) & 0x001F00000000FFFFL    // 5 | 16
    x = (x | (x << 16)) & 0x001F0000FF0000FFL    // 5 | 8 | 8
    x = (x | (x << 8)) & 0x100F00F00F00F00FL     // 1 | 4×4
    x = (x | (x << 4)) & 0x10C30C30C30C30C3L     // 1 | 2-bit groups
    x = (x | (x << 2)) & 0x1249249249249249L     // every 3rd bit
    x
  }

  def interleave3(x: Long, y: Long, t: Long, bits: Int): Long = {
    val lim = 1L << bits
    if (x < 0 || x >= lim || y < 0 || y >= lim || t < 0 || t >= lim)
      throw new IllegalArgumentException(
        s"graft_zorder3 input ($x, $y, $t) outside [0, $lim) — quantize " +
          "before interleaving")
    spread3(x) | (spread3(y) << 1) | (spread3(t) << 2)
  }

  /** Column API: `zorder3($"px", $"py", $"pt", 8)` → BIGINT key. */
  def zorder3(x: Column, y: Column, t: Column, bits: Int): Column =
    Bridge.column(ZOrder3Expr(Bridge.expression(x), Bridge.expression(y),
      Bridge.expression(t), bits))
}
