package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Morton (Z-order) bit interleave of two quantized dimensions — the
  * lakehouse clustering key for multi-dimensional data skipping: sort
  * or range-partition a 100 TB table by `graft_zorder(x, y, bits)` and
  * every Z-prefix range is a spatial tile, so per-file min/max stats
  * prune BOTH dimensions at scan time (the layout trick behind
  * Delta/Iceberg OPTIMIZE ZORDER; public construction, Morton 1966).
  *
  * z = Σ_i ((x>>i)&1)·2^(2i) + ((y>>i)&1)·2^(2i+1), i < bits. Evaluated
  * with the magic-mask bit-spreading sequence (5 shift-or-mask steps,
  * no loop) inside whole-stage codegen. Inputs must already be
  * quantized to [0, 2^bits): out-of-range values throw rather than
  * silently folding into a wrong tile.
  *
  * Null propagates (null-intolerant binary expression). `bits` <= 31
  * so the key fits a positive long with room for both dimensions.
  */
final case class ZOrderExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"graft_zorder bits $bits (1..31)")

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder expects two integral args, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderExpr.interleave(toLong(a), toLong(b), bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val cls = ZOrderExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.interleave((long)$x, (long)$y, $bits);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpr {

  /** Spread the low 32 bits of v to the even bit positions (the
    * classic magic-mask sequence).
    */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(x: Long, y: Long, bits: Int): Long = {
    val lim = 1L << bits
    if (x < 0 || x >= lim || y < 0 || y >= lim)
      throw new IllegalArgumentException(
        s"graft_zorder input ($x, $y) outside [0, $lim) — quantize " +
          "before interleaving")
    spread(x) | (spread(y) << 1)
  }

  /** Column API: `zorder($"px", $"py", 10)` → BIGINT Morton key. */
  def zorder(x: Column, y: Column, bits: Int): Column =
    Bridge.column(
      ZOrderExpr(Bridge.expression(x), Bridge.expression(y), bits))
}
