package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT rolling hashes of every k-byte gram of a document, in one
  * O(n) pass — the lightweight-proxy half of the exact-substring-dup
  * join (guide §8: shuffle keys and metadata, never payloads): instead
  * of materializing and shuffling every k-char substring (k× the corpus
  * bytes, twice, for q136's self-join), the candidate join runs over
  * these 8-byte hashes and only documents that land in a candidate pair
  * pay the exact gram materialization during verification.
  *
  * Equal grams hash equal (a pure function of the bytes), so the
  * hash-join candidate set is a SUPERSET of the true shared-gram pairs
  * — no false negatives — and the exact verify join downstream removes
  * collision-born false positives, keeping the declared result
  * bit-identical to brute force. Same rolling-hash construction as
  * [[WinnowAnchorsExpr]] (odd 64-bit multiplier, wraparound), same
  * byte-gram contract (byte windows = char windows on ASCII).
  */
final case class GramHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 2 && k <= 256, s"graft_gram_hashes k=$k (2..256)")

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes expects a string argument, got " +
        s"${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(v: Any): Any =
    GramHashesExpr.hashes(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramHashesExpr.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashesExpr {

  /** Distinct rolling k-gram hashes of `text`, ascending order (sort +
    * dedup — the output is join fodder, no order contract).
    */
  def hashes(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val M = 0x9E3779B97F4A7C15L
    var mk = 1L // M^(k-1)
    var j = 1
    while (j < k) { mk *= M; j += 1 }
    val h = new Array[Long](n)
    var acc = 0L
    var i = 0
    while (i < k) { acc = acc * M + (bytes(i) & 0xFF); i += 1 }
    h(0) = acc
    i = 1
    while (i < n) {
      acc = (acc - (bytes(i - 1) & 0xFF) * mk) * M + (bytes(i + k - 1) & 0xFF)
      h(i) = acc
      i += 1
    }
    java.util.Arrays.sort(h)
    var w = 1
    i = 1
    while (i < n) {
      if (h(i) != h(w - 1)) { h(w) = h(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == n) h else java.util.Arrays.copyOf(h, w))
  }

  def gramHashes(c: Column, k: Int): Column =
    Bridge.column(GramHashesExpr(Bridge.expression(c), k))
}
