package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Robust-winnowing anchor selection (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003) as a native codegen expression: returns the DISTINCT
  * anchor k-grams of a document — the windowed minima of the k-gram
  * hash sequence, ties broken rightmost — in one O(n) pass (monotonic
  * deque for the sliding-window minimum; rolling polynomial hash, so
  * no per-position digest).
  *
  * The selection key orders by (hash, −position): the hash strictly
  * dominates, position only breaks exact-hash ties, so within a window
  * whose CONTENT two documents share, both select the same gram
  * whatever the absolute offsets — the condition the winnowing
  * guarantee (any shared run of ≥ w+k−1 chars shares an anchor) rests
  * on. The hash itself is internal: any deterministic gram → hash map
  * upholds the guarantee, which is why a cheap rolling hash is sound
  * here while the oracle-visible hashes elsewhere must be md5.
  *
  * A higher-order-function formulation of the same selection
  * (transform + slice + array_min) is O(n·w) with a fresh array
  * allocation per position — measured 5× slower than the BRUTE plan it
  * was meant to beat at sf0.1, which is what forced the native form.
  */
final case class WinnowAnchorsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && k <= 256, s"graft_winnow_anchors k=$k (2..256)")
  require(w >= 2 && w <= 4096, s"graft_winnow_anchors w=$w (2..4096)")

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_anchors expects a string argument, got " +
        s"${child.dataType.sql}")
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "graft_winnow_anchors"

  override def nullSafeEval(v: Any): Any =
    WinnowAnchorsExpr.anchors(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowAnchorsExpr.anchors($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowAnchorsExpr {

  /** Distinct anchor k-grams of `text`, selection as documented above.
    * Operates on the raw UTF-8 BYTES (k-gram = k bytes): byte windows
    * and char windows select identically on ASCII, and on multi-byte
    * text byte-grams are merely a different — equally deterministic —
    * gram family, which the guarantee is indifferent to. Because a
    * byte slice can split a multi-byte codepoint, grams are returned
    * as BINARY, not strings — an honest contract (byte-equality joins
    * work unchanged; a StringType return would hand callers invalid
    * UTF-8 on non-ASCII text).
    */
  def anchors(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    // rolling polynomial hash over an odd 64-bit multiplier: h(i+1) =
    // (h(i) - b(i)·M^(k-1))·M + b(i+k). Wraparound arithmetic is fine —
    // equal grams hash equal, which is all the selection needs.
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
    // sliding-window minimum by monotonic deque over (h, -pos): keep
    // positions whose key is strictly smaller than everything after
    // them; rightmost wins ties, so pop while the incoming key is <=.
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    val isAnchor = new Array[Boolean](n)
    i = 0
    while (i < n) {
      while (tail > head && {
        val p = deque(tail - 1)
        // incoming (h(i), -i) <= (h(p), -p): unsigned hash compare,
        // equal hashes prefer the larger position (the incoming one)
        val c = java.lang.Long.compareUnsigned(h(i), h(p))
        c < 0 || c == 0
      }) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) < i - w + 1) head += 1
      if (i >= w - 1 || i == n - 1) isAnchor(deque(head)) = true
      i += 1
    }
    // distinct anchor grams, insertion-ordered (ByteBuffer equality is
    // content-based, unlike raw Array[Byte])
    val seen = new java.util.LinkedHashSet[java.nio.ByteBuffer]()
    i = 0
    while (i < n) {
      if (isAnchor(i))
        seen.add(java.nio.ByteBuffer.wrap(
          java.util.Arrays.copyOfRange(bytes, i, i + k)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().array(); i += 1 }
    new GenericArrayData(out)
  }

  def winnowAnchors(c: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowAnchorsExpr(Bridge.expression(c), k, w))
}
