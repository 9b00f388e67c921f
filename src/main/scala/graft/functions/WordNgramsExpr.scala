package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word k-grams of a document in ONE native pass — the codegen
  * replacement for the `zip_with`-chain construction
  * (TextPipeline.shingles / TrainingPrep.ngrams2): higher-order
  * functions evaluate their lambdas interpreted per element, and the
  * k-step fold allocates k−1 intermediate arrays of partially-joined
  * gram strings, so building k-grams that way costs O(n·k²) string
  * churn outside codegen — measured as the dominant per-task cost of
  * the q69/q83/q85 gram pipelines (guide §4: prefer native expressions
  * in the hot path).
  *
  * Semantics are BIT-IDENTICAL to the fold it replaces (pinned by
  * R21OptimizationSpec against the zip_with construction over the real
  * corpus): tokens are `split(trim(text), "\\s+")` — Spark's `trim`
  * strips ASCII 0x20 only, `split` keeps leading/trailing empty tokens
  * exactly like Java's `Pattern.split(s, -1)` — and gram i joins
  * tokens i..i+k−1 with a single space. `distinct = true` applies
  * first-occurrence dedup, matching `array_distinct`.
  */
final case class WordNgramsExpr(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {

  require(k >= 1 && k <= 64, s"graft_word_ngrams k=$k (1..64)")

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_word_ngrams expects a string argument, got " +
        s"${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override def nullSafeEval(v: Any): Any =
    WordNgramsExpr.ngrams(v.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNgramsExpr.ngrams($c, $k, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgramsExpr {

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  def ngrams(text: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    // Spark's trim() strips ASCII space (0x20) ONLY — not \t\n\r — and
    // split(_, "\\s+") keeps empty tokens exactly like Pattern.split
    // with limit -1; both must be mirrored or token counts drift.
    val s = text.toString
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val ts = Whitespace.split(s.substring(b, e), -1)
    val n = ts.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    if (distinct) {
      val seen = new java.util.LinkedHashSet[String](n * 2)
      var i = 0
      while (i < n) {
        seen.add(join(ts, i, k))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = UTF8String.fromString(join(ts, i, k))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  private def join(ts: Array[String], from: Int, k: Int): String = {
    if (k == 1) return ts(from)
    var len = k - 1
    var i = 0
    while (i < k) { len += ts(from + i).length; i += 1 }
    val sb = new java.lang.StringBuilder(len)
    i = 0
    while (i < k) {
      if (i > 0) sb.append(' ')
      sb.append(ts(from + i))
      i += 1
    }
    sb.toString
  }

  def wordNgrams(c: Column, k: Int, distinct: Boolean): Column =
    Bridge.column(WordNgramsExpr(Bridge.expression(c), k, distinct))
}
