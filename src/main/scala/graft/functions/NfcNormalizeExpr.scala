package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the
  * canonicalization pass multilingual corpus prep runs before dedup and
  * tokenization (combining sequences like `e` + U+0301 collapse to the
  * precomposed `é`, so visually-identical strings hash identically).
  *
  * Spark ships no normalizer built-in; a Scala UDF would pay per-row
  * boxing. This stays inside whole-stage codegen with one static call
  * into `java.text.Normalizer` (Form.NFC), UTF8String → String only
  * when the text is not already in NFC's quick-check fast path.
  * Registered as `graft_nfc` (GraftExtensions) for the SQL surface;
  * DuckDB's `nfc_normalize` is the oracle twin.
  */
final case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(v: Any): Any =
    NfcNormalizeExpr.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalizeExpr.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Static entry shared by the interpreted and generated paths. The
    * quick check (`isNormalized`) skips the String round-trip for the
    * overwhelmingly-common already-NFC input.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfcCol(c: Column): Column =
    Bridge.column(NfcNormalizeExpr(Bridge.expression(c)))
}
