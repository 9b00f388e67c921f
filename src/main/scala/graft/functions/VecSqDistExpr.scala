package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the integer squared Euclidean distance
  * Σ (xᵢ − yᵢ)² over two array<bigint> vectors — the codegen upgrade over
  * the `aggregate(zip_with(a, b, (x,y) => (x−y)·(x−y)), 0L, _+_)` form the
  * k-means / SemDeDup / PQ operators used (preference order: built-in >
  * native Expression > UDF; Spark's higher-order functions evaluate
  * interpreted, boxing every element and allocating an intermediate array
  * per row, which dominates the per-pair hot path of the within-cluster
  * joins).
  *
  * Exactness: integer adds/multiplies are associative modulo overflow and
  * both engines evaluate in 64-bit two's complement, so the left-to-right
  * primitive loop is bit-identical to the HOF fold and to DuckDB's
  * `sum((a[i]-b[i])*(a[i]-b[i]))` — oracle hashes are unchanged. Nulls
  * propagate (null array → null result), and the shorter length wins,
  * matching DotProductExpr; every caller zips equal-length vectors.
  */
final case class VecSqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sqdist expects two array<bigint> args, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val dd = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $dd = $x.getLong($i) - $y.getLong($i);
         |  $s += $dd * $dd;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSqDistExpr =
    copy(left = newLeft, right = newRight)
}

object VecSqDistExpr {
  /** Column-level entry point used by the clustering operators. */
  def sqdist(a: Column, b: Column): Column =
    Bridge.column(VecSqDistExpr(Bridge.expression(a), Bridge.expression(b)))
}
