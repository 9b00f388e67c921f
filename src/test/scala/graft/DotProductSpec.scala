package graft

import org.apache.spark.sql.functions._
import graft.functions.{DotProductExpr, VectorOps}

/** Native vec_dot expression: value parity with the UDF and the
  * interpreted HOF fold, null propagation, codegen participation.
  */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(0.1, 0.2), Seq(0.3, 0.4, 99.0)), // shorter length wins
    (3L, Seq.empty[Double], Seq.empty[Double])
  ).toDF("id", "a", "b")

  test("value parity: expression == UDF == HOF left fold") {
    val out = df.select(col("id"),
      DotProductExpr.dot(col("a"), col("b")).as("native"),
      VectorOps.dotUdf(col("a"), col("b")).as("viaUdf"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("viaHof"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(1) === r.getDouble(2))
      if (r.getLong(0) != 2L) // HOF null-pads the shorter side → null
        assert(r.getDouble(1) === r.getDouble(3))
    }
    assert(out.find(_.getLong(0) == 1L).get.getDouble(1) === 32.0)
    assert(out.find(_.getLong(0) == 3L).get.getDouble(1) === 0.0)
  }

  test("null propagation and type checking") {
    val n = Seq((Option.empty[Seq[Double]], Option(Seq(1.0))))
      .toDF("a", "b")
      .select(DotProductExpr.dot(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
    intercept[Exception] {
      Seq((1, "x")).toDF("a", "b")
        .select(DotProductExpr.dot(col("a"), col("b"))).collect()
    }
  }

  test("participates in whole-stage codegen (not an interpreted fallback)") {
    // a local Seq collapses to LocalTableScan via ConvertToLocalRelation,
    // hiding codegen — use a range-backed plan instead
    val ranged = spark.range(100).select(
      array(col("id").cast("double"), (col("id") + 1).cast("double")).as("a"),
      array(lit(2.0), lit(3.0)).as("b"))
    val q = ranged.select(DotProductExpr.dot(col("a"), col("b")).as("d"))
    val codegenSpans = q.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty,
      s"expected codegen span in:\n${q.queryExecution.executedPlan}")
    assert(q.agg(sum(col("d"))).head.getDouble(0) ===
      (0 until 100).map(i => i * 2.0 + (i + 1) * 3.0).sum)
  }
}
