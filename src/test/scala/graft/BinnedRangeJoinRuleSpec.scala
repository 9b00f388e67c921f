package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.BinnedRangeJoinRule

/** The optimizer rule must (a) replace the nested-loop plan with a hash
  * join on the bin when activated, (b) produce identical results to the
  * unrewritten join across bin widths and strictness mixes, (c) leave
  * joins with an equi conjunct and non-inner joins alone, and (d) stay
  * off without the conf.
  */
class BinnedRangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = (0L until 500L).toDF("x")
  private lazy val intervals = Seq(
    (1L, 10L, 40L), (2L, 35L, 37L), (3L, 100L, 230L), (4L, 480L, 600L),
    (5L, 50L, 50L)  // empty interval
  ).toDF("iid", "lo", "hi")

  private def withBinWidth[T](w: String)(body: => T): T = {
    spark.conf.set(BinnedRangeJoinRule.ConfKey, w)
    try body finally spark.conf.unset(BinnedRangeJoinRule.ConfKey)
  }

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("range join rewrites to a hash join on the bin") {
    withBinWidth("64") {
      val j = points.join(intervals, $"x" >= $"lo" && $"x" < $"hi")
      val plan = physical(j)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      assert(plan.contains("Generate explode"), plan)
    }
  }

  test("rewritten results equal the nested-loop results across widths") {
    val expected = points.join(intervals, $"x" >= $"lo" && $"x" < $"hi")
      .select("x", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    for (w <- Seq("1", "7", "64", "100000")) {
      val got = withBinWidth(w) {
        points.join(intervals, $"x" >= $"lo" && $"x" < $"hi")
          .select("x", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
          .sorted.toSeq
      }
      assert(got === expected, s"binWidth=$w")
    }
  }

  test("strictness mixes and flipped operand orders all rewrite correctly") {
    withBinWidth("32") {
      val variants = Seq(
        points.join(intervals, $"x" > $"lo" && $"x" <= $"hi"),
        points.join(intervals, $"lo" <= $"x" && $"hi" > $"x"),
        intervals.join(points, $"x" >= $"lo" && $"x" < $"hi"))
      for ((j, i) <- variants.zipWithIndex) {
        assert(!physical(j).contains("BroadcastNestedLoopJoin"), s"variant $i")
        assert(j.count() > 0, s"variant $i")
      }
      // variant 0 vs its nested-loop twin, value-for-value
      val got = variants.head.select("x", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val expected = {
        spark.conf.unset(BinnedRangeJoinRule.ConfKey)
        try points.join(intervals, $"x" > $"lo" && $"x" <= $"hi")
          .select("x", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        finally spark.conf.set(BinnedRangeJoinRule.ConfKey, "32")
      }
      assert(got === expected)
    }
  }

  test("equi joins and non-inner joins are left alone") {
    withBinWidth("64") {
      val equi = points.withColumn("k", $"x" % 7)
        .join(intervals.withColumn("k", $"iid" % 7), Seq("k"))
        .filter($"x" >= $"lo" && $"x" < $"hi")
      assert(!physical(equi).contains("Generate explode"))
      val outer = points.join(intervals,
        $"x" >= $"lo" && $"x" < $"hi", "left_outer")
      assert(!physical(outer).contains("Generate explode"))
    }
  }

  test("rule is inert without the conf") {
    val j = points.join(intervals, $"x" >= $"lo" && $"x" < $"hi")
    assert(physical(j).contains("BroadcastNestedLoopJoin"))
  }
}
