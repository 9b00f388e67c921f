package graft

import graft.queries.{Functions, TrainingPrep}

/** Plan-shape regression guards for this round's optimizations: the
  * assertions pin the PHYSICAL shape, so a future refactor that quietly
  * reintroduces the slow form fails here rather than in a bench diff.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q73: survivor election is a digest agg+join — no Window, no Sort " +
    "feeding it") {
    val plan = TrainingPrep.corpusAssembly.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "q73 must not window over md5(text); use the digest-agg shape")
  }

  test("q30: props parse once via from_json, not per-path get_json_object") {
    val analyzed = Functions.jsonAttrs.fn(spark, sf)
      .queryExecution.analyzed.toString
    assert(analyzed.contains("from_json"), "q30 should parse via from_json")
    assert(!analyzed.contains("get_json_object"),
      "q30 must not re-parse JSON per extraction")
  }

  test("ingest skip anti-join consumes a relation (plan has the anti-join)") {
    // the RelationOnlyClient behavior test lives in IngestSpec; here we
    // pin that the join stays an ANTI join (no inner/except rewrite)
    import spark.implicits._
    val items = Seq(("c1", "i1"), ("c1", "i2")).toDF("collection", "id")
    val keys = Seq(("c1", "i1")).toDF("collection", "id")
    val plan = items.join(keys, Seq("collection", "id"), "left_anti")
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("anti"))
  }
}
