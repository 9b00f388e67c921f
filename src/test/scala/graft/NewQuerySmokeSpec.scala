package graft

class NewQuerySmokeSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"
  test("q194 smoke") {
    val r = queries.Relational.replaceWhere.fn(spark, d).collect()
    println("q194: " + r.toSeq)
    assert(r.nonEmpty)
  }
  test("q195 smoke") {
    val r = queries.Relational.partitionedSqlMerge.fn(spark, d).collect()
    println("q195: " + r.toSeq)
    assert(r.nonEmpty)
  }
  test("q196 smoke") {
    val r = queries.Relational.streamSink.fn(spark, d).collect()
    println("q196: " + r.toSeq)
    assert(r.nonEmpty)
  }
  test("q197 smoke") {
    val r = queries.Relational.sqlMaintenance.fn(spark, d).collect()
    println("q197: " + r.toSeq)
    assert(r.nonEmpty)
  }
}
