package graft

import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, RangeJoin}

/** AsOfJoin: hand-computed fixture semantics (latest right <= left, tie
  * matches, no-match rows dropped, payload columns travel together) and
  * a property check against the naive O(L×R) formulation. RangeJoin:
  * binned result must equal the raw range-predicate join, across bin
  * widths smaller / larger than the interval length.
  */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 5L, "a"), (1L, 9L, "b"), (1L, 2L, "c"),   // c has no preceding right
    (2L, 4L, "d"), (3L, 7L, "e")                   // key 3 absent on right
  ).toDF("k", "t", "tag")

  private lazy val right = Seq(
    (1L, 3L, 10.0), (1L, 9L, 20.0),                // t=9 ties left "b"
    (2L, 4L, 30.0), (2L, 1L, 40.0)
  ).toDF("k", "rt", "v")

  test("as-of join picks latest right at-or-before each left row") {
    val out = AsOfJoin.joinAsOf(left, right, Seq("k"), "t", "rt")
      .select("tag", "rt", "v").as[(String, Long, Double)].collect()
      .map { case (tag, rt, v) => tag -> ((rt, v)) }.toMap
    assert(out === Map(
      "a" -> ((3L, 10.0)),   // latest of {3} <= 5
      "b" -> ((9L, 20.0)),   // tie at 9 matches
      "d" -> ((4L, 30.0))))  // tie beats the earlier t=1
    // "c" (nothing precedes t=2) and "e" (key absent) are dropped
  }

  test("as-of join equals the naive join-filter-argmax formulation") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val l = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts".as("lt"))
    val r = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("rt"), $"value")
    val fast = AsOfJoin.joinAsOf(l, r, Seq("user_id"), "lt", "rt")
    val naive = l.join(r, Seq("user_id")).filter($"lt" >= $"rt")
      .groupBy($"user_id", $"event_id", $"lt")
      .agg(max(struct($"rt", $"value")).as("m"))
      .select($"user_id", $"event_id", $"lt", $"m.rt", $"m.value")
    assert(fast.count() === naive.count())
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  private lazy val points = (0L until 200L).map(i => (i, s"p$i"))
    .toDF("x", "pid")
  private lazy val intervals = Seq(
    (101L, 0L, 50L), (102L, 40L, 45L), (103L, 45L, 45L), // empty interval
    (104L, 190L, 210L), (105L, 30L, 31L)
  ).toDF("iid", "lo", "hi")

  test("binned range join equals the raw range predicate at several bin widths") {
    val expected = points.join(intervals, $"x" >= $"lo" && $"x" < $"hi")
      .select("pid", "iid")
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.binned(points, intervals, "x", "lo", "hi",
        toBin = identity, binWidth = w).select("pid", "iid")
      assert(got.count() === expected.count(), s"binWidth=$w")
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        s"binWidth=$w")
    }
  }
}
