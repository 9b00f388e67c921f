package graft

import org.apache.spark.sql.functions._
import graft.ops.Intervals

/** Interval union: hand-checked islands (overlap, touch, gap),
  * half-open semantics, partitioning invariance. Cross-engine parity
  * is q117's oracle.
  */
class IntervalsSpec extends SparkSpec {

  import spark.implicits._

  test("overlapping and touching intervals merge; gaps split islands") {
    // key 1: [0,10) ∪ [5,15) ∪ [15,20) -> [0,20); [25,30) alone
    // key 2: [100,110) alone
    val df = Seq(
      (1L, 5L, 15L), (1L, 0L, 10L), (1L, 15L, 20L), (1L, 25L, 30L),
      (2L, 100L, 110L)).toDF("k0", "s0", "e0")
    val m = Intervals.merge(df, $"k0", $"s0", $"e0")
      .select("k", "start", "end", "n_raw")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(m.toSeq === Seq((1L, 0L, 20L, 3L), (1L, 25L, 30L, 1L),
      (2L, 100L, 110L, 1L)))
  }

  test("a strictly-later start opens a new island (half-open: touch " +
    "merges, gap of 1 does not)") {
    val df = Seq((9L, 0L, 10L), (9L, 11L, 20L)).toDF("k0", "s0", "e0")
    val m = Intervals.merge(df, $"k0", $"s0", $"e0").collect()
    assert(m.length === 2)
  }

  test("result is independent of input partitioning and duplicates " +
    "are absorbed") {
    val base = (0 until 500).map { i =>
      (i % 7L, (i * 13L) % 400, (i * 13L) % 400 + 25L)
    } ++ Seq((3L, 50L, 75L), (3L, 50L, 75L)) // exact duplicates
    def run(np: Int) =
      Intervals.merge(base.toDF("k0", "s0", "e0").repartition(np),
          $"k0", $"s0", $"e0")
        .select("k", "start", "end", "n_raw")
        .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
        .toSeq
    assert(run(1) === run(17))
  }
}
