package graft

import org.apache.spark.sql.functions._
import graft.functions.{HeavyHittersExpr, SpaceSavingState}

/** SpaceSaving sketch: exact regime equals GROUP BY, overflow regime
  * keeps the never-undercount guarantee and surfaces true heavy
  * hitters, distributed merge stays exact when capacity covers the key
  * space, and the SQL registration works.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime equals groupBy count with the same tie-break") {
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val sketch = df
      .agg(HeavyHittersExpr.topK($"l_partkey", 10, 1 << 16).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.item", $"h.n", $"h.err")
      .as[(Long, Long, Long)].collect()
    val exact = df.groupBy($"l_partkey").count()
      .orderBy($"count".desc, $"l_partkey")
      .limit(10).as[(Long, Long)].collect()
    assert(sketch.map(t => (t._1, t._2)).toSeq === exact.toSeq)
    assert(sketch.forall(_._3 == 0L), "no eviction => zero error bounds")
  }

  test("distributed merge stays exact across many partitions") {
    val df = spark.range(0, 10000).select(
      (col("id") % 97).as("k")).repartition(16)
    val sketch = df.agg(HeavyHittersExpr.topK($"k", 97, 256).as("hh"))
      .select(explode($"hh").as("h")).select($"h.item", $"h.n")
      .as[(Long, Long)].collect().toMap
    assert(sketch.size === 97)
    // 10000 = 103*97 + 9: keys 0..8 appear 104 times, the rest 103
    (0L until 97L).foreach { k =>
      assert(sketch(k) === (if (k < 9) 104L else 103L), s"k=$k")
    }
  }

  test("overflowed sketch never undercounts and keeps the heavy hitter") {
    // one heavy key (5000 hits) in a sea of 2000 singletons, capacity 64
    val st = new SpaceSavingState(64)
    (1 to 5000).foreach(_ => st.add(42L))
    (1L to 2000L).foreach(k => st.add(1000000L + k))
    val top = st.top(1)
    assert(top.head._1 === 42L)
    val (_, est, err) = top.head
    assert(est >= 5000L, "SpaceSaving estimates never undercount")
    assert(est - err <= 5000L, "est - err lower-bounds the true count")
    assert(st.counts.size <= 64, "state stays bounded at capacity")
  }

  test("merge of overflowed states keeps bounds") {
    val a = new SpaceSavingState(32)
    val b = new SpaceSavingState(32)
    (1 to 800).foreach(_ => a.add(7L))
    (1L to 100L).foreach(k => a.add(2000L + k))
    (1 to 900).foreach(_ => b.add(7L))
    (1L to 100L).foreach(k => b.add(3000L + k))
    a.mergeIn(b)
    val (item, est, err) = a.top(1).head
    assert(item === 7L)
    assert(est >= 1700L && est - err <= 1700L)
    assert(a.counts.size <= 32)
  }

  test("serialization round-trips the full state") {
    val st = new SpaceSavingState(8)
    Seq(1L, 1L, 2L, 3L, 3L, 3L).foreach(st.add(_))
    val back = SpaceSavingState.deserialize(st.serialize())
    assert(back.top(8) === st.top(8))
    assert(back.capacity === 8 && back.evicted === st.evicted)
  }

  test("graft_top_k is registered on the SQL surface") {
    spark.range(0, 1000).select((col("id") % 10).as("k"))
      .createOrReplaceTempView("hh_input")
    val rows = spark.sql(
      """SELECT h.item, h.n FROM (
        |  SELECT explode(graft_top_k(k, 3, 100)) AS h FROM hh_input)""".stripMargin)
      .as[(Long, Long)].collect()
    assert(rows.length === 3 && rows.forall(_._2 === 100L))
  }
}
