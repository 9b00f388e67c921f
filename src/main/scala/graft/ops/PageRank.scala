package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge DataFrame — the iterative
  * join-aggregate workload (one O(E) shuffle per iteration), expressed
  * so the result is EXACTLY reproducible by any SQL engine:
  *
  *   pr_0(v)    = scale
  *   pr_{i+1}(v) = base + (num · Σ_{u→v} (pr_i(u) div d(u))) div den
  *
  * with base = scale·(den−num)/den — all integer arithmetic, every
  * division truncating, so no float accumulation order can perturb the
  * hash (same discipline as the climatology query q110). num/den = the
  * damping factor (17/20 = 0.85).
  *
  * Scale shape: contributions are edges ⋈ ranks ⋈ degrees on `src` —
  * three relations pre-partitioned by the same key, one shuffle per
  * iteration for the dst-side re-aggregation. Only the FINAL ranks are
  * cached (see the note at the return); for hundreds of iterations the
  * accumulated lineage needs `localCheckpoint` every ~20 steps. Nodes
  * without in-edges keep the bare teleport term via the left join
  * against the node set.
  */
object PageRank {

  def run(edges: DataFrame, iterations: Int, scale: Long = 1000000L,
          num: Int = 17, den: Int = 20): DataFrame = {
    require(iterations >= 1 && num > 0 && den > num,
      "need iterations >= 1 and a damping fraction num/den < 1")
    val base = scale * (den - num) / den
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    val nodes = edges.select(col("src").as("v")).distinct()
      .union(edges.select(col("dst").as("v")).distinct()).distinct()
    var ranks = nodes.withColumn("pr", lit(scale))
    for (_ <- 0 until iterations) {
      val contribs = edges
        .join(ranks.withColumnRenamed("v", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("v"), expr("pr div d").as("c"))
        .groupBy("v").agg(sum("c").as("s"))
      ranks = nodes.join(contribs, Seq("v"), "left")
        .select(col("v"),
          (lit(base) + expr(s"($num * coalesce(s, 0L)) div $den")).as("pr"))
    }
    // Cache ONLY the final ranks: a single-action consumer computes each
    // iteration's branch exactly once whether or not the intermediates
    // are cached, so per-iteration caches cost storage that grows with
    // iteration count and buy nothing (the r12 review finding) — while
    // eagerly materializing each step to bound that storage costs one
    // full job per iteration (measured 15x on q115). Repeated actions on
    // the RESULT hit this one cache. For hundreds of iterations the
    // lineage itself becomes the problem — localCheckpoint every ~20
    // steps there, as the scale note above says.
    ranks.cache()
  }
}
