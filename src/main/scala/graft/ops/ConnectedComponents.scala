package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation: every node's
  * label becomes the minimum over itself and its neighbors until
  * fixpoint, so each component converges to its smallest node id — the
  * canonical-document election over a near-dup PAIR graph (pairwise
  * similarity alone under-merges: A~B and B~C must land A, B, C in one
  * dup cluster even when A~C was never a candidate pair).
  *
  * Each round is two hash shuffles (neighbor-min aggregation + label
  * join) and converges in O(component diameter) rounds. Near-dup
  * clusters are shallow (diameter a handful), which makes propagation
  * the right tool here; for adversarial web-scale graphs with long
  * chains, [[runStarContraction]] implements the two-phase
  * small-star/large-star scheme (Kiveris et al., "Connected Components
  * in MapReduce and Beyond") with O(log n) rounds — same output
  * contract. [[components]] is the no-knowledge-needed entry point:
  * propagation under a round budget, star contraction as the fallback.
  * Lineage is truncated every round (localCheckpoint) so the plan does
  * not grow with the iteration count.
  */
object ConnectedComponents {

  /** Shuffle partitions sized to EDGE volume, not the session default:
    * ~2M edges (≈64 MB of long pairs) per partition, floor 8. A
    * near-dup pair graph is orders of magnitude smaller than the corpus
    * it came from — every round pays the partition count as fixed
    * scheduling overhead — but a 10¹⁰-edge web graph must not funnel
    * through 8 reducers either, which is what a constant default did.
    */
  def derivePartitions(edgeCount: Long,
                       targetPerPartition: Long = 2L * 1000 * 1000): Int = {
    // overflow-safe ceil: edgeCount can be anything a count() returns
    val ceil = edgeCount / targetPerPartition +
      (if (edgeCount % targetPerPartition > 0) 1L else 0L)
    math.min(math.max(8L, ceil), 100000L).toInt
  }

  /** The caller-needs-no-graph-knowledge entry point: min-label
    * propagation under `propagationBudget` rounds (cheapest per round on
    * the shallow clusters that dominate dedup workloads), falling back
    * to large-star/small-star contraction when the budget is exhausted —
    * a chain-shaped adversarial graph gets the O(log n) algorithm
    * without the caller choosing. Partitions derive from the edge count
    * unless given.
    */
  def components(edges: DataFrame, numPartitions: Option[Int] = None,
                 propagationBudget: Int = 12): DataFrame =
    componentsChosen(edges, numPartitions, propagationBudget)._1

  /** [[components]] plus which algorithm it settled on ("propagation" |
    * "star") — returned with the result rather than stashed in shared
    * state, so concurrent calls cannot race on the observability signal.
    */
  def componentsChosen(edges: DataFrame, numPartitions: Option[Int] = None,
                       propagationBudget: Int = 12): (DataFrame, String) = {
    val cached = edges.select(col("src"), col("dst")).persist()
    try {
      val parts = numPartitions.getOrElse(derivePartitions(cached.count()))
      propagate(cached, propagationBudget, parts) match {
        case Some(labels) => (labels, "propagation")
        case None =>
          (runStarContraction(cached, numPartitions = Some(parts)), "star")
      }
    } finally cached.unpersist() // results are localCheckpoint-backed
  }

  /** @param edges undirected edge list with `src`/`dst` columns
    * @param numPartitions parallelism of the per-round shuffles; derived
    *   from the edge count (one `count()` over `edges`) when None
    * @return (node, component) — component = min node id reachable
    */
  def run(edges: DataFrame, maxIter: Int = 25,
          numPartitions: Option[Int] = None): DataFrame = {
    val cached = edges.select(col("src"), col("dst")).persist()
    try {
      val parts = numPartitions.getOrElse(derivePartitions(cached.count()))
      propagate(cached, maxIter, parts).getOrElse(throw new IllegalStateException(
        s"label propagation not converged in $maxIter rounds"))
    } finally cached.unpersist()
  }

  /** The propagation loop; None when the round budget runs out before
    * fixpoint (long-diameter graph — see [[components]] for the switch).
    */
  private def propagate(edges: DataFrame, maxIter: Int,
                        numPartitions: Int): Option[DataFrame] = {
    // partitioned by DST — the key the per-round neighbor-min join uses
    // — so the edge relation is shuffled ONCE here instead of once per
    // round (r20 partitioned by src and re-exchanged every iteration)
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().repartition(numPartitions, col("dst")).persist()
    // round 1 folded into initialization: label(v) = min(v, N(v)) is
    // exactly what one propagation round over identity labels computes,
    // and the symmetric edge list is already grouped by dst, so this is
    // one exchange-free aggregate instead of a join+agg+join round. On
    // the shallow star-shaped clusters that dominate dedup graphs this
    // IS the fixpoint, leaving a single detection round.
    var labels = sym.groupBy(col("dst"))
      .agg(least(col("dst"), min(col("src"))).as("label"))
      .select(col("dst").as("node"), col("label"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("node").as("dst"), col("label")), "dst")
        .groupBy(col("src")).agg(min(col("label")).as("nbr_label"))
      val next = labels
        .join(nbrMin.withColumnRenamed("src", "node"), Seq("node"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("next_label"))
        .localCheckpoint()
      changed = next.filter(col("next_label") < col("label")).count()
      labels = next.select(col("node"), col("next_label").as("label"))
      i += 1
    }
    sym.unpersist()
    if (changed == 0) Some(labels.withColumnRenamed("label", "component"))
    else None
  }

  /** Connected components by alternating large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond") — the adversarial-graph form: converges in O(log n)
    * rounds regardless of component DIAMETER, where min-label
    * propagation pays one round per hop. Same output contract as
    * [[run]]; choose this when components can be long chains (web
    * graphs, transitive link structures), and propagation when they
    * are shallow near-dup clusters (fewer shuffles per round).
    *
    * Edges are kept directed large→small; each round is two
    * grouped-min + join passes, with lineage truncated per round.
    */
  def runStarContraction(edges: DataFrame, maxIter: Int = 30,
                         numPartitions: Option[Int] = None): DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .distinct()
    val cached = edges.select(col("src"), col("dst")).persist()
    val parts = numPartitions.getOrElse(derivePartitions(cached.count()))
    var e = canon(cached)
      .repartition(parts, col("src"))
      .localCheckpoint()
    cached.unpersist()
    def checksum(df: DataFrame): (Long, Long) = {
      // bit_xor is order-independent and cannot overflow under ANSI
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("src"), col("dst")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prev = checksum(e)
    var done = prev._1 == 0
    var i = 0
    while (!done && i < maxIter) {
      // large-star: every neighbor v > u attaches to m(u) = min(u, N(u))
      val sym = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      val mBig = sym.groupBy(col("src"))
        .agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))
      val ls = canon(sym.join(mBig, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionByName(mBig.select(col("src"), col("m").as("dst"))))
      // small-star on the directed form: all smaller neighbors (and u
      // itself) attach to the minimum
      val mSmall = ls.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val ss = canon(ls.join(mSmall, "src")
        .filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionByName(mSmall.select(col("src"), col("m").as("dst"))))
      // canon()'s distinct already hash-partitions the edge list; the
      // r20 per-round repartition(src) on top of it was one more full
      // exchange per iteration for no downstream requirement (the next
      // round's groupBys re-key regardless)
      e = ss.localCheckpoint()
      val cur = checksum(e)
      done = cur == prev
      prev = cur
      i += 1
    }
    require(done, s"star contraction not converged in $maxIter rounds")
    // fixpoint is a star forest: every edge points child → root
    e.select(col("src").as("node"), col("dst").as("component"))
      .unionByName(e.select(col("dst").as("node"), col("dst").as("component")))
      .distinct()
  }
}
