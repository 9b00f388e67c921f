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
  * chains, the two-phase small-star/large-star scheme (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond") trades more work per
  * round for O(log n) rounds — same join shapes, drop-in replacement.
  * Lineage is truncated every round (localCheckpoint) so the plan does
  * not grow with the iteration count.
  */
object ConnectedComponents {

  /** @param edges undirected edge list with `src`/`dst` columns
    * @param numPartitions parallelism of the per-round shuffles — size
    *   to the EDGE volume, not the session default: a near-dup graph is
    *   orders of magnitude smaller than the corpus it came from, and
    *   each propagation round pays the partition count as fixed
    *   overhead times the round count
    * @return (node, component) — component = min node id reachable
    */
  def run(edges: DataFrame, maxIter: Int = 25,
          numPartitions: Int = 8): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().repartition(numPartitions, col("src")).persist()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
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
    require(changed == 0, s"label propagation not converged in $maxIter rounds")
    labels.withColumnRenamed("label", "component")
  }
}
