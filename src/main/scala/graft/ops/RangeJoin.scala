package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range (interval) join: pair every point with every interval
  * satisfying `start <= point < end`, WITHOUT an equality key.
  *
  * Spark plans a keyless range predicate as BroadcastNestedLoopJoin —
  * O(|points| × |intervals|) comparisons, which dies when the interval
  * side outgrows a broadcast. Binning restores an equi-join: every
  * interval is exploded onto the fixed-width bins it overlaps, every
  * point maps to exactly ONE bin, and the join runs hash-partitioned on
  * the bin with the range check as a residual filter. A point meets an
  * interval in exactly one bin (the point's own), so no dedup pass is
  * needed. Shuffle volume is |points| + |intervals| × avg-bins-per-
  * interval, both hash-partitioned — the layout that survives 100 TB.
  * AQE still broadcasts the exploded interval side when it is small, so
  * the operator degrades gracefully to the nested-loop-free broadcast
  * plan at low interval counts.
  *
  * `binWidth` is in the native units of the bound columns (e.g. epoch
  * days for date intervals) and should be of the order of the typical
  * interval length: too small multiplies the interval explode, too large
  * widens the residual filter's false-candidate band.
  */
object RangeJoin {

  /** @param points     side with a scalar column `pointCol`
    * @param intervals  side with `startCol` (inclusive) and `endCol`
    *                   (exclusive) columns of the same numeric scale
    * @param toBin      maps a bound/point Column to a numeric bin axis
    *                   (e.g. `unix_date` for dates); monotonic
    * @param binWidth   bin width on the `toBin` axis
    */
  def binned(points: DataFrame, intervals: DataFrame, pointCol: String,
             startCol: String, endCol: String, toBin: Column => Column,
             binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val p = points.withColumn("_bin", floor(toBin(col(pointCol)) / binWidth))
    // every bin index the interval [start, end) touches; end exclusive,
    // but an interval ending exactly on a bin edge still owns that bin's
    // first instant's predecessor — floor((end*scale)-epsilon) is
    // floor-on-long here because toBin yields integral values
    val iv = intervals
      .withColumn("_b0", floor(toBin(col(startCol)) / binWidth))
      .withColumn("_b1", floor(toBin(col(endCol)) / binWidth))
      .withColumn("_bin", explode(sequence(col("_b0"), col("_b1"))))
      .drop("_b0", "_b1")
    p.join(iv, Seq("_bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bin")
  }
}
