package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import graft.functions.{HilbertExpr, ZOrderExpr}

/** Z-order table clustering — the write-side layout operator the
  * [[graft.functions.ZOrderExpr]] key exists for: range-partition by
  * the Morton key and sort within partitions, so each output file
  * covers one contiguous Z range = one spatial tile, and BOTH
  * dimensions' min/max file statistics become selective at scan time.
  *
  * Scale shape: `repartitionByRange` samples the key (reservoir per
  * partition, driver merges ~`numPartitions * 100` samples — constant
  * per partition, not data-sized) to build balanced range bounds, then
  * one exchange + local sort. No global sort, no driver collect of
  * data rows. This matches Delta/Iceberg OPTIMIZE ZORDER's layout
  * contract without their table-format machinery.
  */
object ZOrderCluster {

  /** Add a `z` curve-key column over the two quantized dimension
    * columns and cluster into `numPartitions` key ranges. `curve` is
    * "zorder" (Morton) or "hilbert" — Hilbert's strict adjacency makes
    * each file's key range a tighter spatial region at the cost of a
    * slightly heavier key computation (see [[graft.functions
    * .HilbertExpr]]).
    */
  def cluster(df: DataFrame, x: Column, y: Column, bits: Int,
              numPartitions: Int, curve: String = "zorder"): DataFrame = {
    val key = curve match {
      case "zorder" => ZOrderExpr.zorder(x, y, bits)
      case "hilbert" => HilbertExpr.hilbert(x, y, bits)
      case other => throw new IllegalArgumentException(
        s"unknown clustering curve '$other' (zorder/hilbert)")
    }
    require(!df.columns.contains("z"),
      "input already has a 'z' column — rename it before clustering, or " +
        "the curve key would silently overwrite it")
    df.withColumn("z", key)
      .repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions("z")
  }
}
