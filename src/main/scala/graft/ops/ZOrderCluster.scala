package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
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

  /** One manifest row per written file: its curve-key range + row count. */
  final case class FileRange(file: String, zMin: Long, zMax: Long, n: Long)

  /** Write the clustered layout AND its data-skipping manifest — the
    * Iceberg/Delta story without their table format: parquet files laid
    * out by [[cluster]] (each file one contiguous key range), plus
    * `<path>_manifest` recording every file's min/max key. A key-range
    * scan then opens the manifest (one tiny file, driver-side) and reads
    * ONLY intersecting data files — at 100 TB that is the difference
    * between listing+scanning every object and touching the handful a
    * query rectangle maps to.
    *
    * The manifest is derived by re-aggregating the written files
    * (`input_file_name` groupBy) rather than trusted from the writer's
    * task-side ranges: what's recorded is what a reader will actually
    * observe per file, whatever the committer renamed.
    */
  def write(df: DataFrame, path: String, x: Column, y: Column, bits: Int,
            numPartitions: Int, curve: String = "zorder"): Unit = {
    val spark = df.sparkSession
    cluster(df, x, y, bits, numPartitions, curve)
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min("z").as("zMin"), max("z").as("zMax"), count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode("overwrite").json(path + "_manifest")
  }

  def readManifest(spark: SparkSession, path: String): Seq[FileRange] =
    spark.read.json(path + "_manifest").collect().map { r =>
      FileRange(r.getAs[String]("file"), r.getAs[Long]("zMin"),
        r.getAs[Long]("zMax"), r.getAs[Long]("n"))
    }.toSeq

  /** Key-range scan with file skipping: manifest-prune to the files
    * whose [zMin, zMax] intersects [lo, hi], read only those, keep the
    * key predicate as the residual (file ranges overlap the query range;
    * they don't equal it). Returns the pruned relation plus
    * (filesRead, filesTotal) so callers can ASSERT the skipping payoff
    * instead of taking it on faith.
    *
    * For a query rectangle under the Morton curve, [lo, hi] =
    * [zorder(xmin,ymin), zorder(xmax,ymax)] is a correct cover: the
    * interleave is monotone in each dimension, so every point of the
    * rectangle keys inside the corner interval (with false positives the
    * residual x/y predicate removes). But for NON-ALIGNED rectangles the
    * corner interval is loose (the corners can differ in a high
    * interleaved bit and the interval then spans most of the key space),
    * and Hilbert keys admit no corner interval at all — use
    * [[scanRectangle]] for both: it prunes through a
    * [[CurveCover]] multi-interval decomposition instead.
    */
  def scanRange(spark: SparkSession, path: String, lo: Long, hi: Long)
      : (DataFrame, Int, Int) =
    scanRanges(spark, path, Seq((lo, hi)))

  /** [[scanRange]] over a pre-computed multi-interval cover: read the
    * files whose [zMin, zMax] intersects ANY interval, with the
    * OR-of-BETWEEN key predicate as the residual. Intervals should come
    * from [[CurveCover.cover]] (sorted, disjoint, bounded count — the
    * predicate stays codegen-friendly).
    */
  def scanRanges(spark: SparkSession, path: String,
                 ranges: Seq[(Long, Long)]): (DataFrame, Int, Int) = {
    val manifest = readManifest(spark, path)
    // an empty cover (a rectangle/box entirely outside the grid after
    // clamping) matches nothing — like any other predicate, that is an
    // empty relation, not an error
    if (ranges.isEmpty)
      return (spark.read.parquet(path).limit(0), 0, manifest.length)
    val hit = manifest.filter(f =>
      ranges.exists { case (lo, hi) => f.zMax >= lo && f.zMin <= hi })
    val df =
      if (hit.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(hit.map(_.file): _*)
    val pred = ranges.map { case (lo, hi) => col("z").between(lo, hi) }
      .reduce(_ || _)
    (df.filter(pred), hit.length, manifest.length)
  }

  /** 3-D Morton clustering: `z = graft_zorder3(x, y, t, bits)`, range-
    * partitioned and sorted like [[cluster]] — the (time, y, x) layout
    * of a forecast archive, where per-file stats must prune both
    * "recent window, whole domain" and "full history, one tile"
    * queries.
    */
  def cluster3(df: DataFrame, x: Column, y: Column, t: Column,
               bits: Int, numPartitions: Int,
               curve: String = "zorder"): DataFrame = {
    require(!df.columns.contains("z"),
      "input already has a 'z' column — rename it before clustering, or " +
        "the curve key would silently overwrite it")
    val key = curve match {
      case "zorder" => graft.functions.ZOrder3Expr.zorder3(x, y, t, bits)
      case "hilbert" => graft.functions.Hilbert3Expr.hilbert3(x, y, t, bits)
      case other => throw new IllegalArgumentException(
        s"unknown clustering curve '$other' (zorder/hilbert)")
    }
    df.withColumn("z", key)
      .repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions("z")
  }

  /** [[write]] for the 3-D key: same manifest contract, so
    * [[scanRanges]]/[[scanBox3]] prune it identically.
    */
  def write3(df: DataFrame, path: String, x: Column, y: Column, t: Column,
             bits: Int, numPartitions: Int,
             curve: String = "zorder"): Unit = {
    val spark = df.sparkSession
    cluster3(df, x, y, t, bits, numPartitions, curve)
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min("z").as("zMin"), max("z").as("zMax"), count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode("overwrite").json(path + "_manifest")
  }

  /** Box scan over a [[write3]] layout through [[CurveCover.cover3]]'s
    * octree multi-interval decomposition; caller applies the residual
    * x/y/t predicate.
    */
  def scanBox3(spark: SparkSession, path: String,
               xmin: Long, xmax: Long, ymin: Long, ymax: Long,
               tmin: Long, tmax: Long, bits: Int,
               maxRanges: Int = 64,
               curve: String = "zorder"): (DataFrame, Int, Int) =
    scanRanges(spark, path,
      CurveCover.cover3(xmin, xmax, ymin, ymax, tmin, tmax, bits,
        maxRanges, curve))

  /** Rectangle scan over a clustered layout on EITHER curve: decompose
    * the (inclusive, cell-coordinate) rectangle into at most `maxRanges`
    * contiguous key intervals via [[CurveCover]], manifest-prune to the
    * intersecting files, and keep the interval predicate as the
    * residual. The caller still applies its own x/y predicate — the
    * cover is exact on cells only when the budget allows; capped covers
    * and file granularity both leave false-positive rows.
    */
  def scanRectangle(spark: SparkSession, path: String,
                    xmin: Long, xmax: Long, ymin: Long, ymax: Long,
                    bits: Int, curve: String = "zorder",
                    maxRanges: Int = 64): (DataFrame, Int, Int) =
    scanRanges(spark, path,
      CurveCover.cover(xmin, xmax, ymin, ymax, bits, curve, maxRanges))
}
