package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.BloomIndex

/** Per-file Bloom index: the no-false-negative contract (every row of a
  * probed key is returned regardless of which files pruned), pruning
  * payoff on a layout where min/max stats are useless, multi-key
  * probes, and the empty-probe guard. q142 oracle-gates the arithmetic
  * cross-engine.
  */
class BloomIndexSpec extends SparkSpec {

  private def layout(n: Int, files: Int): (String, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    // key k scattered uniformly; sort order s = insertion order, so every
    // file's [min,max] over k spans ~the whole domain (range stats dead)
    val df = (0 until n).map { i => (i.toLong, (i.toLong * 2654435761L) % 1000L) }
      .toDF("s", "k")
    val path = Files.createTempDirectory("bloomidx").toString + "/t"
    BloomIndex.write(df, path, col("s"), "k", numPartitions = files,
      expectedPerFile = 4096)
    (path, df)
  }

  test("no false negatives: every row of every probed key survives pruning") {
    val (path, df) = layout(n = 5000, files = 8)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 20) {
      val key = rnd.nextInt(1000).toLong
      val (scan, read, total) = BloomIndex.scanKeys(spark, path, "k", Seq(key))
      val got = scan.select("s").collect().map(_.getLong(0)).sorted
      val want = df.filter(col("k") === key).select("s")
        .collect().map(_.getLong(0)).sorted
      assert(got.toSeq === want.toSeq, s"key=$key")
      assert(read <= total)
    }
  }

  test("prunes files for a sparse key on a bloom-friendly layout") {
    import spark.implicits._
    // each key confined to one file's worth of sort positions -> the
    // bloom should localize the probe to ~1 file of 8
    val df = (0 until 4000).map { i => (i.toLong, (i / 500).toLong) }
      .toDF("s", "k")
    val path = Files.createTempDirectory("bloomidx").toString + "/t"
    BloomIndex.write(df, path, col("s"), "k", numPartitions = 8,
      expectedPerFile = 4096)
    val (scan, read, total) = BloomIndex.scanKeys(spark, path, "k", Seq(3L))
    assert(total === 8)
    assert(read > 0 && read < total,
      s"expected pruning, read $read of $total")
    assert(scan.count() === 500)
  }

  test("multi-key probe unions the per-key file sets") {
    val (path, df) = layout(n = 5000, files = 8)
    val keys = Seq(1L, 500L, 999L)
    val (scan, _, _) = BloomIndex.scanKeys(spark, path, "k", keys)
    val want = df.filter(col("k").isin(keys: _*)).count()
    assert(scan.count() === want)
  }

  test("probe never moves bloom bytes to the driver: the collected " +
    "schema is (files_total, hit_files) only") {
    import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
    val (path, _) = layout(n = 2000, files = 4)
    val plan = BloomIndex.probePlan(
      BloomIndex.readIndex(spark, path), Seq(1L))
    // what reaches the driver is exactly one row of (bigint,
    // array<string>) — membership was evaluated in executors and the
    // bloomB64 column never appears in the probe's output schema
    assert(plan.schema.fieldNames.toSeq ===
      Seq("files_total", "hit_files"))
    assert(plan.schema("files_total").dataType === LongType)
    assert(plan.schema("hit_files").dataType ===
      ArrayType(StringType, containsNull = false) ||
      plan.schema("hit_files").dataType ===
      ArrayType(StringType, containsNull = true))
    assert(!plan.schema.fieldNames.contains("bloomB64"))
    assert(plan.count() === 1)
  }

  test("empty probe key list is rejected loudly") {
    val (path, _) = layout(n = 100, files = 2)
    intercept[IllegalArgumentException] {
      BloomIndex.scanKeys(spark, path, "k", Seq.empty)
    }
  }
}
