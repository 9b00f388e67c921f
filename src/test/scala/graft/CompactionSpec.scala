package graft

import org.apache.spark.sql.functions._
import graft.ops.Compaction

/** Next-fit compaction planner: bin-boundary arithmetic, the
  * contiguity invariant (each bin an unbroken run in layout order),
  * the oversized-file case, and the 2×-optimal fill property on
  * random manifests. q144 oracle-gates the plan cross-engine.
  */
class CompactionSpec extends SparkSpec {

  private def plan(sizes: Seq[Long], target: Long): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    val m = sizes.zipWithIndex.map { case (sz, i) => (i.toLong, sz) }
      .toDF("fid", "bytes")
    Compaction.planBins(m, col("bytes"), col("fid"), target)
      .select("fid", "bytes", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
  }

  test("exact-fit files split into consecutive bins at the boundary") {
    val p = plan(Seq(10L, 10L, 10L, 10L), target = 20)
    assert(p.map(_._3) === Seq(0L, 0L, 1L, 1L))
  }

  test("a file larger than the target occupies its own bin range") {
    val p = plan(Seq(5L, 100L, 5L), target = 20)
    // 100-byte file starts at cum 5 -> bin 0; next file starts at 105 -> bin 5
    assert(p.map(_._3) === Seq(0L, 0L, 5L))
  }

  test("bins are contiguous runs and fills bounded by target + max file") {
    val rnd = new scala.util.Random(11)
    val sizes = Seq.fill(300)(1L + rnd.nextInt(50))
    val target = 120L
    val p = plan(sizes, target)
    val byBin = p.groupBy(_._3)
    byBin.foreach { case (_, files) =>
      val fids = files.map(_._1)
      assert(fids.max - fids.min + 1 === files.size, "non-contiguous bin")
      // next-fit never overflows a bin by more than one file
      assert(files.map(_._2).sum <= target + sizes.max)
    }
    // and packing is not degenerate: at least half the ideal bin count
    // is the next-fit guarantee (<= 2x optimal bins)
    val ideal = math.ceil(sizes.sum.toDouble / target)
    assert(byBin.size <= 2 * ideal + 1)
  }

  test("non-positive target is rejected loudly") {
    import spark.implicits._
    val m = Seq((1L, 10L)).toDF("fid", "bytes")
    intercept[IllegalArgumentException] {
      Compaction.planBins(m, col("bytes"), col("fid"), 0L)
    }
  }
}
