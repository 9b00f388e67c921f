package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrderExpr
import graft.ops.ZOrderCluster

/** Morton Z-order key + clustering layout: bit-level correctness
  * against a naive interleave, the quadrant-locality property the
  * data-skipping story rests on, SQL surface, and the range-clustered
  * layout (disjoint per-partition Z ranges, range exchange in the
  * plan). Cross-engine arithmetic parity is q113's oracle.
  */
class ZOrderSpec extends SparkSpec {

  private def naive(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits)
      z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    z
  }

  test("interleave matches the naive bit loop across widths") {
    val rnd = new scala.util.Random(9)
    for (bits <- Seq(1, 4, 10, 16, 31); _ <- 0 until 200) {
      val x = rnd.nextLong().abs % (1L << bits)
      val y = rnd.nextLong().abs % (1L << bits)
      assert(ZOrderExpr.interleave(x, y, bits) === naive(x, y, bits),
        s"bits=$bits x=$x y=$y")
    }
    // exhaustive at bits=4: the key is a bijection onto [0, 256)
    val all = for (x <- 0 until 16; y <- 0 until 16)
      yield ZOrderExpr.interleave(x, y, 4)
    assert(all.sorted === (0 until 256).map(_.toLong))
  }

  test("Z-prefix clusters are exact quadrants (the data-skipping " +
    "property)") {
    // bits=4, prefix = top 2 bits of each dim -> 16 clusters, each a
    // contiguous 4x4 tile in BOTH dimensions
    val rows = for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong, y.toLong, ZOrderExpr.interleave(x, y, 4))
    rows.groupBy(_._3 >> 4).foreach { case (_, tile) =>
      assert(tile.size === 16)
      val xs = tile.map(_._1); val ys = tile.map(_._2)
      assert(xs.max - xs.min === 3 && ys.max - ys.min === 3)
      // and the tile's Z range contains NO foreign keys (aligned tiles
      // are contiguous in Z, so min/max pruning has no false positives)
      val zs = tile.map(_._3)
      assert(zs.max - zs.min === 15)
    }
  }

  test("out-of-range inputs throw instead of folding into a wrong tile") {
    intercept[IllegalArgumentException] { ZOrderExpr.interleave(16, 0, 4) }
    intercept[IllegalArgumentException] { ZOrderExpr.interleave(0, -1, 4) }
  }

  test("SQL surface graft_zorder matches the Column API through codegen") {
    import spark.implicits._
    val df = (0 until 1000).map(i => ((i * 7) % 1024L, (i * 13) % 1024L))
      .toDF("x", "y")
    df.createOrReplaceTempView("graft_z_in")
    val viaSql = spark.sql(
      "SELECT graft_zorder(x, y, 10) AS z FROM graft_z_in ORDER BY z")
      .collect().map(_.getLong(0))
    val viaCol = df.select(ZOrderExpr.zorder($"x", $"y", 10).as("z"))
      .orderBy("z").collect().map(_.getLong(0))
    assert(viaSql.toSeq === viaCol.toSeq)
    assert(viaSql.toSeq ===
      (0 until 1000).map(i => naive((i * 7) % 1024L, (i * 13) % 1024L, 10))
        .sorted)
  }

  test("ZOrderCluster with curve=hilbert clusters by the Hilbert key " +
    "and rejects unknown curves") {
    import spark.implicits._
    val df = (0 until 500).map(i => ((i * 31) % 256L, (i * 17) % 256L))
      .toDF("x", "y")
    val clustered = ZOrderCluster.cluster(df, $"x", $"y", bits = 8,
      numPartitions = 4, curve = "hilbert")
    val keys = clustered.select("x", "y", "z")
      .as[(Long, Long, Long)].collect()
    keys.foreach { case (x, y, z) =>
      assert(z === graft.functions.HilbertExpr.index(x, y, 8))
    }
    intercept[IllegalArgumentException] {
      ZOrderCluster.cluster(df, $"x", $"y", 8, 4, curve = "peano")
    }
  }

  test("write + scanRange: manifest prunes files, pruned scan returns " +
    "exactly the rectangle rows") {
    import spark.implicits._
    val dir = Work.stableDir("zorder-skip-spec").resolve("layout").toString
    val df = (0 until 8000)
      .map(i => ((i * 31) % 256L, (i * 17) % 256L, i.toLong))
      .toDF("x", "y", "payload")
    ZOrderCluster.write(df, dir, $"x", $"y", bits = 8, numPartitions = 8)
    val manifest = ZOrderCluster.readManifest(spark, dir)
    assert(manifest.map(_.n).sum === 8000)
    // file ranges are pairwise disjoint (the layout contract pruning
    // rests on)
    val sorted = manifest.sortBy(_.zMin)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a.zMax < b.zMin)
      case _ => ()
    }
    // 64-aligned rectangle [64,127]x[64,127]: exact Morton cover
    val lo = ZOrderExpr.interleave(64, 64, 8)
    val hi = ZOrderExpr.interleave(127, 127, 8)
    val (scan, read, total) = ZOrderCluster.scanRange(spark, dir, lo, hi)
    assert(read > 0 && read < total, s"no pruning: $read of $total")
    // inputFiles of the pruned relation = the manifest hits, nothing more
    assert(scan.inputFiles.length === read)
    val got = scan.filter($"x".between(64, 127) && $"y".between(64, 127))
      .select("x", "y", "payload").as[(Long, Long, Long)].collect().toSet
    val want = (0 until 8000)
      .map(i => ((i * 31) % 256L, (i * 17) % 256L, i.toLong))
      .filter(t => t._1 >= 64 && t._1 <= 127 && t._2 >= 64 && t._2 <= 127)
      .toSet
    assert(got === want)
    // an empty key range prunes everything and returns an empty, schema-
    // intact relation
    val (none, r0, _) = ZOrderCluster.scanRange(spark, dir,
      Long.MaxValue - 1, Long.MaxValue)
    assert(r0 === 0 && none.count() === 0 &&
      none.columns.toSet === Set("x", "y", "payload", "z"))
  }

  test("scanRectangle: non-aligned rectangle prunes on BOTH curves, " +
    "multi-range cover beats the Morton corner interval") {
    import spark.implicits._
    val rows = (0 until 8000)
      .map(i => ((i * 31) % 256L, (i * 17) % 256L, i.toLong))
    val df = rows.toDF("x", "y", "payload")
    // [30,97]x[50,137] straddles the 64 and 128 boundaries on both axes
    val want = rows.filter(t =>
      t._1 >= 30 && t._1 <= 97 && t._2 >= 50 && t._2 <= 137).toSet
    for (curve <- Seq("zorder", "hilbert")) {
      val dir = Work.stableDir("curve-rect-spec").resolve(curve).toString
      ZOrderCluster.write(df, dir, $"x", $"y", bits = 8,
        numPartitions = 16, curve = curve)
      val (scan, read, total) = ZOrderCluster.scanRectangle(spark, dir,
        30, 97, 50, 137, bits = 8, curve = curve)
      assert(read > 0 && read < total, s"$curve: no pruning $read/$total")
      val got = scan.filter($"x".between(30, 97) && $"y".between(50, 137))
        .select("x", "y", "payload").as[(Long, Long, Long)].collect().toSet
      assert(got === want, curve)
      if (curve == "zorder") {
        // corner interval on the same layout reads at least as many files
        val lo = ZOrderExpr.interleave(30, 50, 8)
        val hi = ZOrderExpr.interleave(97, 137, 8)
        val (_, cornerRead, _) = ZOrderCluster.scanRange(spark, dir, lo, hi)
        assert(read <= cornerRead,
          s"multi-range cover read $read files, corner $cornerRead")
        // a rectangle fully outside the grid is an empty relation, not
        // an error (its cover is empty after clamping)
        val (none, r0, _) = ZOrderCluster.scanRectangle(spark, dir,
          300, 400, 0, 10, bits = 8)
        assert(r0 === 0 && none.count() === 0)
      }
    }
  }

  test("ZOrderCluster: range exchange in the plan, disjoint Z ranges " +
    "per partition, rows intact") {
    import spark.implicits._
    val df = (0 until 4000)
      .map(i => ((i * 31) % 512L, (i * 17) % 512L)).toDF("x", "y")
    val clustered = ZOrderCluster.cluster(df, $"x", $"y", bits = 9,
      numPartitions = 8)
    val plan = clustered.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"expected a range exchange in:\n$plan")
    val ranges = clustered.select("z").as[Long]
      .mapPartitions { it =>
        val s = it.toSeq
        if (s.isEmpty) Iterator.empty else Iterator((s.min, s.max, s.size))
      }.collect().sortBy(_._1)
    assert(ranges.map(_._3).sum === 4000)
    ranges.sliding(2).foreach {
      case Array((_, hi, _), (lo, _, _)) => assert(hi <= lo)
      case _ => ()
    }
  }
}
