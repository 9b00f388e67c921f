package graft

import graft.functions.HilbertExpr

/** Hilbert index: the three properties that fully characterize the
  * curve — bijection onto [0, 4^bits), EXACT grid adjacency of every
  * consecutive pair (the locality guarantee Z-order lacks), and
  * inverse round-trip — checked exhaustively; plus SQL/codegen parity
  * and out-of-range rejection.
  */
class HilbertSpec extends SparkSpec {

  test("bijection and exhaustive adjacency at bits = 5 (1024 cells)") {
    val bits = 5
    val n = 1L << bits
    val cells = for (x <- 0L until n; y <- 0L until n)
      yield (x, y, HilbertExpr.index(x, y, bits))
    // bijection onto [0, 4^bits)
    assert(cells.map(_._3).sorted === (0L until n * n))
    // consecutive indices are grid-adjacent: |dx| + |dy| == 1, always
    val byD = cells.map(c => c._3 -> (c._1, c._2)).toMap
    (0L until n * n - 1).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"jump between d=$d ($x1,$y1) and ${d + 1} ($x2,$y2)")
    }
  }

  test("inverse round-trips at several orders") {
    for (bits <- Seq(1, 3, 7);
         d <- Seq(0L, 1L, 17L, (1L << (2 * bits)) - 1)
           if d < (1L << (2 * bits))) {
      val (x, y) = HilbertExpr.cell(d, bits)
      assert(HilbertExpr.index(x, y, bits) === d, s"bits=$bits d=$d")
    }
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 500) {
      val x = rnd.nextInt(1 << 10).toLong; val y = rnd.nextInt(1 << 10).toLong
      val (bx, by) = HilbertExpr.cell(HilbertExpr.index(x, y, 10), 10)
      assert((bx, by) === ((x, y)))
    }
  }

  test("out-of-range inputs throw; codegen path matches the kernel") {
    intercept[IllegalArgumentException] { HilbertExpr.index(32, 0, 5) }
    intercept[IllegalArgumentException] { HilbertExpr.index(0, -1, 5) }
    import spark.implicits._
    val df = (0 until 2000).map(i => ((i * 7) % 1024L, (i * 13) % 1024L))
      .toDF("x", "y")
    val got = df.select(HilbertExpr.hilbert($"x", $"y", 10).as("h"))
      .collect().map(_.getLong(0))
    val want = (0 until 2000)
      .map(i => HilbertExpr.index((i * 7) % 1024L, (i * 13) % 1024L, 10))
    assert(got.toSeq === want)
  }

  test("locality beats Z-order on range spans (the reason to offer it)") {
    // every UNALIGNED 4-run of Hilbert indices is a chain of adjacent
    // cells (span <= 3 by the adjacency theorem); Morton runs crossing
    // quadrant seams jump arbitrarily far
    val bits = 4
    var zWorse = 0
    for (d <- 0L until (1L << (2 * bits)) - 4) {
      val hCells = (d until d + 4).map(HilbertExpr.cell(_, bits))
      val hSpan = (hCells.map(_._1).max - hCells.map(_._1).min) +
        (hCells.map(_._2).max - hCells.map(_._2).min)
      assert(hSpan <= 3, s"hilbert 4-run at $d spans $hSpan")
      val zCells = (d until d + 4).map { zi =>
        // Morton inverse via bit de-interleave
        var x = 0L; var y = 0L
        for (b <- 0 until bits) {
          x |= ((zi >> (2 * b)) & 1L) << b
          y |= ((zi >> (2 * b + 1)) & 1L) << b
        }
        (x, y)
      }
      val zSpan = (zCells.map(_._1).max - zCells.map(_._1).min) +
        (zCells.map(_._2).max - zCells.map(_._2).min)
      if (zSpan > 3) zWorse += 1
    }
    assert(zWorse > 0, "expected some Morton runs to span wider boxes")
  }
}
