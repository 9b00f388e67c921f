package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HilbertExpr, ZOrderExpr}
import graft.ops.CurveCover

/** Multi-interval curve covers. The ground truth is brute force: the
  * exact index set of a rectangle's cells is enumerable at small bit
  * widths, so the spec checks the cover's union against it cell-for-
  * cell — exact (set equality) with an ample budget, superset + budget
  * respected when capped. Both curves, exhaustive rectangle sweeps.
  */
class CurveCoverSpec extends AnyFunSuite {

  private def exact(xmin: Long, xmax: Long, ymin: Long, ymax: Long,
                    bits: Int, curve: String): Set[Long] = {
    val idx: (Long, Long) => Long = curve match {
      case "zorder" => ZOrderExpr.interleave(_, _, bits)
      case "hilbert" => HilbertExpr.index(_, _, bits)
    }
    (for (x <- xmin to xmax; y <- ymin to ymax) yield idx(x, y)).toSet
  }

  private def union(ranges: Seq[(Long, Long)]): Set[Long] =
    ranges.flatMap { case (a, b) => a to b }.toSet

  test("unbudgeted covers are EXACT for every rectangle at bits=3, " +
    "both curves") {
    val n = 8
    for (curve <- Seq("zorder", "hilbert");
         x0 <- 0 until n; x1 <- x0 until n;
         y0 <- 0 until n; y1 <- y0 until n) {
      val c = CurveCover.cover(x0, x1, y0, y1, 3, curve, maxRanges = 10000)
      val got = union(c)
      val want = exact(x0, x1, y0, y1, 3, curve)
      assert(got === want, s"$curve [$x0,$x1]x[$y0,$y1]")
      // sorted + disjoint + merged
      c.sliding(2).foreach {
        case Seq((_, b1), (a2, _)) => assert(a2 > b1 + 1)
        case _ =>
      }
    }
  }

  test("random rectangles at bits=5: exact when unbudgeted, correct " +
    "superset within budget when capped") {
    val rnd = new scala.util.Random(23)
    for (curve <- Seq("zorder", "hilbert"); _ <- 0 until 60) {
      val xs = Seq.fill(2)(rnd.nextInt(32).toLong).sorted
      val ys = Seq.fill(2)(rnd.nextInt(32).toLong).sorted
      val want = exact(xs(0), xs(1), ys(0), ys(1), 5, curve)
      val full = CurveCover.cover(xs(0), xs(1), ys(0), ys(1), 5, curve,
        maxRanges = 100000)
      assert(union(full) === want, s"$curve exact $xs $ys")
      for (budget <- Seq(1, 4, 8, 16)) {
        val capped = CurveCover.cover(xs(0), xs(1), ys(0), ys(1), 5, curve,
          budget)
        assert(capped.size <= budget, s"$curve budget=$budget size")
        assert(want.subsetOf(union(capped)), s"$curve budget=$budget cover")
      }
    }
  }

  test("an aligned block is a single exact interval on both curves; on " +
    "Morton it equals the corner interval") {
    val z = CurveCover.cover(128, 191, 128, 191, 10, "zorder")
    assert(z === Seq((ZOrderExpr.interleave(128, 128, 10),
      ZOrderExpr.interleave(191, 191, 10))))
    val h = CurveCover.cover(128, 191, 128, 191, 10, "hilbert")
    assert(h.size === 1)
    assert(h.head._2 - h.head._1 + 1 === 64L * 64L)
  }

  test("a non-aligned rectangle's multi-range cover is far tighter than " +
    "the Morton corner interval") {
    // [100,300]x[50,137] over a 1024 grid: corners straddle the x=256
    // and y=128 power-of-two boundaries, so the corner interval spans a
    // huge stretch of key space the rectangle never touches
    val corner = ZOrderExpr.interleave(300, 137, 10) -
      ZOrderExpr.interleave(100, 50, 10) + 1
    val c = CurveCover.cover(100, 300, 50, 137, 10, "zorder")
    val covered = c.map { case (a, b) => b - a + 1 }.sum
    // rectangle area 201×88 = 17,688 cells; the 64-interval cover stays
    // within ~1.6× of it while the corner interval is ~5.2× the area
    assert(covered < corner / 3,
      s"cover $covered keys vs corner interval $corner")
    assert(covered >= 201L * 88L)
    // a larger budget tightens monotonically toward the area
    val c256 = CurveCover.cover(100, 300, 50, 137, 10, "zorder",
      maxRanges = 256)
    val covered256 = c256.map { case (a, b) => b - a + 1 }.sum
    assert(covered256 <= covered)
    // and it still contains every rectangle cell (spot rows)
    for (x <- Seq(100L, 256L, 300L); y <- Seq(50L, 128L, 137L)) {
      val k = ZOrderExpr.interleave(x, y, 10)
      assert(c.exists { case (a, b) => k >= a && k <= b }, s"($x,$y)")
    }
  }

  test("degenerate and clamped rectangles") {
    // single cell
    for (curve <- Seq("zorder", "hilbert")) {
      val c = CurveCover.cover(5, 5, 9, 9, 4, curve)
      assert(c.size === 1 && c.head._1 === c.head._2)
      assert(union(c) === exact(5, 5, 9, 9, 4, curve))
    }
    // out-of-grid clamps; fully outside is empty
    assert(CurveCover.cover(-3, 2, -1, 1, 3, "zorder") ===
      CurveCover.cover(0, 2, 0, 1, 3, "zorder"))
    assert(CurveCover.cover(9, 20, 0, 7, 3, "zorder") === Nil)
    // whole grid collapses to one interval
    assert(CurveCover.cover(0, 7, 0, 7, 3, "hilbert") === Seq((0L, 63L)))
  }

  test("3-D: spread3/interleave3 match a naive bit loop") {
    def naive(x: Long, y: Long, t: Long, bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits) {
        z |= ((x >> i) & 1L) << (3 * i)
        z |= ((y >> i) & 1L) << (3 * i + 1)
        z |= ((t >> i) & 1L) << (3 * i + 2)
      }
      z
    }
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 300) {
      val bits = 1 + rnd.nextInt(21)
      val lim = 1L << bits
      val (x, y, t) = (rnd.nextLong().abs % lim, rnd.nextLong().abs % lim,
        rnd.nextLong().abs % lim)
      assert(graft.functions.ZOrder3Expr.interleave3(x, y, t, bits) ===
        naive(x, y, t, bits), s"($x,$y,$t) bits=$bits")
    }
    intercept[IllegalArgumentException] {
      graft.functions.ZOrder3Expr.interleave3(4, 0, 0, 2)
    }
  }

  test("3-D: unbudgeted octree covers are EXACT for every box at " +
    "bits=2, and for random boxes at bits=4 — BOTH curves") {
    def idx3(curve: String, bits: Int): (Long, Long, Long) => Long =
      curve match {
        case "zorder" => graft.functions.ZOrder3Expr.interleave3(_, _, _, bits)
        case "hilbert" => graft.functions.Hilbert3Expr.index(_, _, _, bits)
      }
    def exact3(curve: String, xr: (Long, Long), yr: (Long, Long),
               tr: (Long, Long), bits: Int): Set[Long] =
      (for (x <- xr._1 to xr._2; y <- yr._1 to yr._2; t <- tr._1 to tr._2)
        yield idx3(curve, bits)(x, y, t)).toSet
    val n = 4
    for (curve <- Seq("zorder", "hilbert");
         x0 <- 0 until n; x1 <- x0 until n;
         y0 <- 0 until n; y1 <- y0 until n;
         t0 <- 0 until n; t1 <- t0 until n) {
      val c = CurveCover.cover3(x0, x1, y0, y1, t0, t1, 2,
        maxRanges = 100000, curve = curve)
      assert(union(c) === exact3(curve, (x0, x1), (y0, y1), (t0, t1), 2),
        s"$curve [$x0,$x1]x[$y0,$y1]x[$t0,$t1]")
    }
    val rnd = new scala.util.Random(29)
    for (curve <- Seq("zorder", "hilbert"); _ <- 0 until 25) {
      val xs = Seq.fill(2)(rnd.nextInt(16).toLong).sorted
      val ys = Seq.fill(2)(rnd.nextInt(16).toLong).sorted
      val ts = Seq.fill(2)(rnd.nextInt(16).toLong).sorted
      val want = exact3(curve, (xs(0), xs(1)), (ys(0), ys(1)),
        (ts(0), ts(1)), 4)
      val full = CurveCover.cover3(xs(0), xs(1), ys(0), ys(1), ts(0), ts(1),
        4, maxRanges = 1000000, curve = curve)
      assert(union(full) === want, s"$curve $xs $ys $ts")
      for (budget <- Seq(1, 8, 32)) {
        val capped = CurveCover.cover3(xs(0), xs(1), ys(0), ys(1),
          ts(0), ts(1), 4, budget, curve = curve)
        assert(capped.size <= budget, s"$curve budget=$budget")
        assert(want.subsetOf(union(capped)), s"$curve budget=$budget cover")
      }
    }
  }

  test("merge coalesces touching and overlapping runs") {
    assert(CurveCover.merge(Seq((5L, 9L), (0L, 4L), (12L, 14L), (8L, 11L)))
      === Seq((0L, 14L)))
    assert(CurveCover.merge(Seq((0L, 1L), (3L, 4L))) ===
      Seq((0L, 1L), (3L, 4L)))
    assert(CurveCover.merge(Nil) === Nil)
  }
}
