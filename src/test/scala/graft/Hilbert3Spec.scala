package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Hilbert3Expr

/** 3-D Hilbert index (Skilling transpose construction). The curve's
  * defining properties are complete self-checks, all verified
  * exhaustively at small orders:
  *  - bijection on the cube,
  *  - adjacency: consecutive indices differ by ONE step on ONE axis,
  *  - octant contiguity: every aligned sub-cube is one contiguous
  *    index run (what CurveCover.cover3 needs to treat blocks as
  *    intervals).
  */
class Hilbert3Spec extends AnyFunSuite {

  test("bijection + inverse round-trip at bits = 1, 2, 3") {
    for (bits <- 1 to 3) {
      val lim = 1L << bits
      val seen = scala.collection.mutable.Set[Long]()
      for (x <- 0L until lim; y <- 0L until lim; t <- 0L until lim) {
        val d = Hilbert3Expr.index(x, y, t, bits)
        assert(d >= 0 && d < lim * lim * lim, s"range ($x,$y,$t)")
        assert(seen.add(d), s"collision at ($x,$y,$t) bits=$bits")
        assert(Hilbert3Expr.inverse(d, bits) === ((x, y, t)),
          s"inverse ($x,$y,$t) bits=$bits")
      }
      assert(seen.size === (lim * lim * lim).toInt)
    }
  }

  test("adjacency: consecutive indices are one grid step apart " +
    "(exhaustive at bits = 1..4)") {
    for (bits <- 1 to 4) {
      val n = 1L << (3 * bits)
      var prev = Hilbert3Expr.inverse(0, bits)
      var d = 1L
      while (d < n) {
        val cur = Hilbert3Expr.inverse(d, bits)
        val dist = math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2) +
          math.abs(cur._3 - prev._3)
        assert(dist === 1, s"bits=$bits d=$d: $prev -> $cur")
        prev = cur
        d += 1
      }
    }
  }

  test("octant contiguity: every aligned sub-cube is a contiguous " +
    "index run (exhaustive at bits = 3)") {
    val bits = 3
    for (k <- 1 until bits) {
      val step = 1L << k
      val area = 1L << (3 * k)
      for (cx <- 0L until (1L << bits) by step;
           cy <- 0L until (1L << bits) by step;
           ct <- 0L until (1L << bits) by step) {
        val idxs = for (x <- cx until cx + step; y <- cy until cy + step;
                        t <- ct until ct + step)
          yield Hilbert3Expr.index(x, y, t, bits)
        assert(idxs.max - idxs.min + 1 === area,
          s"block ($cx,$cy,$ct) size $step not contiguous")
        assert(idxs.min % area === 0,
          s"block ($cx,$cy,$ct) not aligned to $area")
      }
    }
  }

  test("out-of-range inputs throw") {
    intercept[IllegalArgumentException] {
      Hilbert3Expr.index(8, 0, 0, 3)
    }
    intercept[IllegalArgumentException] {
      Hilbert3Expr.index(0, -1, 0, 3)
    }
  }
}
