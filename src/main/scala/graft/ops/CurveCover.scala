package graft.ops

import scala.collection.mutable.ArrayBuffer

import graft.functions.{Hilbert3Expr, HilbertExpr, ZOrder3Expr, ZOrderExpr}

/** Multi-interval space-filling-curve covers for rectangle queries —
  * the tight form of what a single Morton corner interval
  * [z(xmin,ymin), z(xmax,ymax)] only approximates. A non-aligned
  * rectangle's corner interval can span most of the key space (its two
  * corners differ in a high interleaved bit), defeating manifest
  * pruning entirely; and Hilbert keys admit NO corner interval at all.
  * This object produces a bounded list of contiguous index intervals
  * whose union covers exactly the rectangle's cells (tightly when the
  * budget allows, loosely-but-correctly when capped).
  *
  * Construction: quadtree descent. Every ALIGNED 2^k × 2^k block is a
  * contiguous run of 4^k consecutive indices on BOTH curves — Morton by
  * the interleave construction, Hilbert because the curve fills each
  * quadrant completely before leaving it — so a block fully inside the
  * rectangle contributes one interval [base, base + 4^k), with
  * base = align-down(index(corner)). Blocks disjoint from the
  * rectangle are dropped; straddling blocks recurse. The descent is
  * breadth-first under a `maxRanges` budget: when splitting the
  * frontier would exceed it, the remaining straddlers emit their FULL
  * block intervals — a correct, monotonically-loosening cover (this
  * generalizes the classic BIGMIN/LITMAX Z-range splitting of Tropf &
  * Herzog 1981 to both curves, with an explicit interval budget
  * instead of a per-gap jump computation).
  *
  * Intervals are returned sorted, disjoint, and merged (adjacent runs
  * coalesce), so callers can build an OR-of-BETWEEN residual predicate
  * whose size is bounded by `maxRanges` — codegen-friendly at any
  * scale. At 100 TB the cover computation is pure driver arithmetic:
  * O(maxRanges · bits) cells visited, no data touched.
  */
object CurveCover {

  /** Inclusive index intervals covering [xmin,xmax]×[ymin,ymax] (cell
    * coordinates, inclusive) on the order-`bits` curve. Empty iff the
    * rectangle is empty after clamping to the [0, 2^bits) grid.
    *
    * @param curve "zorder" (Morton) or "hilbert"
    * @param maxRanges interval budget ≥ 1; the cover is exact when the
    *   rectangle decomposes into at most this many aligned runs, and a
    *   correct superset otherwise
    */
  def cover(xmin: Long, xmax: Long, ymin: Long, ymax: Long, bits: Int,
            curve: String, maxRanges: Int = 64): Seq[(Long, Long)] = {
    require(bits >= 1 && bits <= 31, s"bits $bits (1..31)")
    require(maxRanges >= 1, s"maxRanges $maxRanges")
    val lim = 1L << bits
    val x0 = math.max(0L, xmin); val x1 = math.min(lim - 1, xmax)
    val y0 = math.max(0L, ymin); val y1 = math.min(lim - 1, ymax)
    if (x0 > x1 || y0 > y1) return Nil

    val idx: (Long, Long) => Long = curve match {
      case "zorder" => (x, y) => ZOrderExpr.interleave(x, y, bits)
      case "hilbert" => (x, y) => HilbertExpr.index(x, y, bits)
      case other => throw new IllegalArgumentException(
        s"unknown curve '$other' (zorder/hilbert)")
    }
    // contiguous index run of the aligned 2^k block whose corner is (cx, cy)
    def blockInterval(cx: Long, cy: Long, k: Int): (Long, Long) = {
      val area = 1L << (2 * k)
      val base = (idx(cx, cy) / area) * area
      (base, base + area - 1)
    }

    val out = ArrayBuffer.empty[(Long, Long)]
    // frontier of straddling blocks, all at the same level
    var frontier = List((0L, 0L, bits))
    var k = bits
    while (frontier.nonEmpty) {
      // would splitting every straddler exceed the budget? then emit
      // the straddlers' full blocks as the loose (but correct) remainder
      if (out.size + frontier.size * 4 > maxRanges || k == 0) {
        frontier.foreach { case (cx, cy, kk) =>
          out += blockInterval(cx, cy, kk) }
        frontier = Nil
      } else {
        val next = List.newBuilder[(Long, Long, Int)]
        val half = 1L << (k - 1)
        frontier.foreach { case (cx, cy, _) =>
          var qi = 0
          while (qi < 4) {
            val bx = cx + (if ((qi & 1) != 0) half else 0L)
            val by = cy + (if ((qi & 2) != 0) half else 0L)
            val ex = bx + half - 1; val ey = by + half - 1
            val disjoint = ex < x0 || bx > x1 || ey < y0 || by > y1
            if (!disjoint) {
              val contained = bx >= x0 && ex <= x1 && by >= y0 && ey <= y1
              if (contained) out += blockInterval(bx, by, k - 1)
              else next += ((bx, by, k - 1))
            }
            qi += 1
          }
        }
        frontier = next.result()
        k -= 1
      }
    }
    merge(out.toSeq)
  }

  /** 3-D analogue of [[cover]]: inclusive index intervals covering the
    * BOX [xmin,xmax]×[ymin,ymax]×[tmin,tmax] by octree descent — every
    * aligned 2^k cube is a contiguous run of 8^k consecutive indices
    * on BOTH 3-D curves (Morton by construction, Hilbert by octant
    * contiguity, verified exhaustively in Hilbert3Spec), so the same
    * contained-emit / straddle-recurse / budget-flush scheme applies
    * with eight children per split. `curve` is "zorder"
    * ([[graft.functions.ZOrder3Expr]]) or "hilbert"
    * ([[graft.functions.Hilbert3Expr]]).
    */
  def cover3(xmin: Long, xmax: Long, ymin: Long, ymax: Long,
             tmin: Long, tmax: Long, bits: Int,
             maxRanges: Int = 64,
             curve: String = "zorder"): Seq[(Long, Long)] = {
    require(bits >= 1 && bits <= 21, s"bits $bits (1..21)")
    require(maxRanges >= 1, s"maxRanges $maxRanges")
    val lim = 1L << bits
    val x0 = math.max(0L, xmin); val x1 = math.min(lim - 1, xmax)
    val y0 = math.max(0L, ymin); val y1 = math.min(lim - 1, ymax)
    val t0 = math.max(0L, tmin); val t1 = math.min(lim - 1, tmax)
    if (x0 > x1 || y0 > y1 || t0 > t1) return Nil

    val idx: (Long, Long, Long) => Long = curve match {
      case "zorder" => ZOrder3Expr.interleave3(_, _, _, bits)
      case "hilbert" => Hilbert3Expr.index(_, _, _, bits)
      case other => throw new IllegalArgumentException(
        s"unknown curve '$other' (zorder/hilbert)")
    }
    def blockInterval(cx: Long, cy: Long, ct: Long, k: Int): (Long, Long) = {
      val area = 1L << (3 * k)
      val base = (idx(cx, cy, ct) / area) * area
      (base, base + area - 1)
    }

    val out = ArrayBuffer.empty[(Long, Long)]
    var frontier = List((0L, 0L, 0L, bits))
    var k = bits
    while (frontier.nonEmpty) {
      if (out.size + frontier.size * 8 > maxRanges || k == 0) {
        frontier.foreach { case (cx, cy, ct, kk) =>
          out += blockInterval(cx, cy, ct, kk) }
        frontier = Nil
      } else {
        val next = List.newBuilder[(Long, Long, Long, Int)]
        val half = 1L << (k - 1)
        frontier.foreach { case (cx, cy, ct, _) =>
          var qi = 0
          while (qi < 8) {
            val bx = cx + (if ((qi & 1) != 0) half else 0L)
            val by = cy + (if ((qi & 2) != 0) half else 0L)
            val bt = ct + (if ((qi & 4) != 0) half else 0L)
            val ex = bx + half - 1; val ey = by + half - 1
            val et = bt + half - 1
            val disjoint = ex < x0 || bx > x1 || ey < y0 || by > y1 ||
              et < t0 || bt > t1
            if (!disjoint) {
              val contained = bx >= x0 && ex <= x1 && by >= y0 &&
                ey <= y1 && bt >= t0 && et <= t1
              if (contained) out += blockInterval(bx, by, bt, k - 1)
              else next += ((bx, by, bt, k - 1))
            }
            qi += 1
          }
        }
        frontier = next.result()
        k -= 1
      }
    }
    merge(out.toSeq)
  }

  /** Sort + coalesce touching/overlapping inclusive intervals. */
  def merge(ranges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    if (ranges.isEmpty) return Nil
    val sorted = ranges.sortBy(_._1)
    val out = ArrayBuffer(sorted.head)
    sorted.tail.foreach { case (a, b) =>
      val (pa, pb) = out.last
      if (a <= pb + 1) out(out.size - 1) = (pa, math.max(pb, b))
      else out += ((a, b))
    }
    out.toSeq
  }
}
