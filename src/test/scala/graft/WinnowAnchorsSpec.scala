package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.WinnowAnchorsExpr

/** Winnowing anchor selection. Pinned two ways: against an O(n·w)
  * brute-force re-implementation of the same selection rule (catches
  * deque bugs), and against the winnowing GUARANTEE itself — any two
  * strings sharing a run of ≥ w+k−1 chars must share an anchor gram
  * (catches selection rules that are deterministic but not
  * content-local).
  */
class WinnowAnchorsSpec extends AnyFunSuite {

  private def anchors(s: String, k: Int, w: Int): Set[String] = {
    val a = WinnowAnchorsExpr.anchors(UTF8String.fromString(s), k, w)
    (0 until a.numElements())
      .map(i => new String(a.getBinary(i), "UTF-8")).toSet
  }

  /** Brute selection: same hash, same (h, -pos) windowed-min rule. */
  private def bruteAnchors(s: String, k: Int, w: Int): Set[String] = {
    val bytes = s.getBytes("UTF-8")
    val n = bytes.length - k + 1
    if (n <= 0) return Set.empty
    val M = 0x9E3779B97F4A7C15L
    val h = Array.tabulate(n) { i =>
      var acc = 0L
      for (j <- 0 until k) acc = acc * M + (bytes(i + j) & 0xFF)
      acc
    }
    def better(a: Int, b: Int): Boolean = { // is a strictly better than b
      val c = java.lang.Long.compareUnsigned(h(a), h(b))
      c < 0 || (c == 0 && a > b)
    }
    val sel = scala.collection.mutable.Set[Int]()
    if (n < w) {
      sel += (0 until n).reduce((a, b) => if (better(b, a)) b else a)
    } else {
      for (end <- w - 1 until n) {
        val win = (end - w + 1) to end
        sel += win.reduce((a, b) => if (better(b, a)) b else a)
      }
    }
    sel.map(i => new String(bytes, i, k, "UTF-8")).toSet
  }

  test("native deque selection equals the brute windowed-min rule on " +
    "random strings") {
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 120) {
      val len = 1 + rnd.nextInt(300)
      // small alphabet forces repeated grams → exercises hash ties
      val s = Array.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString
      for ((k, w) <- Seq((4, 5), (8, 12), (16, 25))) {
        assert(anchors(s, k, w) === bruteAnchors(s, k, w),
          s"trial=$trial k=$k w=$w len=$len")
      }
    }
  }

  test("the winnowing guarantee: a shared run of >= w+k-1 chars shares " +
    "an anchor") {
    val rnd = new scala.util.Random(47)
    val k = 16; val w = 25; val t = w + k - 1 // = 40
    for (trial <- 0 until 200) {
      def randStr(n: Int) =
        Array.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
      val shared = randStr(t + rnd.nextInt(30))
      val a = randStr(rnd.nextInt(200)) + shared + randStr(rnd.nextInt(200))
      val b = randStr(rnd.nextInt(200)) + shared + randStr(rnd.nextInt(200))
      val common = anchors(a, k, w).intersect(anchors(b, k, w))
      assert(common.nonEmpty, s"trial=$trial shared=${shared.take(50)}")
    }
  }

  test("degenerate inputs") {
    assert(anchors("", 16, 25) === Set.empty)
    assert(anchors("short", 16, 25) === Set.empty)
    // exactly one gram: it is the anchor
    assert(anchors("0123456789abcdef", 16, 25) === Set("0123456789abcdef"))
    // uniform text: one distinct gram, selected
    assert(anchors("a" * 100, 16, 25) === Set("a" * 16))
    // anchor density is ~2/(w+1), never the whole gram set
    val rnd = new scala.util.Random(5)
    val s = Array.fill(5000)(('a' + rnd.nextInt(26)).toChar).mkString
    val n = anchors(s, 16, 25).size
    assert(n > 150 && n < 1200, s"density off: $n anchors")
  }
}
