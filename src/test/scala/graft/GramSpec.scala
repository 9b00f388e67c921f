package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GramState

/** Gram aggregate state: hand-computed outer-product sums, additive
  * merge independence, serialization, dimension guards. Cross-engine
  * cell parity is q127's oracle.
  */
class GramSpec extends AnyFunSuite {

  test("hand-computed 3-dim Gram over two vectors") {
    val st = new GramState(3)
    st.add(Array(1L, 2L, 3L))
    st.add(Array(-1L, 0L, 4L))
    // upper triangle order: (1,1)(1,2)(1,3)(2,2)(2,3)(3,3)
    assert(st.tri.toSeq === Seq(
      1 * 1 + 1, 1 * 2 + 0, 1 * 3 - 4, 4 + 0, 6 + 0, 9 + 16))
    assert(st.nRows === 2)
  }

  test("merge across partials equals single-pass") {
    val rnd = new scala.util.Random(3)
    val rows = Array.fill(200)(Array.fill(8)(rnd.nextLong() % 1000))
    val one = new GramState(8)
    rows.foreach(one.add)
    val parts = Array.fill(4)(new GramState(8))
    rows.zipWithIndex.foreach { case (v, i) => parts(i % 4).add(v) }
    val merged = new GramState(8)
    parts.foreach(merged.mergeIn)
    assert(merged.tri.toSeq === one.tri.toSeq)
    assert(merged.nRows === 200)
  }

  test("serialization round-trips; wrong dims fail loudly") {
    val st = new GramState(4)
    st.add(Array(5L, -3L, 2L, 7L))
    val back = GramState.deserialize(st.serialize())
    assert(back.dim === 4 && back.tri.toSeq === st.tri.toSeq)
    assert(back.nRows === 1)
    intercept[IllegalArgumentException] { st.add(Array(1L, 2L)) }
    intercept[IllegalArgumentException] { st.mergeIn(new GramState(5)) }
  }
}
