package graft.ops

/** Lazily-concatenated immutable IndexedSeq — the O(Δ) commit plane's
  * data structure (r19). Two jobs:
  *
  *  1. [[SnapshotTable.readVersion]] materializes a version's
  *     positional facts as a CatSeq of per-segment live views instead
  *     of copying every element into one flat vector: building a
  *     1M-file Version becomes O(segments), not O(files).
  *  2. Append-shape commits extend the base version's arrays as
  *     `CatSeq(base, fresh)` — O(1) — and the base part's OBJECT
  *     IDENTITY is the carry proof the segmented render trusts:
  *     the arrays are immutable, so `parts(0) eq base.files` means
  *     the carried region is bit-identical to the committed base
  *     state, with nothing to re-verify per file. This is STRONGER
  *     than the per-element equality walk it replaces (identity ⇒
  *     equality), and it is what turns per-commit driver CPU from
  *     O(files) into O(Δ).
  *
  * Point access is a branchless-ish binary search over the offset
  * table (parts are segment-sized, so the table is tiny); linear
  * scans use the overridden iterator/foreach, which walk parts
  * directly — no per-element search.
  */
final class CatSeq[+A](val parts: IndexedSeq[IndexedSeq[A]])
    extends scala.collection.immutable.IndexedSeq[A]
    with Serializable {

  private[this] val offsets: Array[Int] = {
    val o = new Array[Int](parts.length + 1)
    var i = 0
    while (i < parts.length) { o(i + 1) = o(i) + parts(i).length; i += 1 }
    o
  }

  override val length: Int = offsets(parts.length)

  // last-hit part memo: the planner's hot loops scan positionally
  // (i = 0..n), so the right part is almost always the previous one
  // or its successor — O(1) amortized instead of a binary search per
  // access. Races on the hint are benign (it is only a verified
  // starting guess).
  @volatile private[this] var hint: Int = 0

  override def apply(i: Int): A = {
    if (i < 0 || i >= length)
      throw new IndexOutOfBoundsException(s"$i of $length")
    var p = hint
    if (p >= parts.length) p = 0
    if (offsets(p) <= i && i < offsets(p + 1))
      return parts(p)(i - offsets(p))
    if (p + 1 < parts.length && offsets(p + 1) <= i &&
        i < offsets(p + 2)) {
      hint = p + 1
      return parts(p + 1)(i - offsets(p + 1))
    }
    // upper-bound binary search: greatest p with offsets(p) <= i
    var lo = 0
    var hi = parts.length - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (offsets(mid) <= i) lo = mid else hi = mid - 1
    }
    hint = lo
    parts(lo)(i - offsets(lo))
  }

  override def iterator: Iterator[A] = parts.iterator.flatMap(_.iterator)

  override def foreach[U](f: A => U): Unit = {
    var p = 0
    while (p < parts.length) {
      val xs = parts(p)
      var j = 0
      val n = xs.length
      while (j < n) { f(xs(j)); j += 1 }
      p += 1
    }
  }
}

object CatSeq {

  /** A live view of `xs` at positions `li` — O(1) to build, the unit
    * [[SnapshotTable.readVersion]] stitches versions from (a parsed
    * segment's array × its surviving indices).
    */
  private final class LiveView[A](xs: IndexedSeq[A], li: IndexedSeq[Int])
      extends scala.collection.immutable.IndexedSeq[A]
      with Serializable {
    override def apply(i: Int): A = xs(li(i))
    override val length: Int = li.length
  }

  def view[A](xs: IndexedSeq[A], li: IndexedSeq[Int]): IndexedSeq[A] =
    if (li.length == xs.length && (li match {
      case r: Range => r.start == 0 && r.step == 1
      case _ => false
    })) xs
    else new LiveView(xs, li)

  def of[A](parts: IndexedSeq[IndexedSeq[A]]): IndexedSeq[A] =
    if (parts.length == 1) parts.head else new CatSeq(parts)

  /** Append-shape concat: O(1), base identity preserved in
    * `parts(0)`. Falls back to a plain copy when a side is not
    * indexed (first commits pass Seq.empty / List-backed batches).
    */
  def cat2[A](base: Seq[A], fresh: Seq[A]): Seq[A] = base match {
    case b: IndexedSeq[A] =>
      if (b.isEmpty) fresh.toIndexedSeq
      else {
        // the fresh side is O(Δ) to index; the BASE must stay the
        // caller's object untouched (its identity is the carry proof)
        val f = fresh.toIndexedSeq
        if (f.isEmpty) b
        else new CatSeq(scala.collection.immutable.IndexedSeq(b, f))
      }
    case _ => (base ++ fresh).toIndexedSeq
  }

  /** True when `cur` is a two-part CatSeq whose FIRST part IS `base`
    * (object identity — the carry proof; immutability makes identity
    * imply bit-equality with the committed state).
    */
  def extendsBase(cur: Seq[_], base: Seq[_]): Boolean = cur match {
    case c: CatSeq[_] => c.parts.length == 2 &&
      (c.parts(0).asInstanceOf[AnyRef] eq base.asInstanceOf[AnyRef])
    case _ => false
  }

  /** The fresh (second) part of an append-shape CatSeq. */
  def freshPart[A](cur: Seq[A]): IndexedSeq[A] =
    cur.asInstanceOf[CatSeq[A]].parts(1)
}
