package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** SpaceSaving (stream-summary) heavy-hitters state: at most `capacity`
  * counters; overflow evicts the minimum counter and charges its count
  * as the newcomer's error bound. Estimates never undercount
  * (est >= true >= est - err), and while distinct keys <= capacity the
  * sketch is EXACT (err = 0) — which is what makes the aggregate
  * oracle-able: size capacity above the key cardinality and the result
  * is the plain GROUP BY count, while the 100 TB path keeps state
  * bounded at `capacity` entries per partial regardless of cardinality.
  *
  * Merge follows the mergeable-summaries construction (Agarwal et al.,
  * TODS 2013): counts add; a key missing from an overflowed side is
  * charged that side's minimum counter as both estimate and error;
  * the union then prunes back to `capacity` by estimate.
  *
  * Eviction uses a lazy-deletion binary heap over (count, key): stale
  * heap entries (count bumped since push) are popped and dropped, so
  * update stays O(log capacity) amortized instead of the O(capacity)
  * min-scan of the naive form.
  */
final class SpaceSavingState(val capacity: Int) {
  val counts = new mutable.LongMap[Long]()
  val errs = new mutable.LongMap[Long]()
  // lazy-deletion min-heap of (count, key), built only once the sketch
  // first overflows; stale entries (count bumped since push) are dropped
  // at pop time, and the heap is rebuilt from live counters whenever
  // staleness exceeds 3× capacity, bounding memory at O(capacity)
  private var heap: mutable.PriorityQueue[(Long, Long)] = null
  var evicted = false

  def add(key: Long, by: Long = 1L, err: Long = 0L): Unit = {
    if (counts.contains(key)) {
      val c = counts(key) + by
      counts(key) = c
      if (err > 0) errs(key) = errs.getOrElse(key, 0L) + err
      if (heap != null) { heap.enqueue((c, key)); compactIfNeeded() }
    } else if (counts.size < capacity) {
      counts(key) = by
      if (err > 0) errs(key) = err
      if (heap != null) { heap.enqueue((by, key)); compactIfNeeded() }
    } else {
      evicted = true
      if (heap == null) rebuildHeap()
      val (minKey, minCount) = popMin()
      counts -= minKey; errs -= minKey
      counts(key) = minCount + by
      errs(key) = minCount + err
      heap.enqueue((minCount + by, key))
      compactIfNeeded()
    }
  }

  private def rebuildHeap(): Unit = {
    heap = mutable.PriorityQueue.empty[(Long, Long)](
      Ordering.by[(Long, Long), Long](_._1).reverse)
    counts.foreach { case (k, c) => heap.enqueue((c, k)) }
  }

  private def compactIfNeeded(): Unit =
    if (heap.size > 4 * capacity) rebuildHeap()

  /** Pop heap entries until one reflects a live (count, key) pair. */
  private def popMin(): (Long, Long) = {
    while (heap.nonEmpty) {
      val (c, k) = heap.dequeue()
      if (counts.get(k).contains(c)) return (k, c)
    }
    throw new IllegalStateException("heap drained with live counters present")
  }

  def minCount: Long = if (counts.isEmpty) 0L else counts.values.min

  def mergeIn(other: SpaceSavingState): Unit = {
    val selfBeta = if (evicted) minCount else 0L
    val otherBeta = if (other.evicted) other.minCount else 0L
    // keys only in `other` enter charged with THIS side's floor
    other.counts.foreach { case (k, c) =>
      val e = other.errs.getOrElse(k, 0L)
      if (counts.contains(k)) add(k, by = c, err = e)
      else add(k, by = c + selfBeta, err = e + selfBeta)
    }
    // keys we held that `other` never saw get the other side's floor
    if (otherBeta > 0) {
      counts.keys.filterNot(other.counts.contains).toSeq.foreach { k =>
        add(k, by = otherBeta, err = otherBeta)
      }
    }
    if (other.evicted) evicted = true
  }

  /** (key, est, err) sorted by est desc, key asc — deterministic while
    * the sketch is exact.
    */
  def top(k: Int): Seq[(Long, Long, Long)] =
    counts.toSeq
      .sortBy { case (key, c) => (-c, key) }
      .take(k)
      .map { case (key, c) => (key, c, errs.getOrElse(key, 0L)) }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 4 + 1 + counts.size * 24)
    buf.putInt(capacity); buf.putInt(counts.size)
    buf.put(if (evicted) 1.toByte else 0.toByte)
    counts.foreach { case (k, c) =>
      buf.putLong(k); buf.putLong(c); buf.putLong(errs.getOrElse(k, 0L))
    }
    buf.array()
  }
}

object SpaceSavingState {
  def deserialize(bytes: Array[Byte]): SpaceSavingState = {
    val buf = ByteBuffer.wrap(bytes)
    val st = new SpaceSavingState(buf.getInt)
    val n = buf.getInt
    st.evicted = buf.get() == 1
    var i = 0
    while (i < n) {
      st.add(buf.getLong, buf.getLong, buf.getLong)
      i += 1
    }
    st
  }
}

/** `graft_top_k(key, k, capacity)` aggregate — approximate top-k
  * frequent items over a BIGINT key, SpaceSaving-sketched so executor
  * state is bounded by `capacity` counters however many distinct keys
  * the 100 TB scan holds. Returns array<struct<item, n, err>> sorted by
  * (n desc, item asc), length <= k.
  */
final case class HeavyHittersAgg(
    child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingState] {

  require(k > 0 && capacity >= k,
    s"graft_top_k needs 0 < k <= capacity (got k=$k capacity=$capacity)")

  override def prettyName: String = "graft_top_k"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("item", LongType).add("n", LongType).add("err", LongType),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_top_k expects an integral key, got ${t.sql}")
  }

  override def createAggregationBuffer(): SpaceSavingState =
    new SpaceSavingState(capacity)

  override def update(b: SpaceSavingState, input: InternalRow): SpaceSavingState = {
    val v = child.eval(input)
    if (v != null) b.add(v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case by: Byte => by.toLong
    })
    b
  }

  override def merge(b: SpaceSavingState, o: SpaceSavingState): SpaceSavingState = {
    b.mergeIn(o); b
  }

  override def eval(b: SpaceSavingState): Any =
    new GenericArrayData(b.top(k).map { case (item, n, err) =>
      new GenericInternalRow(Array[Any](item, n, err))
    }.toArray[Any])

  override def serialize(b: SpaceSavingState): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSavingState =
    SpaceSavingState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HeavyHittersAgg = copy(child = c.head)
}

object HeavyHittersExpr {
  /** Column API: `topK($"l_partkey", 20)` → array<struct<item,n,err>>. */
  def topK(key: Column, k: Int, capacity: Int = 1 << 16): Column =
    Bridge.column(
      HeavyHittersAgg(Bridge.expression(key), k, capacity)
        .toAggregateExpression())
}
