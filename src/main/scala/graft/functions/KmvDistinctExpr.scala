package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** K-minimum-values distinct-count sketch state (Bar-Yossef et al. 2002;
  * the mergeable-summaries presentation in Agarwal et al., TODS 2013):
  * keep the k smallest DISTINCT hash values seen. With h uniform on
  * [0, 2^60), the k-th smallest hash h_k estimates the cardinality as
  * (k-1) * 2^60 / h_k; while fewer than k distinct hashes exist the
  * sketch holds all of them and the count is exact.
  *
  * What makes this aggregate ORACLE-able where HLL-style sketches are
  * not: the hash is the first 15 hex digits of md5 (a function both
  * engines share bit-for-bit), the estimator is evaluated in exact
  * integer arithmetic ((k-1)·2^60 truncation-divided by h_k), and the
  * k smallest distinct values of a deterministic hash are a pure
  * function of the input SET — independent of row order, partitioning,
  * and merge shape. So the approximate regime itself hash-matches a
  * DuckDB transcription, not just a capacity-oversized exact regime.
  *
  * At 100 TB: each partial carries at most k longs through the
  * shuffle regardless of input cardinality, updates are O(log k)
  * against a tree set with an early-out on the current k-th value, and
  * merge is a bounded set union — the same contract as the SpaceSaving
  * sketch next door ([[SpaceSavingState]]).
  */
final class KmvState(val k: Int) {
  /** The k smallest distinct 60-bit hashes, ascending. */
  val set = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (h < set.last) {
      if (set.add(h)) { set.remove(set.last); () }
    }
  }

  def mergeIn(o: KmvState): Unit = {
    val it = o.set.iterator()
    while (it.hasNext) add(it.next())
  }

  /** (estimate, h_k) — h_k = -1 while the sketch is exact. */
  def estimate: (Long, Long) =
    if (set.size < k) (set.size.toLong, -1L)
    else {
      val hk = set.last.longValue()
      // h_k = 0 would mean 2^60 colliding minima; guard regardless
      val est =
        if (hk <= 0L) Long.MaxValue
        else ((BigInt(k - 1) << 60) / BigInt(hk)).toLong
      (est, hk)
    }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + set.size * 8)
    buf.putInt(k); buf.putInt(set.size)
    val it = set.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }
}

object KmvState {
  def deserialize(bytes: Array[Byte]): KmvState = {
    val buf = ByteBuffer.wrap(bytes)
    val st = new KmvState(buf.getInt)
    val n = buf.getInt
    var i = 0
    while (i < n) { st.add(buf.getLong); i += 1 }
    st
  }

  /** The sketch hash: the first 15 hex digits of md5(UTF-8 bytes) read
    * as a base-16 integer — 60 bits, so it is non-negative in a Long
    * and any SQL engine with md5() can reproduce it digit-by-digit.
    */
  def hash60(s: UTF8String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes)
    // 15 hex digits = bytes 0..6 plus the high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xFL)
  }
}

/** `graft_kmv_distinct(s, k)` aggregate — KMV approximate distinct
  * count over a STRING column. Returns struct<est: bigint,
  * kth: bigint> where `kth` is the k-th smallest 60-bit hash the
  * estimate divides (-1 while fewer than k distinct values exist and
  * `est` is exact).
  */
final case class KmvDistinctAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {

  require(k >= 2, s"graft_kmv_distinct needs k >= 2 (got $k)")

  override def prettyName: String = "graft_kmv_distinct"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = new StructType()
    .add("est", LongType, nullable = false)
    .add("kth", LongType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_distinct expects a string (cast the key), got ${t.sql}")
  }

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(b: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) b.add(KmvState.hash60(v.asInstanceOf[UTF8String]))
    b
  }

  override def merge(b: KmvState, o: KmvState): KmvState = { b.mergeIn(o); b }

  override def eval(b: KmvState): Any = {
    val (est, kth) = b.estimate
    new GenericInternalRow(Array[Any](est, kth))
  }

  override def serialize(b: KmvState): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KmvState =
    KmvState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvDistinctAgg = copy(child = c.head)
}

/** `graft_kmv_mins(s, k)` aggregate — the RAW k smallest distinct
  * 60-bit hashes, ascending (array<bigint>, length <= k). This is the
  * composable form of the KMV sketch: set operations (union, estimated
  * intersection, Jaccard) are pure array arithmetic over two sides'
  * minima — see q116 — because the k minima of A ∪ B are computable
  * from the k minima of A and of B alone (Bar-Yossef et al. 2002).
  */
final case class KmvMinsAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {

  require(k >= 2, s"graft_kmv_mins needs k >= 2 (got $k)")

  override def prettyName: String = "graft_kmv_mins"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_mins expects a string (cast the key), got ${t.sql}")
  }

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(b: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) b.add(KmvState.hash60(v.asInstanceOf[UTF8String]))
    b
  }

  override def merge(b: KmvState, o: KmvState): KmvState = { b.mergeIn(o); b }

  override def eval(b: KmvState): Any = {
    val out = new Array[Any](b.set.size)
    val it = b.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(b: KmvState): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KmvState =
    KmvState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvMinsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMinsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvMinsAgg = copy(child = c.head)
}

object KmvDistinctExpr {
  /** Column API: `kmvDistinct($"key".cast("string"), 256)` →
    * struct<est, kth>.
    */
  def kmvDistinct(key: Column, k: Int): Column =
    Bridge.column(
      KmvDistinctAgg(Bridge.expression(key), k).toAggregateExpression())

  /** Column API: `kmvMins($"key".cast("string"), 256)` → the ascending
    * k smallest distinct hashes (array<bigint>).
    */
  def kmvMins(key: Column, k: Int): Column =
    Bridge.column(
      KmvMinsAgg(Bridge.expression(key), k).toAggregateExpression())
}
