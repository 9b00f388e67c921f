package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch state (Cormode & Muthukrishnan 2005): a d×w grid
  * of counters; every key increments one counter per row, the row
  * picked by an independent hash, and a frequency estimate is the MIN
  * over the key's d counters — never an undercount, overcounting
  * bounded by collisions (ε ≈ e/w with probability 1−e^−d).
  *
  * Like the KMV sketch next door, the whole construction is
  * deterministic integer arithmetic over md5-derived hashes (row j's
  * bucket = hash60(key + "#" + j) mod w), so the ESTIMATES — not just
  * an exact regime — hash-match a DuckDB transcription (q123). Merge
  * is elementwise addition: the canonical mergeable summary, d·w longs
  * per partial through the shuffle whatever the key cardinality.
  */
final class CmsState(val d: Int, val w: Int) {
  val counts = new Array[Long](d * w)

  def add(key: UTF8String, by: Long = 1L): Unit = {
    var j = 0
    while (j < d) {
      counts(j * w + CmsState.bucket(key, j, w)) += by
      j += 1
    }
  }

  def mergeIn(o: CmsState): Unit = {
    require(o.d == d && o.w == w, "merging differently-sized sketches")
    var i = 0
    while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
  }

  def estimate(key: UTF8String): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < d) {
      val c = counts(j * w + CmsState.bucket(key, j, w))
      if (c < best) best = c
      j += 1
    }
    best
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + counts.length * 8)
    buf.putInt(d); buf.putInt(w)
    counts.foreach(buf.putLong)
    buf.array()
  }
}

object CmsState {
  /** Row j's bucket: the shared 60-bit md5 prefix hash of "key#j". */
  def bucket(key: UTF8String, j: Int, w: Int): Int =
    (KmvState.hash60(UTF8String.concat(key,
      UTF8String.fromString(s"#$j"))) % w).toInt

  def deserialize(bytes: Array[Byte]): CmsState = {
    val buf = ByteBuffer.wrap(bytes)
    val st = new CmsState(buf.getInt, buf.getInt)
    var i = 0
    while (i < st.counts.length) { st.counts(i) = buf.getLong; i += 1 }
    st
  }
}

/** `graft_cms(s, d, w)` aggregate over a STRING key — returns the full
  * d×w counter grid (array<array<bigint>>), so estimates compose as
  * plain `element_at` + `least` column arithmetic over the result
  * (probe buckets are the same md5 math any engine can reproduce).
  */
final case class CountMinAgg(
    child: Expression, d: Int, w: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsState] {

  require(d >= 1 && d <= 16 && w >= 2,
    s"graft_cms needs 1 <= d <= 16 rows and w >= 2 (got d=$d w=$w)")

  override def prettyName: String = "graft_cms"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false),
      containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cms expects a string key (cast it), got ${t.sql}")
  }

  override def createAggregationBuffer(): CmsState = new CmsState(d, w)

  override def update(b: CmsState, input: InternalRow): CmsState = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String])
    b
  }

  override def merge(b: CmsState, o: CmsState): CmsState = { b.mergeIn(o); b }

  override def eval(b: CmsState): Any =
    new GenericArrayData((0 until d).map { j =>
      new GenericArrayData(
        java.util.Arrays.copyOfRange(b.counts, j * w, (j + 1) * w))
    }.toArray[Any])

  override def serialize(b: CmsState): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): CmsState =
    CmsState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CountMinAgg = copy(child = c.head)
}

object CountMinExpr {
  /** Column API: `cms($"key".cast("string"), 4, 512)`. */
  def cms(key: Column, d: Int, w: Int): Column =
    Bridge.column(
      CountMinAgg(Bridge.expression(key), d, w).toAggregateExpression())
}
