package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Gram-matrix aggregate Σ v·vᵀ over integer-quantized vectors — the
  * one-pass covariance/PCA-preprocessing primitive: each partial folds
  * its rows into a d(d+1)/2-long upper triangle (exact integer sums),
  * partials merge by addition, and the full pass never materializes a
  * row-pair or an exploded (row × i × j) relation — which is the
  * difference between O(n·d²) work with O(d²) shuffle bytes and the
  * O(n·d²) ROWS a join/explode formulation would shuffle at 100 TB.
  * Quantization makes the result a pure integer function of the input
  * set, so DuckDB reproduces every cell bit-for-bit (q127).
  */
final class GramState(val dim: Int) {
  val tri = new Array[Long](dim * (dim + 1) / 2)
  var nRows: Long = 0L

  def add(v: Array[Long]): Unit = {
    require(v.length == dim, s"vector of ${v.length} dims, $dim expected")
    var k = 0
    var i = 0
    while (i < dim) {
      val vi = v(i)
      var j = i
      while (j < dim) {
        tri(k) += vi * v(j)
        k += 1; j += 1
      }
      i += 1
    }
    nRows += 1
  }

  def mergeIn(o: GramState): Unit = {
    require(o.dim == dim, "merging differently-sized Gram states")
    var k = 0
    while (k < tri.length) { tri(k) += o.tri(k); k += 1 }
    nRows += o.nRows
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(12 + tri.length * 8)
    buf.putInt(dim); buf.putLong(nRows)
    tri.foreach(buf.putLong)
    buf.array()
  }
}

object GramState {
  def deserialize(bytes: Array[Byte]): GramState = {
    val buf = ByteBuffer.wrap(bytes)
    val st = new GramState(buf.getInt)
    st.nRows = buf.getLong
    var k = 0
    while (k < st.tri.length) { st.tri(k) = buf.getLong; k += 1 }
    st
  }
}

/** `graft_gram(v, dim)` over array<bigint> vectors → the upper
  * triangle as array<struct<i, j, g>> (1-based indices, i <= j).
  */
final case class GramAgg(
    child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramState] {

  require(dim >= 1 && dim <= 1024, s"graft_gram dim $dim (1..1024)")

  override def prettyName: String = "graft_gram"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("i", IntegerType).add("j", IntegerType).add("g", LongType),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_gram expects array<bigint> (quantize first), got ${t.sql}")
  }

  override def createAggregationBuffer(): GramState = new GramState(dim)

  override def update(b: GramState, input: InternalRow): GramState = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      val arr = new Array[Long](n)
      var i = 0
      while (i < n) {
        if (a.isNullAt(i))
          throw new IllegalArgumentException(
            s"graft_gram: null vector component at index $i — null elements " +
              "have no SQL-consistent Gram contribution; filter or impute first")
        arr(i) = a.getLong(i)
        i += 1
      }
      b.add(arr)
    }
    b
  }

  override def merge(b: GramState, o: GramState): GramState = {
    b.mergeIn(o); b
  }

  override def eval(b: GramState): Any = {
    val out = new Array[Any](b.tri.length)
    var k = 0
    var i = 0
    while (i < b.dim) {
      var j = i
      while (j < b.dim) {
        out(k) = new GenericInternalRow(Array[Any](i + 1, j + 1, b.tri(k)))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: GramState): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): GramState =
    GramState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): GramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): GramAgg = copy(child = c.head)
}

object GramExpr {
  /** Column API: `gram(transform($"emb", x => floor(x*1000)), 64)`. */
  def gram(v: Column, dim: Int): Column =
    Bridge.column(
      GramAgg(Bridge.expression(v), dim).toAggregateExpression())
}
