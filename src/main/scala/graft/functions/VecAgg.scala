package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** vec_sum(array<double>) → array<double>: element-wise vector sum.
  *
  * The centroid-update aggregate for distributed k-means (see
  * `graft.operators.Clustering`): the buffer is ONE double per dimension
  * — bounded and mergeable (SURVEY.md §7.3 rule 6), so map-side partials
  * shrink a 100 TB embedding scan to (#partitions × k) buffer rows
  * before the shuffle. The alternative built-in spelling (posexplode →
  * groupBy(key, pos) → sum → re-assemble) shuffles n·dim scalar rows —
  * a dim× shuffle blowup this aggregate exists to avoid.
  *
  * The dimension is learned from the first non-null row; mismatched
  * widths, zero-length vectors, and null ELEMENTS all fail loudly
  * rather than silently truncating or summing 0.0 (null ROWS are
  * skipped, like built-in `sum`). Sums accumulate in double regardless
  * of input precision (callers cast float vectors up first so the SQL
  * types are explicit).
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with Bridge.GraftExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return buf
    val n = arr.numElements()
    // reject zero-length up front: an empty first row would leave the
    // buffer indistinguishable from the initial one (silently dropped,
    // while the same row arriving later trips the width require)
    require(n > 0, "vec_sum: zero-length input vector")
    val acc = if (buf.isEmpty) new Array[Double](n) else buf
    require(acc.length == n,
      s"vec_sum: vector width $n differs from the group's ${acc.length}")
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), s"vec_sum: null element at index $i")
      acc(i) += arr.getDouble(i)
      i += 1
    }
    acc
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"vec_sum: merging widths ${a.length} and ${b.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumAgg =
    copy(child = newChildren.head)
}

