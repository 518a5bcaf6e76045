package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Count-Min row hash: MurmurHash3 of the key seeded by the row index,
  * floor-modded to the row width. Shared by the build aggregate and the
  * point-query scalar so the two stay in lockstep by construction. */
object CountMinHash {
  def cell(key: String, row: Int, width: Int): Int =
    java.lang.Math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(key, row), width)
}

/** countmin(col, depth, width) → array<array<long>> (depth rows of
  * width counters): the Count-Min sketch of Cormode & Muthukrishnan
  * (J. Algorithms 2005) — the frequency-estimation companion of the
  * Misra–Gries approx_topk. Each input increments one counter per row;
  * a point query (CmQuery) takes the MIN across rows, so estimates
  * NEVER undercount and overcount by at most εn (ε = e/width) with
  * probability 1−δ (δ = e^−depth).
  *
  * Exactness boundary (what the harness oracle pins, the
  * approx_topk/histogram_numeric treatment): when every queried key has
  * a collision-free row, the MIN is the exact count. Collisions depend
  * only on (key, depth, width) — never on the data size — so a
  * configuration verified exact for a key set stays exact at every SF.
  *
  * 100 TB shape: a bounded depth×width mergeable buffer (element-wise
  * add under merge — the sketch is a linear projection of the input, so
  * ANY partition split reduces identically); map-side partials shrink
  * the scan to (#partitions × depth × width) longs before the shuffle.
  * NULL rows are skipped (sum semantics).
  */
case class CountMinAgg(
    child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with Bridge.GraftExpectsInputTypes {
  require(depth >= 1 && width >= 2,
    s"countmin: need depth >= 1, width >= 2, got depth=$depth width=$width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def graftInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  /** Exposed for CountMinSpec, which drives the exact update/merge
    * paths the engine uses (minus child eval). */
  private[graft] def updateValue(b: Array[Long], key: String): Array[Long] = {
    var r = 0
    while (r < depth) {
      b(r * width + CountMinHash.cell(key, r, width)) += 1
      r += 1
    }
    b
  }

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) b else updateValue(b, v.asInstanceOf[UTF8String].toString)
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(b: Array[Long]): Any =
    new GenericArrayData(Array.tabulate[Any](depth) { r =>
      new GenericArrayData(
        java.util.Arrays.copyOfRange(b, r * width, (r + 1) * width)
          .map(Long.box).toArray[Any])
    })

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(b.length * 8 + 4)
    val out = new DataOutputStream(bos)
    out.writeInt(b.length)
    b.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

/** cm_query(sketch, item) → Long: Count-Min point query — MIN across
  * the sketch's rows of the counter each row hashes the item to. Depth
  * and width come from the sketch's own shape, so the scalar can never
  * disagree with the aggregate that built it. */
case class CmQuery(left: Expression, right: Expression)
    extends BinaryExpression with Bridge.GraftExpectsInputTypes {
  override def dataType: DataType = LongType
  override def graftInputTypes: Seq[DataType] =
    Seq(ArrayType(ArrayType(LongType)), StringType)

  def kernel(sketch: ArrayData, item: UTF8String): Long = {
    val key = item.toString
    val depth = sketch.numElements()
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val row = sketch.getArray(r)
      val c = row.getLong(CountMinHash.cell(key, r, row.numElements()))
      if (c < min) min = c
      r += 1
    }
    if (min == Long.MaxValue) 0L else min
  }

  override def nullSafeEval(s: Any, i: Any): Any =
    kernel(s.asInstanceOf[ArrayData], i.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmq", this, classOf[CmQuery].getName)
    nullSafeCodeGen(ctx, ev, (s, i) => s"${ev.value} = $ref.kernel($s, $i);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmQuery =
    copy(left = newLeft, right = newRight)
}
