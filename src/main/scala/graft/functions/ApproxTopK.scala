package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** approx_topk(col, k, buf) → array<struct<item string, cnt long>>:
  * Misra–Gries frequent-items sketch (Misra & Gries, Sci. Comp. Prog.
  * 1982) with the mergeable-summaries merge (Agarwal et al., PODS'12):
  * top-k items of a string column with at most `buf` counters per
  * partial.
  *
  * Guarantees (property-tested in PropertySpec, for ANY partition
  * split): estimates never exceed true counts; the undercount is at
  * most n/(buf+1) over a combined stream of n rows (merging does NOT
  * degrade the bound — the PODS'12 result); every item with true
  * frequency > n/(buf+1) is present in the summary; and when the
  * column's distinct count is ≤ buf the counts are EXACT — the
  * exactness boundary the harness oracle pins, exactly like
  * histogram_numeric's. Unlike ngrams_topk's heuristic top-maxBuf trim,
  * the decrement discipline is what buys the provable bound.
  *
  * 100 TB shape: bounded O(buf) mergeable buffer (SURVEY §7.3 rule 6) —
  * map-side partials shrink the scan to (#partitions × buf) counters
  * before the shuffle. NULL rows are skipped (sum semantics).
  */
case class ApproxTopKAgg(
    child: Expression, k: Int, buf: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with Bridge.GraftExpectsInputTypes {
  require(k >= 1 && buf >= k, s"approx_topk: need buf >= k >= 1, got k=$k buf=$buf")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def graftInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(m: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      m.get(key) match {
        case Some(c) => m.update(key, c + 1)
        case None if m.size < buf => m.update(key, 1L)
        case None =>
          // classic MG: a miss on a full buffer decrements every counter
          // (the new item and one unit of `buf` others cancel out)
          val dead = mutable.ArrayBuffer.empty[String]
          m.mapValuesInPlace { (_, c) => c - 1 }
          m.foreach { case (key2, c) => if (c == 0L) dead += key2 }
          dead.foreach(m.remove)
      }
    }
    m
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
    if (a.size > buf) {
      // PODS'12 mergeable-summaries trim: subtract the (buf+1)-th
      // largest count from everything, drop the non-positive — at most
      // buf counters survive and the n/(buf+1) bound is preserved
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (buf + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace { (_, c) => c - d }
      a.foreach { case (key, c) => if (c <= 0L) dead += key }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(m: mutable.HashMap[String, Long]): Any = {
    val top = m.toSeq.sortBy { case (i, c) => (-c, i) }.take(k)
    new GenericArrayData(top.map { case (i, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(i), c))
    }.toArray[Any])
  }

  override def serialize(m: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.foreach { case (i, c) =>
      val b = i.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val size = in.readInt()
    val m = new mutable.HashMap[String, Long]()
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ApproxTopKAgg =
    copy(child = newChildren.head)
}
