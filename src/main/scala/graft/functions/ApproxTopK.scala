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

/** Misra–Gries buffer with the standard global-decrement-offset
  * amortization: counters are stored ABSOLUTE and an entry's effective
  * count is `stored - delta`. The classic miss path ("decrement every
  * counter, drop zeros") becomes `delta += 1` — O(1) instead of
  * O(buf) — and entries whose stored count has fallen to <= delta are
  * logically dead, purged lazily only when a slot is actually needed.
  * Semantically IDENTICAL to the textbook algorithm (effective counts
  * evolve exactly as classic counts do; dead entries are invisible to
  * eval/serialize/merge), so the n/(buf+1) undercount bound and the
  * distinct<=buf exactness regime are unchanged — PropertySpec checks
  * both against this implementation under arbitrary splits.
  *
  * `minStored` is a LOWER bound on the live minimum (exact after every
  * purge, possibly stale-low after increments); it gates the purge so
  * a full-buffer miss scans only when some entry is actually (or
  * apparently) dead. Worst-case a purge is still O(buf), but each
  * purge either frees >= 1 slot or tightens minStored to exact, so the
  * scan-per-miss pathology of the eager spelling (every miss O(buf) on
  * a high-cardinality stream) cannot occur: a uniform random stream
  * alternates O(1) delta bumps with purges that free many slots at
  * once.
  */
final class MGBuffer {
  val m: mutable.HashMap[String, Long] = mutable.HashMap.empty
  var delta: Long = 0L
  var minStored: Long = Long.MaxValue

  /** Live (effective > 0) counts — the algorithm's observable state. */
  def counts: Map[String, Long] =
    m.iterator.collect { case (k, c) if c > delta => (k, c - delta) }.toMap

  /** Drop dead entries; recompute the exact live minimum. */
  def purge(): Unit = {
    m.filterInPlace((_, c) => c > delta)
    minStored = if (m.isEmpty) Long.MaxValue else m.valuesIterator.min
  }
}

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
  * before the shuffle. NULL rows are skipped (sum semantics). The miss
  * path is the amortized offset form (see MGBuffer) so large `buf`
  * values passed from SQL stay safe on high-cardinality streams.
  */
case class ApproxTopKAgg(
    child: Expression, k: Int, buf: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer]
  with Bridge.GraftExpectsInputTypes {
  require(k >= 1 && buf >= k, s"approx_topk: need buf >= k >= 1, got k=$k buf=$buf")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def graftInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MGBuffer = new MGBuffer

  /** One stream element. Exposed for PropertySpec, which drives the
    * exact update/merge/serde paths the engine uses (minus child eval). */
  private[graft] def updateValue(b: MGBuffer, key: String): MGBuffer = {
    b.m.get(key) match {
      case Some(c) =>
        b.m.update(key, c + 1) // minStored may go stale-LOW: still a bound
      case None if b.m.size < buf =>
        val stored = b.delta + 1
        b.m.update(key, stored)
        if (stored < b.minStored) b.minStored = stored
      case None =>
        if (b.minStored <= b.delta) {
          // some entry is (apparently) dead — reclaim slots, then insert
          b.purge()
          if (b.m.size < buf) {
            val stored = b.delta + 1
            b.m.update(key, stored)
            if (stored < b.minStored) b.minStored = stored
          } else b.delta += 1 // min was stale; classic decrement-all, O(1)
        } else b.delta += 1   // all live: classic decrement-all, O(1)
    }
    b
  }

  override def update(b: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v == null) b
    else updateValue(b, v.asInstanceOf[UTF8String].toString)
  }

  override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
    // sum EFFECTIVE counts (b arrives normalized from deserialize; a may
    // carry a nonzero offset) into a fresh zero-offset buffer
    val out = new MGBuffer
    a.m.foreach { case (key, c) =>
      if (c > a.delta) out.m.update(key, c - a.delta)
    }
    b.m.foreach { case (key, c) =>
      if (c > b.delta)
        out.m.update(key, out.m.getOrElse(key, 0L) + (c - b.delta))
    }
    if (out.m.size > buf) {
      // PODS'12 mergeable-summaries trim: subtract the (buf+1)-th
      // largest count from everything, drop the non-positive — at most
      // buf counters survive and the n/(buf+1) bound is preserved
      val counts = out.m.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (buf + 1))
      out.m.filterInPlace((_, c) => c - d > 0L)
      out.m.mapValuesInPlace((_, c) => c - d)
    }
    out.minStored = if (out.m.isEmpty) Long.MaxValue else out.m.valuesIterator.min
    out
  }

  override def eval(b: MGBuffer): Any = {
    val top = b.counts.toSeq.sortBy { case (i, c) => (-c, i) }.take(k)
    new GenericArrayData(top.map { case (i, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(i), c))
    }.toArray[Any])
  }

  override def serialize(b: MGBuffer): Array[Byte] = {
    // normalize at the shuffle boundary: effective counts, zero offset
    val live = b.counts
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(live.size)
    live.foreach { case (i, c) =>
      val bytes = i.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val size = in.readInt()
    val b = new MGBuffer
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val c = in.readLong()
      b.m.update(new String(arr, "UTF-8"), c)
      if (c < b.minStored) b.minStored = c
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ApproxTopKAgg =
    copy(child = newChildren.head)
}
