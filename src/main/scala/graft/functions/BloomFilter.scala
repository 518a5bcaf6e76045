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

/** Bloom bit positions: classic double hashing (Kirsch & Mitzenmacher,
  * ESA'06) over two MurmurHash3 seeds — position i = h1 + i·h2 mod m,
  * h2 forced odd so the stride cycles the full power-of-two-free range.
  * Shared by the build aggregate and the membership scalar so the two
  * stay in lockstep by construction (the CountMinHash discipline). */
object BloomHash {
  def bitPos(key: String, i: Int, numBits: Int): Int = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(key, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(key, 0x85ebca6b) | 1
    java.lang.Math.floorMod(h1.toLong + i.toLong * h2.toLong, numBits.toLong).toInt
  }
}

/** bloom_filter(col, numBits, numHashes) → array<long>: the classic
  * Bloom membership sketch — Hive 2.x ships the same surface as its
  * `bloom_filter`/`in_bloom_filter` UDAF pair (SURVEY §2.5 [2.x],
  * `GenericUDAFBloomFilter`), used there to runtime-prune the big side
  * of a semi join. Word 0 of the output carries numHashes; words 1..n
  * are the bit array (numBits = 64·n), so the membership scalar reads
  * its configuration from the sketch itself and can never disagree
  * with the aggregate that built it.
  *
  * Guarantees: NO false negatives ever (every inserted key tests
  * true — the property the exact-join prefilter pattern relies on);
  * false positives at the classic (1−e^{−kn/m})^k rate, removed
  * downstream by the exact join. NULL rows are skipped.
  *
  * 100 TB shape: a bounded m-bit mergeable buffer — the sketch is a
  * bitwise OR of per-row masks, so ANY partition split merges
  * identically (PropertySpec pins this under arbitrary splits);
  * map-side partials shrink a full scan to (#partitions × m/64) longs
  * before the shuffle, and the finished sketch broadcasts as one row.
  */
case class BloomFilterAgg(
    child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with Bridge.GraftExpectsInputTypes {
  require(numBits >= 64 && numBits % 64 == 0,
    s"bloom_filter: numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom_filter: need 1 <= numHashes <= 16, got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def graftInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // word 0 = numHashes header, then numBits/64 bit words
  override def createAggregationBuffer(): Array[Long] = {
    val b = new Array[Long](1 + numBits / 64)
    b(0) = numHashes.toLong
    b
  }

  /** Exposed for PropertySpec, which drives the exact update/merge
    * paths the engine uses (minus child eval). */
  private[graft] def updateValue(b: Array[Long], key: String): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val pos = BloomHash.bitPos(key, i, numBits)
      b(1 + (pos >>> 6)) |= (1L << (pos & 63))
      i += 1
    }
    b
  }

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) b else updateValue(b, v.asInstanceOf[UTF8String].toString)
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 1
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(b: Array[Long]): Any =
    new GenericArrayData(b.map(Long.box).toArray[Any])

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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
}

/** in_bloom_filter(sketch, item) → Boolean: true iff every one of the
  * sketch's k bit positions for the item is set. k and m come from the
  * sketch's own layout (header word + word count), mirroring Hive's
  * `in_bloom_filter` scalar. Codegen'd — the prefilter sits in the big
  * side's scan stage, so it must not break the whole-stage span. */
case class InBloomFilter(left: Expression, right: Expression)
    extends BinaryExpression with Bridge.GraftExpectsInputTypes {
  override def dataType: DataType = BooleanType
  override def graftInputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), StringType)

  def kernel(sketch: ArrayData, item: UTF8String): Boolean = {
    val key = item.toString
    val numHashes = sketch.getLong(0).toInt
    val numBits = (sketch.numElements() - 1) * 64
    var i = 0
    while (i < numHashes) {
      val pos = BloomHash.bitPos(key, i, numBits)
      if ((sketch.getLong(1 + (pos >>> 6)) & (1L << (pos & 63))) == 0L)
        return false
      i += 1
    }
    true
  }

  override def nullSafeEval(s: Any, i: Any): Any =
    kernel(s.asInstanceOf[ArrayData], i.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ibf", this, classOf[InBloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (s, i) => s"${ev.value} = $ref.kernel($s, $i);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InBloomFilter =
    copy(left = newLeft, right = newRight)
}
