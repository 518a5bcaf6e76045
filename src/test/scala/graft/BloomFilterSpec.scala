package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BloomFilterAgg, InBloomFilter}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter invariants, driven through the same updateValue /
  * merge / eval paths the engine executes (the CountMinSpec
  * treatment). The no-false-negative guarantee is what the
  * join_bloom_prefilter pattern rests on — a single false negative
  * would silently drop a matching fact row, and the exact join could
  * never recover it — so it is checked structurally and under
  * arbitrary partition splits. */
class BloomFilterSpec extends AnyFunSuite {

  private def agg(bits: Int, hashes: Int) =
    BloomFilterAgg(Literal(UTF8String.fromString("x"),
      org.apache.spark.sql.types.StringType), bits, hashes)

  private def contains(a: BloomFilterAgg, buf: Array[Long], key: String): Boolean =
    InBloomFilter(Literal(null), Literal(null)).kernel(
      a.eval(buf).asInstanceOf[ArrayData], UTF8String.fromString(key))

  test("no false negatives: every inserted key tests true") {
    val a = agg(4096, 3)
    val rng = new scala.util.Random(13)
    val keys = Seq.fill(800)(rng.nextLong().toString).distinct
    val buf = keys.foldLeft(a.createAggregationBuffer())(a.updateValue)
    keys.foreach(k => assert(contains(a, buf, k), s"false negative for $k"))
  }

  test("merge is bitwise OR: any split reduces to the single-pass sketch") {
    val a = agg(2048, 4)
    val rng = new scala.util.Random(17)
    val keys = Seq.fill(300)(rng.nextInt(100000).toString)
    val whole = keys.foldLeft(a.createAggregationBuffer())(a.updateValue)
    for (splits <- Seq(2, 3, 7)) {
      val parts = keys.grouped(math.max(1, keys.size / splits)).toSeq
        .map(_.foldLeft(a.createAggregationBuffer())(a.updateValue))
      val merged = parts.reduce(a.merge)
      assert(java.util.Arrays.equals(merged, whole),
        s"$splits-way split diverged from single-pass sketch")
    }
  }

  test("serialize/deserialize round-trips, and the scalar reads k from the header") {
    val a = agg(1024, 5)
    val buf = Seq("p", "q", "r").foldLeft(a.createAggregationBuffer())(a.updateValue)
    val rt = a.deserialize(a.serialize(buf))
    assert(java.util.Arrays.equals(rt, buf))
    assert(rt(0) == 5L, "header word must carry numHashes")
    assert(contains(a, rt, "q"))
  }

  test("false-positive rate stays near the theoretical bound at the harness config") {
    // the join_bloom_prefilter configuration: m=65536, k=3, n ≈ urgent
    // orders at sf0.01 (~3000). Theoretical fp = (1-e^{-kn/m})^k ≈ 2e-3;
    // assert an order of magnitude of slack, which still guarantees the
    // prefilter drops >95% of non-matching fact rows at the harness SF.
    val a = agg(65536, 3)
    val ins = (0 until 3000).map(i => s"key$i")
    val buf = ins.foldLeft(a.createAggregationBuffer())(a.updateValue)
    val probes = (0 until 20000).map(i => s"other$i")
    val fp = probes.count(contains(a, buf, _))
    assert(fp.toDouble / probes.size < 0.02,
      s"fp rate ${fp.toDouble / probes.size} exceeds 2% at (65536, 3, n=3000)")
  }
}
