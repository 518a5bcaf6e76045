package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CountMinAgg, CountMinHash, CmQuery}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch invariants, driven through the same updateValue /
  * merge / eval paths the engine executes (the ApproxTopK treatment).
  * The point-query bound (never undercount; overcount ≤ collisions) is
  * structural, so it must hold for EVERY split of the input — checked
  * under seeded random splits. */
class CountMinSpec extends AnyFunSuite {

  private def agg(depth: Int, width: Int) =
    CountMinAgg(Literal(UTF8String.fromString("x"), org.apache.spark.sql.types.StringType),
      depth, width)

  private def query(a: CountMinAgg, buf: Array[Long], key: String): Long = {
    val sketch = a.eval(buf).asInstanceOf[ArrayData]
    CmQuery(Literal(null), Literal(null)).kernel(sketch, UTF8String.fromString(key))
  }

  test("never undercounts, and is exact when every key has a collision-free row") {
    val a = agg(4, 64)
    val keys = Seq("click", "view", "purchase", "signup", "error")
    val rng = new scala.util.Random(7)
    val stream = Seq.fill(5000)(keys(rng.nextInt(keys.length)))
    val truth = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val buf = stream.foldLeft(a.createAggregationBuffer())(a.updateValue)
    keys.foreach { k =>
      val est = query(a, buf, k)
      assert(est >= truth(k), s"$k undercounted: $est < ${truth(k)}")
    }
    // the harness configuration is collision-free for these keys: some
    // row separates each key from all others
    keys.foreach { k =>
      val free = (0 until 4).exists { r =>
        val cell = CountMinHash.cell(k, r, 64)
        keys.filter(_ != k).forall(o => CountMinHash.cell(o, r, 64) != cell)
      }
      assert(free, s"$k has no collision-free row at (4, 64)")
      assert(query(a, buf, k) == truth(k))
    }
  }

  test("merge is linear: any split reduces to the single-pass sketch") {
    val a = agg(3, 32)
    val rng = new scala.util.Random(11)
    val stream = Seq.fill(2000)(s"k${rng.nextInt(40)}")
    val whole = stream.foldLeft(a.createAggregationBuffer())(a.updateValue)
    (1 to 5).foreach { trial =>
      val shuffled = new scala.util.Random(trial).shuffle(stream)
      val parts = shuffled.grouped(shuffled.length / 4 + 1).toSeq
      val merged = parts
        .map(p => p.foldLeft(a.createAggregationBuffer())(a.updateValue))
        .map(b => a.deserialize(a.serialize(b))) // through the shuffle boundary
        .reduce(a.merge)
      assert(java.util.Arrays.equals(merged, whole), s"trial $trial")
    }
  }

  test("unseen keys read 0 on an empty sketch and >= 0 always") {
    val a = agg(4, 64)
    val empty = a.createAggregationBuffer()
    assert(query(a, empty, "nothing") == 0L)
    val buf = Seq("a", "b").foldLeft(a.createAggregationBuffer())(a.updateValue)
    assert(query(a, buf, "zzz") >= 0L)
  }

  test("overcount on a high-cardinality stream stays within the epsilon bound") {
    val a = agg(4, 32)
    val rng = new scala.util.Random(3)
    val stream = Seq.fill(4000)(s"u${rng.nextInt(500)}")
    val truth = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val buf = stream.foldLeft(a.createAggregationBuffer())(a.updateValue)
    // Markov bound per row, MIN over 4 rows: overall overcount beyond
    // 2en/w for ALL keys simultaneously would be a (1/2)^4-rare event
    // per key; with the fixed seed this is a deterministic regression
    // gate, not a flaky probabilistic one
    val eps = 2.0 * math.E / 32
    val bad = truth.keys.count(k => query(a, buf, k) - truth(k) > eps * stream.length)
    assert(bad <= truth.size / 10, s"$bad of ${truth.size} keys exceed the bound")
  }
}
