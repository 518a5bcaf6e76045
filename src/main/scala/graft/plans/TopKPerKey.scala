package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Per-key top-k as a first-class operator — the (c)-level extension
  * path from the build brief: custom LogicalPlan + Strategy + SparkPlan.
  *
  * The built-in way to say "first k rows per key" is
  * `row_number() OVER (PARTITION BY key ORDER BY o) <= k`, which plans a
  * WindowExec: full shuffle of ALL rows, full sort of every partition,
  * rank, filter. This operator instead keeps a bounded k-row heap per
  * key: a partial pass inside each input partition cuts the data to
  * ≤ k rows per (partition, key) BEFORE the exchange — the same
  * partial/final discipline as aggregation (Hive: ReduceSinkOperator's
  * TopN hash, QL/optimizer/LimitPushdownOptimizer.java, generalized
  * from global limit to per-key) — then a final pass after the exchange
  * merges the partials. Shuffle volume drops from |input| to
  * ≤ k · keys · partitions, and nothing is ever fully sorted.
  *
  * Memory: one k-row heap per distinct key per partition — bounded by
  * the same hash-aggregate assumption Spark's own HashAggregateExec
  * makes (distinct keys per partition fit in memory).
  */
case class TopKPerKeyNode(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
  extends UnaryNode {
  require(k >= 1)
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, partial: Boolean,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // identity projection to UnsafeRow: a child emitting
      // GenericInternalRow (e.g. an RDD scan) would otherwise CCE on the
      // heap insert; for UnsafeRow input this is a plain buffer write
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val cmp = RowOrdering.create(sortOrder, childOutput)
      // max-heap under cmp: the WORST kept row sits on top and is
      // evicted when a better row arrives
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        // probe with the reused projection row; copy the key only when
        // it is first inserted (getOrElseUpdate would copy every row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](cmp.asInstanceOf[Ordering[UnsafeRow]])
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) {
          heap.enqueue(toUnsafe(row).copy())
        } else if (cmp.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(toUnsafe(row).copy())
        }
      }
      // emit each key's survivors in sort order (dequeueAll yields
      // worst-first; reverse)
      heaps.valuesIterator.flatMap(h => h.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** Plans the logical node as partial-then-final (EnsureRequirements
  * inserts the key exchange between them). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      val partialExec = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

/** User-facing API. */
object GraftOps {
  /** First k rows per key under `order` — `ORDER BY ... LIMIT k` within
    * each group, without a window sort. Columns are given by name and
    * resolved against the input's analyzed plan (the node is built
    * post-analysis, so its expressions must be bound attributes, not
    * lazy Column nodes). `order` pairs are (columnName, descending). */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
                 orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      analyzed.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${analyzed.output.map(_.name).mkString(",")}"))
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    val order = orderCols.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    Bridge.ofRows(spark, TopKPerKeyNode(keyCols.map(attr), order, k, analyzed))
  }
}
