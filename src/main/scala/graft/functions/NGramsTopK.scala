package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, Encoders}

/** Hive's `ngrams(array<string>, n, k [, pf])` estimator
  * (QL/udf/generic/GenericUDAFnGrams.java) as a typed Spark Aggregator:
  * top-k most frequent n-grams of a token stream.
  *
  * The buffer is a bounded frequency map: when it grows past
  * `maxBuf` (≈ k·pf, Hive's "precision factor"), it is pruned back to the
  * top maxBuf entries — bounded memory per partial regardless of input
  * size, and partials merge associatively (SURVEY.md §7.3 rule 6: every
  * custom aggregate must have a bounded, mergeable buffer at 100 TB).
  * Like Hive's, the result is exact when distinct n-grams ≤ maxBuf and an
  * approximation beyond that.
  */
class NGramsTopK(n: Int, k: Int, maxBuf: Int = 20000)
    extends Aggregator[Seq[String], Map[String, Long], Seq[(String, Long)]] {
  require(n >= 1 && k >= 1 && maxBuf >= k)

  override def zero: Map[String, Long] = Map.empty

  private def prune(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= 2 * maxBuf) m
    else m.toSeq.sortBy { case (g, c) => (-c, g) }.take(maxBuf).toMap

  override def reduce(buf: Map[String, Long], toks: Seq[String]): Map[String, Long] = {
    if (toks == null || toks.length < n) return buf
    var m = buf
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      val gram = toks.slice(i, i + n).mkString(" ")
      m = m.updated(gram, m.getOrElse(gram, 0L) + 1L)
      i += 1
    }
    prune(m)
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val (small, big) = if (a.size < b.size) (a, b) else (b, a)
    prune(small.foldLeft(big) { case (m, (g, c)) =>
      m.updated(g, m.getOrElse(g, 0L) + c)
    })
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (g, c) => (-c, g) }.take(k)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object NGramsTopK {
  /** Register as SQL UDAF `ngrams_topk_<n>_<k>` style isn't needed —
    * one canonical registration with fixed (n,k) per use-site: */
  def register(spark: org.apache.spark.sql.SparkSession, name: String,
               n: Int, k: Int, maxBuf: Int = 20000): Unit =
    spark.udf.register(name,
      org.apache.spark.sql.functions.udaf(new NGramsTopK(n, k, maxBuf), ExpressionEncoder[Seq[String]]()))
}
