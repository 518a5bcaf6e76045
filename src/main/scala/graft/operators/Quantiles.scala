package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantile cutoffs with bounded single-task state —
  * the corpus-level gate primitive (CCNet-style head/middle perplexity
  * cuts, quality-score floors, drift thresholds).
  *
  * Semantics: `exactCutoff(df, v, num, den)` returns the smallest value
  * t in column `v` such that `count(v <= t) * den >= n * num` — i.e.
  * the exact num/den quantile on the VALUE domain, ties inclusive, all
  * comparisons in integer arithmetic (no division, no float rank).
  *
  * Why two levels (r16 verdict #1): a single cumulative window over
  * `groupBy(v)` is "value domain" in name only — when v is a 6-dp
  * rounded per-row statistic, |distinct v| ~ n and the unpartitioned
  * window is a single-task sort of the corpus. Here the window state is
  * bounded by the value RANGE instead:
  *
  *   level 1  groupBy(FLOOR(v)) — occupied integer buckets, bounded by
  *            the range of v (perplexity spans e^0..e^~20, so at most a
  *            few hundred thousand buckets at ANY corpus size; each is
  *            one (g, count) pair). One unpartitioned cumulative window
  *            over those grid rows locates the boundary bucket g* =
  *            min g with C(g)*den >= n*num, and a single (g*, docs
  *            below g*, n) row crosses to the driver.
  *   level 2  the same cumulative criterion over distinct v INSIDE
  *            bucket g* only. Callers feed grid-rounded values (the
  *            repo-wide ROUND(x, 6) discipline), so one unit bucket
  *            holds <= 10^6 distinct values regardless of corpus size —
  *            a genuinely bounded domain. t = min v with
  *            (below + cumIn(v)) * den >= n * num.
  *
  * Exactness: cum(v) = below(g*) + cumIn(v) for every v in bucket g*,
  * and the first v meeting the global criterion must lie in g* (buckets
  * before g* sit strictly under the cut by g*'s minimality, and g*'s
  * last value meets it) — so the two-level t is byte-identical to the
  * one-level t at every scale. Empty input returns -Infinity (an
  * always-false `v <= t` gate downstream, not an NPE).
  *
  * Reference analog: Hive's bounded-state percentile is the
  * GenericUDAFPercentileApprox histogram sketch (approximate); this is
  * the same bounded-state discipline made exact, which the oracle
  * compare requires.
  */
object Quantiles {

  /** Level-2 refine DataFrame, exposed for the PlanQualitySpec gate:
    * the unpartitioned cumulative window must sit ABOVE the g* bucket
    * filter (bounded domain), never over the raw value column. */
  private[graft] def refineDf(v: DataFrame, gstar: Long, below: Long,
                              n: Long, num: Long, den: Long): DataFrame = {
    val wIn = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v.where(floor(col("v")).cast("long") === gstar)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wIn))
      .where((col("cum") + lit(below)) * den >= lit(n) * num)
  }

  /** Level-1 boundary-bucket DataFrame (one row), exposed for the
    * PlanQualitySpec gate: the unpartitioned cumulative window runs
    * over the FLOOR(v) integer-grid AGGREGATE (bounded by the value
    * range), never over the raw rows. */
  private[graft] def gridHitDf(v: DataFrame,
                               num: Long, den: Long): DataFrame = {
    val wg = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    v.groupBy(floor(col("v")).cast("long").as("g"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wg))
      .withColumn("n", sum(col("c")).over(wAll))
      .where(col("cum") * den >= col("n") * num)
      .orderBy(col("g")).limit(1)
      .select(col("g"), (col("cum") - col("c")).as("below"), col("n"))
  }

  /** Smallest t in `values(valueCol)` with count(<= t)*den >= n*num;
    * -Infinity when the input is empty. Two collects, each one row. */
  def exactCutoff(values: DataFrame, valueCol: String,
                  num: Long, den: Long): Double = {
    require(num >= 0 && den > 0 && num <= den,
      s"quantile fraction must be in [0, 1]: $num/$den")
    // NaN is excluded like NULL (r17 review finding): Spark's
    // double→long cast sends FLOOR(NaN) to bucket 0, silently counting
    // unscored rows below every real value and skewing n — and a
    // DuckDB twin of a caller's gate would ERROR on the same cast, the
    // worst cross-engine divergence class. Unscored rows don't vote.
    val v = values.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
    val hit = gridHitDf(v, num, den).collect()
    if (hit.isEmpty) Double.NegativeInfinity
    else {
      val (gstar, below, n) =
        (hit(0).getLong(0), hit(0).getLong(1), hit(0).getLong(2))
      refineDf(v, gstar, below, n, num, den)
        .agg(min(col("v"))).collect()(0).getDouble(0)
    }
  }
}
