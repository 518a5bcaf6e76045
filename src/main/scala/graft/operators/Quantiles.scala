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

  /** Declared value-domain class of a cutoff statistic (r17 verdict
    * residual #1 made a GATE): `maxAbs` bounds |v| — it sizes the
    * level-1 grid and is RUNTIME-ENFORCED (a value outside the
    * declared range fails loudly instead of silently re-growing the
    * grid window); `gridStep` is the caller's rounding grid — it
    * documents the level-2 in-bucket cardinality bound. Wide-range
    * statistics get a coarse bucket `width` > 1 derived from `maxAbs`
    * so the grid stays under `MaxGridBuckets` at any declared range;
    * the capacity trade is checked at construction: buckets ≤
    * MaxGridBuckets AND width/gridStep ≤ MaxInBucket, so BOTH window
    * domains stay bounded for every registered class. New callers must
    * register their class in `Domains` — QuantilesSpec pins the
    * registry and fails the build on an unregistered construction. */
  final case class ValueDomain(name: String, maxAbs: Double, gridStep: Double) {
    require(maxAbs > 0 && gridStep > 0, s"degenerate domain $name")
    /** Coarse level-1 bucket width: 1 for ranges within the grid cap,
      * wider for heavy-tailed statistics. */
    val width: Long =
      math.max(1L, math.ceil(2.0 * maxAbs / MaxGridBuckets).toLong)
    require(2.0 * maxAbs / width <= MaxGridBuckets + 1,
      s"domain $name: ${2 * maxAbs / width} level-1 buckets exceed the grid cap")
    require(width / gridStep <= MaxInBucket,
      s"domain $name: ${width / gridStep} in-bucket values exceed the " +
        "level-2 cap — coarsen gridStep or shrink maxAbs")
  }

  /** Both window-state caps, sized to the r17 measurement (the 1e6-ish
    * domains each refine in one grid job + one in-bucket job; see
    * header). */
  private val MaxGridBuckets = 4e6
  private val MaxInBucket = 4e6

  /** The REVIEWED domain registry — every production `exactCutoff`
    * caller names its class here; QuantilesSpec pins the contents. */
  object Domains {
    /** CCNet-style corpus perplexity (pipeline_curate_ppl): 6-dp
      * rounded, positive, bounded well under 1e6 by the bigram-LM
      * construction (measured ≲ 4e3 at sf0.001-sf10). */
    val Perplexity6dp = ValueDomain("perplexity_6dp", 1e6, 1e-6)
    private[graft] val reviewed: Set[ValueDomain] = Set(Perplexity6dp)
  }

  /** Level-2 refine DataFrame, exposed for the PlanQualitySpec gate:
    * the unpartitioned cumulative window must sit ABOVE the g* bucket
    * filter (bounded domain), never over the raw value column. */
  private[graft] def refineDf(v: DataFrame, gstar: Long, below: Long,
                              n: Long, num: Long, den: Long,
                              width: Long = 1L): DataFrame = {
    val wIn = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v.where(floor(col("v") / width).cast("long") === gstar)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wIn))
      .where((col("cum") + lit(below)) * den >= lit(n) * num)
  }

  /** Level-1 boundary-bucket DataFrame (one row), exposed for the
    * PlanQualitySpec gate: the unpartitioned cumulative window runs
    * over the FLOOR(v / width) integer-grid AGGREGATE (bounded by the
    * declared value range), never over the raw rows. `gabs` carries
    * the grid's observed |g| maximum so the caller can enforce the
    * declared range at zero extra cost (same job, same window pass). */
  private[graft] def gridHitDf(v: DataFrame, num: Long, den: Long,
                               width: Long = 1L): DataFrame = {
    val wg = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    v.groupBy(floor(col("v") / width).cast("long").as("g"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wg))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("gabs", max(abs(col("g"))).over(wAll))
      .where(col("cum") * den >= col("n") * num)
      .orderBy(col("g")).limit(1)
      .select(col("g"), (col("cum") - col("c")).as("below"), col("n"),
        col("gabs"))
  }

  /** Smallest t in `values(valueCol)` with count(<= t)*den >= n*num;
    * -Infinity when the input is empty. Two collects, each one row.
    * `domain` is the caller's REGISTERED value-domain class — it sizes
    * the level-1 grid and is enforced against the data. */
  def exactCutoff(values: DataFrame, valueCol: String,
                  num: Long, den: Long, domain: ValueDomain): Double = {
    require(num >= 0 && den > 0 && num <= den,
      s"quantile fraction must be in [0, 1]: $num/$den")
    require(Domains.reviewed.contains(domain),
      s"value domain '${domain.name}' is not in Quantiles.Domains — " +
        "register (and review) the new caller's domain class")
    // NaN is excluded like NULL (r17 review finding): Spark's
    // double→long cast sends FLOOR(NaN) to bucket 0, silently counting
    // unscored rows below every real value and skewing n — and a
    // DuckDB twin of a caller's gate would ERROR on the same cast, the
    // worst cross-engine divergence class. Unscored rows don't vote.
    val v = values.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
    val hit = gridHitDf(v, num, den, domain.width).collect()
    if (hit.isEmpty) Double.NegativeInfinity
    else {
      val (gstar, below, n, gabs) =
        (hit(0).getLong(0), hit(0).getLong(1), hit(0).getLong(2),
          hit(0).getLong(3))
      val maxBucket = math.floor(domain.maxAbs / domain.width).toLong
      if (gabs > maxBucket)
        throw new IllegalStateException(
          s"value outside the declared '${domain.name}' domain " +
            s"(|bucket| $gabs > $maxBucket for maxAbs ${domain.maxAbs}, " +
            s"width ${domain.width}) — the level-1 grid would re-grow " +
            "past its reviewed bound; widen the registered domain")
      refineDf(v, gstar, below, n, num, den, domain.width)
        .agg(min(col("v"))).collect()(0).getDouble(0)
    }
  }
}
