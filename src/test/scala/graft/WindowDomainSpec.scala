package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Unpartitioned-window domain gate (r17, generalizing the
  * curate_ppl-quantile verdict item to the whole suite).
  *
  * An unpartitioned window is a single-task sort of its input — fine
  * when the input is BOUNDED (a value grid, a time grid, a fixed
  * dimension, a top-k), a silent scale-killer when the input grows
  * with the corpus (the r16 curate_ppl threshold ran one task over
  * ~|docs| distinct values while its comment claimed bounded state).
  * This spec walks the ANALYZED plan of every driver query, counts
  * Window nodes with an empty partitionSpec, and pins each query that
  * has any against a reviewed domain classification:
  *
  *  - grid: the window reads a GROUP BY aggregate over a value/time
  *    grid bounded by a RANGE (price cents, hours, days, FLOOR
  *    buckets) — the Quantiles discipline.
  *  - topk: the input is LIMIT/top-k'd before the window.
  *  - dim: the input is a bounded dimension (sources, priorities,
  *    brands, calibration bins).
  *  - ranked-report: the global order IS the operator's contract
  *    (reference window-function parity, packing orders, Zipf ranks) —
  *    the documented deployment path is partitioning by key, a grid
  *    decomposition, or a top-k cut; the parity query keeps the exact
  *    global form.
  *
  * A NEW query (or a new window in a pinned one) fails until reviewed
  * here. Counts are analyzed-plan Window NODES (one node can hold
  * several window expressions over the same spec).
  */
class WindowDomainSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark

  /** query -> (unpartitioned-window node count, reviewed domain class) */
  private val inventory: Map[String, (Int, String)] = Map(
    "ann_pq_adc"            -> (1, "topk: rerank over the probe batch's candidates"),
    "ann_pq_adc_indexed"    -> (1, "topk: rank window above the LIMIT 10 ADC cut (TakeOrderedAndProject feeds it 10 rows)"),
    "ann_pq_ivf_probe"      -> (1, "topk: rank window above the LIMIT 10 ADC cut over the probed cells' candidates"),
    "curation_curriculum"   -> (1, "topk: global position assigned after LIMIT 50"),
    "curation_quota_fill"   -> (1, "dim: largest-remainder apportionment over the source dimension"),
    "events_bursts"         -> (1, "grid: island grouping over the hourly aggregate"),
    "events_changepoint"    -> (2, "grid: CUSUM over the daily aggregate"),
    "events_outliers_mad"   -> (2, "grid: median-of-daily + MAD over the daily aggregate"),
    "events_survival_km"    -> (2, "grid: KM product over the distinct-duration domain"),
    "pipeline_rag"          -> (4, "topk: lex/dense/fused ranks over LIMIT 10/5; packing over top-5 docs' chunks"),
    "profile_skew"          -> (2, "grid+topk: count-of-counts cumulative; top-10 hot keys"),
    "recsys_als_step"       -> (1, "dim: DENSE_RANK over the brand dimension"),
    "search_hybrid_rrf"     -> (2, "topk: both rankings top-k before the rank windows (PlanQualitySpec gate)"),
    "skyline_orders"        -> (1, "grid: staircase prefix over FLOOR(x/50000) buckets, never the fact table"),
    "stats_calibration"     -> (1, "dim: reliability bins"),
    "stats_chisq"           -> (2, "dim: priority x status cells"),
    "stats_hill"            -> (1, "topk: rank over the top-101 tail"),
    "stats_kruskal"         -> (1, "grid: doubled mid-ranks from the whole-dollar value histogram (r17 rewrite)"),
    "stats_ks"              -> (1, "grid: two cumulative sums over the distinct-value domain"),
    "stats_mannwhitney"     -> (1, "grid: doubled mid-ranks from the cents value histogram (r17 rewrite)"),
    "stats_sprt"            -> (1, "grid: sequential looks over the weekly aggregate"),
    "stats_theilsen"        -> (2, "grid: slopes of one year's daily aggregate pairs"),
    "text_zipf_slope"       -> (1, "ranked-report: freq rank over the vocabulary (Heaps-sublinear; deployment cut = top-k fit)"),
    "window_abc_analysis"   -> (1, "ranked-report: cumulative revenue share over the product catalog (global ABC is the contract)"),
    "window_drawdown"       -> (1, "grid: running peak over the daily aggregate"),
    "window_monthly_trend"  -> (1, "grid: LAG over the monthly aggregate"),
    "window_ntile_cume"     -> (1, "ranked-report: Hive global NTILE/PERCENT_RANK/CUME_DIST parity over the supplier dimension"),
    "window_range_frame"    -> (1, "topk: o_orderkey <= 1000 probe slice"),
    "window_rfm_segmentation" -> (3, "ranked-report: global RFM quartiles over the per-customer aggregate (1 row/customer; the scale-safe place for the parity NTILE)"),
    "window_rolling_stats"  -> (1, "grid: rolling frame over the daily aggregate")
  )

  private lazy val detected: Map[String, Int] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, LocalSpark.sf).queryExecution.analyzed.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }.size
      if (n > 0) Some(name -> n) else None
    }.toMap

  test("every query's unpartitioned windows are domain-reviewed, at pinned counts") {
    val unreviewed = detected.keySet -- inventory.keySet
    assert(unreviewed.isEmpty,
      s"queries with UNREVIEWED unpartitioned windows (single-task sort " +
        s"at scale unless the domain is bounded): ${unreviewed.toSeq.sorted} " +
        "— classify in WindowDomainSpec.inventory as grid/topk/dim/ranked-report")
    val drifted = detected.collect {
      case (k, n) if inventory(k)._1 != n => (k, inventory(k)._1, n)
    }
    assert(drifted.isEmpty,
      s"window-node count changed (new or removed unpartitioned window " +
        s"— re-review the domain): $drifted")
  }

  test("the window inventory carries no stale entries") {
    val stale = inventory.keySet -- detected.keySet
    assert(stale.isEmpty, s"pinned but no longer detected (remove): ${stale.toSeq.sorted}")
  }
}
