package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-version-proof float discipline for the oracle corpus.
  *
  * Two queries (graph_sssp r06+r07, events_twap r07) passed bit-exactly
  * under local DuckDB 1.0.0 yet failed the round driver's DuckDB hash —
  * both were the only oracled projections computing with raw IEEE
  * doubles out of decimal-form literals. Root cause, measured locally:
  * a decimal-form literal (`1000000.0`) parses as DECIMAL in BOTH
  * engines, but Spark then runs *decimal division* (result scale from
  * Spark's promotion rules) while DuckDB 1.0.0's `/` always converts to
  * DOUBLE — and newer DuckDB builds changed that. Exponent-form
  * literals (`1e6`) parse as DOUBLE in both engines, making the whole
  * computation correctly-rounded IEEE and therefore bit-identical
  * regardless of engine version.
  *
  * This spec freezes the audit of that exposure class (round-8 sweep):
  *
  *  1. Every oracle whose SQL divides adjacent to a decimal-form
  *     literal must carry a reviewed justification:
  *       - DoubleOperand: the other operand is DOUBLE-typed, so both
  *         engines promote the division to double (identical IEEE).
  *       - ExactGrid: the quotient feeds FLOOR/CEIL + an integer cast
  *         and its fractional part is either exactly representable at
  *         both engines' precisions or bounded away from the rounding
  *         boundary by far more than one ulp (e.g. n/20.0 is 2-decimal
  *         exact; EPOCH_US(ts)/3600000000.0 sits >= 1/divisor away
  *         from the next integer, >> ulp at that magnitude).
  *     Anything NOT in the pinned map fails this suite until reviewed —
  *     or, better, is spelled with `1e6`-style double literals so the
  *     lint never fires.
  *
  *  2. The set of ROUND-using oracles is pinned verbatim. ROUND on a
  *     pure-double value is stable across engines only because the
  *     input doubles are bit-identical (rule 1) and ties sit off the
  *     rounding grid; adding a new ROUND query without reviewing that
  *     argument is how r06/r07 lost a round each. New entries must be
  *     added here consciously, with grid-exact or integer inputs.
  */
class FloatDisciplineSpec extends AnyFunSuite {

  // decimal-form float literal NOT in exponent notation, e.g. 20.0 but
  // not 1.0E9 / 6.0E0 / part of a longer number or identifier
  private val DecLit = """(?<![\w.])\d+\.\d+(?![eE\d])""".r

  private def divAdjacent(sql: String): Boolean =
    DecLit.findAllMatchIn(sql).exists { m =>
      val before = sql.substring(0, m.start).reverse.dropWhile(_.isWhitespace).headOption
      val after  = sql.substring(m.end).dropWhile(_.isWhitespace).headOption
      before.contains('/') || after.contains('/')
    }

  /** Reviewed decimal-literal divisions (round-8 audit; see Scaladoc). */
  private val reviewedDivisions: Map[String, String] = Map(
    "agg_trimmed_mean"           -> "ExactGrid",     // FLOOR(n/20.0): 2-decimal exact
    "agg_winsorized_mean"        -> "ExactGrid",     // FLOOR(n/20.0)
    "text_perplexity"            -> "ExactGrid",     // micro-int sum /1e6-lit:
                                                     // integer-valued double
                                                     // over an exact power-of-10
                                                     // grid (r13 boundary fix)
    "ann_mmr_rerank"             -> "DoubleOperand", // lambda x is DOUBLE
    "ann_quantized_topk"         -> "DoubleOperand", // max|x| over DOUBLE[] / 127.0
    "cluster_centroids"          -> "DoubleOperand", // (s/n) int/int -> double, then /1e6-lit
    "cluster_kmeans_assign"      -> "DoubleOperand",
    "curation_dsir"              -> "DoubleOperand", // CAST(wq AS DOUBLE)/1e9-lit
    "dedup_incremental_semantic" -> "DoubleOperand",
    "dedup_semantic"             -> "DoubleOperand",
    "dedup_semantic_prune"       -> "DoubleOperand",
    "dedup_semantic_saltsplit"   -> "DoubleOperand", // same qe/1e6-lit
                                                     // chain as dedup_semantic
                                                     // (kmeansCtes rule)
    "embed_quantize_int8"        -> "DoubleOperand",
    "embed_random_projection"    -> "DoubleOperand", // list_reduce over DOUBLE
    "events_cohort_retention"    -> "ExactGrid",     // FLOOR(us/604800000000.0)->BIGINT
    "events_gap_fill"            -> "ExactGrid",     // FLOOR(us/3600000000.0)->BIGINT
    "events_rate_anomaly"        -> "ExactGrid",
    "graph_adamic_adar"          -> "DoubleOperand", // 1e6-lit/LN(double); CAST DOUBLE/1e6-lit
    "graph_mst_boruvka"          -> "ExactGrid",     // FLOOR(1000000.0/w)->BIGINT, frac >= 1/w
    "graph_pagerank"             -> "ExactGrid",     // FLOOR(17.0*s/20.0): 2-decimal exact
    "graph_ppr"                  -> "ExactGrid",     // same FLOOR(17.0*s/20.0) grid
    "graph_sssp"                 -> "ExactGrid",     // FLOOR(1000000.0/w)->BIGINT
    "math_fns"                   -> "ExactGrid",     // p_size/100.0: 2-decimal exact pre-EXP
    "pack_sequences"             -> "ExactGrid",     // CEIL(n/2048.0): binary-exact divisor
    "pipeline_curate_ppl"        -> "ExactGrid",     // text_perplexity's micro-int
                                                     // sum /1e6-lit spelling,
                                                     // verbatim (r17 ADVICE fix)
    "q17_small_qty_revenue"      -> "DoubleOperand", // CAST(... AS DOUBLE)/7.0
    "sample_coreset"             -> "DoubleOperand",
    "sample_neyman"              -> "ExactGrid",     // FLOOR(...)->BIGINT quantizations
    "stats_logistic_irls"        -> "DoubleOperand", // 1e6-lit/(1.0+EXP(double))
    "stats_calibration"          -> "DoubleOperand", // same irls sigmoid chain
    "pipeline_quality_classifier" -> "DoubleOperand", // same irlsIter chain
    "text_drift_psi"             -> "ExactGrid",     // FLOOR(n/100.0)->INT
    "text_textrank"              -> "ExactGrid",     // FLOOR(17.0*s/20.0): 2-decimal exact (graph_pagerank rule)
    "text_langid_nb"             -> "DoubleOperand", // 1.0/CAST(... AS DOUBLE)
    "text_tokens"                -> "ExactGrid",     // CEIL(len/4.0): binary-exact divisor
    "window_rfm_segmentation"    -> "ExactGrid"      // FLOOR(us/86400000000.0)->BIGINT
  )

  /** Oracles allowed to use ROUND (round-8 audit: each rounds either a
    * bit-identical-by-rule-1 double or an exact integer/decimal). */
  private val reviewedRound: Set[String] = Set(
    "agg_equidepth_hist", "agg_geomean", "agg_histogram_numeric",
    "agg_percentile", "agg_skew_kurtosis", "agg_stats",
    "agg_trimmed_mean", "agg_weighted_percentile", "agg_winsorized_mean",
    "ann_cosine_topk", "ann_ivf_probe", "ann_lsh_bucketed",
    "ann_lsh_probe_indexed",     // same shared AnnLshTopkOracleSql text
    "ann_lsh_probe_incremental", // as ann_lsh_bucketed (ROUND(cos,6))
    "ann_lsh_probe_migrated",    // same shared AnnLshTopkOracleSql text
    "ann_lsh_probe_deleted",     // AnnLshTopkOracleSql + integer delete
                                 // predicate only (no new float ops)
    "embed_hard_negatives", // ROUND(cos,6): ann_cosine_topk rule
    "eval_retrieval", // ROUND(cos,6) orders the retrieval leg only
                      // (ann_cosine_topk rule); all metrics are integer
                      // micro units from ranks
    "acid_stream_ingest", // ROUND(value*1000)->BIGINT: exact milli grid
    "acid_auto_compact",  // ROUND(qty/price*100)->BIGINT: exact cents grid
    "q1_pricing_summary", // ROUND(money*100|*1e6)->BIGINT: exact grids —
                          // r13 sf1 sweep caught CAST(double AS DECIMAL)
                          // rounding through different engine paths
    "stats_bootstrap_poisson", // ROUND(price*100)->BIGINT: exact cents grid
    "stats_did",               // ROUND(price*100)->BIGINT: exact cents grid
    "stats_bootstrap_median",  // same cents grid
    "pipeline_rag", // ROUNDs order the retrieval legs only (hybrid_rrf
                    // rule: bit-identical doubles); projection is integer
    "ann_mmr_rerank", "ann_quantized_topk", "cluster_centroids",
    "cluster_kmeans_assign", "curation_dsir", "curation_temperature_mix",
    "dedup_clusters", "dedup_containment", "dedup_edit_verify",
    "dedup_embedding_cosine", "dedup_embedding_lsh", "dedup_keep_best",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_semantic",
    "dedup_semantic_saltsplit", // ROUND(cos,6) on rule-1 bit-identical
                                // doubles — the dedup_semantic rule
                                // with the salt replacing the cluster
    // inherit OraclePairsCte's ROUND(jaccard) — the dedup pair rule;
    // their own projections are pure integers
    "dedup_cluster_stats", "pipeline_dedup_report",
    "curation_dedup_aware_sample",
    "text_decontaminate_fuzzy", // ROUND(MAX(jaccard)): minhash_lsh rule
    "embed_pca_power", "embed_quantize_int8", "embed_winsorize",
    "events_active_users", "events_attribution", "events_autocorr",
    "events_changepoint", "events_cohort_ltv", "events_decay_feature",
    "events_funnel", "events_interarrival", "events_markov_transitions",
    "events_outliers_mad", "events_rate_anomaly",
    "events_seasonal_anomaly", "events_ses_forecast",
    "events_des_brown", // same IEEE-identical-fold rule as ses_forecast
    "events_holt_winters", // IEEE-identical folds + exact-int sums; ses rule
    "events_survival_km", "feature_scale", "graph_adamic_adar",
    "graph_assoc_rules", "graph_assortativity", "graph_local_clustering",
    "join_hive_bucketed_colocated", // ROUND(price*100)->BIGINT: cents grid
    // graph_pagerank: un-pinned round 9 — the ROUND(q/1e6) display
    // twin was removed; the projection is pure exact-integer pr_q now
    "graph_modularity", "join_pit_scd2",
    "link_jaro_winkler", "math_fns", "pipeline_curate",
    "pipeline_curate_ppl", "pipeline_train_report", "profile_benford",
    "pipeline_quality_classifier", // ROUND(coef, 6): irls rule

    "recsys_item_sim", "recsys_user_cf", "sample_coreset",
    "sample_neyman", "sample_weighted_aes", "search_hybrid_rrf",
    "sort_array_struct",  // ROUND(bal*100)->BIGINT: exact cents grid
    "source_rcfile_scan", // ROUND(bal*100)->BIGINT: exact cents grid
    "source_export_import", // ROUND(price*100)->BIGINT: cents grid
    "source_export_partition", // ROUND(s_acctbal*100)->BIGINT: cents
                            // grid (round-12 review: same idiom and
                            // column as source_load_data; exact on
                            // the 2-dp TPC-H grid)
    "source_load_data",     // ROUND(s_acctbal*100)->BIGINT: cents grid
                            // (round-11 review: identical idiom to
                            // source_export_import on the same column
                            // family; exact on the 2-dp TPC-H grid)
    "catalog_metastore_stats", // ROUND(bal*100)->BIGINT: cents grid
    "catalog_partition_pruned_scan", // ROUND(price*100)->BIGINT: cents grid
    "source_schema_evolution", // ROUND(price*100)->BIGINT: cents grid
    "uniontype_encode",   // ROUND(price*100)->BIGINT: exact cents grid
    "stats_conformal", // ROUND(q̂,6): an order statistic of bit-identical
                       // IEEE scores (rule-1 doubles end to end)
    "stats_anova", "stats_chisq", "stats_corr_matrix", "stats_cuped",
    "stats_delta_method", "stats_gini", "stats_hill", "stats_kendall",
    "stats_kruskal", "stats_ks", "stats_logistic_irls",
    "stats_mann_kendall", // ROUND(z,6): one IEEE chain on exact integers
    "stats_sprt", // ROUND(llr,6): LN chain on exact integer (n, s)
    "stats_calibration", // ROUND(p,9) + cents grid: the irls rule
    "stats_mannwhitney", "stats_ols2", "stats_proportion_ztest",
    "stats_regression", "stats_spearman", "stats_theilsen", "stats_ttest",
    "text_bm25_topk", "text_drift_psi", "text_entropy", "text_langid",
    "text_langid_nb", "text_langid_trigram", "text_perplexity",
    "text_pmi_bigrams", "text_quality", "text_rake", "text_readability",
    "text_repetition", "text_skipgram_cooc", "text_source_similarity",
    "text_tfidf_keywords", "text_zipf_slope",
    "text_heaps_law", // ROUND(ln,9) grid + DECIMAL sums: the zipf rule
    "window_abc_analysis",
    "window_drawdown", "window_monthly_trend", "window_rolling_stats"
  )

  test("every decimal-literal division in an oracle is reviewed") {
    val flagged = SparkEntry.oracleSql.collect {
      case (name, sql) if divAdjacent(sql) => name
    }.toSet
    val unreviewed = flagged -- reviewedDivisions.keySet
    assert(
      unreviewed.isEmpty,
      s"oracles with unreviewed decimal-literal division $unreviewed — " +
        "spell the literal as 1e6-style DOUBLE (preferred) or add a " +
        "reviewed DoubleOperand/ExactGrid entry to reviewedDivisions")
  }

  test("the reviewed-division pin list carries no stale entries") {
    val flagged = SparkEntry.oracleSql.collect {
      case (name, sql) if divAdjacent(sql) => name
    }.toSet
    val stale = reviewedDivisions.keySet -- flagged
    assert(stale.isEmpty, s"pinned but no longer flagged (remove): $stale")
  }

  test("ROUND usage in oracles matches the reviewed pin set exactly") {
    val rnd = """(?i)\bROUND\s*\(""".r
    val using = SparkEntry.oracleSql.collect {
      case (name, sql) if rnd.findFirstIn(sql).isDefined => name
    }.toSet
    assert((using -- reviewedRound).isEmpty,
      s"new ROUND-using oracles need review: ${using -- reviewedRound}")
    assert((reviewedRound -- using).isEmpty,
      s"pinned but no longer using ROUND (remove): ${reviewedRound -- using}")
  }
}
