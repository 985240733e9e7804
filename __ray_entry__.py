"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

No ``ray.init`` / ``ray.shutdown`` here or in the library code these
callables use — the driver owns the Ray session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on sf0.001: Common-Crawl-style pages synthesized
    deterministically FROM the sf0.001 documents+events tables (url/html
    wrapped around each document, crawl timestamps from the event stream) →
    deterministic text extraction → url-hierarchy keys → salted 1h/1d/7d tier
    cascade. Returns the 1h tier Dataset."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from forecastframe_ray.pipelines import web

    sf_dir = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "source"])

    def to_pages(b: pd.DataFrame) -> pa.Table:
        import html as _html
        urls, htmls, ts = [], [], []
        for doc_id, text, source in zip(b["doc_id"], b["text"], b["source"]):
            host = f"{source}.example.com".lower().replace(" ", "-")
            urls.append(f"https://{host}/doc/{doc_id}")
            htmls.append((
                f"<html><head><title>doc {doc_id}</title></head>"
                f"<body><p>{_html.escape(text)}</p></body></html>"
            ).encode("utf-8"))
            # deterministic crawl timestamp: spread over 28 days by doc_id
            ts.append(1_704_067_200_000_000 +
                      (int(doc_id) * 9_999_999_989) % (28 * 86_400_000_000))
        return pa.table({
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
        })

    pages = docs.map_batches(to_pages, batch_format="pandas")
    prepared = web.prepare_pages(pages)
    tiers = web.build_tiers(prepared, series_keys=("host",), num_salts=4)
    return tiers["1h"]


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 and the
    training-data stages (dedup / similarity / text analysis / multimodal)."""
    from forecastframe_ray.pipelines import queries as Q

    return {
        # tier rollup cascade (north_rule flagship, A1)
        "tier_1h_events": Q.q_tier_1h_events,
        "tier_1d_events": Q.q_tier_1d_events,
        "tier_7d_events": Q.q_tier_7d_events,
        # keyed window stage ops (W1-W9)
        "lag_daily_events": Q.q_lag_daily_events,
        "diff_daily_events": Q.q_diff_daily_events,
        "pct_change_daily_events": Q.q_pct_change_daily_events,
        "rolling7_daily_events": Q.q_rolling7_daily_events,
        "rolling_median_daily": Q.q_rolling_median_daily,
        "threshold_daily_events": Q.q_threshold_daily_events,
        "days_since_release_events": Q.q_days_since_release_events,
        "gapfill_ffill_hourly_events": Q.q_gapfill_ffill_hourly_events,
        "interpolate_hourly_events": Q.q_interpolate_hourly_events,
        "rollup_grouper_stats_events": Q.q_rollup_grouper_stats_events,
        "momentum_daily_events": Q.q_momentum_daily_events,
        "ewma_daily_events": Q.q_ewma_daily_events,
        "calendar_daily_events": Q.q_calendar_daily_events,
        # aggregations / scalers / encoding (M1-M8, A1-A6)
        "rollup_q1_lineitem": Q.q_rollup_q1_lineitem,
        "standardize_lineitem": Q.q_standardize_lineitem,
        "normalize_events": Q.q_normalize_events,
        "log1p_lineitem": Q.q_log1p_lineitem,
        "correct_negatives_events": Q.q_correct_negatives_events,
        "encode_priority_orders": Q.q_encode_priority_orders,
        "error_metrics_naive": Q.q_error_metrics_naive,
        # joins / sorts / distinct (J1-J6, O1-O7)
        "join_orders_customer": Q.q_join_orders_customer,
        "semi_join_orders": Q.q_semi_join_orders,
        "topk_orders": Q.q_topk_orders,
        "distinct_event_types": Q.q_distinct_event_types,
        # dedup / text / similarity / codec / multimodal
        "exact_dedup_documents": Q.q_exact_dedup_documents,
        "dup_counts_documents": Q.q_dup_counts_documents,
        "token_counts_documents": Q.q_token_counts_documents,
        "text_analysis_documents": Q.q_text_analysis_documents,
        "c4_boilerplate_documents": Q.q_c4_boilerplate_documents,
        "minhash_pairs_documents": Q.q_minhash_pairs_documents,
        "minhash_clusters_documents": Q.q_minhash_clusters_documents,
        "simhash_pairs_documents": Q.q_simhash_pairs_documents,
        "embedding_near_dup": Q.q_embedding_near_dup,
        "ann_bruteforce_embeddings": Q.q_ann_bruteforce_embeddings,
        "ann_ivf_embeddings": Q.q_ann_ivf_embeddings,
        "gorilla_roundtrip_events": Q.q_gorilla_roundtrip_events,
        "multimodal_decode": Q.q_multimodal_decode,
        # round-2 oracle-gap entries (S2-S4, M5, M7, M10, M11, J3, J4, A7,
        # W10, CV) + exact/gated variants of the approximate stages
        "descale_roundtrip_lineitem": Q.q_descale_roundtrip_lineitem,
        "decode_priority_orders": Q.q_decode_priority_orders,
        "compress_lineitem": Q.q_compress_lineitem,
        "remove_min_lags_daily": Q.q_remove_min_lags_daily,
        "merge_actuals_daily": Q.q_merge_actuals_daily,
        "update_values_daily": Q.q_update_values_daily,
        "future_frame_daily": Q.q_future_frame_daily,
        "save_load_roundtrip_events": Q.q_save_load_roundtrip_events,
        "missing_percentages_hourly": Q.q_missing_percentages_hourly,
        "cv_folds_daily": Q.q_cv_folds_daily,
        "text_ratios_documents": Q.q_text_ratios_documents,
        "embedding_neardup_exact": Q.q_embedding_neardup_exact,
        "ann_ivf_recall": Q.q_ann_ivf_recall,
        "ensemble_pred_daily": Q.q_ensemble_pred_daily,
        # Prophet-style Fourier regression, oracle-exact via the
        # harmonics-span-dow-indicators identity
        "fourier_dow_fit_daily": Q.q_fourier_dow_fit_daily,
        "ngram_jaccard_pairs": Q.q_ngram_jaccard_pairs,
        "minhash_recall": Q.q_minhash_recall,
        "simhash_recall": Q.q_simhash_recall,
        "lang_id_documents": Q.q_lang_id_documents,
        "search_cv_daily": Q.q_search_cv_daily,
        "error_metrics_by_type": Q.q_error_metrics_by_type,
        "sample_orders_deterministic": Q.q_sample_orders,
        "doc_fingerprint_documents": Q.q_doc_fingerprint_documents,
        "tier_incremental_1d_events": Q.q_tier_incremental_1d_events,
        "tier_retention_1h_events": Q.q_tier_retention_1h_events,
        # interpretation stack, data side (pipelines/interpret.py)
        "errors_describe_daily": Q.q_errors_describe_daily,
        "cv_fit_summary_daily": Q.q_cv_fit_summary_daily,
        "perm_importance_daily": Q.q_perm_importance_daily,
        # exact Linear-SHAP attributions (closed-form Shapley of OLS)
        "linear_shap_daily": Q.q_linear_shap_daily,
        "predict_future_daily": Q.q_predict_future_daily,
        "importance_summary_daily": Q.q_importance_summary_daily,
        "quantile_loss_naive": Q.q_quantile_loss_naive,
        "distinct_users_daily_kmv": Q.q_distinct_users_daily_kmv,
        "distinct_users_kmv_gate": Q.q_distinct_users_kmv_gate,
        "distinct_users_daily_cascade": Q.q_distinct_users_daily_cascade,
        "quantile_sketch_gate_daily": Q.q_quantile_sketch_gate_daily,
        "top_users_sketch_daily": Q.q_top_users_sketch_daily,
        "multimodal_resize": Q.q_multimodal_resize,
        "csv_roundtrip_events": Q.q_csv_roundtrip_events,
        "anti_join_orders": Q.q_anti_join_orders,
        # LLM-pipeline flagship (pipelines/llm.py)
        "llm_exact_funnel_documents": Q.q_llm_exact_funnel_documents,
        "llm_pipeline_documents": Q.q_llm_pipeline_documents,
        # real fitted estimator (per-series linear trend OLS/ridge)
        "predict_linear_daily": Q.q_predict_linear_daily,
        # as-of join (stages/join.py asof_join; oracle = DuckDB ASOF JOIN)
        "asof_join_events": Q.q_asof_join_events,
        # range (interval) join (stages/join.py range_join)
        "range_join_events": Q.q_range_join_events,
        # gap-based sessionization (stages/window_ops.op_sessionize)
        "sessionize_events": Q.q_sessionize_events,
        "session_stats_events": Q.q_session_stats_events,
        # expanding stats + row numbers (stages/window_ops)
        "expanding_daily_events": Q.q_expanding_daily_events,
        # hopping (sliding) event-time windows (pipelines/rollup.py)
        "hopping_3h1h_events": Q.q_hopping_3h1h_events,
        # reshape: pivot / melt (stages/reshape.py)
        "pivot_daily_events": Q.q_pivot_daily_events,
        "melt_roundtrip_daily": Q.q_melt_roundtrip_daily,
        # grouped top-k (stages/topk.py)
        "topk_per_type_events": Q.q_topk_per_type_events,
        # winsorize scaler (functions/scalers.winsorize_clip)
        "winsorize_events": Q.q_winsorize_events,
        # bloom-prefiltered exact semi-join (stages/bloom.py)
        "bloom_semi_join_orders": Q.q_bloom_semi_join_orders,
        # rolling correlation (stages/window_ops.op_rolling_corr)
        "rolling_corr_daily": Q.q_rolling_corr_daily,
        # PII redaction (pipelines/pii.py)
        "pii_redaction_documents": Q.q_pii_redaction_documents,
        # train/eval n-gram decontamination (pipelines/decontaminate.py)
        "decontaminate_documents": Q.q_decontaminate_documents,
        # Gopher repetition signals (pipelines/textstats.repetition_batch)
        "repetition_documents": Q.q_repetition_documents,
        # corpus construction (pipelines/corpus.py)
        "vocabulary_documents": Q.q_vocabulary_documents,
        "chunk_documents": Q.q_chunk_documents,
        # Gopher quality filter (pipelines/textstats.gopher_filter)
        "gopher_filter_documents": Q.q_gopher_filter_documents,
        # TF-IDF / unigram-LM corpus scoring (pipelines/tfidf.py)
        "tfidf_topterms_documents": Q.q_tfidf_topterms_documents,
        "unigram_logprob_documents": Q.q_unigram_logprob_documents,
        # exact-quota stratified sampling (stages/sample.py)
        "stratified_sample_orders": Q.q_stratified_sample_orders,
        # rolling-baseline anomaly flags (W1 composition)
        "anomaly_daily_events": Q.q_anomaly_daily_events,
        # CCNet quality buckets (pipelines/tfidf.quality_buckets)
        "quality_buckets_documents": Q.q_quality_buckets_documents,
        # cross-doc duplicate spans (pipelines/decontaminate.self_overlap)
        "dup_spans_documents": Q.q_dup_spans_documents,
        # percent rank within series (stages/window_ops.op_percent_rank)
        "percent_rank_daily": Q.q_percent_rank_daily,
        # PMI bigram collocations (pipelines/corpus.pmi_bigrams)
        "pmi_bigrams_documents": Q.q_pmi_bigrams_documents,
        # JSON property extraction (functions/scalar.extract_json_int)
        "json_props_events": Q.q_json_props_events,
        # per-label embedding centroids (pipelines/similarity)
        "label_centroids_embeddings": Q.q_label_centroids_embeddings,
        # CUSUM changepoint statistic (stages/window_ops.op_cusum)
        "cusum_daily_events": Q.q_cusum_daily_events,
        # additive seasonal decomposition (op_seasonal_decompose)
        "seasonal_decompose_daily": Q.q_seasonal_decompose_daily,
        # per-series lag-1/2 autocorrelation (distributed moment reduce)
        "acf_daily_events": Q.q_acf_daily_events,
        # grouped Spearman rank correlation (v vs its 7-day lag)
        # S1 pushdown read: predicate + column pruning at the scan
        # Holt double-exp smoothing forecast (degenerate-form oracle gate)
        "holt_forecast_gate_daily": Q.q_holt_forecast_gate_daily,
        # Croston intermittent-demand forecast (alpha=1 oracle gate)
        "croston_gate_daily": Q.q_croston_gate_daily,
        # SMAPE / WAPE / signed mean error of the naive forecast
        "smape_wape_naive_daily": Q.q_smape_wape_naive_daily,
        "pushdown_filter_events": Q.q_pushdown_filter_events,
        "spearman_daily_events": Q.q_spearman_daily_events,
        # Mann-Kendall monotone-trend statistic (S + tau-a)
        "mann_kendall_daily_events": Q.q_mann_kendall_daily_events,
        # Durbin-Levinson PACF lags 1-3 (closed-form from the ACF)
        "pacf_daily_events": Q.q_pacf_daily_events,
        # Schuster periodogram power at the weekly/monthly periods
        "periodogram_daily_events": Q.q_periodogram_daily_events,
        # shingle containment pairs (pipelines/dedup.ngram_containment)
        "containment_pairs_documents": Q.q_containment_pairs_documents,
        # trend/seasonal strength (Hyndman FPP3, from the decomposition)
        "decomposition_strength_daily": Q.q_decomposition_strength_daily,
        # CDC compaction: latest row per key (stages/agg.compact_latest)
        "latest_order_per_customer": Q.q_latest_order_per_customer,
        # GROUPING SETS partial-cascade rollup (pipelines/rollup)
        "grouping_sets_daily_events": Q.q_grouping_sets_daily_events,
        # Okapi BM25 keyword search (pipelines/tfidf.bm25_scores)
        "bm25_search_documents": Q.q_bm25_search_documents,
        # per-user behavioral entropy (hierarchical aggregate)
        "user_entropy_events": Q.q_user_entropy_events,
        # fixed-width distributed histogram (map-side binning)
        "value_histogram_events": Q.q_value_histogram_events,
        # OHLC bars via a custom mergeable arg-min/max combiner
        "ohlc_daily_events": Q.q_ohlc_daily_events,
        # irregular-gap rate of change (stages/window_ops.op_rate)
        "rate_hourly_events": Q.q_rate_hourly_events,
        # TPC-H Q3-style shipping priority (semi-join + hash join + topk)
        "shipping_priority": Q.q_shipping_priority,
        # cohort retention table (first-seen day x offset)
        "cohort_retention_events": Q.q_cohort_retention_events,
        # MASE of the seasonal-naive forecast (Hyndman & Koehler 2006)
        "mase_daily_events": Q.q_mase_daily_events,
        # conversion funnel: first view -> purchase within 7 days
        "funnel_conversion_events": Q.q_funnel_conversion_events,
        # first-order Markov transition counts over user streams
        "transition_counts_events": Q.q_transition_counts_events,
        # exact per-group percentiles (quantile_cont semantics)
        "value_percentiles_events": Q.q_value_percentiles_events,
        # S1 JSONL sink+source roundtrip
        "jsonl_roundtrip_events": Q.q_jsonl_roundtrip_events,
        # Theil-Sen robust trend per series
        "theilsen_daily_events": Q.q_theilsen_daily_events,
        # referential-integrity audit (FK orphan counts)
        "fk_violations": Q.q_fk_violations,
        # fuzzy token pairs at edit distance 1 (SymSpell blocking)
        "edit1_pairs_documents": Q.q_edit1_pairs_documents,
        # burstiness: Fano factor + CV per series
        "dispersion_daily_events": Q.q_dispersion_daily_events,
        # ntile(4) + cume_dist window twins
        "ntile_cume_daily": Q.q_ntile_cume_daily,
        # Heaps-law vocabulary growth by doc-id decile
        "vocab_growth_documents": Q.q_vocab_growth_documents,
        # inter-event gap stats per user
        "interevent_gaps_events": Q.q_interevent_gaps_events,
        # k-means E-step assignment to broadcast seed centroids
        "kmeans_assign_embeddings": Q.q_kmeans_assign_embeddings,
        # cross-series correlation matrix (pivot + moment reduce)
        "cross_corr_daily_events": Q.q_cross_corr_daily_events,
        # trailing rolling p90 (quantile_cont ROWS-frame twin)
        "rolling_p90_daily": Q.q_rolling_p90_daily,
        # week-over-week growth
        "wow_growth_daily": Q.q_wow_growth_daily,
        # gap-fill + per-series median imputation
        "median_impute_hourly": Q.q_median_impute_hourly,
        # per-source ingest audit profile
        "source_profile_documents": Q.q_source_profile_documents,
        # lang-ID confusion matrix vs labeled lang
        "lang_confusion_documents": Q.q_lang_confusion_documents,
        # robust median/MAD outlier flags (Hampel filter)
        "robust_zscore_daily": Q.q_robust_zscore_daily,
        # modal event type per user (grouped top-1)
        "favorite_type_per_user": Q.q_favorite_type_per_user,
        # LTTB visual downsample (rows-only: sequential selection chain;
        # pinned by tests/test_lttb.py against a reference implementation)
        "lttb_daily_events": Q.q_lttb_daily_events,
        # composition share of each type within its day
        "daily_share_events": Q.q_daily_share_events,
        # deterministic md5 train/val/test split
        "dataset_split_orders": Q.q_dataset_split_orders,
        # prediction post-processing: floor + normal-theory CIs
        "forecast_postprocess_daily": Q.q_forecast_postprocess_daily,
        "asymmetric_loss_naive": Q.q_asymmetric_loss_naive,
        # GPT-style fixed-context token-stream packing
        "pack_spans_documents": Q.q_pack_spans_documents,
        "pack_chunk_stats_documents": Q.q_pack_chunk_stats_documents,
        # temperature-based data-mixture sampling
        "mixture_plan_lang": Q.q_mixture_plan_lang,
        "mixture_sample_lang": Q.q_mixture_sample_lang,
        # Dickey-Fuller unit-root stationarity test per series
        "dickey_fuller_daily": Q.q_dickey_fuller_daily,
        "ljung_box_daily": Q.q_ljung_box_daily,
        "ts_strength_daily": Q.q_ts_strength_daily,
        "demand_classification_users": Q.q_demand_classification_users,
        "theta_forecast_gate_daily": Q.q_theta_forecast_gate_daily,
        "exact_dedup_keep_best_documents": Q.q_exact_dedup_keep_best_documents,
        "croston_sba_gate_daily": Q.q_croston_sba_gate_daily,
        "seasonal_naive_forecast_daily": Q.q_seasonal_naive_forecast_daily,
        "drift_forecast_daily": Q.q_drift_forecast_daily,
        "zipf_fit_documents": Q.q_zipf_fit_documents,
        "baseline_leaderboard_daily": Q.q_baseline_leaderboard_daily,
        "ses_naive_gate_daily": Q.q_ses_naive_gate_daily,
        "heaps_fit_documents": Q.q_heaps_fit_documents,
        "trimmed_mean_events": Q.q_trimmed_mean_events,
        "rolling_skew_daily": Q.q_rolling_skew_daily,
        "rolling_corr_market_daily": Q.q_rolling_corr_market_daily,
        "geo_harmonic_mean_lineitem": Q.q_geo_harmonic_mean_lineitem,
        "twap_daily_events": Q.q_twap_daily_events,
        "counter_increase_users": Q.q_counter_increase_users,
        "bollinger_daily_events": Q.q_bollinger_daily_events,
        "drawdown_daily_events": Q.q_drawdown_daily_events,
        "records_streaks_daily": Q.q_records_streaks_daily,
        "atr_daily_events": Q.q_atr_daily_events,
        "benford_lineitem": Q.q_benford_lineitem,
        "gini_users_events": Q.q_gini_users_events,
        "hampel_daily_events": Q.q_hampel_daily_events,
        "dow_profile_daily": Q.q_dow_profile_daily,
        "macd_daily_events": Q.q_macd_daily_events,
        "audience_overlap_events": Q.q_audience_overlap_events,
        "normalized_dedup_documents": Q.q_normalized_dedup_documents,
        "holt_winters_gate_daily": Q.q_holt_winters_gate_daily,
        "rolling_distinct_users_daily": Q.q_rolling_distinct_users_daily,
        "burstiness_users_events": Q.q_burstiness_users_events,
        "transition_entropy_events": Q.q_transition_entropy_events,
        "cms_user_counts_gate": Q.q_cms_user_counts_gate,
        "scd2_history_events": Q.q_scd2_history_events,
        "skew_profile_events": Q.q_skew_profile_events,
        "count_windows_users": Q.q_count_windows_users,
        "welch_ttest_events": Q.q_welch_ttest_events,
        "chisq_type_dow_events": Q.q_chisq_type_dow_events,
        "ks_two_sample_events": Q.q_ks_two_sample_events,
        "vwap_daily_events": Q.q_vwap_daily_events,
        "blocking_dedup_documents": Q.q_blocking_dedup_documents,
        "control_chart_daily": Q.q_control_chart_daily,
        "pareto_share_events": Q.q_pareto_share_events,
        "readability_documents": Q.q_readability_documents,
        "levenshtein_pairs_documents": Q.q_levenshtein_pairs_documents,
        "cuped_adjusted_users": Q.q_cuped_adjusted_users,
        "weighted_sample_orders": Q.q_weighted_sample_orders,
        "conversion_latency_events": Q.q_conversion_latency_events,
        "rfm_segments_users": Q.q_rfm_segments_users,
        "lorenz_deciles_users": Q.q_lorenz_deciles_users,
        "availability_islands_daily": Q.q_availability_islands_daily,
        "new_vs_returning_daily": Q.q_new_vs_returning_daily,
        "dau_wau_stickiness": Q.q_dau_wau_stickiness,
        "weekly_calendar_rollup": Q.q_weekly_calendar_rollup,
        "mtd_cumsum_daily": Q.q_mtd_cumsum_daily,
        "bowley_skew_events": Q.q_bowley_skew_events,
        "char_trigram_score_documents": Q.q_char_trigram_score_documents,
        "dup_class_histogram_documents": Q.q_dup_class_histogram_documents,
        "ttr_documents": Q.q_ttr_documents,
        "lead_lag_xcorr_daily": Q.q_lead_lag_xcorr_daily,
        "mannwhitney_events": Q.q_mannwhitney_events,
        "dow_anova_daily": Q.q_dow_anova_daily,
        "runs_test_daily": Q.q_runs_test_daily,
        "local_supplier_volume": Q.q_local_supplier_volume,
        "conversion_within_7d": Q.q_conversion_within_7d,
        "power_users_division": Q.q_power_users_division,
        "basket_lift_lineitem": Q.q_basket_lift_lineitem,
        "hhi_suppliers_lineitem": Q.q_hhi_suppliers_lineitem,
        "label_centroid_distances": Q.q_label_centroid_distances,
        "silhouette_embeddings": Q.q_silhouette_embeddings,
        "quantization_error_embeddings": Q.q_quantization_error_embeddings,
        "best_f1_threshold_documents": Q.q_best_f1_threshold_documents,
        "asof_forward_events": Q.q_asof_forward_events,
        "late_events_watermark": Q.q_late_events_watermark,
        "weighted_median_events": Q.q_weighted_median_events,
        "hour_dow_heatmap_events": Q.q_hour_dow_heatmap_events,
        "covariance_embeddings": Q.q_covariance_embeddings,
        "debounce_events": Q.q_debounce_events,
        "point_in_time_user_state": Q.q_point_in_time_user_state,
        "corpus_checksum_documents": Q.q_corpus_checksum_documents,
        "profile_orders": Q.q_profile_orders,
        "grubbs_daily_events": Q.q_grubbs_daily_events,
        "reconciliation_orders_lineitem": Q.q_reconciliation_orders_lineitem,
        "bounce_rate_daily": Q.q_bounce_rate_daily,
        "naive2_forecast_daily": Q.q_naive2_forecast_daily,
        "kmv_set_ops_gate": Q.q_kmv_set_ops_gate,
        "combo_forecast_daily": Q.q_combo_forecast_daily,
        "lmoments_events": Q.q_lmoments_events,
        "expected_shortfall_events": Q.q_expected_shortfall_events,
        "winkler_interval_daily": Q.q_winkler_interval_daily,
        "theil_u_daily": Q.q_theil_u_daily,
        "psi_orders_priority": Q.q_psi_orders_priority,
        "js_divergence_sources": Q.q_js_divergence_sources,
        "cohen_kappa_lang": Q.q_cohen_kappa_lang,
        "blocking_recall_documents": Q.q_blocking_recall_documents,
        "changepoint_sse_daily": Q.q_changepoint_sse_daily,
        "local_maxima_daily": Q.q_local_maxima_daily,
        "holt_damped_gate_daily": Q.q_holt_damped_gate_daily,
        "activation_latency_users": Q.q_activation_latency_users,
        # TPC-H Q6/Q4/Q12 shapes (scan-filter-agg, EXISTS semi-join,
        # CASE-split join aggregation)
        "q6_revenue_filter": Q.q_q6_revenue_filter,
        "q4_priority_exists": Q.q_q4_priority_exists,
        "q12_returnflag_priority": Q.q_q12_returnflag_priority,
        # technical indicators (Cutler RSI, Lane stochastic, OBV)
        "rsi_daily_events": Q.q_rsi_daily_events,
        "stochastic_daily_events": Q.q_stochastic_daily_events,
        "obv_daily_events": Q.q_obv_daily_events,
        # fourth-moment window, rank correlation vs market, interval sweep
        "rolling_kurt_daily": Q.q_rolling_kurt_daily,
        "kendall_tau_market_daily": Q.q_kendall_tau_market_daily,
        "max_concurrency_events": Q.q_max_concurrency_events,
        # embedding-space audits (pair histogram, norms, spectral gate)
        "cosine_histogram_embeddings": Q.q_cosine_histogram_embeddings,
        "norm_stats_embeddings": Q.q_norm_stats_embeddings,
        "pca_spectrum_gate_embeddings": Q.q_pca_spectrum_gate_embeddings,
        # lakehouse schema evolution + text canonicalization
        "schema_evolution_union": Q.q_schema_evolution_union,
        "normalize_text_documents": Q.q_normalize_text_documents,
        # graph centrality, business-day calendar, Misra-Gries heavy hitters
        "pagerank_types_events": Q.q_pagerank_types_events,
        "business_days_to_ship": Q.q_business_days_to_ship,
        "heavy_hitters_users_events": Q.q_heavy_hitters_users_events,
        # quantile normalization, state dwell time, grouped OLS
        "quantile_normalize_daily": Q.q_quantile_normalize_daily,
        "state_dwell_time_events": Q.q_state_dwell_time_events,
        "ols_price_quantity_brand": Q.q_ols_price_quantity_brand,
        # survival analysis, Sharpe drift, sequence-gap audit
        "kaplan_meier_users": Q.q_kaplan_meier_users,
        "sharpe_daily_events": Q.q_sharpe_daily_events,
        "id_gaps_events": Q.q_id_gaps_events,
        # quadratic trend, floored balance, weekday adjustment
        "quadratic_trend_daily": Q.q_quadratic_trend_daily,
        "stock_balance_daily": Q.q_stock_balance_daily,
        "weekday_adjust_daily": Q.q_weekday_adjust_daily,
        # AR(1) fit, partial-pooling shrinkage, exponential inter-arrival KS
        "ar1_forecast_daily": Q.q_ar1_forecast_daily,
        "pooled_shrinkage_daily": Q.q_pooled_shrinkage_daily,
        "interarrival_expfit_events": Q.q_interarrival_expfit_events,
        # lexical richness, Good-Turing spectrum, per-doc word entropy
        "lexical_richness_documents": Q.q_lexical_richness_documents,
        "good_turing_documents": Q.q_good_turing_documents,
        "word_entropy_documents": Q.q_word_entropy_documents,
        # HLL distinct gate, variance F-test, cross-sectional z-score
        "hll_distinct_gate": Q.q_hll_distinct_gate,
        "variance_ftest_daily": Q.q_variance_ftest_daily,
        "cross_sectional_zscore_daily": Q.q_cross_sectional_zscore_daily,
        # bigram LM perplexity, dominant ACF period, holiday distance
        "bigram_perplexity_documents": Q.q_bigram_perplexity_documents,
        "dominant_period_daily": Q.q_dominant_period_daily,
        "holiday_distance_daily": Q.q_holiday_distance_daily,
        # TSB intermittent gate (14th estimator), Hurst R/S, peak stats
        "tsb_gate_daily": Q.q_tsb_gate_daily,
        "hurst_rs_daily": Q.q_hurst_rs_daily,
        "peak_stats_daily": Q.q_peak_stats_daily,
        # flagship pages-path SQL oracle, strict 3-step funnel, circular hour
        "host_tier_1d_pages": Q.q_host_tier_1d_pages,
        "funnel3_strict_events": Q.q_funnel3_strict_events,
        "circular_hour_events": Q.q_circular_hour_events,
        # matrix-profile motif, skyline frontier, last-touch attribution
        "motif_daily_events": Q.q_motif_daily_events,
        "pareto_frontier_orders": Q.q_pareto_frontier_orders,
        "attribution_events": Q.q_attribution_events,
        # top-down reconciliation, JL projection gate, sentence stats
        "topdown_forecast_daily": Q.q_topdown_forecast_daily,
        "jl_projection_gate_embeddings": Q.q_jl_projection_gate_embeddings,
        "sentence_stats_documents": Q.q_sentence_stats_documents,
        # running-peak age, Page-Hinkley drift, Hill tail index
        "days_since_peak_daily": Q.q_days_since_peak_daily,
        "page_hinkley_daily": Q.q_page_hinkley_daily,
        "hill_tail_events": Q.q_hill_tail_events,
        # order cadence, hourly envelope, negative-binomial activity fit
        "customer_order_gaps": Q.q_customer_order_gaps,
        "hourly_envelope_events": Q.q_hourly_envelope_events,
        "nb_fit_users_events": Q.q_nb_fit_users_events,
        # co-purchase degrees, horizon backtest profile, p-chart
        "copurchase_degree_lineitem": Q.q_copurchase_degree_lineitem,
        "horizon_error_profile_daily": Q.q_horizon_error_profile_daily,
        "p_chart_hourly_events": Q.q_p_chart_hourly_events,
        # SRM audit, dup-size/quality correlation, 2x2 odds ratio
        "srm_check_orders": Q.q_srm_check_orders,
        "dupsize_quality_corr_documents": Q.q_dupsize_quality_corr_documents,
        "conversion_odds_users": Q.q_conversion_odds_users,
        # triangle counting, Haar wavelet energies, SAX words
        "triangle_count_copurchase": Q.q_triangle_count_copurchase,
        "haar_energy_daily": Q.q_haar_energy_daily,
        "sax_words_daily": Q.q_sax_words_daily,
        # banded DTW envelope gate, newsvendor policy, POT-GPD tail fit
        "dtw_band_pairs_daily": Q.q_dtw_band_pairs_daily,
        "newsvendor_daily": Q.q_newsvendor_daily,
        "pot_gpd_events": Q.q_pot_gpd_events,
        # arg-min supplier join, source LM KL drift, Markov top-1 accuracy
        "mincost_supplier_parts": Q.q_mincost_supplier_parts,
        "kl_token_sources": Q.q_kl_token_sources,
        "markov_top1_accuracy_events": Q.q_markov_top1_accuracy_events,
        # GEV block-maxima PWM, sample entropy, von Neumann ratio
        "gev_pwm_daily_max_events": Q.q_gev_pwm_daily_max_events,
        "sample_entropy_daily": Q.q_sample_entropy_daily,
        "von_neumann_daily": Q.q_von_neumann_daily,
        # turning points, ACF whiteness, Bonferroni pairwise contrasts
        "turning_points_daily": Q.q_turning_points_daily,
        "acf_whiteness_daily": Q.q_acf_whiteness_daily,
        "pairwise_mean_diff_events": Q.q_pairwise_mean_diff_events,
        # DAU half-life, weekend effect, Chapman capture-recapture
        "dau_halflife_events": Q.q_dau_halflife_events,
        "weekend_effect_daily": Q.q_weekend_effect_daily,
        "chapman_estimate_users": Q.q_chapman_estimate_users,
        # Burrows' Delta stylometry, ABC classes, calibration table
        "burrows_delta_sources": Q.q_burrows_delta_sources,
        "abc_classification_parts": Q.q_abc_classification_parts,
        "calibration_users": Q.q_calibration_users,
        # Brier decomposition, crawl politeness gaps, partial correlation
        "brier_decomposition_users": Q.q_brier_decomposition_users,
        "crawl_gaps_pages": Q.q_crawl_gaps_pages,
        "partial_corr_daily": Q.q_partial_corr_daily,
        # Dunning keyness, vocabulary coverage, Wilcoxon signed-rank
        "keyness_g2_src0": Q.q_keyness_g2_src0,
        "vocab_coverage_documents": Q.q_vocab_coverage_documents,
        "wilcoxon_paired_daily": Q.q_wilcoxon_paired_daily,
        # piecewise hinge trend, activity streaks, daily mix entropy
        "piecewise_trend_daily": Q.q_piecewise_trend_daily,
        "activity_streaks_users": Q.q_activity_streaks_users,
        "mix_entropy_daily": Q.q_mix_entropy_daily,
        # Kendall's W, discount response curve, rank-biased overlap
        "kendall_w_daily": Q.q_kendall_w_daily,
        "discount_response_lineitem": Q.q_discount_response_lineitem,
        "rbo_top_users": Q.q_rbo_top_users,
        # degree assortativity, basket dispersion, Jarque-Bera
        "degree_assortativity_copurchase":
            Q.q_degree_assortativity_copurchase,
        "basket_dispersion_orders": Q.q_basket_dispersion_orders,
        "jarque_bera_daily": Q.q_jarque_bera_daily,
        # adstock carryover, cohort LTV curve, EWMA control chart
        "adstock_daily": Q.q_adstock_daily,
        "cohort_value_curve": Q.q_cohort_value_curve,
        "ewma_chart_daily": Q.q_ewma_chart_daily,
        # kNN outliers, bilateral price indices, Theil decomposition
        "knn_outlier_embeddings": Q.q_knn_outlier_embeddings,
        "price_index_lineitem": Q.q_price_index_lineitem,
        "theil_inequality_documents": Q.q_theil_inequality_documents,
        # mutual information, spectral flatness, BH-FDR correction
        "mutual_info_type_hour": Q.q_mutual_info_type_hour,
        "spectral_flatness_daily": Q.q_spectral_flatness_daily,
        "bh_fdr_pairs_events": Q.q_bh_fdr_pairs_events,
        # fulfillment span, exponential PPCC, Shamos robust scale
        "fulfillment_span_orders": Q.q_fulfillment_span_orders,
        "ppcc_expfit_events": Q.q_ppcc_expfit_events,
        "shamos_scale_daily": Q.q_shamos_scale_daily,
        # AUC via rank-sum, beta-binomial shrinkage, bimodality
        "auc_dupness_documents": Q.q_auc_dupness_documents,
        "beta_shrunk_daily_share": Q.q_beta_shrunk_daily_share,
        "bimodality_daily": Q.q_bimodality_daily,
        # NDCG@20, Youden threshold, Allan variance
        "ndcg_blocking_documents": Q.q_ndcg_blocking_documents,
        "youden_threshold_documents": Q.q_youden_threshold_documents,
        "allan_variance_daily": Q.q_allan_variance_daily,
        # log-loss, Cramér's V, tenure-activity correlation
        "logloss_users": Q.q_logloss_users,
        "cramers_v_orders": Q.q_cramers_v_orders,
        "tenure_activity_corr_users": Q.q_tenure_activity_corr_users,
        # Markov entropy rate, Sinkhorn sweeps, restricted mean survival
        "markov_entropy_rate_events": Q.q_markov_entropy_rate_events,
        "sinkhorn2_transitions": Q.q_sinkhorn2_transitions,
        "rmst_users": Q.q_rmst_users,
        # exact 2-means split, doc-length CCDF, Ruzicka similarity
        "two_means_split_daily": Q.q_two_means_split_daily,
        "ccdf_doclen_documents": Q.q_ccdf_doclen_documents,
        "ruzicka_sources": Q.q_ruzicka_sources,
        # biweight location, term-rank correlation, inverse-vol weights
        "biweight_location_daily": Q.q_biweight_location_daily,
        "term_rank_corr_sources": Q.q_term_rank_corr_sources,
        "inverse_vol_weights_daily": Q.q_inverse_vol_weights_daily,
        # tabular CUSUM, Poisson rate ratio, diurnal harmonic
        "tabular_cusum_daily": Q.q_tabular_cusum_daily,
        "rate_ratio_events": Q.q_rate_ratio_events,
        "diurnal_harmonic_events": Q.q_diurnal_harmonic_events,
        # gamma fit, lognormal tail check, variance-ratio test
        "gamma_fit_events": Q.q_gamma_fit_events,
        "lognormal_tail_events": Q.q_lognormal_tail_events,
        "variance_ratio_daily": Q.q_variance_ratio_daily,
        # shock half-life, mean excess, KPSS stationarity
        "shock_halflife_daily": Q.q_shock_halflife_daily,
        "mean_excess_events": Q.q_mean_excess_events,
        "kpss_daily": Q.q_kpss_daily,
        # dominance matrix, Newey-West CI, Nelson-Aalen hazard
        "dominance_matrix_daily": Q.q_dominance_matrix_daily,
        "newey_west_daily": Q.q_newey_west_daily,
        "nelson_aalen_users": Q.q_nelson_aalen_users,
        # within-estimator trend, Juilland's D, dow eta-squared
        "fixed_effects_trend_daily": Q.q_fixed_effects_trend_daily,
        "juilland_d_documents": Q.q_juilland_d_documents,
        "eta_squared_dow_daily": Q.q_eta_squared_dow_daily,
        # Blomqvist beta, t-score collocations, daily mix divergence
        "blomqvist_beta_daily": Q.q_blomqvist_beta_daily,
        "tscore_bigrams_documents": Q.q_tscore_bigrams_documents,
        "daily_mix_divergence": Q.q_daily_mix_divergence,
        # ITS level shift, first-touch conversion, peak concentration
        "its_level_shift_daily": Q.q_its_level_shift_daily,
        "first_touch_conversion": Q.q_first_touch_conversion,
        "peak_concentration_events": Q.q_peak_concentration_events,
        # Wilson interval, weekly coherence phase, holiday lift
        "wilson_interval_daily": Q.q_wilson_interval_daily,
        "weekly_coherence_pairs": Q.q_weekly_coherence_pairs,
        "holiday_lift_daily": Q.q_holiday_lift_daily,
        # weekly ICC, share trend, Friedman dow test
        "icc_weekly_daily": Q.q_icc_weekly_daily,
        "share_trend_daily": Q.q_share_trend_daily,
        "friedman_dow_daily": Q.q_friedman_dow_daily,
        # Cochran's Q, Zipf abbreviation law, repeat tendency
        "cochran_q_users": Q.q_cochran_q_users,
        "zipf_abbreviation_documents": Q.q_zipf_abbreviation_documents,
        "repeat_tendency_events": Q.q_repeat_tendency_events,
        # rank-1 power approximation, hod entropy, intraday concentration
        "rank1_power_dow": Q.q_rank1_power_dow,
        "hod_entropy_events": Q.q_hod_entropy_events,
        "intraday_concentration_daily": Q.q_intraday_concentration_daily,
        # Siegel slope, source vocab entropy, two-proportion z-test
        "siegel_slope_daily": Q.q_siegel_slope_daily,
        "source_vocab_entropy": Q.q_source_vocab_entropy,
        "weekend_share_ztest_events": Q.q_weekend_share_ztest_events,
        # permutation entropy, seasonality drift, memorylessness audit
        "permutation_entropy_daily": Q.q_permutation_entropy_daily,
        "seasonality_drift_daily": Q.q_seasonality_drift_daily,
        "memoryless_check_events": Q.q_memoryless_check_events,
        # event trigrams, median residual life, exact median CI
        "trigram_sequences_events": Q.q_trigram_sequences_events,
        "median_residual_life_users": Q.q_median_residual_life_users,
        "median_ci_daily": Q.q_median_ci_daily,
        # CRPS climatology, calibration error, same-day multi-orders
        "crps_climatology_daily": Q.q_crps_climatology_daily,
        "ece_users": Q.q_ece_users,
        "same_day_multiorders": Q.q_same_day_multiorders,
        # effective sample size, flow imbalance, hourly ACF-24/168
        "ess_daily": Q.q_ess_daily,
        "flow_imbalance_events": Q.q_flow_imbalance_events,
        "hourly_acf24_events": Q.q_hourly_acf24_events,
        # Diebold-Mariano, Gini mean difference, down-day profile
        "diebold_mariano_daily": Q.q_diebold_mariano_daily,
        "gini_mean_diff_daily": Q.q_gini_mean_diff_daily,
        "down_days_daily": Q.q_down_days_daily,
        # diversification ratio, weekend QTE, cointegration screen
        "diversification_ratio_daily": Q.q_diversification_ratio_daily,
        "qte_weekend_daily": Q.q_qte_weekend_daily,
        "cointegration_lite_daily": Q.q_cointegration_lite_daily,
        # trend t-test, PIT calibration, priority migration
        "trend_ttest_daily": Q.q_trend_ttest_daily,
        "pit_naive_daily": Q.q_pit_naive_daily,
        "priority_migration_customers": Q.q_priority_migration_customers,
        # Durbin-Watson, Yule's K lexical trio, log-rank survival test
        "durbin_watson_daily": Q.q_durbin_watson_daily,
        "yule_k_documents": Q.q_yule_k_documents,
        "logrank_users": Q.q_logrank_users,
        # Granger lag-1 F-test, ARCH LM, Weibull gap fit
        "granger_lag1_daily": Q.q_granger_lag1_daily,
        "arch_lm_daily": Q.q_arch_lm_daily,
        "weibull_fit_gaps": Q.q_weibull_fit_gaps,
        # McNemar paired halves, Davies-Bouldin index, conformal coverage
        "mcnemar_users": Q.q_mcnemar_users,
        "davies_bouldin_embeddings": Q.q_davies_bouldin_embeddings,
        "conformal_naive_daily": Q.q_conformal_naive_daily,
        # GK gamma, OLS influence maxima, jackknife CV SE
        "gk_gamma_lineitem": Q.q_goodman_kruskal_gamma,
        "ols_influence_daily": Q.q_ols_influence_daily,
        "jackknife_cv_daily": Q.q_jackknife_cv_daily,
        # Bhattacharyya pairs, seasonal MK, cents uniformity
        "bhattacharyya_sources": Q.q_bhattacharyya_sources,
        "seasonal_mk_daily": Q.q_seasonal_mann_kendall_daily,
        "price_cents_uniformity": Q.q_price_cents_uniformity,
        # Calinski-Harabasz, Breusch-Pagan, Chow break
        "calinski_harabasz_embeddings": Q.q_calinski_harabasz_embeddings,
        "breusch_pagan_daily": Q.q_breusch_pagan_daily,
        "chow_break_daily": Q.q_chow_break_daily,
        # brand return rate, Brown-Forsythe, Kruskal-Wallis
        "brand_return_rate": Q.q_brand_return_rate,
        "brown_forsythe_dow": Q.q_brown_forsythe_dow,
        "kruskal_wallis_dow": Q.q_kruskal_wallis_dow,
        # Cochran-Armitage, IQR outlier profile, decile lift
        "cochran_armitage_lineitem": Q.q_cochran_armitage_lineitem,
        "iqr_outliers_lineitem": Q.q_iqr_outliers_lineitem,
        "decile_lift_users": Q.q_decile_lift_users,
        # Mood median, Hodges-Lehmann shift, Jonckheere-Terpstra
        "mood_median_dow": Q.q_mood_median_dow,
        "hodges_lehmann_weekend": Q.q_hodges_lehmann_weekend,
        "jonckheere_weeks": Q.q_jonckheere_weeks,
        # Welch ANOVA, winsorized market corr, crosstab residuals
        "welch_anova_dow": Q.q_welch_anova_dow,
        "winsorized_corr_market_daily": Q.q_winsorized_corr_market_daily,
        "crosstab_residuals_type_dow": Q.q_crosstab_residuals_type_dow,
        # Dixon Q, Bartels rank RVN, Pettitt change-point
        "dixon_q_daily": Q.q_dixon_q_daily,
        "bartels_rank_daily": Q.q_bartels_rank_daily,
        "pettitt_daily": Q.q_pettitt_daily,
        # Cox-Stuart, SNHT, Katz fractal dimension
        "cox_stuart_daily": Q.q_cox_stuart_daily,
        "snht_daily": Q.q_snht_daily,
        "katz_fd_daily": Q.q_katz_fd_daily,
        # X-bar/R chart, monthly seasonal index, Benford 2nd digit
        "xbar_r_chart_weekly": Q.q_xbar_r_chart_weekly,
        "monthly_seasonal_index_orders": Q.q_monthly_seasonal_index_orders,
        "benford_second_digit_lineitem": Q.q_benford_second_digit_lineitem,
        # TPC-H join suite: Q7 / Q10 / Q13 shapes
        "volume_shipping_nations": Q.q_volume_shipping_nations,
        "returned_items_customers": Q.q_returned_items_customers,
        "customer_order_distribution": Q.q_customer_order_distribution,
        # TPC-H join suite: Q14 / Q17 / Q18 shapes
        "promo_revenue_share": Q.q_promo_revenue_share,
        "small_qty_revenue_brand": Q.q_small_qty_revenue_brand,
        "large_volume_customers": Q.q_large_volume_customers,
        # TPC-H join suite: Q8 / Q19 / Q22 shapes
        "market_share_nation": Q.q_market_share_nation,
        "disjunctive_predicate_revenue": Q.q_disjunctive_predicate_revenue,
        "idle_customer_balance": Q.q_idle_customer_balance,
        # TPC-H join suite: Q4 / Q12 / Q15 shapes
        "priority_late_orders": Q.q_priority_late_orders,
        "linestatus_priority_counts": Q.q_linestatus_priority_counts,
        "top_revenue_supplier": Q.q_top_revenue_supplier,
        # TPC-H join suite: Q21 / Q9 shapes
        "suppliers_kept_waiting": Q.q_suppliers_kept_waiting,
        "nation_profit": Q.q_nation_profit,
        # matrix profile (STOMP brute baseline, discord + motif per series)
        "matrix_profile_daily": Q.q_matrix_profile_daily,
        # CCNet-style corpus-LM perplexity filter (train + score chain)
        "ccnet_perplexity_documents": Q.q_ccnet_perplexity_documents,
        # DSIR importance-resampling weights (target vs raw unigram LM)
        "dsir_weights_documents": Q.q_dsir_weights_documents,
        # OLS (MinT-identity) hierarchical forecast reconciliation
        "ols_reconciliation_daily": Q.q_ols_reconciliation_daily,
        # TPC-H join suite: Q16 / Q11 / Q20 / Q2 shapes
        "supplier_part_diversity": Q.q_supplier_part_diversity,
        "important_nation_stock": Q.q_important_nation_stock,
        "heavy_small_part_suppliers": Q.q_heavy_small_part_suppliers,
        "best_balance_supplier_per_class":
            Q.q_best_balance_supplier_per_class,
        # point-process clumpiness + long-memory diagnostics
        "burstiness_fano_events": Q.q_burstiness_fano_events,
        "hurst_rs_daily": Q.q_hurst_rs_daily,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for every SQL-expressible query (same column names).
    Omitted (rows-only, each justified): minhash / simhash pair sets and the
    LSH embedding near-dup (banded-LSH candidate generation is approximate
    by contract — their exact counterparts ``embedding_neardup_exact`` and
    the jaccard/hamming verifications are oracled, and their recall is
    oracle-GATED by ``minhash_recall`` / ``simhash_recall``),
    ``ann_ivf_embeddings``
    (approximate; gated by ``ann_ivf_recall``), ``text_analysis_documents``
    (a composite whose every column family is now independently oracled:
    ``token_counts_documents``, ``text_ratios_documents``,
    ``lang_id_documents``, ``doc_fingerprint_documents``),
    ``llm_pipeline_documents`` (full chain with
    MinHash clustering — its exact funnel half is fully oracled as
    ``llm_exact_funnel_documents``)."""
    from forecastframe_ray.pipelines import queries as Q

    return {
        "tier_1h_events": Q.TIER_SQL["1h"],
        "tier_1d_events": Q.TIER_SQL["1d"],
        "tier_7d_events": Q.TIER_SQL["7d"],
        "lag_daily_events": Q.SQL_LAG_DAILY,
        "diff_daily_events": Q.SQL_DIFF_DAILY,
        "pct_change_daily_events": Q.SQL_PCT_CHANGE_DAILY,
        "rolling7_daily_events": Q.SQL_ROLLING7_DAILY,
        "rolling_median_daily": Q.SQL_ROLLING_MEDIAN_DAILY,
        "threshold_daily_events": Q.SQL_THRESHOLD_DAILY,
        "days_since_release_events": Q.SQL_DAYS_SINCE,
        "gapfill_ffill_hourly_events": Q.SQL_GAPFILL_FFILL_HOURLY,
        "interpolate_hourly_events": Q.SQL_INTERPOLATE_HOURLY,
        "rollup_grouper_stats_events": Q.SQL_ROLLUP_GROUPER_STATS,
        "momentum_daily_events": Q.SQL_MOMENTUM_DAILY,
        "calendar_daily_events": Q.SQL_CALENDAR_DAILY,
        "rollup_q1_lineitem": Q.SQL_ROLLUP_Q1,
        "standardize_lineitem": Q.SQL_STANDARDIZE_LINEITEM,
        "normalize_events": Q.SQL_NORMALIZE_EVENTS,
        "log1p_lineitem": Q.SQL_LOG1P_LINEITEM,
        "correct_negatives_events": Q.SQL_CORRECT_NEGATIVES,
        "encode_priority_orders": Q.SQL_ENCODE_PRIORITY,
        "error_metrics_naive": Q.SQL_ERROR_METRICS_NAIVE,
        "join_orders_customer": Q.SQL_JOIN_ORDERS_CUSTOMER,
        "semi_join_orders": Q.SQL_SEMI_JOIN_ORDERS,
        "topk_orders": Q.SQL_TOPK_ORDERS,
        "distinct_event_types": Q.SQL_DISTINCT_EVENT_TYPES,
        "exact_dedup_documents": Q.SQL_EXACT_DEDUP_DOCS,
        "dup_counts_documents": Q.SQL_DUP_COUNTS_DOCS,
        "token_counts_documents": Q.SQL_TOKEN_COUNTS_DOCS,
        "ann_bruteforce_embeddings": Q.SQL_ANN_BRUTEFORCE,
        "gorilla_roundtrip_events": Q.SQL_GORILLA_ROUNDTRIP,
        "ewma_daily_events": Q.SQL_EWMA_DAILY,
        "c4_boilerplate_documents": Q.SQL_C4_BOILERPLATE,
        "multimodal_decode": Q.SQL_MULTIMODAL_DECODE,
        "descale_roundtrip_lineitem": Q.SQL_DESCALE_ROUNDTRIP,
        "decode_priority_orders": Q.SQL_DECODE_PRIORITY,
        "compress_lineitem": Q.SQL_COMPRESS_LINEITEM,
        "remove_min_lags_daily": Q.SQL_REMOVE_MIN_LAGS,
        "merge_actuals_daily": Q.SQL_MERGE_ACTUALS,
        "update_values_daily": Q.SQL_UPDATE_VALUES,
        "future_frame_daily": Q.SQL_FUTURE_FRAME,
        "save_load_roundtrip_events": Q.SQL_SAVE_LOAD,
        "missing_percentages_hourly": Q.SQL_MISSING_PCT,
        "cv_folds_daily": Q.SQL_CV_FOLDS,
        "text_ratios_documents": Q.SQL_TEXT_RATIOS,
        "embedding_neardup_exact": Q.SQL_EMBEDDING_NEARDUP_EXACT,
        "ann_ivf_recall": Q.SQL_ANN_IVF_RECALL,
        "ensemble_pred_daily": Q.SQL_ENSEMBLE_PRED,
        "fourier_dow_fit_daily": Q.SQL_FOURIER_DOW_FIT,
        "ngram_jaccard_pairs": Q.SQL_NGRAM_JACCARD,
        "minhash_recall": Q.SQL_MINHASH_RECALL,
        "simhash_recall": Q.SQL_SIMHASH_RECALL,
        "lang_id_documents": Q.SQL_LANG_ID,
        "search_cv_daily": Q.SQL_SEARCH_CV,
        "error_metrics_by_type": Q.SQL_ERROR_METRICS_BY_TYPE,
        "sample_orders_deterministic": Q.SQL_SAMPLE_ORDERS,
        "doc_fingerprint_documents": Q.SQL_DOC_FINGERPRINT,
        "tier_incremental_1d_events": Q.TIER_SQL["1d"],
        "tier_retention_1h_events":
            f"SELECT * FROM ({Q.TIER_SQL['1h']}) "
            f"WHERE bucket_us >= {Q._RETENTION_CUTOFF_US}",
        "multimodal_resize": Q.SQL_MULTIMODAL_RESIZE,
        "csv_roundtrip_events": Q.SQL_CSV_ROUNDTRIP,
        "anti_join_orders": Q.SQL_ANTI_JOIN_ORDERS,
        "llm_exact_funnel_documents": Q.SQL_LLM_EXACT_FUNNEL,
        "errors_describe_daily": Q.SQL_ERRORS_DESCRIBE,
        "cv_fit_summary_daily": Q.SQL_CV_FIT_SUMMARY,
        "perm_importance_daily": Q.SQL_PERM_IMPORTANCE,
        "linear_shap_daily": Q.SQL_LINEAR_SHAP,
        "predict_future_daily": Q.SQL_PREDICT_FUTURE,
        "importance_summary_daily": Q.SQL_IMPORTANCE_SUMMARY,
        "quantile_loss_naive": Q.SQL_QUANTILE_LOSS_NAIVE,
        "forecast_postprocess_daily": Q.SQL_FORECAST_POSTPROCESS,
        "asymmetric_loss_naive": Q.SQL_ASYMMETRIC_LOSS_NAIVE,
        "pack_spans_documents": Q.SQL_PACK_SPANS,
        "pack_chunk_stats_documents": Q.SQL_PACK_CHUNK_STATS,
        "mixture_plan_lang": Q.SQL_MIXTURE_PLAN,
        "mixture_sample_lang": Q.SQL_MIXTURE_SAMPLE,
        "dickey_fuller_daily": Q.SQL_DICKEY_FULLER_DAILY,
        "ljung_box_daily": Q.SQL_LJUNG_BOX_DAILY,
        "ts_strength_daily": Q.SQL_TS_STRENGTH_DAILY,
        "demand_classification_users": Q.SQL_DEMAND_CLASSIFICATION,
        "theta_forecast_gate_daily": Q.SQL_THETA_FORECAST_GATE,
        "exact_dedup_keep_best_documents": Q.SQL_EXACT_DEDUP_KEEP_BEST,
        "croston_sba_gate_daily": Q.SQL_CROSTON_SBA_GATE,
        "seasonal_naive_forecast_daily": Q.SQL_SEASONAL_NAIVE_FORECAST,
        "drift_forecast_daily": Q.SQL_DRIFT_FORECAST,
        "zipf_fit_documents": Q.SQL_ZIPF_FIT,
        "baseline_leaderboard_daily": Q.SQL_BASELINE_LEADERBOARD,
        "ses_naive_gate_daily": Q.SQL_SES_NAIVE_GATE,
        "heaps_fit_documents": Q.SQL_HEAPS_FIT,
        "trimmed_mean_events": Q.SQL_TRIMMED_MEAN_EVENTS,
        "rolling_skew_daily": Q.SQL_ROLLING_SKEW_DAILY,
        "rolling_corr_market_daily": Q.SQL_ROLLING_CORR_MARKET,
        "geo_harmonic_mean_lineitem": Q.SQL_GEO_HARMONIC_MEAN,
        "twap_daily_events": Q.SQL_TWAP_DAILY,
        "counter_increase_users": Q.SQL_COUNTER_INCREASE,
        "distinct_users_daily_kmv": Q.SQL_DISTINCT_USERS_DAILY,
        "distinct_users_kmv_gate": Q.SQL_DISTINCT_USERS_KMV_GATE,
        "distinct_users_daily_cascade": Q.SQL_DISTINCT_USERS_DAILY,
        "quantile_sketch_gate_daily": Q.SQL_QUANTILE_SKETCH_GATE,
        "top_users_sketch_daily": Q.SQL_TOP_USERS_SKETCH,
        "predict_linear_daily": Q.SQL_PREDICT_LINEAR,
        "asof_join_events": Q.SQL_ASOF_JOIN_EVENTS,
        "range_join_events": Q.SQL_RANGE_JOIN_EVENTS,
        "sessionize_events": Q.SQL_SESSIONIZE_EVENTS,
        "session_stats_events": Q.SQL_SESSION_STATS_EVENTS,
        "expanding_daily_events": Q.SQL_EXPANDING_DAILY,
        "hopping_3h1h_events": Q.SQL_HOPPING_3H1H_EVENTS,
        "pivot_daily_events": Q.SQL_PIVOT_DAILY,
        "melt_roundtrip_daily": Q.SQL_MELT_ROUNDTRIP_DAILY,
        "topk_per_type_events": Q.SQL_TOPK_PER_TYPE_EVENTS,
        "winsorize_events": Q.SQL_WINSORIZE_EVENTS,
        "bloom_semi_join_orders": Q.SQL_BLOOM_SEMI_JOIN_ORDERS,
        "rolling_corr_daily": Q.SQL_ROLLING_CORR_DAILY,
        "pii_redaction_documents": Q.SQL_PII_REDACTION,
        "decontaminate_documents": Q.SQL_DECONTAMINATE,
        "repetition_documents": Q.SQL_REPETITION_DOCS,
        "vocabulary_documents": Q.SQL_VOCABULARY_DOCS,
        "chunk_documents": Q.SQL_CHUNK_DOCS,
        "gopher_filter_documents": Q.SQL_GOPHER_FILTER,
        "tfidf_topterms_documents": Q.SQL_TFIDF_TOPTERMS,
        "unigram_logprob_documents": Q.SQL_UNIGRAM_LOGPROB,
        "stratified_sample_orders": Q.SQL_STRATIFIED_SAMPLE_ORDERS,
        "anomaly_daily_events": Q.SQL_ANOMALY_DAILY,
        "quality_buckets_documents": Q.SQL_QUALITY_BUCKETS,
        "dup_spans_documents": Q.SQL_DUP_SPANS,
        "percent_rank_daily": Q.SQL_PERCENT_RANK_DAILY,
        "pmi_bigrams_documents": Q.SQL_PMI_BIGRAMS,
        "json_props_events": Q.SQL_JSON_PROPS_EVENTS,
        "label_centroids_embeddings": Q.SQL_LABEL_CENTROIDS,
        "cusum_daily_events": Q.SQL_CUSUM_DAILY,
        "seasonal_decompose_daily": Q.SQL_SEASONAL_DECOMPOSE_DAILY,
        "acf_daily_events": Q.SQL_ACF_DAILY,
        "holt_forecast_gate_daily": Q.SQL_HOLT_FORECAST_GATE,
        "croston_gate_daily": Q.SQL_CROSTON_GATE,
        "smape_wape_naive_daily": Q.SQL_SMAPE_WAPE_NAIVE,
        "pushdown_filter_events": Q.SQL_PUSHDOWN_FILTER,
        "spearman_daily_events": Q.SQL_SPEARMAN_DAILY,
        "mann_kendall_daily_events": Q.SQL_MANN_KENDALL_DAILY,
        "pacf_daily_events": Q.SQL_PACF_DAILY,
        "periodogram_daily_events": Q.SQL_PERIODOGRAM_DAILY,
        "containment_pairs_documents": Q.SQL_CONTAINMENT_PAIRS,
        "decomposition_strength_daily": Q.SQL_DECOMP_STRENGTH,
        "latest_order_per_customer": Q.SQL_LATEST_ORDER,
        "grouping_sets_daily_events": Q.SQL_GROUPING_SETS_DAILY,
        "bm25_search_documents": Q.SQL_BM25_SEARCH,
        "user_entropy_events": Q.SQL_USER_ENTROPY,
        "value_histogram_events": Q.SQL_VALUE_HISTOGRAM,
        "ohlc_daily_events": Q.SQL_OHLC_DAILY,
        "rate_hourly_events": Q.SQL_RATE_HOURLY,
        "shipping_priority": Q.SQL_SHIPPING_PRIORITY,
        "cohort_retention_events": Q.SQL_COHORT_RETENTION,
        "mase_daily_events": Q.SQL_MASE_DAILY,
        "funnel_conversion_events": Q.SQL_FUNNEL_CONVERSION,
        "transition_counts_events": Q.SQL_TRANSITION_COUNTS,
        "value_percentiles_events": Q.SQL_VALUE_PERCENTILES,
        "jsonl_roundtrip_events": Q.SQL_JSONL_ROUNDTRIP,
        "theilsen_daily_events": Q.SQL_THEILSEN_DAILY,
        "fk_violations": Q.SQL_FK_VIOLATIONS,
        "edit1_pairs_documents": Q.SQL_EDIT1_PAIRS,
        "dispersion_daily_events": Q.SQL_DISPERSION_DAILY,
        "ntile_cume_daily": Q.SQL_NTILE_CUME_DAILY,
        "vocab_growth_documents": Q.SQL_VOCAB_GROWTH,
        "interevent_gaps_events": Q.SQL_INTEREVENT_GAPS,
        "kmeans_assign_embeddings": Q.SQL_KMEANS_ASSIGN,
        "cross_corr_daily_events": Q.SQL_CROSS_CORR_DAILY,
        "rolling_p90_daily": Q.SQL_ROLLING_P90_DAILY,
        "wow_growth_daily": Q.SQL_WOW_GROWTH_DAILY,
        "median_impute_hourly": Q.SQL_MEDIAN_IMPUTE_HOURLY,
        "source_profile_documents": Q.SQL_SOURCE_PROFILE,
        "lang_confusion_documents": Q.SQL_LANG_CONFUSION,
        "robust_zscore_daily": Q.SQL_ROBUST_ZSCORE,
        "favorite_type_per_user": Q.SQL_FAVORITE_TYPE,
        "daily_share_events": Q.SQL_DAILY_SHARE,
        "dataset_split_orders": Q.SQL_DATASET_SPLIT,
        "bollinger_daily_events": Q.SQL_BOLLINGER_DAILY,
        "drawdown_daily_events": Q.SQL_DRAWDOWN_DAILY,
        "records_streaks_daily": Q.SQL_RECORDS_STREAKS_DAILY,
        "atr_daily_events": Q.SQL_ATR_DAILY,
        "benford_lineitem": Q.SQL_BENFORD_LINEITEM,
        "gini_users_events": Q.SQL_GINI_USERS,
        "hampel_daily_events": Q.SQL_HAMPEL_DAILY,
        "dow_profile_daily": Q.SQL_DOW_PROFILE_DAILY,
        "macd_daily_events": Q.SQL_MACD_DAILY,
        "audience_overlap_events": Q.SQL_AUDIENCE_OVERLAP,
        "normalized_dedup_documents": Q.SQL_NORMALIZED_DEDUP,
        "holt_winters_gate_daily": Q.SQL_HOLT_WINTERS_GATE,
        "rolling_distinct_users_daily": Q.SQL_ROLLING_DISTINCT_USERS,
        "burstiness_users_events": Q.SQL_BURSTINESS_USERS,
        "transition_entropy_events": Q.SQL_TRANSITION_ENTROPY,
        "cms_user_counts_gate": Q.SQL_CMS_USER_COUNTS_GATE,
        "scd2_history_events": Q.SQL_SCD2_HISTORY,
        "skew_profile_events": Q.SQL_SKEW_PROFILE,
        "count_windows_users": Q.SQL_COUNT_WINDOWS_USERS,
        "welch_ttest_events": Q.SQL_WELCH_TTEST,
        "chisq_type_dow_events": Q.SQL_CHISQ_TYPE_DOW,
        "ks_two_sample_events": Q.SQL_KS_TWO_SAMPLE,
        "vwap_daily_events": Q.SQL_VWAP_DAILY,
        "blocking_dedup_documents": Q.SQL_BLOCKING_DEDUP,
        "control_chart_daily": Q.SQL_CONTROL_CHART_DAILY,
        "pareto_share_events": Q.SQL_PARETO_SHARE,
        "readability_documents": Q.SQL_READABILITY_DOCS,
        "levenshtein_pairs_documents": Q.SQL_LEVENSHTEIN_PAIRS,
        "cuped_adjusted_users": Q.SQL_CUPED_ADJUSTED,
        "weighted_sample_orders": Q.SQL_WEIGHTED_SAMPLE_ORDERS,
        "conversion_latency_events": Q.SQL_CONVERSION_LATENCY,
        "rfm_segments_users": Q.SQL_RFM_SEGMENTS,
        "lorenz_deciles_users": Q.SQL_LORENZ_DECILES,
        "availability_islands_daily": Q.SQL_AVAILABILITY_ISLANDS,
        "new_vs_returning_daily": Q.SQL_NEW_VS_RETURNING,
        "dau_wau_stickiness": Q.SQL_DAU_WAU_STICKINESS,
        "weekly_calendar_rollup": Q.SQL_WEEKLY_CALENDAR_ROLLUP,
        "mtd_cumsum_daily": Q.SQL_MTD_CUMSUM_DAILY,
        "bowley_skew_events": Q.SQL_BOWLEY_SKEW,
        "char_trigram_score_documents": Q.SQL_CHAR_TRIGRAM_SCORE,
        "dup_class_histogram_documents": Q.SQL_DUP_CLASS_HISTOGRAM,
        "ttr_documents": Q.SQL_TTR_DOCUMENTS,
        "lead_lag_xcorr_daily": Q.SQL_LEAD_LAG_XCORR,
        "mannwhitney_events": Q.SQL_MANNWHITNEY,
        "dow_anova_daily": Q.SQL_DOW_ANOVA,
        "runs_test_daily": Q.SQL_RUNS_TEST,
        "local_supplier_volume": Q.SQL_LOCAL_SUPPLIER_VOLUME,
        "conversion_within_7d": Q.SQL_CONVERSION_WITHIN_7D,
        "power_users_division": Q.SQL_POWER_USERS_DIVISION,
        "basket_lift_lineitem": Q.SQL_BASKET_LIFT,
        "hhi_suppliers_lineitem": Q.SQL_HHI_SUPPLIERS,
        "label_centroid_distances": Q.SQL_LABEL_CENTROID_DISTANCES,
        "silhouette_embeddings": Q.SQL_SILHOUETTE_EMBEDDINGS,
        "quantization_error_embeddings": Q.SQL_QUANTIZATION_ERROR,
        "best_f1_threshold_documents": Q.SQL_BEST_F1_THRESHOLD,
        "asof_forward_events": Q.SQL_ASOF_FORWARD,
        "late_events_watermark": Q.SQL_LATE_EVENTS_WATERMARK,
        "weighted_median_events": Q.SQL_WEIGHTED_MEDIAN,
        "hour_dow_heatmap_events": Q.SQL_HOUR_DOW_HEATMAP,
        "covariance_embeddings": Q.SQL_COVARIANCE_EMBEDDINGS,
        "debounce_events": Q.SQL_DEBOUNCE_EVENTS,
        "point_in_time_user_state": Q.SQL_POINT_IN_TIME_STATE,
        "corpus_checksum_documents": Q.SQL_CORPUS_CHECKSUM,
        "profile_orders": Q.SQL_PROFILE_ORDERS,
        "grubbs_daily_events": Q.SQL_GRUBBS_DAILY,
        "reconciliation_orders_lineitem": Q.SQL_RECONCILIATION,
        "bounce_rate_daily": Q.SQL_BOUNCE_RATE_DAILY,
        "naive2_forecast_daily": Q.SQL_NAIVE2_FORECAST,
        "kmv_set_ops_gate": Q.SQL_KMV_SET_OPS_GATE,
        "combo_forecast_daily": Q.SQL_COMBO_FORECAST,
        "lmoments_events": Q.SQL_LMOMENTS,
        "expected_shortfall_events": Q.SQL_EXPECTED_SHORTFALL,
        "winkler_interval_daily": Q.SQL_WINKLER_INTERVAL,
        "theil_u_daily": Q.SQL_THEIL_U,
        "psi_orders_priority": Q.SQL_PSI_ORDERS,
        "js_divergence_sources": Q.SQL_JS_DIVERGENCE_SOURCES,
        "cohen_kappa_lang": Q.SQL_COHEN_KAPPA_LANG,
        "blocking_recall_documents": Q.SQL_BLOCKING_RECALL,
        "changepoint_sse_daily": Q.SQL_CHANGEPOINT_SSE,
        "local_maxima_daily": Q.SQL_LOCAL_MAXIMA,
        "holt_damped_gate_daily": Q.SQL_HOLT_DAMPED_GATE,
        "activation_latency_users": Q.SQL_ACTIVATION_LATENCY,
        "q6_revenue_filter": Q.SQL_Q6_REVENUE,
        "q4_priority_exists": Q.SQL_Q4_PRIORITY,
        "q12_returnflag_priority": Q.SQL_Q12_PRIORITY,
        "rsi_daily_events": Q.SQL_RSI_DAILY,
        "stochastic_daily_events": Q.SQL_STOCHASTIC_DAILY,
        "obv_daily_events": Q.SQL_OBV_DAILY,
        "rolling_kurt_daily": Q.SQL_ROLLING_KURT_DAILY,
        "kendall_tau_market_daily": Q.SQL_KENDALL_TAU_MARKET,
        "max_concurrency_events": Q.SQL_MAX_CONCURRENCY,
        "cosine_histogram_embeddings": Q.SQL_COSINE_HISTOGRAM,
        "norm_stats_embeddings": Q.SQL_NORM_STATS,
        "pca_spectrum_gate_embeddings": Q.SQL_PCA_SPECTRUM_GATE,
        "schema_evolution_union": Q.SQL_SCHEMA_EVOLUTION_UNION,
        "normalize_text_documents": Q.SQL_NORMALIZE_TEXT,
        "pagerank_types_events": Q.SQL_PAGERANK_TYPES,
        "business_days_to_ship": Q.SQL_BUSINESS_DAYS,
        "heavy_hitters_users_events": Q.SQL_HEAVY_HITTERS_USERS,
        "quantile_normalize_daily": Q.SQL_QUANTILE_NORMALIZE_DAILY,
        "state_dwell_time_events": Q.SQL_STATE_DWELL_TIME,
        "ols_price_quantity_brand": Q.SQL_OLS_PRICE_QUANTITY,
        "kaplan_meier_users": Q.SQL_KAPLAN_MEIER,
        "sharpe_daily_events": Q.SQL_SHARPE_DAILY,
        "id_gaps_events": Q.SQL_ID_GAPS,
        "quadratic_trend_daily": Q.SQL_QUADRATIC_TREND,
        "stock_balance_daily": Q.SQL_STOCK_BALANCE,
        "weekday_adjust_daily": Q.SQL_WEEKDAY_ADJUST,
        "ar1_forecast_daily": Q.SQL_AR1_FORECAST,
        "pooled_shrinkage_daily": Q.SQL_POOLED_SHRINKAGE,
        "interarrival_expfit_events": Q.SQL_INTERARRIVAL_EXPFIT,
        "lexical_richness_documents": Q.SQL_LEXICAL_RICHNESS,
        "good_turing_documents": Q.SQL_GOOD_TURING,
        "word_entropy_documents": Q.SQL_WORD_ENTROPY,
        "hll_distinct_gate": Q.SQL_HLL_DISTINCT_GATE,
        "variance_ftest_daily": Q.SQL_VARIANCE_FTEST,
        "cross_sectional_zscore_daily": Q.SQL_CROSS_SECTIONAL_ZSCORE,
        "bigram_perplexity_documents": Q.SQL_BIGRAM_PERPLEXITY,
        "dominant_period_daily": Q.SQL_DOMINANT_PERIOD,
        "holiday_distance_daily": Q.SQL_HOLIDAY_DISTANCE,
        "tsb_gate_daily": Q.SQL_TSB_GATE,
        "hurst_rs_daily": Q.SQL_HURST_RS,
        "peak_stats_daily": Q.SQL_PEAK_STATS,
        "host_tier_1d_pages": Q.SQL_HOST_TIER_1D_PAGES,
        "funnel3_strict_events": Q.SQL_FUNNEL3_STRICT,
        "circular_hour_events": Q.SQL_CIRCULAR_HOUR,
        "motif_daily_events": Q.SQL_MOTIF_DAILY,
        "pareto_frontier_orders": Q.SQL_PARETO_FRONTIER,
        "attribution_events": Q.SQL_ATTRIBUTION,
        "topdown_forecast_daily": Q.SQL_TOPDOWN_FORECAST,
        "jl_projection_gate_embeddings": Q.SQL_JL_PROJECTION_GATE,
        "sentence_stats_documents": Q.SQL_SENTENCE_STATS,
        "days_since_peak_daily": Q.SQL_DAYS_SINCE_PEAK,
        "page_hinkley_daily": Q.SQL_PAGE_HINKLEY,
        "hill_tail_events": Q.SQL_HILL_TAIL,
        "customer_order_gaps": Q.SQL_CUSTOMER_ORDER_GAPS,
        "hourly_envelope_events": Q.SQL_HOURLY_ENVELOPE,
        "nb_fit_users_events": Q.SQL_NB_FIT_USERS,
        "copurchase_degree_lineitem": Q.SQL_COPURCHASE_DEGREE,
        "horizon_error_profile_daily": Q.SQL_HORIZON_ERROR_PROFILE,
        "p_chart_hourly_events": Q.SQL_P_CHART_HOURLY,
        "srm_check_orders": Q.SQL_SRM_CHECK,
        "dupsize_quality_corr_documents": Q.SQL_DUPSIZE_QUALITY_CORR,
        "conversion_odds_users": Q.SQL_CONVERSION_ODDS,
        "triangle_count_copurchase": Q.SQL_TRIANGLE_COUNT,
        "haar_energy_daily": Q.SQL_HAAR_ENERGY,
        "sax_words_daily": Q.SQL_SAX_WORDS,
        "dtw_band_pairs_daily": Q.SQL_DTW_BAND_PAIRS,
        "newsvendor_daily": Q.SQL_NEWSVENDOR,
        "pot_gpd_events": Q.SQL_POT_GPD,
        "mincost_supplier_parts": Q.SQL_MINCOST_SUPPLIER,
        "kl_token_sources": Q.SQL_KL_TOKEN_SOURCES,
        "markov_top1_accuracy_events": Q.SQL_MARKOV_TOP1_ACCURACY,
        "gev_pwm_daily_max_events": Q.SQL_GEV_PWM,
        "sample_entropy_daily": Q.SQL_SAMPLE_ENTROPY,
        "von_neumann_daily": Q.SQL_VON_NEUMANN,
        "turning_points_daily": Q.SQL_TURNING_POINTS,
        "acf_whiteness_daily": Q.SQL_ACF_WHITENESS,
        "pairwise_mean_diff_events": Q.SQL_PAIRWISE_MEAN_DIFF,
        "dau_halflife_events": Q.SQL_DAU_HALFLIFE,
        "weekend_effect_daily": Q.SQL_WEEKEND_EFFECT,
        "chapman_estimate_users": Q.SQL_CHAPMAN_ESTIMATE,
        "burrows_delta_sources": Q.SQL_BURROWS_DELTA,
        "abc_classification_parts": Q.SQL_ABC_CLASSIFICATION,
        "calibration_users": Q.SQL_CALIBRATION_USERS,
        "brier_decomposition_users": Q.SQL_BRIER_DECOMPOSITION,
        "crawl_gaps_pages": Q.SQL_CRAWL_GAPS,
        "partial_corr_daily": Q.SQL_PARTIAL_CORR,
        "keyness_g2_src0": Q.SQL_KEYNESS_G2,
        "vocab_coverage_documents": Q.SQL_VOCAB_COVERAGE,
        "wilcoxon_paired_daily": Q.SQL_WILCOXON_PAIRED,
        "piecewise_trend_daily": Q.SQL_PIECEWISE_TREND,
        "activity_streaks_users": Q.SQL_ACTIVITY_STREAKS,
        "mix_entropy_daily": Q.SQL_MIX_ENTROPY,
        "kendall_w_daily": Q.SQL_KENDALL_W,
        "discount_response_lineitem": Q.SQL_DISCOUNT_RESPONSE,
        "rbo_top_users": Q.SQL_RBO_TOP_USERS,
        "degree_assortativity_copurchase": Q.SQL_DEGREE_ASSORTATIVITY,
        "basket_dispersion_orders": Q.SQL_BASKET_DISPERSION,
        "jarque_bera_daily": Q.SQL_JARQUE_BERA,
        "adstock_daily": Q.SQL_ADSTOCK,
        "cohort_value_curve": Q.SQL_COHORT_VALUE_CURVE,
        "ewma_chart_daily": Q.SQL_EWMA_CHART,
        "knn_outlier_embeddings": Q.SQL_KNN_OUTLIER,
        "price_index_lineitem": Q.SQL_PRICE_INDEX,
        "theil_inequality_documents": Q.SQL_THEIL_INEQUALITY,
        "mutual_info_type_hour": Q.SQL_MUTUAL_INFO,
        "spectral_flatness_daily": Q.SQL_SPECTRAL_FLATNESS,
        "bh_fdr_pairs_events": Q.SQL_BH_FDR_PAIRS,
        "fulfillment_span_orders": Q.SQL_FULFILLMENT_SPAN,
        "ppcc_expfit_events": Q.SQL_PPCC_EXPFIT,
        "shamos_scale_daily": Q.SQL_SHAMOS_SCALE,
        "auc_dupness_documents": Q.SQL_AUC_DUPNESS,
        "beta_shrunk_daily_share": Q.SQL_BETA_SHRUNK_SHARE,
        "bimodality_daily": Q.SQL_BIMODALITY,
        "ndcg_blocking_documents": Q.SQL_NDCG_BLOCKING,
        "youden_threshold_documents": Q.SQL_YOUDEN_THRESHOLD,
        "allan_variance_daily": Q.SQL_ALLAN_VARIANCE,
        "logloss_users": Q.SQL_LOGLOSS_USERS,
        "cramers_v_orders": Q.SQL_CRAMERS_V,
        "tenure_activity_corr_users": Q.SQL_TENURE_ACTIVITY_CORR,
        "markov_entropy_rate_events": Q.SQL_MARKOV_ENTROPY_RATE,
        "sinkhorn2_transitions": Q.SQL_SINKHORN2,
        "rmst_users": Q.SQL_RMST_USERS,
        "two_means_split_daily": Q.SQL_TWO_MEANS_SPLIT,
        "ccdf_doclen_documents": Q.SQL_CCDF_DOCLEN,
        "ruzicka_sources": Q.SQL_RUZICKA_SOURCES,
        "biweight_location_daily": Q.SQL_BIWEIGHT_LOCATION,
        "term_rank_corr_sources": Q.SQL_TERM_RANK_CORR,
        "inverse_vol_weights_daily": Q.SQL_INVERSE_VOL_WEIGHTS,
        "tabular_cusum_daily": Q.SQL_TABULAR_CUSUM,
        "rate_ratio_events": Q.SQL_RATE_RATIO,
        "diurnal_harmonic_events": Q.SQL_DIURNAL_HARMONIC,
        "gamma_fit_events": Q.SQL_GAMMA_FIT,
        "lognormal_tail_events": Q.SQL_LOGNORMAL_TAIL,
        "variance_ratio_daily": Q.SQL_VARIANCE_RATIO,
        "shock_halflife_daily": Q.SQL_SHOCK_HALFLIFE,
        "mean_excess_events": Q.SQL_MEAN_EXCESS,
        "kpss_daily": Q.SQL_KPSS_DAILY,
        "dominance_matrix_daily": Q.SQL_DOMINANCE_MATRIX,
        "newey_west_daily": Q.SQL_NEWEY_WEST,
        "nelson_aalen_users": Q.SQL_NELSON_AALEN,
        "fixed_effects_trend_daily": Q.SQL_FIXED_EFFECTS_TREND,
        "juilland_d_documents": Q.SQL_JUILLAND_D,
        "eta_squared_dow_daily": Q.SQL_ETA_SQUARED_DOW,
        "blomqvist_beta_daily": Q.SQL_BLOMQVIST_BETA,
        "tscore_bigrams_documents": Q.SQL_TSCORE_BIGRAMS,
        "daily_mix_divergence": Q.SQL_DAILY_MIX_DIVERGENCE,
        "its_level_shift_daily": Q.SQL_ITS_LEVEL_SHIFT,
        "first_touch_conversion": Q.SQL_FIRST_TOUCH_CONVERSION,
        "peak_concentration_events": Q.SQL_PEAK_CONCENTRATION,
        "wilson_interval_daily": Q.SQL_WILSON_INTERVAL,
        "weekly_coherence_pairs": Q.SQL_WEEKLY_COHERENCE,
        "holiday_lift_daily": Q.SQL_HOLIDAY_LIFT,
        "icc_weekly_daily": Q.SQL_ICC_WEEKLY,
        "share_trend_daily": Q.SQL_SHARE_TREND,
        "friedman_dow_daily": Q.SQL_FRIEDMAN_DOW,
        "cochran_q_users": Q.SQL_COCHRAN_Q,
        "zipf_abbreviation_documents": Q.SQL_ZIPF_ABBREVIATION,
        "repeat_tendency_events": Q.SQL_REPEAT_TENDENCY,
        "rank1_power_dow": Q.SQL_RANK1_POWER_DOW,
        "hod_entropy_events": Q.SQL_HOD_ENTROPY,
        "intraday_concentration_daily": Q.SQL_INTRADAY_CONCENTRATION,
        "siegel_slope_daily": Q.SQL_SIEGEL_SLOPE,
        "source_vocab_entropy": Q.SQL_SOURCE_VOCAB_ENTROPY,
        "weekend_share_ztest_events": Q.SQL_WEEKEND_SHARE_ZTEST,
        "permutation_entropy_daily": Q.SQL_PERMUTATION_ENTROPY,
        "seasonality_drift_daily": Q.SQL_SEASONALITY_DRIFT,
        "memoryless_check_events": Q.SQL_MEMORYLESS_CHECK,
        "trigram_sequences_events": Q.SQL_TRIGRAM_SEQUENCES,
        "median_residual_life_users": Q.SQL_MEDIAN_RESIDUAL_LIFE,
        "median_ci_daily": Q.SQL_MEDIAN_CI,
        "crps_climatology_daily": Q.SQL_CRPS_CLIMATOLOGY,
        "ece_users": Q.SQL_ECE_USERS,
        "same_day_multiorders": Q.SQL_SAME_DAY_MULTIORDERS,
        "ess_daily": Q.SQL_ESS_DAILY,
        "flow_imbalance_events": Q.SQL_FLOW_IMBALANCE,
        "hourly_acf24_events": Q.SQL_HOURLY_ACF24,
        "diebold_mariano_daily": Q.SQL_DIEBOLD_MARIANO,
        "gini_mean_diff_daily": Q.SQL_GINI_MEAN_DIFF,
        "down_days_daily": Q.SQL_DOWN_DAYS,
        "diversification_ratio_daily": Q.SQL_DIVERSIFICATION_RATIO,
        "qte_weekend_daily": Q.SQL_QTE_WEEKEND,
        "cointegration_lite_daily": Q.SQL_COINTEGRATION_LITE,
        "trend_ttest_daily": Q.SQL_TREND_TTEST,
        "pit_naive_daily": Q.SQL_PIT_NAIVE,
        "priority_migration_customers": Q.SQL_PRIORITY_MIGRATION,
        "durbin_watson_daily": Q.SQL_DURBIN_WATSON,
        "yule_k_documents": Q.SQL_YULE_K,
        "logrank_users": Q.SQL_LOGRANK_USERS,
        "granger_lag1_daily": Q.SQL_GRANGER_LAG1,
        "arch_lm_daily": Q.SQL_ARCH_LM,
        "weibull_fit_gaps": Q.SQL_WEIBULL_GAPS,
        "mcnemar_users": Q.SQL_MCNEMAR_USERS,
        "davies_bouldin_embeddings": Q.SQL_DAVIES_BOULDIN,
        "conformal_naive_daily": Q.SQL_CONFORMAL_NAIVE,
        "gk_gamma_lineitem": Q.SQL_GK_GAMMA,
        "ols_influence_daily": Q.SQL_OLS_INFLUENCE,
        "jackknife_cv_daily": Q.SQL_JACKKNIFE_CV,
        "bhattacharyya_sources": Q.SQL_BHATTACHARYYA,
        "seasonal_mk_daily": Q.SQL_SEASONAL_MK,
        "price_cents_uniformity": Q.SQL_PRICE_CENTS,
        "calinski_harabasz_embeddings": Q.SQL_CALINSKI_HARABASZ,
        "breusch_pagan_daily": Q.SQL_BREUSCH_PAGAN,
        "chow_break_daily": Q.SQL_CHOW_BREAK,
        "brand_return_rate": Q.SQL_BRAND_RETURN_RATE,
        "brown_forsythe_dow": Q.SQL_BROWN_FORSYTHE,
        "kruskal_wallis_dow": Q.SQL_KRUSKAL_WALLIS,
        "cochran_armitage_lineitem": Q.SQL_COCHRAN_ARMITAGE,
        "iqr_outliers_lineitem": Q.SQL_IQR_OUTLIERS,
        "decile_lift_users": Q.SQL_DECILE_LIFT,
        "mood_median_dow": Q.SQL_MOOD_MEDIAN,
        "hodges_lehmann_weekend": Q.SQL_HODGES_LEHMANN,
        "jonckheere_weeks": Q.SQL_JONCKHEERE,
        "welch_anova_dow": Q.SQL_WELCH_ANOVA,
        "winsorized_corr_market_daily": Q.SQL_WINSORIZED_CORR,
        "crosstab_residuals_type_dow": Q.SQL_CROSSTAB_RESIDUALS,
        "dixon_q_daily": Q.SQL_DIXON_Q,
        "bartels_rank_daily": Q.SQL_BARTELS_RANK,
        "pettitt_daily": Q.SQL_PETTITT,
        "cox_stuart_daily": Q.SQL_COX_STUART,
        "snht_daily": Q.SQL_SNHT,
        "katz_fd_daily": Q.SQL_KATZ_FD,
        "xbar_r_chart_weekly": Q.SQL_XBAR_R,
        "monthly_seasonal_index_orders": Q.SQL_MONTHLY_SEASONAL,
        "benford_second_digit_lineitem": Q.SQL_BENFORD_SECOND,
        "volume_shipping_nations": Q.SQL_VOLUME_SHIPPING,
        "returned_items_customers": Q.SQL_RETURNED_ITEMS,
        "customer_order_distribution": Q.SQL_CUSTOMER_ORDER_DIST,
        "promo_revenue_share": Q.SQL_PROMO_REVENUE,
        "small_qty_revenue_brand": Q.SQL_SMALL_QTY_REVENUE,
        "large_volume_customers": Q.SQL_LARGE_VOLUME_CUSTOMERS,
        "market_share_nation": Q.SQL_MARKET_SHARE,
        "disjunctive_predicate_revenue": Q.SQL_DISJUNCTIVE_REVENUE,
        "idle_customer_balance": Q.SQL_IDLE_CUSTOMER_BALANCE,
        "priority_late_orders": Q.SQL_PRIORITY_LATE_ORDERS,
        "linestatus_priority_counts": Q.SQL_LINESTATUS_PRIORITY,
        "top_revenue_supplier": Q.SQL_TOP_REVENUE_SUPPLIER,
        "suppliers_kept_waiting": Q.SQL_SUPPLIERS_KEPT_WAITING,
        "nation_profit": Q.SQL_NATION_PROFIT,
        "matrix_profile_daily": Q.SQL_MATRIX_PROFILE_DAILY,
        "ccnet_perplexity_documents": Q.SQL_CCNET_PERPLEXITY,
        "dsir_weights_documents": Q.SQL_DSIR_WEIGHTS,
        "ols_reconciliation_daily": Q.SQL_OLS_RECONCILIATION,
        "supplier_part_diversity": Q.SQL_SUPPLIER_PART_DIVERSITY,
        "important_nation_stock": Q.SQL_IMPORTANT_NATION_STOCK,
        "heavy_small_part_suppliers": Q.SQL_HEAVY_SMALL_PART_SUPPLIERS,
        "best_balance_supplier_per_class": Q.SQL_BEST_BALANCE_SUPPLIER,
        "burstiness_fano_events": Q.SQL_BURSTINESS_FANO,
        "hurst_rs_daily": Q.SQL_HURST_RS_DAILY,
    }
