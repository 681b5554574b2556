"""Named query catalog: SURVEY.md §2 key -> (spark fn, DuckDB oracle SQL).

``QUERIES`` maps each key to a callable ``(spark, sf_dir) -> DataFrame``;
``ORACLES`` holds the DuckDB twin for every SQL-expressible query.

Ordering matters: the driver's correctness gate walks ``queries()`` in
dict order and (round 1 evidence) stops after a fixed budget of entries.
The catalog therefore front-loads the keys with the LEAST accumulated
correctness evidence — never-stamped keys first, then the stalest
cohort — and pushes the freshly-stamped keys to the back, so every key
has a correctness row in the union of rounds whatever the budget.
"""

from pygeoapi_ingestor_spark.plans.queries_analytics import (
    ANALYTICS_ORACLES,
    ANALYTICS_QUERIES,
)
from pygeoapi_ingestor_spark.plans.queries_behavior import (
    BEHAVIOR_ORACLES,
    BEHAVIOR_QUERIES,
)
from pygeoapi_ingestor_spark.plans.queries_etl import ETL_ORACLES, ETL_QUERIES
from pygeoapi_ingestor_spark.plans.queries_llm import LLM_ORACLES, LLM_QUERIES
from pygeoapi_ingestor_spark.plans.queries_ml import ML_ORACLES, ML_QUERIES
from pygeoapi_ingestor_spark.plans.queries_tpch import TPCH_ORACLES, TPCH_QUERIES

_ALL = {
    **ETL_QUERIES,
    **TPCH_QUERIES,
    **ANALYTICS_QUERIES,
    **LLM_QUERIES,
    **BEHAVIOR_QUERIES,
    **ML_QUERIES,
}

# Round-9 front-load (VERDICT r8 "Next round: do this" #1): the driver
# stamps the first ~50 entries in dict order. After r8 the union stamp
# recency is r8x50, r7x50, r6x50, r5x50, r4x9, never x1
# (multimodal_decode_real). Front-load the never-stamped key, then any
# keys new this round (via ``_rest``), then the 9-key round-4
# remainder, then the round-5 cohort — the ~50-key window covers all of
# never+new+r4 plus most of r5; r10 rotates the remainder.

# never driver-stamped (added round 8 behind the r3+r4 backlog)
_NEVER_STAMPED = [
    "multimodal_decode_real",
]

# newest driver stamp is round 4 — the stalest surviving cohort
_STAMPED_R4 = [
    "bigram_merges",
    "ann_recall_eval",
    "retention_cohorts",
    "rfm_segments",
    "mad_outliers",
    "session_stats",
    "streak_lengths",
    "gap_fill_calendar",
    "hist2d_value_hour",
]

# newest driver stamp is round 5
_STAMPED_R5 = [
    "asof_join_events",
    "asof_join_forward",
    "zonal_stats_polygon",
    "bias_correction_spline",
    "spi_forecast_blend",
    "spi_forecast_gamma",
    "trend_ols",
    "acf_lags",
    "nearest_site_join",
    "winsorize_values",
    "stratified_split",
    "contamination_score",
    "bigram_lm_score",
    "semdedup_clusters",
    "source_mix_weights",
    "changepoint_cusum",
    "ts_similarity_topk",
    "ensemble_crps",
    "brier_exceedance",
    "rank_histogram",
    "reliability_bins",
    "user_path_transitions",
    "psi_drift_daily",
    "embedding_qa_stats",
    "seasonal_decompose_dow",
    "lift_cooccurrence",
    "cell_pyramid",
    "focal_stats_grid",
    "theilsen_trend",
    "ccf_lags",
    "idw_interp",
    "audience_overlap",
    "dup_rate_per_source",
    "ngram_novelty",
    "dedup_containment",
    "embedding_rp_reduce",
    "climate_cdd",
    "return_levels_empirical",
    "feature_hash_vectors",
    "threshold_crossings",
    "qc_flags_station",
    "minhash_accuracy_eval",
    "area_weighted_mean",
    "lang_id_confusion",
    "user_concentration",
    "token_js_divergence",
    "asof_join_nearest",
    "rolling_active_users",
    "bm25_topk",
    "rrf_fusion",
]

# newest driver stamp is round 6
_STAMPED_R6 = [
    "forward_fill_gaps",
    "rating_curve_interp",
    "threshold_categorize",
    "collection_healthcheck",
    "value_change_lag",
    "token_count",
    "doc_fingerprint",
    "lang_id_heuristic",
    "text_quality_score",
    "quality_filter",
    "corpus_token_stats",
    "dedup_keep_corpus",
    "multimodal_meta",
    "multimodal_frames",
    "embedding_quantize_int8",
    "sim_search_cosine_topk",
    "sim_search_ivf",
    "dedup_embedding_cosine",
    "threshold_per_station",
    "bias_correction_stored",
    "spi_gamma_monthly",
    "corpus_mix_sample",
    "decontaminate_ngram",
    "pack_sequences",
    "text_scrub",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_order_distribution",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "heat_wave_events",
    "double_mass_curve",
    "kge_nse_scores",
    "mann_kendall",
    "gumbel_return_levels",
    "disaggregate_daily_hourly",
    "periodogram_coarse",
    "pet_hargreaves",
    "wet_day_markov",
    "vocab_coverage_curve",
    "triplet_mining",
    "dataset_card",
    "cooccurrence_pmi",
    "embedding_knn_outliers",
    "ab_test_conversion",
    "survival_hazard_table",
    "knn_outliers_ivf",
    "knn_outliers_recall",
    "pet_knmi",
]

# newest driver stamp is round 7
_STAMPED_R7 = [
    "spi_empirical",
    "profile_events",
    "distinct_users_daily",
    "ntile_quartiles",
    "corr_value_props",
    "extreme_values",
    "dedup_minhash_lsh",
    "sim_search_lsh",
    "dedup_simhash",
    "dedup_lsh_verified",
    "dedup_components",
    "chunk_documents",
    "top_ngrams",
    "dedup_incremental_lsh",
    "funnel_conversion",
    "fuzzy_match_names",
    "value_percentiles",
    "unpivot_daily",
    "ewma_smooth",
    "kmeans_clusters_int8",
    "dedup_spans",
    "sim_search_ivf_trained",
    "skew_join_salted",
    "grouping_sets_mixed",
    "interval_overlap_join",
    "percent_rank_bucketed",
    "value_histogram",
    "docs_top_per_source",
    "approx_percentile_value",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_parts",
    "q12_ship_delay",
    "q20_volume_share_suppliers",
    "q21_waiting_suppliers",
    "repetition_metrics",
    "sim_search_int8",
    "isoband_regions",
    "pet_deficit_chain",
    "river_discharge_arpae",
    "danger_levels_weekly",
    "dedup_keep_best",
    "bias_correction_parametric",
    "bias_correction_parametric_gamma",
    "bias_correction_parametric_tp",
    "ensemble_quantiles",
    "token_budget_select",
    "corpus_snapshot_diff",
    "pq_recall_eval",
    "ivf_recall_eval",
]

# newest driver stamp is round 8 (CORRECTNESS_r08.json) — freshest, queues last
_STAMPED_R8 = [
    "select_time_range",
    "resample_daily_sum",
    "resample_weekly_max",
    "rolling_sum_7d",
    "rolling_sum_7d_range",
    "linear_interp_gaps",
    "climatology_hourly",
    "anomaly_vs_climatology",
    "spi_gamma",
    "spi_gamma_ts3",
    "zonal_stats",
    "ensemble_stats",
    "bias_correction_qmap",
    "precip_deficit_cumsum",
    "unit_convert_derive",
    "regrid_snap_agg",
    "dedup_latest_snapshot",
    "sessionize_gap",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q10_returned_items",
    "top_parts_by_revenue",
    "set_ops_customers",
    "approx_distinct_users",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_disjunctive",
    "q22_idle_customers",
    "rollup_revenue",
    "cube_orders",
    "pivot_daily_by_type",
    "json_extract_props",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "resample_weekly_max_sun",
    "resample_monthly_scaled",
    "time_weighted_avg",
    "centroid_classify",
    "merge_upsert",
    "dedup_ppjoin",
    "regrid_bilinear",
    "morton_cells",
    "winnow_fingerprints",
    "sim_search_pq_adc",
    "dedup_against_reference",
    "tfidf_top_terms",
    "char_entropy",
]

_FRONT = _NEVER_STAMPED + _STAMPED_R4
# keys in no list (a new key not yet stamped in any round) land right
# after the never-stamped key so they still get stamped early
_known = (
    set(_FRONT)
    | set(_STAMPED_R5)
    | set(_STAMPED_R6)
    | set(_STAMPED_R7)
    | set(_STAMPED_R8)
)
_rest = [k for k in _ALL if k not in _known]
_order = (
    _NEVER_STAMPED
    + _rest
    + _STAMPED_R4
    + _STAMPED_R5
    + _STAMPED_R6
    + _STAMPED_R7
    + _STAMPED_R8
)
_order = [k for k in _order if k in _ALL]
assert set(_order) == set(_ALL), sorted(set(_ALL) ^ set(_order))
assert len(_order) == len(_ALL)

QUERIES = {k: _ALL[k] for k in _order}
_ALL_ORACLES = {
    **ETL_ORACLES,
    **TPCH_ORACLES,
    **ANALYTICS_ORACLES,
    **LLM_ORACLES,
    **BEHAVIOR_ORACLES,
    **ML_ORACLES,
}
ORACLES = {k: _ALL_ORACLES[k] for k in _order if k in _ALL_ORACLES}

__all__ = ["QUERIES", "ORACLES"]
