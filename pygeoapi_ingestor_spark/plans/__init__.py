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
from pygeoapi_ingestor_spark.plans.queries_tpch import TPCH_ORACLES, TPCH_QUERIES

_ALL = {
    **ETL_QUERIES,
    **TPCH_QUERIES,
    **ANALYTICS_QUERIES,
    **LLM_QUERIES,
    **BEHAVIOR_QUERIES,
}

# Round-7 front-load (VERDICT r6 "Next round: do this" #2): the driver
# stamps the first ~50 entries in dict order. CORRECTNESS_r06 covered
# the entire r6 backlog (the 16 never-stamped + 31 r2-stale keys) plus
# knn_outliers_ivf / knn_outliers_recall / pet_knmi, which leaves five
# round-6 keys with no driver stamp in any round. Those five go first,
# then this round's brand-new keys, then the 47 keys whose newest stamp
# is still round 3 — ~55 keys, approximately the window. After r7 the
# union staleness floor rises to round 4.

# no CORRECTNESS_r* row in r1-r6 (late round-6 additions)
_NEVER_STAMPED = [
    "isoband_regions",
    "pet_deficit_chain",
    "river_discharge_arpae",
    "danger_levels_weekly",
    "dedup_keep_best",
]

# new round-7 keys (appended as they are built this round)
_R7_NEW = [
    "bias_correction_parametric",
    "bias_correction_parametric_gamma",
    "bias_correction_parametric_tp",
    "ensemble_quantiles",
    "token_budget_select",
    "corpus_snapshot_diff",
    "pq_recall_eval",
    "ivf_recall_eval",
]

# newest driver stamp is round 3 (code unchanged since) — the stalest
# surviving cohort; rotates through the remainder of the r7 window.
_STAMPED_R3 = [
    "dedup_simhash",
    "kmeans_clusters_int8",
    "sim_search_ivf_trained",
    "fuzzy_match_names",
    "spi_empirical",
    "ewma_smooth",
    "skew_join_salted",
    "chunk_documents",
    "top_ngrams",
    "dedup_incremental_lsh",
    "funnel_conversion",
    "value_percentiles",
    "unpivot_daily",
    "dedup_spans",
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
    "sim_search_lsh",
    "ntile_quartiles",
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    "dedup_components",
    "corr_value_props",
    "profile_events",
    "extreme_values",
    "distinct_users_daily",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q10_returned_items",
    "top_parts_by_revenue",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_disjunctive",
]

_STAMPED_R4 = [
    "sim_search_pq_adc",
    "centroid_classify",
    "zonal_stats",
    "rfm_segments",
    "time_weighted_avg",
    "sessionize_gap",
    "linear_interp_gaps",
    "merge_upsert",
    "dedup_ppjoin",
    "regrid_bilinear",
    "morton_cells",
    "winnow_fingerprints",
    "dedup_against_reference",
    "tfidf_top_terms",
    "char_entropy",
    "bigram_merges",
    "ann_recall_eval",
    "retention_cohorts",
    "mad_outliers",
    "session_stats",
    "streak_lengths",
    "gap_fill_calendar",
    "hist2d_value_hour",
    "approx_distinct_users",
    "cube_orders",
    "dedup_exact",
    "dedup_latest_snapshot",
    "dedup_ngram_jaccard",
    "json_extract_props",
    "pivot_daily_by_type",
    "precip_deficit_cumsum",
    "q22_idle_customers",
    "regrid_snap_agg",
    "rollup_revenue",
    "set_ops_customers",
    "spi_gamma",
    "spi_gamma_ts3",
    "unit_convert_derive",
    "select_time_range",
    "resample_daily_sum",
    "resample_weekly_max",
    "resample_weekly_max_sun",
    "resample_monthly_scaled",
    "rolling_sum_7d",
    "rolling_sum_7d_range",
    "climatology_hourly",
    "anomaly_vs_climatology",
    "ensemble_stats",
    "bias_correction_qmap",
]

_STAMPED_R5 = [
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
    "asof_join_events",
    "asof_join_forward",
]

# stamped this past round (CORRECTNESS_r06.json, 50 keys) — freshest
# evidence, so they queue last.
_STAMPED_R6 = [
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
    "corpus_token_stats",
    "rating_curve_interp",
    "threshold_categorize",
    "threshold_per_station",
    "bias_correction_stored",
    "collection_healthcheck",
    "value_change_lag",
    "forward_fill_gaps",
    "lang_id_heuristic",
    "text_quality_score",
    "token_count",
    "doc_fingerprint",
    "quality_filter",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_order_distribution",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "spi_gamma_monthly",
    "corpus_mix_sample",
    "text_scrub",
    "dedup_keep_corpus",
    "embedding_quantize_int8",
    "multimodal_meta",
    "multimodal_frames",
    "pack_sequences",
    "decontaminate_ngram",
    "sim_search_cosine_topk",
    "sim_search_ivf",
    "dedup_embedding_cosine",
    "knn_outliers_ivf",
    "knn_outliers_recall",
    "pet_knmi",
]

_FRONT = _NEVER_STAMPED + _R7_NEW + _STAMPED_R3
# keys in no list (defensive: a new key not yet registered above) land
# between the backlog and the stale tail so they still get stamped early
_known = (
    set(_FRONT) | set(_STAMPED_R4) | set(_STAMPED_R5) | set(_STAMPED_R6)
)
_rest = [k for k in _ALL if k not in _known]
_order = _FRONT + _rest + _STAMPED_R4 + _STAMPED_R5 + _STAMPED_R6
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
}
ORACLES = {k: _ALL_ORACLES[k] for k in _order if k in _ALL_ORACLES}

__all__ = ["QUERIES", "ORACLES"]
